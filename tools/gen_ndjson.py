"""Materialize deterministic NDJSON fixture files for the JSON-lines
source (filebeat's `json:` input mode).

Two files committed under data/ndjson/ so the Spark query and the DuckDB
oracle (read_text + json functions) see identical bytes. The mix covers the
failure surface a JSON shipper actually meets: well-formed events, events
with missing/extra keys, a lowercase level, a nested props object, an
empty object, and CORRUPT lines (truncated JSON, plain text) that must
land in the quarantine lane instead of failing the batch.
"""

from __future__ import annotations

import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "data", "ndjson")

FILES = {
    "svc-a.ndjson": (
        '{"ts":"2024-03-01T10:00:01Z","level":"INFO","msg":"started","host":"a1"}\n'
        '{"ts":"2024-03-01T10:00:02Z","level":"WARN","msg":"slow request","host":"a1","elapsed_ms":812}\n'
        '{"ts":"2024-03-01T10:00:03Z","level":"ERROR","msg":"boom","host":"a2","props":{"code":500,"path":"/x"}}\n'
        '{"ts":"2024-03-01T10:00:04Z","msg":"no level key","host":"a2"}\n'
        '{"ts":"2024-03-01T10:00:05Z","level":"INFO","msg":"ok","host":"a1"\n'
        'not json at all\n'
        '{"ts":"2024-03-01T10:00:07Z","level":"info","msg":"lowercase level","host":"a3"}\n'
    ),
    "svc-b.ndjson": (
        '{"ts":"2024-03-02T08:00:00Z","level":"DEBUG","msg":"cache warm","host":"b1"}\n'
        '{"ts":"2024-03-02 08:00:01","level":"INFO","msg":"date-space ts","host":"b1"}\n'
        '{"ts":"2024-03-02T08:00:02Z","level":"SEVERE","msg":"disk full","host":"b2"}\n'
        '{}\n'
        '{"ts":"2024-03-02T08:00:04Z","level":"INFO","msg":"multi host","host":"b3","tags":["x","y"]}\n'
        '{"broken":\n'
    ),
}


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    for name, content in FILES.items():
        with open(os.path.join(OUT, name), "w") as fh:
            fh.write(content)
        print(f"wrote {name} ({len(content)} bytes)")


if __name__ == "__main__":
    main()
