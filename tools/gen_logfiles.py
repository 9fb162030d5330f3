"""Materialize deterministic .log fixture files for the harvester source.

Three rotated-log-style files with multiline stack traces, continuation
lines, and invalid-level / date-only-timestamp failure rows — committed under
data/logs/ so the Spark query and the DuckDB oracle (read_text) see identical
bytes.
"""

from __future__ import annotations

import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "data", "logs")

FILES = {
    "app-2024-03-01.log": (
        "2024-03-01T10:00:01Z INFO service started port=8080\n"
        "2024-03-01T10:00:02Z WARN config key deprecated key=old_timeout\n"
        "2024-03-01T10:00:03Z ERROR request failed code=500\n"
        "    at example.Handler.handle(Handler.java:42)\n"
        "    at example.Server.serve(Server.java:101)\n"
        "2024-03-01T10:00:04Z INFO recovered\n"
    ),
    "app-2024-03-02.log": (
        "2024-03-02T09:30:00Z DEBUG cache warm entries=1024\n"
        "2024-03-02 INFO date-only timestamp line\n"
        "2024-03-02T09:30:02Z bogus not-a-level line\n"
        "2024-03-02T09:30:03Z SEVERE disk almost full pct=97\n"
    ),
    "worker-2024-03-02.log": (
        "2024-03-02T11:00:00Z INFO worker online id=7\n"
        "2024-03-02T11:00:05Z EXCEPTION job crashed job=42\n"
        "\tjava.lang.IllegalStateException: boom\n"
        "\tat example.Job.run(Job.java:13)\n"
    ),
}


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    for name, content in FILES.items():
        with open(os.path.join(OUT, name), "w") as f:
            f.write(content)
        print(f"wrote {name}: {len(content)} bytes")


if __name__ == "__main__":
    main()
