"""Materialize deterministic WARC fixture files for the archive source.

Two plain (uncompressed) WARC/1.0 files built from the committed
data/pages_sf0.001.parquet fixture — response records whose payload is the
page html, plus two deliberately corrupt records (wrong Content-Length, and
a payload containing the record magic) so the reader's validity flagging is
exercised on committed bytes. Committed under data/warc/ so the Spark query
and the DuckDB oracle (read_text) see identical bytes.

Format per record (ISO 28500):

    WARC/1.0\r\n
    WARC-Type: response\r\n
    WARC-Target-URI: <url>\r\n
    WARC-Date: <iso8601>\r\n
    Content-Length: <payload bytes>\r\n
    \r\n
    <payload>\r\n\r\n
"""

from __future__ import annotations

import os

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "data", "warc")
PAGES = os.path.join(REPO, "data", "pages_sf0.001.parquet")

N_RECORDS = 40  # per-file record count is N_RECORDS split in two files


def record(url: str, ts: str, payload: str, declared_len: int | None = None) -> str:
    n = len(payload.encode("utf-8")) if declared_len is None else declared_len
    return (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {ts}\r\n"
        f"Content-Length: {n}\r\n"
        "\r\n"
        f"{payload}\r\n\r\n"
    )


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    rows = duckdb.sql(
        f"""
        SELECT url, strftime(warc_ts, '%Y-%m-%dT%H:%M:%SZ') AS ts,
               decode(html) AS payload
        FROM read_parquet('{PAGES}')
        ORDER BY url LIMIT {N_RECORDS}
        """
    ).fetchall()
    half = len(rows) // 2
    files = {
        "crawl-2024-03-01-00000.warc": rows[:half],
        "crawl-2024-03-01-00001.warc": rows[half:],
    }
    for name, chunk in files.items():
        parts = [record(u, t, p) for u, t, p in chunk]
        if name.endswith("00001.warc"):
            # corrupt record 1: declared length lies by 7 bytes
            parts.append(
                record(
                    "https://corrupt.example/len-mismatch",
                    "2024-03-01T00:59:58Z",
                    "short payload",
                    declared_len=20,
                )
            )
            # corrupt record 2: payload embeds the record magic — the
            # sentinel split severs it; BOTH halves must flag invalid
            parts.append(
                record(
                    "https://corrupt.example/embedded-magic",
                    "2024-03-01T00:59:59Z",
                    "before WARC/1.0\r\nWARC-Target-URI: https://fake.example/\r\nafter",
                )
            )
        content = "".join(parts)
        with open(os.path.join(OUT, name), "w", newline="") as f:
            f.write(content)
        print(f"wrote {name}: {len(content)} bytes, {len(parts)} records")


if __name__ == "__main__":
    main()
