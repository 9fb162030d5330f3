"""Materialize the deterministic synthetic ``pages`` fixture to parquet.

The driver's correctness gate runs Spark queries and DuckDB oracle SQL
side-by-side; DuckDB cannot execute the Spark Column generator in
sources/pages.py, so the pages table is generated ONCE here and committed as
a single parquet file per scale factor. Both engines then read the identical
bytes — which is exactly the input_hint invariant (byte-identical extraction
per url) needs.

Usage: python tools/gen_pages.py            # writes data/pages_sf{0.001,0.01}.parquet
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# sf → page count: sf0.01 ≈ 20k pages ≈ the sf0.01 events row count; the
# multiline join explodes these to ~1.9× logical events.
SF_PAGES = {"sf0.001": 2_000, "sf0.01": 20_000}


def main() -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    from logsight_filebeat_spark.session import get_spark
    from logsight_filebeat_spark.sources.pages import pages

    spark = get_spark(
        app_name="gen-pages",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.sql.session.timeZone": "UTC"},
    )
    os.makedirs(os.path.join(REPO, "data"), exist_ok=True)
    for sf, n in SF_PAGES.items():
        rows = pages(spark, n).collect()
        table = pa.table(
            {
                "url": pa.array([r.url for r in rows], pa.string()),
                "warc_ts": pa.array([r.warc_ts for r in rows], pa.timestamp("us")),
                "html": pa.array([bytes(r.html) for r in rows], pa.binary()),
                "text": pa.array([r.text for r in rows], pa.string()),
                "lang": pa.array([r.lang for r in rows], pa.string()),
            }
        )
        out = os.path.join(REPO, "data", f"pages_{sf}.parquet")
        pq.write_table(table, out, compression="zstd")
        print(f"wrote {out}: {table.num_rows} rows, {os.path.getsize(out)} bytes")
    spark.stop()


if __name__ == "__main__":
    main()
