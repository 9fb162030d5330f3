"""Local stand-in for the driver's correctness gate.

Runs every __spark_entry__.queries() entry at sf=0.01 and compares with the
matching oracle_sql() via DuckDB: row count, sorted column names, and an
order-insensitive exact value comparison (stricter than the driver's hash —
floats must match to 1e-9 after the query's own rounding).

Usage: python tools/check_correctness.py [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("CHECK_SF_DIR", "/root/testdata/sf0.01")


def normalize(v):
    import datetime as dt
    import decimal

    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, dt.datetime):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(normalize(x) for x in v)
    return v


def rows_equal(a, b) -> bool:
    if len(a) != len(b):
        return False
    for x, y in zip(a, b):
        if isinstance(x, float) and isinstance(y, float):
            if math.isnan(x) and math.isnan(y):
                continue
            if not math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9):
                return False
        elif x != y:
            return False
    return True


def main(names: list[str]) -> int:
    import duckdb

    import __spark_entry__ as entry
    from logsight_filebeat_spark.session import get_spark

    spark = get_spark(
        app_name="check-correctness",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.sql.session.timeZone": "UTC"},
    )
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"create view {t} as select * from '{SF_DIR}/{t}.parquet'"
        )

    queries = entry.queries()
    oracles = entry.oracle_sql()
    targets = names or list(queries)
    failures = 0
    from logsight_filebeat_spark.functions.caching import release_persisted

    for name in targets:
        t0 = time.time()
        try:
            sdf = queries[name](spark, SF_DIR)
            srows = [tuple(normalize(v) for v in r) for r in sdf.collect()]
            scols = sorted(sdf.columns)
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        finally:
            # queries that persist self-join projections (LSH signatures,
            # graph edges) leave tracked caches behind; release per query
            # so the full 98-entry sweep doesn't accumulate executor memory
            release_persisted()
        if name not in oracles:
            print(f"ok?  {name}: rows={len(srows)} (no oracle — rows-only check)")
            continue
        try:
            ddf = con.execute(oracles[name]).fetch_df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        dcols = sorted(ddf.columns)
        if scols != dcols:
            print(f"FAIL {name}: columns differ spark={scols} duck={dcols}")
            failures += 1
            continue
        drows = [
            tuple(normalize(v) for v in r)
            for r in ddf[scols].itertuples(index=False, name=None)
        ]
        # spark rows in sorted-column order too
        sidx = [sdf.columns.index(c) for c in scols]
        srows2 = [tuple(r[i] for i in sidx) for r in srows]
        key = lambda r: tuple(
            (x is None, str(type(x)), round(x, 6) if isinstance(x, float) and not math.isnan(x) else x)
            for x in r
        )
        try:
            s_sorted = sorted(srows2, key=key)
            d_sorted = sorted(drows, key=key)
        except TypeError as e:
            print(f"FAIL {name}: unsortable rows: {e}")
            failures += 1
            continue
        if len(s_sorted) != len(d_sorted):
            print(
                f"FAIL {name}: row count spark={len(s_sorted)} duck={len(d_sorted)}"
            )
            failures += 1
            continue
        bad = None
        for i, (x, y) in enumerate(zip(s_sorted, d_sorted)):
            if not rows_equal(x, y):
                bad = (i, x, y)
                break
        if bad:
            print(f"FAIL {name}: first diff at row {bad[0]}:\n  spark={bad[1]}\n  duck ={bad[2]}")
            failures += 1
        else:
            print(f"PASS {name}: rows={len(s_sorted)} ({time.time()-t0:.1f}s)")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
