"""Deterministic synthetic Common-Crawl-style ``pages`` table.

BASELINE.json input_hint: ``pages(url: string, warc_ts: timestamp,
html: binary, text: string, lang: string)``. The generator is pure Column
arithmetic over ``spark.range(n)`` — no Python in the data path, no RNG state
— so the same (n, seed) yields byte-identical data at any parallelism and any
scale factor, which is what the bench's two-parallelism scaling run needs.

Shape choices (FIXTURES.md §1):
  * url hosts are Zipf-skewed — a few hot domains dominate, so the skew
    handling (salting + AQE) is actually exercised;
  * url paths include the `.*/(.*)/.*` fixture shapes from
    /root/reference/plugin/mapper/mapper_test.go:203-222 — a no-match shape
    (no inner segment) and an empty-capture shape (`//`);
  * text is log-like lines "<iso_ts> <LEVEL> <message>"; a deterministic
    fraction carries an invalid level or a date-only timestamp (failure-path
    rows), and a fraction has stack-trace-style continuation lines (the
    multiline-join fixture);
  * html wraps text in a minimal page template, stored as utf-8 bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# BASELINE.json input_hint schema — also the readStream schema for the
# micro-batch path (streaming sources must declare their schema up front)
PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)

HOSTS = [
    # Zipf-ish: weights are assigned by the pmod bucketing below — the first
    # two hosts take ~69% of rows.
    "hot.example.com",
    "popular.example.org",
    "mid.example.net",
    "mid2.example.io",
    "cold1.example.dev",
    "cold2.example.app",
    "cold3.example.co",
    "rare.example.info",
]
# cumulative bucket upper-bounds out of 64 → P(host0)=32/64, P(host1)=12/64, …
HOST_BUCKETS = [32, 44, 52, 58, 61, 62, 63, 64]

LANGS = ["en", "de", "fr", "es", "zh"]
LEVELS = ["INFO", "WARN", "ERROR", "DEBUG", "WARNING"]
APPS = ["auth", "checkout", "search", "ingest", "frontend"]


def _pick(col, values: list[str], buckets: list[int] | None = None):
    """Deterministic weighted pick from a hashed id column."""
    if buckets is None:
        expr = F.element_at(F.array(*[F.lit(v) for v in values]), (col % len(values) + 1).cast("int"))
        return expr
    b = col % buckets[-1]
    expr = F.lit(values[-1])
    for i in range(len(buckets) - 2, -1, -1):
        expr = F.when(b < buckets[i], F.lit(values[i])).otherwise(expr)
    return expr


def _url_of(id_col, seed: int = 42):
    """The page url as a pure Column function of the page id — reused by the
    link generator so an anchor's href is byte-identical to its target
    page's ``url`` value (what makes the synthetic link graph joinable).

    Path fixture shapes: mostly /path/<app>/here (capturable); ~3% /path
    (regex no-match); ~3% /path//here (empty capture) — mapper_test.go:203-222.
    """
    h = F.abs(F.xxhash64(id_col, F.lit(seed)))
    h2 = F.abs(F.xxhash64(id_col, F.lit(seed + 1)))
    host = _pick(h, HOSTS, HOST_BUCKETS)
    app = _pick(h2, APPS)
    path_kind = h % 32
    path = (
        F.when(path_kind == 0, F.lit("/path"))
        .when(path_kind == 1, F.lit("/path//here"))
        .otherwise(F.concat(F.lit("/path/"), app, F.lit("/here")))
    )
    return F.concat(F.lit("https://"), host, path, F.lit("?id="), id_col)


def pages(spark: SparkSession, n: int, seed: int = 42, partitions: int | None = None) -> DataFrame:
    """Generate n deterministic pages. ``xxhash64(id, seed)`` drives every
    choice, so rows are independent of partitioning and ordering."""
    df = spark.range(0, n, 1, partitions) if partitions else spark.range(n)
    h = F.abs(F.xxhash64(F.col("id"), F.lit(seed)))
    h2 = F.abs(F.xxhash64(F.col("id"), F.lit(seed + 1)))
    h3 = F.abs(F.xxhash64(F.col("id"), F.lit(seed + 2)))

    host = _pick(h, HOSTS, HOST_BUCKETS)
    app = _pick(h2, APPS)
    lang = _pick(h3, LANGS)

    url = _url_of(F.col("id"), seed)

    # warc_ts: uniform over 24 hour-buckets of 2024-03-01, sub-hour jitter
    warc_ts = F.timestamp_seconds(
        F.lit(1709251200) + (h % 24) * 3600 + (h2 % 3600)
    )

    # text: 1-3 log lines; line ts is the warc_ts formatted; ~6% invalid level,
    # ~6% date-only timestamp (failure path); ~25% add a continuation line.
    iso_ts = F.date_format(warc_ts, "yyyy-MM-dd'T'HH:mm:ss'Z'")
    bad_kind = h2 % 16
    level = F.when(bad_kind == 0, F.lit("bogus")).otherwise(_pick(h3, LEVELS))
    ts_str = F.when(bad_kind == 1, F.date_format(warc_ts, "yyyy-MM-dd")).otherwise(iso_ts)
    message = F.concat(
        F.lit("request handled app="), app,
        F.lit(" host="), host,
        F.lit(" status="), (F.lit(200) + (h % 4) * 100),
        F.lit(" bytes="), (h2 % 10000),
    )
    line1 = F.concat(ts_str, F.lit(" "), level, F.lit(" "), message)
    continuation = F.concat(
        F.lit("\n    at example.Handler.handle(Handler.java:"), (h3 % 500), F.lit(")")
    )
    extra_line = F.concat(
        F.lit("\n"), iso_ts, F.lit(" INFO follow-up event seq="), (h3 % 100)
    )
    text = F.concat(
        line1,
        F.when(h3 % 4 == 0, continuation).otherwise(F.lit("")),
        F.when(h % 2 == 0, extra_line).otherwise(F.lit("")),
    )

    # outbound links: 0-3 deterministic <a href> anchors to OTHER pages in the
    # same table (href == the target's exact url string, so the extracted edge
    # list joins back to pages on equality). Targets are hash-spread, never
    # self (offset in [1, n-1] mod n); because target hosts follow the same
    # Zipf pick, hot hosts accumulate most in-links — a realistically skewed
    # web graph for the webgraph operators.
    n_links = h3 % 4
    nav_parts = []
    if n > 1:
        for k in range(3):
            t = (F.col("id") + 1 + (h2 + k * 2654435761) % (n - 1)) % n
            anchor = F.concat(
                F.lit(f'<a href="'), _url_of(t, seed), F.lit(f'">l{k}</a>')
            )
            nav_parts.append(F.when(n_links > k, anchor).otherwise(F.lit("")))
    nav = (
        F.concat(F.lit("<nav>"), *nav_parts, F.lit("</nav>"))
        if nav_parts
        else F.lit("<nav></nav>")
    )

    html = F.encode(
        F.concat(
            F.lit("<html><head><title>"), app,
            F.lit("</title></head><body><pre>"), text,
            F.lit("</pre>"), nav, F.lit("</body></html>"),
        ),
        "UTF-8",
    )

    return df.select(
        url.alias("url"),
        warc_ts.alias("warc_ts"),
        html.alias("html"),
        text.alias("text"),
        lang.alias("lang"),
    )


def host_meta(spark: SparkSession) -> DataFrame:
    """Enrichment lookup keyed on url-host (FIXTURES.md §5) — the broadcast
    side of the add_host_metadata analogue (O22)."""
    rows = [
        (h, "hot" if i < 2 else ("mid" if i < 4 else "cold"), f"org-{h.split('.')[0]}")
        for i, h in enumerate(HOSTS[:-1])  # last host intentionally missing:
        # missing host ⇒ tag absent (skip-on-missing, mapper.go:103-106)
    ]
    return spark.createDataFrame(rows, "host string, site_category string, org string")


def lang_meta(spark: SparkSession) -> DataFrame:
    rows = [
        ("en", "English", "latin"),
        ("de", "German", "latin"),
        ("fr", "French", "latin"),
        ("es", "Spanish", "latin"),
        # zh intentionally missing — skip-on-missing path
    ]
    return spark.createDataFrame(rows, "lang string, lang_name string, script string")
