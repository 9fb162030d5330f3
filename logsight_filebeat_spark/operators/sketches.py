"""Deterministic distributed sketches for corpus statistics.

At 100 TB you cannot afford exact DISTINCT over high-cardinality columns
(vocabulary, urls, shingles) just to report a dataset-card number — the
full shuffle dwarfs the answer's value. Spark's builtin
``approx_count_distinct`` (HyperLogLog++) answers this but is not
cross-engine reproducible (engine-private hash + float register math), so
it can't be oracle-verified and two runs on different engines disagree.

KMV (k-minimum-values, Bar-Yossef et al. 2002) with a portable hash is the
deterministic alternative: keep the k smallest DISTINCT hash values of the
column; if the k-th smallest is ``kth`` over a hash space of size ``SPACE``,
the cardinality estimate is ``(k-1) * SPACE div kth``. Every step is
integer arithmetic over md5-derived hashes — identical in Spark and DuckDB,
identical at any parallelism, floors included.

Scale shapes:
* ``kmv_hashes``: hash in the scan projection → DISTINCT (one shuffle on
  the 8-byte hash only — never the value bytes) → ``orderBy().limit(k)``
  (TakeOrderedAndProject: per-partition top-k, tiny driver merge).
* Sketches MERGE: union two sketches' hash sets, distinct, keep k smallest
  — the union sketch equals the sketch of the union (min-wise property),
  so per-partition / per-day sketches roll up without touching raw data.
* 40-bit hash space (``SPACE`` = 2^40) keeps ``(k-1)*SPACE`` inside BIGINT
  for k ≤ ~8M and hash-collision bias negligible below ~10^9 distinct
  values; production at larger cardinalities widens to the 60-bit variant
  with DECIMAL(38) intermediates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from logsight_filebeat_spark.functions.caching import track_persist
from logsight_filebeat_spark.functions.hashing import seeded_hash32

KMV_SPACE = 1 << 40  # 40-bit hash space (see module docstring)


def kmv_hash(col: Column | str, seed: str = "kmv:v1") -> Column:
    """Portable 40-bit hash: first 10 md5-hex digits as a bigint.
    DuckDB mirror: ``('0x' || substr(md5('<seed>:' || x), 1, 10))::bigint``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(
        F.substring(F.md5(F.encode(F.concat(F.lit(seed + ":"), c), "UTF-8")), 1, 10),
        16,
        10,
    ).cast("bigint")


def kmv_hashes(
    df: DataFrame, col: Column | str, k: int = 256, seed: str = "kmv:v1"
) -> DataFrame:
    """The sketch itself: k smallest distinct hashes, one column ``h``."""
    return (
        df.select(kmv_hash(col, seed).alias("h")).distinct().orderBy("h").limit(k)
    )


def kmv_by_group(
    df: DataFrame,
    col: Column | str,
    group_col: str,
    k: int = 256,
    seed: str = "kmv:v1",
) -> DataFrame:
    """Per-group KMV sketches in ONE pass: (group, h) — each group's k
    smallest distinct hashes. The dataset-card question at corpus scale is
    rarely one global cardinality but one PER SLICE (vocabulary per
    language, distinct urls per host, shingles per source), and running a
    full DISTINCT per slice shuffles the value bytes once per slice.

    Scale shape: hash in the scan → ONE distinct over (group, hash) —
    8-byte hashes, never values — → a rank window partitioned BY GROUP
    (each sort is one group's ≤distinct-hash rows, never global). Groups
    under k distinct values keep everything (estimate exact, same contract
    as the global sketch); sketches remain mergeable per group."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(group_col).orderBy(F.col("h").asc())
    return (
        df.select(F.col(group_col), kmv_hash(col, seed).alias("h"))
        .distinct()
        .withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= k)
        .select(group_col, "h")
    )


def kmv_estimate_by_group(
    sketch: DataFrame, group_col: str, k: int = 256
) -> DataFrame:
    """(group, n_seen, kth_hash, est_distinct) — the per-group integral
    KMV estimator, exact below k (mirrors :func:`kmv_estimate`)."""
    return (
        sketch.groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("n_seen"), F.max("h").alias("kth_hash"))
        .select(
            group_col,
            "n_seen",
            "kth_hash",
            F.when(F.col("n_seen") < k, F.col("n_seen"))
            .otherwise(F.expr(f"{(k - 1) * KMV_SPACE}L div kth_hash"))
            .cast("long")
            .alias("est_distinct"),
        )
    )


def kmv_merge(*sketches: DataFrame, k: int = 256) -> DataFrame:
    """Union sketches into the sketch of the combined input (min-wise
    hashes: the k smallest of the union of per-part k-smallest sets are
    exactly the k smallest of the full union)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.distinct().orderBy("h").limit(k)


def cms_table(
    df: DataFrame,
    col: str = "value",
    depth: int = 4,
    width: int = 1024,
    seed: str = "cms:v1",
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) as a DataFrame:
    rows (d, w, cnt) — for each of ``depth`` independent portable hash
    functions, the total count landing in each of ``width`` buckets.
    ≤ depth·width rows regardless of corpus size.

    The deterministic, mergeable answer to point-frequency queries at
    100 TB: per-partition/per-day sketches ADD (sum cnt by (d, w)) into the
    sketch of the union, so frequency serving never rescans raw data.
    Estimates overcount only (by ≤ 2N/width with prob 1 − 2^-depth each).

    Scale shape: the (d, w) pairs are a pure array expression exploded in
    the scan; ONE hash aggregate with map-side partials over a keyspace of
    depth·width — the value strings themselves never shuffle (contrast
    exact counting, which shuffles the full distinct-value table).
    Portable hashes keep every cell engine-reproducible."""
    c = F.col(col).cast("string")
    cells = F.array(
        *[
            F.struct(
                F.lit(d).alias("d"),
                (seeded_hash32(c, f"{seed}:{d}") % width).alias("w"),
            )
            for d in range(depth)
        ]
    )
    return (
        df.filter(c.isNotNull())
        .select(F.explode(cells).alias("cell"))
        .groupBy(
            F.col("cell.d").alias("d"), F.col("cell.w").alias("w")
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Sum cell-wise: the merged sketch equals the sketch of the unioned
    input (counter arrays add)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("d", "w").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    col: str = "value",
    depth: int = 4,
    width: int = 1024,
    seed: str = "cms:v1",
) -> DataFrame:
    """Point-frequency estimates for a probe set: est(v) = min over d of
    cnt[d, h_d(v)] (never underestimates; missing cells read 0). The
    sketch is tiny — it broadcasts; probing is an equi-join + one
    min-aggregate per probe value."""
    c = F.col(col).cast("string")
    cells = F.array(
        *[
            F.struct(
                F.lit(d).alias("d"),
                (seeded_hash32(c, f"{seed}:{d}") % width).alias("w"),
            )
            for d in range(depth)
        ]
    )
    probe_cells = (
        probes.select(c.alias("value"), F.explode(cells).alias("cell"))
        .select("value", F.col("cell.d").alias("d"), F.col("cell.w").alias("w"))
    )
    return (
        probe_cells.join(F.broadcast(sketch), ["d", "w"], "left")
        .groupBy("value")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


def _bloom_positions(
    c: Column, n_bits: int, n_hashes: int, seed: str
) -> Column:
    """The k bit positions of a value — a pure array expression."""
    return F.array(
        *[
            (seeded_hash32(c, f"{seed}:{d}") % n_bits).cast("bigint")
            for d in range(n_hashes)
        ]
    )


def bloom_bits(
    df: DataFrame,
    col: str = "value",
    n_bits: int = 8192,
    n_hashes: int = 4,
    seed: str = "bloom:v1",
) -> DataFrame:
    """Bloom filter (Bloom 1970) as a DataFrame of SET BIT POSITIONS:
    one ``bit`` row per distinct position any input value hashes to —
    ≤ n_bits rows regardless of corpus size. The deterministic, mergeable
    membership gate for 100-TB pipelines: "was this url/content-hash ever
    seen?" without shuffling or storing the value set (the classic use:
    pre-filtering an incremental crawl against the seen-URL set, where a
    false positive merely re-checks a url and a false negative cannot
    happen).

    Scale shape: positions are a pure array expression exploded in the
    scan, then ONE distinct over a keyspace ≤ n_bits — the value bytes
    never shuffle. Portable hashes keep every bit engine-reproducible.
    False-positive rate ≈ (1 − e^(−k·n/m))^k for n values, m bits, k
    hashes; size m for the expected n (m/n ≈ 10 bits/value at k=4 gives
    ~1.2 %)."""
    c = F.col(col).cast("string")
    return (
        df.filter(c.isNotNull())
        .select(
            F.explode(_bloom_positions(c, n_bits, n_hashes, seed)).alias("bit")
        )
        .distinct()
    )


def bloom_merge(*filters: DataFrame) -> DataFrame:
    """Union of set positions — the bitwise OR: the merged filter equals
    the filter of the unioned inputs, so per-partition / per-snapshot
    filters roll up without touching raw data."""
    out = filters[0]
    for f in filters[1:]:
        out = out.unionByName(f)
    return out.distinct()


def bloom_probe(
    bloom: DataFrame,
    candidates: DataFrame,
    col: str = "value",
    n_bits: int = 8192,
    n_hashes: int = 4,
    seed: str = "bloom:v1",
) -> DataFrame:
    """(value, maybe_present): membership probes against a built filter —
    true iff ALL k of the value's positions are set. Never a false
    negative; false positives at the designed rate. The filter is ≤ n_bits
    rows — it broadcasts; probing is one equi-join + one count aggregate
    per candidate (the count of matched rows is exactly k on a hit, since
    a value's k position rows each match independently — duplicate
    positions from colliding hash members contribute one matched row
    each, identically in any engine)."""
    c = F.col(col).cast("string")
    pc = candidates.select(
        c.alias("value"),
        F.explode(_bloom_positions(c, n_bits, n_hashes, seed)).alias("bit"),
    )
    return (
        pc.join(F.broadcast(bloom.withColumn("_set", F.lit(1))), "bit", "left")
        .groupBy("value")
        .agg((F.count("_set") == F.lit(n_hashes)).alias("maybe_present"))
    )


def heavy_hitters(
    df: DataFrame,
    col: str = "value",
    k: int = 20,
    budget: int = 4096,
) -> DataFrame:
    """EXACT global top-k heavy hitters (value, cnt, rank) without ever
    shuffling the full value multiset — the SpaceSaving/Misra-Gries
    candidate pass fused with an exact recount.

    At 100 TB a naive ``groupBy(value).count().orderBy().limit(k)`` shuffles
    one row per DISTINCT value per map partition — for n-grams that is the
    corpus again. Two bounded passes instead:

    1. **Candidates** (mapInPandas, Arrow-batched): each partition counts
       its own values in a dict and emits only its local top-``budget``
       (ties broken by value for determinism) plus ONE residual row — the
       (budget+1)-th local count, an upper bound on the local count of
       anything it did NOT emit. Output is ≤ (budget+1) rows/partition.
    2. **Recount**: the scan runs again filtered to the candidate set
       (broadcast hash semi-join — no shuffle of non-candidates) and
       re-aggregates exactly; top-k of that is a distributed
       TakeOrderedAndProject.

    Exactness is PROVEN row-by-row, lazily, inside the plan: a value never
    emitted by any partition has global count ≤ Σ residual bounds, so every
    top-k row with ``cnt > Σ bounds`` provably outranks all non-candidates.
    The emitted rows are filtered on exactly that predicate — counts
    decrease with rank, so what survives is a prefix with exact counts AND
    exact ranks. An undersized ``budget`` truncates the prefix (visibly —
    fewer than k rows) rather than silently returning wrong ranks; the
    result is therefore partitioning-independent and engine-reproducible.
    Sizing: a value with global frequency ≥ N_p/budget of its partition's
    rows is always a candidate; budget=4096 covers every realistic
    top-20 ask over natural-language grams.

    Memory note: pass 1 keeps an exact dict over each partition's DISTINCT
    values (that exactness is what makes the residual bound valid) — size
    partitions so that fits; a true evicting Misra-Gries summary would cap
    memory at O(budget) but weakens the bound and loses the verified-exact
    guarantee this operator exists for.

    The final rank window orders ≤k rows (post-limit), never the data."""
    from pyspark.sql import Window
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    src = df.select(F.col(col).cast("string").alias("value")).filter(
        F.col("value").isNotNull()
    )
    schema = StructType(
        [StructField("value", StringType()), StructField("cnt", LongType())]
    )

    def local_tops(batches):
        from collections import Counter

        import pandas as pd

        c: Counter = Counter()
        for pdf in batches:
            c.update(pdf["value"])
        items = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
        rows = items[:budget]
        bound = items[budget][1] if len(items) > budget else 0
        out = pd.DataFrame(rows, columns=["value", "cnt"])
        # the residual row: value NULL, cnt = local bound on non-emitted
        yield pd.concat(
            [out, pd.DataFrame([{"value": None, "cnt": bound}])],
            ignore_index=True,
        )

    local = track_persist(src.mapInPandas(local_tops, schema))
    cands = local.filter(F.col("value").isNotNull()).select("value").distinct()
    missed = local.filter(F.col("value").isNull()).agg(
        F.coalesce(F.sum("cnt"), F.lit(0)).alias("_missed_bound")
    )
    exact = (
        src.join(F.broadcast(cands), ["value"])
        .groupBy("value")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    topk = exact.orderBy(F.col("cnt").desc(), F.col("value").asc()).limit(k)
    ranked = topk.withColumn(
        "rank",
        F.row_number().over(
            Window.orderBy(F.col("cnt").desc(), F.col("value").asc())
        ),
    )
    return (
        ranked.crossJoin(F.broadcast(missed))
        .filter(F.col("cnt") > F.col("_missed_bound"))
        .drop("_missed_bound")
    )


def kmv_estimate(sketch: DataFrame, k: int = 256) -> DataFrame:
    """1-row summary: (n_seen, kth_hash, est_distinct). Below k distinct
    values the sketch is exhaustive and the estimate exact; at and beyond
    k it is the integral KMV estimator (±~1/sqrt(k) relative error)."""
    return sketch.agg(
        F.count(F.lit(1)).alias("n_seen"), F.max("h").alias("kth_hash")
    ).select(
        "n_seen",
        "kth_hash",
        F.when(F.col("n_seen") < k, F.col("n_seen"))
        .otherwise(F.expr(f"{(k - 1) * KMV_SPACE}L div kth_hash"))
        .cast("long")
        .alias("est_distinct"),
    )


# ---------------------------------------------------------------------------
# deterministic HyperLogLog (Flajolet et al. 2007) over the portable hash
# ---------------------------------------------------------------------------

HLL_SPACE_BITS = 40  # same 40-bit md5-derived space as KMV


def hll_alpha_scaled(p: int) -> int:
    """alpha_m · 10^6 as an integer, m = 2^p (the standard bias constant
    0.7213/(1 + 1.079/m) for m ≥ 128). Computed once on the driver and
    baked identically into the Spark plan and the oracle SQL, so the
    float→int rounding happens exactly once, in one place."""
    m = 1 << p
    return int(round(0.7213 / (1 + 1.079 / m) * 1_000_000))


def _rho(w: Column, width: int) -> Column:
    """Position of the highest set bit counted from the TOP of a
    ``width``-bit value, i.e. leading zeros + 1; ``w == 0`` → width + 1.
    Portable: bit length via the base-2 string (Spark ``conv`` and DuckDB
    ``bin`` both render without leading zeros, '0' for zero)."""
    blen = F.length(F.conv(w.cast("string"), 10, 2))
    return (
        F.when(w == 0, F.lit(width + 1))
        .otherwise(F.lit(width + 1) - blen)
        .cast("int")
    )


def hll_registers(
    df: DataFrame, col: Column | str, p: int = 8, seed: str = "hll:v1"
) -> DataFrame:
    """The HLL sketch itself: (register, max_rho), ≤ 2^p rows. Register
    index = low p bits of the 40-bit portable hash; rho = leading-zero
    rank of the remaining (40-p)-bit suffix.

    Scale shape: hash + split in the scan projection, then ONE hash
    aggregate on the register key — map-side partial max means each
    executor ships at most m=2^p rows whatever the input size. That is the
    whole point vs exact DISTINCT: the shuffle is O(m), not O(cardinality).
    Unlike Spark's builtin approx_count_distinct (HLL++, engine-private
    hash + float register math) every intermediate here is an integer over
    the md5 hash family — DuckDB rebuilds the identical register table."""
    if not 4 <= p <= 16:
        raise ValueError("p must be in [4, 16]")
    m = 1 << p
    w_bits = HLL_SPACE_BITS - p
    h = kmv_hash(col, seed)
    return (
        df.select(
            (h % m).cast("int").alias("register"),
            _rho(F.shiftright(h, p), w_bits).alias("rho"),
        )
        .groupBy("register")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_merge(*sketches: DataFrame) -> DataFrame:
    """Union of sketches = register-wise max: the merged sketch equals the
    sketch of the concatenated inputs exactly, so per-partition / per-day
    sketches roll up without touching raw data."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("register").agg(F.max("max_rho").alias("max_rho"))


def hll_estimate(registers: DataFrame, p: int = 8) -> DataFrame:
    """One row (est_distinct BIGINT) from a register table.

    Raw HLL estimator with every step integral: with G = (40-p)+1 the
    max possible rho, S = Σ_j 2^(G - M_j) over ALL m registers (absent ⇒
    M_j = 0), and

        est = alpha_scaled · ((m² · 2^G) div S) div 10^6 .

    m²·2^G ≤ 2^(2p + 41-p) = 2^(p+41) and the inner quotient ≤ 2^(p+33),
    so for p ≤ 16 everything fits BIGINT with the alpha multiply last.
    Deliberately NO small-range (linear counting) or large-range
    corrections: they need ln/float math that breaks cross-engine
    bit-equality, and at corpus cardinalities (≥ 10·m) the raw estimator
    is already in its calibrated regime — the use case is dataset-card
    vocabulary / url / shingle counts, not tiny sets (KMV with n_seen < k
    covers those exactly)."""
    m = 1 << p
    g = HLL_SPACE_BITS - p + 1
    alpha = hll_alpha_scaled(p)
    spark = registers.sparkSession
    full = (
        spark.range(m)
        .select(F.col("id").cast("int").alias("register"))
        .join(F.broadcast(registers), "register", "left")
        .select(F.coalesce("max_rho", F.lit(0)).alias("mr"))
    )
    s = full.agg(
        F.sum(F.expr(f"shiftleft(1L, {g} - mr)")).alias("s")
    )
    return s.select(
        F.expr(
            f"cast(((cast({(m * m) << g} as bigint) div s)"
            f" * {alpha}) div 1000000 as bigint)"
        ).alias("est_distinct")
    )


def kmv_set_ops(a: DataFrame, b: DataFrame, k: int = 256) -> DataFrame:
    """Set-operation estimates from two KMV sketches (Beyer et al. 2007):
    one row (n_a, n_b, n_union_seen, kth_hash, union_est, n_both,
    jaccard_est, inter_est) — distinct-union, Jaccard, and intersection
    cardinality of the two ORIGINAL sets, answered from two k-row
    sketches without rescanning either corpus. The dataset-card question
    this serves at 100 TB: "how much does the new crawl's vocabulary /
    url set / shingle space overlap the old one?" — per-slice sketches
    are built once (:func:`kmv_by_group`), stored, and compared freely.

    Estimators: the union's KMV sketch is exactly the k smallest of
    A ∪ B (min-wise property), giving ``union_est`` via the usual
    (k−1)·SPACE/kth rule (exact below k); ``jaccard_est`` is the fraction
    of the union sketch's members present in BOTH input sketches (each
    such member is a uniform sample of the union, so membership-in-both
    is an unbiased Jaccard estimate); ``inter_est = n_both·union_est ÷
    n_union_seen`` stays in integer arithmetic (never a float product),
    so every value is bit-stable across engines.

    Scale shape: inputs are ≤k rows each — everything here is
    driver-light TakeOrdered + two broadcast joins + one 1-row aggregate;
    the heavy lifting happened when the sketches were built."""
    u = a.unionByName(b).distinct().orderBy("h").limit(k)
    marked = (
        u.join(a.withColumn("_ina", F.lit(1)), ["h"], "left")
        .join(b.withColumn("_inb", F.lit(1)), ["h"], "left")
        .select(
            "h",
            (F.coalesce("_ina", F.lit(0)) * F.coalesce("_inb", F.lit(0))).alias(
                "_both"
            ),
        )
    )
    na = a.agg(F.count(F.lit(1)).alias("n_a"))
    nb = b.agg(F.count(F.lit(1)).alias("n_b"))
    agg = marked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_union_seen"),
        F.max("h").alias("kth_hash"),
        F.sum("_both").cast("bigint").alias("n_both"),
    )
    return (
        agg.crossJoin(F.broadcast(na))
        .crossJoin(F.broadcast(nb))
        .select(
            F.col("n_a").cast("bigint").alias("n_a"),
            F.col("n_b").cast("bigint").alias("n_b"),
            "n_union_seen",
            "kth_hash",
            F.when(F.col("n_union_seen") < k, F.col("n_union_seen"))
            .otherwise(F.expr(f"{(k - 1) * KMV_SPACE}L div kth_hash"))
            .cast("bigint")
            .alias("union_est"),
            "n_both",
            F.round(F.col("n_both") / F.col("n_union_seen"), 6).alias(
                "jaccard_est"
            ),
        )
        .withColumn(
            "inter_est",
            F.expr("n_both * union_est div n_union_seen").cast("bigint"),
        )
    )


def hll_sliding(
    df: DataFrame,
    col: Column | str,
    ts_col: str = "ts",
    trailing_h: int = 24,
    p: int = 8,
    seed: str = "hll:v1",
) -> DataFrame:
    """Sliding-window distinct-count estimates from MERGED per-hour HLL
    sketches: (hour, est_distinct) — the trailing ``trailing_h``-hour
    cardinality as of every observed hour, answered entirely from
    register tables (the "distinct users/urls last 24 h, hourly" panel at
    10^12 events, where an exact sliding DISTINCT would reshuffle the
    corpus once per window step).

    This is the mergeability of :func:`hll_registers` applied across
    TIME: per-hour sketches are built once (ONE (hour, register)-keyed
    hash aggregate, ≤ m rows/hour), and each window's merged sketch is a
    register-wise running max — one range-window pass over the
    dimension-sized (hours × m) grid, raw data touched exactly once.
    The estimate then follows :func:`hll_estimate`'s all-integer formula
    per hour, so every value is bit-stable across engines. Same
    raw-estimator contract as hll_estimate: no float small-range
    correction — below ~2.5·m distinct the estimate is biased (use the
    exact/KMV paths for tiny sets); the target regime is corpus-scale.

    The range window spans WALL-CLOCK seconds, so hours absent from the
    data are correctly absent from every window (an empty hour adds no
    registers)."""
    from pyspark.sql import Window

    m = 1 << p
    w_bits = HLL_SPACE_BITS - p
    g = HLL_SPACE_BITS - p + 1
    alpha = hll_alpha_scaled(p)
    h = kmv_hash(col, seed)
    spark = df.sparkSession
    hourly = (
        df.select(
            F.date_trunc("hour", F.col(ts_col)).alias("hour"),
            (h % m).cast("int").alias("register"),
            _rho(F.shiftright(h, p), w_bits).alias("rho"),
        )
        .groupBy("hour", "register")
        .agg(F.max("rho").alias("max_rho"))
    )
    grid = (
        hourly.select("hour")
        .distinct()
        .crossJoin(
            F.broadcast(
                spark.range(m).select(F.col("id").cast("int").alias("register"))
            )
        )
    )
    filled = grid.join(hourly, ["hour", "register"], "left").select(
        "hour", "register", F.coalesce("max_rho", F.lit(0)).alias("mr")
    )
    w = (
        Window.partitionBy("register")
        .orderBy(F.unix_timestamp("hour"))
        .rangeBetween(-(trailing_h - 1) * 3600, 0)
    )
    win = filled.withColumn("wmr", F.max("mr").over(w))
    s = win.groupBy("hour").agg(
        F.sum(F.expr(f"shiftleft(1L, {g} - wmr)")).alias("s")
    )
    return s.select(
        "hour",
        F.expr(
            f"cast(((cast({(m * m) << g} as bigint) div s)"
            f" * {alpha}) div 1000000 as bigint)"
        ).alias("est_distinct"),
    )
