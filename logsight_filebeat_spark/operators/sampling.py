"""Deterministic hash-based sampling — reproducible corpus splits.

Training pipelines need samples that are STABLE under re-execution,
repartitioning, and incremental reruns; Spark's `sample`/`sampleBy` draw
from per-partition RNG streams, so adding one input file reshuffles every
row's fate. Hash sampling decides each row from its own id alone:
row ∈ sample ⇔ h(seed:id) mod D < fraction·D. Same id ⇒ same decision,
on any cluster, any partitioning, any engine (the hash is the portable
md5-based family of functions/hashing.py, so DuckDB re-derives membership
bit-for-bit).

All pure Column filters inside the scan stage: zero shuffle, pushdown-
friendly, and composable (disjoint fractions of the same keyspace give
disjoint splits — the train/val/test construction).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from logsight_filebeat_spark.functions.hashing import seeded_hash32

# hash bucket denominator: fractions resolve to an integer threshold out of
# this many buckets (1e6 ⇒ fraction granularity 1e-6, exact in both engines)
SAMPLE_BUCKETS = 1_000_000


def sample_bucket(id_col: Column | str, seed: int | str = 0) -> Column:
    """Stable per-row bucket in [0, SAMPLE_BUCKETS): the row's whole
    sampling fate. Derive every split from ONE bucket column so splits with
    disjoint ranges are disjoint by construction."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return seeded_hash32(c.cast("string"), seed) % SAMPLE_BUCKETS


def hash_sample(
    df: DataFrame,
    id_col: str = "doc_id",
    fraction: float = 0.1,
    seed: int | str = 0,
) -> DataFrame:
    """Deterministic ``fraction`` sample: rows whose bucket falls under
    fraction·SAMPLE_BUCKETS. Exactly reproducible anywhere."""
    thresh = int(fraction * SAMPLE_BUCKETS)
    return df.filter(sample_bucket(id_col, seed) < thresh)


def train_val_split(
    df: DataFrame,
    id_col: str = "doc_id",
    val_fraction: float = 0.1,
    seed: int | str = 0,
) -> tuple[DataFrame, DataFrame]:
    """(train, val) from one bucket draw: val = bucket < t, train = rest —
    disjoint and exhaustive by construction, stable under reruns."""
    thresh = int(val_fraction * SAMPLE_BUCKETS)
    b = sample_bucket(id_col, seed)
    return df.filter(b >= thresh), df.filter(b < thresh)


def group_split(
    df: DataFrame,
    group_col: str,
    val_fraction: float = 0.1,
    seed: int | str = "groupsplit",
) -> tuple[DataFrame, DataFrame]:
    """Leakage-safe (train, val) split keyed on a GROUP, not the row: the
    bucket draw hashes ``group_col`` (host, registered domain, source
    site), so every document of a group lands on the SAME side. The
    eval-contamination guard row-level splits cannot give — near-duplicate
    pages from one site otherwise straddle the boundary and the val set
    silently leaks into training.

    Same pure-Column membership as :func:`train_val_split` (two filters in
    the scan — no shuffle, no group table, no join), stable under reruns,
    repartitioning, and engines. Disjoint and exhaustive over non-null
    groups; NULL groups go to train (nothing to leak between)."""
    thresh = int(val_fraction * SAMPLE_BUCKETS)
    b = sample_bucket(group_col, seed)
    is_val = F.col(group_col).isNotNull() & (b < thresh)
    return df.filter(~is_val), df.filter(is_val)


def stratified_hash_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    seed: int | str = 0,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling — the training-mixture operator
    (e.g. keep 100% of books, 10% of web). One bucket compare against a
    stratum-dependent threshold; strata missing from ``fractions`` fall
    back to ``default_fraction``."""
    thresh = F.lit(int(default_fraction * SAMPLE_BUCKETS))
    for value, frac in sorted(fractions.items()):
        thresh = F.when(
            F.col(strata_col) == value, F.lit(int(frac * SAMPLE_BUCKETS))
        ).otherwise(thresh)
    return df.filter(sample_bucket(id_col, seed) < thresh)


def temperature_rates(
    df: DataFrame,
    strata_col: str,
    alpha: float = 0.5,
) -> DataFrame:
    """Per-stratum keep-thresholds for temperature resampling: sampling
    each stratum at rate (n_min / n_stratum)^(1-alpha) flattens the
    mixture toward p^alpha (the exponentiated-smoothing rebalance
    multilingual training uses — alpha=1 keeps the natural mixture,
    alpha=0 equalizes strata). The smallest stratum keeps 100% and larger
    ones downsample toward it; rates quantize to an integer bucket
    threshold out of SAMPLE_BUCKETS so membership is exact.

    Returns (strata_col, n, thresh). alpha=0.5 computes the rate via
    sqrt, which IEEE-754 rounds correctly in every engine — the
    bit-reproducible choice; other alphas go through pow (≤1 ulp, then
    the round-to-6 quantization absorbs it).

    Scale shape: one hash aggregate over the corpus (map-side partials,
    stratum cardinality is tiny), a broadcast of the 1-row min, and a
    tiny dim-table result for the caller to broadcast-join back."""
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("n"))
    n_min = counts.agg(F.min("n").alias("n_min"))
    ratio = F.col("n_min").cast("double") / F.col("n").cast("double")
    expo = 1.0 - alpha
    rate = F.sqrt(ratio) if expo == 0.5 else F.pow(ratio, F.lit(expo))
    return counts.crossJoin(F.broadcast(n_min)).select(
        strata_col,
        "n",
        F.floor(F.round(rate, 6) * SAMPLE_BUCKETS)
        .cast("bigint")
        .alias("thresh"),
    )


def temperature_resample(
    df: DataFrame,
    strata_col: str,
    alpha: float = 0.5,
    id_col: str = "doc_id",
    seed: int | str = 0,
) -> DataFrame:
    """Temperature-resampled corpus: each row's fate is its deterministic
    hash bucket vs its stratum's threshold — stable under reruns and
    repartitioning like every sampler here, so the rebalanced mixture is
    reproducible anywhere. One aggregate for the rates, one broadcast
    equi-join back, a pure filter in the scan; the corpus shuffles zero
    times."""
    rates = temperature_rates(df, strata_col, alpha).select(
        strata_col, "thresh"
    )
    return df.join(F.broadcast(rates), strata_col).filter(
        sample_bucket(id_col, seed) < F.col("thresh")
    )


# ---------------------------------------------------------------------------
# DSIR — data selection with importance resampling (Xie et al. 2023)
# ---------------------------------------------------------------------------

DSIR_SEED = "dsir"


def hashed_ngram_buckets(
    col: Column | str = "text", dim: int = 256, seed: str = DSIR_SEED
) -> Column:
    """Hashed n-gram feature buckets of a document: every unigram and
    bigram hashed into [0, dim) — duplicates kept (the feature is a count
    vector). Pure array expression in the scan; the portable hash keeps
    the bucketing engine-independent."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.filter(F.split(F.lower(c), r"\s+"), lambda t: t != F.lit(""))
    bis = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.transform(
        F.concat(toks, bis), lambda g: seeded_hash32(g, seed) % dim
    )


def bucket_counts(
    df: DataFrame, text_col: str = "text", dim: int = 256, seed: str = DSIR_SEED
) -> DataFrame:
    """(bucket, cnt) — corpus-wide hashed n-gram bucket counts: explode +
    ONE hash aggregate with map-side partials; result has ≤ dim rows."""
    return (
        df.select(
            F.explode(hashed_ngram_buckets(text_col, dim, seed)).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def dsir_log_weights(
    df: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 256,
    seed: str = DSIR_SEED,
) -> DataFrame:
    """Per-document DSIR importance log-weight: log p̂_target(doc) −
    log p̂_raw(doc) under Laplace-smoothed hashed-n-gram bag models —
    documents whose feature profile looks more like ``target`` than like
    the raw corpus score > 0. Returns (id_col, n_grams, logw·1e-6-rounded).

    logw = Σ_g [ln(tgt[g]+1) − ln(raw[g]+1)]
         + n_grams · [ln(rawN + dim) − ln(tgtN + dim)]

    Scale shape: two corpus aggregates produce ≤dim-row count tables; the
    per-bucket log-ratio table (raw LEFT JOIN tgt — every doc bucket
    exists in raw by construction) and the 1-row totals both broadcast;
    the per-doc pass is explode_outer → broadcast equi-join → hash
    re-aggregate on the id. explode_outer keeps zero-gram docs as a
    null-bucket row, so no corpus-sized join-back is ever needed —
    nothing bigger than the exploded gram table moves, and the only
    shuffle is the final per-doc aggregate."""
    raw = bucket_counts(df, text_col, dim, seed)
    tgt = bucket_counts(target, text_col, dim, seed)
    lr = (
        raw.alias("r")
        .join(tgt.alias("t"), ["bucket"], "left")
        .select(
            "bucket",
            (
                F.log(F.coalesce(F.col("t.cnt"), F.lit(0)) + 1)
                - F.log(F.col("r.cnt") + 1)
            ).alias("lr"),
        )
    )
    totals = raw.agg(F.sum("cnt").alias("rawN")).crossJoin(
        tgt.agg(F.sum("cnt").alias("tgtN"))
    )
    grams = df.select(
        F.col(id_col),
        F.explode_outer(
            hashed_ngram_buckets(text_col, dim, seed)
        ).alias("bucket"),
    )
    per_doc = (
        grams.join(F.broadcast(lr), ["bucket"], "left")
        .groupBy(id_col)
        .agg(
            F.coalesce(F.sum("lr"), F.lit(0.0)).alias("_s"),
            F.count("bucket").alias("n_grams"),
        )
    )
    norm = F.log(F.col("rawN") + dim) - F.log(F.col("tgtN") + dim)
    return per_doc.crossJoin(F.broadcast(totals)).select(
        id_col,
        "n_grams",
        F.round(F.col("_s") + F.col("n_grams") * norm, 6).alias("logw"),
    )


def dsir_select(
    df: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 256,
    seed: str = DSIR_SEED,
) -> DataFrame:
    """Rows of ``df`` whose DSIR log-weight is positive — the
    deterministic top-of-the-importance-ranking selection (the paper
    resamples with Gumbel noise; the reproducible-pipeline form thresholds
    the ranking instead)."""
    w = dsir_log_weights(df, target, text_col, id_col, dim, seed)
    return df.join(
        w.filter(F.col("logw") > 0).select(id_col), [id_col], "left_semi"
    )


def shard_assignments(
    df: DataFrame,
    n_shards: int = 16,
    id_col: str = "doc_id",
    seed: int | str = "shard",
) -> DataFrame:
    """Deterministic global shuffle for training export: every row gets a
    (shard, pos) — shard from its portable id hash, pos by hash order
    within the shard (ties by id). The permutation is a pure function of
    ids: stable across reruns, partitionings, and engines, so an
    interrupted export resumes to byte-identical shards.

    Scale shape: the window partitions BY SHARD — each sort is one
    shard's rows (corpus/n_shards), never global; pick n_shards so a
    shard fits an executor. For the write itself you'd skip pos and
    ``partitionBy(shard) + sortWithinPartitions(h)`` — this operator is
    the verifiable assignment table (exporters, resume logic, audits)."""
    from pyspark.sql import Window

    h = seeded_hash32(F.col(id_col).cast("string"), seed)
    w = Window.partitionBy("shard").orderBy(F.col("_h").asc(), F.col(id_col).asc())
    return (
        df.select(F.col(id_col), h.alias("_h"))
        .withColumn("shard", (F.col("_h") % n_shards).cast("int"))
        .withColumn("pos", F.row_number().over(w))
        .select(id_col, "shard", "pos")
    )


def mixture_plan(
    df: DataFrame,
    weights: dict[str, float],
    budget_tokens: int,
    source_col: str = "source",
    token_col: str | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Training-mixture planning: given target source WEIGHTS and a total
    token BUDGET, how much of each source to take. Returns per source:
    (source, n_docs, tokens, natural_share, target_share, tokens_needed,
    rate, epochs) where ``rate`` = tokens_needed / available (≤1 ⇒
    downsample at that rate, >1 ⇒ repeat the source ``epochs`` times — the
    up/down-sampling table a mixture config (Pile/Dolma-style weights)
    compiles to before :func:`stratified_hash_sample` or
    :func:`temperature_resample` executes it.

    Sources absent from ``weights`` get target 0 (excluded). Shape: ONE
    hash aggregate over the corpus; the weight table is a literal CASE
    chain; every derived number is fixed-point-rounded arithmetic over
    exact integer sums — engine-stable."""
    tok = (
        F.col(token_col)
        if token_col
        else F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    )
    per = df.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(tok).cast("long").alias("tokens"),
    )
    total = sum(weights.values())
    if total <= 0:
        raise ValueError("mixture weights must sum to a positive value")
    w = F.lit(0.0)
    for s, v in sorted(weights.items()):
        w = F.when(F.col(source_col) == s, F.lit(v / total)).otherwise(w)
    all_tokens = per.agg(F.sum("tokens").alias("_t"))
    return (
        per.crossJoin(F.broadcast(all_tokens))
        .select(
            source_col,
            "n_docs",
            "tokens",
            F.round(F.col("tokens") / F.col("_t"), 6).alias("natural_share"),
            F.round(w, 6).alias("target_share"),
            F.round(w * F.lit(float(budget_tokens))).cast("long").alias(
                "tokens_needed"
            ),
            F.round(
                F.round(w * F.lit(float(budget_tokens))) / F.col("tokens"), 6
            ).alias("rate"),
            F.ceil(
                F.round(w * F.lit(float(budget_tokens))) / F.col("tokens")
            ).cast("long").alias("epochs"),
        )
    )


def rendezvous_shard(
    id_col: Column | str,
    n_shards: int,
    seed: int | str = "hrw",
) -> Column:
    """Highest-random-weight (rendezvous, Thaler & Ravishankar 1998) shard
    of a key: argmax over shards of hash(seed:shard:key). The property
    mod-n sharding (:func:`shard_assignments`) lacks: growing n → n+1
    moves ONLY the keys the new shard wins — 1/(n+1) in expectation — and
    every moved key moves TO the new shard; mod-n reshuffles ~all keys.
    That is the difference between re-exporting one new shard and
    re-exporting the corpus when a 10^12-row dataset grows capacity (and
    the same property serves cache/worker affinity maps).

    Pure Column: the per-shard hash array is compile-time unrolled
    (n_shards ≤ a few hundred; beyond that, use consistent hashing with a
    broadcast ring table). First-max wins ties — deterministic, and the
    same rule the DuckDB mirror (list_indexof of the list max) applies."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    arr = F.array(
        *[seeded_hash32(c.cast("string"), f"{seed}:{s}") for s in range(n_shards)]
    )
    return (
        F.array_position(arr, F.array_max(arr)).cast("int") - 1
    ).alias("shard")


def shard_manifest(
    df: DataFrame,
    n_shards: int = 16,
    id_col: str = "doc_id",
    content_col: str = "text",
    seed: int | str = "shard",
) -> DataFrame:
    """Integrity manifest for a sharded export — (shard, n_docs, fp_a,
    fp_b): per-shard counts plus two independent content fingerprints,
    each the EXACT integer sum of a seeded hash of (id, content). Sums are
    order-insensitive and mergeable, so the manifest is identical at any
    parallelism and engine and never needs a sort; an interrupted/re-run
    export proves byte-identity by recomputing it (the verification
    companion to ``shard_assignments`` — same shard derivation). Two
    independent 32-bit hash sums make a silent collision across both
    ~2^-64 per shard.

    Scale shape: hashes in the scan projection, ONE hash aggregate keyed
    on the shard id."""
    h = seeded_hash32(F.col(id_col).cast("string"), seed)
    payload = F.concat(
        F.col(id_col).cast("string"), F.lit(":"), F.col(content_col)
    )
    return (
        df.select(
            (h % n_shards).cast("int").alias("shard"),
            seeded_hash32(payload, "manifest:a").alias("_fa"),
            seeded_hash32(payload, "manifest:b").alias("_fb"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_fa").alias("fp_a"),
            F.sum("_fb").alias("fp_b"),
        )
    )


def per_key_cap(
    df: DataFrame,
    key_col: str,
    max_per_key: int,
    id_col: str,
    seed: int | str = "keycap",
    n_salt: int | None = 8,
) -> DataFrame:
    """Per-key document cap (the Dolma/FineWeb-style per-domain spam
    guard): keep at most ``max_per_key`` rows per key, chosen
    deterministically — the rows with the smallest seeded id-hash (ties
    by id). Membership is a pure function of (key, id): stable across
    reruns, partitionings, and engines. Adds ``pos`` (1-based keep rank).

    Scale shape: a plain partition-by-key window sends EVERY row of a hot
    key through one task — exactly the skew this guard exists to fight —
    so the two-phase salted form is the DEFAULT (``n_salt=8``;
    ``n_salt=None`` opts out for known-flat keys): phase 1 ranks within
    (key, salt) buckets (hot key split ``n_salt`` ways) and keeps
    ``max_per_key`` per bucket; phase 2 re-ranks the surviving
    ``≤ max_per_key·n_salt`` candidates per key. The k globally smallest
    hashes of a key are each among their own bucket's k smallest, so the
    result is IDENTICAL to the single-phase form — only the plan changes.
    """
    from pyspark.sql import Window

    h = seeded_hash32(F.col(id_col).cast("string"), seed)
    out = df.withColumn("_h", h)
    if n_salt is not None:
        salt = seeded_hash32(F.col(id_col).cast("string"), f"{seed}~salt") % n_salt
        w1 = Window.partitionBy(key_col, salt).orderBy(
            F.col("_h").asc(), F.col(id_col).asc()
        )
        out = out.withColumn("_rn1", F.row_number().over(w1)).filter(
            F.col("_rn1") <= max_per_key
        )
    w = Window.partitionBy(key_col).orderBy(F.col("_h").asc(), F.col(id_col).asc())
    return (
        out.withColumn("pos", F.row_number().over(w))
        .filter(F.col("pos") <= max_per_key)
        .drop("_h", "_rn1")
    )


# A-ES key hash space: 32-bit hash + 1 over 2^32 + 1 keeps u strictly in
# (0, 1) so pow(u, 1/w) never degenerates to 0 or 1.
AES_SPACE = float((1 << 32) + 1)


def aes_key(
    id_col: Column | str, weight_col: Column | str, seed: str = "aes:v1"
) -> Column:
    """The Efraimidis–Spirakis weighted-sampling key u^(1/w): u is the
    row's deterministic hash-uniform in (0,1), w its weight. The k largest
    keys ARE a weighted sample without replacement (A-ES, Efraimidis &
    Spirakis 2006) — and because u comes from the portable hash family
    instead of an RNG, the draw is a pure function of (seed, id): stable
    under reruns, repartitioning, and engines, like every sampler here.
    DuckDB mirror: ``pow((('0x' || substr(md5('<seed>:' || id), 1, 8))::bigint
    + 1) / 4294967297.0, 1.0 / w)``. Cross-engine float caveat: division is
    exact IEEE in both engines and pow is ≤1 ulp — order flips would need
    two keys within ~1e-16 relative, below any realistic collision."""
    i = F.col(id_col) if isinstance(id_col, str) else id_col
    w = (F.col(weight_col) if isinstance(weight_col, str) else weight_col).cast(
        "double"
    )
    u = (seeded_hash32(i.cast("string"), seed) + 1).cast("double") / F.lit(AES_SPACE)
    return F.pow(u, F.lit(1.0) / w)


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    strata_col: str | None = None,
    seed: str = "aes:v1",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement: the k rows with
    the largest A-ES keys, per stratum when ``strata_col`` is given —
    inclusion probability proportional to weight, reproducible anywhere
    (the training-mixture form of "sample 1M docs favouring high-quality
    ones"). Non-positive weights are excluded (never sampleable). Adds
    ``key`` (rounded 1e-6, for audits) and ``rank`` (1-based, key desc).

    Scale shape: the key is a pure Column in the scan. Per-stratum the
    top-k is a window shuffled BY STRATUM (each sort sees one stratum's
    rows); global top-k plans as a distributed TakeOrderedAndProject via
    ``orderBy().limit()`` — the final rank window then orders ≤k rows,
    never the corpus."""
    from pyspark.sql import Window

    key = aes_key(id_col, weight_col, seed)
    base = df.filter(F.col(weight_col) > 0).withColumn("_key", key)
    order = [F.col("_key").desc(), F.col(id_col).asc()]
    if strata_col is not None:
        win = Window.partitionBy(strata_col).orderBy(*order)
        out = base.withColumn("rank", F.row_number().over(win)).filter(
            F.col("rank") <= k
        )
    else:
        top = base.orderBy(*order).limit(k)
        out = top.withColumn("rank", F.row_number().over(Window.orderBy(*order)))
    return out.withColumn("key", F.round(F.col("_key"), 6)).drop("_key")


def quantile_threshold(
    df: DataFrame, score_col: str, q: float
) -> DataFrame:
    """Exact q-quantile of a LOW-CARDINALITY score column as a 1-row
    DataFrame (threshold) — no global sort of the data.

    Definition (exact, engine-portable): the smallest score value v such
    that ``count(score <= v) >= ceil(q * n)``. Works on scores that have
    been rounded to a fixed precision (the repo convention is 1e-6), so the
    distinct-value table is bounded by the score domain, not the corpus:
    two phases, (1) a value histogram — one hash aggregate with map-side
    partials — then (2) a cumulative sum over that tiny distinct-value
    table. The running-sum window IS unpartitioned, but over ≤|score
    domain| rows (same justification as the per-bucket offset table in
    operators/packing.py), never over the data.

    This is the exact alternative to ``approxQuantile``/``percentile_approx``
    whose sketch contents are engine-private and partition-dependent — a
    threshold derived here reproduces bit-for-bit on rerun, at any
    parallelism, and in DuckDB.
    """
    if not 0.0 < q <= 1.0:
        raise ValueError(f"q must be in (0, 1], got {q}")
    from pyspark.sql.window import Window

    hist = df.groupBy(F.col(score_col).alias("_v")).agg(
        F.count(F.lit(1)).alias("_n")
    )
    w = (
        Window.orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.select(
        "_v",
        F.sum("_n").over(w).alias("_cum"),
        F.sum("_n").over(
            Window.orderBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("_total"),
    )
    return (
        cum.filter(F.col("_cum") >= F.ceil(F.lit(q) * F.col("_total")))
        .agg(F.min("_v").alias("threshold"))
    )


def stratified_quantile_thresholds(
    df: DataFrame,
    strata_col: str,
    score_col: str,
    qs: tuple[tuple[int, int], ...] = ((1, 3), (2, 3)),
) -> DataFrame:
    """Exact per-stratum quantile thresholds — (strata, q_num, q_den,
    threshold), one row per stratum per requested quantile. Same exact
    histogram construction as ``quantile_threshold`` but the cumulative
    window partitions BY STRATUM (each running sum sees one stratum's
    distinct score values, never the data, never a global window).

    Quantiles are passed as RATIONALS (num, den): the target rank
    ceil(num·total/den) = (num·total + den − 1) // den stays integer
    arithmetic — a float q·total can land ±1 ulp around an integer and
    flip ceil() differently per engine. Products stay < 2^53 for any
    realistic corpus, so the double floor-division below is exact."""
    from pyspark.sql.window import Window

    hist = df.groupBy(
        F.col(strata_col), F.col(score_col).alias("_v")
    ).agg(F.count(F.lit(1)).alias("_n"))
    w_cum = (
        Window.partitionBy(strata_col)
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy(strata_col).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = hist.select(
        strata_col,
        "_v",
        F.sum("_n").over(w_cum).alias("_cum"),
        F.sum("_n").over(w_tot).alias("_total"),
    )
    quants = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(n).cast("bigint").alias("q_num"),
                    F.lit(d).cast("bigint").alias("q_den"),
                )
                for n, d in qs
            ]
        )
    )
    expanded = cum.select(strata_col, "_v", "_cum", "_total", quants.alias("_q"))
    rank = F.floor(
        (F.col("_q.q_num") * F.col("_total") + F.col("_q.q_den") - 1)
        / F.col("_q.q_den")
    ).cast("bigint")
    return (
        expanded.filter(F.col("_cum") >= rank)
        .groupBy(
            F.col(strata_col),
            F.col("_q.q_num").alias("q_num"),
            F.col("_q.q_den").alias("q_den"),
        )
        .agg(F.min("_v").alias("threshold"))
    )


def ccnet_buckets(
    df: DataFrame,
    strata_col: str,
    score_col: str,
    labels: tuple[str, str, str] = ("tail", "middle", "head"),
    qs: tuple[tuple[int, int], tuple[int, int]] = ((1, 3), (2, 3)),
) -> DataFrame:
    """CCNet-style per-stratum tercile bucketing (Wenzek et al. 2020):
    split every stratum (language) into three quality buckets by the
    EXACT per-stratum quantiles of a score column — score ≤ q1-threshold
    ⇒ labels[0], ≤ q2-threshold ⇒ labels[1], else labels[2]. CCNet labels
    ascending LM familiarity tail/middle/head; pass reversed labels for
    descending-is-better scores. Adds a ``bucket`` column.

    Scale shape: the threshold table is strata-cardinality-sized — it
    broadcasts; the bucket label is then a pure Column over one
    broadcast equi-join. Ties at a tercile boundary all take the lower
    bucket (deterministic, partitioning-independent)."""
    (n1, d1), (n2, d2) = qs
    thr = stratified_quantile_thresholds(df, strata_col, score_col, qs)
    pivoted = thr.groupBy(strata_col).agg(
        F.min(
            F.when(
                (F.col("q_num") == n1) & (F.col("q_den") == d1),
                F.col("threshold"),
            )
        ).alias("_t1"),
        F.min(
            F.when(
                (F.col("q_num") == n2) & (F.col("q_den") == d2),
                F.col("threshold"),
            )
        ).alias("_t2"),
    )
    out = df.join(F.broadcast(pivoted), [strata_col])
    bucket = (
        F.when(F.col(score_col) <= F.col("_t1"), F.lit(labels[0]))
        .when(F.col(score_col) <= F.col("_t2"), F.lit(labels[1]))
        .otherwise(F.lit(labels[2]))
    )
    return out.withColumn("bucket", bucket).drop("_t1", "_t2")


def quantile_gate(
    df: DataFrame, score_col: str, keep_top: float
) -> DataFrame:
    """Keep the top ``keep_top`` fraction of rows by score: rows with
    ``score >= quantile_threshold(1 - keep_top)``. Ties at the boundary are
    kept, so ``keep_top`` is a LOWER bound on the kept fraction — a tie
    block spanning the quantile survives whole (deterministic, unlike
    row_number-based cuts whose tie resolution needs a secondary key).
    The 1-row threshold rides a broadcast join — the corpus never sorts,
    never shuffles."""
    thr = quantile_threshold(df, score_col, 1.0 - keep_top)
    return (
        df.crossJoin(F.broadcast(thr))
        .filter(F.col(score_col) >= F.col("threshold"))
        .drop("threshold")
    )


def stride_interleave(
    df: DataFrame,
    source_col: str,
    weights: dict,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic weighted interleaving of corpus sources — the
    training-data ORDERING stage after :func:`mixture_plan` picks
    proportions: documents from source s appear in the merged stream at
    rate ∝ ``weights[s]``, evenly spread (stride scheduling / weighted
    round-robin), not in per-source blocks that would make late training
    steps see a single distribution.

    Each doc gets (source_idx, interleave_key): source_idx = its rank
    within its source (deterministic, ordered by id); interleave_key =
    (2·i − 1)·(L div w_s) with L = lcm(weights) — stride scheduling's
    virtual time (i − ½)/w_s scaled by 2·L, which is EXACTLY integral
    (L div w_s is exact by construction of L), so sorting by
    (interleave_key, source, id) is the evenly-interleaved order with no
    floor collapsing distinct virtual times. INTEGER arithmetic
    throughout ⇒ the order is identical at any parallelism and in any
    engine. Sources absent from ``weights`` are dropped (weight 0).

    Scale shape: ONE per-source window (row_number shuffles on source —
    salt a pathologically hot source upstream) and a pure-Column key. The
    key IS the training order: writers range-shuffle by it
    (repartitionByRange + sortWithinPartitions) rather than materialize a
    dense global position, which would cost a global rank; for bounded
    tables a downstream sort by key is the dense order."""
    import math

    from pyspark.sql import Window

    if not weights:
        raise ValueError("weights must be non-empty")
    if any(int(w) != w or w < 1 for w in weights.values()):
        raise ValueError("weights must be positive integers")
    lcm = 1
    for wt in weights.values():
        lcm = math.lcm(lcm, int(wt))
    src = F.col(source_col)
    mult_col = None  # per-source exact multiplier L div w_s
    for s, wt in sorted(weights.items()):
        branch = (src == F.lit(s), F.lit(lcm // int(wt)))
        mult_col = (
            F.when(*branch) if mult_col is None else mult_col.when(*branch)
        )
    w = Window.partitionBy(source_col).orderBy(id_col)
    out = (
        df.filter(src.isin(*[F.lit(s) for s in weights]))
        .withColumn("source_idx", F.row_number().over(w).cast("bigint"))
        .withColumn("_m", mult_col.cast("bigint"))
    )
    key = (F.lit(2) * F.col("source_idx") - F.lit(1)) * F.col("_m")
    return out.withColumn(
        "interleave_key", key.cast("bigint")
    ).drop("_m")


# Poisson(1) cumulative probabilities e^-1 · Σ 1/j! for j ≤ k — shared
# verbatim with the DuckDB oracle builder so replicate counts match exactly
POISSON1_CDF = (
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238463,
    0.9963401531726563,
    0.9994058151824183,
)


def poisson_bootstrap(
    df: DataFrame,
    value_col: str,
    id_col: str = "doc_id",
    n_reps: int = 50,
    seed: str = "boot",
) -> DataFrame:
    """Poisson bootstrap over a metric column — THE distributed bootstrap
    (resampling 10^12 rows with replacement is impossible, but each row's
    replicate multiplicity in a bootstrap resample is ~Poisson(1), and
    those are independent per row): row i enters replicate r with weight
    k drawn by inverting the Poisson(1) CDF at the row's deterministic
    hash-uniform u(seed, r, i). Like every sampler here the draw is a
    pure function of (seed, rep, id) — reruns, partitionings, and engines
    agree on every weight, so the oracle re-derives the full resample.

    Returns one row per replicate: (rep, n_eff = Σk, mean = Σk·x / Σk,
    rounded 1e-6). Downstream, the spread of the ``n_reps`` means IS the
    sampling distribution of the metric — percentile CIs, std errors —
    the uncertainty statement a 100-TB quality dashboard needs next to
    every point estimate.

    Scale shape: one ``explode(sequence(0, n_reps-1))`` fan-out (bounded:
    ×n_reps, not ×rows) + ONE hash aggregate keyed on rep; the weight is
    a codegen'd when-chain, no UDF, no window, no second pass. Weights
    ≥ 6 (probability 8·10^-5 under Poisson(1)) clamp to 6 — identically
    in both engines, so the clamp is invisible to verification."""
    rep = F.explode(F.sequence(F.lit(0), F.lit(n_reps - 1))).alias("rep")
    rows = df.select(
        F.col(id_col).cast("string").alias("_id"),
        F.col(value_col).cast("double").alias("_x"),
        rep,
    )
    u = (
        seeded_hash32(
            F.concat_ws(":", F.col("rep").cast("string"), F.col("_id")), seed
        ).cast("double")
        + F.lit(0.5)
    ) / F.lit(4294967296.0)
    k = F.lit(6)
    for j in range(len(POISSON1_CDF) - 1, -1, -1):
        k = F.when(u < F.lit(POISSON1_CDF[j]), F.lit(j)).otherwise(k)
    return (
        rows.withColumn("_k", k.cast("bigint"))
        .groupBy("rep")
        .agg(
            F.sum("_k").alias("n_eff"),
            # Explicit NULL contract for the degenerate replicate that
            # draws weight 0 for every row (probability 0.368^n — real on
            # tiny inputs): mean is NULL, never a 0/0 artifact, so
            # downstream CI math must filter n_eff = 0 replicates.
            F.when(
                F.sum("_k") > 0,
                F.round(F.sum(F.col("_k") * F.col("_x")) / F.sum("_k"), 6),
            ).alias("mean"),
        )
    )


def winsorize(
    df: DataFrame, col: str, q_lo: float = 0.01, q_hi: float = 0.99
) -> DataFrame:
    """Winsorize a numeric column to its exact [q_lo, q_hi] quantiles —
    the standard tail-clamp before any mean/variance-based corpus metric
    or training-weight derivation (a handful of 100 MB outlier documents
    otherwise own the average). Adds ``<col>_w`` = value clamped into the
    two thresholds; all rows survive (contrast :func:`quantile_gate`,
    which drops).

    Scale shape: both thresholds come from :func:`quantile_threshold`'s
    exact value-histogram construction (one hash aggregate + a window
    over the bounded distinct-value table, never a data sort), then ride
    a broadcast 1-row cross join; the clamp itself is a codegen'd
    least/greatest in the scan projection."""
    if not q_lo < q_hi:
        raise ValueError(f"q_lo must be < q_hi, got {q_lo} >= {q_hi}")
    lo = quantile_threshold(df, col, q_lo).select(
        F.col("threshold").alias("_lo")
    )
    hi = quantile_threshold(df, col, q_hi).select(
        F.col("threshold").alias("_hi")
    )
    return (
        df.crossJoin(F.broadcast(lo))
        .crossJoin(F.broadcast(hi))
        .withColumn(
            f"{col}_w",
            F.least(F.greatest(F.col(col), F.col("_lo")), F.col("_hi")),
        )
        .drop("_lo", "_hi")
    )
