"""Deduplication operators for training-data pipelines.

Exact, MinHash+LSH, SimHash, n-gram Jaccard, and embedding-cosine near-dup —
each Spark-first (Column expressions + shuffle-conscious joins), each with a
DuckDB-expressible formulation (portable md5-based hashing, see
functions/hashing.py) so the driver's oracle can verify values.

Scale design (the point of each variant):
  * exact       — one hash-groupBy; shuffle on a 128-bit key, no skew.
  * n-gram Jaccard — EXACT pairwise similarity via shingle inverted index;
    hot (stopword) shingles explode the self-join, so the scale form caps
    per-shingle doc-frequency (max_doc_freq) before joining.
  * MinHash+LSH — fixed-size signature per doc (k hashes), band-bucket join:
    candidates only for docs sharing a band. Shuffle is O(docs × bands) tiny
    rows; hot buckets are bounded by band width. THE scale path for text.
  * SimHash     — one 32/64-bit int per doc; near-dups = small Hamming
    distance. Pairs via pigeonhole chunk blocking (equi-join on fingerprint
    bit-slices, zero recall loss) — the exact all-pairs self-join survives
    only as simhash_pairs_exact, a test oracle.
  * embedding cosine — exact pairwise over a vector column (baseline); the
    composed scale path is similarity.embedding_near_dups_lsh (SRP-bucket
    candidates → exact cosine verify).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from logsight_filebeat_spark.functions.caching import track_persist
from logsight_filebeat_spark.functions.hashing import md5_hex, seeded_hash32


# ---------------------------------------------------------------------------
# exact
# ---------------------------------------------------------------------------

def exact_dup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Groups of byte-identical texts: (text_hash, dup_count, keep_id) for
    groups with >1 member. keep_id = min id (deterministic survivor)."""
    return (
        df.select(md5_hex(F.col(text_col)).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(
            F.count(F.lit(1)).alias("dup_count"),
            F.min(id_col).alias("keep_id"),
        )
        .filter(F.col("dup_count") > 1)
    )


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the min-id row per identical text. Implemented as groupBy-min +
    semi join (two narrow shuffles on the same key; Catalyst plans one
    exchange reuse) rather than a window — windows sort within partitions,
    the agg+join shape only hashes."""
    keep = (
        df.select(md5_hex(F.col(text_col)).alias("_h"), F.col(id_col).alias("_keep"))
        .groupBy("_h")
        .agg(F.min("_keep").alias("_keep"))
    )
    return (
        df.withColumn("_h", md5_hex(F.col(text_col)))
        .join(keep, ["_h"], "inner")
        .filter(F.col(id_col) == F.col("_keep"))
        .drop("_h", "_keep")
    )


# ---------------------------------------------------------------------------
# shingles + exact n-gram Jaccard
# ---------------------------------------------------------------------------

def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles (space-joined, lowercased). Texts with
    fewer than n tokens yield an empty array (guarded: Spark's sequence(1, 0)
    DESCENDS to [1, 0], which would feed slice an illegal start of 0)."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.filter(F.split(F.lower(c), r"\s+"), lambda t: t != F.lit(""))
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    grams = F.transform(
        idx, lambda i: F.array_join(F.slice(toks, i, n), " ")
    )
    return F.when(F.size(toks) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def shingle_table(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """(id, shingle) inverted index + per-doc shingle count."""
    sh = df.select(
        F.col(id_col).alias("id"), word_shingles(text_col, n).alias("shingles")
    ).filter(F.size("shingles") > 0)
    return sh.select(
        "id", F.size("shingles").alias("n_shingles"), F.explode("shingles").alias("shingle")
    )


def jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.6,
    max_doc_freq: int | None = 1000,
) -> DataFrame:
    """EXACT n-gram Jaccard over candidate pairs sharing ≥1 shingle.
    Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard rounded to 6.

    Scale note: the shingle self-join is quadratic in the hottest shingle's
    document frequency — a stopword shingle can touch every doc. The scale
    guard is ``max_doc_freq``: shingles appearing in more than that many
    docs are dropped from the shingle universe BEFORE the self-join (they
    carry ~no Jaccard signal — two docs sharing only stopword shingles are
    not near-dups), bounding the join fan-out at candidates × max_doc_freq.
    Jaccard is then computed over the capped universe (per-doc sizes are
    recounted over surviving shingles, so the measure stays a true Jaccard
    of the reduced sets). The default cap (1000) makes the scale-safe form
    the default; pass ``None`` explicitly for the exact full-universe form —
    the verification-scale baseline (dd_jaccard registers it that way)."""
    inv = shingle_table(df, text_col, id_col, n)
    if max_doc_freq is not None:
        keep = (
            inv.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") <= max_doc_freq)
            .select("shingle")
        )
        inv = inv.drop("n_shingles").join(keep, ["shingle"], "inner")
        sizes = inv.groupBy("id").agg(F.count(F.lit(1)).alias("n_shingles"))
        inv = inv.join(sizes, ["id"], "inner")
    inv = track_persist(inv)  # both sides of the shingle self-join
    a = inv.alias("a")
    b = inv.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.n_shingles").alias("na"),
            F.col("b.n_shingles").alias("nb"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
    max_doc_freq: int | None = 1000,
) -> DataFrame:
    """EXACT n-gram CONTAINMENT over candidate pairs sharing ≥1 shingle:
    (id_small, id_big, containment) with containment = |A∩B| / |smaller
    set| — the asymmetric near-dup measure Jaccard structurally misses.
    A page fully embedded in a longer one (article + boilerplate, quote
    farms, aggregator wrappers) has containment ≈ 1 while its Jaccard is
    only |A|/|B| — arbitrarily low — so a Jaccard gate never fires. Web
    dedup recipes run BOTH: Jaccard for same-size near-dups, containment
    for subset duplication. ``id_small`` is the doc with the smaller
    (tie: lower id) shingle set — the one a keep-the-superset policy
    would drop.

    Same scale shape as :func:`jaccard_pairs` (one shingle self-join,
    fan-out bounded by ``max_doc_freq``; containment computed over the
    same capped universe, sizes recounted so the measure stays exact)."""
    inv = shingle_table(df, text_col, id_col, n)
    if max_doc_freq is not None:
        keep = (
            inv.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") <= max_doc_freq)
            .select("shingle")
        )
        inv = inv.drop("n_shingles").join(keep, ["shingle"], "inner")
        sizes = inv.groupBy("id").agg(F.count(F.lit(1)).alias("n_shingles"))
        inv = inv.join(sizes, ["id"], "inner")
    inv = track_persist(inv)
    a = inv.alias("a")
    b = inv.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.n_shingles").alias("na"),
            F.col("b.n_shingles").alias("nb"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    small_is_a = (F.col("na") < F.col("nb")) | (
        (F.col("na") == F.col("nb")) & (F.col("id_a") < F.col("id_b"))
    )
    return (
        inter.select(
            F.when(small_is_a, F.col("id_a")).otherwise(F.col("id_b")).alias(
                "id_small"
            ),
            F.when(small_is_a, F.col("id_b")).otherwise(F.col("id_a")).alias(
                "id_big"
            ),
            F.round(
                F.col("inter") / F.least("na", "nb"), 6
            ).alias("containment"),
        )
        .filter(F.col("containment") >= threshold)
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

# universal-hash family over one base md5 hash: h_i = (A_i·h + B_i) mod P.
# One md5 per shingle (the expensive part: md5+hex→int conversion), then k
# cheap integer ops — the textbook minhash construction, and ~8× less hash
# work than k independent seeded md5 passes. P = 2^31-1 (Mersenne prime);
# A_i/B_i are fixed odd constants so both engines reproduce bit-for-bit.
MINHASH_P = 2_147_483_647


def _family_coeffs(i: int) -> tuple[int, int]:
    return (2 * i + 1) * 40_503 + 1, i * 1_000_003 + 12_289


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 8,
) -> DataFrame:
    """(id, mh_0..mh_{k-1}): per-family-member min over the doc's shingle
    hashes. Computed entirely inside one projection (array transforms +
    array_min) — NO explode, NO shuffle: the signature is a map over the doc.
    The base hash array is materialized once per row; the k family members
    are integer transforms of it."""
    base = F.transform(word_shingles(text_col, n), lambda s: seeded_hash32(s, 0))
    hashed = df.select(F.col(id_col).alias("id"), base.alias("_h"))
    sigs = hashed.select(
        "id",
        *[
            F.array_min(
                F.transform(F.col("_h"), _family_transform(i))
            ).alias(f"mh_{i}")
            for i in range(num_hashes)
        ],
    )
    return sigs.filter(F.col("mh_0").isNotNull())


def _family_transform(i: int):
    a, b = _family_coeffs(i)
    return lambda h: (h * a + b) % MINHASH_P


def band_buckets(
    sigs: DataFrame, num_hashes: int = 8, bands: int = 2
) -> DataFrame:
    """(id, bucket) rows — each signature banded into ``bands`` buckets
    (md5 of the band index + its signature components). The ONE definition
    of band bucketing: same-table candidates (lsh_candidates) and
    cross-table probes (incremental_dedup) both build on it, so a bucket
    computed over one corpus is joinable against a bucket computed over
    another."""
    rows = num_hashes // bands
    parts = []
    for b in range(bands):
        band_cols = [F.col(f"mh_{b * rows + r}") for r in range(rows)]
        bucket = md5_hex(F.concat_ws("_", F.lit(b), *band_cols))
        parts.append(sigs.select(F.col("id"), bucket.alias("bucket")))
    buckets = parts[0]
    for p in parts[1:]:
        buckets = buckets.unionAll(p)
    return buckets


def lsh_candidates(
    sigs: DataFrame, num_hashes: int = 8, bands: int = 2
) -> DataFrame:
    """Band the signature, bucket-join per band, union distinct pairs.
    Shuffle: (docs × bands) rows keyed by (band, bucket-hash) — the scalable
    candidate generator. Returns (id_a, id_b) distinct.

    The band union + self-join reads ``sigs`` 2×bands times — persist it
    (minhash_lsh_pairs does via track_persist) or the signature projection
    recomputes per read."""
    buckets = band_buckets(sigs, num_hashes, bands)
    a = buckets.alias("a")
    b2 = buckets.alias("b")
    return (
        a.join(b2, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 8,
    bands: int = 2,
) -> DataFrame:
    """Signatures are persisted before the candidate join: the band union and
    the self-join fan the signature scan out 2×bands ways, and recomputing
    the shingle-hash projection per read dominates everything else. (At real
    scale: write signatures to a table, then candidate-join over it.)
    Caller releases the cache after its action (functions/caching.py)."""
    sigs = track_persist(minhash_signatures(df, text_col, id_col, n, num_hashes))
    return lsh_candidates(sigs, num_hashes, bands)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash(col: Column | str, bits: int = 32) -> Column:
    """SimHash over distinct lowercase tokens: bit i of the result is the
    sign of sum over tokens of ±1 by bit i of the token's portable hash.
    One Column expression, no shuffle.

    Single-pass shape: hash each token ONCE (md5 is the expensive step), fold
    the per-bit set-bit counts elementwise into one array, then assemble the
    fingerprint — O(tokens + bits) hash/array work instead of the naive
    O(tokens × bits) re-hash per bit. vote_i > 0 ⇔ 2·set_count_i > n."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.array_distinct(
        F.filter(F.split(F.lower(c), r"\s+"), lambda t: t != F.lit(""))
    )
    hashes = F.transform(toks, lambda t: seeded_hash32(t, "simhash"))
    # per-token bit vector (bit positions are compile-time ints), folded
    # elementwise into per-bit set counts
    counts = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0).cast("bigint"), bits),
        lambda acc, h: F.zip_with(
            acc,
            F.array(
                *[
                    F.shiftright(h, i).bitwiseAND(F.lit(1)).cast("bigint")
                    for i in range(bits)
                ]
            ),
            lambda a, b: a + b,
        ),
    )
    n_tok = F.size(hashes).cast("bigint")
    weights = F.array(*[F.lit(2**i).cast("bigint") for i in range(bits)])
    return F.aggregate(
        F.zip_with(
            counts,
            weights,
            lambda cnt, weight: F.when(cnt * 2 > n_tok, weight).otherwise(
                F.lit(0).cast("bigint")
            ),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def simhash_chunks(
    sigs: DataFrame, bits: int = 32, max_hamming: int = 3
) -> DataFrame:
    """Pigeonhole blocking index over (id, sh): each fingerprint explodes to
    ``max_hamming + 1`` rows of (id, sh, chunk_idx, chunk_val), the chunks
    being disjoint bit-slices of the fingerprint. If two fingerprints differ
    in ≤ max_hamming bits, those differing bits land in at most max_hamming
    of the max_hamming+1 chunks — so AT LEAST ONE chunk is bit-identical,
    and an equi-join on (chunk_idx, chunk_val) finds every qualifying pair
    with zero recall loss (the classic Hamming-pigeonhole construction)."""
    n_chunks = max_hamming + 1
    chunk_bits = -(-bits // n_chunks)  # ceil — last chunk may be narrower
    mask = F.lit((1 << chunk_bits) - 1)
    chunks = F.array(
        *[
            F.struct(
                F.lit(i).alias("chunk_idx"),
                F.shiftright(F.col("sh"), i * chunk_bits)
                .bitwiseAND(mask)
                .alias("chunk_val"),
            )
            for i in range(n_chunks)
        ]
    )
    return sigs.select("id", "sh", F.explode(chunks).alias("c")).select(
        "id", "sh", F.col("c.chunk_idx").alias("chunk_idx"),
        F.col("c.chunk_val").alias("chunk_val"),
    )


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ max_hamming — blocked.

    Scale shape: NO cross join anywhere. Fingerprints explode to
    max_hamming+1 chunk rows (simhash_chunks), candidates come from an
    equi-join on (chunk_idx, chunk_val) — a hash-partitioned shuffle on the
    chunk key, near-linear in docs for well-spread fingerprints — then exact
    Hamming verification on the candidates, then distinct() (a pair closer
    than one chunk's worth of agreement matches in several chunks). Proven
    identical to the exact all-pairs form (simhash_pairs_exact) by the
    pigeonhole argument and pinned by tests + the dd_simhash oracle."""
    s = df.select(F.col(id_col).alias("id"), simhash(text_col, bits).alias("sh"))
    ch = track_persist(simhash_chunks(s, bits, max_hamming))
    a, b = ch.alias("a"), ch.alias("b")
    ham = F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh")))
    return (
        a.join(
            b,
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def simhash_pairs_exact(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
    max_hamming: int = 3,
) -> DataFrame:
    """All-pairs reference form: self-join (id_a < id_b) + bit_count(xor).
    O(n²) rows through the join — kept ONLY as the test oracle proving the
    blocked form loses nothing; never the production path."""
    s = track_persist(
        df.select(F.col(id_col).alias("id"), simhash(text_col, bits).alias("sh"))
    )
    a, b = s.alias("a"), s.alias("b")
    ham = F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh")))
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------

def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine over two array<double> columns — fold left-to-right, matching
    DuckDB's list_cosine_similarity bit-for-bit on doubles."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, x: s + x))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x), F.lit(0.0), lambda s, x: s + x))
    return dot / (na * nb)


def embedding_near_dups(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
) -> DataFrame:
    """Exact pairwise cosine ≥ threshold, id_a < id_b. Quadratic — the
    verification-scale baseline; the one-call scale path is
    similarity.embedding_near_dups_lsh (SRP-bucket candidates → exact
    cosine verify, bucket equi-join instead of this cross join)."""
    s = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    a, b = s.alias("a"), s.alias("b")
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(cosine_sim(F.col("a.v"), F.col("b.v")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


# ---------------------------------------------------------------------------
# exact substring dedup (duplicated token windows)
# ---------------------------------------------------------------------------

def substring_windows(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    width: int = 20,
) -> DataFrame:
    """(id, pos, win_hash): md5 of every ``width``-token rolling window,
    position-indexed (pos is 0-based token offset) so callers can mask or
    cut the duplicated span, not just flag the doc. Case-preserving and
    NOT distinct — exact substring dedup cares about verbatim repeats.

    This is the distributed-join formulation of exact substring dedup
    (the operation popularized for LLM training corpora by Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better", which uses
    a suffix array on one node): rolling window hashes explode to one row
    per token position — O(total corpus tokens) rows, the same order as a
    shingle inverted index — and every downstream step is a hash
    aggregate / equi-join on the 128-bit window hash. No suffix array, no
    single-node structure, nothing quadratic."""
    from logsight_filebeat_spark.functions.text import tokens

    d = df.select(F.col(id_col).alias("id"), tokens(text_col).alias("t"))
    idx = F.sequence(F.lit(1), F.size("t") - (width - 1))
    wins = F.when(
        F.size("t") >= width,
        F.transform(
            idx, lambda i: md5_hex(F.array_join(F.slice("t", i, width), " "))
        ),
    ).otherwise(F.array().cast("array<string>"))
    return d.select("id", F.posexplode(wins).alias("pos", "win_hash"))


def duplicated_substrings(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    width: int = 20,
    min_docs: int = 2,
) -> DataFrame:
    """Window hashes appearing in ≥ ``min_docs`` DISTINCT docs:
    (win_hash, n_docs). One explode + one hash aggregate."""
    w = substring_windows(df, text_col, id_col, width)
    return (
        w.groupBy("win_hash")
        .agg(F.count_distinct("id").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )


def substring_dup_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    width: int = 20,
) -> DataFrame:
    """Per-doc duplicated-substring exposure: (id, n_windows, dup_windows,
    dup_ratio) where dup_windows counts this doc's window POSITIONS whose
    window also occurs in another doc — the mass a span-cutting pass would
    remove. Docs shorter than ``width`` tokens have n_windows = 0 and ratio
    0.0 (nothing to deduplicate at this granularity).

    Shape: windows persisted once, feeding (a) the duplicated-hash aggregate
    and (b) the join-back — both shuffle on win_hash; per-doc counts are one
    more hash aggregate on id. Caller releases the tracked persist."""
    w = track_persist(substring_windows(df, text_col, id_col, width))
    dup = (
        w.groupBy("win_hash")
        .agg(F.count_distinct("id").alias("n_docs"))
        .filter(F.col("n_docs") >= 2)
        .select("win_hash")
    )
    per_doc = w.groupBy("id").agg(F.count(F.lit(1)).alias("n_windows"))
    dup_per_doc = (
        w.join(dup, ["win_hash"], "inner")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("dup_windows"))
    )
    base = df.select(F.col(id_col).alias("id")).distinct()
    return (
        base.join(per_doc, ["id"], "left")
        .join(dup_per_doc, ["id"], "left")
        .select(
            "id",
            F.coalesce("n_windows", F.lit(0)).alias("n_windows"),
            F.coalesce("dup_windows", F.lit(0)).alias("dup_windows"),
            F.round(
                F.coalesce("dup_windows", F.lit(0))
                / F.greatest(F.coalesce("n_windows", F.lit(0)), F.lit(1)),
                6,
            ).alias("dup_ratio"),
        )
    )


def contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    width: int = 20,
) -> DataFrame:
    """Benchmark decontamination: corpus docs sharing a verbatim
    ``width``-token run with ANY benchmark doc — the overlap check LLM
    pipelines run against eval sets before training. Returns
    (id, n_windows, hit_windows, benchmark_docs) per CONTAMINATED corpus
    doc: how many of its window positions match the benchmark, and how
    many distinct benchmark docs it hits.

    Shape: both sides explode to window hashes (O(tokens) rows) and meet
    in one equi-join on the 128-bit hash — the benchmark side is typically
    tiny (eval sets), so Catalyst broadcasts its distinct hash set and the
    corpus side never shuffles."""
    cw = substring_windows(corpus, text_col, id_col, width)
    bw = substring_windows(benchmark, text_col, id_col, width).select(
        F.col("win_hash"), F.col("id").alias("bench_id")
    )
    hits = (
        cw.join(bw, ["win_hash"], "inner")
        .groupBy("id")
        .agg(
            F.count_distinct("pos").alias("hit_windows"),
            F.count_distinct("bench_id").alias("benchmark_docs"),
        )
    )
    totals = cw.groupBy("id").agg(F.count(F.lit(1)).alias("n_windows"))
    return hits.join(totals, ["id"], "inner").select(
        "id", "n_windows", "hit_windows", "benchmark_docs"
    )


def minhash_estimate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 8,
    bands: int = 2,
    threshold: float = 0.5,
) -> DataFrame:
    """LSH candidates + the textbook MinHash Jaccard ESTIMATE: fraction of
    agreeing signature components — (id_a, id_b, est_jaccard) for estimates
    ≥ threshold. The estimate costs one signature equi-join over the
    candidate list (k integer comparisons per pair), no shingle re-read:
    the cheap filter large pipelines run between LSH candidates and any
    exact verification pass."""
    sigs = track_persist(minhash_signatures(df, text_col, id_col, n, num_hashes))
    cand = lsh_candidates(sigs, num_hashes, bands)
    a = sigs.select(
        F.col("id").alias("id_a"),
        *[F.col(f"mh_{i}").alias(f"a_{i}") for i in range(num_hashes)],
    )
    b = sigs.select(
        F.col("id").alias("id_b"),
        *[F.col(f"mh_{i}").alias(f"b_{i}") for i in range(num_hashes)],
    )
    matches = sum(
        F.when(F.col(f"a_{i}") == F.col(f"b_{i}"), 1).otherwise(0)
        for i in range(num_hashes)
    )
    return (
        cand.join(a, ["id_a"])
        .join(b, ["id_b"])
        .withColumn("est_jaccard", F.round(matches / F.lit(num_hashes), 6))
        .filter(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )


def cut_duplicated_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    width: int = 20,
    min_occurrences: int = 2,
) -> DataFrame:
    """The APPLY step of exact substring dedup (Lee et al. 2022): rewrite
    the corpus with duplicated token spans REMOVED, keeping each duplicated
    span only at its canonical first occurrence (min (id, pos) order —
    within-doc repeats count too, matching the suffix-array formulation's
    "keep one copy corpus-wide"). Returns one row per input doc:
    (id, text, n_tokens, n_cut) where ``text`` is rebuilt from the
    surviving tokens and ``n_cut`` is how many token positions were cut.

    ``substring_dup_stats`` measures the duplicated mass; this operator
    actually cuts it — the pair is measure → act, the way production
    corpus dedup runs.

    Shape (all hash aggregates / equi-joins, nothing quadratic, no
    single-task stage):
      1. rolling window hashes, O(corpus tokens) rows (persisted once);
      2. groupBy(win_hash) → canonical occurrence via min(struct(id,pos))
         + occurrence count — one shuffle on the 128-bit hash;
      3. non-canonical occurrences explode to covered token positions
         (× width, bounded by the duplicated mass) → distinct;
      4. posexploded tokens LEFT ANTI join the cut positions on (id, pos)
         — one shuffle on (id, pos);
      5. per-doc reassembly: collect_list(struct(pos, tok)) → array_sort →
         array_join; per-task memory is one doc's tokens, never a global
         sort.
    """
    from logsight_filebeat_spark.functions.text import tokens

    w = track_persist(substring_windows(df, text_col, id_col, width))
    dup = (
        w.groupBy("win_hash")
        .agg(
            F.min(F.struct("id", "pos")).alias("keep"),
            F.count(F.lit(1)).alias("n_occ"),
        )
        .filter(F.col("n_occ") >= min_occurrences)
        .select("win_hash", "keep")
    )
    cut_occ = (
        w.join(dup, ["win_hash"])
        .filter(
            ~(
                (F.col("id") == F.col("keep.id"))
                & (F.col("pos") == F.col("keep.pos"))
            )
        )
        .select("id", "pos")
    )
    cut_pos = cut_occ.select(
        "id",
        F.explode(
            F.sequence(F.col("pos"), F.col("pos") + F.lit(width - 1))
        ).alias("p"),
    ).distinct()
    toks = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(tokens(text_col)).alias("p", "tok"),
    )
    kept = toks.join(cut_pos, ["id", "p"], "left_anti")
    rebuilt = (
        kept.groupBy("id")
        .agg(F.array_sort(F.collect_list(F.struct("p", "tok"))).alias("a"))
        .select(
            "id",
            F.array_join(
                F.transform("a", lambda s: s["tok"]), " "
            ).alias("text"),
            F.size("a").cast("bigint").alias("n_kept"),
        )
    )
    base = df.select(
        F.col(id_col).alias("id"),
        F.size(tokens(text_col)).cast("bigint").alias("n_tokens"),
    )
    return (
        base.join(rebuilt, ["id"], "left")
        .select(
            "id",
            F.coalesce("text", F.lit("")).alias("text"),
            "n_tokens",
            (F.col("n_tokens") - F.coalesce("n_kept", F.lit(0)))
            .cast("bigint")
            .alias("n_cut"),
        )
    )


def existing_index(
    existing: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 8,
    bands: int = 2,
) -> tuple[DataFrame, DataFrame]:
    """(distinct content hashes, distinct band buckets) of an already-kept
    corpus — the PERSISTED dedup index a production pipeline writes once
    per snapshot and replays against every later one. Pass the two tables
    to :func:`incremental_dedup` (``existing_hashes=``/
    ``existing_buckets=``) so each new snapshot pays O(incoming + index
    lookup) instead of re-minhashing the whole kept corpus — at crawl
    scale the difference between a join against a stored table and a full
    re-shingle of everything ever kept."""
    hashes = existing.select(md5_hex(F.col(text_col)).alias("_h")).distinct()
    buckets = (
        band_buckets(
            minhash_signatures(existing, text_col, id_col, n, num_hashes),
            num_hashes,
            bands,
        )
        .select("bucket")
        .distinct()
    )
    return hashes, buckets


def incremental_dedup(
    existing: DataFrame,
    incoming: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 8,
    bands: int = 2,
    existing_hashes: DataFrame | None = None,
    existing_buckets: DataFrame | None = None,
) -> DataFrame:
    """Snapshot-over-snapshot dedup — the production shape for continuous
    corpus ingestion (each web-crawl snapshot dedups against everything
    already kept, then within itself). Returns the surviving rows of
    ``incoming``, in four deterministic steps:

      1. exact within incoming (keep min id per identical text);
      2. exact vs existing — LEFT ANTI join on the content md5 against
         existing's distinct hash set;
      3. near-dup vs existing — incoming band buckets probe existing's
         distinct bucket set (same banding as lsh_candidates, via the
         shared band_buckets); any collision drops the incoming doc
         (greedy: the already-kept copy wins, matching curation's rule);
      4. near-dup within the remainder — lsh_candidates over surviving
         signatures, higher id of each candidate pair drops.

    Scale shape: every step is a hash equi-join or anti-join on a content
    hash / bucket — the existing corpus contributes only its DISTINCT
    hashes and buckets (never full rows), so the incremental cost is
    O(incoming + existing index). Production replays a PERSISTED index:
    pass ``existing_hashes``/``existing_buckets`` (from
    :func:`existing_index`, stored per snapshot) and the kept corpus is
    never re-shingled; omitted, both derive from ``existing`` in place
    (identical results, pinned by test).
    """
    inc = dedup_exact(incoming, text_col, id_col)
    ex_h = (
        existing_hashes
        if existing_hashes is not None
        else existing.select(md5_hex(F.col(text_col)).alias("_h")).distinct()
    )
    inc = (
        inc.withColumn("_h", md5_hex(F.col(text_col)))
        .join(ex_h, ["_h"], "left_anti")
        .drop("_h")
    )
    inc = track_persist(inc)
    sig_in = track_persist(
        minhash_signatures(inc, text_col, id_col, n, num_hashes)
    )
    bk_in = band_buckets(sig_in, num_hashes, bands)
    bk_ex = (
        existing_buckets
        if existing_buckets is not None
        else band_buckets(
            minhash_signatures(existing, text_col, id_col, n, num_hashes),
            num_hashes,
            bands,
        )
        .select("bucket")
        .distinct()
    )
    hit = bk_in.join(bk_ex, ["bucket"]).select("id").distinct()
    # surv feeds BOTH the survivor-signature semi-join and the final
    # anti-join; unpersisted, each reference re-derives the existing
    # corpus's bucket index (the expensive side) once more
    surv = track_persist(
        inc.join(hit, F.col(id_col) == F.col("id"), "left_anti")
    )
    sig_surv = track_persist(
        sig_in.join(
            surv.select(F.col(id_col).alias("id")), ["id"], "left_semi"
        )
    )
    drops = (
        lsh_candidates(sig_surv, num_hashes, bands)
        .select(F.col("id_b").alias("__drop"))
        .distinct()
    )
    return surv.join(
        drops, F.col(id_col) == F.col("__drop"), "left_anti"
    )


def lsh_plan(
    threshold: float,
    num_hashes: int = 128,
    fp_weight: float = 0.5,
    fn_weight: float = 0.5,
    resolution: int = 200,
) -> tuple[int, int]:
    """Choose (bands, rows) for minhash LSH given a target Jaccard
    ``threshold`` — the driver-side planner that turns "near-dup means
    J ≥ 0.8" into banding parameters before a 10^12-row run is launched
    (the datasketch-style S-curve optimization, reimplemented from the
    published formula).

    A pair with Jaccard s becomes a candidate with probability
    ``1 − (1 − s^rows)^bands``; the planner enumerates every (bands, rows)
    factorization of ``num_hashes`` and minimizes the weighted integral of
    false positives below the threshold and false negatives above it.
    Pure driver-side arithmetic — deterministic, no Spark."""
    if not 0 < threshold < 1:
        raise ValueError(f"threshold must be in (0, 1), got {threshold}")
    best: tuple[float, int, int] | None = None
    for b in range(1, num_hashes + 1):
        if num_hashes % b:
            continue
        r = num_hashes // b

        def p(s: float) -> float:
            return 1.0 - (1.0 - s**r) ** b

        ds = 1.0 / resolution
        xs = [(i + 0.5) * ds for i in range(resolution)]
        fp = sum(p(s) for s in xs if s < threshold) * ds
        fn = sum(1.0 - p(s) for s in xs if s >= threshold) * ds
        err = fp_weight * fp + fn_weight * fn
        if best is None or err < best[0]:
            best = (err, b, r)
    assert best is not None
    return best[1], best[2]


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """Crawl snapshot diff: (key, status) with status ∈ {new, gone,
    changed, unchanged} — which pages appeared, vanished, or changed
    content between two crawl snapshots. The recrawl-scheduling and
    incremental-processing primitive: downstream stages re-run only the
    ``new``/``changed`` slice (pair with :func:`incremental_dedup` for the
    dedup side) and ``gone`` drives tombstoning.

    Scale shape: each side reduces to (key, content md5) IN THE SCAN — the
    text bytes never shuffle — then ONE full-outer hash equi-join on the
    key. Portable hashes keep the verdict engine-reproducible. Keys are
    assumed unique per snapshot (a crawl's url column); pre-aggregate
    first if not."""
    o = old.select(
        F.col(key_col).alias("_k"), md5_hex(F.col(text_col)).alias("_ho")
    )
    n = new.select(
        F.col(key_col).alias("_k"), md5_hex(F.col(text_col)).alias("_hn")
    )
    status = (
        F.when(F.col("_ho").isNull(), F.lit("new"))
        .when(F.col("_hn").isNull(), F.lit("gone"))
        .when(F.col("_ho") == F.col("_hn"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return (
        o.join(n, "_k", "full_outer")
        .select(F.col("_k").alias(key_col), status.alias("status"))
    )


def scd2_history(
    rows: DataFrame,
    key_col: str = "url",
    snap_col: str = "snap",
    attr_cols: tuple[str, ...] = ("text",),
) -> DataFrame:
    """Type-2 slowly-changing-dimension history build: a series of table
    snapshots (one row per key per snapshot where the key exists) collapses
    into validity intervals — one row per (key, version run) with
    ``valid_from``/``valid_to`` snapshot bounds, ``is_current``, and the
    version's attribute fingerprint. The lakehouse CDC-merge primitive
    that turns crawl snapshots into a queryable history dimension:
    :func:`snapshot_diff` answers "what changed between two snapshots",
    this answers "what was true when" across the whole series.

    Semantics (standard SCD2 with deletions): a new version interval opens
    when a key first appears, when its attributes change, or when it
    REAPPEARS after an absence (a gap in the key's snapshot sequence is a
    delete + reinsert — two intervals, even if the attributes match).
    ``valid_to`` is EXCLUSIVE: the snapshot at which the version stopped
    being valid (the change or deletion snapshot) — NULL for versions
    still live at the newest snapshot (``is_current``). Attributes are
    fingerprinted null-safely (md5 over unit-separator-joined values,
    engine-portable) so any attr width costs one scan-stage hash.

    Scale shape: the snapshot DIM (distinct snapshot ids, thousands at
    most) is the only unpartitioned window — bounded metadata, the same
    documented exception as layout.snapshot_expiry_plan — and rides
    broadcast joins both ways. The data path is exactly
    aggregate.state_runs' shape: lag + running-sum windows and the final
    (key, run) aggregate all share ONE hashpartitioning(key) exchange;
    attribute bytes never shuffle (the fingerprint does)."""
    from pyspark.sql import Window

    if not attr_cols:
        raise ValueError("attr_cols must name at least one column")
    fp = md5_hex(
        F.concat_ws(
            "\x1f",
            *[
                F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
                for c in attr_cols
            ],
        )
    )
    snaps = (
        rows.select(F.col(snap_col).alias("_snap"))
        .distinct()
        .select(
            "_snap",
            F.row_number()
            .over(Window.orderBy("_snap"))
            .alias("_idx"),
        )
    )
    pres = rows.select(
        F.col(key_col).alias("_k"), F.col(snap_col).alias("_snap"),
        fp.alias("_fp"),
    ).join(F.broadcast(snaps), "_snap")
    w = Window.partitionBy("_k").orderBy("_idx")
    lagged = pres.select(
        "_k",
        "_idx",
        "_fp",
        F.lag("_idx").over(w).alias("_pidx"),
        F.lag("_fp").over(w).alias("_pfp"),
    )
    new_run = (
        F.col("_pidx").isNull()
        | (F.col("_idx") != F.col("_pidx") + 1)
        | (F.col("_fp") != F.col("_pfp"))
    )
    runs = lagged.select(
        "_k",
        "_idx",
        "_fp",
        F.sum(new_run.cast("int"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("_run"),
    )
    grouped = runs.groupBy("_k", "_run").agg(
        F.min("_idx").alias("_first"),
        F.max("_idx").alias("_last"),
        F.count(F.lit(1)).alias("n_snapshots"),
        F.min("_fp").alias("version_hash"),
    )
    max_idx = snaps.agg(F.max("_idx").alias("_max_idx"))
    d_from = snaps.select(
        F.col("_idx").alias("_first"), F.col("_snap").alias("valid_from")
    )
    d_to = snaps.select(
        (F.col("_idx") - 1).alias("_last"), F.col("_snap").alias("valid_to")
    )
    return (
        grouped.crossJoin(F.broadcast(max_idx))
        .join(F.broadcast(d_from), "_first")
        .join(F.broadcast(d_to), "_last", "left")
        .select(
            F.col("_k").alias(key_col),
            "version_hash",
            "valid_from",
            "valid_to",
            F.col("n_snapshots").cast("bigint").alias("n_snapshots"),
            (F.col("_last") == F.col("_max_idx")).alias("is_current"),
        )
    )


def apply_changes(
    changes: DataFrame,
    key_col: str = "url",
    seq_col: str = "seq",
    op_col: str = "op",
    delete_op: str = "delete",
    attr_cols: tuple[str, ...] = ("text",),
) -> DataFrame:
    """CDC merge-apply: collapse an append-only changelog (one row per
    change: key, monotone sequence, op ∈ {upsert, ``delete_op``}, attrs)
    into the CURRENT-state snapshot — the MERGE INTO primitive that keeps
    a serving table in step with a crawl/ingest change stream, and the
    forward complement of :func:`scd2_history` (that builds the full
    validity history; this materializes only "what is true now").

    Keys whose LATEST change is a delete are absent from the output; all
    others carry the attrs of their latest upsert plus ``last_seq`` and
    ``n_changes`` audit columns. ``(key, seq)`` must be unique — the
    changelog's own ordering contract; ties would make "latest"
    undefined in any engine.

    Scale shape: ONE hash aggregate — ``max_by(struct(attrs), seq)``
    gets partial (map-side) aggregation, so each executor pre-collapses
    its local changes and only one surviving struct per (partition, key)
    ever shuffles. That beats the textbook row_number()-window form,
    which must shuffle EVERY changelog row to its key's reducer before
    ranking — at 10^12 changes the difference is the whole job. No
    window, no second exchange; the final filter is free."""
    keep = [F.col(op_col).alias("_op")] + [F.col(c).alias(c) for c in attr_cols]
    last = changes.groupBy(F.col(key_col).alias("_k")).agg(
        F.max_by(F.struct(*keep), F.col(seq_col)).alias("_last"),
        F.max(seq_col).cast("bigint").alias("last_seq"),
        F.count(F.lit(1)).alias("n_changes"),
    )
    return last.filter(F.col("_last._op") != delete_op).select(
        F.col("_k").alias(key_col),
        *[F.col(f"_last.{c}").alias(c) for c in attr_cols],
        "last_seq",
        F.col("n_changes").cast("bigint").alias("n_changes"),
    )


def ngram_novelty(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Per-document n-gram NOVELTY: the fraction of a doc's distinct word
    n-grams whose first corpus occurrence (by ascending id — ingestion
    order) is this document. The marginal-contribution signal dedup
    thresholds can't see: a page can be no near-dup of any single page
    yet contribute nothing new (novelty ~0, all its phrasing seen
    piecemeal elsewhere), and curricula/retention policies order on
    exactly this (keep high-novelty docs, down-sample echoes).

    Exact, not sketched, and join-free on the gram axis: shingles are
    DISTINCT per doc (word_shingles), so a doc's n_grams is just
    size(shingles) — computed in the row scan with no explode — and its
    n_novel is how many grams name it as the min(id) owner: one hash
    aggregate over the inverted index (min partial-aggregates map-side,
    so Zipfian-hot grams collapse before the exchange) followed by one
    count over the per-gram winners. The full exploded gram table is
    never the probe side of a join and is derived exactly once. Docs
    with fewer than ``n`` tokens report (0, 0, 0.0).

    Returns (id, n_grams, n_novel, novelty)."""
    grams_per_doc = df.select(
        F.col(id_col).alias("id"),
        F.size(word_shingles(text_col, n)).cast("bigint").alias("n_grams"),
    )
    novel = (
        shingle_table(df, text_col, id_col, n)
        .groupBy("shingle")
        .agg(F.min("id").alias("id"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_novel"))
    )
    return grams_per_doc.join(novel, "id", "left").select(
        "id",
        "n_grams",
        F.coalesce("n_novel", F.lit(0)).cast("bigint").alias("n_novel"),
        F.coalesce(
            F.round(
                F.col("n_novel")
                / F.when(F.col("n_grams") > 0, F.col("n_grams")),
                6,
            ),
            F.lit(0.0),
        ).alias("novelty"),
    )


# ---------------------------------------------------------------------------
# line-level corpus dedup (boilerplate line removal)
# ---------------------------------------------------------------------------

def line_doc_freq(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_line_chars: int = 5,
) -> DataFrame:
    """(line_hash, doc_freq) — how many DISTINCT documents each exact line
    occurs in. Lines shorter than ``min_line_chars`` are excluded (blank
    lines and bare punctuation occur everywhere; removing them would mangle
    formatting, matching the public line-dedup recipes that only consider
    substantive lines). One explode + one hash aggregate with map-side
    partial count-distinct — no joins."""
    lines = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.col(text_col), "\n")).alias("line"),
    ).filter(F.length("line") >= min_line_chars)
    return (
        lines.select(md5_hex(F.col("line")).alias("line_hash"), "id")
        .groupBy("line_hash")
        .agg(F.count_distinct("id").alias("doc_freq"))
    )


def line_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_doc_freq: int = 2,
    min_line_chars: int = 5,
) -> DataFrame:
    """Corpus-level line dedup (the RefinedWeb / CCNet boilerplate pass):
    any exact line occurring in >= ``min_doc_freq`` distinct documents is
    boilerplate (cookie banners, navigation, footers) and is removed from
    EVERY document; each document reassembles from its surviving lines in
    original order. Returns the input rows with ``text`` rewritten and a
    ``n_lines_cut`` count (docs whose every line was boilerplate keep an
    empty string — the caller's quality gate drops them).

    Scale shape: explode to (doc, pos, line) → hash anti-join against the
    hot-line set on the 128-bit line hash → per-doc sort-free reassembly
    (collect_list + array_sort over ONE doc's lines, bounded by doc size).
    The hot set is corpus-wide but orders of magnitude smaller than the
    line table; the join is a plain hash equi-join, no broadcast required
    (Catalyst/AQE may still choose one when the hot set is small)."""
    hot = line_doc_freq(df, text_col, id_col, min_line_chars).filter(
        F.col("doc_freq") >= min_doc_freq
    )
    lines = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    )
    kept = (
        lines.withColumn("_lh", md5_hex(F.col("line")))
        .join(hot, F.col("_lh") == F.col("line_hash"), "left_anti")
        .drop("_lh")
    )
    rebuilt = kept.groupBy("id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("_new_text"),
        F.count(F.lit(1)).alias("_n_kept"),
    )
    n_lines = F.size(F.split(F.col(text_col), "\n"))
    return (
        df.join(rebuilt, F.col(id_col) == F.col("id"), "left")
        .withColumn(
            "n_lines_cut", n_lines - F.coalesce(F.col("_n_kept"), F.lit(0))
        )
        .withColumn(text_col, F.coalesce(F.col("_new_text"), F.lit("")))
        .drop("id", "_new_text", "_n_kept")
    )


def cdc_chunks(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    avg_words: int = 16,
    seed: str = "cdc",
) -> DataFrame:
    """Content-defined chunking (the backup/dedup-storage primitive, word
    granularity): a chunk boundary falls AFTER every token whose portable
    hash ≡ 0 (mod ``avg_words``), so boundaries depend only on local
    content — an edit reflows its own chunk and the cut points resync
    immediately after, unlike fixed-size chunking where one insertion
    shifts every later chunk. Chunk hashes feed delta storage and
    cross-snapshot dedup of a recrawled corpus: unchanged page regions
    re-produce identical chunk hashes even when the page around them
    moved. Expected chunk length is ``avg_words`` tokens (geometric).

    Returns (id, chunk_idx, n_words, chunk_hash) — one row per chunk.

    Scale shape: tokenize + posexplode in the scan, ONE window partitioned
    by doc (per-doc sequential, doc-length-bounded — the multiline-fold
    shape), one (doc, chunk) hash aggregate. Chunk text never leaves its
    doc's partition; only 16-byte hashes shuffle if the caller aggregates
    further. Deterministic and engine-portable: the boundary hash is the
    md5 family, never an RNG."""
    from pyspark.sql import Window

    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != F.lit("")
    )
    pos = df.select(
        F.col(id_col).alias("id"), F.posexplode(toks).alias("pos", "tok")
    )
    boundary = (seeded_hash32(F.col("tok"), seed) % avg_words == 0).cast("int")
    w = (
        Window.partitionBy("id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    chunked = pos.select(
        "id",
        "pos",
        "tok",
        F.coalesce(F.sum(boundary).over(w), F.lit(0))
        .cast("bigint")
        .alias("chunk_idx"),
    )
    return (
        chunked.groupBy("id", "chunk_idx")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            md5_hex(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("pos", "tok"))
                        ),
                        lambda x: x["tok"],
                    ),
                    " ",
                )
            ).alias("chunk_hash"),
        )
    )


def mirror_candidates(
    df: DataFrame,
    host_col: str = "host",
    text_col: str = "text",
    threshold: float = 0.5,
    max_hosts_per_hash: int | None = 100,
) -> DataFrame:
    """Mirror-site detection — host PAIRS whose page-content sets overlap:
    Jaccard over each host's set of distinct page content hashes. The
    host-level dual of document near-dup: CDNs, country mirrors, and
    scraper farms re-serve the same corpus under many hosts, and a
    crawler that doesn't collapse them re-crawls (and a trainer re-trains
    on) the same site N times. Returns (host_a, host_b, common_pages,
    jaccard) for pairs at or above ``threshold``, host_a < host_b.

    Scale shape: pages collapse to DISTINCT (host, content-hash) in one
    aggregate — the self-join operates on site fingerprints, never pages.
    The join is equi on the hash, and ``max_hosts_per_hash`` caps its
    fan-out exactly like jaccard_pairs' hot-shingle cap: a hash served by
    more than that many hosts (universal boilerplate — empty pages, SPA
    shells) is dropped from the universe before pairing, bounding work at
    candidates × cap while real mirror signals (hashes shared by FEW
    hosts) survive. Set sizes are recounted over the surviving universe,
    keeping the measure a true Jaccard of the reduced sets."""
    hp = (
        df.select(
            F.col(host_col).alias("host"),
            md5_hex(F.col(text_col)).alias("_h"),
        )
        .distinct()
    )
    if max_hosts_per_hash is not None:
        keep = (
            hp.groupBy("_h")
            .agg(F.count(F.lit(1)).alias("_hf"))
            .filter(F.col("_hf") <= max_hosts_per_hash)
            .select("_h")
        )
        hp = hp.join(keep, ["_h"], "inner")
    sizes = hp.groupBy("host").agg(F.count(F.lit(1)).alias("n"))
    hp = track_persist(hp.join(sizes, "host"))
    a, b = hp.alias("a"), hp.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a._h") == F.col("b._h"))
            & (F.col("a.host") < F.col("b.host")),
        )
        .groupBy(
            F.col("a.host").alias("host_a"),
            F.col("b.host").alias("host_b"),
            F.col("a.n").alias("na"),
            F.col("b.n").alias("nb"),
        )
        .agg(F.count(F.lit(1)).alias("common_pages"))
    )
    return (
        inter.withColumn(
            "jaccard",
            F.round(
                F.col("common_pages")
                / (F.col("na") + F.col("nb") - F.col("common_pages")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("host_a", "host_b", F.col("common_pages").cast("bigint").alias("common_pages"), "jaccard")
    )


def normalized_dedup_best(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    score_col: str = "n_chars",
) -> DataFrame:
    """Normalized exact dedup with a KEEP-BEST survivor rule: texts that
    are identical after aggressive normalization (lowercase + whitespace
    runs collapsed + trim) form one group, and the survivor is the
    group's highest-``score_col`` member (doc id as the deterministic
    tie-break) — the curation-grade variant of :func:`dedup_exact`, which
    keeps min-id among BYTE-identical texts. Normalization catches the
    trivial recrawl/mirror variants (case tweaks, reflowed whitespace)
    byte-hashing misses, and keep-best retains the richest copy instead
    of whichever crawled first.

    Scale shape: identical to :func:`dedup_exact` — hash the normalized
    text in the scan, ONE groupBy-min on the 16-byte hash (survivor
    picked via a (−score, id) struct min: max score, then min id — an
    aggregate, never a window sort), one semi-style equi-join back. Text
    bytes shuffle once as hashes, never as payloads."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    keyed = df.withColumn("_h", md5_hex(norm))
    keep = keyed.groupBy("_h").agg(
        F.min(
            F.struct(
                (-F.col(score_col)).alias("s"), F.col(id_col).alias("i")
            )
        ).alias("_k")
    )
    return (
        keyed.join(keep, ["_h"], "inner")
        .filter(F.col(id_col) == F.col("_k.i"))
        .drop("_h", "_k")
    )


def bloom_gate_dedup(
    old: DataFrame,
    new: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_bits: int = 2048,
    n_hashes: int = 4,
    seed: str = "bloom:v1",
) -> DataFrame:
    """Bloom-gated incremental dedup — the at-scale shape of "is this
    recrawled doc already in the corpus?": the old corpus collapses to a
    ≤n_bits-row Bloom filter (built once, mergeable across shards/days),
    every incoming doc probes it via a broadcast join, and ONLY the
    maybe-present fraction pays the exact content-hash equi-join against
    the old hash set. At 10^12 docs with a properly-sized filter that
    kills ~99% of lookups before the shuffle; no-false-negatives means
    no dup ever slips through the gate.

    Returns (id, verdict): ``new_certain`` (filter said absent — never
    joined), ``dup`` (exact hash present), ``new_fp`` (the filter's
    deterministic false positives — the re-check cost, surfaced for
    sizing audits). Routing happens BEFORE the join: certain-new rows
    take a filter-only path.

    Scale shape: old hashes → :func:`~logsight_filebeat_spark.operators.
    sketches.bloom_bits` (positions explode in the scan, one ≤n_bits
    distinct); probe = broadcast equi-join + count aggregate; exact
    confirm = equi-join on 16-byte hashes over the maybe subset only."""
    from logsight_filebeat_spark.operators.sketches import (
        bloom_bits,
        bloom_probe,
    )

    oldh = old.select(md5_hex(F.col(text_col)).alias("h")).distinct()
    bloom = bloom_bits(oldh, "h", n_bits, n_hashes, seed)
    newh = new.select(F.col(id_col), md5_hex(F.col(text_col)).alias("h"))
    probe = bloom_probe(
        bloom,
        newh.select(F.col("h").alias("value")).distinct(),
        "value",
        n_bits,
        n_hashes,
        seed,
    )
    routed = newh.join(probe, newh["h"] == probe["value"]).select(
        id_col, "h", "maybe_present"
    )
    certain = routed.filter(~F.col("maybe_present")).select(
        id_col, F.lit("new_certain").alias("verdict")
    )
    confirmed = (
        routed.filter(F.col("maybe_present"))
        .join(oldh.withColumn("_dup", F.lit(1)), ["h"], "left")
        .select(
            id_col,
            F.when(F.col("_dup").isNotNull(), F.lit("dup"))
            .otherwise(F.lit("new_fp"))
            .alias("verdict"),
        )
    )
    return certain.unionByName(confirmed)


def soft_dedup_sample(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: str = "softdedup",
) -> DataFrame:
    """Frequency-PRESERVING soft dedup: instead of hard-keeping one copy
    per duplicate cluster, every row survives independently with
    probability 1/dup_count — each cluster contributes ONE copy in
    expectation, but naturally-frequent content keeps a (stochastic,
    bounded) representation advantage over singletons, the middle ground
    between no-dedup (duplicates dominate training) and hard dedup
    (frequency signal destroyed). The membership decision is the repo's
    deterministic-sampler contract: ``hash(seed, id) mod dup_count == 0``
    — a pure Column function of the row, stable under reruns,
    partitionings, and engines (no RNG state).

    Returns surviving rows plus their ``dup_count``. Scale shape: one
    hash groupBy on the 16-byte content hash + one equi-join back — the
    dedup_exact plan with the keep rule swapped from min-id to
    hash-mod."""
    keyed = df.withColumn("_h", md5_hex(F.col(text_col)))
    counts = keyed.groupBy("_h").agg(
        F.count(F.lit(1)).cast("bigint").alias("dup_count")
    )
    return (
        keyed.join(counts, ["_h"])
        .filter(
            seeded_hash32(F.col(id_col).cast("string"), seed)
            % F.col("dup_count")
            == 0
        )
        .drop("_h")
    )


def lsh_band_curve(
    spark,
    num_hashes: int = 8,
    sims: tuple[int, ...] = (1, 2, 3, 4, 5, 6, 7, 8, 9),
) -> DataFrame:
    """The LSH S-curve planning table: candidate probability
    ``P = 1 − (1 − s^r)^b`` for every valid (bands b, rows r = k/b) split
    of a ``num_hashes``-row MinHash signature, over a similarity grid
    (``sims`` in tenths). This is how b and r are actually chosen before
    a 100-TB dedup run — pick the split whose curve's steep section
    brackets the target Jaccard threshold (≈ (1/b)^(1/r)), trading
    false-candidate cost against recall. Pure generated-grid Column math
    (fixed-shape double powers, rounded 1e-6) — no data touched; pairs
    with :func:`minhash_lsh_pairs`, whose observed candidate rates
    ``dd_lsh_eval`` then validates against this prediction.

    Returns (bands, rows_per_band, sim, p_candidate, threshold)."""
    splits = [
        (b, num_hashes // b)
        for b in range(1, num_hashes + 1)
        if num_hashes % b == 0
    ]
    bands = spark.createDataFrame(splits, "bands int, rows_per_band int")
    grid = spark.createDataFrame([(s,) for s in sims], "sim_tenths int")
    s = F.col("sim_tenths") / F.lit(10.0)
    return (
        bands.crossJoin(grid)
        .select(
            "bands",
            "rows_per_band",
            F.round(s, 1).alias("sim"),
            F.round(
                1 - F.pow(1 - F.pow(s, F.col("rows_per_band")), F.col("bands")),
                6,
            ).alias("p_candidate"),
            F.round(
                F.pow(1.0 / F.col("bands"), 1.0 / F.col("rows_per_band")), 6
            ).alias("threshold"),
        )
    )


def edit_distance_verify(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 8,
    bands: int = 2,
    prefix: int = 200,
    max_dist: int | None = None,
) -> DataFrame:
    """Edit-distance verification of LSH candidate pairs:
    (id_a, id_b, edit_dist) — the exact-verify stage fuzzy-dedup pipelines
    run AFTER blocking (MinHash candidates say "probably similar"; the
    Levenshtein pass says exactly HOW different, catching the
    template-with-one-field-changed near-dups whose shingle Jaccard is
    high but whose token edits matter).

    Scale shape: candidates come from :func:`minhash_lsh_pairs` (banded
    bucket equi-joins — never pairwise), then TWO equi-joins hydrate the
    pair's texts and one codegen ``levenshtein`` evaluates per candidate.
    Cost control is explicit: Levenshtein is O(len²) per pair, so the
    compare runs over the first ``prefix`` chars (the standard
    prefix-window bound; full-text compare is ``prefix=None`` opt-in for
    verification-scale runs). The text hydration joins shuffle only the
    candidate ids plus the prefix column, never full documents.
    ``max_dist`` (optional) filters to pairs within the threshold."""
    t = F.col(text_col) if prefix is None else F.substring(text_col, 1, prefix)
    texts = df.select(F.col(id_col).alias("_id"), t.alias("_t"))
    cand = minhash_lsh_pairs(df, text_col, id_col, n, num_hashes, bands)
    out = (
        cand.join(
            texts.select(
                F.col("_id").alias("id_a"), F.col("_t").alias("_ta")
            ),
            "id_a",
        )
        .join(
            texts.select(
                F.col("_id").alias("id_b"), F.col("_t").alias("_tb")
            ),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            F.levenshtein("_ta", "_tb").cast("bigint").alias("edit_dist"),
        )
    )
    if max_dist is not None:
        out = out.filter(F.col("edit_dist") <= max_dist)
    return out
