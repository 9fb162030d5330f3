"""Deduplication operators for training-data pipelines.

Exact, MinHash+LSH, SimHash, n-gram Jaccard, and embedding-cosine near-dup —
each Spark-first (Column expressions + shuffle-conscious joins), each with a
DuckDB-expressible formulation (portable md5-based hashing, see
functions/hashing.py) so the driver's oracle can verify values.

Scale design (the point of each variant):
  * exact       — one hash-groupBy; shuffle on a 128-bit key, no skew.
  * n-gram Jaccard — EXACT pairwise similarity via shingle inverted index;
    the shingle join explodes on hot shingles (stopword shingles can touch
    every doc) — correct at small scale, the reason MinHash exists at 100 TB.
  * MinHash+LSH — fixed-size signature per doc (k hashes), band-bucket join:
    candidates only for docs sharing a band. Shuffle is O(docs × bands) tiny
    rows; hot buckets are bounded by band width. THE scale path for text.
  * SimHash     — one 32/64-bit int per doc; near-dups = small Hamming
    distance. Cheapest signature; pairs via self-join on bucket prefixes or
    (small scale) a guarded cross-join.
  * embedding cosine — exact pairwise over a vector column; at scale use the
    LSH/IVF variants in operators/similarity.py to generate candidates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

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
) -> DataFrame:
    """EXACT n-gram Jaccard over candidate pairs sharing ≥1 shingle.
    Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard rounded to 6.

    Scale note: the shingle self-join is quadratic in the hottest shingle's
    document frequency. Fine at verification scale; at corpus scale cap df
    per shingle (drop shingles with doc_freq > limit — they carry ~no
    Jaccard signal) or switch to minhash_lsh_candidates."""
    inv = shingle_table(df, text_col, id_col, n)
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


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 8,
) -> DataFrame:
    """(id, mh_0..mh_{k-1}): per-seed min of portable 32-bit shingle hashes.
    Computed entirely inside one projection (array transforms + array_min) —
    NO explode, NO shuffle: the signature is a map over the doc."""
    sh = word_shingles(text_col, n)

    # NB: close over the seed via a factory — a `lambda s, i=i:` two-param
    # lambda would make transform() pass the ARRAY INDEX as the second arg
    def hash_with_seed(seed: int):
        return lambda s: seeded_hash32(s, seed)

    cols = [
        F.array_min(F.transform(sh, hash_with_seed(i))).alias(f"mh_{i}")
        for i in range(num_hashes)
    ]
    return df.select(F.col(id_col).alias("id"), *cols).filter(
        F.col("mh_0").isNotNull()
    )


def lsh_candidates(
    sigs: DataFrame, num_hashes: int = 8, bands: int = 2
) -> DataFrame:
    """Band the signature, bucket-join per band, union distinct pairs.
    Shuffle: (docs × bands) rows keyed by (band, bucket-hash) — the scalable
    candidate generator. Returns (id_a, id_b) distinct."""
    rows = num_hashes // bands
    parts = []
    for b in range(bands):
        band_cols = [F.col(f"mh_{b * rows + r}") for r in range(rows)]
        bucket = md5_hex(F.concat_ws("_", F.lit(b), *band_cols))
        parts.append(sigs.select(F.col("id"), bucket.alias("bucket")))
    buckets = parts[0]
    for p in parts[1:]:
        buckets = buckets.unionAll(p)
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
    return lsh_candidates(
        minhash_signatures(df, text_col, id_col, n, num_hashes), num_hashes, bands
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash(col: Column | str, bits: int = 32) -> Column:
    """SimHash over distinct lowercase tokens: bit i of the result is the
    sign of sum over tokens of ±1 by bit i of the token's portable hash.
    One Column expression, no shuffle."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.array_distinct(
        F.filter(F.split(F.lower(c), r"\s+"), lambda t: t != F.lit(""))
    )
    hashes = F.transform(toks, lambda t: seeded_hash32(t, "simhash"))
    total = F.lit(0).cast("bigint")

    # closure factory: aggregate()'s merge lambda must take exactly (acc, x) —
    # an extra defaulted param would be bound to a Column by the HOF machinery
    def vote_bit(bit: int):
        return lambda acc, h: acc + F.when(
            F.shiftright(h, bit).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    for i in range(bits):
        vote = F.aggregate(hashes, F.lit(0), vote_bit(i))
        total = total + F.when(vote > 0, F.lit(2**i).cast("bigint")).otherwise(0)
    return total


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance. Small-scale exact form:
    self-join (id_a < id_b) + bit_count(xor). At corpus scale, block first on
    simhash byte-chunks (pigeonhole: distance ≤ 3 over 4 chunks ⇒ ≥1 exact
    chunk match) so the join is on chunk equality, not a cross product."""
    s = df.select(
        F.col(id_col).alias("id"), simhash(text_col, bits).alias("sh")
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
    verification-scale baseline; candidate generation at scale comes from
    similarity.srp_buckets (LSH) instead of the full cross join."""
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
