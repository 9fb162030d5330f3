"""Similarity search over an embedding column (array<float>).

Two tiers:
  * ``brute_force_topk`` — exact cosine top-k, the correctness baseline.
    Queries are broadcast (they're small); the fact side streams, a
    per-query top-k window keeps the result bounded. At 100 TB of vectors
    this is one scan + one bounded shuffle — viable for few queries.
  * ``srp_buckets`` / ``srp_topk`` — sign-random-projection LSH: each vector
    hashes to a bucket from the signs of dot products with deterministic
    md5-derived hyperplanes; ``srp_topk`` candidates come from the query's
    EXACT bucket only. This is the scale path — candidate generation is a
    bucket equi-join.
  * ``srp_multiprobe_topk`` — recall upgrade: each query probes its own
    bucket PLUS every bucket at Hamming distance 1 (one sign flipped), so a
    near neighbor that fell just across one hyperplane is still found. Cost:
    the candidate join fans each query out ×(1+num_planes) — still an
    equi-join, never a cross product.
  * ``embedding_near_dups_lsh`` — the composed near-dup operator: SRP-bucket
    candidate pairs → exact cosine verify ≥ threshold, one call. Equals the
    exact dedup.embedding_near_dups restricted to same-bucket candidates.
  * ``ivf_codebook`` / ``ivf_assign`` / ``ivf_topk`` — the IVF architecture
    (inverted lists + nprobe partition-pruned search): vectors assign to
    their nearest coarse centroid; queries probe their nprobe nearest
    centroids and rank exact cosine over only those lists. With
    nprobe == n_centroids this is exactly brute force (test-pinned), which
    makes the recall/cost dial explicit.

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
    The LSH-bucketed scale path for embedding near-dup / ANN. Caller
    releases the tracked cache after its action (functions/caching.py)."""
    from logsight_filebeat_spark.functions.caching import track_persist

    b = track_persist(  # bucket projection feeds both join sides
        srp_buckets(df, num_planes, id_col, vec_col)
    )
    x, y = b.alias("a"), b.alias("b")
    return (
        x.join(y, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                F.col("a.bucket").alias("bucket"))
    )


def srp_multiprobe_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k with Hamming-1 multi-probe: each query's candidate set is
    the union of its exact bucket and the num_planes buckets reachable by
    flipping one sign bit — recovering neighbors that sit just across a
    single hyperplane (the standard multi-probe LSH recall fix).

    Plan shape: the bucket is computed ONCE per row as a projected Column;
    probes derive from that bucket column by integer XOR (cheap), explode
    the (small, broadcast) query side ×(1+num_planes), and candidates come
    from a broadcast equi-join on bucket. A (query, vector) pair can match
    at most one probe (probe values are distinct), so no dedup join blowup;
    the window top-k bounds the result."""
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
    probes = F.array(
        F.col("bucket"),
        *[
            F.col("bucket").bitwiseXOR(F.lit(2**p).cast("bigint"))
            for p in range(num_planes)
        ],
    )
    qp = q.select(
        "query_id", "qv", F.explode(probes).alias("bucket")
    )
    scored = (
        v.join(
            F.broadcast(qp),
            (v["bucket"] == qp["bucket"])
            & (F.col("query_id") != F.col("neighbor_id")),
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


def embedding_near_dups_lsh(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    num_planes: int = 8,
) -> DataFrame:
    """Composed near-dup operator — the one-call scale path for embeddings:
    SRP-bucket candidate pairs (equi-join, never a cross product) → exact
    cosine verification ≥ threshold. Returns (id_a, id_b, cosine), id_a <
    id_b. Equals dedup.embedding_near_dups restricted to same-bucket pairs
    (oracle-pinned); recall follows the SRP collision probability — raise it
    with fewer planes or a second plane family unioned in.

    The vector rides through the bucket join (one shuffle keyed on bucket)
    rather than being re-joined by id afterward — one wide shuffle beats two
    narrow ones at this row width. Caller releases the tracked cache after
    its action (functions/caching.py)."""
    from logsight_filebeat_spark.functions.caching import track_persist

    v = track_persist(
        df.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).cast("array<double>").alias("v"),
            srp_bucket_expr(vec_col, num_planes).alias("bucket"),
        )
    )
    a, b = v.alias("a"), v.alias("b")
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(cosine_sim(F.col("a.v"), F.col("b.v")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def ivf_codebook(
    vectors: DataFrame,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Coarse-quantizer seed codebook for IVF: (centroid_id, cv) — the
    ``n_centroids`` lowest-id vectors, ``centroid_id`` = the seed's own id
    (any deterministic distinct key works: it is a grouping/tie-break key,
    never part of a query result, and id-order is rank-order so tie-breaks
    match a dense 0..n-1 numbering exactly).

    Plans as TakeOrderedAndProject — every partition contributes its local
    top-n and the driver merges n_centroids rows; no global sort, no
    single-partition Window (the round-2 shape this replaces). Seeds feed
    ``ivf_train_codebook`` for a real Lloyd-iterated codebook."""
    return (
        vectors.select(
            F.col(id_col).alias("centroid_id"),
            F.col(vec_col).cast("array<double>").alias("cv"),
        )
        .orderBy("centroid_id")
        .limit(n_centroids)
    )


def ivf_train_codebook(
    vectors: DataFrame,
    n_centroids: int = 8,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """K-means (Lloyd) trained codebook in pure DataFrame ops: seed with the
    ``n_centroids`` lowest-id vectors, then ``iterations`` rounds of
    assign → recenter. Returns (centroid_id, cv).

    Each round is two bounded-shuffle stages, both fully distributed:
      * assign — broadcast the ≤n_centroids codebook, constant-k argmax
        cosine per row (``ivf_assign``; never a pairwise blowup);
      * recenter — posexplode each vector to (centroid_id, pos, x) and
        hash-aggregate avg(x) by (centroid_id, pos) with map-side partial
        aggregation, then reassemble the mean vector with a tiny
        n_centroids×dim collect_list.  No vector list is ever gathered onto
        one task — the widest state anywhere is one running (sum, count)
        per (centroid, dimension).

    Components are rounded to 6 decimals each round so the DuckDB oracle
    (same seeds, same rounding) reproduces the codebook bit-identically —
    the same cross-engine determinism contract every cosine in this module
    uses. Empty clusters drop out (codebook may shrink below n_centroids),
    matching textbook Lloyd on a fixed seed set."""
    cb = ivf_codebook(vectors, n_centroids, id_col, vec_col)
    for _ in range(iterations):
        asg = ivf_assign(vectors, cb, id_col, vec_col)
        by_dim = (
            asg.select("centroid_id", F.posexplode("v").alias("pos", "x"))
            .groupBy("centroid_id", "pos")
            .agg(F.round(F.avg("x"), 6).alias("m"))
        )
        cb = by_dim.groupBy("centroid_id").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))),
                lambda s: s["m"],
            ).alias("cv")
        )
    return cb


def ivf_assign(
    vectors: DataFrame,
    codebook: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Inverted-list assignment: each vector joins its single nearest
    centroid (max cosine, rounded to 6 so both engines tie-break
    identically; ties by centroid_id). The codebook is broadcast — the
    'join' is a constant-k per-row scoring pass, not a pairwise blowup —
    and at scale the output is what you bucket/write partitioned by
    centroid_id (the inverted lists)."""
    from pyspark.sql import Window

    v = vectors.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    scored = (
        v.crossJoin(F.broadcast(codebook))
        .withColumn("csim", F.round(cosine_sim(F.col("v"), F.col("cv")), 6))
    )
    w = Window.partitionBy("id").orderBy(
        F.col("csim").desc(), F.col("centroid_id").asc()
    )
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select("id", "v", "centroid_id")
    )


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebook: DataFrame | None = None,
) -> DataFrame:
    """IVF ANN top-k: queries probe their ``nprobe`` nearest centroids and
    rank exact cosine over ONLY those inverted lists — the partition-pruned
    search path (vs LSH's hash buckets). Scan cost per query is
    nprobe/n_centroids of the corpus instead of all of it; candidates come
    from an equi-join on centroid_id with the (small) probe list broadcast.

    ``codebook`` defaults to the deterministic seed codebook; pass
    ``ivf_train_codebook(...)`` (or a pre-trained table) for real recall.

    Returns (query_id, neighbor_id, cosine, rank), self excluded, ties by
    neighbor id — same contract as brute_force_topk/srp_topk."""
    from pyspark.sql import Window

    cb = (
        codebook
        if codebook is not None
        else ivf_codebook(vectors, n_centroids, id_col, vec_col)
    )
    inv = ivf_assign(vectors, cb, id_col, vec_col).select(
        F.col("id").alias("neighbor_id"),
        F.col("v").alias("nv"),
        "centroid_id",
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    qscore = (
        q.crossJoin(F.broadcast(cb))
        .withColumn("csim", F.round(cosine_sim(F.col("qv"), F.col("cv")), 6))
    )
    wp = Window.partitionBy("query_id").orderBy(
        F.col("csim").desc(), F.col("centroid_id").asc()
    )
    probes = (
        qscore.withColumn("_rk", F.row_number().over(wp))
        .filter(F.col("_rk") <= nprobe)
        .select("query_id", "qv", "centroid_id")
    )
    scored = (
        inv.join(
            F.broadcast(probes),
            (inv["centroid_id"] == probes["centroid_id"])
            & (F.col("query_id") != F.col("neighbor_id")),
        )
        .withColumn("cosine", F.round(cosine_sim(F.col("qv"), F.col("nv")), 6))
        .select("query_id", "neighbor_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def srp_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: exact cosine ranking restricted to the query's EXACT SRP
    bucket (srp_multiprobe_topk adds Hamming-1 probes for recall). Fewer
    planes ⇒ bigger buckets ⇒ better recall, more compute. The bucket
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


# ---------------------------------------------------------------------------
# scalar quantization (int8 embedding compression)
# ---------------------------------------------------------------------------

def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bits: int = 8,
    keep_vec: bool = False,
) -> DataFrame:
    """Per-vector symmetric scalar quantization: scale = max|v| / (2^(b-1)-1),
    q_i = round(v_i / scale) — the standard int8 embedding compression (4×
    smaller storage + faster integer distance kernels). Pure Columns inside
    the scan stage; returns (id, scale, q) — plus the original vector as
    ``orig`` when ``keep_vec`` (fidelity checks in the same projection, no
    join back). Zero vectors quantize to zeros with scale 0. Dequantize with
    :func:`dequantize_embeddings`; round-trip error per element ≤ scale/2."""
    levels = 2 ** (bits - 1) - 1
    v = F.col(vec_col).cast("array<double>")
    scale = F.array_max(F.transform(v, F.abs)) / levels
    q = F.when(
        scale > 0,
        F.transform(v, lambda x: F.round(x / scale).cast("int")),
    ).otherwise(F.transform(v, lambda x: F.lit(0)))
    cols = [F.col(id_col).alias("id"), scale.alias("scale"), q.alias("q")]
    if keep_vec:
        cols.append(v.alias("orig"))
    return df.select(*cols)


def dequantize_embeddings(
    df: DataFrame, q_col: str = "q", scale_col: str = "scale", out: str = "v"
) -> DataFrame:
    """Inverse of :func:`quantize_embeddings`: v_i ≈ q_i × scale."""
    return df.withColumn(
        out, F.transform(F.col(q_col), lambda x: x * F.col(scale_col))
    )


def semantic_dedup_pairs(
    vectors: DataFrame,
    n_centroids: int = 8,
    iterations: int = 2,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebook: DataFrame | None = None,
) -> DataFrame:
    """SemDeDup-style semantic near-duplicate pairs (Abbas et al. 2023,
    arXiv:2303.09540): k-means-cluster the embedding space, then compare
    ONLY within each cluster — the cluster partition bounds the pairwise
    work to Σ|cluster|², the same blocking role LSH buckets play for text.
    Returns (centroid_id, id_a, id_b, cosine) for intra-cluster pairs at
    or above ``threshold``.

    Scale shape: trained codebook (ivf_train_codebook — every stage
    bounded-shuffle), broadcast constant-k assignment, then a hash
    equi-join of the assignment against itself on centroid_id with the
    vectors riding both sides (no join-back to fetch them). At corpus
    scale use n_centroids ~ sqrt(N) so clusters stay small — the
    demo-scale k here keeps the oracle's SQL re-derivation tractable."""
    from logsight_filebeat_spark.functions.caching import track_persist

    if codebook is None:
        codebook = ivf_train_codebook(
            vectors, n_centroids, iterations, id_col, vec_col
        )
        codebook = track_persist(codebook)
    asg = track_persist(ivf_assign(vectors, codebook, id_col, vec_col))
    a = asg.select(
        "centroid_id", F.col("id").alias("id_a"), F.col("v").alias("va")
    )
    b = asg.select(
        "centroid_id", F.col("id").alias("id_b"), F.col("v").alias("vb")
    )
    return (
        a.join(b, "centroid_id")
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cosine", F.round(cosine_sim(F.col("va"), F.col("vb")), 6)
        )
        .where(F.col("cosine") >= F.lit(threshold))
        .select("centroid_id", "id_a", "id_b", "cosine")
    )


def semantic_dedup(
    vectors: DataFrame,
    n_centroids: int = 8,
    iterations: int = 2,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Corpus after SemDeDup: drop the higher id of every intra-cluster
    near-duplicate pair (the greedy survivor rule large-corpus dedup
    standardizes on), via one distinct + broadcast-able LEFT ANTI join."""
    pairs = semantic_dedup_pairs(
        vectors, n_centroids, iterations, threshold, id_col, vec_col
    )
    drops = pairs.select(F.col("id_b").alias("__drop")).distinct()
    return vectors.join(
        drops, F.col(id_col) == F.col("__drop"), "left_anti"
    )


# ---------------------------------------------------------------------------
# product quantization (PQ): per-subspace codebooks + ADC search
# ---------------------------------------------------------------------------

def pq_train(
    vectors: DataFrame,
    dim: int,
    m: int = 2,
    ks: int = 8,
    iterations: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product-quantization codebooks (Jégou et al. 2011): split the
    ``dim``-dimensional space into ``m`` contiguous subspaces and train an
    independent ``ks``-centroid codebook in each — ``m·log2(ks)`` bits per
    vector instead of ``dim·32``, the memory/bandwidth representation
    under every billion-scale ANN index. Training per subspace is this
    module's distributed Lloyd (:func:`ivf_train_codebook`: lowest-id
    seeds, broadcast cosine assign, per-(centroid, dimension) hash-agg
    recenter, per-round 1e-6 rounding) over the SLICED vectors — spherical
    k-means per subspace, reusing the proven cross-engine-deterministic
    primitive. Returns (subspace, centroid_id, cv).

    Scale shape: slicing is a scan projection; each subspace's training is
    the same bounded-shuffle loop ivf_train_codebook documents; the m
    trainings share one pass shape and the result is m·ks rows."""
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible into {m} subspaces")
    h = dim // m
    parts = []
    for s in range(m):
        sliced = vectors.select(
            F.col(id_col),
            F.slice(F.col(vec_col).cast("array<double>"), s * h + 1, h).alias(
                "embedding"
            ),
        )
        cb = ivf_train_codebook(
            sliced, n_centroids=ks, iterations=iterations, id_col=id_col,
            vec_col="embedding",
        )
        parts.append(
            cb.select(
                F.lit(s).cast("int").alias("subspace"), "centroid_id", "cv"
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def pq_encode(
    vectors: DataFrame,
    codebooks: DataFrame,
    dim: int,
    m: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ codes: each vector's nearest centroid per subspace (cosine,
    1e-6-rounded, centroid-id tie-break — :func:`ivf_assign` verbatim on
    the sliced vectors). Returns (id, subspace, code): the compressed
    representation the search side scans INSTEAD of raw vectors."""
    h = dim // m
    parts = []
    for s in range(m):
        sliced = vectors.select(
            F.col(id_col),
            F.slice(F.col(vec_col).cast("array<double>"), s * h + 1, h).alias(
                "embedding"
            ),
        )
        cbs = codebooks.filter(F.col("subspace") == s).select(
            "centroid_id", "cv"
        )
        parts.append(
            ivf_assign(sliced, cbs, id_col=id_col, vec_col="embedding").select(
                F.col("id"),
                F.lit(s).cast("int").alias("subspace"),
                F.col("centroid_id").alias("code"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def pq_topk(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    m: int = 2,
    ks: int = 8,
    k: int = 5,
    iterations: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebooks: DataFrame | None = None,
) -> DataFrame:
    """PQ/ADC top-k: score every doc by the cosine between the query and
    the doc's RECONSTRUCTION (its m centroid subvectors concatenated) —
    mathematically the asymmetric-distance computation, expressed through
    the module's proven cosine primitive so the oracle reproduces every
    bit. Returns (query_id, neighbor_id, adc_cosine, rank ≤ k), self
    excluded, rounded ties broken by neighbor id.

    Scale shape: the scan side is the CODES table (m small ints per doc,
    not dim floats — the whole point: at 10^12 docs the sequential scan
    reads ~. 2 bytes/vector instead of 256); reconstruction is m broadcast
    joins against ≤ks-row codebooks; scoring is the same broadcast-query
    pass as brute_force_topk. Combine with IVF lists for candidate
    pruning on top of the compression (IVFPQ) — orthogonal here."""
    from pyspark.sql import Window

    if codebooks is None:
        codebooks = pq_train(
            vectors, dim, m=m, ks=ks, iterations=iterations,
            id_col=id_col, vec_col=vec_col,
        )
    codes = pq_encode(vectors, codebooks, dim, m=m, id_col=id_col, vec_col=vec_col)
    rec = None
    for s in range(m):
        part = (
            codes.filter(F.col("subspace") == s)
            .join(
                F.broadcast(
                    codebooks.filter(F.col("subspace") == s).select(
                        F.col("centroid_id").alias("code"),
                        F.col("cv").alias(f"_c{s}"),
                    )
                ),
                ["code"],
            )
            .select("id", f"_c{s}")
        )
        rec = part if rec is None else rec.join(part, ["id"])
    recon = rec.select(
        F.col("id").alias("neighbor_id"),
        F.concat(*[F.col(f"_c{s}") for s in range(m)]).alias("recon"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    scored = (
        recon.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "adc_cosine", F.round(cosine_sim(F.col("qv"), F.col("recon")), 6)
        )
        .select("query_id", "neighbor_id", "adc_cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_cosine").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def ivfpq_topk(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    m: int = 2,
    ks: int = 8,
    k: int = 5,
    n_centroids: int = 8,
    nprobe: int = 2,
    iterations: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVFPQ — the production billion-scale ANN shape (FAISS's default
    composition): a COARSE inverted-file index prunes candidates
    (queries probe their ``nprobe`` nearest of ``n_centroids`` lists —
    the partition-pruning half) and PRODUCT-QUANTIZED codes provide the
    compressed scoring representation inside the probed lists (the
    memory/bandwidth half). This variant scores against the PQ
    reconstruction directly (no residual encoding — documented
    simplification; residual-PQ adds a subtraction before
    :func:`pq_encode` at the cost of per-list codebooks).

    Returns (query_id, neighbor_id, adc_cosine, rank ≤ k), self
    excluded, 1e-6-rounded cosine ties broken by neighbor id — the same
    cross-engine determinism contract as every retriever here.

    Scale shape: candidates = one equi-join of the assignment table
    against the broadcast probe list (≈ nprobe/n_centroids of the corpus
    per query); scoring joins the ≤ks-row PQ codebooks by broadcast and
    reads CODES, not raw vectors; final rank is a per-query
    candidate-only window."""
    from pyspark.sql import Window

    coarse = ivf_codebook(vectors, n_centroids, id_col, vec_col)
    asg = ivf_assign(vectors, coarse, id_col, vec_col).select(
        "id", "centroid_id"
    )
    cbs = pq_train(
        vectors, dim, m=m, ks=ks, iterations=iterations,
        id_col=id_col, vec_col=vec_col,
    )
    codes = pq_encode(vectors, cbs, dim, m=m, id_col=id_col, vec_col=vec_col)
    rec = None
    for s in range(m):
        part = (
            codes.filter(F.col("subspace") == s)
            .join(
                F.broadcast(
                    cbs.filter(F.col("subspace") == s).select(
                        F.col("centroid_id").alias("code"),
                        F.col("cv").alias(f"_c{s}"),
                    )
                ),
                ["code"],
            )
            .select("id", f"_c{s}")
        )
        rec = part if rec is None else rec.join(part, ["id"])
    recon = rec.select(
        "id", F.concat(*[F.col(f"_c{s}") for s in range(m)]).alias("recon")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("_qsim").desc(), F.col("centroid_id").asc()
    )
    probes = (
        q.crossJoin(F.broadcast(coarse))
        .withColumn("_qsim", F.round(cosine_sim(F.col("qv"), F.col("cv")), 6))
        .withColumn("_rk", F.row_number().over(wq))
        .filter(F.col("_rk") <= nprobe)
        .select("query_id", "qv", "centroid_id")
    )
    cand = asg.join(probes, ["centroid_id"]).filter(
        F.col("id") != F.col("query_id")
    )
    scored = cand.join(recon, ["id"]).select(
        "query_id",
        F.col("id").alias("neighbor_id"),
        F.round(cosine_sim(F.col("qv"), F.col("recon")), 6).alias(
            "adc_cosine"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_cosine").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
