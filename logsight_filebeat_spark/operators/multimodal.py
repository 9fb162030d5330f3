"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads travel as ``binary`` columns with a typed metadata
struct. The Spark-side plumbing — schema, Arrow batch shape, partitioning,
UDF signatures — is real and tested; the actual codec step is STUBBED
(`decode_image` raises NotImplementedError; `fake_decode` is the
deterministic stand-in) because no image/audio libraries exist in this
container. Swapping the stub for PIL/torchaudio changes one function body,
not the pipeline.

Scale notes: payload bytes dominate — keep them OUT of shuffles (extract
metadata early, drop/offload payloads before any groupBy/join), size Arrow
batches down for fat rows (spark.sql.execution.arrow.maxRecordsPerBatch),
and never collect payload columns to the driver.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("n_bytes", T.LongType()),
        T.StructField("magic_hex", T.StringType()),
        T.StructField("sha", T.StringType()),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
    ]
)


def media_meta(col: Column | str) -> Column:
    """Cheap typed metadata from the raw bytes — pure Columns, no Python:
    size, magic-number hex, content hash. This is the 'extract metadata
    before shuffling payloads' step."""
    c = F.col(col) if isinstance(col, str) else col
    return F.struct(
        F.octet_length(c).cast("bigint").alias("n_bytes"),
        F.lower(F.hex(F.substring(c, 1, 4))).alias("magic_hex"),
        F.sha2(c, 256).alias("sha"),
    )


def decode_image(payload: bytes) -> tuple[int, int, int]:
    """Real codec hook — intentionally unimplemented in this container."""
    raise NotImplementedError(
        "image decoding requires a codec library (e.g. PIL) not present in "
        "this environment; use fake_decode for the deterministic test path"
    )


def fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in: 'dimensions' derived from the payload bytes.
    Keeps the full Spark plumbing testable without a codec."""
    if payload is None or len(payload) == 0:
        return (0, 0, 0)
    w = 1 + (payload[0] % 64)
    h = 1 + (payload[-1] % 64)
    return (w, h, 3)


def with_decoded(
    df: DataFrame,
    payload_col: str = "payload",
    out: str = "decoded",
    decoder=fake_decode,
) -> DataFrame:
    """Arrow-batched decode stage as a SCALAR pandas_udf over the payload
    column (passenger-column discipline: ids/metadata stay JVM-side, only
    payload in / decoded struct out); the payload drops in the same
    projection, so decoded features only cross the shuffle."""

    def decode_fn(col):
        import pandas as pd

        rows = [
            (None, None, None)
            if p is None
            else decoder(bytes(p))
            for p in col
        ]
        return pd.DataFrame(rows, columns=["width", "height", "channels"])

    dec = F.pandas_udf(decode_fn, DECODED_SCHEMA)
    keep = [c for c in df.columns if c != payload_col]
    # NULL payload ⇒ NULL struct (not a struct of NULLs) — the batch-wise
    # udf can only null fields, so the row-level null lifts via when()
    return df.select(
        *keep,
        F.when(
            F.col(payload_col).isNotNull(), dec(F.col(payload_col))
        ).alias(out),
    )


def frame_sample_indices(n_frames: Column | str, every: int = 10) -> Column:
    """Video frame-sampling plan: indices 0, every, 2·every … < n_frames —
    a Column expression the decode UDF consumes per row."""
    c = F.col(n_frames) if isinstance(n_frames, str) else n_frames
    return F.sequence(
        F.lit(0), F.greatest(c - 1, F.lit(0)), F.lit(every)
    )


FEATURES_RAW_SCHEMA = T.StructType(
    [
        T.StructField("n_bytes", T.LongType()),
        T.StructField("bucket_counts", T.ArrayType(T.LongType())),
    ]
)


def with_byte_histogram(
    df: DataFrame,
    payload_col: str = "payload",
    out: str = "feat",
    buckets: int = 16,
) -> DataFrame:
    """REAL (non-stubbed) feature extraction from a binary column: the
    normalized byte-value histogram — the classic content-type /
    entropy-ish signature used for file-type classification and cheap
    near-dup blocking of media payloads. numpy over Arrow batches
    (frombuffer + bincount, no per-byte Python), payload dropped on
    output so only the fixed-width feature crosses any shuffle.

    Emits raw integer ``bucket_counts`` (byte >> 4 for 16 buckets) plus
    ``n_bytes``; callers normalize with :func:`histogram_features` —
    keeping the Python hop integer-only makes the result bit-portable to
    any re-derivation (no float rounding inside the UDF).

    The hop is a SCALAR pandas_udf over the payload column (the
    passenger-column discipline of with_grok_vectorized): ids/metadata
    never cross the Arrow boundary, only payload in and the fixed-width
    feature struct out — and the payload drops in the SAME projection, so
    it still never reaches a shuffle."""
    if 256 % buckets:
        raise ValueError(f"buckets must divide 256, got {buckets}")
    shift = (256 // buckets).bit_length() - 1  # byte >> shift → bucket

    def feat_fn(col):
        import numpy as np
        import pandas as pd

        n_bytes = []
        bucket_counts = []
        for p in col:
            if p is None or len(p) == 0:
                n_bytes.append(0)
                bucket_counts.append([0] * buckets)
                continue
            arr = np.frombuffer(bytes(p), dtype=np.uint8)
            n_bytes.append(len(arr))
            bucket_counts.append(
                np.bincount(arr >> shift, minlength=buckets).tolist()
            )
        return pd.DataFrame(
            {"n_bytes": n_bytes, "bucket_counts": bucket_counts}
        )

    feat = F.pandas_udf(feat_fn, FEATURES_RAW_SCHEMA)
    keep = [c for c in df.columns if c != payload_col]
    return df.select(*keep, feat(F.col(payload_col)).alias(out))


def histogram_features(feat: Column | str, decimals: int = 6) -> Column:
    """Normalize raw bucket counts to frequencies (array<double>) in pure
    Columns — rounding happens JVM-side so Spark and any SQL oracle share
    one rounding rule."""
    c = F.col(feat) if isinstance(feat, str) else feat
    n = F.greatest(c.getField("n_bytes"), F.lit(1))
    return F.transform(
        c.getField("bucket_counts"), lambda x: F.round(x / n, decimals)
    )


def resize_plan(
    width: Column | str,
    height: Column | str,
    max_side: int = 224,
    multiple: int = 8,
) -> Column:
    """Resize PLANNING as pure Columns — the aspect-ratio-preserving target
    geometry every image pipeline computes before touching pixels: scale
    the longer side down to ``max_side`` (never upscale), snap both dims
    down to the codec-friendly ``multiple`` (min one multiple), and carry
    the scale factor for coordinate remapping. Returns a struct
    (target_w, target_h, scale). The pixel resample itself belongs in the
    decode UDF (stubbed here like decode_image — no codec libs in this
    container); splitting plan from pixels keeps the geometry testable,
    oracle-checkable, and shuffle-free."""
    w = F.col(width) if isinstance(width, str) else width
    h = F.col(height) if isinstance(height, str) else height
    w, h = w.cast("double"), h.cast("double")
    longer = F.greatest(w, h)
    scale = F.when(longer > max_side, max_side / longer).otherwise(F.lit(1.0))
    snap = lambda d: F.greatest(  # noqa: E731
        (F.floor(d * scale / multiple) * multiple).cast("int"), F.lit(multiple)
    )
    return F.when(
        (w > 0) & (h > 0),
        F.struct(
            snap(w).alias("target_w"),
            snap(h).alias("target_h"),
            F.round(scale, 6).alias("scale"),
        ),
    ).otherwise(
        F.struct(
            F.lit(0).alias("target_w"),
            F.lit(0).alias("target_h"),
            F.lit(0.0).alias("scale"),
        )
    )


def perceptual_hash(
    df: DataFrame,
    feat_col: str = "feat",
    out: str = "phash",
    buckets: int = 16,
) -> DataFrame:
    """Average-hash style perceptual fingerprint from the byte-histogram
    feature (:func:`with_byte_histogram`): bit b is set iff bucket b's
    count exceeds the mean bucket count — the classic aHash construction
    applied to the payload's byte-value distribution instead of decoded
    pixels (the codec-free variant this container can verify; with a real
    decoder the same construction runs over downsampled luma blocks).
    Near-identical payloads land on equal fingerprints, so media near-dup
    blocking becomes a hash equi-join — never a pairwise scan.

    The compare is INTEGER-only (count·buckets > n_bytes ⇔ count > mean),
    so fingerprints are bit-stable across engines; the bit-OR is a
    fixed-arity unrolled sum of distinct powers of two."""
    counts = F.col(feat_col).getField("bucket_counts")
    n = F.col(feat_col).getField("n_bytes")
    expr = F.lit(0)
    for b in range(buckets):
        expr = expr + F.when(
            F.element_at(counts, b + 1) * buckets > n, F.lit(1 << b)
        ).otherwise(F.lit(0))
    return df.withColumn(out, expr.cast("int"))


def phash_near_dups(
    df: DataFrame,
    phash_col: str = "phash",
    id_col: str = "doc_id",
    bits: int = 16,
    bands: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """Hamming near-dup pairs over perceptual hashes:
    (id_a, id_b, hamming) with hamming ≤ ``max_hamming`` — near-identical
    media detection (re-encoded / slightly-edited copies land within a few
    fingerprint bits of each other; equal-hash joins miss them).

    Scale shape is the pigeonhole band trick (the multi-index hamming
    method of Norouzi et al.): the ``bits``-bit fingerprint splits into
    ``bands`` equal substrings; any pair within ``max_hamming`` bit flips
    (< ``bands``) leaves at least one band untouched, so candidates are
    the union of per-band EQUI-joins on (band_idx, band_value) — never a
    pairwise scan — then one codegen ``bit_count(a XOR b)`` verifies the
    exact distance. Requires ``max_hamming < bands`` or recall breaks;
    enforced here. The banded projection is persisted (both self-join
    sides read it); caller releases via release_persisted."""
    if max_hamming >= bands:
        raise ValueError(
            f"pigeonhole recall needs max_hamming < bands, "
            f"got {max_hamming} >= {bands}"
        )
    if bits % bands:
        raise ValueError(f"bits ({bits}) must divide into {bands} bands")
    from logsight_filebeat_spark.functions.caching import track_persist

    w = bits // bands
    ph = F.col(phash_col).cast("bigint")
    banded = track_persist(
        df.select(
            F.col(id_col).alias("id"),
            ph.alias("ph"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"),
                            ph.bitwiseAND(
                                F.lit(((1 << w) - 1) << (b * w))
                            ).alias("val"),
                        )
                        for b in range(bands)
                    ]
                )
            ).alias("bv"),
        ).select("id", "ph", F.col("bv.band").alias("band"), F.col("bv.val").alias("val"))
    )
    a = banded.alias("a")
    b2 = banded.alias("b")
    return (
        a.join(
            b2,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(
                F.col("a.ph").bitwiseXOR(F.col("b.ph"))
            ).cast("bigint").alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
