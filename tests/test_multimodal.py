"""Multimodal binary-column plumbing (operators/multimodal.py)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from logsight_filebeat_spark.operators import multimodal as mm


def _payloads(spark):
    rows = [(1, b"\x89PNG\r\n fake image bytes"), (2, b"RIFF fake wav"), (3, None)]
    return spark.createDataFrame(rows, "media_id bigint, payload binary")


def test_media_meta_columns(spark):
    df = _payloads(spark)
    rows = {r.media_id: r for r in df.select("media_id", mm.media_meta("payload").alias("m")).collect()}
    assert rows[1].m.n_bytes == len(b"\x89PNG\r\n fake image bytes")
    assert rows[1].m.magic_hex == "89504e47"  # PNG magic
    assert rows[1].m.sha == hashlib.sha256(b"\x89PNG\r\n fake image bytes").hexdigest()
    assert rows[2].m.magic_hex == "52494646"  # RIFF
    assert rows[3].m.n_bytes is None


def test_decode_image_stub_raises():
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"anything")


def test_fake_decode_deterministic():
    assert mm.fake_decode(b"") == (0, 0, 0)
    w, h, c = mm.fake_decode(b"\x05abc\x0a")
    assert (w, h, c) == (1 + 5 % 64, 1 + 0x0A % 64, 3)


def test_with_decoded_drops_payload_and_decodes(spark):
    df = _payloads(spark)
    out = mm.with_decoded(df)
    assert "payload" not in out.columns  # bytes never cross the shuffle
    rows = {r.media_id: r.decoded for r in out.collect()}
    assert rows[1].width == 1 + 0x89 % 64
    assert rows[1].channels == 3
    assert rows[3] is None or rows[3].width == 0


def test_frame_sample_indices(spark):
    df = spark.createDataFrame([(25,), (3,), (0,)], "n_frames int")
    vals = [r.idx for r in df.select(mm.frame_sample_indices("n_frames", every=10).alias("idx")).collect()]
    assert vals[0] == [0, 10, 20]
    assert vals[1] == [0]
    assert vals[2] == [0]


def test_byte_histogram_features(spark):
    """Known payloads produce exact bucket counts; normalization and empty
    payloads behave; payload column is dropped before anything shuffles."""
    from logsight_filebeat_spark.operators.multimodal import (
        histogram_features,
        with_byte_histogram,
    )

    rows = [
        (1, bytes([0x00, 0x01, 0x0F, 0xFF])),  # 3× bucket 0, 1× bucket 15
        (2, b""),
        (3, None),
        (4, bytes(range(256))),  # uniform: 16 per bucket
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    out = with_byte_histogram(df)
    assert "payload" not in out.columns
    got = {
        r.doc_id: r
        for r in out.select(
            "doc_id", "feat.*", histogram_features("feat").alias("probs")
        ).collect()
    }
    assert got[1].n_bytes == 4
    assert got[1].bucket_counts[0] == 3 and got[1].bucket_counts[15] == 1
    assert got[1].probs[0] == 0.75 and got[1].probs[15] == 0.25
    assert got[2].n_bytes == 0 and sum(got[2].bucket_counts) == 0
    assert got[3].n_bytes == 0
    assert got[4].bucket_counts == [16] * 16
    assert all(p == 0.0625 for p in got[4].probs)


def test_resize_plan_geometry(spark):
    """Aspect preserved, no upscale, multiple-of-8 snap with a floor of one
    multiple, degenerate dims plan to zero."""
    from logsight_filebeat_spark.operators.multimodal import resize_plan

    rows = [(1, 640, 480), (2, 100, 50), (3, 2000, 10), (4, 0, 100)]
    df = spark.createDataFrame(rows, "id bigint, w int, h int")
    got = {r.id: r for r in df.select("id", resize_plan("w", "h").alias("p")).select("id", "p.*").collect()}
    assert (got[1].target_w, got[1].target_h) == (224, 168)  # 640×0.35, 480×0.35→168
    assert got[2].scale == 1.0 and (got[2].target_w, got[2].target_h) == (96, 48)
    assert got[3].target_h == 8  # snapped up to the floor of one multiple
    assert got[3].target_w == 224
    assert (got[4].target_w, got[4].target_h, got[4].scale) == (0, 0, 0.0)


def test_frame_sample_indices_edges(spark):
    import pyspark.sql.functions as F

    from logsight_filebeat_spark.operators.multimodal import frame_sample_indices

    df = spark.createDataFrame([(1,), (25,), (10,), (11,)], "n long")
    got = {
        r.n: r.idx
        for r in df.select(
            "n", frame_sample_indices("n", every=10).alias("idx")
        ).collect()
    }
    assert got == {1: [0], 25: [0, 10, 20], 10: [0], 11: [0, 10]}


def test_perceptual_hash_bits(spark):
    from logsight_filebeat_spark.operators.multimodal import (
        perceptual_hash,
        with_byte_histogram,
    )

    # payload of 4 bytes: 0x00 ×3, 0xF0 ×1 → bucket0 count 3, bucket15
    # count 1; mean = 4/16 = 0.25 → bits set where count > 0.25: both
    rows = [(1, bytes([0, 0, 0, 0xF0])), (2, bytes([0, 0, 0, 0xF0])),
            (3, bytes([0x10] * 8))]
    df = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    got = {
        r["doc_id"]: r["phash"]
        for r in perceptual_hash(with_byte_histogram(df)).collect()
    }
    assert got[1] == (1 << 0) | (1 << 15)
    assert got[1] == got[2]  # identical payloads collide (the blocking key)
    assert got[3] == (1 << 1)  # all bytes in bucket 1
