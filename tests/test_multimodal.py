"""Multimodal pipeline tests: the Arrow-batched stages produce exactly
the values a local recomputation gives, and the gated (codec-less) paths
fail loudly rather than silently."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from hudi_and_delta_showcase_spark.io import load_table
from hudi_and_delta_showcase_spark.operators import multimodal as M


def _blob_docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").withColumn(
        "blob", F.encode(F.col("text"), "UTF-8")
    )


def test_feature_extract_matches_local(spark, sf_dir):
    docs = _blob_docs(spark, sf_dir).limit(20)
    expected = {}
    for r in docs.select("doc_id", "text").collect():
        payload = r.text.encode("utf-8")
        counts = [0] * 16
        for b in payload:
            counts[b >> 4] += 1
        n = len(payload)
        ent = -sum((c / n) * math.log2(c / n) for c in counts if c)
        expected[r.doc_id] = (n, f"{ent:.6f}", ",".join(map(str, counts)))
    got = {
        r.id: (r.n_bytes, r.byte_entropy, r.hist16)
        for r in M.extract_features(docs, "doc_id", "blob").collect()
    }
    assert got == expected


def test_real_decode_rejects_non_image(spark, sf_dir):
    """fake=False on arbitrary text blobs fails loudly per-row (ValueError
    from the codec) rather than emitting stub dims silently."""
    docs = _blob_docs(spark, sf_dir).limit(3)
    with pytest.raises(Exception, match="PNG|image"):
        M.decode_image(docs, "doc_id", "blob").collect()


def _png_blob(w, h, ch=3):
    from hudi_and_delta_showcase_spark.operators.png_codec import png_encode

    pixels = bytes((x * 7 + 3) % 256 for x in range(w * h * ch))
    return png_encode(w, h, ch, pixels), pixels


def test_real_decode_png(spark):
    """The fake=False branch executes for real — PIL when present, the
    vendored pure-stdlib PNG parser otherwise: exact dimensions from an
    in-process-generated PNG."""
    blob, _ = _png_blob(17, 9)
    df = spark.createDataFrame([(1, bytearray(blob))], "id long, blob binary")
    row = M.decode_image(df, "id", "blob").collect()[0]
    assert (row.width, row.height, row.channels) == (17, 9, 3)
    assert row.n_bytes == len(blob)


def test_resize_image_real_dims(spark):
    """resize_image(fake=False) reads REAL source dims from the PNG."""
    blob, _ = _png_blob(20, 10)
    df = spark.createDataFrame([(1, bytearray(blob))], "id long, blob binary")
    row = M.resize_image(df, "id", "blob", 5, 5).collect()[0]
    assert (row.src_w, row.src_h) == (20, 10)
    assert (row.scale_x, row.scale_y) == (5 / 20, 5 / 10)


def test_resize_image_blobs_roundtrip(spark):
    """Real pixel path: decode -> nearest resample -> re-encode on the
    executors; the output blob round-trips through the decoder with the
    target dims and exactly the nearest-sampled pixels."""
    from hudi_and_delta_showcase_spark.operators.png_codec import png_decode

    blob, pixels = _png_blob(6, 4)
    df = spark.createDataFrame([(1, bytearray(blob))], "id long, blob binary")
    out = M.resize_image_blobs(df, "id", "blob", 3, 2).collect()[0]
    w, h, ch, got = png_decode(bytes(out.blob))
    assert (w, h, ch) == (3, 2, 3)
    expected = bytearray()
    for y in range(2):
        sy = y * 4 // 2
        for x in range(3):
            sx = x * 6 // 3
            base = (sy * 6 + sx) * 3
            expected += pixels[base : base + 3]
    assert bytes(got) == bytes(expected)


def test_media_meta_stamps_hash_and_size(spark, sf_dir):
    docs = M.attach_media_meta(_blob_docs(spark, sf_dir), "blob", "image", "raw")
    row = docs.select("blob_meta", F.length("blob").alias("n")).first()
    assert row.blob_meta.media_type == "image"
    assert row.blob_meta.n_bytes == row.n
    assert len(row.blob_meta.content_sha256) == 64
