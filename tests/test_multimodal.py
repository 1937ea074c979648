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


def test_decode_requires_fake_flag(spark, sf_dir):
    docs = _blob_docs(spark, sf_dir)
    if not M.has_real_codec():
        with pytest.raises(NotImplementedError):
            M.decode_image(docs, "doc_id", "blob")
    with pytest.raises(NotImplementedError):
        M.resize_image(docs, "doc_id", "blob", 32, 32)


@pytest.mark.skipif(not M.has_real_codec(), reason="PIL not installed")
def test_real_decode_with_pil(spark):
    """The fake=False branch, exercised when PIL exists: decode a real
    PNG generated in-process and check exact dimensions."""
    import io as _io

    from PIL import Image

    buf = _io.BytesIO()
    Image.new("RGB", (17, 9)).save(buf, format="PNG")
    df = spark.createDataFrame([(1, bytearray(buf.getvalue()))], "id long, blob binary")
    row = M.decode_image(df, "id", "blob").collect()[0]
    assert (row.width, row.height, row.channels) == (17, 9, 3)


def test_media_meta_stamps_hash_and_size(spark, sf_dir):
    docs = M.attach_media_meta(_blob_docs(spark, sf_dir), "blob", "image", "raw")
    row = docs.select("blob_meta", F.length("blob").alias("n")).first()
    assert row.blob_meta.media_type == "image"
    assert row.blob_meta.n_bytes == row.n
    assert len(row.blob_meta.content_sha256) == 64
