"""Distributed PCA (operators/linalg.py): the one-pass moment fit must
equal numpy's full-data PCA, stay invariant to partitioning, and
project correctly."""

from __future__ import annotations

import numpy as np
import pytest

from hudi_and_delta_showcase_spark.io import load_table
from hudi_and_delta_showcase_spark.operators import linalg as L


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    # unpersist on teardown: a lingering cached embeddings relation
    # would substitute InMemoryRelation into every LATER test's plan
    # over the same scan (test_plans asserts on the parquet plans)
    df = load_table(spark, sf_dir, "embeddings").cache()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def emb_np(emb):
    rows = emb.select("embedding").collect()
    return np.asarray([np.asarray(r.embedding, dtype=np.float64) for r in rows])


def test_fit_matches_numpy(emb, emb_np):
    mean, comps, ev = L.pca_fit(emb, "embedding", 8)
    assert np.allclose(mean, emb_np.mean(axis=0), atol=1e-9)
    centered = emb_np - emb_np.mean(axis=0)
    cov = centered.T @ centered / len(emb_np)
    evals, evecs = np.linalg.eigh(cov)
    top = evecs[:, np.argsort(evals)[::-1][:8]].T
    # eigenvectors match up to sign: |cos| of each pair ~ 1
    cos = np.abs(np.sum(comps * top, axis=1))
    assert np.allclose(cos, 1.0, atol=1e-6)
    assert np.allclose(ev, np.sort(evals)[::-1][:8], atol=1e-9)
    assert np.all(np.diff(ev) <= 1e-12)  # descending


def test_components_orthonormal(emb):
    _mean, comps, _ev = L.pca_fit(emb, "embedding", 16)
    assert np.allclose(comps @ comps.T, np.eye(16), atol=1e-9)


def test_fit_invariant_to_partitioning(emb):
    m1, c1, e1 = L.pca_fit(emb.repartition(3), "embedding", 8)
    m2, c2, e2 = L.pca_fit(emb.repartition(11), "embedding", 8)
    assert np.allclose(m1, m2, atol=1e-9)
    assert np.allclose(e1, e2, atol=1e-7)
    assert np.allclose(np.abs(np.sum(c1 * c2, axis=1)), 1.0, atol=1e-7)


def test_projection_matches_numpy(emb, emb_np):
    mean, comps, _ev = L.pca_fit(emb, "embedding", 8)
    got = {
        r.vec_id: np.asarray(r.projected)
        for r in L.pca_project(emb, "embedding", mean, comps).collect()
    }
    ids = [r.vec_id for r in emb.select("vec_id").collect()]
    want = (emb_np - mean) @ comps.T
    for i, vid in enumerate(ids):
        assert np.allclose(got[vid], want[i], atol=1e-8)


def test_full_rank_reconstructs_exactly(emb, emb_np):
    """Rank-d PCA is a rotation: projecting then un-projecting returns
    the original vectors — the invariant the registry gate pins."""
    d = emb_np.shape[1]
    mean, comps, _ev = L.pca_fit(emb, "embedding", d)
    proj = L.pca_project(emb, "embedding", mean, comps)
    rows = proj.select("embedding", "projected").collect()
    for r in rows:
        back = np.asarray(r.projected) @ comps + mean
        assert np.allclose(back, np.asarray(r.embedding, dtype=np.float64), atol=1e-6)
