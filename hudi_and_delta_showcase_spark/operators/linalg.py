"""Distributed linear algebra for embedding columns: PCA via
single-pass partial second moments.

The 100 TB shape: a d-dim embedding corpus needs only the d x d second
moment (Gram) matrix and the d-dim mean to fit PCA — both are SUMS, so
every partition computes its own (one numpy ``X.T @ X`` per Arrow
batch, C speed) and emits ONE summary row of d*d + d + 1 numbers. With
d=64 and 10k partitions that's ~3 MB total to the driver: a bounded,
metadata-scale collect (the same budget class as the engine's other
driver-side summaries), never a collect of the vectors themselves. The
eigendecomposition of the d x d covariance is microseconds on the
driver; components broadcast back into a vectorized projection (one
``X @ W`` matmul per batch).

Sign convention: each eigenvector is flipped so its
largest-|coordinate| entry is positive — eigenvectors are only defined
up to sign, and pinning it makes the fit deterministic for a given
corpus regardless of partitioning (partial sums are reduced with
numpy's pairwise summation over a PARTITION-SORTED list, so the float
reduction order is fixed too).

Why not MLlib: ``pyspark.ml.feature.PCA`` exists, but it RDD-converts
through Vector UDTs (row-at-a-time serialization of every embedding);
the Arrow-batched moment pass stays columnar end to end and feeds the
same (mean, components) into any consumer.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def _moment_partials(df: DataFrame, vec_col: str) -> DataFrame:
    """Per-partition ``(n, sum_vec, gram_flat)`` — one row each."""

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        s = None
        g = None
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            n += mat.shape[0]
            s = mat.sum(axis=0) if s is None else s + mat.sum(axis=0)
            gg = mat.T @ mat
            g = gg if g is None else g + gg
        if n:
            yield pd.DataFrame(
                {
                    "n": [n],
                    "sum_vec": [s.tolist()],
                    "gram": [g.reshape(-1).tolist()],
                }
            )

    return df.select(vec_col).mapInPandas(
        summarize, "n long, sum_vec array<double>, gram array<double>"
    )


def pca_fit(
    df: DataFrame, vec_col: str, n_components: int
) -> tuple["np.ndarray", "np.ndarray", "np.ndarray"]:
    """Fit PCA over an embedding column in ONE distributed pass.
    Returns ``(mean [d], components [n_components x d], explained
    variance [n_components], descending)``."""
    rows = _moment_partials(df, vec_col).collect()  # one row/partition
    if not rows:
        raise ValueError("pca_fit: empty input")
    rows = sorted(rows, key=lambda r: (r.n, r.sum_vec))  # fixed fold order
    n = sum(r.n for r in rows)
    d = len(rows[0].sum_vec)
    s = np.sum([np.array(r.sum_vec) for r in rows], axis=0)
    gram = np.sum([np.array(r.gram).reshape(d, d) for r in rows], axis=0)
    mean = s / n
    cov = gram / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:n_components]
    comps = evecs[:, order].T  # (k, d)
    # pin the sign: largest-|coordinate| entry positive
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean, comps, np.maximum(evals[order], 0.0)


def pca_project(
    df: DataFrame,
    vec_col: str,
    mean: "np.ndarray",
    components: "np.ndarray",
    out_col: str = "projected",
    round_digits: int | None = None,
) -> DataFrame:
    """Project the embedding column onto fitted components — one
    ``(X - mean) @ W.T`` numpy matmul per Arrow batch, components
    riding the UDF closure (k x d floats, broadcast once per task)."""
    mean_l = np.asarray(mean, dtype=np.float64)
    comps_t = np.asarray(components, dtype=np.float64).T  # (d, k)

    @F.pandas_udf("array<double>")
    def _proj(vs: pd.Series) -> pd.Series:
        mat = np.asarray([np.asarray(v, dtype=np.float64) for v in vs])
        out = (mat - mean_l) @ comps_t
        if round_digits is not None:
            out = np.round(out, round_digits)
        return pd.Series(list(out))

    return df.withColumn(out_col, _proj(F.col(vec_col)))


def reconstruction_ok(
    df: DataFrame,
    vec_col: str,
    proj_col: str,
    mean: "np.ndarray",
    components: "np.ndarray",
    tol: float = 1e-6,
    out_col: str = "reconstruction_ok",
) -> DataFrame:
    """Boolean gate: does inverting the projection (``p @ W + mean``)
    reproduce the original vector within ``tol``? True for every row
    under a correct full-rank fit — the hash-exact invariant the
    registry query pins. One matmul per Arrow batch."""
    mean_l = np.asarray(mean, dtype=np.float64)
    comps = np.asarray(components, dtype=np.float64)

    @F.pandas_udf("boolean")
    def _ok(embs: pd.Series, projs: pd.Series) -> pd.Series:
        e = np.asarray([np.asarray(v, dtype=np.float64) for v in embs])
        p = np.asarray([np.asarray(v, dtype=np.float64) for v in projs])
        back = p @ comps + mean_l
        return pd.Series(np.max(np.abs(back - e), axis=1) < tol)

    return df.withColumn(out_col, _ok(F.col(vec_col), F.col(proj_col)))
