"""Sequence packing (operators/packing.py): GPT-style pack-and-chunk
offsets via the two-phase global cumsum. The reference answer for every
test is the single-partition pandas fold the two-phase plan must equal."""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F
import pytest

from hudi_and_delta_showcase_spark.operators.packing import packed_sequences


def _expected(rows: list[tuple[int, int]], budget: int):
    """Driver-side reference: sort by md5(id), running offsets."""
    ordered = sorted(
        rows, key=lambda r: hashlib.md5(str(r[0]).encode()).hexdigest()
    )
    out, off = {}, 0
    for doc_id, n in ordered:
        out[doc_id] = (
            n,
            off,
            off // budget,
            (off + max(n, 1) - 1) // budget,
        )
        off += n
    return out


def _collect(df):
    return {
        r.doc_id: (r.n_tokens, r.start_offset, r.seq_first, r.seq_last)
        for r in df.collect()
    }


def test_matches_sequential_reference(spark):
    rows = [(i, (i * 37) % 900 + 1) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, n long")
    got = _collect(packed_sequences(df, "doc_id", "n", budget=2048))
    assert got == _expected(rows, 2048)


def test_offsets_are_gapless_and_disjoint(spark):
    rows = [(i, i % 50 + 1) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, n long")
    out = sorted(
        packed_sequences(df, "doc_id", "n", budget=128).collect(),
        key=lambda r: r.start_offset,
    )
    off = 0
    for r in out:
        assert r.start_offset == off  # concatenation leaves no gaps
        off += r.n_tokens
    assert off == sum(n for _, n in rows)


def test_budget_spanning_doc(spark):
    # one doc larger than the budget spans multiple sequences
    df = spark.createDataFrame(
        [(1, 10), (2, 5000), (3, 7)], "doc_id long, n long"
    )
    got = _collect(packed_sequences(df, "doc_id", "n", budget=1000))
    big = got[2]
    assert big[3] - big[2] >= 4  # 5000 tokens cross >=4 boundaries
    for n, start, first, last in got.values():
        assert first == start // 1000
        assert last == (start + max(n, 1) - 1) // 1000


def test_empty_docs_occupy_start_sequence(spark):
    df = spark.createDataFrame(
        [(1, 0), (2, 10), (3, 0)], "doc_id long, n long"
    )
    got = _collect(packed_sequences(df, "doc_id", "n", budget=8))
    for n, start, first, last in got.values():
        if n == 0:
            assert first == last == start // 8


def test_deterministic_across_partitionings(spark):
    rows = [(i, (i * 13) % 200 + 1) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, n long")
    a = _collect(packed_sequences(df, "doc_id", "n", 512, partitions=3))
    b = _collect(packed_sequences(df, "doc_id", "n", 512, partitions=17))
    assert a == b  # layout is a pure function of (ids, tokens, budget)


def test_rejects_bad_budget(spark):
    df = spark.createDataFrame([(1, 1)], "doc_id long, n long")
    with pytest.raises(ValueError):
        packed_sequences(df, "doc_id", "n", budget=0)
