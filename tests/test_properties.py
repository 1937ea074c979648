"""Property-based tests (hypothesis) for the upsert/merge semantic core —
the invariants the reference's golden scenario spot-checks, asserted over
generated inputs: precombine latest-wins, upsert idempotence, key
conservation, and CoW ≡ MoR-realtime equivalence."""

from __future__ import annotations

import tempfile

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hudi_and_delta_showcase_spark.operators.cdc import precombine_dedup
from hudi_and_delta_showcase_spark.operators.upsert import upsert
from hudi_and_delta_showcase_spark.tables import LakehouseTable

ROW = st.tuples(
    st.integers(min_value=0, max_value=5),     # key
    st.integers(min_value=0, max_value=50),    # precombine (version)
    st.integers(min_value=-100, max_value=100) # payload
)
BATCH = st.lists(ROW, min_size=1, max_size=12)

_SCHEMA = "k int, v int, payload int"


def _df(spark, rows):
    return spark.createDataFrame([(k, v, p) for k, v, p in rows], _SCHEMA)


def _final(df):
    return sorted(tuple(r) for r in df.select("k", "v", "payload").collect())


def _expected_merge(target_rows, source_rows):
    """Reference semantics in plain Python: source precombined per key
    (max v, max payload tiebreak), matched keys replaced, unmatched kept."""
    src = {}
    for k, v, p in source_rows:
        if k not in src or (v, p) > src[k]:
            src[k] = (v, p)
    out = {k: (v, p) for k, v, p in target_rows if k not in src}
    tgt_keys = {k for k, _, _ in target_rows}
    for k, (v, p) in src.items():
        out[k] = (v, p)
    return sorted((k, v, p) for k, (v, p) in out.items()), tgt_keys


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(tgt=BATCH, src=BATCH)
def test_upsert_matches_reference_semantics(spark, tgt, src):
    # target must itself be keyed (one row per key) — precombine it first
    target = precombine_dedup(_df(spark, tgt), ["k"], "v", ["payload"])
    merged = upsert(target, _df(spark, src), ["k"],
                    precombine="v", tiebreakers=["payload"])
    expected, _ = _expected_merge(_final(target), src)
    assert _final(merged) == expected


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(tgt=BATCH, src=BATCH)
def test_upsert_idempotent(spark, tgt, src):
    """Applying the same CDC batch twice must equal applying it once —
    the invariant that makes foreachBatch replay (at-least-once file
    delivery) safe."""
    target = precombine_dedup(_df(spark, tgt), ["k"], "v", ["payload"])
    source = _df(spark, src)
    once = upsert(target, source, ["k"], precombine="v", tiebreakers=["payload"])
    twice = upsert(once, source, ["k"], precombine="v", tiebreakers=["payload"])
    assert _final(once) == _final(twice)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(tgt=BATCH, src=BATCH)
def test_upsert_conserves_keys(spark, tgt, src):
    target = precombine_dedup(_df(spark, tgt), ["k"], "v", ["payload"])
    merged = upsert(target, _df(spark, src), ["k"],
                    precombine="v", tiebreakers=["payload"])
    got_keys = {r.k for r in merged.select("k").collect()}
    assert got_keys == {k for k, _, _ in tgt} | {k for k, _, _ in src}


#: rows with a (possibly null) partition value that keys can MOVE across
#: batches — exercises the non-global-index semantics.
PART_ROW = st.tuples(
    st.integers(min_value=0, max_value=5),                     # key
    st.integers(min_value=0, max_value=50),                    # precombine
    st.integers(min_value=-100, max_value=100),                # payload
    st.one_of(st.none(), st.sampled_from(["a", "b", "c"])),    # partition
)
PART_BATCH = st.lists(PART_ROW, min_size=1, max_size=12)

_PART_SCHEMA = "k int, v int, payload int, part string"


def _pdf(spark, rows):
    return spark.createDataFrame(list(rows), _PART_SCHEMA)


def _pfinal(df):
    return sorted(
        tuple(r) for r in df.select("k", "v", "payload", "part").collect()
    )


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(base=PART_BATCH, incr=PART_BATCH)
def test_partitioned_cow_equals_mor_rt(spark, base, incr):
    """CoW == MoR `_rt` must ALSO hold for partitioned tables with
    partition-moving keys and null partition values (non-global index:
    a key is unique per partition, so a moved key yields one row per
    partition it appeared in — identically in both layouts)."""
    finals = []
    for table_type in ("cow", "mor"):
        path = tempfile.mkdtemp(prefix=f"prop_part_{table_type}_")
        t = LakehouseTable.create(
            spark, f"{path}/t", _pdf(spark, base),
            key_cols=["k"], precombine="v", tiebreakers=["payload"],
            partition_by="part", table_type=table_type,
        )
        t.upsert(_pdf(spark, incr))
        finals.append(_pfinal(t.read()))
    assert finals[0] == finals[1]


def test_partition_move_keeps_both_partition_rows(spark):
    """Non-global index pinned explicitly: upserting key 1 under a NEW
    partition value must not delete (or duplicate within) the old
    partition's row, and the new partition resolves to the new value."""
    import tempfile as tf

    for table_type in ("cow", "mor"):
        t = LakehouseTable.create(
            spark, tf.mkdtemp(prefix="pmove_") + "/t",
            _pdf(spark, [(1, 1, 10, "a"), (2, 1, 20, None)]),
            key_cols=["k"], precombine="v",
            partition_by="part", table_type=table_type,
        )
        t.upsert(_pdf(spark, [(1, 2, 11, "b"), (2, 2, 21, None)]))
        assert _pfinal(t.read()) == [
            (1, 1, 10, "a"),   # old partition row survives the move
            (1, 2, 11, "b"),   # new partition row exists
            (2, 2, 21, None),  # null partition upserts IN PLACE
        ], table_type


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(base=PART_BATCH, incr=PART_BATCH)
def test_global_index_cow_equals_mor_and_unpartitioned(spark, base, incr):
    """Two properties of global_index=True under partition-moving keys:
    (1) CoW == MoR `_rt` still holds (relocation resolves identically in
    the anti-join rewrite and the table-wide merge window); (2) a global
    partitioned table's final state equals the same sequence applied to
    an UNPARTITIONED table — partitioning becomes pure physical layout
    once keys are unique table-wide, which is exactly the global-index
    contract."""
    finals = []
    for table_type in ("cow", "mor"):
        path = tempfile.mkdtemp(prefix=f"prop_glob_{table_type}_")
        t = LakehouseTable.create(
            spark, f"{path}/t", _pdf(spark, base),
            key_cols=["k"], precombine="v", tiebreakers=["payload", "part"],
            partition_by="part", table_type=table_type, global_index=True,
        )
        t.upsert(_pdf(spark, incr))
        finals.append(_pfinal(t.read()))
    assert finals[0] == finals[1]
    path = tempfile.mkdtemp(prefix="prop_glob_flat_")
    flat = LakehouseTable.create(
        spark, f"{path}/t", _pdf(spark, base),
        key_cols=["k"], precombine="v", tiebreakers=["payload", "part"],
    )
    flat.upsert(_pdf(spark, incr))
    assert finals[0] == _pfinal(flat.read())


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(base=BATCH, incr=BATCH)
def test_cow_equals_mor_rt(spark, base, incr):
    """The two storage disciplines must answer identically after the same
    insert+upsert sequence (CoW snapshot == MoR real-time view) — the
    central claim of README.md:920 generalized."""
    finals = []
    for table_type in ("cow", "mor"):
        path = tempfile.mkdtemp(prefix=f"prop_{table_type}_")
        t = LakehouseTable.create(
            spark, f"{path}/t", _df(spark, base),
            key_cols=["k"], precombine="v", tiebreakers=["payload"],
            table_type=table_type,
        )
        t.upsert(_df(spark, incr))
        finals.append(_final(t.read()))
    assert finals[0] == finals[1]


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 3),                      # group
            st.integers(-10**7, 10**7),             # cents
            st.integers(0, 10000),                  # rate in bps -> 2dp
        ),
        min_size=1,
        max_size=60,
    )
)
def test_cents_aggregation_equals_decimal(spark, rows):
    """The integer-cents money aggregation (_cents/_exact_money) must be
    BIT-IDENTICAL to the decimal-cast aggregation it replaced, for any
    exact-2dp inputs — including the product shape sum(a * (1 - b))."""
    from hudi_and_delta_showcase_spark.queries.relational import (
        _cents,
        _dec,
        _exact_money,
    )

    data = [(g, c / 100.0, r / 100.0) for g, c, r in rows]
    df = spark.createDataFrame(data, "g int, amount double, rate double")
    via_cents = (
        df.groupBy("g")
        .agg(
            _exact_money(_cents("amount"), 2).alias("s"),
            _exact_money(
                _cents("amount") * (F.lit(100) - _cents("rate")), 4
            ).alias("rev"),
        )
        .orderBy("g")
        .collect()
    )
    via_decimal = (
        df.groupBy("g")
        .agg(
            F.sum(_dec("amount", 30)).cast("double").alias("s"),
            F.sum(_dec("amount", 30) * (F.lit(1) - _dec("rate", 30)))
            .cast("double")
            .alias("rev"),
        )
        .orderBy("g")
        .collect()
    )
    assert [tuple(r) for r in via_cents] == [tuple(r) for r in via_decimal]


def test_exact_money_sum_survives_int64_overflow(spark):
    """A single-bigint accumulator would wrap: 250k rows x 9.2e13
    per-row magnitude sums to 2.3e19 > int64 max. The hi/lo split sum
    must instead return the exact decimal total (the overflow class the
    round-5 advisor flagged for scale_pow=4/6 product terms at
    TPC-H sf>=100 group sizes, compressed into a unit test by using
    larger per-row magnitudes instead of 1e8 rows)."""
    from hudi_and_delta_showcase_spark.queries.relational import _exact_money

    n, per_row = 250_000, 92_000_000_000_000  # cents*1e4-scale product
    df = spark.range(n).select(F.lit(per_row).cast("bigint").alias("x"))
    got = df.agg(_exact_money(F.col("x"), 4).alias("s")).collect()[0]["s"]
    assert got == float(n * per_row) / 10**4

    neg = df.select((-F.col("x")).alias("x"))
    got_neg = neg.agg(_exact_money(F.col("x"), 4).alias("s")).collect()[0]["s"]
    assert got_neg == -float(n * per_row) / 10**4


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.data())
def test_chunker_covers_and_reconstructs(spark, data):
    """For ANY (n_tokens, window, stride <= window): every token index
    is covered, chunk starts advance by exactly stride, only the final
    chunk may be short, and the chunk count matches the closed-form
    shared with the SQL oracle."""
    from hudi_and_delta_showcase_spark.operators.text import (
        chunk_overlapping,
    )

    n = data.draw(st.integers(1, 120))
    window = data.draw(st.integers(1, 40))
    stride = data.draw(st.integers(1, window))
    df = spark.createDataFrame(
        [(0, " ".join(f"t{i}" for i in range(n)))], "doc_id long, text string"
    )
    rows = sorted(
        (r.chunk_idx, r.chunk.split(" "), r.n_tokens)
        for r in chunk_overlapping(
            df, "doc_id", "text", window=window, stride=stride
        ).collect()
    )
    expect_chunks = 1 if n <= window else -(-(n - window) // stride) + 1
    assert len(rows) == expect_chunks
    covered = set()
    for i, toks, nt in rows:
        assert len(toks) == nt
        start = i * stride
        assert toks == [f"t{j}" for j in range(start, start + nt)]
        if i < len(rows) - 1:
            assert nt == window  # only the final chunk may be short
        covered.update(range(start, start + nt))
    assert covered == set(range(n))


@settings(
    max_examples=5, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(base=BATCH, incr=BATCH)
def test_triformat_exports_serve_native_state(spark, base, incr):
    """Interop capstone (r7): for ANY create+upsert history, the three
    exported protocol views — Delta ``_delta_log``, Hudi ``.hoodie``,
    Iceberg ``metadata/`` — must serve the IDENTICAL state the native
    reader serves, current version and all."""
    from hudi_and_delta_showcase_spark.tables.delta_log import (
        export_delta_log,
        read_delta_table,
    )
    from hudi_and_delta_showcase_spark.tables.hoodie_timeline import (
        export_hoodie_timeline,
        read_hoodie_table,
    )
    from hudi_and_delta_showcase_spark.tables.iceberg_meta import (
        export_iceberg_metadata,
        read_iceberg_table,
    )

    path = tempfile.mkdtemp(prefix="triformat_") + "/t"
    t = LakehouseTable.create(
        spark, path, _df(spark, base), key_cols=["k"], precombine="v"
    )
    t.upsert(_df(spark, incr))
    export_delta_log(t)
    export_hoodie_timeline(t)
    export_iceberg_metadata(t)
    native = _final(t.read())
    assert _final(read_delta_table(spark, path)) == native
    assert _final(read_hoodie_table(spark, path)) == native
    assert _final(read_iceberg_table(spark, path)) == native


@settings(
    max_examples=5, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(base=BATCH, dels=st.sets(st.integers(0, 5), min_size=1, max_size=4))
def test_dv_exports_serve_native_state(spark, base, dels):
    """DV interop capstone (r7): with LIVE deletion vectors, the Delta
    export (real DV bins) and the Iceberg export (position deletes)
    both serve the native post-delete state for any delete set; the
    foreign-Delta ADOPTION of our own export round-trips it again."""
    import os
    import shutil

    from hudi_and_delta_showcase_spark.tables.delta_log import (
        export_delta_log,
        read_delta_table,
    )
    from hudi_and_delta_showcase_spark.tables.iceberg_meta import (
        export_iceberg_metadata,
        read_iceberg_table,
    )

    path = tempfile.mkdtemp(prefix="dvformat_") + "/t"
    t = LakehouseTable.create(
        spark, path, _df(spark, base), key_cols=["k"], precombine="v",
        deletion_vectors=True,
    )
    t.delete(spark.createDataFrame([(k,) for k in sorted(dels)], "k int"))
    export_delta_log(t)
    export_iceberg_metadata(t)
    native = _final(t.read())
    assert _final(read_delta_table(spark, path)) == native
    assert _final(read_iceberg_table(spark, path)) == native
    foreign = path + "_foreign"
    shutil.copytree(path, foreign)
    os.remove(os.path.join(foreign, "_meta.json"))
    shutil.rmtree(os.path.join(foreign, "_commits"))
    a = LakehouseTable.convert_delta(spark, foreign, key_cols=["k"])
    assert _final(a.read()) == native
