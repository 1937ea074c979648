"""Property tests for the r11 pruning soundness invariant: a file is
pruned ONLY when it provably holds no matching row. For every transform
family that means: if a value satisfies the predicate, then the
partition value its file would carry must PASS the projected
comparison — a violation is a silent wrong-results bug, the worst
class. Hypothesis sweeps the literal/value space the unit tests can't
enumerate (boundaries, negatives, pre-epoch, unicode prefixes)."""

from __future__ import annotations

from datetime import datetime

from hypothesis import given, settings
from hypothesis import strategies as st

from hudi_and_delta_showcase_spark.tables.iceberg_meta import (
    _interval_can_match,
)
from hudi_and_delta_showcase_spark.tables.iceberg_transforms import (
    bucket_value,
    project_monotonic,
    project_predicate,
    temporal_value,
    truncate_value,
)

_OPS = st.sampled_from(["=", "<", "<=", ">", ">="])
_TS = st.datetimes(
    min_value=datetime(1960, 1, 1), max_value=datetime(2100, 1, 1)
)


def _matches(v, op, bound) -> bool:
    return {
        "=": v == bound,
        "<": v < bound,
        "<=": v <= bound,
        ">": v > bound,
        ">=": v >= bound,
    }[op]


@settings(max_examples=300, deadline=None)
@given(ts=_TS, op=_OPS, bound=_TS,
       unit=st.sampled_from(["year", "month", "day", "hour"]))
def test_temporal_projection_never_false_prunes(ts, op, bound, unit):
    if not _matches(ts, op, bound):
        return
    proj = project_predicate(unit, op, bound, "timestamp")
    if proj is None:
        return  # conservative scan: always sound
    pv = temporal_value(ts, unit, "timestamp")
    assert _interval_can_match(pv, pv, proj[0], proj[1]), (
        f"{unit}({ts}) = {pv} pruned for {op} {bound} -> {proj}"
    )


@settings(max_examples=300, deadline=None)
@given(v=st.integers(-10**12, 10**12), op=_OPS,
       bound=st.integers(-10**12, 10**12),
       w=st.integers(1, 1000))
def test_truncate_projection_never_false_prunes(v, op, bound, w):
    if not _matches(v, op, bound):
        return
    proj = project_predicate(f"truncate[{w}]", op, bound, "long")
    if proj is None:
        return
    pv = truncate_value(v, w)
    assert _interval_can_match(pv, pv, proj[0], proj[1])


@settings(max_examples=300, deadline=None)
@given(v=st.one_of(st.integers(-2**62, 2**62), st.text(max_size=20)),
       n=st.integers(1, 64))
def test_bucket_projection_never_false_prunes(v, n):
    stype = "long" if isinstance(v, int) else "string"
    proj = project_predicate(f"bucket[{n}]", "=", v, stype)
    pv = bucket_value(v, n, stype)
    if proj is None or pv is None:
        return
    assert 0 <= pv < n
    assert _interval_can_match(pv, pv, proj[0], proj[1])


@settings(max_examples=300, deadline=None)
@given(ts=_TS, op=_OPS, bound=_TS,
       fmt=st.sampled_from(["%Y", "%Y-%m", "%Y-%m-%d", "%Y/%m/%d",
                            "%Y-%m-%d-%H"]))
def test_strftime_projection_never_false_prunes(ts, op, bound, fmt):
    """The shared monotonic projector (Delta generated columns + Hudi
    timestamp-keygen paths): formatted values compare as strings, so
    soundness also pins that every supported format is lexicographically
    monotonic."""
    if not _matches(ts, op, bound):
        return
    proj = project_monotonic(op, bound, lambda dt: dt.strftime(fmt))
    if proj is None:
        return
    pv = ts.strftime(fmt)
    assert _interval_can_match(pv, pv, proj[0], proj[1]), (
        f"strftime({ts}, {fmt}) = {pv} pruned for {op} {bound} -> {proj}"
    )


@settings(max_examples=200, deadline=None)
@given(ts=_TS, bound=_TS, unit=st.sampled_from(["day", "hour"]))
def test_strict_lt_tightening_still_sound(ts, bound, unit):
    """The boundary tightening (project bound-1µs for strict <) must
    never drop a genuinely matching row — including rows INSIDE the
    boundary unit but strictly below the bound."""
    if not ts < bound:
        return
    proj = project_predicate(unit, "<", bound, "timestamp")
    assert proj is not None
    pv = temporal_value(ts, unit, "timestamp")
    assert _interval_can_match(pv, pv, proj[0], proj[1])
    # and the tightening is TIGHT: at an exact boundary, the boundary
    # unit itself is pruned
    floor = bound.replace(minute=0, second=0, microsecond=0)
    if unit == "day":
        floor = floor.replace(hour=0)
    if bound == floor:
        boundary_pv = temporal_value(bound, unit, "timestamp")
        assert not _interval_can_match(
            boundary_pv, boundary_pv, proj[0], proj[1]
        )


# ---------------------------------------------------------------------------
# HFile round-trip property: arbitrary sorted cells, both codecs
# ---------------------------------------------------------------------------


@settings(max_examples=40, deadline=None)
@given(
    cells=st.lists(
        st.tuples(
            st.binary(min_size=1, max_size=24),
            st.binary(max_size=200),
        ),
        min_size=1,
        max_size=200,
        unique_by=lambda kv: kv[0],
    ),
    comp=st.sampled_from(["none", "gz"]),
    block_size=st.sampled_from([256, 4096]),
)
def test_hfile_round_trip_property(cells, comp, block_size):
    from hudi_and_delta_showcase_spark.tables import hfile

    cells = sorted(cells)
    blob = hfile.write_hfile(
        cells, {b"schema": b"{}"}, compression=comp, block_size=block_size
    )
    parsed = hfile.read_hfile(blob)
    assert parsed["cells"] == cells
    assert parsed["entry_count"] == len(cells)
