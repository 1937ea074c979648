"""Iceberg partition TRANSFORMS (spec "Partition Transforms" +
Appendix B "32-bit Hash Requirements") — the pure functions that turn a
column value into a partition value: ``bucket[N]`` (Murmur3-x86-32 of
the spec's byte form, mod N), ``truncate[W]`` (floor-to-multiple for
ints, prefix for strings), and the temporal family
``year/month/day/hour`` (units since the 1970 epoch).

Two consumers:

* **Pruning** (`iceberg_meta._entry_can_match`): a foreign tree
  partitioned the common way — ``days(ts)`` event tables,
  ``bucket(16, user_id)`` — stores the TRANSFORMED value per file.
  ``project_predicate`` maps a predicate conjunct into partition-value
  space (Iceberg's *inclusive projection*): equality predicates project
  through any transform; range predicates project through monotonic
  transforms (truncate/temporal) with the op widened to inclusive, and
  refuse (``None`` = scan conservatively) through bucket, which is not
  order-preserving. Never wrong, only ever conservative.
* **Writing** (`iceberg_meta.write_iceberg_dataset`): Spark Column
  expressions (`transform_column`) compute the partition value
  per row JVM-side for truncate/temporal; bucket uses a
  numpy-vectorized Arrow-batched pandas UDF of the same hash.

Everything here derives from the published Apache Iceberg spec; the
reference showcase delegates this to the Hudi/Delta jars it installs
(reference: packages-install.sh:1, README.md:1235-1240).
"""

from __future__ import annotations

import re
import struct
from datetime import date, datetime, timedelta, timezone

# module-level so the pandas-UDF type hints (stringified by the
# __future__ annotations import) resolve against this module's globals
import numpy as np
import pandas as pd

_EPOCH_D = date(1970, 1, 1)
_EPOCH_DT = datetime(1970, 1, 1)

_TRANSFORM_RE = re.compile(
    r"^(identity|year|month|day|hour)$"
    r"|^bucket\[(\d+)\]$"
    r"|^truncate\[(\d+)\]$"
)


def parse_transform(s: str) -> tuple[str, int | None] | None:
    """``"bucket[16]"`` -> ``("bucket", 16)``; ``"day"`` ->
    ``("day", None)``; unknown (``void``, future transforms) ->
    ``None`` — callers treat unknown as not-prunable, never an error,
    because a foreign tree may legally carry transforms newer than
    this reader."""
    m = _TRANSFORM_RE.match(s or "")
    if not m:
        return None
    if m.group(2) is not None:
        n = int(m.group(2))
        return ("bucket", n) if n > 0 else None
    if m.group(3) is not None:
        w = int(m.group(3))
        return ("truncate", w) if w > 0 else None
    return (m.group(1), None)


# --------------------------------------------------------------------------
# Murmur3 x86 32-bit, seed 0 — the spec's required hash (Appendix B)
# --------------------------------------------------------------------------


def murmur3_32(data: bytes, seed: int = 0) -> int:
    """Unsigned 32-bit Murmur3 (x86 variant). Iceberg's bucket value is
    ``(hash & Integer.MAX_VALUE) % N`` — on the unsigned form that is
    ``(h & 0x7FFFFFFF) % N``, identical to Java's signed ``&``."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed & 0xFFFFFFFF
    n = len(data)
    full = n - n % 4
    for i in range(0, full, 4):
        k = int.from_bytes(data[i:i + 4], "little")
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
        h = ((h << 13) | (h >> 19)) & 0xFFFFFFFF
        h = (h * 5 + 0xE6546B64) & 0xFFFFFFFF
    k = 0
    tail = data[full:]
    if len(tail) >= 3:
        k ^= tail[2] << 16
    if len(tail) >= 2:
        k ^= tail[1] << 8
    if len(tail) >= 1:
        k ^= tail[0]
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
    h ^= n
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & 0xFFFFFFFF
    h ^= h >> 16
    return h


def _as_datetime(val, source_type: str | None) -> datetime | None:
    """A predicate literal -> naive UTC datetime, or None when the
    value cannot be read as a point in time. Ints need the SOURCE type
    to disambiguate (timestamp micros vs date days)."""
    if isinstance(val, datetime):
        if val.tzinfo is not None:
            val = val.astimezone(timezone.utc).replace(tzinfo=None)
        return val
    if isinstance(val, date):
        return datetime(val.year, val.month, val.day)
    if isinstance(val, str):
        try:
            dt = datetime.fromisoformat(val)
        except ValueError:
            return None
        if dt.tzinfo is not None:
            dt = dt.astimezone(timezone.utc).replace(tzinfo=None)
        return dt
    if isinstance(val, bool):
        return None
    if isinstance(val, int):
        st = source_type or ""
        if st.startswith("timestamp"):
            return _EPOCH_DT + timedelta(microseconds=val)
        if st == "date":
            return _EPOCH_DT + timedelta(days=val)
    return None


def temporal_value(val, unit: str, source_type: str | None) -> int | None:
    """year/month/day/hour transform of a literal: integer units since
    the epoch (floor semantics, correct for pre-1970 values — the
    spec's Java implementations floor the same way)."""
    dt = _as_datetime(val, source_type)
    if dt is None:
        return None
    if unit == "year":
        return dt.year - 1970
    if unit == "month":
        return (dt.year - 1970) * 12 + dt.month - 1
    if unit == "day":
        return (dt - _EPOCH_DT) // timedelta(days=1)
    if unit == "hour":
        return (dt - _EPOCH_DT) // timedelta(hours=1)
    return None


def _bucket_bytes(val, source_type: str | None) -> bytes | None:
    """The spec's hash-input byte form: int/long/date/timestamp hash as
    the little-endian 8-byte long of their integer representation,
    strings as UTF-8, binary as-is. Floats/decimals are deliberately
    unsupported (float bucketing is a spec footgun); unsupported ->
    None -> conservative scan."""
    st = source_type or ""
    if isinstance(val, bool):
        return None
    if isinstance(val, int):
        return struct.pack("<q", val)
    if isinstance(val, (bytes, bytearray)):
        return bytes(val)
    if st.startswith("timestamp") or st == "date":
        dt = _as_datetime(val, st)
        if dt is None:
            return None
        if st == "date":
            return struct.pack(
                "<q", (dt - _EPOCH_DT) // timedelta(days=1)
            )
        return struct.pack(
            "<q", (dt - _EPOCH_DT) // timedelta(microseconds=1)
        )
    if isinstance(val, str):
        return val.encode("utf-8")
    return None


def bucket_value(val, n: int, source_type: str | None) -> int | None:
    try:
        b = _bucket_bytes(val, source_type)
    except struct.error:
        # a literal outside int64 range hashes nothing provable —
        # scan conservatively, never crash
        return None
    if b is None:
        return None
    return (murmur3_32(b) & 0x7FFFFFFF) % n


def project_monotonic(op: str, val, to_value):
    """The SHARED monotonic-projection discipline of every engine
    pruner (Iceberg temporal transforms, Delta generated columns, Hudi
    timestamp-keygen paths — r11 review consolidation): map ``col <op>
    literal`` into transform space via ``to_value(datetime) ->
    projected value``, widening range ops to inclusive and tightening
    a strict ``<`` one microsecond below an exact boundary so the
    boundary partition prunes. Returns ``(op', value)`` or None
    (unreadable literal -> conservative scan)."""
    if op == "in":
        outs = [project_monotonic("=", v, to_value) for v in val]
        if any(o is None for o in outs):
            return None
        return ("in", [o[1] for o in outs])
    dt = _as_datetime(val, "timestamp")
    if dt is None:
        return None
    if op == "<":
        dt = dt - timedelta(microseconds=1)
        op = "<="
    elif op == ">":
        op = ">="
    try:
        return (op, to_value(dt))
    except (ValueError, OverflowError):
        return None


def truncate_value(val, w: int):
    """truncate[W]: ints floor to a multiple of W (Python's floor-mod
    matches the spec: ``truncate(10, -1) = -10``); strings/binary keep
    the first W units. Unsupported types -> None."""
    if isinstance(val, bool):
        return None
    if isinstance(val, int):
        return val - (val % w)
    if isinstance(val, str):
        return val[:w]
    if isinstance(val, (bytes, bytearray)):
        return bytes(val)[:w]
    return None


#: transforms that preserve ordering of the source column — range
#: predicates project through these with the op widened to inclusive
_MONOTONIC = {"identity", "truncate", "year", "month", "day", "hour"}


def project_predicate(
    transform: str, op: str, val, source_type: str | None
) -> tuple[str, object] | None:
    """Inclusive projection of one conjunct ``col <op> val`` into the
    partition-value space of ``transform(col)``: returns
    ``(projected_op, projected_value)`` such that a file whose
    partition value fails the projected comparison provably holds no
    matching row — or ``None`` when nothing can be proven (unknown
    transform, unhashable literal, range through bucket). ``<`` and
    ``>`` widen to ``<=``/``>=`` because distinct column values can
    share a partition value (Iceberg's Projections.inclusive)."""
    parsed = parse_transform(transform)
    if parsed is None:
        return None
    kind, param = parsed

    def tx(v):
        if kind == "identity":
            return v
        if kind == "bucket":
            return bucket_value(v, param, source_type)
        if kind == "truncate":
            return truncate_value(v, param)
        return temporal_value(v, kind, source_type)

    if op == "=":
        tv = tx(val)
        return None if tv is None else ("=", tv)
    if op == "in":
        tvs = [tx(v) for v in val]
        if any(tv is None for tv in tvs):
            return None
        return ("in", tvs)
    if kind not in _MONOTONIC:
        return None  # range through bucket proves nothing
    if kind == "identity":
        return (op, val)  # exact: the partition value IS the column
    if op in ("<", "<="):
        probe = val
        if op == "<":
            # tighten the boundary case: ``ts < midnight(d)`` excludes
            # ALL of day d — transform the largest value strictly below
            # the literal (one source-granularity unit down) so the
            # boundary partition prunes instead of surviving inclusively
            if kind in ("year", "month", "day", "hour"):
                dt = _as_datetime(val, source_type)
                if dt is not None:
                    probe = dt - timedelta(microseconds=1)
            elif isinstance(val, int) and not isinstance(val, bool):
                probe = val - 1  # truncate over ints
        tv = tx(probe)
        return None if tv is None else ("<=", tv)
    if op in (">", ">="):
        tv = tx(val)
        return None if tv is None else (">=", tv)
    return None


def normalize_partition_value(pv, transform: str):
    """A decoded manifest partition value -> the comparable form the
    projections above produce. Manifests store temporal values as
    ints, but an Avro decoder honoring the ``date`` logical type (the
    v2 type of a ``day`` field) may surface ``datetime.date``."""
    if isinstance(pv, datetime):
        return (pv.replace(tzinfo=None) - _EPOCH_DT) // timedelta(
            microseconds=1
        )
    if isinstance(pv, date):
        return (pv - _EPOCH_D).days
    return pv


# --------------------------------------------------------------------------
# Spark-side transform columns (the write path)
# --------------------------------------------------------------------------


def transform_column(col_name: str, transform: str):
    """A Spark Column computing ``transform(col)`` per row, JVM-side
    builtins for everything order-preserving; bucket is the one
    transform needing the spec hash, served by a numpy-vectorized
    Arrow-batched pandas UDF (whole 8-byte-long batches hashed with
    uint32 array ops — no per-row Python in the common integer case)."""
    from pyspark.sql import functions as F

    parsed = parse_transform(transform)
    if parsed is None:
        raise ValueError(f"unknown partition transform {transform!r}")
    kind, param = parsed
    c = F.col(col_name)
    if kind == "identity":
        return c
    if kind == "year":
        return (F.year(c) - F.lit(1970)).cast("int")
    if kind == "month":
        return (
            (F.year(c) - F.lit(1970)) * F.lit(12) + F.month(c) - F.lit(1)
        ).cast("int")
    if kind == "day":
        return F.datediff(F.to_date(c), F.lit("1970-01-01")).cast("int")
    if kind == "hour":
        # pure WALL-TIME arithmetic (day*24 + hour-of-day): an epoch
        # cast would run through the session zone and shift under a
        # non-UTC driver session; the engine's timestamps are NTZ
        return (
            F.datediff(F.to_date(c), F.lit("1970-01-01")) * F.lit(24)
            + F.hour(c)
        ).cast("int")
    if kind == "truncate":
        return _truncate_col(c, param)
    return _bucket_col(c, param)


def _truncate_col(c, w: int):
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        ByteType, IntegerType, LongType, ShortType, StringType,
    )

    def build(dtype):
        if isinstance(dtype, (ByteType, ShortType, IntegerType, LongType)):
            return c - F.pmod(c, F.lit(w))
        if isinstance(dtype, StringType):
            return F.substring(c, 1, w)
        raise ValueError(f"truncate[{w}] unsupported for {dtype}")

    return _TypedCol(build)


def _bucket_col(c, n: int):
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampType

    def build(dtype):
        if isinstance(dtype, TimestampType):
            # the spec buckets timestamptz as micros since the UTC
            # epoch, but Arrow hands a pandas UDF the SESSION-zone
            # wall time for LTZ columns — hash the JVM-side epoch
            # micros instead so write-side buckets agree with
            # spec-conforming foreign readers under any session zone
            # (r12 advice fix)
            return _bucket_udf(n, LongType())(F.unix_micros(c))
        return _bucket_udf(n, dtype)(c)

    return _TypedCol(build)


class _TypedCol:
    """A deferred column whose expression depends on the source column's
    Spark type — resolved by the writer once it sees the DataFrame
    schema (``resolve(dtype)``)."""

    def __init__(self, build):
        self._build = build

    def resolve(self, dtype):
        return self._build(dtype)


def _bucket_udf(n: int, dtype):
    """Arrow-batched pandas UDF computing the spec bucket value. Integer
    and timestamp/date sources vectorize fully in numpy (Murmur3 of an
    8-byte little-endian long is two fixed 4-byte rounds over uint32
    arrays); strings fall back to the scalar hash per distinct-ish
    value, still Arrow-batched."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        ByteType, DateType, IntegerType, LongType, ShortType,
        StringType, TimestampNTZType, TimestampType,
    )

    def _mm3_longs(vals: np.ndarray) -> np.ndarray:
        v = vals.astype(np.int64).view(np.uint64)
        c1 = np.uint32(0xCC9E2D51)
        c2 = np.uint32(0x1B873593)
        h = np.zeros(len(v), np.uint32)
        for blk in ((v & 0xFFFFFFFF), (v >> np.uint64(32))):
            k = blk.astype(np.uint32)
            k = k * c1
            k = (k << np.uint32(15)) | (k >> np.uint32(17))
            k = k * c2
            h ^= k
            h = (h << np.uint32(13)) | (h >> np.uint32(19))
            h = h * np.uint32(5) + np.uint32(0xE6546B64)
        h ^= np.uint32(8)
        h ^= h >> np.uint32(16)
        h = h * np.uint32(0x85EBCA6B)
        h ^= h >> np.uint32(13)
        h = h * np.uint32(0xC2B2AE35)
        h ^= h >> np.uint32(16)
        return h

    if isinstance(dtype, (ByteType, ShortType, IntegerType, LongType,
                          TimestampType, TimestampNTZType, DateType)):

        def to_longs(s: pd.Series) -> np.ndarray:
            if isinstance(dtype, (TimestampType, TimestampNTZType)):
                # Arrow hands back naive wall-time datetimes (the
                # engine's NTZ convention): micros since epoch directly
                return (s.astype("datetime64[us]").astype("int64")
                        .to_numpy())
            if isinstance(dtype, DateType):
                return (
                    (pd.to_datetime(s) - pd.Timestamp("1970-01-01"))
                    .dt.days.astype("int64").to_numpy()
                )
            return s.astype("int64").to_numpy()

        @F.pandas_udf("int")
        def bucket(s: pd.Series) -> pd.Series:
            out = pd.Series([None] * len(s), dtype="object")
            mask = s.notna()
            if mask.any():
                h = _mm3_longs(to_longs(s[mask]))
                out[mask.to_numpy()] = (
                    (h & np.uint32(0x7FFFFFFF)) % np.uint32(n)
                ).astype("int64")
            return pd.Series(out, dtype="Int32")

        return bucket

    if isinstance(dtype, StringType):

        @F.pandas_udf("int")
        def bucket_str(s: pd.Series) -> pd.Series:
            def one(v):
                if v is None:
                    return None
                return (murmur3_32(v.encode("utf-8")) & 0x7FFFFFFF) % n

            return s.map(one).astype("Int32")

        return bucket_str

    raise ValueError(f"bucket[{n}] unsupported for source type {dtype}")
