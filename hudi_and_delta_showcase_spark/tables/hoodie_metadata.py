"""Foreign Hudi METADATA TABLE — the ``files`` partition (r10).

Hudi 0.14+ tables ship an internal MoR table at ``.hoodie/metadata``
whose ``files`` partition replaces directory listings: one
``HoodieMetadataRecord`` per data partition (record key = the partition
path, ``.`` for unpartitioned) maps file name -> ``{size, isDeleted}``,
plus a ``__all_partitions__`` record enumerating partitions. Hudi
writers fold every commit's adds/removes into it through deltacommit
log blocks, so reading it is O(partitions + live files) metadata IO —
the point at 100 TB, where a recursive directory walk over millions of
files is the slow path this partition exists to delete.

This reader decodes the LOG-file slices of the ``files`` partition
(plain HoodieLogFormat Avro data blocks — ``hoodie_log.parse_log_blob``
decodes them generically off the SCHEMA header) and merges records with
Hudi's payload rule (later block wins per file; ``isDeleted`` removes).
Block validity filters on the metadata table's OWN timeline, exactly
like any MoR read. HFile-COMPACTED base files — the metadata table's
DEFAULT compaction format, so mature 0.14+ tables are exactly the ones
that have them — decode natively from r11 (``tables/hfile.py``, a
spec-faithful HBase HFile v3 reader): the latest committed base file
serves as the slice's fold, its own logs apply on top. Parquet/ORC
bases or an HFile the reader cannot prove it decoded still return
``None`` so callers FALL BACK to timeline replay / listing.

Used by ``hoodie_timeline.latest_file_slices_rt``: when the active
timeline is ARCHIVED (write stats gone), the below-horizon slice
discovery prefers this listing over the recursive directory walk —
pinned in ``tests/test_hoodie_metadata.py``.

Reference anchor: the ``.hoodie`` internals the showcase's MoR
demonstration relies on (reference README.md:556-1154); layout per the
public Hudi metadata table spec (RFC-15, hudi-common
HoodieTableMetadata / HoodieMetadataPayload).
"""

from __future__ import annotations

import re
from datetime import datetime, timedelta
from functools import lru_cache

from hudi_and_delta_showcase_spark.tables import fsio

#: naive UTC epoch — integer predicate literals with a declared epoch
#: unit convert through this for path projection
_EPOCH_DT = datetime(1970, 1, 1)

#: record key of the partition-list record in the files partition
ALL_PARTITIONS_KEY = "__all_partitions__"
#: Hudi's placeholder partition path for unpartitioned tables
NON_PARTITIONED = "."


def _metadata_root(table_path: str) -> str:
    return fsio.join(table_path, ".hoodie", "metadata")


def _completed_metadata_instants(md_root: str) -> frozenset[str] | None:
    """Completed instants of the metadata table's own timeline (its
    ``.hoodie``); None when the timeline directory is missing (not a
    metadata table)."""
    md_hoodie = fsio.join(md_root, ".hoodie")
    if not fsio.isdir(md_hoodie):
        return None
    out = set()
    for d in (md_hoodie, fsio.join(md_hoodie, "timeline")):
        if not fsio.isdir(d):
            continue
        for fn in fsio.listdir(d):
            parts = fn.split(".")
            # completed instants only: <instant>.deltacommit / .commit
            # (requested/inflight have a third suffix)
            if len(parts) == 2 and parts[1] in ("deltacommit", "commit"):
                out.add(parts[0].split("_")[0])
    return frozenset(out)


_BASE_FILE_RE = None  # compiled lazily below


def _parse_base_file_name(fn: str) -> str | None:
    """``<fileId>_<writeToken>_<instant>.hfile`` -> instant, else None."""
    import re

    global _BASE_FILE_RE
    if _BASE_FILE_RE is None:
        _BASE_FILE_RE = re.compile(r"_\d+-\d+-\d+_(\d{14,17})\.hfile$")
    m = _BASE_FILE_RE.search(fn)
    return m.group(1) if m else None


def _hfile_base_records(full_path: str) -> list[dict] | None:
    """Decode an HFile-compacted metadata base file (r11, verdict #6):
    cells are Avro-binary metadata records, the schema rides the
    HFile's own file-info ``schema`` key (Hudi's HoodieHFileWriter
    stamps it). None on anything unprovable — v2 files, unsupported
    codecs, a missing schema — so callers keep the timeline-replay
    fallback."""
    import json

    from hudi_and_delta_showcase_spark import avro_ocf
    from hudi_and_delta_showcase_spark.tables import hfile

    try:
        parsed = hfile.read_hfile(fsio.read_bytes(full_path))
        schema_raw = parsed["file_info"].get(b"schema")
        if not schema_raw:
            return None
        schema = json.loads(schema_raw.decode("utf-8"))
        out = []
        for _row, value in parsed["cells"]:
            r = avro_ocf._Reader(value)
            out.append(avro_ocf._decode(schema, r))
        return out
    except (ValueError, EOFError, KeyError, UnicodeDecodeError):
        return None


def _partition_log_entries(
    table_path: str, partition: str
) -> list[tuple[str, list[dict], list[dict]]] | None:
    """Surviving ``(instant, records, deletes)`` triples of one
    metadata-table partition's file slice, in apply order — the latest
    HFile-COMPACTED base file first when one exists (r11: decoded by
    ``tables/hfile.py``, closing the r10 gap where mature 0.14+ tables
    lost the O(partitions) listing path), then its slice's log files.
    None when the caller must fall back: no metadata table, a
    parquet/orc-compacted partition, an HFile this reader cannot prove
    it decoded, or anything else unprovable. Never guesses."""
    from hudi_and_delta_showcase_spark.tables import hoodie_log as hl

    part_dir = fsio.join(_metadata_root(table_path), partition)
    if not fsio.isdir(part_dir):
        return None
    valid = _completed_metadata_instants(_metadata_root(table_path))
    if not valid:
        return None
    logs: list[tuple[str, int, str]] = []  # (base_instant, version, path)
    bases: list[tuple[str, str]] = []  # (instant, path)
    for fn in sorted(fsio.listdir(part_dir)):
        info = hl.parse_log_file_name(fn)
        if info is not None:
            logs.append(
                (info["base_instant"], info["version"],
                 fsio.join(part_dir, fn))
            )
            continue
        if fn.endswith(".hfile"):
            instant = _parse_base_file_name(fn)
            if instant is None:
                return None  # unattributable base file: fall back
            if instant.split("_")[0] not in valid:
                # an in-progress/crashed compaction's base: ignore it
                # and keep serving the previous slice (Hudi's rule for
                # uncommitted base files)
                continue
            bases.append((instant, fsio.join(part_dir, fn)))
            continue
        if fn.endswith((".parquet", ".orc")):
            return None
        # .hoodie_partition_metadata and other markers are inert
    out: list[tuple[str, list[dict], list[dict]]] = []
    if bases:
        # the latest committed base file is the slice's fold of
        # everything before it; earlier logs are already inside it
        base_instant, base_path = max(bases)
        records = _hfile_base_records(base_path)
        if records is None:
            return None
        out.append((base_instant, records, []))
        logs = [lg for lg in logs if lg[0] == base_instant]
    if not out and not logs:
        return None
    for _bi, _v, full in sorted(logs):
        blob = fsio.read_bytes(full)
        out.extend(
            hl.resolve_log_blocks([blob], valid_instants=valid)
        )
    return out


def read_hoodie_metadata_files(
    table_path: str,
) -> dict[str, dict[str, int]] | None:
    """``.hoodie/metadata/files`` -> ``{partition: {file name: size}}``
    ('' keys unpartitioned), or None when the caller must fall back to
    timeline replay / listing: no metadata table, an HFile-compacted
    files partition, or anything else this reader cannot prove it
    decoded correctly. Never guesses."""
    entries = _partition_log_entries(table_path, "files")
    if entries is None:
        return None
    state: dict[str, dict[str, int]] = {}
    for _instant, records, dels in entries:
        for d in dels:
            # a tombstoned metadata record drops its whole
            # partition entry (cleaner semantics)
            key = d.get("recordKey")
            state.pop("" if key == NON_PARTITIONED else key, None)
        for rec in records:
            key = rec.get("key")
            fsmeta = rec.get("filesystemMetadata")
            if key is None or key == ALL_PARTITIONS_KEY or not fsmeta:
                continue
            part = "" if key == NON_PARTITIONED else key
            bucket = state.setdefault(part, {})
            # HoodieMetadataPayload merge: later wins per file,
            # isDeleted removes
            for name, inf in fsmeta.items():
                if inf.get("isDeleted"):
                    bucket.pop(name, None)
                else:
                    bucket[name] = int(inf.get("size") or 0)
    return state


def _unwrap(v):
    """Hudi wraps col-stats min/max in one-field WRAPPER records
    (BooleanWrapper/IntWrapper/.../StringWrapper, each ``{value: x}``)
    so the union carries a type tag; generic union decode surfaces them
    as single-key dicts. Unwrap; anything else passes through."""
    if isinstance(v, dict) and set(v) == {"value"}:
        return v["value"]
    return v


def read_hoodie_metadata_col_stats(
    table_path: str,
    columns: frozenset[str] | set[str] | None = None,
) -> dict[str, dict[str, dict]] | None:
    """``.hoodie/metadata/column_stats`` ->
    ``{file name: {column: {min, max, null_count, value_count}}}``, or
    None when the caller must scan unpruned (no col-stats partition, an
    HFile-compacted one, ...). Hudi's HoodieMetadataColumnStats records
    key stats by (fileName, columnName) inside the VALUE — the hashed
    record key is a point-lookup artifact this full-partition read
    never needs. Merge is later-wins per (file, column); ``isDeleted``
    removes. File names are unique table-wide under Hudi's uuid
    file-group naming, so the map keys on base name alone. ``columns``
    restricts RETENTION to the named columns (pruning only needs the
    predicate's columns — at millions of files × tens of columns the
    full map is pointless driver memory; the decode cost is per-record
    either way)."""
    entries = _partition_log_entries(table_path, "column_stats")
    if entries is None:
        return None
    state: dict[str, dict[str, dict]] = {}
    for _instant, records, _dels in entries:
        # delete records carry only the hashed key — unmappable to a
        # (file, column) pair; real removals arrive as isDeleted stats
        for rec in records:
            cs = rec.get("ColumnStatsMetadata")
            if not cs:
                continue
            fname, col = cs.get("fileName"), cs.get("columnName")
            if not fname or not col:
                continue
            if columns is not None and col not in columns:
                continue
            if cs.get("isDeleted"):
                cols = state.get(fname)
                if cols is not None:
                    cols.pop(col, None)
                    if not cols:
                        del state[fname]
                continue
            state.setdefault(fname, {})[col] = {
                "min": _unwrap(cs.get("minValue")),
                "max": _unwrap(cs.get("maxValue")),
                "null_count": cs.get("nullCount"),
                "value_count": cs.get("valueCount"),
            }
    return state


def stats_entry(
    stats: dict[str, dict[str, dict]], path: str
) -> dict[str, dict] | None:
    """Col-stats lookup for a table-relative file path: full path first
    (this engine's export key — partitioned engine layouts can repeat a
    BASE name across partition directories), then the base name (real
    Hudi metadata tables key base names, unique there under uuid
    file-group naming)."""
    return stats.get(path) or stats.get(path.rpartition("/")[2])


def file_can_match(
    fname: str, stats: dict[str, dict[str, dict]], conjuncts: list[tuple]
) -> bool:
    """Can the file hold a row satisfying every ``(col, op, value)``
    conjunct, judged on its col-stats entry? False = provably disjoint
    = prune. Files (or columns) without stats scan conservatively; an
    all-null column (null_count == value_count) matches no comparison."""
    from hudi_and_delta_showcase_spark.tables.iceberg_meta import (
        _interval_can_match,
    )

    fstats = stats_entry(stats, fname)
    if not fstats:
        return True
    for col, op, val in conjuncts:
        st = fstats.get(col)
        if st is None:
            continue
        vc, nc = st.get("value_count"), st.get("null_count")
        if vc is not None and nc is not None and vc == nc:
            return False
        lo, hi = st.get("min"), st.get("max")
        if lo is None or hi is None:
            continue
        if not _interval_can_match(lo, hi, op, val):
            return False
    return True


#: key generators whose hive-style partition path VALUE is the
#: column's own string representation (identity — no transform), so a
#: ``col=value`` path segment is trustworthy for pruning. Timestamp /
#: custom generators transform the source column into the path (e.g.
#: ``ts=2024-01-01`` from a full timestamp) — pruning on those would
#: wrongly drop files, so they never prune by path.
_IDENTITY_KEYGENS = frozenset({
    "SimpleKeyGenerator", "SimpleAvroKeyGenerator",
    "ComplexKeyGenerator", "ComplexAvroKeyGenerator",
    "NonpartitionedKeyGenerator", "NonpartitionedAvroKeyGenerator",
})

#: Hive's marker segment value for a null partition value
HIVE_DEFAULT_PARTITION = "__HIVE_DEFAULT_PARTITION__"


def hive_path_pruning_ok(props: dict[str, str]) -> bool:
    """Partition-path pruning is safe only under a declared
    identity key generator (``hoodie.table.keygenerator.class`` — or
    the 0.14+ ``hoodie.table.keygenerator.type`` enum — in
    ``hoodie.properties``). Absent or unknown generators never prune
    by path — col-stats pruning still applies either way."""
    kg = props.get("hoodie.table.keygenerator.class", "")
    if kg.rsplit(".", 1)[-1] in _IDENTITY_KEYGENS:
        return True
    return props.get("hoodie.table.keygenerator.type", "").upper() in (
        "SIMPLE", "COMPLEX", "NON_PARTITION",
    )


def partition_path_values(relpath: str) -> dict[str, str | None]:
    """Hive-style ``col=value`` segments of a file's partition path ->
    {column: string value} (None = the hive null marker). Non-hive
    segments (date-tree layouts like ``2024/01/01``) contribute
    nothing — they carry no column binding to prune on."""
    from urllib.parse import unquote

    out: dict[str, str | None] = {}
    for seg in relpath.split("/")[:-1]:
        k, eq, v = seg.partition("=")
        if eq and k:
            out[unquote(k)] = (
                None if v == HIVE_DEFAULT_PARTITION else unquote(v)
            )
    return out


def _typed_path_value(pv: str, like):
    """Partition path values are strings; compare in the predicate
    value's type when the string parses cleanly, else prove nothing."""
    if isinstance(like, bool):
        return None  # 'true'/'True' casing ambiguity: never prune
    try:
        if isinstance(like, int):
            return int(pv)
        if isinstance(like, float):
            return float(pv)
    except ValueError:
        return None
    return pv if isinstance(like, str) else None


def path_can_match(relpath: str, conjuncts: list[tuple]) -> bool:
    """Can a file under this hive-style partition path hold a matching
    row? Every row of the file carries the segment's exact column
    value (identity key generator — gate with ``hive_path_pruning_ok``
    before trusting this), so a disjoint comparison prunes the file;
    columns not bound by the path scan conservatively."""
    from hudi_and_delta_showcase_spark.tables.iceberg_meta import (
        _interval_can_match,
    )

    values = partition_path_values(relpath)
    if not values:
        return True
    for col, op, val in conjuncts:
        if col not in values:
            continue
        pv = values[col]
        if pv is None:
            return False  # all rows null in this column: no comparison
        like = val[0] if op == "in" and isinstance(val, list) else val
        typed = _typed_path_value(pv, like)
        if typed is None:
            continue
        if not _interval_can_match(typed, typed, op, val):
            return False
    return True


#: TimestampBasedKeyGenerator output formats this reader can prune on:
#: zero-padded, most-significant-unit-first — string order IS time
#: order, so inclusive range projection through strftime is sound.
_TS_OUTPUT_FORMATS = {
    "yyyy": "%Y",
    "yyyyMM": "%Y%m",
    "yyyy-MM": "%Y-%m",
    "yyyy/MM": "%Y/%m",
    "yyyyMMdd": "%Y%m%d",
    "yyyy-MM-dd": "%Y-%m-%d",
    "yyyy/MM/dd": "%Y/%m/%d",
    "yyyy-MM-dd-HH": "%Y-%m-%d-%H",
    "yyyyMMddHH": "%Y%m%d%H",
}


#: hoodie.keygen.timebased.timestamp.type values whose NUMERIC input
#: literals this reader understands: microseconds since the epoch per
#: unit. Other declared types (SCALAR, DATE_STRING, MIXED) — or an
#: undeclared type — make integer predicate literals unprovable: a
#: bare ``ts = 1704844800000`` could be millis on one table and
#: seconds on another, and guessing micros would project a 2024-epoch
#: value to 1970 and prune the MATCHING partition (r12 advice fix).
_TS_INPUT_MICROS = {
    "UNIX_TIMESTAMP": 1_000_000,  # Hudi's name for epoch SECONDS
    "EPOCHMILLISECONDS": 1_000,
    "EPOCHMICROSECONDS": 1,
}


def timestamp_path_pruner(
    props: dict[str, str],
) -> tuple[str, str, str | None] | None:
    """``(source column, strftime format, timestamp.type)`` when the
    table declares a TIMESTAMP-BASED key generator whose output format
    this reader can prune on (r11 — the Hudi leg of the
    transform-pruning triad, next to Iceberg's ``days(ts)`` and
    Delta's generated date columns): the partition PATH is the
    formatted source timestamp (date trees like ``2024/01/10``), so a
    ``ts`` predicate projects through the format and compares
    lexicographically. Requires the keygen class, a single partition
    field, the ``output.dateformat`` in ``hoodie.properties``, and an
    output timezone that is UTC/GMT or unset — a shifted-zone tree
    formats different wall dates than the reader would project, so
    any other declared zone disables path pruning entirely. Absent or
    unsupported (epoch-numeric, sub-day-unordered) formats never
    prune. The returned ``timestamp.type`` gates integer literals
    only; date/datetime/ISO-string literals project under any type."""
    kg = props.get("hoodie.table.keygenerator.class", "")
    kg_type = props.get("hoodie.table.keygenerator.type", "")
    if (
        kg.rsplit(".", 1)[-1]
        not in ("TimestampBasedKeyGenerator",
                "TimestampBasedAvroKeyGenerator")
        and kg_type.upper() != "TIMESTAMP"  # the 0.14+ enum spelling
    ):
        return None
    fmt = (
        props.get("hoodie.keygen.timebased.output.dateformat")
        or props.get("hoodie.deltastreamer.keygen.timebased.output.dateformat")
    )
    fields = props.get("hoodie.table.partition.fields", "")
    if not fmt or not fields or "," in fields:
        return None
    strf = _TS_OUTPUT_FORMATS.get(fmt)
    if strf is None:
        return None
    tz = (
        props.get("hoodie.keygen.timebased.output.timezone")
        or props.get("hoodie.deltastreamer.keygen.timebased.output.timezone")
        or props.get("hoodie.deltastreamer.keygen.timebased.timezone")
        or ""
    ).strip()
    if tz and tz.upper() not in ("UTC", "GMT", "ETC/UTC", "ETC/GMT", "Z"):
        return None
    ts_type = (
        props.get("hoodie.keygen.timebased.timestamp.type")
        or props.get("hoodie.deltastreamer.keygen.timebased.timestamp.type")
        or ""
    ).strip().upper() or None
    return fields.split(":")[0], strf, ts_type


def _project_ts_path(fmt: str, op: str, val, ts_type: str | None):
    """Project ``col <op> val`` onto the formatted-path domain via the
    engine-wide monotonic projection discipline
    (``iceberg_transforms.project_monotonic`` — inclusive widening,
    strict-< tightened one microsecond); None = prove nothing.
    Integer literals are convertible only when ``timestamp.type``
    declares their epoch unit — otherwise the unit is a guess and the
    only sound answer is a full scan (r12 advice fix)."""
    from hudi_and_delta_showcase_spark.tables.iceberg_transforms import (
        project_monotonic,
    )

    def lift(v):
        if isinstance(v, bool):
            return None
        if isinstance(v, int):
            mult = _TS_INPUT_MICROS.get(ts_type or "")
            if mult is None:
                return None
            try:
                return _EPOCH_DT + timedelta(microseconds=v * mult)
            except OverflowError:
                return None
        return v

    if op == "in":
        vals = [lift(v) for v in val]
        if any(v is None for v in vals):
            return None
        val = vals
    else:
        val = lift(val)
        if val is None:
            return None
    return project_monotonic(op, val, lambda dt: dt.strftime(fmt))


#: strftime directives a supported output format may contain, and the
#: digit shape each one renders — used to recognise whether a
#: partition directory IS a value of the declared format before
#: comparing lexicographically against a projected literal
_STRF_SHAPE = {"%Y": r"\d{4}", "%m": r"\d{2}", "%d": r"\d{2}",
               "%H": r"\d{2}"}


@lru_cache(maxsize=64)
def _ts_dir_shape(strf: str):
    """Compiled full-match regex for 'this directory is a value of the
    output format'. Hive-style dirs (``ts=2024-01-10``) or foreign
    layouts fail the shape test and are scanned, never pruned — a
    lexicographic comparison against a differently-shaped string
    proves nothing (r12 advice fix)."""
    out, i = [], 0
    while i < len(strf):
        tok = strf[i:i + 2]
        if tok in _STRF_SHAPE:
            out.append(_STRF_SHAPE[tok])
            i += 2
        else:
            out.append(re.escape(strf[i]))
            i += 1
    return re.compile("".join(out) + r"\Z")


def ts_path_can_match(
    relpath: str, conjuncts: list[tuple], pruner: tuple[str, str, str | None]
) -> bool:
    """Can a file under a timestamp-keygen partition path hold a
    matching row? The file's whole partition directory IS the
    formatted source value; a disjoint lexicographic comparison
    prunes. Directories that are not shaped like the output format
    (hive-style ``col=value``, mixed foreign layouts) always scan."""
    from hudi_and_delta_showcase_spark.tables.iceberg_meta import (
        _interval_can_match,
    )

    col, fmt, ts_type = pruner
    pdir = relpath.rsplit("/", 1)[0] if "/" in relpath else ""
    if not pdir or pdir == HIVE_DEFAULT_PARTITION:
        return True
    if "=" in pdir or not _ts_dir_shape(fmt).match(pdir):
        return True
    for c, op, val in conjuncts:
        if c != col:
            continue
        proj = _project_ts_path(fmt, op, val, ts_type)
        if proj is None:
            continue
        if not _interval_can_match(pdir, pdir, proj[0], proj[1]):
            return False
    return True


def file_provably_disjoint(
    relpath: str,
    stats: dict[str, dict[str, dict]],
    conjuncts: list[tuple],
    hive_ok: bool,
    ts_pruner: tuple[str, str] | None = None,
) -> bool:
    """One file's prune verdict, combining the metadata sources: the
    hive-style partition path (when the key generator makes it
    trustworthy), the timestamp-keygen date-tree path (r11), and the
    metadata table's col-stats entry (when one exists). Any one
    proving disjointness prunes; none proving anything scans."""
    if hive_ok and not path_can_match(relpath, conjuncts):
        return True
    if ts_pruner and not ts_path_can_match(relpath, conjuncts, ts_pruner):
        return True
    if stats and stats_entry(stats, relpath) is not None:
        return not file_can_match(relpath, stats, conjuncts)
    return False


#: wrapper records of HoodieMetadataColumnStats min/max unions — the
#: subset of org.apache.hudi.avro.model wrapper types whose values this
#: exporter emits (exact scalars only, mirroring the Delta exporter's
#: ``_add_stats_json`` discipline)
_WRAPPERS = [
    {"type": "record", "name": "BooleanWrapper",
     "fields": [{"name": "value", "type": "boolean"}]},
    {"type": "record", "name": "IntWrapper",
     "fields": [{"name": "value", "type": "int"}]},
    {"type": "record", "name": "LongWrapper",
     "fields": [{"name": "value", "type": "long"}]},
    {"type": "record", "name": "FloatWrapper",
     "fields": [{"name": "value", "type": "float"}]},
    {"type": "record", "name": "DoubleWrapper",
     "fields": [{"name": "value", "type": "double"}]},
    {"type": "record", "name": "BytesWrapper",
     "fields": [{"name": "value", "type": "bytes"}]},
    {"type": "record", "name": "StringWrapper",
     "fields": [{"name": "value", "type": "string"}]},
    # temporal wrappers (r12 — the types Hudi stamps for timestamp/
    # date column bounds; appended after the scalar seven, safe for
    # any reader that resolves unions by this OCF's embedded writer
    # schema, which is how Avro unions are specified to decode)
    {"type": "record", "name": "TimestampMicrosWrapper",
     "fields": [{"name": "value",
                 "type": {"type": "long",
                          "logicalType": "timestamp-micros"}}]},
    {"type": "record", "name": "DateWrapper",
     "fields": [{"name": "value",
                 "type": {"type": "int", "logicalType": "date"}}]},
]

#: HoodieMetadataRecord writer schema for files-partition blocks
FILES_SCHEMA = {
    "namespace": "org.apache.hudi.avro.model",
    "type": "record",
    "name": "HoodieMetadataRecord",
    "fields": [
        {"name": "key", "type": "string"},
        {"name": "type", "type": "int"},
        {
            "name": "filesystemMetadata",
            "type": [
                "null",
                {
                    "type": "map",
                    "values": {
                        "type": "record",
                        "name": "HoodieMetadataFileInfo",
                        "fields": [
                            {"name": "size", "type": "long"},
                            {"name": "isDeleted", "type": "boolean"},
                        ],
                    },
                },
            ],
            "default": None,
        },
    ],
}

#: HoodieMetadataRecord writer schema for column_stats blocks. The
#: min/max unions inline the SAME wrapper dicts twice (real Hudi
#: schemas use by-name references; this engine's generic block decoder
#: resolves inline definitions only, and union branch indexes — the
#: wire — are identical either way)
COL_STATS_SCHEMA = {
    "namespace": "org.apache.hudi.avro.model",
    "type": "record",
    "name": "HoodieMetadataRecord",
    "fields": [
        {"name": "key", "type": "string"},
        {"name": "type", "type": "int"},
        {
            "name": "ColumnStatsMetadata",
            "type": [
                "null",
                {
                    "type": "record",
                    "name": "HoodieMetadataColumnStats",
                    "fields": [
                        {"name": "fileName", "type": ["null", "string"],
                         "default": None},
                        {"name": "columnName", "type": ["null", "string"],
                         "default": None},
                        {"name": "minValue",
                         "type": ["null", *_WRAPPERS], "default": None},
                        {"name": "maxValue",
                         "type": ["null", *_WRAPPERS], "default": None},
                        {"name": "valueCount", "type": ["null", "long"],
                         "default": None},
                        {"name": "nullCount", "type": ["null", "long"],
                         "default": None},
                        {"name": "isDeleted", "type": "boolean"},
                    ],
                },
            ],
            "default": None,
        },
    ],
}


def _wrap(v):
    """Exact-scalar bound -> wrapper record dict (union branch picked
    by the encoder from the value's Python type — datetime/date values
    land in TimestampMicrosWrapper/DateWrapper, r12); None for bounds
    this exporter does not emit (non-scalars, NaN, mixed
    bool/number)."""
    if isinstance(v, bool):
        return {"value": v}
    if isinstance(v, (int, float, str, bytes, datetime)):
        if isinstance(v, float) and v != v:
            return None  # NaN bounds skip nothing safely
        return {"value": v}
    import datetime as _dtm

    if isinstance(v, _dtm.date):
        return {"value": v}
    return None


def _next_log_version(part_dir: str) -> int:
    from hudi_and_delta_showcase_spark.tables import hoodie_log as hl

    ver = 0
    if fsio.isdir(part_dir):
        for fn in fsio.listdir(part_dir):
            info = hl.parse_log_file_name(fn)
            if info is not None:
                ver = max(ver, info["version"])
    return ver + 1


def export_hoodie_metadata(table) -> str | None:
    """The metadata-table sibling of ``export_hoodie_timeline`` (r10):
    materialize the engine table's CURRENT manifest state as a real
    ``.hoodie/metadata`` MoR table — one deltacommit appending Avro log
    blocks to the ``files`` partition (partition -> file -> size, with
    ``isDeleted`` tombstones for files dropped since the last export)
    and the ``column_stats`` partition (per-file min/max/null/value
    counts straight from the manifest's col-stats and row-count
    indexes — metadata-only, zero data IO). Foreign readers of the
    exported timeline — including this engine's own
    ``read_hoodie_table(predicate=...)`` — then list files in
    O(partitions + live files) and prune scans on per-file bounds, the
    exact job Hudi 0.14+'s metadata table does at 100 TB.

    Divergences from a Hudi-written metadata table, both inert to
    readers: record KEYS are readable ``column/file`` surrogates
    rather than Hudi's hashed base64 point-lookup keys (full-partition
    reads never consult them), and ``hoodie.properties`` does not
    declare ``hoodie.table.metadata.partitions`` — a real Hudi reader
    therefore ignores this tree entirely instead of half-trusting it.
    Idempotent: re-exporting an unchanged table writes nothing.
    Returns the deltacommit instant, or None for a no-op."""
    from hudi_and_delta_showcase_spark.tables import hoodie_log as hl
    from hudi_and_delta_showcase_spark.tables import manifest as mf

    c = table._commit(None)
    cur: dict[str, dict[str, int]] = {}
    for f in c.files:
        part, _, name = f.rpartition("/")
        cur.setdefault(part, {})[name] = fsio.file_size(
            fsio.join(table.path, f)
        )
    prev = read_hoodie_metadata_files(table.path) or {}
    if prev == cur:
        return None
    md = _metadata_root(table.path)
    files_dir = fsio.join(md, "files")
    cs_dir = fsio.join(md, "column_stats")
    fsio.makedirs(files_dir)
    fsio.makedirs(cs_dir)
    fsio.makedirs(fsio.join(md, ".hoodie"))
    instant = mf.make_commit_time()

    file_records: list[dict] = [{
        "key": ALL_PARTITIONS_KEY,
        "type": 1,
        "filesystemMetadata": {
            (p or NON_PARTITIONED): {"size": 0, "isDeleted": False}
            for p in sorted(cur)
        },
    }]
    for part in sorted(set(cur) | set(prev)):
        fsmeta: dict[str, dict] = {}
        live = cur.get(part, {})
        for name, size in live.items():
            fsmeta[name] = {"size": size, "isDeleted": False}
        for name in prev.get(part, {}):
            if name not in live:
                fsmeta[name] = {"size": 0, "isDeleted": True}
        file_records.append({
            "key": part or NON_PARTITIONED,
            "type": 2,
            "filesystemMetadata": fsmeta,
        })

    prev_stats = read_hoodie_metadata_col_stats(table.path) or {}
    # stats key on the table-RELATIVE path: a partitioned engine layout
    # can repeat a base name across partition directories (real Hudi's
    # uuid file-group names never collide, so its base-name keys are
    # safe there; readers try full path first, then base name)
    live_names = set(c.files)
    # temporal columns: the manifest stores their footer bounds as ISO
    # strings (JSON stability); the EXPORT re-types them so foreign
    # Hudi readers see the real TimestampMicrosWrapper / DateWrapper
    # the format stamps for these columns (r12)
    import datetime as _dtm

    from pyspark.sql import types as _T

    temporal: dict[str, str] = {}
    for sf in table.read().schema.fields:
        if isinstance(sf.dataType, (_T.TimestampType, _T.TimestampNTZType)):
            temporal[sf.name] = "ts"
        elif isinstance(sf.dataType, _T.DateType):
            temporal[sf.name] = "date"

    def _retype(col: str, v):
        kind = temporal.get(col)
        if kind is None or not isinstance(v, str):
            return v
        try:
            return (
                _dtm.datetime.fromisoformat(v)
                if kind == "ts"
                else _dtm.date.fromisoformat(v)
            )
        except ValueError:
            return v

    cs_records: list[dict] = []
    for f in sorted(c.files):
        n_rows = c.row_counts.get(f)
        for col, rng in sorted((c.col_stats.get(f) or {}).items()):
            if col == "_hoodie_commit_seqno":
                continue  # write-sequence bounds are pure noise
            lo, hi = _wrap(_retype(col, rng[0])), _wrap(_retype(col, rng[1]))
            if lo is None or hi is None:
                continue
            if isinstance(lo["value"], bool) != isinstance(hi["value"], bool):
                continue
            cs_records.append({
                "key": f"{col}/{f}",
                "type": 3,
                "ColumnStatsMetadata": {
                    "fileName": f, "columnName": col,
                    "minValue": lo, "maxValue": hi,
                    "valueCount": None if n_rows is None else int(n_rows),
                    "nullCount": None,
                    "isDeleted": False,
                },
            })
    for name, cols in sorted(prev_stats.items()):
        if name in live_names:
            continue
        for col in sorted(cols):
            cs_records.append({
                "key": f"{col}/{name}",
                "type": 3,
                "ColumnStatsMetadata": {
                    "fileName": name, "columnName": col,
                    "minValue": None, "maxValue": None,
                    "valueCount": None, "nullCount": None,
                    "isDeleted": True,
                },
            })

    # logs attach to the CURRENT file slice: after an HFile compaction
    # (r11) the slice's base instant is the compaction's, and readers
    # only apply logs whose base instant matches it
    hl.write_log_file(
        fsio.join(files_dir, hl.log_file_name(
            "files-0000", _slice_base_instant(files_dir, md),
            version=_next_log_version(files_dir),
        )),
        [hl.avro_data_block(file_records, FILES_SCHEMA, instant)],
    )
    if cs_records:
        hl.write_log_file(
            fsio.join(cs_dir, hl.log_file_name(
                "col-stats-0000", _slice_base_instant(cs_dir, md),
                version=_next_log_version(cs_dir),
            )),
            [hl.avro_data_block(cs_records, COL_STATS_SCHEMA, instant)],
        )
    # the completed instant lands LAST: a crash before this line leaves
    # blocks that every reader skips as never-completed
    fsio.write_atomic(
        fsio.join(md, ".hoodie", f"{instant}.deltacommit"), "{}"
    )
    return instant


def _slice_base_instant(part_dir: str, md_root: str) -> str:
    """The latest COMMITTED HFile base instant of a metadata partition
    (the file slice new logs must attach to), or the zero instant for
    the never-compacted slice. Committed only (r11 review finding): a
    crashed compaction's uncommitted base is IGNORED by readers, so a
    log attached to it would silently vanish from the served state."""
    valid = _completed_metadata_instants(md_root) or frozenset()
    instants = [
        _parse_base_file_name(fn)
        for fn in fsio.listdir(part_dir)
        if fn.endswith(".hfile")
    ] if fsio.isdir(part_dir) else []
    instants = [i for i in instants if i and i.split("_")[0] in valid]
    return max(instants) if instants else "00000000000000"


def compact_hoodie_metadata(
    table_path: str, compression: str = "gz"
) -> str | None:
    """Compact the exported metadata table's log slices into HFile v3
    BASE files (r11) — the format real Hudi metadata compaction
    writes, and the read path ``tables/hfile.py`` serves. The merged
    partition state (files listing + column stats, tombstones folded
    away) lands as one HFile per partition, cells sorted by record
    key, the Avro record schema stamped in the HFile file info; the
    compaction commits as a ``.commit`` instant and later exports
    append their deltas to the NEW slice. O(partition state) work,
    zero data IO. Returns the compaction instant, or None when there
    is nothing to compact."""
    import io
    import json

    from hudi_and_delta_showcase_spark import avro_ocf
    from hudi_and_delta_showcase_spark.tables import hfile
    from hudi_and_delta_showcase_spark.tables import manifest as mf

    md = _metadata_root(table_path)
    files_state = read_hoodie_metadata_files(table_path)
    if files_state is None:
        return None
    instant = mf.make_commit_time()

    def write_base(part: str, file_id: str, records: list[dict],
                   schema: dict) -> None:
        cells = []
        for rec in sorted(records, key=lambda r: r["key"]):
            buf = io.BytesIO()
            avro_ocf._encode(schema, rec, buf)
            cells.append((rec["key"].encode("utf-8"), buf.getvalue()))
        blob = hfile.write_hfile(
            cells,
            {b"schema": json.dumps(schema).encode()},
            compression=compression,
        )
        fsio.write_bytes_atomic(
            fsio.join(md, part, f"{file_id}_0-0-0_{instant}.hfile"), blob
        )

    file_records: list[dict] = [{
        "key": ALL_PARTITIONS_KEY,
        "type": 1,
        "filesystemMetadata": {
            (p or NON_PARTITIONED): {"size": 0, "isDeleted": False}
            for p in sorted(files_state)
        },
    }]
    for part in sorted(files_state):
        file_records.append({
            "key": part or NON_PARTITIONED,
            "type": 2,
            "filesystemMetadata": {
                name: {"size": size, "isDeleted": False}
                for name, size in sorted(files_state[part].items())
            },
        })
    write_base("files", "files-0000", file_records, FILES_SCHEMA)

    cs_state = read_hoodie_metadata_col_stats(table_path)
    if cs_state:
        cs_records = []
        for fname in sorted(cs_state):
            for col, st in sorted(cs_state[fname].items()):
                lo, hi = _wrap(st.get("min")), _wrap(st.get("max"))
                if lo is None or hi is None:
                    continue
                cs_records.append({
                    "key": f"{col}/{fname}",
                    "type": 3,
                    "ColumnStatsMetadata": {
                        "fileName": fname, "columnName": col,
                        "minValue": lo, "maxValue": hi,
                        "valueCount": st.get("value_count"),
                        "nullCount": st.get("null_count"),
                        "isDeleted": False,
                    },
                })
        if cs_records:
            write_base(
                "column_stats", "col-stats-0000", cs_records,
                COL_STATS_SCHEMA,
            )
    fsio.write_atomic(
        fsio.join(md, ".hoodie", f"{instant}.commit"), "{}"
    )
    return instant


def list_data_files(table_path: str) -> list[str] | None:
    """Flatten the files-partition state to table-relative data file
    paths (the listing ``_archived_file_slices`` would otherwise walk
    for); None -> fall back."""
    state = read_hoodie_metadata_files(table_path)
    if state is None:
        return None
    out: list[str] = []
    for part, files in state.items():
        for name in files:
            out.append(f"{part}/{name}" if part else name)
    return sorted(out)
