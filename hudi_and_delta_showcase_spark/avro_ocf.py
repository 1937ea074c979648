"""Avro Object Container File codec, pure Python (SURVEY.md §2.1 S1).

The reference ingests Datastream CDC as Avro files
(``spark.read.format("avro")``, /root/reference/README.md:264) via the
external spark-avro jar, which this environment does not ship. This
module implements the Avro 1.x OCF format from the public specification
(https://avro.apache.org/docs/current/specification/): header magic
``Obj\\x01`` + metadata map (writer schema JSON, codec) + 16-byte sync
marker, then length-prefixed deflate/null blocks of binary-encoded
records (zigzag-varint longs, length-prefixed bytes/strings, index-
prefixed unions).

Spark integration (``read_avro_ocf``) is scale-first: files are listed
and shipped by the ``binaryFile`` source and each executor decodes its
own files inside ``mapInPandas`` — per-file parallelism, no driver
funnel, Arrow-batched output. Avro OCF is a row format decoded
sequentially per file (exactly how the JVM reader treats it; at 100 TB
parallelism comes from file count, which CDC drops provide naturally).

Only the spec features the Datastream envelope needs are implemented
(records, unions with null, arrays, maps, primitives, fixed/enum,
timestamp-micros / -millis logical types); unsupported schema nodes
raise rather than mis-decode.
"""

from __future__ import annotations

import datetime
import io
import json
import struct
import zlib
from typing import Any

MAGIC = b"Obj\x01"
_EPOCH = datetime.datetime(1970, 1, 1)


# --------------------------------------------------------------------------
# binary primitives
# --------------------------------------------------------------------------


class _Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def read(self, n: int) -> bytes:
        b = self.buf[self.pos:self.pos + n]
        if len(b) != n:
            raise EOFError("truncated avro data")
        self.pos += n
        return b

    def read_long(self) -> int:
        """zigzag varint (spec: int/long encoding)."""
        shift = 0
        acc = 0
        while True:
            byte = self.buf[self.pos]
            self.pos += 1
            acc |= (byte & 0x7F) << shift
            if not byte & 0x80:
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)

    def read_bytes(self) -> bytes:
        return self.read(self.read_long())

    def at_end(self) -> bool:
        return self.pos >= len(self.buf)


def _write_long(out: io.BytesIO, v: int) -> None:
    v = (v << 1) ^ (v >> 63)  # zigzag
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.write(bytes([b | 0x80]))
        else:
            out.write(bytes([b]))
            break


def _write_bytes(out: io.BytesIO, b: bytes) -> None:
    _write_long(out, len(b))
    out.write(b)


# --------------------------------------------------------------------------
# schema-driven decode / encode
# --------------------------------------------------------------------------


def _decode(schema: Any, r: _Reader) -> Any:
    if isinstance(schema, str):
        t = schema
        if t == "null":
            return None
        if t == "boolean":
            return r.read(1) == b"\x01"
        if t in ("int", "long"):
            return r.read_long()
        if t == "float":
            return struct.unpack("<f", r.read(4))[0]
        if t == "double":
            return struct.unpack("<d", r.read(8))[0]
        if t == "bytes":
            return r.read_bytes()
        if t == "string":
            return r.read_bytes().decode("utf-8")
        raise ValueError(f"unsupported avro type: {t}")
    if isinstance(schema, list):  # union: index-prefixed
        return _decode(schema[r.read_long()], r)
    t = schema["type"]
    if t == "record":
        return {
            f["name"]: _decode(f["type"], r) for f in schema["fields"]
        }
    if t == "array":
        out = []
        while True:
            n = r.read_long()
            if n == 0:
                break
            if n < 0:  # block with byte-size prefix
                n = -n
                r.read_long()
            for _ in range(n):
                out.append(_decode(schema["items"], r))
        return out
    if t == "map":
        out = {}
        while True:
            n = r.read_long()
            if n == 0:
                break
            if n < 0:
                n = -n
                r.read_long()
            for _ in range(n):
                k = r.read_bytes().decode("utf-8")
                out[k] = _decode(schema["values"], r)
        return out
    if t == "enum":
        return schema["symbols"][r.read_long()]
    if t == "fixed":
        return r.read(schema["size"])
    if t in ("int", "long"):
        v = r.read_long()
        lt = schema.get("logicalType")
        if lt == "timestamp-micros":
            return _EPOCH + datetime.timedelta(microseconds=v)
        if lt == "timestamp-millis":
            return _EPOCH + datetime.timedelta(milliseconds=v)
        if lt == "date":
            return datetime.date(1970, 1, 1) + datetime.timedelta(days=v)
        return v
    if isinstance(t, (dict, list, str)) and not schema.get("logicalType"):
        return _decode(t, r)  # nested/annotated type
    raise ValueError(f"unsupported avro schema node: {schema}")


def _union_branch(schema: list, v: Any) -> int:
    """Index of the union branch matching ``v``'s Python type. For the
    common ``["null", T]`` unions this is simply the non-null branch
    (the original behavior); multi-branch unions (e.g. Hudi's
    ``HoodieDeleteRecord.orderingVal``) resolve bool→boolean,
    int→long/int, float→double/float, str→string, bytes→bytes, and
    fall back to the first non-null branch for container types."""
    non_null = [i for i, s in enumerate(schema) if s != "null"]
    if len(non_null) == 1:
        return non_null[0]
    prefs = {
        bool: ("boolean",),
        int: ("long", "int"),
        float: ("double", "float"),
        str: ("string",),
        bytes: ("bytes",),
    }
    # bool is an int subclass — check exact type first
    wanted = prefs.get(type(v)) or next(
        (p for t, p in prefs.items() if isinstance(v, t)), None
    )
    if wanted:
        for name in wanted:
            if name in schema:
                return schema.index(name)
    if isinstance(v, dict):
        # record branches (e.g. Hudi's col-stats value WRAPPERS —
        # BooleanWrapper/LongWrapper/... each a one-field record):
        # match on the field-name set, then discriminate same-shaped
        # wrappers by the Python type of each field value
        recs = [
            (i, s)
            for i, s in enumerate(schema)
            if isinstance(s, dict) and s.get("type") == "record"
        ]
        shaped = [
            (i, s)
            for i, s in recs
            if {f["name"] for f in s["fields"]} == set(v.keys())
        ]
        if len(shaped) == 1:
            return shaped[0][0]

        def _rank(s: dict):
            """Preference rank per field (lower = better): the value's
            OWN preference order, so a Python float lands in a
            'double' branch before a 'float' one and an int in 'long'
            before 'int' — never a lossy narrower sibling. A field
            whose type is outside the value's preference list
            disqualifies the branch. datetime/date field values (r12)
            demand a temporal logicalType branch — Hudi's
            TimestampMicrosWrapper / DateWrapper — never a bare
            long/int sibling that would drop the unit."""
            total = 0
            for f in s["fields"]:
                ft = f["type"]
                prim = ft if isinstance(ft, str) else (
                    ft.get("type") if isinstance(ft, dict) else None
                )
                fv = v[f["name"]]
                if isinstance(fv, datetime.datetime):
                    lt = ft.get("logicalType") if isinstance(ft, dict) \
                        else None
                    if lt not in ("timestamp-micros", "timestamp-millis"):
                        return None
                    continue
                if isinstance(fv, datetime.date):
                    lt = ft.get("logicalType") if isinstance(ft, dict) \
                        else None
                    if lt != "date":
                        return None
                    continue
                want = prefs.get(type(fv))
                if not want:
                    continue
                if prim not in want:
                    return None
                total += want.index(prim)
            return total

        ranked = sorted(
            ((r, i) for i, s in shaped if (r := _rank(s)) is not None),
        )
        if ranked:
            return ranked[0][1]
        if shaped:
            return shaped[0][0]
    return non_null[0]


def _encode(schema: Any, v: Any, out: io.BytesIO) -> None:
    if isinstance(schema, str):
        t = schema
        if t == "null":
            return
        if t == "boolean":
            out.write(b"\x01" if v else b"\x00")
        elif t in ("int", "long"):
            _write_long(out, v)
        elif t == "float":
            out.write(struct.pack("<f", v))
        elif t == "double":
            out.write(struct.pack("<d", v))
        elif t == "bytes":
            _write_bytes(out, bytes(v))
        elif t == "string":
            _write_bytes(out, v.encode("utf-8"))
        else:
            raise ValueError(f"unsupported avro type: {t}")
        return
    if isinstance(schema, list):  # union — pick the branch by value type
        if v is None:
            idx = schema.index("null")
            _write_long(out, idx)
            return
        idx = _union_branch(schema, v)
        _write_long(out, idx)
        _encode(schema[idx], v, out)
        return
    t = schema["type"]
    if t == "record":
        for f in schema["fields"]:
            _encode(f["type"], v[f["name"]], out)
    elif t == "array":
        if v:
            _write_long(out, len(v))
            for item in v:
                _encode(schema["items"], item, out)
        _write_long(out, 0)
    elif t == "map":
        if v:
            _write_long(out, len(v))
            for k, item in v.items():
                _write_bytes(out, k.encode("utf-8"))
                _encode(schema["values"], item, out)
        _write_long(out, 0)
    elif t == "enum":
        _write_long(out, schema["symbols"].index(v))
    elif t == "fixed":
        out.write(bytes(v))
    elif t in ("int", "long"):
        lt = schema.get("logicalType")
        if lt == "timestamp-micros" and isinstance(v, datetime.datetime):
            _write_long(out, (v - _EPOCH) // datetime.timedelta(
                microseconds=1
            ))
        elif lt == "timestamp-millis" and isinstance(v, datetime.datetime):
            _write_long(out, round((v - _EPOCH).total_seconds() * 1e3))
        elif lt == "date" and isinstance(v, datetime.date):
            _write_long(
                out, (v - datetime.date(1970, 1, 1)).days
            )
        else:
            _write_long(out, int(v))
    else:
        raise ValueError(f"unsupported avro schema node: {schema}")


# --------------------------------------------------------------------------
# container file
# --------------------------------------------------------------------------


def ocf_decode(blob: bytes) -> tuple[dict, list[Any]]:
    """Decode one OCF file -> (writer schema, records)."""
    r = _Reader(blob)
    if r.read(4) != MAGIC:
        raise ValueError("not an avro object container file")
    meta = {}
    while True:
        n = r.read_long()
        if n == 0:
            break
        if n < 0:
            n = -n
            r.read_long()
        for _ in range(n):
            k = r.read_bytes().decode("utf-8")
            meta[k] = r.read_bytes()
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    sync = r.read(16)
    records: list[Any] = []
    while not r.at_end():
        count = r.read_long()
        block = r.read_bytes()
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        elif codec != "null":
            raise ValueError(f"unsupported avro codec: {codec}")
        br = _Reader(block)
        for _ in range(count):
            records.append(_decode(schema, br))
        if r.read(16) != sync:
            raise ValueError("sync marker mismatch")
    return schema, records


def ocf_encode(
    schema: dict, records: list[Any], codec: str = "deflate",
    sync: bytes = b"\x00" * 16, extra_meta: dict[str, bytes] | None = None,
) -> bytes:
    """Encode records into one OCF blob (single block).

    ``extra_meta`` adds application metadata entries to the file header
    (Avro spec reserves only the ``avro.`` prefix) — Iceberg manifests
    carry their table schema / partition spec / format version there.
    """
    out = io.BytesIO()
    out.write(MAGIC)
    meta = {
        "avro.schema": json.dumps(schema).encode("utf-8"),
        "avro.codec": codec.encode("utf-8"),
        **(extra_meta or {}),
    }
    _write_long(out, len(meta))
    for k, v in meta.items():
        _write_bytes(out, k.encode("utf-8"))
        _write_bytes(out, v)
    _write_long(out, 0)
    out.write(sync)
    body = io.BytesIO()
    for rec in records:
        _encode(schema, rec, body)
    block = body.getvalue()
    if codec == "deflate":
        comp = zlib.compressobj(9, zlib.DEFLATED, -15)
        block = comp.compress(block) + comp.flush()
    elif codec != "null":
        raise ValueError(f"unsupported avro codec: {codec}")
    _write_long(out, len(records))
    _write_bytes(out, block)
    out.write(sync)
    return out.getvalue()


# --------------------------------------------------------------------------
# Spark <-> Avro schema bridge
# --------------------------------------------------------------------------


def spark_schema_to_avro(schema, name: str = "root") -> dict:
    """StructType -> Avro record schema (nullable fields as
    ["null", T] unions, Datastream-style)."""
    from pyspark.sql import types as T

    def conv(dt, field_name):
        if isinstance(dt, T.StructType):
            return {
                "type": "record",
                "name": field_name,
                "fields": [
                    {"name": f.name, "type": ["null", conv(f.dataType, f"{field_name}_{f.name}")]}
                    for f in dt.fields
                ],
            }
        if isinstance(dt, T.ArrayType):
            return {"type": "array", "items": ["null", conv(dt.elementType, f"{field_name}_item")]}
        if isinstance(dt, T.MapType):
            return {"type": "map", "values": ["null", conv(dt.valueType, f"{field_name}_value")]}
        if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
            return {"type": "long", "logicalType": "timestamp-micros"}
        simple = {
            T.StringType: "string", T.IntegerType: "int", T.LongType: "long",
            T.FloatType: "float", T.DoubleType: "double",
            T.BooleanType: "boolean", T.BinaryType: "bytes",
        }
        for cls, avro_t in simple.items():
            if isinstance(dt, cls):
                return avro_t
        raise ValueError(f"no avro mapping for spark type {dt}")

    return conv(schema, name)


def read_avro_ocf(spark, path: str, spark_schema) -> "DataFrame":  # noqa: F821
    """S1 batch scan without the spark-avro jar: ``binaryFile`` lists and
    distributes the files; each executor OCF-decodes its own inside
    ``mapInPandas`` (Arrow-batched). ``spark_schema`` declares the
    expected row shape (nested structs/arrays supported)."""
    import pandas as pd

    cols = [f.name for f in spark_schema.fields]

    def decode_files(batches):
        for pdf in batches:
            rows = []
            for blob in pdf["content"]:
                _schema, records = ocf_decode(bytes(blob))
                rows.extend(records)
            yield pd.DataFrame(
                [[rec.get(c) for c in cols] for rec in rows], columns=cols
            )

    files = spark.read.format("binaryFile").load(path).select("content")
    return files.mapInPandas(decode_files, spark_schema)
