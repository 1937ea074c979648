"""Per-file key bloom filters: the third file-skipping tier (Hudi BLOOM
index, ``hoodie.index.type=BLOOM``) beside partition pruning and key
min/max ranges.

Why a third tier: range pruning only pays when files carry mostly
DISJOINT key spans (post ``optimize(cluster_by=...)``); on unclustered
tables — hash-distributed writes, every file spanning most of the key
space — the range probe declines and an upsert rewrites every candidate
file. A bloom answers "can this file contain THIS key" even when ranges
fully overlap, at ~1 KiB-8 KiB of manifest per file.

Hashing contract: both build and probe hash JVM-side
(``xxhash64(key)`` / ``xxhash64(key, salt)``) so the Python stages do
only numpy bit math on int64 columns — no Python hash of row data, no
cross-language hash skew. Double hashing (h1 + i*h2 mod m) gives the k
positions (Kirsch-Mitzenmacher).

Scale shape: build is map-only over just-written files (per-Arrow-batch
partial bitmaps, OR-merged driver-side — O(files) x 8 KiB driver
memory); probe broadcasts candidate bitmaps to a map-only pass over the
batch's DISTINCT keys (scales with the batch, never the table).
Saturated blooms (too many keys for m bits) stay conservative: a bloom
is only trusted to SKIP, never to force a hit beyond what it tests.
"""

from __future__ import annotations

import base64

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

#: bitmap size in bits (8 KiB per file). <1% false positives to ~6k
#: keys/file with K hashes; beyond that the filter degrades toward
#: always-hit, which is conservative (no skipped rewrites that needed
#: to happen), never wrong.
M_BITS = 1 << 16
K_HASHES = 6

_SALT = "hds-bloom-h2"


def _hash_cols(key_col: str) -> list:
    return [
        F.xxhash64(F.col(key_col)).alias("__h1"),
        F.xxhash64(F.col(key_col), F.lit(_SALT)).alias("__h2"),
    ]


def build_file_blooms(
    df: DataFrame,
    key_col: str = "_hoodie_record_key",
    file_col: str = "_hoodie_file_name",
) -> dict[str, str]:
    """One bloom per file NAME over the file's record keys, returned as
    base64 bitmaps. ``df`` must expose the scan's file-name column."""

    def partials(batches):
        for pdf in batches:
            h1 = pdf["__h1"].to_numpy(dtype="int64").astype("uint64")
            h2 = pdf["__h2"].to_numpy(dtype="int64").astype("uint64")
            files = pdf["__f"].to_numpy()
            rows = []
            for f in pd.unique(files):
                sel = files == f
                bits = np.zeros(M_BITS // 8, dtype=np.uint8)
                for i in range(K_HASHES):
                    pos = (h1[sel] + np.uint64(i) * h2[sel]) % np.uint64(M_BITS)
                    np.bitwise_or.at(
                        bits,
                        (pos >> np.uint64(3)).astype(np.int64),
                        (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)),
                    )
                rows.append((f, bits.tobytes()))
            yield pd.DataFrame(rows, columns=["f", "bloom"])

    parts = (
        df.select(F.col(file_col).alias("__f"), *_hash_cols(key_col))
        .mapInPandas(partials, "f string, bloom binary")
        .collect()
    )
    merged: dict[str, np.ndarray] = {}
    for r in parts:
        bits = np.frombuffer(r.bloom, dtype=np.uint8)
        if r.f in merged:
            merged[r.f] = merged[r.f] | bits
        else:
            merged[r.f] = bits
    return {
        f: base64.b64encode(bits.tobytes()).decode("ascii")
        for f, bits in merged.items()
    }


def probe_blooms(
    spark: SparkSession,
    keys_df: DataFrame,
    blooms: dict[str, str],
    key_col: str = "_hoodie_record_key",
) -> set[str]:
    """Of ``blooms``' files, return those whose filter claims at least
    one of the batch's keys (possible member). Files NOT returned are
    definite misses — safe to skip."""
    if not blooms:
        return set()
    payload = [
        (f, np.frombuffer(base64.b64decode(b64), dtype=np.uint8))
        for f, b64 in sorted(blooms.items())
    ]
    bc = spark.sparkContext.broadcast(payload)

    def probe(batches):
        hits: set[str] = set()
        files = bc.value
        for pdf in batches:
            h1 = pdf["__h1"].to_numpy(dtype="int64").astype("uint64")
            h2 = pdf["__h2"].to_numpy(dtype="int64").astype("uint64")
            for f, bits in files:
                if f in hits:
                    continue
                member = np.ones(len(h1), dtype=bool)
                for i in range(K_HASHES):
                    pos = (h1 + np.uint64(i) * h2) % np.uint64(M_BITS)
                    byte = bits[(pos >> np.uint64(3)).astype(np.int64)]
                    member &= (
                        byte >> (pos & np.uint64(7)).astype(np.uint8)
                    ) & np.uint8(1) == 1
                    if not member.any():
                        break
                if member.any():
                    hits.add(f)
        yield pd.DataFrame({"f": sorted(hits)})

    rows = (
        keys_df.select(*_hash_cols(key_col))
        .distinct()
        .mapInPandas(probe, "f string")
        .distinct()
        .collect()
    )
    return {r.f for r in rows}


def typed_literal_df(
    spark: SparkSession, col: str, value, type_str: str
) -> DataFrame:
    """One-row DataFrame holding ``value`` cast to ``type_str`` under
    column name ``col`` — the probe side of a typed bloom. Datetimes are
    serialized to wall-time strings BEFORE the cast: ``F.lit(datetime)``
    builds an LTZ literal through the JVM default zone and a later NTZ
    cast applies the session zone, silently shifting the probed value
    under non-UTC driver sessions."""
    import datetime as _dt

    if isinstance(value, _dt.datetime):
        value = value.strftime("%Y-%m-%d %H:%M:%S.%f")
    return spark.range(1).select(F.lit(value).cast(type_str).alias(col))
