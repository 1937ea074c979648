"""Multimodal column conventions (SURVEY.md §2.12): image/audio/video as
opaque ``binary`` columns + a typed metadata struct, with decode /
feature-extract / resize / frame-sample implemented as Arrow-batched
``mapInPandas`` stages.

Codec strategy: PIL when the environment provides it (any format), else
the vendored pure-stdlib PNG codec (``png_codec.py`` — IHDR parse,
unfilter decode, nearest resize), so the ``fake=False`` branches REALLY
execute even in codec-less containers for PNG payloads; non-PNG payloads
without PIL fail per-row with ValueError. The ``fake=True`` decoder
remains the deterministic stub (dimensions derived from payload size)
for oracle-checked pipelines over arbitrary binary blobs.

Scale notes: media blobs dominate row size; ``rows_per_batch`` caps Arrow
batch memory (spark.sql.execution.arrow.maxRecordsPerBatch), and blobs
should ride in their own column family / table keyed by content hash, with
features extracted once and joined by hash thereafter — dedup-by-hash
before decode is the single biggest cost saver at 100 TB.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: metadata struct accompanying every media blob column
MEDIA_META_SCHEMA = StructType(
    [
        StructField("media_type", StringType()),   # image|audio|video
        StructField("format", StringType()),       # png|jpeg|wav|mp4|...
        StructField("n_bytes", LongType()),
        StructField("content_sha256", StringType()),
    ]
)


def attach_media_meta(
    df: DataFrame, blob_col: str, media_type: str, fmt: str
) -> DataFrame:
    """Stamp the typed metadata struct for a binary column — all
    JVM-side expressions (sha2/length), no Python."""
    return df.withColumn(
        f"{blob_col}_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(fmt).alias("format"),
            F.length(F.col(blob_col)).cast("long").alias("n_bytes"),
            F.sha2(F.col(blob_col), 256).alias("content_sha256"),
        ),
    )


DECODED_IMAGE_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("n_bytes", LongType()),
    ]
)


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for an image codec: dimensions derived from
    the payload size. Replace with PIL/opencv where available."""
    n = len(payload)
    return 16 + n % 64, 16 + (n // 64) % 64, 3


def _pil_decode(payload: bytes) -> tuple[int, int, int]:
    """Full codec path: PIL, when the environment provides it."""
    import io

    from PIL import Image

    with Image.open(io.BytesIO(payload)) as img:
        return img.width, img.height, len(img.getbands())


def _real_decode(payload: bytes) -> tuple[int, int, int]:
    """Real decode: PIL if importable (any format), else the vendored
    pure-stdlib PNG parser (ValueError on non-PNG)."""
    if has_real_codec():
        return _pil_decode(payload)
    from hudi_and_delta_showcase_spark.operators.png_codec import png_info

    return png_info(payload)


def has_real_codec() -> bool:
    """True when PIL is importable (full multi-format codec). PNG
    decode/resize works regardless via the vendored png_codec."""
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def decode_image(
    df: DataFrame,
    id_col: str,
    blob_col: str,
    fake: bool = False,
    rows_per_batch: int = 256,
) -> DataFrame:
    """Decode blobs to (width, height, channels) via ``mapInPandas`` —
    the Arrow-batched shape every real codec UDF uses. ``fake=True``
    uses the deterministic stub decoder (oracle-checkable over arbitrary
    binary payloads); ``fake=False`` really decodes — PIL when
    importable on the executors, else the vendored pure-Python PNG
    parser (per-row ValueError on non-PNG payloads)."""
    decode = _fake_decode if fake else _real_decode

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for rid, blob in zip(pdf[id_col], pdf[blob_col]):
                payload = bytes(blob)
                w, h, c = decode(payload)
                out.append((int(rid), w, h, c, len(payload)))
            yield pd.DataFrame(
                out, columns=["id", "width", "height", "channels", "n_bytes"]
            )

    pruned = df.select(id_col, blob_col)
    return pruned.mapInPandas(decode_batches, DECODED_IMAGE_SCHEMA)


FEATURES_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("byte_entropy", StringType()),  # 6-dp string: exact compare
        StructField("hist16", StringType()),        # csv of 16 bucket counts
    ]
)


def extract_features(
    df: DataFrame, id_col: str, blob_col: str
) -> DataFrame:
    """Feature extraction over binary media: 16-bucket byte histogram +
    Shannon entropy per blob, Arrow-batched via mapInPandas. Real
    computation (no codec needed) — the same stage shape a CLIP/VGG
    embedding UDF uses. Entropy is emitted as a 6-dp STRING so the
    output is exactly comparable across runs (float formatting, not
    float summation, is the only risk here)."""
    import math

    def feat_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for rid, blob in zip(pdf[id_col], pdf[blob_col]):
                payload = bytes(blob)
                counts = [0] * 16
                for byte in payload:
                    counts[byte >> 4] += 1
                n = len(payload)
                ent = 0.0
                for c in counts:
                    if c:
                        p = c / n
                        ent -= p * math.log2(p)
                out.append(
                    (int(rid), n, f"{ent:.6f}", ",".join(map(str, counts)))
                )
            yield pd.DataFrame(
                out, columns=["id", "n_bytes", "byte_entropy", "hist16"]
            )

    return df.select(id_col, blob_col).mapInPandas(feat_batches, FEATURES_SCHEMA)


def resize_image(
    df: DataFrame,
    id_col: str,
    blob_col: str,
    target_w: int,
    target_h: int,
    fake: bool = False,
) -> DataFrame:
    """Resize stage metadata: source dims + the scale factors the
    resampler applies, as mapInPandas. ``fake=True`` stub-decodes dims
    from arbitrary payloads; ``fake=False`` reads the REAL dims (PIL or
    the vendored PNG parser). For the actual pixel work see
    ``resize_image_blobs``."""
    schema = (
        f"{id_col} long, src_w int, src_h int, dst_w int, dst_h int, "
        "scale_x double, scale_y double"
    )
    decode = _fake_decode if fake else _real_decode

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for rid, blob in zip(pdf[id_col], pdf[blob_col]):
                w, h, _c = decode(bytes(blob))
                out.append(
                    (int(rid), w, h, target_w, target_h,
                     target_w / w, target_h / h)
                )
            yield pd.DataFrame(
                out,
                columns=[id_col, "src_w", "src_h", "dst_w", "dst_h",
                         "scale_x", "scale_y"],
            )

    return df.select(id_col, blob_col).mapInPandas(resize_batches, schema)


def resize_image_blobs(
    df: DataFrame,
    id_col: str,
    blob_col: str,
    target_w: int,
    target_h: int,
) -> DataFrame:
    """REAL resize: decode -> nearest-neighbor resample -> re-encode,
    per blob, Arrow-batched. Pure-stdlib PNG path (png_codec) when PIL
    is absent, so this executes in codec-less containers; output blobs
    are valid PNGs round-trippable by ``decode_image(fake=False)``."""
    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("blob", BinaryType()),
        ]
    )

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if has_real_codec():
            import io

            from PIL import Image

            def resample(payload: bytes) -> bytes:
                with Image.open(io.BytesIO(payload)) as img:
                    buf = io.BytesIO()
                    img.resize((target_w, target_h), Image.NEAREST).save(
                        buf, format="PNG"
                    )
                    return buf.getvalue()

        else:
            from hudi_and_delta_showcase_spark.operators.png_codec import (
                png_resize_nearest,
            )

            def resample(payload: bytes) -> bytes:
                return png_resize_nearest(payload, target_w, target_h)

        for pdf in batches:
            out = [
                (int(rid), resample(bytes(blob)))
                for rid, blob in zip(pdf[id_col], pdf[blob_col])
            ]
            yield pd.DataFrame(out, columns=["id", "blob"])

    return df.select(id_col, blob_col).mapInPandas(resize_batches, schema)


def frame_sample_plan(
    df: DataFrame, id_col: str, meta_col: str, every_n_bytes: int = 1024
) -> DataFrame:
    """Video-frame-sampling *plan*: one row per sampled offset (the
    decode itself would consume these offsets in mapInPandas). Pure
    sequence/explode — demonstrates the fan-out shape without codecs."""
    n = F.col(f"{meta_col}.n_bytes")
    offsets = F.sequence(
        F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(every_n_bytes)
    )
    return df.select(
        F.col(id_col), F.explode(offsets).alias("frame_offset")
    )
