"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schema, partitioning, Arrow batch shape, UDF
signatures) is real and tested; the actual codec work is stubbed — the
image/audio libraries are not in this container, so ``decode_image_udf``
raises ``NotImplementedError`` unless ``deterministic_fake=True``, in which
case a seeded fake decoder produces stable metadata from the bytes alone
(so the distributed path is exercised end-to-end).
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("content_type", T.StringType(), True),
    ]
)

IMAGE_META_TYPE = T.StructType(
    [
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("n_channels", T.IntegerType(), False),
        T.StructField("sha256", T.StringType(), False),
        T.StructField("error", T.StringType(), True),
    ]
)


def _fake_decode(payload: bytes | None) -> dict:
    if payload is None or len(payload) == 0:
        return {"width": 0, "height": 0, "n_channels": 0, "sha256": "", "error": "EMPTY_INPUT"}
    h = hashlib.sha256(payload).hexdigest()
    # deterministic fake geometry derived from the digest
    return {
        "width": 64 + int(h[:4], 16) % 1984,
        "height": 64 + int(h[4:8], 16) % 1984,
        "n_channels": 1 + int(h[8], 16) % 4,
        "sha256": h,
        "error": None,
    }


def _pil_decode(payload: bytes | None) -> dict:
    """Real decode via PIL when the library is importable (per-row errors
    captured in the struct, never raised — E6 semantics)."""
    import io

    from PIL import Image

    if payload is None or len(payload) == 0:
        return {"width": 0, "height": 0, "n_channels": 0, "sha256": "", "error": "EMPTY_INPUT"}
    h = hashlib.sha256(payload).hexdigest()
    try:
        with Image.open(io.BytesIO(payload)) as img:
            return {
                "width": int(img.width),
                "height": int(img.height),
                "n_channels": len(img.getbands()),
                "sha256": h,
                "error": None,
            }
    except Exception as e:  # noqa: BLE001 — per-row error channel
        return {
            "width": 0,
            "height": 0,
            "n_channels": 0,
            "sha256": h,
            "error": f"DECODE_ERROR: {type(e).__name__}",
        }


def _have_pil() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def decode_images(
    media: DataFrame, deterministic_fake: bool = False, batch_schema: str | None = None
) -> DataFrame:
    """image rows -> decoded metadata via mapInPandas (Arrow batches carry
    the binary payload; no base64, reference S3 eliminated).

    Decoder resolution: ``deterministic_fake=True`` always uses the seeded
    fake; otherwise PIL is used when importable (optional dependency —
    try-imported on the EXECUTOR, where decoding runs), and when it is
    genuinely absent the stage raises NotImplementedError at execution
    time, documenting exactly where the codec plugs in.
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("meta", IMAGE_META_TYPE, False),
        ]
    )

    def fn(batches):
        decoder = _fake_decode
        if not deterministic_fake:
            if not _have_pil():
                raise NotImplementedError(
                    "image decoding requires PIL/libvips — not in this "
                    "container; pass deterministic_fake=True to exercise "
                    "the pipeline"
                )
            decoder = _pil_decode
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "meta": [decoder(p) for p in pdf["payload"]],
                }
            )

    return media.filter(F.col("kind") == "image").mapInPandas(fn, out_schema)


def frame_sample_plan(media: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling *plan*: explodes frame indexes JVM-side from
    (stubbed) duration metadata; the decode itself is the same
    NotImplementedError boundary as images."""
    return (
        media.filter(F.col("kind") == "video")
        .withColumn("n_frames", (F.length("payload") / 1024).cast("int"))
        .withColumn(
            "frame_idx",
            F.explode(F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n))),
        )
        .select("media_id", "frame_idx")
    )
