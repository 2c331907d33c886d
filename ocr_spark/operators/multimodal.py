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


AUDIO_META_TYPE = T.StructType(
    [
        T.StructField("n_channels", T.IntegerType(), False),
        T.StructField("sample_rate", T.IntegerType(), False),
        T.StructField("bits_per_sample", T.IntegerType(), False),
        T.StructField("n_frames", T.LongType(), False),
        T.StructField("duration_s", T.DoubleType(), False),
        T.StructField("sha256", T.StringType(), False),
        T.StructField("error", T.StringType(), True),
    ]
)


def _wav_decode(payload: bytes | None) -> dict:
    """RIFF/WAVE header parse — pure stdlib ``struct``, no codec library:
    channels, sample rate, bit depth, frame count, duration.  The REAL
    in-container modality (the fixture generator writes its WAVs with the
    independent stdlib ``wave`` writer).  Per-row error taxonomy, E6
    semantics (errors recorded, never raised — the reference captures media
    failures per document the same way, extract-data-from-pdf.ts:134-145):

      EMPTY_INPUT / NOT_RIFF / NO_FMT / NO_DATA — structural failures;
      UNSUPPORTED_CODEC — fmt present but not PCM (format code != 1): the
        compressed-codec boundary (channels/rate/bits still reported);
      TRUNCATED — data chunk shorter than declared: frames reflect the
        bytes actually present.
    """
    import struct

    out = {
        "n_channels": 0, "sample_rate": 0, "bits_per_sample": 0,
        "n_frames": 0, "duration_s": 0.0, "sha256": "", "error": None,
    }
    if payload is None or len(payload) == 0:
        out["error"] = "EMPTY_INPUT"
        return out
    out["sha256"] = hashlib.sha256(payload).hexdigest()
    if len(payload) < 12 or payload[0:4] != b"RIFF" or payload[8:12] != b"WAVE":
        out["error"] = "NOT_RIFF"
        return out
    fmt = None
    data_off = data_size = None
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        if cid == b"fmt " and size >= 16 and pos + 8 + 16 <= len(payload):
            fmt = struct.unpack_from("<HHIIHH", payload, pos + 8)
        elif cid == b"data":
            data_off, data_size = pos + 8, size
            break  # canonical WAV: data is the payload tail
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None:
        out["error"] = "NO_FMT"
        return out
    audio_format, ch, rate, _byte_rate, block_align, bits = fmt
    out.update(n_channels=ch, sample_rate=rate, bits_per_sample=bits)
    if audio_format != 1:  # PCM only; compressed codecs stay a boundary
        out["error"] = "UNSUPPORTED_CODEC"
        return out
    if data_off is None:
        out["error"] = "NO_DATA"
        return out
    avail = min(data_size, len(payload) - data_off)
    frames = avail // block_align if block_align else 0
    out["n_frames"] = frames
    out["duration_s"] = round(frames / rate, 6) if rate else 0.0
    if avail < data_size:
        out["error"] = "TRUNCATED"
    return out


def decode_audio(media: DataFrame) -> DataFrame:
    """audio rows -> decoded metadata via mapInPandas (binary payload over
    Arrow; same plumbing shape as ``decode_images``, but the decoder is a
    real stdlib RIFF parse — no optional dependency, no stub)."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("meta", AUDIO_META_TYPE, False),
        ]
    )

    def fn(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "meta": [_wav_decode(p) for p in pdf["payload"]],
                }
            )

    return media.filter(F.col("kind") == "audio").mapInPandas(fn, out_schema)


VIDEO_META_TYPE = T.StructType(
    [
        T.StructField("major_brand", T.StringType(), False),
        T.StructField("timescale", T.LongType(), False),
        T.StructField("duration_units", T.LongType(), False),
        T.StructField("duration_s", T.DoubleType(), False),
        T.StructField("sha256", T.StringType(), False),
        T.StructField("error", T.StringType(), True),
    ]
)


def _mp4_boxes(payload: bytes, start: int, end: int):
    """Yield (type, body_start, body_end) for ISO-BMFF boxes in
    payload[start:end]; handles 64-bit largesize (size==1) and
    to-end-of-file (size==0) boxes; stops at the first malformed header."""
    import struct

    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", payload, pos)
        btype = payload[pos + 4 : pos + 8]
        header = 8
        if size == 1:
            if pos + 16 > end:
                return
            (size,) = struct.unpack_from(">Q", payload, pos + 8)
            header = 16
        elif size == 0:
            size = end - pos
        if size < header:
            return
        yield btype, pos + header, min(pos + size, end)
        pos += size


def _mp4_decode(payload: bytes | None) -> dict:
    """ISO-BMFF (MP4) metadata probe — pure stdlib box-tree walk, no codec
    library: major brand from ``ftyp``, timescale/duration from
    ``moov/mvhd`` (versions 0 and 1).  The real video counterpart of
    ``_wav_decode``: frame DECODING stays a codec boundary, the container
    metadata a training pipeline partitions/samples on is parsed for real.
    E6 per-row errors, never raises: EMPTY_INPUT / NOT_MP4 (first box not
    ftyp) / NO_MOOV / NO_MVHD / UNSUPPORTED_VERSION (mvhd version > 1) /
    TRUNCATED (mvhd fields cut short)."""
    import struct

    out = {
        "major_brand": "", "timescale": 0, "duration_units": 0,
        "duration_s": 0.0, "sha256": "", "error": None,
    }
    if payload is None or len(payload) == 0:
        out["error"] = "EMPTY_INPUT"
        return out
    out["sha256"] = hashlib.sha256(payload).hexdigest()
    top = list(_mp4_boxes(payload, 0, len(payload)))
    if not top or top[0][0] != b"ftyp":
        out["error"] = "NOT_MP4"
        return out
    fb, fs, fe = top[0]
    if fe - fs >= 4:
        out["major_brand"] = payload[fs : fs + 4].decode("ascii", "replace")
    moov = next(((s, e) for t, s, e in top if t == b"moov"), None)
    if moov is None:
        out["error"] = "NO_MOOV"
        return out
    mvhd = next(
        ((s, e) for t, s, e in _mp4_boxes(payload, moov[0], moov[1]) if t == b"mvhd"),
        None,
    )
    if mvhd is None:
        out["error"] = "NO_MVHD"
        return out
    s, e = mvhd
    avail = min(e, len(payload))
    if avail - s < 1:
        out["error"] = "TRUNCATED"
        return out
    version = payload[s]
    if version > 1:  # only mvhd v0/v1 exist; parsing v1 offsets from an
        out["error"] = "UNSUPPORTED_VERSION"  # unknown layout would emit garbage
        return out
    need = 4 + (28 if version else 16)  # ver/flags + times + timescale + duration
    if avail - s < need:
        out["error"] = "TRUNCATED"
        return out
    if version:
        timescale, duration = struct.unpack_from(">IQ", payload, s + 20)
    else:
        timescale, duration = struct.unpack_from(">II", payload, s + 12)
    out["timescale"] = int(timescale)
    out["duration_units"] = int(duration)
    out["duration_s"] = round(duration / timescale, 6) if timescale else 0.0
    return out


def decode_videos(media: DataFrame) -> DataFrame:
    """video rows -> container metadata via mapInPandas (real ISO-BMFF
    walk; frame decode remains the codec boundary exercised by
    ``frame_sample_plan``)."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("meta", VIDEO_META_TYPE, False),
        ]
    )

    def fn(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "meta": [_mp4_decode(p) for p in pdf["payload"]],
                }
            )

    return media.filter(F.col("kind") == "video").mapInPandas(fn, out_schema)


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
