"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

All three modalities decode for REAL with stdlib-only parsers (no codec
libraries exist in this container): PNG via ``struct`` + ``zlib`` inflate +
the five PNG row unfilters, WAV via a manual RIFF chunk walk, MP4 via an
ISO-BMFF box walk.  Each kernel's counterpart in the fixture generator
WRITES the format through an independent code path (forward filters vs
inverse filters, stdlib ``wave`` writer vs manual RIFF parse, box builder
vs box walker) and the goldens derive from generator PARAMETERS, never
from parsing — so an oracle match is evidence of a correct codec, not a
shared bug.  Per-row error taxonomies throughout (E6 semantics: errors
recorded in the row, never raised).
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
        T.StructField("pixel_sha256", T.StringType(), False),
        T.StructField("error", T.StringType(), True),
    ]
)


def _fake_decode(payload: bytes | None) -> dict:
    if payload is None or len(payload) == 0:
        return {
            "width": 0, "height": 0, "n_channels": 0,
            "sha256": "", "pixel_sha256": "", "error": "EMPTY_INPUT",
        }
    h = hashlib.sha256(payload).hexdigest()
    # deterministic fake geometry derived from the digest
    return {
        "width": 64 + int(h[:4], 16) % 1984,
        "height": 64 + int(h[4:8], 16) % 1984,
        "n_channels": 1 + int(h[8], 16) % 4,
        "sha256": h,
        "pixel_sha256": "",
        "error": None,
    }


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# PNG color type -> sample channels (3 = palette indices, 1 sample/pixel)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_unfilter(raw: bytes, width: int, height: int, channels: int):
    """Invert the five PNG row filters (None/Sub/Up/Average/Paeth,
    spec §9) over the inflated scanline stream.  Returns
    ``(pixels, n_rows, error)`` — ``pixels`` is the reconstructed
    row-major channel-interleaved byte string for the rows actually
    present (``n_rows < height`` means a truncated stream; the caller
    flags it, mirroring the WAV parser's available-frames semantics)."""
    stride = width * channels
    bpp = channels  # bit depth 8: one byte per sample
    n_rows = min(height, len(raw) // (1 + stride))
    prior = bytearray(stride)
    out = bytearray()
    pos = 0
    for _ in range(n_rows):
        ftype = raw[pos]
        row = bytearray(raw[pos + 1 : pos + 1 + stride])
        pos += 1 + stride
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub: left neighbor (reconstructed)
            for i in range(bpp, stride):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif ftype == 2:  # Up: prior row (reconstructed)
            for i in range(stride):
                row[i] = (row[i] + prior[i]) & 0xFF
        elif ftype == 3:  # Average: floor((left + up) / 2)
            for i in range(stride):
                left = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + ((left + prior[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth predictor over (left, up, up-left)
            for i in range(stride):
                a = row[i - bpp] if i >= bpp else 0
                b = prior[i]
                c = prior[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[i] = (row[i] + pred) & 0xFF
        else:
            # bare code, no detail: goldens are parameter-predicted and
            # must match the kernel's output byte-for-byte
            return None, 0, "DECODE_ERROR"
        out += row
        prior = row
    return bytes(out), n_rows, None


def _png_decode(payload: bytes | None) -> dict:
    """Real PNG parse/decode — pure stdlib ``struct`` + ``zlib``, no codec
    library.  IHDR geometry, IDAT inflate, the five row unfilters, and a
    sha256 over the reconstructed raw pixel bytes (the byte-identity proof
    that the decode is real — geometry alone could be read off the header
    without ever touching the filters).  The fixture generator writes the
    FORWARD filters through an independent code path and the goldens carry
    parameter-derived values (fixtures/generator.py::gen_image_doc).
    Reference analogue: the media-URI ingestion boundary,
    extract-data-from-pdf.ts:116-131.  Per-row error taxonomy:

      EMPTY_INPUT / NOT_PNG / BAD_IHDR — structural failures;
      UNSUPPORTED — IHDR parses (geometry reported) but the layout is a
        codec boundary: bit depth != 8, palette color, interlacing, or a
        nonzero compression/filter method;
      NO_IDAT — chunk walk found no pixel data;
      DECODE_ERROR — zlib inflate failed or a filter byte is invalid;
      TRUNCATED — fewer complete scanlines than IHDR's height:
        pixel_sha256 covers the rows actually reconstructed.
    """
    out, _pixels = _png_decode_full(payload)
    return out


def _png_decode_full(payload: bytes | None) -> tuple[dict, bytes | None]:
    """:func:`_png_decode` plus the reconstructed pixel bytes (None unless
    the unfilter ran), so downstream kernels (NN resize) reuse one decode."""
    import struct
    import zlib

    out = {
        "width": 0, "height": 0, "n_channels": 0,
        "sha256": "", "pixel_sha256": "", "error": None,
    }
    if payload is None or len(payload) == 0:
        out["error"] = "EMPTY_INPUT"
        return out, None
    out["sha256"] = hashlib.sha256(payload).hexdigest()
    if len(payload) < 8 or payload[:8] != _PNG_SIG:
        out["error"] = "NOT_PNG"
        return out, None
    if len(payload) < 8 + 8 + 13 or payload[12:16] != b"IHDR":
        out["error"] = "BAD_IHDR"
        return out, None
    (ihdr_len,) = struct.unpack_from(">I", payload, 8)
    if ihdr_len != 13:
        out["error"] = "BAD_IHDR"
        return out, None
    w, h, depth, ctype, comp, filt, interlace = struct.unpack_from(
        ">IIBBBBB", payload, 16
    )
    if ctype not in _PNG_CHANNELS or w == 0 or h == 0:
        out["error"] = "BAD_IHDR"
        return out, None
    ch = _PNG_CHANNELS[ctype]
    out.update(width=w, height=h, n_channels=ch)
    if depth != 8 or ctype == 3 or comp != 0 or filt != 0 or interlace != 0:
        out["error"] = "UNSUPPORTED"
        return out, None
    # chunk walk: 4-byte BE length, 4-byte type, body, 4-byte CRC (not
    # validated — same stance as the WAV parser toward RIFF padding)
    idat = bytearray()
    pos = 8
    while pos + 8 <= len(payload):
        (ln,) = struct.unpack_from(">I", payload, pos)
        kind = payload[pos + 4 : pos + 8]
        if pos + 8 + ln > len(payload):
            break  # cut mid-chunk: keep only complete chunks
        if kind == b"IDAT":
            idat += payload[pos + 8 : pos + 8 + ln]
        elif kind == b"IEND":
            break
        pos += 8 + ln + 4
    if not idat:
        out["error"] = "NO_IDAT"
        return out, None
    try:
        # BOUNDED inflation: the unfilter consumes at most (1 + w*ch) * h
        # bytes, so anything past that is semantically dead — and a zlib
        # bomb (small IDAT inflating to GBs) must cost an error row, not
        # executor memory.  The hard cap covers any sane 8-bit geometry
        # (256 MB ~ 8k x 8k RGBA); forged headers past it land on the
        # existing truncation semantics.
        needed = min((1 + w * ch) * h, 1 << 28)
        d = zlib.decompressobj()
        raw = d.decompress(bytes(idat), needed)
    except zlib.error:
        out["error"] = "DECODE_ERROR"
        return out, None
    pixels, n_rows, err = _png_unfilter(raw, w, h, ch)
    if err is not None:
        out["error"] = err
        return out, None
    out["pixel_sha256"] = hashlib.sha256(pixels).hexdigest()
    if n_rows < h:
        out["error"] = "TRUNCATED"
    return out, pixels


def decode_images(media: DataFrame, deterministic_fake: bool = False) -> DataFrame:
    """image rows -> decoded metadata via mapInPandas (Arrow batches carry
    the binary payload; no base64, reference S3 eliminated).

    The default decoder is the REAL stdlib PNG parser (:func:`_png_decode`
    — inflate + unfilter + pixel digest, per-row errors, nothing raised);
    ``deterministic_fake=True`` keeps the seeded fake that produces stable
    metadata from the bytes alone, for plumbing tests that want arbitrary
    payloads without constructing valid PNGs.
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("meta", IMAGE_META_TYPE, False),
        ]
    )

    def fn(batches):
        decoder = _fake_decode if deterministic_fake else _png_decode
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


def _riff_fmt_data(payload: bytes):
    """RIFF chunk walk shared by the metadata and feature kernels: returns
    ``(fmt_tuple | None, data_off | None, data_size | None)`` — fmt is the
    unpacked ``<HHIIHH`` header, data the offset/declared-size of the first
    ``data`` chunk (canonical WAV: the payload tail)."""
    import struct

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
            break
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    return fmt, data_off, data_size


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
    out, _off, _ba = _wav_decode_ex(payload)
    return out


def _wav_decode_ex(payload: bytes | None):
    """:func:`_wav_decode` plus ``(data_off, block_align)`` so the feature
    kernel reuses one RIFF walk (the PNG ``_full`` pattern)."""
    out = {
        "n_channels": 0, "sample_rate": 0, "bits_per_sample": 0,
        "n_frames": 0, "duration_s": 0.0, "sha256": "", "error": None,
    }
    if payload is None or len(payload) == 0:
        out["error"] = "EMPTY_INPUT"
        return out, None, 0
    out["sha256"] = hashlib.sha256(payload).hexdigest()
    if len(payload) < 12 or payload[0:4] != b"RIFF" or payload[8:12] != b"WAVE":
        out["error"] = "NOT_RIFF"
        return out, None, 0
    fmt, data_off, data_size = _riff_fmt_data(payload)
    if fmt is None:
        out["error"] = "NO_FMT"
        return out, None, 0
    audio_format, ch, rate, _byte_rate, block_align, bits = fmt
    out.update(n_channels=ch, sample_rate=rate, bits_per_sample=bits)
    if audio_format != 1:  # PCM only; compressed codecs stay a boundary
        out["error"] = "UNSUPPORTED_CODEC"
        return out, None, 0
    if data_off is None:
        out["error"] = "NO_DATA"
        return out, None, 0
    avail = min(data_size, len(payload) - data_off)
    frames = avail // block_align if block_align else 0
    out["n_frames"] = frames
    out["duration_s"] = round(frames / rate, 6) if rate else 0.0
    if avail < data_size:
        out["error"] = "TRUNCATED"
    return out, data_off, block_align


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


AUDIO_FEATURES_TYPE = T.StructType(
    [
        T.StructField("n_frames", T.LongType(), False),
        T.StructField("peak_abs", T.LongType(), False),
        T.StructField("sumsq", T.LongType(), False),
        T.StructField("error", T.StringType(), True),
    ]
)


def _wav_features(payload: bytes | None) -> dict:
    """PCM feature extraction — the frozen spec (the fixture generator
    recomputes it from its in-memory sample buffer through pure-Python
    ``struct.iter_unpack`` loops; this kernel re-derives it from the BYTES
    with numpy — independent code paths, exact-integer outputs):

      centered sample: 8-bit WAV stores UNSIGNED bytes -> s - 128;
        16-bit stores signed little-endian -> s as-is;
      ``peak_abs``  = max |centered| over all channels (0 when no frames);
      ``sumsq``     = sum of centered^2, exact integer (no float RMS —
        engine/summation order cannot perturb it);
      both cover COMPLETE frames only (a truncated trailing frame is
      ignored, matching ``_wav_decode``'s frame accounting).

    Error rows carry the metadata kernel's taxonomy with zero stats.
    The stat spec is defined for canonical 8/16-bit PCM only; other bit
    depths (24/32-bit) and non-canonical block alignment parse fine as
    METADATA but get ``UNSUPPORTED_BITS`` here — interpreting them as
    int16 pairs would emit silently wrong stats, and an E6 kernel never
    raises from inside the batch."""
    import numpy as np

    meta, data_off, block_align = _wav_decode_ex(payload)
    out = {
        "n_frames": meta["n_frames"], "peak_abs": 0, "sumsq": 0,
        "error": meta["error"],
    }
    if meta["error"] not in (None, "TRUNCATED") or meta["n_frames"] == 0:
        return out
    sampwidth = meta["bits_per_sample"] // 8
    if sampwidth not in (1, 2) or block_align != meta["n_channels"] * sampwidth:
        out["error"] = "UNSUPPORTED_BITS"
        return out
    data = payload[data_off : data_off + meta["n_frames"] * block_align]
    if sampwidth == 1:
        centered = np.frombuffer(data, dtype=np.uint8).astype(np.int64) - 128
    else:
        centered = np.frombuffer(data, dtype="<i2").astype(np.int64)
    out["peak_abs"] = int(np.abs(centered).max())
    out["sumsq"] = int((centered * centered).sum())
    return out


def audio_features(media: DataFrame) -> DataFrame:
    """audio rows -> PCM features (peak amplitude, energy) via mapInPandas —
    the feature-extract stage of the multimodal pipeline (decode ->
    features -> filter/sample), with the same per-row error channel as the
    metadata decode."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("feat", AUDIO_FEATURES_TYPE, False),
        ]
    )

    def fn(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "feat": [_wav_features(p) for p in pdf["payload"]],
                }
            )

    return media.filter(F.col("kind") == "audio").mapInPandas(fn, out_schema)


RESIZE_T = 16  # frozen default thumbnail edge for resize_images


def _nn_resize(pixels: bytes, w: int, h: int, ch: int, t: int = RESIZE_T) -> bytes:
    """Nearest-neighbor resize to ``t``x``t`` — the frozen mapping is
    ``src_y = (dst_y * h) // t``, ``src_x = (dst_x * w) // t`` (pure
    integer floor; works as pixel duplication when upscaling).  The
    generator mirrors this spec with per-pixel Python loops over its
    pre-filter buffer; this kernel uses numpy fancy indexing over the
    reconstructed pixels — independent code paths, byte-exact output."""
    import numpy as np

    arr = np.frombuffer(pixels, dtype=np.uint8).reshape(h, w, ch)
    ys = (np.arange(t) * h) // t
    xs = (np.arange(t) * w) // t
    return arr[np.ix_(ys, xs)].tobytes()


def resize_images(media: DataFrame, size: int = RESIZE_T) -> DataFrame:
    """image rows -> fixed-size NN thumbnail digest via mapInPandas: one
    real decode (inflate + unfilter) feeding the resize kernel; rows whose
    decode fails (or is TRUNCATED — a partial source has no well-defined
    thumbnail) carry the decode taxonomy and an empty digest."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("width", T.IntegerType(), False),
            T.StructField("height", T.IntegerType(), False),
            T.StructField("resized_sha256", T.StringType(), False),
            T.StructField("error", T.StringType(), True),
        ]
    )

    def one(payload) -> dict:
        meta, pixels = _png_decode_full(payload)
        row = {
            "width": meta["width"], "height": meta["height"],
            "resized_sha256": "", "error": meta["error"],
        }
        if meta["error"] is None and pixels is not None:
            row["resized_sha256"] = hashlib.sha256(
                _nn_resize(pixels, meta["width"], meta["height"],
                           meta["n_channels"], size)
            ).hexdigest()
        return row

    def fn(batches):
        for pdf in batches:
            rows = [one(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "width": [r["width"] for r in rows],
                    "height": [r["height"] for r in rows],
                    "resized_sha256": [r["resized_sha256"] for r in rows],
                    "error": [r["error"] for r in rows],
                }
            )

    return media.filter(F.col("kind") == "image").mapInPandas(fn, out_schema)


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
    walk; per-frame sampling is ``sample_frames``, which parses the sample
    tables for real)."""
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


def _mp4_sample_table(payload: bytes | None):
    """Parse the first video track's sample table for REAL —
    trak/mdia/{mdhd,hdlr,minf/stbl/{stts,stsc,stsz,stco}} — and return
    ``(timescale, pts_units, offsets, sizes, error)`` where the three
    arrays are numpy int64 per-sample vectors (pts from the stts runs,
    absolute file offsets from the chunk layout).  Vectorized on purpose:
    a 2 h movie carries ~200k samples and this runs per row inside a
    batch UDF, so the expansion is ``np.repeat``/``cumsum``, not a Python
    loop.  Never raises; error taxonomy: EMPTY_INPUT / NOT_MP4 / NO_MOOV /
    NO_TRAK (moov carries no trak box) / NO_SAMPLE_TABLE (no vide track
    with a complete mdhd+stbl) / BAD_SAMPLE_TABLE (tables present but
    inconsistent: count mismatches, non-monotonic stsc, zero timescale,
    or frame ranges outside the payload)."""
    import struct

    import numpy as np

    none = (0, None, None, None)
    if payload is None or len(payload) == 0:
        return (*none, "EMPTY_INPUT")
    top = list(_mp4_boxes(payload, 0, len(payload)))
    if not top or top[0][0] != b"ftyp":
        return (*none, "NOT_MP4")
    moov = next(((s, e) for t, s, e in top if t == b"moov"), None)
    if moov is None:
        return (*none, "NO_MOOV")
    traks = [(s, e) for t, s, e in _mp4_boxes(payload, moov[0], moov[1]) if t == b"trak"]
    if not traks:
        return (*none, "NO_TRAK")

    def u32s(s: int, e: int, skip: int, count: int):
        """count big-endian u32 words at body offset `skip`, or None if
        the box is too short."""
        if e - (s + skip) < 4 * count:
            return None
        return np.frombuffer(payload, dtype=">u4", offset=s + skip, count=count)

    for ts_, te in traks:
        mdia = next(
            ((s, e) for t, s, e in _mp4_boxes(payload, ts_, te) if t == b"mdia"), None
        )
        if mdia is None:
            continue
        sub = {}
        for t, s, e in _mp4_boxes(payload, mdia[0], mdia[1]):
            sub.setdefault(t, (s, e))
        hdlr = sub.get(b"hdlr")
        if hdlr is None or payload[hdlr[0] + 8 : hdlr[0] + 12] != b"vide":
            continue
        mdhd, minf = sub.get(b"mdhd"), sub.get(b"minf")
        if mdhd is None or minf is None:
            continue
        s, e = mdhd
        if e - s < 4 or payload[s] > 1:
            continue
        if payload[s]:  # mdhd v1: 64-bit times, timescale at +20
            if e - s < 24:
                continue
            (timescale,) = struct.unpack_from(">I", payload, s + 20)
        else:
            if e - s < 16:
                continue
            (timescale,) = struct.unpack_from(">I", payload, s + 12)
        stbl = next(
            ((s2, e2) for t, s2, e2 in _mp4_boxes(payload, minf[0], minf[1]) if t == b"stbl"),
            None,
        )
        if stbl is None:
            continue
        tables = {}
        for t, s2, e2 in _mp4_boxes(payload, stbl[0], stbl[1]):
            tables.setdefault(t, (s2, e2))
        if not all(t in tables for t in (b"stts", b"stsc", b"stsz", b"stco")):
            return (*none, "NO_SAMPLE_TABLE")
        bad = (*none, "BAD_SAMPLE_TABLE")
        if timescale == 0:
            return bad
        # stts: runs of (count, delta) -> per-sample pts
        s2, e2 = tables[b"stts"]
        head = u32s(s2, e2, 4, 1)
        if head is None:
            return bad
        runs = u32s(s2, e2, 8, int(head[0]) * 2)
        if runs is None:
            return bad
        counts, deltas = runs[0::2].astype(np.int64), runs[1::2].astype(np.int64)
        n_stts = int(counts.sum())
        # stsz: uniform size or per-sample table
        s2, e2 = tables[b"stsz"]
        head = u32s(s2, e2, 4, 2)
        if head is None:
            return bad
        uniform, n = int(head[0]), int(head[1])
        if n != n_stts or n == 0:
            return bad
        if uniform:
            # a forged count can't exceed what the file could hold — guard
            # BEFORE allocating n-sized arrays
            if uniform * n > len(payload):
                return bad
            sizes = np.full(n, uniform, dtype=np.int64)
        else:
            sz = u32s(s2, e2, 12, n)
            if sz is None:
                return bad
            sizes = sz.astype(np.int64)
        # stco: chunk file offsets
        s2, e2 = tables[b"stco"]
        head = u32s(s2, e2, 4, 1)
        if head is None:
            return bad
        stco = u32s(s2, e2, 8, int(head[0]))
        if stco is None or len(stco) == 0:
            return bad
        chunk_off = stco.astype(np.int64)
        # stsc: (first_chunk, samples_per_chunk) runs -> per-chunk counts
        s2, e2 = tables[b"stsc"]
        head = u32s(s2, e2, 4, 1)
        if head is None:
            return bad
        ents = u32s(s2, e2, 8, int(head[0]) * 3)
        if ents is None or len(ents) == 0:
            return bad
        first = ents[0::3].astype(np.int64)
        spc = ents[1::3].astype(np.int64)
        n_chunks = len(chunk_off)
        if first[0] != 1 or np.any(np.diff(first) <= 0) or first[-1] > n_chunks:
            return bad
        run_len = np.diff(np.append(first, n_chunks + 1))
        per_chunk = np.repeat(spc, run_len)
        if int(per_chunk.sum()) != n or np.any(per_chunk <= 0):
            return bad
        # per-sample offsets: chunk base + within-chunk prefix of sizes
        chunk_of_sample = np.repeat(np.arange(n_chunks), per_chunk)
        pre = np.concatenate(([0], np.cumsum(sizes)[:-1]))
        chunk_first_sample = np.concatenate(([0], np.cumsum(per_chunk)[:-1]))
        offsets = chunk_off[chunk_of_sample] + (pre - pre[chunk_first_sample][chunk_of_sample])
        if np.any(offsets < 0) or np.any(offsets + sizes > len(payload)):
            return bad
        pts = np.concatenate(([0], np.cumsum(np.repeat(deltas, counts))[:-1]))
        return int(timescale), pts, offsets, sizes, None
    return (*none, "NO_SAMPLE_TABLE")


FRAME_SAMPLE_TYPE = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.LongType(), False),
        T.StructField("pts_units", T.LongType(), False),
        T.StructField("pts_s", T.DoubleType(), False),
        T.StructField("byte_offset", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("frame_sha256", T.StringType(), False),
        T.StructField("error", T.StringType(), True),
    ]
)


def sample_frames(
    media: DataFrame, every_n: int = 30, hash_frames: bool = True
) -> DataFrame:
    """REAL video frame sampling: parse the MP4 sample table
    (stts/stsc/stsz/stco via ``_mp4_sample_table``), take every
    ``every_n``-th frame, and emit its true presentation timestamp, byte
    range, and a sha256 of the frame BYTES sliced from mdat — the shape a
    training pipeline feeds a downstream decoder (pixel decode of the
    codec bitstream itself is out of scope without a codec library; the
    container-level sampling, the expensive part at scale, is real).
    E6 semantics: unparseable videos yield one sentinel row
    (frame_idx -1) carrying the error code, never an exception.
    ``hash_frames=False`` skips the per-frame digest (frame_sha256 = "")
    for consumers that only need the index/range plan — Catalyst cannot
    prune work out of an opaque mapInPandas, so the skip must be explicit."""

    def fn(batches):
        for pdf in batches:
            out = {k.name: [] for k in FRAME_SAMPLE_TYPE.fields}
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                ts, pts, offs, sizes, err = _mp4_sample_table(p)
                if err is not None:
                    row = (int(mid), -1, 0, 0.0, -1, -1, "", err)
                else:
                    row = None
                    for idx in range(0, len(sizes), every_n):
                        o, sz = int(offs[idx]), int(sizes[idx])
                        out["media_id"].append(int(mid))
                        out["frame_idx"].append(idx)
                        out["pts_units"].append(int(pts[idx]))
                        out["pts_s"].append(round(int(pts[idx]) / ts, 6))
                        out["byte_offset"].append(o)
                        out["n_bytes"].append(sz)
                        out["frame_sha256"].append(
                            hashlib.sha256(p[o : o + sz]).hexdigest()
                            if hash_frames
                            else ""
                        )
                        out["error"].append(None)
                if row is not None:
                    for k, v in zip(out, row):
                        out[k].append(v)
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "video").mapInPandas(fn, FRAME_SAMPLE_TYPE)


def frame_sample_plan(media: DataFrame, every_n: int = 30) -> DataFrame:
    """(media_id, frame_idx) projection of ``sample_frames`` — frame
    indexes come from the REAL parsed sample-table frame count, and
    unparseable videos are excluded rather than emitting sentinel rows.
    Skips the per-frame digest (hash_frames=False): the projection only
    needs the table walk."""
    return (
        sample_frames(media, every_n=every_n, hash_frames=False)
        .filter(F.col("error").isNull())
        .select("media_id", "frame_idx")
    )


def _mp4_visual_entry(payload: bytes):
    """First video track's stsd VisualSampleEntry -> (fourcc, width,
    height, depth, error).  Parses the 78-byte spec layout (ISO-BMFF
    12.1.3: reserved(6), data_ref_index(2), pre_defined/reserved(16),
    width(2), height(2), resolutions(8), reserved(4), frame_count(2),
    compressorname(32), depth(2), pre_defined(2)); the fixture generator
    WRITES the same layout through its own builder
    (fixtures/generator._visual_sample_entry) — independent code paths.
    Callers gate on the sample-table walk first, so this only reports
    NO_SAMPLE_TABLE when stsd itself is absent/short."""
    import struct

    none = ("", 0, 0, 0)
    top = list(_mp4_boxes(payload, 0, len(payload)))
    moov = next(((s, e) for t, s, e in top if t == b"moov"), None)
    if moov is None:
        return (*none, "NO_MOOV")
    for t, ts_, te in _mp4_boxes(payload, moov[0], moov[1]):
        if t != b"trak":
            continue
        mdia = next(
            ((s, e) for t2, s, e in _mp4_boxes(payload, ts_, te) if t2 == b"mdia"),
            None,
        )
        if mdia is None:
            continue
        sub = {}
        for t2, s, e in _mp4_boxes(payload, mdia[0], mdia[1]):
            sub.setdefault(t2, (s, e))
        hdlr = sub.get(b"hdlr")
        if hdlr is None or payload[hdlr[0] + 8 : hdlr[0] + 12] != b"vide":
            continue
        minf = sub.get(b"minf")
        if minf is None:
            continue
        stbl = next(
            ((s, e) for t2, s, e in _mp4_boxes(payload, minf[0], minf[1]) if t2 == b"stbl"),
            None,
        )
        if stbl is None:
            continue
        stsd = next(
            ((s, e) for t2, s, e in _mp4_boxes(payload, stbl[0], stbl[1]) if t2 == b"stsd"),
            None,
        )
        if stsd is None:
            return (*none, "NO_SAMPLE_TABLE")
        s, e = stsd
        if e - s < 16:  # ver/flags + count + first entry header
            return (*none, "NO_SAMPLE_TABLE")
        entry = next(iter(_mp4_boxes(payload, s + 8, e)), None)
        if entry is None:
            return (*none, "NO_SAMPLE_TABLE")
        fourcc_b, es, ee = entry
        fourcc = fourcc_b.decode("ascii", "replace")
        if ee - es < 78:
            # a stub codec entry (e.g. bare mp4v): geometry unknown — the
            # caller maps non-'raw ' fourccs to UNSUPPORTED_CODEC anyway
            return (fourcc, 0, 0, 0, None)
        w, h = struct.unpack_from(">HH", payload, es + 24)
        (depth,) = struct.unpack_from(">H", payload, es + 74)
        return (fourcc, int(w), int(h), int(depth), None)
    return (*none, "NO_TRAK")


FRAME_PIXELS_TYPE = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("pixel_sha256", T.StringType(), False),
        T.StructField("mean_r", T.LongType(), False),
        T.StructField("mean_g", T.LongType(), False),
        T.StructField("mean_b", T.LongType(), False),
        T.StructField("error", T.StringType(), True),
    ]
)


def sample_frame_pixels(media: DataFrame, every_n: int = 30) -> DataFrame:
    """REAL pixel decode for codec-free video tracks: sample every
    ``every_n``-th frame via the parsed sample table, read the stsd
    VisualSampleEntry, and for fourcc ``'raw '`` interpret the frame bytes
    as width*height RGB24 interleaved pixels — per-frame pixel sha256 plus
    integer channel means (floor), proving the bytes were decoded as
    pixels, not just hashed.  This shrinks the declared codec boundary to
    genuinely-compressed bitstreams: any other fourcc yields one sentinel
    row ``UNSUPPORTED_CODEC`` (decoding H.264 et al. without codec
    libraries stays out of scope); a raw frame whose size disagrees with
    the stsd geometry yields ``BAD_FRAME_SIZE`` for that frame.  E6
    semantics throughout — errors ride rows, never exceptions."""
    import numpy as np

    def fn(batches):
        for pdf in batches:
            out = {k.name: [] for k in FRAME_PIXELS_TYPE.fields}

            def sentinel(mid, err):
                for k, v in zip(
                    out, (int(mid), -1, 0, 0, "", 0, 0, 0, err)
                ):
                    out[k].append(v)

            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                ts, pts, offs, sizes, err = _mp4_sample_table(p)
                if err is not None:
                    sentinel(mid, err)
                    continue
                fourcc, w, h, depth, verr = _mp4_visual_entry(p)
                if verr is not None:
                    sentinel(mid, verr)
                    continue
                if fourcc != "raw " or w <= 0 or h <= 0:
                    sentinel(mid, "UNSUPPORTED_CODEC")
                    continue
                npx = w * h
                for idx in range(0, len(sizes), every_n):
                    o, sz = int(offs[idx]), int(sizes[idx])
                    fb = p[o : o + sz]
                    if sz != npx * 3:
                        for k, v in zip(
                            out,
                            (int(mid), idx, w, h, "", 0, 0, 0, "BAD_FRAME_SIZE"),
                        ):
                            out[k].append(v)
                        continue
                    arr = np.frombuffer(fb, dtype=np.uint8).reshape(npx, 3)
                    sums = arr.sum(axis=0, dtype=np.int64)
                    row = (
                        int(mid),
                        idx,
                        w,
                        h,
                        hashlib.sha256(fb).hexdigest(),
                        int(sums[0]) // npx,
                        int(sums[1]) // npx,
                        int(sums[2]) // npx,
                        None,
                    )
                    for k, v in zip(out, row):
                        out[k].append(v)
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "video").mapInPandas(fn, FRAME_PIXELS_TYPE)
