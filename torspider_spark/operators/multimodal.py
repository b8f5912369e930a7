"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as `binary` columns with a typed metadata struct —
the Spark-side machinery (schema, batch iteration via mapInPandas, Arrow
batch shapes, partition sizing) is real and tested, and as of round 4 so
are the codecs themselves wherever the stdlib suffices: dimensions from
real container headers (``header_dims``), pixels + perceptual hash for
PNG (weblib.pngcodec), GIF (weblib.gifcodec) and baseline JPEG
(weblib.jpegcodec), frame sampling for animated GIF, box-average
thumbnails (``image_thumbnails``), and WAV audio features
(weblib.wavcodec). Only formats that genuinely need a codec library —
progressive/arithmetic JPEG, lossy audio, true video containers — keep
deterministic fakes (flagged where applicable), and the library-backed
path raises NotImplementedError behind an import-try (no imaging/audio
libraries in this container).

At 100 TB the pattern matters more than the codec: payloads never pass
through Python row-at-a-time — mapInPandas streams Arrow batches whose size
is bounded by maxRecordsPerBatch * payload size, and feature extraction
projects payloads away as early as possible so downstream stages shuffle
only small feature columns.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),    # image|audio|video
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("mime", T.StringType(), True),
    T.StructField("source_url", T.StringType(), True),
])

IMAGE_FEATURES = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("n_bytes", T.LongType(), True),
    T.StructField("phash64", T.LongType(), True),
])

FRAME_SAMPLES = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("frame_idx", T.IntegerType(), False),
    T.StructField("frame_phash64", T.LongType(), True),
])

AUDIO_FEATURES = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("sample_rate", T.IntegerType(), True),
    T.StructField("channels", T.IntegerType(), True),
    T.StructField("duration_ms", T.LongType(), True),
    T.StructField("rms", T.DoubleType(), True),
    T.StructField("zero_crossings", T.LongType(), True),
    T.StructField("audio_hash64", T.LongType(), True),
    T.StructField("decoded", T.BooleanType(), False),
])

THUMBNAILS = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("thumb_w", T.IntegerType(), False),
    T.StructField("thumb_h", T.IntegerType(), False),
    T.StructField("thumb", T.BinaryType(), True),   # grayscale, row-major
])


def _have_pillow() -> bool:
    try:
        import PIL  # noqa: F401
        return True
    except ImportError:
        return False


def _fake_dims(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for payloads with no parseable header."""
    digest = hashlib.sha256(payload).digest()
    return 64 + digest[0] % 1920, 64 + digest[1] % 1080


def header_dims(payload: bytes) -> tuple[int, int] | None:
    """Real image dimensions from the container header, pure stdlib.

    PNG: IHDR is the first chunk after the 8-byte signature — width and
    height are the two big-endian u32s at offsets 16 and 20. GIF: the
    logical screen descriptor holds little-endian u16 width/height at
    offsets 6 and 8. JPEG: walk the marker stream to the first SOF frame
    header (0xC0-0xCF excluding DHT/JPG/DAC), whose payload is
    [precision u8][height u16][width u16] big-endian. Returns None when no
    magic matches or the header is truncated/corrupt — callers fall back
    to the deterministic fake (the perceptual-hash path stays stubbed; see
    decode_image_features)."""
    try:
        if payload.startswith(b"\x89PNG\r\n\x1a\n"):
            if len(payload) < 24 or payload[12:16] != b"IHDR":
                return None
            w = int.from_bytes(payload[16:20], "big")
            h = int.from_bytes(payload[20:24], "big")
            return (w, h) if w and h else None
        if payload[:6] in (b"GIF87a", b"GIF89a"):
            if len(payload) < 10:
                return None
            w = int.from_bytes(payload[6:8], "little")
            h = int.from_bytes(payload[8:10], "little")
            return (w, h) if w and h else None
        if payload.startswith(b"\xff\xd8"):
            pos = 2
            while pos + 9 <= len(payload):
                if payload[pos] != 0xFF:
                    return None
                marker = payload[pos + 1]
                if marker == 0xFF:      # fill byte
                    pos += 1
                    continue
                if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                    pos += 2            # standalone marker, no length
                    continue
                seg_len = int.from_bytes(payload[pos + 2:pos + 4], "big")
                if seg_len < 2:
                    return None
                if 0xC0 <= marker <= 0xCF and marker not in (
                        0xC4, 0xC8, 0xCC):
                    h = int.from_bytes(payload[pos + 5:pos + 7], "big")
                    w = int.from_bytes(payload[pos + 7:pos + 9], "big")
                    return (w, h) if w and h else None
                pos += 2 + seg_len
            return None
    except Exception:
        return None
    return None


def _fake_phash(payload: bytes) -> int:
    digest = hashlib.sha256(payload).digest()
    return int.from_bytes(digest[8:16], "big", signed=True)


def _phash64(payload: bytes) -> int:
    """Perceptual hash: REAL 8x8 average-hash for decodable PNGs
    (weblib.pngcodec — zlib inflate + numpy-vectorized unfilter) and
    GIFs (weblib.gifcodec — LZW + palette + interlace, first
    frame), so same-pixels payloads hash identically across encoders and
    near-identical images land within a small Hamming distance.
    Baseline JPEG decodes too (weblib.jpegcodec — huffman + dequant +
    IDCT + chroma upsampling; aHash tolerates JPEG's lossiness by
    design, so the hash is stable across qualities). Only non-baseline
    JPEG (progressive/arithmetic) and video remain a deterministic
    byte-hash fake — no imaging library in this container; see
    decode_image_features(use_real_codec) for the integration point."""
    from torspider_spark.weblib.gifcodec import gif_average_hash
    from torspider_spark.weblib.jpegcodec import jpeg_average_hash
    from torspider_spark.weblib.pngcodec import png_average_hash

    if payload.startswith(b"\x89PNG"):
        real = png_average_hash(payload)
    elif payload[:6] in (b"GIF87a", b"GIF89a"):
        real = gif_average_hash(payload)
    elif payload.startswith(b"\xff\xd8"):
        real = jpeg_average_hash(payload)
    else:
        real = None
    return real if real is not None else _fake_phash(payload)


def decode_image_features(media: DataFrame,
                          use_real_codec: bool = False) -> DataFrame:
    """payload -> (width, height, n_bytes, phash64) via Arrow batches.

    use_real_codec=True requires an imaging library (not in this
    container) — NotImplementedError marks the integration point.
    """
    if use_real_codec and not _have_pillow():
        raise NotImplementedError(
            "library-backed decode for ALL formats needs an imaging "
            "library (e.g. Pillow), not present in this environment; the "
            "default path already decodes PNG, GIF and baseline JPEG for "
            "real (weblib.pngcodec/gifcodec/jpegcodec) and falls back to "
            "a deterministic fake only for progressive/arithmetic JPEG "
            "and true video containers")

    def batches(iterator):
        for pdf in iterator:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    rows.append((media_id, None, None, None, None))
                    continue
                payload = bytes(payload)
                # Real header parse for PNG/GIF/JPEG magics; the
                # deterministic fake only covers headerless payloads (and
                # the perceptual hash, which needs pixel decode).
                dims = header_dims(payload)
                w, h = dims if dims is not None else _fake_dims(payload)
                rows.append((media_id, w, h, len(payload),
                             _phash64(payload)))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "n_bytes",
                               "phash64"])

    # Project the payload away as part of this one pass — nothing heavy
    # survives into downstream shuffles.
    return media.select("media_id", "payload").mapInPandas(
        batches, schema=IMAGE_FEATURES)


def decode_audio_features(media: DataFrame) -> DataFrame:
    """Audio features — REAL for RIFF/WAVE integer PCM (round 4:
    weblib.wavcodec — 8/16/24/32-bit, any channel count, mono-mixed):
    sample rate, duration, RMS, zero crossings and a 64-window
    loudness-contour hash (the audio aHash analogue). Lossy containers
    (mp3/aac/ogg — env-blocked, no codec library) get deterministic
    fake values with decoded=false so pipelines can filter; same
    payload-projected-away Arrow batch shape as the image pass."""

    def batches(iterator):
        from torspider_spark.weblib.wavcodec import wav_features

        for pdf in iterator:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    rows.append((media_id, None, None, None, None, None,
                                 None, False))
                    continue
                payload = bytes(payload)
                feats = wav_features(payload) \
                    if payload[:4] == b"RIFF" else None
                if feats is not None:
                    rows.append((media_id, feats["sample_rate"],
                                 feats["channels"], feats["duration_ms"],
                                 feats["rms"], feats["zero_crossings"],
                                 feats["audio_hash64"], True))
                else:
                    digest = hashlib.sha256(payload).digest()
                    rows.append((media_id,
                                 8000 + digest[2] % 40000,
                                 1 + digest[3] % 2,
                                 len(payload) // 16,
                                 (digest[4] % 100) / 100.0,
                                 int.from_bytes(digest[5:8], "big"),
                                 _fake_phash(payload), False))
            yield pd.DataFrame(
                rows, columns=["media_id", "sample_rate", "channels",
                               "duration_ms", "rms", "zero_crossings",
                               "audio_hash64", "decoded"])

    return media.select("media_id", "payload").mapInPandas(
        batches, schema=AUDIO_FEATURES)


def _decode_pixels(payload: bytes):
    """Shared pixel-decode dispatch: (w, h, channels, pixels) for
    PNG / GIF (first frame) / baseline JPEG, else None."""
    from torspider_spark.weblib.gifcodec import decode_gif
    from torspider_spark.weblib.jpegcodec import decode_jpeg
    from torspider_spark.weblib.pngcodec import decode_png

    if payload.startswith(b"\x89PNG"):
        return decode_png(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif(payload)
    if payload.startswith(b"\xff\xd8"):
        return decode_jpeg(payload)
    return None


def image_thumbnails(media: DataFrame, thumb_w: int = 16,
                     thumb_h: int = 16) -> DataFrame:
    """REAL resize (round 4): (thumb_w x thumb_h) grayscale thumbnails
    via box-average over the decoded luma plane, for every payload the
    built-in codecs can decode (PNG / GIF / baseline JPEG); NULL
    thumb otherwise — downstream training pipelines filter on it. Same
    Arrow-batch shape as the feature pass: payloads projected away in
    this one mapInPandas, only (B + 16) bytes per row survive."""

    def batches(iterator):
        from torspider_spark.weblib.pngcodec import box_resize_luma

        for pdf in iterator:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                thumb = None
                if payload is not None:
                    decoded = _decode_pixels(bytes(payload))
                    if decoded is not None:
                        thumb = box_resize_luma(*decoded, thumb_w, thumb_h)
                rows.append((media_id, thumb_w, thumb_h, thumb))
            yield pd.DataFrame(
                rows, columns=["media_id", "thumb_w", "thumb_h", "thumb"])

    return media.select("media_id", "payload").mapInPandas(
        batches, schema=THUMBNAILS)


def sample_video_frames(media: DataFrame, every_n: int = 10,
                        max_frames: int = 8) -> DataFrame:
    """Frame sampling: emits (media_id, frame_idx, frame_phash64) rows —
    a 1:N mapInPandas expansion. REAL for animated GIF (round 4: the one
    video-ish container decodable without codec libraries — weblib.gifcodec
    composes each frame onto the canvas honoring offsets, transparency
    and disposal, and every ``every_n``-th composed frame is
    average-hashed); other containers (mp4/webm — env-blocked, no codec
    library) keep the deterministic fake so the plumbing stays
    exercised end-to-end."""

    def batches(iterator):
        from torspider_spark.weblib.gifcodec import decode_gif_frames
        from torspider_spark.weblib.pngcodec import average_hash64

        for pdf in iterator:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                payload = bytes(payload)
                frames = (decode_gif_frames(
                    payload, max_frames=every_n * (max_frames - 1) + 1)
                    if payload[:6] in (b"GIF87a", b"GIF89a") else None)
                if frames is not None:
                    emitted = 0
                    for idx in range(0, len(frames), every_n):
                        rows.append((media_id, idx,
                                     average_hash64(*frames[idx])))
                        emitted += 1
                        if emitted >= max_frames:
                            break
                    continue
                n = min(max_frames, 1 + len(payload) // (every_n * 1024))
                for idx in range(n):
                    frame = hashlib.sha256(payload + idx.to_bytes(4, "big"))
                    rows.append((media_id, idx,
                                 int.from_bytes(frame.digest()[:8], "big",
                                                signed=True)))
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "frame_phash64"])

    return media.filter(F.col("kind") == "video").select(
        "media_id", "payload").mapInPandas(batches, schema=FRAME_SAMPLES)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Build a synthetic media table from the documents fixture: the text
    bytes stand in for an opaque payload (plumbing tests only)."""
    from torspider_spark.partitioning import ensure_min_partitions

    # Downstream is an Arrow decode pass — a one-partition input would
    # serialize it in a single Python worker.
    docs = ensure_min_partitions(docs)
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video").alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(None).cast("string").alias("source_url"),
    )
