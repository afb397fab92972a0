"""Multimodal column plumbing (task brief, first-class).

Image/audio/video payloads are opaque ``binary`` columns + typed metadata
structs. The Spark-side plumbing — schemas, Arrow-batched ``mapInPandas``
pipelines, batch shapes, partition sizing — is real and tested. Codecs
(round 4): PNG (via stdlib ``zlib`` + manual scanline unfiltering, all five
filter types, 8-bit gray/gray+alpha/RGB/RGBA non-interlaced) and WAV (via
stdlib ``wave``, 8/16-bit PCM) are REAL decoders needing zero external
libraries; strict mode decodes them end to end. Formats that genuinely
require external codec libraries (video containers) remain STUBBED:
strict mode raises ``NotImplementedError`` for them, test mode produces a
deterministic fake derived from the bytes, clearly marked below.

Round 5: baseline sequential JPEG joins the real-decoder set
(functions/jpeg.py — pure numpy Huffman + dequant + IDCT + chroma
upsample, validated against independently-encoded real-world files), and
so does AVI video (functions/video.py — RIFF chunk walk, cadence-sampled
decode) in BOTH uncompressed-DIB (bottom-up BGR24) and Motion-JPEG form
(each sampled '00dc' chunk decodes through the JPEG codec; unsampled
frames never decode). Only inter-frame-compressed video (H.264/VP9/...)
and exotic JPEG modes (progressive/arithmetic/12-bit) remain declared
strict-mode stubs — those are the formats that truly need external codec
libraries.

Scale notes encoded in the design:
- media rows are big → ``repartition`` by size budget before mapInPandas so
  an Arrow batch stays well under ``spark.sql.execution.arrow.maxRecordsPerBatch``
  worth of bytes;
- metadata lives in a sibling struct column so filters (codec, dims, dur)
  prune *before* bytes are ever shuffled;
- decode outputs are fixed-shape float arrays — schema declared up front.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("codec", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
        T.StructField("n_bytes", T.LongType(), True),
    ]
)


def synthetic_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests (bytes from a seeded hash)."""
    rows = []
    for i in range(n):
        payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * 8  # 256 bytes
        kind = ["image", "audio", "video"][i % 3]
        rows.append((i, kind, bytearray(payload), ("fake", 32, 32, 1000)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def decode_png(data: bytes) -> np.ndarray:
    """Real PNG decode with the stdlib only: chunk walk + ``zlib`` inflate +
    scanline unfiltering (all five PNG filter types — None/Sub/Up/Average/
    Paeth). Supports the common web cases: 8-bit depth, color types
    0/2/4/6 (gray, RGB, gray+alpha, RGBA), non-interlaced. Returns a
    ``(height, width, channels)`` uint8 array. Palette/16-bit/interlaced
    images raise ``NotImplementedError`` (they need no external lib either,
    just more code — extend here if a corpus carries them)."""
    import struct
    import zlib

    if data[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG byte stream")
    pos, idat = 8, b""
    w = h = channels = None
    while pos + 8 <= len(data):
        ln, typ = struct.unpack(">I4s", data[pos : pos + 8])
        pos += 8
        chunk = data[pos : pos + ln]
        pos += ln + 4  # skip CRC
        if typ == b"IHDR":
            w, h, depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", chunk
            )
            if depth != 8 or interlace != 0:
                raise NotImplementedError(
                    f"PNG depth={depth} interlace={interlace} unsupported"
                )
            channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color_type)
            if channels is None:
                raise NotImplementedError(f"PNG color type {color_type} unsupported")
        elif typ == b"IDAT":
            idat += chunk
        elif typ == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    raw = zlib.decompress(idat)
    stride = w * channels
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    bpp = channels
    i = 0
    for y in range(h):
        f = raw[i]
        i += 1
        line = np.frombuffer(raw[i : i + stride], dtype=np.uint8)
        i += stride
        if f == 0:  # None
            cur = line.copy()
        elif f == 2:  # Up (uint8 addition wraps mod 256, per spec)
            cur = line + prev
        else:  # Sub/Average/Paeth carry left-neighbor state: per-byte loop
            cur = np.empty(stride, dtype=np.uint8)
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                if f == 1:
                    pred = a
                elif f == 3:
                    pred = (a + b) // 2
                elif f == 4:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                else:
                    raise ValueError(f"bad PNG filter type {f}")
                cur[x] = (int(line[x]) + pred) & 0xFF
        out[y] = cur
        prev = cur
    return out.reshape(h, w, channels)


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Real WAV decode with the stdlib ``wave`` module: returns
    ``(samples, sample_rate)`` where samples is float32 in [-1, 1], shape
    ``(n_frames, n_channels)``. 8-bit (unsigned) and 16-bit (signed LE)
    PCM; other widths raise ``NotImplementedError``."""
    import io
    import wave

    with wave.open(io.BytesIO(data)) as wv:
        nch, sw, rate = wv.getnchannels(), wv.getsampwidth(), wv.getframerate()
        frames = wv.readframes(wv.getnframes())
    if sw == 2:
        arr = np.frombuffer(frames, dtype="<i2").astype(np.float32) / 32768.0
    elif sw == 1:
        arr = (np.frombuffer(frames, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise NotImplementedError(f"WAV sample width {sw} unsupported")
    return arr.reshape(-1, nch), rate


def image_feature_vec(pixels: np.ndarray) -> np.ndarray:
    """Fixed-shape 8-dim image feature from decoded pixels: normalized
    8-bin luminance histogram (channel-mean luminance) — the declared
    decode→feature contract downstream schemas rely on."""
    lum = pixels.astype(np.float32).mean(axis=2).ravel()
    hist, _ = np.histogram(lum, bins=8, range=(0.0, 256.0))
    return (hist / max(1, lum.size)).astype(np.float32)


def audio_feature_vec(samples: np.ndarray) -> np.ndarray:
    """Fixed-shape 8-dim audio feature: RMS envelope over 8 equal time
    segments of the channel-mean signal."""
    mono = samples.astype(np.float32).mean(axis=1)
    n = len(mono)
    if n == 0:
        return np.zeros(8, dtype=np.float32)
    out = np.zeros(8, dtype=np.float32)
    for s in range(8):
        seg = mono[n * s // 8 : max(n * (s + 1) // 8, n * s // 8 + 1)]
        out[s] = float(np.sqrt(np.mean(seg * seg))) if seg.size else 0.0
    return out


def _decode_image(payload: bytes, strict: bool) -> np.ndarray:
    """Strict mode: REAL decode for PNG (stdlib, above) and baseline
    sequential JPEG (functions/jpeg.py — pure numpy Huffman + IDCT, any
    sampling factors, restart intervals; round 5). Progressive/arithmetic
    JPEG and other formats raise. Test mode: deterministic 8-dim fake
    from the bytes (unchanged fake-codec contract)."""
    if strict:
        if payload[:8] == _PNG_MAGIC:
            return image_feature_vec(decode_png(payload))
        if payload[:2] == b"\xff\xd8":
            from maestro_spark.functions.jpeg import decode_jpeg

            return image_feature_vec(decode_jpeg(payload))
        raise NotImplementedError(
            "unsupported image format (PNG and baseline JPEG decode natively; "
            "anything else needs an external codec library)"
        )
    arr = np.frombuffer(payload[:64], dtype=np.uint8).astype(np.float32)
    return arr.reshape(8, 8).mean(axis=1) / 255.0


# back-compat alias (pre-r4 name; fake mode is byte-identical)
_decode_image_stub = _decode_image


def extract_image_features(df: DataFrame, strict: bool = False) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    The mapInPandas iterator shape is the real production plumbing: batches
    arrive as pandas DataFrames, the codec loop is the only per-item work,
    output schema is declared. Swap ``_decode_image_stub`` for a real decoder
    and nothing else changes.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                None
                if p is None
                else _decode_image(bytes(p), strict).tolist()
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "feature": feats,
                    "n_bytes": [0 if p is None else len(p) for p in pdf["payload"]],
                }
            )

    return (
        df.filter(F.col("kind") == "image")
        .select("media_id", "payload")
        .mapInPandas(run, IMAGE_FEATURES_SCHEMA)
    )


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("n_bytes", T.LongType(), True),
    ]
)


def extract_audio_features(df: DataFrame, strict: bool = False) -> DataFrame:
    """Arrow-batched audio feature extraction: strict mode REALLY decodes
    WAV payloads (stdlib ``wave``) into an 8-segment RMS envelope + rate +
    sample count; non-WAV audio raises (no external codecs here). Test
    mode keeps the deterministic fake-from-bytes contract."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, rates, counts, sizes = [], [], [], []
            for p in pdf["payload"]:
                if p is None:
                    feats.append(None)
                    rates.append(None)
                    counts.append(0)
                    sizes.append(0)
                    continue
                b = bytes(p)
                sizes.append(len(b))
                if strict:
                    if b[:4] != b"RIFF":
                        raise NotImplementedError(
                            "non-WAV audio decode requires a codec library "
                            "not present in this environment"
                        )
                    samples, rate = decode_wav(b)
                    feats.append(audio_feature_vec(samples).tolist())
                    rates.append(rate)
                    counts.append(int(samples.shape[0]))
                else:
                    arr = np.frombuffer(b[:64], dtype=np.uint8).astype(np.float32)
                    feats.append((arr.reshape(8, 8).mean(axis=1) / 255.0).tolist())
                    rates.append(16000)
                    counts.append(len(b))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "feature": feats,
                    "sample_rate": pd.array(rates, dtype="Int32"),
                    "n_samples": counts,
                    "n_bytes": sizes,
                }
            )

    return (
        df.filter(F.col("kind") == "audio")
        .select("media_id", "payload")
        .mapInPandas(run, AUDIO_FEATURES_SCHEMA)
    )


VIDEO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
        T.StructField("fps", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("n_sampled", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), True),
    ]
)


def extract_video_features(
    df: DataFrame, strict: bool = False, every_ms: int = 500
) -> DataFrame:
    """Arrow-batched video feature extraction: strict mode REALLY decodes
    uncompressed-DIB and Motion-JPEG AVI payloads (functions/video.py,
    stdlib + numpy), samples frames at an ``every_ms`` cadence (only the
    sampled frames are ever materialized OR JPEG-decoded — a long clip
    never decodes in full), and emits the 8-segment temporal luminance
    envelope + fps + frame counts. Inter-frame-compressed containers raise
    (they need external codec libraries). Test mode keeps the
    deterministic fake-from-bytes contract."""
    from maestro_spark.functions import video as V

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, fpss, totals, sampled, sizes = [], [], [], [], []
            for p in pdf["payload"]:
                if p is None:
                    feats.append(None)
                    fpss.append(None)
                    totals.append(0)
                    sampled.append(0)
                    sizes.append(0)
                    continue
                b = bytes(p)
                sizes.append(len(b))
                if strict:
                    if b[:4] != b"RIFF" or b[8:12] != b"AVI ":
                        raise NotImplementedError(
                            "compressed video decode requires a codec "
                            "library not present in this environment "
                            "(uncompressed-DIB and Motion-JPEG AVI "
                            "decode natively)"
                        )
                    _, fps0, n_total = V.decode_avi(b, frame_indices=[])
                    idx = V.sample_indices(n_total, fps0, every_ms)
                    frames, fps0, n_total = V.decode_avi(b, frame_indices=idx)
                    feats.append(V.video_feature_vec(frames).tolist())
                    fpss.append(fps0)
                    totals.append(n_total)
                    sampled.append(len(idx))
                else:
                    arr = np.frombuffer(b[:64], dtype=np.uint8).astype(np.float32)
                    feats.append((arr.reshape(8, 8).mean(axis=1) / 255.0).tolist())
                    fpss.append(10)
                    totals.append(max(1, len(b) // 64))
                    sampled.append(1)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "feature": feats,
                    "fps": pd.array(fpss, dtype="Int32"),
                    "n_frames": pd.array(totals, dtype="Int32"),
                    "n_sampled": pd.array(sampled, dtype="Int32"),
                    "n_bytes": sizes,
                }
            )

    return (
        df.filter(F.col("kind") == "video")
        .select("media_id", "payload")
        .mapInPandas(run, VIDEO_FEATURES_SCHEMA)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """Minimal stdlib PNG ENCODER (filter 0 scanlines) — the fixture twin
    of :func:`decode_png`, also usable to ship decoded artifacts back out.
    ``pixels``: (h, w, channels) uint8, channels in {1, 2, 3, 4}."""
    import struct
    import zlib

    h, w, channels = pixels.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]

    def chunk(typ: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + typ
            + payload
            + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + pixels[y].tobytes() for y in range(h))
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def frame_sample_plan(df: DataFrame, every_ms: int = 500) -> DataFrame:
    """Video frame-sampling *plan*: expand each video row into frame
    timestamps (pure JVM sequence/explode — this part is real); the decode of
    each frame is the stubbed step downstream."""
    return (
        df.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("meta.duration_ms"), F.lit(every_ms))
            ).alias("frame_ms"),
        )
    )


def synthetic_real_media(
    spark, n: int = 16, seed: int = 42, with_video: bool = False
) -> DataFrame:
    """Deterministic REAL media table: even ids carry genuine PNG payloads
    (seeded pixel patterns through :func:`encode_png`), odd ids genuine WAV
    payloads (seeded square-ish PCM via the stdlib ``wave`` writer) — the
    strict-mode decode path runs end to end on these with zero external
    libraries. ``with_video=True`` additionally makes every ``i % 3 == 2``
    row a genuine AVI clip — alternating uncompressed-DIB and Motion-JPEG
    containers (functions/video.py encoders).
    No RNG (replay-equality rules): all bytes derive from (seed, media_id)."""
    import io
    import struct
    import wave

    rows = []
    for i in range(n):
        if with_video and i % 3 == 2:
            from maestro_spark.functions.video import encode_avi, encode_avi_mjpeg

            h, w, nf = 8 + (i % 2) * 4, 8, 6 + (i % 4)
            vals = [
                (seed * 151 + i * 911 + j * 97 + (j * j) % 241) % 256
                for j in range(nf * h * w * 3)
            ]
            clip = np.array(vals, dtype=np.uint8).reshape(nf, h, w, 3)
            fps = 10
            # alternate container: every other clip is Motion-JPEG so the
            # strict path exercises BOTH native video codecs
            enc = encode_avi_mjpeg if (i // 3) % 2 else encode_avi
            rows.append(
                (i, "video", bytearray(enc(clip, fps=fps)),
                 ("avi", w, h, nf * 1000 // fps))
            )
        elif i % 2 == 0:
            h, w, ch = 8 + (i % 3) * 4, 8, 3
            vals = [
                (seed * 131 + i * 977 + j * 89 + (j * j) % 251) % 256
                for j in range(h * w * ch)
            ]
            px = np.array(vals, dtype=np.uint8).reshape(h, w, ch)
            if i % 4 == 2:  # every other image row is a REAL baseline JPEG
                from maestro_spark.functions.jpeg import encode_jpeg

                rows.append(
                    (i, "image", bytearray(encode_jpeg(px, quality=90)),
                     ("jpeg", w, h, None))
                )
                continue
            rows.append(
                (i, "image", bytearray(encode_png(px)), ("png", w, h, None))
            )
        else:
            rate, nsamp = 8000, 400 + 40 * (i % 5)
            buf = io.BytesIO()
            with wave.open(buf, "wb") as wv:
                wv.setnchannels(1)
                wv.setsampwidth(2)
                wv.setframerate(rate)
                frames = b"".join(
                    struct.pack(
                        "<h",
                        ((seed + i) * 257 + j * 73) % 24001 - 12000,
                    )
                    for j in range(nsamp)
                )
                wv.writeframes(frames)
            rows.append(
                (i, "audio", bytearray(buf.getvalue()),
                 ("wav", None, None, nsamp * 1000 // rate))
            )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
