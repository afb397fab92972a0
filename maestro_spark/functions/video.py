"""Real uncompressed-AVI video codec with the stdlib only (round 5).

Closes the last declared multimodal stub (SURVEY task brief: video
frame-sample): an AVI RIFF container holding uncompressed bottom-up BGR24
DIB frames needs no external codec library — just ``struct`` chunk walking
and numpy reshapes — the same zero-dependency bar the PNG/WAV/JPEG codecs
met in rounds 4-5. Compressed containers (H.264/VP9/...) genuinely require
external libraries and remain strict-mode refusals in
``multimodal.extract_video_features``.

Scale posture: the codec runs executor-side inside Arrow-batched
``mapInPandas`` (see multimodal.py); nothing here touches the driver. A
sampled frame subset is decoded per row — ``decode_avi`` takes the wanted
frame indices so a 2-hour clip never materializes every frame.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_avi(frames: np.ndarray, fps: int = 10) -> bytes:
    """Minimal uncompressed AVI encoder — the fixture twin of
    :func:`decode_avi`. ``frames``: (n, h, w, 3) uint8 RGB. Frames are
    stored as bottom-up BGR rows padded to 4-byte stride ('DIB '/'00db'
    chunks), the lowest-common-denominator AVI that every player reads."""
    n, h, w, _ = frames.shape
    stride = (w * 3 + 3) & ~3
    frame_bytes = stride * h

    def chunk(fcc: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) % 2 else b""
        return fcc + struct.pack("<I", len(payload)) + payload + pad

    def lst(fcc: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", fcc + payload)

    avih = struct.pack(
        "<14I",
        1_000_000 // max(1, fps),  # dwMicroSecPerFrame
        frame_bytes * fps,         # dwMaxBytesPerSec
        0,                         # dwPaddingGranularity
        0x10,                      # dwFlags: AVIF_HASINDEX off, interleaved off
        n, 0, 1, frame_bytes,      # totalFrames, initialFrames, streams, bufSize
        w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"DIB " + struct.pack(
            "<IHHIIIIIIII4h",
            0, 0, 0, 0,            # flags, priority, language, initialFrames
            1, max(1, fps),        # dwScale, dwRate (fps = rate/scale)
            0, n, frame_bytes, 0, 0,  # start, length, bufSize, quality, sampleSize
            0, 0, w, h,            # rcFrame
        )
    )
    strf = struct.pack(
        "<IiiHHIIiiII",
        40, w, h, 1, 24, 0, frame_bytes, 0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_frames = []
    pad_cols = stride - w * 3
    for f in frames:
        bgr = f[::-1, :, ::-1]  # bottom-up rows, RGB -> BGR
        rows = bgr.reshape(h, w * 3)
        if pad_cols:
            rows = np.hstack([rows, np.zeros((h, pad_cols), dtype=np.uint8)])
        movi_frames.append(chunk(b"00db", rows.tobytes()))
    movi = lst(b"movi", b"".join(movi_frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


_MJPG_FOURCC = struct.unpack("<I", b"MJPG")[0]


def encode_avi_mjpeg(frames: np.ndarray, fps: int = 10, quality: int = 90) -> bytes:
    """Motion-JPEG AVI encoder — the fixture twin of :func:`decode_avi`'s
    MJPG path. ``frames``: (n, h, w, 3) uint8 RGB; each frame is one
    baseline-JPEG '00dc' chunk (functions/jpeg.py encoder), the classic
    intra-only compressed AVI every capture card writes."""
    from maestro_spark.functions.jpeg import encode_jpeg

    n, h, w, _ = frames.shape
    payloads = [encode_jpeg(f, quality=quality) for f in frames]
    buf_size = max(len(p) for p in payloads)

    def chunk(fcc: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) % 2 else b""
        return fcc + struct.pack("<I", len(payload)) + payload + pad

    def lst(fcc: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", fcc + payload)

    avih = struct.pack(
        "<14I",
        1_000_000 // max(1, fps), buf_size * fps, 0, 0x10,
        n, 0, 1, buf_size, w, h, 0, 0, 0, 0,
    )
    strh = b"vids" + b"MJPG" + struct.pack(
        "<IHHIIIIIIII4h",
        0, 0, 0, 0, 1, max(1, fps), 0, n, buf_size, 0, 0, 0, 0, w, h,
    )
    strf = struct.pack(
        "<IiiHHIIiiII",
        40, w, h, 1, 24, _MJPG_FOURCC, buf_size, 0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00dc", p) for p in payloads))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi(
    data: bytes, frame_indices: list[int] | None = None
) -> tuple[np.ndarray, int, int]:
    """Decode an uncompressed-DIB or Motion-JPEG AVI: returns
    ``(frames, fps, n_frames)`` where frames is (k, h, w, 3) uint8 RGB for
    the requested ``frame_indices`` (all frames when None) and ``n_frames``
    is the clip's total. biCompression=0 24-bit DIB payloads decode as raw
    rows; biCompression='MJPG' chunks decode through the baseline-JPEG
    codec (functions/jpeg.py) — ONLY the requested frames ever decode, so
    a cadence-sampled long clip stays cheap. Anything else compressed
    (H.264/VP9/…) raises ``NotImplementedError`` (that is what needs an
    external codec library)."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI byte stream")

    w = h = bpp = comp = None
    top_down = False
    scale, rate = 1, 10
    frame_chunks: list[tuple[int, int]] = []  # (offset, length) into data

    def walk(pos: int, end: int) -> None:
        nonlocal w, h, bpp, comp, scale, rate, top_down
        while pos + 8 <= end:
            fcc = data[pos : pos + 4]
            (ln,) = struct.unpack("<I", data[pos + 4 : pos + 8])
            body = pos + 8
            if fcc == b"LIST":
                walk(body + 4, body + ln)  # skip the list-type fourcc
            elif fcc == b"strh" and data[body : body + 4] == b"vids":
                _scale, _rate = struct.unpack("<II", data[body + 20 : body + 28])
                scale, rate = max(1, _scale), max(1, _rate)
            elif fcc == b"strf" and w is None:
                _sz, _w, _h, _pl, _bpp, _comp = struct.unpack(
                    "<IiiHHI", data[body : body + 20]
                )
                # negative biHeight = top-down row order (DIB spec)
                w, h, bpp, comp, top_down = _w, abs(_h), _bpp, _comp, _h < 0
            elif fcc[2:4] in (b"db", b"dc") and ln > 0:
                frame_chunks.append((body, ln))
            pos = body + ln + (ln % 2)

    walk(12, 8 + struct.unpack("<I", data[4:8])[0])
    if w is None or not frame_chunks:
        raise ValueError("AVI missing stream format / frames")
    mjpeg = comp == _MJPG_FOURCC
    if not mjpeg and (comp != 0 or bpp != 24):
        raise NotImplementedError(
            f"compressed AVI (biCompression={comp}, bpp={bpp}) needs an "
            "external codec library (uncompressed DIB and MJPG decode "
            "natively)"
        )
    n_frames = len(frame_chunks)
    fps = max(1, round(rate / scale))
    stride = (w * 3 + 3) & ~3
    idx = list(range(n_frames)) if frame_indices is None else [
        i for i in frame_indices if 0 <= i < n_frames
    ]
    out = np.empty((len(idx), h, w, 3), dtype=np.uint8)
    for k, i in enumerate(idx):
        off, ln = frame_chunks[i]
        if mjpeg:
            from maestro_spark.functions.jpeg import decode_jpeg

            img = decode_jpeg(bytes(data[off : off + ln]))
            # foreign encoders may round to MCU multiples: crop/pad to the
            # container's declared frame box (top-down, as JPEG is)
            fh, fw = min(h, img.shape[0]), min(w, img.shape[1])
            frame = np.zeros((h, w, 3), dtype=np.uint8)
            frame[:fh, :fw] = img[:fh, :fw]
            out[k] = frame
            continue
        rows = np.frombuffer(data[off : off + ln], dtype=np.uint8)
        rows = rows[: stride * h].reshape(h, stride)[:, : w * 3]
        img = rows.reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
        out[k] = img if top_down else img[::-1]  # bottom-up unless biHeight<0
    return out, fps, n_frames


def sample_indices(n_frames: int, fps: int, every_ms: int) -> list[int]:
    """Frame indices at an every-``every_ms`` cadence — the decode-side twin
    of ``multimodal.frame_sample_plan``'s JVM timestamp expansion."""
    step = max(1, round(fps * every_ms / 1000))
    return list(range(0, n_frames, step))


def video_feature_vec(frames: np.ndarray) -> np.ndarray:
    """Fixed-shape 8-dim video feature: mean luminance over 8 equal temporal
    segments of the sampled frames, /255 — the motion-profile analogue of
    the audio RMS envelope (fixed output schema, declared up front)."""
    n = frames.shape[0]
    if n == 0:
        return np.zeros(8, dtype=np.float32)
    lum = frames.astype(np.float32).mean(axis=(1, 2, 3))  # per-frame luminance
    out = np.zeros(8, dtype=np.float32)
    for s in range(8):
        seg = lum[n * s // 8 : max(n * (s + 1) // 8, n * s // 8 + 1)]
        out[s] = float(seg.mean()) / 255.0 if seg.size else 0.0
    return out
