"""Pure-Python video readers for corpus ingestion (no ffmpeg needed).

The reference shells out to ffmpeg for every video input; this image has
no ffmpeg, which left training-corpus ingestion pixel-npz/image-dir only
(r2 gap). These readers decode the formats Python can handle natively:

- animated GIF / WebP / APNG via PIL (`read_pil_animation`)
- YUV4MPEG2 (.y4m — the uncompressed interchange format every ffmpeg/
  x264 toolchain can emit) via a stdlib parser (`read_y4m`)
- MJPEG AVI via a stdlib RIFF parser + PIL JPEG decode
  (`read_avi_mjpeg` / `read_avi_audio`) — the inverse of this module's
  own writers, so the framework's no-ffmpeg outputs feed straight back
  into retake / a2vid / training-corpus ingestion

`read_video_any` dispatches by suffix and falls back to the ffmpeg pipe
reader for everything else (mp4/webm/...), so callers get ONE entry point
that uses ffmpeg only when actually required.

All readers return float32 (1, 3, F, H, W) in [-1, 1], resized to the
requested geometry, frame count padded (edge-repeat) or trimmed.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def _resize_frame(frame_u8: np.ndarray, height: int, width: int) -> np.ndarray:
    """(H, W, 3) uint8 -> (height, width, 3) uint8 via PIL bilinear."""
    if frame_u8.shape[0] == height and frame_u8.shape[1] == width:
        return frame_u8
    from PIL import Image

    img = Image.fromarray(frame_u8).resize((width, height), Image.BILINEAR)
    return np.asarray(img, np.uint8)


def _pack(frames: list, height: int, width: int, num_frames: int) -> np.ndarray:
    frames = frames[:num_frames]
    while len(frames) < num_frames:
        frames.append(frames[-1])
    stack = np.stack(
        [_resize_frame(f, height, width) for f in frames], axis=0
    )  # (F, H, W, 3) uint8
    video = stack.astype(np.float32) / 127.5 - 1.0
    return video.transpose(3, 0, 1, 2)[None]  # (1, 3, F, H, W)


def read_pil_animation(
    path: str, height: int, width: int, num_frames: int
) -> np.ndarray:
    """Animated GIF / WebP / APNG -> (1, 3, F, H, W) in [-1, 1]."""
    from PIL import Image, ImageSequence

    frames = []
    with Image.open(path) as img:
        for frame in ImageSequence.Iterator(img):
            frames.append(np.asarray(frame.convert("RGB"), np.uint8))
            if len(frames) >= num_frames:
                break
    if not frames:
        raise ValueError(f"no frames decoded from {path}")
    return _pack(frames, height, width, num_frames)


def _parse_y4m_header(raw_header: bytes, path: str):
    """Stream-header line -> (w, h, fps, colorspace-tag). Raises on a
    non-y4m stream or missing geometry."""
    header = raw_header.decode("ascii", "replace").strip()
    if not header.startswith("YUV4MPEG2"):
        raise ValueError(f"{path}: not a YUV4MPEG2 stream")
    w = h = None
    fps = 24.0
    cs = "420"
    for token in header.split()[1:]:
        if token.startswith("W"):
            w = int(token[1:])
        elif token.startswith("H"):
            h = int(token[1:])
        elif token.startswith("F"):
            num, den = token[1:].split(":")
            fps = float(num) / float(den)
        elif token.startswith("C"):
            cs = token[1:]
    if not w or not h:
        raise ValueError(f"{path}: missing W/H in y4m header")
    return w, h, fps, cs


def _y4m_chroma_geometry(cs: str, w: int, h: int, path: str):
    """Colorspace tag -> (subsample, chroma_w, chroma_h). The single source
    of truth for what read_y4m decodes — probe_video shares it so the two
    can never disagree on plane sizes or supported colorspaces."""
    import re as _re

    if _re.search(r"p(9|10|12|14|16)$", cs):
        # C420p10/p12/p16 etc: >8-bit samples double the plane bytes —
        # parsing them as 8-bit would desync the frame stream. (Plain
        # 'p' belongs to chroma-siting tags like 420jpeg/420paldv.)
        raise ValueError(f"{path}: only 8-bit y4m supported, got C{cs}")
    if cs.startswith("420"):
        return 2, (w + 1) // 2, (h + 1) // 2
    if cs.startswith("444"):
        return 1, w, h
    raise ValueError(f"{path}: unsupported y4m colorspace C{cs}")


def read_y4m(path: str, height: int, width: int, num_frames: int) -> np.ndarray:
    """YUV4MPEG2 -> (1, 3, F, H, W) in [-1, 1]. Supports the common C420*
    (4:2:0) and C444 colorspaces, 8-bit."""
    with open(path, "rb") as fh:
        w, h, _fps, cs = _parse_y4m_header(fh.readline(), path)
        sub, cw, ch = _y4m_chroma_geometry(cs, w, h, path)
        ysize, csize = w * h, cw * ch

        frames = []
        while len(frames) < num_frames:
            marker = fh.readline()
            if not marker:
                break
            if not marker.startswith(b"FRAME"):
                raise ValueError(f"{path}: bad frame marker {marker[:16]!r}")
            raw = fh.read(ysize + 2 * csize)
            if len(raw) < ysize + 2 * csize:
                break
            y = np.frombuffer(raw, np.uint8, ysize).reshape(h, w).astype(np.float32)
            u = np.frombuffer(raw, np.uint8, csize, ysize).reshape(ch, cw)
            v = np.frombuffer(raw, np.uint8, csize, ysize + csize).reshape(ch, cw)
            if sub == 2:  # nearest-neighbor chroma upsample
                u = u.repeat(2, 0)[:h].repeat(2, 1)[:, :w]
                v = v.repeat(2, 0)[:h].repeat(2, 1)[:, :w]
            u = u.astype(np.float32) - 128.0
            v = v.astype(np.float32) - 128.0
            # BT.601 limited-range YCbCr -> RGB (the y4m default): undo the
            # range scaling, then the exact 601 inverse matrix.
            yf = (y - 16.0) * (255.0 / 219.0)
            uf = u * (255.0 / 224.0)
            vf = v * (255.0 / 224.0)
            r = yf + 1.402 * vf
            g = yf - 0.344136 * uf - 0.714136 * vf
            b = yf + 1.772 * uf
            rgb = np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)
            frames.append(rgb)
    if not frames:
        raise ValueError(f"no frames decoded from {path}")
    return _pack(frames, height, width, num_frames)


def _avi_chunks(data: bytes):
    """Yield (fourcc, payload_offset, size) for every chunk in the AVI's
    'movi' LIST, in file order. Handles nested 'rec ' LISTs."""
    import struct

    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")

    def walk(start: int, end: int):
        pos = start
        while pos + 8 <= end:
            fourcc = data[pos : pos + 4]
            (size,) = struct.unpack_from("<I", data, pos + 4)
            body = pos + 8
            if fourcc == b"LIST":
                list_type = data[body : body + 4]
                if list_type in (b"movi", b"rec "):
                    yield from walk(body + 4, body + size)
            else:
                yield fourcc, body, size
            pos = body + size + (size % 2)

    (outer_size,) = struct.unpack_from("<I", data, 4)
    yield from walk(12, min(len(data), 8 + outer_size))


def read_avi_mjpeg(
    path: str, height: int, width: int, num_frames: int
) -> np.ndarray:
    """MJPEG AVI (the no-ffmpeg output format of this framework, and a
    common capture format) -> (1, 3, F, H, W) in [-1, 1].

    Parses the RIFF container with the stdlib and decodes each '00dc'
    JPEG frame via PIL — the exact inverse of write_avi_mjpeg.
    """
    import io

    from PIL import Image

    with open(path, "rb") as fh:
        data = fh.read()
    frames = []
    for fourcc, off, size in _avi_chunks(data):
        if fourcc[2:] == b"dc" and size > 0:
            payload = data[off : off + size]
            if not payload.startswith(b"\xff\xd8"):
                raise ValueError(
                    f"{path}: stream {fourcc[:2].decode()} is not MJPEG "
                    "(only MJPEG AVIs decode without ffmpeg)"
                )
            with Image.open(io.BytesIO(payload)) as img:
                frames.append(np.asarray(img.convert("RGB"), np.uint8))
            if len(frames) >= num_frames:
                break
    if not frames:
        raise ValueError(f"no MJPEG frames decoded from {path}")
    return _pack(frames, height, width, num_frames)


def _avi_stream_headers(data: bytes):
    """Parse the hdrl LIST: yield (stream_index, fccType, strf_payload) per
    'strl' stream list. Walking the real header structure (instead of
    scanning raw bytes for 'auds') means compressed frame payloads can
    never false-match as stream headers."""
    import struct

    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    pos, end = 12, min(len(data), 8 + struct.unpack_from("<I", data, 4)[0])
    while pos + 12 <= end:
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = pos + 8
        if fourcc == b"LIST" and data[body : body + 4] == b"hdrl":
            idx = 0
            p2, hend = body + 4, body + size
            while p2 + 8 <= hend:
                fc2 = data[p2 : p2 + 4]
                (sz2,) = struct.unpack_from("<I", data, p2 + 4)
                b2 = p2 + 8
                if fc2 == b"LIST" and data[b2 : b2 + 4] == b"strl":
                    fcc_type = strf = None
                    p3, send = b2 + 4, b2 + sz2
                    while p3 + 8 <= send:
                        fc3 = data[p3 : p3 + 4]
                        (sz3,) = struct.unpack_from("<I", data, p3 + 4)
                        if fc3 == b"strh":
                            fcc_type = data[p3 + 8 : p3 + 12]
                        elif fc3 == b"strf":
                            strf = data[p3 + 8 : p3 + 8 + sz3]
                        p3 += 8 + sz3 + (sz3 % 2)
                    yield idx, fcc_type, strf
                    idx += 1
                p2 = b2 + sz2 + (sz2 % 2)
            return
        pos = body + size + (size % 2)


def read_avi_audio(path: str):
    """Extract the interleaved 16-bit PCM track from an AVI.

    Returns (audio, sample_rate) with audio float32 (channels, N) in
    [-1, 1], or None if the file has no audio stream. Inverse of
    write_avi_mjpeg's '01wb' muxing.
    """
    import struct

    with open(path, "rb") as fh:
        data = fh.read()
    audio_stream = None
    for idx, fcc_type, strf in _avi_stream_headers(data):
        if fcc_type == b"auds" and strf is not None and len(strf) >= 16:
            audio_stream = (idx, strf)
            break
    if audio_stream is None:
        return None
    idx, strf = audio_stream
    fmt_tag, channels, sample_rate = struct.unpack_from("<2HI", strf, 0)
    if fmt_tag != 1:  # PCM only
        return None
    bits = struct.unpack_from("<H", strf, 14)[0]
    if bits != 16 or channels == 0:
        return None
    stream_cc = b"%02d" % idx  # this stream's chunks only ('01wb', ...)
    pcm_parts = [
        data[off : off + size]
        for fourcc, off, size in _avi_chunks(data)
        if fourcc[2:] == b"wb" and fourcc[:2] == stream_cc and size > 0
    ]
    if not pcm_parts:
        return None
    pcm = np.frombuffer(b"".join(pcm_parts), "<i2")
    n = len(pcm) // channels
    audio = pcm[: n * channels].reshape(n, channels).T.astype(np.float32) / 32767.0
    return audio, int(sample_rate)


def probe_video(path: str):
    """Pure-Python metadata probe: (fps, num_frames, height, width).

    Covers every format the pure-Python readers decode (AVI / y4m /
    GIF / WebP / APNG) so retake's ffprobe shell-out is only needed for
    ffmpeg-only formats (mp4/webm/...).
    """
    import struct

    suffix = Path(path).suffix.lower()
    if suffix == ".avi":
        with open(path, "rb") as fh:
            data = fh.read(4096)
        pos = data.find(b"avih")
        if pos < 0:
            raise ValueError(f"{path}: no avih header")
        usec_per_frame, _, _, _, total_frames = struct.unpack_from(
            "<5I", data, pos + 8
        )
        w, h = struct.unpack_from("<2I", data, pos + 8 + 32)
        fps = 1_000_000.0 / usec_per_frame if usec_per_frame else 24.0
        return fps, int(total_frames), int(h), int(w)
    if suffix == ".y4m":
        import os

        fsize = os.path.getsize(path)
        with open(path, "rb") as fh:
            w, h, fps, cs = _parse_y4m_header(fh.readline(), path)
            _, cw, ch = _y4m_chroma_geometry(cs, w, h, path)
            plane_bytes = w * h + 2 * cw * ch
            # Walk the frame records: each is a 'FRAME[ params]\n' line
            # (spec-legal per-frame parameters make the marker variable-
            # length, so size//frame_bytes would over-count) followed by
            # fixed-size planes. One readline + seek per frame — no full
            # read (a raw stream can be multi-GB) and no false matches
            # from pixel bytes that happen to spell 'FRAME'.
            n = 0
            while True:
                marker = fh.readline()
                if not marker:
                    break
                if not marker.startswith(b"FRAME"):
                    raise ValueError(
                        f"{path}: bad frame marker {marker[:16]!r}"
                    )
                if fh.tell() + plane_bytes > fsize:
                    break  # truncated final frame — don't count it
                fh.seek(plane_bytes, os.SEEK_CUR)
                n += 1
        return fps, int(n), int(h), int(w)
    if suffix in PIL_SUFFIXES:
        from PIL import Image

        with Image.open(path) as img:
            w, h = img.size
            n = getattr(img, "n_frames", 1)
            duration_ms = img.info.get("duration", 0) or 0
        fps = 1000.0 / duration_ms if duration_ms else 24.0
        return fps, int(n), int(h), int(w)
    raise ValueError(f"{path}: no pure-Python probe for {suffix}")


# Single source of truth for what decodes without ffmpeg — shared by
# read_video_any and retake.load_video_frames (duplicated lists drift).
PIL_SUFFIXES = (".gif", ".webp", ".apng", ".png")
PURE_PYTHON_SUFFIXES = PIL_SUFFIXES + (".y4m", ".avi")


def read_video_any(
    path: str, height: int, width: int, num_frames: int
) -> np.ndarray:
    """Dispatch: pure-Python readers for GIF/WebP/APNG/y4m/AVI-MJPEG,
    ffmpeg pipe for everything else (mp4/webm/mov/...)."""
    suffix = Path(path).suffix.lower()
    if suffix == ".y4m":
        return read_y4m(path, height, width, num_frames)
    if suffix == ".avi":
        return read_avi_mjpeg(path, height, width, num_frames)
    if suffix in PIL_SUFFIXES:
        return read_pil_animation(path, height, width, num_frames)
    from ltx2_tpu.pipelines.retake import load_video_frames

    return load_video_frames(path, height, width, num_frames)


# ---------------------------------------------------------------------------
# Pure-Python video WRITERS (playable output without ffmpeg)
# ---------------------------------------------------------------------------
# The reference muxes H.264 via an external ffmpeg binary
# (generate.py:2153-2362); when ffmpeg is absent this framework previously
# degraded to GIF + npz. These writers produce genuinely playable files
# with the stdlib + PIL only:
#
# - write_y4m: lossless YUV4MPEG2 (C444 full-resolution chroma), the
#   interchange format every ffmpeg/x264/mpv toolchain accepts; exact
#   inverse of read_y4m's BT.601 limited-range math.
# - write_avi_mjpeg: RIFF/AVI container with MJPEG video (PIL JPEG per
#   frame) and optional interleaved 16-bit PCM audio — one file, with
#   sound, playable in VLC/mpv/ffplay/QuickTime.


def rgb_to_ycbcr601(frames_u8: np.ndarray):
    """(..., 3) uint8 RGB -> limited-range BT.601 (y, cb, cr) float planes.

    Exact forward of read_y4m's inverse: Y' in [16, 235], chroma in
    [16, 240] around 128.
    """
    rgb = frames_u8.astype(np.float32)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    yf = 0.299 * r + 0.587 * g + 0.114 * b
    cb = (b - yf) / 1.772
    cr = (r - yf) / 1.402
    y = yf * (219.0 / 255.0) + 16.0
    u = cb * (224.0 / 255.0) + 128.0
    v = cr * (224.0 / 255.0) + 128.0
    return y, u, v


def write_y4m(path: str, frames_u8: np.ndarray, fps: float) -> None:
    """Write (F, H, W, 3) uint8 RGB as YUV4MPEG2 C444 (8-bit, progressive).

    C444 keeps chroma at full resolution (no subsampling loss and no
    even-dimension requirement); read_y4m round-trips it to within
    +-1 count rounding.
    """
    from fractions import Fraction

    frames_u8 = np.asarray(frames_u8, np.uint8)
    if frames_u8.ndim != 4 or frames_u8.shape[-1] != 3:
        raise ValueError(f"expected (F, H, W, 3) uint8, got {frames_u8.shape}")
    f, h, w, _ = frames_u8.shape
    rate = Fraction(fps).limit_denominator(1_000_000)
    with open(path, "wb") as fh:
        fh.write(
            f"YUV4MPEG2 W{w} H{h} F{rate.numerator}:{rate.denominator} "
            f"Ip A1:1 C444\n".encode("ascii")
        )
        y, u, v = rgb_to_ycbcr601(frames_u8)
        y = np.clip(np.round(y), 0, 255).astype(np.uint8)
        u = np.clip(np.round(u), 0, 255).astype(np.uint8)
        v = np.clip(np.round(v), 0, 255).astype(np.uint8)
        for i in range(f):
            fh.write(b"FRAME\n")
            fh.write(y[i].tobytes())
            fh.write(u[i].tobytes())
            fh.write(v[i].tobytes())


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    """RIFF chunk: fourcc + LE size + payload, padded to even length."""
    import struct

    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list_chunk(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def write_avi_mjpeg(
    path: str,
    frames_u8: np.ndarray,
    fps: float,
    audio: np.ndarray | None = None,
    sample_rate: int = 24000,
    quality: int = 92,
) -> None:
    """Write (F, H, W, 3) uint8 RGB as an AVI with MJPEG video and optional
    interleaved 16-bit PCM audio.

    audio: float32 in [-1, 1], (N,), (C, N) or (1, C, N). Audio is sliced
    into per-frame '01wb' chunks so players can stream A/V in sync.
    """
    import io
    import struct

    from PIL import Image

    frames_u8 = np.asarray(frames_u8, np.uint8)
    if frames_u8.ndim != 4 or frames_u8.shape[-1] != 3:
        raise ValueError(f"expected (F, H, W, 3) uint8, got {frames_u8.shape}")
    num_frames, h, w, _ = frames_u8.shape

    jpegs = []
    for frame in frames_u8:
        buf = io.BytesIO()
        Image.fromarray(frame).save(buf, format="JPEG", quality=quality)
        jpegs.append(buf.getvalue())

    pcm = None
    channels = 0
    if audio is not None:
        a = np.asarray(audio, np.float32)
        if a.ndim == 3:
            a = a[0]
        if a.ndim == 1:
            a = a[None]
        channels = a.shape[0]
        # (C, N) -> interleaved (N, C) int16
        pcm = np.clip(np.round(a.T * 32767.0), -32768, 32767).astype("<i2")

    rate = max(1, int(round(fps * 1000)))
    scale = 1000
    usec_per_frame = int(round(1_000_000 * scale / rate))

    # --- stream headers ---
    # MainAVIHeader: flags 0x10 = AVIF_HASINDEX.
    avih = struct.pack(
        "<14I", usec_per_frame, 0, 0, 0x10, num_frames, 0,
        2 if pcm is not None else 1, 0, w, h, 0, 0, 0, 0,
    )
    strh_v = struct.pack(
        "<4s4sI2H8I4H",
        b"vids", b"MJPG", 0, 0, 0, 0, scale, rate, 0, num_frames,
        max(len(j) for j in jpegs), 0xFFFFFFFF, 0, 0, 0, w, h,
    )
    # BITMAPINFOHEADER with 'MJPG' compression.
    strf_v = struct.pack(
        "<I2i2H2I2i2I", 40, w, h, 1, 24,
        struct.unpack("<I", b"MJPG")[0], w * h * 3, 0, 0, 0, 0,
    )
    strl = _list_chunk(b"strl", _chunk(b"strh", strh_v) + _chunk(b"strf", strf_v))

    audio_chunks: list[bytes] = []
    if pcm is not None:
        block_align = 2 * channels
        # dwScale=1 / dwRate=sample_rate, dwSampleSize=block_align (PCM).
        strh_a = struct.pack(
            "<4s4sI2H8I4H",
            b"auds", b"\x00\x00\x00\x00", 0, 0, 0,
            0, 1, sample_rate, 0, pcm.shape[0],
            sample_rate * block_align, 0xFFFFFFFF, block_align,
            0, 0, 0, 0,
        )
        strf_a = struct.pack(
            "<2H2I2H", 1, channels, sample_rate,
            sample_rate * block_align, block_align, 16,
        )
        strl += _list_chunk(
            b"strl", _chunk(b"strh", strh_a) + _chunk(b"strf", strf_a)
        )
        # Slice audio into per-frame chunks (last chunk takes the tail).
        edges = np.linspace(0, pcm.shape[0], num_frames + 1).astype(np.int64)
        audio_chunks = [
            pcm[edges[i] : edges[i + 1]].tobytes() for i in range(num_frames)
        ]

    hdrl = _list_chunk(b"hdrl", _chunk(b"avih", avih) + strl)

    # --- movi payload + idx1 (offsets relative to the 'movi' fourcc) ---
    # Accumulate chunks in lists and join once: per-frame `bytes +=` copies
    # the whole payload every iteration (quadratic on long clips).
    movi_parts: list = []
    idx_parts: list = []
    offset = 4
    for i, jpeg in enumerate(jpegs):
        part = _chunk(b"00dc", jpeg)
        movi_parts.append(part)
        idx_parts.append(struct.pack("<4s3I", b"00dc", 0x10, offset, len(jpeg)))
        offset += len(part)
        if audio_chunks and audio_chunks[i]:
            part = _chunk(b"01wb", audio_chunks[i])
            movi_parts.append(part)
            idx_parts.append(
                struct.pack("<4s3I", b"01wb", 0x10, offset, len(audio_chunks[i]))
            )
            offset += len(part)
    idx = b"".join(idx_parts)
    movi = _list_chunk(b"movi", b"".join(movi_parts))

    riff_payload = b"AVI " + hdrl + movi + _chunk(b"idx1", idx)
    with open(path, "wb") as fh:
        fh.write(_chunk(b"RIFF", riff_payload))
