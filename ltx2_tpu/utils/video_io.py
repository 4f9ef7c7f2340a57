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
- MJPEG .mov/.mp4 via a stdlib ISO-BMFF parser (`read_mov_mjpeg` /
  `read_mov_audio`) — the inverse of `write_mp4_mjpeg`
- everything else (H.264 mp4, webm, mkv, ...) via OpenCV's bundled
  FFMPEG (`read_cv2`, gated import) — full-format corpus ingestion with
  no external binary

`read_video_any` dispatches by suffix/codec and falls back to the ffmpeg
pipe reader only when cv2 is absent too, so callers get ONE entry point.

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
    # Decode ONE video stream, not every 'dc' chunk: a multi-stream AVI
    # (main video + preview/thumbnail stream) would otherwise interleave
    # frames from all streams into one garbled sequence (review r4).
    # read_avi_audio already filters by stream index the same way.
    video_cc = None
    try:
        for idx, fcc_type, _strf in _avi_stream_headers(data):
            if fcc_type == b"vids":
                video_cc = b"%02d" % idx
                break
    except ValueError:
        pass  # unparseable hdrl: fall back to accepting any dc chunk
    frames = []
    for fourcc, off, size in _avi_chunks(data):
        if fourcc[2:] == b"dc" and size > 0 and (
            video_cc is None or fourcc[:2] == video_cc
        ):
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
    if suffix in (".mov", ".mp4", ".m4v"):
        return probe_mov(path)
    raise ValueError(f"{path}: no pure-Python probe for {suffix}")


# Single source of truth for what decodes without ffmpeg — shared by
# read_video_any and retake.load_video_frames (duplicated lists drift).
PIL_SUFFIXES = (".gif", ".webp", ".apng", ".png")
PURE_PYTHON_SUFFIXES = PIL_SUFFIXES + (".y4m", ".avi")


def _cv2_or_none():
    """OpenCV ships a bundled FFMPEG in this image — a full decoder for
    H.264/VP9/... mp4/webm/mkv without any external binary. Gated import:
    absent cv2 degrades to the ffmpeg-pipe path."""
    try:
        import cv2  # type: ignore

        return cv2
    except Exception:
        return None


def read_cv2(path: str, height: int, width: int, num_frames: int) -> np.ndarray:
    """Decode any cv2/FFMPEG-supported video -> (1, 3, F, H, W) in [-1, 1]."""
    cv2 = _cv2_or_none()
    if cv2 is None:
        raise RuntimeError("OpenCV not available")
    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise ValueError(f"OpenCV could not open {path}")
    frames = []
    try:
        while len(frames) < num_frames:
            ok, bgr = cap.read()
            if not ok:
                break
            frames.append(bgr[:, :, ::-1])  # BGR -> RGB
    finally:
        cap.release()
    if not frames:
        raise ValueError(f"no frames decoded from {path}")
    return _pack(frames, height, width, num_frames)


def probe_cv2(path: str):
    """(fps, num_frames, height, width) via OpenCV's demuxer."""
    cv2 = _cv2_or_none()
    if cv2 is None:
        raise RuntimeError("OpenCV not available")
    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise ValueError(f"OpenCV could not open {path}")
    try:
        fps = cap.get(cv2.CAP_PROP_FPS) or 24.0
        n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
        w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    finally:
        cap.release()
    if n <= 0:  # some streams don't report a count: walk the frames
        cap = cv2.VideoCapture(path)
        n = 0
        try:
            while cap.read()[0]:
                n += 1
        finally:
            cap.release()
    if n <= 0 or h <= 0 or w <= 0:
        raise ValueError(f"OpenCV could not probe {path}")
    return float(fps), n, h, w


def decodes_pure_python(path: str) -> bool:
    """True when this file decodes without ffmpeg: the always-pure formats
    plus mov/mp4 whose video track is MJPEG (this framework's own
    no-ffmpeg output)."""
    suffix = Path(path).suffix.lower()
    if suffix in PURE_PYTHON_SUFFIXES:
        return True
    if suffix in (".mov", ".mp4", ".m4v"):
        try:
            return mov_is_mjpeg(path)
        except (ValueError, OSError):
            return False
    return False


def read_video_any(
    path: str, height: int, width: int, num_frames: int
) -> np.ndarray:
    """Dispatch: pure-Python readers for GIF/WebP/APNG/y4m/AVI-MJPEG and
    MJPEG mov/mp4 (this framework's own no-ffmpeg outputs), ffmpeg pipe
    for everything else (H.264 mp4 / webm / ...)."""
    suffix = Path(path).suffix.lower()
    if suffix == ".y4m":
        return read_y4m(path, height, width, num_frames)
    if suffix == ".avi":
        return read_avi_mjpeg(path, height, width, num_frames)
    if suffix in PIL_SUFFIXES:
        return read_pil_animation(path, height, width, num_frames)
    if suffix in (".mov", ".mp4", ".m4v"):
        try:
            is_mjpeg = mov_is_mjpeg(path)
        except (ValueError, OSError):
            is_mjpeg = False
        if is_mjpeg:
            return read_mov_mjpeg(path, height, width, num_frames)
    if _cv2_or_none() is not None:
        return read_cv2(path, height, width, num_frames)
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


# ---------------------------------------------------------------------------
# ISO-BMFF (QuickTime .mov / ISO .mp4) MJPEG + PCM muxer and demuxer
# ---------------------------------------------------------------------------
# The reference's default output is an .mp4 (its CLI muxes H.264 via an
# external ffmpeg binary, reference generate.py:2153-2362). Without ffmpeg
# this framework previously honored only .avi/.y4m; a user asking for
# out.mp4 / out.mov got a renamed-AVI fallback. These functions write the
# REAL requested container with stdlib + PIL only:
#
# - .mov: QuickTime brand, video sample entry 'jpeg' (the QuickTime
#   Motion-JPEG codec every player ships) + 'sowt' 16-bit LE PCM audio.
# - .mp4: 'isom' brand, video sample entry 'mp4v' with an esds
#   DecoderConfigDescriptor carrying objectTypeIndication 0x6C (JPEG per
#   ISO/IEC 14496-1 table 5) — the same tagging ffmpeg uses when muxing
#   mjpeg into mp4 — plus the same 'sowt' PCM audio track (QuickTime-style
#   PCM-in-mp4; accepted by ffmpeg/VLC/mpv).
#
# One file, with sound, no external binaries; the readers below are the
# exact inverse so framework outputs feed back into retake / a2vid /
# corpus ingestion like the AVI path does.


def _box(box_type: bytes, payload: bytes) -> bytes:
    import struct

    return struct.pack(">I", 8 + len(payload)) + box_type + payload


def _full_box(box_type: bytes, version: int, flags: int, payload: bytes) -> bytes:
    import struct

    return _box(box_type, struct.pack(">I", (version << 24) | flags) + payload)


def _esds_mjpeg() -> bytes:
    """Elementary-stream descriptor for MJPEG video in MP4.

    objectTypeIndication 0x6C = JPEG (ISO/IEC 14496-1), streamType 4
    (visual). Single-byte descriptor lengths (all payloads < 128)."""
    import struct

    dec_cfg = struct.pack(">BB3xII", 0x6C, (4 << 2) | 1, 0, 0)  # tag 4 payload
    sl_cfg = b"\x02"  # tag 6 payload: predefined = 2 (MP4)
    inner = (
        bytes([0x04, len(dec_cfg)]) + dec_cfg + bytes([0x06, len(sl_cfg)]) + sl_cfg
    )
    es = struct.pack(">HB", 1, 0) + inner  # ES_ID=1, no flags
    return _full_box(b"esds", 0, 0, bytes([0x03, len(es)]) + es)


def _visual_sample_entry(fourcc: bytes, w: int, h: int, extra: bytes = b"") -> bytes:
    import struct

    name = b"Motion JPEG"
    compressor = bytes([len(name)]) + name + b"\x00" * (31 - len(name))
    payload = (
        b"\x00" * 6
        + struct.pack(">H", 1)  # data_reference_index
        + b"\x00" * 16  # pre_defined / reserved
        + struct.pack(">HH", w, h)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + b"\x00" * 4
        + struct.pack(">H", 1)  # frame_count per sample
        + compressor
        + struct.pack(">Hh", 24, -1)  # depth, pre_defined
        + extra
    )
    return _box(fourcc, payload)


def _sound_sample_entry_sowt(channels: int, sample_rate: int) -> bytes:
    """QuickTime version-0 'sowt' (16-bit little-endian PCM) entry.

    The 16.16 fixed-point rate field caps at 65535 Hz — enough for every
    rate this framework emits (24 kHz vocoder, 48 kHz BWE)."""
    import struct

    if not 0 < sample_rate < 0x10000:
        raise ValueError(f"sample_rate {sample_rate} does not fit 16.16 fixed")
    payload = (
        b"\x00" * 6
        + struct.pack(">H", 1)  # data_reference_index
        + struct.pack(">HH4x", 0, 0)  # version 0, revision, vendor
        + struct.pack(">HHHH", channels, 16, 0, 0)
        + struct.pack(">I", sample_rate << 16)  # 16.16 fixed
    )
    return _box(b"sowt", payload)


_MOV_MATRIX = (
    b"\x00\x01\x00\x00" + b"\x00" * 12 + b"\x00\x01\x00\x00" + b"\x00" * 12
    + b"\x40\x00\x00\x00"
)  # identity 3x3 in 16.16 / 2.30 fixed point


def _tkhd(track_id: int, duration_mv: int, w: int = 0, h: int = 0,
          volume: int = 0) -> bytes:
    import struct

    payload = (
        struct.pack(">II", 0, 0)  # creation/modification
        + struct.pack(">I4xI8x", track_id, duration_mv)
        + struct.pack(">HHH2x", 0, 0, volume)  # layer, alt_group, volume
        + _MOV_MATRIX
        + struct.pack(">II", w << 16, h << 16)
    )
    return _full_box(b"tkhd", 0, 7, payload)  # enabled | in_movie | in_preview


def _mdhd(timescale: int, duration: int) -> bytes:
    import struct

    return _full_box(
        b"mdhd", 0, 0,
        struct.pack(">IIIIHH", 0, 0, timescale, duration, 0x55C4, 0),  # 'und'
    )


def _hdlr(handler: bytes, name: bytes) -> bytes:
    return _full_box(b"hdlr", 0, 0, b"\x00" * 4 + handler + b"\x00" * 12
                     + name + b"\x00")


def _dinf() -> bytes:
    url = _full_box(b"url ", 0, 1, b"")  # flag 1: data in this file
    import struct

    return _box(b"dinf", _full_box(b"dref", 0, 0, struct.pack(">I", 1) + url))


def _stbl(sample_entry: bytes, sample_count: int, sample_delta: int,
          sample_sizes, chunk_offset: int) -> bytes:
    """Sample table for the single-chunk layout this muxer writes: all of a
    track's samples live in ONE contiguous mdat chunk."""
    import struct

    stsd = _full_box(b"stsd", 0, 0, struct.pack(">I", 1) + sample_entry)
    stts = _full_box(b"stts", 0, 0,
                     struct.pack(">III", 1, sample_count, sample_delta))
    stsc = _full_box(b"stsc", 0, 0,
                     struct.pack(">IIII", 1, 1, sample_count, 1))
    if isinstance(sample_sizes, int):  # constant-size samples (PCM)
        stsz = _full_box(b"stsz", 0, 0,
                         struct.pack(">II", sample_sizes, sample_count))
    else:
        stsz = _full_box(
            b"stsz", 0, 0,
            struct.pack(">II", 0, len(sample_sizes))
            + b"".join(struct.pack(">I", s) for s in sample_sizes),
        )
    stco = _full_box(b"stco", 0, 0, struct.pack(">II", 1, chunk_offset))
    return _box(b"stbl", stsd + stts + stsc + stsz + stco)


def write_mp4_mjpeg(
    path: str,
    frames_u8: np.ndarray,
    fps: float,
    audio: np.ndarray | None = None,
    sample_rate: int = 24000,
    quality: int = 92,
) -> None:
    """Write (F, H, W, 3) uint8 RGB as a .mov / .mp4 (by suffix) with
    MJPEG video and optional 16-bit PCM ('sowt') audio — pure Python.

    audio: float32 in [-1, 1], (N,), (C, N) or (1, C, N)."""
    import io
    import struct

    from PIL import Image

    frames_u8 = np.asarray(frames_u8, np.uint8)
    if frames_u8.ndim != 4 or frames_u8.shape[-1] != 3:
        raise ValueError(f"expected (F, H, W, 3) uint8, got {frames_u8.shape}")
    num_frames, h, w, _ = frames_u8.shape
    is_mov = path.lower().endswith(".mov")

    jpegs = []
    for frame in frames_u8:
        buf = io.BytesIO()
        Image.fromarray(frame).save(buf, format="JPEG", quality=quality)
        jpegs.append(buf.getvalue())
    video_bytes = b"".join(jpegs)

    pcm = b""
    channels = 0
    pcm_frames = 0
    if audio is not None:
        a = np.asarray(audio, np.float32)
        if a.ndim == 3:
            a = a[0]
        if a.ndim == 1:
            a = a[None]
        channels = a.shape[0]
        pcm_i16 = np.clip(np.round(a.T * 32767.0), -32768, 32767).astype("<i2")
        pcm_frames = pcm_i16.shape[0]
        pcm = pcm_i16.tobytes()

    # Timescales: video uses round(fps*1000) ticks/s with delta 1000 (exact
    # for NTSC rates like 29.97); movie header uses 1000; audio uses the
    # sample rate with delta 1.
    v_timescale = max(1, int(round(fps * 1000)))
    v_delta = 1000
    v_duration = num_frames * v_delta
    mv_timescale = 1000
    mv_duration = int(round(num_frames / fps * mv_timescale)) if fps else 0
    if pcm_frames:
        mv_duration = max(
            mv_duration, int(round(pcm_frames / sample_rate * mv_timescale))
        )

    if is_mov:
        ftyp = _box(b"ftyp", b"qt  " + struct.pack(">I", 0x20050300) + b"qt  ")
        v_entry = _visual_sample_entry(b"jpeg", w, h)
    else:
        ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200)
                    + b"isom" + b"mp41")
        v_entry = _visual_sample_entry(b"mp4v", w, h, extra=_esds_mjpeg())

    # mdat: [all jpeg samples][pcm] — offsets are absolute file offsets.
    mdat_payload_off = len(ftyp) + 8
    video_chunk_off = mdat_payload_off
    audio_chunk_off = mdat_payload_off + len(video_bytes)
    mdat = _box(b"mdat", video_bytes + pcm)

    mvhd = _full_box(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, mv_timescale, mv_duration)
        + struct.pack(">IH2x8x", 0x00010000, 0x0100)  # rate 1.0, volume 1.0
        + _MOV_MATRIX
        + b"\x00" * 24
        + struct.pack(">I", 3 if pcm_frames else 2),  # next_track_ID
    )

    v_minf = _box(
        b"minf",
        _full_box(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
        + _dinf()
        + _stbl(v_entry, num_frames, v_delta,
                [len(j) for j in jpegs], video_chunk_off),
    )
    v_mdia = _box(
        b"mdia",
        _mdhd(v_timescale, v_duration)
        + _hdlr(b"vide", b"VideoHandler")
        + v_minf,
    )
    traks = _box(b"trak", _tkhd(1, mv_duration, w, h) + v_mdia)

    if pcm_frames:
        a_entry = _sound_sample_entry_sowt(channels, sample_rate)
        a_minf = _box(
            b"minf",
            _full_box(b"smhd", 0, 0, struct.pack(">Hxx", 0))
            + _dinf()
            + _stbl(a_entry, pcm_frames, 1, 2 * channels, audio_chunk_off),
        )
        a_mdia = _box(
            b"mdia",
            _mdhd(sample_rate, pcm_frames)
            + _hdlr(b"soun", b"SoundHandler")
            + a_minf,
        )
        traks += _box(b"trak", _tkhd(2, mv_duration, volume=0x0100) + a_mdia)

    moov = _box(b"moov", mvhd + traks)
    with open(path, "wb") as fh:
        fh.write(ftyp)
        fh.write(mdat)
        fh.write(moov)


def _mov_boxes(data: bytes, start: int, end: int):
    """Yield (type, body_start, box_end) for each ISO-BMFF box in a span.

    Handles 64-bit largesize and size==0 (extends to end)."""
    import struct

    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", data, pos)
        typ = data[pos + 4 : pos + 8]
        hdr = 8
        if size == 1:
            if pos + 16 > end:
                return
            (size,) = struct.unpack_from(">Q", data, pos + 8)
            hdr = 16
        elif size == 0:
            size = end - pos
        if size < hdr or pos + size > end:
            return
        yield typ, pos + hdr, pos + size
        pos += size


def _mov_find(data: bytes, start: int, end: int, *path: bytes):
    """First box matching a nested type path; returns (body, end) or None."""
    for typ, body, box_end in _mov_boxes(data, start, end):
        if typ == path[0]:
            if len(path) == 1:
                return body, box_end
            return _mov_find(data, body, box_end, *path[1:])
    return None


def _read_moov_bytes(path: str) -> bytes:
    """Read ONLY the moov box (header included) by seeking over top-level
    boxes — codec/geometry probes must not slurp a multi-GB mdat into RAM
    just to inspect a few-KB header (review r4: the corpus-ingestion path
    probed every .mp4 by reading the whole file)."""
    import struct as _struct

    with open(path, "rb") as fh:
        fh.seek(0, 2)
        file_end = fh.tell()
        pos = 0
        while pos + 8 <= file_end:
            fh.seek(pos)
            hdr = fh.read(16)
            if len(hdr) < 8:
                break
            (size,) = _struct.unpack_from(">I", hdr, 0)
            typ = hdr[4:8]
            if size == 1:
                if len(hdr) < 16:
                    break
                (size,) = _struct.unpack_from(">Q", hdr, 8)
            elif size == 0:
                size = file_end - pos
            if size < 8 or pos + size > file_end:
                break
            if typ == b"moov":
                fh.seek(pos)
                return fh.read(size)
            pos += size
    raise ValueError(f"{path}: not an ISO-BMFF (mov/mp4) file: no moov box")


def _mdhd_timescale(mdhd: bytes) -> int:
    """Media timescale honoring the mdhd version byte: version 1 uses
    64-bit creation/modification times, shifting the timescale from
    offset 12 to 20 (review r4: the fixed-12 read returned the low half
    of a timestamp for version-1 files)."""
    import struct as _struct

    offset = 20 if mdhd[0] == 1 else 12
    (timescale,) = _struct.unpack_from(">I", mdhd, offset)
    return timescale


def _mov_tracks(data: bytes):
    """Yield (handler, stbl_span, mdhd_payload) per trak in the moov."""
    moov = _mov_find(data, 0, len(data), b"moov")
    if moov is None:
        raise ValueError("not an ISO-BMFF (mov/mp4) file: no moov box")
    for typ, body, box_end in _mov_boxes(data, *moov):
        if typ != b"trak":
            continue
        mdia = _mov_find(data, body, box_end, b"mdia")
        if mdia is None:
            continue
        hdlr = _mov_find(data, *mdia, b"hdlr")
        mdhd = _mov_find(data, *mdia, b"mdhd")
        stbl = _mov_find(data, *mdia, b"minf", b"stbl")
        if hdlr is None or stbl is None or mdhd is None:
            continue
        handler = data[hdlr[0] + 8 : hdlr[0] + 12]
        yield handler, stbl, data[mdhd[0] : mdhd[1]]


def _mov_sample_table(data: bytes, stbl):
    """Parse one track's sample tables into (entry_fourcc, entry_payload,
    sample_offsets, sample_sizes, stts_entries, timescale_from_caller)."""
    import struct

    stsd = _mov_find(data, *stbl, b"stsd")
    stts = _mov_find(data, *stbl, b"stts")
    stsc = _mov_find(data, *stbl, b"stsc")
    stsz = _mov_find(data, *stbl, b"stsz")
    stco = _mov_find(data, *stbl, b"stco")
    co64 = _mov_find(data, *stbl, b"co64")
    if stsd is None or stsc is None or stsz is None or (stco is None and co64 is None):
        raise ValueError("mov/mp4 track is missing required sample tables")

    # stsd: first sample entry only (multi-entry tracks are exotic).
    entry_off = stsd[0] + 8  # version/flags + entry_count
    (entry_size,) = struct.unpack_from(">I", data, entry_off)
    fourcc = data[entry_off + 4 : entry_off + 8]
    entry_payload = data[entry_off + 8 : entry_off + entry_size]

    if stco is not None:
        (n_chunks,) = struct.unpack_from(">I", data, stco[0] + 4)
        chunk_offsets = list(
            struct.unpack_from(f">{n_chunks}I", data, stco[0] + 8)
        )
    else:
        (n_chunks,) = struct.unpack_from(">I", data, co64[0] + 4)
        chunk_offsets = list(
            struct.unpack_from(f">{n_chunks}Q", data, co64[0] + 8)
        )

    const_size, n_samples = struct.unpack_from(">II", data, stsz[0] + 4)
    if const_size:
        sizes = [const_size] * n_samples
    else:
        sizes = list(struct.unpack_from(f">{n_samples}I", data, stsz[0] + 12))

    (n_stsc,) = struct.unpack_from(">I", data, stsc[0] + 4)
    stsc_entries = [
        struct.unpack_from(">III", data, stsc[0] + 8 + 12 * i)
        for i in range(n_stsc)
    ]
    # Expand samples-per-chunk runs, then walk chunks accumulating offsets.
    spc: list = []
    for i, (first, per, _desc) in enumerate(stsc_entries):
        last = (
            stsc_entries[i + 1][0] - 1 if i + 1 < len(stsc_entries) else n_chunks
        )
        spc.extend([per] * max(0, last - first + 1))
    offsets = []
    si = 0
    for ci, chunk_off in enumerate(chunk_offsets):
        off = chunk_off
        for _ in range(spc[ci] if ci < len(spc) else 0):
            if si >= n_samples:
                break
            offsets.append(off)
            off += sizes[si]
            si += 1

    stts_entries = []
    if stts is not None:
        (n_stts,) = struct.unpack_from(">I", data, stts[0] + 4)
        stts_entries = [
            struct.unpack_from(">II", data, stts[0] + 8 + 8 * i)
            for i in range(n_stts)
        ]
    return fourcc, entry_payload, offsets, sizes, stts_entries


_MOV_JPEG_FOURCCS = (b"jpeg", b"mjpa", b"AVDJ", b"dmb1")
_VISUAL_ENTRY_FIXED = 78  # bytes of VisualSampleEntry before extension boxes


def _desc_len(buf: bytes, pos: int):
    """MPEG-4 descriptor length: 7 bits per byte, MSB = continuation."""
    length = 0
    while pos < len(buf):
        b = buf[pos]
        pos += 1
        length = (length << 7) | (b & 0x7F)
        if not b & 0x80:
            break
    return length, pos


def _esds_oti(entry_payload: bytes):
    """objectTypeIndication from an mp4v entry's esds extension box
    (0x6C = JPEG, 0x20 = MPEG-4 Visual, ...), or None."""
    for typ, body, end in _mov_boxes(
        entry_payload, _VISUAL_ENTRY_FIXED, len(entry_payload)
    ):
        if typ != b"esds":
            continue
        buf = entry_payload[body:end]
        pos = 4  # version/flags
        if pos >= len(buf) or buf[pos] != 0x03:  # ES_Descriptor
            return None
        _, pos = _desc_len(buf, pos + 1)
        if pos + 3 > len(buf):
            return None
        es_flags = buf[pos + 2]
        pos += 3  # ES_ID + flags/priority
        if es_flags & 0x80:  # streamDependenceFlag
            pos += 2
        if es_flags & 0x40:  # URL_Flag
            if pos >= len(buf):
                return None
            pos += 1 + buf[pos]
        if es_flags & 0x20:  # OCRstreamFlag
            pos += 2
        if pos >= len(buf) or buf[pos] != 0x04:  # DecoderConfigDescriptor
            return None
        _, pos = _desc_len(buf, pos + 1)
        return buf[pos] if pos < len(buf) else None
    return None


def _entry_is_mjpeg(fourcc: bytes, entry_payload: bytes) -> bool:
    """True when a video sample entry carries Motion-JPEG. 'mp4v' is
    ambiguous (cv2's MPEG-4 Part 2 writer uses it too) — the esds
    objectTypeIndication disambiguates (0x6C = JPEG)."""
    if fourcc in _MOV_JPEG_FOURCCS:
        return True
    if fourcc == b"mp4v":
        return _esds_oti(entry_payload) == 0x6C
    return False


def mov_video_codec(path: str) -> bytes | None:
    """The video track's sample-entry fourcc (b'jpeg', b'avc1', ...), or
    None if the file has no video track."""
    data = _read_moov_bytes(path)
    for handler, stbl, _mdhd in _mov_tracks(data):
        if handler == b"vide":
            stsd = _mov_find(data, *stbl, b"stsd")
            if stsd is None:
                return None
            return data[stsd[0] + 12 : stsd[0] + 16]
    return None


def mov_is_mjpeg(path: str) -> bool:
    """Dispatch probe: does this mov/mp4's video track decode as MJPEG
    (pure Python), or does it need a real codec (cv2/ffmpeg)?"""
    data = _read_moov_bytes(path)
    for handler, stbl, _mdhd in _mov_tracks(data):
        if handler != b"vide":
            continue
        fourcc, entry, _offsets, _sizes, _stts = _mov_sample_table(data, stbl)
        return _entry_is_mjpeg(fourcc, entry)
    return False


def read_mov_mjpeg(
    path: str, height: int, width: int, num_frames: int
) -> np.ndarray:
    """MJPEG .mov/.mp4 -> (1, 3, F, H, W) in [-1, 1]; inverse of
    write_mp4_mjpeg (and reads any player-produced MJPEG mov/mp4)."""
    import io

    from PIL import Image

    with open(path, "rb") as fh:
        data = fh.read()
    for handler, stbl, _mdhd in _mov_tracks(data):
        if handler != b"vide":
            continue
        fourcc, entry, offsets, sizes, _stts = _mov_sample_table(data, stbl)
        if not _entry_is_mjpeg(fourcc, entry):
            raise ValueError(
                f"{path}: video codec {fourcc!r} is not MJPEG "
                "(only MJPEG mov/mp4 decode without ffmpeg)"
            )
        frames = []
        for off, size in zip(offsets, sizes):
            payload = data[off : off + size]
            if not payload.startswith(b"\xff\xd8"):
                raise ValueError(f"{path}: sample at {off} is not a JPEG")
            with Image.open(io.BytesIO(payload)) as img:
                frames.append(np.asarray(img.convert("RGB"), np.uint8))
            if len(frames) >= num_frames:
                break
        if not frames:
            raise ValueError(f"no MJPEG frames decoded from {path}")
        return _pack(frames, height, width, num_frames)
    raise ValueError(f"{path}: no video track")


def read_mov_audio(path: str):
    """Extract the PCM audio track from a .mov/.mp4.

    Returns (audio, sample_rate) with audio float32 (channels, N) in
    [-1, 1], or None if there is no PCM ('sowt'/'twos') audio track."""
    import struct

    with open(path, "rb") as fh:
        data = fh.read()
    for handler, stbl, mdhd in _mov_tracks(data):
        if handler != b"soun":
            continue
        fourcc, entry, offsets, sizes, _stts = _mov_sample_table(data, stbl)
        if fourcc not in (b"sowt", b"twos"):
            return None
        # Version-0 sound entry: channels @ +16, bits @ +18 (after the
        # 8-byte reserved/dref prefix).
        channels, bits = struct.unpack_from(">HH", entry, 16)
        if bits != 16 or channels == 0:
            return None
        timescale = _mdhd_timescale(mdhd)
        raw = b"".join(data[o : o + s] for o, s in zip(offsets, sizes))
        dtype = "<i2" if fourcc == b"sowt" else ">i2"
        pcm = np.frombuffer(raw, dtype)
        n = len(pcm) // channels
        audio = (
            pcm[: n * channels].reshape(n, channels).T.astype(np.float32)
            / 32767.0
        )
        return audio, int(timescale)
    return None


def probe_mov(path: str):
    """(fps, num_frames, height, width) for a .mov/.mp4 — any codec (the
    sample tables are codec-independent)."""
    import struct

    data = _read_moov_bytes(path)
    for handler, stbl, mdhd in _mov_tracks(data):
        if handler != b"vide":
            continue
        _fourcc, entry, offsets, _sizes, stts = _mov_sample_table(data, stbl)
        timescale = _mdhd_timescale(mdhd)
        w, h = struct.unpack_from(">HH", entry, 24)
        fps = 24.0
        if stts and stts[0][1]:
            fps = timescale / stts[0][1]
        return fps, len(offsets), int(h), int(w)
    raise ValueError(f"{path}: no video track")
