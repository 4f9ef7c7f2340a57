"""Pure-Python video readers for corpus ingestion (no ffmpeg needed).

The reference shells out to ffmpeg for every video input; this image has
no ffmpeg, which left training-corpus ingestion pixel-npz/image-dir only
(r2 gap). These readers decode the formats Python can handle natively:

- animated GIF / WebP / APNG via PIL (`read_pil_animation`)
- YUV4MPEG2 (.y4m — the uncompressed interchange format every ffmpeg/
  x264 toolchain can emit) via a stdlib parser (`read_y4m`)

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


def read_y4m(path: str, height: int, width: int, num_frames: int) -> np.ndarray:
    """YUV4MPEG2 -> (1, 3, F, H, W) in [-1, 1]. Supports the common C420*
    (4:2:0) and C444 colorspaces, 8-bit."""
    with open(path, "rb") as fh:
        header = fh.readline().decode("ascii", "replace").strip()
        if not header.startswith("YUV4MPEG2"):
            raise ValueError(f"{path}: not a YUV4MPEG2 stream")
        w = h = None
        cs = "420"
        for token in header.split()[1:]:
            if token.startswith("W"):
                w = int(token[1:])
            elif token.startswith("H"):
                h = int(token[1:])
            elif token.startswith("C"):
                cs = token[1:]
        if not w or not h:
            raise ValueError(f"{path}: missing W/H in y4m header")
        import re as _re

        if _re.search(r"p(9|10|12|14|16)$", cs):
            # C420p10/p12/p16 etc: >8-bit samples double the plane bytes —
            # parsing them as 8-bit would desync the frame stream. (Plain
            # 'p' belongs to chroma-siting tags like 420jpeg/420paldv.)
            raise ValueError(f"{path}: only 8-bit y4m supported, got C{cs}")
        if cs.startswith("420"):
            sub, cw, ch = 2, (w + 1) // 2, (h + 1) // 2
        elif cs.startswith("444"):
            sub, cw, ch = 1, w, h
        else:
            raise ValueError(f"{path}: unsupported y4m colorspace C{cs}")
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


# Single source of truth for what decodes without ffmpeg — shared by
# read_video_any and retake.load_video_frames (duplicated lists drift).
PIL_SUFFIXES = (".gif", ".webp", ".apng", ".png")
PURE_PYTHON_SUFFIXES = PIL_SUFFIXES + (".y4m",)


def read_video_any(
    path: str, height: int, width: int, num_frames: int
) -> np.ndarray:
    """Dispatch: pure-Python readers for GIF/WebP/APNG/y4m, ffmpeg pipe for
    everything else (mp4/webm/mov/...)."""
    suffix = Path(path).suffix.lower()
    if suffix == ".y4m":
        return read_y4m(path, height, width, num_frames)
    if suffix in PIL_SUFFIXES:
        return read_pil_animation(path, height, width, num_frames)
    from ltx2_tpu.pipelines.retake import load_video_frames

    return load_video_frames(path, height, width, num_frames)
