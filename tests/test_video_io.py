"""Pure-Python video ingestion (utils/video_io.py): GIF via PIL, y4m via
the stdlib parser — the corpus formats that work without ffmpeg."""

import numpy as np
import pytest

from ltx2_tpu.utils.video_io import (
    read_pil_animation,
    read_video_any,
    read_y4m,
)


def _write_gif(path, frames_u8):
    from PIL import Image

    imgs = [Image.fromarray(f) for f in frames_u8]
    imgs[0].save(
        str(path), save_all=True, append_images=imgs[1:], duration=40, loop=0
    )


def _write_y4m(path, frames_rgb_u8, colorspace="C420jpeg"):
    """RGB frames -> BT.601 limited-range y4m (the inverse of the reader)."""
    f, h, w, _ = frames_rgb_u8.shape
    with open(path, "wb") as fh:
        fh.write(f"YUV4MPEG2 W{w} H{h} F24:1 Ip A1:1 {colorspace}\n".encode())
        for frame in frames_rgb_u8:
            rgb = frame.astype(np.float32)
            r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
            y = 16 + (219 / 255) * (0.299 * r + 0.587 * g + 0.114 * b)
            u = 128 + (224 / 255) * (-0.169 * r - 0.331 * g + 0.5 * b)
            v = 128 + (224 / 255) * (0.5 * r - 0.419 * g - 0.081 * b)
            yp = np.clip(y, 0, 255).astype(np.uint8)
            if colorspace.startswith("C420"):
                u = u[::2, ::2]
                v = v[::2, ::2]
            up = np.clip(u, 0, 255).astype(np.uint8)
            vp = np.clip(v, 0, 255).astype(np.uint8)
            fh.write(b"FRAME\n")
            fh.write(yp.tobytes() + up.tobytes() + vp.tobytes())


def _gradient_frames(f, h, w):
    frames = np.zeros((f, h, w, 3), np.uint8)
    for i in range(f):
        frames[i, :, :, 0] = np.linspace(0, 255, w, dtype=np.uint8)[None, :]
        frames[i, :, :, 1] = np.linspace(0, 255, h, dtype=np.uint8)[:, None]
        frames[i, :, :, 2] = min(255, i * 30)
    return frames


class TestGif:
    def test_roundtrip_shape_and_values(self, tmp_path):
        frames = _gradient_frames(5, 16, 24)
        path = tmp_path / "clip.gif"
        _write_gif(path, frames)
        video = read_pil_animation(str(path), 16, 24, 5)
        assert video.shape == (1, 3, 5, 16, 24)
        assert video.dtype == np.float32
        # GIF is palettized (256 colors) — allow quantization error.
        decoded = ((video[0].transpose(1, 2, 3, 0) + 1) * 127.5).astype(np.int32)
        assert np.abs(decoded - frames.astype(np.int32)).max() <= 24

    def test_frame_padding_and_trim(self, tmp_path):
        frames = _gradient_frames(3, 8, 8)
        path = tmp_path / "clip.gif"
        _write_gif(path, frames)
        padded = read_pil_animation(str(path), 8, 8, 6)
        assert padded.shape == (1, 3, 6, 8, 8)
        np.testing.assert_array_equal(padded[:, :, 2], padded[:, :, 5])  # edge-repeat
        trimmed = read_pil_animation(str(path), 8, 8, 2)
        assert trimmed.shape == (1, 3, 2, 8, 8)

    def test_resize(self, tmp_path):
        frames = _gradient_frames(2, 16, 16)
        path = tmp_path / "clip.gif"
        _write_gif(path, frames)
        video = read_pil_animation(str(path), 8, 12, 2)
        assert video.shape == (1, 3, 2, 8, 12)


class TestY4M:
    @pytest.mark.parametrize("cs", ["C420jpeg", "C444"])
    def test_roundtrip(self, tmp_path, cs):
        frames = _gradient_frames(4, 16, 24)
        path = tmp_path / f"clip_{cs}.y4m"
        _write_y4m(path, frames, colorspace=cs)
        video = read_y4m(str(path), 16, 24, 4)
        assert video.shape == (1, 3, 4, 16, 24)
        decoded = ((video[0].transpose(1, 2, 3, 0) + 1) * 127.5).astype(np.int32)
        # YCbCr round trip + (420) chroma subsampling: small error on
        # smooth gradients, larger at chroma edges.
        tol = 40 if cs.startswith("C420") else 8
        assert np.abs(decoded - frames.astype(np.int32)).max() <= tol

    def test_bad_header_rejected(self, tmp_path):
        path = tmp_path / "bad.y4m"
        path.write_bytes(b"NOTAY4M\nFRAME\n")
        with pytest.raises(ValueError, match="not a YUV4MPEG2"):
            read_y4m(str(path), 8, 8, 1)

    def test_dispatch(self, tmp_path):
        frames = _gradient_frames(2, 8, 8)
        gif = tmp_path / "a.gif"
        _write_gif(gif, frames)
        assert read_video_any(str(gif), 8, 8, 2).shape == (1, 3, 2, 8, 8)
        y4m = tmp_path / "a.y4m"
        _write_y4m(y4m, frames)
        assert read_video_any(str(y4m), 8, 8, 2).shape == (1, 3, 2, 8, 8)
