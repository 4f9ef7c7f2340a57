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


class TestWriters:
    def test_y4m_writer_roundtrip(self, tmp_path):
        """write_y4m (C444) -> read_y4m recovers frames within the BT.601
        limited-range quantization (219/255 scale ~= 1.16 full-range counts
        per limited count; two roundings -> up to +-3 counts on 8-bit)."""
        from ltx2_tpu.utils.video_io import write_y4m

        frames = _gradient_frames(3, 10, 14)
        path = str(tmp_path / "out.y4m")
        write_y4m(path, frames, fps=24.0)
        video = read_y4m(path, 10, 14, 3)
        decoded = ((video[0].transpose(1, 2, 3, 0) + 1) * 127.5).astype(np.int32)
        assert np.abs(decoded - frames.astype(np.int32)).max() <= 3

    def test_y4m_writer_header(self, tmp_path):
        from ltx2_tpu.utils.video_io import write_y4m

        path = str(tmp_path / "hdr.y4m")
        write_y4m(path, _gradient_frames(1, 6, 8), fps=30000 / 1001)
        header = open(path, "rb").readline().decode()
        assert "W8" in header and "H6" in header and "C444" in header
        assert "F30000:1001" in header

    def test_avi_writer_structure_and_jpeg(self, tmp_path):
        """RIFF/AVI layout: fourccs present, header geometry/counts right,
        idx1 consistent, and the first 00dc chunk decodes via PIL to the
        original frame within JPEG tolerance."""
        import io
        import struct

        from PIL import Image

        from ltx2_tpu.utils.video_io import write_avi_mjpeg

        frames = _gradient_frames(4, 16, 24)
        audio = np.sin(np.linspace(0, 40, 4000, dtype=np.float32))[None] * 0.5
        path = str(tmp_path / "out.avi")
        write_avi_mjpeg(path, frames, fps=12.0, audio=audio, sample_rate=24000)
        data = open(path, "rb").read()

        assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
        assert struct.unpack("<I", data[4:8])[0] == len(data) - 8
        # MainAVIHeader: frame count, stream count, geometry.
        avih_at = data.index(b"avih") + 8
        fields = struct.unpack("<14I", data[avih_at : avih_at + 56])
        assert fields[4] == 4  # dwTotalFrames
        assert fields[6] == 2  # dwStreams (video + audio)
        assert fields[8] == 24 and fields[9] == 16  # width, height
        assert b"vids" in data and b"MJPG" in data and b"auds" in data

        # idx1 entries: 4 video + 4 audio chunks, keyframe-flagged.
        idx_at = data.index(b"idx1")
        idx_size = struct.unpack("<I", data[idx_at + 4 : idx_at + 8])[0]
        assert idx_size == 8 * 16
        movi_at = data.index(b"movi")
        first = struct.unpack("<4s3I", data[idx_at + 8 : idx_at + 24])
        assert first[0] == b"00dc" and first[1] == 0x10

        # Decode the first video chunk: offset is relative to 'movi'.
        chunk_at = movi_at + first[2]
        assert data[chunk_at : chunk_at + 4] == b"00dc"
        size = struct.unpack("<I", data[chunk_at + 4 : chunk_at + 8])[0]
        jpeg = data[chunk_at + 8 : chunk_at + 8 + size]
        img = np.asarray(Image.open(io.BytesIO(jpeg)).convert("RGB"), np.int32)
        assert img.shape == (16, 24, 3)
        assert np.abs(img - frames[0].astype(np.int32)).mean() < 8

        # Audio chunks carry the full PCM stream.
        pcm_bytes = 0
        at = idx_at + 8
        for _ in range(8):
            cc, _fl, _off, sz = struct.unpack("<4s3I", data[at : at + 16])
            if cc == b"01wb":
                pcm_bytes += sz
            at += 16
        assert pcm_bytes == 4000 * 2  # mono int16

    def test_avi_reader_roundtrip(self, tmp_path):
        """write_avi_mjpeg -> read_avi_mjpeg recovers the frames within
        JPEG tolerance, and read_avi_audio recovers the PCM track."""
        from ltx2_tpu.utils.video_io import (
            read_avi_audio,
            read_avi_mjpeg,
            write_avi_mjpeg,
        )

        frames = _gradient_frames(4, 16, 24)
        audio = np.stack(
            [
                np.sin(np.linspace(0, 40, 4000, dtype=np.float32)) * 0.5,
                np.cos(np.linspace(0, 20, 4000, dtype=np.float32)) * 0.25,
            ]
        )
        path = str(tmp_path / "rt.avi")
        write_avi_mjpeg(path, frames, fps=12.0, audio=audio, sample_rate=24000)

        video = read_avi_mjpeg(path, 16, 24, 4)
        assert video.shape == (1, 3, 4, 16, 24)
        decoded = ((video[0].transpose(1, 2, 3, 0) + 1) * 127.5).astype(np.int32)
        assert np.abs(decoded - frames.astype(np.int32)).mean() < 8

        out = read_avi_audio(path)
        assert out is not None
        pcm, rate = out
        assert rate == 24000
        assert pcm.shape == (2, 4000)
        assert np.abs(pcm - audio).max() < 2e-4  # int16 quantization

        # Padding/trim semantics match the other readers.
        assert read_avi_mjpeg(path, 16, 24, 6).shape == (1, 3, 6, 16, 24)
        assert read_avi_mjpeg(path, 16, 24, 2).shape == (1, 3, 2, 16, 24)

    def test_avi_reader_no_audio(self, tmp_path):
        from ltx2_tpu.utils.video_io import read_avi_audio, write_avi_mjpeg

        path = str(tmp_path / "na.avi")
        write_avi_mjpeg(path, _gradient_frames(2, 8, 8), fps=24.0)
        assert read_avi_audio(path) is None

    def test_avi_reader_ignores_second_stream_dc_chunks(self, tmp_path):
        """A multi-stream AVI (main video + preview/second stream) must
        decode only the declared video stream's chunks — interleaving every
        'dc' chunk garbles the sequence (review r4). Inject a non-JPEG
        '01dc' chunk into the movi LIST: the reader must skip it, not
        raise 'not MJPEG' or splice it in."""
        import struct

        from ltx2_tpu.utils.video_io import read_avi_mjpeg, write_avi_mjpeg

        frames = _gradient_frames(3, 16, 24)
        path = tmp_path / "multi.avi"
        write_avi_mjpeg(str(path), frames, fps=12.0)
        baseline = read_avi_mjpeg(str(path), 16, 24, 3)

        raw = bytearray(path.read_bytes())
        mi = raw.find(b"movi")
        list_hdr = mi - 8
        (movi_size,) = struct.unpack_from("<I", raw, list_hdr + 4)
        # Insert FIRST in the movi body — an interleaved second stream puts
        # its chunks before/between the video frames, and the old
        # accept-any-'dc' reader tripped on the very first one.
        chunk = b"01dc" + struct.pack("<I", 4) + b"\x00\x00\x00\x00"
        insert_at = mi + 4
        raw[insert_at:insert_at] = chunk
        struct.pack_into("<I", raw, list_hdr + 4, movi_size + len(chunk))
        (riff_size,) = struct.unpack_from("<I", raw, 4)
        struct.pack_into("<I", raw, 4, riff_size + len(chunk))
        path.write_bytes(bytes(raw))

        video = read_avi_mjpeg(str(path), 16, 24, 3)
        np.testing.assert_array_equal(video, baseline)

    def test_avi_dispatch_and_probe(self, tmp_path):
        from ltx2_tpu.pipelines.retake import get_video_metadata
        from ltx2_tpu.utils.video_io import probe_video, write_avi_mjpeg, write_y4m

        frames = _gradient_frames(3, 16, 24)
        avi = tmp_path / "p.avi"
        write_avi_mjpeg(str(avi), frames, fps=12.0)
        assert read_video_any(str(avi), 16, 24, 3).shape == (1, 3, 3, 16, 24)
        fps, n, h, w = probe_video(str(avi))
        assert (n, h, w) == (3, 16, 24) and abs(fps - 12.0) < 0.01

        y4m = tmp_path / "p.y4m"
        write_y4m(str(y4m), frames, fps=24.0)
        fps, n, h, w = probe_video(str(y4m))
        assert (n, h, w) == (3, 16, 24) and abs(fps - 24.0) < 0.01

        gif = tmp_path / "p.gif"
        _write_gif(gif, frames)
        fps, n, h, w = probe_video(str(gif))
        assert (n, h, w) == (3, 16, 24) and fps > 0

        # retake's metadata entry point takes the pure-Python path (no
        # ffprobe in this image).
        fps, n, h, w = get_video_metadata(str(avi))
        assert (n, h, w) == (3, 16, 24)

    def test_a2vid_loads_avi_audio(self, tmp_path):
        """a2vid's load_audio_file accepts an AVI (drive generation from a
        previous clip's own soundtrack) — resampled like any other source."""
        from ltx2_tpu.pipelines.a2vid_two_stage import load_audio_file
        from ltx2_tpu.utils.video_io import write_avi_mjpeg

        audio = np.sin(np.linspace(0, 50, 48000, dtype=np.float32))[None] * 0.4
        path = str(tmp_path / "src.avi")
        write_avi_mjpeg(
            path, _gradient_frames(3, 8, 8), fps=12.0,
            audio=audio, sample_rate=24000,
        )
        data, sr = load_audio_file(path, target_sr=16000)
        assert sr == 16000 and data.shape == (1, 32000)

    def test_avi_non_mjpeg_rejected(self, tmp_path):
        """A non-JPEG video payload raises instead of mis-decoding."""
        import struct

        from ltx2_tpu.utils.video_io import read_avi_mjpeg, write_avi_mjpeg

        path = str(tmp_path / "x.avi")
        write_avi_mjpeg(path, _gradient_frames(1, 8, 8), fps=24.0)
        data = bytearray(open(path, "rb").read())
        movi_at = data.index(b"movi")
        dc_at = data.index(b"00dc", movi_at)
        data[dc_at + 8 : dc_at + 10] = b"\x00\x00"  # corrupt JPEG SOI
        open(path, "wb").write(bytes(data))
        import pytest as _pytest

        with _pytest.raises(ValueError, match="not MJPEG"):
            read_avi_mjpeg(path, 8, 8, 1)

    def test_avi_audio_probe_ignores_payload_bytes(self, tmp_path):
        """Frame payload bytes spelling 'auds'/'strf' (plus an orphan
        '01wb' chunk) must not fabricate an audio track: read_avi_audio
        parses the hdrl stream headers, not raw byte scans."""
        import struct

        from ltx2_tpu.utils.video_io import _chunk, _list_chunk, read_avi_audio

        avih = struct.pack(
            "<14I", 41667, 0, 0, 0x10, 1, 0, 1, 0, 8, 8, 0, 0, 0, 0
        )
        strh_v = struct.pack(
            "<4s4sI2H8I4H",
            b"vids", b"MJPG", 0, 0, 0, 0, 1000, 24000, 0, 1,
            64, 0xFFFFFFFF, 0, 0, 0, 8, 8,
        )
        strf_v = struct.pack(
            "<I2i2H2I2i2I", 40, 8, 8, 1, 24,
            struct.unpack("<I", b"MJPG")[0], 192, 0, 0, 0, 0,
        )
        hdrl = _list_chunk(
            b"hdrl",
            _chunk(b"avih", avih)
            + _list_chunk(b"strl", _chunk(b"strh", strh_v) + _chunk(b"strf", strf_v)),
        )
        # Adversarial 'frame' bytes: a fake auds marker followed by a fake
        # strf whose bytes decode as PCM/16-bit WAVEFORMATEX — exactly what
        # a raw data.find(b"auds") scan would misparse as a stream header.
        evil = (
            b"auds" + b"\x00" * 8
            + b"strf" + struct.pack("<I", 16)
            + struct.pack("<2H2I2H", 1, 1, 24000, 48000, 2, 16)
        )
        movi = _list_chunk(
            b"movi",
            _chunk(b"00dc", evil) + _chunk(b"01wb", b"\x01\x02" * 16),
        )
        path = tmp_path / "evil.avi"
        path.write_bytes(_chunk(b"RIFF", b"AVI " + hdrl + movi))
        assert read_avi_audio(str(path)) is None

    def test_probe_y4m_per_frame_params(self, tmp_path):
        """Spec-legal per-frame parameters ('FRAME Ixyz\\n') make the frame
        marker variable-length: size // fixed_frame_bytes over-counts, so
        the probe must walk the real records. A truncated final frame is
        not counted (read_y4m can't decode it)."""
        from ltx2_tpu.utils.video_io import probe_video, read_y4m

        plane = bytes(range(16))  # 4x4
        frame = b"FRAME Ixyz\n" + plane * 3  # C444: 3 full planes
        path = tmp_path / "pf.y4m"
        path.write_bytes(b"YUV4MPEG2 W4 H4 F25:1 Ip A1:1 C444\n" + frame * 20)
        fps, n, h, w = probe_video(str(path))
        assert (n, h, w) == (20, 4, 4) and abs(fps - 25.0) < 1e-6
        # The reader agrees with the probe's count.
        assert read_y4m(str(path), 4, 4, 20).shape == (1, 3, 20, 4, 4)

        trunc = tmp_path / "trunc.y4m"
        trunc.write_bytes(
            b"YUV4MPEG2 W4 H4 F25:1 C444\n" + frame * 2 + frame[:20]
        )
        _, n, _, _ = probe_video(str(trunc))
        assert n == 2

    def test_probe_y4m_rejects_unsupported_colorspace(self, tmp_path):
        """A C422 stream must raise loudly from BOTH the probe and the
        reader (previously the probe silently counted it with 420-sized
        planes, over-reporting frames ~33%)."""
        from ltx2_tpu.utils.video_io import probe_video, read_y4m

        path = tmp_path / "c422.y4m"
        path.write_bytes(
            b"YUV4MPEG2 W4 H4 F25:1 C422\n"
            + b"FRAME\n" + bytes(16) + bytes(8) * 2
        )
        with pytest.raises(ValueError, match="C422"):
            probe_video(str(path))
        with pytest.raises(ValueError, match="C422"):
            read_y4m(str(path), 4, 4, 1)

    def test_avi_writer_video_only(self, tmp_path):
        import struct

        from ltx2_tpu.utils.video_io import write_avi_mjpeg

        frames = _gradient_frames(2, 8, 8)
        path = str(tmp_path / "v.avi")
        write_avi_mjpeg(path, frames, fps=24.0)
        data = open(path, "rb").read()
        avih_at = data.index(b"avih") + 8
        fields = struct.unpack("<14I", data[avih_at : avih_at + 56])
        assert fields[6] == 1  # video stream only
        assert b"auds" not in data
