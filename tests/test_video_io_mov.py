"""ISO-BMFF (.mov/.mp4) MJPEG+PCM muxer/demuxer (utils/video_io.py).

The reference's default output container is .mp4 (muxed via an external
ffmpeg binary, reference generate.py:2153-2362); these tests cover the
pure-Python equivalent: QuickTime 'jpeg' / MP4 'mp4v'+esds(OTI 0x6C) video
with 'sowt' PCM audio, the inverse demuxer, the codec-disambiguation
dispatch (MJPEG decodes pure-Python; real codecs route to cv2/ffmpeg),
and cross-validation against OpenCV's independent FFMPEG demuxer."""

import struct

import numpy as np
import pytest

from ltx2_tpu.utils.video_io import (
    decodes_pure_python,
    mov_is_mjpeg,
    mov_video_codec,
    probe_mov,
    probe_video,
    read_mov_audio,
    read_mov_mjpeg,
    read_video_any,
    write_mp4_mjpeg,
)


def _smooth_frames(f, h, w):
    """Low-frequency content so JPEG round-trips within +-1 count."""
    x = np.linspace(0, 255, w, dtype=np.float32)
    frames = np.stack([np.tile(x, (h, 1)) + 7 * i for i in range(f)])
    return np.clip(frames, 0, 255).astype(np.uint8)[..., None].repeat(3, -1)


def _cv2_or_skip():
    cv2 = pytest.importorskip("cv2")
    return cv2


class TestMovMuxer:
    @pytest.mark.parametrize("suffix", ["mov", "mp4"])
    def test_roundtrip_video_audio(self, tmp_path, suffix):
        frames = _smooth_frames(5, 16, 24)
        audio = (
            np.sin(np.linspace(0, 100, 4800, dtype=np.float32))[None]
            .repeat(2, 0)
            * 0.5
        )
        path = str(tmp_path / f"t.{suffix}")
        write_mp4_mjpeg(path, frames, fps=12.0, audio=audio, sample_rate=24000)

        video = read_mov_mjpeg(path, 16, 24, 5)
        assert video.shape == (1, 3, 5, 16, 24)
        decoded = ((video[0].transpose(1, 2, 3, 0) + 1) * 127.5).round()
        assert np.abs(decoded - frames.astype(np.float32)).max() <= 2

        out = read_mov_audio(path)
        assert out is not None
        pcm, rate = out
        assert rate == 24000 and pcm.shape == (2, 4800)
        assert np.abs(pcm - audio).max() < 2e-4  # int16 quantization

        fps, n, h, w = probe_mov(path)
        assert (n, h, w) == (5, 16, 24) and abs(fps - 12.0) < 1e-6
        # probe_video dispatches by suffix to the same parser.
        assert probe_video(path)[1:] == (5, 16, 24)

        assert decodes_pure_python(path)
        assert read_video_any(path, 16, 24, 5).shape == (1, 3, 5, 16, 24)
        # Padding/trim semantics match the other readers.
        assert read_mov_mjpeg(path, 16, 24, 7).shape == (1, 3, 7, 16, 24)
        assert read_mov_mjpeg(path, 16, 24, 2).shape == (1, 3, 2, 16, 24)

    def test_video_only(self, tmp_path):
        path = str(tmp_path / "v.mov")
        write_mp4_mjpeg(path, _smooth_frames(3, 8, 8), fps=24.0)
        assert read_mov_audio(path) is None
        assert read_mov_mjpeg(path, 8, 8, 3).shape == (1, 3, 3, 8, 8)
        data = open(path, "rb").read()
        assert b"soun" not in data

    def test_container_structure(self, tmp_path):
        """Top-level box layout is exactly ftyp+mdat+moov with consistent
        sizes, the brands match the suffix, and the mp4 variant tags its
        video stream as JPEG via esds OTI 0x6C."""
        from ltx2_tpu.utils.video_io import _esds_oti, _mov_boxes, _mov_find

        frames = _smooth_frames(2, 8, 8)
        mov = str(tmp_path / "s.mov")
        mp4 = str(tmp_path / "s.mp4")
        write_mp4_mjpeg(mov, frames, fps=24.0)
        write_mp4_mjpeg(mp4, frames, fps=24.0)

        data = open(mov, "rb").read()
        tops = list(_mov_boxes(data, 0, len(data)))
        assert [t for t, _, _ in tops] == [b"ftyp", b"mdat", b"moov"]
        assert tops[-1][2] == len(data)  # sizes tile the file exactly
        assert data[tops[0][1] : tops[0][1] + 4] == b"qt  "
        assert mov_video_codec(mov) == b"jpeg"

        data = open(mp4, "rb").read()
        assert data[8:12] == b"isom"  # ftyp major brand
        assert mov_video_codec(mp4) == b"mp4v"
        # esds objectTypeIndication must say JPEG.
        stsd = None
        from ltx2_tpu.utils.video_io import _mov_tracks

        for handler, stbl, _mdhd in _mov_tracks(data):
            if handler == b"vide":
                stsd = _mov_find(data, *stbl, b"stsd")
        assert stsd is not None
        (entry_size,) = struct.unpack_from(">I", data, stsd[0] + 8)
        entry_payload = data[stsd[0] + 16 : stsd[0] + 8 + entry_size]
        assert _esds_oti(entry_payload) == 0x6C

    def test_non_mjpeg_rejected_and_routed(self, tmp_path):
        """An H.264-style sample entry must not decode pure-Python: the
        reader raises, the dispatch probe says False."""
        path = str(tmp_path / "h.mov")
        write_mp4_mjpeg(path, _smooth_frames(2, 8, 8), fps=24.0)
        data = bytearray(open(path, "rb").read())
        at = data.index(b"jpeg", data.index(b"stsd"))
        data[at : at + 4] = b"avc1"
        open(path, "wb").write(bytes(data))
        assert mov_video_codec(path) == b"avc1"
        assert not mov_is_mjpeg(path)
        assert not decodes_pure_python(path)
        with pytest.raises(ValueError, match="not MJPEG"):
            read_mov_mjpeg(path, 8, 8, 2)

    def test_mdhd_version1_timescale(self, tmp_path):
        """Pro-tool muxers write version-1 mdhd (64-bit timestamps): the
        timescale moves from offset 12 to 20. probe_mov/read_mov_audio must
        honor the version byte (review r4: the fixed-12 read returned the
        low half of a timestamp)."""
        import struct

        from ltx2_tpu.utils.video_io import _mdhd_timescale, probe_mov

        ts = 24000
        v0 = struct.pack(">B3x II I I 2x 2x", 0, 1, 2, ts, 100)
        assert _mdhd_timescale(v0) == ts
        v1 = struct.pack(">B3x QQ I Q 2x 2x", 1, 1, 2, ts, 100)
        assert _mdhd_timescale(v1) == ts

        # Integration: upgrade a real file's video mdhd to version 1 and
        # re-probe — fps must be unchanged.
        path = tmp_path / "v1.mov"
        write_mp4_mjpeg(str(path), _smooth_frames(2, 8, 8), fps=24.0)
        fps0, n0, h0, w0 = probe_mov(str(path))
        raw = bytearray(path.read_bytes())
        at = raw.index(b"mdhd")
        body = at + 4  # version byte offset
        old = raw[body : body + 4 + 16]  # v0: ver/flags + 2xU32 + ts(U32) + dur(U32)
        ver_flags = bytes([1]) + bytes(old[1:4])
        create, modify, tscale, dur = struct.unpack_from(">IIII", old, 4)
        new_body = ver_flags + struct.pack(">QQIQ", create, modify, tscale, dur)
        grow = len(new_body) - len(old)
        raw[body : body + len(old)] = new_body
        # Patch the mdhd box size and every enclosing box size (moov path).
        for marker in (b"mdhd", b"mdia", b"trak", b"moov"):
            pos = raw.index(marker)
            (sz,) = struct.unpack_from(">I", raw, pos - 4)
            struct.pack_into(">I", raw, pos - 4, sz + grow)
        path.write_bytes(bytes(raw))
        fps1, n1, h1, w1 = probe_mov(str(path))
        assert (fps1, n1, h1, w1) == (fps0, n0, h0, w0)

    def test_mp4v_without_jpeg_oti_not_mjpeg(self, tmp_path):
        """cv2's MPEG-4 Part 2 writer also uses the 'mp4v' sample entry —
        the fourcc alone must not claim MJPEG; the esds OTI decides."""
        cv2 = _cv2_or_skip()
        path = str(tmp_path / "p2.mp4")
        w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 12.0, (24, 16))
        if not w.isOpened():
            pytest.skip("cv2 mp4v encoder unavailable")
        for f in _smooth_frames(4, 16, 24):
            w.write(f[:, :, ::-1])
        w.release()
        assert mov_video_codec(path) == b"mp4v"
        assert not mov_is_mjpeg(path)
        assert not decodes_pure_python(path)
        # ...but read_video_any still decodes it (cv2 fallback).
        assert read_video_any(path, 16, 24, 4).shape == (1, 3, 4, 16, 24)

    def test_cv2_independent_decode(self, tmp_path):
        """OpenCV's bundled FFMPEG demuxer/decoder — a fully independent
        implementation — agrees with our muxer on count, rate, geometry,
        and pixels for both containers."""
        cv2 = _cv2_or_skip()
        frames = _smooth_frames(4, 16, 24)
        audio = np.linspace(-0.5, 0.5, 4000, dtype=np.float32)[None]
        for suffix in ("mov", "mp4"):
            path = str(tmp_path / f"x.{suffix}")
            write_mp4_mjpeg(path, frames, fps=12.0, audio=audio,
                            sample_rate=24000)
            cap = cv2.VideoCapture(path)
            assert cap.isOpened(), suffix
            assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 4
            assert abs(cap.get(cv2.CAP_PROP_FPS) - 12.0) < 1e-6
            got = []
            while True:
                ok, bgr = cap.read()
                if not ok:
                    break
                got.append(bgr[:, :, ::-1])
            cap.release()
            assert len(got) == 4
            err = np.abs(
                np.stack(got).astype(np.int32) - frames.astype(np.int32)
            ).max()
            assert err <= 2, f"{suffix}: cv2 decode differs by {err}"


class TestCv2Reader:
    def test_read_and_probe_real_codec(self, tmp_path):
        """A real inter-frame codec (MPEG-4 Part 2) ingests through
        read_video_any / retake's metadata probe via OpenCV — corpus
        ingestion is no longer limited to MJPEG/uncompressed formats."""
        cv2 = _cv2_or_skip()
        from ltx2_tpu.pipelines.retake import get_video_metadata, load_video_frames

        frames = _smooth_frames(6, 16, 24)
        path = str(tmp_path / "c.mp4")
        w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 12.0, (24, 16))
        if not w.isOpened():
            pytest.skip("cv2 mp4v encoder unavailable")
        for f in frames:
            w.write(f[:, :, ::-1])
        w.release()

        fps, n, h, w_ = get_video_metadata(path)
        assert (n, h, w_) == (6, 16, 24) and abs(fps - 12.0) < 1e-6
        video = load_video_frames(path, 16, 24, 6)
        assert video.shape == (1, 3, 6, 16, 24)
        decoded = ((video[0].transpose(1, 2, 3, 0) + 1) * 127.5).round()
        # Lossy inter-frame codec: loose pixel agreement only.
        assert np.abs(decoded - frames.astype(np.float32)).mean() < 16


class TestGenerateSaveVideo:
    def test_save_video_mov_and_mp4_fallback(self, tmp_path, monkeypatch):
        """generate.py's save_video writes the REQUESTED container without
        ffmpeg: .mov always pure-Python; .mp4 honored by the no-ffmpeg
        fallback (previously a renamed .avi)."""
        import importlib.util
        import shutil as _shutil
        import sys
        from pathlib import Path

        spec = importlib.util.spec_from_file_location(
            "ltx2_generate_test", str(Path(__file__).parent.parent / "scripts" / "generate.py")
        )
        gen = importlib.util.module_from_spec(spec)
        sys.modules["ltx2_generate_test"] = gen
        spec.loader.exec_module(gen)
        monkeypatch.setattr(_shutil, "which", lambda name: None)

        frames = _smooth_frames(3, 16, 24)
        audio = np.zeros((1, 3000), np.float32)

        mov = str(tmp_path / "o.mov")
        gen.save_video(frames, mov, fps=12.0, audio=audio, audio_sample_rate=24000)
        assert mov_is_mjpeg(mov)
        assert read_mov_audio(mov) is not None

        mp4 = str(tmp_path / "o.mp4")
        gen.save_video(frames, mp4, fps=12.0, audio=audio, audio_sample_rate=24000)
        assert Path(mp4).exists(), "requested .mp4 must be honored"
        assert mov_is_mjpeg(mp4)
        assert read_mov_mjpeg(mp4, 16, 24, 3).shape == (1, 3, 3, 16, 24)
