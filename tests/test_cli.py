"""CLI wiring smoke tests: scripts/generate.py main() in placeholder mode.

The CLI is the integration surface (reference generate.py, 2728 LoC of
dispatch); these guard flag->pipeline wiring end to end with random
weights, dummy embeddings, and tiny shapes. Each run exercises model
construction, the jitted denoise loop, VAE decode, and the ffmpeg-less
save fallback.
"""

import json
import os
import sys
from pathlib import Path

import numpy as np
import pytest

SCRIPTS = str(Path(__file__).resolve().parent.parent / "scripts")
sys.path.insert(0, SCRIPTS)


def _run(tmp_path, *extra):
    import generate

    out = tmp_path / "out.mp4"
    argv = [
        "--placeholder", "--no-gemma",
        "--height", "64", "--width", "96", "--num-frames", "9",
        "--num-inference-steps", "2",
        "--output", str(out),
        *extra,
    ]
    generate.main(argv)
    frames = np.load(tmp_path / "out_frames.npz")["frames"]
    assert frames.shape[0] == 9
    assert frames.shape[-1] == 3
    assert frames.dtype == np.uint8
    return frames


class TestCLISmoke:
    def test_one_stage(self, tmp_path):
        _run(tmp_path, "--pipeline", "one-stage")

    def test_one_stage_heun_stg(self, tmp_path):
        _run(
            tmp_path, "--pipeline", "one-stage", "--sampler", "heun",
            "--stg-scale", "1.0", "--cache-text-kv",
        )

    def test_text_to_video(self, tmp_path):
        _run(tmp_path, "--pipeline", "text-to-video", "--seed", "7")

    def test_cfg_interval(self, tmp_path):
        """--cfg-interval 2 wires through to the denoise loop (guidance
        reuse: uncond forward every 2nd step, carried delta between)."""
        _run(
            tmp_path, "--pipeline", "one-stage", "--seed", "7",
            "--cfg-interval", "2", "--num-inference-steps", "4",
        )

    def test_token_bucket_matches_exact_shape(self, tmp_path):
        """--token-bucket pads the token count and masks the padding: the
        decoded frames must match the exact-shape run at the same seed
        (fp32: identical up to pixel rounding)."""
        ref = _run(tmp_path, "--pipeline", "one-stage", "--seed", "7")
        # 64x96x9f -> 2x2x3 = 12 latent tokens, bucketed up to 32.
        bucketed = _run(
            tmp_path, "--pipeline", "one-stage", "--seed", "7",
            "--token-bucket", "32",
        )
        assert np.abs(
            ref.astype(np.int32) - bucketed.astype(np.int32)
        ).max() <= 1

    def test_retake_from_avi_source(self, tmp_path):
        """Retake end to end from an MJPEG-AVI source: pure-Python probe +
        decode (utils/video_io), placeholder VAE *encoder* (real 32x32x8
        stride geometry), masked denoise, decode."""
        from ltx2_tpu.utils.video_io import write_avi_mjpeg

        rng = np.random.default_rng(0)
        src = tmp_path / "src.avi"
        write_avi_mjpeg(
            str(src),
            rng.integers(0, 255, (9, 64, 96, 3), dtype=np.uint8).astype(np.uint8),
            fps=24.0,
        )
        _run(
            tmp_path, "--pipeline", "retake", "--video", str(src),
            "--retake-start", "0.05", "--retake-end", "0.2",
        )

    def test_one_stage_audio(self, tmp_path):
        """--audio in placeholder mode: the full audio chain (AV DiT branch
        -> audio VAE decode -> vocoder) must produce a waveform file."""
        _run(tmp_path, "--pipeline", "one-stage", "--audio")
        wav = tmp_path / "out.wav"
        assert wav.exists() and wav.stat().st_size > 44  # non-empty PCM

    def test_one_stage_pp_stages(self, tmp_path):
        """--pp-stages on the virtual 8-CPU mesh: the denoise loop runs
        GPipe-pipelined (placeholder DiT has 4 blocks -> 4 stages) and must
        match the single-device output to pixel rounding."""
        ref = _run(tmp_path, "--pipeline", "one-stage", "--seed", "7")
        pp = _run(tmp_path, "--pipeline", "one-stage", "--seed", "7", "--pp-stages", "4")
        assert np.abs(ref.astype(np.int32) - pp.astype(np.int32)).max() <= 1

    def test_one_stage_pp_x_tp(self, tmp_path):
        """--pp-stages 2 --tp-devices 2 COMPOSED (one pipe x model mesh):
        blocks stage over 'pipe' while weights feature-shard over 'model';
        must match the single-device output to pixel rounding."""
        ref = _run(tmp_path, "--pipeline", "one-stage", "--seed", "7")
        pptp = _run(
            tmp_path, "--pipeline", "one-stage", "--seed", "7",
            "--pp-stages", "2", "--tp-devices", "2",
        )
        # <=2: the TP all-reduce reassociates bf16 partial sums, which can
        # move a uint8 pixel by one extra rounding step vs single-device.
        assert np.abs(ref.astype(np.int32) - pptp.astype(np.int32)).max() <= 2

    def test_one_stage_pp_x_sp(self, tmp_path):
        """--pp-stages 2 --sp-devices 2 COMPOSED (one pipe x seq mesh):
        blocks stage over 'pipe' while tokens shard over 'seq' (ring
        attention inside each GPipe stage)."""
        ref = _run(tmp_path, "--pipeline", "one-stage", "--seed", "7")
        ppsp = _run(
            tmp_path, "--pipeline", "one-stage", "--seed", "7",
            "--pp-stages", "2", "--sp-devices", "2",
        )
        # <=2: the ring's online softmax reassociates bf16 partial sums.
        assert np.abs(ref.astype(np.int32) - ppsp.astype(np.int32)).max() <= 2

    def test_one_stage_sp(self, tmp_path):
        """--sp-devices: the denoise loop runs token-sharded (ring
        attention); must match single-device output to pixel rounding."""
        ref = _run(tmp_path, "--pipeline", "one-stage", "--seed", "7")
        sp = _run(tmp_path, "--pipeline", "one-stage", "--seed", "7", "--sp-devices", "4")
        # <=2: the ring's online softmax reassociates bf16 partial sums.
        # (A max diff of ~100 here means the decode consumed a sharded
        # latent — see consolidate_latent in pipelines/common.py.)
        assert np.abs(ref.astype(np.int32) - sp.astype(np.int32)).max() <= 2

    def test_one_stage_sp_x_tp(self, tmp_path):
        """--sp-devices 2 --tp-devices 2 COMPOSED (one seq x model mesh):
        tokens shard over 'seq' (ring attention, head-sharded) while block
        weights feature-shard over 'model'."""
        ref = _run(tmp_path, "--pipeline", "one-stage", "--seed", "7")
        sptp = _run(
            tmp_path, "--pipeline", "one-stage", "--seed", "7",
            "--sp-devices", "2", "--tp-devices", "2",
        )
        # <=2: bf16 partial-sum reassociation across the TP all-reduce.
        assert np.abs(ref.astype(np.int32) - sptp.astype(np.int32)).max() <= 2

    def test_one_stage_audio_sp(self, tmp_path):
        """AV generation under --sp-devices: BOTH modalities' token axes
        shard (17 frames -> audio tokens divide 2), and the sharded audio
        latent must consolidate before the audio VAE/vocoder convs."""
        import generate

        def run(*extra):
            out = tmp_path / "av.mp4"
            generate.main([
                "--placeholder", "--no-gemma", "--audio",
                "--pipeline", "one-stage",
                "--height", "64", "--width", "96", "--num-frames", "17",
                "--num-inference-steps", "2", "--seed", "7",
                "--output", str(out), *extra,
            ])
            return np.load(tmp_path / "av_frames.npz")["frames"]

        ref = run()
        sp = run("--sp-devices", "2")
        assert (tmp_path / "av.wav").exists()
        assert np.abs(ref.astype(np.int32) - sp.astype(np.int32)).max() <= 2

    def test_one_stage_vae_dp_tiled(self, tmp_path):
        """--vae-dp-devices with spatial tiling: same-shape tiles decode
        batched one per chip. Exact equality vs sequential tiling is covered
        by tests/test_tiling.py (the placeholder decoder injects batch-shaped
        decode noise, so pixels differ here); the smoke drives the full CLI
        wiring: mesh build -> pipeline -> batched tile decode -> mux."""
        frames = _run(
            tmp_path, "--pipeline", "one-stage", "--seed", "7",
            "--tile-size", "64", "--tile-overlap", "32",
            "--vae-dp-devices", "4",
        )
        assert frames.shape == (9, 64, 96, 3)

    def test_one_stage_bfloat16(self, tmp_path, monkeypatch):
        """--dtype bfloat16 must reach the denoise loop (policy: bf16
        weights/activations with fp32 islands). Guards the dead plumbing
        found in round 1 (generate.py always forced float32)."""
        import jax.numpy as jnp

        import ltx2_tpu.pipelines.one_stage as one_stage_mod

        seen = {}
        real_make = one_stage_mod.make_video_denoise_loop

        def spy_make(cfg, loop_cfg, **kwargs):
            loop = real_make(cfg, loop_cfg, **kwargs)

            def wrapped(params, video_state, sigmas, pos, neg, *a, **kw):
                seen["latent_dtype"] = video_state.latent.dtype
                return loop(params, video_state, sigmas, pos, neg, *a, **kw)

            return wrapped

        monkeypatch.setattr(one_stage_mod, "make_video_denoise_loop", spy_make)
        _run(tmp_path, "--pipeline", "one-stage", "--dtype", "bfloat16")
        assert seen["latent_dtype"] == jnp.bfloat16


class TestDownloadWeights:
    """Interactive downloader parity (reference scripts/download_weights.py):
    selection quick-options, already-downloaded skip, disk-space refusal."""

    def test_interactive_recommended_skips_downloaded(self, tmp_path, monkeypatch):
        import download_weights as dw

        # Mark 'distilled' as already present.
        (tmp_path / "ltx-2-19b-distilled.safetensors").write_bytes(b"x")
        monkeypatch.setattr("builtins.input", lambda *_: "r")
        selected = dw.interactive_selection(str(tmp_path))
        assert selected == {"gemma"}  # distilled skipped as downloaded

    def test_interactive_custom_keys_filters_unknown(self, tmp_path, monkeypatch):
        import download_weights as dw

        monkeypatch.setattr(
            "builtins.input", lambda *_: "distilled-fp8, bogus ,gemma"
        )
        assert dw.interactive_selection(str(tmp_path)) == {"distilled-fp8", "gemma"}

    def test_disk_space_refusal(self, tmp_path, monkeypatch):
        import shutil as shutil_mod

        import download_weights as dw

        usage = shutil_mod.disk_usage(str(tmp_path))
        monkeypatch.setattr(
            dw.shutil, "disk_usage",
            lambda _p: usage._replace(free=int(1e9)),
        )
        assert not dw.check_disk_space({"distilled"}, str(tmp_path))
        assert dw.check_disk_space({"temporal-upscaler"}, str(tmp_path))

    def test_partial_snapshot_not_marked_downloaded(self, tmp_path):
        """An interrupted gemma snapshot (files present, no completion
        marker) must NOT count as downloaded — resumable re-download."""
        import download_weights as dw

        gemma_dir = tmp_path / "gemma"
        gemma_dir.mkdir()
        (gemma_dir / "model-00001-of-00005.safetensors").write_bytes(b"partial")
        assert not dw._is_downloaded(str(tmp_path), "gemma", None)
        (gemma_dir / ".download_complete").touch()
        assert dw._is_downloaded(str(tmp_path), "gemma", None)


class TestSlowManifest:
    def test_parametrized_nodeids_with_spaces_survive(self, tmp_path):
        """review r4: `tests/\\S+` truncated nodeids containing spaces
        (test_y[two words]) so those tests silently never got marked slow."""
        import subprocess
        import sys

        log = tmp_path / "suite.log"
        log.write_text(
            "  12.31s call     tests/test_x.py::test_y[two words]\n"
            "   8.00s call     tests/test_z.py::test_plain\n"
            "   0.10s call     tests/test_z.py::test_fast\n"
        )
        manifest = tmp_path / "slow_tests.txt"
        subprocess.run(
            [sys.executable, os.path.join(SCRIPTS, "update_slow_manifest.py"),
             str(log), "--manifest", str(manifest)],
            check=True, capture_output=True, text=True,
        )
        entries = [l for l in manifest.read_text().splitlines()
                   if l and not l.startswith("#")]
        assert "tests/test_x.py::test_y[two words]" in entries
        assert "tests/test_z.py::test_plain" in entries
        assert "tests/test_z.py::test_fast" not in entries


class TestServe:
    """Persistent serving loop: models load once, requests stream as JSON
    lines, responses come back as JSON lines; a bad request must not kill
    the server."""

    def test_requests_file(self, tmp_path, capsys):
        import serve

        req = tmp_path / "req.jsonl"
        req.write_text(
            json.dumps({"output": str(tmp_path / "a.mp4"), "seed": 1}) + "\n"
            "# a comment line\n"
            + json.dumps({"output": str(tmp_path / "b.mp4"), "seed": 2}) + "\n"
            + json.dumps({"no_such_field": 1}) + "\n"
        )
        serve.main([
            "--placeholder", "--no-gemma", "--pipeline", "one-stage",
            "--height", "64", "--width", "96", "--num-frames", "9",
            "--num-inference-steps", "2",
            "--requests", str(req),
        ])
        responses = [
            json.loads(line)
            for line in capsys.readouterr().out.strip().splitlines()
            if line.startswith("{")
        ]
        assert [r["status"] for r in responses] == ["ok", "ok", "error"]
        assert (tmp_path / "a_frames.npz").exists()
        assert (tmp_path / "b_frames.npz").exists()
        a = np.load(tmp_path / "a_frames.npz")["frames"]
        b = np.load(tmp_path / "b_frames.npz")["frames"]
        assert a.shape == b.shape
        assert not np.array_equal(a, b)  # different seeds -> different clips
        assert "no_such_field" in responses[2]["error"]

    def test_bool_fields_reject_strings(self):
        """bool("false") is True — a JSON string for a bool field must be
        rejected, not silently inverted (advisor r2)."""
        import argparse

        import serve

        base = argparse.Namespace(
            audio=False, skip_vae=False, seed=0, pipeline="one-stage"
        )
        with pytest.raises(ValueError, match="JSON boolean"):
            serve.apply_request(base, {"skip_vae": "false"})
        args = serve.apply_request(base, {"skip_vae": True, "seed": 3})
        assert args.skip_vae is True and args.seed == 3

    def test_request_timeout_zero_rejected(self, capsys):
        """review r4: `if timeout:` treated --request-timeout 0 as 'no
        timeout'; 0 must be rejected at parse time, not silently disable
        the bound the help text promises."""
        import serve

        with pytest.raises(SystemExit):
            serve.build_parser().parse_args(
                ["--placeholder", "--request-timeout", "0"]
            )
        assert "must be > 0" in capsys.readouterr().err
        args = serve.build_parser().parse_args(
            ["--placeholder", "--request-timeout", "1.5"]
        )
        assert args.request_timeout == 1.5

    def test_reference_compat_flags_apply(self):
        """serve.main must run generate's reference-flag normalization:
        --fp8 -> fp8_serving, --fp32 -> dtype (previously silently ignored,
        so a --fp8 serve launch OOMed where generate.py worked)."""
        import generate
        import serve

        args = generate._apply_reference_compat(
            serve.build_parser().parse_args([
                "--placeholder", "--fp8", "--requests", "-",
            ])
        )
        assert args.fp8_serving is True
        args = generate._apply_reference_compat(
            serve.build_parser().parse_args([
                "--placeholder", "--fp32", "--requests", "-",
            ])
        )
        assert args.dtype == "float32"
        # And main() actually routes through it (source-level guard against
        # the wiring regressing back to raw parse_args).
        import inspect

        assert "_apply_reference_compat" in inspect.getsource(serve.main)

    def test_ic_lora_weights_stay_out_of_ledger_loras(self):
        """The IC-LoRA fuses for STAGE 1 ONLY inside the pipeline; routing
        it into the ledger's lora list would double-fuse it in stage 1 and
        leave it permanently fused in stage 2. --lora specs on the ic-lora
        pipeline normalize to --ic-lora-weights (strength suffix kept)."""
        import generate

        args = generate._apply_reference_compat(
            generate.build_parser().parse_args([
                "--pipeline", "ic-lora", "--lora", "ic.safetensors:0.5",
                "--placeholder",
            ])
        )
        assert args.ic_lora_weights == "ic.safetensors:0.5"
        assert args.lora == []  # ledger must NOT fuse it at load
        cfg = generate.parse_lora_spec(args.ic_lora_weights)
        assert cfg.path == "ic.safetensors" and cfg.strength == 0.5

        # A style LoRA alongside the IC-LoRA stays with the ledger.
        args = generate._apply_reference_compat(
            generate.build_parser().parse_args([
                "--pipeline", "ic-lora", "--ic-lora-weights", "ic.safetensors",
                "--lora", "style.safetensors:0.7", "--placeholder",
            ])
        )
        assert args.lora == ["style.safetensors:0.7"]
        # Other pipelines are untouched.
        args = generate._apply_reference_compat(
            generate.build_parser().parse_args([
                "--lora", "style.safetensors", "--placeholder",
            ])
        )
        assert args.lora == ["style.safetensors"]

    def test_placeholder_fallback_with_real_gemma_fails_loudly(self):
        """No checkpoint resolved + real text encoding requested must exit
        with the remedy, not AttributeError on ledger.gemma()."""
        import generate

        args = generate.build_parser().parse_args(
            ["--gemma-dir", "weights/gemma-nonexistent"]
        )
        from ltx2_tpu.models.transformer.model import LTXModelConfig

        with pytest.raises(SystemExit, match="no checkpoint"):
            generate.encode_prompts(
                args, None, LTXModelConfig(caption_channels=None)
            )

    def test_temporal_upscaler_warns_on_staged_pipelines(self, caplog):
        """--temporal-upscaler only applies on one-stage/text-to-video;
        staged pipelines must warn instead of silently ignoring it."""
        import logging

        import generate

        args = generate.build_parser().parse_args([
            "--pipeline", "distilled", "--temporal-upscaler", "tu.safetensors",
            "--placeholder",
        ])
        with caplog.at_level(logging.WARNING, logger="ltx2_tpu"):
            kwargs = generate._upscaler_kwargs(args, None)
        assert kwargs == {}
        assert any("--temporal-upscaler has no effect" in r.message
                   for r in caplog.records)

    def test_two_stage_resolution_rounds_up_to_64(self, caplog):
        """The reference CLI rounds two-stage resolutions UP to %64 with a
        warning (generate.py:1300-1307) instead of erroring."""
        import logging

        import generate

        with caplog.at_level(logging.WARNING, logger="ltx2_tpu"):
            args = generate._apply_reference_compat(
                generate.build_parser().parse_args([
                    "--pipeline", "two-stage", "--height", "480",
                    "--width", "704", "--placeholder",
                ])
            )
        assert (args.height, args.width) == (512, 704)
        assert any("divisible by 64" in r.message for r in caplog.records)

        # Already-divisible resolutions pass through silently.
        args = generate._apply_reference_compat(
            generate.build_parser().parse_args([
                "--pipeline", "two-stage", "--height", "512",
                "--width", "704", "--placeholder",
            ])
        )
        assert (args.height, args.width) == (512, 704)

    def test_http_front_end(self, tmp_path):
        """--http serves the same request contract over POST /generate
        (JSON body in, JSON response out; errors = HTTP 400) with
        GET /healthz liveness, sharing the resident models with the line
        protocol."""
        import json as json_mod
        import threading
        import urllib.error
        import urllib.request

        import generate
        import serve

        args = generate._apply_reference_compat(serve.build_parser().parse_args([
            "--placeholder", "--no-gemma", "--pipeline", "one-stage",
            "--height", "64", "--width", "96", "--num-frames", "9",
            "--num-inference-steps", "2", "--http", "0",
        ]))
        models, ledger = generate.setup(args)
        server = serve.make_http_server(args, models, ledger)
        port = server.server_address[1]
        thread = threading.Thread(target=server.serve_forever, daemon=True)
        thread.start()
        try:
            def post(body):
                req = urllib.request.Request(
                    f"http://127.0.0.1:{port}/generate",
                    data=json_mod.dumps(body).encode(),
                    headers={"Content-Type": "application/json"},
                )
                try:
                    with urllib.request.urlopen(req, timeout=600) as resp:
                        return resp.status, json_mod.loads(resp.read())
                except urllib.error.HTTPError as e:
                    return e.code, json_mod.loads(e.read())

            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=30
            ) as resp:
                assert resp.status == 200
                assert json_mod.loads(resp.read()) == {"status": "ok"}

            code, ok = post({"output": str(tmp_path / "h.mp4"), "seed": 5})
            assert code == 200 and ok["status"] == "ok"
            assert (tmp_path / "h_frames.npz").exists()
            assert any(a.endswith("h_frames.npz") for a in ok["artifacts"])

            code, bad = post({"no_such_field": 1})
            assert code == 400 and bad["status"] == "error"
            assert "no_such_field" in bad["error"]

            code, nf = post({"output": str(tmp_path / "x.mp4")})
            assert code == 200  # server survived the bad request

            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/nope", data=b"{}"
            )
            try:
                urllib.request.urlopen(req, timeout=30)
                raise AssertionError("expected 404")
            except urllib.error.HTTPError as e:
                assert e.code == 404
        finally:
            server.shutdown()
            server.server_close()
            thread.join(timeout=10)

    def test_http_error_classification_and_recovery(self, tmp_path, monkeypatch):
        """VERDICT r3 #6 + advisor r3: (a) a mid-generation device fault
        (injected OOM) returns HTTP 500 with kind=server, leaves residency
        intact, and the NEXT request succeeds; (b) request-validation
        errors stay 400 with kind=bad_request; (c) a length-less POST is
        rejected 411, never silently generating with launch defaults;
        (d) --request-timeout answers 504 while the generation completes
        in the background; (e) a timed-out request still QUEUED behind the
        lock is cancelled instead of generating for a client that already
        got its 504 (review r4)."""
        import http.client
        import json as json_mod
        import threading
        import time as time_mod
        import urllib.error
        import urllib.request

        import generate
        import serve

        args = generate._apply_reference_compat(serve.build_parser().parse_args([
            "--placeholder", "--no-gemma", "--pipeline", "one-stage",
            "--height", "64", "--width", "96", "--num-frames", "9",
            "--num-inference-steps", "2", "--skip-vae", "--http", "0",
        ]))
        models, ledger = generate.setup(args)
        server = serve.make_http_server(args, models, ledger)
        port = server.server_address[1]
        thread = threading.Thread(target=server.serve_forever, daemon=True)
        thread.start()

        real_execute = generate.execute_request
        release = threading.Event()  # defined early: finally always sets it

        def post(body):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/generate",
                data=json_mod.dumps(body).encode(),
                headers={"Content-Type": "application/json"},
            )
            try:
                with urllib.request.urlopen(req, timeout=600) as resp:
                    return resp.status, json_mod.loads(resp.read())
            except urllib.error.HTTPError as e:
                return e.code, json_mod.loads(e.read())

        try:
            # (a) device fault mid-generation -> 500, then recovery.
            calls = {"n": 0}

            def flaky(req_args, m, led):
                calls["n"] += 1
                if calls["n"] == 1:
                    raise RuntimeError(
                        "RESOURCE_EXHAUSTED: injected device OOM"
                    )
                return real_execute(req_args, m, led)

            monkeypatch.setattr(generate, "execute_request", flaky)
            code, resp = post({"output": str(tmp_path / "f.mp4"), "seed": 1})
            assert code == 500 and resp["status"] == "error"
            assert resp["kind"] == "server"
            assert "RESOURCE_EXHAUSTED" in resp["error"]

            code, resp = post({"output": str(tmp_path / "g.mp4"), "seed": 1})
            assert code == 200 and resp["status"] == "ok"
            assert (tmp_path / "g_latent.npz").exists()  # residency intact

            # (b) validation errors remain the client's fault.
            code, resp = post({"no_such_field": 1})
            assert code == 400 and resp["kind"] == "bad_request"

            # (c) POST without Content-Length -> 411, no generation.
            before = calls["n"]
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
            conn.request("POST", "/generate")  # body=None: no Content-Length
            resp_raw = conn.getresponse()
            body = json_mod.loads(resp_raw.read())
            conn.close()
            assert resp_raw.status == 411
            assert body["kind"] == "bad_request"
            assert calls["n"] == before  # nothing was generated

            # (d) --request-timeout: slow generation -> 504; the worker
            # finishes in the background and the server stays healthy.
            args.request_timeout = 0.3

            def slow(req_args, m, led):
                release.wait(timeout=30)
                return real_execute(req_args, m, led)

            monkeypatch.setattr(generate, "execute_request", slow)
            t0 = time_mod.perf_counter()
            code, resp = post({"output": str(tmp_path / "s.mp4"), "seed": 2})
            assert code == 504 and resp["kind"] == "timeout"
            assert time_mod.perf_counter() - t0 < 10

            # (e) a second request queued behind the still-held lock also
            # times out — and must be cancelled AT the lock, not run a
            # full generation nobody collects.
            code, resp = post({"output": str(tmp_path / "q.mp4"), "seed": 4})
            assert code == 504 and resp["kind"] == "timeout"
            release.set()

            args.request_timeout = None
            monkeypatch.setattr(generate, "execute_request", real_execute)
            deadline = time_mod.monotonic() + 120
            while not (tmp_path / "s_latent.npz").exists():
                assert time_mod.monotonic() < deadline, (
                    "timed-out generation never completed in background"
                )
                time_mod.sleep(0.2)
            code, resp = post({"output": str(tmp_path / "t.mp4"), "seed": 3})
            assert code == 200 and resp["status"] == "ok"
            # (e) continued: t's generation serialized behind q's worker,
            # so by now q has passed through the lock — cancelled, so it
            # produced nothing.
            assert not (tmp_path / "q_latent.npz").exists()
        finally:
            release.set()
            server.shutdown()
            server.server_close()
            thread.join(timeout=10)

    def test_request_two_stage_rounding_matches_cli(self):
        """advisor r3: a serve request that flips pipeline=two-stage over a
        non-%64 resident resolution must round up exactly like the CLI
        launch path, not die in TwoStageCFGConfig."""
        import argparse

        import serve

        base = argparse.Namespace(
            audio=False, pipeline="one-stage", height=480, width=704,
        )
        args = serve.apply_request(base, {"pipeline": "two-stage"})
        assert (args.height, args.width) == (512, 704)
        # Non-two-stage requests pass through untouched.
        args = serve.apply_request(base, {"height": 480})
        assert args.height == 480

    def test_temporal_upscale_gated_on_boolean(self, caplog):
        """advisor r3: the reference gates the post-hoc temporal upscale on
        `upscale_temporal and temporal_upscaler_weights` (reference
        generate.py:2039-2060) — weights alone must warn and do nothing,
        symmetric with the spatial branch."""
        import logging

        import generate

        args = generate._apply_reference_compat(
            generate.build_parser().parse_args([
                "--placeholder", "--temporal-upscaler", "tu.safetensors",
            ])
        )
        with caplog.at_level(logging.WARNING, logger="ltx2_tpu"):
            spatial_fn, temporal_fn = generate._post_hoc_upscalers(args, None)
        assert spatial_fn is None and temporal_fn is None
        assert any("without --upscale-temporal" in r.message
                   for r in caplog.records)

        args = generate._apply_reference_compat(
            generate.build_parser().parse_args([
                "--placeholder", "--upscale-temporal",
            ])
        )
        _, temporal_fn = generate._post_hoc_upscalers(args, None)
        assert temporal_fn is not None

    def test_upscale_booleans_fill_reference_weight_paths(self):
        """--upscale-spatial/--upscale-temporal (reference booleans,
        generate.py:2449-2469) default the weights-path flags to the
        reference layout."""
        import generate

        args = generate._apply_reference_compat(
            generate.build_parser().parse_args(
                ["--upscale-spatial", "--upscale-temporal", "--placeholder"]
            )
        )
        assert args.spatial_upscaler == (
            "weights/ltx-2/ltx-2-spatial-upscaler-x2-1.0.safetensors"
        )
        assert args.temporal_upscaler == (
            "weights/ltx-2/ltx-2-temporal-upscaler-x2-1.0.safetensors"
        )

        # Explicit paths win over the defaults.
        args = generate._apply_reference_compat(
            generate.build_parser().parse_args(
                ["--upscale-spatial", "--spatial-upscaler", "x.safetensors",
                 "--placeholder"]
            )
        )
        assert args.spatial_upscaler == "x.safetensors"

    def test_warmup_leaves_no_artifacts(self, tmp_path):
        """--warmup must generate into throwaway temp files, never the
        launch --output path, and must clean up after itself."""
        import serve

        out = tmp_path / "real_output.mp4"
        req = tmp_path / "req.jsonl"
        req.write_text("")  # no requests: warmup only
        serve.main([
            "--placeholder", "--no-gemma", "--pipeline", "one-stage",
            "--height", "64", "--width", "96", "--num-frames", "9",
            "--num-inference-steps", "2", "--skip-vae",
            "--warmup", "--output", str(out),
            "--requests", str(req),
        ])
        leftovers = [p.name for p in tmp_path.iterdir() if p != req]
        assert leftovers == [], f"warmup left artifacts: {leftovers}"

    def test_token_bucket_unseen_shape_zero_loop_compiles(
        self, tmp_path, capsys
    ):
        """Shape-bucketed serving: after warming one shape, a NEVER-SEEN
        (height, width, frames) inside the same token bucket must reuse the
        compiled denoise loop — zero new loop compiles (the 10s+ cost that
        bucketing exists to kill). Asserted via jax's compile log."""
        import logging

        import jax
        import serve

        # 64x96x9f -> 12 tokens; 64x96x17f -> 18 tokens; both bucket to 32.
        # cfg-scale 2.41 makes this test's loop config UNIQUE in the suite:
        # make_video_denoise_loop lru-caches on (model_cfg, loop_cfg), so a
        # loop compiled by an earlier in-process test would make the
        # warmup's expected single compile silently 0.
        req = tmp_path / "req.jsonl"
        req.write_text(
            json.dumps({"output": str(tmp_path / "b.mp4"), "seed": 2,
                        "num_frames": 17, "skip_vae": True}) + "\n"
        )
        records = []

        class Capture(logging.Handler):
            def emit(self, record):
                records.append(record.getMessage())

        handler = Capture()
        logger = logging.getLogger("jax._src.dispatch")
        old_level = logger.level
        logger.addHandler(handler)
        logger.setLevel(logging.DEBUG)
        jax.config.update("jax_log_compiles", True)
        # The persistent cache (conftest) would turn the warmup compile
        # into a silent HIT on re-runs and make the =1 assertion vacuous.
        old_cache = jax.config.jax_compilation_cache_dir
        jax.config.update("jax_compilation_cache_dir", None)
        try:
            serve.main([
                "--placeholder", "--no-gemma", "--pipeline", "one-stage",
                "--height", "64", "--width", "96", "--num-frames", "9",
                "--num-inference-steps", "2", "--token-bucket", "32",
                "--cfg-scale", "2.41",
                "--skip-vae",
                "--warmup-shapes", "64x96x9",
                "--requests", str(req),
            ])
        finally:
            jax.config.update("jax_log_compiles", False)
            jax.config.update("jax_compilation_cache_dir", old_cache)
            logger.removeHandler(handler)
            logger.setLevel(old_level)

        responses = [
            json.loads(line)
            for line in capsys.readouterr().out.strip().splitlines()
            if line.startswith("{")
        ]
        assert responses[0]["status"] == "ok"
        loop_compiles = [
            m for m in records
            if "Finished XLA compilation" in m and "loop" in m
        ]
        # The warmup shape compiles the loop ONCE; the unseen 17-frame
        # request must not add a second loop compilation.
        assert len(loop_compiles) == 1, loop_compiles

    def test_serve_with_pipeline_mesh(self, tmp_path, capsys):
        """Serving with a parallelism mesh resident: requests run the
        PP-staged denoise loop built once at setup."""
        import serve

        req = tmp_path / "req.jsonl"
        req.write_text(
            json.dumps({"output": str(tmp_path / "a.mp4"), "seed": 1}) + "\n"
        )
        serve.main([
            "--placeholder", "--no-gemma", "--pipeline", "one-stage",
            "--height", "64", "--width", "96", "--num-frames", "9",
            "--num-inference-steps", "2", "--pp-stages", "2",
            "--requests", str(req),
        ])
        responses = [
            json.loads(line)
            for line in capsys.readouterr().out.strip().splitlines()
            if line.startswith("{")
        ]
        assert responses[0]["status"] == "ok"
        assert any(a.endswith("a_frames.npz") for a in responses[0]["artifacts"])
