"""Loader tests: key conversion, checkpoint round-trip, fp8, LoRA, registry.

Mirrors reference tests/test_loaders.py semantics (SURVEY.md §4).
"""

import jax
import jax.numpy as jnp
import ml_dtypes
import numpy as np
import pytest

from ltx2_tpu.loader import (
    LoRAConfig,
    StateDictRegistry,
    convert_checkpoint_key,
    detect_model_version,
    fuse_lora_into_params,
    is_fp8_checkpoint,
    is_v2_model,
    load_flat_diffusion_weights,
    load_transformer_params,
    read_checkpoint_config,
    structure_diffusion_weights,
    unfuse_lora_deltas,
    write_safetensors,
)
from ltx2_tpu.models.transformer.model import LTXModelConfig, LTXModelType
from tests.helpers import cached_params, jitted_forward, params_to_checkpoint
from tests.test_dit import make_video_modality, tiny_config


class TestKeyConversion:
    def test_to_out_rewrite(self):
        assert (
            convert_checkpoint_key("transformer_blocks.0.attn1.to_out.0.weight")
            == "transformer_blocks.0.attn1.to_out.weight"
        )

    def test_ff_rewrites(self):
        assert (
            convert_checkpoint_key("transformer_blocks.3.ff.net.0.proj.weight")
            == "transformer_blocks.3.ff.project_in.proj.weight"
        )
        assert (
            convert_checkpoint_key("transformer_blocks.3.ff.net.2.bias")
            == "transformer_blocks.3.ff.project_out.bias"
        )

    def test_audio_ff_rewrites_with_audio(self):
        assert (
            convert_checkpoint_key(
                "transformer_blocks.1.audio_ff.net.0.proj.weight", include_audio=True
            )
            == "transformer_blocks.1.audio_ff.project_in.proj.weight"
        )

    def test_audio_skipped_without_flag(self):
        assert convert_checkpoint_key("audio_patchify_proj.weight") is None
        assert convert_checkpoint_key("transformer_blocks.0.audio_attn1.to_q.weight") is None
        assert (
            convert_checkpoint_key("audio_patchify_proj.weight", include_audio=True)
            is not None
        )

    def test_connectors_skipped(self):
        assert convert_checkpoint_key("video_embeddings_connector.blocks.0.attn1.to_q.weight") is None


class TestCheckpointRoundTrip:
    def test_load_matches_init(self, tmp_path):
        cfg = tiny_config()
        params = cached_params(cfg)
        ckpt = params_to_checkpoint(params)
        path = str(tmp_path / "model.safetensors")
        write_safetensors(path, ckpt, metadata={"model_version": "2.0.0"})

        loaded = load_transformer_params(path, target_dtype="float32")
        video = make_video_modality(cfg)
        fn = jitted_forward(cfg)
        np.testing.assert_allclose(
            np.asarray(fn(params, video)), np.asarray(fn(loaded, video)), atol=1e-5
        )

    def test_av_load(self, tmp_path):
        from tests.test_dit import make_audio_modality

        cfg = tiny_config(model_type=LTXModelType.AudioVideo)
        params = cached_params(cfg)
        ckpt = params_to_checkpoint(params)
        path = str(tmp_path / "av.safetensors")
        write_safetensors(path, ckpt)

        loaded = load_transformer_params(path, include_audio=True, target_dtype="float32")
        video = make_video_modality(cfg)
        audio = make_audio_modality(cfg)
        fn = jitted_forward(cfg)
        v0, a0 = fn(params, video, audio)
        v1, a1 = fn(loaded, video, audio)
        np.testing.assert_allclose(np.asarray(v0), np.asarray(v1), atol=1e-5)
        np.testing.assert_allclose(np.asarray(a0), np.asarray(a1), atol=1e-5)

    def test_adaln_tables_stay_fp32(self, tmp_path):
        cfg = tiny_config()
        params = cached_params(cfg)
        path = str(tmp_path / "m.safetensors")
        write_safetensors(path, params_to_checkpoint(params))
        loaded = load_transformer_params(path, target_dtype="bfloat16")
        assert loaded["scale_shift_table"].dtype == jnp.float32
        assert loaded["transformer_blocks"]["scale_shift_table"].dtype == jnp.float32
        assert loaded["transformer_blocks"]["attn1"]["to_q"]["weight"].dtype == jnp.bfloat16


class TestStreamingWriter:
    def test_streaming_matches_eager_bytes(self, tmp_path):
        """Streaming writer (header-from-shapes + per-tensor data) must emit
        a byte-identical file to the eager dict writer."""
        from ltx2_tpu.loader.safetensors_io import write_safetensors_streaming
        import ml_dtypes

        rng = np.random.default_rng(0)
        tensors = {
            "a.weight": rng.normal(size=(4, 6)).astype(np.float32),
            "b.weight": rng.normal(size=(3,)).astype(ml_dtypes.bfloat16),
            "c.scale": rng.normal(size=()).astype(np.float16),
        }
        eager = tmp_path / "eager.safetensors"
        streamed = tmp_path / "streamed.safetensors"
        write_safetensors(str(eager), tensors, metadata={"model_version": "2.0.0"})

        calls = []

        def make_producer(name, arr):
            def produce():
                calls.append(name)
                return arr
            return produce

        write_safetensors_streaming(
            str(streamed),
            [(n, a.dtype, a.shape, make_producer(n, a)) for n, a in tensors.items()],
            metadata={"model_version": "2.0.0"},
        )
        assert eager.read_bytes() == streamed.read_bytes()
        # Producers run in declared order, once each (data is streamed, not batched).
        assert calls == list(tensors.keys())

    def test_streaming_producer_mismatch_raises(self, tmp_path):
        from ltx2_tpu.loader.safetensors_io import write_safetensors_streaming

        with np.testing.assert_raises(ValueError):
            write_safetensors_streaming(
                str(tmp_path / "bad.safetensors"),
                [("x", np.float32, (2, 2), lambda: np.zeros((3, 3), np.float32))],
            )

    def test_export_specs_are_lazy_and_match_eager(self, tmp_path):
        """iter_checkpoint_specs declares shapes without producing data, and
        export_transformer_checkpoint's streamed file loads back identically."""
        from ltx2_tpu.loader.export import (
            export_transformer_checkpoint,
            iter_checkpoint_specs,
        )
        from ltx2_tpu.loader.safetensors_io import SafetensorsFile

        cfg = tiny_config()
        params = cached_params(cfg)
        specs = list(iter_checkpoint_specs(params))
        eager = params_to_checkpoint(params)
        assert {n for n, _d, _s, _p in specs} == set(eager.keys())
        for name, dtype, shape, _p in specs:
            assert tuple(shape) == eager[name].shape
            assert np.dtype(dtype) == eager[name].dtype

        # carry_from: non-DiT tensors copied via mmap views, DiT keys win.
        src = tmp_path / "src.safetensors"
        write_safetensors(
            str(src),
            {
                "vae.decoder.conv_in.weight": np.full((2, 2), 7.0, np.float32),
                next(iter(eager)): np.zeros_like(next(iter(eager.values()))),
            },
        )
        out = tmp_path / "out.safetensors"
        export_transformer_checkpoint(str(out), params, carry_from=str(src))
        f = SafetensorsFile(str(out))
        np.testing.assert_array_equal(
            f.get("vae.decoder.conv_in.weight"), np.full((2, 2), 7.0, np.float32)
        )
        first_key = next(iter(eager))
        np.testing.assert_allclose(f.get(first_key), eager[first_key], atol=0)


class TestMetadata:
    def test_version_detection(self, tmp_path):
        path = str(tmp_path / "v23.safetensors")
        write_safetensors(
            path,
            {"x": np.zeros((2, 2), np.float32)},
            metadata={"model_version": "2.3.0", "config": '{"vae": {"decoder_blocks": []}}'},
        )
        assert detect_model_version(path) == "2.3.0"
        assert is_v2_model(path)
        assert read_checkpoint_config(path) == {"vae": {"decoder_blocks": []}}

    def test_non_v2(self, tmp_path):
        path = str(tmp_path / "v20.safetensors")
        write_safetensors(path, {"x": np.zeros(2, np.float32)}, metadata={"model_version": "2.0.0"})
        assert not is_v2_model(path)


class TestFP8:
    def test_fp8_detect_and_dequant(self, tmp_path):
        w = np.linspace(-2, 2, 64, dtype=np.float32).reshape(8, 8)
        scale = 0.5
        w_fp8 = (w / scale).astype(ml_dtypes.float8_e4m3fn)
        path = str(tmp_path / "fp8.safetensors")
        write_safetensors(
            path,
            {
                "model.diffusion_model.patchify_proj.weight": w_fp8,
                "model.diffusion_model.patchify_proj.weight_scale": np.asarray(
                    [scale], np.float32
                ),
            },
        )
        assert is_fp8_checkpoint(path)
        flat = load_flat_diffusion_weights(path, target_dtype="float32")
        got = flat["patchify_proj.weight"]
        expected = w_fp8.astype(np.float32) * scale
        np.testing.assert_allclose(got, expected, atol=1e-6)

    def test_non_fp8_detect(self, tmp_path):
        path = str(tmp_path / "reg.safetensors")
        write_safetensors(path, {"model.diffusion_model.x.weight": np.zeros(4, np.float32)})
        assert not is_fp8_checkpoint(path)


class TestLoRA:
    def _make_lora(self, tmp_path, rank=2, out_dim=32, in_dim=8, strength_key="attn1.to_q"):
        rng = np.random.default_rng(0)
        a = rng.normal(size=(rank, in_dim)).astype(np.float32)
        b = rng.normal(size=(out_dim, rank)).astype(np.float32)
        path = str(tmp_path / "lora.safetensors")
        write_safetensors(
            path,
            {
                f"diffusion_model.transformer_blocks.0.{strength_key}.lora_A.weight": a,
                f"diffusion_model.transformer_blocks.0.{strength_key}.lora_B.weight": b,
            },
        )
        return path, b @ a

    def test_fuse_and_restore(self, tmp_path):
        cfg = tiny_config()
        params = jax.tree_util.tree_map(lambda x: x, cached_params(cfg))
        base = np.asarray(params["transformer_blocks"]["attn1"]["to_q"]["weight"]).copy()
        path, delta = self._make_lora(
            tmp_path, out_dim=cfg.video_inner_dim, in_dim=cfg.video_inner_dim
        )

        params, applied = fuse_lora_into_params(
            params, [LoRAConfig(path=path, strength=0.5)], return_deltas=True
        )
        fused = np.asarray(params["transformer_blocks"]["attn1"]["to_q"]["weight"])
        np.testing.assert_allclose(fused[0], base[0] + 0.5 * delta, atol=1e-5)
        np.testing.assert_allclose(fused[1], base[1], atol=1e-7)  # only block 0

        params = unfuse_lora_deltas(params, applied)
        restored = np.asarray(params["transformer_blocks"]["attn1"]["to_q"]["weight"])
        np.testing.assert_allclose(restored, base, atol=1e-5)

    def test_strength_bounds(self):
        with pytest.raises(ValueError):
            LoRAConfig(path="x", strength=3.0)

    def test_aliased_keys_restore_exactly(self, tmp_path):
        """Two LoRA files with DIFFERENT prefix styles targeting the same
        leaf: collect keeps them as separate checkpoint keys, but both
        canonicalize to one tree leaf. The applied-delta map must
        ACCUMULATE (not overwrite), or unfuse subtracts only one delta and
        the restore silently corrupts the weights."""
        rng = np.random.default_rng(2)
        cfg = tiny_config()
        dim = cfg.video_inner_dim

        def lora_file(name, prefix):
            a = rng.normal(size=(2, dim)).astype(np.float32)
            b = rng.normal(size=(dim, 2)).astype(np.float32)
            path = str(tmp_path / name)
            write_safetensors(path, {
                f"{prefix}transformer_blocks.0.attn1.to_q.lora_A.weight": a,
                f"{prefix}transformer_blocks.0.attn1.to_q.lora_B.weight": b,
            })
            return path, b @ a

        p1, d1 = lora_file("l1.safetensors", "diffusion_model.")
        p2, d2 = lora_file("l2.safetensors", "")

        params = jax.tree_util.tree_map(lambda x: x, cached_params(cfg))
        base = np.asarray(params["transformer_blocks"]["attn1"]["to_q"]["weight"]).copy()
        params, applied = fuse_lora_into_params(
            params,
            [LoRAConfig(path=p1, strength=1.0), LoRAConfig(path=p2, strength=1.0)],
            return_deltas=True,
        )
        fused = np.asarray(params["transformer_blocks"]["attn1"]["to_q"]["weight"])
        np.testing.assert_allclose(fused[0], base[0] + d1 + d2, atol=1e-4)

        params = unfuse_lora_deltas(params, applied)
        restored = np.asarray(params["transformer_blocks"]["attn1"]["to_q"]["weight"])
        np.testing.assert_allclose(restored, base, atol=1e-4)

    def test_lora_down_up_naming(self, tmp_path):
        rng = np.random.default_rng(1)
        a = rng.normal(size=(2, 32)).astype(np.float32)
        b = rng.normal(size=(32, 2)).astype(np.float32)
        path = str(tmp_path / "lora2.safetensors")
        write_safetensors(
            path,
            {
                "transformer_blocks.0.attn1.to_k.lora_down.weight": a,
                "transformer_blocks.0.attn1.to_k.lora_up.weight": b,
            },
        )
        cfg = tiny_config()
        params = jax.tree_util.tree_map(lambda x: x, cached_params(cfg))
        base = np.asarray(params["transformer_blocks"]["attn1"]["to_k"]["weight"]).copy()
        params = fuse_lora_into_params(params, [LoRAConfig(path=path, strength=1.0)])
        fused = np.asarray(params["transformer_blocks"]["attn1"]["to_k"]["weight"])
        np.testing.assert_allclose(fused[0], base[0] + b @ a, atol=1e-5)


class TestRegistry:
    def test_add_get_pop(self):
        reg = StateDictRegistry()
        sd = {"w": np.zeros(2)}
        reg.add(["/tmp/a.safetensors"], "transformer", sd)
        assert reg.get(["/tmp/a.safetensors"], "transformer") is sd
        assert reg.get(["/tmp/a.safetensors"], "other") is None
        assert reg.pop(["/tmp/a.safetensors"], "transformer") is sd
        assert len(reg) == 0

    def test_duplicate_add_raises(self):
        reg = StateDictRegistry()
        reg.add(["/tmp/a"], None, {})
        with pytest.raises(ValueError):
            reg.add(["/tmp/a"], None, {})

    def test_thread_safety(self):
        import threading

        reg = StateDictRegistry()
        errors = []

        def worker(i):
            try:
                reg.add([f"/tmp/{i}"], None, {"i": i})
            except Exception as e:  # pragma: no cover
                errors.append(e)

        threads = [threading.Thread(target=worker, args=(i,)) for i in range(16)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errors
        assert len(reg) == 16


class TestNativeConvert:
    """Native C++ dtype kernels must match numpy/ml_dtypes semantics."""

    def test_available(self):
        from ltx2_tpu.loader.native import ensure_built, native_available

        assert ensure_built()
        assert native_available()

    def test_bf16_to_f32(self):
        from ltx2_tpu.loader.native import bf16_to_f32

        rng = np.random.default_rng(0)
        x = rng.normal(size=(1024,)).astype(np.float32).astype(ml_dtypes.bfloat16)
        got = bf16_to_f32(x)
        np.testing.assert_array_equal(got, x.astype(np.float32))

    def test_f32_to_bf16_rne(self):
        from ltx2_tpu.loader.native import f32_to_bf16

        rng = np.random.default_rng(1)
        x = rng.normal(size=(4096,)).astype(np.float32) * 100
        got = f32_to_bf16(x)
        expected = x.astype(ml_dtypes.bfloat16)
        np.testing.assert_array_equal(got.view(np.uint16), expected.view(np.uint16))

    def test_f32_to_bf16_preserves_nan_and_specials(self):
        """RNE narrowing must not launder NaN into Inf: a NaN whose payload
        lives only in the low 16 bits (0x7F800001) would carry into the
        exponent under the rounding add. ml_dtypes is the parity target."""
        from ltx2_tpu.loader.native import f32_to_bf16

        x = np.array([np.nan, np.inf, -np.inf, 0.0, -0.0], np.float32)
        x = np.concatenate([
            x,
            np.frombuffer(np.uint32(0x7F800001).tobytes(), np.float32),
            np.frombuffer(np.uint32(0xFF800001).tobytes(), np.float32),
        ])
        got = np.asarray(f32_to_bf16(x), np.float32)
        want = np.asarray(x.astype(ml_dtypes.bfloat16), np.float32)
        np.testing.assert_array_equal(np.isnan(got), np.isnan(want))
        mask = ~np.isnan(want)
        np.testing.assert_array_equal(got[mask], want[mask])

    def test_fp8_dequant(self):
        from ltx2_tpu.loader.native import fp8_e4m3_dequant

        x = np.arange(256, dtype=np.uint8).view(ml_dtypes.float8_e4m3fn)
        got = fp8_e4m3_dequant(x, 0.5, target="float32")
        expected = x.astype(np.float32) * 0.5
        np.testing.assert_allclose(
            got[~np.isnan(expected)], expected[~np.isnan(expected)], rtol=1e-6
        )
        assert np.isnan(got[np.isnan(expected)]).all()

    def test_fp8_dequant_bf16(self):
        from ltx2_tpu.loader.native import fp8_e4m3_dequant

        x = np.linspace(-4, 4, 64, dtype=np.float32).astype(ml_dtypes.float8_e4m3fn)
        got = fp8_e4m3_dequant(x, 2.0, target="bfloat16")
        expected = (x.astype(np.float32) * 2.0).astype(ml_dtypes.bfloat16)
        np.testing.assert_array_equal(got.view(np.uint16), expected.view(np.uint16))


class TestFP8Serving:
    """fp8 weights kept quantized in HBM, dequantized at use."""

    def test_quantize_forward_close(self):
        from ltx2_tpu.loader.fp8 import quantize_params_fp8
        from tests.test_dit import make_video_modality, tiny_config

        cfg = tiny_config()
        params = cached_params(cfg)
        qparams = quantize_params_fp8(params)
        # Eligible weights got quantized + scales added.
        assert (
            qparams["transformer_blocks"]["attn1"]["to_q"]["weight"].dtype
            == jnp.float8_e4m3fn
        )
        assert "weight_scale" in qparams["transformer_blocks"]["attn1"]["to_q"]
        # AdaLN tables untouched.
        assert qparams["transformer_blocks"]["scale_shift_table"].dtype == jnp.float32

        video = make_video_modality(cfg)
        fn = jitted_forward(cfg)
        base = np.asarray(fn(params, video))
        quant = np.asarray(fn(qparams, video))
        # fp8 weights: outputs correlate strongly but are not exact.
        corr = np.corrcoef(base.ravel(), quant.ravel())[0, 1]
        assert corr > 0.99, corr

    def test_keep_fp8_checkpoint_load(self, tmp_path):
        from tests.test_dit import make_video_modality, tiny_config

        cfg = tiny_config()
        params = cached_params(cfg)
        # Build an fp8 checkpoint: quantize to_q of every block.
        ckpt = params_to_checkpoint(params)
        fp8_ckpt = {}
        for key, arr in ckpt.items():
            if key.endswith("attn1.to_q.weight"):
                amax = np.abs(arr).max() or 1.0
                scale = amax / 448.0
                fp8_ckpt[key] = (arr / scale).astype(ml_dtypes.float8_e4m3fn)
                fp8_ckpt[key.replace(".weight", ".weight_scale")] = np.asarray(
                    scale, np.float32
                )
            else:
                fp8_ckpt[key] = arr
        path = str(tmp_path / "fp8_model.safetensors")
        write_safetensors(path, fp8_ckpt)

        loaded = load_transformer_params(path, target_dtype="float32", keep_fp8=True)
        assert (
            loaded["transformer_blocks"]["attn1"]["to_q"]["weight"].dtype
            == jnp.float8_e4m3fn
        )
        video = make_video_modality(cfg)
        fn = jitted_forward(cfg)
        base = np.asarray(fn(params, video))
        quant = np.asarray(fn(loaded, video))
        corr = np.corrcoef(base.ravel(), quant.ravel())[0, 1]
        assert corr > 0.99, corr


class TestStreamingLoader:
    """Bounded-host-memory streaming loader (SURVEY hard-part #4)."""

    def test_streamed_equals_eager(self, tmp_path):
        import jax.tree_util as jtu

        cfg = tiny_config()
        params = cached_params(cfg)
        path = str(tmp_path / "model.safetensors")
        write_safetensors(path, params_to_checkpoint(params))

        for dtype in ("float32", "bfloat16"):
            a = load_transformer_params(path, target_dtype=dtype, streaming=True)
            b = load_transformer_params(path, target_dtype=dtype, streaming=False)
            la, ta = jtu.tree_flatten(a)[0], jtu.tree_structure(a)
            lb, tb = jtu.tree_flatten(b)[0], jtu.tree_structure(b)
            assert ta == tb
            for x, y in zip(la, lb):
                assert x.dtype == y.dtype
                np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_streamed_equals_eager_fp8_serving(self, tmp_path):
        import jax.tree_util as jtu
        import ml_dtypes

        rng = np.random.default_rng(0)
        ckpt = {}
        for i in range(3):
            w = rng.normal(size=(16, 8)).astype(np.float32)
            ckpt[f"model.diffusion_model.transformer_blocks.{i}.attn1.to_q.weight"] = (
                w.astype(ml_dtypes.float8_e4m3fn)
            )
            ckpt[f"model.diffusion_model.transformer_blocks.{i}.attn1.to_q.weight_scale"] = (
                np.float32(0.5 + i)
            )
        ckpt["model.diffusion_model.scale_shift_table"] = rng.normal(size=(2, 8)).astype(np.float32)
        path = str(tmp_path / "fp8.safetensors")
        write_safetensors(path, ckpt)

        a = load_transformer_params(path, keep_fp8=True, streaming=True)
        b = load_transformer_params(path, keep_fp8=True, streaming=False)
        assert jtu.tree_structure(a) == jtu.tree_structure(b)
        for x, y in zip(jtu.tree_flatten(a)[0], jtu.tree_flatten(b)[0]):
            assert x.dtype == y.dtype
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
        # fp8 weights stacked still-quantized; scales stacked (L,)
        assert a["transformer_blocks"]["attn1"]["to_q"]["weight"].dtype == jnp.float8_e4m3fn
        np.testing.assert_allclose(
            np.asarray(a["transformer_blocks"]["attn1"]["to_q"]["weight_scale"]),
            [0.5, 1.5, 2.5],
        )

    def test_streamed_host_allocations_bounded(self, tmp_path):
        """Peak HOST allocations (tracemalloc, which tracks numpy buffers):
        streaming with per-leaf device_put must never hold more than ~one
        stacked leaf of converted host memory, while the eager path holds
        the whole converted checkpoint at once. This is the 43 GB checkpoint
        -> 86 GB+ host-peak hazard from round 1, asserted at test scale."""
        import tracemalloc

        rng = np.random.default_rng(0)
        n_layers, dim = 48, 128
        ckpt = {}
        for i in range(n_layers):
            for name in ("attn1.to_q.weight", "attn1.to_k.weight", "ff.net.0.proj.weight"):
                ckpt[f"model.diffusion_model.transformer_blocks.{i}.{name}"] = (
                    rng.normal(size=(dim, dim)).astype(np.float32)
                )
        path = str(tmp_path / "big.safetensors")
        write_safetensors(path, ckpt)

        leaf_bytes = n_layers * dim * dim * 4  # one stacked f32 leaf
        ckpt_bytes = 3 * leaf_bytes

        # device_put that does NOT retain host memory (sink) so tracemalloc
        # sees exactly the loader's transient working set.
        def sink(_path, arr):
            return arr.shape  # drop the buffer

        def peak(streaming):
            tracemalloc.start()
            tracemalloc.reset_peak()
            load_transformer_params(
                path, target_dtype="float32", streaming=streaming, device_put=sink
            )
            _, p = tracemalloc.get_traced_memory()
            tracemalloc.stop()
            return p

        peak_stream = peak(True)
        peak_eager = peak(False)
        # streaming: <= ~1 stacked leaf (+ small slack for temporaries)
        assert peak_stream < 1.5 * leaf_bytes, (
            f"streaming peak {peak_stream/1e6:.1f} MB exceeds one-leaf bound "
            f"{1.5 * leaf_bytes/1e6:.1f} MB"
        )
        # eager: the full converted checkpoint is resident at once
        assert peak_eager > 0.9 * ckpt_bytes
        assert peak_stream < peak_eager / 2
