"""int8 W8A8 serving quantization (loader/int8.py + ops/common._w8a8_matmul).

The opt-in `--int8` serving mode (beyond the reference, whose only
quantized mode is fp8 weights dequantized into bf16 matmuls at
fp8_loader.py:14-130): symmetric per-out-channel int8 weights + per-token
dynamic int8 activations, accumulated in int32 on the v5e's 2x-throughput
int8 MXU path. These tests pin the accuracy story the module's docstring
claims — corr > 0.999 vs bf16 through the 48-block DiT — plus the guard
rails (fp8 trees refuse int8, runtime LoRA fuse refuses int8 leaves) and
the CLI wiring end to end.
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ltx2_tpu.loader.int8 import quantize_params_int8, quantize_tensor_int8
from ltx2_tpu.models.transformer.model import (
    LTXModelConfig,
    LTXModelType,
    Modality,
    init_ltx_model,
    x0_model_apply,
)
from ltx2_tpu.ops.common import init_linear, linear
from ltx2_tpu.ops.rope import create_position_grid

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))


def corr(a, b) -> float:
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(np.corrcoef(a, b)[0, 1])


class TestQuantize:
    def test_tensor_roundtrip_2d(self):
        w = jax.random.normal(jax.random.PRNGKey(0), (64, 48), jnp.float32)
        q, scale = quantize_tensor_int8(w)
        assert q.dtype == jnp.int8 and q.shape == w.shape
        assert scale.shape == (64,) and scale.dtype == jnp.float32
        recon = q.astype(jnp.float32) * scale[:, None]
        # Per-out-channel symmetric: worst-case error is half a step.
        step = np.asarray(scale)[:, None]
        assert np.all(np.abs(np.asarray(recon - w)) <= 0.5 * step + 1e-7)
        assert corr(recon, w) > 0.9999

    def test_tensor_stacked_3d(self):
        w = jax.random.normal(jax.random.PRNGKey(1), (3, 16, 8), jnp.float32)
        q, scale = quantize_tensor_int8(w)
        assert q.shape == w.shape and scale.shape == (3, 16)
        # Layer 0 quantized alone must match layer 0 of the stack.
        q0, s0 = quantize_tensor_int8(w[0])
        np.testing.assert_array_equal(np.asarray(q[0]), np.asarray(q0))
        np.testing.assert_allclose(np.asarray(scale[0]), np.asarray(s0))

    def test_tree_walk_targets_matmuls_only(self):
        tree = {
            "to_q": {"weight": jnp.ones((8, 4)), "bias": jnp.zeros((8,))},
            "norm": {"weight": jnp.ones((4,))},
            "scale_shift_table": jnp.ones((6, 4)),
            "nested": {"project_in": {"weight": jnp.ones((8, 4)) * 0.5}},
        }
        out = quantize_params_int8(tree)
        assert out["to_q"]["weight"].dtype == jnp.int8
        assert "weight_cscale" in out["to_q"]
        assert out["to_q"]["bias"].dtype == jnp.float32  # untouched
        assert out["norm"]["weight"].dtype == jnp.float32
        assert out["scale_shift_table"].dtype == jnp.float32
        assert out["nested"]["project_in"]["weight"].dtype == jnp.int8

    def test_fp8_tree_refused(self):
        tree = {"to_q": {"weight": jnp.ones((8, 4)), "weight_scale": jnp.ones(())}}
        with pytest.raises(ValueError, match="fp8"):
            quantize_params_int8(tree)


class TestStreamingLoad:
    def test_int8_at_load_matches_device_quantize(self, tmp_path):
        """The streaming loader's quantize_int8 path (one stacked leaf at a
        time — device HBM never holds the bf16 tree, the constraint that
        makes --int8 usable for the 19B flagship on a 16 GB chip) must
        produce bit-identical int8 weights and scales to quantizing the
        loaded tree on device."""
        from ltx2_tpu.loader.safetensors_io import write_safetensors
        from ltx2_tpu.loader.weight_loader import load_transformer_params
        from tests.helpers import params_to_checkpoint

        cfg = LTXModelConfig(
            model_type=LTXModelType.VideoOnly,
            num_attention_heads=2,
            attention_head_dim=8,
            in_channels=8,
            out_channels=8,
            num_layers=2,
            cross_attention_dim=16,
            caption_channels=12,
            compute_dtype="bfloat16",
            remat=False,
        )
        params = jax.jit(lambda k: init_ltx_model(k, cfg))(jax.random.PRNGKey(3))
        path = str(tmp_path / "ckpt.safetensors")
        write_safetensors(path, params_to_checkpoint(params))

        plain = load_transformer_params(path, target_dtype="bfloat16")
        expected = jax.jit(quantize_params_int8)(plain)
        for streaming in (True, False):
            loaded = load_transformer_params(
                path, target_dtype="bfloat16", quantize_int8=True,
                streaming=streaming,
            )
            flat_e = jax.tree_util.tree_leaves_with_path(expected)
            flat_l = {str(p): v for p, v in
                      jax.tree_util.tree_leaves_with_path(loaded)}
            n_int8 = 0
            for p, exp in flat_e:
                got = flat_l[str(p)]
                assert got.dtype == exp.dtype, f"{p}: {got.dtype} != {exp.dtype}"
                if exp.dtype == jnp.int8:
                    n_int8 += 1
                    np.testing.assert_array_equal(np.asarray(got), np.asarray(exp))
                elif "cscale" in str(p):
                    np.testing.assert_allclose(
                        np.asarray(got), np.asarray(exp), rtol=1e-6
                    )
            assert n_int8 >= 8  # qkv/out/ffn across blocks actually quantized

    def test_streamed_load_converts_each_block_once(self, tmp_path, monkeypatch):
        """Two-suffix leaves (int8 '' + '_cscale') must not re-run the
        dequant+convert+quantize pipeline once per suffix (review r4: the
        per-suffix loop doubled at-load work for every quantized stacked
        leaf). Count _dequantize calls: exactly one per checkpoint tensor."""
        from ltx2_tpu.loader import weight_loader
        from ltx2_tpu.loader.safetensors_io import write_safetensors
        from tests.helpers import params_to_checkpoint

        cfg = LTXModelConfig(
            model_type=LTXModelType.VideoOnly,
            num_attention_heads=2,
            attention_head_dim=8,
            in_channels=8,
            out_channels=8,
            num_layers=2,
            cross_attention_dim=16,
            caption_channels=12,
            compute_dtype="bfloat16",
            remat=False,
        )
        params = jax.jit(lambda k: init_ltx_model(k, cfg))(jax.random.PRNGKey(3))
        ckpt = params_to_checkpoint(params)
        path = str(tmp_path / "ckpt.safetensors")
        write_safetensors(path, ckpt)

        real = weight_loader._dequantize
        calls = {"n": 0}

        def counting(*a, **kw):
            calls["n"] += 1
            return real(*a, **kw)

        monkeypatch.setattr(weight_loader, "_dequantize", counting)
        weight_loader.load_transformer_params(
            path, target_dtype="bfloat16", quantize_int8=True, streaming=True
        )
        assert calls["n"] == len(ckpt)

    def test_keep_fp8_excludes_quantize_int8(self, tmp_path):
        from ltx2_tpu.loader.weight_loader import load_transformer_params

        with pytest.raises(ValueError, match="mutually exclusive"):
            load_transformer_params(
                str(tmp_path / "x.safetensors"), keep_fp8=True,
                quantize_int8=True,
            )


class TestW8A8Linear:
    def test_matches_bf16_linear(self):
        k1, k2 = jax.random.split(jax.random.PRNGKey(2))
        p = init_linear(k1, 256, 128, bias=True, dtype=jnp.float32)
        x = jax.random.normal(k2, (4, 32, 256), jnp.bfloat16)
        ref = linear(p, x)
        q, cscale = quantize_tensor_int8(p["weight"])
        y = linear({"weight": q, "weight_cscale": cscale, "bias": p["bias"]}, x)
        assert y.dtype == ref.dtype
        assert corr(y.astype(jnp.float32), ref.astype(jnp.float32)) > 0.999

    def test_outlier_token_does_not_poison_others(self):
        """Per-TOKEN dynamic activation scaling: one huge-magnitude token
        must not destroy the quantization grid of the other tokens (the
        failure mode of per-tensor activation scaling)."""
        k1, k2 = jax.random.split(jax.random.PRNGKey(3))
        p = init_linear(k1, 64, 64, bias=False, dtype=jnp.float32)
        x = jax.random.normal(k2, (1, 8, 64), jnp.float32)
        x = x.at[0, 0].multiply(1000.0)  # outlier token
        ref = linear(p, x)
        q, cscale = quantize_tensor_int8(p["weight"])
        y = linear({"weight": q, "weight_cscale": cscale}, x)
        assert corr(y[0, 1:], ref[0, 1:]) > 0.999  # normal tokens intact

    def test_zero_row_is_safe(self):
        p = init_linear(jax.random.PRNGKey(4), 16, 8, bias=False)
        x = jnp.zeros((1, 3, 16), jnp.float32)
        q, cscale = quantize_tensor_int8(p["weight"])
        y = linear({"weight": q, "weight_cscale": cscale}, x)
        assert np.all(np.isfinite(np.asarray(y)))
        np.testing.assert_array_equal(np.asarray(y), 0.0)


class Test48BlockDiT:
    def test_forward_corr_above_999(self):
        """The docstring's headline claim: through the full 48-block depth
        (the error-accumulation axis; width doesn't change the rounding
        statistics), the int8 W8A8 forward correlates > 0.999 with bf16."""
        cfg = LTXModelConfig(
            model_type=LTXModelType.VideoOnly,
            num_attention_heads=4,
            attention_head_dim=16,
            in_channels=16,
            out_channels=16,
            num_layers=48,
            cross_attention_dim=64,
            caption_channels=None,
            compute_dtype="bfloat16",
            remat=False,
        )
        params = jax.jit(lambda k: init_ltx_model(k, cfg))(jax.random.PRNGKey(0))
        n_f, n_h, n_w = 2, 3, 4
        n = n_f * n_h * n_w
        grid = create_position_grid(1, n_f, n_h, n_w).astype(jnp.float32)
        ks = jax.random.split(jax.random.PRNGKey(7), 2)
        modality = Modality(
            latent=jax.random.normal(ks[0], (1, n, 16), jnp.bfloat16),
            context=jax.random.normal(ks[1], (1, 9, 64), jnp.bfloat16),
            context_mask=None,
            timesteps=jnp.full((1,), 0.7, jnp.float32),
            positions=jnp.stack([grid, grid + 1], axis=-1),
            sigma=jnp.full((1,), 0.7, jnp.float32),
        )
        fwd = jax.jit(lambda p, m: x0_model_apply(p, cfg, video=m))
        ref = fwd(params, modality)
        q_params = jax.jit(quantize_params_int8)(params)
        # The stacked transformer_blocks carry per-(layer, row) scales.
        blk = q_params["transformer_blocks"]["attn1"]["to_q"]
        assert blk["weight"].dtype == jnp.int8
        assert blk["weight_cscale"].shape == blk["weight"].shape[:2]
        out = fwd(q_params, modality)
        c = corr(out.astype(jnp.float32), ref.astype(jnp.float32))
        assert c > 0.999, f"48-block int8 corr {c}"


class TestCLI:
    def test_int8_flag_end_to_end(self, tmp_path):
        """generate.py --int8 runs the real pipeline; output correlates
        with the bf16 run at the same seed but is not bit-identical
        (proving the int8 path actually engaged)."""
        import generate

        def run(*extra):
            out = tmp_path / ("i" + str(len(extra)) + ".mp4")
            generate.main([
                "--placeholder", "--no-gemma", "--pipeline", "one-stage",
                "--height", "64", "--width", "96", "--num-frames", "9",
                "--num-inference-steps", "2", "--seed", "11",
                "--output", str(out), *extra,
            ])
            return np.load(str(out).replace(".mp4", "_frames.npz"))["frames"]

        base = run()
        quant = run("--int8")
        assert base.shape == quant.shape
        assert not np.array_equal(base, quant)  # int8 path engaged
        assert corr(base.astype(np.float32), quant.astype(np.float32)) > 0.99

    def test_int8_excludes_fp8(self):
        import generate

        with pytest.raises(SystemExit, match="mutually exclusive"):
            generate._apply_reference_compat(
                generate.build_parser().parse_args(
                    ["--placeholder", "--int8", "--fp8-serving"]
                )
            )

    def test_int8_runtime_lora_pipelines_rejected_at_launch(self):
        """The int8 x runtime-LoRA-fuse conflict is knowable at parse time;
        rejecting it only at the stage-2 fuse costs the whole stage-1
        denoise first (review r4)."""
        import generate

        for argv in (
            ["--placeholder", "--int8", "--pipeline", "two-stage",
             "--distilled-lora", "x.safetensors"],
            ["--placeholder", "--int8", "--pipeline", "ic-lora"],
        ):
            with pytest.raises(SystemExit, match="full-precision"):
                generate._apply_reference_compat(
                    generate.build_parser().parse_args(argv)
                )
        # --int8 with a LOAD-TIME --lora spec stays allowed (fuses first).
        args = generate._apply_reference_compat(
            generate.build_parser().parse_args(
                ["--placeholder", "--int8", "--lora", "x.safetensors:0.5"]
            )
        )
        assert args.int8

    def test_runtime_lora_fuse_refuses_int8(self, tmp_path):
        from ltx2_tpu.loader.lora import LoRAConfig, fuse_lora_into_params
        from ltx2_tpu.loader.safetensors_io import write_safetensors

        rank, out_f, in_f = 2, 8, 4
        rng = np.random.default_rng(0)
        a = rng.normal(size=(rank, in_f)).astype(np.float32)
        b = rng.normal(size=(out_f, rank)).astype(np.float32)
        path = str(tmp_path / "lora.safetensors")
        write_safetensors(path, {
            "diffusion_model.transformer_blocks.0.attn1.to_q.lora_A.weight": a,
            "diffusion_model.transformer_blocks.0.attn1.to_q.lora_B.weight": b,
        })
        lora = LoRAConfig(path=path, strength=1.0)
        w = jnp.ones((1, out_f, in_f))
        q, cscale = quantize_tensor_int8(w)
        params = {
            "transformer_blocks": {
                "attn1": {"to_q": {"weight": q, "weight_cscale": cscale}}
            }
        }
        with pytest.raises(ValueError, match="int8"):
            fuse_lora_into_params(params, [lora])


class TestTextKVWithInt8:
    def test_precompute_text_kv_dequantizes_cscale(self):
        """--int8 + --cache-text-kv (review r4): _stacked_linear must apply
        weight_cscale — raw int8 codes cast to bf16 made every cached
        cross-attention K/V wrong by the per-channel scale."""
        from ltx2_tpu.models.transformer.model import precompute_text_kv

        cfg = LTXModelConfig(
            model_type=LTXModelType.VideoOnly,
            num_attention_heads=2,
            attention_head_dim=8,
            in_channels=8,
            out_channels=8,
            num_layers=2,
            cross_attention_dim=16,
            caption_channels=12,
            compute_dtype="float32",
            remat=False,
        )
        params = jax.jit(lambda k: init_ltx_model(k, cfg))(jax.random.PRNGKey(5))
        ctx = jax.random.normal(jax.random.PRNGKey(6), (1, 7, 12))
        ref = precompute_text_kv(params, cfg, video_context=ctx)
        q = jax.jit(quantize_params_int8)(params)
        got = precompute_text_kv(q, cfg, video_context=ctx)
        for name in ref:
            for r, g in zip(ref[name], got[name]):
                assert corr(r, g) > 0.999, name
                # The unscaled-codes bug was off by up to ~127x, so a
                # magnitude check catches it even where corr survives.
                assert 0.5 < float(
                    jnp.linalg.norm(g) / jnp.linalg.norm(r)
                ) < 2.0, name


class TestQuantizeGuards:
    def test_fp8_refuses_already_quantized_trees(self):
        from ltx2_tpu.loader.fp8 import quantize_params_fp8

        w = jnp.ones((1, 4, 4))
        q, cscale = quantize_tensor_int8(w)
        tree = {"attn1": {"to_q": {"weight": q, "weight_cscale": cscale}}}
        with pytest.raises(ValueError, match="already-quantized"):
            quantize_params_fp8(tree)
        # int8 codes without the scale leaf are non-floating: skipped, not
        # silently re-quantized.
        out = quantize_params_fp8({"attn1": {"to_q": {"weight": q}}})
        assert out["attn1"]["to_q"]["weight"].dtype == jnp.int8
        assert "weight_scale" not in out["attn1"]["to_q"]

    def test_export_refuses_quantized_trees(self, tmp_path):
        from ltx2_tpu.loader.export import export_transformer_checkpoint

        w = jnp.ones((2, 4, 4), jnp.bfloat16)
        q, cscale = quantize_tensor_int8(w)
        tree = {"transformer_blocks": {"attn1": {"to_q": {
            "weight": q, "weight_cscale": cscale,
        }}}}
        with pytest.raises(ValueError, match="quantized"):
            export_transformer_checkpoint(str(tmp_path / "out.safetensors"), tree)


class TestPartialFuseAtomicity:
    def test_failed_fuse_leaves_tree_untouched(self, tmp_path):
        """review r4: the int8/fp8 refusal fired mid-loop AFTER mutating
        earlier leaves in place — a failed fuse must leave the caller's
        shared tree bit-identical (two_stage's finally never unfuses when
        the fuse itself raised)."""
        from ltx2_tpu.loader.lora import LoRAConfig, fuse_lora_into_params
        from ltx2_tpu.loader.safetensors_io import write_safetensors

        rank, out_f, in_f = 2, 8, 4
        rng = np.random.default_rng(0)
        path = str(tmp_path / "lora.safetensors")
        write_safetensors(path, {
            # Alphabetically BEFORE to_q so the bf16 leaf fuses first in
            # iteration order under the old single-pass code.
            "diffusion_model.transformer_blocks.0.attn1.to_k.lora_A.weight":
                rng.normal(size=(rank, in_f)).astype(np.float32),
            "diffusion_model.transformer_blocks.0.attn1.to_k.lora_B.weight":
                rng.normal(size=(out_f, rank)).astype(np.float32),
            "diffusion_model.transformer_blocks.0.attn1.to_q.lora_A.weight":
                rng.normal(size=(rank, in_f)).astype(np.float32),
            "diffusion_model.transformer_blocks.0.attn1.to_q.lora_B.weight":
                rng.normal(size=(out_f, rank)).astype(np.float32),
        })
        wk = jnp.asarray(rng.normal(size=(1, out_f, in_f)), jnp.float32)
        q8, cscale = quantize_tensor_int8(
            jnp.asarray(rng.normal(size=(1, out_f, in_f)), jnp.float32)
        )
        params = {"transformer_blocks": {"attn1": {
            "to_k": {"weight": wk},
            "to_q": {"weight": q8, "weight_cscale": cscale},
        }}}
        before = np.asarray(wk).copy()
        with pytest.raises(ValueError, match="int8"):
            fuse_lora_into_params(params, [LoRAConfig(path=path, strength=1.0)])
        np.testing.assert_array_equal(
            np.asarray(params["transformer_blocks"]["attn1"]["to_k"]["weight"]),
            before,
            err_msg="failed fuse mutated an earlier leaf",
        )


class TestSNRReport:
    """scripts/bench_int8.py --snr-report (VERDICT r4 #6): the per-block
    activation-SNR budget that gates --int8 promotion once real weights
    exist."""

    @pytest.fixture(scope="class")
    def report(self):
        scripts = str(Path(__file__).resolve().parent.parent / "scripts")
        sys.path.insert(0, scripts)
        try:
            import bench_int8
        finally:
            sys.path.pop(0)
        return bench_int8.snr_report(blocks=6, tokens=48, heads=2, head_dim=16)

    def test_profile_shape_and_finiteness(self, report):
        snrs = report["per_block_activation_snr_db"]
        assert len(snrs) == report["blocks"] == 6
        assert all(np.isfinite(s) for s in snrs)
        assert report["min_snr_db"] == min(snrs)
        assert report["final_block_snr_db"] == snrs[-1]

    def test_error_accumulates_but_stays_usable(self, report):
        """Quantization error through depth can only accumulate (the SNR
        is against an independently-evolving bf16 chain), and on random
        weights the W8A8 recipe keeps >25 dB through every block — the
        budget real weights must also clear."""
        snrs = report["per_block_activation_snr_db"]
        assert snrs[-1] <= snrs[0] + 1.0  # accumulation, modulo noise
        assert report["min_snr_db"] > 25.0

    def test_identical_weights_give_near_infinite_snr(self):
        """Oracle-independence guard: the walk's two chains really are the
        two precisions — feeding the SAME block twice must report (near)
        lossless SNR, so a bug that compared a chain against itself would
        be caught by the finite numbers the real report produces."""
        scripts = str(Path(__file__).resolve().parent.parent / "scripts")
        sys.path.insert(0, scripts)
        try:
            import bench_int8
        finally:
            sys.path.pop(0)
        import dataclasses

        from ltx2_tpu.models.transformer.model import prepare_stream_args

        cfg = LTXModelConfig(
            model_type=LTXModelType.VideoOnly,
            num_attention_heads=2, attention_head_dim=16,
            in_channels=128, out_channels=128, num_layers=3,
            cross_attention_dim=32, caption_channels=None,
            compute_dtype="bfloat16", remat=False,
        )
        one_cfg = dataclasses.replace(cfg, num_layers=1)
        one = jax.jit(lambda k: init_ltx_model(k, one_cfg))(jax.random.PRNGKey(0))
        block = jax.tree_util.tree_map(lambda x: x[0], one["transformer_blocks"])
        f, h, w = 2, 2, 6
        grid = create_position_grid(1, f, h, w).astype(jnp.float32)
        k1, k2 = jax.random.split(jax.random.PRNGKey(1))
        modality = Modality(
            latent=jax.random.normal(k1, (1, f * h * w, 128), jnp.bfloat16),
            context=jax.random.normal(k2, (1, 8, 32), jnp.bfloat16),
            context_mask=None,
            timesteps=jnp.full((1,), 0.7, jnp.float32),
            positions=jnp.stack([grid, grid + 1], axis=-1),
            sigma=jnp.full((1,), 0.7, jnp.float32),
        )
        va, _, _, _ = prepare_stream_args(one, one_cfg, video=modality)
        snrs = np.asarray(bench_int8.snr_walk(cfg, block, block, va, 3))
        assert (snrs > 100.0).all(), snrs
