"""Recipe-level torch oracles (VERDICT r2 #7): end-to-end independent
PyTorch implementations of the two composite generation recipes whose
seams only had component oracles —

1. The two-stage weight-mutation boundary (reference two_stage.py:495-804):
   stage-1 CFG loop -> un-normalize -> spatial upscale -> re-normalize ->
   LoRA fuse -> stage-2 distilled loop -> weight restore. The JAX side runs
   the REAL TwoStagePipeline (skip_decode); the torch side chains the torch
   DiT oracle, the torch upscaler oracle, and an independent LoRA fuse,
   sigmas + weights in -> final latent out.

2. The a2vid frozen-audio AV loop (reference a2vid_two_stage.py:158-464):
   audio latent frozen (denoise_mask=0, latent == clean) while video
   denoises against it through AV cross-modal attention. Asserts the video
   latent against an independent torch AV loop AND that the audio latent is
   bit-frozen.

Noise arrays are reproduced from the SAME jax PRNG keys on both sides
(noise generation is an input, not the system under test); everything else
on the torch side is independent.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from tests.test_torch_oracle import t2j
from tests.test_torch_oracle_model import (
    build_jax_model,
    oracle_cfg,
    torch_ltx_forward,
    torch_x0,
    tree_to_torch,
)
from tests.test_torch_oracle_upscalers import torch_spatial_upscaler


def _pearson(a, b):
    a, b = np.asarray(a, np.float64).ravel(), np.asarray(b, np.float64).ravel()
    a -= a.mean()
    b -= b.mean()
    return float((a * b).sum() / np.sqrt((a * a).sum() * (b * b).sum() + 1e-12))


def _unpatchify_np(tokens, f, h, w):
    """(B, N, C) f-major tokens -> (B, C, F, H, W) (patch size 1)."""
    b, n, c = tokens.shape
    assert n == f * h * w
    return tokens.reshape(b, f, h, w, c).transpose(0, 4, 1, 2, 3)


def _patchify_np(latent):
    """(B, C, F, H, W) -> (B, N, C) f-major tokens (patch size 1)."""
    b, c, f, h, w = latent.shape
    return latent.transpose(0, 2, 3, 4, 1).reshape(b, f * h * w, c)


class TestTwoStageRecipeOracle:
    def test_weight_mutation_boundary(self, tmp_path):
        from ltx2_tpu.components import VideoLatentPatchifier
        from ltx2_tpu.conditioning.tools import VideoLatentTools
        from ltx2_tpu.loader.lora import LoRAConfig
        from ltx2_tpu.loader.safetensors_io import write_safetensors
        from ltx2_tpu.models.upscaler.spatial import (
            SpatialUpscalerConfig,
            init_spatial_upscaler,
        )
        from ltx2_tpu.pipelines.two_stage import TwoStageCFGConfig, TwoStagePipeline
        from ltx2_tpu.types import VideoLatentShape, VideoPixelShape

        cfg, params = build_jax_model(num_layers=2)
        base_params = jax.tree_util.tree_map(jnp.copy, params)

        up_cfg = SpatialUpscalerConfig(
            in_channels=cfg.in_channels, mid_channels=16,
            num_blocks_per_stage=1, num_groups=4, scale=2,
        )
        up_params = init_spatial_upscaler(jax.random.PRNGKey(30), up_cfg)
        # Randomize norm weights/biases so GroupNorm arithmetic is exercised.
        leaves, treedef = jax.tree_util.tree_flatten(up_params)
        uks = jax.random.split(jax.random.PRNGKey(31), len(leaves))
        up_params = jax.tree_util.tree_unflatten(
            treedef,
            [leaf + 0.1 * jax.random.normal(k, leaf.shape, leaf.dtype)
             for leaf, k in zip(leaves, uks)],
        )

        g = torch.Generator().manual_seed(50)
        mean = torch.randn(cfg.in_channels, generator=g) * 0.3
        std = torch.rand(cfg.in_channels, generator=g) + 0.5
        stats = {
            "per_channel_statistics": {
                "mean_of_means": t2j(mean),
                "std_of_means": t2j(std),
            }
        }

        # Distilled-LoRA file: rank-2 adapters on attn1.to_q of BOTH blocks.
        rank, inner = 2, cfg.video_inner_dim
        lora_tensors = {}
        lora_torch = {}
        for blk in range(cfg.num_layers):
            a = torch.randn(rank, inner, generator=g) * 0.1
            b_ = torch.randn(inner, rank, generator=g) * 0.1
            lora_tensors[
                f"diffusion_model.transformer_blocks.{blk}.attn1.to_q.lora_A.weight"
            ] = np.asarray(a, np.float32)
            lora_tensors[
                f"diffusion_model.transformer_blocks.{blk}.attn1.to_q.lora_B.weight"
            ] = np.asarray(b_, np.float32)
            lora_torch[blk] = (a, b_)
        lora_path = tmp_path / "distilled_lora.safetensors"
        write_safetensors(str(lora_path), lora_tensors)
        strength = 0.7

        config = TwoStageCFGConfig(
            height=64, width=64, num_frames=9, seed=11,
            num_inference_steps=2, cfg_scale=3.0,
            distilled_lora_config=LoRAConfig(str(lora_path), strength),
            stage_2_sigmas=[0.6, 0.3, 0.0],
            dtype="float32", latent_channels=cfg.in_channels,
            audio_enabled=False, use_internal_audio_branch=False,
        )

        pipe = TwoStagePipeline(
            transformer_params=params,
            transformer_cfg=cfg,
            video_decoder_params=stats,
            spatial_upscaler_params=up_params,
            spatial_upscaler_cfg=up_cfg,
        )
        gg = torch.Generator().manual_seed(51)
        pos_ctx = torch.randn(1, 7, cfg.caption_channels, generator=gg)
        neg_ctx = torch.randn(1, 7, cfg.caption_channels, generator=gg)
        got, _ = pipe(t2j(pos_ctx), t2j(neg_ctx), config, skip_decode=True)

        # Weights restored after stage 2 (the finally block).
        for a_leaf, b_leaf in zip(
            jax.tree_util.tree_leaves(pipe.transformer_params),
            jax.tree_util.tree_leaves(base_params),
        ):
            np.testing.assert_allclose(
                np.asarray(a_leaf), np.asarray(b_leaf), atol=1e-6,
                err_msg="base weights not restored after stage 2",
            )

        # ---------------- independent torch chain ----------------
        tp = tree_to_torch(base_params)
        ocfg = oracle_cfg(cfg)
        f1, h1, w1 = 2, 1, 1  # stage-1 latent grid for 32x32x9f

        # Stage-1 inputs: positions from the (deterministic) latent tools,
        # initial noise from the pipeline's k1 key.
        s1_shape = VideoLatentShape(
            batch=1, channels=cfg.in_channels, frames=f1, height=h1, width=w1
        )
        tools1 = VideoLatentTools(
            patchifier=VideoLatentPatchifier(1), target_shape=s1_shape,
            fps=config.fps,
        )
        pos1 = torch.from_numpy(
            np.asarray(tools1.create_initial_state().positions, np.float32)
        )
        key = jax.random.PRNGKey(config.seed)
        k1, _k1a, k2, _k2a, _dk = jax.random.split(key, 5)
        latent = torch.from_numpy(
            np.asarray(jax.random.normal(k1, (1, f1 * h1 * w1, cfg.in_channels)),
                       np.float32)
        )

        from ltx2_tpu.components import LTX2Scheduler

        sigmas1 = np.asarray(
            LTX2Scheduler().execute(steps=2), np.float32
        )

        def euler_cfg_loop(latent, sigmas, positions, scale, ctx_pos, ctx_neg):
            for i in range(len(sigmas) - 1):
                sigma, sigma_next = float(sigmas[i]), float(sigmas[i + 1])

                def fwd(ctx):
                    mod = {
                        "latent": latent,
                        "context": ctx,
                        "timesteps": torch.full((1,), sigma),
                        "positions": positions,
                        "sigma": torch.full((1,), sigma),
                    }
                    return torch_x0(mod, torch_ltx_forward(tp, ocfg, video=mod))

                if scale != 1.0:
                    cond, uncond = fwd(ctx_pos), fwd(ctx_neg)
                    denoised = cond + (scale - 1.0) * (cond - uncond)
                else:
                    denoised = fwd(ctx_pos)
                latent = latent + (latent - denoised) / sigma * (sigma_next - sigma)
            return latent

        latent = euler_cfg_loop(latent, sigmas1, pos1, 3.0, pos_ctx, neg_ctx)

        # Boundary: unpatchify -> un-normalize -> upscale -> normalize.
        lat5 = torch.from_numpy(
            _unpatchify_np(latent.numpy(), f1, h1, w1)
        )
        mean5 = mean.reshape(1, -1, 1, 1, 1)
        std5 = std.reshape(1, -1, 1, 1, 1)
        lat5 = lat5 * std5 + mean5
        lat5 = torch_spatial_upscaler(tree_to_torch(up_params), up_cfg, lat5)
        lat5 = (lat5 - mean5) / std5

        # LoRA fuse into the torch weights (stacked (L, out, in) leaves).
        wq = tp["transformer_blocks"]["attn1"]["to_q"]["weight"]
        for blk, (a, b_) in lora_torch.items():
            wq[blk] = wq[blk] + strength * (b_ @ a)

        # Stage 2: fresh tools at full-res latent grid (2, 2, 2); initial
        # latent = upscaled, noised to sigma0 with the pipeline's vkey.
        f2, h2, w2 = 2, 2, 2
        s2_shape = VideoLatentShape(
            batch=1, channels=cfg.in_channels, frames=f2, height=h2, width=w2
        )
        tools2 = VideoLatentTools(
            patchifier=VideoLatentPatchifier(1), target_shape=s2_shape,
            fps=config.fps,
        )
        pos2 = torch.from_numpy(
            np.asarray(tools2.create_initial_state().positions, np.float32)
        )
        tokens2 = torch.from_numpy(
            _patchify_np(lat5.detach().numpy().astype(np.float32))
        )
        vkey, _akey = jax.random.split(k2)
        noise2 = torch.from_numpy(
            np.asarray(jax.random.normal(vkey, tuple(tokens2.shape)), np.float32)
        )
        sigma0 = float(config.stage_2_sigmas[0])
        tokens2 = noise2 * sigma0 + tokens2 * (1 - sigma0)

        sigmas2 = np.asarray(config.stage_2_sigmas, np.float32)
        final = euler_cfg_loop(tokens2, sigmas2, pos2, 1.0, pos_ctx, neg_ctx)
        want = _unpatchify_np(final.numpy(), f2, h2, w2)

        got = np.asarray(got, np.float32)
        assert got.shape == want.shape
        corr = _pearson(got, want)
        assert corr > 0.999, f"two-stage recipe corr {corr}"
        np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)


class TestTI2VidHQRes2sRecipeOracle:
    def test_res2s_two_stage_recipe(self):
        """Full ti2vid-hq recipe (reference ti2vid_hq.py:100-531): stage-1
        Res2s exponential-integrator CFG loop -> un-normalize -> spatial
        upscale -> re-normalize -> stage-2 distilled Euler tail. The torch
        side implements the Res2s step independently — phi-series
        coefficients and the reference's literal 100-iteration "Bong"
        anchor fixed point (ti2vid_hq.py:240-247), NOT our closed form —
        so the pipeline's closed-form substitution is itself under test."""
        from ltx2_tpu.components import LTX2Scheduler, STAGE_2_DISTILLED_SIGMA_VALUES
        from ltx2_tpu.components import VideoLatentPatchifier
        from ltx2_tpu.conditioning.tools import VideoLatentTools
        from ltx2_tpu.models.upscaler.spatial import (
            SpatialUpscalerConfig,
            init_spatial_upscaler,
        )
        from ltx2_tpu.pipelines.ti2vid_hq import TI2VidHQConfig, TI2VidHQPipeline
        from ltx2_tpu.types import VideoLatentShape
        from tests.test_torch_oracle_components import oracle_phi

        cfg, params = build_jax_model(num_layers=2)

        up_cfg = SpatialUpscalerConfig(
            in_channels=cfg.in_channels, mid_channels=16,
            num_blocks_per_stage=1, num_groups=4, scale=2,
        )
        up_params = init_spatial_upscaler(jax.random.PRNGKey(40), up_cfg)
        leaves, treedef = jax.tree_util.tree_flatten(up_params)
        uks = jax.random.split(jax.random.PRNGKey(41), len(leaves))
        up_params = jax.tree_util.tree_unflatten(
            treedef,
            [leaf + 0.1 * jax.random.normal(k, leaf.shape, leaf.dtype)
             for leaf, k in zip(leaves, uks)],
        )

        g = torch.Generator().manual_seed(70)
        mean = torch.randn(cfg.in_channels, generator=g) * 0.3
        std = torch.rand(cfg.in_channels, generator=g) + 0.5
        stats = {
            "per_channel_statistics": {
                "mean_of_means": t2j(mean),
                "std_of_means": t2j(std),
            }
        }

        config = TI2VidHQConfig(
            height=64, width=64, num_frames=9, seed=21,
            num_inference_steps=3, cfg_scale=3.0,
            dtype="float32", latent_channels=cfg.in_channels,
            audio_enabled=False, use_internal_audio_branch=False,
        )
        pipe = TI2VidHQPipeline(
            transformer_params=params,
            transformer_cfg=cfg,
            video_decoder_params=stats,
            spatial_upscaler_params=up_params,
            spatial_upscaler_cfg=up_cfg,
        )
        gg = torch.Generator().manual_seed(71)
        pos_ctx = torch.randn(1, 7, cfg.caption_channels, generator=gg)
        neg_ctx = torch.randn(1, 7, cfg.caption_channels, generator=gg)
        got = pipe(t2j(pos_ctx), t2j(neg_ctx), config, skip_decode=True)

        # ---------------- independent torch chain ----------------
        tp = tree_to_torch(params)
        ocfg = oracle_cfg(cfg)
        f1, h1, w1 = 2, 1, 1  # stage-1 latent grid for 32x32x9f

        s1_shape = VideoLatentShape(
            batch=1, channels=cfg.in_channels, frames=f1, height=h1, width=w1
        )
        tools1 = VideoLatentTools(
            patchifier=VideoLatentPatchifier(1), target_shape=s1_shape,
            fps=config.fps,
        )
        pos1 = torch.from_numpy(
            np.asarray(tools1.create_initial_state().positions, np.float32)
        )
        key = jax.random.PRNGKey(config.seed)
        k1, _k1a, k2, _dk = jax.random.split(key, 4)
        n1 = f1 * h1 * w1
        latent = torch.from_numpy(
            np.asarray(jax.random.normal(k1, (1, n1, cfg.in_channels)), np.float32)
        )
        sigmas1 = [
            float(s)
            for s in LTX2Scheduler().execute(steps=config.num_inference_steps)
        ]

        def cfg_eval(lat, positions, sigma, n):
            def fwd(ctx):
                mod = {
                    "latent": lat, "context": ctx,
                    "timesteps": torch.full((1, n), float(sigma)),
                    "positions": positions,
                    "sigma": torch.full((1,), float(sigma)),
                }
                return torch_x0(mod, torch_ltx_forward(tp, ocfg, video=mod))

            cond, uncond = fwd(pos_ctx), fwd(neg_ctx)
            return uncond + config.cfg_scale * (cond - uncond)

        # --- Res2s loop, reference semantics (ti2vid_hq.py:153-273) ---
        sig = sigmas1[:-1] + [0.0011, 0.0] if sigmas1[-1] == 0.0 else sigmas1
        import math as _math

        for i in range(len(sigmas1) - 1):
            sigma, sigma_next = sig[i], sig[i + 1]
            d = cfg_eval(latent, pos1, sigma, n1)
            h = (
                -_math.log(sigma_next / sigma)
                if sigma > 0 and sigma_next > 0 else 0.0
            )
            if h == 0.0 or sigma_next <= 0.001:
                latent = d
                break
            c2 = 0.5
            a21 = c2 * oracle_phi(1, -h * c2)
            b2 = oracle_phi(2, -h) / c2
            b1 = oracle_phi(1, -h) - b2
            sub_sigma = _math.sqrt(sigma * sigma_next)
            c = h * a21
            anchor = latent.clone()
            eps1 = d - anchor
            x_mid = anchor + c * eps1
            if h < 0.5 and sigma > 0.03 and abs(1 - c) > 1e-6:
                # Literal 100-iteration anchor fixed point (the reference's
                # "Bong" refinement); the pipeline uses its closed form.
                for _ in range(100):
                    anchor = x_mid - c * (d - anchor)
                eps1 = d - anchor
            d2 = cfg_eval(x_mid, pos1, sub_sigma, n1)
            eps2 = d2 - anchor
            latent = anchor + h * (b1 * eps1 + b2 * eps2)

        # --- upscale boundary (shared with the two-stage recipe) ---
        lat5 = torch.from_numpy(_unpatchify_np(latent.numpy(), f1, h1, w1))
        mean5 = mean.reshape(1, -1, 1, 1, 1)
        std5 = std.reshape(1, -1, 1, 1, 1)
        lat5 = lat5 * std5 + mean5
        lat5 = torch_spatial_upscaler(tree_to_torch(up_params), up_cfg, lat5)
        lat5 = (lat5 - mean5) / std5

        # --- stage 2: distilled Euler tail, no CFG ---
        f2, h2, w2 = 2, 2, 2
        s2_shape = VideoLatentShape(
            batch=1, channels=cfg.in_channels, frames=f2, height=h2, width=w2
        )
        tools2 = VideoLatentTools(
            patchifier=VideoLatentPatchifier(1), target_shape=s2_shape,
            fps=config.fps,
        )
        pos2 = torch.from_numpy(
            np.asarray(tools2.create_initial_state().positions, np.float32)
        )
        tokens2 = torch.from_numpy(
            _patchify_np(lat5.detach().numpy().astype(np.float32))
        )
        vkey, _akey = jax.random.split(k2)
        noise2 = torch.from_numpy(
            np.asarray(jax.random.normal(vkey, tuple(tokens2.shape)), np.float32)
        )
        sigmas2 = [float(s) for s in STAGE_2_DISTILLED_SIGMA_VALUES]
        tokens2 = noise2 * sigmas2[0] + tokens2 * (1 - sigmas2[0])
        n2 = f2 * h2 * w2
        for i in range(len(sigmas2) - 1):
            sigma, sigma_next = sigmas2[i], sigmas2[i + 1]

            def fwd(ctx):
                mod = {
                    "latent": tokens2, "context": ctx,
                    "timesteps": torch.full((1, n2), sigma),
                    "positions": pos2,
                    "sigma": torch.full((1,), sigma),
                }
                return torch_x0(mod, torch_ltx_forward(tp, ocfg, video=mod))

            denoised = fwd(pos_ctx)
            tokens2 = tokens2 + (tokens2 - denoised) / sigma * (sigma_next - sigma)
        want = _unpatchify_np(tokens2.numpy(), f2, h2, w2)

        got = np.asarray(got, np.float32)
        assert got.shape == want.shape
        corr = _pearson(got, want)
        assert corr > 0.999, f"ti2vid-hq recipe corr {corr}"
        np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)


class TestRetakeRecipeOracle:
    def test_masked_window_regeneration(self):
        """Full retake recipe (reference retake.py:199-...): VAE-encode the
        source video -> temporal-region denoise mask -> mask-blended noise
        -> per-token-timestep CFG Euler loop -> unpatchify. Torch side:
        independent torch VAE encoder chain + independent time->latent-frame
        mask math + independent masked loop. Also asserts the outside-window
        frames come back bit-identical to the encoded source."""
        from ltx2_tpu.components import LTX2Scheduler, VideoLatentPatchifier
        from ltx2_tpu.conditioning.tools import VideoLatentTools
        from ltx2_tpu.models.video_vae import init_video_encoder
        from ltx2_tpu.pipelines.retake import RetakeConfig, RetakePipeline
        from ltx2_tpu.types import VideoLatentShape
        from tests.test_torch_oracle_vae import torch_video_encoder
        from tests.test_video_vae import TINY_ENCODER

        cfg, params = build_jax_model(num_layers=2, in_channels=8, out_channels=8)
        enc_params = jax.jit(lambda k: init_video_encoder(k, TINY_ENCODER))(
            jax.random.PRNGKey(5)
        )
        pipe = RetakePipeline(
            transformer_params=params,
            transformer_cfg=cfg,
            video_encoder_params=enc_params,
            video_encoder_cfg=TINY_ENCODER,
        )
        config = RetakeConfig(
            start_time=0.4, end_time=0.8, seed=33,
            num_inference_steps=2, cfg_scale=3.0,
            dtype="float32", latent_channels=8,
        )
        g = torch.Generator().manual_seed(90)
        source = torch.randn(1, 3, 9, 16, 16, generator=g) * 0.3
        pos_ctx = torch.randn(1, 7, cfg.caption_channels, generator=g)
        neg_ctx = torch.randn(1, 7, cfg.caption_channels, generator=g)
        got = pipe(
            "", t2j(pos_ctx), t2j(neg_ctx), config,
            source_video=t2j(source), fps=24.0, skip_decode=True,
        )

        # ---------------- independent torch chain ----------------
        clean5 = torch_video_encoder(
            tree_to_torch(enc_params), TINY_ENCODER, source
        ).to(torch.float32)
        f, hh, ww = clean5.shape[2:]
        assert (f, hh, ww) == (5, 4, 4)
        clean = torch.from_numpy(_patchify_np(clean5.detach().numpy()))
        n = f * hh * ww

        # Temporal region mask (retake.py:141-196), independent math:
        # pixel times -> pixel frames -> latent frames (8x causal temporal).
        start_latent = max(0, (int(0.4 * 24.0) - 1) // 8)
        end_latent = min(f, (int(0.8 * 24.0) - 1) // 8 + 1)
        tokens_per_frame = hh * ww
        mask = torch.zeros(1, n, 1)
        mask[:, start_latent * tokens_per_frame : end_latent * tokens_per_frame] = 1.0

        shape = VideoLatentShape(batch=1, channels=8, frames=f, height=hh, width=ww)
        tools = VideoLatentTools(
            patchifier=VideoLatentPatchifier(1), target_shape=shape, fps=24.0
        )
        positions = torch.from_numpy(
            np.asarray(tools.create_initial_state().positions, np.float32)
        )
        noise_key, _dk = jax.random.split(jax.random.PRNGKey(config.seed))
        noise = torch.from_numpy(
            np.asarray(jax.random.normal(noise_key, (1, n, 8)), np.float32)
        )
        latent = noise * mask + clean * (1 - mask)

        tp = tree_to_torch(params)
        ocfg = oracle_cfg(cfg)
        sigmas = [
            float(s) for s in LTX2Scheduler().execute(
                steps=config.num_inference_steps
            )
        ]
        for i in range(len(sigmas) - 1):
            sigma, sigma_next = sigmas[i], sigmas[i + 1]

            def fwd(ctx):
                mod = {
                    "latent": latent, "context": ctx,
                    "timesteps": mask.squeeze(-1) * sigma,  # per-token
                    "positions": positions,
                    "sigma": torch.full((1,), sigma),
                }
                return torch_x0(mod, torch_ltx_forward(tp, ocfg, video=mod))

            cond, uncond = fwd(pos_ctx), fwd(neg_ctx)
            guided = cond + (config.cfg_scale - 1.0) * (cond - uncond)
            denoised = guided * mask + clean * (1 - mask)
            latent = latent + (latent - denoised) / sigma * (sigma_next - sigma)

        want = _unpatchify_np(latent.numpy(), f, hh, ww)
        got = np.asarray(got, np.float32)
        assert got.shape == want.shape

        # Outside the window: bit-identical to the JAX-encoded source (the
        # torch encoder chain agrees only to float rounding, so the
        # bit-equality check uses the same-encoder latent).
        from ltx2_tpu.pipelines.common import jitted_video_encoder

        clean_jax = np.asarray(
            jitted_video_encoder(TINY_ENCODER)(enc_params, t2j(source)), np.float32
        )
        np.testing.assert_array_equal(
            got[:, :, :start_latent], clean_jax[:, :, :start_latent],
            err_msg="frames before the retake window drifted",
        )
        np.testing.assert_array_equal(
            got[:, :, end_latent:], clean_jax[:, :, end_latent:],
            err_msg="frames after the retake window drifted",
        )
        corr = _pearson(got, want)
        assert corr > 0.999, f"retake recipe corr {corr}"
        np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)


def _kf_positions(f, h, w, frame_idx, fps):
    """Independent numpy mirror of the keyframe append-position math
    (reference keyframe_interpolation.py + patchifiers.py:202-240):
    f-major patch bounds * (8,32,32), causal fix only at frame 0, latent
    frame offset added to the temporal axis, then seconds via /fps."""
    fc, hc, wc = np.meshgrid(
        np.arange(f), np.arange(h), np.arange(w), indexing="ij"
    )
    starts = np.stack([fc, hc, wc], 0).reshape(3, -1)
    coords = np.stack([starts, starts + 1], -1).astype(np.float64)  # (3, N, 2)
    px = coords * np.array([8, 32, 32]).reshape(3, 1, 1)
    if frame_idx == 0:
        px = np.concatenate([np.maximum(px[0:1] + 1 - 8, 0), px[1:]], 0)
    px = np.concatenate([(px[0:1] + frame_idx) / fps, px[1:]], 0)
    return px[None].astype(np.float32)  # (1, 3, N, 2)


class TestKeyframeRecipeOracle:
    def test_keyframe_append_two_stage_recipe(self, tmp_path):
        """Full keyframe-interpolation recipe (reference
        keyframe_interpolation.py:332-497): keyframe images VAE-encoded and
        APPENDED past the sequence end with offset positions and
        (1-strength) denoise masks; stage 1 = CFG Euler loop over
        LTX2Scheduler sigmas (zeros negative context) at half res; stage 2
        = 2x upscale + distilled refinement, CFG disabled;
        clear_conditioning truncation. Torch side: independent VAE-encoder
        chain, independent append-position/mask math, independent
        per-token-timestep CFG loops and upscale boundary. The image-file
        -> pixel-tensor load is a shared input (load_image_tensor has its
        own coverage); everything downstream is independent."""
        from PIL import Image

        from ltx2_tpu.components import (
            LTX2Scheduler,
            STAGE_2_DISTILLED_SIGMA_VALUES,
            VideoLatentPatchifier,
        )
        from ltx2_tpu.conditioning.tools import VideoLatentTools
        from ltx2_tpu.models.upscaler.spatial import (
            SpatialUpscalerConfig,
            init_spatial_upscaler,
        )
        from ltx2_tpu.models.video_vae import init_video_encoder
        from ltx2_tpu.pipelines.common import load_image_tensor
        from ltx2_tpu.pipelines.keyframe_interpolation import (
            Keyframe,
            KeyframeInterpolationConfig,
            KeyframeInterpolationPipeline,
        )
        from ltx2_tpu.types import VideoLatentShape
        from tests.test_torch_oracle_vae import torch_video_encoder
        from tests.test_video_vae import TINY_ENCODER

        img_path = str(tmp_path / "kf.png")
        Image.fromarray(
            (np.random.default_rng(7).random((32, 32, 3)) * 255).astype(np.uint8)
        ).save(img_path)

        cfg, params = build_jax_model(num_layers=2, in_channels=8, out_channels=8)
        enc_params = jax.jit(lambda k: init_video_encoder(k, TINY_ENCODER))(
            jax.random.PRNGKey(5)
        )
        up_cfg = SpatialUpscalerConfig(
            in_channels=8, mid_channels=16,
            num_blocks_per_stage=1, num_groups=4, scale=2,
        )
        up_params = init_spatial_upscaler(jax.random.PRNGKey(50), up_cfg)
        leaves, treedef = jax.tree_util.tree_flatten(up_params)
        uks = jax.random.split(jax.random.PRNGKey(51), len(leaves))
        up_params = jax.tree_util.tree_unflatten(
            treedef,
            [leaf + 0.1 * jax.random.normal(k, leaf.shape, leaf.dtype)
             for leaf, k in zip(leaves, uks)],
        )
        g = torch.Generator().manual_seed(100)
        mean = torch.randn(8, generator=g) * 0.3
        std = torch.rand(8, generator=g) + 0.5
        stats = {
            "per_channel_statistics": {
                "mean_of_means": t2j(mean),
                "std_of_means": t2j(std),
            }
        }
        pipe = KeyframeInterpolationPipeline(
            transformer_params=params,
            transformer_cfg=cfg,
            video_decoder_params=stats,
            video_encoder_params=enc_params,
            video_encoder_cfg=TINY_ENCODER,
            spatial_upscaler_params=up_params,
            spatial_upscaler_cfg=up_cfg,
        )
        config = KeyframeInterpolationConfig(
            height=64, width=64, num_frames=9, seed=44,
            num_inference_steps=2, cfg_scale=7.5, stage_2_steps=3,
            dtype="float32", latent_channels=8,
            audio_enabled=False, use_internal_audio_branch=False,
        )
        keyframes = [
            Keyframe(image_path=img_path, frame_index=0, strength=0.95),
            Keyframe(image_path=img_path, frame_index=8, strength=0.9),
        ]
        pos_ctx = torch.randn(1, 7, cfg.caption_channels, generator=g)
        got = pipe(
            t2j(pos_ctx), None, config, keyframes=keyframes, skip_decode=True
        )

        # ---------------- independent torch chain ----------------
        tp = tree_to_torch(params)
        ocfg = oracle_cfg(cfg)
        enc_tp = tree_to_torch(enc_params)
        # Raw PIXEL frame indices: the reference passes Keyframe.frame_index
        # straight into the position offset (keyframe_interpolation.py:164,
        # conditioning/keyframe.py:70 — (pixel_coords + frame_idx) / fps);
        # there is no pixel->latent conversion anywhere in the chain.
        kf_specs = [(0, 0.95), (8, 0.9)]

        def encode_keyframes(res):
            pixel = torch.from_numpy(
                np.asarray(load_image_tensor(img_path, res, res), np.float32)
            )
            lat = torch_video_encoder(enc_tp, TINY_ENCODER, pixel).to(torch.float32)
            _, _, kf_f, kf_h, kf_w = lat.shape
            return torch.from_numpy(_patchify_np(lat.detach().numpy())), (kf_f, kf_h, kf_w)

        neg_ctx = torch.zeros_like(pos_ctx)

        def run_stage(latent_grid, sigmas, noise_key, noise_scale, res,
                      cfg_scale, initial_tokens=None):
            f, h, w = latent_grid
            n_base = f * h * w
            shape = VideoLatentShape(batch=1, channels=8, frames=f, height=h, width=w)
            tools = VideoLatentTools(
                patchifier=VideoLatentPatchifier(1), target_shape=shape,
                fps=config.fps,
            )
            base_pos = np.asarray(tools.create_initial_state().positions, np.float32)

            kf_tokens, kf_grid = encode_keyframes(res)
            parts_lat = [
                initial_tokens if initial_tokens is not None
                else torch.zeros(1, n_base, 8)
            ]
            parts_mask = [torch.ones(1, n_base, 1)]
            parts_pos = [base_pos]
            parts_clean = [
                initial_tokens.clone() if initial_tokens is not None
                else torch.zeros(1, n_base, 8)
            ]
            for frame_idx, strength in kf_specs:
                parts_lat.append(kf_tokens.clone())
                parts_clean.append(kf_tokens.clone())
                parts_mask.append(torch.full((1, kf_tokens.shape[1], 1), 1.0 - strength))
                parts_pos.append(_kf_positions(*kf_grid, frame_idx, config.fps))
            latent = torch.cat(parts_lat, dim=1)
            clean = torch.cat(parts_clean, dim=1)
            mask = torch.cat(parts_mask, dim=1)
            positions = torch.from_numpy(np.concatenate(parts_pos, axis=2))

            noise = torch.from_numpy(
                np.asarray(jax.random.normal(noise_key, tuple(latent.shape)), np.float32)
            )
            latent = noise * mask * noise_scale + latent * (1 - mask * noise_scale)

            for i in range(len(sigmas) - 1):
                sigma, sigma_next = float(sigmas[i]), float(sigmas[i + 1])

                def fwd(ctx):
                    mod = {
                        "latent": latent, "context": ctx,
                        "timesteps": mask.squeeze(-1) * sigma,
                        "positions": positions,
                        "sigma": torch.full((1,), sigma),
                    }
                    return torch_x0(mod, torch_ltx_forward(tp, ocfg, video=mod))

                denoised = fwd(pos_ctx)
                if cfg_scale != 1.0:
                    # Reference :327-333: CFG against a ZEROS negative.
                    uncond = fwd(neg_ctx)
                    denoised = denoised + (cfg_scale - 1.0) * (denoised - uncond)
                denoised = denoised * mask + clean * (1 - mask)
                latent = latent + (latent - denoised) / sigma * (sigma_next - sigma)
            return latent[:, :n_base]  # clear_conditioning truncation

        key = jax.random.PRNGKey(config.seed)
        k1, k2, _dk = jax.random.split(key, 3)
        # Stage 1: CFG loop over scheduler sigmas (fixed 4096 anchor,
        # reference keyframe_interpolation.py:373) at half res.
        s1_sigmas = [
            float(s)
            for s in LTX2Scheduler().execute(steps=config.num_inference_steps)
        ]
        stage1 = run_stage((2, 1, 1), s1_sigmas, k1, 1.0, 32, config.cfg_scale)

        lat5 = torch.from_numpy(_unpatchify_np(stage1.numpy(), 2, 1, 1))
        mean5 = mean.reshape(1, -1, 1, 1, 1)
        std5 = std.reshape(1, -1, 1, 1, 1)
        lat5 = lat5 * std5 + mean5
        lat5 = torch_spatial_upscaler(tree_to_torch(up_params), up_cfg, lat5)
        lat5 = (lat5 - mean5) / std5
        tokens2 = torch.from_numpy(_patchify_np(lat5.detach().numpy().astype(np.float32)))

        sigma0 = float(STAGE_2_DISTILLED_SIGMA_VALUES[0])
        stage2 = run_stage(
            (2, 2, 2),
            list(STAGE_2_DISTILLED_SIGMA_VALUES[: config.stage_2_steps + 1]),
            k2, sigma0, 64, 1.0,  # stage 2: CFG disabled (reference :486)
            initial_tokens=tokens2,
        )
        want = _unpatchify_np(stage2.numpy(), 2, 2, 2)

        got = np.asarray(got, np.float32)
        assert got.shape == want.shape
        corr = _pearson(got, want)
        assert corr > 0.999, f"keyframe recipe corr {corr}"
        np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)


class TestICLoraRecipeOracle:
    def test_stage1_only_lora_with_control_append(self, tmp_path):
        """Full ic-lora recipe (reference ic_lora.py:414-756): IC-LoRA fused
        for STAGE 1 ONLY (unfused before stage 2), control latent APPENDED
        at frame 0 via keyframe conditioning for stage 1 only, distilled
        two-stage flow. Torch side: independent LoRA fuse math, independent
        append-position/mask math, fused-weight stage-1 loop, base-weight
        stage-2 loop. The encoded control latent is a shared input (the VAE
        encode chain is oracled by the retake/keyframe recipes)."""
        from ltx2_tpu.components import (
            DISTILLED_SIGMA_VALUES,
            STAGE_2_DISTILLED_SIGMA_VALUES,
            VideoLatentPatchifier,
        )
        from ltx2_tpu.conditioning.keyframe import VideoConditionByKeyframeIndex
        from ltx2_tpu.conditioning.tools import VideoLatentTools
        from ltx2_tpu.loader.lora import LoRAConfig
        from ltx2_tpu.loader.safetensors_io import write_safetensors
        from ltx2_tpu.models.upscaler.spatial import (
            SpatialUpscalerConfig,
            init_spatial_upscaler,
        )
        from ltx2_tpu.pipelines.ic_lora import ICLoraConfig, ICLoraPipeline
        from ltx2_tpu.types import VideoLatentShape

        cfg, params = build_jax_model(num_layers=2, in_channels=8, out_channels=8)
        base_params = jax.tree_util.tree_map(jnp.copy, params)

        g = torch.Generator().manual_seed(110)
        rank, inner = 2, cfg.video_inner_dim
        lora_tensors = {}
        lora_torch = {}
        for blk in range(cfg.num_layers):
            a = torch.randn(rank, inner, generator=g) * 0.1
            b_ = torch.randn(inner, rank, generator=g) * 0.1
            lora_tensors[
                f"diffusion_model.transformer_blocks.{blk}.attn1.to_q.lora_A.weight"
            ] = np.asarray(a, np.float32)
            lora_tensors[
                f"diffusion_model.transformer_blocks.{blk}.attn1.to_q.lora_B.weight"
            ] = np.asarray(b_, np.float32)
            lora_torch[blk] = (a, b_)
        lora_path = tmp_path / "ic_lora.safetensors"
        write_safetensors(str(lora_path), lora_tensors)
        strength = 0.8

        up_cfg = SpatialUpscalerConfig(
            in_channels=8, mid_channels=16,
            num_blocks_per_stage=1, num_groups=4, scale=2,
        )
        up_params = init_spatial_upscaler(jax.random.PRNGKey(60), up_cfg)
        leaves, treedef = jax.tree_util.tree_flatten(up_params)
        uks = jax.random.split(jax.random.PRNGKey(61), len(leaves))
        up_params = jax.tree_util.tree_unflatten(
            treedef,
            [leaf + 0.1 * jax.random.normal(k, leaf.shape, leaf.dtype)
             for leaf, k in zip(leaves, uks)],
        )
        mean = torch.randn(8, generator=g) * 0.3
        std = torch.rand(8, generator=g) + 0.5
        stats = {
            "per_channel_statistics": {
                "mean_of_means": t2j(mean),
                "std_of_means": t2j(std),
            }
        }
        pipe = ICLoraPipeline(
            transformer_params=params,
            transformer_cfg=cfg,
            video_decoder_params=stats,
            spatial_upscaler_params=up_params,
            spatial_upscaler_cfg=up_cfg,
        )
        config = ICLoraConfig(
            height=64, width=64, num_frames=9, seed=55,
            dtype="float32", latent_channels=8,
            audio_enabled=False, use_internal_audio_branch=False,
            ic_lora_config=LoRAConfig(str(lora_path), strength),
        )
        control = torch.randn(1, 8, 2, 1, 1, generator=g) * 0.5
        control_strength = 0.95
        conditionings = [
            VideoConditionByKeyframeIndex(
                keyframes=t2j(control), frame_idx=0, strength=control_strength
            )
        ]
        pos_ctx = torch.randn(1, 7, cfg.caption_channels, generator=g)
        got = pipe(
            t2j(pos_ctx), None, config,
            control_conditionings=conditionings, skip_decode=True,
        )

        # Base weights restored after the run (stage-1-only fuse).
        for a_leaf, b_leaf in zip(
            jax.tree_util.tree_leaves(pipe.transformer_params),
            jax.tree_util.tree_leaves(base_params),
        ):
            np.testing.assert_allclose(
                np.asarray(a_leaf), np.asarray(b_leaf), atol=1e-6,
                err_msg="IC-LoRA not unfused after the run",
            )

        # ---------------- independent torch chain ----------------
        tp_fused = tree_to_torch(base_params)
        wq = tp_fused["transformer_blocks"]["attn1"]["to_q"]["weight"]
        for blk, (a, b_) in lora_torch.items():
            wq[blk] = wq[blk] + strength * (b_ @ a)
        tp_base = tree_to_torch(base_params)
        ocfg = oracle_cfg(cfg)
        ctl_tokens = torch.from_numpy(_patchify_np(control.numpy()))

        def run_stage(tp, latent_grid, sigmas, noise_key, noise_scale,
                      with_control, initial_tokens=None):
            f, h, w = latent_grid
            n_base = f * h * w
            shape = VideoLatentShape(batch=1, channels=8, frames=f, height=h, width=w)
            tools = VideoLatentTools(
                patchifier=VideoLatentPatchifier(1), target_shape=shape,
                fps=config.fps,
            )
            base_pos = np.asarray(tools.create_initial_state().positions, np.float32)
            latent = (
                initial_tokens.clone() if initial_tokens is not None
                else torch.zeros(1, n_base, 8)
            )
            clean = latent.clone()
            mask = torch.ones(1, n_base, 1)
            positions = base_pos
            if with_control:
                latent = torch.cat([latent, ctl_tokens.clone()], dim=1)
                clean = torch.cat([clean, ctl_tokens.clone()], dim=1)
                mask = torch.cat(
                    [mask, torch.full((1, ctl_tokens.shape[1], 1), 1.0 - control_strength)],
                    dim=1,
                )
                positions = np.concatenate(
                    [base_pos, _kf_positions(*control.shape[2:], 0, config.fps)], axis=2
                )
            positions = torch.from_numpy(positions)

            vkey, _akey = jax.random.split(noise_key)
            noise = torch.from_numpy(
                np.asarray(jax.random.normal(vkey, tuple(latent.shape)), np.float32)
            )
            latent = noise * mask * noise_scale + latent * (1 - mask * noise_scale)

            for i in range(len(sigmas) - 1):
                sigma, sigma_next = float(sigmas[i]), float(sigmas[i + 1])
                mod = {
                    "latent": latent, "context": pos_ctx,
                    "timesteps": mask.squeeze(-1) * sigma,
                    "positions": positions,
                    "sigma": torch.full((1,), sigma),
                }
                denoised = torch_x0(mod, torch_ltx_forward(tp, ocfg, video=mod))
                denoised = denoised * mask + clean * (1 - mask)
                latent = latent + (latent - denoised) / sigma * (sigma_next - sigma)
            return latent[:, :n_base]

        key = jax.random.PRNGKey(config.seed)
        k1, k2, _dk = jax.random.split(key, 3)
        stage1 = run_stage(
            tp_fused, (2, 1, 1), list(DISTILLED_SIGMA_VALUES), k1, 1.0, True
        )

        lat5 = torch.from_numpy(_unpatchify_np(stage1.numpy(), 2, 1, 1))
        mean5 = mean.reshape(1, -1, 1, 1, 1)
        std5 = std.reshape(1, -1, 1, 1, 1)
        lat5 = lat5 * std5 + mean5
        lat5 = torch_spatial_upscaler(tree_to_torch(up_params), up_cfg, lat5)
        lat5 = (lat5 - mean5) / std5
        tokens2 = torch.from_numpy(_patchify_np(lat5.detach().numpy().astype(np.float32)))

        sigma0 = float(STAGE_2_DISTILLED_SIGMA_VALUES[0])
        stage2 = run_stage(
            tp_base, (2, 2, 2), list(STAGE_2_DISTILLED_SIGMA_VALUES), k2, sigma0,
            False, initial_tokens=tokens2,
        )
        want = _unpatchify_np(stage2.numpy(), 2, 2, 2)

        got = np.asarray(got, np.float32)
        assert got.shape == want.shape
        corr = _pearson(got, want)
        assert corr > 0.999, f"ic-lora recipe corr {corr}"
        np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)


class TestA2VidFrozenAudioOracle:
    def test_frozen_audio_av_loop(self):
        """AV denoise loop with the audio stream FROZEN (denoise_mask=0,
        latent == clean): video denoises against the fixed audio through
        the A2V/V2A cross-modal attention. Torch side: independent AV loop
        holding audio constant with per-token timesteps = mask * sigma
        (reference one_stage semantics for frozen tokens)."""
        from ltx2_tpu.components import AudioPatchifier, CFGGuider, VideoLatentPatchifier
        from ltx2_tpu.conditioning.tools import AudioLatentTools, VideoLatentTools
        from ltx2_tpu.pipelines.denoise import DenoiseLoopConfig, make_av_denoise_loop
        from ltx2_tpu.types import AudioLatentShape, VideoLatentShape

        from ltx2_tpu.models.transformer.model import LTXModelType

        cfg, params = build_jax_model(
            num_layers=2, model_type=LTXModelType.AudioVideo
        )

        v_shape = VideoLatentShape(batch=1, channels=cfg.in_channels,
                                   frames=2, height=2, width=3)
        v_tools = VideoLatentTools(
            patchifier=VideoLatentPatchifier(1), target_shape=v_shape, fps=24.0
        )
        a_shape = AudioLatentShape(
            batch=1, channels=cfg.audio_in_channels, frames=5, mel_bins=1
        )
        a_tools = AudioLatentTools(
            patchifier=AudioPatchifier(1), target_shape=a_shape
        )

        v_state = v_tools.create_initial_state()
        v_noise = jax.random.normal(jax.random.PRNGKey(3), v_state.latent.shape)
        v_state = v_state.replace(latent=v_noise)

        # FROZEN audio: encoded latent, mask 0, latent == clean.
        a_state = a_tools.create_initial_state()
        a_enc = jax.random.normal(jax.random.PRNGKey(4), a_state.latent.shape)
        a_state = a_state.replace(
            latent=a_enc,
            clean_latent=a_enc,
            denoise_mask=jnp.zeros_like(a_state.denoise_mask),
        )

        sigmas = np.asarray([1.0, 0.55, 0.0], np.float32)
        g = torch.Generator().manual_seed(61)
        pos_v = torch.randn(1, 7, cfg.caption_channels, generator=g)
        neg_v = torch.randn(1, 7, cfg.caption_channels, generator=g)
        pos_a = torch.randn(1, 7, cfg.caption_channels, generator=g)
        neg_a = torch.randn(1, 7, cfg.caption_channels, generator=g)

        loop = make_av_denoise_loop(
            cfg,
            DenoiseLoopConfig(
                guider=CFGGuider(3.0), audio_guider=CFGGuider(2.0),
                uniform_timesteps=False,
            ),
        )
        out_v, out_a = loop(
            params, v_state, a_state, jnp.asarray(sigmas),
            t2j(pos_v), t2j(neg_v), t2j(pos_a), t2j(neg_a),
        )

        # Audio latent is bit-frozen (velocity exactly 0 for mask-0 tokens).
        np.testing.assert_array_equal(
            np.asarray(out_a.latent), np.asarray(a_enc),
            err_msg="frozen audio latent drifted",
        )

        # ---------------- independent torch AV loop ----------------
        tp = tree_to_torch(params)
        ocfg = oracle_cfg(cfg)
        v_lat = torch.from_numpy(np.asarray(v_noise, np.float32))
        a_lat = torch.from_numpy(np.asarray(a_enc, np.float32))
        v_pos = torch.from_numpy(np.asarray(v_state.positions, np.float32))
        a_pos = torch.from_numpy(np.asarray(a_state.positions, np.float32))
        n_v, n_a = v_lat.shape[1], a_lat.shape[1]

        for i in range(len(sigmas) - 1):
            sigma, sigma_next = float(sigmas[i]), float(sigmas[i + 1])

            def fwd(v_ctx, a_ctx):
                v_mod = {
                    "latent": v_lat, "context": v_ctx,
                    "timesteps": torch.full((1, n_v), sigma),
                    "positions": v_pos, "sigma": torch.full((1,), sigma),
                }
                a_mod = {
                    "latent": a_lat, "context": a_ctx,
                    # frozen tokens: per-token timestep = mask * sigma = 0
                    "timesteps": torch.zeros((1, n_a)),
                    "positions": a_pos, "sigma": torch.full((1,), sigma),
                }
                v_vel, a_vel = torch_ltx_forward(tp, ocfg, video=v_mod, audio=a_mod)
                return torch_x0(v_mod, v_vel), torch_x0(a_mod, a_vel)

            vc, ac = fwd(pos_v, pos_a)
            vu, au = fwd(neg_v, neg_a)
            v_den = vc + 2.0 * (vc - vu)  # scale 3.0
            # audio: post-process with mask 0 -> denoised == clean == latent
            v_lat = v_lat + (v_lat - v_den) / sigma * (sigma_next - sigma)
            # a_lat unchanged (velocity (latent - clean)/sigma = 0)

        got = np.asarray(out_v.latent, np.float32)
        want = v_lat.numpy()
        corr = _pearson(got, want)
        assert corr > 0.999, f"a2vid frozen-audio loop corr {corr}"
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


class TestDistilledRecipeOracle:
    def test_av_distilled_two_stage(self):
        """The HEADLINE recipe (reference distilled.py:101-506), end to end
        vs an independent torch chain: stage 1 at half resolution on the
        REAL 8-sigma distilled table with the internal AV audio branch
        (channelwise audio-noise normalization fix, distilled.py:166-186),
        un-normalize -> learned 2x spatial upscale -> re-normalize, stage 2
        on the 3-sigma tail with BOTH latents re-noised to sigma0 (audio
        seeded from stage 1's output), no CFG anywhere. Asserts the final
        video AND audio latents."""
        from ltx2_tpu.components import (
            AudioPatchifier,
            DISTILLED_SIGMA_VALUES,
            STAGE_2_DISTILLED_SIGMA_VALUES,
            VideoLatentPatchifier,
        )
        from ltx2_tpu.conditioning.tools import AudioLatentTools, VideoLatentTools
        from ltx2_tpu.models.transformer.model import LTXModelType
        from ltx2_tpu.models.upscaler.spatial import (
            SpatialUpscalerConfig,
            init_spatial_upscaler,
        )
        from ltx2_tpu.pipelines.distilled import (
            DistilledConfig,
            DistilledPipeline,
            channelwise_normalize_audio,
        )
        from ltx2_tpu.types import AudioLatentShape, VideoLatentShape, VideoPixelShape

        cfg, params = build_jax_model(
            num_layers=2, model_type=LTXModelType.AudioVideo
        )

        up_cfg = SpatialUpscalerConfig(
            in_channels=cfg.in_channels, mid_channels=16,
            num_blocks_per_stage=1, num_groups=4, scale=2,
        )
        up_params = init_spatial_upscaler(jax.random.PRNGKey(40), up_cfg)
        leaves, treedef = jax.tree_util.tree_flatten(up_params)
        uks = jax.random.split(jax.random.PRNGKey(41), len(leaves))
        up_params = jax.tree_util.tree_unflatten(
            treedef,
            [leaf + 0.1 * jax.random.normal(k, leaf.shape, leaf.dtype)
             for leaf, k in zip(leaves, uks)],
        )

        g = torch.Generator().manual_seed(70)
        mean = torch.randn(cfg.in_channels, generator=g) * 0.3
        std = torch.rand(cfg.in_channels, generator=g) + 0.5
        stats = {
            "per_channel_statistics": {
                "mean_of_means": t2j(mean),
                "std_of_means": t2j(std),
            }
        }

        config = DistilledConfig(
            height=64, width=64, num_frames=9, seed=13, dtype="float32",
            latent_channels=cfg.in_channels,
            audio_enabled=True, use_internal_audio_branch=True,
            audio_vae_channels=cfg.audio_in_channels, audio_mel_bins=1,
        )

        pipe = DistilledPipeline(
            transformer_params=params,
            transformer_cfg=cfg,
            video_decoder_params=stats,
            spatial_upscaler_params=up_params,
            spatial_upscaler_cfg=up_cfg,
        )
        gg = torch.Generator().manual_seed(71)
        ctx = torch.randn(1, 7, cfg.caption_channels, generator=gg)
        got_video, got_audio = pipe(
            t2j(ctx), None, config, skip_decode=True
        )

        # ---------------- independent torch chain ----------------
        tp = tree_to_torch(params)
        ocfg = oracle_cfg(cfg)
        f1, h1, w1 = 2, 1, 1  # stage-1 latent grid for 32x32x9f
        f2, h2, w2 = 2, 2, 2  # stage-2 latent grid for 64x64x9f

        key = jax.random.PRNGKey(config.seed)
        k1, k2, _dk = jax.random.split(key, 3)
        vkey1, akey1 = jax.random.split(k1)
        vkey2, akey2 = jax.random.split(k2)

        def stage_inputs(fx, hx, wx, px_h, px_w):
            v_shape = VideoLatentShape(
                batch=1, channels=cfg.in_channels, frames=fx, height=hx, width=wx
            )
            v_tools = VideoLatentTools(
                patchifier=VideoLatentPatchifier(1), target_shape=v_shape,
                fps=config.fps,
            )
            pixel = VideoPixelShape(
                batch=1, frames=config.num_frames, height=px_h, width=px_w,
                fps=config.fps,
            )
            a_shape = AudioLatentShape.from_video_pixel_shape(
                pixel,
                channels=config.audio_vae_channels,
                mel_bins=config.audio_mel_bins,
                sample_rate=config.audio_sample_rate,
                hop_length=config.audio_hop_length,
                audio_latent_downsample_factor=config.audio_downsample_factor,
            )
            a_tools = AudioLatentTools(
                patchifier=AudioPatchifier(1), target_shape=a_shape
            )
            v_pos = torch.from_numpy(
                np.asarray(v_tools.create_initial_state().positions, np.float32)
            )
            a_state = a_tools.create_initial_state()
            a_pos = torch.from_numpy(np.asarray(a_state.positions, np.float32))
            return v_pos, a_pos, tuple(a_state.latent.shape), a_tools, a_shape

        v_pos1, a_pos1, a_tok_shape, a_tools1, _ = stage_inputs(
            f1, h1, w1, config.height // 2, config.width // 2
        )

        v_lat = torch.from_numpy(np.asarray(
            jax.random.normal(vkey1, (1, f1 * h1 * w1, cfg.in_channels)),
            np.float32,
        ))
        a_noise1 = torch.from_numpy(np.asarray(
            jax.random.normal(akey1, a_tok_shape), np.float32
        ))
        # The channelwise normalization fix — independent reimplementation.
        a_np = a_noise1.numpy().astype(np.float64)
        a_np = (a_np - a_np.mean()) / (a_np.std() + 1e-8)
        a_np = (a_np - a_np.mean(axis=1, keepdims=True)) / (
            a_np.std(axis=1, keepdims=True) + 1e-8
        )
        a_lat = torch.from_numpy(a_np.astype(np.float32))
        # Pin the reimplementation against the shipped helper too.
        np.testing.assert_allclose(
            a_lat.numpy(),
            np.asarray(channelwise_normalize_audio(t2j(a_noise1))),
            atol=1e-5,
        )

        def av_euler_loop(v_lat, a_lat, sigmas, v_pos, a_pos):
            n_v, n_a = v_lat.shape[1], a_lat.shape[1]
            for i in range(len(sigmas) - 1):
                sigma, sigma_next = float(sigmas[i]), float(sigmas[i + 1])
                v_mod = {
                    "latent": v_lat, "context": ctx,
                    "timesteps": torch.full((1,), sigma),
                    "positions": v_pos, "sigma": torch.full((1,), sigma),
                }
                a_mod = {
                    "latent": a_lat, "context": ctx,
                    "timesteps": torch.full((1,), sigma),
                    "positions": a_pos, "sigma": torch.full((1,), sigma),
                }
                v_vel, a_vel = torch_ltx_forward(tp, ocfg, video=v_mod, audio=a_mod)
                v_den = torch_x0(v_mod, v_vel)
                a_den = torch_x0(a_mod, a_vel)
                v_lat = v_lat + (v_lat - v_den) / sigma * (sigma_next - sigma)
                a_lat = a_lat + (a_lat - a_den) / sigma * (sigma_next - sigma)
            return v_lat, a_lat

        sig1 = np.asarray(DISTILLED_SIGMA_VALUES, np.float32)
        v_lat, a_lat = av_euler_loop(v_lat, a_lat, sig1, v_pos1, a_pos1)

        # Boundary: unpatchify -> un-normalize -> 2x upscale -> normalize.
        lat5 = torch.from_numpy(_unpatchify_np(v_lat.numpy(), f1, h1, w1))
        mean5 = mean.reshape(1, -1, 1, 1, 1)
        std5 = std.reshape(1, -1, 1, 1, 1)
        lat5 = lat5 * std5 + mean5
        lat5 = torch_spatial_upscaler(tree_to_torch(up_params), up_cfg, lat5)
        lat5 = (lat5 - mean5) / std5

        # Stage-1 audio output (unpatchified) becomes stage 2's initial
        # audio latent; both streams re-noise to sigma0.
        stage1_audio_tokens = a_lat
        v_pos2, a_pos2, _ash, a_tools2, _ = stage_inputs(
            f2, h2, w2, config.height, config.width
        )
        sigma0 = float(STAGE_2_DISTILLED_SIGMA_VALUES[0])

        tokens2 = torch.from_numpy(
            _patchify_np(lat5.detach().numpy().astype(np.float32))
        )
        vnoise2 = torch.from_numpy(np.asarray(
            jax.random.normal(vkey2, tuple(tokens2.shape)), np.float32
        ))
        v_lat2 = vnoise2 * sigma0 + tokens2 * (1 - sigma0)
        anoise2 = torch.from_numpy(np.asarray(
            jax.random.normal(akey2, tuple(stage1_audio_tokens.shape)), np.float32
        ))
        a_lat2 = anoise2 * sigma0 + stage1_audio_tokens * (1 - sigma0)

        sig2 = np.asarray(STAGE_2_DISTILLED_SIGMA_VALUES, np.float32)
        v_fin, a_fin = av_euler_loop(v_lat2, a_lat2, sig2, v_pos2, a_pos2)
        want_video = _unpatchify_np(v_fin.numpy(), f2, h2, w2)

        got_video = np.asarray(got_video, np.float32)
        assert got_video.shape == want_video.shape
        corr_v = _pearson(got_video, want_video)
        assert corr_v > 0.999, f"distilled recipe video corr {corr_v}"
        np.testing.assert_allclose(got_video, want_video, rtol=5e-3, atol=5e-3)

        # Audio: unpatchify via the repo tools' inverse (AudioPatchifier is
        # patch-size-1: (B, T, C*F) -> (B, C, T, F)).
        got_audio = np.asarray(got_audio, np.float32)
        want_audio = (
            a_fin.numpy()
            .reshape(1, -1, config.audio_vae_channels, config.audio_mel_bins)
            .transpose(0, 2, 1, 3)
        )
        assert got_audio.shape == want_audio.shape
        corr_a = _pearson(got_audio, want_audio)
        assert corr_a > 0.999, f"distilled recipe audio corr {corr_a}"
        np.testing.assert_allclose(got_audio, want_audio, rtol=5e-3, atol=5e-3)
