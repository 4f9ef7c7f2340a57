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
            LTX2Scheduler().execute(steps=2, tokens=f1 * h1 * w1), np.float32
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
