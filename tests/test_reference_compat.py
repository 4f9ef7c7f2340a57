"""Reference-CLI parity additions (round 3 continuation).

Covers the surface the reference exposes that gained first-class wiring
here: stateful (momentum) APG guidance threaded through the scanned loop,
--stg-mode routing the STG perturbation to the video/audio/both streams,
and the reference flag-name compatibility layer in scripts/generate.py.
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ltx2_tpu.components import GaussianNoiser, VideoLatentPatchifier
from ltx2_tpu.components.guiders import StatefulAPGGuider
from ltx2_tpu.conditioning.tools import VideoLatentTools
from ltx2_tpu.pipelines.common import modality_from_state, post_process_latent
from ltx2_tpu.pipelines.denoise import DenoiseLoopConfig, make_video_denoise_loop
from ltx2_tpu.types import LatentState, VideoLatentShape
from tests.helpers import cached_params
from tests.test_dit import tiny_config

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))


def make_state(cfg, frames=2, height=2, width=4, key=0):
    shape = VideoLatentShape(
        batch=1, channels=cfg.in_channels, frames=frames, height=height, width=width
    )
    tools = VideoLatentTools(
        patchifier=VideoLatentPatchifier(patch_size=1), target_shape=shape, fps=24.0
    )
    return GaussianNoiser()(jax.random.PRNGKey(key), tools.create_initial_state(), 1.0)


class TestStatefulAPGLoop:
    def test_matches_manual_momentum_loop(self):
        """The scanned loop with a momentum APG guider is bit-close to a
        hand-rolled Python loop carrying the guidance EMA explicitly
        (reference LegacyStatefulAPGGuider semantics)."""
        from ltx2_tpu.models.transformer.model import x0_model_apply

        cfg = tiny_config()
        params = cached_params(cfg)
        state = make_state(cfg)
        sigmas_np = [1.0, 0.7, 0.4, 0.2, 0.0]
        sigmas = jnp.asarray(sigmas_np)
        pos = jax.random.normal(jax.random.PRNGKey(1), (1, 5, cfg.caption_channels))
        neg = jax.random.normal(jax.random.PRNGKey(2), (1, 5, cfg.caption_channels))
        guider = StatefulAPGGuider(
            scale=2.0, eta=1.0, norm_threshold=3.0, momentum=0.7
        )

        got = make_video_denoise_loop(
            cfg, DenoiseLoopConfig(guider=guider)
        )(params, state, sigmas, pos, neg)

        latent = state.latent
        mask, clean = state.denoise_mask, state.clean_latent
        carry = jnp.zeros_like(latent, jnp.float32)
        ctx_full = jnp.concatenate([pos, neg], axis=0)
        for i in range(len(sigmas_np) - 1):
            sigma, sigma_next = sigmas_np[i], sigmas_np[i + 1]
            tiled = LatentState(
                latent=jnp.concatenate([latent] * 2, axis=0),
                denoise_mask=jnp.concatenate([mask] * 2, axis=0),
                positions=jnp.concatenate([state.positions] * 2, axis=0),
                clean_latent=jnp.concatenate([clean] * 2, axis=0),
            )
            m = modality_from_state(tiled, ctx_full, sigma)
            outs = x0_model_apply(params, cfg, video=m)
            p, n = outs[0:1], outs[1:2]
            denoised, carry = guider.guide(p, n, carry)
            denoised = post_process_latent(denoised.astype(p.dtype), mask, clean)
            velocity = (
                latent.astype(jnp.float32) - denoised.astype(jnp.float32)
            ) / sigma
            latent = (
                latent.astype(jnp.float32) + velocity * (sigma_next - sigma)
            ).astype(latent.dtype)

        np.testing.assert_allclose(
            np.asarray(got.latent), np.asarray(latent), atol=1e-4
        )

    def test_momentum_actually_changes_output(self):
        """Momentum != 0 must differ from the stateless same-scale run
        (the carry is threaded, not dropped)."""
        cfg = tiny_config()
        params = cached_params(cfg)
        state = make_state(cfg)
        sigmas = jnp.asarray([1.0, 0.6, 0.3, 0.0])
        pos = jax.random.normal(jax.random.PRNGKey(3), (1, 5, cfg.caption_channels))
        neg = jax.random.normal(jax.random.PRNGKey(4), (1, 5, cfg.caption_channels))

        with_m = make_video_denoise_loop(
            cfg,
            DenoiseLoopConfig(
                guider=StatefulAPGGuider(scale=2.0, eta=1.0, momentum=0.8)
            ),
        )(params, state, sigmas, pos, neg)
        without_m = make_video_denoise_loop(
            cfg,
            DenoiseLoopConfig(
                guider=StatefulAPGGuider(scale=2.0, eta=1.0, momentum=0.0)
            ),
        )(params, state, sigmas, pos, neg)
        assert not np.allclose(
            np.asarray(with_m.latent), np.asarray(without_m.latent), atol=1e-5
        )

    def test_momentum_refuses_cfg_interval(self):
        cfg = tiny_config()
        with pytest.raises(ValueError, match="momentum"):
            make_video_denoise_loop(
                cfg,
                DenoiseLoopConfig(
                    guider=StatefulAPGGuider(scale=2.0, eta=1.0, momentum=0.5),
                    cfg_interval=2,
                ),
            )

    def _av_setup(self):
        from ltx2_tpu.components import AudioPatchifier
        from ltx2_tpu.conditioning.tools import AudioLatentTools
        from ltx2_tpu.models.transformer.model import LTXModelType
        from ltx2_tpu.types import AudioLatentShape

        cfg = tiny_config(model_type=LTXModelType.AudioVideo)
        params = cached_params(cfg)
        v_state = make_state(cfg)
        a_shape = AudioLatentShape(
            batch=1, channels=cfg.audio_in_channels, frames=5, mel_bins=1
        )
        a_tools = AudioLatentTools(
            patchifier=AudioPatchifier(1), target_shape=a_shape
        )
        a_state = GaussianNoiser()(
            jax.random.PRNGKey(5), a_tools.create_initial_state(), 1.0
        )
        k = jax.random.split(jax.random.PRNGKey(6), 4)
        ctxs = tuple(
            jax.random.normal(kk, (1, 5, cfg.caption_channels)) for kk in k
        )
        return cfg, params, v_state, a_state, ctxs

    def test_av_loop_matches_manual_momentum_loop(self):
        """The AV loop with momentum APG on the video stream (plus plain CFG
        on audio, the generate.py --apg-momentum wiring) is bit-close to a
        hand-rolled Python AV loop carrying the video guidance EMA."""
        from ltx2_tpu.components import CFGGuider
        from ltx2_tpu.models.transformer.model import x0_model_apply
        from ltx2_tpu.pipelines.denoise import make_av_denoise_loop

        cfg, params, v_state, a_state, (pos_v, neg_v, pos_a, neg_a) = (
            self._av_setup()
        )
        sigmas_np = [1.0, 0.7, 0.4, 0.0]
        sigmas = jnp.asarray(sigmas_np)
        v_guider = StatefulAPGGuider(
            scale=2.0, eta=1.0, norm_threshold=3.0, momentum=0.7
        )
        a_guider = CFGGuider(2.0)

        got_v, got_a = make_av_denoise_loop(
            cfg, DenoiseLoopConfig(guider=v_guider, audio_guider=a_guider)
        )(params, v_state, a_state, sigmas, pos_v, neg_v, pos_a, neg_a)

        v_latent, a_latent = v_state.latent, a_state.latent
        carry = jnp.zeros_like(v_latent, jnp.float32)
        v_ctx = jnp.concatenate([pos_v, neg_v], axis=0)
        a_ctx = jnp.concatenate([pos_a, neg_a], axis=0)
        for i in range(len(sigmas_np) - 1):
            sigma, sigma_next = sigmas_np[i], sigmas_np[i + 1]

            def tiled(st, latent):
                return LatentState(
                    latent=jnp.concatenate([latent] * 2, axis=0),
                    denoise_mask=jnp.concatenate([st.denoise_mask] * 2, axis=0),
                    positions=jnp.concatenate([st.positions] * 2, axis=0),
                    clean_latent=jnp.concatenate([st.clean_latent] * 2, axis=0),
                )

            v_mod = modality_from_state(tiled(v_state, v_latent), v_ctx, sigma)
            a_mod = modality_from_state(tiled(a_state, a_latent), a_ctx, sigma)
            v_outs, a_outs = x0_model_apply(
                params, cfg, video=v_mod, audio=a_mod
            )
            v_denoised, carry = v_guider.guide(v_outs[0:1], v_outs[1:2], carry)
            a_denoised = a_guider.guide(a_outs[0:1], a_outs[1:2])

            def euler(latent, denoised, st):
                denoised = post_process_latent(
                    denoised.astype(latent.dtype), st.denoise_mask,
                    st.clean_latent,
                )
                velocity = (
                    latent.astype(jnp.float32) - denoised.astype(jnp.float32)
                ) / sigma
                return (
                    latent.astype(jnp.float32) + velocity * (sigma_next - sigma)
                ).astype(latent.dtype)

            v_latent = euler(v_latent, v_denoised, v_state)
            a_latent = euler(a_latent, a_denoised, a_state)

        np.testing.assert_allclose(
            np.asarray(got_v.latent), np.asarray(v_latent), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(got_a.latent), np.asarray(a_latent), atol=1e-4
        )

    def test_av_loop_momentum_changes_output(self):
        from ltx2_tpu.pipelines.denoise import make_av_denoise_loop

        cfg, params, v_state, a_state, (pos_v, neg_v, pos_a, neg_a) = (
            self._av_setup()
        )
        sigmas = jnp.asarray([1.0, 0.5, 0.0])

        def run(momentum):
            loop = make_av_denoise_loop(
                cfg,
                DenoiseLoopConfig(
                    guider=StatefulAPGGuider(
                        scale=2.0, eta=1.0, momentum=momentum
                    ),
                    audio_guider=StatefulAPGGuider(
                        scale=2.0, eta=1.0, momentum=momentum
                    ),
                ),
            )
            return loop(
                params, v_state, a_state, sigmas, pos_v, neg_v, pos_a, neg_a
            )

        v_m, a_m = run(0.8)
        v_0, a_0 = run(0.0)
        assert not np.allclose(
            np.asarray(v_m.latent), np.asarray(v_0.latent), atol=1e-5
        )
        assert not np.allclose(
            np.asarray(a_m.latent), np.asarray(a_0.latent), atol=1e-5
        )

    def test_av_loop_momentum_refuses_cfg_interval(self):
        from ltx2_tpu.pipelines.denoise import make_av_denoise_loop

        cfg = tiny_config()
        with pytest.raises(ValueError, match="momentum"):
            make_av_denoise_loop(
                cfg,
                DenoiseLoopConfig(
                    guider=StatefulAPGGuider(scale=2.0, eta=1.0, momentum=0.5),
                    cfg_interval=2,
                ),
            )


class TestStgMode:
    def test_perturbation_routing(self):
        from ltx2_tpu.components.perturbations import (
            PerturbationType,
            create_stg_perturbation,
        )

        video = create_stg_perturbation(True, None, skip_audio_self_attn=False)
        both = create_stg_perturbation(True, None, skip_audio_self_attn=True)
        audio = create_stg_perturbation(False, None, skip_audio_self_attn=True)
        assert video.is_perturbed(PerturbationType.SKIP_VIDEO_SELF_ATTN, 0)
        assert not video.is_perturbed(PerturbationType.SKIP_AUDIO_SELF_ATTN, 0)
        assert both.is_perturbed(PerturbationType.SKIP_AUDIO_SELF_ATTN, 1)
        assert both.is_perturbed(PerturbationType.SKIP_VIDEO_SELF_ATTN, 1)
        assert audio.is_perturbed(PerturbationType.SKIP_AUDIO_SELF_ATTN, 0)
        assert not audio.is_perturbed(PerturbationType.SKIP_VIDEO_SELF_ATTN, 0)

    def test_av_loop_stg_mode_routes_streams(self):
        """stg_mode='audio': the AUDIO latent gets the STG delta and the
        video stream is untouched by it (differs from stg_mode='video'
        on audio, matches a no-STG run on video)."""
        from ltx2_tpu.components import AudioPatchifier, CFGGuider
        from ltx2_tpu.conditioning.tools import AudioLatentTools
        from ltx2_tpu.models.transformer.model import LTXModelType
        from ltx2_tpu.pipelines.denoise import make_av_denoise_loop
        from ltx2_tpu.types import AudioLatentShape

        cfg = tiny_config(model_type=LTXModelType.AudioVideo)
        params = cached_params(cfg)
        v_state = make_state(cfg)
        a_shape = AudioLatentShape(
            batch=1, channels=cfg.audio_in_channels, frames=5, mel_bins=1
        )
        a_tools = AudioLatentTools(
            patchifier=AudioPatchifier(1), target_shape=a_shape
        )
        a_state = GaussianNoiser()(
            jax.random.PRNGKey(5), a_tools.create_initial_state(), 1.0
        )
        sigmas = jnp.asarray([1.0, 0.5, 0.0])
        k = jax.random.split(jax.random.PRNGKey(6), 4)
        pos_v, neg_v, pos_a, neg_a = (
            jax.random.normal(kk, (1, 5, cfg.caption_channels)) for kk in k
        )

        def run(stg_mode):
            loop = make_av_denoise_loop(
                cfg,
                DenoiseLoopConfig(
                    guider=CFGGuider(3.0), audio_guider=CFGGuider(2.0),
                    stg_scale=1.5, stg_mode=stg_mode,
                ),
            )
            return loop(
                params, v_state, a_state, sigmas, pos_v, neg_v, pos_a, neg_a
            )

        # All three runs have the same row count (cond/uncond/stg), so the
        # ONLY differences are which stream the STG delta applies to and
        # which self-attention the STG row skips — comparisons across
        # different row counts would mix in benign batching numerics.
        vid_v, vid_a = run("video")
        aud_v, aud_a = run("audio")
        both_v, both_a = run("both")

        def differs(a, b):
            return float(jnp.abs(a.latent - b.latent).max()) > 1e-3

        # Audio STG engages only in 'audio'/'both'.
        assert differs(aud_a, vid_a)
        assert differs(both_a, vid_a)
        # Video STG engages only in 'video'/'both'.
        assert differs(vid_v, aud_v)
        assert differs(both_v, aud_v)


class TestReferenceFlagCompat:
    def test_compat_normalization(self):
        import generate

        args = generate.build_parser().parse_args([
            "--frames", "17", "--steps", "4", "--cfg", "5.0",
            "--guidance-rescale", "0.5", "--fp32", "--fp8",
            "--weights", "/nonexistent/ck.safetensors",
            "--gemma-path", "/g", "--generate-audio",
            "--low-memory", "--fast-mode", "--steps-stage2", "5",
        ])
        args = generate._apply_reference_compat(args)
        assert args.num_frames == 17
        assert args.num_inference_steps == 4
        assert args.cfg_scale == 5.0
        assert args.rescale_scale == 0.5
        assert args.dtype == "float32"
        assert args.fp8_serving is True
        assert args.checkpoint == "/nonexistent/ck.safetensors"
        assert args.gemma_dir == "/g"
        assert args.audio is True

    def test_steps_stage1_maps_to_two_stage(self):
        import generate

        args = generate.build_parser().parse_args([
            "--pipeline", "two-stage", "--steps-stage1", "15",
        ])
        args = generate._apply_reference_compat(args)
        assert args.num_inference_steps == 15

    def test_ic_lora_weights_stays_out_of_lora_list(self):
        """--ic-lora-weights must NOT feed the ledger's lora list: the
        IC-LoRA fuses for stage 1 only inside the pipeline — a load-time
        fusion would double-apply it in stage 1 and leak into stage 2."""
        import generate

        args = generate.build_parser().parse_args([
            "--pipeline", "ic-lora", "--ic-lora-weights", "/x.safetensors",
        ])
        args = generate._apply_reference_compat(args)
        assert args.lora == []
        assert args.ic_lora_weights == "/x.safetensors"

    def test_image_and_lora_default_strengths(self):
        import generate

        args = generate.build_parser().parse_args([
            "--image", "/a.png", "--image-strength", "0.5",
            "--lora", "/l.safetensors", "--lora-strength", "0.25",
        ])
        loras = generate.parse_loras(args)
        assert loras[0].strength == 0.25
        # Explicit per-spec strength still wins.
        args2 = generate.build_parser().parse_args([
            "--lora", "/l.safetensors:1.5", "--lora-strength", "0.25",
        ])
        assert generate.parse_loras(args2)[0].strength == 1.5
        conds = generate.parse_images(args)
        assert conds[0].strength == 0.5

    def test_tiled_vae_forces_default_tiling(self):
        import generate

        args = generate.build_parser().parse_args(["--tiled-vae"])
        tiling = generate.tiling_config(args)
        assert tiling is not None
