"""Guidance reuse (cfg_interval): uncond forward every k-th step.

The scanned loop must (a) implement exactly the documented caching rule —
verified bit-close against a hand-rolled Python loop calling the model
directly, (b) actually drop the uncond compute on skip steps — verified
via compiled-FLOP counts, and (c) compose with STG rows, APG guiders,
Heun, SP token sharding and ambient-TP sharded params.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ltx2_tpu.components import CFGGuider, GaussianNoiser, VideoLatentPatchifier
from ltx2_tpu.components.guiders import LtxAPGGuider
from ltx2_tpu.conditioning.tools import VideoLatentTools
from ltx2_tpu.pipelines.common import modality_from_state, post_process_latent
from ltx2_tpu.pipelines.denoise import DenoiseLoopConfig, make_video_denoise_loop
from ltx2_tpu.types import LatentState, VideoLatentShape
from tests.helpers import cached_params
from tests.test_dit import tiny_config


def make_state(cfg, frames=2, height=2, width=4, key=0):
    shape = VideoLatentShape(
        batch=1, channels=cfg.in_channels, frames=frames, height=height, width=width
    )
    tools = VideoLatentTools(
        patchifier=VideoLatentPatchifier(patch_size=1), target_shape=shape, fps=24.0
    )
    return GaussianNoiser()(jax.random.PRNGKey(key), tools.create_initial_state(), 1.0)


def contexts(cfg, n=5):
    pos = jax.random.normal(jax.random.PRNGKey(1), (1, n, cfg.caption_channels))
    neg = jax.random.normal(jax.random.PRNGKey(2), (1, n, cfg.caption_channels))
    return pos, neg


def executed_row_counts(monkeypatch, cfg, loop_cfg, params, state, sigmas, pos, neg):
    """Run the loop with a spy on the model apply: a runtime debug
    callback records the guidance-row count of every forward that
    actually EXECUTES (lax.cond branches that are skipped don't fire)."""
    import ltx2_tpu.models.transformer.model as tm

    real = tm.x0_model_apply
    counts = []

    def spy(params, mcfg, video=None, **kw):
        rows = video.latent.shape[0]
        jax.debug.callback(lambda: counts.append(rows))
        return real(params, mcfg, video=video, **kw)

    monkeypatch.setattr(tm, "x0_model_apply", spy)
    out = make_video_denoise_loop(cfg, loop_cfg)(params, state, sigmas, pos, neg)
    jax.block_until_ready(out.latent)
    jax.effects_barrier()
    return counts


class TestCfgInterval:
    def test_interval_one_is_default_cache_hit(self):
        """cfg_interval=1 is the same hashable config as the default — the
        lru-cached loop builder returns the identical compiled loop."""
        cfg = tiny_config()
        a = make_video_denoise_loop(cfg, DenoiseLoopConfig(guider=CFGGuider(3.0)))
        b = make_video_denoise_loop(
            cfg, DenoiseLoopConfig(guider=CFGGuider(3.0), cfg_interval=1)
        )
        assert a is b

    def test_same_context_matches_exact(self):
        """pos == neg -> guidance delta is ~0, so any interval must agree
        with exact CFG (the reuse path's reconstruction is exercised but
        contributes nothing)."""
        cfg = tiny_config()
        params = cached_params(cfg)
        state = make_state(cfg)
        sigmas = jnp.asarray([1.0, 0.7, 0.4, 0.2, 0.0])
        ctx, _ = contexts(cfg)
        exact = make_video_denoise_loop(
            cfg, DenoiseLoopConfig(guider=CFGGuider(3.0))
        )(params, state, sigmas, ctx, ctx)
        reused = make_video_denoise_loop(
            cfg, DenoiseLoopConfig(guider=CFGGuider(3.0), cfg_interval=3)
        )(params, state, sigmas, ctx, ctx)
        np.testing.assert_allclose(
            np.asarray(reused.latent), np.asarray(exact.latent), atol=2e-4
        )

    def test_matches_manual_reference(self):
        """The scanned k=2 loop is bit-close to a hand-rolled Python loop
        implementing the documented rule with direct model calls."""
        from ltx2_tpu.models.transformer.model import x0_model_apply

        cfg = tiny_config()
        params = cached_params(cfg)
        state = make_state(cfg)
        sigmas_np = [1.0, 0.75, 0.5, 0.25, 0.1, 0.0]
        sigmas = jnp.asarray(sigmas_np)
        pos, neg = contexts(cfg)
        guider = CFGGuider(3.0)
        k = 2

        got = make_video_denoise_loop(
            cfg, DenoiseLoopConfig(guider=guider, cfg_interval=k)
        )(params, state, sigmas, pos, neg)

        latent = state.latent
        mask, clean = state.denoise_mask, state.clean_latent
        delta = jnp.zeros_like(latent, jnp.float32)
        ctx_full = jnp.concatenate([pos, neg], axis=0)
        for i in range(len(sigmas_np) - 1):
            sigma, sigma_next = sigmas_np[i], sigmas_np[i + 1]
            if i % k == 0:
                tiled = LatentState(
                    latent=jnp.concatenate([latent] * 2, axis=0),
                    denoise_mask=jnp.concatenate([mask] * 2, axis=0),
                    positions=jnp.concatenate([state.positions] * 2, axis=0),
                    clean_latent=jnp.concatenate([clean] * 2, axis=0),
                )
                m = modality_from_state(tiled, ctx_full, sigma)
                outs = x0_model_apply(params, cfg, video=m)
                p, n = outs[0:1], outs[1:2]
                delta = p.astype(jnp.float32) - n.astype(jnp.float32)
                denoised = guider.guide(p, n)
            else:
                m = modality_from_state(state.replace(latent=latent), pos, sigma)
                p = x0_model_apply(params, cfg, video=m)
                n = (p.astype(jnp.float32) - delta).astype(p.dtype)
                denoised = guider.guide(p, n)
            denoised = post_process_latent(denoised, mask, clean)
            velocity = (latent.astype(jnp.float32) - denoised.astype(jnp.float32)) / sigma
            latent = (latent.astype(jnp.float32) + velocity * (sigma_next - sigma)).astype(
                latent.dtype
            )

        np.testing.assert_allclose(
            np.asarray(got.latent), np.asarray(latent), atol=1e-4
        )

    def test_uncond_skipped_at_runtime(self, monkeypatch):
        """Engagement, not just equality: with 6 steps and k=2, the
        2-row forward executes on steps 0/2/4 and a 1-row forward on
        1/3/5 — runtime-recorded, so the skipped lax.cond branch provably
        does not run."""
        cfg = tiny_config()
        params = cached_params(cfg)
        state = make_state(cfg)
        sigmas = jnp.asarray([1.0, 0.8, 0.6, 0.4, 0.3, 0.2, 0.0])
        pos, neg = contexts(cfg)
        # Unique scale -> fresh trace (the loop builder is lru-cached).
        counts = executed_row_counts(
            monkeypatch, cfg,
            DenoiseLoopConfig(guider=CFGGuider(3.125), cfg_interval=2),
            params, state, sigmas, pos, neg,
        )
        assert sorted(counts) == [1, 1, 1, 2, 2, 2], counts

    def test_with_stg_rows(self):
        """STG pass composes: [cond, uncond, stg] on recompute steps,
        [cond, stg] on reuse steps; same-context invariance still holds."""
        cfg = tiny_config()
        params = cached_params(cfg)
        state = make_state(cfg)
        sigmas = jnp.asarray([1.0, 0.6, 0.3, 0.0])
        ctx, _ = contexts(cfg)
        lc = dict(guider=CFGGuider(3.0), stg_scale=1.0, stg_blocks=(0,))
        exact = make_video_denoise_loop(cfg, DenoiseLoopConfig(**lc))(
            params, state, sigmas, ctx, ctx
        )
        reused = make_video_denoise_loop(
            cfg, DenoiseLoopConfig(**lc, cfg_interval=2)
        )(params, state, sigmas, ctx, ctx)
        np.testing.assert_allclose(
            np.asarray(reused.latent), np.asarray(exact.latent), atol=2e-4
        )

    def test_apg_guider(self):
        """APG's projection sees the reconstructed neg = pos - delta."""
        cfg = tiny_config()
        params = cached_params(cfg)
        state = make_state(cfg)
        sigmas = jnp.asarray([1.0, 0.5, 0.0])
        pos, neg = contexts(cfg)
        out = make_video_denoise_loop(
            cfg,
            DenoiseLoopConfig(
                guider=LtxAPGGuider(scale=4.0, eta=0.5, norm_threshold=2.0),
                cfg_interval=2,
            ),
        )(params, state, sigmas, pos, neg)
        assert bool(jnp.all(jnp.isfinite(out.latent)))

    def test_heun_reuses_delta(self, monkeypatch):
        """Heun's corrector always runs the reduced forward under reuse:
        3 steps x 2 evals -> full(2 rows) on steps 0/2 + 4 reduced."""
        cfg = tiny_config()
        params = cached_params(cfg)
        state = make_state(cfg)
        sigmas = jnp.asarray([1.0, 0.6, 0.3, 0.0])
        pos, neg = contexts(cfg)
        counts = executed_row_counts(
            monkeypatch, cfg,
            DenoiseLoopConfig(
                guider=CFGGuider(3.25), sampler="heun", cfg_interval=2
            ),
            params, state, sigmas, pos, neg,
        )
        assert sorted(counts) == [1, 1, 1, 1, 2, 2], counts
        out = make_video_denoise_loop(
            cfg,
            DenoiseLoopConfig(guider=CFGGuider(3.0), sampler="heun", cfg_interval=2),
        )(params, state, sigmas, pos, neg)
        assert bool(jnp.all(jnp.isfinite(out.latent)))

    def test_validation(self):
        cfg = tiny_config()
        with pytest.raises(ValueError, match="cfg_interval"):
            make_video_denoise_loop(
                cfg, DenoiseLoopConfig(guider=CFGGuider(3.0), cfg_interval=0)
            )

    def _av_setup(self):
        from ltx2_tpu.components import AudioPatchifier
        from ltx2_tpu.conditioning.tools import AudioLatentTools
        from ltx2_tpu.models.transformer.model import LTXModelType
        from ltx2_tpu.types import AudioLatentShape

        cfg = tiny_config(model_type=LTXModelType.AudioVideo)
        params = cached_params(cfg)
        v_state = make_state(cfg)
        a_shape = AudioLatentShape(batch=1, channels=2, frames=4, mel_bins=4)
        a_tools = AudioLatentTools(
            patchifier=AudioPatchifier(patch_size=4), target_shape=a_shape
        )
        a_state = GaussianNoiser()(
            jax.random.PRNGKey(3), a_tools.create_initial_state(), 1.0
        )
        v_ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 5, cfg.caption_channels))
        a_ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 5, cfg.caption_channels))
        return cfg, params, v_state, a_state, v_ctx, a_ctx

    def test_av_same_context_matches_exact(self):
        """AV loop: separate video/audio deltas carried; pos == neg per
        modality -> any interval must agree with exact CFG."""
        from ltx2_tpu.pipelines.denoise import make_av_denoise_loop

        cfg, params, v_state, a_state, v_ctx, a_ctx = self._av_setup()
        sigmas = jnp.asarray([1.0, 0.7, 0.4, 0.0])
        lc = dict(guider=CFGGuider(2.0), audio_guider=CFGGuider(3.0))
        v_exact, a_exact = make_av_denoise_loop(cfg, DenoiseLoopConfig(**lc))(
            params, v_state, a_state, sigmas, v_ctx, v_ctx, a_ctx, a_ctx
        )
        v_re, a_re = make_av_denoise_loop(
            cfg, DenoiseLoopConfig(**lc, cfg_interval=2)
        )(params, v_state, a_state, sigmas, v_ctx, v_ctx, a_ctx, a_ctx)
        np.testing.assert_allclose(
            np.asarray(v_re.latent), np.asarray(v_exact.latent), atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(a_re.latent), np.asarray(a_exact.latent), atol=2e-4
        )

    def test_av_distinct_contexts_runs(self):
        from ltx2_tpu.pipelines.denoise import make_av_denoise_loop

        cfg, params, v_state, a_state, v_ctx, a_ctx = self._av_setup()
        neg_v = jax.random.normal(jax.random.PRNGKey(7), v_ctx.shape)
        neg_a = jax.random.normal(jax.random.PRNGKey(8), a_ctx.shape)
        sigmas = jnp.asarray([1.0, 0.5, 0.0])
        v_out, a_out = make_av_denoise_loop(
            cfg,
            DenoiseLoopConfig(
                guider=CFGGuider(2.0), audio_guider=CFGGuider(3.0), cfg_interval=2
            ),
        )(params, v_state, a_state, sigmas, v_ctx, neg_v, a_ctx, neg_a)
        assert bool(jnp.all(jnp.isfinite(v_out.latent)))
        assert bool(jnp.all(jnp.isfinite(a_out.latent)))

    def test_multimodal_same_context_matches_exact(self):
        """MultiModal loop (two-stage AV stage 1): pos == neg per modality
        -> the uncond delta is ~0, so k=2 (reduced rows on step 1) must
        agree with exact guidance."""
        from ltx2_tpu.pipelines.denoise import (
            MultiModalLoopConfig,
            make_multimodal_av_denoise_loop,
        )

        cfg, params, v_state, a_state, v_ctx, a_ctx = self._av_setup()
        sigmas = jnp.asarray([1.0, 0.7, 0.4, 0.0])
        base = dict(video_cfg_scale=2.0, audio_cfg_scale=3.0, modality_scale=1.0)
        v_exact, a_exact = make_multimodal_av_denoise_loop(
            cfg, MultiModalLoopConfig(**base)
        )(params, v_state, a_state, sigmas, v_ctx, v_ctx, a_ctx, a_ctx)
        v_re, a_re = make_multimodal_av_denoise_loop(
            cfg, MultiModalLoopConfig(**base, cfg_interval=2)
        )(params, v_state, a_state, sigmas, v_ctx, v_ctx, a_ctx, a_ctx)
        np.testing.assert_allclose(
            np.asarray(v_re.latent), np.asarray(v_exact.latent), atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(a_re.latent), np.asarray(a_exact.latent), atol=2e-4
        )

    def test_multimodal_reuse_runs_with_mod_row(self):
        """Full 3-row recipe (cond/uncond/mod) with k=2: runs finite and
        the interval actually changes the trajectory (distinct contexts)."""
        from ltx2_tpu.pipelines.denoise import (
            MultiModalLoopConfig,
            make_multimodal_av_denoise_loop,
        )

        cfg, params, v_state, a_state, v_ctx, a_ctx = self._av_setup()
        neg_v = jax.random.normal(jax.random.PRNGKey(7), v_ctx.shape)
        neg_a = jax.random.normal(jax.random.PRNGKey(8), a_ctx.shape)
        sigmas = jnp.asarray([1.0, 0.7, 0.4, 0.0])
        base = dict(video_cfg_scale=3.0, audio_cfg_scale=7.0, modality_scale=3.0)
        v1, a1 = make_multimodal_av_denoise_loop(
            cfg, MultiModalLoopConfig(**base)
        )(params, v_state, a_state, sigmas, v_ctx, neg_v, a_ctx, neg_a)
        v2, a2 = make_multimodal_av_denoise_loop(
            cfg, MultiModalLoopConfig(**base, cfg_interval=2)
        )(params, v_state, a_state, sigmas, v_ctx, neg_v, a_ctx, neg_a)
        assert bool(jnp.all(jnp.isfinite(v2.latent)))
        assert bool(jnp.all(jnp.isfinite(a2.latent)))
        # Reused steps approximate the full rows: close but not identical.
        assert not np.allclose(np.asarray(v1.latent), np.asarray(v2.latent))

    def test_pp_rejects(self):
        from ltx2_tpu.parallel.mesh import create_mesh

        cfg = tiny_config()
        mesh = create_mesh(data=1, model=1, pipe=2, devices=jax.devices()[:2])
        with pytest.raises(NotImplementedError, match="pipeline"):
            make_video_denoise_loop(
                cfg,
                DenoiseLoopConfig(guider=CFGGuider(3.0), cfg_interval=2),
                mesh=mesh, pipeline_axis="pipe",
            )


@pytest.mark.multichip
class TestCfgIntervalSharded:
    def test_sp_matches_unsharded(self):
        """Token-sharded k=2 loop == unsharded k=2 loop (the lax.cond
        branches each wrap their own shard_map ring forward)."""
        from ltx2_tpu.parallel.mesh import create_mesh

        cfg = tiny_config()
        params = cached_params(cfg)
        state = make_state(cfg)  # 16 tokens
        sigmas = jnp.asarray([1.0, 0.6, 0.3, 0.0])
        pos, neg = contexts(cfg)
        lc = DenoiseLoopConfig(guider=CFGGuider(3.0), cfg_interval=2)
        expected = np.asarray(
            make_video_denoise_loop(cfg, lc)(params, state, sigmas, pos, neg).latent
        )
        mesh = create_mesh(data=1, model=1, seq=8)
        got = np.asarray(
            make_video_denoise_loop(cfg, lc, mesh=mesh)(
                params, state, sigmas, pos, neg
            ).latent
        )
        np.testing.assert_allclose(got, expected, atol=5e-4)

    def test_tp_sharded_params(self):
        """Ambient-TP GSPMD path: sharded params + set_mesh, k=2 equality
        (exercises lax.cond around the head-sharded attention dispatch)."""
        from ltx2_tpu.parallel.mesh import create_mesh
        from ltx2_tpu.parallel.sharding import shard_dit_params

        cfg = tiny_config(
            num_attention_heads=4, attention_head_dim=16, cross_attention_dim=64
        )
        params = cached_params(cfg)
        state = make_state(cfg)
        sigmas = jnp.asarray([1.0, 0.6, 0.3, 0.0])
        pos, neg = contexts(cfg)
        lc = DenoiseLoopConfig(guider=CFGGuider(3.0), cfg_interval=2)
        loop = make_video_denoise_loop(cfg, lc)
        expected = np.asarray(loop(params, state, sigmas, pos, neg).latent)
        mesh = create_mesh(data=2, model=4)
        sharded = shard_dit_params(mesh, params)
        with jax.sharding.set_mesh(mesh):
            got = np.asarray(loop(sharded, state, sigmas, pos, neg).latent)
        np.testing.assert_allclose(got, expected, atol=5e-4)
