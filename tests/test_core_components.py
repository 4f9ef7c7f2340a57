"""Unit tests for core math, schedulers, steppers, guiders, patchifiers, RoPE.

Mirrors the reference test strategy (tests/test_scheduler.py semantics:
monotonicity, endpoints, lengths, dtype preservation; SURVEY.md §4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ltx2_tpu.components import (
    DISTILLED_SIGMA_VALUES,
    CFGGuider,
    CFGStarRescalingGuider,
    EulerAncestralDiffusionStep,
    EulerDiffusionStep,
    GaussianNoiser,
    HeunDiffusionStep,
    LTX2Scheduler,
    LinearQuadraticScheduler,
    LtxAPGGuider,
    StatefulAPGGuider,
    VideoLatentPatchifier,
    AudioPatchifier,
    get_pixel_coords,
    get_sigma_schedule,
)
from ltx2_tpu.core import rms_norm, to_denoised, to_velocity
from ltx2_tpu.ops.rope import (
    LTXRopeType,
    apply_interleaved_rotary_emb,
    apply_split_rotary_emb,
    create_position_grid,
    precompute_freqs_cis,
)
from ltx2_tpu.ops.timestep_embedding import (
    adaln_single_apply,
    get_timestep_embedding,
    init_adaln_single,
)
from ltx2_tpu.types import (
    LatentState,
    SpatioTemporalScaleFactors,
    VideoLatentShape,
    VideoPixelShape,
)


class TestScheduler:
    def test_ltx2_monotonic_and_endpoints(self):
        sigmas = LTX2Scheduler().execute(steps=25, tokens=4096)
        assert sigmas.shape == (26,)
        assert sigmas[0] == pytest.approx(1.0, abs=1e-6)
        assert sigmas[-1] == 0.0
        assert np.all(np.diff(sigmas) < 0)

    def test_ltx2_terminal_stretch(self):
        sigmas = LTX2Scheduler().execute(steps=8, tokens=2048, terminal=0.1)
        assert sigmas[-2] == pytest.approx(0.1, abs=1e-5)

    def test_token_count_changes_shift(self):
        lo = LTX2Scheduler().execute(steps=10, tokens=1024)
        hi = LTX2Scheduler().execute(steps=10, tokens=4096)
        # Larger token count -> larger shift -> sigmas stay higher longer.
        assert np.all(hi[1:-1] >= lo[1:-1])

    def test_distilled_values(self):
        sigmas = get_sigma_schedule(8, distilled=True)
        assert list(sigmas) == pytest.approx(DISTILLED_SIGMA_VALUES)

    def test_linear_quadratic(self):
        sigmas = LinearQuadraticScheduler().execute(steps=10)
        assert sigmas.shape == (11,)
        assert sigmas[0] == pytest.approx(1.0)
        assert sigmas[-1] == 0.0
        assert np.all(np.diff(sigmas) < 0)

    def test_linear_quadratic_single_step(self):
        sigmas = LinearQuadraticScheduler().execute(steps=1)
        assert list(sigmas) == [1.0, 0.0]

    def test_ltx2_single_step_finite(self):
        """steps=1 leaves the last nonzero sigma at 1.0, where the terminal
        stretch is undefined (0/0 — the reference's own division NaNs the
        schedule); the stretch must be skipped, not NaN'd."""
        sigmas = LTX2Scheduler().execute(steps=1)
        assert np.all(np.isfinite(sigmas))
        assert list(sigmas) == [1.0, 0.0]


class TestVelocity:
    def test_roundtrip(self):
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (2, 16, 8))
        x0 = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 8))
        v = to_velocity(x, 0.5, x0)
        x0_back = to_denoised(x, v, 0.5)
        np.testing.assert_allclose(np.asarray(x0_back), np.asarray(x0), atol=1e-5)

    def test_dtype_preserved(self):
        x = jnp.ones((2, 4, 4), jnp.bfloat16)
        x0 = jnp.zeros((2, 4, 4), jnp.bfloat16)
        assert to_velocity(x, 0.7, x0).dtype == jnp.bfloat16


class TestDiffusionSteps:
    def setup_method(self):
        self.sample = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 8))
        self.denoised = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 8))

    def test_euler_step_math(self):
        sigmas = np.array([1.0, 0.5, 0.0], np.float32)
        out = EulerDiffusionStep().step(self.sample, self.denoised, sigmas[0], sigmas[1])
        # x + (x - x0)/sigma * dt with sigma=1, dt=-0.5 => 0.5*(x + x0)
        expected = 0.5 * (np.asarray(self.sample) + np.asarray(self.denoised))
        np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)

    def test_euler_final_step_reaches_denoised(self):
        out = EulerDiffusionStep().step(self.sample, self.denoised, 0.5, 0.0)
        # sigma_next=0 => x + (x-x0)/0.5*(-0.5) = x0
        np.testing.assert_allclose(np.asarray(out), np.asarray(self.denoised), atol=1e-5)

    def test_euler_dtype(self):
        out = EulerDiffusionStep().step(
            self.sample.astype(jnp.bfloat16), self.denoised.astype(jnp.bfloat16), 1.0, 0.5
        )
        assert out.dtype == jnp.bfloat16

    def test_ancestral_no_noise_at_zero(self):
        out = EulerAncestralDiffusionStep().step(
            self.sample, self.denoised, 0.5, 0.0, key=jax.random.PRNGKey(2)
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(self.denoised), atol=1e-5)

    def test_heun_fallback_matches_euler(self):
        euler = EulerDiffusionStep().step(self.sample, self.denoised, 1.0, 0.5)
        heun = HeunDiffusionStep().step(self.sample, self.denoised, 1.0, 0.5)
        np.testing.assert_allclose(np.asarray(heun), np.asarray(euler), atol=1e-6)

    def test_heun_corrector(self):
        d2 = jax.random.normal(jax.random.PRNGKey(3), (1, 32, 8))
        out = HeunDiffusionStep().step(
            self.sample, self.denoised, 1.0, 0.5, denoised_at_predicted=d2
        )
        assert out.shape == self.sample.shape
        assert bool(jnp.all(jnp.isfinite(out)))

    def test_heun_corrector_final_step_is_denoised(self):
        """sigma_next=0 makes the corrector velocity undefined (the
        reference raises); the step must return the Euler predictor (== x0)
        instead of silently NaN/Inf — including under jit with traced
        sigmas, where raising is impossible."""
        d2 = jax.random.normal(jax.random.PRNGKey(3), (1, 32, 8))
        out = HeunDiffusionStep().step(
            self.sample, self.denoised, 0.5, 0.0, denoised_at_predicted=d2
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(self.denoised), atol=1e-5
        )
        jout = jax.jit(
            lambda x, d, s, sn, dp: HeunDiffusionStep().step(
                x, d, s, sn, denoised_at_predicted=dp
            )
        )(self.sample, self.denoised, jnp.asarray(0.5), jnp.asarray(0.0), d2)
        assert bool(jnp.all(jnp.isfinite(jout)))
        np.testing.assert_allclose(
            np.asarray(jout), np.asarray(self.denoised), atol=1e-5
        )

    def test_steps_jittable(self):
        step = jax.jit(
            lambda x, d, s, sn: EulerDiffusionStep().step(x, d, s, sn)
        )
        out = step(self.sample, self.denoised, jnp.float32(1.0), jnp.float32(0.5))
        assert out.shape == self.sample.shape


class TestGuiders:
    def setup_method(self):
        self.cond = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 8))
        self.uncond = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 8))

    def test_cfg_identity_at_one(self):
        out = CFGGuider(scale=1.0).guide(self.cond, self.uncond)
        np.testing.assert_allclose(np.asarray(out), np.asarray(self.cond))
        assert not CFGGuider(scale=1.0).enabled()

    def test_cfg_math(self):
        out = CFGGuider(scale=3.0).guide(self.cond, self.uncond)
        expected = np.asarray(self.cond) + 2.0 * (
            np.asarray(self.cond) - np.asarray(self.uncond)
        )
        np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)

    def test_cfg_star_rescaling(self):
        out = CFGStarRescalingGuider(scale=4.0).guide(self.cond, self.uncond)
        assert out.shape == self.cond.shape
        assert bool(jnp.all(jnp.isfinite(out)))

    def test_apg(self):
        guider = LtxAPGGuider(scale=4.0, eta=0.5, norm_threshold=2.0)
        out = guider.guide(self.cond, self.uncond)
        assert out.shape == self.cond.shape
        assert bool(jnp.all(jnp.isfinite(out)))

    def test_stateful_apg_momentum(self):
        guider = StatefulAPGGuider(scale=3.0, eta=0.5, momentum=0.9, norm_threshold=0.0)
        out1, carry = guider.guide(self.cond, self.uncond, None)
        out2, carry2 = guider.guide(self.cond, self.uncond, carry)
        assert carry2.shape == self.cond.shape
        assert not np.allclose(np.asarray(out1), np.asarray(out2))

    def test_apg_norm_clamp_is_per_sample(self):
        """The norm clamp must not couple independent clips under batched
        serving: a batch-2 delta equals the per-sample deltas stacked.
        (The reference reduces over its always-batch-1 latent's full shape
        — identical at B=1.)"""
        guider = LtxAPGGuider(scale=4.0, eta=0.5, norm_threshold=2.0)
        # Make sample 0's guidance much larger so a joint norm would
        # clamp sample 1 differently than its solo run.
        cond = self.cond.at[0].multiply(50.0)
        batched = np.asarray(guider.delta(cond, self.uncond))
        for i in range(2):
            solo = np.asarray(
                guider.delta(cond[i : i + 1], self.uncond[i : i + 1])
            )
            np.testing.assert_allclose(batched[i : i + 1], solo, atol=1e-5)

    def test_multimodal_rescale_is_per_sample(self):
        """MultiModalGuider's std-ratio rescale must use per-sample
        variance: one clip's statistics must not rescale another's
        prediction under batched serving (identical to the reference's
        global var at its B=1)."""
        from ltx2_tpu.components.guiders import (
            MultiModalGuider,
            MultiModalGuiderParams,
        )

        guider = MultiModalGuider(
            MultiModalGuiderParams(cfg_scale=4.0, rescale_scale=0.7)
        )
        cond = self.cond.at[0].multiply(50.0)
        batched = np.asarray(guider.calculate(cond, self.uncond, None, None))
        for i in range(2):
            solo = np.asarray(
                guider.calculate(
                    cond[i : i + 1], self.uncond[i : i + 1], None, None
                )
            )
            np.testing.assert_allclose(batched[i : i + 1], solo, atol=1e-4)

    def test_rescaled_cfg_matches_reference_formula(self):
        """RescaledCFGGuider = CFG then arXiv-2305.08891 mean/std matching
        (reference two_stage.py:55-85), blended by `rescale`."""
        from ltx2_tpu.components import RescaledCFGGuider

        scale, rescale = 3.0, 0.7
        out = np.asarray(
            RescaledCFGGuider(scale=scale, rescale=rescale).guide(
                self.cond[:1], self.uncond[:1]
            )
        )
        cond = np.asarray(self.cond[:1], np.float64)
        uncond = np.asarray(self.uncond[:1], np.float64)
        cfg = cond + (scale - 1) * (cond - uncond)
        rescaled = (cfg - cfg.mean()) / (cfg.std() + 1e-8) * cond.std() + cond.mean()
        want = rescale * rescaled + (1 - rescale) * cfg
        np.testing.assert_allclose(out, want, atol=1e-4)
        assert not RescaledCFGGuider(scale=1.0).enabled()


class TestPatchifier:
    def test_video_roundtrip(self):
        shape = VideoLatentShape(batch=2, channels=8, frames=3, height=4, width=6)
        pf = VideoLatentPatchifier(patch_size=1)
        x = jax.random.normal(jax.random.PRNGKey(0), shape.to_tuple())
        tokens = pf.patchify(x)
        assert tokens.shape == (2, 3 * 4 * 6, 8)
        back = pf.unpatchify(tokens, shape)
        np.testing.assert_allclose(np.asarray(back), np.asarray(x))

    def test_video_roundtrip_patch2(self):
        shape = VideoLatentShape(batch=1, channels=4, frames=2, height=4, width=4)
        pf = VideoLatentPatchifier(patch_size=2)
        x = jax.random.normal(jax.random.PRNGKey(0), shape.to_tuple())
        tokens = pf.patchify(x)
        assert tokens.shape == (1, 2 * 2 * 2, 4 * 4)
        back = pf.unpatchify(tokens, shape)
        np.testing.assert_allclose(np.asarray(back), np.asarray(x))

    def test_patch_grid_bounds(self):
        shape = VideoLatentShape(batch=1, channels=8, frames=2, height=2, width=3)
        pf = VideoLatentPatchifier(patch_size=1)
        bounds = pf.get_patch_grid_bounds(shape)
        assert bounds.shape == (1, 3, 12, 2)
        # First patch spans [0,1) in all dims; ordering is (f, h, w) row-major.
        np.testing.assert_array_equal(np.asarray(bounds[0, :, 0]), [[0, 1], [0, 1], [0, 1]])
        np.testing.assert_array_equal(np.asarray(bounds[0, :, 1]), [[0, 1], [0, 1], [1, 2]])

    def test_pixel_coords_causal_fix(self):
        shape = VideoLatentShape(batch=1, channels=8, frames=3, height=1, width=1)
        pf = VideoLatentPatchifier(patch_size=1)
        bounds = pf.get_patch_grid_bounds(shape)
        coords = get_pixel_coords(bounds, SpatioTemporalScaleFactors.default(), causal_fix=True)
        t_starts = np.asarray(coords[0, 0, :, 0])
        # First latent frame -> pixel frame 0; second -> 1; third -> 9.
        np.testing.assert_array_equal(t_starts, [0, 1, 9])

    def test_audio_roundtrip(self):
        from ltx2_tpu.types import AudioLatentShape

        shape = AudioLatentShape(batch=2, channels=8, frames=5, mel_bins=16)
        pf = AudioPatchifier(patch_size=16)
        x = jax.random.normal(jax.random.PRNGKey(0), shape.to_tuple())
        tokens = pf.patchify(x)
        assert tokens.shape == (2, 5, 8 * 16)
        back = pf.unpatchify(tokens, shape)
        np.testing.assert_allclose(np.asarray(back), np.asarray(x))

    def test_audio_timings_causal(self):
        from ltx2_tpu.types import AudioLatentShape

        shape = AudioLatentShape(batch=1, channels=8, frames=4, mel_bins=16)
        pf = AudioPatchifier(patch_size=16)
        bounds = pf.get_patch_grid_bounds(shape)
        assert bounds.shape == (1, 1, 4, 2)
        starts = np.asarray(bounds[0, 0, :, 0])
        assert starts[0] == 0.0
        assert np.all(np.diff(starts) > 0)


class TestRoPE:
    def test_interleaved_norm_preserved(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 8, 64))
        grid = create_position_grid(1, 2, 2, 2)
        cos, sin = precompute_freqs_cis(
            grid, 64, rope_type=LTXRopeType.INTERLEAVED, max_pos=[20, 2048, 2048]
        )
        out = apply_interleaved_rotary_emb(x, cos, sin)
        # Rotation preserves pairwise L2 norms.
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(out), axis=-1),
            np.linalg.norm(np.asarray(x), axis=-1),
            rtol=1e-4,
        )

    def test_split_shapes_and_identity_padding(self):
        batch, heads, dim = 1, 4, 128
        grid = create_position_grid(batch, 2, 2, 2)  # 8 tokens
        cos, sin = precompute_freqs_cis(
            grid,
            dim,
            rope_type=LTXRopeType.SPLIT,
            num_attention_heads=heads,
            max_pos=[20, 2048, 2048],
        )
        assert cos.shape == (batch, heads, 8, dim // heads // 2)
        x = jax.random.normal(jax.random.PRNGKey(0), (batch, heads, 8, dim // heads))
        out = apply_split_rotary_emb(x, cos, sin)
        assert out.shape == x.shape
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(out), axis=-1),
            np.linalg.norm(np.asarray(x), axis=-1),
            rtol=1e-4,
        )

    def test_split_3d_input_reshape(self):
        batch, heads, dim = 1, 4, 64
        grid = create_position_grid(batch, 1, 2, 2)
        cos, sin = precompute_freqs_cis(
            grid, dim, rope_type=LTXRopeType.SPLIT, num_attention_heads=heads
        )
        x = jax.random.normal(jax.random.PRNGKey(0), (batch, 4, dim))
        out = apply_split_rotary_emb(x, cos, sin)
        assert out.shape == x.shape

    def test_f64_grid_close_to_f32(self):
        from ltx2_tpu.ops.rope import generate_freq_grid

        g32 = generate_freq_grid(10000.0, 3, 2048, use_double_precision=False)
        g64 = generate_freq_grid(10000.0, 3, 2048, use_double_precision=True)
        assert g32.shape == g64.shape
        np.testing.assert_allclose(np.asarray(g32), np.asarray(g64), rtol=1e-3)

    def test_zero_position_is_identity_free(self):
        # Position at the center of max_pos maps to fractional 0.5 -> scaled 0.
        grid = jnp.zeros((1, 3, 4, 2), jnp.float32).at[..., 0].set(10.0).at[..., 1].set(10.0)
        grid = grid.at[:, 1:].set(1024.0)
        cos, sin = precompute_freqs_cis(
            grid,
            64,
            rope_type=LTXRopeType.SPLIT,
            num_attention_heads=2,
            max_pos=[20, 2048, 2048],
            use_middle_indices_grid=True,
        )
        np.testing.assert_allclose(np.asarray(cos), 1.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(sin), 0.0, atol=1e-5)


class TestTimestepEmbedding:
    def test_sinusoidal_shape(self):
        emb = get_timestep_embedding(jnp.asarray([0.0, 500.0, 1000.0]), 256, flip_sin_to_cos=True)
        assert emb.shape == (3, 256)
        assert bool(jnp.all(jnp.isfinite(emb)))

    def test_adaln_single(self):
        params = init_adaln_single(jax.random.PRNGKey(0), 64, num_embeddings=6)
        adaln, embedded = adaln_single_apply(params, jnp.asarray([500.0, 999.0]))
        assert adaln.shape == (2, 6 * 64)
        assert embedded.shape == (2, 64)


class TestNoiser:
    def test_mask_blending(self):
        latent = jnp.ones((1, 8, 4))
        mask = jnp.concatenate([jnp.ones((1, 4)), jnp.zeros((1, 4))], axis=1)
        state = LatentState(
            latent=latent,
            denoise_mask=mask,
            positions=jnp.zeros((1, 3, 8, 2)),
            clean_latent=latent,
        )
        noised = GaussianNoiser()(jax.random.PRNGKey(0), state, noise_scale=1.0)
        out = np.asarray(noised.latent)
        # Unmasked tokens keep original values, masked tokens become noise.
        np.testing.assert_allclose(out[0, 4:], 1.0)
        assert not np.allclose(out[0, :4], 1.0)

    def test_latent_state_is_pytree(self):
        state = LatentState(
            latent=jnp.ones((1, 4, 2)),
            denoise_mask=jnp.ones((1, 4)),
            positions=jnp.zeros((1, 3, 4, 2)),
            clean_latent=jnp.ones((1, 4, 2)),
        )
        doubled = jax.tree_util.tree_map(lambda x: x * 2, state)
        np.testing.assert_allclose(np.asarray(doubled.latent), 2.0)


class TestShapes:
    def test_latent_from_pixel(self):
        pix = VideoPixelShape(batch=1, frames=121, height=512, width=768)
        lat = VideoLatentShape.from_pixel_shape(pix)
        assert lat == VideoLatentShape(1, 128, 16, 16, 24)
        assert lat.tokens == 16 * 16 * 24

    def test_upscale_roundtrip(self):
        lat = VideoLatentShape(1, 128, 16, 16, 24)
        up = lat.upscale()
        assert (up.frames, up.height, up.width) == (121, 512, 768)


class TestRMSNorm:
    def test_unit_rms(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 128)) * 5
        out = np.asarray(rms_norm(x))
        rms = np.sqrt((out**2).mean(-1))
        np.testing.assert_allclose(rms, 1.0, rtol=1e-4)

    def test_weighted(self):
        x = jnp.ones((2, 8))
        w = jnp.full((8,), 2.0)
        out = rms_norm(x, w)
        np.testing.assert_allclose(np.asarray(out), 2.0, rtol=1e-5)


class TestFlopsAccounting:
    """MFU accounting (bench.py detail) magnitudes and invariants."""

    def test_dit_flops_scale_with_layers_and_rows(self):
        from ltx2_tpu.models.transformer.model import LTXModelConfig
        from ltx2_tpu.utils.flops import dit_step_flops

        cfg1 = LTXModelConfig(num_layers=1, caption_channels=None)
        cfg2 = LTXModelConfig(num_layers=2, caption_channels=None)
        f1 = dit_step_flops(cfg1, 1024, 256)
        f2 = dit_step_flops(cfg2, 1024, 256)
        assert f2 > 1.9 * f1  # per-block dominates the once-only projections
        assert dit_step_flops(cfg1, 1024, 256, rows=3) == 3 * f1
        # text-KV caching removes the per-block context projections
        assert dit_step_flops(cfg1, 1024, 256, text_kv_cached=True) < f1

    def test_audio_flops_use_audio_stream_dims(self):
        """The audio terms must derive from audio_heads * audio_head_dim
        (cfg.audio_inner_dim), not from the video head config — for
        reduced-width video streams the two differ and AV MFU reports
        would mis-state utilization."""
        from ltx2_tpu.models.transformer.model import LTXModelConfig
        from ltx2_tpu.utils.flops import dit_step_flops

        base = dict(num_layers=1, caption_channels=None,
                    audio_heads=4, audio_head_dim=8)
        cfg_small = LTXModelConfig(**base)
        cfg_big = LTXModelConfig(**{**base, "audio_head_dim": 16})
        v = dit_step_flops(cfg_small, 1024, 256)  # no audio: dims irrelevant
        assert v == dit_step_flops(cfg_big, 1024, 256)
        a_small = dit_step_flops(cfg_small, 1024, 256, n_audio_tokens=64)
        a_big = dit_step_flops(cfg_big, 1024, 256, n_audio_tokens=64)
        assert a_big > a_small > v

    def test_full_dit_magnitude(self):
        """48-block @6144 tokens must land near the hand-derived ~176 TF
        (8ND^2 + 4N^2D + 16ND^2 + cross terms, x48)."""
        from ltx2_tpu.models.transformer.model import LTXModelConfig
        from ltx2_tpu.utils.flops import dit_step_flops

        cfg = LTXModelConfig(
            num_attention_heads=32, attention_head_dim=128, num_layers=48,
            cross_attention_dim=4096, caption_channels=None,
        )
        tf = dit_step_flops(cfg, 6144, 1024) / 1e12
        assert 160 < tf < 200

    def test_gemma_flops_magnitude(self):
        """~2 * params * tokens is the classic transformer bound; Gemma-12B
        at 1024 tokens should land in the 20-30 TF range."""
        from ltx2_tpu.models.text_encoder.gemma3 import Gemma3Config
        from ltx2_tpu.utils.flops import gemma_encode_flops

        tf = gemma_encode_flops(Gemma3Config(), 1024) / 1e12
        assert 18 < tf < 32

    def test_vae_decoder_flops_positive_and_scales(self):
        from ltx2_tpu.models.video_vae.decoder import VideoDecoderConfig
        from ltx2_tpu.utils.flops import video_decoder_flops

        cfg = VideoDecoderConfig()
        f1 = video_decoder_flops(cfg, 4, 8, 8)
        f2 = video_decoder_flops(cfg, 4, 8, 16)
        assert f2 > 1.8 * f1  # ~linear in latent voxels

    def test_mfu_report_fields(self):
        from ltx2_tpu.utils.flops import mfu_report

        r = mfu_report(197e12, 1.0)
        assert r["pct_of_peak"] == 100.0
        assert r["achieved_tflops_per_s"] == 197.0
        assert "pct_of_measured_shape_ceiling" not in r
        r2 = mfu_report(100e12, 1.0, shape_ceiling_tflops=125.0)
        assert r2["pct_of_measured_shape_ceiling"] == 80.0
        assert r2["measured_shape_ceiling_tflops"] == 125.0

    def test_vae_decoder_ceiling_between_stage_extremes(self):
        """The FLOP-weighted ceiling must sit strictly between the slowest
        (conv_out, 68 TF/s) and fastest (S1 upsample, 166 TF/s) measured
        per-stage rates, and below the big-matmul roofline — it is a MEAN
        of measured numbers, not an aspiration (docs/PERF.md)."""
        from ltx2_tpu.models.video_vae.decoder import VideoDecoderConfig
        from ltx2_tpu.utils.flops import (
            V5E_MEASURED_ROOFLINE_TFLOPS,
            video_decoder_ceiling_tflops,
        )

        cfg = VideoDecoderConfig()
        ceil = video_decoder_ceiling_tflops(cfg, 16, 16, 24)
        assert 68.0 < ceil < 166.0
        assert ceil < V5E_MEASURED_ROOFLINE_TFLOPS
        # Shape-independent weights per conv within a stage, so any latent
        # shape keeps the value in the same band (weights shift only with
        # the plan's relative FLOP mix).
        ceil2 = video_decoder_ceiling_tflops(cfg, 8, 32, 32)
        assert abs(ceil2 - ceil) / ceil < 0.1


class TestModelLedgerViews:
    def test_with_loras_carries_serving_flags_and_shares_components(self):
        """review r4: with_loras() dropped int8/transformer_device_put (the
        LoRA view of an int8-serving ledger silently loaded full bf16) and
        rebuilt every cached component. The view must carry every serving
        flag and SHARE the LoRA-independent cache entries, dropping only
        the transformer."""
        from ltx2_tpu.loader.lora import LoRAConfig
        from ltx2_tpu.utils.model_ledger import ModelLedger

        put = lambda path, arr: arr  # noqa: E731 — identity placement hook
        ledger = ModelLedger(
            checkpoint_path="ckpt.safetensors",
            gemma_path="gemma",
            target_dtype="bfloat16",
            include_audio=True,
            keep_fp8=False,
            int8=True,
            gemma_fp8=True,
            transformer_device_put=put,
        )
        vae_sentinel = object()
        dit_sentinel = object()
        ledger._cache["video_decoder"] = vae_sentinel
        ledger._cache["transformer"] = dit_sentinel

        lora = LoRAConfig(path="a.safetensors", strength=0.5)
        view = ledger.with_loras([lora])
        assert view.loras == [lora]
        assert view.int8 is True
        assert view.gemma_fp8 is True
        assert view.include_audio is True
        assert view.transformer_device_put is put
        # Non-transformer components shared; transformer cache fresh.
        assert view._cache["video_decoder"] is vae_sentinel
        assert "transformer" not in view._cache
        # The original ledger is untouched.
        assert ledger._cache["transformer"] is dit_sentinel
