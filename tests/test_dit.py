"""DiT model tests on tiny configs (random init, shape/NaN/behavioral checks).

Mirrors the reference's weight-free unit strategy (SURVEY.md §4). All model
calls are jitted via tests/helpers.py — eager dispatch is pathologically
slow in this environment.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ltx2_tpu.components.perturbations import (
    BatchedPerturbationConfig,
    Perturbation,
    PerturbationConfig,
    PerturbationType,
)
from ltx2_tpu.models.transformer.model import (
    LTXModelConfig,
    LTXModelType,
    Modality,
    x0_model_apply,
)
from ltx2_tpu.ops.rope import create_position_grid
from tests.helpers import cached_params, jitted_forward


def tiny_config(**kwargs) -> LTXModelConfig:
    defaults = dict(
        model_type=LTXModelType.VideoOnly,
        num_attention_heads=2,
        attention_head_dim=16,
        in_channels=8,
        out_channels=8,
        num_layers=2,
        cross_attention_dim=32,
        caption_channels=24,
        compute_dtype="float32",
        audio_heads=2,
        audio_head_dim=8,
        audio_in_channels=8,
        audio_out_channels=8,
        remat=False,
    )
    defaults.update(kwargs)
    return LTXModelConfig(**defaults)


def make_video_modality(cfg, batch=2, frames=2, height=2, width=3, seq=5, key=0):
    n = frames * height * width
    ks = jax.random.split(jax.random.PRNGKey(key), 3)
    grid = create_position_grid(batch, frames, height, width).astype(jnp.float32)
    positions = jnp.stack([grid, grid + 1], axis=-1)  # (B, 3, N, 2)
    return Modality(
        latent=jax.random.normal(ks[0], (batch, n, cfg.in_channels)),
        context=jax.random.normal(ks[1], (batch, seq, cfg.caption_channels or cfg.cross_attention_dim)),
        context_mask=jnp.ones((batch, seq), jnp.int32),
        timesteps=jnp.full((batch,), 0.5),
        positions=positions,
        sigma=jnp.full((batch,), 0.5),
    )


def make_audio_modality(cfg, batch=2, frames=4, seq=5, key=1):
    ks = jax.random.split(jax.random.PRNGKey(key), 2)
    t = jnp.arange(frames, dtype=jnp.float32)[None, None, :].repeat(batch, 0)
    positions = jnp.stack([t, t + 0.1], axis=-1)  # (B, 1, T, 2)
    return Modality(
        latent=jax.random.normal(ks[0], (batch, frames, cfg.audio_in_channels)),
        context=jax.random.normal(ks[1], (batch, seq, cfg.caption_channels or cfg.audio_inner_dim)),
        context_mask=jnp.ones((batch, seq), jnp.int32),
        timesteps=jnp.full((batch,), 0.5),
        positions=positions,
        sigma=jnp.full((batch,), 0.5),
    )


class TestVideoOnly:
    def test_forward_shapes(self):
        cfg = tiny_config()
        params = cached_params(cfg)
        video = make_video_modality(cfg)
        out = jitted_forward(cfg)(params, video)
        assert out.shape == (2, 12, cfg.out_channels)
        assert bool(jnp.all(jnp.isfinite(out)))

    def test_deterministic(self):
        cfg = tiny_config()
        params = cached_params(cfg)
        video = make_video_modality(cfg)
        fn = jitted_forward(cfg)
        np.testing.assert_allclose(
            np.asarray(fn(params, video)), np.asarray(fn(params, video))
        )

    def test_token_mask_padding_matches_unpadded(self):
        """Shape-bucketed serving: padded tokens masked via token_mask must
        leave the REAL tokens' outputs identical to the unpadded forward
        (padding is invisible to self-attention keys; everything else in
        the DiT is pointwise over tokens)."""
        import dataclasses as dc

        cfg = tiny_config()
        params = cached_params(cfg)
        video = make_video_modality(cfg)  # 12 real tokens
        expected = np.asarray(jitted_forward(cfg)(params, video))

        n, pad = video.latent.shape[1], 4
        b = video.latent.shape[0]
        padded = dc.replace(
            video,
            latent=jnp.pad(video.latent, [(0, 0), (0, pad), (0, 0)]),
            positions=jnp.pad(
                video.positions, [(0, 0), (0, 0), (0, pad), (0, 0)], mode="edge"
            ),
            token_mask=jnp.concatenate(
                [jnp.ones((b, n), bool), jnp.zeros((b, pad), bool)], axis=1
            ),
        )
        out = jitted_forward(cfg)(params, padded)
        assert out.shape[1] == n + pad
        np.testing.assert_allclose(np.asarray(out)[:, :n], expected, atol=1e-5)

        # Sanity: WITHOUT the mask, padding leaks into real tokens.
        leaky = dc.replace(padded, token_mask=None)
        out_leaky = np.asarray(jitted_forward(cfg)(params, leaky))[:, :n]
        assert np.abs(out_leaky - expected).max() > 1e-3

    def test_x0_model(self):
        cfg = tiny_config()
        params = cached_params(cfg)
        video = make_video_modality(cfg)
        velocity = jitted_forward(cfg)(params, video)
        x0 = jitted_forward(cfg, x0=True)(params, video)
        expected = np.asarray(video.latent) - 0.5 * np.asarray(velocity)
        np.testing.assert_allclose(np.asarray(x0), expected, atol=1e-5)

    def test_per_token_timesteps(self):
        cfg = tiny_config()
        params = cached_params(cfg)
        video = make_video_modality(cfg)
        per_token = video.replace(timesteps=jnp.full((2, 12), 0.5))
        fn = jitted_forward(cfg)
        np.testing.assert_allclose(
            np.asarray(fn(params, video)), np.asarray(fn(params, per_token)), atol=1e-4
        )

    def test_context_mask_effect(self):
        cfg = tiny_config()
        params = cached_params(cfg)
        video = make_video_modality(cfg, seq=6)
        masked = video.replace(
            context_mask=jnp.asarray([[1, 1, 1, 0, 0, 0]] * 2, jnp.int32)
        )
        fn = jitted_forward(cfg)
        assert not np.allclose(
            np.asarray(fn(params, video)), np.asarray(fn(params, masked))
        )

    def test_v2_switches(self):
        cfg = tiny_config(
            cross_attention_adaln=True, apply_gated_attention=True, caption_channels=None,
            cross_attention_dim=32,
        )
        params = cached_params(cfg)
        video = make_video_modality(cfg)
        video = video.replace(
            context=jax.random.normal(jax.random.PRNGKey(9), (2, 5, cfg.cross_attention_dim))
        )
        out = jitted_forward(cfg)(params, video)
        assert out.shape == (2, 12, cfg.out_channels)
        assert bool(jnp.all(jnp.isfinite(out)))

    def test_remat_matches(self):
        cfg = tiny_config(remat=False)
        cfg_r = tiny_config(remat=True)
        params = cached_params(cfg)
        video = make_video_modality(cfg)
        out = jitted_forward(cfg)(params, video)
        out_r = jitted_forward(cfg_r)(params, video)
        np.testing.assert_allclose(np.asarray(out), np.asarray(out_r), atol=1e-5)


class TestAudioVideo:
    def test_av_forward(self):
        cfg = tiny_config(model_type=LTXModelType.AudioVideo)
        params = cached_params(cfg)
        video = make_video_modality(cfg)
        audio = make_audio_modality(cfg)
        v_out, a_out = jitted_forward(cfg)(params, video, audio)
        assert v_out.shape == (2, 12, cfg.out_channels)
        assert a_out.shape == (2, 4, cfg.audio_out_channels)
        assert bool(jnp.all(jnp.isfinite(v_out))) and bool(jnp.all(jnp.isfinite(a_out)))

    def test_av_video_only_inference(self):
        cfg = tiny_config(model_type=LTXModelType.AudioVideo)
        params = cached_params(cfg)
        video = make_video_modality(cfg)
        out = jitted_forward(cfg)(params, video, None)
        assert out.shape == (2, 12, cfg.out_channels)

    def test_cross_modal_coupling(self):
        """Changing the audio latent must change the video output (A2V attn)."""
        cfg = tiny_config(model_type=LTXModelType.AudioVideo)
        params = cached_params(cfg)
        video = make_video_modality(cfg)
        audio = make_audio_modality(cfg)
        audio2 = audio.replace(latent=audio.latent + 1.0)
        fn = jitted_forward(cfg)
        v1, _ = fn(params, video, audio)
        v2, _ = fn(params, video, audio2)
        assert not np.allclose(np.asarray(v1), np.asarray(v2))


def _stg_all(n=2):
    return BatchedPerturbationConfig(
        perturbations=(
            PerturbationConfig(
                perturbations=(
                    Perturbation(type=PerturbationType.SKIP_VIDEO_SELF_ATTN, blocks=None),
                )
            ),
        ) * n
    )


class TestPerturbations:
    def test_skip_video_self_attn_changes_output(self):
        cfg = tiny_config()
        params = cached_params(cfg)
        video = make_video_modality(cfg)
        base = jitted_forward(cfg)(params, video)
        perturbed = jitted_forward(cfg, _stg_all())(params, video)
        assert not np.allclose(np.asarray(base), np.asarray(perturbed))

    def test_block_selective_skip(self):
        cfg = tiny_config()
        params = cached_params(cfg)
        video = make_video_modality(cfg)
        skip_block_0 = BatchedPerturbationConfig(
            perturbations=(
                PerturbationConfig(
                    perturbations=(
                        Perturbation(type=PerturbationType.SKIP_VIDEO_SELF_ATTN, blocks=(0,)),
                    )
                ),
            ) * 2
        )
        out_b0 = jitted_forward(cfg, skip_block_0)(params, video)
        out_all = jitted_forward(cfg, _stg_all())(params, video)
        assert not np.allclose(np.asarray(out_b0), np.asarray(out_all))

    def test_per_sample_perturbation(self):
        """Sample 0 perturbed, sample 1 not — sample 1 must match baseline."""
        cfg = tiny_config()
        params = cached_params(cfg)
        video = make_video_modality(cfg)
        mixed = BatchedPerturbationConfig(
            perturbations=(
                PerturbationConfig(
                    perturbations=(
                        Perturbation(type=PerturbationType.SKIP_VIDEO_SELF_ATTN, blocks=None),
                    )
                ),
                PerturbationConfig.empty(),
            )
        )
        base = jitted_forward(cfg)(params, video)
        out = jitted_forward(cfg, mixed)(params, video)
        np.testing.assert_allclose(np.asarray(out[1]), np.asarray(base[1]), atol=1e-5)
        assert not np.allclose(np.asarray(out[0]), np.asarray(base[0]))


class TestTextKVCache:
    """V1 text cross-attn K/V caching: precomputed K/V must reproduce the
    uncached forward exactly (same math, hoisted out of the step)."""

    def test_video_forward_matches(self):
        from ltx2_tpu.models.transformer.model import precompute_text_kv

        cfg = tiny_config()
        params = cached_params(cfg)
        video = make_video_modality(cfg)
        base = jitted_forward(cfg, x0=True)(params, video)
        kv = jax.jit(lambda p, c: precompute_text_kv(p, cfg, video_context=c))(
            params, video.context
        )
        cached = jax.jit(
            lambda p, v, kv: x0_model_apply(p, cfg, video=v, text_kv=kv)
        )(params, video, kv)
        np.testing.assert_allclose(np.asarray(cached), np.asarray(base), atol=1e-5)

    def test_av_forward_matches(self):
        from ltx2_tpu.models.transformer.model import precompute_text_kv

        cfg = tiny_config(model_type=LTXModelType.AudioVideo)
        params = cached_params(cfg)
        video = make_video_modality(cfg)
        audio = make_audio_modality(cfg)
        bv, ba = jax.jit(
            lambda p, v, a: x0_model_apply(p, cfg, video=v, audio=a)
        )(params, video, audio)
        kv = jax.jit(
            lambda p, vc, ac: precompute_text_kv(
                p, cfg, video_context=vc, audio_context=ac
            )
        )(params, video.context, audio.context)
        cv, ca = jax.jit(
            lambda p, v, a, kv: x0_model_apply(p, cfg, video=v, audio=a, text_kv=kv)
        )(params, video, audio, kv)
        np.testing.assert_allclose(np.asarray(cv), np.asarray(bv), atol=1e-5)
        np.testing.assert_allclose(np.asarray(ca), np.asarray(ba), atol=1e-5)

    def test_v2_raises(self):
        from ltx2_tpu.models.transformer.model import precompute_text_kv

        cfg = tiny_config(
            caption_channels=None, cross_attention_dim=32, cross_attention_adaln=True
        )
        params = cached_params(cfg)
        with pytest.raises(ValueError):
            precompute_text_kv(params, cfg, video_context=jnp.zeros((1, 5, 32)))


class TestSwiGLU:
    """SwiGLU alternative FFN (reference feed_forward.py:57-74) — formula
    oracle plus the row-parallel TP path."""

    def _params(self, d=16, h=32, key=0):
        ks = jax.random.split(jax.random.PRNGKey(key), 3)
        return {
            "w_gate": {"weight": jax.random.normal(ks[0], (h, d)) * 0.1},
            "w_up": {"weight": jax.random.normal(ks[1], (h, d)) * 0.1},
            "w_down": {"weight": jax.random.normal(ks[2], (d, h)) * 0.1},
        }

    def test_formula(self):
        from ltx2_tpu.models.transformer.attention import swiglu_apply

        p = self._params()
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 16))
        got = np.asarray(swiglu_apply(p, x))
        g = np.asarray(x) @ np.asarray(p["w_gate"]["weight"]).T
        u = np.asarray(x) @ np.asarray(p["w_up"]["weight"]).T
        silu = g * (1.0 / (1.0 + np.exp(-g)))
        expected = (silu * u) @ np.asarray(p["w_down"]["weight"]).T
        np.testing.assert_allclose(got, expected, atol=1e-5)

    def test_tp_matches(self):
        """Column-parallel gate/up + row-parallel down over a 'model' mesh
        axis (inside shard_map with the axis left auto) must match."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ltx2_tpu.models.transformer.attention import swiglu_apply
        from ltx2_tpu.parallel.mesh import create_mesh

        p = self._params()
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 16))
        expected = np.asarray(swiglu_apply(p, x))

        mesh = create_mesh(data=1, model=2, devices=jax.devices()[:2])
        put = lambda a, spec: jax.device_put(a, NamedSharding(mesh, spec))
        sharded = {
            "w_gate": {"weight": put(p["w_gate"]["weight"], P("model", None))},
            "w_up": {"weight": put(p["w_up"]["weight"], P("model", None))},
            "w_down": {"weight": put(p["w_down"]["weight"], P(None, "model"))},
        }

        fn = jax.shard_map(
            lambda pp, xx: swiglu_apply(pp, xx, tp_axis="model"),
            mesh=mesh,
            in_specs=(jax.tree_util.tree_map(lambda _: P(), sharded), P()),
            out_specs=P(),
            axis_names=frozenset({"data"}),
        )
        got = np.asarray(jax.jit(fn)(sharded, x))
        np.testing.assert_allclose(got, expected, atol=1e-5)


class TestAttentionMaskPreparation:
    def test_float_2d_mask_reshapes_to_key_only(self):
        """An additive float (B, S) mask must become (B, 1, 1, S) like the
        bool path — raw 2D floats are misread downstream (sdpa treats 2D
        masks as (T_q, T_k))."""
        from ltx2_tpu.models.transformer.model import _prepare_attention_mask

        m = jnp.where(jnp.arange(6)[None, :] < 4, 0.0, -1e9).repeat(2, axis=0)
        out = _prepare_attention_mask(m, jnp.float32)
        assert out.shape == (2, 1, 1, 6)
        np.testing.assert_array_equal(np.asarray(out[0, 0, 0]), np.asarray(m[0]))
        # bool path unchanged
        out_b = _prepare_attention_mask(jnp.asarray(m == 0.0), jnp.float32)
        assert out_b.shape == (2, 1, 1, 6)
        # 4D float masks pass through untouched.
        m4 = jnp.zeros((2, 1, 1, 6))
        assert _prepare_attention_mask(m4, jnp.float32) is m4

    def test_flash_block_sizes_carry_backward_tiles(self):
        """Both flash variants (plain + masked segment-id) must build
        BlockSizes with the dkv/dq tiles, or backprop through the Pallas
        custom VJP raises 'not all backward blocks are specified'."""
        from ltx2_tpu.ops.attention import _full_block_sizes

        bs = _full_block_sizes(512, 1024)
        for f in ("block_q_major_dkv", "block_k_major_dkv", "block_k_dkv",
                  "block_q_dkv", "block_k_major_dq", "block_k_dq",
                  "block_q_dq"):
            assert getattr(bs, f) is not None, f

    def test_pick_block_divisor_search(self):
        """Block choice is a divisor SEARCH, not preferred/2^k: 3456 tokens
        (512x768x65f) must tile at 384, not degrade to 128 — measured 2.8x
        attention cost on the v5e at (128,128) vs (384,384)."""
        from ltx2_tpu.ops.attention import _pick_block

        assert _pick_block(3456, 512) == 384
        assert _pick_block(3456, 1024) == 384
        assert _pick_block(6912, 1024) == 768   # not 256
        assert _pick_block(6144, 1024) == 1024  # headline shape unchanged
        assert _pick_block(6144, 512) == 512
        assert _pick_block(2048, 512) == 512
        # non-multiple-of-128 token counts cannot tile -> einsum fallback
        assert _pick_block(2050, 512) is None
        # blocks are always multiples of the 128 lane width, even when the
        # token count itself divides evenly (t < preferred edge)
        b = _pick_block(2304, 512)
        assert b == 384 and b % 128 == 0

    def test_pick_kv_block_over_cap(self):
        """kv tiles may exceed the preferred 1024 when the capped search
        falls short: bigger K/V tiles amortize the q-tile reload (measured
        29% at 4992 tokens, 10% at 3456 on the v5e), bounded at 2048 —
        the q side stays capped (block_q >= 1664 fails to compile)."""
        from ltx2_tpu.ops.attention import _pick_kv_block

        assert _pick_kv_block(4992, 1024) == 1664   # not 384
        assert _pick_kv_block(3456, 1024) == 1152   # not 384
        assert _pick_kv_block(6144, 1024) == 1024   # preferred divides: keep
        assert _pick_kv_block(6912, 1024) == 768    # healthy capped: keep
        # no divisor in (1024, 2048] -> fall back to the capped choice
        assert _pick_kv_block(2176, 1024) == 128    # 128x17, 17 prime
        assert _pick_kv_block(2050, 1024) is None


class TestX0ModalityRouting:
    def test_audio_only_model_with_both_args_denoises_audio(self):
        """review r4 (documented divergence from the reference X0Model,
        which shares the argument-presence bug): a single-stream output is
        routed by cfg.model_type, not by whichever Modality argument is
        present — an AudioOnly model called with video AND audio must
        denoise against the AUDIO latents/timesteps."""
        from ltx2_tpu.models.transformer.model import x0_model_apply

        cfg = tiny_config(model_type=LTXModelType.AudioOnly)
        params = cached_params(cfg)
        audio = make_audio_modality(cfg)
        video = make_video_modality(cfg)
        expected = np.asarray(x0_model_apply(params, cfg, audio=audio))
        got = np.asarray(x0_model_apply(params, cfg, video=video, audio=audio))
        np.testing.assert_array_equal(got, expected)


class TestAudioRopeGrid:
    def test_audio_stream_ignores_middle_grid_flag(self):
        """The reference hardcodes use_middle_indices_grid=True for the
        AUDIO preprocessor (model.py:683) — only video follows the config
        flag (review r4: both streams followed it)."""
        from ltx2_tpu.models.transformer.model import ltx_model_apply

        cfg_on = tiny_config(
            model_type=LTXModelType.AudioVideo, use_middle_indices_grid=True
        )
        cfg_off = tiny_config(
            model_type=LTXModelType.AudioVideo, use_middle_indices_grid=False
        )
        params = cached_params(cfg_on)
        video = make_video_modality(cfg_on)
        audio = make_audio_modality(cfg_on)
        v_on, a_on = ltx_model_apply(params, cfg_on, video=video, audio=audio)
        v_off, a_off = ltx_model_apply(params, cfg_off, video=video, audio=audio)
        # Video follows the flag (outputs differ)...
        assert not np.allclose(np.asarray(v_on), np.asarray(v_off), atol=1e-6)
        # ...audio does not (A2V cross-attn sees different video K/V, so
        # compare the AUDIO-ONLY model where no video leaks in).
        cfg_a_on = tiny_config(
            model_type=LTXModelType.AudioOnly, use_middle_indices_grid=True
        )
        cfg_a_off = tiny_config(
            model_type=LTXModelType.AudioOnly, use_middle_indices_grid=False
        )
        pa = cached_params(cfg_a_on)
        out_on = np.asarray(ltx_model_apply(pa, cfg_a_on, audio=audio))
        out_off = np.asarray(ltx_model_apply(pa, cfg_a_off, audio=audio))
        np.testing.assert_array_equal(out_on, out_off)
