"""Upscaler tests: shapes, group-norm semantics, numerical stability.

Mirrors reference tests/test_upscalers.py strategy (building blocks + full
modules + explicit stability guards, SURVEY.md §4).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ltx2_tpu.models.upscaler import (
    SpatialUpscalerConfig,
    TemporalUpscalerConfig,
    group_norm_per_frame,
    group_norm_video,
    init_spatial_upscaler,
    init_temporal_upscaler,
    spatial_upscaler_apply,
    temporal_upscaler_apply,
)

TINY_SPATIAL = SpatialUpscalerConfig(
    in_channels=8, mid_channels=16, num_blocks_per_stage=1, num_groups=4
)
TINY_TEMPORAL = TemporalUpscalerConfig(
    latent_channels=8, hidden_channels=16, num_res_blocks=1, num_groups=4
)


@functools.lru_cache(maxsize=None)
def spatial_params():
    return jax.jit(lambda k: init_spatial_upscaler(k, TINY_SPATIAL))(jax.random.PRNGKey(0))


@functools.lru_cache(maxsize=None)
def temporal_params():
    return jax.jit(lambda k: init_temporal_upscaler(k, TINY_TEMPORAL))(jax.random.PRNGKey(0))


class TestGroupNorm:
    def test_video_norm_stats(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 4, 4, 8)) * 5 + 2
        out = group_norm_video(x, 2, jnp.ones((8,)), jnp.zeros((8,)))
        # Normalized over (T, H, W, C/g): each group has ~0 mean, ~1 var.
        grouped = np.asarray(out).reshape(1, 3, 4, 4, 2, 4)
        mean = grouped.mean(axis=(1, 2, 3, 5))
        assert np.abs(mean).max() < 1e-4

    def test_per_frame_norm_stats(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 4, 4, 8)) * 5 + 2
        out = group_norm_per_frame(x, 2, jnp.ones((8,)), jnp.zeros((8,)))
        grouped = np.asarray(out).reshape(1, 3, 4, 4, 2, 4)
        mean = grouped.mean(axis=(2, 3, 5))  # per frame per group
        assert np.abs(mean).max() < 1e-4

    def test_affine(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 4, 4, 8))
        w = jnp.full((8,), 2.0)
        b = jnp.full((8,), 1.0)
        base = np.asarray(group_norm_video(x, 2, jnp.ones((8,)), jnp.zeros((8,))))
        scaled = np.asarray(group_norm_video(x, 2, w, b))
        np.testing.assert_allclose(scaled, base * 2 + 1, atol=1e-5)


class TestSpatialUpscaler:
    def test_2x_shape(self):
        latent = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 3, 4, 6))
        fn = jax.jit(lambda p, z: spatial_upscaler_apply(p, TINY_SPATIAL, z))
        out = fn(spatial_params(), latent)
        assert out.shape == (1, 8, 3, 8, 12)
        assert bool(jnp.all(jnp.isfinite(out)))

    def test_numerical_stability(self):
        """Large-magnitude inputs must not explode (reference
        test_upscalers.py:39,146,234 guards res-block explosion)."""
        latent = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 2, 4, 4)) * 100
        fn = jax.jit(lambda p, z: spatial_upscaler_apply(p, TINY_SPATIAL, z))
        out = fn(spatial_params(), latent)
        assert bool(jnp.all(jnp.isfinite(out)))

    def test_pixel_shuffle_packing(self):
        from ltx2_tpu.models.upscaler.spatial import _pixel_shuffle_2d

        # Channel packing (C, r_h, r_w): torch pixel_shuffle order.
        x = jnp.arange(8, dtype=jnp.float32).reshape(1, 1, 1, 8)
        out = _pixel_shuffle_2d(x, 2)  # (1, 2, 2, 2)
        # For output channel 0: channels [0,1,2,3] map to (r_h, r_w) grid.
        np.testing.assert_array_equal(
            np.asarray(out[0, :, :, 0]), [[0, 1], [2, 3]]
        )
        np.testing.assert_array_equal(
            np.asarray(out[0, :, :, 1]), [[4, 5], [6, 7]]
        )


class TestTemporalUpscaler:
    def test_2x_minus_one_shape(self):
        latent = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 3, 4, 4))
        fn = jax.jit(lambda p, z: temporal_upscaler_apply(p, TINY_TEMPORAL, z))
        out = fn(temporal_params(), latent)
        # 3 frames -> 6 shuffled -> first trimmed -> 5.
        assert out.shape == (1, 8, 5, 4, 4)
        assert bool(jnp.all(jnp.isfinite(out)))

    def test_numerical_stability(self):
        latent = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 2, 4, 4)) * 100
        fn = jax.jit(lambda p, z: temporal_upscaler_apply(p, TINY_TEMPORAL, z))
        out = fn(temporal_params(), latent)
        assert bool(jnp.all(jnp.isfinite(out)))

    def test_loader_handles_sequential_upsampler_keys(self, tmp_path):
        """Real checkpoints store the upsampler conv as 'upsampler.0.*'
        (torch Sequential): the loader must branch with `is None`, not
        `or` — truthiness of a multi-element jnp array raises."""
        from ltx2_tpu.loader.safetensors_io import write_safetensors
        from ltx2_tpu.models.upscaler.temporal import (
            init_temporal_upscaler,
            load_temporal_upscaler_params,
            temporal_upscaler_apply,
        )

        params = init_temporal_upscaler(jax.random.PRNGKey(0), TINY_TEMPORAL)
        tensors = {}

        def emit(prefix, node):
            for k, v in node.items():
                if isinstance(v, dict):
                    emit(f"{prefix}{k}.", v)
                elif isinstance(v, list):
                    for i, item in enumerate(v):
                        emit(f"{prefix}{k}.{i}.", item)
                else:
                    tensors[f"{prefix}{k}"] = np.asarray(v, np.float32)

        emit("", {
            "initial_conv": params["initial_conv"],
            "initial_norm": params["initial_norm"],
            "res_blocks": params["res_blocks"],
            "post_upsample_res_blocks": params["post_upsample_res_blocks"],
            "final_conv": params["final_conv"],
        })
        # Torch-Sequential layout for the upsampler conv.
        tensors["upsampler.0.weight"] = np.asarray(
            params["upsampler"]["conv"]["weight"], np.float32
        )
        tensors["upsampler.0.bias"] = np.asarray(
            params["upsampler"]["conv"]["bias"], np.float32
        )
        path = tmp_path / "temporal.safetensors"
        write_safetensors(str(path), tensors)

        loaded = load_temporal_upscaler_params(str(path))
        latent = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 3, 4, 4))
        want = temporal_upscaler_apply(params, TINY_TEMPORAL, latent)
        got = temporal_upscaler_apply(loaded, TINY_TEMPORAL, latent)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    def test_temporal_shuffle_packing(self):
        from ltx2_tpu.models.upscaler.temporal import _temporal_pixel_shuffle

        # Packing (r, c): factor is the SLOW axis (matches the reference's
        # verified parity implementation, temporal.py:204-213).
        x = jnp.arange(4, dtype=jnp.float32).reshape(1, 1, 1, 1, 4)
        out = _temporal_pixel_shuffle(x, 2)  # (1, 2, 1, 1, 2)
        np.testing.assert_array_equal(np.asarray(out[0, :, 0, 0, 0]), [0, 2])
        np.testing.assert_array_equal(np.asarray(out[0, :, 0, 0, 1]), [1, 3])
