"""Tiled decode tests: config validation, mask shapes, spec coverage,
accumulation correctness with an identity 'decoder'."""

import numpy as np
import pytest

from ltx2_tpu.models.video_vae.tiling import (
    SpatialTilingConfig,
    TemporalTilingConfig,
    TilingConfig,
    compute_trapezoidal_mask_1d,
    decode_tiled,
    generate_tile_specs,
    should_auto_tile,
)


class TestConfigs:
    def test_spatial_validation(self):
        SpatialTilingConfig(tile_size_in_pixels=512, tile_overlap_in_pixels=64)
        with pytest.raises(ValueError):
            SpatialTilingConfig(tile_size_in_pixels=32)
        with pytest.raises(ValueError):
            SpatialTilingConfig(tile_size_in_pixels=100)
        with pytest.raises(ValueError):
            SpatialTilingConfig(tile_size_in_pixels=64, tile_overlap_in_pixels=30)
        with pytest.raises(ValueError):
            SpatialTilingConfig(tile_size_in_pixels=64, tile_overlap_in_pixels=64)

    def test_temporal_validation(self):
        TemporalTilingConfig(tile_size_in_frames=64, tile_overlap_in_frames=24)
        with pytest.raises(ValueError):
            TemporalTilingConfig(tile_size_in_frames=8)
        with pytest.raises(ValueError):
            TemporalTilingConfig(tile_size_in_frames=20)
        with pytest.raises(ValueError):
            TemporalTilingConfig(tile_size_in_frames=16, tile_overlap_in_frames=4)

    def test_default(self):
        cfg = TilingConfig.default()
        assert cfg.spatial_config.tile_size_in_pixels == 512
        assert cfg.temporal_config.tile_size_in_frames == 64


class TestMask:
    def test_flat_when_no_ramps(self):
        np.testing.assert_array_equal(
            compute_trapezoidal_mask_1d(5, 0, 0), np.ones(5, np.float32)
        )

    def test_ramps(self):
        mask = compute_trapezoidal_mask_1d(10, 3, 3)
        assert mask[0] < mask[1] < mask[2] < 1.0
        assert mask[3] == 1.0 and mask[6] == 1.0
        assert 1.0 > mask[7] > mask[8] > mask[9] > 0.0

    def test_left_starts_from_0(self):
        mask = compute_trapezoidal_mask_1d(6, 2, 0, left_starts_from_0=True)
        assert mask[0] == 0.0

    def test_invalid_length(self):
        with pytest.raises(ValueError):
            compute_trapezoidal_mask_1d(0, 0, 0)


class TestSpecs:
    def test_single_tile_when_small(self):
        cfg = TilingConfig(
            spatial_config=SpatialTilingConfig(512, 64),
            temporal_config=TemporalTilingConfig(64, 24),
        )
        specs = generate_tile_specs((1, 128, 4, 8, 8), cfg)
        assert len(specs) == 1
        assert specs[0].ramp_h_left == 0 and specs[0].ramp_w_right == 0

    def test_coverage(self):
        cfg = TilingConfig(spatial_config=SpatialTilingConfig(128, 32))
        specs = generate_tile_specs((1, 128, 2, 12, 12), cfg)
        # tile size 4 latent, overlap 1 -> tiles along h/w
        covered = np.zeros((12, 12), bool)
        for s in specs:
            covered[s.in_h_start : s.in_h_end, s.in_w_start : s.in_w_end] = True
        assert covered.all()

    def test_auto_tile_threshold(self):
        assert not should_auto_tile((1, 128, 8, 16, 24))  # 3072 voxels
        assert should_auto_tile((1, 128, 16, 16, 24))  # 6144 voxels


class TestDecodeTiled:
    def test_blend_is_partition_of_unity(self):
        """With a constant decoder the blended output must equal the constant
        everywhere (weights normalize to 1)."""
        latent = np.zeros((1, 128, 2, 8, 8), np.float32)

        def fake_decoder(tile, timestep=None):
            t = tile.shape[2]
            out_t = (t - 1) * 8 + 1
            return np.full((1, 3, out_t, tile.shape[3] * 32, tile.shape[4] * 32), 7.0)

        cfg = TilingConfig(spatial_config=SpatialTilingConfig(128, 32))
        (out,) = list(decode_tiled(latent, fake_decoder, cfg, timestep=None))
        assert out.shape == (1, 3, 9, 256, 256)
        np.testing.assert_allclose(out, 7.0, atol=1e-5)

    def test_position_passthrough(self):
        """A decoder returning upscaled latent content must reconstruct the
        global pattern (checks tile placement indexing)."""
        h = w = 8
        latent = np.arange(h * w, dtype=np.float32).reshape(1, 1, 1, h, w)
        latent = np.broadcast_to(latent, (1, 128, 1, h, w)).copy()

        def fake_decoder(tile, timestep=None):
            # Nearest-neighbour upscale of channel 0, replicated to RGB.
            t = np.repeat(np.repeat(tile[:, :1], 32, axis=3), 32, axis=4)
            return np.broadcast_to(t, (1, 3, tile.shape[2], t.shape[3], t.shape[4]))

        cfg = TilingConfig(spatial_config=SpatialTilingConfig(128, 32))
        (out,) = list(decode_tiled(latent, fake_decoder, cfg, timestep=None))
        expected = np.repeat(np.repeat(latent[:, :1, :1], 32, axis=3), 32, axis=4)[0, 0]
        np.testing.assert_allclose(out[0, 0], expected, atol=1e-4)


class TestDecodeTiledDataParallel:
    """Tiles decode data-parallel over a mesh 'data' axis: same-shape tiles
    batch one per chip. Must match the sequential path exactly (identical
    tile specs and blend weights)."""

    def _latent(self, shape=(1, 128, 2, 8, 8), seed=0):
        rng = np.random.RandomState(seed)
        return rng.randn(*shape).astype(np.float32)

    @staticmethod
    def _fake_decoder(tile, timestep=None):
        """Batch-aware jnp decoder: NN-upscale channel 0 -> RGB, 8x temporal
        (causal first-frame trim), 32x spatial."""
        import jax.numpy as jnp

        up = jnp.repeat(jnp.repeat(tile[:, :3], 32, axis=3), 32, axis=4)
        up = jnp.repeat(up, 8, axis=2)[:, :, 7:]  # (t-1)*8+1 frames
        return up

    def test_matches_sequential(self):
        import jax

        from ltx2_tpu.parallel.mesh import create_mesh

        latent = self._latent()
        cfg = TilingConfig(spatial_config=SpatialTilingConfig(128, 32))
        (seq,) = list(decode_tiled(latent, self._fake_decoder, cfg, timestep=None))
        mesh = create_mesh(data=8, model=1, devices=jax.devices())
        (par,) = list(
            decode_tiled(latent, self._fake_decoder, cfg, timestep=None, mesh=mesh)
        )
        np.testing.assert_allclose(par, seq, atol=1e-6)

    def test_matches_sequential_temporal_plus_spatial(self):
        """Temporal + spatial tiling: 18 tiles over 4 chips = 5 rounds, with
        the overlap crossfade spanning both axes. (All tiles share one
        shape — _gen_tiles_1d clamps edge tiles to full tile size — so the
        DP path's shape-grouping yields a single group here by design.)"""
        import jax

        from ltx2_tpu.parallel.mesh import create_mesh

        latent = self._latent((1, 128, 11, 8, 8), seed=1)
        cfg = TilingConfig(
            spatial_config=SpatialTilingConfig(128, 32),
            temporal_config=TemporalTilingConfig(64, 24),
        )
        specs = generate_tile_specs(latent.shape, cfg)
        assert len(specs) == 18
        (seq,) = list(decode_tiled(latent, self._fake_decoder, cfg, timestep=None))
        mesh = create_mesh(data=4, model=1, devices=jax.devices()[:4])
        (par,) = list(
            decode_tiled(latent, self._fake_decoder, cfg, timestep=None, mesh=mesh)
        )
        np.testing.assert_allclose(par, seq, atol=1e-6)

    def test_matches_sequential_real_decoder(self):
        """Through the real conv decoder (noise off), batch-sharded over 4
        chips: GSPMD splits the convs with zero cross-tile communication."""
        import jax

        from ltx2_tpu.models.video_vae import (
            VideoDecoderConfig,
            init_video_decoder,
            video_decoder_apply,
        )
        from ltx2_tpu.parallel.mesh import create_mesh

        cfg = VideoDecoderConfig(
            decoder_blocks=(("res_x", 1), ("compress_all", 2, True), ("res_x", 1)),
            base_channels=4,
            latent_channels=8,
            patch_size=2,
            timestep_conditioning=False,
        )
        params = jax.jit(lambda k: init_video_decoder(k, cfg))(jax.random.PRNGKey(0))
        decoder_fn = jax.jit(
            lambda tile, timestep=None: video_decoder_apply(params, cfg, tile)
        )
        latent = self._latent((1, 8, 3, 20, 20))
        # compress_all(2) x patch_size(2): temporal x2 (causal trim), spatial x4.
        tiling = TilingConfig(
            spatial_config=SpatialTilingConfig(tile_size_in_pixels=64,
                                               tile_overlap_in_pixels=32)
        )
        scales = (2, 4, 4)
        # 64px tiles at 4x scale = 16-latent tiles over a 20-latent grid:
        # 2 tiles per spatial dim -> 4 same-shape tiles = one 4-chip round.
        specs = generate_tile_specs(latent.shape, tiling, scales)
        assert len(specs) == 4
        (seq,) = list(
            decode_tiled(latent, decoder_fn, tiling, timestep=None,
                         scale_factors=scales)
        )
        mesh = create_mesh(data=4, model=1, devices=jax.devices()[:4])
        (par,) = list(
            decode_tiled(latent, decoder_fn, tiling, timestep=None,
                         scale_factors=scales, mesh=mesh)
        )
        np.testing.assert_allclose(par, seq, atol=1e-5)
