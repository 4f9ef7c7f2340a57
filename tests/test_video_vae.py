"""Video VAE tests: pixel ops parity vs einops, causal conv, tiny
encoder/decoder forwards, checkpoint loading round-trip."""

import functools

import einops
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ltx2_tpu.models.video_vae.chunking import decode_latent, latent_t_to_pixel_t
from ltx2_tpu.models.video_vae.conv import conv3d_ndhwc, from_ndhwc, to_ndhwc
from ltx2_tpu.models.video_vae.decoder import (
    VideoDecoderConfig,
    init_video_decoder,
    video_decoder_apply,
)
from ltx2_tpu.models.video_vae.encoder import (
    VideoEncoderConfig,
    init_video_encoder,
    video_encoder_apply,
)
from ltx2_tpu.models.video_vae.ops import (
    patchify,
    pixel_shuffle_3d,
    pixel_unshuffle_3d,
    unpatchify,
)

TINY_DECODER = VideoDecoderConfig(
    decoder_blocks=(("res_x", 1), ("compress_all", 2, True), ("res_x", 1)),
    base_channels=4,
    latent_channels=8,
    patch_size=2,
)

TINY_ENCODER = VideoEncoderConfig(
    patch_size=2,
    latent_channels=8,
    plan=(
        ("res", 16, 1, None),
        ("down", 16, 32, (2, 2, 2)),
        ("res", 32, 1, None),
    ),
)


@functools.lru_cache(maxsize=None)
def tiny_decoder_params():
    cfg = TINY_DECODER
    init = jax.jit(lambda k: init_video_decoder(k, cfg))
    return init(jax.random.PRNGKey(0))


class TestPixelOps:
    def test_patchify_matches_einops(self):
        x = np.random.default_rng(0).normal(size=(2, 3, 4, 8, 8)).astype(np.float32)
        got = np.asarray(patchify(jnp.asarray(x), patch_size_hw=4, patch_size_t=1))
        expected = einops.rearrange(
            x, "b c (f p) (h q) (w r) -> b (c p r q) f h w", p=1, q=4, r=4
        )
        np.testing.assert_allclose(got, expected)

    def test_unpatchify_inverse(self):
        x = jnp.asarray(np.random.default_rng(1).normal(size=(1, 3, 2, 8, 12)), jnp.float32)
        packed = patchify(x, patch_size_hw=4)
        assert packed.shape == (1, 48, 2, 2, 3)
        back = unpatchify(packed, patch_size_hw=4)
        np.testing.assert_allclose(np.asarray(back), np.asarray(x))

    def test_unpatchify_matches_einops(self):
        x = np.random.default_rng(2).normal(size=(1, 48, 2, 3, 4)).astype(np.float32)
        got = np.asarray(unpatchify(jnp.asarray(x), patch_size_hw=4))
        expected = einops.rearrange(
            x, "b (c p r q) f h w -> b c (f p) (h q) (w r)", p=1, q=4, r=4
        )
        np.testing.assert_allclose(got, expected)

    def test_pixel_shuffle_roundtrip(self):
        x = jnp.asarray(np.random.default_rng(3).normal(size=(1, 4, 2, 3, 3)), jnp.float32)
        up = pixel_shuffle_3d(x, 2)
        assert up.shape == (1, 1, 2, 6, 6)
        back = pixel_unshuffle_3d(up, 2)
        np.testing.assert_allclose(np.asarray(back), np.asarray(x))


class TestConv3d:
    def _params(self, in_c=4, out_c=4, k=3, seed=0):
        rng = np.random.default_rng(seed)
        return {
            "weight": jnp.asarray(
                rng.normal(size=(out_c, in_c, k, k, k)).astype(np.float32) * 0.1
            ),
            "bias": jnp.zeros((out_c,), jnp.float32),
        }

    def test_shape_preserved(self):
        p = self._params()
        x = jnp.ones((1, 5, 8, 8, 4))
        out = jax.jit(lambda p, x: conv3d_ndhwc(p, x, causal=True))(p, x)
        assert out.shape == (1, 5, 8, 8, 4)

    def test_causal_no_future_leak(self):
        """Output at frame t must not depend on frames > t when causal."""
        p = self._params()
        fn = jax.jit(lambda p, x: conv3d_ndhwc(p, x, causal=True))
        x = jnp.asarray(
            np.random.default_rng(4).normal(size=(1, 6, 4, 4, 4)), jnp.float32
        )
        x2 = x.at[:, 4:].set(99.0)  # mutate the future
        out1 = np.asarray(fn(p, x))
        out2 = np.asarray(fn(p, x2))
        np.testing.assert_allclose(out1[:, :4], out2[:, :4], atol=1e-5)
        assert not np.allclose(out1[:, 4:], out2[:, 4:])

    def test_noncausal_symmetric(self):
        p = self._params()
        fn = jax.jit(lambda p, x: conv3d_ndhwc(p, x, causal=False))
        x = jnp.asarray(
            np.random.default_rng(5).normal(size=(1, 6, 4, 4, 4)), jnp.float32
        )
        x2 = x.at[:, 5:].set(99.0)
        out1 = np.asarray(fn(p, x))
        out2 = np.asarray(fn(p, x2))
        # Non-causal: frame 3 output still unaffected by frame 5 (k=3 reach is 1).
        np.testing.assert_allclose(out1[:, :4], out2[:, :4], atol=1e-5)

    def test_matches_reference_temporal_slice_sum(self):
        """One real 3D conv == the reference's kT x 2D accumulation."""
        p = self._params(in_c=3, out_c=5)
        x = jnp.asarray(
            np.random.default_rng(6).normal(size=(1, 4, 6, 6, 3)), jnp.float32
        )
        got = np.asarray(jax.jit(lambda p, x: conv3d_ndhwc(p, x, causal=True, spatial_mode="zeros"))(p, x))

        # Reference semantics in numpy: pad zeros spatially, replicate first
        # frame temporally, then correlate.
        xn = np.asarray(x).transpose(0, 4, 1, 2, 3)  # (B, C, T, H, W)
        xn = np.pad(xn, [(0, 0), (0, 0), (0, 0), (1, 1), (1, 1)])
        xn = np.concatenate([xn[:, :, :1]] * 2 + [xn], axis=2)
        w = np.asarray(p["weight"])  # (out, in, kt, kh, kw)
        b, c, t, h, wd = xn.shape
        out = np.zeros((1, 5, 4, 6, 6), np.float32)
        for ot in range(4):
            for oh in range(6):
                for ow in range(6):
                    patch = xn[0, :, ot : ot + 3, oh : oh + 3, ow : ow + 3]
                    out[0, :, ot, oh, ow] = np.tensordot(
                        w, patch, axes=([1, 2, 3, 4], [0, 1, 2, 3])
                    )
        np.testing.assert_allclose(got, out.transpose(0, 2, 3, 4, 1), atol=1e-4)


class TestDecoder:
    def test_shapes_and_finite(self):
        cfg = TINY_DECODER
        params = tiny_decoder_params()
        latent = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 3, 4, 4))
        fn = jax.jit(
            lambda p, z, k: video_decoder_apply(p, cfg, z, timestep=0.05, noise_key=k)
        )
        out = fn(params, latent, jax.random.PRNGKey(2))
        # Temporal: 3 -> d2s x2 trim -> 5. Spatial: 4 -> 8 (d2s) -> 16 (patch 2).
        assert out.shape == (1, 3, 5, 16, 16)
        assert bool(jnp.all(jnp.isfinite(out)))

    def test_timestep_changes_output(self):
        cfg = TINY_DECODER
        params = tiny_decoder_params()
        latent = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 2, 4, 4))
        fn = jax.jit(
            lambda p, z, t: video_decoder_apply(p, cfg, z, timestep=t, noise_key=None)
        )
        o1 = fn(params, latent, 0.05)
        o2 = fn(params, latent, 0.5)
        assert not np.allclose(np.asarray(o1), np.asarray(o2))

    def test_decode_latent_uint8(self):
        cfg = TINY_DECODER
        params = tiny_decoder_params()
        latent = jax.random.normal(jax.random.PRNGKey(1), (8, 3, 4, 4))
        video = decode_latent(latent, params, cfg, key=jax.random.PRNGKey(0))
        assert video.dtype == np.uint8
        assert video.shape == (5, 16, 16, 3)

    def test_chunked_matches_single_causal(self):
        """With CAUSAL decoding a chunk's output depends only on past latents,
        so the first chunk's frames match the single pass exactly. (Non-causal
        decoding bleeds chunk-boundary padding inward — approximate only.)"""
        cfg = TINY_DECODER
        params = tiny_decoder_params()
        latent = jax.random.normal(jax.random.PRNGKey(1), (8, 9, 4, 4))
        single = decode_latent(
            latent, params, cfg, timestep=None, key=jax.random.PRNGKey(0), causal=True
        )
        chunked = decode_latent(
            latent, params, cfg, timestep=None, key=jax.random.PRNGKey(0),
            temporal_chunk_size=5, temporal_overlap=2, causal=True,
        )
        assert single.shape == chunked.shape
        # Frames before the first overlap ramp come solely from chunk 1.
        np.testing.assert_array_equal(single[:4], chunked[:4])

    def test_latent_t_to_pixel_t(self):
        assert latent_t_to_pixel_t(16) == (((16 * 2 - 1) * 2 - 1) * 2 - 1)


class TestEncoder:
    def test_shapes_and_frame_check(self):
        cfg = TINY_ENCODER
        params = jax.jit(lambda k: init_video_encoder(k, cfg))(jax.random.PRNGKey(0))
        video = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 9, 16, 16))
        fn = jax.jit(lambda p, v: video_encoder_apply(p, cfg, v))
        out = fn(params, video)
        # patchify 2 -> 8x8; one (2,2,2) down -> 4x4 spatial, temporal 9->pad10->5.
        assert out.shape == (1, 8, 5, 4, 4)
        assert bool(jnp.all(jnp.isfinite(out)))

        with pytest.raises(ValueError, match="Invalid number of frames"):
            video_encoder_apply(params, cfg, jnp.zeros((1, 3, 8, 16, 16)))


class TestWeightsLoading:
    def test_decoder_checkpoint_roundtrip(self, tmp_path):
        from ltx2_tpu.loader.safetensors_io import write_safetensors
        from ltx2_tpu.models.video_vae.weights import load_video_decoder_params

        cfg = TINY_DECODER
        params = tiny_decoder_params()

        ckpt = {}
        ckpt["vae.per_channel_statistics.mean-of-means"] = np.asarray(
            params["per_channel_statistics"]["mean_of_means"]
        )
        ckpt["vae.per_channel_statistics.std-of-means"] = np.asarray(
            params["per_channel_statistics"]["std_of_means"]
        )
        for name in ["conv_in", "conv_out"]:
            ckpt[f"vae.decoder.{name}.conv.weight"] = np.asarray(params[name]["weight"])
            ckpt[f"vae.decoder.{name}.conv.bias"] = np.asarray(params[name]["bias"])
        ckpt["vae.decoder.last_scale_shift_table"] = np.asarray(
            params["last_scale_shift_table"]
        )
        ckpt["vae.decoder.timestep_scale_multiplier"] = np.asarray(
            params["timestep_scale_multiplier"]
        )
        for ln in ["linear_1", "linear_2"]:
            for sfx in ["weight", "bias"]:
                ckpt[
                    f"vae.decoder.last_time_embedder.timestep_embedder.{ln}.{sfx}"
                ] = np.asarray(params["last_time_embedder"][ln][sfx])
        for i, (block, (kind, spec, _c)) in enumerate(
            zip(params["up_blocks"], cfg.plan())
        ):
            if kind == "res":
                for j, rb in enumerate(block["res_blocks"]):
                    for cn in ["conv1", "conv2"]:
                        ckpt[f"vae.decoder.up_blocks.{i}.res_blocks.{j}.{cn}.conv.weight"] = np.asarray(rb[cn]["weight"])
                        ckpt[f"vae.decoder.up_blocks.{i}.res_blocks.{j}.{cn}.conv.bias"] = np.asarray(rb[cn]["bias"])
                    ckpt[f"vae.decoder.up_blocks.{i}.res_blocks.{j}.scale_shift_table"] = np.asarray(rb["scale_shift_table"])
                if "time_embedder" in block:
                    for ln in ["linear_1", "linear_2"]:
                        for sfx in ["weight", "bias"]:
                            ckpt[f"vae.decoder.up_blocks.{i}.time_embedder.timestep_embedder.{ln}.{sfx}"] = np.asarray(block["time_embedder"][ln][sfx])
            else:
                ckpt[f"vae.decoder.up_blocks.{i}.conv.conv.weight"] = np.asarray(block["conv"]["weight"])
                ckpt[f"vae.decoder.up_blocks.{i}.conv.conv.bias"] = np.asarray(block["conv"]["bias"])

        path = str(tmp_path / "vae.safetensors")
        write_safetensors(path, ckpt)
        loaded = load_video_decoder_params(path, cfg)

        latent = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 2, 4, 4))
        fn = jax.jit(
            lambda p, z: video_decoder_apply(p, cfg, z, timestep=0.05, noise_key=None)
        )
        np.testing.assert_allclose(
            np.asarray(fn(params, latent)), np.asarray(fn(loaded, latent)), atol=1e-6
        )

    def test_missing_required_keys_fail_at_load_time(self, tmp_path):
        """A checkpoint whose stored up_blocks disagree with the derived
        plan (e.g. wrong decoder_blocks metadata) must fail loudly at load
        time with the missing key names — not materialize None leaves that
        crash as NoneType inside the jitted decoder."""
        from ltx2_tpu.loader.safetensors_io import write_safetensors
        from ltx2_tpu.models.video_vae.weights import load_video_decoder_params

        path = str(tmp_path / "incomplete.safetensors")
        write_safetensors(
            path,
            {
                "vae.decoder.conv_in.conv.weight": np.zeros((4, 8, 1, 1, 1), np.float32),
                "vae.decoder.conv_in.conv.bias": np.zeros((4,), np.float32),
            },
        )
        with pytest.raises(ValueError, match=r"missing .*conv_out"):
            load_video_decoder_params(path, TINY_DECODER)

    def test_config_from_metadata(self, tmp_path):
        import json

        from ltx2_tpu.loader.safetensors_io import write_safetensors
        from ltx2_tpu.models.video_vae.weights import decoder_config_from_checkpoint

        blocks = [
            ["res_x", {"num_layers": 3}],
            ["compress_all", {"multiplier": 2, "residual": True}],
            ["res_x", {"num_layers": 3}],
        ]
        path = str(tmp_path / "m.safetensors")
        write_safetensors(
            path,
            {"x": np.zeros(2, np.float32)},
            metadata={"config": json.dumps({"vae": {"decoder_blocks": blocks}})},
        )
        cfg = decoder_config_from_checkpoint(path)
        assert cfg.decoder_blocks == (
            ("res_x", 3),
            ("compress_all", 2, True),
            ("res_x", 3),
        )


class TestFullVAEBlocks:
    """Non-'simple' VAE path building blocks (resnet.py equivalents)."""

    def test_resnet_block_pixel_norm(self):
        from ltx2_tpu.models.video_vae.resnet import (
            ResnetBlock3DConfig,
            init_resnet_block_3d,
            resnet_block_3d_apply,
        )

        cfg = ResnetBlock3DConfig(in_channels=8, groups=4)
        params = jax.jit(lambda k: init_resnet_block_3d(k, cfg))(jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 4, 4, 8))
        out = jax.jit(lambda p, x: resnet_block_3d_apply(p, cfg, x))(params, x)
        assert out.shape == x.shape
        assert bool(jnp.all(jnp.isfinite(out)))

    def test_resnet_block_channel_change_and_timestep(self):
        from ltx2_tpu.models.video_vae.resnet import (
            NormLayerType,
            ResnetBlock3DConfig,
            init_resnet_block_3d,
            resnet_block_3d_apply,
        )

        # Channel change (shortcut projection), no conditioning:
        cfg = ResnetBlock3DConfig(
            in_channels=8, out_channels=16, groups=4,
            norm_layer=NormLayerType.GROUP_NORM,
        )
        params = jax.jit(lambda k: init_resnet_block_3d(k, cfg))(jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 4, 4, 8))
        out = jax.jit(lambda p, x: resnet_block_3d_apply(p, cfg, x))(params, x)
        assert out.shape == (1, 2, 4, 4, 16)

        # Timestep conditioning (in == out, as used by the decoder):
        cfg_t = ResnetBlock3DConfig(
            in_channels=8, groups=4, timestep_conditioning=True,
        )
        params_t = jax.jit(lambda k: init_resnet_block_3d(k, cfg_t))(jax.random.PRNGKey(3))
        t = jax.random.normal(jax.random.PRNGKey(2), (1, 4 * 8))
        out_t = jax.jit(lambda p, x, t: resnet_block_3d_apply(p, cfg_t, x, timestep=t))(
            params_t, x, t
        )
        assert out_t.shape == x.shape

    def test_dual_conv3d_separable(self):
        from ltx2_tpu.models.video_vae.resnet import dual_conv3d

        rng = np.random.default_rng(0)
        p = {
            "conv1": {
                "weight": jnp.asarray(rng.normal(size=(6, 4, 3, 3)).astype(np.float32) * 0.1),
                "bias": jnp.zeros((6,)),
            },
            "conv2": {
                "weight": jnp.asarray(rng.normal(size=(5, 6, 3)).astype(np.float32) * 0.1),
                "bias": jnp.zeros((5,)),
            },
        }
        x = jnp.asarray(rng.normal(size=(1, 4, 6, 6, 4)).astype(np.float32))
        out = jax.jit(lambda p, x: dual_conv3d(p, x))(p, x)
        assert out.shape == (1, 4, 6, 6, 5)

    def test_unet_mid_block(self):
        from ltx2_tpu.models.video_vae.resnet import (
            UNetMidBlock3DConfig,
            init_unet_mid_block_3d,
            unet_mid_block_3d_apply,
        )

        cfg = UNetMidBlock3DConfig(in_channels=8, num_layers=2, resnet_groups=4)
        params = jax.jit(lambda k: init_unet_mid_block_3d(k, cfg))(jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 4, 4, 8))
        out = jax.jit(lambda p, x: unet_mid_block_3d_apply(p, cfg, x))(params, x)
        assert out.shape == x.shape


class TestFullVAE:
    """Config-driven non-simple VideoEncoder/VideoDecoder assembly
    (reference encoder.py:135 / decoder.py:89), tiny configs."""

    def _enc_cfg(self):
        from ltx2_tpu.models.video_vae import FullVideoEncoderConfig

        return FullVideoEncoderConfig(
            out_channels=8,
            patch_size=2,
            blocks=(
                ("res_x", 1),
                ("compress_space_res", {"multiplier": 2}),
                ("res_x", 1),
                ("compress_all_res", {"multiplier": 2}),
            ),
        )

    def _dec_cfg(self, **kw):
        from ltx2_tpu.models.video_vae import FullVideoDecoderConfig

        return FullVideoDecoderConfig(
            in_channels=8,
            patch_size=2,
            blocks=(
                ("res_x", {"num_layers": 1}),
                ("compress_all", {"residual": True, "multiplier": 2}),
                ("res_x", {"num_layers": 1}),
            ),
            **kw,
        )

    def test_encoder_shapes(self):
        from ltx2_tpu.models.video_vae import (
            full_video_encoder_apply,
            init_full_video_encoder,
        )

        cfg = self._enc_cfg()
        params = jax.jit(lambda k: init_full_video_encoder(k, cfg))(jax.random.PRNGKey(0))
        video = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 9, 16, 16))
        fn = jax.jit(lambda p, v: full_video_encoder_apply(p, cfg, v))
        latent = fn(params, video)
        # patchify /2, compress_space /2, compress_all /2 -> H/8;
        # temporal: one compress_all -> (9 + 1 front-replicate) / 2 = 5
        assert latent.shape == (1, 8, 5, 2, 2)
        assert bool(jnp.all(jnp.isfinite(latent)))

    def test_encoder_rejects_bad_frames(self):
        from ltx2_tpu.models.video_vae import (
            full_video_encoder_apply,
            init_full_video_encoder,
        )

        cfg = self._enc_cfg()
        params = init_full_video_encoder(jax.random.PRNGKey(0), cfg)
        with pytest.raises(ValueError, match="8\\*k"):
            full_video_encoder_apply(params, cfg, jnp.zeros((1, 3, 8, 16, 16)))

    def test_decoder_shapes(self):
        from ltx2_tpu.models.video_vae import (
            full_video_decoder_apply,
            init_full_video_decoder,
        )

        cfg = self._dec_cfg()
        params = jax.jit(lambda k: init_full_video_decoder(k, cfg))(jax.random.PRNGKey(0))
        latent = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 3, 4, 4))
        fn = jax.jit(lambda p, z: full_video_decoder_apply(p, cfg, z))
        video = fn(params, latent)
        # compress_all x2 both axes (T trims first frame: 3*2-1=5), patchify 2
        assert video.shape == (1, 3, 5, 16, 16)
        assert bool(jnp.all(jnp.isfinite(video)))

    def test_decoder_channel_walk_matches_reference(self):
        """initial_channels multiplies back through reversed blocks
        (decoder.py:156-166)."""
        cfg = self._dec_cfg()
        # compress_all multiplier=2 -> conv_in out = 8 * 2 = 16
        assert cfg.initial_channels == 16
        names = [n for n, _, _, _ in cfg.plan]
        assert names == ["res_x", "compress_all", "res_x"]  # reversed order
        assert cfg.final_channels == 8

    def test_decoder_timestep_conditioning(self):
        from ltx2_tpu.models.video_vae import (
            full_video_decoder_apply,
            init_full_video_decoder,
        )

        cfg = self._dec_cfg(timestep_conditioning=True)
        params = init_full_video_decoder(jax.random.PRNGKey(0), cfg)
        latent = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 3, 4, 4))
        # per-plan-block (B, 4*C) embeddings for res_x blocks
        ts = []
        for name, _, in_ch, _ in cfg.plan:
            ts.append(
                jax.random.normal(jax.random.PRNGKey(2), (2, 4 * in_ch)) * 0.1
                if name == "res_x" else None
            )
        last = jax.random.normal(jax.random.PRNGKey(3), (2, 2 * cfg.final_channels)) * 0.1
        out = full_video_decoder_apply(
            params, cfg, latent,
            timestep_embeddings=ts,
            last_timestep_embedding=last,
            noise_key=jax.random.PRNGKey(4),
        )
        assert out.shape == (2, 3, 5, 16, 16)
        # conditioning must bind: different embedding -> different output
        out2 = full_video_decoder_apply(
            params, cfg, latent,
            timestep_embeddings=[t * 2 if t is not None else None for t in ts],
            last_timestep_embedding=last,
            noise_key=jax.random.PRNGKey(4),
        )
        assert not np.allclose(np.asarray(out), np.asarray(out2))

    def test_strided_conv3d_matches_torch(self):
        """The new stride path in conv3d_ndhwc vs F.conv3d (compress_* blocks)."""
        import torch
        import torch.nn.functional as F

        from ltx2_tpu.models.video_vae.conv import conv3d_ndhwc, from_ndhwc, to_ndhwc

        for stride in [(2, 1, 1), (1, 2, 2), (2, 2, 2)]:
            x = torch.randn(1, 4, 7, 8, 8)
            w = torch.randn(6, 4, 3, 3, 3) * 0.2
            b = torch.randn(6) * 0.1
            # causal replicate temporal + zeros spatial, then strided conv
            xp = F.pad(x, (1, 1, 1, 1, 0, 0))
            xp = F.pad(xp, (0, 0, 0, 0, 2, 0), mode="replicate")
            want = F.conv3d(xp, w, b, stride=stride)
            got = from_ndhwc(
                conv3d_ndhwc(
                    {"weight": jnp.asarray(w.numpy()), "bias": jnp.asarray(b.numpy())},
                    to_ndhwc(jnp.asarray(x.numpy())),
                    causal=True, spatial_mode="zeros", stride=stride,
                )
            )
            np.testing.assert_allclose(
                np.asarray(got), want.numpy(), rtol=1e-4, atol=1e-5,
                err_msg=f"strided conv3d {stride}",
            )


class TestNoiseInjectionKeys:
    """Injected decoder noise must be independent per injection site (the
    reference's default path draws fresh noise at every site); the encoder
    is unconditionally causal like the reference's."""

    def test_mid_block_splits_keys_per_block(self, monkeypatch):
        import ltx2_tpu.models.video_vae.resnet as rn

        seen = []
        orig = rn.resnet_block_3d_apply

        def spy(p, cfg, x, causal=True, timestep=None, key=None):
            seen.append(None if key is None else np.asarray(key))
            return orig(p, cfg, x, causal, timestep, key)

        monkeypatch.setattr(rn, "resnet_block_3d_apply", spy)
        cfg = rn.UNetMidBlock3DConfig(
            in_channels=8, num_layers=2, inject_noise=True,
            norm_layer=rn.NormLayerType.PIXEL_NORM,
        )
        from ltx2_tpu.models.video_vae.resnet import init_resnet_block_3d

        block = init_resnet_block_3d(
            jax.random.PRNGKey(0), cfg.block_config()
        )
        params = {"res_blocks": [block, block]}
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 4, 4, 8))
        rn.unet_mid_block_3d_apply(params, cfg, x, key=jax.random.PRNGKey(2))
        assert len(seen) == 2
        assert seen[0] is not None and seen[1] is not None
        assert not np.array_equal(seen[0], seen[1]), (
            "blocks received the SAME key: injected noise would be "
            "bit-identical across blocks"
        )

    def test_decoder_res_x_y_inject_noise_uses_key(self):
        """A res_x_y block with inject_noise must actually draw noise
        (previously the decoder never passed it a key, silently disabling
        injection)."""
        from ltx2_tpu.models.video_vae import (
            FullVideoDecoderConfig,
            full_video_decoder_apply,
            init_full_video_decoder,
        )

        cfg = FullVideoDecoderConfig(
            in_channels=8, patch_size=2,
            blocks=(("res_x_y", {"inject_noise": True}),),
        )
        params = jax.jit(lambda k: init_full_video_decoder(k, cfg))(
            jax.random.PRNGKey(0)
        )
        # Noise scales init at zero would null the injection — randomize.
        def bump(node):
            if isinstance(node, list):
                for item in node:
                    bump(item)
                return
            if not isinstance(node, dict):
                return
            for k, v in node.items():
                if isinstance(v, (dict, list)):
                    bump(v)
                elif "per_channel_scale" in k:
                    node[k] = jnp.ones_like(v) * 0.5
        bump(params)
        latent = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 3, 4, 4))
        fn = jax.jit(
            lambda p, z, k: full_video_decoder_apply(p, cfg, z, noise_key=k)
        )
        a = np.asarray(fn(params, latent, jax.random.PRNGKey(5)))
        b = np.asarray(fn(params, latent, jax.random.PRNGKey(5)))
        c = np.asarray(fn(params, latent, jax.random.PRNGKey(6)))
        np.testing.assert_array_equal(a, b)  # deterministic per key
        assert not np.array_equal(a, c), (
            "res_x_y inject_noise ignored the noise key"
        )

    def test_encoder_rejects_non_causal(self):
        from ltx2_tpu.models.video_vae import (
            FullVideoEncoderConfig,
            full_video_encoder_apply,
            init_full_video_encoder,
        )

        cfg = FullVideoEncoderConfig(
            patch_size=2, blocks=(("res_x", {"num_layers": 1}),),
        )
        params = init_full_video_encoder(jax.random.PRNGKey(0), cfg)
        with pytest.raises(ValueError, match="always causal"):
            full_video_encoder_apply(
                params, cfg, jnp.zeros((1, 3, 9, 8, 8)), causal=False
            )
