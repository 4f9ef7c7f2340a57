"""Torch-oracle parity for the COMPOSED video VAE decoder and encoder.

The conv3d padding kernel and patchify packing already have oracles
(test_torch_oracle.py); this file asserts the full composed chains —
res blocks (pixel-norm + scale/shift + timestep conditioning),
depth-to-space upsampling with residual tiling and the causal first-frame
trim, the final timestep-conditioned norm, unpatchify — against an
independent torch implementation of the reference semantics
(LTX_2_MLX/model/video_vae/simple_decoder.py / simple_encoder.py, cited
per function). SURVEY.md hard part #2 at the composition level.
"""

import math

import einops
import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from tests.test_torch_oracle import assert_close, t2j, torch_conv3d_oracle
from tests.test_torch_oracle_model import lin, tree_to_torch

torch.manual_seed(0)


def randomize(params, seed=11, scale=0.1):
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(seed), len(leaves))
    leaves = [
        leaf + scale * jax.random.normal(k, leaf.shape, leaf.dtype)
        for leaf, k in zip(leaves, keys)
    ]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def torch_pixel_norm(x, eps=1e-6):
    # simple_decoder.py:339-342: normalize across the channel dim (axis 1)
    return x * torch.rsqrt((x * x).mean(dim=1, keepdim=True) + eps)


def torch_vae_timestep_embedding(t, dim=256):
    """simple_decoder.py:12-39: concat(COS, SIN) — opposite order from the
    DiT's DDPM embedding."""
    half = dim // 2
    freqs = torch.exp(-math.log(10000.0) * torch.arange(half, dtype=torch.float32) / half)
    args = t.float()[:, None] * freqs[None, :]
    return torch.cat([args.cos(), args.sin()], dim=-1)


def torch_time_embedder(p, t_emb):
    # TimestepEmbedder: linear -> silu -> linear (simple_decoder.py:42-59)
    return lin(p["linear_2"], F.silu(lin(p["linear_1"], t_emb)))


def conv3d(p, x, causal, spatial_mode="reflect"):
    return torch_conv3d_oracle(
        x, p["weight"], p["bias"], causal, spatial_mode, "replicate"
    )


def torch_res_block(p, x, causal, time_emb, channels):
    """ResBlock3d (simple_decoder.py:183-240). x: (B, C, T, H, W)."""
    residual = x
    table = p["scale_shift_table"]
    if time_emb is not None:
        ss = table[None] + time_emb.reshape(-1, 4, channels)
        vals = [ss[:, i][:, :, None, None, None] for i in range(4)]
    else:
        vals = [table[i][None, :, None, None, None] for i in range(4)]
    shift1, scale1, shift2, scale2 = vals[0], 1 + vals[1], vals[2], 1 + vals[3]
    h = F.silu(torch_pixel_norm(x) * scale1 + shift1)
    h = conv3d(p["conv1"], h, causal)
    h = F.silu(torch_pixel_norm(h) * scale2 + shift2)
    h = conv3d(p["conv2"], h, causal)
    return h + residual


def torch_d2s(x, c_out, stride):
    """Depth-to-space, packing order (c_out, ft, fh, fw)
    (simple_decoder.py:274-285)."""
    b, c, t, h, w = x.shape
    ft, fh, fw = stride
    x = x.reshape(b, c_out, ft, fh, fw, t, h, w)
    x = x.permute(0, 1, 5, 2, 6, 3, 7, 4)
    return x.reshape(b, c_out, t * ft, h * fh, w * fw)


def torch_upsample_block(p, x, causal, stride, multiplier, residual, in_ch):
    """DepthToSpaceUpsample3d (simple_decoder.py:243-313)."""
    ft = stride[0]
    sp = math.prod(stride)
    if residual:
        res = torch_d2s(x, x.shape[1] // sp, stride)
        if ft > 1:
            res = res[:, :, 1:]
        res = res.repeat(1, sp // multiplier, 1, 1, 1)
    x = conv3d(p["conv"], x, causal)
    x = torch_d2s(x, in_ch * sp // multiplier // sp, stride)
    if ft > 1:
        x = x[:, :, 1:]
    if residual:
        x = x + res
    return x


def torch_video_decoder(tp, cfg, latent, timestep, causal):
    """SimpleVideoDecoder forward (simple_decoder.py:446-563), noise OFF."""
    b = latent.shape[0]
    x = latent
    stats = tp["per_channel_statistics"]
    x = x * stats["std_of_means"].reshape(1, -1, 1, 1, 1)
    x = x + stats["mean_of_means"].reshape(1, -1, 1, 1, 1)

    scaled_t = None
    if timestep is not None:
        scaled_t = torch.full((b,), timestep) * tp["timestep_scale_multiplier"]

    x = conv3d(tp["conv_in"], x, causal)
    for bp, (kind, spec, channels) in zip(tp["up_blocks"], cfg.plan()):
        if kind == "res":
            time_emb = None
            if scaled_t is not None and "time_embedder" in bp:
                time_emb = torch_time_embedder(
                    bp["time_embedder"], torch_vae_timestep_embedding(scaled_t)
                )
            for rb in bp["res_blocks"]:
                x = torch_res_block(rb, x, causal, time_emb, channels)
        else:
            stride, multiplier, residual = spec
            x = torch_upsample_block(bp, x, causal, stride, multiplier, residual, channels)

    x = torch_pixel_norm(x)
    table = tp["last_scale_shift_table"]
    if scaled_t is not None and "last_time_embedder" in tp:
        emb = torch_time_embedder(
            tp["last_time_embedder"], torch_vae_timestep_embedding(scaled_t)
        ).reshape(b, 2, cfg.final_channels)
        ss = table[None] + emb
        shift = ss[:, 0][:, :, None, None, None]
        scale = 1 + ss[:, 1][:, :, None, None, None]
    else:
        shift = table[0][None, :, None, None, None]
        scale = 1 + table[1][None, :, None, None, None]
    x = F.silu(x * scale + shift)
    x = conv3d(tp["conv_out"], x, causal)
    # unpatchify via the reference's cited einops string (ops.py:108-126)
    return einops.rearrange(
        x, "b (c p r q) f h w -> b c (f p) (h q) (w r)",
        p=1, r=cfg.patch_size, q=cfg.patch_size,
    )


class TestVideoDecoderOracle:
    def _cfg(self, **kw):
        from ltx2_tpu.models.video_vae.decoder import VideoDecoderConfig

        defaults = dict(
            decoder_blocks=(
                ("res_x", 1),
                ("compress_space", 2, False),
                ("res_x", 1),
                ("compress_time", 2, True),
                ("res_x", 2),
                ("compress_all", 2, True),
                ("res_x", 1),
            ),
            base_channels=4,  # feature root 32
            latent_channels=6,
            patch_size=2,
        )
        defaults.update(kw)
        return VideoDecoderConfig(**defaults)

    def _run(self, causal, timestep=0.05, **cfg_kw):
        from ltx2_tpu.models.video_vae.decoder import (
            init_video_decoder,
            video_decoder_apply,
        )

        cfg = self._cfg(**cfg_kw)
        params = randomize(init_video_decoder(jax.random.PRNGKey(1), cfg))
        g = torch.Generator().manual_seed(2)
        latent = torch.randn(1, cfg.latent_channels, 3, 4, 5, generator=g)

        got = video_decoder_apply(
            params, cfg, t2j(latent), timestep=timestep, noise_key=None, causal=causal
        )
        tp = tree_to_torch(params)
        want = torch_video_decoder(tp, cfg, latent, timestep, causal)
        assert_close(got, want, rtol=1e-3, atol=1e-3,
                     msg=f"decoder chain causal={causal} t={timestep}")
        return np.asarray(got)

    def test_full_chain_noncausal(self):
        """Default pipeline configuration: non-causal symmetric padding,
        timestep-conditioned tables, all three d2s stride types, residual
        tiling + first-frame trim."""
        out = self._run(causal=False)
        # Frames: compress_all 3->5, compress_time 5->9 (first-frame trims).
        # Spatial: compress_all + compress_space x2 each: 4x5 -> 16x20;
        # unpatchify x2 -> (1, 3, 9, 32, 40).
        assert out.shape == (1, 3, 9, 32, 40)

    def test_full_chain_causal(self):
        self._run(causal=True)

    def test_no_timestep_conditioning(self):
        """timestep=None path: raw tables, no embedder contributions."""
        self._run(causal=False, timestep=None)


def torch_s2d(x, stride):
    """Space-to-depth for the encoder downsample (simple_encoder.py),
    inverse packing of torch_d2s."""
    b, c, t, h, w = x.shape
    ft, fh, fw = stride
    x = x.reshape(b, c, t // ft, ft, h // fh, fh, w // fw, fw)
    x = x.permute(0, 1, 3, 5, 7, 2, 4, 6)
    return x.reshape(b, c * ft * fh * fw, t // ft, h // fh, w // fw)


class TestVideoEncoderOracle:
    def test_patchify_matches_einops(self):
        """Encoder-side patchify vs the reference's cited einops string
        (ops.py:47-58): "b c (f p) (h q) (w r) -> b (c p r q) f h w"."""
        from ltx2_tpu.models.video_vae.ops import patchify

        g = torch.Generator().manual_seed(3)
        x = torch.randn(2, 3, 4, 8, 8, generator=g)
        got = patchify(t2j(x), patch_size_hw=4, patch_size_t=1)
        want = einops.rearrange(
            x, "b c (f p) (h q) (w r) -> b (c p r q) f h w", p=1, r=4, q=4
        )
        assert_close(got, want, msg="patchify einops")


def torch_enc_res_block(p, x, causal):
    """EncoderResBlock3d (simple_encoder.py:121-157): no conditioning,
    zeros spatial padding."""
    residual = x
    h = conv3d(p["conv1"], F.silu(torch_pixel_norm(x)), causal, "zeros")
    h = conv3d(p["conv2"], F.silu(torch_pixel_norm(h)), causal, "zeros")
    return h + residual


def torch_enc_down_block(p, x, causal, out_channels, stride):
    """SpaceToDepthDownsample3d (simple_encoder.py:175-255): first-frame
    duplicate at temporal stride 2; group-mean residual; conv -> s2d."""
    if stride[0] == 2:
        x = torch.cat([x[:, :, :1], x], dim=2)
    sp = math.prod(stride)
    group_size = (x.shape[1] * sp) // out_channels
    res = torch_s2d(x, stride)
    b, _, t, h, w = res.shape
    res = res.reshape(b, out_channels, group_size, t, h, w).mean(dim=2)
    x = conv3d(p["conv"], x, causal, "zeros")
    return torch_s2d(x, stride) + res


def torch_video_encoder(tp, cfg, video, causal=True):
    """SimpleVideoEncoder forward (simple_encoder.py:300-404)."""
    x = einops.rearrange(
        video, "b c (f p) (h q) (w r) -> b (c p r q) f h w",
        p=1, r=cfg.patch_size, q=cfg.patch_size,
    )
    x = conv3d(tp["conv_in"], x, causal, "zeros")
    for bp, (kind, c_in, arg, stride) in zip(tp["down_blocks"], cfg.plan):
        if kind == "res":
            for rb in bp["res_blocks"]:
                x = torch_enc_res_block(rb, x, causal)
        else:
            x = torch_enc_down_block(bp, x, causal, arg, stride)
    x = F.silu(torch_pixel_norm(x))
    x = conv3d(tp["conv_out"], x, causal, "zeros")
    means = x[:, : cfg.latent_channels]
    stats = tp["per_channel_statistics"]
    return (means - stats["mean_of_means"].reshape(1, -1, 1, 1, 1)) / stats[
        "std_of_means"
    ].reshape(1, -1, 1, 1, 1)


class TestVideoEncoderChainOracle:
    def test_full_chain(self):
        """Composed encoder: patchify -> conv_in -> res groups + all three
        s2d stride types (first-frame duplicate, group-mean residual) ->
        final norm -> conv_out -> normalize."""
        from ltx2_tpu.models.video_vae.encoder import (
            VideoEncoderConfig,
            init_video_encoder,
            video_encoder_apply,
        )

        plan = (
            ("res", 8, 1, None),
            ("down", 8, 16, (1, 2, 2)),
            ("res", 16, 1, None),
            ("down", 16, 32, (2, 1, 1)),
            ("down", 32, 32, (2, 2, 2)),
            ("res", 32, 1, None),
        )
        cfg = VideoEncoderConfig(patch_size=2, latent_channels=12, plan=plan)
        params = randomize(init_video_encoder(jax.random.PRNGKey(4), cfg), seed=12)
        # randomize() perturbs the stats too; restore unit normalization
        # semantics deliberately broken: keep the perturbed stats — they
        # exercise the normalize path.
        g = torch.Generator().manual_seed(6)
        video = torch.randn(1, 3, 9, 16, 24, generator=g)

        got = video_encoder_apply(params, cfg, t2j(video), causal=True)
        tp = tree_to_torch(params)
        want = torch_video_encoder(tp, cfg, video, causal=True)
        assert_close(got, want, rtol=1e-3, atol=1e-3, msg="encoder chain")
        # Frames: 9 -> +1=10 /2=5 -> +1=6 /2=3 (first-frame duplicates);
        # spatial: 16x24 -> patchify /2 -> /2 /2 = 2x3.
        assert np.asarray(got).shape == (1, 12, 3, 2, 3)
