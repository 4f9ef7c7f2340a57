"""Torch-oracle parity for the full (non-"simple") VideoEncoder/VideoDecoder.

The reference's secondary VAE path (LTX_2_MLX/model/video_vae/encoder.py:135,
decoder.py:89) assembles ResnetBlock3D / UNetMidBlock3D / DualConv3d /
strided causal convs / residual (de)sampling blocks from a checkpoint block
list. Independent torch implementations of those reference semantics
(resnet.py:38-321, convolution.py:60-205, cited per function) assert the
composed JAX chains on random weights — completing oracle coverage of
every model family in the framework.
"""

import math

import einops
import jax
import numpy as np
import torch
import torch.nn.functional as F

from tests.test_torch_oracle import assert_close, t2j, torch_conv3d_oracle
from tests.test_torch_oracle_model import lin, tree_to_torch
from tests.test_torch_oracle_vae import (
    randomize,
    torch_d2s,
    torch_s2d,
    torch_upsample_block,
)

torch.manual_seed(0)


def conv3d(p, x, causal, spatial_mode):
    return torch_conv3d_oracle(
        x, p["weight"], p["bias"], causal, spatial_mode, "replicate"
    )


def torch_strided_causal_conv3d(p, x, stride, spatial_mode):
    """Strided causal conv (reference encoder.py:61-101): causal temporal
    replicate-pad, spatial pad k//2, then strided VALID conv."""
    k = p["weight"].shape[2]
    pad = k // 2
    mode = "reflect" if spatial_mode == "reflect" else "constant"
    x = F.pad(x, (pad, pad, pad, pad, 0, 0), mode=mode)
    x = F.pad(x, (0, 0, 0, 0, k - 1, 0), mode="replicate")
    return F.conv3d(x, p["weight"], p["bias"], stride=stride)


def torch_pixel_norm8(x, eps=1e-8):
    # resnet.py PixelNorm: dim=1, eps=1e-8
    return x / torch.sqrt((x * x).mean(dim=1, keepdim=True) + eps)


def torch_dual_conv3d(p, x):
    """DualConv3d (convolution.py:60-205): 2D spatial conv then 1D temporal,
    symmetric zero padding k//2 each."""
    b, c, t, h, w = x.shape
    w1 = p["conv1"]["weight"]
    x2 = x.permute(0, 2, 1, 3, 4).reshape(b * t, c, h, w)
    out = F.conv2d(x2, w1, p["conv1"]["bias"], padding=w1.shape[2] // 2)
    mid = out.shape[1]
    out = out.reshape(b, t, mid, h, w)
    w2 = p["conv2"]["weight"]
    xt = out.permute(0, 3, 4, 2, 1).reshape(b * h * w, mid, t)
    out_t = F.conv1d(xt, w2, p["conv2"]["bias"], padding=w2.shape[2] // 2)
    oc = out_t.shape[1]
    return out_t.reshape(b, h, w, oc, t).permute(0, 3, 4, 1, 2)


def torch_resnet3d(p, x, causal, spatial_mode, norm, dual=False, timestep=None):
    """ResnetBlock3D (resnet.py:38-237), noise injection off."""

    def apply_norm(name, h):
        if norm == "pixel":
            return torch_pixel_norm8(h)
        np_ = p[name]
        return F.group_norm(h, 32 if h.shape[1] % 32 == 0 else 2,
                            np_["weight"], np_["bias"], eps=1e-6)

    def apply_conv(name, h):
        if dual:
            return torch_dual_conv3d(p[name], h)
        return conv3d(p[name], h, causal, spatial_mode)

    h = apply_norm("norm1", x)
    if timestep is not None:
        b = x.shape[0]
        ada = p["scale_shift_table"][None] + timestep.reshape(b, 4, -1)
        sh1, sc1, sh2, sc2 = (ada[:, i][:, :, None, None, None] for i in range(4))
        h = h * (1 + sc1) + sh1
    h = apply_conv("conv1", F.silu(h))
    h = apply_norm("norm2", h)
    if timestep is not None:
        h = h * (1 + sc2) + sh2
    h = apply_conv("conv2", F.silu(h))
    shortcut = x
    if "norm3" in p:
        # Shortcut norm: ALWAYS GroupNorm(num_groups=1) with affine params
        # whenever channels change (reference resnet.py:121-128, 231-235),
        # regardless of the block's norm_layer.
        shortcut = F.group_norm(
            shortcut, 1, p["norm3"]["weight"], p["norm3"]["bias"], eps=1e-6
        )
    if "conv_shortcut" in p:
        # pointwise linear over channels (make_linear_nd)
        shortcut = lin(p["conv_shortcut"], shortcut.permute(0, 2, 3, 4, 1)).permute(
            0, 4, 1, 2, 3
        )
    return shortcut + h


def torch_enc_res_down(p, x, causal, out_channels, stride):
    """Residual SpaceToDepthDownsample (sampling.py:73-149) — same math as
    the simple encoder's down block."""
    if stride[0] == 2:
        x = torch.cat([x[:, :, :1], x], dim=2)
    sp = math.prod(stride)
    group = (x.shape[1] * sp) // out_channels
    res = torch_s2d(x, stride)
    b, _, t, h, w = res.shape
    res = res.reshape(b, out_channels, group, t, h, w).mean(dim=2)
    x = conv3d(p["conv"], x, causal, "zeros")
    return torch_s2d(x, stride) + res


class TestFullEncoderOracle:
    def test_full_chain_pixel_norm(self):
        """res_x groups (UNetMidBlock3D) + res_x_y channel change with
        pointwise shortcut + strided causal conv + residual s2d + log-var
        trim + normalize."""
        from ltx2_tpu.models.video_vae.full_vae import (
            FullVideoEncoderConfig,
            full_video_encoder_apply,
            init_full_video_encoder,
        )

        blocks = (
            ("res_x", 1),
            ("compress_space", {}),       # strided causal conv, no residual
            ("res_x_y", {"multiplier": 2}),
            ("compress_all_res", {"multiplier": 2}),
            ("res_x", 1),
        )
        cfg = FullVideoEncoderConfig(
            out_channels=8, patch_size=2, blocks=blocks, latent_log_var="uniform"
        )
        params = randomize(init_full_video_encoder(jax.random.PRNGKey(0), cfg), seed=60)
        g = torch.Generator().manual_seed(61)
        video = torch.randn(1, 3, 9, 16, 16, generator=g)

        got = full_video_encoder_apply(params, cfg, t2j(video), causal=True)

        tp = tree_to_torch(params)
        x = einops.rearrange(
            video, "b c (f p) (h q) (w r) -> b (c p r q) f h w", p=1, r=2, q=2
        )
        x = conv3d(tp["conv_in"], x, True, "zeros")
        plan = cfg.plan
        for bp, (name, bcfg, in_ch, out_ch) in zip(tp["down_blocks"], plan):
            if name == "res_x":
                for rb in bp["res_blocks"]:
                    x = torch_resnet3d(rb, x, True, "zeros", "pixel")
            elif name == "res_x_y":
                x = torch_resnet3d(bp, x, True, "zeros", "pixel")
            elif name in ("compress_time", "compress_space", "compress_all"):
                from ltx2_tpu.models.video_vae.full_vae import _COMPRESS_STRIDES

                x = torch_strided_causal_conv3d(bp, x, _COMPRESS_STRIDES[name], "zeros")
            else:
                from ltx2_tpu.models.video_vae.full_vae import _COMPRESS_STRIDES

                x = torch_enc_res_down(bp, x, True, out_ch, _COMPRESS_STRIDES[name])
        x = conv3d(tp["conv_out"], F.silu(torch_pixel_norm8(x)), True, "zeros")
        means = x[:, : cfg.out_channels]
        stats = tp["per_channel_statistics"]
        want = (means - stats["mean_of_means"].reshape(1, -1, 1, 1, 1)) / stats[
            "std_of_means"
        ].reshape(1, -1, 1, 1, 1)
        assert_close(got, want, rtol=1e-3, atol=1e-3, msg="full encoder chain")


class TestFullDecoderOracle:
    def test_full_chain_with_timestep_conditioning(self):
        """UNetMidBlock3D res groups with external pre-embedded timesteps +
        residual d2s upsampling + last scale/shift table + unpatchify."""
        from ltx2_tpu.models.video_vae.full_vae import (
            _COMPRESS_STRIDES,
            FullVideoDecoderConfig,
            full_video_decoder_apply,
            init_full_video_decoder,
        )

        blocks = (
            ("res_x", {"num_layers": 1}),
            ("compress_all", {"residual": True, "multiplier": 2}),
            ("res_x", {"num_layers": 2}),
        )
        # in_channels=8 -> 16 at the compress_all block, divisible by the
        # stride product 8 (the residual d2s path requires it, as in the
        # real 1024-channel model).
        cfg = FullVideoDecoderConfig(
            in_channels=8, patch_size=2, blocks=blocks,
            timestep_conditioning=True, causal=False,
        )
        params = randomize(init_full_video_decoder(jax.random.PRNGKey(1), cfg), seed=62)
        g = torch.Generator().manual_seed(63)
        latent = torch.randn(1, 8, 3, 4, 5, generator=g)
        plan = cfg.plan
        # External pre-embedded timesteps (resnet.py:276-277): (B, 4*C) per
        # res_x block + (B, 2*C_final) for the last table.
        t_embs = [
            torch.randn(1, 4 * in_ch, generator=g) if name == "res_x" else None
            for (name, _, in_ch, _) in plan
        ]
        last_emb = torch.randn(1, 2 * cfg.final_channels, generator=g)

        got = full_video_decoder_apply(
            params, cfg, t2j(latent),
            timestep_embeddings=[None if t is None else t2j(t) for t in t_embs],
            last_timestep_embedding=t2j(last_emb),
            noise_key=None,
        )

        tp = tree_to_torch(params)
        stats = tp["per_channel_statistics"]
        x = latent * stats["std_of_means"].reshape(1, -1, 1, 1, 1)
        x = x + stats["mean_of_means"].reshape(1, -1, 1, 1, 1)
        # conv_in/conv_out follow cfg.causal like every block (reference
        # decoder.py:247,279 uses self.causal uniformly).
        x = conv3d(tp["conv_in"], x, cfg.causal, "reflect")
        for bp, (name, bcfg, in_ch, out_ch), t_emb in zip(tp["up_blocks"], plan, t_embs):
            if name == "res_x":
                for rb in bp["res_blocks"]:
                    x = torch_resnet3d(
                        rb, x, cfg.causal, "reflect", "pixel", timestep=t_emb
                    )
            else:
                x = torch_upsample_block(
                    bp, x, cfg.causal, _COMPRESS_STRIDES[name],
                    bcfg.get("multiplier", 1), bcfg.get("residual", False), in_ch,
                )
        x = torch_pixel_norm8(x)
        ada = tp["last_scale_shift_table"][None] + last_emb.reshape(
            1, 2, cfg.final_channels
        )
        shift = ada[:, 0][:, :, None, None, None]
        scale = ada[:, 1][:, :, None, None, None]
        x = F.silu(x * (1 + scale) + shift)
        x = conv3d(tp["conv_out"], x, cfg.causal, "reflect")
        want = einops.rearrange(
            x, "b (c p r q) f h w -> b c (f p) (h q) (w r)", p=1, r=2, q=2
        )
        assert_close(got, want, rtol=1e-3, atol=1e-3, msg="full decoder chain")


class TestDualConvOracle:
    def test_resnet_block_dual_dims(self):
        """dims=(2,1) separable DualConv3d path inside ResnetBlock3D."""
        from ltx2_tpu.models.video_vae.resnet import (
            ResnetBlock3DConfig,
            init_resnet_block_3d,
            resnet_block_3d_apply,
        )

        cfg = ResnetBlock3DConfig(dims=(2, 1), in_channels=6, out_channels=10)
        params = randomize(init_resnet_block_3d(jax.random.PRNGKey(2), cfg), seed=64)
        g = torch.Generator().manual_seed(65)
        x = torch.randn(1, 6, 4, 5, 6, generator=g)

        # DualConv3d supports only the non-causal zero-padded path
        # (causal now raises instead of silently running non-causal).
        got = resnet_block_3d_apply(
            params, cfg, t2j(x).transpose(0, 2, 3, 4, 1), causal=False
        ).transpose(0, 4, 1, 2, 3)
        want = torch_resnet3d(tree_to_torch(params), x, False, "zeros", "pixel", dual=True)
        assert_close(got, want, rtol=1e-3, atol=1e-4, msg="dual-conv resnet block")

        import pytest as _pytest

        with _pytest.raises(NotImplementedError, match="non-causal"):
            resnet_block_3d_apply(
                params, cfg, t2j(x).transpose(0, 2, 3, 4, 1), causal=True
            )
