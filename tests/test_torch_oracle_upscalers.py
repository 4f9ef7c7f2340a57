"""Torch-oracle parity for the COMPOSED latent upscalers.

Independent torch implementations of the reference SpatialUpscaler
(LTX_2_MLX/model/upscaler/spatial.py:326-411) and TemporalUpscaler
(temporal.py:218-307) built from torch NATIVE ops — F.conv3d/F.conv2d,
F.group_norm, F.pixel_shuffle — which implement exactly the PyTorch
semantics the reference transcribed into MLX. Composition details under
test: GroupNorm over (C/g, T, H, W) for spatial vs PER-FRAME for temporal,
act-after-residual res blocks, pixel-shuffle channel packing, the temporal
first-frame trim, and blur-downsample-at-stride-1 identity.
"""

import jax
import numpy as np
import torch
import torch.nn.functional as F

from tests.test_torch_oracle import assert_close, t2j
from tests.test_torch_oracle_model import tree_to_torch
from tests.test_torch_oracle_vae import randomize

torch.manual_seed(0)


def conv3d_zeros(p, x):
    # Upscaler convs: plain zero padding on every axis (spatial.py:21-88)
    return F.conv3d(x, p["weight"], p["bias"], padding=1)


def gn_5d(p, x, groups):
    """GroupNorm over (C/g, T, H, W) — PyTorch GroupNorm on NCTHW directly
    (spatial.py:91-128)."""
    return F.group_norm(x, groups, p["weight"], p["bias"], eps=1e-5)


def gn_per_frame(p, x, groups):
    """Per-frame GroupNorm (temporal.py:130-135): flatten frames into batch."""
    b, c, t, h, w = x.shape
    xf = x.permute(0, 2, 1, 3, 4).reshape(b * t, c, h, w)
    xf = F.group_norm(xf, groups, p["weight"], p["bias"], eps=1e-5)
    return xf.reshape(b, t, c, h, w).permute(0, 2, 1, 3, 4)


def res_block(p, x, groups, norm):
    """conv->norm->act->conv->norm->act(x+res) (spatial.py:131-181)."""
    residual = x
    h = F.silu(norm(p["norm1"], conv3d_zeros(p["conv1"], x), groups))
    h = norm(p["norm2"], conv3d_zeros(p["conv2"], h), groups)
    return F.silu(h + residual)


def torch_spatial_upscaler(tp, cfg, latent):
    g = cfg.num_groups
    x = F.silu(gn_5d(tp["initial_norm"], conv3d_zeros(tp["initial_conv"], latent), g))
    for bp in tp["res_blocks"]:
        x = res_block(bp, x, g, gn_5d)
    # SpatialRationalResampler (spatial.py:267-323): per-frame 2D conv ->
    # pixel shuffle; blur-down stride 1 is identity.
    b, c, f, h, w = x.shape
    x2 = x.permute(0, 2, 1, 3, 4).reshape(b * f, c, h, w)
    y = F.conv2d(x2, tp["upsampler"]["conv"]["weight"], tp["upsampler"]["conv"]["bias"], padding=1)
    y = F.pixel_shuffle(y, cfg.scale)
    _, c2, h2, w2 = y.shape
    x = y.reshape(b, f, c2, h2, w2).permute(0, 2, 1, 3, 4)
    for bp in tp["post_upsample_res_blocks"]:
        x = res_block(bp, x, g, gn_5d)
    return conv3d_zeros(tp["final_conv"], x)


def torch_temporal_upscaler(tp, cfg, latent):
    g = cfg.num_groups
    x = F.silu(
        gn_per_frame(tp["initial_norm"], conv3d_zeros(tp["initial_conv"], latent), g)
    )
    for bp in tp["res_blocks"]:
        x = res_block(bp, x, g, gn_per_frame)
    # TemporalPixelShuffle (temporal.py:152-215): conv C->C*r, then
    # "b (p c) f h w -> b c (f p) h w" (factor is the SLOWEST packed axis).
    x = conv3d_zeros(tp["upsampler"]["conv"], x)
    b, cr, t, h, w = x.shape
    r = cfg.scale_factor
    x = x.reshape(b, r, cr // r, t, h, w).permute(0, 2, 3, 1, 4, 5).reshape(
        b, cr // r, t * r, h, w
    )
    x = x[:, :, 1:]  # first latent frame encodes one pixel frame
    for bp in tp["post_upsample_res_blocks"]:
        x = res_block(bp, x, g, gn_per_frame)
    return conv3d_zeros(tp["final_conv"], x)


class TestSpatialUpscalerOracle:
    def test_full_chain(self):
        from ltx2_tpu.models.upscaler.spatial import (
            SpatialUpscalerConfig,
            init_spatial_upscaler,
            spatial_upscaler_apply,
        )

        cfg = SpatialUpscalerConfig(
            in_channels=6, mid_channels=16, num_blocks_per_stage=2, num_groups=4
        )
        params = randomize(init_spatial_upscaler(jax.random.PRNGKey(0), cfg), seed=20)
        g = torch.Generator().manual_seed(21)
        latent = torch.randn(1, 6, 3, 5, 4, generator=g)

        got = spatial_upscaler_apply(params, cfg, t2j(latent))
        want = torch_spatial_upscaler(tree_to_torch(params), cfg, latent)
        assert_close(got, want, rtol=1e-3, atol=1e-4, msg="spatial upscaler chain")
        assert np.asarray(got).shape == (1, 6, 3, 10, 8)

    def test_group_norm_is_not_per_frame(self):
        """The spatial upscaler's GroupNorm reduces over T as well — a
        per-frame implementation would differ whenever frames differ."""
        from ltx2_tpu.models.upscaler.spatial import group_norm_video

        g = torch.Generator().manual_seed(22)
        x = torch.randn(2, 3, 4, 4, 8, generator=g)  # (B, T, H, W, C)
        w, b = torch.ones(8), torch.zeros(8)
        got = group_norm_video(t2j(x), 2, t2j(w), t2j(b))
        want = F.group_norm(
            x.permute(0, 4, 1, 2, 3), 2, w, b, eps=1e-5
        ).permute(0, 2, 3, 4, 1)
        assert_close(got, want, msg="5D group norm vs torch native")


class TestTemporalUpscalerOracle:
    def test_full_chain(self):
        from ltx2_tpu.models.upscaler.temporal import (
            TemporalUpscalerConfig,
            init_temporal_upscaler,
            temporal_upscaler_apply,
        )

        cfg = TemporalUpscalerConfig(
            latent_channels=6, hidden_channels=16, num_res_blocks=2, num_groups=4
        )
        params = randomize(init_temporal_upscaler(jax.random.PRNGKey(1), cfg), seed=23)
        g = torch.Generator().manual_seed(24)
        latent = torch.randn(1, 6, 3, 4, 5, generator=g)

        got = temporal_upscaler_apply(params, cfg, t2j(latent))
        want = torch_temporal_upscaler(tree_to_torch(params), cfg, latent)
        assert_close(got, want, rtol=1e-3, atol=1e-4, msg="temporal upscaler chain")
        # 3 frames -> x2 = 6, trim first -> 5
        assert np.asarray(got).shape == (1, 6, 5, 4, 5)
