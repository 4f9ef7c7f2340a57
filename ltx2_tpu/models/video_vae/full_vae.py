"""Full (non-"simple") config-driven VideoEncoder / VideoDecoder.

Capability parity with reference LTX_2_MLX/model/video_vae/encoder.py:135
(VideoEncoder) and decoder.py:89 (VideoDecoder): block-list-driven assembly
over ResnetBlock3D / UNetMidBlock3D / strided causal convs / residual
space-to-depth (down) and depth-to-space (up) sampling blocks
(sampling.py:73-232). This is the reference's secondary VAE path — LTX-2
checkpoints ship the Simple* variants (encoder.py / decoder.py here), but
the block vocabulary below is what non-simple checkpoints declare.

Functional: configs are frozen dataclasses whose `plan` is computed from the
block list exactly the way the reference's constructors walk it (channel
arithmetic included); params are pytrees; applies are jittable. Channels-last
(B, T, H, W, C) internally like the rest of the VAE.

The reference's full decoder leaves timestep embedding "outside the module"
(resnet.py:276-277) — here mid-blocks accept an optional pre-embedded
(B, 4*C) timestep with the same AdaLN contract as ResnetBlock3D.

DELIBERATE divergences from the reference's full path (which is a
non-production skeleton: its weight loading is a literal
`TODO: Load VAE weights from file`, scripts/generate.py:782, so real
checkpoints only ever flow through the Simple* path):
- dims=3 convs here are TRUE full-3D causal convs (single (out, in, kT,
  kH, kW) kernels, the PyTorch checkpoint layout) — the reference's
  make_conv_nd(dims=3) returns CausalConv3d wrapping a FACTORIZED
  DualConv3d (separate 2D+1D weight pairs, convolution.py:60-290), which
  could not load the original's 3D kernels;
- the residual depth-to-space upsample repeats channels with jnp.tile,
  matching the reference's weight-loading Simple decoder
  (simple_decoder.py:300, validated by its measured real-weight parity) —
  the skeleton's sampling.py:214 uses interleaved mx.repeat instead;
- the reference's spatial_padding_mode is stored but never applied in
  DualConv3d (always zero-pads); here it is honored.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from ltx2_tpu.models.video_vae.conv import conv3d_ndhwc, from_ndhwc, to_ndhwc
from ltx2_tpu.models.video_vae.decoder import _depth_to_space, _upsample_block
from ltx2_tpu.models.video_vae.encoder import _down_block
from ltx2_tpu.models.video_vae.ops import (
    normalize_latent,
    patchify,
    pixel_norm,
    un_normalize_latent,
    unpatchify,
)
from ltx2_tpu.models.video_vae.resnet import (
    NormLayerType,
    PaddingModeType,
    ResnetBlock3DConfig,
    UNetMidBlock3DConfig,
    init_resnet_block_3d,
    init_unet_mid_block_3d,
    resnet_block_3d_apply,
    unet_mid_block_3d_apply,
)

Params = Dict[str, object]

BlockSpec = Tuple[str, Union[int, Dict[str, Any]]]


def _block_config(params: Union[int, Dict[str, Any], None]) -> Dict[str, Any]:
    if params is None:
        return {}
    if isinstance(params, int):
        return {"num_layers": params}
    return dict(params)


# ---------------------------------------------------------------------------
# Encoder (reference encoder.py:23-300)
# ---------------------------------------------------------------------------

# Standard LTX config (encoder.py:141-147).
DEFAULT_ENCODER_BLOCKS: Tuple[BlockSpec, ...] = (
    ("res_x", 4),
    ("compress_space_res", {"multiplier": 2}),
    ("res_x", 6),
    ("compress_time_res", {"multiplier": 2}),
    ("res_x", 6),
    ("compress_all_res", {"multiplier": 2}),
    ("res_x", 2),
    ("compress_all_res", {"multiplier": 2}),
    ("res_x", 2),
)

_COMPRESS_STRIDES = {
    "compress_time": (2, 1, 1),
    "compress_space": (1, 2, 2),
    "compress_all": (2, 2, 2),
    "compress_all_x_y": (2, 2, 2),
    "compress_all_res": (2, 2, 2),
    "compress_space_res": (1, 2, 2),
    "compress_time_res": (2, 1, 1),
}


@dataclass(frozen=True)
class FullVideoEncoderConfig:
    in_channels: int = 3
    out_channels: int = 128
    patch_size: int = 4
    blocks: Tuple[BlockSpec, ...] = DEFAULT_ENCODER_BLOCKS
    norm_layer: NormLayerType = NormLayerType.PIXEL_NORM
    norm_num_groups: int = 32
    latent_log_var: str = "uniform"  # per_channel | uniform | constant | none
    spatial_padding_mode: PaddingModeType = PaddingModeType.ZEROS
    dims: Union[int, Tuple[int, int]] = 3

    @property
    def base_channels(self) -> int:
        """conv_in output width = latent channels (encoder.py:192-204)."""
        return self.out_channels

    @property
    def plan(self) -> List[Tuple[str, Dict[str, Any], int, int]]:
        """[(name, config, in_ch, out_ch)] with the reference's channel walk
        (encoder.py:23-133)."""
        out: List[Tuple[str, Dict[str, Any], int, int]] = []
        ch = self.base_channels
        for name, params in self.blocks:
            cfg = _block_config(params)
            in_ch = ch
            if name in ("res_x_y", "compress_all_x_y", "compress_all_res",
                        "compress_space_res", "compress_time_res"):
                ch = ch * cfg.get("multiplier", 2)
            elif name not in ("res_x", "compress_time", "compress_space", "compress_all"):
                raise ValueError(f"Unknown encoder block: {name}")
            out.append((name, cfg, in_ch, ch))
        return out

    @property
    def conv_out_channels(self) -> int:
        c = self.out_channels
        if self.latent_log_var == "per_channel":
            return 2 * c
        if self.latent_log_var in ("uniform", "constant"):
            return c + 1
        return c


def full_video_encoder_apply(
    params: Params,
    cfg: FullVideoEncoderConfig,
    sample: jnp.ndarray,
    causal: bool = True,
) -> jnp.ndarray:
    """(B, 3, F, H, W) -> normalized latent means (B, C, F', H', W')
    (encoder.py:246-300). F must be 8k + 1.

    The reference encoder is unconditionally causal (encoder.py:264-280
    hardcodes causal=True at every conv); causal=False is rejected rather
    than silently producing a mixed-mode network."""
    if not causal:
        raise ValueError(
            "the full video encoder is always causal "
            "(reference encoder.py:264-280)"
        )
    frames = sample.shape[2]
    if (frames - 1) % 8 != 0:
        raise ValueError(
            f"Invalid number of frames: {frames}. "
            "Encoder input must have 1 + 8*k frames (e.g., 1, 9, 17, ...)."
        )
    spad = cfg.spatial_padding_mode
    x = patchify(sample, patch_size_hw=cfg.patch_size, patch_size_t=1)
    x = to_ndhwc(x)
    x = conv3d_ndhwc(
        params["conv_in"], x, causal=True,
        spatial_mode="zeros" if spad == PaddingModeType.ZEROS else spad.value,
    )

    for block_params, (name, bcfg, in_ch, out_ch) in zip(params["down_blocks"], cfg.plan):
        if name == "res_x":
            mid_cfg = UNetMidBlock3DConfig(
                dims=cfg.dims, in_channels=in_ch,
                num_layers=bcfg.get("num_layers", 1),
                resnet_groups=cfg.norm_num_groups, norm_layer=cfg.norm_layer,
                spatial_padding_mode=spad,
            )
            x = unet_mid_block_3d_apply(block_params, mid_cfg, x, causal=True)
        elif name == "res_x_y":
            rb_cfg = ResnetBlock3DConfig(
                dims=cfg.dims, in_channels=in_ch, out_channels=out_ch,
                groups=cfg.norm_num_groups, norm_layer=cfg.norm_layer,
                spatial_padding_mode=spad,
            )
            x = resnet_block_3d_apply(block_params, rb_cfg, x, causal=True)
        elif name in ("compress_time", "compress_space", "compress_all", "compress_all_x_y"):
            # strided causal conv (encoder.py:61-101)
            x = conv3d_ndhwc(
                block_params, x, causal=True,
                spatial_mode="zeros" if spad == PaddingModeType.ZEROS else spad.value,
                stride=_COMPRESS_STRIDES[name],
            )
        else:  # compress_*_res: residual SpaceToDepthDownsample (sampling.py:73-149)
            x = _down_block(
                block_params, x, True, in_ch, out_ch, _COMPRESS_STRIDES[name]
            )

    x = pixel_norm(x) if cfg.norm_layer == NormLayerType.PIXEL_NORM else _gn(
        params["conv_norm_out"], x, cfg.norm_num_groups
    )
    x = jax.nn.silu(x.astype(jnp.float32)).astype(sample.dtype)
    x = conv3d_ndhwc(
        params["conv_out"], x, causal=True,
        spatial_mode="zeros" if spad == PaddingModeType.ZEROS else spad.value,
    )
    x = from_ndhwc(x)

    # log-var handling (encoder.py:283-299): keep means only
    means = x[:, : cfg.out_channels]
    return normalize_latent(
        means.astype(jnp.float32), params["per_channel_statistics"]
    )


def _gn(p: Params, x: jnp.ndarray, groups: int) -> jnp.ndarray:
    from ltx2_tpu.ops.common import group_norm

    xc = x.transpose(0, 4, 1, 2, 3)
    return group_norm(p, xc, groups, 1e-6).transpose(0, 2, 3, 4, 1)


# ---------------------------------------------------------------------------
# Decoder (reference decoder.py:16-339)
# ---------------------------------------------------------------------------

# Standard LTX config, stored forward (un-reversed), matching the metadata
# `decoder_blocks` form the simple decoder also consumes.
DEFAULT_DECODER_BLOCKS: Tuple[BlockSpec, ...] = (
    ("res_x", {"num_layers": 5, "inject_noise": False}),
    ("compress_all", {"residual": True, "multiplier": 2}),
    ("res_x", {"num_layers": 5, "inject_noise": False}),
    ("compress_all", {"residual": True, "multiplier": 2}),
    ("res_x", {"num_layers": 5, "inject_noise": False}),
    ("compress_all", {"residual": True, "multiplier": 2}),
    ("res_x", {"num_layers": 5, "inject_noise": False}),
)


@dataclass(frozen=True)
class FullVideoDecoderConfig:
    in_channels: int = 128
    out_channels: int = 3
    patch_size: int = 4
    blocks: Tuple[BlockSpec, ...] = DEFAULT_DECODER_BLOCKS
    norm_layer: NormLayerType = NormLayerType.PIXEL_NORM
    norm_num_groups: int = 32
    causal: bool = False
    timestep_conditioning: bool = False
    spatial_padding_mode: PaddingModeType = PaddingModeType.REFLECT
    dims: Union[int, Tuple[int, int]] = 3
    decode_noise_scale: float = 0.025
    decode_timestep: float = 0.05

    @property
    def initial_channels(self) -> int:
        """conv_in output width — the reference walks the reversed block list
        multiplying channels back up (decoder.py:156-166)."""
        ch = self.in_channels
        for name, params in reversed(self.blocks):
            bcfg = _block_config(params)
            if name == "res_x_y":
                ch *= bcfg.get("multiplier", 2)
            elif name == "compress_all":
                ch *= bcfg.get("multiplier", 1)
        return ch

    @property
    def plan(self) -> List[Tuple[str, Dict[str, Any], int, int]]:
        """[(name, config, in_ch, out_ch)] over the REVERSED block list,
        mirroring _make_decoder_block channel arithmetic (decoder.py:16-87)."""
        out: List[Tuple[str, Dict[str, Any], int, int]] = []
        ch = self.initial_channels
        for name, params in reversed(self.blocks):
            bcfg = _block_config(params)
            in_ch = ch
            if name == "res_x_y":
                ch = ch // bcfg.get("multiplier", 2)
            elif name == "compress_all":
                ch = ch // bcfg.get("multiplier", 1)
            elif name not in ("res_x", "compress_time", "compress_space"):
                raise ValueError(f"Unknown decoder block: {name}")
            out.append((name, bcfg, in_ch, ch))
        return out

    @property
    def final_channels(self) -> int:
        return self.plan[-1][3] if self.blocks else self.initial_channels


def full_video_decoder_apply(
    params: Params,
    cfg: FullVideoDecoderConfig,
    sample: jnp.ndarray,
    timestep_embeddings: Optional[List[Optional[jnp.ndarray]]] = None,
    last_timestep_embedding: Optional[jnp.ndarray] = None,
    noise_key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Latent (B, C, F', H', W') -> video (B, 3, F, H, W)
    (decoder.py:232-339).

    timestep_embeddings: optional per-up-block pre-embedded (B, 4*C) AdaLN
    timesteps for timestep-conditioned res_x blocks (the reference expects
    these "from outside", resnet.py:276-277); last_timestep_embedding is the
    (B, 2*C) table offset for the output scale/shift.
    """
    spad = cfg.spatial_padding_mode

    # Independent randomness per consumer: one key for the input decode
    # noise, a fresh split per injection block below — the reference's
    # default path (key=None in MLX) draws fresh noise at every site.
    k_decode = k_blocks = None
    if noise_key is not None:
        k_decode, k_blocks = jax.random.split(noise_key)

    if cfg.timestep_conditioning and k_decode is not None:
        # Noise BEFORE un_normalize — the reference's FULL decoder order
        # (decoder.py:233-241), which deliberately differs from the simple
        # decoder (simple_decoder.py:491-498 denormalizes first, as does
        # our decoder.py). Parity is per-decoder, not cross-decoder.
        noise = jax.random.normal(k_decode, sample.shape, sample.dtype)
        sample = noise * cfg.decode_noise_scale + (1.0 - cfg.decode_noise_scale) * sample

    sample = un_normalize_latent(
        sample.astype(jnp.float32), params["per_channel_statistics"]
    )

    x = to_ndhwc(sample)
    # conv_in/conv_out follow the config's causal mode like every block
    # (reference decoder.py:247,279 uses self.causal uniformly).
    x = conv3d_ndhwc(
        params["conv_in"], x, causal=cfg.causal,
        spatial_mode=spad.value if spad != PaddingModeType.ZEROS else "zeros",
    )

    plan = cfg.plan
    ts = timestep_embeddings or [None] * len(plan)
    for block_params, (name, bcfg, in_ch, out_ch), t_emb in zip(
        params["up_blocks"], plan, ts
    ):
        k_block = None
        if k_blocks is not None and bcfg.get("inject_noise", False):
            k_blocks, k_block = jax.random.split(k_blocks)
        if name == "res_x":
            mid_cfg = UNetMidBlock3DConfig(
                dims=cfg.dims, in_channels=in_ch,
                num_layers=bcfg.get("num_layers", 1),
                resnet_groups=cfg.norm_num_groups, norm_layer=cfg.norm_layer,
                inject_noise=bcfg.get("inject_noise", False),
                timestep_conditioning=cfg.timestep_conditioning and t_emb is not None,
                spatial_padding_mode=spad,
            )
            x = unet_mid_block_3d_apply(
                block_params, mid_cfg, x, causal=cfg.causal,
                timestep=t_emb, key=k_block,
            )
        elif name == "res_x_y":
            rb_cfg = ResnetBlock3DConfig(
                dims=cfg.dims, in_channels=in_ch, out_channels=out_ch,
                groups=cfg.norm_num_groups, norm_layer=cfg.norm_layer,
                inject_noise=bcfg.get("inject_noise", False),
                spatial_padding_mode=spad,
            )
            x = resnet_block_3d_apply(
                block_params, rb_cfg, x, causal=cfg.causal, key=k_block
            )
        else:  # compress_time / compress_space / compress_all -> d2s upsample
            x = _upsample_block(
                block_params, x, cfg.causal, _COMPRESS_STRIDES[name],
                multiplier=bcfg.get("multiplier", 1),
                residual=bcfg.get("residual", False),
                in_channels=in_ch,
            )

    x = pixel_norm(x) if cfg.norm_layer == NormLayerType.PIXEL_NORM else _gn(
        params["conv_norm_out"], x, cfg.norm_num_groups
    )

    if cfg.timestep_conditioning:
        # With an externally pre-embedded timestep (the PyTorch-original
        # contract, resnet.py:276-277) the table offsets by it; without
        # one the RAW table still applies (the reference's simplified
        # executable path, decoder.py:271-276 — its own embedder is a
        # 'would include' TODO).
        table = params["last_scale_shift_table"].astype(jnp.float32)  # (2, C)
        if last_timestep_embedding is not None:
            ada = table[None] + last_timestep_embedding.reshape(
                -1, 2, table.shape[-1]
            )
        else:
            ada = table[None]
        shift = ada[:, 0][:, None, None, None, :]
        scale = ada[:, 1][:, None, None, None, :]
        x = (x.astype(jnp.float32) * (1 + scale) + shift).astype(x.dtype)

    x = jax.nn.silu(x.astype(jnp.float32)).astype(x.dtype)
    x = conv3d_ndhwc(
        params["conv_out"], x, causal=cfg.causal,
        spatial_mode=spad.value if spad != PaddingModeType.ZEROS else "zeros",
    )
    x = from_ndhwc(x)
    return unpatchify(x, patch_size_hw=cfg.patch_size, patch_size_t=1)


# ---------------------------------------------------------------------------
# Random init (tests / placeholder)
# ---------------------------------------------------------------------------


def _conv3(key, in_c, out_c, k=3, dtype=jnp.float32) -> Params:
    bound = 1.0 / (in_c * k**3) ** 0.5
    kw, kb = jax.random.split(key)
    return {
        "weight": jax.random.uniform(kw, (out_c, in_c, k, k, k), dtype, -bound, bound),
        "bias": jax.random.uniform(kb, (out_c,), dtype, -bound, bound),
    }


def init_full_video_encoder(
    key: jax.Array, cfg: FullVideoEncoderConfig, dtype=jnp.float32
) -> Params:
    ki = iter(jax.random.split(key, 4 + len(cfg.blocks)))
    p: Params = {
        "conv_in": _conv3(next(ki), cfg.in_channels * cfg.patch_size**2, cfg.base_channels, dtype=dtype),
    }
    blocks = []
    for name, bcfg, in_ch, out_ch in cfg.plan:
        k = next(ki)
        if name == "res_x":
            blocks.append(
                init_unet_mid_block_3d(
                    k,
                    UNetMidBlock3DConfig(
                        dims=cfg.dims, in_channels=in_ch,
                        num_layers=bcfg.get("num_layers", 1),
                        resnet_groups=cfg.norm_num_groups, norm_layer=cfg.norm_layer,
                        spatial_padding_mode=cfg.spatial_padding_mode,
                    ),
                    dtype,
                )
            )
        elif name == "res_x_y":
            blocks.append(
                init_resnet_block_3d(
                    k,
                    ResnetBlock3DConfig(
                        dims=cfg.dims, in_channels=in_ch, out_channels=out_ch,
                        groups=cfg.norm_num_groups, norm_layer=cfg.norm_layer,
                        spatial_padding_mode=cfg.spatial_padding_mode,
                    ),
                    dtype,
                )
            )
        elif name in ("compress_time", "compress_space", "compress_all"):
            blocks.append(_conv3(k, in_ch, out_ch, dtype=dtype))
        elif name == "compress_all_x_y":
            blocks.append(_conv3(k, in_ch, out_ch, dtype=dtype))
        else:  # compress_*_res: conv to out/prod(stride), s2d multiplies back
            stride = _COMPRESS_STRIDES[name]
            blocks.append({"conv": _conv3(k, in_ch, out_ch // math.prod(stride), dtype=dtype)})
    p["down_blocks"] = blocks
    if cfg.norm_layer == NormLayerType.GROUP_NORM:
        c = cfg.plan[-1][3] if cfg.blocks else cfg.base_channels
        p["conv_norm_out"] = {"weight": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}
    final_c = cfg.plan[-1][3] if cfg.blocks else cfg.base_channels
    p["conv_out"] = _conv3(next(ki), final_c, cfg.conv_out_channels, dtype=dtype)
    p["per_channel_statistics"] = {
        "std_of_means": jnp.ones((cfg.out_channels,), jnp.float32),
        "mean_of_means": jnp.zeros((cfg.out_channels,), jnp.float32),
    }
    return p


def init_full_video_decoder(
    key: jax.Array, cfg: FullVideoDecoderConfig, dtype=jnp.float32
) -> Params:
    ki = iter(jax.random.split(key, 4 + len(cfg.blocks)))
    p: Params = {
        "conv_in": _conv3(next(ki), cfg.in_channels, cfg.initial_channels, dtype=dtype),
    }
    blocks = []
    for name, bcfg, in_ch, out_ch in cfg.plan:
        k = next(ki)
        if name == "res_x":
            blocks.append(
                init_unet_mid_block_3d(
                    k,
                    UNetMidBlock3DConfig(
                        dims=cfg.dims, in_channels=in_ch,
                        num_layers=bcfg.get("num_layers", 1),
                        resnet_groups=cfg.norm_num_groups, norm_layer=cfg.norm_layer,
                        inject_noise=bcfg.get("inject_noise", False),
                        timestep_conditioning=cfg.timestep_conditioning,
                        spatial_padding_mode=cfg.spatial_padding_mode,
                    ),
                    dtype,
                )
            )
        elif name == "res_x_y":
            blocks.append(
                init_resnet_block_3d(
                    k,
                    ResnetBlock3DConfig(
                        dims=cfg.dims, in_channels=in_ch, out_channels=out_ch,
                        groups=cfg.norm_num_groups, norm_layer=cfg.norm_layer,
                        inject_noise=bcfg.get("inject_noise", False),
                        spatial_padding_mode=cfg.spatial_padding_mode,
                    ),
                    dtype,
                )
            )
        else:  # d2s upsample: conv to prod(stride)*in/multiplier
            stride = _COMPRESS_STRIDES[name]
            mult = bcfg.get("multiplier", 1)
            conv_out = math.prod(stride) * in_ch // mult
            blocks.append({"conv": _conv3(k, in_ch, conv_out, dtype=dtype)})
    p["up_blocks"] = blocks
    if cfg.norm_layer == NormLayerType.GROUP_NORM:
        p["conv_norm_out"] = {
            "weight": jnp.ones((cfg.final_channels,), dtype),
            "bias": jnp.zeros((cfg.final_channels,), dtype),
        }
    p["conv_out"] = _conv3(
        next(ki), cfg.final_channels, cfg.out_channels * cfg.patch_size**2, dtype=dtype
    )
    if cfg.timestep_conditioning:
        p["last_scale_shift_table"] = jnp.zeros((2, cfg.final_channels), jnp.float32)
    p["per_channel_statistics"] = {
        "std_of_means": jnp.ones((cfg.in_channels,), jnp.float32),
        "mean_of_means": jnp.zeros((cfg.in_channels,), jnp.float32),
    }
    return p
