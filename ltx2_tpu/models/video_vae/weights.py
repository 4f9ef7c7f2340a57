"""Video VAE checkpoint loading.

Maps `vae.decoder.*` / `vae.encoder.*` safetensors keys into the functional
param trees of decoder.py / encoder.py (reference loaders:
simple_decoder.py:566-673, simple_encoder.py:407-532). Conv weights keep the
checkpoint (outC, inC, kT, kH, kW) layout; conv.py transposes to DHWIO
lazily. Stats keys are hyphenated in checkpoints (ops.py:188-210).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from ltx2_tpu.loader.safetensors_io import SafetensorsFile
from ltx2_tpu.models.video_vae.decoder import VideoDecoderConfig, normalize_decoder_blocks
from ltx2_tpu.models.video_vae.encoder import VideoEncoderConfig
from ltx2_tpu.models.video_vae.ops import STAT_KEY_MAP

Params = Dict[str, object]


def _get(f: SafetensorsFile, key: str) -> Optional[jnp.ndarray]:
    if key not in f:
        return None
    return jnp.asarray(np.asarray(f.get(key), dtype=np.float32))


def _conv(f: SafetensorsFile, prefix: str) -> Optional[Params]:
    w = _get(f, f"{prefix}.conv.weight")
    if w is None:
        return None
    return {"weight": w, "bias": _get(f, f"{prefix}.conv.bias")}


def _require(missing: list, val, key: str):
    """Track required-but-absent checkpoint keys so the load fails loudly
    at load time, not as a NoneType crash deep inside the jitted decoder
    (e.g. when decoder_blocks metadata disagrees with the stored
    up_blocks)."""
    if val is None:
        missing.append(key)
    return val


def _raise_if_missing(missing: list, path: str, which: str) -> None:
    if missing:
        shown = ", ".join(missing[:8]) + (" ..." if len(missing) > 8 else "")
        raise ValueError(
            f"checkpoint {path} is missing {len(missing)} required video "
            f"{which} key(s) — stored weights disagree with the derived "
            f"architecture config (wrong decoder_blocks metadata / wrong "
            f"file?): {shown}"
        )


def _embedder(f: SafetensorsFile, prefix: str) -> Optional[Params]:
    w1 = _get(f, f"{prefix}.linear_1.weight")
    if w1 is None:
        return None
    return {
        "linear_1": {"weight": w1, "bias": _get(f, f"{prefix}.linear_1.bias")},
        "linear_2": {
            "weight": _get(f, f"{prefix}.linear_2.weight"),
            "bias": _get(f, f"{prefix}.linear_2.bias"),
        },
    }


def _stats(f: SafetensorsFile) -> Params:
    out: Params = {}
    for ckpt_key, attr in STAT_KEY_MAP.items():
        val = _get(f, f"vae.per_channel_statistics.{ckpt_key}")
        if val is not None:
            out[attr] = val
    out.setdefault("mean_of_means", jnp.zeros((128,), jnp.float32))
    out.setdefault("std_of_means", jnp.ones((128,), jnp.float32))
    return out


def decoder_config_from_checkpoint(path: str) -> VideoDecoderConfig:
    """Architecture from checkpoint-metadata `config.vae.decoder_blocks`
    (the V2.0/V2.3 multi-version story, generate.py:244-254)."""
    from ltx2_tpu.loader.weight_loader import read_checkpoint_config

    vae_cfg = read_checkpoint_config(path).get("vae", {})
    blocks = vae_cfg.get("decoder_blocks")
    if blocks:
        return VideoDecoderConfig(decoder_blocks=normalize_decoder_blocks(blocks))
    return VideoDecoderConfig()


def load_video_decoder_params(path: str, cfg: VideoDecoderConfig) -> Params:
    f = SafetensorsFile(path)
    missing: list = []
    p: Params = {
        "per_channel_statistics": _stats(f),
        "conv_in": _require(missing, _conv(f, "vae.decoder.conv_in"), "vae.decoder.conv_in.conv.weight"),
        "conv_out": _require(missing, _conv(f, "vae.decoder.conv_out"), "vae.decoder.conv_out.conv.weight"),
        "last_scale_shift_table": _get(f, "vae.decoder.last_scale_shift_table"),
    }
    mult = _get(f, "vae.decoder.timestep_scale_multiplier")
    if mult is not None:
        p["timestep_scale_multiplier"] = mult
    last_emb = _embedder(f, "vae.decoder.last_time_embedder.timestep_embedder")
    if last_emb is not None:
        p["last_time_embedder"] = last_emb

    up_blocks = []
    for idx, (kind, spec, _channels) in enumerate(cfg.plan()):
        prefix = f"vae.decoder.up_blocks.{idx}"
        if kind == "res":
            (num_layers,) = spec
            block: Params = {"res_blocks": []}
            for j in range(num_layers):
                block["res_blocks"].append(
                    {
                        "conv1": _require(
                            missing,
                            _conv(f, f"{prefix}.res_blocks.{j}.conv1"),
                            f"{prefix}.res_blocks.{j}.conv1.conv.weight",
                        ),
                        "conv2": _require(
                            missing,
                            _conv(f, f"{prefix}.res_blocks.{j}.conv2"),
                            f"{prefix}.res_blocks.{j}.conv2.conv.weight",
                        ),
                        "scale_shift_table": _get(
                            f, f"{prefix}.res_blocks.{j}.scale_shift_table"
                        ),
                    }
                )
            emb = _embedder(f, f"{prefix}.time_embedder.timestep_embedder")
            if emb is not None:
                block["time_embedder"] = emb
            up_blocks.append(block)
        else:
            up_blocks.append(
                {
                    "conv": _require(
                        missing,
                        _conv(f, f"{prefix}.conv"),
                        f"{prefix}.conv.conv.weight",
                    )
                }
            )
    p["up_blocks"] = up_blocks
    _raise_if_missing(missing, path, "decoder")
    return p


def load_video_encoder_params(path: str, cfg: VideoEncoderConfig) -> Params:
    f = SafetensorsFile(path)
    missing: list = []
    p: Params = {
        "per_channel_statistics": _stats(f),
        "conv_in": _require(missing, _conv(f, "vae.encoder.conv_in"), "vae.encoder.conv_in.conv.weight"),
        "conv_out": _require(missing, _conv(f, "vae.encoder.conv_out"), "vae.encoder.conv_out.conv.weight"),
    }
    down_blocks = []
    for idx, (kind, _c_in, arg, _stride) in enumerate(cfg.plan):
        prefix = f"vae.encoder.down_blocks.{idx}"
        if kind == "res":
            down_blocks.append(
                {
                    "res_blocks": [
                        {
                            "conv1": _require(
                                missing,
                                _conv(f, f"{prefix}.res_blocks.{j}.conv1"),
                                f"{prefix}.res_blocks.{j}.conv1.conv.weight",
                            ),
                            "conv2": _require(
                                missing,
                                _conv(f, f"{prefix}.res_blocks.{j}.conv2"),
                                f"{prefix}.res_blocks.{j}.conv2.conv.weight",
                            ),
                        }
                        for j in range(arg)
                    ]
                }
            )
        else:
            down_blocks.append(
                {
                    "conv": _require(
                        missing,
                        _conv(f, f"{prefix}.conv"),
                        f"{prefix}.conv.conv.weight",
                    )
                }
            )
    p["down_blocks"] = down_blocks
    _raise_if_missing(missing, path, "encoder")
    return p
