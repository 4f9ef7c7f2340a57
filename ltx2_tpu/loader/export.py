"""Export a DiT param tree back to reference-format safetensors.

The inverse of weight_loader's read path: unstack the (L, ...) scan-layout
block leaves into per-block tensors, apply the inverse of the
KEY_REWRITE_RULES (data-driven, mirroring weight_loader.py), and prefix
with `model.diffusion_model.` — so a checkpoint fine-tuned with
ltx2_tpu.training round-trips through load_transformer_params AND stays
loadable by the reference implementation (reference
weight_converter.py:277-315 key scheme).
"""

from __future__ import annotations

import re
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from ltx2_tpu.loader.safetensors_io import SafetensorsFile, write_safetensors

# Inverse of weight_loader's KEY_REWRITE_RULES: tree key -> checkpoint key.
INVERSE_KEY_RULES = [
    (r"\.audio_ff\.project_in\.proj\.", ".audio_ff.net.0.proj."),
    (r"\.audio_ff\.project_out\.", ".audio_ff.net.2."),
    (r"\.ff\.project_in\.proj\.", ".ff.net.0.proj."),
    (r"\.ff\.project_out\.", ".ff.net.2."),
    (r"\.to_out\.", ".to_out.0."),
]


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        path = f"{prefix}.{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, path))
        else:
            out[path] = v
    return out


def params_to_checkpoint(params, dtype=np.float32) -> Dict[str, np.ndarray]:
    """Stacked DiT param tree -> flat reference-style checkpoint dict
    (model.diffusion_model.* keys, per-block unstacked)."""
    flat = _flatten(params)
    ckpt: Dict[str, np.ndarray] = {}
    for key, leaf in flat.items():
        arr = np.asarray(jnp.asarray(leaf).astype(jnp.float32)).astype(dtype)
        if key.startswith("transformer_blocks."):
            sub = key[len("transformer_blocks."):]
            for i in range(arr.shape[0]):
                full = f"transformer_blocks.{i}.{sub}"
                for pat, repl in INVERSE_KEY_RULES:
                    full = re.sub(pat, repl, full)
                ckpt[f"model.diffusion_model.{full}"] = arr[i]
        else:
            full = key
            for pat, repl in INVERSE_KEY_RULES:
                full = re.sub(pat, repl, full)
            ckpt[f"model.diffusion_model.{full}"] = arr
    return ckpt


def export_transformer_checkpoint(
    path: str, params, metadata: Optional[Dict[str, str]] = None,
    carry_from: Optional[str] = None,
) -> None:
    """Write the param tree as a reference-format safetensors checkpoint.

    `carry_from`: path of the source checkpoint whose NON-DiT tensors
    (VAE encoder/decoder, text_embedding_projection, vocoder, per-channel
    stats, ...) are copied verbatim into the export. The reference keeps
    every component in ONE file (ModelLedger reads the VAE and connectors
    from the same path as the DiT), so a fine-tuned checkpoint that only
    replaced `model.diffusion_model.*` DiT keys would fail at VAE /
    text-encoder load. Tensors are memory-mapped views — no full-file
    materialization on host.
    """
    tensors = params_to_checkpoint(params)
    if carry_from is not None:
        src = SafetensorsFile(carry_from)
        for key in src.keys():
            if key not in tensors:
                tensors[key] = src.get(key)
    write_safetensors(path, tensors, metadata=metadata)
