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

from ltx2_tpu.loader.safetensors_io import (
    _DTYPES as _SRC_DTYPES,
    SafetensorsFile,
    write_safetensors_streaming,
)
from ltx2_tpu.loader.weight_loader import flatten_params

# Inverse of weight_loader's KEY_REWRITE_RULES: tree key -> checkpoint key.
INVERSE_KEY_RULES = [
    (r"\.audio_ff\.project_in\.proj\.", ".audio_ff.net.0.proj."),
    (r"\.audio_ff\.project_out\.", ".audio_ff.net.2."),
    (r"\.ff\.project_in\.proj\.", ".ff.net.0.proj."),
    (r"\.ff\.project_out\.", ".ff.net.2."),
    (r"\.to_out\.", ".to_out.0."),
]


def _rewrite(key: str) -> str:
    for pat, repl in INVERSE_KEY_RULES:
        key = re.sub(pat, repl, key)
    return f"model.diffusion_model.{key}"


def _fetch(leaf, index, dtype) -> np.ndarray:
    """Device->host fetch of one (un)stacked tensor, converted on host.

    Slicing on device before the transfer keeps peak host memory at one
    per-block tensor (e.g. one 4096x16384 FFN weight), never the full
    (L, ...) stack.
    """
    part = jnp.asarray(leaf) if index is None else jnp.asarray(leaf)[index]
    return np.asarray(part.astype(jnp.float32)).astype(dtype)


def iter_checkpoint_specs(params, dtype=np.float32):
    """Yield streaming-writer specs (name, np_dtype, shape, producer) for a
    stacked DiT param tree, without materializing any tensor data."""
    dtype = np.dtype(dtype)
    flat = flatten_params(params)
    quantized = sorted(
        k for k in flat
        if k.endswith("weight_scale") or k.endswith("weight_cscale")
    )
    if quantized:
        # Exporting raw fp8/int8 codes as f32 plus stale scale tensors
        # produces a checkpoint that reloads CORRUPTED (review r4): the
        # scale would 're-dequantize' already-wrong values. Refuse loudly.
        raise ValueError(
            "cannot export a quantized (fp8-kept / int8) param tree as a "
            f"reference checkpoint — found scale leaves like {quantized[0]}; "
            "load with keep_fp8=False / without --int8 before exporting"
        )
    for key, leaf in flat.items():
        shape = tuple(int(s) for s in jnp.shape(leaf))
        if key.startswith("transformer_blocks."):
            sub = key[len("transformer_blocks."):]
            for i in range(shape[0]):
                yield (
                    _rewrite(f"transformer_blocks.{i}.{sub}"), dtype, shape[1:],
                    (lambda leaf=leaf, i=i: _fetch(leaf, i, dtype)),
                )
        else:
            yield (
                _rewrite(key), dtype, shape,
                (lambda leaf=leaf: _fetch(leaf, None, dtype)),
            )


def params_to_checkpoint(params, dtype=np.float32) -> Dict[str, np.ndarray]:
    """Stacked DiT param tree -> flat reference-style checkpoint dict
    (model.diffusion_model.* keys, per-block unstacked). Eager — fine for
    test-sized trees; real exports go through the streaming specs."""
    return {name: producer()
            for name, _dt, _shape, producer in iter_checkpoint_specs(params, dtype)}


def export_transformer_checkpoint(
    path: str, params, metadata: Optional[Dict[str, str]] = None,
    carry_from: Optional[str] = None, dtype=np.float32,
) -> None:
    """Write the param tree as a reference-format safetensors checkpoint.

    `dtype`: storage dtype for the DiT tensors (np.float32 default;
    pass ml_dtypes.bfloat16 to halve the file for a bf16-trained tree).

    `carry_from`: path of the source checkpoint whose NON-DiT tensors
    (VAE encoder/decoder, text_embedding_projection, vocoder, per-channel
    stats, ...) are copied verbatim into the export. The reference keeps
    every component in ONE file (ModelLedger reads the VAE and connectors
    from the same path as the DiT), so a fine-tuned checkpoint that only
    replaced `model.diffusion_model.*` DiT keys would fail at VAE /
    text-encoder load.

    Fully streaming: the header is computed from shapes alone, DiT blocks
    are fetched from device one tensor at a time, and carried tensors are
    memory-mapped views copied file-to-file — peak host memory is one
    tensor, so a real ~40 GB export needs no checkpoint-sized RAM.
    """
    specs = list(iter_checkpoint_specs(params, dtype=dtype))
    dit_keys = {name for name, _d, _s, _p in specs}
    src = None
    try:
        if carry_from is not None:
            src = SafetensorsFile(carry_from)
            for key in src.keys():
                if key in dit_keys:
                    continue
                if (
                    key.endswith(".weight_scale")
                    and key.replace(".weight_scale", ".weight") in dit_keys
                ):
                    # The export re-emits this weight de-quantized (fp32/
                    # bf16); carrying the stale fp8 scale would make the
                    # loader "dequantize" the fine-tuned weight on reload,
                    # destroying it. Scales whose base weight is NOT
                    # re-emitted (connectors, VAE, ...) still carry.
                    continue
                dt, shape = src.info(key)
                specs.append((key, _SRC_DTYPES[dt], shape,
                              (lambda src=src, key=key: src.get(key))))
        write_safetensors_streaming(path, specs, metadata=metadata)
    finally:
        if src is not None:
            src.close()
