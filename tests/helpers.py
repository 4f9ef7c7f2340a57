"""Test helpers: jitted model entry points (eager dispatch is pathologically
slow in this environment — every model call in tests MUST be jitted) and
reference-style checkpoint synthesis from param trees."""

from __future__ import annotations

import functools
import re
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def jitted_forward(cfg, perturbations=None, x0=False):
    """Cached jitted DiT forward for a (cfg, perturbations) pair."""
    from ltx2_tpu.models.transformer.model import ltx_model_apply, x0_model_apply

    fn = x0_model_apply if x0 else ltx_model_apply

    @jax.jit
    def fwd(params, video=None, audio=None):
        return fn(params, cfg, video=video, audio=audio, perturbations=perturbations)

    return fwd


@functools.lru_cache(maxsize=None)
def cached_params(cfg, seed: int = 0, dtype_name: str = "float32"):
    """Cached jitted random init for a config (shared across tests)."""
    from ltx2_tpu.models.transformer.model import init_ltx_model

    init = jax.jit(
        lambda key: init_ltx_model(key, cfg, dtype=jnp.dtype(dtype_name))
    )
    return init(jax.random.PRNGKey(seed))

# Inverse of the loader's KEY_REWRITE_RULES: tree key -> checkpoint key.
_INVERSE_RULES = [
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


def params_to_checkpoint(params, metadata=None) -> Dict[str, np.ndarray]:
    """Stacked DiT param tree -> flat reference-style checkpoint dict
    (model.diffusion_model.* keys, per-block unstacked)."""
    flat = _flatten(params)
    ckpt: Dict[str, np.ndarray] = {}
    for key, leaf in flat.items():
        arr = np.asarray(jnp.asarray(leaf, dtype=jnp.float32))
        if key.startswith("transformer_blocks."):
            sub = key[len("transformer_blocks."):]
            for i in range(arr.shape[0]):
                full = f"transformer_blocks.{i}.{sub}"
                for pat, repl in _INVERSE_RULES:
                    full = re.sub(pat, repl, full)
                ckpt[f"model.diffusion_model.{full}"] = arr[i]
        else:
            full = key
            for pat, repl in _INVERSE_RULES:
                full = re.sub(pat, repl, full)
            ckpt[f"model.diffusion_model.{full}"] = arr
    return ckpt
