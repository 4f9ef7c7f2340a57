"""LoRA loading and fusion for the stacked DiT param tree.

Capability parity with reference LTX_2_MLX/loader/lora_loader.py: match
`lora_A/B` or `lora_down/up` pairs with optional `diffusion_model.` prefixes
(lora_loader.py:52-96), fuse W += strength * (B @ A) with strength in
[-2, 2], and support the two-stage pipeline's fuse -> run -> restore cycle
(two_stage.py:676-691,778-782) via delta-returning fusion.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ltx2_tpu.loader.safetensors_io import SafetensorsFile
from ltx2_tpu.loader.weight_loader import convert_checkpoint_key
from ltx2_tpu.ops.common import Params


@dataclass
class LoRAConfig:
    path: str
    strength: float = 1.0

    def __post_init__(self):
        if not -2.0 <= self.strength <= 2.0:
            raise ValueError(
                f"LoRA strength should be between -2.0 and 2.0, got {self.strength}"
            )


def load_lora_weights(path: str) -> Dict[str, np.ndarray]:
    f = SafetensorsFile(path)
    return {k: np.asarray(f.get(k), dtype=np.float32) for k in f.keys()}


_SUFFIX_PAIRS = [
    (".lora_A.weight", ".lora_B.weight"),
    (".lora_down.weight", ".lora_up.weight"),
    (".lora_A", ".lora_B"),
    (".lora_down", ".lora_up"),
]


def find_lora_keys_for_weight(
    lora_weights: Dict[str, np.ndarray], base_key: str
) -> Tuple[Optional[str], Optional[str]]:
    """Locate the (A, B) pair for a base weight key (lora_loader.py:52-96)."""
    prefix = base_key.replace(".weight", "")
    candidates = [prefix]
    if not prefix.startswith("diffusion_model."):
        candidates.append(f"diffusion_model.{prefix}")
    if prefix.startswith("model."):
        candidates.append(prefix.replace("model.", "diffusion_model.", 1))

    for cand in candidates:
        for suff_a, suff_b in _SUFFIX_PAIRS:
            key_a, key_b = f"{cand}{suff_a}", f"{cand}{suff_b}"
            if key_a in lora_weights and key_b in lora_weights:
                return key_a, key_b
    return None, None


def compute_lora_delta(
    lora_weights: Dict[str, np.ndarray], key_a: str, key_b: str, strength: float = 1.0
) -> np.ndarray:
    """delta = strength * (B @ A); A (rank, in), B (out, rank)."""
    return (lora_weights[key_b] @ lora_weights[key_a]) * strength


def collect_lora_deltas(
    lora_configs: List[LoRAConfig],
) -> Dict[str, np.ndarray]:
    """All LoRAs -> {checkpoint-style base key: summed fp32 delta}."""
    deltas: Dict[str, np.ndarray] = {}
    for config in lora_configs:
        weights = load_lora_weights(config.path)
        bases = set()
        for k in weights:
            for suff_a, _ in _SUFFIX_PAIRS:
                if k.endswith(suff_a):
                    bases.add(k[: -len(suff_a)])
        for base in bases:
            key_a, key_b = find_lora_keys_for_weight(weights, base + ".weight")
            if key_a is None:
                continue
            delta = compute_lora_delta(weights, key_a, key_b, config.strength)
            name = base + ".weight"
            deltas[name] = deltas.get(name, 0.0) + delta
    return deltas


_BLOCK_RE = re.compile(r"^transformer_blocks\.(\d+)\.(.+)$")


def _canonical_tree_key(lora_base_key: str) -> Optional[str]:
    """LoRA checkpoint key -> param-tree key path."""
    key = lora_base_key
    for prefix in ("diffusion_model.", "model.diffusion_model.", "transformer."):
        if key.startswith(prefix):
            key = key[len(prefix):]
    return convert_checkpoint_key(key, include_audio=True)


def fuse_lora_into_params(
    params: Params,
    lora_configs: List[LoRAConfig],
    return_deltas: bool = False,
):
    """Fuse LoRA deltas into the stacked param tree.

    W_final = W_base + sum_i strength_i * (B_i @ A_i), computed in fp32 and
    cast back to the base dtype. When `return_deltas` is True, also returns
    the applied {tree_path: (block_idx|None, delta)} map so the caller can
    subtract them later (weight restore around two-stage refinement) without
    keeping a second full copy of the model.
    """
    applied: Dict[str, Tuple[Optional[int], np.ndarray]] = {}
    deltas = collect_lora_deltas(lora_configs)

    # Pass 1 — resolve and VALIDATE every target before touching the tree:
    # raising mid-mutation would leave the caller's shared params partially
    # fused with no deltas to restore (review r4: two_stage's finally-block
    # never unfuses when the fuse itself raised).
    plan = []
    for lora_key, delta in deltas.items():
        tree_key = _canonical_tree_key(lora_key)
        if tree_key is None:
            continue
        m = _BLOCK_RE.match(tree_key)
        if m:
            block_idx: Optional[int] = int(m.group(1))
            path = f"transformer_blocks.{m.group(2)}"
        else:
            block_idx = None
            path = tree_key
        parts = path.split(".")
        node = params
        ok = True
        for part in parts[:-1]:
            if not isinstance(node, dict) or part not in node:
                ok = False
                break
            node = node[part]
        leaf_name = parts[-1]
        if not ok or not isinstance(node, dict) or leaf_name not in node:
            continue
        leaf = node[leaf_name]
        if leaf.dtype == jnp.float8_e4m3fn:
            raise ValueError(
                "Cannot fuse LoRA into fp8-serving weights (additive deltas "
                "need dequantized weights). Load the transformer with "
                "keep_fp8=False when LoRAs are in play."
            )
        if leaf.dtype == jnp.int8:
            raise ValueError(
                "Cannot fuse LoRA into int8 W8A8 weights (additive deltas "
                "need full-precision weights). Drop --int8 when a runtime "
                "LoRA fuse is in play (e.g. two-stage's stage-2 distilled "
                "LoRA); load-time --lora specs fuse BEFORE int8 and are "
                "fine."
            )
        expected = leaf.shape[1:] if block_idx is not None else leaf.shape
        if tuple(expected) != tuple(delta.shape):
            continue
        plan.append((node, leaf_name, path, block_idx, delta))

    # Pass 2 — mutate. Re-read each leaf: alias entries can target the
    # same leaf and must see the previous entry's update.
    for node, leaf_name, path, block_idx, delta in plan:
        leaf = node[leaf_name]
        d = jnp.asarray(delta, dtype=jnp.float32)
        if block_idx is not None:
            new = (leaf.at[block_idx].add(d.astype(leaf.dtype))
                   if leaf.dtype == jnp.float32
                   else leaf.at[block_idx].set(
                       (leaf[block_idx].astype(jnp.float32) + d).astype(leaf.dtype)))
        else:
            new = (leaf.astype(jnp.float32) + d).astype(leaf.dtype)
        node[leaf_name] = new
        # ACCUMULATE: two checkpoint-key aliases (with/without the
        # diffusion_model. prefix) can canonicalize to the same leaf; the
        # restore path must subtract the SUM of what was added.
        applied_key = path if block_idx is None else f"{path}@{block_idx}"
        if applied_key in applied:
            prev = applied[applied_key][1]
            applied[applied_key] = (block_idx, prev + np.asarray(delta))
        else:
            applied[applied_key] = (block_idx, delta)

    if return_deltas:
        return params, applied
    return params


def unfuse_lora_deltas(
    params: Params, applied: Dict[str, Tuple[Optional[int], np.ndarray]]
) -> Params:
    """Subtract previously applied deltas (restore original weights)."""
    for key, (block_idx, delta) in applied.items():
        path = key.split("@")[0]
        parts = path.split(".")
        node = params
        for part in parts[:-1]:
            node = node[part]
        leaf = node[parts[-1]]
        d = jnp.asarray(delta, dtype=jnp.float32)
        if block_idx is not None:
            node[parts[-1]] = leaf.at[block_idx].set(
                (leaf[block_idx].astype(jnp.float32) - d).astype(leaf.dtype)
            )
        else:
            node[parts[-1]] = (leaf.astype(jnp.float32) - d).astype(leaf.dtype)
    return params
