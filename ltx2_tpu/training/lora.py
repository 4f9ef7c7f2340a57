"""LoRA adapters for fine-tuning: add, train, export in the REFERENCE format.

Low-rank adapters attach to selected linears in the param tree as
`lora_A` (r, in) / `lora_B` (out, r) / `lora_scale` () leaves —
`ops.common.linear` applies y += scale * (x A^T) B^T whenever they are
present (zero cost otherwise: the check is trace-time). B initializes to
zero (standard LoRA: the adapted model starts EXACTLY at the base model),
A to N(0, 1/r) — std 1/sqrt(r), the standard LoRA variance scaling.

Export writes the reference LoRA checkpoint format —
`diffusion_model.<base>.lora_A.weight` / `.lora_B.weight` pairs with the
scale baked into B — so a trained adapter loads straight back through
`--lora` (loader/lora.py's fuse W += strength * (B @ A)) in this repo AND
in the reference implementation.
"""

from __future__ import annotations

import re
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

# Default targets: every attention projection + FFN linears in the blocks.
DEFAULT_TARGETS = (
    r"transformer_blocks/.*(to_q|to_k|to_v|to_out|project_in/proj|project_out)$"
)


def _iter_linear_nodes(tree, path=""):
    """Yield (path, node) for dict nodes that look like linear layers."""
    for k, v in tree.items():
        sub = f"{path}/{k}" if path else k
        if isinstance(v, dict):
            if "weight" in v and not isinstance(v["weight"], dict):
                yield sub, v
            yield from _iter_linear_nodes(v, sub)


def add_lora_params(
    key: jax.Array,
    params,
    rank: int = 16,
    alpha: float = 16.0,
    targets: str = DEFAULT_TARGETS,
):
    """Return a copy of `params` with LoRA leaves on matching linears.

    Stacked block leaves (L, out, in) get stacked adapters (L, r, in) /
    (L, out, r) so they ride the same lax.scan. Returns (params, n_added).
    """
    pat = re.compile(targets)
    params = jax.tree_util.tree_map(lambda x: x, params)  # shallow-safe copy

    def visit(node, path, key):
        n = 0
        for k in list(node.keys()):
            v = node[k]
            sub = f"{path}/{k}" if path else k
            if isinstance(v, dict):
                if (
                    "weight" in v
                    and not isinstance(v["weight"], dict)
                    and pat.search(sub)
                    and getattr(v["weight"], "ndim", 0) in (2, 3)
                ):
                    key, k_a = jax.random.split(key)
                    w = v["weight"]
                    if w.ndim == 3:  # stacked (L, out, in) scan layout:
                        # every leaf needs the leading L axis (incl. the
                        # scale — the block scan slices ALL xs on axis 0).
                        layers, out, inp = w.shape
                        a_shape, b_shape = (layers, rank, inp), (layers, out, rank)
                        scale = jnp.full((layers,), alpha / rank, jnp.float32)
                    else:
                        out, inp = w.shape
                        a_shape, b_shape = (rank, inp), (out, rank)
                        scale = jnp.asarray(alpha / rank, jnp.float32)
                    v["lora_A"] = (
                        jax.random.normal(k_a, a_shape, jnp.float32)
                        / jnp.sqrt(rank)
                    )
                    v["lora_B"] = jnp.zeros(b_shape, jnp.float32)
                    v["lora_scale"] = scale
                    n += 1
                else:
                    key, n_sub = visit(v, sub, key)
                    n += n_sub
        return key, n

    _, n_added = visit(params, "", key)
    return params, n_added


def lora_trainable_mask(params):
    """Train ONLY the adapter matrices (scale stays frozen)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: any(
            getattr(k, "key", None) in ("lora_A", "lora_B") for k in path
        ),
        params,
    )


def strip_lora_params(params):
    """Remove LoRA leaves (e.g. before exporting the base checkpoint)."""
    def visit(node):
        out = {}
        for k, v in node.items():
            if k in ("lora_A", "lora_B", "lora_scale"):
                continue
            out[k] = visit(v) if isinstance(v, dict) else v
        return out

    return visit(params)


def export_lora_checkpoint(
    path: str, params, metadata: Optional[Dict[str, str]] = None
) -> None:
    """Write the trained adapters as a reference-format LoRA safetensors.

    Keys: diffusion_model.<reference base key>.lora_A.weight / .lora_B.weight
    with the alpha/rank scale baked into B, so the standard fuse
    W += strength * (B @ A) reproduces the trained model at strength 1.
    """
    from ltx2_tpu.loader.export import INVERSE_KEY_RULES
    from ltx2_tpu.loader.safetensors_io import write_safetensors

    tensors: Dict[str, np.ndarray] = {}

    def emit(base_key: str, a, b, scale):
        # The rewrite rules match with trailing-dot context (they rewrite
        # full checkpoint keys); pad the module-name-terminated base key so
        # e.g. `.to_out.` matches, then strip the pad.
        base_key = base_key + "."
        for pat, repl in INVERSE_KEY_RULES:
            base_key = re.sub(pat, repl, base_key)
        base_key = base_key[:-1]
        tensors[f"diffusion_model.{base_key}.lora_A.weight"] = np.asarray(
            a, np.float32
        )
        tensors[f"diffusion_model.{base_key}.lora_B.weight"] = (
            np.asarray(b, np.float32) * float(scale)
        )

    for node_path, node in _iter_linear_nodes(params):
        if "lora_A" not in node:
            continue
        a = np.asarray(jnp.asarray(node["lora_A"], jnp.float32))
        b = np.asarray(jnp.asarray(node["lora_B"], jnp.float32))
        scale = float(np.asarray(node["lora_scale"]).reshape(-1)[0])
        dotted = node_path.replace("/", ".")
        if dotted.startswith("transformer_blocks."):
            sub = dotted[len("transformer_blocks."):]
            for i in range(a.shape[0]):
                emit(f"transformer_blocks.{i}.{sub}", a[i], b[i], scale)
        else:
            emit(dotted, a, b, scale)

    if not tensors:
        raise ValueError("no LoRA adapters found in the param tree")
    write_safetensors(path, tensors, metadata=metadata)
