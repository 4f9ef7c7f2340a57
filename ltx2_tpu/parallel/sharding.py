"""Tensor-parallel sharding rules for the DiT param tree.

New TPU-first design (the reference has no distributed runtime, SURVEY.md
§2.12). Strategy: Megatron-style TP over the mesh 'model' axis —
column-parallel QKV/FFN-in (out-features sharded), row-parallel
out-projections (in-features sharded) — with GSPMD propagating activation
shardings and inserting the all-reduces over ICI. The CFG/STG row batch
shards over 'data'. One code path serves 1 chip and any slice.
"""

from __future__ import annotations

import re
from typing import Dict, List, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ltx2_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

# (regex over '/'-joined tree path, PartitionSpec) — first match wins.
# Block leaves carry a leading layer axis (lax.scan layout), hence the
# leading None in every transformer_blocks spec.
DIT_SHARDING_RULES: List[Tuple[str, P]] = [
    # Column-parallel: shard out-features of QKV / gate / FFN-in.
    (r"transformer_blocks/.*(to_q|to_k|to_v)/weight$", P(None, MODEL_AXIS, None)),
    (r"transformer_blocks/.*(to_q|to_k|to_v)/bias$", P(None, MODEL_AXIS)),
    (r"transformer_blocks/.*to_gate_logits/weight$", P(None, MODEL_AXIS, None)),
    (r"transformer_blocks/.*to_gate_logits/bias$", P(None, MODEL_AXIS)),
    (r"transformer_blocks/.*project_in/proj/weight$", P(None, MODEL_AXIS, None)),
    (r"transformer_blocks/.*project_in/proj/bias$", P(None, MODEL_AXIS)),
    (r"transformer_blocks/.*w_(up|gate)/weight$", P(None, MODEL_AXIS, None)),
    # Row-parallel: shard in-features of the output projections.
    (r"transformer_blocks/.*to_out/weight$", P(None, None, MODEL_AXIS)),
    (r"transformer_blocks/.*project_out/weight$", P(None, None, MODEL_AXIS)),
    (r"transformer_blocks/.*w_down/weight$", P(None, None, MODEL_AXIS)),
    # Q/K norms act on the sharded inner dim.
    (r"transformer_blocks/.*(q_norm|k_norm)/weight$", P(None, MODEL_AXIS)),
    # int8 W8A8 per-out-channel scales (loader/int8.py): column-parallel
    # targets shard the (L, out) scale with the out-features split;
    # row-parallel targets keep full-row scales -> replicate (default).
    (r"transformer_blocks/.*(to_q|to_k|to_v|project_in/proj|w_up|w_gate)/"
     r"weight_cscale$", P(None, MODEL_AXIS)),
    # LoRA adapters (training/lora.py) follow their base weight's split:
    # column-parallel targets shard B's out-features (A replicated),
    # row-parallel targets shard A's in-features (B replicated). Scales
    # replicate. Stacked (L, ...) layout => leading None.
    (r"transformer_blocks/.*(to_q|to_k|to_v|project_in/proj|w_up|w_gate)"
     r"/lora_B$",
     P(None, MODEL_AXIS, None)),
    (r"transformer_blocks/.*(to_out|project_out|w_down)/lora_A$",
     P(None, None, MODEL_AXIS)),
    # Everything else (AdaLN tables, biases of row-parallel layers, LoRA
    # A on column-parallel / B on row-parallel targets, lora_scale,
    # top-level projections, timestep MLPs) replicates.
]


def path_to_str(path) -> str:
    parts = []
    for k in path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return "/".join(parts)


def spec_for_path(path_str: str) -> P:
    for pattern, spec in DIT_SHARDING_RULES:
        if re.search(pattern, path_str):
            return spec
    return P()


def dit_param_shardings(mesh: Mesh, params) -> Dict:
    """Pytree of NamedShardings matching `params` structure."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, spec_for_path(path_to_str(path))),
        params,
    )


def shard_dit_params(mesh: Mesh, params):
    """Place the DiT param tree on the mesh according to the TP rules."""
    shardings = dit_param_shardings(mesh, params)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)


def data_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Batch-axis (CFG rows / samples) sharding for an activation tensor."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def tp_device_put(mesh: Mesh):
    """Loader `device_put` hook: checkpoint leaves land DIRECTLY on their TP
    shards as they stream in (no full-tree staging on one chip — required
    when the model does not fit a single device's HBM). `path` is the
    loader's '.'-joined tree path."""

    def put(path: str, arr):
        return jax.device_put(
            arr, NamedSharding(mesh, spec_for_path(path.replace(".", "/")))
        )

    return put


# ---------------------------------------------------------------------------
# Gemma-3 text encoder TP (12B: QKV/MLP sharded over 'model')
# ---------------------------------------------------------------------------

# Gemma param tree: layers/* leaves are stacked (L, ...) for the lax.scan.
# Column-parallel QKV + gate/up (out-features sharded = attention heads /
# MLP width), row-parallel o_proj/down (in-features sharded). The GQA
# grouping stays shard-local: q heads 16 / kv heads 8 share the same
# head-major layout, so jnp.repeat(k, groups) on the sharded head axis maps
# q-shard i onto kv-shard i. q_norm/k_norm are PER-HEAD (head_dim,) in Gemma
# (unlike the DiT's full-inner-dim norms) -> replicated.
GEMMA_SHARDING_RULES: List[Tuple[str, P]] = [
    (r"layers/self_attn/(q_proj|k_proj|v_proj)/weight$", P(None, MODEL_AXIS, None)),
    (r"layers/self_attn/o_proj/weight$", P(None, None, MODEL_AXIS)),
    (r"layers/mlp/(gate_proj|up_proj)/weight$", P(None, MODEL_AXIS, None)),
    (r"layers/mlp/down_proj/weight$", P(None, None, MODEL_AXIS)),
    # fp8-serving scales ride alongside their weights but are scalars per
    # layer -> replicate. Norms/embeddings replicate.
]


def gemma_spec_for_path(path_str: str) -> P:
    for pattern, spec in GEMMA_SHARDING_RULES:
        if re.search(pattern, path_str):
            return spec
    return P()


def gemma_param_shardings(mesh: Mesh, params) -> Dict:
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, gemma_spec_for_path(path_to_str(path))),
        params,
    )


def shard_gemma_params(mesh: Mesh, params):
    """Place the Gemma-3 param tree on the mesh according to the TP rules.

    Requires num_key_value_heads % mesh.shape['model'] == 0 (8 kv heads ->
    model axis up to 8)."""
    shardings = gemma_param_shardings(mesh, params)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
