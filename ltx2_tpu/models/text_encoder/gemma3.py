"""Gemma-3-12B text encoder (functional, TPU-native).

Capability parity with reference LTX_2_MLX/model/text_encoder/gemma3.py:
48 layers — 40 sliding-window (1024, theta 10k, no scaling) + 8 full
attention (every 6th layer, theta 1M, linear scaling 8.0) — GQA 16 Q /
8 KV heads x 256 d, RMSNorm with Gemma (1 + weight) offset, 4 norms per
block, SiLU-gated MLP, and hidden states of ALL 49 layers returned
(embeddings + 48 layer inputs' successors, final normed last).

Masking follows the reference's boolean-mask semantics (gemma3.py:357-382):
causal AND padding (AND window for sliding layers), lowered to a finite
additive mask so fully-padded rows soften to uniform attention instead of
NaN.

TPU-first: the 48 layers run as ONE lax.scan over stacked params; the
sliding/full distinction is a per-layer flag selecting between two
precomputed RoPE tables and two masks inside the scan. Collected ys give
the 49 hidden states without Python-loop accumulation. Runs fp32 by default
(text-encoder drift poisons everything downstream, SURVEY.md hard-part #3).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ltx2_tpu.ops.attention import sdpa
from ltx2_tpu.ops.common import Params, linear, silu_mul

# Every 6th layer (5, 11, ..., 47) is full attention (gemma3.py:29-33).
GEMMA3_LAYER_TYPES = tuple(
    "sliding_attention" if (i % 6 != 5) else "full_attention" for i in range(48)
)


@dataclass(frozen=True)
class Gemma3Config:
    vocab_size: int = 262208
    hidden_size: int = 3840
    intermediate_size: int = 15360
    num_hidden_layers: int = 48
    num_attention_heads: int = 16
    num_key_value_heads: int = 8
    head_dim: int = 256
    rms_norm_eps: float = 1e-6
    max_position_embeddings: int = 131072
    sliding_window: int = 1024
    sliding_rope_theta: float = 10000.0
    sliding_rope_scaling_factor: float = 1.0
    full_rope_theta: float = 1000000.0
    full_rope_scaling_factor: float = 8.0
    layer_types: Tuple[str, ...] = GEMMA3_LAYER_TYPES
    compute_dtype: str = "float32"

    @property
    def dtype(self):
        return jnp.dtype(self.compute_dtype)

    @staticmethod
    def tiny(**kwargs) -> "Gemma3Config":
        """Small config for tests."""
        defaults = dict(
            vocab_size=128,
            hidden_size=32,
            intermediate_size=64,
            num_hidden_layers=6,
            num_attention_heads=4,
            num_key_value_heads=2,
            head_dim=8,
            sliding_window=4,
            layer_types=tuple(
                "sliding_attention" if (i % 6 != 5) else "full_attention"
                for i in range(6)
            ),
        )
        defaults.update(kwargs)
        return Gemma3Config(**defaults)


def gemma_rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """RMSNorm with Gemma (1 + weight) offset (gemma3.py:58-64); fp32 math."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    normed = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (normed * (1.0 + weight.astype(jnp.float32))).astype(dtype)


def rope_tables(
    positions: jnp.ndarray, head_dim: int, base: float, scaling_factor: float
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin (S, head_dim/2) with linear position scaling (gemma3.py:79-114)."""
    inv_freq = 1.0 / (
        base ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    pos = positions.astype(jnp.float32) / scaling_factor
    freqs = pos[:, None] * inv_freq[None, :]
    return jnp.cos(freqs), jnp.sin(freqs)


def apply_rotary_pos_emb(
    q: jnp.ndarray, k: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Half-split rotation on (B, H, S, D) tensors (gemma3.py:117-139).

    Rotation math in fp32 (cos/sin tables are fp32), result restored to the
    input dtype so bf16 serving keeps a bf16 activation stream."""
    cos = cos[None, None]
    sin = sin[None, None]

    def rot(x):
        xf = x.astype(jnp.float32)
        x1, x2 = jnp.split(xf, 2, axis=-1)
        out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
        return out.astype(x.dtype)

    return rot(q), rot(k)


def _attention(
    p: Params,
    cfg: Gemma3Config,
    x: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    cos: jnp.ndarray,
    sin: jnp.ndarray,
) -> jnp.ndarray:
    """GQA attention with per-head Q/K RMSNorm (gemma3.py:142-241)."""
    b, s, _ = x.shape
    h, kv, d = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim

    q = linear(p["q_proj"], x).reshape(b, s, h, d)
    k = linear(p["k_proj"], x).reshape(b, s, kv, d)
    v = linear(p["v_proj"], x).reshape(b, s, kv, d)

    q = gemma_rms_norm(q, p["q_norm"]["weight"], cfg.rms_norm_eps)
    k = gemma_rms_norm(k, p["k_norm"]["weight"], cfg.rms_norm_eps)

    q = q.transpose(0, 2, 1, 3)
    k = k.transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)

    q, k = apply_rotary_pos_emb(q, k, cos, sin)

    groups = h // kv
    if groups > 1:
        # Deliberate: expanding K/V to full heads keeps sdpa's flash-kernel
        # dispatch (the Pallas kernel needs matched Q/KV head counts). A
        # "repeat-free" grouped einsum would drop to the unfused dense path
        # and lose more than the duplicated KV reads cost — measured: the
        # encode phase runs at 80-85% of the matmul roofline as is.
        k = jnp.repeat(k, groups, axis=1)
        v = jnp.repeat(v, groups, axis=1)

    out = sdpa(q, k, v, mask=mask, scale=cfg.head_dim**-0.5)
    out = out.transpose(0, 2, 1, 3).reshape(b, s, h * d)
    return linear(p["o_proj"], out)


def _mlp(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    return linear(p["down_proj"], silu_mul(linear(p["gate_proj"], x), linear(p["up_proj"], x)))


def _layer(
    p: Params,
    cfg: Gemma3Config,
    x: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    cos: jnp.ndarray,
    sin: jnp.ndarray,
) -> jnp.ndarray:
    """One decoder layer with 4 norms (gemma3.py:258-293)."""
    residual = x
    h = gemma_rms_norm(x, p["input_layernorm"]["weight"], cfg.rms_norm_eps)
    h = _attention(p["self_attn"], cfg, h, mask, cos, sin)
    h = gemma_rms_norm(h, p["post_attention_layernorm"]["weight"], cfg.rms_norm_eps)
    x = residual + h

    residual = x
    h = gemma_rms_norm(x, p["pre_feedforward_layernorm"]["weight"], cfg.rms_norm_eps)
    h = _mlp(p["mlp"], h)
    h = gemma_rms_norm(h, p["post_feedforward_layernorm"]["weight"], cfg.rms_norm_eps)
    return residual + h


def _build_masks(
    cfg: Gemma3Config,
    attention_mask: Optional[jnp.ndarray],
    seq_len: int,
    dtype,
) -> Tuple[Optional[jnp.ndarray], Optional[jnp.ndarray]]:
    """(full, sliding) additive masks from the boolean mask recipe
    (gemma3.py:357-382): causal AND padding [AND window]. Lowered to finite
    additive values so all-padded query rows degrade to uniform attention
    rather than NaN.

    attention_mask=None means "no padding", NOT "no mask" (review r4):
    Gemma is decoder-only, so the causal and sliding-window structure must
    apply regardless — returning (None, None) here ran the model fully
    bidirectionally for unpadded callers, silently diverging from HF."""
    row = jnp.arange(seq_len)[:, None]
    col = jnp.arange(seq_len)[None, :]
    causal = col <= row  # (S, S)
    if attention_mask is None:
        full_bool = jnp.broadcast_to(causal[None, None], (1, 1, seq_len, seq_len))
    else:
        pad = attention_mask.astype(bool)[:, None, None, :]  # (B, 1, 1, S)
        full_bool = causal[None, None] & pad
    window = (row - col) < cfg.sliding_window
    sliding_bool = full_bool & window[None, None]

    neg = jnp.asarray(-0.7 * float(jnp.finfo(dtype).max), dtype)
    full = jnp.where(full_bool, jnp.zeros((), dtype), neg)
    sliding = jnp.where(sliding_bool, jnp.zeros((), dtype), neg)
    return full, sliding


def gemma3_apply(
    params: Params,
    cfg: Gemma3Config,
    input_ids: jnp.ndarray,
    attention_mask: Optional[jnp.ndarray] = None,
    position_ids: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Forward pass -> (last_hidden_state, all_hidden_states).

    all_hidden_states is (49, B, S, D): embeddings + state before each layer
    1..47 + final normed (gemma3.py:323-407 collection semantics).
    """
    _b, seq_len = input_ids.shape
    if position_ids is None:
        position_ids = jnp.arange(seq_len, dtype=jnp.int32)
    elif position_ids.ndim == 2:
        position_ids = position_ids[0]

    dtype = cfg.dtype
    x = params["embed_tokens"]["weight"][input_ids].astype(dtype)
    x = x * jnp.asarray(cfg.hidden_size**0.5, dtype)

    full_mask, sliding_mask = _build_masks(cfg, attention_mask, seq_len, dtype)

    cos_s, sin_s = rope_tables(
        position_ids, cfg.head_dim, cfg.sliding_rope_theta, cfg.sliding_rope_scaling_factor
    )
    cos_f, sin_f = rope_tables(
        position_ids, cfg.head_dim, cfg.full_rope_theta, cfg.full_rope_scaling_factor
    )

    is_full = jnp.asarray(
        [1.0 if t == "full_attention" else 0.0 for t in cfg.layer_types], jnp.float32
    )

    def layer_step(carry, xs):
        layer_params, full_flag = xs
        cos = jnp.where(full_flag > 0, cos_f, cos_s)
        sin = jnp.where(full_flag > 0, sin_f, sin_s)
        if full_mask is not None:
            mask = jnp.where(full_flag > 0, full_mask, sliding_mask)
        else:
            mask = None
        out = _layer(layer_params, cfg, carry, mask, cos, sin)
        return out, carry  # ys collect the PRE-layer state

    (final, pre_states) = jax.lax.scan(
        layer_step, x, (params["layers"], is_full)
    )
    final = gemma_rms_norm(final, params["norm"]["weight"], cfg.rms_norm_eps)

    all_hidden = jnp.concatenate([pre_states, final[None]], axis=0)
    return final, all_hidden


def init_gemma3(key: jax.Array, cfg: Gemma3Config, dtype=None) -> Params:
    """Random init with stacked layers (tests; real use loads HF shards)."""
    if dtype is None:
        dtype = cfg.dtype
    ks = jax.random.split(key, 4)
    h, inter = cfg.hidden_size, cfg.intermediate_size
    qd = cfg.num_attention_heads * cfg.head_dim
    kvd = cfg.num_key_value_heads * cfg.head_dim

    def w(k, shape, scale=0.02):
        return jax.random.normal(k, shape, dtype) * scale

    def layer_init(k):
        kk = jax.random.split(k, 7)
        return {
            "self_attn": {
                "q_proj": {"weight": w(kk[0], (qd, h))},
                "k_proj": {"weight": w(kk[1], (kvd, h))},
                "v_proj": {"weight": w(kk[2], (kvd, h))},
                "o_proj": {"weight": w(kk[3], (h, qd))},
                "q_norm": {"weight": jnp.zeros((cfg.head_dim,), dtype)},
                "k_norm": {"weight": jnp.zeros((cfg.head_dim,), dtype)},
            },
            "mlp": {
                "gate_proj": {"weight": w(kk[4], (inter, h))},
                "up_proj": {"weight": w(kk[5], (inter, h))},
                "down_proj": {"weight": w(kk[6], (h, inter))},
            },
            "input_layernorm": {"weight": jnp.zeros((h,), dtype)},
            "post_attention_layernorm": {"weight": jnp.zeros((h,), dtype)},
            "pre_feedforward_layernorm": {"weight": jnp.zeros((h,), dtype)},
            "post_feedforward_layernorm": {"weight": jnp.zeros((h,), dtype)},
        }

    layer_keys = jax.random.split(ks[0], cfg.num_hidden_layers)
    layers = [layer_init(k) for k in layer_keys]
    return {
        "embed_tokens": {"weight": w(ks[1], (cfg.vocab_size, h), 1.0)},
        "layers": jax.tree_util.tree_map(lambda *ls: jnp.stack(ls, 0), *layers),
        "norm": {"weight": jnp.zeros((h,), dtype)},
    }


def load_gemma3_params(
    weights_dir: str,
    cfg: Gemma3Config,
    target_dtype: str = "float32",
    quantize_fp8: bool = False,
) -> Params:
    """Load HF Gemma-3 shards (language_model.model.* keys,
    gemma3.py:410-511) into the stacked-layer param tree.

    quantize_fp8: serving mode — matmul weights are quantized to fp8-E4M3
    with per-tensor scales ON THE HOST during streaming (peak host memory
    stays one-tensor-sized) and dequantized at use inside `linear()`.
    Norms stay fp32; embeddings go bf16. 12B lands at ~12.5 GB HBM, which
    fits a single 16 GB chip — impossible at the reference's fp32 (48 GB).
    """
    from pathlib import Path

    import ml_dtypes
    import numpy as np

    from ltx2_tpu.loader.safetensors_io import SafetensorsFile

    shards = sorted(Path(weights_dir).glob("model-*.safetensors"))
    if not shards:
        raise FileNotFoundError(f"No safetensors files found in {weights_dir}")

    np_dtype = (
        ml_dtypes.bfloat16 if target_dtype == "bfloat16" else np.dtype(target_dtype)
    )
    FP8_MAX = 448.0
    # Multimodal Gemma-3 bundles use `language_model.model.*`
    # (the layout the reference consumes, gemma3.py:455-467); text-only
    # Gemma3ForCausalLM checkpoints use `model.*`. Accept both.
    first_keys = SafetensorsFile(str(shards[0])).keys()
    prefix = (
        "language_model.model."
        if any(k.startswith("language_model.model.") for k in first_keys)
        else "model."
    )
    flat: Dict[str, np.ndarray] = {}
    for shard in shards:
        f = SafetensorsFile(str(shard))
        for key in f.keys():
            if not key.startswith(prefix):
                continue
            short = key[len(prefix):]
            arr = np.asarray(f.get(key))
            if quantize_fp8 and short.endswith("proj.weight"):
                a32 = arr.astype(np.float32)
                scale = max(float(np.abs(a32).max()) / FP8_MAX, 1e-12)
                flat[short] = (a32 / scale).astype(ml_dtypes.float8_e4m3fn)
                flat[short + "_scale"] = np.float32(scale)
            elif quantize_fp8 and "embed_tokens" in short:
                flat[short] = arr.astype(ml_dtypes.bfloat16)
            else:
                flat[short] = arr.astype(np_dtype)

    per_layer: Dict[int, Dict[str, np.ndarray]] = {}
    top: Dict[str, np.ndarray] = {}
    for key, arr in flat.items():
        if key.startswith("layers."):
            parts = key.split(".")
            idx = int(parts[1])
            per_layer.setdefault(idx, {})[".".join(parts[2:])] = arr
        else:
            top[key] = arr

    def nest(flat_dict):
        tree: Params = {}
        for key, arr in flat_dict.items():
            node = tree
            parts = key.split(".")
            for part in parts[:-1]:
                node = node.setdefault(part, {})
            node[parts[-1]] = jnp.asarray(arr)
        return tree

    n = cfg.num_hidden_layers
    stacked = {}
    sub_keys = sorted(per_layer[0].keys())
    for sub in sub_keys:
        stacked[sub] = np.stack([per_layer[i][sub] for i in range(n)], axis=0)

    params = nest(top)
    params["layers"] = nest(stacked)
    return params
