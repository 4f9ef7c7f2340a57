"""3D rotary position embeddings (RoPE) for the LTX-2 DiT.

Capability parity with reference LTX_2_MLX/model/transformer/rope.py: both
INTERLEAVED (adjacent-pair rotation) and SPLIT (half-rotation — used by
LTX-2, model.py:455) formats, log-spaced frequency grids (with the float64
variant required for V2.3 parity), fractional midpoint positions scaled to
[-1, 1], and identity padding at the *front* for non-RoPE dims.

The frequency grid is computed host-side (numpy, cached) because it is a
static function of (theta, max_pos_count, dim); cos/sin tables are computed
in-graph so they fuse with the surrounding attention preprocessing.
"""

from __future__ import annotations

import math
from enum import Enum
from functools import lru_cache
from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np


class LTXRopeType(Enum):
    INTERLEAVED = "interleaved"
    SPLIT = "split"


def apply_rotary_emb(
    input_tensor: jnp.ndarray,
    freqs_cis: Tuple[jnp.ndarray, jnp.ndarray],
    rope_type: LTXRopeType = LTXRopeType.INTERLEAVED,
) -> jnp.ndarray:
    if rope_type == LTXRopeType.INTERLEAVED:
        return apply_interleaved_rotary_emb(input_tensor, freqs_cis[0], freqs_cis[1])
    elif rope_type == LTXRopeType.SPLIT:
        return apply_split_rotary_emb(input_tensor, freqs_cis[0], freqs_cis[1])
    raise ValueError(f"Invalid rope type: {rope_type}")


def apply_interleaved_rotary_emb(
    input_tensor: jnp.ndarray,
    cos_freqs: jnp.ndarray,
    sin_freqs: jnp.ndarray,
) -> jnp.ndarray:
    """Pair-rotation RoPE: pairs (d0,d1),(d2,d3),... rotate together
    (rope.py:51-89). One fused elementwise chain under XLA."""
    dtype = input_tensor.dtype
    x = input_tensor.astype(jnp.float32)
    shape = x.shape
    pairs = x.reshape(*shape[:-1], shape[-1] // 2, 2)
    t1 = pairs[..., 0]
    t2 = pairs[..., 1]
    rotated = jnp.stack([-t2, t1], axis=-1).reshape(shape)
    out = x * cos_freqs.astype(jnp.float32) + rotated * sin_freqs.astype(jnp.float32)
    return out.astype(dtype)


def apply_split_rotary_emb(
    input_tensor: jnp.ndarray,
    cos_freqs: jnp.ndarray,
    sin_freqs: jnp.ndarray,
) -> jnp.ndarray:
    """Half-rotation RoPE: first half rotates with second half
    (rope.py:92-144). cos/sin are (B, H, T, D/2)."""
    dtype = input_tensor.dtype
    x = input_tensor.astype(jnp.float32)
    cos_freqs = cos_freqs.astype(jnp.float32)
    sin_freqs = sin_freqs.astype(jnp.float32)

    needs_reshape = False
    if x.ndim != 4 and cos_freqs.ndim == 4:
        # Batch/tokens come from the INPUT; only the head count comes from
        # the table (the connector precomputes cos/sin at batch 1 and
        # broadcasts — reference rope.py:114-119 reads b from cos, which
        # silently assumes batch-1 tables for flat inputs).
        b, t = x.shape[0], x.shape[1]
        h = cos_freqs.shape[1]
        x = x.reshape(b, t, h, -1).transpose(0, 2, 1, 3)
        needs_reshape = True

    dim = x.shape[-1]
    split = x.reshape(*x.shape[:-1], 2, dim // 2)
    first = split[..., 0, :]
    second = split[..., 1, :]

    first_out = first * cos_freqs - second * sin_freqs
    second_out = second * cos_freqs + first * sin_freqs

    out = jnp.stack([first_out, second_out], axis=-2)
    out = out.reshape(*out.shape[:-2], dim)

    if needs_reshape:
        b, h, t, d = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, t, h * d)
    return out.astype(dtype)


@lru_cache(maxsize=8)
def _freq_grid_host(
    theta: float, max_pos_count: int, inner_dim: int, use_double_precision: bool
) -> np.ndarray:
    """Log-spaced frequency indices * pi/2 (rope.py:147-211). float64 path is
    bit-matching the reference's generate_freq_grid_np (required for V2.3)."""
    n_elem = 2 * max_pos_count
    num = inner_dim // n_elem
    dtype = np.float64 if use_double_precision else np.float32
    log_start = np.log(1.0) / np.log(theta)
    log_end = np.log(theta) / np.log(theta)
    pow_indices = np.power(theta, np.linspace(log_start, log_end, num, dtype=dtype))
    return (pow_indices * math.pi / 2).astype(np.float32)


def generate_freq_grid(
    positional_embedding_theta: float,
    positional_embedding_max_pos_count: int,
    inner_dim: int,
    use_double_precision: bool = False,
) -> jnp.ndarray:
    return jnp.asarray(
        _freq_grid_host(
            float(positional_embedding_theta),
            int(positional_embedding_max_pos_count),
            int(inner_dim),
            bool(use_double_precision),
        )
    )


# Reference-compatible alias for the f64 variant (rope.py:147-178).
def generate_freq_grid_np(theta: float, max_pos_count: int, inner_dim: int) -> jnp.ndarray:
    return generate_freq_grid(theta, max_pos_count, inner_dim, use_double_precision=True)


def get_fractional_positions(
    indices_grid: jnp.ndarray, max_pos: List[int]
) -> jnp.ndarray:
    """(B, n_dims, T) indices -> (B, T, n_dims) fractional positions in [0,1]
    (rope.py:214-239)."""
    n_pos_dims = indices_grid.shape[1]
    assert n_pos_dims == len(max_pos)
    scale = jnp.asarray(max_pos, dtype=jnp.float32).reshape(1, n_pos_dims, 1)
    fractional = indices_grid.astype(jnp.float32) / scale
    return fractional.transpose(0, 2, 1)


def generate_freqs(
    indices: jnp.ndarray,
    indices_grid: jnp.ndarray,
    max_pos: List[int],
    use_middle_indices_grid: bool,
) -> jnp.ndarray:
    """Positions -> per-token frequencies, flattened (B, T, n_freq*n_dims)
    (rope.py:242-289). Midpoint of (start, end) bounds when requested."""
    if use_middle_indices_grid:
        assert indices_grid.ndim == 4 and indices_grid.shape[-1] == 2
        indices_grid = (indices_grid[..., 0] + indices_grid[..., 1]) / 2.0
    elif indices_grid.ndim == 4:
        indices_grid = indices_grid[..., 0]

    fractional = get_fractional_positions(indices_grid, max_pos)  # (B, T, n_dims)
    scaled = fractional * 2 - 1  # [-1, 1]
    freqs = indices[None, None, None, :] * scaled[..., None]  # (B, T, n_dims, n_freq)
    freqs = freqs.transpose(0, 1, 3, 2)  # (B, T, n_freq, n_dims)
    return freqs.reshape(freqs.shape[0], freqs.shape[1], -1)


def split_freqs_cis(
    freqs: jnp.ndarray, pad_size: int, num_attention_heads: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin for SPLIT format, identity padding at the FRONT, reshaped to
    (B, H, T, D_head/2) (rope.py:292-328)."""
    cos_freq = jnp.cos(freqs)
    sin_freq = jnp.sin(freqs)
    if pad_size != 0:
        b, t, _ = cos_freq.shape
        cos_freq = jnp.concatenate(
            [jnp.ones((b, t, pad_size), cos_freq.dtype), cos_freq], axis=-1
        )
        sin_freq = jnp.concatenate(
            [jnp.zeros((b, t, pad_size), sin_freq.dtype), sin_freq], axis=-1
        )
    b, t, _ = cos_freq.shape
    cos_freq = cos_freq.reshape(b, t, num_attention_heads, -1).transpose(0, 2, 1, 3)
    sin_freq = sin_freq.reshape(b, t, num_attention_heads, -1).transpose(0, 2, 1, 3)
    return cos_freq, sin_freq


def interleaved_freqs_cis(
    freqs: jnp.ndarray, pad_size: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin for INTERLEAVED format: repeat-interleave x2, identity pad at
    the front (rope.py:331-362)."""
    cos_freq = jnp.repeat(jnp.cos(freqs), 2, axis=-1)
    sin_freq = jnp.repeat(jnp.sin(freqs), 2, axis=-1)
    if pad_size != 0:
        b, t = cos_freq.shape[:2]
        cos_freq = jnp.concatenate(
            [jnp.ones((b, t, pad_size), cos_freq.dtype), cos_freq], axis=-1
        )
        sin_freq = jnp.concatenate(
            [jnp.zeros((b, t, pad_size), sin_freq.dtype), sin_freq], axis=-1
        )
    return cos_freq, sin_freq


def precompute_freqs_cis(
    indices_grid: jnp.ndarray,
    dim: int,
    out_dtype=jnp.float32,
    theta: float = 10000.0,
    max_pos: Optional[List[int]] = None,
    use_middle_indices_grid: bool = False,
    num_attention_heads: int = 32,
    rope_type: LTXRopeType = LTXRopeType.INTERLEAVED,
    use_double_precision: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full RoPE table precompute (rope.py:365-418)."""
    if max_pos is None:
        max_pos = [20, 2048, 2048]

    n_pos_dims = indices_grid.shape[1]
    indices = generate_freq_grid(theta, n_pos_dims, dim, use_double_precision)
    freqs = generate_freqs(indices, indices_grid, max_pos, use_middle_indices_grid)

    if rope_type == LTXRopeType.SPLIT:
        pad_size = dim // 2 - freqs.shape[-1]
        cos_freq, sin_freq = split_freqs_cis(freqs, pad_size, num_attention_heads)
    else:
        n_elem = 2 * n_pos_dims
        cos_freq, sin_freq = interleaved_freqs_cis(freqs, dim % n_elem)

    return cos_freq.astype(out_dtype), sin_freq.astype(out_dtype)


def create_position_grid(
    batch_size: int, frames: int, height: int, width: int
) -> jnp.ndarray:
    """(B, 3, F*H*W) integer position grid (rope.py:421-457)."""
    t_grid, h_grid, w_grid = np.meshgrid(
        np.arange(frames), np.arange(height), np.arange(width), indexing="ij"
    )
    positions = np.stack([t_grid.ravel(), h_grid.ravel(), w_grid.ravel()], axis=0)
    positions = np.broadcast_to(
        positions[None], (batch_size, 3, frames * height * width)
    )
    return jnp.asarray(positions, dtype=jnp.int32)
