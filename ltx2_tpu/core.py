"""Core numerical utilities.

Capability parity with reference LTX_2_MLX/core_utils.py. All functions are
pure and jit-safe: sigma may be a traced scalar (the reference coerces to a
Python float, which would force host sync under jit).
"""

from __future__ import annotations

from typing import Any, Union

import jax.numpy as jnp

Scalar = Union[float, jnp.ndarray]


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray | None = None, eps: float = 1e-6) -> jnp.ndarray:
    """RMS-normalize `x` over its last dim; fp32 accumulation, input dtype out.

    XLA fuses this chain into a single kernel on TPU; no custom kernel needed
    (reference used mx.fast.rms_norm, core_utils.py:8-24).
    """
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    scale = jnp.reciprocal(jnp.sqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps))
    out = xf * scale
    if weight is not None:
        out = out * weight.astype(jnp.float32)
    return out.astype(dtype)


def check_config_value(config: dict, key: str, expected: Any) -> None:
    actual = config.get(key)
    if actual != expected:
        raise ValueError(f"Config value {key} is {actual}, expected {expected}")


def to_velocity(sample: jnp.ndarray, sigma: Scalar, denoised_sample: jnp.ndarray) -> jnp.ndarray:
    """velocity = (x - x0) / sigma, computed in fp32 (core_utils.py:34-63)."""
    v = (sample.astype(jnp.float32) - denoised_sample.astype(jnp.float32)) / sigma
    return v.astype(sample.dtype)


def to_denoised(sample: jnp.ndarray, velocity: jnp.ndarray, sigma: Scalar) -> jnp.ndarray:
    """x0 = x - sigma * v, computed in fp32 (core_utils.py:66-94)."""
    d = sample.astype(jnp.float32) - velocity.astype(jnp.float32) * sigma
    return d.astype(sample.dtype)
