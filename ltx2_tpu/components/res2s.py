"""Res2s exponential-integrator RK coefficients.

Capability parity with reference LTX_2_MLX/components/res2s.py. Pure host
float math — sigma schedules are static, so the coefficients are compile-time
constants for the jitted sampler.
"""

from __future__ import annotations

import math
from typing import Dict, Tuple


def phi(j: int, neg_h: float) -> float:
    """phi_j(z), z = -h: (e^z - sum_{k<j} z^k/k!) / z^j, with the Taylor
    limit phi_j(0) = 1/j! (res2s.py:10-35)."""
    if abs(neg_h) < 1e-10:
        return 1.0 / math.factorial(j)
    remainder = sum(neg_h**k / math.factorial(k) for k in range(j))
    return (math.exp(neg_h) - remainder) / (neg_h**j)


def get_res2s_coefficients(
    h: float,
    phi_cache: Dict[Tuple[int, float], float],
    c2: float = 0.5,
) -> Tuple[float, float, float]:
    """(a21, b1, b2) RK coefficients for log-space step h (res2s.py:38-79)."""

    def get_phi(j: int, neg_h: float) -> float:
        key = (j, neg_h)
        if key not in phi_cache:
            phi_cache[key] = phi(j, neg_h)
        return phi_cache[key]

    a21 = c2 * get_phi(1, -h * c2)
    b2 = get_phi(2, -h) / c2
    b1 = get_phi(1, -h) - b2
    return a21, b1, b2
