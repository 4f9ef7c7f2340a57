"""Test helpers: jitted model entry points (eager dispatch is pathologically
slow in this environment — every model call in tests MUST be jitted) and
reference-style checkpoint synthesis from param trees."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


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

from ltx2_tpu.loader.export import params_to_checkpoint  # noqa: E402,F401 — re-export; tests import it from here
