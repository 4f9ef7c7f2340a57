"""Entry-point platform bootstrap.

This image's sitecustomize imports jax and registers a tunneled TPU plugin
BEFORE env vars are consulted, so JAX_PLATFORMS /
--xla_force_host_platform_device_count are silently ignored. Every script
entry point re-applies the caller's intent through jax.config (effective
as long as no backend has been initialized yet). One shared helper so the
regex/semantics can't drift between scripts.
"""

from __future__ import annotations

import os
import re


def apply_env_platform_overrides() -> None:
    if not os.environ.get("JAX_PLATFORMS"):
        return
    import jax

    try:
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
        m = re.search(
            r"xla_force_host_platform_device_count=(\d+)",
            os.environ.get("XLA_FLAGS", ""),
        )
        if m and os.environ["JAX_PLATFORMS"].startswith("cpu"):
            jax.config.update("jax_num_cpu_devices", int(m.group(1)))
    except Exception:
        pass  # backend already initialized; leave as-is
