"""Test configuration: run on a virtual 8-device CPU mesh.

Mirrors the reference's marker-by-path convention (reference:
tests/conftest.py:106-117) and adds the TPU-build-specific virtual mesh so
TP/SP/DP shardings are exercised without real multi-chip hardware.
"""

import os

# Must be set before jax import. Force CPU: the ambient environment sets
# JAX_PLATFORMS=axon (a tunneled TPU), which would make every test dispatch
# over the network.
os.environ["JAX_PLATFORMS"] = "cpu"
# Avoid routing XLA compiles through the TPU tunnel plugin.
os.environ["PALLAS_AXON_REMOTE_COMPILE"] = "0"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
# Parallel LLVM codegen thrashes on low-core machines (100s+ cold compiles).
if "xla_cpu_parallel_codegen_split_count" not in flags:
    flags += " --xla_cpu_parallel_codegen_split_count=1"
os.environ["XLA_FLAGS"] = flags.strip()

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_enable_x64", False)
# Persistent compilation cache: amortizes XLA compiles across test runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def pytest_collection_modifyitems(config, items):
    for item in items:
        path = str(item.fspath)
        if "test_generation" in path or "test_e2e" in path:
            item.add_marker(pytest.mark.integration)
            item.add_marker(pytest.mark.slow)
        else:
            item.add_marker(pytest.mark.unit)


@pytest.fixture(scope="session")
def mesh8():
    """An 8-device (data=2, model=4) mesh on virtual CPU devices."""
    from ltx2_tpu.parallel.mesh import create_mesh

    return create_mesh(data=2, model=4)
