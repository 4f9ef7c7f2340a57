"""Multi-host runtime: distributed initialization and hybrid ICI/DCN meshes.

Single-controller JAX: every host runs the same program;
`initialize_distributed()` wires the hosts together, and the mesh builders
lay parallelism axes out so that the heavy collectives (TP all-reduces,
ring-attention permutes) ride intra-slice ICI while only data-parallel
gradients/rows cross the slower DCN between slices.

The reference has no distributed runtime at all (SURVEY.md §2.12); this is
new TPU-first design.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

from ltx2_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, SEQ_AXIS


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize multi-host JAX. On TPU pods the arguments are discovered
    from the environment; pass them explicitly elsewhere. Safe to call on a
    single host (no-op when already initialized or single-process)."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (RuntimeError, ValueError) as e:
        # Tolerate ONLY the benign cases: re-initialization, or a bare
        # single-host call (no explicit args) where autodetection finds no
        # pod environment. A call with EXPLICIT arguments that fails is a
        # genuine misconfiguration (wrong coordinator address, inconsistent
        # num_processes/process_id) and must fail loudly — swallowing it
        # degrades a pod job into a silent single-host run that hangs in
        # the first cross-host collective.
        msg = str(e).lower()
        explicit = (
            coordinator_address is not None
            or process_id is not None
            or num_processes is not None  # review r4: was omitted — a
            # num_processes-only misconfiguration swallowed silently
        )
        if "already" in msg and "initial" in msg:
            return
        if not explicit:
            return  # single-process run, nothing to wire
        raise


def axis_layout(
    n_devices: int,
    data: int = 1,
    seq: int = 1,
    model: Optional[int] = None,
) -> Tuple[int, int, int]:
    """Resolve a (data, seq, model) factorization of `n_devices`.

    model=None takes every remaining device. Raises if the product doesn't
    match — axis sizes are a deployment decision, not something to guess.
    """
    if model is None:
        if n_devices % (data * seq) != 0:
            raise ValueError(
                f"{n_devices} devices not divisible by data*seq = {data * seq}"
            )
        model = n_devices // (data * seq)
    if data * seq * model != n_devices:
        raise ValueError(
            f"mesh {data}x{seq}x{model} != {n_devices} devices"
        )
    return data, seq, model


def create_hybrid_mesh(
    data: int = 1,
    seq: int = 1,
    model: Optional[int] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Mesh over ALL hosts' devices with DCN-aware placement.

    The `data` axis is laid out across slices (DCN) and `seq`/`model` within
    a slice (ICI), via mesh_utils.create_hybrid_device_mesh when running
    multi-slice; falls back to a plain reshape on a single slice / CPU.
    Axis order is (data, seq, model) — model innermost on the fastest links.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    data, seq, model = axis_layout(n, data, seq, model)

    try:
        from jax.experimental import mesh_utils

        num_slices = max(
            (getattr(d, "slice_index", 0) or 0) for d in devices
        ) + 1
        if num_slices > 1:
            if data % num_slices != 0:
                raise ValueError(
                    f"data axis ({data}) must be a multiple of the slice "
                    f"count ({num_slices}) so only DP crosses DCN"
                )
            dev_array = mesh_utils.create_hybrid_device_mesh(
                mesh_shape=(data // num_slices, seq, model),
                dcn_mesh_shape=(num_slices, 1, 1),
                devices=devices,
            )
            return Mesh(dev_array, (DATA_AXIS, SEQ_AXIS, MODEL_AXIS))
    except ImportError:
        pass

    dev_array = np.asarray(devices).reshape(data, seq, model)
    return Mesh(dev_array, (DATA_AXIS, SEQ_AXIS, MODEL_AXIS))
