"""Device mesh and sharding helpers — the runtime layer of the TPU build.

The reference has no distributed runtime (SURVEY.md §2.12); this module is
new TPU-first design. One mesh with ('data', 'model') axes serves every
pipeline: the CFG cond/uncond pair (the reference's batched-CFG trick,
generate.py:62-66) shards over 'data'; DiT attention heads and FFN hidden
dims shard over 'model' (tensor parallelism over ICI). A third optional
'seq' axis supports sequence/context parallelism for long clips.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
SEQ_AXIS = "seq"
PIPE_AXIS = "pipe"


def create_mesh(
    data: int = 1,
    model: Optional[int] = None,
    seq: int = 1,
    pipe: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data[, pipe][, seq], model) mesh.

    model=None takes every remaining device. The model axis is innermost so
    TP collectives ride the fastest ICI links; the pipe axis is outermost —
    pipeline stages exchange one small point-to-point activation per tick
    and tolerate the slowest links (DCN across hosts).
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if model is None:
        model = n // (data * seq * pipe)
    if data * model * seq * pipe != n:
        # ValueError, not assert: axis sizes are user input and python -O
        # strips asserts into a raw numpy reshape error (review r4).
        raise ValueError(
            f"mesh data={data} x pipe={pipe} x seq={seq} x model={model} "
            f"= {data * pipe * seq * model} does not match {n} devices"
        )
    dev_array = np.asarray(devices).reshape(data, pipe, seq, model)
    axes = [(DATA_AXIS, data), (PIPE_AXIS, pipe), (SEQ_AXIS, seq), (MODEL_AXIS, model)]
    # Keep historical shapes: drop singleton pipe/seq axes (data/model always
    # present so existing sharding rules apply unchanged).
    keep = [i for i, (name, size) in enumerate(axes)
            if name in (DATA_AXIS, MODEL_AXIS) or size > 1]
    dev_array = dev_array.reshape([axes[i][1] for i in keep])
    return Mesh(dev_array, tuple(axes[i][0] for i in keep))


def single_device_mesh() -> Mesh:
    return Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1), (DATA_AXIS, MODEL_AXIS))


def sharding(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params(params, mesh: Mesh, rules):
    """Place a param pytree on `mesh` according to `rules`.

    rules: list of (predicate(path, leaf) -> bool, PartitionSpec). First
    matching rule wins; unmatched leaves are replicated. Paths are
    '/'-joined key strings.
    """
    def place(path, leaf):
        from ltx2_tpu.parallel.sharding import path_to_str

        path_str = path_to_str(path)
        for pred, spec in rules:
            if pred(path_str, leaf):
                return jax.device_put(leaf, NamedSharding(mesh, spec))
        return jax.device_put(leaf, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map_with_path(place, params)
