"""Distributed runtime: mesh construction, TP sharding rules, ring
attention, and sequence-parallel DiT execution (all new TPU-first design —
the reference is single-device, SURVEY.md §2.12)."""

from ltx2_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    PIPE_AXIS,
    SEQ_AXIS,
    create_mesh,
    replicated,
    shard_params,
    sharding,
    single_device_mesh,
)
from ltx2_tpu.parallel.ring_attention import ring_attention_local, ring_sdpa
from ltx2_tpu.parallel.runtime import (
    axis_layout,
    create_hybrid_mesh,
    initialize_distributed,
)
from ltx2_tpu.parallel.pipeline_parallel import (
    make_pipeline_parallel_forward,
    shard_pipeline_params,
)
from ltx2_tpu.parallel.sequence_parallel import (
    make_sequence_parallel_forward,
    modality_specs,
)
from ltx2_tpu.parallel.sharding import (
    DIT_SHARDING_RULES,
    data_sharding,
    dit_param_shardings,
    shard_dit_params,
    spec_for_path,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "PIPE_AXIS",
    "SEQ_AXIS",
    "create_mesh",
    "replicated",
    "shard_params",
    "sharding",
    "single_device_mesh",
    "ring_attention_local",
    "ring_sdpa",
    "axis_layout",
    "create_hybrid_mesh",
    "initialize_distributed",
    "make_pipeline_parallel_forward",
    "shard_pipeline_params",
    "make_sequence_parallel_forward",
    "modality_specs",
    "DIT_SHARDING_RULES",
    "data_sharding",
    "dit_param_shardings",
    "shard_dit_params",
    "spec_for_path",
]
