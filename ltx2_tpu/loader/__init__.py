from ltx2_tpu.loader.lora import (
    LoRAConfig,
    collect_lora_deltas,
    compute_lora_delta,
    find_lora_keys_for_weight,
    fuse_lora_into_params,
    load_lora_weights,
    unfuse_lora_deltas,
)
from ltx2_tpu.loader.registry import DummyRegistry, Registry, StateDictRegistry
from ltx2_tpu.loader.safetensors_io import (
    SafetensorsFile,
    read_metadata,
    write_safetensors,
)
from ltx2_tpu.loader.weight_loader import (
    convert_checkpoint_key,
    detect_model_version,
    flatten_params,
    is_fp8_checkpoint,
    is_v2_model,
    load_av_transformer_params,
    load_flat_diffusion_weights,
    load_transformer_params,
    read_checkpoint_config,
    structure_diffusion_weights,
)

__all__ = [
    "LoRAConfig",
    "collect_lora_deltas",
    "compute_lora_delta",
    "find_lora_keys_for_weight",
    "fuse_lora_into_params",
    "load_lora_weights",
    "unfuse_lora_deltas",
    "DummyRegistry",
    "Registry",
    "StateDictRegistry",
    "SafetensorsFile",
    "read_metadata",
    "write_safetensors",
    "convert_checkpoint_key",
    "detect_model_version",
    "flatten_params",
    "is_fp8_checkpoint",
    "is_v2_model",
    "load_av_transformer_params",
    "load_flat_diffusion_weights",
    "load_transformer_params",
    "read_checkpoint_config",
    "structure_diffusion_weights",
]
