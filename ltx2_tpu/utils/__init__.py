from ltx2_tpu.utils.checkpointing import (
    load_generation_state,
    save_generation_state,
)
from ltx2_tpu.utils.model_ledger import ModelLedger, create_model_ledger
from ltx2_tpu.utils.profiling import (
    device_memory_stats,
    log,
    phase,
    phase_report,
    reset_phases,
    trace,
)
from ltx2_tpu.utils.prompt_enhancement import (
    I2V_SYSTEM_PROMPT,
    T2V_SYSTEM_PROMPT,
    build_chat_prompt,
    clean_response,
    enhance_prompt,
    resize_aspect_ratio_preserving,
)

__all__ = [
    "load_generation_state",
    "save_generation_state",
    "ModelLedger",
    "create_model_ledger",
    "device_memory_stats",
    "log",
    "phase",
    "phase_report",
    "reset_phases",
    "trace",
    "I2V_SYSTEM_PROMPT",
    "T2V_SYSTEM_PROMPT",
    "build_chat_prompt",
    "clean_response",
    "enhance_prompt",
    "resize_aspect_ratio_preserving",
]
