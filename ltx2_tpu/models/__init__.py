from ltx2_tpu.models import audio_vae, text_encoder, transformer, upscaler, video_vae
from ltx2_tpu.models.transformer.model import (
    LTXModelConfig,
    LTXModelType,
    Modality,
    init_ltx_model,
    ltx_model_apply,
    x0_model_apply,
)

__all__ = [
    "audio_vae",
    "text_encoder",
    "transformer",
    "upscaler",
    "video_vae",
    "LTXModelConfig",
    "LTXModelType",
    "Modality",
    "init_ltx_model",
    "ltx_model_apply",
    "x0_model_apply",
]
