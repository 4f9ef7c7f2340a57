from ltx2_tpu.models.text_encoder.connector import (
    ConnectorConfig,
    append_learnable_registers,
    connector_apply,
    init_connector,
)
from ltx2_tpu.models.text_encoder.encoder import (
    AudioVideoGemmaEncoderOutput,
    TextEncoderConfig,
    VideoGemmaEncoderOutput,
    av_text_encoder_apply,
    av_text_encoder_config_v2_from_checkpoint,
    convert_to_additive_mask,
    default_text_encoder_config,
    init_text_encoder,
    load_text_encoder_params,
    video_text_encoder_apply,
)
from ltx2_tpu.models.text_encoder.feature_extractor import (
    extract_features_v1,
    extract_features_v2,
    init_feature_extractor_v1,
    init_feature_extractor_v2,
    norm_and_concat_padded_batch,
    norm_and_concat_per_token_rms,
)
from ltx2_tpu.models.text_encoder.gemma3 import (
    GEMMA3_LAYER_TYPES,
    Gemma3Config,
    gemma3_apply,
    init_gemma3,
    load_gemma3_params,
)
from ltx2_tpu.models.text_encoder.generation import (
    gemma3_greedy_generate,
    generate_text,
)

__all__ = [
    "ConnectorConfig",
    "append_learnable_registers",
    "connector_apply",
    "init_connector",
    "AudioVideoGemmaEncoderOutput",
    "TextEncoderConfig",
    "VideoGemmaEncoderOutput",
    "av_text_encoder_apply",
    "av_text_encoder_config_v2_from_checkpoint",
    "convert_to_additive_mask",
    "default_text_encoder_config",
    "init_text_encoder",
    "load_text_encoder_params",
    "video_text_encoder_apply",
    "extract_features_v1",
    "extract_features_v2",
    "init_feature_extractor_v1",
    "init_feature_extractor_v2",
    "norm_and_concat_padded_batch",
    "norm_and_concat_per_token_rms",
    "GEMMA3_LAYER_TYPES",
    "Gemma3Config",
    "gemma3_apply",
    "init_gemma3",
    "load_gemma3_params",
    "gemma3_greedy_generate",
    "generate_text",
]
