"""LTX-2 TPU pipelines — all 9 reference pipeline families
(reference pipelines/__init__.py:1-97)."""

from ltx2_tpu.pipelines.a2vid_two_stage import (
    A2VidConfig,
    A2VidPipelineTwoStage,
    create_a2vid_pipeline,
    load_audio_file,
)
from ltx2_tpu.pipelines.common import (
    ImageCondition,
    apply_conditionings,
    create_image_conditionings,
    load_image_tensor,
    modality_from_state,
    post_process_latent,
    timesteps_from_mask,
)
from ltx2_tpu.pipelines.denoise import (
    DenoiseLoopConfig,
    MultiModalLoopConfig,
    make_av_denoise_loop,
    make_multimodal_av_denoise_loop,
    make_video_denoise_loop,
)
from ltx2_tpu.pipelines.distilled import (
    DistilledConfig,
    DistilledPipeline,
    channelwise_normalize_audio,
    create_distilled_pipeline,
)
from ltx2_tpu.pipelines.ic_lora import (
    ControlType,
    ICLoraConfig,
    ICLoraPipeline,
    VideoCondition,
    create_ic_lora_pipeline,
    create_video_conditionings,
    load_control_signal_tensor,
    preprocess_canny,
    preprocess_control_signal,
)
from ltx2_tpu.pipelines.keyframe_interpolation import (
    Keyframe,
    KeyframeInterpolationConfig,
    KeyframeInterpolationPipeline,
    create_keyframe_conditionings,
    create_keyframe_pipeline,
)
from ltx2_tpu.pipelines.one_stage import (
    OneStageCFGConfig,
    OneStagePipeline,
    create_one_stage_pipeline,
)
from ltx2_tpu.pipelines.retake import (
    RetakeConfig,
    RetakePipeline,
    TemporalRegionMask,
    create_retake_pipeline,
    get_video_metadata,
    load_video_frames,
)
from ltx2_tpu.pipelines.text_to_video import (
    TextToVideoConfig,
    TextToVideoPipeline,
    create_text_to_video_pipeline,
)
from ltx2_tpu.pipelines.ti2vid_hq import (
    TI2VidHQConfig,
    TI2VidHQPipeline,
    create_ti2vid_hq_pipeline,
)
from ltx2_tpu.pipelines.two_stage import (
    TwoStageCFGConfig,
    TwoStagePipeline,
    create_two_stage_pipeline,
)

__all__ = [
    "A2VidConfig",
    "A2VidPipelineTwoStage",
    "create_a2vid_pipeline",
    "load_audio_file",
    "ImageCondition",
    "apply_conditionings",
    "create_image_conditionings",
    "load_image_tensor",
    "modality_from_state",
    "post_process_latent",
    "timesteps_from_mask",
    "DenoiseLoopConfig",
    "MultiModalLoopConfig",
    "make_av_denoise_loop",
    "make_multimodal_av_denoise_loop",
    "make_video_denoise_loop",
    "DistilledConfig",
    "DistilledPipeline",
    "channelwise_normalize_audio",
    "create_distilled_pipeline",
    "ControlType",
    "ICLoraConfig",
    "ICLoraPipeline",
    "VideoCondition",
    "create_ic_lora_pipeline",
    "create_video_conditionings",
    "load_control_signal_tensor",
    "preprocess_canny",
    "preprocess_control_signal",
    "Keyframe",
    "KeyframeInterpolationConfig",
    "KeyframeInterpolationPipeline",
    "create_keyframe_conditionings",
    "create_keyframe_pipeline",
    "OneStageCFGConfig",
    "OneStagePipeline",
    "create_one_stage_pipeline",
    "RetakeConfig",
    "RetakePipeline",
    "TemporalRegionMask",
    "create_retake_pipeline",
    "get_video_metadata",
    "load_video_frames",
    "TextToVideoConfig",
    "TextToVideoPipeline",
    "create_text_to_video_pipeline",
    "TI2VidHQConfig",
    "TI2VidHQPipeline",
    "create_ti2vid_hq_pipeline",
    "TwoStageCFGConfig",
    "TwoStagePipeline",
    "create_two_stage_pipeline",
]
