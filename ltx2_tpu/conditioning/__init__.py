from ltx2_tpu.conditioning.item import ConditioningError, ConditioningItem
from ltx2_tpu.conditioning.keyframe import VideoConditionByKeyframeIndex
from ltx2_tpu.conditioning.latent import VideoConditionByLatentIndex
from ltx2_tpu.conditioning.tools import AudioLatentTools, VideoLatentTools

__all__ = [
    "ConditioningError",
    "ConditioningItem",
    "VideoConditionByKeyframeIndex",
    "VideoConditionByLatentIndex",
    "AudioLatentTools",
    "VideoLatentTools",
]
