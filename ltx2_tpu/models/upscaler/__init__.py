from ltx2_tpu.models.upscaler.spatial import (
    SpatialUpscalerConfig,
    group_norm_video,
    init_spatial_upscaler,
    load_spatial_upscaler_params,
    spatial_upscaler_apply,
)
from ltx2_tpu.models.upscaler.temporal import (
    TemporalUpscalerConfig,
    group_norm_per_frame,
    init_temporal_upscaler,
    load_temporal_upscaler_params,
    temporal_upscaler_apply,
)

__all__ = [
    "SpatialUpscalerConfig",
    "group_norm_video",
    "init_spatial_upscaler",
    "load_spatial_upscaler_params",
    "spatial_upscaler_apply",
    "TemporalUpscalerConfig",
    "group_norm_per_frame",
    "init_temporal_upscaler",
    "load_temporal_upscaler_params",
    "temporal_upscaler_apply",
]
