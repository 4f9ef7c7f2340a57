"""ltx2_tpu — TPU-native (JAX/XLA/Pallas) framework for the LTX-2
text/image/audio-to-video diffusion model family.

From-scratch re-design of the capabilities of the Acelogic/LTX-2-MLX
reference for TPU: functional pytree models under jit, mesh-first sharding
(tensor/sequence/data parallel over ICI), Pallas kernels on the hot paths.
"""

__version__ = "0.1.0"

from ltx2_tpu import components, core, types
from ltx2_tpu.types import (
    AudioLatentShape,
    LatentState,
    SpatioTemporalScaleFactors,
    VideoLatentShape,
    VideoPixelShape,
    VIDEO_SCALE_FACTORS,
)

__all__ = [
    "components",
    "core",
    "types",
    "AudioLatentShape",
    "LatentState",
    "SpatioTemporalScaleFactors",
    "VideoLatentShape",
    "VideoPixelShape",
    "VIDEO_SCALE_FACTORS",
]
