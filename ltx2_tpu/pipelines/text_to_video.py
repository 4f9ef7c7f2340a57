"""Basic text-to-video pipeline.

Capability parity with reference LTX_2_MLX/pipelines/text_to_video.py
(TextToVideoPipeline): the simple CFG loop with cond+uncond batched into a
single forward (text_to_video.py:231-253) — which here is the native layout
of the scanned denoise loop (denoise.py rows). Implemented as a thin
specialization of the one-stage machinery.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, List, Optional, Tuple

import numpy as np

from ltx2_tpu.models.video_vae import TilingConfig
from ltx2_tpu.pipelines.common import ImageCondition
from ltx2_tpu.pipelines.one_stage import OneStageCFGConfig, OneStagePipeline


@dataclass
class TextToVideoConfig:
    """Reference TextToVideoPipeline config surface."""

    height: int = 480
    width: int = 704
    num_frames: int = 97
    seed: int = 42
    fps: float = 24.0
    num_inference_steps: int = 30
    cfg_scale: float = 5.0
    dtype: str = "float32"
    latent_channels: int = 128
    tiling_config: Optional[TilingConfig] = None

    def to_one_stage(self) -> OneStageCFGConfig:
        return OneStageCFGConfig(
            height=self.height,
            width=self.width,
            num_frames=self.num_frames,
            seed=self.seed,
            fps=self.fps,
            num_inference_steps=self.num_inference_steps,
            cfg_scale=self.cfg_scale,
            rescale_scale=0.0,  # plain CFG, no CFG* rescale
            dtype=self.dtype,
            latent_channels=self.latent_channels,
            tiling_config=self.tiling_config,
        )


class TextToVideoPipeline(OneStagePipeline):
    """Plain CFG text-to-video (the reference's simplest pipeline)."""

    def __call__(  # type: ignore[override]
        self,
        positive_encoding,
        negative_encoding,
        config: TextToVideoConfig,
        images: Optional[List[ImageCondition]] = None,
        callback: Optional[Callable[[int, int], None]] = None,
        **kwargs,
    ) -> Tuple[np.ndarray, None]:
        one_stage_cfg = (
            config.to_one_stage() if isinstance(config, TextToVideoConfig) else config
        )
        return super().__call__(
            positive_encoding,
            negative_encoding,
            one_stage_cfg,
            images=images,
            callback=callback,
            **kwargs,
        )


def create_text_to_video_pipeline(**kwargs) -> TextToVideoPipeline:
    return TextToVideoPipeline(**kwargs)
