"""Lazy-loading model ledger.

Capability parity with reference LTX_2_MLX/utils/model_ledger.py
(ModelLedger, model_ledger.py:17-341): one object that lazily loads and
caches every component (transformer, video VAE encoder/decoder, audio VAE,
vocoder, text encoder, Gemma, upscalers) from a checkpoint path + optional
LoRA list, with per-component invalidation and a `with_loras` view.

TPU form: components are (params, config) pairs; the transformer load
fuses LoRAs at load time (fuse is cheap host math on the stacked tree).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

from ltx2_tpu.loader.lora import LoRAConfig, fuse_lora_into_params
from ltx2_tpu.loader.weight_loader import (
    is_v2_model,
    load_transformer_params,
    read_checkpoint_config,
)


@dataclass
class ModelLedger:
    """Factory/cache for all LTX-2 components from one checkpoint."""

    checkpoint_path: str
    gemma_path: Optional[str] = None
    spatial_upscaler_path: Optional[str] = None
    temporal_upscaler_path: Optional[str] = None
    loras: List[LoRAConfig] = field(default_factory=list)
    target_dtype: str = "bfloat16"
    include_audio: bool = False
    keep_fp8: bool = False  # serving mode: fp8 weights stay quantized in HBM
    int8: bool = False  # serving mode: W8A8-quantize DiT matmuls at load
    gemma_fp8: bool = False  # quantize Gemma matmul weights to fp8 at load
    # Loader placement hook fn(tree_path, np_array) -> device array: DiT
    # leaves stream DIRECTLY onto their mesh shards (TP: tp_device_put;
    # PP: pipeline_device_put) instead of staging the full tree on one chip.
    transformer_device_put: Optional[object] = None
    _cache: Dict[str, object] = field(default_factory=dict, repr=False)

    # -- helpers -----------------------------------------------------------
    def _get(self, name: str, loader, force_reload: bool = False):
        if force_reload or name not in self._cache:
            self._cache[name] = loader()
        return self._cache[name]

    @property
    def is_v2(self) -> bool:
        return is_v2_model(self.checkpoint_path)

    @property
    def checkpoint_config(self) -> dict:
        return read_checkpoint_config(self.checkpoint_path)

    # -- components --------------------------------------------------------
    def transformer(self, force_reload: bool = False) -> Tuple[object, object]:
        """(params, LTXModelConfig); LoRAs fused at load."""

        def load():
            from ltx2_tpu.models.transformer.model import LTXModelConfig, LTXModelType
            from ltx2_tpu.ops.rope import LTXRopeType

            v2 = self.is_v2
            cfg = LTXModelConfig(
                model_type=(
                    LTXModelType.AudioVideo if self.include_audio else LTXModelType.VideoOnly
                ),
                caption_channels=None if v2 else 3840,
                cross_attention_adaln=v2,
                apply_gated_attention=v2,
                # The reference DiT always uses the f32 RoPE grid: its
                # preprocessors never forward use_double_precision to
                # precompute_freqs_cis (model.py:219-228, 333-343 — the
                # flag is stored but dead); ONLY the text-encoder connector
                # runs the f64 grid (connector.py:266). Keep the DiT f32
                # for executable parity; the config knob remains for
                # experiments.
                use_rope_double_precision=False,
                rope_type=LTXRopeType.SPLIT,
                compute_dtype=self.target_dtype,
                # Inference-only: no gradients, so per-block rematerialization
                # buys nothing — skip the checkpoint wrapper entirely.
                remat=False,
            )
            # LoRA fusion mutates matmul weights, so it is incompatible with
            # keep_fp8 (would need dequant->fuse->requant); fall back to the
            # dequantized load when LoRAs are present. int8 likewise: with
            # LoRAs, load full-precision, fuse, THEN quantize on device
            # (peak HBM = the bf16 tree — fine on CPU/hosts, a constraint
            # on a 16 GB chip, where LoRA+int8 should be pre-exported).
            keep_fp8 = self.keep_fp8 and not self.loras
            int8_at_load = self.int8 and not self.loras
            if self.transformer_device_put is not None and self.loras:
                raise ValueError(
                    "sharded loading (transformer_device_put) is incompatible "
                    "with LoRA fusion, which runs on the host tree before "
                    "placement — load unsharded and re-place, or drop LoRAs"
                )
            params = load_transformer_params(
                self.checkpoint_path,
                include_audio=self.include_audio,
                target_dtype=self.target_dtype,
                num_layers=cfg.num_layers,
                keep_fp8=keep_fp8,
                quantize_int8=int8_at_load,
                device_put=self.transformer_device_put,
            )
            if self.loras:
                params = fuse_lora_into_params(params, self.loras)
                if self.int8:
                    import jax

                    from ltx2_tpu.loader.int8 import quantize_params_int8

                    params = jax.jit(quantize_params_int8)(params)
            return params, cfg

        return self._get("transformer", load, force_reload)

    def video_encoder(self, force_reload: bool = False):
        def load():
            from ltx2_tpu.models.video_vae import (
                VideoEncoderConfig,
                load_video_encoder_params,
            )

            cfg = VideoEncoderConfig()
            return load_video_encoder_params(self.checkpoint_path, cfg), cfg

        return self._get("video_encoder", load, force_reload)

    def video_decoder(self, force_reload: bool = False):
        def load():
            from ltx2_tpu.models.video_vae import (
                decoder_config_from_checkpoint,
                load_video_decoder_params,
            )

            cfg = decoder_config_from_checkpoint(self.checkpoint_path)
            return load_video_decoder_params(self.checkpoint_path, cfg), cfg

        return self._get("video_decoder", load, force_reload)

    def audio_encoder(self, force_reload: bool = False):
        def load():
            from ltx2_tpu.models.audio_vae import (
                AudioEncoderConfig,
                load_audio_encoder_params,
            )

            cfg = AudioEncoderConfig()
            return load_audio_encoder_params(self.checkpoint_path, cfg), cfg

        return self._get("audio_encoder", load, force_reload)

    def audio_decoder(self, force_reload: bool = False):
        def load():
            from ltx2_tpu.models.audio_vae import (
                AudioDecoderConfig,
                load_audio_decoder_params,
            )

            cfg = AudioDecoderConfig()
            return load_audio_decoder_params(self.checkpoint_path, cfg), cfg

        return self._get("audio_decoder", load, force_reload)

    def vocoder(self, force_reload: bool = False):
        """(params, cfg, is_bwe) — BWE chain for LTX-2.3 checkpoints whose
        metadata declares a `vocoder.bwe` config (generate.py:155-221)."""

        def load():
            from ltx2_tpu.models.audio_vae import (
                VocoderConfig,
                load_vocoder_params,
                load_vocoder_with_bwe_params,
                vocoder_with_bwe_config_from_checkpoint,
            )

            voc_cfg = self.checkpoint_config.get("vocoder", {})
            if "bwe" in voc_cfg:
                # Architecture from the checkpoint's vocoder metadata
                # (upsample rates / kernels / mel geometry) — the dataclass
                # defaults are only the reference's fallbacks
                # (generate.py:173-222).
                cfg = vocoder_with_bwe_config_from_checkpoint(voc_cfg)
                return load_vocoder_with_bwe_params(self.checkpoint_path, cfg), cfg, True
            cfg = VocoderConfig()
            return load_vocoder_params(self.checkpoint_path, cfg), cfg, False

        return self._get("vocoder", load, force_reload)

    def text_encoder(self, force_reload: bool = False):
        def load():
            from ltx2_tpu.models.text_encoder import (
                av_text_encoder_config_v2_from_checkpoint,
                default_text_encoder_config,
                load_text_encoder_params,
            )

            if self.is_v2:
                cfg = av_text_encoder_config_v2_from_checkpoint(self.checkpoint_path)
            else:
                cfg = default_text_encoder_config()
            return load_text_encoder_params(self.checkpoint_path, cfg), cfg

        return self._get("text_encoder", load, force_reload)

    def gemma(self, force_reload: bool = False):
        def load():
            from ltx2_tpu.models.text_encoder import Gemma3Config, load_gemma3_params

            if self.gemma_path is None:
                raise ValueError("gemma_path required for the Gemma text encoder")
            cfg = Gemma3Config()  # fp32 default (generate.py:376-379)
            return (
                load_gemma3_params(self.gemma_path, cfg, quantize_fp8=self.gemma_fp8),
                cfg,
            )

        return self._get("gemma", load, force_reload)

    def spatial_upscaler(self, force_reload: bool = False):
        def load():
            from ltx2_tpu.models.upscaler import (
                SpatialUpscalerConfig,
                load_spatial_upscaler_params,
            )

            if self.spatial_upscaler_path is None:
                return None, SpatialUpscalerConfig()
            return (
                load_spatial_upscaler_params(self.spatial_upscaler_path),
                SpatialUpscalerConfig(),
            )

        return self._get("spatial_upscaler", load, force_reload)

    def temporal_upscaler(self, force_reload: bool = False):
        def load():
            from ltx2_tpu.models.upscaler import (
                TemporalUpscalerConfig,
                load_temporal_upscaler_params,
            )

            if self.temporal_upscaler_path is None:
                return None, TemporalUpscalerConfig()
            return (
                load_temporal_upscaler_params(self.temporal_upscaler_path),
                TemporalUpscalerConfig(),
            )

        return self._get("temporal_upscaler", load, force_reload)

    # -- cache management --------------------------------------------------
    def clear_model(self, model_name: str) -> None:
        self._cache.pop(model_name, None)

    def clear_all_models(self) -> None:
        self._cache.clear()

    def with_loras(self, loras: List[LoRAConfig]) -> "ModelLedger":
        """A view with a different LoRA set: fresh transformer cache, every
        serving flag carried over (review r4: int8/transformer_device_put
        were silently dropped, so the LoRA view of an int8-serving ledger
        loaded full bf16), and the LoRA-independent components (VAEs,
        vocoder, Gemma, upscalers) SHARED — switching LoRA sets must not
        re-load multi-GB components that don't depend on the LoRA list."""
        shared_cache = {
            k: v for k, v in self._cache.items() if k != "transformer"
        }
        return ModelLedger(
            checkpoint_path=self.checkpoint_path,
            gemma_path=self.gemma_path,
            spatial_upscaler_path=self.spatial_upscaler_path,
            temporal_upscaler_path=self.temporal_upscaler_path,
            loras=list(loras),
            target_dtype=self.target_dtype,
            include_audio=self.include_audio,
            keep_fp8=self.keep_fp8,
            int8=self.int8,
            gemma_fp8=self.gemma_fp8,
            transformer_device_put=self.transformer_device_put,
            _cache=shared_cache,
        )


def create_model_ledger(checkpoint_path: str, **kwargs) -> ModelLedger:
    return ModelLedger(checkpoint_path=checkpoint_path, **kwargs)
