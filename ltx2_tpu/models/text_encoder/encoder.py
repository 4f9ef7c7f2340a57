"""Text-encoder orchestration: Gemma hidden states -> DiT text context.

Capability parity with reference LTX_2_MLX/model/text_encoder/encoder.py:
VideoGemmaTextEncoderModel / AudioVideoGemmaTextEncoderModel (encoder.py:
65-370) — feature extractor (V1/V2) + 1D connector(s), dtype-aware additive
mask conversion (encoder.py:103-132), and factories whose connector config
comes from checkpoint metadata (encoder.py:811-871).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional

import jax.numpy as jnp

from ltx2_tpu.models.text_encoder.connector import (
    ConnectorConfig,
    connector_apply,
    init_connector,
)
from ltx2_tpu.models.text_encoder.feature_extractor import (
    extract_features_v1,
    extract_features_v2,
    init_feature_extractor_v1,
    init_feature_extractor_v2,
)
from ltx2_tpu.ops.common import Params
from ltx2_tpu.ops.rope import LTXRopeType


class VideoGemmaEncoderOutput(NamedTuple):
    video_encoding: jnp.ndarray
    attention_mask: jnp.ndarray


class AudioVideoGemmaEncoderOutput(NamedTuple):
    video_encoding: jnp.ndarray
    audio_encoding: jnp.ndarray
    attention_mask: jnp.ndarray


@dataclass(frozen=True)
class TextEncoderConfig:
    """Static config for the projection stack above Gemma."""

    v2: bool = False  # V2 = dual direct-projection extractor (LTX-2.3)
    hidden_dim: int = 3840
    num_gemma_layers: int = 49
    video_inner_dim: int = 4096
    audio_inner_dim: int = 2048
    connector: ConnectorConfig = ConnectorConfig()
    audio_connector: Optional[ConnectorConfig] = None  # AV models


def convert_to_additive_mask(attention_mask: jnp.ndarray, dtype) -> jnp.ndarray:
    """Binary (B, S) -> additive (B, 1, 1, S) with -finfo(dtype).max
    (encoder.py:103-132)."""
    large = float(jnp.finfo(dtype).max)
    additive = (attention_mask.astype(jnp.float32) - 1.0) * large
    return additive.reshape(
        attention_mask.shape[0], 1, 1, attention_mask.shape[-1]
    ).astype(dtype)


def _binary_from_additive(output_mask: jnp.ndarray) -> jnp.ndarray:
    return (output_mask.squeeze((1, 2)) >= -0.5).astype(jnp.int32)


def video_text_encoder_apply(
    params: Params,
    cfg: TextEncoderConfig,
    hidden_states: jnp.ndarray,
    attention_mask: jnp.ndarray,
    padding_side: str = "left",
) -> VideoGemmaEncoderOutput:
    """Video-only encoder (encoder.py:134-182). hidden_states: (L, B, S, D)."""
    encoded = extract_features_v1(
        params["feature_extractor"], hidden_states, attention_mask, padding_side
    )
    connector_mask = convert_to_additive_mask(attention_mask, encoded.dtype)
    encoded, output_mask = connector_apply(
        params["embeddings_connector"], cfg.connector, encoded, connector_mask
    )
    binary_mask = _binary_from_additive(output_mask)
    encoded = encoded * binary_mask[:, :, None]
    return VideoGemmaEncoderOutput(video_encoding=encoded, attention_mask=binary_mask)


def av_text_encoder_apply(
    params: Params,
    cfg: TextEncoderConfig,
    hidden_states: jnp.ndarray,
    attention_mask: jnp.ndarray,
    padding_side: str = "left",
) -> AudioVideoGemmaEncoderOutput:
    """AV encoder: separate video/audio encodings (encoder.py:300-356)."""
    if cfg.v2:
        video_input, audio_input = extract_features_v2(
            params["feature_extractor"], hidden_states, attention_mask, cfg.hidden_dim
        )
    else:
        encoded = extract_features_v1(
            params["feature_extractor"], hidden_states, attention_mask, padding_side
        )
        video_input = audio_input = encoded

    connector_mask = convert_to_additive_mask(attention_mask, video_input.dtype)

    video_encoded, output_mask = connector_apply(
        params["embeddings_connector"], cfg.connector, video_input, connector_mask
    )
    binary_mask = _binary_from_additive(output_mask)
    video_encoded = video_encoded * binary_mask[:, :, None]

    audio_cfg = cfg.audio_connector or cfg.connector
    audio_encoded, _ = connector_apply(
        params["audio_embeddings_connector"], audio_cfg, audio_input, connector_mask
    )
    return AudioVideoGemmaEncoderOutput(
        video_encoding=video_encoded,
        audio_encoding=audio_encoded,
        attention_mask=binary_mask,
    )


def default_text_encoder_config() -> TextEncoderConfig:
    """V1 defaults: 2-block 30x128 connector (create_text_encoder,
    encoder.py:372-411)."""
    return TextEncoderConfig()


def av_text_encoder_config_v2_from_checkpoint(path: str) -> TextEncoderConfig:
    """V2.3 connector config read from safetensors metadata
    (create_av_text_encoder_v2_from_checkpoint, encoder.py:811-871)."""
    from ltx2_tpu.loader.weight_loader import read_checkpoint_config

    full_cfg = read_checkpoint_config(path)  # parse the header once
    tcfg = full_cfg.get("transformer", {}) or full_cfg

    video_heads = int(tcfg.get("connector_num_attention_heads", 32))
    video_head_dim = int(tcfg.get("connector_attention_head_dim", 128))
    layers = int(tcfg.get("connector_num_layers", 8))
    audio_heads = int(tcfg.get("audio_connector_num_attention_heads", video_heads))
    audio_head_dim = int(tcfg.get("audio_connector_attention_head_dim", 64))
    max_pos = tcfg.get("connector_positional_embedding_max_pos") or [1]
    if isinstance(max_pos, (int, float)):
        max_pos = [int(max_pos)]
    rope_raw = tcfg.get("rope_type", tcfg.get("split_rope"))
    if rope_raw in (True, "split", "SPLIT"):
        rope_type = LTXRopeType.SPLIT
    else:
        rope_type = LTXRopeType.INTERLEAVED
    gated = bool(tcfg.get("connector_apply_gated_attention", True))
    f64 = tcfg.get("frequencies_precision", "") == "float64"

    video_connector = ConnectorConfig(
        attention_head_dim=video_head_dim,
        num_attention_heads=video_heads,
        num_layers=layers,
        positional_embedding_max_pos=tuple(int(v) for v in max_pos),
        rope_type=rope_type,
        apply_gated_attention=gated,
        double_precision_rope=f64,
    )
    audio_connector = ConnectorConfig(
        attention_head_dim=audio_head_dim,
        num_attention_heads=audio_heads,
        num_layers=layers,
        positional_embedding_max_pos=tuple(int(v) for v in max_pos),
        rope_type=rope_type,
        apply_gated_attention=gated,
        double_precision_rope=f64,
    )
    return TextEncoderConfig(
        v2=True, connector=video_connector, audio_connector=audio_connector
    )


def init_text_encoder(key, cfg: TextEncoderConfig, dtype=jnp.float32) -> Params:
    import jax

    k1, k2, k3 = jax.random.split(key, 3)
    if cfg.v2:
        fe = init_feature_extractor_v2(
            k1, cfg.hidden_dim, cfg.num_gemma_layers,
            cfg.video_inner_dim, cfg.audio_inner_dim, dtype,
        )
    else:
        fe = init_feature_extractor_v1(k1, cfg.hidden_dim, cfg.num_gemma_layers, dtype)
    p: Params = {
        "feature_extractor": fe,
        "embeddings_connector": init_connector(k2, cfg.connector, dtype),
    }
    if cfg.audio_connector is not None or cfg.v2:
        p["audio_embeddings_connector"] = init_connector(
            k3, cfg.audio_connector or cfg.connector, dtype
        )
    return p


# ---------------------------------------------------------------------------
# Checkpoint loading
# ---------------------------------------------------------------------------

def load_text_encoder_params(path: str, cfg: TextEncoderConfig) -> Params:
    """Load extractor + connector weights from the unified checkpoint
    (text_embedding_projection.* + model.diffusion_model.*_embeddings_connector
    keys; encoder.py:414-520,873-912)."""
    import numpy as np

    from ltx2_tpu.loader.safetensors_io import SafetensorsFile

    f = SafetensorsFile(path)

    def get(key):
        if key not in f:
            return None
        return jnp.asarray(np.asarray(f.get(key), dtype=np.float32))

    p: Params = {}
    if cfg.v2:
        fe = {}
        for name in ["video_aggregate_embed", "audio_aggregate_embed"]:
            entry = {}
            w = get(f"text_embedding_projection.{name}.weight")
            if w is not None:
                entry["weight"] = w
            b = get(f"text_embedding_projection.{name}.bias")
            if b is not None:
                entry["bias"] = b
            fe[name] = entry
        p["feature_extractor"] = fe
    else:
        p["feature_extractor"] = {
            "aggregate_embed": {
                "weight": get("text_embedding_projection.aggregate_embed.weight")
            }
        }

    def load_connector(prefix: str, conn_cfg: ConnectorConfig):
        conn: Params = {}
        reg = get(f"{prefix}learnable_registers")
        if reg is not None:
            conn["learnable_registers"] = reg
        blocks = []
        for i in range(conn_cfg.num_layers):
            bp = f"{prefix}transformer_1d_blocks.{i}."
            block = {
                "attn1": {
                    "to_q": {"weight": get(f"{bp}attn1.to_q.weight"), "bias": get(f"{bp}attn1.to_q.bias")},
                    "to_k": {"weight": get(f"{bp}attn1.to_k.weight"), "bias": get(f"{bp}attn1.to_k.bias")},
                    "to_v": {"weight": get(f"{bp}attn1.to_v.weight"), "bias": get(f"{bp}attn1.to_v.bias")},
                    "to_out": {"weight": get(f"{bp}attn1.to_out.0.weight"), "bias": get(f"{bp}attn1.to_out.0.bias")},
                    "q_norm": {"weight": get(f"{bp}attn1.q_norm.weight")},
                    "k_norm": {"weight": get(f"{bp}attn1.k_norm.weight")},
                },
                "ff": {
                    "project_in": {
                        "proj": {
                            "weight": get(f"{bp}ff.net.0.proj.weight"),
                            "bias": get(f"{bp}ff.net.0.proj.bias"),
                        }
                    },
                    "project_out": {
                        "weight": get(f"{bp}ff.net.2.weight"),
                        "bias": get(f"{bp}ff.net.2.bias"),
                    },
                },
            }
            gate_w = get(f"{bp}attn1.to_gate_logits.weight")
            if gate_w is not None:
                block["attn1"]["to_gate_logits"] = {
                    "weight": gate_w,
                    "bias": get(f"{bp}attn1.to_gate_logits.bias"),
                }
            blocks.append(block)
        conn["transformer_1d_blocks"] = blocks
        return conn

    video_prefix = "model.diffusion_model.video_embeddings_connector."
    generic_prefix = "model.diffusion_model.embeddings_connector."
    prefix = video_prefix if any(k.startswith(video_prefix) for k in f.keys()) else generic_prefix
    p["embeddings_connector"] = load_connector(prefix, cfg.connector)

    audio_prefix = "model.diffusion_model.audio_embeddings_connector."
    if any(k.startswith(audio_prefix) for k in f.keys()):
        p["audio_embeddings_connector"] = load_connector(
            audio_prefix, cfg.audio_connector or cfg.connector
        )
    return p
