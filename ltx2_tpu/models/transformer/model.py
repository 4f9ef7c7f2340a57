"""LTX-2 unified audio/video DiT (functional, jit/scan/pjit-first).

Capability parity with reference LTX_2_MLX/model/transformer/model.py:
LTXModel (model.py:413-881), Modality (model.py:59-69), preprocessors
(model.py:72-410), X0Model (model.py:884-936), with V1/V2 switches
(cross_attention_adaln, gated attention, prompt AdaLN) and the AV
cross-modal timestep swap (audio's cross-attn timestep from video's sigma
and vice versa, model.py:394-399).

TPU-first design:
- Block params are STACKED along a leading layer axis; the 48-block stack
  runs as one lax.scan with optional per-block rematerialisation
  (jax.checkpoint) — replaces the reference's Python loop + mx.eval-interval
  memory hack (model.py:724-728), which is unnecessary under XLA.
- STG perturbations compile to (L, B) gate-mask constants (see blocks.py).
- RoPE tables can be precomputed once per generation and passed in
  (`video_pe`/`audio_pe`), hoisting them out of the denoise loop.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from enum import Enum
from typing import Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from ltx2_tpu.components.perturbations import BatchedPerturbationConfig, PerturbationType
from ltx2_tpu.models.transformer.blocks import (
    StreamArgs,
    StreamConfig,
    av_block_apply,
    init_av_block,
)
from ltx2_tpu.ops.common import Params, init_linear, linear, layer_norm
from ltx2_tpu.ops.rope import LTXRopeType, precompute_freqs_cis
from ltx2_tpu.ops.timestep_embedding import adaln_single_apply, init_adaln_single


class LTXModelType(Enum):
    AudioVideo = "ltx av model"
    VideoOnly = "ltx video only model"
    AudioOnly = "ltx audio only model"

    def is_video_enabled(self) -> bool:
        return self in (LTXModelType.AudioVideo, LTXModelType.VideoOnly)

    def is_audio_enabled(self) -> bool:
        return self in (LTXModelType.AudioVideo, LTXModelType.AudioOnly)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Modality:
    """One modality's inputs (model.py:59-69). A pytree."""

    latent: jnp.ndarray  # (B, T, C) patchified latents
    context: jnp.ndarray  # (B, S, C_ctx) text context
    context_mask: Optional[jnp.ndarray]  # (B, S) bool / additive float
    timesteps: jnp.ndarray  # (B,) or (B, T)
    positions: jnp.ndarray  # (B, n_dims, T, 2) position bounds
    sigma: Optional[jnp.ndarray] = None  # (B,) scalar noise level (V2)
    # Token validity for SHAPE-BUCKETED serving: bool (B, T), False =
    # padding token. Padded tokens are masked out of self-attention KEYS so
    # real tokens' outputs are bit-for-bit those of the unpadded run (their
    # own outputs are garbage and get sliced off after the loop). None =
    # every token real.
    token_mask: Optional[jnp.ndarray] = None

    def replace(self, **kwargs) -> "Modality":
        return dataclasses.replace(self, **kwargs)


@dataclass(frozen=True)
class LTXModelConfig:
    """Static DiT architecture config (model.py:436-460 numbers)."""

    model_type: LTXModelType = LTXModelType.VideoOnly
    num_attention_heads: int = 32
    attention_head_dim: int = 128
    in_channels: int = 128
    out_channels: int = 128
    num_layers: int = 48
    cross_attention_dim: int = 4096
    norm_eps: float = 1e-6
    caption_channels: Optional[int] = 3840  # None for V2 (direct projection)
    positional_embedding_theta: float = 10000.0
    positional_embedding_max_pos: Tuple[int, ...] = (20, 2048, 2048)
    timestep_scale_multiplier: int = 1000
    av_ca_timestep_scale_multiplier: int = 1
    use_middle_indices_grid: bool = True
    rope_type: LTXRopeType = LTXRopeType.SPLIT
    compute_dtype: str = "bfloat16"
    cross_attention_adaln: bool = False  # V2 (LTX-2.3)
    apply_gated_attention: bool = False  # V2
    use_rope_double_precision: bool = False  # V2.3 f64 freq grid
    remat: bool = True  # jax.checkpoint each block in the scan
    # Sequence parallelism: mesh axis the token dim is sharded over when the
    # model runs under shard_map (see parallel/sequence_parallel.py). None =
    # standard single-shard token axis.
    sequence_axis: Optional[str] = None
    # SP x TP composition: mesh axis the block weights are feature-sharded
    # over (Megatron rules, sharding.py) while tokens shard over
    # sequence_axis — the axis must be LEFT OUT of the enclosing shard_map's
    # manual axis_names so GSPMD owns its collectives. None = no TP inside
    # the sequence-parallel region.
    tp_axis: Optional[str] = None
    # Audio stream constants (model.py:428-434)
    audio_heads: int = 32
    audio_head_dim: int = 64
    audio_in_channels: int = 128
    audio_out_channels: int = 128
    audio_cross_pe_max_pos: int = 20

    @property
    def video_inner_dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    @property
    def audio_inner_dim(self) -> int:
        return self.audio_heads * self.audio_head_dim

    @property
    def adaln_num_embeddings(self) -> int:
        return 9 if self.cross_attention_adaln else 6

    @property
    def dtype(self):
        return jnp.dtype(self.compute_dtype)

    def video_stream_config(self) -> StreamConfig:
        return StreamConfig(
            dim=self.video_inner_dim,
            heads=self.num_attention_heads,
            d_head=self.attention_head_dim,
            context_dim=self.cross_attention_dim,
            cross_attention_adaln=self.cross_attention_adaln,
            apply_gated_attention=self.apply_gated_attention,
            sequence_axis=self.sequence_axis,
            tp_axis=self.tp_axis,
        )

    def audio_stream_config(self) -> StreamConfig:
        # Audio text cross-attn context dim is the audio inner dim (2048),
        # not 4096 (model.py:629).
        return StreamConfig(
            dim=self.audio_inner_dim,
            heads=self.audio_heads,
            d_head=self.audio_head_dim,
            context_dim=self.audio_inner_dim,
            cross_attention_adaln=self.cross_attention_adaln,
            apply_gated_attention=self.apply_gated_attention,
            sequence_axis=self.sequence_axis,
            tp_axis=self.tp_axis,
        )


def _caption_projection_apply(p: Params, caption: jnp.ndarray) -> jnp.ndarray:
    """PixArtAlphaTextProjection: linear -> gelu_tanh -> linear
    (model.py:32-56)."""
    h = linear(p["linear_1"], caption)
    h = jax.nn.gelu(h, approximate=True)
    return linear(p["linear_2"], h)


def _prepare_timestep(
    adaln_params: Params,
    timestep: jnp.ndarray,
    inner_dim: int,
    batch_size: int,
    scale_multiplier: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Timestep -> (B, T|1, n_emb, D) AdaLN embeddings + (B, T|1, D) raw
    (model.py:113-140). fp32 throughout."""
    t = (timestep.astype(jnp.float32) * scale_multiplier).reshape(-1)
    emb, embedded = adaln_single_apply(adaln_params, t)
    n_emb = emb.shape[-1] // inner_dim
    emb = emb.reshape(batch_size, -1, n_emb, inner_dim)
    embedded = embedded.reshape(batch_size, -1, inner_dim)
    return emb, embedded


def _prepare_attention_mask(
    attention_mask: Optional[jnp.ndarray], target_dtype
) -> Optional[jnp.ndarray]:
    """bool (B, S) -> additive (B, 1, 1, S) with -finfo(dtype).max
    (model.py:163-201); additive float masks reshape to the same key-only
    layout (a raw (B, S) float would be misread downstream: sdpa treats 2D
    masks as (T_q, T_k))."""
    if attention_mask is None:
        return None
    if jnp.issubdtype(attention_mask.dtype, jnp.floating):
        if attention_mask.ndim == 2:
            return attention_mask.reshape(
                attention_mask.shape[0], 1, 1, attention_mask.shape[-1]
            ).astype(target_dtype)
        return attention_mask
    mask_value = float(jnp.finfo(target_dtype).max)
    mask = (1.0 - attention_mask.astype(jnp.float32)) * (-mask_value)
    mask = mask.reshape(attention_mask.shape[0], 1, 1, attention_mask.shape[-1])
    return mask.astype(target_dtype)


def _prepare_stream(
    params: Params,
    cfg: LTXModelConfig,
    modality: Modality,
    *,
    prefix: str,
    inner_dim: int,
    heads: int,
    max_pos: Tuple[int, ...],
    pe: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    use_middle_grid: Optional[bool] = None,
) -> StreamArgs:
    """Shared stream preprocessing (TransformerArgsPreprocessor.prepare,
    model.py:231-281). use_middle_grid: the AUDIO preprocessor hardcodes
    middle-of-interval RoPE positions in the reference (model.py:683)
    regardless of the config flag; None = follow cfg (the video stream)."""
    proj_key = f"{prefix}patchify_proj"
    adaln_key = f"{prefix}adaln_single"
    caption_key = f"{prefix}caption_projection"
    prompt_adaln_key = f"{prefix}prompt_adaln_single"

    dtype = cfg.dtype
    x = linear(params[proj_key], modality.latent.astype(dtype))
    batch = x.shape[0]

    timestep_emb, embedded = _prepare_timestep(
        params[adaln_key], modality.timesteps, inner_dim, batch,
        cfg.timestep_scale_multiplier,
    )

    prompt_timestep = None
    if cfg.cross_attention_adaln and prompt_adaln_key in params:
        sigma = modality.sigma if modality.sigma is not None else modality.timesteps
        if sigma.ndim > 1:
            sigma = sigma[:, 0]  # per-token timesteps: first token's sigma
        prompt_emb, _ = _prepare_timestep(
            params[prompt_adaln_key], sigma, inner_dim, batch,
            cfg.timestep_scale_multiplier,
        )
        prompt_timestep = prompt_emb  # (B, 1, 2, D)

    context = modality.context.astype(dtype)
    if caption_key in params and params[caption_key] is not None:
        context = _caption_projection_apply(params[caption_key], context)
    context = context.reshape(batch, -1, x.shape[-1])

    context_mask = _prepare_attention_mask(modality.context_mask, dtype)
    self_mask = _prepare_attention_mask(modality.token_mask, dtype)

    if pe is None:
        pe = precompute_freqs_cis(
            indices_grid=modality.positions,
            dim=inner_dim,
            out_dtype=jnp.float32,
            theta=cfg.positional_embedding_theta,
            max_pos=list(max_pos),
            use_middle_indices_grid=(
                cfg.use_middle_indices_grid
                if use_middle_grid is None else use_middle_grid
            ),
            num_attention_heads=heads,
            rope_type=cfg.rope_type,
            use_double_precision=cfg.use_rope_double_precision,
        )

    return StreamArgs(
        x=x,
        context=context,
        timesteps=timestep_emb,
        pe=pe,
        context_mask=context_mask,
        self_mask=self_mask,
        embedded_timestep=embedded,
        prompt_timestep=prompt_timestep,
    )


def _prepare_cross_modal(
    params: Params,
    cfg: LTXModelConfig,
    args: StreamArgs,
    modality: Modality,
    cross_modality: Modality,
    *,
    ss_adaln_key: str,
    gate_adaln_key: str,
    inner_dim: int,
) -> StreamArgs:
    """Cross-modal RoPE (temporal axis only) + cross-attn AdaLN from the
    OTHER modality's sigma (MultiModalTransformerArgsPreprocessor,
    model.py:284-410)."""
    temporal_positions = modality.positions[:, 0:1, :]
    cross_pe = precompute_freqs_cis(
        indices_grid=temporal_positions,
        dim=cfg.audio_inner_dim,
        out_dtype=jnp.float32,
        theta=cfg.positional_embedding_theta,
        max_pos=[cfg.audio_cross_pe_max_pos],
        use_middle_indices_grid=True,
        num_attention_heads=cfg.audio_heads,
        rope_type=cfg.rope_type,
        use_double_precision=cfg.use_rope_double_precision,
    )

    cross_sigma = (
        cross_modality.sigma if cross_modality.sigma is not None else cross_modality.timesteps
    )
    if cross_sigma.ndim > 1:
        cross_sigma = cross_sigma[:, 0]

    batch = args.x.shape[0]
    ss_emb, _ = _prepare_timestep(
        params[ss_adaln_key], cross_sigma, inner_dim, batch,
        cfg.timestep_scale_multiplier,
    )  # (B, 1, 4, D)
    # Gate timestep: scaled by av_ca_factor = av_ca_mult / timestep_mult, so
    # the effective embedding input is sigma * av_ca_mult (model.py:360-364).
    gate_emb, _ = _prepare_timestep(
        params[gate_adaln_key],
        cross_sigma * (cfg.av_ca_timestep_scale_multiplier / cfg.timestep_scale_multiplier),
        inner_dim,
        batch,
        cfg.timestep_scale_multiplier,
    )  # (B, 1, 1, D)

    return args.replace(
        cross_pe=cross_pe,
        cross_scale_shift_timestep=ss_emb,
        cross_gate_timestep=gate_emb,
    )


def _perturbation_mask_array(
    perturbations: Optional[BatchedPerturbationConfig],
    num_layers: int,
    batch: int,
) -> Dict[str, jnp.ndarray]:
    """Static perturbation config -> (L, B) keep-masks per type."""
    key_to_type = {
        "video_self": PerturbationType.SKIP_VIDEO_SELF_ATTN,
        "audio_self": PerturbationType.SKIP_AUDIO_SELF_ATTN,
        "a2v": PerturbationType.SKIP_A2V_CROSS_ATTN,
        "v2a": PerturbationType.SKIP_V2A_CROSS_ATTN,
    }
    masks = {}
    for name, ptype in key_to_type.items():
        if perturbations is None:
            masks[name] = jnp.ones((num_layers, batch), jnp.float32)
        else:
            rows = [perturbations.mask(ptype, layer) for layer in range(num_layers)]
            masks[name] = jnp.stack(rows, axis=0)
    return masks


def _process_output(
    table: jnp.ndarray,
    norm_eps: float,
    proj_params: Params,
    x: jnp.ndarray,
    embedded_timestep: jnp.ndarray,
) -> jnp.ndarray:
    """Final LayerNorm (no affine) + scale/shift + proj_out
    (model.py:744-774). fp32 modulation."""
    ss = table[None, None].astype(jnp.float32) + embedded_timestep[:, :, None].astype(jnp.float32)
    shift = ss[:, :, 0]
    scale = ss[:, :, 1]
    out = layer_norm(None, x, norm_eps).astype(jnp.float32)
    out = out * (1.0 + scale) + shift
    return linear(proj_params, out.astype(x.dtype))


def _stacked_linear(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Apply a layer-stacked linear: x (B,S,C) x weight (L,O,C) -> (L,B,S,O).

    Handles fp8-serving weight_scale AND int8 weight_cscale leaves like
    ops.common.linear (review r4: int8 codes were cast to x.dtype unscaled,
    making --int8 + --cache-text-kv cache garbage K/V)."""
    if "lora_A" in p or "lora_B" in p:
        # ops.common.linear applies unfused runtime adapters; this cached
        # path would silently drop the LoRA delta (review r4) — the cached
        # and uncached steps must not disagree. Fuse before caching.
        raise ValueError(
            "cache_text_kv is unsupported with unfused runtime LoRA "
            "adapters on the K/V projections — fuse the LoRA first "
            "(loader/lora.py) or disable --cache-text-kv"
        )
    w = p["weight"]
    scale = p.get("weight_scale")
    cscale = p.get("weight_cscale")
    if cscale is not None:
        # int8 W8A8 (loader/int8.py): per-out-channel dequantize for this
        # once-per-generation precompute; cscale is (L, O).
        w = (
            w.astype(jnp.float32) * cscale[:, :, None].astype(jnp.float32)
        ).astype(x.dtype)
    elif scale is not None or w.dtype != x.dtype:
        w = w.astype(x.dtype)
        if scale is not None:
            w = w * scale.reshape(scale.shape[0], 1, 1).astype(x.dtype)
    out = jnp.einsum("bsc,loc->lbso", x, w)
    b = p.get("bias")
    if b is not None:
        out = out + b[:, None, None, :].astype(out.dtype)
    return out


def precompute_text_kv(
    params: Params,
    cfg: LTXModelConfig,
    video_context: Optional[jnp.ndarray] = None,
    audio_context: Optional[jnp.ndarray] = None,
) -> Dict[str, Tuple[jnp.ndarray, jnp.ndarray]]:
    """Precompute per-layer text cross-attention K/V for ALL blocks at once.

    V1 ONLY: the text context is constant across denoise steps and V1 has no
    KV modulation, so K/V = f(context, weights) can be computed once per
    generation and threaded through the block scan — removing ~4% of
    per-step FLOPs and the K/V projection weight reads. (V2's prompt-table
    KV modulation depends on sigma; caching would change results.)

    Returns {"video": (k, v), "audio": (k, v)} with arrays (L, B, S, inner).
    Memory: L*B*S*inner*2 per modality — e.g. 48*2*1024*4096*2 bf16 = 1.6 GB
    at CFG batch 2; enable only when HBM allows.
    """
    if cfg.cross_attention_adaln:
        raise ValueError("text KV caching is V1-only (V2 modulates KV per step)")
    from ltx2_tpu.core import rms_norm

    blocks = params["transformer_blocks"]
    out: Dict[str, Tuple[jnp.ndarray, jnp.ndarray]] = {}

    def stream_kv(context, caption_key, attn_key, inner_dim):
        ctx = context.astype(cfg.dtype)
        if caption_key in params and params[caption_key] is not None:
            ctx = _caption_projection_apply(params[caption_key], ctx)
        ctx = ctx.reshape(ctx.shape[0], -1, inner_dim)
        attn = blocks[attn_key]
        k = _stacked_linear(attn["to_k"], ctx)
        v = _stacked_linear(attn["to_v"], ctx)
        k_w = attn["k_norm"]["weight"]  # (L, inner)
        k = rms_norm(k, k_w[:, None, None, :], cfg.norm_eps)
        return k, v

    if video_context is not None:
        out["video"] = stream_kv(
            video_context, "caption_projection", "attn2", cfg.video_inner_dim
        )
    if audio_context is not None:
        out["audio"] = stream_kv(
            audio_context, "audio_caption_projection", "audio_attn2",
            cfg.audio_inner_dim,
        )
    return out


def prepare_stream_args(
    params: Params,
    cfg: LTXModelConfig,
    video: Optional[Modality] = None,
    audio: Optional[Modality] = None,
    video_pe: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    audio_pe: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
) -> Tuple[Optional[StreamArgs], Optional[StreamArgs], bool, bool]:
    """Run the preprocessors (model.py:72-410) for the enabled modalities.

    Returns (video_args, audio_args, run_video, run_audio). Shared by the
    standard forward (ltx_model_apply) and the pipeline-parallel forward
    (parallel/pipeline_parallel.py), which replaces only the block stack.
    """
    run_video = cfg.model_type.is_video_enabled() and video is not None
    run_audio = cfg.model_type.is_audio_enabled() and audio is not None

    if cfg.model_type.is_video_enabled() and video is None:
        raise ValueError("Video modality required for video-enabled model")

    video_args = None
    if run_video:
        video_args = _prepare_stream(
            params, cfg, video,
            prefix="", inner_dim=cfg.video_inner_dim,
            heads=cfg.num_attention_heads,
            max_pos=cfg.positional_embedding_max_pos,
            pe=video_pe,
        )
        if run_audio:
            video_args = _prepare_cross_modal(
                params, cfg, video_args, video, audio,
                ss_adaln_key="av_ca_video_scale_shift_adaln_single",
                gate_adaln_key="av_ca_a2v_gate_adaln_single",
                inner_dim=cfg.video_inner_dim,
            )

    audio_args = None
    if run_audio:
        audio_args = _prepare_stream(
            params, cfg, audio,
            prefix="audio_", inner_dim=cfg.audio_inner_dim,
            heads=cfg.audio_heads,
            max_pos=(cfg.audio_cross_pe_max_pos,),
            pe=audio_pe,
            use_middle_grid=True,  # reference hardcodes it for audio
        )
        if run_video:
            audio_args = _prepare_cross_modal(
                params, cfg, audio_args, audio, video,
                ss_adaln_key="av_ca_audio_scale_shift_adaln_single",
                gate_adaln_key="av_ca_v2a_gate_adaln_single",
                inner_dim=cfg.audio_inner_dim,
            )

    return video_args, audio_args, run_video, run_audio


def ltx_model_apply(
    params: Params,
    cfg: LTXModelConfig,
    video: Optional[Modality] = None,
    audio: Optional[Modality] = None,
    perturbations: Optional[BatchedPerturbationConfig] = None,
    ca_scales: Optional[jnp.ndarray] = None,
    video_pe: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    audio_pe: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    text_kv: Optional[Dict[str, Tuple[jnp.ndarray, jnp.ndarray]]] = None,
) -> Union[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
    """Forward pass -> VELOCITY per enabled modality (model.py:776-881).

    ca_scales: optional (L,) per-block text cross-attn output scaling (the
    late-block hook). video_pe/audio_pe: optional precomputed RoPE tables.
    text_kv: optional precomputed per-layer text cross-attn K/V (see
    precompute_text_kv; V1 only).
    """
    video_args, audio_args, run_video, run_audio = prepare_stream_args(
        params, cfg, video, audio, video_pe=video_pe, audio_pe=audio_pe
    )

    batch = (video_args or audio_args).x.shape[0]
    pmasks = _perturbation_mask_array(perturbations, cfg.num_layers, batch)
    if ca_scales is None:
        ca_scales = jnp.ones((cfg.num_layers,), jnp.float32)

    video_cfg = cfg.video_stream_config() if run_video else None
    audio_cfg = cfg.audio_stream_config() if run_audio else None

    # Per-layer scan inputs; precomputed text K/V (V1 caching) rides along
    # as extra (L, B, S, inner) xs when provided.
    text_kv = text_kv or {}
    xs = {
        "p": params["transformer_blocks"],
        "masks": pmasks,
        "ca_scale": ca_scales,
    }
    if "video" in text_kv:
        xs["vkv"] = text_kv["video"]
    if "audio" in text_kv:
        xs["akv"] = text_kv["audio"]

    def block_step(carry, xs):
        vx, ax = carry
        v_in = video_args.replace(x=vx) if run_video else None
        a_in = audio_args.replace(x=ax) if run_audio else None
        v_out, a_out = av_block_apply(
            xs["p"], v_in, a_in, video_cfg, audio_cfg,
            rope_type=cfg.rope_type, norm_eps=cfg.norm_eps,
            perturb=xs["masks"], ca_scale=xs["ca_scale"],
            video_text_kv=xs.get("vkv"), audio_text_kv=xs.get("akv"),
        )
        return (
            v_out.x if run_video else vx,
            a_out.x if run_audio else ax,
        ), None

    if cfg.remat:
        block_step = jax.checkpoint(block_step)

    init_carry = (
        video_args.x if run_video else jnp.zeros((batch, 0, 1), cfg.dtype),
        audio_args.x if run_audio else jnp.zeros((batch, 0, 1), cfg.dtype),
    )
    (vx, ax), _ = jax.lax.scan(block_step, init_carry, xs)

    video_out = None
    if run_video:
        video_out = _process_output(
            params["scale_shift_table"], cfg.norm_eps, params["proj_out"],
            vx, video_args.embedded_timestep,
        ).astype(jnp.float32)

    audio_out = None
    if run_audio:
        audio_out = _process_output(
            params["audio_scale_shift_table"], cfg.norm_eps, params["audio_proj_out"],
            ax, audio_args.embedded_timestep,
        ).astype(jnp.float32)

    if cfg.model_type == LTXModelType.VideoOnly:
        return video_out
    if cfg.model_type == LTXModelType.AudioOnly:
        return audio_out
    if not run_audio:
        return video_out
    return video_out, audio_out


def x0_model_apply(
    params: Params,
    cfg: LTXModelConfig,
    video: Optional[Modality] = None,
    audio: Optional[Modality] = None,
    **kwargs,
) -> Union[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
    """Denoised-sample wrapper: x0 = latent - t * velocity (model.py:884-936)."""
    output = ltx_model_apply(params, cfg, video, audio, **kwargs)

    def denoise(modality: Modality, velocity: jnp.ndarray) -> jnp.ndarray:
        t = modality.timesteps.astype(jnp.float32)
        if t.ndim == 1:
            t = t[:, None, None]
        elif t.ndim == 2:
            t = t[:, :, None]
        return (
            modality.latent.astype(jnp.float32) - t * velocity.astype(jnp.float32)
        )

    if isinstance(output, tuple):
        video_x0 = denoise(video, output[0])
        if audio is None:
            return video_x0
        return video_x0, denoise(audio, output[1])
    # Single-stream output: pick the modality the MODEL ran, not whichever
    # argument happens to be present (review r4: an AudioOnly model called
    # with both modalities denoised the audio velocity against the VIDEO
    # latents — shape-compatible garbage; the reference X0Model shares the
    # argument-presence bug, so this is a documented divergence).
    if cfg.model_type == LTXModelType.AudioOnly:
        if audio is not None:
            return denoise(audio, output)
    elif video is not None:
        return denoise(video, output)
    elif audio is not None:
        return denoise(audio, output)
    return output


def init_ltx_model(key: jax.Array, cfg: LTXModelConfig, dtype=None) -> Params:
    """Random-init the full DiT param tree with block params stacked along
    the layer axis (checkpoint loading produces the same structure)."""
    if dtype is None:
        dtype = cfg.dtype
    ks = iter(jax.random.split(key, 24))
    p: Params = {}

    if cfg.model_type.is_video_enabled():
        p["patchify_proj"] = init_linear(next(ks), cfg.in_channels, cfg.video_inner_dim, dtype=dtype)
        p["adaln_single"] = init_adaln_single(
            next(ks), cfg.video_inner_dim, cfg.adaln_num_embeddings
        )
        if cfg.cross_attention_adaln:
            p["prompt_adaln_single"] = init_adaln_single(next(ks), cfg.video_inner_dim, 2)
        if cfg.caption_channels is not None:
            p["caption_projection"] = {
                "linear_1": init_linear(next(ks), cfg.caption_channels, cfg.video_inner_dim, dtype=dtype),
                "linear_2": init_linear(next(ks), cfg.video_inner_dim, cfg.video_inner_dim, dtype=dtype),
            }
        p["scale_shift_table"] = jnp.zeros((2, cfg.video_inner_dim), jnp.float32)
        p["proj_out"] = init_linear(next(ks), cfg.video_inner_dim, cfg.out_channels, dtype=dtype)

    if cfg.model_type.is_audio_enabled():
        p["audio_patchify_proj"] = init_linear(
            next(ks), cfg.audio_in_channels, cfg.audio_inner_dim, dtype=dtype
        )
        p["audio_adaln_single"] = init_adaln_single(
            next(ks), cfg.audio_inner_dim, cfg.adaln_num_embeddings
        )
        if cfg.cross_attention_adaln:
            p["audio_prompt_adaln_single"] = init_adaln_single(next(ks), cfg.audio_inner_dim, 2)
        if cfg.caption_channels is not None:
            p["audio_caption_projection"] = {
                "linear_1": init_linear(next(ks), cfg.caption_channels, cfg.audio_inner_dim, dtype=dtype),
                "linear_2": init_linear(next(ks), cfg.audio_inner_dim, cfg.audio_inner_dim, dtype=dtype),
            }
        p["audio_scale_shift_table"] = jnp.zeros((2, cfg.audio_inner_dim), jnp.float32)
        p["audio_proj_out"] = init_linear(
            next(ks), cfg.audio_inner_dim, cfg.audio_out_channels, dtype=dtype
        )

    if cfg.model_type == LTXModelType.AudioVideo:
        p["av_ca_video_scale_shift_adaln_single"] = init_adaln_single(
            next(ks), cfg.video_inner_dim, 4
        )
        p["av_ca_a2v_gate_adaln_single"] = init_adaln_single(next(ks), cfg.video_inner_dim, 1)
        p["av_ca_audio_scale_shift_adaln_single"] = init_adaln_single(
            next(ks), cfg.audio_inner_dim, 4
        )
        p["av_ca_v2a_gate_adaln_single"] = init_adaln_single(next(ks), cfg.audio_inner_dim, 1)

    video_cfg = cfg.video_stream_config() if cfg.model_type.is_video_enabled() else None
    audio_cfg = cfg.audio_stream_config() if cfg.model_type.is_audio_enabled() else None
    block_keys = jax.random.split(next(ks), cfg.num_layers)
    blocks = [
        init_av_block(bk, video_cfg, audio_cfg, cfg.rope_type, cfg.norm_eps, dtype)
        for bk in block_keys
    ]
    p["transformer_blocks"] = jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(leaves, axis=0), *blocks
    )
    return p
