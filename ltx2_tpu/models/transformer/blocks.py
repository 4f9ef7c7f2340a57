"""LTX-2 audio/video DiT transformer block (functional, scan-ready).

Capability parity with reference LTX_2_MLX/model/transformer/transformer.py
(BasicAVTransformerBlock, transformer.py:241-648): per-modality self-attn
(AdaLN, RoPE) -> text cross-attn (V1 plain / V2 AdaLN-modulated) ->
bidirectional A<->V cross-modal attention with 5-value scale/shift/gate
tables -> FFN. V2 adds 9-param AdaLN and prompt-table KV modulation.

TPU-first design differences:
- Pure function over a per-block param dict; the model stacks block params
  with a leading layer axis and drives this with lax.scan (fast compile,
  remat-per-block).
- STG perturbation "skips" compile to residual gate masks (B,) per type per
  block instead of Python branches — one XLA program serves every
  perturbation pattern, and per-SAMPLE perturbation works (the reference
  only supports whole-batch skips at block level, transformer.py:486-501).
- AdaLN tables + modulation math stay fp32; matmul inputs are cast to the
  compute dtype (bf16) after modulation.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ltx2_tpu.core import rms_norm
from ltx2_tpu.models.transformer.attention import (
    AttentionConfig,
    attention_apply,
    feed_forward_apply,
    init_attention,
    init_feed_forward,
)
from ltx2_tpu.ops.common import Params
from ltx2_tpu.ops.rope import LTXRopeType


@dataclass(frozen=True)
class StreamConfig:
    """Static configuration of one DiT stream (video or audio)."""

    dim: int
    heads: int
    d_head: int
    context_dim: int
    cross_attention_adaln: bool = False
    apply_gated_attention: bool = False
    # Mesh axis the token dim is sharded over (sequence parallelism under
    # shard_map); None = single-shard tokens. Self-attn -> ring attention,
    # A2V/V2A -> K/V all-gather, text cross-attn unaffected (replicated ctx).
    sequence_axis: Optional[str] = None
    # Mesh axis the block weights are feature-sharded over (SP x TP
    # composition): column-parallel projections propagate via explicit
    # sharding, row-parallel out/down projections psum via auto_axes.
    tp_axis: Optional[str] = None


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class StreamArgs:
    """Per-stream tensors threaded through the block stack (a pytree).

    Mirrors reference TransformerArgs (transformer.py:61-93).
    """

    x: jnp.ndarray  # (B, T, D) hidden states
    context: jnp.ndarray  # (B, S, D) projected text context
    timesteps: jnp.ndarray  # (B, T|1, n_emb, D) AdaLN embeddings (fp32)
    pe: Tuple[jnp.ndarray, jnp.ndarray]  # RoPE (cos, sin)
    context_mask: Optional[jnp.ndarray] = None  # additive (B, 1, 1, S)
    # Key-padding mask for SELF-attention (shape-bucketed serving):
    # additive (B, 1, 1, T), -inf at padded tokens. None = all real.
    self_mask: Optional[jnp.ndarray] = None
    embedded_timestep: Optional[jnp.ndarray] = None  # (B, T|1, D)
    cross_pe: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None
    cross_scale_shift_timestep: Optional[jnp.ndarray] = None  # (B, 1, 4, D)
    cross_gate_timestep: Optional[jnp.ndarray] = None  # (B, 1, 1, D)
    prompt_timestep: Optional[jnp.ndarray] = None  # (B, 1, 2, D) V2 KV mod

    def replace(self, **kwargs) -> "StreamArgs":
        return dataclasses.replace(self, **kwargs)


# Per-block gate masks, shape (B,) each: 1.0 = keep, 0.0 = skip.
PerturbMasks = Dict[str, jnp.ndarray]


def _ada_values(
    table: jnp.ndarray, timestep: jnp.ndarray, start: int, end: int
) -> Tuple[jnp.ndarray, ...]:
    """table (n, D) + timestep (B, T, n, D) -> per-index (B, T, D) fp32
    (transformer.py:369-392)."""
    vals = table[None, None, start:end].astype(jnp.float32) + timestep[
        :, :, start:end
    ].astype(jnp.float32)
    return tuple(vals[:, :, i] for i in range(end - start))


def _modulate(
    x: jnp.ndarray, scale: jnp.ndarray, shift: jnp.ndarray, eps: float
) -> jnp.ndarray:
    """rms_norm(x) * (1 + scale) + shift, fp32 math, back to x.dtype
    (compiled AdaLN helper, transformer.py:16-31)."""
    normed = rms_norm(x, None, eps).astype(jnp.float32)
    return (normed * (1.0 + scale) + shift).astype(x.dtype)


def _gated_residual(
    x: jnp.ndarray, residual: jnp.ndarray, gate: jnp.ndarray, keep: Optional[jnp.ndarray]
) -> jnp.ndarray:
    """x + residual * gate [* keep-mask] (transformer.py:34-46)."""
    update = residual.astype(jnp.float32) * gate
    if keep is not None:
        update = update * keep[:, None, None]
    return (x.astype(jnp.float32) + update).astype(x.dtype)


def _text_cross_attention(
    p: Params,
    attn_key: str,
    table_key: str,
    prompt_table_key: str,
    cfg: StreamConfig,
    attn_cfg: AttentionConfig,
    x: jnp.ndarray,
    args: StreamArgs,
    norm_eps: float,
    cached_kv: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
) -> jnp.ndarray:
    """Text cross-attention; V2 modulates Q (AdaLN idx 6-9) and KV (prompt
    tables) and gates the output (transformer.py:427-455).

    cached_kv: step-invariant precomputed text K/V — V1 ONLY (V2's KV
    modulation depends on sigma, so its K/V change every step)."""
    if cfg.cross_attention_adaln:
        assert cached_kv is None, "text KV caching is incompatible with V2 KV modulation"
        shift_q, scale_q, gate = _ada_values(p[table_key], args.timesteps, 6, 9)
        kv_mod = p[prompt_table_key][None, None].astype(jnp.float32) + args.prompt_timestep.astype(
            jnp.float32
        )
        shift_kv = kv_mod[:, :, 0]
        scale_kv = kv_mod[:, :, 1]
        attn_input = _modulate(x, scale_q, shift_q, norm_eps)
        ctx = (
            args.context.astype(jnp.float32) * (1.0 + scale_kv) + shift_kv
        ).astype(x.dtype)
        out = attention_apply(
            p[attn_key], attn_cfg, attn_input, context=ctx, mask=args.context_mask
        )
        return (out.astype(jnp.float32) * gate).astype(x.dtype)
    out = attention_apply(
        p[attn_key],
        attn_cfg,
        rms_norm(x, None, norm_eps),
        context=args.context,
        mask=args.context_mask,
        cached_kv=cached_kv,
    )
    return out


def av_block_apply(
    p: Params,
    video: Optional[StreamArgs],
    audio: Optional[StreamArgs],
    video_cfg: Optional[StreamConfig],
    audio_cfg: Optional[StreamConfig],
    rope_type: LTXRopeType = LTXRopeType.SPLIT,
    norm_eps: float = 1e-6,
    perturb: Optional[PerturbMasks] = None,
    ca_scale: Optional[jnp.ndarray] = None,
    video_text_kv: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    audio_text_kv: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
) -> Tuple[Optional[StreamArgs], Optional[StreamArgs]]:
    """One AV transformer block (transformer.py:457-648).

    perturb: optional masks {'video_self', 'audio_self', 'a2v', 'v2a'} of
    shape (B,); 1 keeps the attention residual, 0 removes it.
    ca_scale: optional scalar/array multiplier on the text cross-attn output
    (the `_cross_attn_scale` late-block hook, transformer.py:525-528).
    video_text_kv/audio_text_kv: this block's precomputed text cross-attn
    (k, v) pairs (V1 KV caching across denoise steps).
    """
    perturb = perturb or {}
    run_v = video is not None and video_cfg is not None
    run_a = audio is not None and audio_cfg is not None
    run_cross = run_v and run_a and "audio_to_video_attn" in p

    vx = video.x if run_v else None
    ax = audio.x if run_a else None

    if run_v:
        v_attn1 = AttentionConfig(
            query_dim=video_cfg.dim,
            heads=video_cfg.heads,
            dim_head=video_cfg.d_head,
            norm_eps=norm_eps,
            rope_type=rope_type,
            apply_gated_attention=video_cfg.apply_gated_attention,
            sequence_axis=video_cfg.sequence_axis,
            tp_axis=video_cfg.tp_axis,
        )
        v_attn2 = dataclasses.replace(
            v_attn1, context_dim=video_cfg.context_dim, sequence_axis=None
        )
        shift_msa, scale_msa, gate_msa = _ada_values(
            p["scale_shift_table"], video.timesteps, 0, 3
        )
        normed = _modulate(vx, scale_msa, shift_msa, norm_eps)
        attn_out = attention_apply(
            p["attn1"], v_attn1, normed, pe=video.pe, mask=video.self_mask
        )
        vx = _gated_residual(vx, attn_out, gate_msa, perturb.get("video_self"))

        cross_out = _text_cross_attention(
            p, "attn2", "scale_shift_table", "prompt_scale_shift_table",
            video_cfg, v_attn2, vx, video, norm_eps, cached_kv=video_text_kv,
        )
        if ca_scale is not None:
            cross_out = cross_out * ca_scale.astype(cross_out.dtype)
        vx = (vx.astype(jnp.float32) + cross_out.astype(jnp.float32)).astype(vx.dtype)

    if run_a:
        a_attn1 = AttentionConfig(
            query_dim=audio_cfg.dim,
            heads=audio_cfg.heads,
            dim_head=audio_cfg.d_head,
            norm_eps=norm_eps,
            rope_type=rope_type,
            apply_gated_attention=audio_cfg.apply_gated_attention,
            sequence_axis=audio_cfg.sequence_axis,
            tp_axis=audio_cfg.tp_axis,
        )
        a_attn2 = dataclasses.replace(
            a_attn1, context_dim=audio_cfg.context_dim, sequence_axis=None
        )
        ashift, ascale, agate = _ada_values(
            p["audio_scale_shift_table"], audio.timesteps, 0, 3
        )
        normed = _modulate(ax, ascale, ashift, norm_eps)
        attn_out = attention_apply(
            p["audio_attn1"], a_attn1, normed, pe=audio.pe, mask=audio.self_mask
        )
        ax = _gated_residual(ax, attn_out, agate, perturb.get("audio_self"))

        cross_out = _text_cross_attention(
            p, "audio_attn2", "audio_scale_shift_table", "audio_prompt_scale_shift_table",
            audio_cfg, a_attn2, ax, audio, norm_eps, cached_kv=audio_text_kv,
        )
        ax = (ax.astype(jnp.float32) + cross_out.astype(jnp.float32)).astype(ax.dtype)

    if run_cross:
        a2v_cfg = AttentionConfig(
            query_dim=video_cfg.dim,
            context_dim=audio_cfg.dim,
            heads=audio_cfg.heads,
            dim_head=audio_cfg.d_head,
            norm_eps=norm_eps,
            rope_type=rope_type,
            apply_gated_attention=video_cfg.apply_gated_attention,
            sequence_axis=audio_cfg.sequence_axis,  # KV side (audio tokens)
            tp_axis=video_cfg.tp_axis,
        )
        v2a_cfg = AttentionConfig(
            query_dim=audio_cfg.dim,
            context_dim=video_cfg.dim,
            heads=audio_cfg.heads,
            dim_head=audio_cfg.d_head,
            norm_eps=norm_eps,
            rope_type=rope_type,
            apply_gated_attention=audio_cfg.apply_gated_attention,
            sequence_axis=video_cfg.sequence_axis,  # KV side (video tokens)
            tp_axis=audio_cfg.tp_axis,
        )
        vx_norm = rms_norm(vx, None, norm_eps)
        ax_norm = rms_norm(ax, None, norm_eps)

        # 5-value tables: (scale_a2v, shift_a2v, scale_v2a, shift_v2a) from
        # the 4-embedding cross timestep + gate from the 1-embedding one
        # (transformer.py:394-425).
        def av_ca_values(table, ss_timestep, gate_timestep):
            ss = table[None, None, :4].astype(jnp.float32) + ss_timestep.astype(jnp.float32)
            gate = table[None, None, 4:].astype(jnp.float32) + gate_timestep.astype(jnp.float32)
            return tuple(ss[:, :, i] for i in range(4)) + (gate[:, :, 0],)

        (
            scale_ca_a_a2v, shift_ca_a_a2v, scale_ca_a_v2a, shift_ca_a_v2a, gate_v2a
        ) = av_ca_values(
            p["scale_shift_table_a2v_ca_audio"],
            audio.cross_scale_shift_timestep,
            audio.cross_gate_timestep,
        )
        (
            scale_ca_v_a2v, shift_ca_v_a2v, scale_ca_v_v2a, shift_ca_v_v2a, gate_a2v
        ) = av_ca_values(
            p["scale_shift_table_a2v_ca_video"],
            video.cross_scale_shift_timestep,
            video.cross_gate_timestep,
        )

        # Audio -> video: Q=video, KV=audio, separate RoPE per side
        # (transformer.py:592-605).
        vq = (vx_norm.astype(jnp.float32) * (1.0 + scale_ca_v_a2v) + shift_ca_v_a2v).astype(vx.dtype)
        akv = (ax_norm.astype(jnp.float32) * (1.0 + scale_ca_a_a2v) + shift_ca_a_a2v).astype(ax.dtype)
        a2v_out = attention_apply(
            p["audio_to_video_attn"], a2v_cfg, vq,
            context=akv, pe=video.cross_pe, k_pe=audio.cross_pe,
            gather_context=a2v_cfg.sequence_axis is not None,
        )
        vx = _gated_residual(vx, a2v_out, gate_a2v, perturb.get("a2v"))

        # Video -> audio (transformer.py:607-620).
        aq = (ax_norm.astype(jnp.float32) * (1.0 + scale_ca_a_v2a) + shift_ca_a_v2a).astype(ax.dtype)
        vkv = (vx_norm.astype(jnp.float32) * (1.0 + scale_ca_v_v2a) + shift_ca_v_v2a).astype(vx.dtype)
        v2a_out = attention_apply(
            p["video_to_audio_attn"], v2a_cfg, aq,
            context=vkv, pe=audio.cross_pe, k_pe=video.cross_pe,
            gather_context=v2a_cfg.sequence_axis is not None,
        )
        ax = _gated_residual(ax, v2a_out, gate_v2a, perturb.get("v2a"))

    if run_v:
        shift_mlp, scale_mlp, gate_mlp = _ada_values(
            p["scale_shift_table"], video.timesteps, 3, 6
        )
        ff_out = feed_forward_apply(
            p["ff"], _modulate(vx, scale_mlp, shift_mlp, norm_eps),
            tp_axis=video_cfg.tp_axis,
        )
        vx = _gated_residual(vx, ff_out, gate_mlp, None)

    if run_a:
        ashift_mlp, ascale_mlp, agate_mlp = _ada_values(
            p["audio_scale_shift_table"], audio.timesteps, 3, 6
        )
        ff_out = feed_forward_apply(
            p["audio_ff"], _modulate(ax, ascale_mlp, ashift_mlp, norm_eps),
            tp_axis=audio_cfg.tp_axis,
        )
        ax = _gated_residual(ax, ff_out, agate_mlp, None)

    video_out = video.replace(x=vx) if run_v else video
    audio_out = audio.replace(x=ax) if run_a else audio
    return video_out, audio_out


def init_av_block(
    key: jax.Array,
    video_cfg: Optional[StreamConfig],
    audio_cfg: Optional[StreamConfig],
    rope_type: LTXRopeType = LTXRopeType.SPLIT,
    norm_eps: float = 1e-6,
    dtype=jnp.float32,
) -> Params:
    """Random-init one block's params (checkpoint-shaped tree; tests only)."""
    ks = iter(jax.random.split(key, 12))
    p: Params = {}
    cross_adaln = (video_cfg is not None and video_cfg.cross_attention_adaln) or (
        audio_cfg is not None and audio_cfg.cross_attention_adaln
    )
    n_adaln = 9 if cross_adaln else 6

    if video_cfg is not None:
        base = AttentionConfig(
            query_dim=video_cfg.dim,
            heads=video_cfg.heads,
            dim_head=video_cfg.d_head,
            norm_eps=norm_eps,
            rope_type=rope_type,
            apply_gated_attention=video_cfg.apply_gated_attention,
        )
        p["attn1"] = init_attention(next(ks), base, dtype)
        p["attn2"] = init_attention(
            next(ks), dataclasses.replace(base, context_dim=video_cfg.context_dim), dtype
        )
        p["ff"] = init_feed_forward(next(ks), video_cfg.dim, video_cfg.dim, dtype=dtype)
        p["scale_shift_table"] = jnp.zeros((n_adaln, video_cfg.dim), jnp.float32)
        if cross_adaln:
            p["prompt_scale_shift_table"] = jnp.zeros((2, video_cfg.dim), jnp.float32)

    if audio_cfg is not None:
        base = AttentionConfig(
            query_dim=audio_cfg.dim,
            heads=audio_cfg.heads,
            dim_head=audio_cfg.d_head,
            norm_eps=norm_eps,
            rope_type=rope_type,
            apply_gated_attention=audio_cfg.apply_gated_attention,
        )
        p["audio_attn1"] = init_attention(next(ks), base, dtype)
        p["audio_attn2"] = init_attention(
            next(ks), dataclasses.replace(base, context_dim=audio_cfg.context_dim), dtype
        )
        p["audio_ff"] = init_feed_forward(next(ks), audio_cfg.dim, audio_cfg.dim, dtype=dtype)
        p["audio_scale_shift_table"] = jnp.zeros((n_adaln, audio_cfg.dim), jnp.float32)
        if cross_adaln:
            p["audio_prompt_scale_shift_table"] = jnp.zeros((2, audio_cfg.dim), jnp.float32)

    if video_cfg is not None and audio_cfg is not None:
        p["audio_to_video_attn"] = init_attention(
            next(ks),
            AttentionConfig(
                query_dim=video_cfg.dim,
                context_dim=audio_cfg.dim,
                heads=audio_cfg.heads,
                dim_head=audio_cfg.d_head,
                norm_eps=norm_eps,
                rope_type=rope_type,
                apply_gated_attention=video_cfg.apply_gated_attention,
            ),
            dtype,
        )
        p["video_to_audio_attn"] = init_attention(
            next(ks),
            AttentionConfig(
                query_dim=audio_cfg.dim,
                context_dim=video_cfg.dim,
                heads=audio_cfg.heads,
                dim_head=audio_cfg.d_head,
                norm_eps=norm_eps,
                rope_type=rope_type,
                apply_gated_attention=audio_cfg.apply_gated_attention,
            ),
            dtype,
        )
        p["scale_shift_table_a2v_ca_audio"] = jnp.zeros((5, audio_cfg.dim), jnp.float32)
        p["scale_shift_table_a2v_ca_video"] = jnp.zeros((5, video_cfg.dim), jnp.float32)

    return p
