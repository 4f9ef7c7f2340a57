"""Jitted denoise loops — the hot loop of every pipeline.

Re-designs the reference's per-step Python dispatch
(OneStagePipeline._denoise_loop_cfg, one_stage.py:224-332; _denoise_loop_
heun :334-464; *_av variants :466-729) as ONE lax.scan over the sigma
schedule, with the guidance passes folded into the BATCH axis:

    row 0 = conditioned, row 1 = unconditioned (CFG), row 2 = STG-perturbed

A single DiT forward per step serves all passes (the reference's batched-CFG
trick, generate.py:62-66, generalized to STG via per-sample perturbation
masks), and the rows shard over the mesh 'data' axis. RoPE tables are
precomputed ONCE per generation and reused across all steps (hoisted out of
the scan — the reference recomputes per forward).

Supported: CFG / CFG* / APG guiders, STG with block lists and step cutoff,
GE velocity momentum (one_stage.py:300-307), Euler and Heun samplers,
late-block cross-attention scaling (one_stage.py:207-222), denoise-mask
post-processing, joint audio-video loops with per-modality guidance.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import lru_cache
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ltx2_tpu.components.guiders import CFGGuider
from ltx2_tpu.components.perturbations import (
    BatchedPerturbationConfig,
    PerturbationConfig,
    create_stg_perturbation,
)
from ltx2_tpu.models.transformer.model import LTXModelConfig, Modality
from ltx2_tpu.ops.rope import precompute_freqs_cis
from ltx2_tpu.pipelines.common import modality_from_state, post_process_latent
from ltx2_tpu.types import LatentState


@dataclass(frozen=True)
class DenoiseLoopConfig:
    """Static configuration of a denoise loop (hashable -> one jit per cfg)."""

    guider: object = CFGGuider(scale=1.0)  # video guidance
    audio_guider: object = CFGGuider(scale=1.0)
    stg_scale: float = 0.0
    stg_blocks: Optional[Tuple[int, ...]] = None
    stg_cutoff: float = 1.0
    # Which stream(s) the STG pass perturbs (reference --stg-mode):
    # "video" | "audio" | "both". Audio modes only matter in the AV loop.
    stg_mode: str = "video"
    ge_gamma: float = 0.0
    sampler: str = "euler"  # "euler" | "heun"
    cross_attn_scale: float = 1.0
    cross_attn_start_block: int = 40
    # V1 only: precompute per-layer text cross-attn K/V once per generation
    # and reuse across every denoise step. Ignored for V2 (sigma-dependent
    # KV modulation makes caching incorrect). Measured guidance: helps when
    # weights are bf16 (halves the cross-attn weight reads); with fp8
    # serving it is a wash-to-slightly-slower at large token counts (the
    # cache's HBM reads match the fp8 weight reads it replaces) — leave off.
    cache_text_kv: bool = False
    # STATIC promise that the denoise mask is all-ones (no token-level
    # conditioning): per-batch timesteps instead of per-token -> AdaLN
    # embeddings shrink from (B, N, n, D) to (B, 1, n, D).
    uniform_timesteps: bool = False
    # Guidance reuse: run the unconditional CFG forward only every k-th
    # step (step 0 always) and carry the x0-space guidance delta
    # (pos - neg, fp32) between recomputes; skip steps reconstruct
    # neg = pos - delta so every guider (CFG, CFG*, APG) works unchanged.
    # The delta drifts far more slowly across sigmas than either branch,
    # so k=2 is a conservative setting that removes ~half the uncond
    # forwards from the 30-step CFG recipes. 1 = exact CFG (default).
    cfg_interval: int = 1

    @property
    def need_cfg(self) -> bool:
        return self.guider.enabled()

    @property
    def need_stg(self) -> bool:
        return self.stg_scale != 0.0

    @property
    def rows(self) -> int:
        return 1 + int(self.need_cfg) + int(self.need_stg)


def _build_perturbations(
    loop_cfg: DenoiseLoopConfig, rows: int, batch: int = 1
) -> Optional[BatchedPerturbationConfig]:
    """Per-row perturbation config: only the STG pass's `batch` rows skip
    self-attention. Row layout is pass-major: [pass0 x batch, pass1 x batch,
    ...] with STG always the LAST pass."""
    if not loop_cfg.need_stg:
        return None
    stg = create_stg_perturbation(
        skip_video_self_attn=loop_cfg.stg_mode in ("video", "both"),
        blocks=list(loop_cfg.stg_blocks) if loop_cfg.stg_blocks else None,
        skip_audio_self_attn=loop_cfg.stg_mode in ("audio", "both"),
    )
    plain = [PerturbationConfig.empty()] * ((rows - 1) * batch)
    return BatchedPerturbationConfig(perturbations=tuple(plain + [stg] * batch))


def _ca_scales(loop_cfg: DenoiseLoopConfig, num_layers: int) -> Optional[jnp.ndarray]:
    if loop_cfg.cross_attn_scale == 1.0:
        return None
    scales = np.ones((num_layers,), np.float32)
    scales[loop_cfg.cross_attn_start_block :] = loop_cfg.cross_attn_scale
    return jnp.asarray(scales)


def _tile_rows(x: jnp.ndarray, rows: int) -> jnp.ndarray:
    return jnp.concatenate([x] * rows, axis=0)


def _precompute_video_pe(model_cfg: LTXModelConfig, positions: jnp.ndarray, rows: int):
    """Hoist RoPE table computation out of the scan (one compute per
    generation instead of per step per pass)."""
    pe = precompute_freqs_cis(
        indices_grid=_tile_rows(positions, rows),
        dim=model_cfg.video_inner_dim,
        out_dtype=jnp.float32,
        theta=model_cfg.positional_embedding_theta,
        max_pos=list(model_cfg.positional_embedding_max_pos),
        use_middle_indices_grid=model_cfg.use_middle_indices_grid,
        num_attention_heads=model_cfg.num_attention_heads,
        rope_type=model_cfg.rope_type,
        use_double_precision=model_cfg.use_rope_double_precision,
    )
    return pe


def _combine_guidance(loop_cfg: DenoiseLoopConfig, outs, guider, stg_flag, batch: int = 1):
    """Split pass-major batched rows -> guided prediction (B, ...)."""
    idx = 1
    pos = outs[0:batch]
    denoised = pos
    if loop_cfg.need_cfg:
        neg = outs[idx * batch : (idx + 1) * batch]
        idx += 1
        denoised = guider.guide(pos, neg)
    if loop_cfg.need_stg:
        perturbed = outs[idx * batch : (idx + 1) * batch]
        delta = loop_cfg.stg_scale * (denoised - perturbed)
        denoised = denoised + stg_flag * delta
    return denoised


def _split_rows(outs, batch: int, with_cfg: bool, need_stg: bool):
    """Pass-major batched rows -> (pos, neg, perturbed); absent rows None.

    Shared by the video and AV loops — the row layout ([cond x batch,
    uncond x batch, stg x batch]) must stay in lockstep between them.
    """
    pos = outs[0:batch]
    neg = outs[batch : 2 * batch] if with_cfg else None
    off = (1 + int(with_cfg)) * batch
    perturbed = outs[off : off + batch] if need_stg else None
    return pos, neg, perturbed


def _stack_guidance_ctx(pos, neg, with_cfg: bool, need_stg: bool):
    """Stack per-pass text contexts in the _split_rows pass-major order."""
    ctxs = [pos]
    if with_cfg:
        ctxs.append(neg)
    if need_stg:
        ctxs.append(pos)
    return jnp.concatenate(ctxs, axis=0)


def _combine_rows(loop_cfg, guider, pos, neg, perturbed, stg_flag):
    """_combine_guidance on pre-split rows (bit-identical math)."""
    denoised = guider.guide(pos, neg) if loop_cfg.need_cfg else pos
    if loop_cfg.need_stg:
        denoised = denoised + stg_flag * (
            loop_cfg.stg_scale * (denoised - perturbed)
        )
    return denoised


def _combine_rows_stateful(loop_cfg, guider, pos, neg, perturbed, stg_flag, ema):
    """_combine_rows for a possibly-stateful guider: threads the guidance
    EMA carry when the guider has one, passes it through untouched otherwise."""
    if hasattr(guider, "momentum"):
        denoised, ema = guider.guide(pos, neg, ema)
        denoised = denoised.astype(pos.dtype)
        if loop_cfg.need_stg:
            denoised = denoised + stg_flag * (
                loop_cfg.stg_scale * (denoised - perturbed)
            )
        return denoised, ema
    return _combine_rows(loop_cfg, guider, pos, neg, perturbed, stg_flag), ema


def _stg_step_flags(num_steps: int, cutoff: float):
    """Per-step STG active flags (cutoff): static schedule length."""
    step_ids = jnp.arange(num_steps)
    flags = ((step_ids + 1) / num_steps <= cutoff).astype(jnp.float32)
    return step_ids, flags


def _ge_correct(loop_cfg, latent, denoised, sigma, prev_velocity, step_idx):
    """GE velocity momentum (one_stage.py:300-307); carried across steps."""
    if loop_cfg.ge_gamma <= 0:
        return denoised, prev_velocity
    current_velocity = (latent - denoised) / sigma
    delta_v = current_velocity - prev_velocity
    total_velocity = loop_cfg.ge_gamma * delta_v + prev_velocity
    corrected = latent - total_velocity * sigma
    denoised = jnp.where(step_idx > 0, corrected, denoised)
    return denoised, current_velocity


def _euler_step(latent, denoised, sigma, sigma_next):
    velocity = (latent.astype(jnp.float32) - denoised.astype(jnp.float32)) / sigma
    return (latent.astype(jnp.float32) + velocity * (sigma_next - sigma)).astype(
        latent.dtype
    )


def _modality_seq_specs(m: Modality, axis: str) -> Modality:
    """PartitionSpec pytree for a Modality: token dims on `axis`."""
    return Modality(
        latent=P(None, axis, None),
        context=P(),
        context_mask=None if m.context_mask is None else P(),
        timesteps=P() if m.timesteps.ndim == 1 else P(None, axis),
        positions=P(None, None, axis, None),
        sigma=None if m.sigma is None else P(),
    )


def _check_seq_divisible(tokens: int, mesh: Mesh, axis: str, what: str) -> None:
    n = mesh.shape[axis]
    if tokens % n != 0:
        raise ValueError(
            f"{what} token count {tokens} must be divisible by the '{axis}' "
            f"mesh axis size {n} for sequence parallelism (pad "
            f"frames/resolution up to a multiple of {n})."
        )


def _make_sp_forward(
    model_cfg: LTXModelConfig,
    mesh: Mesh,
    axis: str,
    perturb,
    n_modalities: int,
):
    """Token-sharded DiT forward for use INSIDE the denoise scan.

    The model runs in shard_map manual mode (ring attention over `axis`);
    params/context replicate, per-token tensors shard. Everything around it
    (guidance, steppers) stays in the outer GSPMD jit, which moves only the
    small (B, N, C) latents — activations inside the 48 blocks are what SP
    exists to shard, and those never leave the shard_map region.

    When the mesh also carries a 'model' axis > 1 (SP x TP), block weights
    arrive feature-sharded over it (shard_dit_params) and that axis stays
    OUT of the manual set: GSPMD owns the Megatron collectives while ring
    attention runs head-sharded. Text-KV caching is incompatible (the cached
    K/V would need head sharding).
    """
    from ltx2_tpu.models.transformer.model import x0_model_apply

    sizes = dict(mesh.shape)
    model_axis = "model" if sizes.get("model", 1) > 1 else None
    sp_cfg = dataclasses.replace(model_cfg, sequence_axis=axis, tp_axis=model_axis)

    def forward(params, video, audio, video_pe, ca_scales, text_kv):
        return x0_model_apply(
            params, sp_cfg, video=video, audio=audio,
            perturbations=perturb, ca_scales=ca_scales, video_pe=video_pe,
            text_kv=text_kv,
        )

    def run(params, video, audio, video_pe, ca_scales, text_kv):
        assert text_kv is None or model_axis is None, (
            "text KV caching is incompatible with SP x TP"
        )
        param_specs = jax.tree_util.tree_map(lambda _: P(), params)
        v_specs = None if video is None else _modality_seq_specs(video, axis)
        a_specs = None if audio is None else _modality_seq_specs(audio, axis)
        pe_specs = None if video_pe is None else (
            P(None, None, axis, None), P(None, None, axis, None)
        )
        ca_specs = None if ca_scales is None else P()
        kv_specs = (
            None if text_kv is None
            else jax.tree_util.tree_map(lambda _: P(), text_kv)
        )
        out_specs = P(None, axis, None)
        if n_modalities == 2:
            out_specs = (out_specs, out_specs)
        manual = frozenset(n for n in mesh.axis_names if n != model_axis)
        return jax.shard_map(
            forward,
            mesh=mesh,
            in_specs=(param_specs, v_specs, a_specs, pe_specs, ca_specs, kv_specs),
            out_specs=out_specs,
            axis_names=manual,
        )(params, video, audio, video_pe, ca_scales, text_kv)

    return run


def _make_pp_forward(
    model_cfg: LTXModelConfig,
    mesh: Mesh,
    axis: str,
    num_microbatches: int,
    perturb,
    ca_scales,
    n_modalities: int,
):
    """Pipeline-parallel x0 forward for use INSIDE the denoise scan.

    Block params shard along the layer axis over `axis` (per-stage weight
    HBM ~1/P); the batch rows (guidance passes x clips) become GPipe
    microbatches (parallel/pipeline_parallel.py). When the mesh also has a
    'data' axis > 1, rows shard over it first (PP x DP) and the schedule
    microbatches each shard's local rows. Same call signature as
    _make_sp_forward so the loops treat both uniformly; text_kv caching is
    unsupported under PP (its (L, ...) leaves would need layer sharding).
    """
    from ltx2_tpu.parallel.pipeline_parallel import (
        _pp_velocity,
        _x0,
        block_param_specs,
    )

    sizes = dict(mesh.shape)
    data_axis = "data" if sizes.get("data", 1) > 1 else None
    model_axis = "model" if sizes.get("model", 1) > 1 else None
    seq_axis = "seq" if sizes.get("seq", 1) > 1 else None
    local_m = max(1, num_microbatches // sizes.get("data", 1))
    batch_spec = P() if data_axis is None else P(data_axis)
    pp_cfg = dataclasses.replace(model_cfg, sequence_axis=seq_axis)

    def forward(params, video, audio, video_pe):
        return _pp_velocity(
            params, pp_cfg, video, audio,
            axis=axis, num_microbatches=local_m,
            perturbations=perturb, ca_scales=ca_scales, video_pe=video_pe,
            data_axis=data_axis, model_axis=model_axis,
        )

    def run(params, video, audio, video_pe, _ca_scales, text_kv):
        assert text_kv is None, "text KV caching is incompatible with PP"
        from ltx2_tpu.parallel.pipeline_parallel import pp_sp_modality_specs

        param_specs = block_param_specs(params, axis)
        if seq_axis is None:
            leaf_specs = lambda mod: jax.tree_util.tree_map(
                lambda _: batch_spec, mod
            )
            pe_spec = batch_spec
            one_out = batch_spec
        else:
            # PP x SP: tokens shard over 'seq' on top of the GPipe schedule
            # (ring attention inside each stage).
            b = None if data_axis is None else data_axis
            leaf_specs = lambda mod: pp_sp_modality_specs(mod, b, seq_axis)
            pe_spec = P(b, None, seq_axis, None)
            one_out = P(b, seq_axis, None)
        v_specs = None if video is None else leaf_specs(video)
        a_specs = None if audio is None else leaf_specs(audio)
        pe_specs = None if video_pe is None else (pe_spec, pe_spec)
        out_specs = (one_out, one_out) if n_modalities == 2 else one_out
        # PP x TP: the model axis stays out of the manual set so GSPMD owns
        # the Megatron collectives inside each stage (auto_axes in
        # pipeline_block_stack); pipe/data stay manual (ppermute schedule).
        manual = frozenset(n for n in mesh.axis_names if n != model_axis)
        vel = jax.shard_map(
            forward,
            mesh=mesh,
            in_specs=(param_specs, v_specs, a_specs, pe_specs),
            out_specs=out_specs,
            axis_names=manual,
        )(params, video, audio, video_pe)
        if n_modalities == 2:
            return _x0(video, vel[0]), _x0(audio, vel[1])
        return _x0(video, vel)

    return run


def mesh_loop_kwargs(sequence_mesh=None, pipeline_mesh=None) -> dict:
    """Loop-factory kwargs for the configured multi-chip mode.

    sequence_mesh -> token sharding (ring attention); pipeline_mesh ->
    GPipe block-stack staging over the 'pipe' axis. Mutually exclusive.
    """
    if pipeline_mesh is not None:
        if sequence_mesh is not None:
            raise ValueError("set sequence_mesh OR pipeline_mesh, not both")
        return {"mesh": pipeline_mesh, "pipeline_axis": "pipe"}
    return {"mesh": sequence_mesh}


@lru_cache(maxsize=32)
def make_video_denoise_loop(
    model_cfg: LTXModelConfig,
    loop_cfg: DenoiseLoopConfig,
    mesh: Optional[Mesh] = None,
    sequence_axis: str = "seq",
    pipeline_axis: Optional[str] = None,
    pipeline_microbatches: int = 0,
):
    """Build the jitted video-only denoise loop.

    Returns fn(params, state: LatentState, sigmas (S+1,), pos_ctx, neg_ctx)
    -> final LatentState. sigmas enter as a traced array — one compilation
    serves every schedule of the same length.

    With `mesh`, the DiT forward inside the scan runs token-sharded over
    `sequence_axis` (ring attention; SURVEY §2.12) — the whole 121f+
    generation executes end-to-end with per-device activations ~1/n_seq.
    With `pipeline_axis` instead, the block stack runs GPipe-pipelined over
    that mesh axis (per-stage weight HBM ~1/P); microbatches default to the
    guidance rows (0 = rows).

    With `loop_cfg.cfg_interval > 1`, the unconditional forward runs only
    on every k-th step (step 0 always); in between, a lax.cond dispatches a
    reduced cond-only forward and the carried fp32 guidance delta stands in
    for the uncond branch (neg = pos - delta, so CFG*/APG projections work
    unchanged). Exact for cfg_interval=1.
    """
    ca_scales = _ca_scales(loop_cfg, model_cfg.num_layers)
    if loop_cfg.cfg_interval < 1:
        raise ValueError(f"cfg_interval must be >= 1, got {loop_cfg.cfg_interval}")
    reuse_cfg = loop_cfg.need_cfg and loop_cfg.cfg_interval > 1
    if reuse_cfg and pipeline_axis is not None:
        raise NotImplementedError(
            "cfg_interval > 1 does not compose with pipeline parallelism: "
            "the GPipe microbatch schedule is built from the guidance rows, "
            "which differ between recompute and reuse steps"
        )
    # Stateful (momentum) APG: an fp32 guidance-EMA carry threads through
    # the scan (reference LegacyStatefulAPGGuider semantics).
    # Attribute presence, not value: a StatefulAPGGuider's guide() returns
    # (denoised, carry) even at momentum=0, so it must always take the
    # carry-threading path.
    stateful_guider = loop_cfg.need_cfg and hasattr(loop_cfg.guider, "momentum")
    if stateful_guider and reuse_cfg:
        raise ValueError(
            "APG momentum (stateful guidance EMA) does not compose with "
            "cfg_interval > 1 — the EMA needs a fresh uncond every step"
        )

    def loop(params, state: LatentState, sigmas, pos_ctx, neg_ctx,
             token_mask=None):
        num_steps = sigmas.shape[0] - 1
        # Batched serving: B>1 states generate B clips in one loop. Rows are
        # pass-major — [cond x B, uncond x B, stg x B] — so guidance passes
        # AND samples share one DiT forward per step (the reference's
        # batched-CFG trick, extended to multi-clip throughput batching).
        batch = state.latent.shape[0]
        mask = state.denoise_mask
        clean = state.clean_latent

        if token_mask is not None and mesh is not None:
            raise NotImplementedError(
                "shape-bucketed serving (token_mask) does not compose with "
                "SP/PP meshes — pad to a multiple of the mesh axis instead"
            )
        if mesh is not None and (
            pipeline_axis is None or dict(mesh.shape).get(sequence_axis, 1) > 1
        ):
            _check_seq_divisible(
                state.latent.shape[1], mesh, sequence_axis, "video"
            )

        def build_forward(with_cfg: bool, with_stg: Optional[bool] = None):
            """One DiT forward over this step kind's guidance rows.

            Recompute steps carry [cond, uncond, stg] x batch; reuse steps
            drop the uncond row; the Heun corrector drops the STG row
            (with_stg=False) — contexts, RoPE tiling, perturbation layout
            and the SP/PP wrappers are all built per row plan.
            """
            if with_stg is None:
                with_stg = loop_cfg.need_stg
            r = 1 + int(with_cfg) + int(with_stg)
            context = _stack_guidance_ctx(pos_ctx, neg_ctx, with_cfg, with_stg)

            positions = _tile_rows(state.positions, r)
            video_pe = _precompute_video_pe(model_cfg, state.positions, r)
            perturb = (
                _build_perturbations(loop_cfg, r, batch) if with_stg else None
            )

            text_kv = None
            if loop_cfg.cache_text_kv and not model_cfg.cross_attention_adaln:
                from ltx2_tpu.models.transformer.model import precompute_text_kv

                text_kv = precompute_text_kv(
                    params, model_cfg, video_context=context
                )

            tiled_token_mask = (
                None if token_mask is None else _tile_rows(token_mask, r)
            )

            sp_forward = None
            if mesh is not None and pipeline_axis is not None:
                assert text_kv is None, (
                    "cache_text_kv is incompatible with pipeline_axis"
                )
                sp_forward = _make_pp_forward(
                    model_cfg, mesh, pipeline_axis,
                    pipeline_microbatches or r, perturb, ca_scales,
                    n_modalities=1,
                )
            elif mesh is not None:
                if text_kv is not None and dict(mesh.shape).get("model", 1) > 1:
                    raise ValueError(
                        "cache_text_kv is incompatible with SP x TP (the cached "
                        "K/V would need head sharding) — drop --cache-text-kv"
                    )
                sp_forward = _make_sp_forward(
                    model_cfg, mesh, sequence_axis, perturb, n_modalities=1
                )

            def forward(latent, sigma):
                tiled_state = LatentState(
                    latent=_tile_rows(latent, r),
                    denoise_mask=_tile_rows(mask, r),
                    positions=positions,
                    clean_latent=_tile_rows(clean, r),
                )
                modality = modality_from_state(
                    tiled_state, context, sigma,
                    uniform_timesteps=loop_cfg.uniform_timesteps,
                    token_mask=tiled_token_mask,
                )
                if sp_forward is not None:
                    return sp_forward(
                        params, modality, None, video_pe, ca_scales, text_kv
                    )
                from ltx2_tpu.models.transformer.model import x0_model_apply

                out = x0_model_apply(
                    params, model_cfg, video=modality,
                    perturbations=perturb, ca_scales=ca_scales,
                    video_pe=video_pe, text_kv=text_kv,
                )
                if tiled_token_mask is not None:
                    # Shape-bucketed serving: the model emits garbage at pad
                    # positions (they are masked out of attention KEYS only).
                    # Guiders that reduce over the whole token axis (CFG*
                    # projection, APG projection/norm-clamp) would fold that
                    # garbage into the guidance applied to REAL tokens. All
                    # those statistics are plain sums, so zeroing pad outputs
                    # makes them bit-identical to the unpadded run.
                    out = jnp.where(tiled_token_mask[:, :, None], out, 0)
                return out

            return forward

        forward_full = build_forward(with_cfg=loop_cfg.need_cfg)
        forward_reduced = build_forward(with_cfg=False) if reuse_cfg else None

        # Heun's corrector is CFG-ONLY (reference one_stage.py:385-395 vs
        # :426-444 — STG applies to the FIRST evaluation only; the second
        # has no perturbed pass), so it gets STG-row-free forwards.
        heun = loop_cfg.sampler == "heun"
        forward_corr = (
            build_forward(loop_cfg.need_cfg, with_stg=False)
            if heun and loop_cfg.need_stg else forward_full
        )
        forward_corr_reduced = (
            build_forward(False, with_stg=False)
            if heun and loop_cfg.need_stg and reuse_cfg else forward_reduced
        )

        def combine_corr(pos, neg, ema=None):
            if not loop_cfg.need_cfg:
                return pos
            if hasattr(loop_cfg.guider, "momentum"):
                out, _ = loop_cfg.guider.guide(pos, neg, ema)  # read-only EMA
                return out
            return loop_cfg.guider.guide(pos, neg)

        def combine(pos, neg, perturbed, stg_flag):
            return _combine_rows(
                loop_cfg, loop_cfg.guider, pos, neg, perturbed, stg_flag
            )

        def split(outs, with_cfg):
            return _split_rows(outs, batch, with_cfg, loop_cfg.need_stg)

        def eval_full(latent, sigma, cfg_delta, stg_flag):
            pos, neg, perturbed = split(forward_full(latent, sigma), True)
            new_delta = pos.astype(jnp.float32) - neg.astype(jnp.float32)
            return combine(pos, neg, perturbed, stg_flag), new_delta

        def eval_reused(latent, sigma, cfg_delta, stg_flag):
            pos, _, perturbed = split(forward_reduced(latent, sigma), False)
            neg = (pos.astype(jnp.float32) - cfg_delta).astype(pos.dtype)
            return combine(pos, neg, perturbed, stg_flag), cfg_delta

        step_ids, stg_flags = _stg_step_flags(num_steps, loop_cfg.stg_cutoff)

        def step_fn(carry, xs):
            if reuse_cfg:
                latent, prev_velocity, cfg_delta = carry
                step_idx, sigma, sigma_next, stg_flag, cfg_flag = xs
                denoised, cfg_delta = jax.lax.cond(
                    cfg_flag, eval_full, eval_reused,
                    latent, sigma, cfg_delta, stg_flag,
                )
            elif stateful_guider:
                latent, prev_velocity, apg_carry = carry
                step_idx, sigma, sigma_next, stg_flag = xs
                cfg_delta = None
                pos, neg, perturbed = split(forward_full(latent, sigma), True)
                denoised, apg_carry = _combine_rows_stateful(
                    loop_cfg, loop_cfg.guider, pos, neg, perturbed, stg_flag,
                    apg_carry,
                )
            else:
                latent, prev_velocity = carry
                step_idx, sigma, sigma_next, stg_flag = xs
                cfg_delta = None
                outs = forward_full(latent, sigma)
                denoised = _combine_guidance(
                    loop_cfg, outs, loop_cfg.guider, stg_flag, batch
                )
            denoised, prev_velocity = _ge_correct(
                loop_cfg, latent, denoised, sigma, prev_velocity, step_idx
            )
            denoised = post_process_latent(denoised, mask, clean)

            if loop_cfg.sampler == "heun":
                predicted = _euler_step(latent, denoised, sigma, sigma_next)
                # Corrector: CFG-only, no STG row runs or combines.
                if reuse_cfg:
                    # Reuses the step's (possibly fresh) delta — one reduced
                    # forward instead of a full one.
                    p2, _, _ = _split_rows(
                        forward_corr_reduced(predicted, sigma_next),
                        batch, False, False,
                    )
                    n2 = (p2.astype(jnp.float32) - cfg_delta).astype(p2.dtype)
                    denoised2 = combine_corr(p2, n2)
                else:
                    p2, n2, _ = _split_rows(
                        forward_corr(predicted, sigma_next),
                        batch, loop_cfg.need_cfg, False,
                    )
                    denoised2 = combine_corr(
                        p2, n2, apg_carry if stateful_guider else None
                    )
                denoised2 = post_process_latent(denoised2, mask, clean)
                v1 = (latent.astype(jnp.float32) - denoised) / sigma
                safe_next = jnp.where(sigma_next == 0, 1.0, sigma_next)
                v2 = (predicted.astype(jnp.float32) - denoised2) / safe_next
                heun_latent = (
                    latent.astype(jnp.float32) + 0.5 * (v1 + v2) * (sigma_next - sigma)
                ).astype(latent.dtype)
                # Final step (sigma_next==0): take the denoised sample directly
                # (one_stage.py:419-424).
                new_latent = jnp.where(
                    sigma_next == 0, denoised.astype(latent.dtype), heun_latent
                )
            else:
                new_latent = _euler_step(latent, denoised, sigma, sigma_next)

            if reuse_cfg:
                return (new_latent, prev_velocity, cfg_delta), None
            if stateful_guider:
                return (new_latent, prev_velocity, apg_carry), None
            return (new_latent, prev_velocity), None

        init = (state.latent, jnp.zeros_like(state.latent, jnp.float32))
        xs = (
            step_ids.astype(jnp.float32),
            sigmas[:-1].astype(jnp.float32),
            sigmas[1:].astype(jnp.float32),
            stg_flags,
        )
        if reuse_cfg:
            init = init + (jnp.zeros_like(state.latent, jnp.float32),)
            xs = xs + ((step_ids % loop_cfg.cfg_interval) == 0,)
        elif stateful_guider:
            init = init + (jnp.zeros_like(state.latent, jnp.float32),)
        (final_latent, *_), _ = jax.lax.scan(step_fn, init, xs)
        return state.replace(latent=final_latent)

    return jax.jit(loop)


@lru_cache(maxsize=32)
def make_av_denoise_loop(
    model_cfg: LTXModelConfig,
    loop_cfg: DenoiseLoopConfig,
    mesh: Optional[Mesh] = None,
    sequence_axis: str = "seq",
    pipeline_axis: Optional[str] = None,
    pipeline_microbatches: int = 0,
):
    """Joint audio-video denoise loop (one_stage.py:466-729), batched rows.

    Returns fn(params, video_state, audio_state, sigmas,
               pos_v_ctx, neg_v_ctx, pos_a_ctx, neg_a_ctx)
    -> (video_state, audio_state). With `mesh`, both modalities run
    token-sharded over `sequence_axis` inside the scan (A<->V cross-modal
    attention all-gathers the other modality's K/V over the ring); with
    `pipeline_axis` instead, the block stack runs GPipe-pipelined over that
    axis with the guidance rows as microbatches.

    With `loop_cfg.cfg_interval > 1`, the uncond row runs only every k-th
    step; separate video and audio guidance deltas carry between (the
    modalities have independent guiders and scales).
    """
    ca_scales = _ca_scales(loop_cfg, model_cfg.num_layers)
    if loop_cfg.cfg_interval < 1:
        raise ValueError(f"cfg_interval must be >= 1, got {loop_cfg.cfg_interval}")
    reuse_cfg = loop_cfg.need_cfg and loop_cfg.cfg_interval > 1
    if reuse_cfg and pipeline_axis is not None:
        raise NotImplementedError(
            "cfg_interval > 1 does not compose with pipeline parallelism: "
            "the GPipe microbatch schedule is built from the guidance rows, "
            "which differ between recompute and reuse steps"
        )
    # Stateful (momentum) APG on either stream: fp32 guidance-EMA carries
    # thread through the scan, one per modality (attribute presence, not
    # value — see make_video_denoise_loop).
    stateful_guider = loop_cfg.need_cfg and (
        hasattr(loop_cfg.guider, "momentum")
        or hasattr(loop_cfg.audio_guider, "momentum")
    )
    if stateful_guider and reuse_cfg:
        raise ValueError(
            "APG momentum (stateful guidance EMA) does not compose with "
            "cfg_interval > 1 — the EMA needs a fresh uncond every step"
        )

    def loop(params, video_state, audio_state, sigmas, pos_v, neg_v, pos_a, neg_a):
        num_steps = sigmas.shape[0] - 1
        batch = video_state.latent.shape[0]

        v_mask, v_clean = video_state.denoise_mask, video_state.clean_latent
        a_mask, a_clean = audio_state.denoise_mask, audio_state.clean_latent

        if mesh is not None and (
            pipeline_axis is None or dict(mesh.shape).get(sequence_axis, 1) > 1
        ):
            _check_seq_divisible(
                video_state.latent.shape[1], mesh, sequence_axis, "video"
            )
            _check_seq_divisible(
                audio_state.latent.shape[1], mesh, sequence_axis, "audio"
            )

        def build_forward(with_cfg: bool, with_stg: Optional[bool] = None):
            if with_stg is None:
                with_stg = loop_cfg.need_stg
            r = 1 + int(with_cfg) + int(with_stg)
            v_ctx = _stack_guidance_ctx(pos_v, neg_v, with_cfg, with_stg)
            a_ctx = _stack_guidance_ctx(pos_a, neg_a, with_cfg, with_stg)
            v_positions = _tile_rows(video_state.positions, r)
            a_positions = _tile_rows(audio_state.positions, r)
            video_pe = _precompute_video_pe(model_cfg, video_state.positions, r)
            perturb = (
                _build_perturbations(loop_cfg, r, batch) if with_stg else None
            )

            text_kv = None
            if loop_cfg.cache_text_kv and not model_cfg.cross_attention_adaln:
                from ltx2_tpu.models.transformer.model import precompute_text_kv

                text_kv = precompute_text_kv(
                    params, model_cfg, video_context=v_ctx, audio_context=a_ctx
                )

            sp_forward = None
            if mesh is not None and pipeline_axis is not None:
                assert text_kv is None, (
                    "cache_text_kv is incompatible with pipeline_axis"
                )
                sp_forward = _make_pp_forward(
                    model_cfg, mesh, pipeline_axis,
                    pipeline_microbatches or r, perturb, ca_scales,
                    n_modalities=2,
                )
            elif mesh is not None:
                if text_kv is not None and dict(mesh.shape).get("model", 1) > 1:
                    raise ValueError(
                        "cache_text_kv is incompatible with SP x TP (the cached "
                        "K/V would need head sharding) — drop --cache-text-kv"
                    )
                sp_forward = _make_sp_forward(
                    model_cfg, mesh, sequence_axis, perturb, n_modalities=2
                )

            def forward(v_latent, a_latent, sigma):
                v_state = LatentState(
                    latent=_tile_rows(v_latent, r),
                    denoise_mask=_tile_rows(v_mask, r),
                    positions=v_positions,
                    clean_latent=_tile_rows(v_clean, r),
                )
                a_state = LatentState(
                    latent=_tile_rows(a_latent, r),
                    denoise_mask=_tile_rows(a_mask, r),
                    positions=a_positions,
                    clean_latent=_tile_rows(a_clean, r),
                )
                v_mod = modality_from_state(
                    v_state, v_ctx, sigma, uniform_timesteps=loop_cfg.uniform_timesteps
                )
                a_mod = modality_from_state(
                    a_state, a_ctx, sigma, uniform_timesteps=loop_cfg.uniform_timesteps
                )
                if sp_forward is not None:
                    return sp_forward(params, v_mod, a_mod, video_pe, ca_scales, text_kv)
                from ltx2_tpu.models.transformer.model import x0_model_apply

                return x0_model_apply(
                    params, model_cfg, video=v_mod, audio=a_mod,
                    perturbations=perturb, ca_scales=ca_scales, video_pe=video_pe,
                    text_kv=text_kv,
                )

            return forward

        forward_full = build_forward(with_cfg=loop_cfg.need_cfg)
        forward_reduced = build_forward(with_cfg=False) if reuse_cfg else None

        # Heun's corrector is CFG-ONLY in the reference's AV loop too
        # (one_stage.py:670-695: the evaluation at the predicted point runs
        # pos [+ neg under CFG] and never a perturbed pass) — same rule the
        # video loop applies. STG-row-free corrector forwards:
        heun = loop_cfg.sampler == "heun"
        forward_corr = (
            build_forward(loop_cfg.need_cfg, with_stg=False)
            if heun and loop_cfg.need_stg else forward_full
        )
        forward_corr_reduced = (
            build_forward(False, with_stg=False)
            if heun and loop_cfg.need_stg and reuse_cfg else forward_reduced
        )

        def combine_corr(pos, neg, guider, ema=None):
            if not loop_cfg.need_cfg:
                return pos
            if hasattr(guider, "momentum"):
                out, _ = guider.guide(pos, neg, ema)  # read-only EMA
                return out
            return guider.guide(pos, neg)

        # --stg-mode: which stream the STG delta applies to (the skipped
        # attention is selected consistently in _build_perturbations).
        v_stg_on = 1.0 if loop_cfg.stg_mode in ("video", "both") else 0.0
        a_stg_on = 1.0 if loop_cfg.stg_mode in ("audio", "both") else 0.0

        def combine(pos, neg, perturbed, guider, stg_flag):
            return _combine_rows(loop_cfg, guider, pos, neg, perturbed, stg_flag)

        def combine_stateful(pos, neg, perturbed, guider, stg_flag, ema):
            return _combine_rows_stateful(
                loop_cfg, guider, pos, neg, perturbed, stg_flag, ema
            )

        def split(outs, with_cfg):
            return _split_rows(outs, batch, with_cfg, loop_cfg.need_stg)

        def eval_full(v_latent, a_latent, sigma, v_delta, a_delta, stg_flag):
            v_outs, a_outs = forward_full(v_latent, a_latent, sigma)
            vp, vn, vperturbed = split(v_outs, True)
            ap, an, aperturbed = split(a_outs, True)
            new_v_delta = vp.astype(jnp.float32) - vn.astype(jnp.float32)
            new_a_delta = ap.astype(jnp.float32) - an.astype(jnp.float32)
            v_denoised = combine(
                vp, vn, vperturbed, loop_cfg.guider, stg_flag * v_stg_on
            )
            a_denoised = combine(
                ap, an, aperturbed, loop_cfg.audio_guider, stg_flag * a_stg_on
            )
            return v_denoised, a_denoised, new_v_delta, new_a_delta

        def eval_reused(v_latent, a_latent, sigma, v_delta, a_delta, stg_flag):
            v_outs, a_outs = forward_reduced(v_latent, a_latent, sigma)
            vp, _, vperturbed = split(v_outs, False)
            ap, _, aperturbed = split(a_outs, False)
            vn = (vp.astype(jnp.float32) - v_delta).astype(vp.dtype)
            an = (ap.astype(jnp.float32) - a_delta).astype(ap.dtype)
            v_denoised = combine(
                vp, vn, vperturbed, loop_cfg.guider, stg_flag * v_stg_on
            )
            a_denoised = combine(
                ap, an, aperturbed, loop_cfg.audio_guider, stg_flag * a_stg_on
            )
            return v_denoised, a_denoised, v_delta, a_delta

        step_ids, stg_flags = _stg_step_flags(num_steps, loop_cfg.stg_cutoff)

        def step_fn(carry, xs):
            if reuse_cfg:
                v_latent, a_latent, prev_velocity, v_delta, a_delta = carry
                step_idx, sigma, sigma_next, stg_flag, cfg_flag = xs
                v_denoised, a_denoised, v_delta, a_delta = jax.lax.cond(
                    cfg_flag, eval_full, eval_reused,
                    v_latent, a_latent, sigma, v_delta, a_delta, stg_flag,
                )
            elif stateful_guider:
                v_latent, a_latent, prev_velocity, v_ema, a_ema = carry
                step_idx, sigma, sigma_next, stg_flag = xs
                v_delta = a_delta = None
                v_outs, a_outs = forward_full(v_latent, a_latent, sigma)
                vp, vn, vperturbed = split(v_outs, True)
                ap, an, aperturbed = split(a_outs, True)
                v_denoised, v_ema = combine_stateful(
                    vp, vn, vperturbed, loop_cfg.guider, stg_flag * v_stg_on,
                    v_ema,
                )
                a_denoised, a_ema = combine_stateful(
                    ap, an, aperturbed, loop_cfg.audio_guider,
                    stg_flag * a_stg_on, a_ema,
                )
            else:
                v_latent, a_latent, prev_velocity = carry
                step_idx, sigma, sigma_next, stg_flag = xs
                v_delta = a_delta = None
                v_outs, a_outs = forward_full(v_latent, a_latent, sigma)
                v_denoised = _combine_guidance(
                    loop_cfg, v_outs, loop_cfg.guider, stg_flag * v_stg_on, batch
                )
                a_denoised = _combine_guidance(
                    loop_cfg, a_outs, loop_cfg.audio_guider, stg_flag * a_stg_on,
                    batch,
                )
            v_denoised, prev_velocity = _ge_correct(
                loop_cfg, v_latent, v_denoised, sigma, prev_velocity, step_idx
            )
            v_denoised = post_process_latent(v_denoised, v_mask, v_clean)
            a_denoised = post_process_latent(a_denoised, a_mask, a_clean)

            if loop_cfg.sampler == "heun":
                v_pred = _euler_step(v_latent, v_denoised, sigma, sigma_next)
                a_pred = _euler_step(a_latent, a_denoised, sigma, sigma_next)
                # Corrector: CFG-only, no STG row runs or combines (review
                # r4: this previously ran forward_full and applied the STG
                # delta to the second evaluation — the reference never does).
                if reuse_cfg:
                    # Reuses the step's (possibly fresh) deltas — one
                    # reduced forward instead of a full one.
                    v_outs2, a_outs2 = forward_corr_reduced(
                        v_pred, a_pred, sigma_next
                    )
                    vp2, _, _ = _split_rows(v_outs2, batch, False, False)
                    ap2, _, _ = _split_rows(a_outs2, batch, False, False)
                    vn2 = (vp2.astype(jnp.float32) - v_delta).astype(vp2.dtype)
                    an2 = (ap2.astype(jnp.float32) - a_delta).astype(ap2.dtype)
                    v_d2 = combine_corr(vp2, vn2, loop_cfg.guider)
                    a_d2 = combine_corr(ap2, an2, loop_cfg.audio_guider)
                else:
                    # Stateful guiders read the step's EMA without
                    # advancing it.
                    v_outs2, a_outs2 = forward_corr(v_pred, a_pred, sigma_next)
                    vp2, vn2, _ = _split_rows(
                        v_outs2, batch, loop_cfg.need_cfg, False
                    )
                    ap2, an2, _ = _split_rows(
                        a_outs2, batch, loop_cfg.need_cfg, False
                    )
                    v_d2 = combine_corr(
                        vp2, vn2, loop_cfg.guider,
                        v_ema if stateful_guider else None,
                    )
                    a_d2 = combine_corr(
                        ap2, an2, loop_cfg.audio_guider,
                        a_ema if stateful_guider else None,
                    )
                v_d2 = post_process_latent(v_d2, v_mask, v_clean)
                a_d2 = post_process_latent(a_d2, a_mask, a_clean)
                safe_next = jnp.where(sigma_next == 0, 1.0, sigma_next)

                def heun(latent, d1, pred, d2):
                    w1 = (latent.astype(jnp.float32) - d1) / sigma
                    w2 = (pred.astype(jnp.float32) - d2) / safe_next
                    out = (
                        latent.astype(jnp.float32) + 0.5 * (w1 + w2) * (sigma_next - sigma)
                    ).astype(latent.dtype)
                    return jnp.where(sigma_next == 0, d1.astype(latent.dtype), out)

                new_v = heun(v_latent, v_denoised, v_pred, v_d2)
                new_a = heun(a_latent, a_denoised, a_pred, a_d2)
            else:
                new_v = _euler_step(v_latent, v_denoised, sigma, sigma_next)
                new_a = _euler_step(a_latent, a_denoised, sigma, sigma_next)

            if reuse_cfg:
                return (new_v, new_a, prev_velocity, v_delta, a_delta), None
            if stateful_guider:
                return (new_v, new_a, prev_velocity, v_ema, a_ema), None
            return (new_v, new_a, prev_velocity), None

        init = (
            video_state.latent,
            audio_state.latent,
            jnp.zeros_like(video_state.latent, jnp.float32),
        )
        xs = (
            step_ids.astype(jnp.float32),
            sigmas[:-1].astype(jnp.float32),
            sigmas[1:].astype(jnp.float32),
            stg_flags,
        )
        if reuse_cfg:
            init = init + (
                jnp.zeros_like(video_state.latent, jnp.float32),
                jnp.zeros_like(audio_state.latent, jnp.float32),
            )
            xs = xs + ((step_ids % loop_cfg.cfg_interval) == 0,)
        elif stateful_guider:
            # Zero EMA == "no carry yet": momentum*0 + guidance at step 0
            # matches StatefulAPGGuider's carry=None initialization.
            init = init + (
                jnp.zeros_like(video_state.latent, jnp.float32),
                jnp.zeros_like(audio_state.latent, jnp.float32),
            )
        (final_v, final_a, *_), _ = jax.lax.scan(step_fn, init, xs)
        return video_state.replace(latent=final_v), audio_state.replace(latent=final_a)

    return jax.jit(loop)


@dataclass(frozen=True)
class MultiModalLoopConfig:
    """Static config for the MultiModalGuider AV loop (two-stage stage 1).

    Mirrors MultiModalGuiderParams (guiders.py:211-288): CFG + STG +
    modality-isolated guidance with std-ratio rescale and step skipping.
    """

    video_cfg_scale: float = 3.0
    audio_cfg_scale: float = 7.0
    stg_scale: float = 0.0
    stg_blocks: Optional[Tuple[int, ...]] = None
    rescale_scale: float = 0.0
    modality_scale: float = 3.0
    skip_step: int = 0
    # Guidance reuse: recompute the uncond AND modality-isolation rows
    # every k-th step only; their fp32 deltas (cond - row, per modality)
    # carry between. The STG row (if any) always runs live. For the
    # default 3-row recipe (cond/uncond/mod) skip steps run 1 row instead
    # of 3. 1 = exact (default).
    cfg_interval: int = 1

    @property
    def need_cfg(self) -> bool:
        import math
        return not math.isclose(self.video_cfg_scale, 1.0) or not math.isclose(
            self.audio_cfg_scale, 1.0
        )

    @property
    def need_stg(self) -> bool:
        import math
        return not math.isclose(self.stg_scale, 0.0)

    @property
    def need_mod(self) -> bool:
        import math
        return not math.isclose(self.modality_scale, 1.0)

    @property
    def rows(self) -> int:
        return 1 + int(self.need_cfg) + int(self.need_stg) + int(self.need_mod)


def _build_mm_perturbations(
    mm: MultiModalLoopConfig, with_guidance: bool = True, batch: int = 1
) -> Optional[BatchedPerturbationConfig]:
    """Row-wise perturbations: the STG pass's rows skip video self-attn;
    the modality-isolation pass's rows skip both A<->V cross attentions.
    Each pass spans `batch` samples (pass-major, matching _mm_split). With
    `with_guidance=False` (guidance-reuse skip steps) the uncond and
    modality rows are absent."""
    from ltx2_tpu.components.perturbations import Perturbation, PerturbationType

    if not (mm.need_stg or (mm.need_mod and with_guidance)):
        return None
    rows = [PerturbationConfig.empty()] * batch  # cond
    if mm.need_cfg and with_guidance:
        rows += [PerturbationConfig.empty()] * batch
    if mm.need_stg:
        rows += [
            PerturbationConfig(
                perturbations=(
                    Perturbation(
                        type=PerturbationType.SKIP_VIDEO_SELF_ATTN,
                        blocks=mm.stg_blocks,
                    ),
                )
            )
        ] * batch
    if mm.need_mod and with_guidance:
        rows += [
            PerturbationConfig(
                perturbations=(
                    Perturbation(type=PerturbationType.SKIP_A2V_CROSS_ATTN, blocks=None),
                    Perturbation(type=PerturbationType.SKIP_V2A_CROSS_ATTN, blocks=None),
                )
            )
        ] * batch
    return BatchedPerturbationConfig(perturbations=tuple(rows))


def _mm_split(
    mm: MultiModalLoopConfig, outs, batch: int = 1, with_guidance: bool = True
):
    """Split pass-major batched rows -> (cond, uncond, ptb, mod); absent
    rows None. Each pass spans `batch` samples ([cond x B, uncond x B, ...]
    — same layout rule as _split_rows).

    `with_guidance=False` is the reduced reuse-step layout: the uncond and
    modality-isolation rows are dropped (their deltas come from the carry),
    the STG perturbation row (if any) stays live.
    """
    idx = 1
    cond = outs[0:batch]
    uncond = ptb = mod = None
    if mm.need_cfg and with_guidance:
        uncond = outs[idx * batch : (idx + 1) * batch]
        idx += 1
    if mm.need_stg:
        ptb = outs[idx * batch : (idx + 1) * batch]
        idx += 1
    if mm.need_mod and with_guidance:
        mod = outs[idx * batch : (idx + 1) * batch]
        idx += 1
    return cond, uncond, ptb, mod


def _mm_combine_deltas(
    mm: MultiModalLoopConfig, cond, d_uncond, ptb, d_mod, cfg_scale, skip_flag
):
    """MultiModalGuider.calculate (guiders.py:244-273) in delta form:
    d_uncond = cond - uncond, d_mod = cond - mod (fp32 carries under
    guidance reuse); the STG term uses the live perturbed row."""
    pred = cond
    if mm.need_cfg:
        pred = pred + (cfg_scale - 1.0) * d_uncond.astype(cond.dtype)
    if mm.need_stg:
        pred = pred + mm.stg_scale * (cond - ptb)
    if mm.need_mod:
        pred = pred + (mm.modality_scale - 1.0) * d_mod.astype(cond.dtype)
    if mm.rescale_scale != 0:
        # Per-sample std ratio: identical to the reference's global
        # mx.var() on its always-batch-1 rows, correct under multi-clip
        # batching (one clip's variance must not rescale another's).
        axes = tuple(range(1, jnp.ndim(pred)))
        cond_std = jnp.sqrt(jnp.var(cond, axis=axes, keepdims=True) + 1e-8)
        pred_std = jnp.sqrt(jnp.var(pred, axis=axes, keepdims=True) + 1e-8)
        factor = mm.rescale_scale * (cond_std / pred_std) + (1 - mm.rescale_scale)
        pred = pred * factor
    # Guidance skipped on flagged steps -> plain cond (guiders.py:284-287).
    return jnp.where(skip_flag > 0, cond, pred)


def _mm_combine(
    mm: MultiModalLoopConfig, outs, cfg_scale: float, skip_flag, batch: int = 1
):
    """MultiModalGuider.calculate over full batched rows."""
    cond, uncond, ptb, mod = _mm_split(mm, outs, batch)
    d_uncond = (cond - uncond) if mm.need_cfg else None
    d_mod = (cond - mod) if mm.need_mod else None
    return _mm_combine_deltas(mm, cond, d_uncond, ptb, d_mod, cfg_scale, skip_flag)


@lru_cache(maxsize=16)
def make_multimodal_av_denoise_loop(
    model_cfg: LTXModelConfig,
    mm: MultiModalLoopConfig,
    mesh: Optional[Mesh] = None,
    sequence_axis: str = "seq",
    pipeline_axis: Optional[str] = None,
    pipeline_microbatches: int = 0,
):
    """Joint AV denoise loop under the MultiModalGuider (two_stage.py stage 1).

    Returns fn(params, video_state, audio_state, sigmas,
               pos_v, neg_v, pos_a, neg_a) -> (video_state, audio_state).

    NOTE on SP + rescale: _mm_combine's std-ratio rescale reduces over the
    full token axis; it runs in the outer GSPMD jit (on the gathered loop
    latents), so token sharding inside the forward does not change its math.

    With `mm.cfg_interval > 1`, the uncond and modality-isolation rows run
    only every k-th step; their fp32 deltas (per modality) carry between,
    so the default 3-row recipe runs a single cond row on skip steps.
    """
    if mm.cfg_interval < 1:
        raise ValueError(f"cfg_interval must be >= 1, got {mm.cfg_interval}")
    reuse = mm.cfg_interval > 1 and (mm.need_cfg or mm.need_mod)
    if reuse and pipeline_axis is not None:
        raise NotImplementedError(
            "cfg_interval > 1 does not compose with pipeline parallelism: "
            "the GPipe microbatch schedule is built from the guidance rows, "
            "which differ between recompute and reuse steps"
        )

    def loop(params, video_state, audio_state, sigmas, pos_v, neg_v, pos_a, neg_a):
        num_steps = sigmas.shape[0] - 1
        batch = video_state.latent.shape[0]
        if audio_state.latent.shape[0] != batch:
            raise ValueError(
                f"video batch {batch} != audio batch "
                f"{audio_state.latent.shape[0]}"
            )

        v_mask, v_clean = video_state.denoise_mask, video_state.clean_latent
        a_mask, a_clean = audio_state.denoise_mask, audio_state.clean_latent

        if mesh is not None and (
            pipeline_axis is None or dict(mesh.shape).get(sequence_axis, 1) > 1
        ):
            _check_seq_divisible(video_state.latent.shape[1], mesh, sequence_axis, "video")
            _check_seq_divisible(audio_state.latent.shape[1], mesh, sequence_axis, "audio")

        def build_forward(with_guidance: bool):
            r = 1 + int(mm.need_stg) + (
                (int(mm.need_cfg) + int(mm.need_mod)) if with_guidance else 0
            )
            perturb = _build_mm_perturbations(mm, with_guidance, batch)

            def stack_ctx(pos, neg):
                ctxs = [pos]
                if mm.need_cfg and with_guidance:
                    ctxs.append(neg)
                if mm.need_stg:
                    ctxs.append(pos)
                if mm.need_mod and with_guidance:
                    ctxs.append(pos)
                return jnp.concatenate(ctxs, axis=0)

            v_ctx = stack_ctx(pos_v, neg_v)
            a_ctx = stack_ctx(pos_a, neg_a)
            v_positions = _tile_rows(video_state.positions, r)
            a_positions = _tile_rows(audio_state.positions, r)
            video_pe = _precompute_video_pe(model_cfg, video_state.positions, r)

            sp_forward = None
            if mesh is not None and pipeline_axis is not None:
                sp_forward = _make_pp_forward(
                    model_cfg, mesh, pipeline_axis,
                    pipeline_microbatches or r, perturb, None, n_modalities=2,
                )
            elif mesh is not None:
                sp_forward = _make_sp_forward(
                    model_cfg, mesh, sequence_axis, perturb, n_modalities=2
                )

            def forward(v_latent, a_latent, sigma):
                v_state = LatentState(
                    latent=_tile_rows(v_latent, r),
                    denoise_mask=_tile_rows(v_mask, r),
                    positions=v_positions,
                    clean_latent=_tile_rows(v_clean, r),
                )
                a_state = LatentState(
                    latent=_tile_rows(a_latent, r),
                    denoise_mask=_tile_rows(a_mask, r),
                    positions=a_positions,
                    clean_latent=_tile_rows(a_clean, r),
                )
                v_mod = modality_from_state(v_state, v_ctx, sigma)
                a_mod = modality_from_state(a_state, a_ctx, sigma)
                if sp_forward is not None:
                    return sp_forward(params, v_mod, a_mod, video_pe, None, None)
                from ltx2_tpu.models.transformer.model import x0_model_apply

                return x0_model_apply(
                    params, model_cfg, video=v_mod, audio=a_mod,
                    perturbations=perturb, video_pe=video_pe,
                )

            return forward

        forward_full = build_forward(with_guidance=True)
        forward_reduced = build_forward(with_guidance=False) if reuse else None

        def zero_delta(state):
            return jnp.zeros(state.latent.shape, jnp.float32)

        def eval_full(v_latent, a_latent, sigma, deltas, skip_flag):
            v_outs, a_outs = forward_full(v_latent, a_latent, sigma)
            v_cond, v_uncond, v_ptb, v_mod_row = _mm_split(mm, v_outs, batch)
            a_cond, a_uncond, a_ptb, a_mod_row = _mm_split(mm, a_outs, batch)
            v_du = (
                (v_cond - v_uncond).astype(jnp.float32)
                if mm.need_cfg else deltas[0]
            )
            v_dm = (
                (v_cond - v_mod_row).astype(jnp.float32)
                if mm.need_mod else deltas[1]
            )
            a_du = (
                (a_cond - a_uncond).astype(jnp.float32)
                if mm.need_cfg else deltas[2]
            )
            a_dm = (
                (a_cond - a_mod_row).astype(jnp.float32)
                if mm.need_mod else deltas[3]
            )
            v_den = _mm_combine_deltas(
                mm, v_cond, v_du, v_ptb, v_dm, mm.video_cfg_scale, skip_flag
            )
            a_den = _mm_combine_deltas(
                mm, a_cond, a_du, a_ptb, a_dm, mm.audio_cfg_scale, skip_flag
            )
            return v_den, a_den, (v_du, v_dm, a_du, a_dm)

        def eval_reused(v_latent, a_latent, sigma, deltas, skip_flag):
            v_outs, a_outs = forward_reduced(v_latent, a_latent, sigma)
            v_cond, _, v_ptb, _ = _mm_split(mm, v_outs, batch, with_guidance=False)
            a_cond, _, a_ptb, _ = _mm_split(mm, a_outs, batch, with_guidance=False)
            v_du, v_dm, a_du, a_dm = deltas
            v_den = _mm_combine_deltas(
                mm, v_cond, v_du, v_ptb, v_dm, mm.video_cfg_scale, skip_flag
            )
            a_den = _mm_combine_deltas(
                mm, a_cond, a_du, a_ptb, a_dm, mm.audio_cfg_scale, skip_flag
            )
            return v_den, a_den, deltas

        step_ids = jnp.arange(num_steps)
        if mm.skip_step > 0:
            skip_flags = (step_ids % (mm.skip_step + 1) != 0).astype(jnp.float32)
        else:
            skip_flags = jnp.zeros((num_steps,), jnp.float32)

        def step_fn(carry, xs):
            if reuse:
                v_latent, a_latent, deltas = carry
                sigma, sigma_next, skip_flag, cfg_flag = xs
                v_denoised, a_denoised, deltas = jax.lax.cond(
                    cfg_flag, eval_full, eval_reused,
                    v_latent, a_latent, sigma, deltas, skip_flag,
                )
            else:
                v_latent, a_latent = carry
                sigma, sigma_next, skip_flag = xs
                zeros = (
                    zero_delta(video_state), zero_delta(video_state),
                    zero_delta(audio_state), zero_delta(audio_state),
                )
                v_denoised, a_denoised, _ = eval_full(
                    v_latent, a_latent, sigma, zeros, skip_flag
                )
            v_denoised = post_process_latent(v_denoised, v_mask, v_clean)
            a_denoised = post_process_latent(a_denoised, a_mask, a_clean)

            new_v = _euler_step(v_latent, v_denoised, sigma, sigma_next)
            new_a = _euler_step(a_latent, a_denoised, sigma, sigma_next)
            if reuse:
                return (new_v, new_a, deltas), None
            return (new_v, new_a), None

        xs = (
            sigmas[:-1].astype(jnp.float32),
            sigmas[1:].astype(jnp.float32),
            skip_flags,
        )
        init = (video_state.latent, audio_state.latent)
        if reuse:
            init = init + ((
                zero_delta(video_state), zero_delta(video_state),
                zero_delta(audio_state), zero_delta(audio_state),
            ),)
            xs = xs + ((step_ids % mm.cfg_interval) == 0,)
        (final_v, final_a, *_), _ = jax.lax.scan(step_fn, init, xs)
        return video_state.replace(latent=final_v), audio_state.replace(latent=final_a)

    return jax.jit(loop)
