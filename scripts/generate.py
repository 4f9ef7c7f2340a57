#!/usr/bin/env python
"""LTX-2 TPU generation CLI.

Capability parity with reference scripts/generate.py (2,728 LoC): prompt ->
Gemma text encoding (all-49-layer hidden states, fp32) -> feature extractor
+ connector -> transformer load (version auto-detected from safetensors
metadata) -> pipeline dispatch (one-stage / text-to-video / distilled /
two-stage / keyframe / ti2vid-hq / retake / ic-lora / a2vid) -> VAE decode
-> ffmpeg H.264 mux (with minterpolate fps upsampling and audio mux).

Weight-free smoke-testing flags mirror the reference (tests/README.md:46-58):
--placeholder (random-weight models), --no-gemma (dummy embeddings),
--skip-vae (write latents instead of decoding).
"""

from __future__ import annotations

import argparse
from functools import lru_cache as _lru_cache
import json
import os
import subprocess
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

# This environment's sitecustomize registers a TPU plugin and overrides
# JAX_PLATFORMS; re-apply the user's choice through jax.config (must happen
# before any backend initialization).
from ltx2_tpu.utils.platform import apply_env_platform_overrides

apply_env_platform_overrides()


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="LTX-2 TPU video generation")
    # Prompts
    p.add_argument("--prompt", type=str, default="A cinematic shot of the ocean at sunset")
    p.add_argument("--negative-prompt", type=str, default=(
        "worst quality, inconsistent motion, blurry, jittery, distorted"
    ))
    p.add_argument("--enhance-prompt", action="store_true")
    # Pipeline
    p.add_argument(
        "--pipeline",
        choices=[
            "one-stage", "text-to-video", "distilled", "two-stage",
            "keyframe", "ti2vid-hq", "retake", "ic-lora", "a2vid",
        ],
        default="distilled",
    )
    # Dimensions
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--width", type=int, default=768)
    p.add_argument("--num-frames", "--frames", type=int, default=65)
    p.add_argument("--fps", type=float, default=24.0)
    p.add_argument("--output-fps", type=float, default=None,
                   help="mux at this fps via minterpolate if > --fps")
    # Sampling
    p.add_argument("--num-inference-steps", "--steps", type=int, default=30)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--cfg-scale", "--cfg", type=float, default=3.0)
    p.add_argument("--audio-cfg-scale", type=float, default=7.0)
    p.add_argument("--rescale-scale", "--guidance-rescale", type=float, default=0.7)
    p.add_argument("--modality-scale", type=float, default=3.0)
    p.add_argument("--stg-scale", type=float, default=0.0)
    p.add_argument("--stg-blocks", type=str, default=None,
                   help="comma-separated block indices")
    p.add_argument("--stg-cutoff", type=float, default=1.0)
    p.add_argument("--ge-gamma", type=float, default=0.0)
    p.add_argument("--sampler", choices=["euler", "heun"], default="euler")
    p.add_argument("--apg-scale", type=float, default=0.0)
    p.add_argument("--apg-eta", type=float, default=1.0)
    p.add_argument("--apg-norm-threshold", type=float, default=0.0,
                   help="APG guidance-norm clamp (0 = disabled)")
    p.add_argument("--apg-momentum", type=float, default=0.0,
                   help="APG momentum EMA of the guidance delta "
                        "(0 = disabled, try 0.5-0.9)")
    p.add_argument("--stg-mode", choices=["video", "audio", "both"],
                   default="video",
                   help="which stream(s) the STG perturbation pass skips "
                        "self-attention in (AV checkpoints)")
    p.add_argument("--vae-w-shard", type=int, default=0,
                   help="decode the video W-sharded over this many chips "
                        "with explicit per-conv halo exchange (untiled "
                        "decode of one oversized frame; latent W must "
                        "divide the count). 0 = single-chip decode")
    p.add_argument("--token-shift", action="store_true",
                   help="shift the sigma schedule by the ACTUAL latent "
                        "token count (upstream-LTX resolution-aware "
                        "design). Default off = the reference's fixed "
                        "4096-token anchor (its pipelines never pass the "
                        "latent to the scheduler)")
    p.add_argument("--token-bucket", type=int, default=0,
                   help="round the video token count up to a multiple of "
                        "this and mask the padding (one-stage/text-to-video"
                        "): any resolution landing in the same bucket "
                        "reuses ONE compiled denoise loop — unseen shapes "
                        "inside a warm bucket cost zero new compiles. 0 = "
                        "exact shapes (default)")
    p.add_argument("--cfg-interval", type=int, default=1,
                   help="guidance reuse: run the unconditional CFG forward "
                        "only every k-th denoise step and carry the "
                        "guidance delta between (k=2 removes ~half the "
                        "uncond forwards from 30-step CFG recipes; "
                        "video-only). 1 = exact CFG (default)")
    p.add_argument("--cross-attn-scale", type=float, default=1.0)
    p.add_argument("--cross-attn-start-block", type=int, default=40)
    # Checkpoints
    p.add_argument("--checkpoint", "--weights", type=str, default=None,
                   help="unified LTX-2 safetensors checkpoint")
    p.add_argument("--gemma-dir", "--gemma-path", type=str, default=None)
    p.add_argument("--spatial-upscaler", "--spatial-upscaler-weights", type=str, default=None)
    p.add_argument("--temporal-upscaler", "--temporal-upscaler-weights", type=str, default=None,
                   help="enables 2x frame-rate latent upscaling")
    p.add_argument("--upscale-spatial", action="store_true",
                   help="reference compat: 2x spatial latent upscale after "
                        "the denoise loop (one-stage/text-to-video; "
                        "defaults --spatial-upscaler to the reference "
                        "weights path)")
    p.add_argument("--upscale-temporal", action="store_true",
                   help="reference compat: 2x temporal latent upscale after "
                        "the denoise loop (defaults --temporal-upscaler to "
                        "the reference weights path)")
    p.add_argument("--lora", action="append", default=[],
                   help="path[:strength], repeatable")
    p.add_argument("--distilled-lora", type=str, default=None)
    p.add_argument("--dtype", choices=["float32", "bfloat16"], default="bfloat16")
    # Reference-CLI compatibility (scripts/generate.py:2366-2638 flag names;
    # normalized in _apply_reference_compat)
    p.add_argument("--fp16", action="store_true",
                   help="reference compat: 16-bit compute (maps to bfloat16 "
                        "— the TPU-native 16-bit format)")
    p.add_argument("--fp32", "--no-fp16", action="store_true", dest="fp32",
                   help="reference compat: fp32 compute (same as "
                        "--dtype float32)")
    p.add_argument("--fp8", action="store_true",
                   help="reference compat: same as --fp8-serving")
    p.add_argument("--model-variant", choices=["distilled", "dev"],
                   default="distilled",
                   help="default checkpoint selection when --checkpoint is "
                        "omitted: weights/ltx-2/ltx-2-19b-<variant>"
                        "[-fp8].safetensors (reference layout)")
    p.add_argument("--low-memory", action="store_true",
                   help="reference compat: accepted, no-op (XLA manages "
                        "memory; use --fp8-serving / tiling / --pp-stages "
                        "for real memory levers)")
    p.add_argument("--fast-mode", action="store_true",
                   help="reference compat: accepted, no-op (no mx.eval "
                        "scheduling under jit)")
    p.add_argument("--image-strength", type=float, default=0.95,
                   help="default conditioning strength for --image specs "
                        "without an explicit :strength")
    p.add_argument("--lora-strength", type=float, default=1.0,
                   help="default strength for --lora specs without an "
                        "explicit :strength")
    p.add_argument("--distilled-lora-scale", type=float, default=1.0,
                   help="strength of --distilled-lora in stage 2")
    p.add_argument("--cfg-stage1", type=float, default=None,
                   help="two-stage: stage-1 CFG scale (defaults to "
                        "--cfg-scale)")
    p.add_argument("--steps-stage1", type=int, default=None,
                   help="two-stage: stage-1 steps (alias for "
                        "--num-inference-steps on that pipeline)")
    p.add_argument("--steps-stage2", type=int, default=None,
                   help="two-stage stage 2 uses the fixed 3-sigma distilled "
                        "tail (reference behavior); other values warn")
    p.add_argument("--canny-low", type=int, default=100,
                   help="canny low threshold for --control-type canny")
    p.add_argument("--canny-high", type=int, default=200,
                   help="canny high threshold for --control-type canny")
    p.add_argument("--control-strength", type=float, default=0.95,
                   help="ic-lora control conditioning strength")
    p.add_argument("--save-control", action="store_true",
                   help="write the preprocessed control signal next to the "
                        "source video (debug)")
    p.add_argument("--ic-lora-weights", type=str, default=None,
                   help="IC-LoRA safetensors (equivalent to the first "
                        "--lora for the ic-lora pipeline)")
    p.add_argument("--tiled-vae", action="store_true",
                   help="force tiled VAE decoding at the default tile "
                        "geometry (auto-enabled for large outputs anyway)")
    p.add_argument("--early-layers-only", action="store_true",
                   help="EXPERIMENTAL (reference parity): bypass the text-"
                        "encoder pipeline and condition on Gemma layer-0 "
                        "input embeddings only")
    p.add_argument("--speed", type=float, default=1.0,
                   help="playback speed multiplier at mux (0.5=slow-mo, "
                        "2.0=fast)")
    # Serving optimizations
    p.add_argument("--fp8-serving", action="store_true",
                   help="keep fp8 checkpoint weights quantized in HBM "
                        "(dequant at use; fits 48-block 19B on a 16GB chip)")
    p.add_argument("--int8", action="store_true",
                   help="quantize DiT matmul weights to int8 W8A8 at load "
                        "(per-out-channel weights + per-token dynamic "
                        "activations; 2x bf16 MXU throughput on v5e, "
                        "~0.5x weight HBM). Opt-in serving mode beyond the "
                        "reference; excludes --fp8-serving")
    p.add_argument("--cache-text-kv", action="store_true",
                   help="precompute text cross-attn K/V once per generation "
                        "(V1 checkpoints only; helps bf16 weights, not fp8)")
    p.add_argument("--sp-devices", type=int, default=0,
                   help="shard the video-token axis over this many devices "
                   "(sequence parallelism / ring attention); 0 = off")
    p.add_argument("--pp-stages", type=int, default=0,
                   help="stage the 48-block stack over this many devices "
                   "(GPipe pipeline parallelism; weights layer-sharded, "
                   "guidance rows as microbatches); 0 = off")
    p.add_argument("--tp-devices", type=int, default=0,
                   help="tensor-parallel the DiT over this many devices "
                   "(Megatron QKV/FFN sharding, GSPMD collectives); "
                   "weights stream directly onto their shards; 0 = off")
    p.add_argument("--vae-dp-devices", type=int, default=0,
                   help="decode VAE tiles data-parallel over this many "
                   "devices (same-shape tiles batch one per chip; requires "
                   "tiling, composes with any DiT parallelism); 0 = off")
    p.add_argument("--auto-shard", type=int, default=0,
                   help="pick the best (tp, sp, pp) layout for this many "
                   "devices from the SCALING.md comm/compute model "
                   "(parallel/advisor.py) at this request's token count; "
                   "explicit --tp-devices/--sp-devices/--pp-stages always "
                   "win; 0 = off")
    p.add_argument("--gemma-fp8", action="store_true",
                   help="quantize Gemma matmul weights to fp8 at load "
                        "(12B text encoder fits a 16GB chip)")
    # Conditioning
    p.add_argument("--image", action="append", default=[],
                   help="path[:frame[:strength]] image condition, repeatable")
    p.add_argument("--keyframe", action="append", default=[],
                   help="path:frame[:strength] keyframe, repeatable")
    p.add_argument("--control-video", type=str, default=None)
    p.add_argument("--control-type", choices=["raw", "canny"], default="raw")
    p.add_argument("--video", type=str, default=None, help="source video (retake)")
    p.add_argument("--retake-start", type=float, default=0.0)
    p.add_argument("--retake-end", type=float, default=1.0)
    p.add_argument("--audio-file", type=str, default=None, help="a2vid source audio")
    # Audio
    p.add_argument("--audio", "--generate-audio", action="store_true", help="generate audio")
    p.add_argument("--no-internal-audio", action="store_true")
    # Tiling
    p.add_argument("--tile-size", type=int, default=None)
    p.add_argument("--tile-overlap", type=int, default=64)
    p.add_argument("--temporal-tile-size", type=int, default=None)
    p.add_argument("--temporal-tile-overlap", type=int, default=24)
    # Embedding cache (reference --embedding flag, generate.py:730)
    p.add_argument("--embedding", type=str, default=None,
                   help="npz with cached text embeddings (skips Gemma)")
    p.add_argument("--save-embedding", type=str, default=None)
    # Debug / placeholder modes
    p.add_argument("--placeholder", action="store_true",
                   help="random-weight models (no checkpoint needed)")
    p.add_argument("--no-gemma", action="store_true",
                   help="dummy text embeddings")
    p.add_argument("--skip-vae", action="store_true",
                   help="save latents (npz) instead of decoding")
    p.add_argument("--profile-dir", type=str, default=None)
    p.add_argument("--compile-cache", type=str, default=None,
                   help="persistent XLA compilation cache dir: compiled "
                        "programs survive process restarts, so a server "
                        "restart skips the first-request compile cost")
    # Output
    p.add_argument("--output", type=str, default="output.mp4")
    return p


def parse_lora_spec(spec: str, default_strength: float = 1.0):
    """'path[:strength]' -> LoRAConfig."""
    from ltx2_tpu.loader.lora import LoRAConfig

    if ":" in spec:
        path, strength = spec.rsplit(":", 1)
        return LoRAConfig(path=path, strength=float(strength))
    return LoRAConfig(path=spec, strength=default_strength)


def parse_loras(args):
    default = getattr(args, "lora_strength", 1.0)
    return [parse_lora_spec(spec, default) for spec in args.lora]


def parse_images(args):
    from ltx2_tpu.pipelines.common import ImageCondition

    conditions = []
    for spec in args.image:
        parts = spec.split(":")
        conditions.append(
            ImageCondition(
                image_path=parts[0],
                frame_index=int(parts[1]) if len(parts) > 1 else 0,
                strength=(
                    float(parts[2]) if len(parts) > 2
                    else getattr(args, "image_strength", 0.95)
                ),
            )
        )
    return conditions


def _maybe_int8(args, dit_params):
    """--int8 for the PLACEHOLDER path: quantize the (placed) random DiT
    to W8A8 int8 (loader/int8.py). Checkpoint loads instead quantize
    inside the streaming loader (quantize_int8=True), one stacked leaf at
    a time. Runs jitted over the already-sharded tree: column-parallel
    weights quantize shard-locally (out-channels on 'model'), and for
    row-parallel weights (to_out/w_down: in-features sharded, i.e. the
    amax reduction axis) GSPMD inserts the cross-shard max — do NOT move
    this into a shard_map, where reductions are shard-local and the
    row-parallel scales would silently diverge per shard."""
    if not getattr(args, "int8", False):
        return dit_params
    import jax

    from ltx2_tpu.loader.int8 import quantize_params_int8
    from ltx2_tpu.utils.profiling import log

    log.info("--int8: quantizing DiT matmul weights to int8 W8A8")
    return jax.jit(quantize_params_int8)(dit_params)


def _round_two_stage_geometry(args):
    """Reference CLI behavior (reference generate.py:1300-1307): two-stage
    rounds the resolution UP to %64 instead of erroring. Shared by the CLI
    launch path and serve's per-request overrides (advisor r3: a serve
    request flipping pipeline=two-stage over a non-%64 resident resolution
    bypassed the launch-time rounding and died in TwoStageCFGConfig)."""
    if args.pipeline == "two-stage" and (
        args.height % 64 != 0 or args.width % 64 != 0
    ):
        from ltx2_tpu.utils.profiling import log

        new_h = ((args.height + 63) // 64) * 64
        new_w = ((args.width + 63) // 64) * 64
        log.warning(
            "two-stage requires resolution divisible by 64; adjusting "
            "%dx%d -> %dx%d", args.height, args.width, new_h, new_w,
        )
        args.height, args.width = new_h, new_w
    return args


def _apply_reference_compat(args):
    """Normalize reference-CLI compatibility flags onto the native ones
    (reference generate.py:2366-2638 surface)."""
    from ltx2_tpu.utils.profiling import log

    if args.fp32:
        args.dtype = "float32"
    elif args.fp16:
        log.info("--fp16: using bfloat16 (the TPU-native 16-bit format)")
    if args.fp8:
        args.fp8_serving = True
    if args.int8 and args.fp8_serving:
        raise SystemExit(
            "--int8 and --fp8-serving are mutually exclusive: int8 W8A8 "
            "re-quantizes from full-precision weights (load dequantized, "
            "i.e. drop --fp8-serving/--fp8, to use --int8)"
        )
    if args.int8:
        # Reject int8 x runtime-LoRA-fuse at LAUNCH: the deep guard in
        # loader/lora.py only fires at the stage-2 fuse, i.e. after
        # minutes of stage-1 compute. (The deep guard stays for serve
        # requests that flip the pipeline per-request.) Load-time --lora
        # specs fuse BEFORE quantization and are fine.
        runtime_fuse = None
        if args.distilled_lora and args.pipeline in ("two-stage", "ti2vid-hq"):
            runtime_fuse = "--distilled-lora (fused into stage 2 at runtime)"
        elif args.pipeline == "ic-lora":
            runtime_fuse = "ic-lora's stage-boundary fuse/unfuse"
        if runtime_fuse:
            raise SystemExit(
                f"--int8 is incompatible with {runtime_fuse}: LoRA deltas "
                "need full-precision weights to fuse into. Drop --int8 "
                "for this pipeline."
            )
    if args.low_memory:
        log.info("--low-memory: no-op on TPU (XLA manages memory; see "
                 "--fp8-serving / --tiled-vae / --pp-stages)")
    if args.fast_mode:
        log.info("--fast-mode: no-op on TPU (no mx.eval scheduling under jit)")
    # Reference upscale booleans (generate.py:2449-2469): the weights-path
    # flags default to the reference layout when only the boolean is given.
    if args.upscale_spatial and args.spatial_upscaler is None:
        args.spatial_upscaler = (
            "weights/ltx-2/ltx-2-spatial-upscaler-x2-1.0.safetensors"
        )
    if args.upscale_temporal and args.temporal_upscaler is None:
        args.temporal_upscaler = (
            "weights/ltx-2/ltx-2-temporal-upscaler-x2-1.0.safetensors"
        )
    if args.upscale_spatial and args.pipeline not in (
        "one-stage", "text-to-video"
    ):
        log.info(
            "--upscale-spatial: --pipeline %s upscales internally (the "
            "post-hoc 2x applies to one-stage/text-to-video only, like the "
            "reference's standard flow)", args.pipeline,
        )
    _round_two_stage_geometry(args)
    if args.steps_stage1 is not None and args.pipeline in ("two-stage", "ti2vid-hq"):
        args.num_inference_steps = args.steps_stage1
    if args.steps_stage2 is not None and args.steps_stage2 != 3:
        log.info("--steps-stage2 %d: stage 2 uses the fixed 3-sigma "
                 "distilled tail (reference behavior); ignoring",
                 args.steps_stage2)
    if args.pipeline == "ic-lora":
        # The IC-LoRA fuses for STAGE 1 ONLY inside the pipeline (fuse ->
        # stage 1 -> restore); it must NOT also be fused at checkpoint load
        # by the ledger — that would double-apply it in stage 1 and leave
        # it permanently fused in stage 2. Route --lora specs to
        # --ic-lora-weights for this pipeline and keep them out of the
        # ledger's lora list.
        if args.lora and not args.ic_lora_weights:
            args.ic_lora_weights = args.lora[0]
        if args.ic_lora_weights:
            ic_path = args.ic_lora_weights.split(":")[0]
            args.lora = [s for s in args.lora if s.split(":")[0] != ic_path]
    if (
        args.checkpoint is None
        and not args.placeholder
        and args.model_variant
    ):
        suffix = "-fp8" if args.fp8_serving else ""
        candidate = f"weights/ltx-2/ltx-2-19b-{args.model_variant}{suffix}.safetensors"
        if os.path.exists(candidate):
            args.checkpoint = candidate
            log.info("--model-variant %s: using %s", args.model_variant, candidate)
    return args


def tiling_config(args):
    from ltx2_tpu.models.video_vae import (
        SpatialTilingConfig,
        TemporalTilingConfig,
        TilingConfig,
    )

    spatial = temporal = None
    if args.tile_size:
        spatial = SpatialTilingConfig(args.tile_size, args.tile_overlap)
    if args.temporal_tile_size:
        temporal = TemporalTilingConfig(args.temporal_tile_size, args.temporal_tile_overlap)
    if spatial or temporal:
        return TilingConfig(spatial_config=spatial, temporal_config=temporal)
    if getattr(args, "tiled_vae", False):
        return TilingConfig.default()
    return None


# Cached jitted text-encoder applies: fresh jax.jit(lambda) per request
# would re-trace and re-compile the 12B Gemma encode on EVERY serving
# request (jit caches on function identity).
@_lru_cache(maxsize=8)
def _jitted_gemma(cfg):
    import jax

    from ltx2_tpu.models.text_encoder import gemma3_apply

    return jax.jit(lambda p, i, m: gemma3_apply(p, cfg, i, attention_mask=m))


@_lru_cache(maxsize=8)
def _jitted_av_text_encoder(cfg):
    import jax

    from ltx2_tpu.models.text_encoder import av_text_encoder_apply

    return jax.jit(lambda p, h, m: av_text_encoder_apply(p, cfg, h, m))


@_lru_cache(maxsize=8)
def _jitted_video_text_encoder(cfg):
    import jax

    from ltx2_tpu.models.text_encoder import video_text_encoder_apply

    return jax.jit(lambda p, h, m: video_text_encoder_apply(p, cfg, h, m))


def encode_prompts(args, ledger, dit_cfg):
    """Both prompts in one Gemma batch (generate.py:1098-1117), or cached /
    dummy embeddings. Returns dict with pos/neg video (+audio) encodings."""
    import jax
    import jax.numpy as jnp

    from ltx2_tpu.utils.profiling import log, phase

    if args.embedding:
        data = np.load(args.embedding)
        return {k: jnp.asarray(v) for k, v in data.items()}

    # Dummy-embedding dims must match what the DiT consumes: raw context at
    # cross_attention_dim when there is no caption projection (V2), else the
    # caption_channels the projection expects (V1).
    v_dim = dit_cfg.caption_channels or dit_cfg.cross_attention_dim
    a_dim = dit_cfg.caption_channels or dit_cfg.audio_inner_dim
    if ledger is None and not (args.no_gemma or args.placeholder):
        # build_models fell back to placeholder weights (no checkpoint
        # resolved) but real Gemma encoding was requested — fail with the
        # remedy instead of an AttributeError at ledger.gemma().
        raise SystemExit(
            "no checkpoint loaded (placeholder mode) but real text encoding "
            "was requested: pass --checkpoint, or add --no-gemma / "
            "--placeholder for dummy embeddings"
        )
    if args.no_gemma or args.placeholder or ledger is None:
        log.info("using dummy text embeddings (--no-gemma/--placeholder)")
        key = jax.random.PRNGKey(args.seed)
        ks = jax.random.split(key, 4)
        seq = 1024
        return {
            "positive": jax.random.normal(ks[0], (1, seq, v_dim)) * 0.02,
            "negative": jax.random.normal(ks[1], (1, seq, v_dim)) * 0.02,
            "positive_audio": jax.random.normal(ks[2], (1, seq, a_dim)) * 0.02,
            "negative_audio": jax.random.normal(ks[3], (1, seq, a_dim)) * 0.02,
        }

    with phase("text_encoding"):
        from transformers import AutoTokenizer

        from ltx2_tpu.models.text_encoder import (
            av_text_encoder_apply,
            gemma3_apply,
            video_text_encoder_apply,
        )

        tokenizer = AutoTokenizer.from_pretrained(args.gemma_dir, padding_side="left")

        prompt = args.prompt
        if args.enhance_prompt:
            from ltx2_tpu.models.text_encoder.generation import generate_text
            from ltx2_tpu.utils.prompt_enhancement import (
                T2V_SYSTEM_PROMPT,
                enhance_prompt,
                enhance_prompt_i2v,
            )

            gemma_params, gemma_cfg = ledger.gemma()

            def gen_fn(text, n, temperature=0.7, top_p=0.9):
                return generate_text(
                    gemma_params, gemma_cfg, tokenizer, text,
                    max_new_tokens=n, temperature=temperature, top_p=top_p,
                    seed=args.seed,
                )

            image = getattr(args, "image", None)
            if image:
                # reference prompt_enhancement.py:175-237 (text-only i2v)
                prompt = enhance_prompt_i2v(prompt, image, gen_fn)
            else:
                prompt = enhance_prompt(
                    prompt,
                    lambda text, n: gen_fn(text, n),
                    system_prompt=T2V_SYSTEM_PROMPT,
                )
            log.info("enhanced prompt: %s", prompt)

        prompts = [prompt, args.negative_prompt]
        enc = tokenizer(
            prompts, return_tensors="np", padding="max_length",
            truncation=True, max_length=1024,
        )
        ids = jnp.asarray(enc["input_ids"])
        mask = jnp.asarray(enc["attention_mask"])

        gemma_params, gemma_cfg = ledger.gemma()
        _, hidden = _jitted_gemma(gemma_cfg)(gemma_params, ids, mask)

        if args.early_layers_only:
            # EXPERIMENTAL reference parity (generate.py:420-440): bypass
            # the extractor/connector and condition on Gemma's layer-0
            # input embeddings, padding zeroed. Only V1 consumes raw
            # 3840-d context (caption projection); V2 projects via the
            # extractor and cannot take this shortcut.
            if dit_cfg.caption_channels != hidden.shape[-1]:
                raise SystemExit(
                    "--early-layers-only needs a V1 checkpoint whose "
                    f"caption projection takes {hidden.shape[-1]}-d input "
                    f"(this model consumes {v_dim}-d context)"
                )
            emb = hidden[0] * mask[:, :, None].astype(hidden.dtype)
            result = {"positive": emb[0:1], "negative": emb[1:2]}
            if args.save_embedding:
                np.savez(
                    args.save_embedding,
                    **{k: np.asarray(v) for k, v in result.items()},
                )
            return result

        te_params, te_cfg = ledger.text_encoder()
        if te_cfg.v2 or ledger.include_audio:
            out = _jitted_av_text_encoder(te_cfg)(te_params, hidden, mask)
            result = {
                "positive": out.video_encoding[0:1],
                "negative": out.video_encoding[1:2],
                "positive_audio": out.audio_encoding[0:1],
                "negative_audio": out.audio_encoding[1:2],
            }
        else:
            out = _jitted_video_text_encoder(te_cfg)(te_params, hidden, mask)
            result = {
                "positive": out.video_encoding[0:1],
                "negative": out.video_encoding[1:2],
            }

    if args.save_embedding:
        np.savez(args.save_embedding, **{k: np.asarray(v) for k, v in result.items()})
    return result


def _place_transformer(params, cfg, args, meshes):
    """Placeholder-mode re-placement + PP divisibility validation (checkpoint
    loads already stream sharded via the ledger's device_put hook)."""
    if "pipeline_mesh" in meshes:
        if cfg.num_layers % args.pp_stages != 0:
            raise SystemExit(
                f"--pp-stages {args.pp_stages} must divide "
                f"{cfg.num_layers} transformer blocks"
            )
        from ltx2_tpu.parallel.pipeline_parallel import shard_pipeline_params

        return shard_pipeline_params(
            meshes["pipeline_mesh"], params, model_axis=_pp_model_axis(meshes)
        )
    if "tp_mesh" in meshes:
        from ltx2_tpu.parallel.sharding import shard_dit_params

        return shard_dit_params(meshes["tp_mesh"], params)
    if _sp_model_axis(meshes):
        # SP x TP: block weights feature-shard over the sequence mesh's
        # 'model' axis (ring attention runs head-sharded inside shard_map).
        from ltx2_tpu.parallel.sharding import shard_dit_params

        return shard_dit_params(meshes["sequence_mesh"], params)
    return params


def _pp_model_axis(meshes):
    """'model' when the pipeline mesh also carries a TP axis (PP x TP)."""
    return _mesh_model_axis(meshes.get("pipeline_mesh"))


def _sp_model_axis(meshes):
    """'model' when the sequence mesh also carries a TP axis (SP x TP)."""
    return _mesh_model_axis(meshes.get("sequence_mesh"))


def _mesh_model_axis(mesh):
    if mesh is None:
        return None
    return "model" if dict(mesh.shape).get("model", 1) > 1 else None


def apply_auto_shard(args):
    """--auto-shard N: fill --tp-devices/--sp-devices/--pp-stages with the
    best modeled layout for N chips at this request's token count
    (parallel/advisor.py — the SAME comm/compute model SCALING.md prints).
    Explicit layout flags always win; the choice is logged with its
    one-line justification. Returns the LayoutEstimate or None."""
    n = getattr(args, "auto_shard", 0) or 0
    if n <= 1:
        return None
    from ltx2_tpu.utils.profiling import log

    if args.sp_devices or args.pp_stages or args.tp_devices:
        log.info(
            "--auto-shard %d ignored: explicit layout flags win "
            "(--tp-devices/--sp-devices/--pp-stages)", n,
        )
        return None
    from ltx2_tpu.parallel.advisor import (
        choose,
        flagship_serving_config,
        peek_checkpoint_arch,
        video_token_count,
    )

    if args.placeholder or args.checkpoint is None:
        # placeholder models are 4-head/4-layer (build_models below); the
        # chooser must respect THEIR divisibility constraints.
        import dataclasses as _dc

        cfg = _dc.replace(
            flagship_serving_config(),
            num_attention_heads=4, attention_head_dim=32,
            num_layers=4, cross_attention_dim=128,
        )
    else:
        cfg = flagship_serving_config()
        # Header-only peek: a non-flagship checkpoint (e.g. a 30-layer
        # fine-tune) must constrain tp/pp here, not crash at placement
        # after the mesh exists (review r5).
        layers, heads = peek_checkpoint_arch(args.checkpoint)
        if layers or heads:
            import dataclasses as _dc

            cfg = _dc.replace(
                cfg,
                num_layers=layers or cfg.num_layers,
                num_attention_heads=heads or cfg.num_attention_heads,
            )
    n_tokens = video_token_count(args.num_frames, args.height, args.width)
    # sp must divide EVERY token count that rides the sequence axis, not
    # just the final resolution (review r5): the two-stage recipe's
    # half-resolution stage 1 and the audio stream go through the same
    # _check_seq_divisible gates (pipelines/denoise.py:759-762, 1231-1232).
    pipeline = getattr(args, "pipeline", None)
    sp_constraints = []
    if pipeline == "two-stage":
        sp_constraints.append(
            video_token_count(args.num_frames, args.height // 2, args.width // 2)
        )
    if getattr(args, "audio", False) or pipeline == "a2vid":
        from ltx2_tpu.types import AudioLatentShape, VideoPixelShape

        sp_constraints.append(
            AudioLatentShape.from_video_pixel_shape(
                VideoPixelShape(
                    batch=1, frames=args.num_frames, height=args.height,
                    width=args.width, fps=getattr(args, "fps", 24.0) or 24.0,
                )
            ).frames
        )
    # Guidance rows drive the PP-microbatch bubble and all comm payloads.
    # The distilled pipeline is guidance-free regardless of --cfg-scale
    # (it hardcodes CFGGuider(1.0), pipelines/distilled.py:190), so only
    # STG can add a row there (review r5).
    if pipeline == "distilled":
        rows = 1 + int(args.stg_scale != 0.0)
    else:
        rows = 1 + int(args.cfg_scale > 1.0) + int(args.stg_scale != 0.0)
    best, _table = choose(
        cfg, n, n_tokens, rows=rows,
        extra_sp_constraints=tuple(sp_constraints),
    )
    args.tp_devices = best.tp if best.tp > 1 else 0
    args.sp_devices = best.sp if best.sp > 1 else 0
    args.pp_stages = best.pp if best.pp > 1 else 0
    log.info("%s", best.justification(n_tokens))
    return best


def build_meshes(args):
    """Multi-chip flags -> meshes, built BEFORE weight loading so checkpoint
    leaves can stream directly onto their shards (no single-chip staging).

    --pp-stages / --sp-devices / --tp-devices ALL compose in one
    (pipe, seq, model) mesh: blocks stage over 'pipe', tokens shard over
    'seq' (ring attention inside each stage), weights feature-shard over
    'model' — per-chip weights ~1/(P*T), activations ~1/S. --vae-dp-devices
    builds a separate decode mesh (tiled decode only)."""
    sp = args.sp_devices if args.sp_devices and args.sp_devices > 1 else 0
    pp = args.pp_stages if args.pp_stages and args.pp_stages > 1 else 0
    tp = args.tp_devices if args.tp_devices and args.tp_devices > 1 else 0
    vae_dp = args.vae_dp_devices if args.vae_dp_devices and args.vae_dp_devices > 1 else 0
    vae_w = getattr(args, "vae_w_shard", 0)
    vae_w = vae_w if vae_w and vae_w > 1 else 0
    meshes = {}
    if vae_w:
        import jax as _jax

        from ltx2_tpu.parallel.mesh import create_mesh

        if len(_jax.devices()) < vae_w:
            raise SystemExit(
                f"--vae-w-shard {vae_w} but only "
                f"{len(_jax.devices())} devices visible"
            )
        meshes["vae_w_mesh"] = create_mesh(
            data=vae_w, model=1, devices=_jax.devices()[:vae_w]
        )
    if vae_dp:
        # Independent mesh for tiled VAE decode (devices may overlap the DiT
        # mesh — decode runs after the denoise loop).
        import jax as _jax

        from ltx2_tpu.parallel.mesh import create_mesh

        if len(_jax.devices()) < vae_dp:
            raise SystemExit(
                f"--vae-dp-devices {vae_dp} but only "
                f"{len(_jax.devices())} devices visible"
            )
        meshes["vae_mesh"] = create_mesh(
            data=vae_dp, model=1, devices=_jax.devices()[:vae_dp]
        )
    if not (sp or pp or tp):
        return meshes
    import jax as _jax

    from ltx2_tpu.parallel.mesh import create_mesh

    n = (sp or 1) * (pp or 1) * (tp or 1) if (sp or pp) else tp
    flag = " x ".join(
        f for f, v in (("sp-devices", sp), ("pp-stages", pp), ("tp-devices", tp)) if v
    )
    if len(_jax.devices()) < n:
        raise SystemExit(
            f"--{flag} needs {n} devices but only {len(_jax.devices())} visible"
        )
    devices = _jax.devices()[:n]
    if pp:
        # One mesh composes PP with SP and/or TP: blocks stage over 'pipe',
        # tokens shard over 'seq', weights feature-shard over 'model'.
        meshes["pipeline_mesh"] = create_mesh(
            data=1, model=tp or 1, seq=sp or 1, pipe=pp, devices=devices
        )
        return meshes
    if sp:
        meshes["sequence_mesh"] = create_mesh(
            data=1, model=tp or 1, seq=sp, devices=devices
        )
        return meshes
    meshes["tp_mesh"] = create_mesh(data=1, model=tp, devices=devices)
    return meshes


def build_models(args, meshes=None):
    """Transformer + VAEs (+audio) from the checkpoint, or random placeholders."""
    import jax
    import jax.numpy as jnp

    from ltx2_tpu.utils.profiling import log, phase

    include_audio = args.audio or args.pipeline == "a2vid"

    if args.placeholder or args.checkpoint is None:
        log.info("placeholder mode: random-weight models")
        from ltx2_tpu.models.transformer.model import (
            LTXModelConfig,
            LTXModelType,
            init_ltx_model,
        )
        from ltx2_tpu.models.video_vae import (
            VideoDecoderConfig,
            VideoEncoderConfig,
            init_video_decoder,
            init_video_encoder,
        )

        # V2-style (no caption projection): cross_attention_dim must equal
        # the video inner dim, since raw context feeds cross-attn directly.
        dit_cfg = LTXModelConfig(
            model_type=LTXModelType.AudioVideo if include_audio else LTXModelType.VideoOnly,
            num_attention_heads=4,
            attention_head_dim=32,
            num_layers=4,
            cross_attention_dim=128,
            caption_channels=None,
            compute_dtype=args.dtype,
        )
        dit_params = jax.jit(lambda k: init_ltx_model(k, dit_cfg))(jax.random.PRNGKey(0))
        dec_cfg = VideoDecoderConfig(base_channels=16)
        dec_params = jax.jit(lambda k: init_video_decoder(k, dec_cfg))(jax.random.PRNGKey(1))
        # Small-channel encoder with the REAL stride geometry (patch 4 x
        # 2*2*2 downs = 32x32 spatial, 8x temporal) so latent-dim math and
        # the encode paths (retake / i2v / ic-lora / a2vid) work under
        # --placeholder too.
        enc_cfg = VideoEncoderConfig(
            plan=(
                ("res", 16, 1, None),
                ("down", 16, 16, (1, 2, 2)),
                ("res", 16, 1, None),
                ("down", 16, 16, (2, 1, 1)),
                ("res", 16, 1, None),
                ("down", 16, 32, (2, 2, 2)),
                ("res", 32, 1, None),
                ("down", 32, 32, (2, 2, 2)),
                ("res", 32, 1, None),
            )
        )
        enc_params = jax.jit(lambda k: init_video_encoder(k, enc_cfg))(
            jax.random.PRNGKey(4)
        )
        dit_params = _maybe_int8(
            args, _place_transformer(dit_params, dit_cfg, args, meshes or {})
        )
        models = dict(
            transformer_params=dit_params, transformer_cfg=dit_cfg,
            video_decoder_params=dec_params, video_decoder_cfg=dec_cfg,
            video_encoder_params=enc_params, video_encoder_cfg=enc_cfg,
        )
        if include_audio:
            from ltx2_tpu.models.audio_vae import (
                AudioDecoderConfig,
                VocoderConfig,
                init_audio_decoder,
                init_vocoder,
            )

            # Shapes must chain: latent (B, 8, T, 16) -> log-mel
            # (B, 2, T*4, 64) -> vocoder in_channels 2*64 = 128.
            a_cfg = AudioDecoderConfig(ch=8, num_res_blocks=1)
            a_params = jax.jit(lambda k: init_audio_decoder(k, a_cfg))(jax.random.PRNGKey(2))
            voc_cfg = VocoderConfig(
                resblock_kernel_sizes=(3,),
                upsample_rates=(2, 2),
                upsample_kernel_sizes=(4, 4),
                resblock_dilation_sizes=((1, 3),),
                upsample_initial_channel=16,
                resblock="AMP1",
            )
            voc_params = jax.jit(lambda k: init_vocoder(k, voc_cfg))(jax.random.PRNGKey(3))
            models.update(
                audio_decoder_params=a_params, audio_decoder_cfg=a_cfg,
                vocoder_params=voc_params, vocoder_cfg=voc_cfg,
            )
        return models, None

    from ltx2_tpu.utils.model_ledger import ModelLedger

    meshes = meshes or {}
    device_put = None
    if "pipeline_mesh" in meshes:
        from ltx2_tpu.parallel.pipeline_parallel import pipeline_device_put

        device_put = pipeline_device_put(
            meshes["pipeline_mesh"], model_axis=_pp_model_axis(meshes)
        )
    elif "tp_mesh" in meshes:
        from ltx2_tpu.parallel.sharding import tp_device_put

        device_put = tp_device_put(meshes["tp_mesh"])
    elif _sp_model_axis(meshes):
        from ltx2_tpu.parallel.sharding import tp_device_put

        device_put = tp_device_put(meshes["sequence_mesh"])

    ledger = ModelLedger(
        checkpoint_path=args.checkpoint,
        gemma_path=args.gemma_dir,
        spatial_upscaler_path=args.spatial_upscaler,
        temporal_upscaler_path=args.temporal_upscaler,
        loras=parse_loras(args),
        target_dtype=args.dtype,
        include_audio=include_audio,
        keep_fp8=args.fp8_serving,
        int8=args.int8,
        gemma_fp8=args.gemma_fp8,
        transformer_device_put=device_put,
    )
    with phase("weight_loading"):
        # --int8 is applied inside the ledger's streaming load (one stacked
        # leaf at a time — device HBM never holds the bf16 tree).
        dit_params, dit_cfg = ledger.transformer()
        dec_params, dec_cfg = ledger.video_decoder()
        enc_params, enc_cfg = ledger.video_encoder()
        models = dict(
            transformer_params=dit_params, transformer_cfg=dit_cfg,
            video_decoder_params=dec_params, video_decoder_cfg=dec_cfg,
            video_encoder_params=enc_params, video_encoder_cfg=enc_cfg,
        )
        if include_audio:
            a_params, a_cfg = ledger.audio_decoder()
            voc = ledger.vocoder()
            models.update(
                audio_decoder_params=a_params, audio_decoder_cfg=a_cfg,
                vocoder_params=voc[0], vocoder_cfg=voc[1],
            )
    return models, ledger


def save_video(frames: np.ndarray, output: str, fps: float, output_fps=None, audio=None,
               audio_sample_rate: int = 24000, speed: float = 1.0):
    """ffmpeg H.264 mux with optional minterpolate + audio
    (generate.py:2153-2362). `.avi` / `.y4m` outputs are written by the
    pure-Python muxers (no ffmpeg needed); other containers fall back to
    playable AVI + GIF + npz when ffmpeg is absent.

    speed (reference --speed): playback-rate multiplier applied to the
    VIDEO track's timebase (0.5 = slow motion, 2.0 = fast). With ffmpeg
    this is a setpts filter; the pure-Python muxers scale the container
    frame rate. Audio keeps its own clock (as in the reference's mux)."""
    import shutil

    if speed != 1.0:
        fps = fps * speed
        if output_fps:
            output_fps = output_fps * speed
    suffix = output.rsplit(".", 1)[-1].lower() if "." in output else ""
    if suffix in ("avi", "y4m", "mov"):
        from ltx2_tpu.utils.video_io import (
            write_avi_mjpeg,
            write_mp4_mjpeg,
            write_y4m,
        )

        if suffix == "y4m":
            write_y4m(output, frames, fps)
            if audio is not None:
                audio_np = np.asarray(audio, np.float32)
                if audio_np.ndim == 3:
                    audio_np = audio_np[0]
                _write_wav(output.rsplit(".", 1)[0] + ".wav", audio_np, audio_sample_rate)
        elif suffix == "mov":
            write_mp4_mjpeg(
                output, frames, fps, audio=audio, sample_rate=audio_sample_rate
            )
        else:
            write_avi_mjpeg(
                output, frames, fps, audio=audio, sample_rate=audio_sample_rate
            )
        print(f"wrote {output}")
        return
    if shutil.which("ffmpeg") is None:
        _save_video_fallback(frames, output, fps, audio, audio_sample_rate)
        return
    h, w = frames.shape[1:3]
    with tempfile.TemporaryDirectory() as td:
        raw_path = os.path.join(td, "frames.raw")
        with open(raw_path, "wb") as f:
            f.write(np.ascontiguousarray(frames).tobytes())

        filters = []
        if output_fps and output_fps > fps:
            filters.append(
                f"minterpolate=fps={output_fps}:mi_mode=mci:mc_mode=aobmc:vsbmc=1"
            )
        cmd = [
            "ffmpeg", "-y", "-v", "error",
            "-f", "rawvideo", "-pix_fmt", "rgb24", "-s", f"{w}x{h}",
            "-r", str(fps), "-i", raw_path,
        ]
        audio_path = None
        if audio is not None:
            audio_np = np.asarray(audio, np.float32)
            if audio_np.ndim == 3:
                audio_np = audio_np[0]
            audio_path = os.path.join(td, "audio.wav")
            _write_wav(audio_path, audio_np, audio_sample_rate)
            cmd += ["-i", audio_path]
        if filters:
            cmd += ["-vf", ",".join(filters)]
        cmd += ["-c:v", "libx264", "-pix_fmt", "yuv420p", "-crf", "18"]
        if audio_path:
            cmd += ["-c:a", "aac", "-shortest"]
        cmd += [output]
        subprocess.run(cmd, check=True)


def _save_video_fallback(frames: np.ndarray, output: str, fps: float, audio,
                         audio_sample_rate: int):
    """No-ffmpeg fallback: the requested .mp4 itself when that's what was
    asked for (pure-Python MJPEG mux, audio included), playable MJPEG AVI
    otherwise, + animated GIF preview + raw frames npz (+ wav)."""
    from PIL import Image

    from ltx2_tpu.utils.video_io import write_avi_mjpeg, write_mp4_mjpeg

    base = output.rsplit(".", 1)[0]
    suffix = output.rsplit(".", 1)[-1].lower() if "." in output else ""
    if suffix in ("mp4", "m4v"):
        avi_path = output  # honor the requested container
        write_mp4_mjpeg(output, frames, fps, audio=audio,
                        sample_rate=audio_sample_rate)
    else:
        avi_path = base + ".avi"
        write_avi_mjpeg(avi_path, frames, fps, audio=audio,
                        sample_rate=audio_sample_rate)
    gif_path = base + ".gif"
    imgs = [Image.fromarray(f) for f in frames]
    imgs[0].save(
        gif_path, save_all=True, append_images=imgs[1:],
        duration=max(1, int(1000 / fps)), loop=0,
    )
    np.savez(base + "_frames.npz", frames=frames, fps=fps)
    if audio is not None:
        audio_np = np.asarray(audio, np.float32)
        if audio_np.ndim == 3:
            audio_np = audio_np[0]
        _write_wav(base + ".wav", audio_np, audio_sample_rate)
    print(f"ffmpeg not found - wrote {avi_path}, {gif_path} and {base}_frames.npz")


def _write_wav(path: str, audio: np.ndarray, sample_rate: int):
    import wave

    audio = np.clip(audio, -1, 1)
    pcm = (audio.T * 32767).astype(np.int16)
    with wave.open(path, "w") as wf:
        wf.setnchannels(audio.shape[0])
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(pcm.tobytes())


def setup(args):
    """Meshes + models + ledger, built ONCE — reused across requests by
    scripts/serve.py (weights stay resident; lru-cached denoise loops are
    reused whenever a request repeats a (config, mesh) combination)."""
    if getattr(args, "compile_cache", None):
        from ltx2_tpu.utils.compile_cache import enable_persistent_cache

        enable_persistent_cache(args.compile_cache, min_compile_time_secs=1.0)
    apply_auto_shard(args)
    meshes = build_meshes(args)
    models, ledger = build_models(args, meshes)
    for key in ("sequence_mesh", "pipeline_mesh", "vae_mesh", "vae_w_mesh"):
        if key in meshes:
            models[key] = meshes[key]
    global _ACTIVE_DIT_MESH
    _ACTIVE_DIT_MESH = meshes.get("tp_mesh")
    return models, ledger


# Resident TP mesh (set by setup): execute_request enters it as the
# AMBIENT mesh so Pallas flash attention can shard-map itself over the
# 'model' axis under TP-only GSPMD jit (ops/attention._flash_shard_ctx —
# a Pallas call has no GSPMD partition rule). SP/PP paths do NOT need it:
# their shard_map regions establish the abstract mesh themselves (and an
# ambient mesh there trips GSPMD's sharding translation on the token
# axis). Scoped per request, NOT process-global: a leaked ambient mesh
# would bleed into unrelated later computations (and, in-process, into
# other tests).
_ACTIVE_DIT_MESH = None


def _mesh_scope():
    import contextlib

    import jax

    if _ACTIVE_DIT_MESH is None:
        return contextlib.nullcontext()
    return jax.sharding.set_mesh(_ACTIVE_DIT_MESH)


def main(argv=None):
    args = _apply_reference_compat(build_parser().parse_args(argv))

    from ltx2_tpu.utils.profiling import log, phase_report, trace

    with trace(args.profile_dir):
        models, ledger = setup(args)
        execute_request(args, models, ledger)

    log.info("phase report: %s", json.dumps({k: round(v, 2) for k, v in phase_report().items()}))


def execute_request(args, models, ledger):
    """Encode prompts, run the requested pipeline, write the output.
    `models`/`ledger` come from setup() and may be reused across calls."""
    with _mesh_scope():
        return _execute_request(args, models, ledger)


def _execute_request(args, models, ledger):
    from ltx2_tpu.utils.profiling import log, phase

    embeddings = encode_prompts(args, ledger, models["transformer_cfg"])

    pos = embeddings["positive"]
    neg = embeddings["negative"]
    pos_a = embeddings.get("positive_audio")
    neg_a = embeddings.get("negative_audio")

    tiling = tiling_config(args)
    images = parse_images(args)
    latent_channels = models["transformer_cfg"].in_channels

    common = dict(
        height=args.height, width=args.width, num_frames=args.num_frames,
        seed=args.seed, fps=args.fps, tiling_config=tiling,
        dtype=args.dtype,
        latent_channels=latent_channels,
        audio_enabled=args.audio,
        use_internal_audio_branch=not args.no_internal_audio,
        token_dependent_shift=args.token_shift,
    )

    audio_out = None
    # Most pipelines emit vocoder-rate audio; a2vid's passthrough overrides
    # this with the source waveform's true rate (reference 3-tuple return).
    audio_sr_override = None
    with phase("generation"):
        if args.pipeline in ("one-stage", "text-to-video"):
            from ltx2_tpu.pipelines import OneStageCFGConfig, OneStagePipeline

            guider_override = None
            if args.apg_scale:
                from ltx2_tpu.components import LtxAPGGuider, StatefulAPGGuider

                if args.apg_momentum:
                    guider_override = StatefulAPGGuider(
                        scale=args.apg_scale, eta=args.apg_eta,
                        norm_threshold=args.apg_norm_threshold,
                        momentum=args.apg_momentum,
                    )
                else:
                    guider_override = LtxAPGGuider(
                        scale=args.apg_scale, eta=args.apg_eta,
                        norm_threshold=args.apg_norm_threshold,
                    )
            pipeline = OneStagePipeline(**models)
            cfg = OneStageCFGConfig(
                num_inference_steps=args.num_inference_steps,
                cfg_scale=args.cfg_scale,
                audio_cfg_scale=args.audio_cfg_scale,
                rescale_scale=0.0 if args.pipeline == "text-to-video" else args.rescale_scale,
                token_bucket=args.token_bucket,
                cfg_interval=args.cfg_interval,
                **common,
            )
            spatial_upscaler, temporal_upscaler = _post_hoc_upscalers(
                args, ledger
            )
            video, audio_out = pipeline(
                pos, neg, cfg, images=images,
                positive_audio_encoding=pos_a, negative_audio_encoding=neg_a,
                stg_scale=args.stg_scale,
                stg_blocks=[int(b) for b in args.stg_blocks.split(",")] if args.stg_blocks else None,
                stg_cutoff=args.stg_cutoff,
                stg_mode=args.stg_mode,
                guider_override=guider_override,
                ge_gamma=args.ge_gamma,
                sampler=args.sampler,
                spatial_upscaler=spatial_upscaler,
                temporal_upscaler=temporal_upscaler,
                cross_attn_scale=args.cross_attn_scale,
                cross_attn_start_block=args.cross_attn_start_block,
                skip_decode=args.skip_vae,
                cache_text_kv=args.cache_text_kv,
            )
        elif args.pipeline == "distilled":
            from ltx2_tpu.pipelines import DistilledConfig, DistilledPipeline

            up = _upscaler_kwargs(args, ledger)
            pipeline = DistilledPipeline(**models, **up)
            cfg = DistilledConfig(**common)
            result = pipeline(pos, None, cfg, images=images,
                              audio_encoding=pos_a, skip_decode=args.skip_vae)
            video, audio_out = result if args.audio else (result, None)
        elif args.pipeline == "two-stage":
            from ltx2_tpu.loader.lora import LoRAConfig
            from ltx2_tpu.pipelines import TwoStageCFGConfig, TwoStagePipeline

            up = _upscaler_kwargs(args, ledger)
            pipeline = TwoStagePipeline(**models, **up)
            cfg = TwoStageCFGConfig(
                num_inference_steps=args.num_inference_steps,
                cfg_scale=(
                    args.cfg_stage1 if args.cfg_stage1 is not None
                    else args.cfg_scale
                ),
                audio_cfg_scale=args.audio_cfg_scale,
                guidance_rescale=args.rescale_scale,
                modality_scale=args.modality_scale,
                cfg_interval=args.cfg_interval,
                distilled_lora_config=(
                    LoRAConfig(
                        path=args.distilled_lora,
                        strength=args.distilled_lora_scale,
                    ) if args.distilled_lora else None
                ),
                **common,
            )
            video, audio_out = pipeline(
                pos, neg, cfg, images=images,
                positive_audio_encoding=pos_a, negative_audio_encoding=neg_a,
                skip_decode=args.skip_vae,
            )
        elif args.pipeline == "keyframe":
            from ltx2_tpu.pipelines import (
                Keyframe,
                KeyframeInterpolationConfig,
                KeyframeInterpolationPipeline,
            )

            up = _upscaler_kwargs(args, ledger)
            pipeline = KeyframeInterpolationPipeline(**models, **up)
            keyframes = []
            for spec in args.keyframe:
                parts = spec.split(":")
                keyframes.append(
                    Keyframe(
                        image_path=parts[0],
                        frame_index=int(parts[1]) if len(parts) > 1 else 0,
                        strength=float(parts[2]) if len(parts) > 2 else 0.95,
                    )
                )
            cfg = KeyframeInterpolationConfig(**common)
            result = pipeline(pos, None, cfg, keyframes=keyframes,
                              audio_encoding=pos_a, skip_decode=args.skip_vae)
            video, audio_out = result if args.audio else (result, None)
        elif args.pipeline == "ti2vid-hq":
            from ltx2_tpu.pipelines import TI2VidHQConfig, TI2VidHQPipeline

            up = _upscaler_kwargs(args, ledger)
            pipeline = TI2VidHQPipeline(**models, **up)
            cfg = TI2VidHQConfig(
                num_inference_steps=args.num_inference_steps,
                cfg_scale=args.cfg_scale,
                audio_cfg_scale=args.audio_cfg_scale,
                **common,
            )
            result = pipeline(
                pos, neg, cfg, images=images,
                positive_audio_encoding=pos_a, negative_audio_encoding=neg_a,
                skip_decode=args.skip_vae,
            )
            video, audio_out = result if args.audio else (result, None)
        elif args.pipeline == "retake":
            from ltx2_tpu.pipelines import RetakeConfig, RetakePipeline

            pipeline = RetakePipeline(**models)
            cfg = RetakeConfig(
                start_time=args.retake_start, end_time=args.retake_end,
                seed=args.seed,
                num_inference_steps=args.num_inference_steps,
                cfg_scale=args.cfg_scale,
                cfg_interval=args.cfg_interval,
                latent_channels=latent_channels,
                tiling_config=tiling,
                token_dependent_shift=args.token_shift,
            )
            video = pipeline(args.video, pos, neg, cfg, skip_decode=args.skip_vae)
        elif args.pipeline == "ic-lora":
            from ltx2_tpu.pipelines import (
                ControlType,
                ICLoraConfig,
                ICLoraPipeline,
                VideoCondition,
            )

            up = _upscaler_kwargs(args, ledger)
            pipeline = ICLoraPipeline(**models, **up)
            cfg = ICLoraConfig(
                # Stage-1-only fuse inside the pipeline; the spec's
                # :strength suffix is honored (default 1.0, reference
                # generate.py:1482).
                ic_lora_config=(
                    parse_lora_spec(args.ic_lora_weights)
                    if args.ic_lora_weights else None
                ),
                **common,
            )
            videos = []
            if args.control_video:
                videos.append(
                    VideoCondition(
                        video_path=args.control_video,
                        control_type=ControlType(args.control_type),
                        strength=args.control_strength,
                        canny_low=args.canny_low,
                        canny_high=args.canny_high,
                        save_control=args.save_control,
                    )
                )
            result = pipeline(pos, None, cfg, videos=videos,
                              audio_encoding=pos_a, skip_decode=args.skip_vae)
            video, audio_out = result if args.audio else (result, None)
        elif args.pipeline == "a2vid":
            from ltx2_tpu.pipelines import A2VidConfig, A2VidPipelineTwoStage

            up = _upscaler_kwargs(args, ledger)
            pipeline = A2VidPipelineTwoStage(
                **models, **up, **_audio_encoder_kwargs(args, ledger)
            )
            cfg = A2VidConfig(audio_path=args.audio_file or "", **common)
            result = pipeline(pos, None, cfg, audio_encoding=pos_a,
                              skip_decode=args.skip_vae)
            if args.audio:
                video, audio_out, audio_sr_override = result
            else:
                video, audio_out = result, None
        else:
            raise ValueError(f"unknown pipeline {args.pipeline}")

    if args.skip_vae:
        out = args.output.rsplit(".", 1)[0] + "_latent.npz"
        np.savez(out, latent=np.asarray(video))
        log.info("latent saved to %s", out)
    else:
        with phase("mux"):
            # Mux at the vocoder's actual output rate: BWE checkpoints
            # (LTX-2.3) emit 48 kHz — a hardcoded 24000 would play the
            # audio at half speed, an octave down.
            voc_cfg = models.get("vocoder_cfg")
            save_video(
                np.asarray(video), args.output, args.fps,
                output_fps=args.output_fps, audio=audio_out,
                audio_sample_rate=(
                    audio_sr_override if audio_sr_override is not None
                    else int(voc_cfg.output_sample_rate)
                    if voc_cfg is not None else 24000
                ),
                speed=args.speed,
            )
        log.info("video saved to %s", args.output)


def _audio_encoder_kwargs(args, ledger):
    """Audio VAE encoder for a2vid's waveform->frozen-latent path (beyond
    reference: its encoder was never ported). Placeholder mode gets a tiny
    random encoder so the path is drivable without weights."""
    if args.placeholder or args.checkpoint is None:
        import jax

        from ltx2_tpu.models.audio_vae.encoder import (
            AudioEncoderConfig,
            init_audio_encoder,
        )

        cfg = AudioEncoderConfig(ch=8, num_res_blocks=1, z_channels=8, mel_bins=16)
        params = jax.jit(lambda k: init_audio_encoder(k, cfg))(
            jax.random.PRNGKey(6)
        )
        return dict(audio_encoder_params=params, audio_encoder_cfg=cfg)
    if ledger is None:
        return {}
    params, cfg = ledger.audio_encoder()
    if params is None:
        return {}
    return dict(audio_encoder_params=params, audio_encoder_cfg=cfg)


def _post_hoc_upscalers(args, ledger):
    """(spatial_fn, temporal_fn) hooks for the standard pipeline's post-hoc
    latent upscaling (reference generate.py:2000-2060). Ledger weights when
    a checkpoint is loaded; tiny random modules under --placeholder so the
    flow stays drivable end-to-end without weights."""
    import jax

    from ltx2_tpu.pipelines.common import (
        jitted_spatial_upscaler,
        jitted_temporal_upscaler,
    )
    from ltx2_tpu.utils.profiling import log

    placeholder = args.placeholder or args.checkpoint is None

    spatial_fn = None
    if args.upscale_spatial and args.spatial_upscaler:
        if ledger is not None:
            su_params, su_cfg = ledger.spatial_upscaler()
        elif placeholder:
            from ltx2_tpu.models.upscaler import (
                SpatialUpscalerConfig,
                init_spatial_upscaler,
            )

            su_cfg = SpatialUpscalerConfig(
                mid_channels=64, num_blocks_per_stage=1, num_groups=8
            )
            su_params = jax.jit(lambda k: init_spatial_upscaler(k, su_cfg))(
                jax.random.PRNGKey(7)
            )
        else:
            su_params = None
        if su_params is not None:
            su_fn = jitted_spatial_upscaler(su_cfg)
            spatial_fn = lambda z: su_fn(su_params, z)  # noqa: E731
    elif args.spatial_upscaler and not args.upscale_spatial:
        log.warning(
            "--spatial-upscaler given without --upscale-spatial: the "
            "standard pipeline only applies the post-hoc 2x when "
            "--upscale-spatial is set (reference behavior); ignoring the "
            "weights"
        )

    temporal_fn = None
    if args.upscale_temporal and args.temporal_upscaler:
        if ledger is not None:
            tu_params, tu_cfg = ledger.temporal_upscaler()
        elif placeholder:
            from ltx2_tpu.models.upscaler import (
                TemporalUpscalerConfig,
                init_temporal_upscaler,
            )

            tu_cfg = TemporalUpscalerConfig(
                hidden_channels=32, num_res_blocks=1, num_groups=8
            )
            tu_params = jax.jit(lambda k: init_temporal_upscaler(k, tu_cfg))(
                jax.random.PRNGKey(8)
            )
        else:
            tu_params = None
        if tu_params is not None:
            tu_fn = jitted_temporal_upscaler(tu_cfg)
            temporal_fn = lambda z: tu_fn(tu_params, z)  # noqa: E731
    elif args.temporal_upscaler and not args.upscale_temporal:
        # Symmetric with the spatial branch (advisor r3): the reference
        # gates on `upscale_temporal and temporal_upscaler_weights`
        # (reference generate.py:2039-2060) — weights alone never upscale.
        log.warning(
            "--temporal-upscaler given without --upscale-temporal: the "
            "standard pipeline only applies the post-hoc 2x when "
            "--upscale-temporal is set (reference behavior); ignoring the "
            "weights"
        )
    return spatial_fn, temporal_fn


def _upscaler_kwargs(args, ledger):
    if args.temporal_upscaler:
        # Temporal upscaling applies on the one-stage/text-to-video path
        # only (same scope as the reference, generate.py:2039-2060, whose
        # staged pipelines also never consume it) — warn instead of
        # silently ignoring the flag.
        from ltx2_tpu.utils.profiling import log

        log.warning(
            "--temporal-upscaler has no effect on --pipeline %s (only "
            "one-stage / text-to-video apply it); ignoring", args.pipeline
        )
    if ledger is None or args.spatial_upscaler is None:
        return {}
    params, cfg = ledger.spatial_upscaler()
    if params is None:
        return {}
    return dict(spatial_upscaler_params=params, spatial_upscaler_cfg=cfg)


if __name__ == "__main__":
    main()
