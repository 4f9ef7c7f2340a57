"""Prepare a fine-tuning dataset: pixels -> VAE latents -> latents.npz.

Closes the training loop around scripts/train.py: encode a pixel dataset
through the causal video VAE (the encoder output is already normalized by
the checkpoint's per-channel statistics — exactly the space the denoise
loop and the rectified-flow loss operate in), patchify to tokens with the
SAME fractional RoPE positions generation uses, attach text context, and
write the .npz train.py consumes (x0 / positions / context).

Pixel sources:
  --pixels clips.npz   array "pixels" (N, 3, F, H, W), float in [-1, 1]
                       or uint8 in [0, 255]
  --images DIR         directory of stills -> one-frame clips (i2v-style),
                       resized/cropped to --height x --width
  --videos DIR         directory of video clips; .gif/.webp/.y4m decode in
                       PURE PYTHON (utils/video_io.py — no ffmpeg in this
                       image), other containers via ffmpeg when present

Context sources:
  --embedding emb.npz  a generate.py --save-embedding file; its "positive"
                       embedding is attached to every clip
  --context-dim D      zero context of width D (smoke/profiling runs)

Weights: --checkpoint for the real VAE encoder, or --placeholder for a
random encoder (smoke runs; latents are meaningless but shape-correct).

Example:
    python scripts/prepare_data.py --pixels clips.npz \
        --checkpoint ckpt.safetensors --embedding prompt.npz \
        --output latents.npz
    python scripts/train.py --checkpoint ckpt.safetensors \
        --data latents.npz --lora-rank 16 --save adapter.safetensors
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from ltx2_tpu.utils.platform import apply_env_platform_overrides

apply_env_platform_overrides()


def build_parser():
    p = argparse.ArgumentParser(description="VAE-encode pixels into a train.py dataset")
    p.add_argument("--pixels", type=str, default=None,
                   help=".npz with 'pixels' (N, 3, F, H, W)")
    p.add_argument("--images", type=str, default=None,
                   help="directory of images -> one-frame clips")
    p.add_argument("--videos", type=str, default=None,
                   help="directory of video clips: .gif/.webp/.y4m decode "
                        "in pure Python (no ffmpeg needed), .mp4/.webm via "
                        "ffmpeg when present")
    p.add_argument("--num-frames", type=int, default=9,
                   help="frames per clip for --videos (snapped to 8k+1)")
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--width", type=int, default=768)
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--placeholder", action="store_true",
                   help="random-weight encoder (smoke runs)")
    p.add_argument("--embedding", type=str, default=None,
                   help="generate.py --save-embedding npz (shared context)")
    p.add_argument("--context-dim", type=int, default=None,
                   help="zero context of this width instead of --embedding")
    p.add_argument("--fps", type=float, default=24.0)
    p.add_argument("--output", type=str, default="latents.npz")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ltx2_tpu.components import VideoLatentPatchifier
    from ltx2_tpu.conditioning.tools import VideoLatentTools
    from ltx2_tpu.pipelines.common import jitted_video_encoder, load_image_tensor
    from ltx2_tpu.types import VideoLatentShape
    from ltx2_tpu.utils.profiling import log

    # ---- Encoder weights.
    if args.placeholder or args.checkpoint is None:
        from ltx2_tpu.models.video_vae import VideoEncoderConfig, init_video_encoder

        enc_cfg = VideoEncoderConfig()
        enc_params = jax.jit(lambda k: init_video_encoder(k, enc_cfg))(
            jax.random.PRNGKey(0)
        )
        log.info("placeholder VAE encoder (random weights)")
    else:
        from ltx2_tpu.utils.model_ledger import ModelLedger

        ledger = ModelLedger(checkpoint_path=args.checkpoint)
        enc_params, enc_cfg = ledger.video_encoder()
    encode = jitted_video_encoder(enc_cfg)

    # ---- Pixel clips.
    clips = []
    if args.pixels:
        data = np.load(args.pixels)["pixels"]
        if data.dtype == np.uint8:
            data = data.astype(np.float32) / 127.5 - 1.0
        f = data.shape[2]
        snapped = f - (f - 1) % 8  # causal VAE needs 8k+1 frames
        if snapped != f:
            log.warning(
                "--pixels clips have %d frames; trimming to %d (the causal "
                "VAE's temporal stride-8 geometry needs 8k+1)", f, snapped
            )
            data = data[:, :, :snapped]
        clips = [data[i : i + 1] for i in range(data.shape[0])]
    elif args.images:
        from pathlib import Path

        paths = sorted(
            q for q in Path(args.images).iterdir()
            if q.suffix.lower() in (".png", ".jpg", ".jpeg", ".webp")
        )
        clips = [
            np.asarray(load_image_tensor(str(q), args.height, args.width))
            for q in paths
        ]
    elif args.videos:
        from pathlib import Path

        from ltx2_tpu.utils.video_io import read_video_any

        n_frames = args.num_frames - (args.num_frames - 1) % 8  # snap 8k+1
        exts = (".gif", ".webp", ".apng", ".y4m", ".avi", ".mp4", ".webm", ".mov")
        paths = sorted(
            q for q in Path(args.videos).iterdir()
            if q.suffix.lower() in exts
        )
        clips = [
            read_video_any(str(q), args.height, args.width, n_frames)
            for q in paths
        ]
    if not clips:
        raise SystemExit("pass --pixels clips.npz, --images DIR or --videos DIR")
    log.info("%d clips", len(clips))

    # ---- Encode + patchify (encoder output is already stats-normalized).
    patchifier = VideoLatentPatchifier(patch_size=1)
    x0s, poss = [], []
    for i, clip in enumerate(clips):
        latent = encode(enc_params, jnp.asarray(clip, jnp.float32))
        shape = VideoLatentShape.from_shape(latent.shape)
        tools = VideoLatentTools(
            patchifier=patchifier, target_shape=shape, fps=args.fps
        )
        state = tools.create_initial_state()
        tokens = patchifier.patchify(latent)
        x0s.append(np.asarray(tokens, np.float32))
        poss.append(np.asarray(state.positions, np.float32))
        if i == 0:
            log.info("latent %s -> %d tokens", latent.shape, tokens.shape[1])

    x0 = np.concatenate(x0s, axis=0)
    positions = np.concatenate(poss, axis=0)

    # ---- Context.
    n = x0.shape[0]
    if args.embedding:
        emb = np.load(args.embedding)["positive"].astype(np.float32)
        context = np.repeat(emb, n, axis=0)
    elif args.context_dim:
        context = np.zeros((n, 1, args.context_dim), np.float32)
    else:
        raise SystemExit("pass --embedding emb.npz or --context-dim D")

    np.savez(args.output, x0=x0, positions=positions, context=context)
    log.info(
        "wrote %s: x0 %s, positions %s, context %s",
        args.output, x0.shape, positions.shape, context.shape,
    )


if __name__ == "__main__":
    main()
