"""Shape-bucketed serving correctness at the denoise-loop level.

The padded (bucketed) loop must produce the SAME real-token latents as the
unpadded loop — including under guiders whose statistics reduce over the
whole token axis (CFG*'s projection, APG's projection + norm clamp). The
model emits garbage at pad positions (padding is masked out of attention
KEYS only), so the loop zeroes pad outputs before guidance; these tests
pin that contract.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ltx2_tpu.components import CFGGuider, GaussianNoiser, VideoLatentPatchifier
from ltx2_tpu.components.guiders import CFGStarRescalingGuider, LtxAPGGuider
from ltx2_tpu.conditioning.tools import VideoLatentTools
from ltx2_tpu.pipelines.common import (
    bucketed_tokens,
    pad_state_tokens,
    slice_state_tokens,
)
from ltx2_tpu.pipelines.denoise import DenoiseLoopConfig, make_video_denoise_loop
from ltx2_tpu.types import VideoLatentShape
from tests.helpers import cached_params
from tests.test_dit import tiny_config

SIGMAS = jnp.asarray([1.0, 0.7, 0.4, 0.2, 0.0])


def make_state(cfg, frames=2, height=2, width=3, key=0):
    shape = VideoLatentShape(
        batch=1, channels=cfg.in_channels, frames=frames, height=height, width=width
    )
    tools = VideoLatentTools(
        patchifier=VideoLatentPatchifier(patch_size=1), target_shape=shape, fps=24.0
    )
    return GaussianNoiser()(jax.random.PRNGKey(key), tools.create_initial_state(), 1.0)


def contexts(cfg, n=5):
    pos = jax.random.normal(jax.random.PRNGKey(1), (1, n, cfg.caption_channels))
    neg = jax.random.normal(jax.random.PRNGKey(2), (1, n, cfg.caption_channels))
    return pos, neg


def run_loop(cfg, loop_cfg, state, bucket=None):
    params = cached_params(cfg)
    pos, neg = contexts(cfg)
    loop = make_video_denoise_loop(cfg, loop_cfg)
    if bucket is None:
        return np.asarray(loop(params, state, SIGMAS, pos, neg).latent)
    n_real = state.latent.shape[1]
    padded, token_mask = pad_state_tokens(state, bucketed_tokens(n_real, bucket))
    out = loop(params, padded, SIGMAS, pos, neg, token_mask=token_mask)
    return np.asarray(slice_state_tokens(out, n_real).latent)


GUIDERS = [
    pytest.param(CFGGuider(3.0), id="cfg"),
    # These two reduce over the WHOLE token axis: any pad garbage entering
    # the projection / norm statistics corrupts every real token.
    pytest.param(CFGStarRescalingGuider(3.0), id="cfg_star"),
    pytest.param(LtxAPGGuider(3.0, eta=0.7, norm_threshold=2.5), id="apg"),
]


class TestTokenBucketGuiders:
    @pytest.mark.parametrize("guider", GUIDERS)
    def test_bucketed_matches_unpadded(self, guider):
        cfg = tiny_config()
        state = make_state(cfg)  # 12 real tokens
        loop_cfg = DenoiseLoopConfig(guider=guider)
        exact = run_loop(cfg, loop_cfg, state)
        bucketed = run_loop(cfg, loop_cfg, state, bucket=16)
        np.testing.assert_allclose(bucketed, exact, atol=2e-5)

    def test_bucketed_matches_with_stg(self):
        """STG adds a third guidance row; pad zeroing must apply to it too."""
        cfg = tiny_config()
        state = make_state(cfg)
        loop_cfg = DenoiseLoopConfig(
            guider=CFGStarRescalingGuider(3.0), stg_scale=1.0, stg_blocks=(0,)
        )
        exact = run_loop(cfg, loop_cfg, state)
        bucketed = run_loop(cfg, loop_cfg, state, bucket=16)
        np.testing.assert_allclose(bucketed, exact, atol=2e-5)

    def test_pad_zero_returns_no_mask(self):
        """A token count already on the bucket grid must keep the unmasked
        flash path: pad_state_tokens returns token_mask=None."""
        cfg = tiny_config()
        state = make_state(cfg)  # 12 tokens
        padded, token_mask = pad_state_tokens(state, 12)
        assert token_mask is None
        assert padded is state
