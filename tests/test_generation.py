"""Gemma-3 greedy generation (KV cache) tests.

The decode path maintains per-layer KV caches with sliding/full masks; we
verify it against an oracle that re-runs the full (cache-free) forward for
every emitted token. Any cache-write, RoPE-position, GQA-grouping, or
window-mask bug diverges the sequences immediately.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ltx2_tpu.models.text_encoder.gemma3 import (
    Gemma3Config,
    gemma3_apply,
    init_gemma3,
)
from ltx2_tpu.models.text_encoder.generation import (
    gemma3_greedy_generate,
)


@pytest.fixture(scope="module")
def tiny():
    cfg = Gemma3Config.tiny()  # 6 layers, sliding window 4 -> window binds
    params = init_gemma3(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _oracle_next_token(params, cfg, ids):
    """argmax over logits from the cache-free reference forward."""
    mask = jnp.ones_like(ids)
    final, _ = gemma3_apply(params, cfg, ids, attention_mask=mask)
    logits = final[:, -1, :] @ params["embed_tokens"]["weight"].T.astype(final.dtype)
    return jnp.argmax(logits, axis=-1).astype(ids.dtype)


class TestGreedyGenerate:
    def test_matches_cache_free_oracle(self, tiny):
        cfg, params = tiny
        ids = jnp.asarray([[5, 17, 42, 8, 23, 11, 3, 29]], jnp.int32)
        mask = jnp.ones_like(ids)
        n = 6

        got = np.asarray(
            gemma3_greedy_generate(
                params, cfg, ids, mask, max_new_tokens=n, eos_id=-1, pad_id=0
            )
        )[0]

        cur = ids
        want = []
        for _ in range(n):
            nxt = _oracle_next_token(params, cfg, cur)
            want.append(int(nxt[0]))
            cur = jnp.concatenate([cur, nxt[:, None]], axis=1)
        assert list(got) == want

    def test_eos_latches_to_pad(self, tiny):
        cfg, params = tiny
        ids = jnp.asarray([[5, 17, 42, 8]], jnp.int32)
        mask = jnp.ones_like(ids)
        first = int(
            np.asarray(
                gemma3_greedy_generate(
                    params, cfg, ids, mask, max_new_tokens=1, eos_id=-1, pad_id=0
                )
            )[0][0]
        )
        toks = np.asarray(
            gemma3_greedy_generate(
                params, cfg, ids, mask, max_new_tokens=5, eos_id=first, pad_id=0
            )
        )[0]
        assert toks[0] == first  # the EOS token itself is emitted
        assert all(t == 0 for t in toks[1:])  # then pad forever

    def test_left_padding_invariant(self, tiny):
        """Rotary positions are relative: left-padding must not change the
        generated continuation (this is what generate_text relies on)."""
        cfg, params = tiny
        ids = jnp.asarray([[5, 17, 42, 8, 23]], jnp.int32)
        mask = jnp.ones_like(ids)
        base = np.asarray(
            gemma3_greedy_generate(
                params, cfg, ids, mask, max_new_tokens=4, eos_id=-1, pad_id=0
            )
        )[0]

        pad = 3
        ids_p = jnp.pad(ids, ((0, 0), (pad, 0)))
        mask_p = jnp.pad(mask, ((0, 0), (pad, 0)))
        padded = np.asarray(
            gemma3_greedy_generate(
                params, cfg, ids_p, mask_p, max_new_tokens=4, eos_id=-1, pad_id=0
            )
        )[0]
        assert list(base) == list(padded)
