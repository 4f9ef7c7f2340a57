"""Text encoder tests: Gemma3 tiny-config behavior, extractors, connector,
orchestration."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ltx2_tpu.models.text_encoder import (
    ConnectorConfig,
    Gemma3Config,
    TextEncoderConfig,
    append_learnable_registers,
    av_text_encoder_apply,
    connector_apply,
    convert_to_additive_mask,
    gemma3_apply,
    init_connector,
    init_gemma3,
    init_text_encoder,
    norm_and_concat_padded_batch,
    video_text_encoder_apply,
)

TINY_GEMMA = Gemma3Config.tiny()

TINY_CONNECTOR = ConnectorConfig(
    attention_head_dim=8,
    num_attention_heads=4,
    num_layers=2,
    num_learnable_registers=8,
    min_sequence_length=16,
)


@functools.lru_cache(maxsize=None)
def gemma_params():
    return jax.jit(lambda k: init_gemma3(k, TINY_GEMMA))(jax.random.PRNGKey(0))


@functools.lru_cache(maxsize=None)
def gemma_fn():
    return jax.jit(
        lambda p, ids, mask: gemma3_apply(p, TINY_GEMMA, ids, attention_mask=mask)
    )


class TestGemma3:
    def test_output_shapes(self):
        params = gemma_params()
        ids = jnp.asarray([[1, 5, 9, 2, 0, 0]], jnp.int32)
        mask = jnp.asarray([[1, 1, 1, 1, 0, 0]], jnp.int32)
        final, all_hidden = gemma_fn()(params, ids, mask)
        assert final.shape == (1, 6, TINY_GEMMA.hidden_size)
        # 6 layers + embeddings = 7 states
        assert all_hidden.shape == (7, 1, 6, TINY_GEMMA.hidden_size)
        assert bool(jnp.all(jnp.isfinite(all_hidden)))

    def test_first_state_is_scaled_embedding(self):
        params = gemma_params()
        ids = jnp.asarray([[3, 7]], jnp.int32)
        mask = jnp.asarray([[1, 1]], jnp.int32)
        _, all_hidden = gemma_fn()(params, ids, mask)
        expected = (
            np.asarray(params["embed_tokens"]["weight"])[np.asarray(ids)[0]]
            * TINY_GEMMA.hidden_size**0.5
        )
        np.testing.assert_allclose(np.asarray(all_hidden[0][0]), expected, rtol=1e-5)

    def test_causality(self):
        """Changing a later token must not affect earlier positions."""
        params = gemma_params()
        ids1 = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
        ids2 = jnp.asarray([[1, 2, 3, 9]], jnp.int32)
        mask = jnp.ones((1, 4), jnp.int32)
        f1, _ = gemma_fn()(params, ids1, mask)
        f2, _ = gemma_fn()(params, ids2, mask)
        np.testing.assert_allclose(
            np.asarray(f1[:, :3]), np.asarray(f2[:, :3]), atol=1e-5
        )
        assert not np.allclose(np.asarray(f1[:, 3]), np.asarray(f2[:, 3]))

    def test_padding_isolation(self):
        """Padded-key positions must not influence valid positions."""
        params = gemma_params()
        ids1 = jnp.asarray([[1, 2, 3, 0]], jnp.int32)
        ids2 = jnp.asarray([[1, 2, 3, 77]], jnp.int32)
        mask = jnp.asarray([[1, 1, 1, 0]], jnp.int32)
        f1, _ = gemma_fn()(params, ids1, mask)
        f2, _ = gemma_fn()(params, ids2, mask)
        np.testing.assert_allclose(
            np.asarray(f1[:, :3]), np.asarray(f2[:, :3]), atol=1e-5
        )

    def test_sliding_window_limits_reach(self):
        """With a small window, token 0 cannot reach far positions through a
        single sliding-attention layer."""
        cfg = Gemma3Config.tiny(
            num_hidden_layers=1, layer_types=("sliding_attention",), sliding_window=2
        )
        params = jax.jit(lambda k: init_gemma3(k, cfg))(jax.random.PRNGKey(1))
        fn = jax.jit(lambda p, ids, m: gemma3_apply(p, cfg, ids, attention_mask=m))
        ids1 = jnp.asarray([[5, 1, 2, 3, 4, 6]], jnp.int32)
        ids2 = jnp.asarray([[9, 1, 2, 3, 4, 6]], jnp.int32)
        mask = jnp.ones((1, 6), jnp.int32)
        f1, _ = fn(params, ids1, mask)
        f2, _ = fn(params, ids2, mask)
        # Window 2: position j attends keys j-1..j; token 0 reaches only pos 0-1.
        np.testing.assert_allclose(np.asarray(f1[:, 2:]), np.asarray(f2[:, 2:]), atol=1e-5)
        assert not np.allclose(np.asarray(f1[:, 0]), np.asarray(f2[:, 0]))


class TestFeatureExtractor:
    def test_norm_and_concat_zeroes_padding(self):
        x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 5, 4, 3)), jnp.float32)
        lengths = jnp.asarray([3, 5], jnp.int32)
        out = norm_and_concat_padded_batch(x, lengths, padding_side="right")
        assert out.shape == (2, 5, 12)
        np.testing.assert_allclose(np.asarray(out[0, 3:]), 0.0)
        assert not np.allclose(np.asarray(out[1, 3:]), 0.0)

    def test_left_padding(self):
        x = jnp.asarray(np.random.default_rng(1).normal(size=(1, 4, 4, 2)), jnp.float32)
        lengths = jnp.asarray([2], jnp.int32)
        out = norm_and_concat_padded_batch(x, lengths, padding_side="left")
        np.testing.assert_allclose(np.asarray(out[0, :2]), 0.0)
        assert not np.allclose(np.asarray(out[0, 2:]), 0.0)


class TestConnector:
    def test_register_append_and_mask_clear(self):
        registers = jnp.ones((8, 16))
        hidden = jnp.zeros((2, 5, 16))
        mask = convert_to_additive_mask(jnp.ones((2, 5), jnp.int32), jnp.float32)
        out, new_mask = append_learnable_registers(registers, hidden, mask, 16)
        assert out.shape == (2, 16, 16)
        np.testing.assert_allclose(np.asarray(out[:, 5:]), 1.0)
        np.testing.assert_allclose(np.asarray(new_mask), 0.0)  # cleared

    def test_connector_forward(self):
        params = jax.jit(lambda k: init_connector(k, TINY_CONNECTOR))(jax.random.PRNGKey(0))
        hidden = jax.random.normal(jax.random.PRNGKey(1), (2, 5, TINY_CONNECTOR.inner_dim))
        mask = convert_to_additive_mask(jnp.ones((2, 5), jnp.int32), jnp.float32)
        fn = jax.jit(lambda p, h, m: connector_apply(p, TINY_CONNECTOR, h, m))
        out, out_mask = fn(params, hidden, mask)
        assert out.shape == (2, 16, TINY_CONNECTOR.inner_dim)
        assert out_mask.shape[-1] == 16
        assert bool(jnp.all(jnp.isfinite(out)))


class TestOrchestration:
    def _tiny_text_cfg(self, v2=False):
        conn = ConnectorConfig(
            attention_head_dim=8,
            num_attention_heads=4,
            num_layers=1,
            num_learnable_registers=8,
            min_sequence_length=8,
        )
        return TextEncoderConfig(
            v2=v2,
            hidden_dim=TINY_GEMMA.hidden_size,
            num_gemma_layers=7,
            video_inner_dim=conn.inner_dim,
            audio_inner_dim=conn.inner_dim,
            connector=conn,
            audio_connector=conn,
        )

    def test_video_encoder_v1(self):
        cfg = self._tiny_text_cfg()
        # V1 extractor must project to connector inner_dim for the tiny setup.
        import jax as _jax

        from ltx2_tpu.ops.common import init_linear

        params = {
            "feature_extractor": {
                "aggregate_embed": init_linear(
                    _jax.random.PRNGKey(0),
                    cfg.hidden_dim * cfg.num_gemma_layers,
                    cfg.connector.inner_dim,
                    bias=False,
                )
            },
            "embeddings_connector": init_connector(_jax.random.PRNGKey(1), cfg.connector),
        }
        gemma = gemma_params()
        ids = jnp.asarray([[1, 2, 3, 0]], jnp.int32)
        mask = jnp.asarray([[1, 1, 1, 0]], jnp.int32)
        _, hidden = gemma_fn()(gemma, ids, mask)
        fn = jax.jit(
            lambda p, h, m: video_text_encoder_apply(p, cfg, h, m, padding_side="right")
        )
        out = fn(params, hidden, mask)
        assert out.video_encoding.shape == (1, 8, cfg.connector.inner_dim)
        assert out.attention_mask.shape == (1, 8)
        assert bool(jnp.all(out.attention_mask == 1))  # registers clear the mask

    def test_av_encoder_v2(self):
        cfg = self._tiny_text_cfg(v2=True)
        params = init_text_encoder(jax.random.PRNGKey(0), cfg)
        gemma = gemma_params()
        ids = jnp.asarray([[1, 2, 3, 0]], jnp.int32)
        mask = jnp.asarray([[1, 1, 1, 0]], jnp.int32)
        _, hidden = gemma_fn()(gemma, ids, mask)
        fn = jax.jit(lambda p, h, m: av_text_encoder_apply(p, cfg, h, m))
        out = fn(params, hidden, mask)
        assert out.video_encoding.shape == (1, 8, cfg.video_inner_dim)
        assert out.audio_encoding.shape == (1, 8, cfg.audio_inner_dim)


class TestGemmaShardLoading:
    """load_gemma3_params reads HF shards in both key layouts
    (multimodal `language_model.model.*` and text-only `model.*`)."""

    @pytest.mark.parametrize("prefix", ["language_model.model.", "model."])
    def test_round_trip(self, tmp_path, prefix):
        import numpy as np

        from ltx2_tpu.loader.safetensors_io import write_safetensors
        from ltx2_tpu.loader.weight_loader import flatten_params
        from ltx2_tpu.models.text_encoder.gemma3 import (
            Gemma3Config,
            init_gemma3,
            load_gemma3_params,
        )

        cfg = Gemma3Config.tiny()
        params = init_gemma3(jax.random.PRNGKey(0), cfg)

        # Unstack layers into per-layer checkpoint keys.
        ckpt = {}
        for key, leaf in flatten_params(params).items():
            arr = np.asarray(leaf, np.float32)
            if key.startswith("layers."):
                sub = key[len("layers."):]
                for i in range(cfg.num_hidden_layers):
                    ckpt[f"{prefix}layers.{i}.{sub}"] = arr[i]
            else:
                ckpt[prefix + key] = arr
        path = tmp_path / "model-00001-of-00001.safetensors"
        write_safetensors(str(path), ckpt)

        loaded = load_gemma3_params(str(tmp_path), cfg)
        for key, leaf in flatten_params(loaded).items():
            np.testing.assert_allclose(
                np.asarray(leaf, np.float32),
                np.asarray(flatten_params(params)[key], np.float32),
                atol=0,
                err_msg=key,
            )

    def test_fp8_quantized_load(self, tmp_path):
        import ml_dtypes
        import numpy as np

        from ltx2_tpu.loader.safetensors_io import write_safetensors
        from ltx2_tpu.loader.weight_loader import flatten_params
        from ltx2_tpu.models.text_encoder.gemma3 import (
            Gemma3Config,
            init_gemma3,
            load_gemma3_params,
        )

        cfg = Gemma3Config.tiny()
        params = init_gemma3(jax.random.PRNGKey(1), cfg)
        ckpt = {}
        for key, leaf in flatten_params(params).items():
            arr = np.asarray(leaf, np.float32)
            if key.startswith("layers."):
                sub = key[len("layers."):]
                for i in range(cfg.num_hidden_layers):
                    ckpt[f"model.layers.{i}.{sub}"] = arr[i]
            else:
                ckpt["model." + key] = arr
        write_safetensors(str(tmp_path / "model-1.safetensors"), ckpt)

        loaded = load_gemma3_params(str(tmp_path), cfg, quantize_fp8=True)
        qw = loaded["layers"]["self_attn"]["q_proj"]["weight"]
        assert qw.dtype == jnp.float8_e4m3fn
        assert "weight_scale" in loaded["layers"]["self_attn"]["q_proj"]
        assert loaded["embed_tokens"]["weight"].dtype == jnp.bfloat16
        # Norm weights stay in the loading dtype (not quantized).
        assert loaded["norm"]["weight"].dtype == jnp.float32


class TestMaskNoneIsCausal:
    def test_no_mask_equals_all_ones_mask(self):
        """attention_mask=None means 'no padding', not 'no mask' (review
        r4): the decoder-only causal + sliding-window structure must apply
        regardless — omitting the mask previously ran Gemma fully
        bidirectionally."""
        from ltx2_tpu.models.text_encoder.gemma3 import (
            Gemma3Config,
            gemma3_apply,
            init_gemma3,
        )

        cfg = Gemma3Config(
            vocab_size=64, hidden_size=16, intermediate_size=32,
            num_hidden_layers=2, num_attention_heads=2,
            num_key_value_heads=1, head_dim=8, sliding_window=4,
            layer_types=("sliding_attention", "full_attention"),
        )
        params = jax.jit(lambda k: init_gemma3(k, cfg))(jax.random.PRNGKey(0))
        ids = jax.random.randint(jax.random.PRNGKey(1), (1, 12), 0, 64)
        with_mask = gemma3_apply(params, cfg, ids, jnp.ones((1, 12), jnp.int32))
        without = gemma3_apply(params, cfg, ids, None)
        for a, b in zip(with_mask, without):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                atol=1e-6,
            )
