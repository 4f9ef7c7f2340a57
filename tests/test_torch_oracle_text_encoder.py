"""Torch-oracle parity for the text-encoder projection stack.

Extends the executed parity evidence to the components between Gemma-3 and
the DiT (SURVEY.md hard part #3 — "text-encoder drift poisons everything
downstream"): feature extractors V1/V2, the Embeddings1DConnector
(learnable registers, token-index RoPE, gated attention), and the full
encoder orchestration (mask conversion, post-connector re-masking).
Oracles are independent torch implementations of the reference semantics
(LTX_2_MLX/model/text_encoder/*, file:line cited), run on identical random
weights. The Gemma-3 core already has its own oracle
(test_torch_oracle.py::TestGemmaOracle).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import torch

from tests.test_torch_oracle import assert_close, t2j, torch_apply_interleaved
from tests.test_torch_oracle_model import lin, torch_rms, tree_to_torch

torch.manual_seed(0)


# ---------------------------------------------------------------------------
# Feature extractors (feature_extractor.py:9-76, 160-230)
# ---------------------------------------------------------------------------


def torch_norm_concat_padded(x, seq_lens, padding_side):
    """V1 masked range-normalization (feature_extractor.py:9-76).
    x: (B, T, D, L)."""
    b, t, d, n_layers = x.shape
    eps = 1e-6
    tok = torch.arange(t)[None, :]
    if padding_side == "right":
        mask = tok < seq_lens[:, None]
    else:
        mask = tok >= (t - seq_lens[:, None])
    m4 = mask[:, :, None, None]
    masked = torch.where(m4, x, torch.zeros_like(x))
    denom = (seq_lens * d).reshape(b, 1, 1, 1).float()
    mean = masked.sum(dim=(1, 2), keepdim=True) / (denom + eps)
    big = 1e9
    x_min = torch.where(m4, x, torch.full_like(x, big)).amin(dim=(1, 2), keepdim=True)
    x_max = torch.where(m4, x, torch.full_like(x, -big)).amax(dim=(1, 2), keepdim=True)
    normed = 8 * (x - mean) / (x_max - x_min + eps)
    normed = normed.reshape(b, t, d * n_layers)
    return torch.where(mask[:, :, None], normed, torch.zeros_like(normed))


def torch_norm_per_token_rms(x, attn_mask):
    """V2 per-token RMS (feature_extractor.py:160-178). x: (B, T, D, L)."""
    b, t, d, n_layers = x.shape
    var = (x**2).mean(dim=2, keepdim=True)
    normed = (x * torch.rsqrt(var + 1e-6)).reshape(b, t, d * n_layers)
    return torch.where(attn_mask.bool()[:, :, None], normed, torch.zeros_like(normed))


def torch_extract_v1(p, hidden_states, attn_mask, padding_side="left"):
    """hidden_states: (L, B, T, D) -> (B, T, D) via aggregate_embed."""
    stacked = hidden_states.permute(1, 2, 3, 0)
    seq_lens = attn_mask.sum(-1)
    return lin(p["aggregate_embed"], torch_norm_concat_padded(stacked, seq_lens, padding_side))


def torch_extract_v2(p, hidden_states, attn_mask, hidden_dim):
    stacked = hidden_states.permute(1, 2, 3, 0)
    normed = torch_norm_per_token_rms(stacked, attn_mask)
    v_dim = p["video_aggregate_embed"]["weight"].shape[0]
    a_dim = p["audio_aggregate_embed"]["weight"].shape[0]
    video = lin(p["video_aggregate_embed"], normed * math.sqrt(v_dim / hidden_dim))
    audio = lin(p["audio_aggregate_embed"], normed * math.sqrt(a_dim / hidden_dim))
    return video, audio


# ---------------------------------------------------------------------------
# Connector (connector.py:101-283) with token-index RoPE (rope.py:214-330)
# ---------------------------------------------------------------------------


def torch_rope_plain(indices, dim, heads, max_pos, theta, rope_type, dp):
    """precompute_freqs_cis over PLAIN (B, n_dims, T) indices (no midpoint;
    use_middle_indices_grid=False — the connector path)."""
    n_dims = indices.shape[1]
    num = dim // (2 * n_dims)
    lin_ = torch.linspace(0.0, 1.0, num, dtype=torch.float64 if dp else torch.float32)
    idx = (theta**lin_ * math.pi / 2).to(torch.float32)
    frac = indices.float() / torch.tensor(max_pos, dtype=torch.float32)[None, :, None]
    scaled = frac.permute(0, 2, 1) * 2 - 1  # (B, T, n_dims)
    freqs = idx[None, None, None, :] * scaled[..., None]  # (B, T, n_dims, num)
    freqs = freqs.permute(0, 1, 3, 2).reshape(indices.shape[0], indices.shape[2], -1)
    if rope_type == "split":
        cos, sin = torch.cos(freqs), torch.sin(freqs)
        pad = dim // 2 - freqs.shape[-1]
        if pad:
            b, t, _ = cos.shape
            cos = torch.cat([torch.ones(b, t, pad), cos], dim=-1)
            sin = torch.cat([torch.zeros(b, t, pad), sin], dim=-1)
        b, t, _ = cos.shape
        return (
            cos.view(b, t, heads, -1).permute(0, 2, 1, 3),
            sin.view(b, t, heads, -1).permute(0, 2, 1, 3),
        )
    cos = torch.cos(freqs).repeat_interleave(2, dim=-1)
    sin = torch.sin(freqs).repeat_interleave(2, dim=-1)
    pad = dim % (2 * n_dims)
    if pad:
        b, t, _ = cos.shape
        cos = torch.cat([torch.ones(b, t, pad), cos], dim=-1)
        sin = torch.cat([torch.zeros(b, t, pad), sin], dim=-1)
    return cos, sin


def torch_connector_attention(p, x, heads, d_head, eps, mask, pe, rope_type, gated):
    """Reference Attention with flat INTERLEAVED or head-reshaped SPLIT RoPE
    (attention.py:144-253; rope.py:51-144)."""
    q = torch_rms(lin(p["to_q"], x), eps, p["q_norm"]["weight"])
    k = torch_rms(lin(p["to_k"], x), eps, p["k_norm"]["weight"])
    v = lin(p["to_v"], x)
    if pe is not None:
        cos, sin = pe
        if rope_type == "split":
            from tests.test_torch_oracle_model import torch_attention  # noqa: F401
            from tests.test_torch_oracle import torch_apply_split

            def ap(t):
                b, tt = t.shape[0], t.shape[1]
                h = cos.shape[1]
                t4 = t.reshape(b, tt, h, -1).permute(0, 2, 1, 3)
                return torch_apply_split(t4, cos, sin).permute(0, 2, 1, 3).reshape(t.shape)
        else:
            def ap(t):
                return torch_apply_interleaved(t, cos, sin)
        q, k = ap(q), ap(k)
    b, t, _ = q.shape
    qh = q.reshape(b, t, heads, d_head).permute(0, 2, 1, 3)
    kh = k.reshape(b, t, heads, d_head).permute(0, 2, 1, 3)
    vh = v.reshape(b, t, heads, d_head).permute(0, 2, 1, 3)
    logits = qh @ kh.transpose(-1, -2) / math.sqrt(d_head)
    if mask is not None:
        logits = logits + mask
    out = (logits.softmax(-1) @ vh).permute(0, 2, 1, 3).reshape(b, t, heads * d_head)
    if gated:
        gates = 2.0 * torch.sigmoid(lin(p["to_gate_logits"], x))
        out = (out.reshape(b, t, heads, d_head) * gates[..., None]).reshape(b, t, -1)
    return lin(p["to_out"], out)


def torch_ff(p, x):
    return lin(p["project_out"], torch.nn.functional.gelu(
        lin(p["project_in"]["proj"], x), approximate="tanh"
    ))


def torch_connector(p, cfg, x, mask):
    """Embeddings1DConnector forward (connector.py:230-283)."""
    if cfg["registers"]:
        b, s, d = x.shape
        regs = p["learnable_registers"]
        target = max(cfg["min_seq"], s)
        dups = math.ceil(target / regs.shape[0])
        tiled = regs.repeat(dups, 1)
        extra = tiled[s:]
        if extra.shape[0] > 0:
            x = torch.cat([x, extra[None].expand(b, -1, -1)], dim=1)
        if mask is not None:
            mask = torch.zeros((1, 1, 1, x.shape[1]))
    seq = x.shape[1]
    indices = torch.arange(seq, dtype=torch.float32)[None, None, :]
    pe = torch_rope_plain(
        indices, cfg["inner"], cfg["heads"], cfg["max_pos"], cfg["theta"],
        cfg["rope_type"], cfg["dp"],
    )
    for block in p["transformer_1d_blocks"]:
        h = torch_connector_attention(
            block["attn1"], torch_rms(x, cfg["eps"]), cfg["heads"], cfg["d_head"],
            cfg["eps"], mask, pe, cfg["rope_type"], cfg["gated"],
        )
        x = x + h
        x = x + torch_ff(block["ff"], torch_rms(x, cfg["eps"]))
    x = torch_rms(x, cfg["eps"])
    if mask is None:
        mask = torch.zeros((x.shape[0], 1, 1, x.shape[1]))
    return x, mask


def torch_additive_mask(binary, large=3.4028235e38):
    """encoder.py:103-132: (mask - 1) * finfo.max -> (B, 1, 1, S)."""
    add = (binary.float() - 1.0) * large
    return add.reshape(binary.shape[0], 1, 1, -1)


# ---------------------------------------------------------------------------
# Tests
# ---------------------------------------------------------------------------


def connector_cfg_dict(cfg):
    return {
        "inner": cfg.inner_dim,
        "heads": cfg.num_attention_heads,
        "d_head": cfg.attention_head_dim,
        "max_pos": list(cfg.positional_embedding_max_pos),
        "theta": cfg.positional_embedding_theta,
        "rope_type": cfg.rope_type.value if hasattr(cfg.rope_type, "value") else str(cfg.rope_type),
        "eps": cfg.norm_eps,
        "gated": cfg.apply_gated_attention,
        "dp": True,
        "registers": cfg.num_learnable_registers,
        "min_seq": cfg.min_sequence_length,
    }


class TestFeatureExtractorOracle:
    def _hidden(self, L=5, B=2, T=7, D=12, seed=1):
        g = torch.Generator().manual_seed(seed)
        hs = torch.randn(L, B, T, D, generator=g)
        mask = torch.ones(B, T)
        mask[0, :3] = 0  # left padding on sample 0
        return hs, mask

    def test_v1_left_and_right_padding(self):
        from ltx2_tpu.models.text_encoder.feature_extractor import (
            extract_features_v1,
            init_feature_extractor_v1,
        )

        hs, mask = self._hidden()
        params = init_feature_extractor_v1(jax.random.PRNGKey(0), hidden_dim=12, num_layers=5)
        tp = tree_to_torch(params)
        for side in ("left", "right"):
            got = extract_features_v1(params, t2j(hs), t2j(mask), side)
            want = torch_extract_v1(tp, hs, mask, side)
            assert_close(got, want, rtol=5e-4, atol=1e-5, msg=f"V1 extractor {side}")

    def test_v2_dual_heads(self):
        from ltx2_tpu.models.text_encoder.feature_extractor import (
            extract_features_v2,
            init_feature_extractor_v2,
        )

        hs, mask = self._hidden()
        params = init_feature_extractor_v2(
            jax.random.PRNGKey(1), hidden_dim=12, num_layers=5,
            video_inner_dim=24, audio_inner_dim=16,
        )
        tp = tree_to_torch(params)
        got_v, got_a = extract_features_v2(params, t2j(hs), t2j(mask), hidden_dim=12)
        want_v, want_a = torch_extract_v2(tp, hs, mask, hidden_dim=12)
        assert_close(got_v, want_v, rtol=5e-4, atol=1e-5, msg="V2 video head")
        assert_close(got_a, want_a, rtol=5e-4, atol=1e-5, msg="V2 audio head")


class TestConnectorOracle:
    def _cfg(self, **kw):
        from ltx2_tpu.models.text_encoder.connector import ConnectorConfig
        from ltx2_tpu.ops.rope import LTXRopeType

        defaults = dict(
            attention_head_dim=8,
            num_attention_heads=3,
            num_layers=2,
            num_learnable_registers=6,
            min_sequence_length=16,
            rope_type=LTXRopeType.INTERLEAVED,
            double_precision_rope=True,
        )
        defaults.update(kw)
        return ConnectorConfig(**defaults)

    def _run(self, cfg, with_mask=True, seed=2):
        from ltx2_tpu.models.text_encoder.connector import connector_apply, init_connector

        g = torch.Generator().manual_seed(seed)
        x = torch.randn(2, 9, cfg.inner_dim, generator=g)
        binary = torch.ones(2, 9)
        binary[1, :4] = 0
        mask = torch_additive_mask(binary) if with_mask else None

        params = init_connector(jax.random.PRNGKey(3), cfg)
        tp = tree_to_torch(params)
        got, got_mask = connector_apply(
            params, cfg, t2j(x), None if mask is None else t2j(mask)
        )
        want, want_mask = torch_connector(tp, connector_cfg_dict(cfg), x, mask)
        assert_close(got, want, rtol=5e-4, atol=2e-4, msg="connector states")
        assert np.asarray(got_mask).shape == tuple(want_mask.shape)
        return got, want

    def test_v1_interleaved_registers(self):
        """V1 path: registers extend 9 -> 18 tokens (ceil(16/6)*6), mask
        cleared, INTERLEAVED token-index RoPE."""
        got, _ = self._run(self._cfg())
        assert np.asarray(got).shape[1] == 18

    def test_v2_gated_split(self):
        """V2.3-style connector: gated attention + SPLIT rope + f64 grid."""
        from ltx2_tpu.ops.rope import LTXRopeType

        self._run(self._cfg(apply_gated_attention=True, rope_type=LTXRopeType.SPLIT))

    def test_no_registers_no_mask(self):
        got, _ = self._run(self._cfg(num_learnable_registers=None), with_mask=False)
        assert np.asarray(got).shape[1] == 9


class TestEncoderCompositionOracle:
    def test_video_encoder_full_stack(self):
        """extract_v1 -> additive mask -> connector -> binary re-mask
        (encoder.py:134-182)."""
        from ltx2_tpu.models.text_encoder.connector import init_connector
        from ltx2_tpu.models.text_encoder.encoder import (
            TextEncoderConfig,
            video_text_encoder_apply,
        )
        from ltx2_tpu.models.text_encoder.feature_extractor import (
            init_feature_extractor_v1,
        )

        conn_cfg = TestConnectorOracle()._cfg()
        cfg = TextEncoderConfig(hidden_dim=conn_cfg.inner_dim, num_gemma_layers=4,
                                connector=conn_cfg)
        g = torch.Generator().manual_seed(5)
        hs = torch.randn(4, 2, 9, conn_cfg.inner_dim, generator=g)
        binary = torch.ones(2, 9)
        binary[0, :3] = 0

        params = {
            "feature_extractor": init_feature_extractor_v1(
                jax.random.PRNGKey(7), hidden_dim=conn_cfg.inner_dim, num_layers=4
            ),
            "embeddings_connector": init_connector(jax.random.PRNGKey(8), conn_cfg),
        }
        out = video_text_encoder_apply(params, cfg, t2j(hs), t2j(binary))

        tp = tree_to_torch(params)
        feat = torch_extract_v1(tp["feature_extractor"], hs, binary, "left")
        add = torch_additive_mask(binary)
        enc, out_mask = torch_connector(
            tp["embeddings_connector"], connector_cfg_dict(conn_cfg), feat, add
        )
        bin_mask = (out_mask.squeeze(1).squeeze(1) >= -0.5).to(torch.int32)
        enc = enc * bin_mask[:, :, None]
        assert_close(out.video_encoding, enc, rtol=5e-4, atol=2e-4, msg="video encoder stack")
        np.testing.assert_array_equal(np.asarray(out.attention_mask), bin_mask.numpy())

    def test_av_encoder_v2_full_stack(self):
        """V2: dual extractor heads -> two connectors (encoder.py:300-356)."""
        from ltx2_tpu.models.text_encoder.connector import init_connector
        from ltx2_tpu.models.text_encoder.encoder import (
            TextEncoderConfig,
            av_text_encoder_apply,
        )
        from ltx2_tpu.models.text_encoder.feature_extractor import (
            init_feature_extractor_v2,
        )
        from ltx2_tpu.ops.rope import LTXRopeType

        v_conn = TestConnectorOracle()._cfg(
            apply_gated_attention=True, rope_type=LTXRopeType.SPLIT
        )
        a_conn = TestConnectorOracle()._cfg(
            attention_head_dim=4, apply_gated_attention=True,
            rope_type=LTXRopeType.SPLIT,
        )
        hidden_dim = 12
        cfg = TextEncoderConfig(
            v2=True, hidden_dim=hidden_dim, num_gemma_layers=4,
            video_inner_dim=v_conn.inner_dim, audio_inner_dim=a_conn.inner_dim,
            connector=v_conn, audio_connector=a_conn,
        )
        g = torch.Generator().manual_seed(9)
        hs = torch.randn(4, 2, 9, hidden_dim, generator=g)
        binary = torch.ones(2, 9)
        binary[1, :2] = 0

        params = {
            "feature_extractor": init_feature_extractor_v2(
                jax.random.PRNGKey(10), hidden_dim=hidden_dim, num_layers=4,
                video_inner_dim=v_conn.inner_dim, audio_inner_dim=a_conn.inner_dim,
            ),
            "embeddings_connector": init_connector(jax.random.PRNGKey(11), v_conn),
            "audio_embeddings_connector": init_connector(jax.random.PRNGKey(12), a_conn),
        }
        out = av_text_encoder_apply(params, cfg, t2j(hs), t2j(binary))

        tp = tree_to_torch(params)
        feat_v, feat_a = torch_extract_v2(tp["feature_extractor"], hs, binary, hidden_dim)
        add = torch_additive_mask(binary)
        enc_v, out_mask = torch_connector(
            tp["embeddings_connector"], connector_cfg_dict(v_conn), feat_v, add
        )
        bin_mask = (out_mask.squeeze(1).squeeze(1) >= -0.5).to(torch.int32)
        enc_v = enc_v * bin_mask[:, :, None]
        enc_a, _ = torch_connector(
            tp["audio_embeddings_connector"], connector_cfg_dict(a_conn), feat_a, add
        )
        assert_close(out.video_encoding, enc_v, rtol=5e-4, atol=2e-4, msg="AV video enc")
        assert_close(out.audio_encoding, enc_a, rtol=5e-4, atol=2e-4, msg="AV audio enc")
