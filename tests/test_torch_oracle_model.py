"""Full-model torch-oracle parity for the LTX-2 DiT.

Round-1 verdict closed the kernel-level gap (test_torch_oracle.py); this
file extends the executed parity evidence from kernels to the WHOLE model
function: an independent PyTorch implementation of the reference DiT —
preprocessors, AV transformer block (V1 and V2), output heads, X0 wrapper —
written from the reference's MLX source (file:line cited per function, NOT
from this repo's JAX code), run on the SAME random weights and inputs as
the JAX model, asserted equal to fp32 tolerance.

Covers SURVEY.md hard part #1 ("numerical parity across 48 layers") at the
composition level: AdaLN table arithmetic, timestep reshape semantics,
caption projection, mask conversion, SPLIT-RoPE plumbing, cross-modal
A<->V attention with the sigma swap, per-token timesteps, gated attention,
prompt-KV modulation, and the scan-stacked parameter layout.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from tests.test_torch_oracle import (
    assert_close,
    t2j,
    torch_apply_split,
    torch_rope_pipeline,
)

torch.manual_seed(0)


# ---------------------------------------------------------------------------
# Param tree conversion: jax (stacked blocks) -> torch (per-layer dicts)
# ---------------------------------------------------------------------------


def tree_to_torch(tree):
    if isinstance(tree, dict):
        return {k: tree_to_torch(v) for k, v in tree.items() if v is not None}
    if isinstance(tree, (list, tuple)):
        return [tree_to_torch(v) for v in tree]
    return torch.from_numpy(np.array(tree, dtype=np.float32))


def slice_layer(tree, i):
    """Select layer i from a block tree whose leaves are stacked (L, ...)."""
    if isinstance(tree, dict):
        return {k: slice_layer(v, i) for k, v in tree.items()}
    return tree[i]


# ---------------------------------------------------------------------------
# Torch oracle: reference building blocks
# ---------------------------------------------------------------------------


def lin(p, x):
    out = x @ p["weight"].T
    if "bias" in p:
        out = out + p["bias"]
    return out


def torch_rms(x, eps=1e-6, weight=None):
    # attention.py:89-103 (mx.fast.rms_norm semantics)
    out = x * torch.rsqrt(x.pow(2).mean(-1, keepdim=True) + eps)
    if weight is not None:
        out = out * weight
    return out


def torch_sinusoidal(t, dim=256, flip_sin_to_cos=True, shift=0.0, max_period=10000):
    """DDPM sinusoid (timestep_embedding.py:10-61): flip_sin_to_cos=True,
    downscale_freq_shift=0."""
    half = dim // 2
    exponent = -math.log(max_period) * torch.arange(half, dtype=torch.float32)
    exponent = exponent / (half - shift)
    emb = t[:, None].float() * torch.exp(exponent)[None, :]
    emb = torch.cat([emb.sin(), emb.cos()], dim=-1)
    if flip_sin_to_cos:
        emb = torch.cat([emb[:, half:], emb[:, :half]], dim=-1)
    return emb


def torch_adaln_single(p, t):
    """AdaLayerNormSingle (timestep_embedding.py:127-202): sinusoid ->
    linear-silu-linear -> silu -> linear; returns (emb, embedded)."""
    proj = torch_sinusoidal(t)
    embedder = p["emb"]["timestep_embedder"]
    embedded = lin(embedder["linear_2"], F.silu(lin(embedder["linear_1"], proj)))
    emb = lin(p["linear"], F.silu(embedded))
    return emb, embedded


def torch_caption_projection(p, caption):
    # PixArtAlphaTextProjection (model.py:32-56): linear -> gelu_approx -> linear
    return lin(p["linear_2"], F.gelu(lin(p["linear_1"], caption), approximate="tanh"))


def torch_attention(p, x, heads, d_head, eps, context=None, mask=None,
                    pe=None, k_pe=None, gated=False):
    """Reference Attention (attention.py:144-253): QKV linears, FULL-inner
    RMSNorm on Q/K, SPLIT RoPE on flat (B, T, H*D) input, SDPA, optional
    2*sigmoid per-head gating, output projection."""
    q = torch_rms(lin(p["to_q"], x), eps, p["q_norm"]["weight"])
    ctx = x if context is None else context
    k = torch_rms(lin(p["to_k"], ctx), eps, p["k_norm"]["weight"])
    v = lin(p["to_v"], ctx)

    def apply_rope(t, cos, sin):
        # apply_split_rotary_emb flat-input path (rope.py:110-143)
        b, h, tt, _ = cos.shape
        t4 = t.reshape(b, tt, h, -1).permute(0, 2, 1, 3)
        out = torch_apply_split(t4, cos, sin)
        return out.permute(0, 2, 1, 3).reshape(t.shape)

    if pe is not None:
        q = apply_rope(q, *pe)
        kp = pe if k_pe is None else k_pe
        k = apply_rope(k, *kp)

    b, tq, _ = q.shape
    tk = k.shape[1]
    qh = q.reshape(b, tq, heads, d_head).permute(0, 2, 1, 3)
    kh = k.reshape(b, tk, heads, d_head).permute(0, 2, 1, 3)
    vh = v.reshape(b, tk, heads, d_head).permute(0, 2, 1, 3)
    logits = qh @ kh.transpose(-1, -2) / math.sqrt(d_head)
    if mask is not None:
        logits = logits + mask
    out = logits.softmax(-1) @ vh
    out = out.permute(0, 2, 1, 3).reshape(b, tq, heads * d_head)

    if gated:
        gates = 2.0 * torch.sigmoid(lin(p["to_gate_logits"], x))  # (B, T, H)
        out = (out.reshape(b, tq, heads, d_head) * gates[..., None]).reshape(
            b, tq, heads * d_head
        )
    return lin(p["to_out"], out)


def torch_ff(p, x):
    # FeedForward (feed_forward.py:29-54): linear -> gelu_approx -> linear
    h = F.gelu(lin(p["project_in"]["proj"], x), approximate="tanh")
    return lin(p["project_out"], h)


def get_ada(table, timestep, start, end):
    # get_ada_values (transformer.py:369-392)
    vals = table[None, None, start:end] + timestep[:, :, start:end]
    return tuple(vals[:, :, i] for i in range(end - start))


def torch_text_cross_attention(p, x, args, attn_key, table_key, prompt_key,
                               heads, d_head, eps, v2):
    """_apply_text_cross_attention (transformer.py:427-455)."""
    if v2:
        shift_q, scale_q, gate = get_ada(p[table_key], args["timesteps"], 6, 9)
        kv_mod = p[prompt_key][None, None] + args["prompt_timestep"]
        shift_kv, scale_kv = kv_mod[:, :, 0], kv_mod[:, :, 1]
        attn_in = torch_rms(x, eps) * (1 + scale_q) + shift_q
        ctx = args["context"] * (1 + scale_kv) + shift_kv
        out = torch_attention(
            p[attn_key], attn_in, heads, d_head, eps, context=ctx,
            mask=args["context_mask"], gated=args["gated"],
        )
        return out * gate
    return torch_attention(
        p[attn_key], torch_rms(x, eps), heads, d_head, eps,
        context=args["context"], mask=args["context_mask"], gated=args["gated"],
    )


def torch_av_block(p, video, audio, vcfg, acfg, eps=1e-6, skip=()):
    """BasicAVTransformerBlock forward (transformer.py:457-648).

    video/audio: dicts with x, context, timesteps, pe, context_mask,
    cross_pe, cross_ss, cross_gate, prompt_timestep, gated.
    skip: perturbation names active for the WHOLE batch
    ('video_self'|'audio_self'|'a2v'|'v2a') — reference block-level skips.
    """
    run_v, run_a = video is not None, audio is not None
    vx = video["x"] if run_v else None
    ax = audio["x"] if run_a else None
    v2 = vcfg["v2"] if run_v else acfg["v2"]

    if run_v:
        sh, sc, gate = get_ada(p["scale_shift_table"], video["timesteps"], 0, 3)
        if "video_self" not in skip:
            normed = torch_rms(vx, eps) * (1 + sc) + sh
            attn = torch_attention(
                p["attn1"], normed, vcfg["heads"], vcfg["d_head"], eps,
                pe=video["pe"], gated=video["gated"],
            )
            vx = vx + attn * gate
        cross = torch_text_cross_attention(
            p, vx, video, "attn2", "scale_shift_table", "prompt_scale_shift_table",
            vcfg["heads"], vcfg["d_head"], eps, v2,
        )
        vx = vx + cross

    if run_a:
        sh, sc, gate = get_ada(p["audio_scale_shift_table"], audio["timesteps"], 0, 3)
        if "audio_self" not in skip:
            normed = torch_rms(ax, eps) * (1 + sc) + sh
            attn = torch_attention(
                p["audio_attn1"], normed, acfg["heads"], acfg["d_head"], eps,
                pe=audio["pe"], gated=audio["gated"],
            )
            ax = ax + attn * gate
        cross = torch_text_cross_attention(
            p, ax, audio, "audio_attn2", "audio_scale_shift_table",
            "audio_prompt_scale_shift_table", acfg["heads"], acfg["d_head"], eps, v2,
        )
        ax = ax + cross

    if run_v and run_a and "audio_to_video_attn" in p:
        vxn, axn = torch_rms(vx, eps), torch_rms(ax, eps)

        def av_ca(table, ss_t, gate_t):
            ss = table[None, None, :4] + ss_t
            g = table[None, None, 4:] + gate_t
            return tuple(ss[:, :, i] for i in range(4)) + (g[:, :, 0],)

        (sc_a_a2v, sh_a_a2v, sc_a_v2a, sh_a_v2a, gate_v2a) = av_ca(
            p["scale_shift_table_a2v_ca_audio"], audio["cross_ss"], audio["cross_gate"]
        )
        (sc_v_a2v, sh_v_a2v, sc_v_v2a, sh_v_v2a, gate_a2v) = av_ca(
            p["scale_shift_table_a2v_ca_video"], video["cross_ss"], video["cross_gate"]
        )
        if "a2v" not in skip:
            vq = vxn * (1 + sc_v_a2v) + sh_v_a2v
            akv = axn * (1 + sc_a_a2v) + sh_a_a2v
            out = torch_attention(
                p["audio_to_video_attn"], vq, acfg["heads"], acfg["d_head"], eps,
                context=akv, pe=video["cross_pe"], k_pe=audio["cross_pe"],
                gated=video["gated"],
            )
            vx = vx + out * gate_a2v
        if "v2a" not in skip:
            aq = axn * (1 + sc_a_v2a) + sh_a_v2a
            vkv = vxn * (1 + sc_v_v2a) + sh_v_v2a
            out = torch_attention(
                p["video_to_audio_attn"], aq, acfg["heads"], acfg["d_head"], eps,
                context=vkv, pe=audio["cross_pe"], k_pe=video["cross_pe"],
                gated=audio["gated"],
            )
            ax = ax + out * gate_v2a

    if run_v:
        sh, sc, gate = get_ada(p["scale_shift_table"], video["timesteps"], 3, 6)
        ff = torch_ff(p["ff"], torch_rms(vx, eps) * (1 + sc) + sh)
        vx = vx + ff * gate
    if run_a:
        sh, sc, gate = get_ada(p["audio_scale_shift_table"], audio["timesteps"], 3, 6)
        ff = torch_ff(p["audio_ff"], torch_rms(ax, eps) * (1 + sc) + sh)
        ax = ax + ff * gate
    return vx, ax


def torch_prepare_stream(tp, modality, *, prefix, inner_dim, heads, max_pos,
                         theta, ts_mult, rope_type, v2, gated,
                         rope_f64=True):
    """TransformerArgsPreprocessor.prepare (model.py:231-281)."""
    x = lin(tp[f"{prefix}patchify_proj"], modality["latent"])
    batch = x.shape[0]

    t = (modality["timesteps"] * ts_mult).flatten()
    emb, embedded = torch_adaln_single(tp[f"{prefix}adaln_single"], t)
    n_emb = emb.shape[-1] // inner_dim
    timesteps = emb.reshape(batch, -1, n_emb, inner_dim)
    embedded = embedded.reshape(batch, -1, inner_dim)

    prompt_timestep = None
    if v2 and f"{prefix}prompt_adaln_single" in tp:
        sigma = modality.get("sigma")
        if sigma is None:
            sigma = modality["timesteps"]
        if sigma.ndim > 1:
            sigma = sigma[:, 0]
        pe_emb, _ = torch_adaln_single(
            tp[f"{prefix}prompt_adaln_single"], (sigma * ts_mult).flatten()
        )
        prompt_timestep = pe_emb.reshape(batch, -1, 2, inner_dim)

    context = modality["context"]
    cap_key = f"{prefix}caption_projection"
    if cap_key in tp:
        context = torch_caption_projection(tp[cap_key], context)
    context = context.reshape(batch, -1, x.shape[-1])

    mask = modality.get("context_mask")
    if mask is not None:
        # bool (B, S) -> additive (B, 1, 1, S), f32 value (model.py:163-201)
        mask = ((1.0 - mask.float()) * -3.40e38).reshape(batch, 1, 1, -1)

    pe = torch_rope_pipeline(
        modality["positions"], inner_dim, heads, max_pos, theta, rope_type,
        double_precision=rope_f64,
    )
    return {
        "x": x, "context": context, "timesteps": timesteps, "pe": pe,
        "context_mask": mask, "embedded": embedded,
        "prompt_timestep": prompt_timestep, "gated": gated,
    }


def torch_prepare_cross(tp, args, modality, cross_modality, *, ss_key, gate_key,
                        inner_dim, heads, theta, ts_mult, av_ca_mult,
                        cross_max_pos, cross_dim, rope_type, rope_f64=True):
    """MultiModalTransformerArgsPreprocessor (model.py:284-410): temporal-only
    cross RoPE; cross-attn timestep from the OTHER modality's sigma."""
    temporal = modality["positions"][:, 0:1]
    cross_pe = torch_rope_pipeline(
        temporal, cross_dim, heads, [cross_max_pos], theta, rope_type,
        double_precision=rope_f64,
    )
    sigma = cross_modality.get("sigma")
    if sigma is None:
        sigma = cross_modality["timesteps"]
    if sigma.ndim > 1:
        sigma = sigma[:, 0]
    batch = args["x"].shape[0]
    scaled = sigma * ts_mult
    ss_emb, _ = torch_adaln_single(tp[ss_key], scaled.flatten())
    ss_emb = ss_emb.reshape(batch, -1, 4, inner_dim)
    av_ca_factor = av_ca_mult / ts_mult
    gate_emb, _ = torch_adaln_single(tp[gate_key], (scaled * av_ca_factor).flatten())
    gate_emb = gate_emb.reshape(batch, -1, 1, inner_dim)
    args.update(cross_pe=cross_pe, cross_ss=ss_emb, cross_gate=gate_emb)
    return args


def torch_process_output(table, proj, x, embedded, eps):
    """_process_video_output (model.py:744-774): LayerNorm (no affine) +
    scale/shift + proj_out."""
    ss = table[None, None] + embedded[:, :, None]
    shift, scale = ss[:, :, 0], ss[:, :, 1]
    x = F.layer_norm(x, (x.shape[-1],), eps=eps)
    return lin(proj, x * (1 + scale) + shift)


def torch_ltx_forward(tp, cfg, video=None, audio=None, skip=()):
    """Full LTXModel forward -> velocity (model.py:776-881)."""
    run_v, run_a = video is not None, audio is not None
    vcfg = {
        "heads": cfg["heads"], "d_head": cfg["d_head"], "v2": cfg["v2"],
    }
    acfg = {
        "heads": cfg["audio_heads"], "d_head": cfg["audio_d_head"], "v2": cfg["v2"],
    }
    v_inner = cfg["heads"] * cfg["d_head"]
    a_inner = cfg["audio_heads"] * cfg["audio_d_head"]

    v_args = a_args = None
    if run_v:
        v_args = torch_prepare_stream(
            tp, video, prefix="", inner_dim=v_inner, heads=cfg["heads"],
            max_pos=cfg["max_pos"], theta=cfg["theta"], ts_mult=cfg["ts_mult"],
            rope_type=cfg["rope_type"], v2=cfg["v2"], gated=cfg["gated"],
            rope_f64=cfg.get("rope_f64", True),
        )
        if run_a:
            v_args = torch_prepare_cross(
                tp, v_args, video, audio,
                ss_key="av_ca_video_scale_shift_adaln_single",
                gate_key="av_ca_a2v_gate_adaln_single",
                inner_dim=v_inner, heads=cfg["audio_heads"], theta=cfg["theta"],
                ts_mult=cfg["ts_mult"], av_ca_mult=cfg["av_ca_mult"],
                cross_max_pos=cfg["cross_max_pos"], cross_dim=a_inner,
                rope_type=cfg["rope_type"], rope_f64=cfg.get("rope_f64", True),
            )
    if run_a:
        a_args = torch_prepare_stream(
            tp, audio, prefix="audio_", inner_dim=a_inner,
            heads=cfg["audio_heads"], max_pos=[cfg["cross_max_pos"]],
            theta=cfg["theta"], ts_mult=cfg["ts_mult"],
            rope_type=cfg["rope_type"], v2=cfg["v2"], gated=cfg["gated"],
            rope_f64=cfg.get("rope_f64", True),
        )
        if run_v:
            a_args = torch_prepare_cross(
                tp, a_args, audio, video,
                ss_key="av_ca_audio_scale_shift_adaln_single",
                gate_key="av_ca_v2a_gate_adaln_single",
                inner_dim=a_inner, heads=cfg["audio_heads"], theta=cfg["theta"],
                ts_mult=cfg["ts_mult"], av_ca_mult=cfg["av_ca_mult"],
                cross_max_pos=cfg["cross_max_pos"], cross_dim=a_inner,
                rope_type=cfg["rope_type"], rope_f64=cfg.get("rope_f64", True),
            )

    for i in range(cfg["layers"]):
        bp = slice_layer(tp["transformer_blocks"], i)
        vx, ax = torch_av_block(bp, v_args, a_args, vcfg, acfg, eps=cfg["eps"], skip=skip)
        if v_args is not None:
            v_args["x"] = vx
        if a_args is not None:
            a_args["x"] = ax

    v_out = a_out = None
    if run_v:
        v_out = torch_process_output(
            tp["scale_shift_table"], tp["proj_out"], v_args["x"],
            v_args["embedded"], cfg["eps"],
        )
    if run_a:
        a_out = torch_process_output(
            tp["audio_scale_shift_table"], tp["audio_proj_out"], a_args["x"],
            a_args["embedded"], cfg["eps"],
        )
    if run_v and run_a:
        return v_out, a_out
    return v_out if run_v else a_out


def torch_x0(modality, velocity):
    """X0Model.denoise (model.py:910-918)."""
    t = modality["timesteps"]
    t = t[:, None, None] if t.ndim == 1 else t[:, :, None]
    return modality["latent"] - t * velocity


# ---------------------------------------------------------------------------
# Shared builders
# ---------------------------------------------------------------------------


def build_jax_model(**overrides):
    from ltx2_tpu.models.transformer.model import (
        LTXModelConfig,
        LTXModelType,
        init_ltx_model,
    )

    kwargs = dict(
        model_type=LTXModelType.VideoOnly,
        num_attention_heads=4,
        # d_head 26 -> inner 104: dim//(2*n_dims)=17 freqs per axis, so the
        # SPLIT cos/sin get a nonzero FRONT identity pad (rope.py:311-317) —
        # exercised at the model level, not just the kernel test.
        attention_head_dim=26,
        in_channels=16,
        out_channels=16,
        num_layers=3,
        cross_attention_dim=104,  # == inner (the real model's invariant)
        caption_channels=56,
        compute_dtype="float32",
        use_rope_double_precision=True,  # oracle grid is f64 (rope.py:388-402)
        remat=False,
        audio_heads=4,
        audio_head_dim=12,
        audio_in_channels=10,
        audio_out_channels=10,
    )
    kwargs.update(overrides)
    cfg = LTXModelConfig(**kwargs)
    params = init_ltx_model(jax.random.PRNGKey(7), cfg, dtype=jnp.float32)
    # Zero-init tables (scale_shift etc.) would hide table-arithmetic bugs;
    # randomize every leaf with a distinct key.
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(11), len(leaves))
    leaves = [
        leaf + 0.3 * jax.random.normal(k, leaf.shape, leaf.dtype)
        for leaf, k in zip(leaves, keys)
    ]
    params = jax.tree_util.tree_unflatten(treedef, leaves)
    return cfg, params


def oracle_cfg(cfg):
    return {
        "heads": cfg.num_attention_heads,
        "d_head": cfg.attention_head_dim,
        "audio_heads": cfg.audio_heads,
        "audio_d_head": cfg.audio_head_dim,
        "layers": cfg.num_layers,
        "max_pos": list(cfg.positional_embedding_max_pos),
        "theta": cfg.positional_embedding_theta,
        "ts_mult": cfg.timestep_scale_multiplier,
        "av_ca_mult": cfg.av_ca_timestep_scale_multiplier,
        "cross_max_pos": cfg.audio_cross_pe_max_pos,
        "rope_type": "split",
        "rope_f64": cfg.use_rope_double_precision,
        "eps": cfg.norm_eps,
        "v2": cfg.cross_attention_adaln,
        "gated": cfg.apply_gated_attention,
    }


def video_inputs(cfg, b=2, t=18, seq=7, per_token_t=False, with_mask=False, seed=3):
    g = torch.Generator().manual_seed(seed)
    n_dims = 3
    start = torch.randint(0, 50, (b, n_dims, t), generator=g)
    positions = torch.stack([start, start + torch.randint(1, 5, start.shape, generator=g)], dim=-1).float()
    timesteps = (
        torch.rand(b, t, generator=g) if per_token_t else torch.rand(b, generator=g)
    )
    mod = {
        "latent": torch.randn(b, t, cfg.in_channels, generator=g),
        "context": torch.randn(b, seq, cfg.caption_channels or cfg.cross_attention_dim, generator=g),
        "timesteps": timesteps,
        "positions": positions,
        "sigma": torch.rand(b, generator=g),
    }
    if with_mask:
        mask = torch.ones(b, seq)
        mask[:, -2:] = 0.0
        mod["context_mask"] = mask
    return mod


def audio_inputs(cfg, b=2, t=9, seq=7, seed=5):
    g = torch.Generator().manual_seed(seed)
    start = torch.randint(0, 12, (b, 1, t), generator=g)
    positions = torch.stack([start, start + 1], dim=-1).float()
    return {
        "latent": torch.randn(b, t, cfg.audio_in_channels, generator=g),
        "context": torch.randn(b, seq, cfg.caption_channels or cfg.audio_inner_dim, generator=g),
        "timesteps": torch.rand(b, generator=g),
        "positions": positions,
        "sigma": torch.rand(b, generator=g),
    }


def to_jax_modality(mod):
    from ltx2_tpu.models.transformer.model import Modality

    mask = mod.get("context_mask")
    return Modality(
        latent=t2j(mod["latent"]),
        context=t2j(mod["context"]),
        context_mask=None if mask is None else t2j(mask).astype(bool),
        timesteps=t2j(mod["timesteps"]),
        positions=t2j(mod["positions"]),
        sigma=t2j(mod["sigma"]),
    )


# ---------------------------------------------------------------------------
# Tests
# ---------------------------------------------------------------------------


class TestFullModelOracle:
    def test_v1_video_forward(self):
        """V1 video-only: scalar timesteps, caption projection, no mask."""
        from ltx2_tpu.models.transformer.model import ltx_model_apply

        cfg, params = build_jax_model()
        mod = video_inputs(cfg)
        got = ltx_model_apply(params, cfg, video=to_jax_modality(mod))

        tp = tree_to_torch(params)
        want = torch_ltx_forward(tp, oracle_cfg(cfg), video=mod)
        assert_close(got, want, rtol=5e-4, atol=1e-3, msg="V1 video forward")

    def test_f32_rope_grid_forward(self):
        """The REAL serving config: the reference DiT always runs the f32
        frequency grid (its preprocessors never forward
        use_double_precision, model.py:219-228/333-343; only the text
        connector uses f64) — model-level parity must hold on the f32 path
        too, not just the f64 one the other tests pin."""
        from ltx2_tpu.models.transformer.model import ltx_model_apply

        cfg, params = build_jax_model(use_rope_double_precision=False)
        assert oracle_cfg(cfg)["rope_f64"] is False
        mod = video_inputs(cfg)
        got = ltx_model_apply(params, cfg, video=to_jax_modality(mod))

        tp = tree_to_torch(params)
        want = torch_ltx_forward(tp, oracle_cfg(cfg), video=mod)
        assert_close(got, want, rtol=5e-4, atol=1e-3, msg="f32-grid forward")

    def test_v1_per_token_timesteps_and_mask(self):
        """Per-token timesteps (the denoise-mask path, common.py:193-232) +
        boolean context mask -> additive conversion."""
        from ltx2_tpu.models.transformer.model import ltx_model_apply

        cfg, params = build_jax_model()
        mod = video_inputs(cfg, per_token_t=True, with_mask=True)
        got = ltx_model_apply(params, cfg, video=to_jax_modality(mod))

        tp = tree_to_torch(params)
        want = torch_ltx_forward(tp, oracle_cfg(cfg), video=mod)
        assert_close(got, want, rtol=5e-4, atol=1e-3, msg="per-token t + mask")

    def test_v2_video_forward(self):
        """V2 (LTX-2.3): 9-value AdaLN, Q-modulated cross-attn, prompt-KV
        modulation, per-head gated attention, caption_channels=None."""
        from ltx2_tpu.models.transformer.model import ltx_model_apply

        cfg, params = build_jax_model(
            cross_attention_adaln=True,
            apply_gated_attention=True,
            caption_channels=None,
        )
        mod = video_inputs(cfg, per_token_t=True)
        got = ltx_model_apply(params, cfg, video=to_jax_modality(mod))

        tp = tree_to_torch(params)
        want = torch_ltx_forward(tp, oracle_cfg(cfg), video=mod)
        assert_close(got, want, rtol=5e-4, atol=1e-3, msg="V2 video forward")

    def test_av_forward_sigma_swap(self):
        """Full AV dual-stream: bidirectional cross-modal attention with
        separate Q/K RoPE and the cross-attn sigma SWAP (audio's cross-attn
        timestep from video's sigma and vice versa, model.py:394-399)."""
        from ltx2_tpu.models.transformer.model import LTXModelType, ltx_model_apply

        cfg, params = build_jax_model(model_type=LTXModelType.AudioVideo)
        vmod = video_inputs(cfg, per_token_t=True)
        amod = audio_inputs(cfg)
        got_v, got_a = ltx_model_apply(
            params, cfg, video=to_jax_modality(vmod), audio=to_jax_modality(amod)
        )

        tp = tree_to_torch(params)
        want_v, want_a = torch_ltx_forward(tp, oracle_cfg(cfg), video=vmod, audio=amod)
        assert_close(got_v, want_v, rtol=5e-4, atol=1e-3, msg="AV video out")
        assert_close(got_a, want_a, rtol=5e-4, atol=1e-3, msg="AV audio out")

    def test_av_v2_forward(self):
        """V2 AV: everything at once — the LTX-2.3 production configuration
        in miniature."""
        from ltx2_tpu.models.transformer.model import LTXModelType, ltx_model_apply

        cfg, params = build_jax_model(
            model_type=LTXModelType.AudioVideo,
            cross_attention_adaln=True,
            apply_gated_attention=True,
            caption_channels=None,
        )
        g = torch.Generator().manual_seed(13)
        vmod = video_inputs(cfg, per_token_t=True)
        vmod["context"] = torch.randn(2, 7, cfg.video_inner_dim, generator=g)
        amod = audio_inputs(cfg)
        amod["context"] = torch.randn(2, 7, cfg.audio_inner_dim, generator=g)
        got_v, got_a = ltx_model_apply(
            params, cfg, video=to_jax_modality(vmod), audio=to_jax_modality(amod)
        )

        tp = tree_to_torch(params)
        want_v, want_a = torch_ltx_forward(tp, oracle_cfg(cfg), video=vmod, audio=amod)
        # Deep V2 AV stack on O(50) outputs: a couple of near-cancelling
        # elements land at ~2e-3 absolute from fp accumulation order.
        assert_close(got_v, want_v, rtol=5e-4, atol=5e-3, msg="V2 AV video out")
        assert_close(got_a, want_a, rtol=5e-4, atol=5e-3, msg="V2 AV audio out")

    def test_x0_wrapper(self):
        """x0 = latent - t * velocity, both timestep ranks (model.py:910-918)."""
        from ltx2_tpu.models.transformer.model import x0_model_apply

        cfg, params = build_jax_model(num_layers=2)
        mod = video_inputs(cfg, per_token_t=True)
        got = x0_model_apply(params, cfg, video=to_jax_modality(mod))

        tp = tree_to_torch(params)
        vel = torch_ltx_forward(tp, oracle_cfg(cfg), video=mod)
        want = torch_x0(mod, vel)
        assert_close(got, want, rtol=5e-4, atol=1e-3, msg="x0 wrapper")

    def test_stg_perturbation_skip(self):
        """Whole-batch STG skip == reference block-level skip: per-sample
        gate masks with all samples skipping must equal the oracle's
        branch-skip (transformer.py:486-501)."""
        from ltx2_tpu.components.perturbations import (
            BatchedPerturbationConfig,
            Perturbation,
            PerturbationConfig,
            PerturbationType,
        )
        from ltx2_tpu.models.transformer.model import LTXModelType, ltx_model_apply

        cfg, params = build_jax_model(model_type=LTXModelType.AudioVideo)
        vmod = video_inputs(cfg)
        amod = audio_inputs(cfg)

        sample_cfg = PerturbationConfig(
            perturbations=(
                Perturbation(type=PerturbationType.SKIP_VIDEO_SELF_ATTN, blocks=(1,)),
                Perturbation(type=PerturbationType.SKIP_A2V_CROSS_ATTN, blocks=(1,)),
            )
        )
        pert = BatchedPerturbationConfig(perturbations=(sample_cfg, sample_cfg))
        got_v, got_a = ltx_model_apply(
            params, cfg, video=to_jax_modality(vmod), audio=to_jax_modality(amod),
            perturbations=pert,
        )

        tp = tree_to_torch(params)
        ocfg = oracle_cfg(cfg)
        # Oracle: run per-layer with skips on block 1 only.
        vcfg = {"heads": ocfg["heads"], "d_head": ocfg["d_head"], "v2": False}
        acfg = {"heads": ocfg["audio_heads"], "d_head": ocfg["audio_d_head"], "v2": False}
        v_inner = ocfg["heads"] * ocfg["d_head"]
        a_inner = ocfg["audio_heads"] * ocfg["audio_d_head"]
        v_args = torch_prepare_stream(
            tp, vmod, prefix="", inner_dim=v_inner, heads=ocfg["heads"],
            max_pos=ocfg["max_pos"], theta=ocfg["theta"], ts_mult=ocfg["ts_mult"],
            rope_type="split", v2=False, gated=False,
        )
        v_args = torch_prepare_cross(
            tp, v_args, vmod, amod,
            ss_key="av_ca_video_scale_shift_adaln_single",
            gate_key="av_ca_a2v_gate_adaln_single",
            inner_dim=v_inner, heads=ocfg["audio_heads"], theta=ocfg["theta"],
            ts_mult=ocfg["ts_mult"], av_ca_mult=ocfg["av_ca_mult"],
            cross_max_pos=ocfg["cross_max_pos"], cross_dim=a_inner, rope_type="split",
        )
        a_args = torch_prepare_stream(
            tp, amod, prefix="audio_", inner_dim=a_inner, heads=ocfg["audio_heads"],
            max_pos=[ocfg["cross_max_pos"]], theta=ocfg["theta"],
            ts_mult=ocfg["ts_mult"], rope_type="split", v2=False, gated=False,
        )
        a_args = torch_prepare_cross(
            tp, a_args, amod, vmod,
            ss_key="av_ca_audio_scale_shift_adaln_single",
            gate_key="av_ca_v2a_gate_adaln_single",
            inner_dim=a_inner, heads=ocfg["audio_heads"], theta=ocfg["theta"],
            ts_mult=ocfg["ts_mult"], av_ca_mult=ocfg["av_ca_mult"],
            cross_max_pos=ocfg["cross_max_pos"], cross_dim=a_inner, rope_type="split",
        )
        for i in range(cfg.num_layers):
            bp = slice_layer(tp["transformer_blocks"], i)
            skip = ("video_self", "a2v") if i == 1 else ()
            vx, ax = torch_av_block(bp, v_args, a_args, vcfg, acfg, eps=ocfg["eps"], skip=skip)
            v_args["x"], a_args["x"] = vx, ax
        want_v = torch_process_output(
            tp["scale_shift_table"], tp["proj_out"], v_args["x"], v_args["embedded"], ocfg["eps"]
        )
        want_a = torch_process_output(
            tp["audio_scale_shift_table"], tp["audio_proj_out"], a_args["x"],
            a_args["embedded"], ocfg["eps"],
        )
        assert_close(got_v, want_v, rtol=5e-4, atol=1e-3, msg="STG skip video")
        assert_close(got_a, want_a, rtol=5e-4, atol=1e-3, msg="STG skip audio")


class TestDenoiseLoopOracle:
    """Generation-level parity: the jitted scanned denoise loop (batched-CFG
    rows, per-token timesteps from the denoise mask, post-process blending,
    Euler steps) vs an independent torch loop built on the torch DiT oracle.
    This is the executed equivalent of the reference's per-stage golden-
    tensor parity (docs/PARITY.md) on random weights — scheduler sigmas in,
    final latent out."""

    def test_cfg_loop_with_conditioning(self):
        from ltx2_tpu.components import CFGGuider, GaussianNoiser, VideoLatentPatchifier
        from ltx2_tpu.conditioning.tools import VideoLatentTools
        from ltx2_tpu.pipelines.denoise import DenoiseLoopConfig, make_video_denoise_loop
        from ltx2_tpu.types import VideoLatentShape

        cfg, params = build_jax_model(num_layers=2)

        shape = VideoLatentShape(
            batch=1, channels=cfg.in_channels, frames=2, height=3, width=3
        )
        tools = VideoLatentTools(
            patchifier=VideoLatentPatchifier(1), target_shape=shape, fps=24.0
        )
        state = GaussianNoiser()(
            jax.random.PRNGKey(0), tools.create_initial_state(), 1.0
        )
        # Token-level conditioning: first 5 tokens partially frozen.
        mask = np.ones((1, 18, 1), np.float32)
        mask[:, :5] = 0.25
        clean = np.asarray(
            jax.random.normal(jax.random.PRNGKey(9), state.latent.shape)
        )
        state = state.replace(
            denoise_mask=jnp.asarray(mask), clean_latent=jnp.asarray(clean)
        )

        sigmas = np.asarray([1.0, 0.6, 0.2, 0.0], np.float32)
        g = torch.Generator().manual_seed(40)
        pos_ctx = torch.randn(1, 7, cfg.caption_channels, generator=g)
        neg_ctx = torch.randn(1, 7, cfg.caption_channels, generator=g)

        loop = make_video_denoise_loop(cfg, DenoiseLoopConfig(guider=CFGGuider(3.0)))
        got = np.asarray(
            loop(params, state, jnp.asarray(sigmas), t2j(pos_ctx), t2j(neg_ctx)).latent
        )

        # Independent torch loop on the torch DiT oracle.
        tp = tree_to_torch(params)
        ocfg = oracle_cfg(cfg)
        latent = torch.from_numpy(np.asarray(state.latent, np.float32))
        positions = torch.from_numpy(np.asarray(state.positions, np.float32))
        mask_t = torch.from_numpy(mask)
        clean_t = torch.from_numpy(clean.astype(np.float32))
        scale = 3.0

        for i in range(len(sigmas) - 1):
            sigma, sigma_next = float(sigmas[i]), float(sigmas[i + 1])
            tok_t = (mask_t[..., 0] * sigma)  # (1, N) per-token timesteps

            def fwd(ctx):
                mod = {
                    "latent": latent,
                    "context": ctx,
                    "timesteps": tok_t,
                    "positions": positions,
                    "sigma": torch.full((1,), sigma),
                }
                vel = torch_ltx_forward(tp, ocfg, video=mod)
                return torch_x0(mod, vel)

            cond, uncond = fwd(pos_ctx), fwd(neg_ctx)
            denoised = cond + (scale - 1.0) * (cond - uncond)
            denoised = denoised * mask_t + clean_t * (1 - mask_t)
            velocity = (latent - denoised) / sigma
            latent = latent + velocity * (sigma_next - sigma)

        np.testing.assert_allclose(
            got, latent.numpy(), rtol=1e-3, atol=2e-3,
            err_msg="denoise loop vs torch oracle loop",
        )


class TestHeunStgLoopOracle:
    """Generation-level oracle for the second-order path: Heun
    predictor-corrector (incl. the final-step take-denoised special case,
    one_stage.py:419-424) with 3-row guidance (CFG + STG perturbed pass,
    self-attention skipped in all blocks)."""

    def test_heun_stg_loop(self):
        from ltx2_tpu.components import CFGGuider, GaussianNoiser, VideoLatentPatchifier
        from ltx2_tpu.conditioning.tools import VideoLatentTools
        from ltx2_tpu.pipelines.denoise import DenoiseLoopConfig, make_video_denoise_loop
        from ltx2_tpu.types import VideoLatentShape

        cfg, params = build_jax_model(num_layers=2)
        shape = VideoLatentShape(
            batch=1, channels=cfg.in_channels, frames=2, height=2, width=3
        )
        tools = VideoLatentTools(
            patchifier=VideoLatentPatchifier(1), target_shape=shape, fps=24.0
        )
        state = GaussianNoiser()(
            jax.random.PRNGKey(2), tools.create_initial_state(), 1.0
        )
        sigmas = np.asarray([1.0, 0.5, 0.0], np.float32)
        g = torch.Generator().manual_seed(41)
        pos_ctx = torch.randn(1, 7, cfg.caption_channels, generator=g)
        neg_ctx = torch.randn(1, 7, cfg.caption_channels, generator=g)

        loop_cfg = DenoiseLoopConfig(
            guider=CFGGuider(3.0), stg_scale=1.5, stg_blocks=None, sampler="heun"
        )
        got = np.asarray(
            make_video_denoise_loop(cfg, loop_cfg)(
                params, state, jnp.asarray(sigmas), t2j(pos_ctx), t2j(neg_ctx)
            ).latent
        )

        tp = tree_to_torch(params)
        ocfg = oracle_cfg(cfg)
        latent = torch.from_numpy(np.asarray(state.latent, np.float32))
        positions = torch.from_numpy(np.asarray(state.positions, np.float32))
        ones = torch.ones(1, 12, 1)
        scale, stg = 3.0, 1.5

        def x0_eval(lat, sigma, with_stg):
            def fwd(ctx, skip=()):
                mod = {
                    "latent": lat,
                    "context": ctx,
                    "timesteps": torch.full((1, 12), sigma),
                    "positions": positions,
                    "sigma": torch.full((1,), sigma),
                }
                return torch_x0(mod, torch_ltx_forward(tp, ocfg, video=mod, skip=skip))

            cond = fwd(pos_ctx)
            uncond = fwd(neg_ctx)
            denoised = cond + (scale - 1.0) * (cond - uncond)
            if with_stg:
                perturbed = fwd(pos_ctx, skip=("video_self",))
                denoised = denoised + stg * (denoised - perturbed)
            return denoised

        for i in range(len(sigmas) - 1):
            s, sn = float(sigmas[i]), float(sigmas[i + 1])
            d1 = x0_eval(latent, s, with_stg=True)
            predicted = latent + (latent - d1) / s * (sn - s)
            # Corrector: CFG-only — the reference applies STG at the FIRST
            # evaluation only (one_stage.py:385-395); denoised_at_predicted
            # has no perturbed pass (:426-444).
            d2 = x0_eval(predicted, sn, with_stg=False)
            if sn == 0:
                latent = d1
            else:
                v1 = (latent - d1) / s
                v2 = (predicted - d2) / sn
                latent = latent + 0.5 * (v1 + v2) * (sn - s)

        np.testing.assert_allclose(
            got, latent.numpy(), rtol=1e-3, atol=2e-3,
            err_msg="heun+stg loop vs torch oracle",
        )


class TestMultiModalLoopOracle:
    """Generation-level oracle for the two-stage stage-1 AV path: the
    MultiModalGuider's 4-pass guidance (CFG + STG + modality isolation with
    both cross-modal attentions skipped), std-ratio rescale, and step
    skipping (guiders.py:211-288; two_stage.py stage 1)."""

    def test_multimodal_av_loop(self):
        from ltx2_tpu.components import (
            AudioPatchifier,
            GaussianNoiser,
            VideoLatentPatchifier,
        )
        from ltx2_tpu.conditioning.tools import AudioLatentTools, VideoLatentTools
        from ltx2_tpu.models.transformer.model import LTXModelType
        from ltx2_tpu.pipelines.denoise import (
            MultiModalLoopConfig,
            make_multimodal_av_denoise_loop,
        )
        from ltx2_tpu.types import AudioLatentShape, VideoLatentShape

        cfg, params = build_jax_model(model_type=LTXModelType.AudioVideo, num_layers=2)

        v_shape = VideoLatentShape(
            batch=1, channels=cfg.in_channels, frames=2, height=2, width=3
        )
        v_tools = VideoLatentTools(
            patchifier=VideoLatentPatchifier(1), target_shape=v_shape, fps=24.0
        )
        v_state = GaussianNoiser()(
            jax.random.PRNGKey(0), v_tools.create_initial_state(), 1.0
        )
        a_shape = AudioLatentShape(
            batch=1, channels=cfg.audio_in_channels, frames=5, mel_bins=1
        )
        a_tools = AudioLatentTools(patchifier=AudioPatchifier(1), target_shape=a_shape)
        a_state = GaussianNoiser()(
            jax.random.PRNGKey(1), a_tools.create_initial_state(), 1.0
        )

        sigmas = np.asarray([1.0, 0.6, 0.2, 0.0], np.float32)
        g = torch.Generator().manual_seed(42)
        pos_v = torch.randn(1, 7, cfg.caption_channels, generator=g)
        neg_v = torch.randn(1, 7, cfg.caption_channels, generator=g)
        pos_a = torch.randn(1, 7, cfg.caption_channels, generator=g)
        neg_a = torch.randn(1, 7, cfg.caption_channels, generator=g)

        mm = MultiModalLoopConfig(
            video_cfg_scale=3.0, audio_cfg_scale=5.0, stg_scale=1.0,
            stg_blocks=None, rescale_scale=0.7, modality_scale=2.0, skip_step=1,
        )
        gv, ga = make_multimodal_av_denoise_loop(cfg, mm)(
            params, v_state, a_state, jnp.asarray(sigmas),
            t2j(pos_v), t2j(neg_v), t2j(pos_a), t2j(neg_a),
        )

        tp = tree_to_torch(params)
        ocfg = oracle_cfg(cfg)
        v_lat = torch.from_numpy(np.asarray(v_state.latent, np.float32))
        a_lat = torch.from_numpy(np.asarray(a_state.latent, np.float32))
        v_pos = torch.from_numpy(np.asarray(v_state.positions, np.float32))
        a_pos = torch.from_numpy(np.asarray(a_state.positions, np.float32))

        def fwd(vl, al, sigma, vctx, actx, skip=()):
            vmod = {
                "latent": vl, "context": vctx,
                "timesteps": torch.full((1, vl.shape[1]), sigma),
                "positions": v_pos, "sigma": torch.full((1,), sigma),
            }
            amod = {
                "latent": al, "context": actx,
                "timesteps": torch.full((1, al.shape[1]), sigma),
                "positions": a_pos, "sigma": torch.full((1,), sigma),
            }
            vvel, avel = torch_ltx_forward(tp, ocfg, video=vmod, audio=amod, skip=skip)
            return torch_x0(vmod, vvel), torch_x0(amod, avel)

        def combine(cond, uncond, ptb, mod, cfg_scale, skip_flag):
            pred = cond + (cfg_scale - 1.0) * (cond - uncond)
            pred = pred + mm.stg_scale * (cond - ptb)
            pred = pred + (mm.modality_scale - 1.0) * (cond - mod)
            cond_std = torch.sqrt(cond.var(unbiased=False) + 1e-8)
            pred_std = torch.sqrt(pred.var(unbiased=False) + 1e-8)
            factor = mm.rescale_scale * (cond_std / pred_std) + (1 - mm.rescale_scale)
            pred = pred * factor
            return cond if skip_flag else pred

        num_steps = len(sigmas) - 1
        for i in range(num_steps):
            s, sn = float(sigmas[i]), float(sigmas[i + 1])
            skip_flag = (i % (mm.skip_step + 1)) != 0
            cond = fwd(v_lat, a_lat, s, pos_v, pos_a)
            uncond = fwd(v_lat, a_lat, s, neg_v, neg_a)
            ptb = fwd(v_lat, a_lat, s, pos_v, pos_a, skip=("video_self",))
            mod = fwd(v_lat, a_lat, s, pos_v, pos_a, skip=("a2v", "v2a"))
            v_den = combine(cond[0], uncond[0], ptb[0], mod[0], mm.video_cfg_scale, skip_flag)
            a_den = combine(cond[1], uncond[1], ptb[1], mod[1], mm.audio_cfg_scale, skip_flag)
            v_lat = v_lat + (v_lat - v_den) / s * (sn - s)
            a_lat = a_lat + (a_lat - a_den) / s * (sn - s)

        np.testing.assert_allclose(
            np.asarray(gv.latent), v_lat.numpy(), rtol=1e-3, atol=2e-3,
            err_msg="MM loop video latent",
        )
        np.testing.assert_allclose(
            np.asarray(ga.latent), a_lat.numpy(), rtol=1e-3, atol=2e-3,
            err_msg="MM loop audio latent",
        )
