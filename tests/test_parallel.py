"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

The TPU-build equivalent of distributed tests the reference lacks
(SURVEY.md §4): TP-sharded DiT forward must match the unsharded result.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from ltx2_tpu.parallel.mesh import create_mesh
from ltx2_tpu.parallel.sharding import (
    dit_param_shardings,
    shard_dit_params,
    spec_for_path,
)
from tests.helpers import cached_params, jitted_forward
from tests.test_dit import make_video_modality, tiny_config


pytestmark = pytest.mark.multichip


def mesh_config():
    # heads=4 so the model axis (4) divides head-sharded dims;
    # cross_attention_dim must equal inner_dim (caption projection output).
    return tiny_config(
        num_attention_heads=4, attention_head_dim=16, cross_attention_dim=64
    )


class TestRules:
    def test_qkv_column_parallel(self):
        assert spec_for_path("transformer_blocks/attn1/to_q/weight") == P(
            None, "model", None
        )

    def test_out_row_parallel(self):
        assert spec_for_path("transformer_blocks/attn1/to_out/weight") == P(
            None, None, "model"
        )
        # Row-parallel bias replicates (added after the all-reduce).
        assert spec_for_path("transformer_blocks/attn1/to_out/bias") == P()

    def test_tables_replicated(self):
        assert spec_for_path("transformer_blocks/scale_shift_table") == P()
        assert spec_for_path("scale_shift_table") == P()
        assert spec_for_path("adaln_single/linear/weight") == P()


class TestShardedForward:
    def test_matches_unsharded(self):
        cfg = mesh_config()
        params = cached_params(cfg)
        video = make_video_modality(cfg)
        expected = np.asarray(jitted_forward(cfg)(params, video))

        mesh = create_mesh(data=2, model=4)
        sharded_params = shard_dit_params(mesh, params)

        from ltx2_tpu.models.transformer.model import ltx_model_apply

        fn = jax.jit(lambda p, v: ltx_model_apply(p, cfg, video=v))
        out = fn(sharded_params, video)
        np.testing.assert_allclose(np.asarray(out), expected, atol=2e-4)

    def test_params_actually_sharded(self):
        cfg = mesh_config()
        params = cached_params(cfg)
        mesh = create_mesh(data=2, model=4)
        shardings = dit_param_shardings(mesh, params)
        qw = shardings["transformer_blocks"]["attn1"]["to_q"]["weight"]
        assert qw.spec == P(None, "model", None)
        sharded = shard_dit_params(mesh, params)
        leaf = sharded["transformer_blocks"]["attn1"]["to_q"]["weight"]
        # 64-dim inner sharded over 4 model devices -> 16 per shard.
        shard_shapes = {s.data.shape for s in leaf.addressable_shards}
        assert all(shape[1] == leaf.shape[1] // 4 for shape in shard_shapes)

    def test_int8_matches_unsharded(self):
        """--int8 under TP (review r4: the weight_cscale rule was untested):
        column-parallel scales split with their out-features, row-parallel
        scales replicate, and the dynamic per-token activation amax crosses
        row-parallel shards via GSPMD — the sharded int8 forward must match
        the single-device int8 forward."""
        from ltx2_tpu.loader.int8 import quantize_params_int8
        from ltx2_tpu.models.transformer.model import ltx_model_apply

        cfg = mesh_config()
        int8_params = jax.jit(quantize_params_int8)(cached_params(cfg))
        video = make_video_modality(cfg)
        fn = jax.jit(lambda p, v: ltx_model_apply(p, cfg, video=v))
        expected = np.asarray(fn(int8_params, video))

        mesh = create_mesh(data=2, model=4)
        sharded = shard_dit_params(mesh, int8_params)
        cs = sharded["transformer_blocks"]["attn1"]["to_q"]["weight_cscale"]
        shard_shapes = {s.data.shape for s in cs.addressable_shards}
        assert all(shape[-1] == cs.shape[-1] // 4 for shape in shard_shapes), (
            "column-parallel cscale did not shard with its out-features"
        )
        out = fn(sharded, video)
        np.testing.assert_allclose(np.asarray(out), expected, atol=2e-4)

    def test_denoise_loop_sharded(self):
        """The full scanned denoise loop runs under the mesh."""
        from ltx2_tpu.components import CFGGuider, GaussianNoiser, VideoLatentPatchifier
        from ltx2_tpu.conditioning.tools import VideoLatentTools
        from ltx2_tpu.pipelines.denoise import DenoiseLoopConfig, make_video_denoise_loop
        from ltx2_tpu.types import VideoLatentShape

        cfg = mesh_config()
        params = cached_params(cfg)
        mesh = create_mesh(data=2, model=4)
        sharded_params = shard_dit_params(mesh, params)

        shape = VideoLatentShape(batch=1, channels=cfg.in_channels, frames=2, height=2, width=3)
        tools = VideoLatentTools(
            patchifier=VideoLatentPatchifier(1), target_shape=shape, fps=24.0
        )
        state = GaussianNoiser()(jax.random.PRNGKey(0), tools.create_initial_state(), 1.0)
        sigmas = jnp.asarray([1.0, 0.5, 0.0])
        ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 5, cfg.caption_channels))

        loop = make_video_denoise_loop(cfg, DenoiseLoopConfig(guider=CFGGuider(3.0)))
        expected = np.asarray(loop(params, state, sigmas, ctx, ctx).latent)
        out = loop(sharded_params, state, sigmas, ctx, ctx)
        np.testing.assert_allclose(np.asarray(out.latent), expected, atol=5e-4)


class TestRingAttention:
    """Sequence-parallel attention must match single-device softmax attention."""

    def test_matches_sdpa_fp32(self):
        from ltx2_tpu.ops.attention import sdpa
        from ltx2_tpu.parallel.ring_attention import ring_sdpa

        mesh = create_mesh(data=1, model=1, seq=8)
        key = jax.random.PRNGKey(0)
        kq, kk, kv = jax.random.split(key, 3)
        b, h, t, d = 2, 4, 256, 64
        q = jax.random.normal(kq, (b, h, t, d), jnp.float32)
        k = jax.random.normal(kk, (b, h, t, d), jnp.float32)
        v = jax.random.normal(kv, (b, h, t, d), jnp.float32)

        expected = np.asarray(jax.jit(sdpa)(q, k, v))
        got = np.asarray(
            jax.jit(lambda a, b2, c: ring_sdpa(a, b2, c, mesh=mesh))(q, k, v)
        )
        np.testing.assert_allclose(got, expected, atol=2e-5)

    def test_matches_sdpa_bf16(self):
        from ltx2_tpu.ops.attention import sdpa
        from ltx2_tpu.parallel.ring_attention import ring_sdpa

        mesh = create_mesh(data=1, model=1, seq=8)
        key = jax.random.PRNGKey(1)
        kq, kk, kv = jax.random.split(key, 3)
        b, h, t, d = 1, 2, 128, 32
        q = jax.random.normal(kq, (b, h, t, d)).astype(jnp.bfloat16)
        k = jax.random.normal(kk, (b, h, t, d)).astype(jnp.bfloat16)
        v = jax.random.normal(kv, (b, h, t, d)).astype(jnp.bfloat16)

        expected = np.asarray(jax.jit(sdpa)(q, k, v)).astype(np.float32)
        got = np.asarray(
            jax.jit(lambda a, b2, c: ring_sdpa(a, b2, c, mesh=mesh))(q, k, v)
        ).astype(np.float32)
        np.testing.assert_allclose(got, expected, atol=3e-2)

    def test_composes_with_data_axis(self):
        """seq axis only: batch stays replicated/data-sharded independently."""
        from ltx2_tpu.ops.attention import sdpa
        from ltx2_tpu.parallel.ring_attention import ring_sdpa

        mesh = create_mesh(data=2, model=1, seq=4)
        key = jax.random.PRNGKey(2)
        kq, kk, kv = jax.random.split(key, 3)
        b, h, t, d = 2, 2, 64, 16
        q = jax.random.normal(kq, (b, h, t, d), jnp.float32)
        k = jax.random.normal(kk, (b, h, t, d), jnp.float32)
        v = jax.random.normal(kv, (b, h, t, d), jnp.float32)

        expected = np.asarray(jax.jit(sdpa)(q, k, v))
        got = np.asarray(
            jax.jit(lambda a, b2, c: ring_sdpa(a, b2, c, mesh=mesh))(q, k, v)
        )
        np.testing.assert_allclose(got, expected, atol=2e-5)


    def test_flash_gate_refuses_explicitly_sharded_operands(self, monkeypatch):
        """Explicit-sharding (sharding-in-types) mode: operands whose type
        carries a non-ring sharded axis (heads over 'model', no model_axis
        named) must NOT select the Pallas inner — a Pallas call has no
        partition rule for the sharded axis (regression for the r3 removal
        of the sharded-operand guard)."""
        import ltx2_tpu.ops.attention as oa
        import ltx2_tpu.parallel.ring_attention as ra

        monkeypatch.setattr(oa, "_flash_backend_ok", lambda: True)

        mesh = jax.make_mesh(
            (2, 4), ("model", "seq"),
            axis_types=(jax.sharding.AxisType.Explicit,) * 2,
        )
        # Shapes MEET the flash tiling constraints (t 4096 % 512, d 128)
        # so only the sharded-operand guard can keep flash off.
        q = jnp.zeros((1, 2, 4096, 128))
        k = jnp.zeros((1, 2, 4096, 128))
        gates = {}

        def probe(x, y):
            gates["sharded"] = ra._flash_inner_ok(x, y, model_axis=None)
            return x

        with jax.sharding.set_mesh(mesh):
            qs = jax.device_put(
                q, jax.sharding.PartitionSpec(None, "model", None, None)
            )
            ks = jax.device_put(
                k, jax.sharding.PartitionSpec(None, "model", None, None)
            )
            jax.jit(probe)(qs, ks)
            assert gates["sharded"] is False

            # Fully replicated operands at the same shapes pass the gate —
            # the refusal above is the sharding, not the shapes.
            jax.jit(probe)(q, k)
            assert gates["sharded"] is True


def _dense_sdpa_ref(q, k, v, scale=None):
    if scale is None:
        scale = q.shape[-1] ** -0.5
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * scale
    w = jax.nn.softmax(s, -1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", w, v)


class TestFlashShardedDispatch:
    """The Pallas flash kernel has no GSPMD partition rule; these tests
    assert the dispatch layer shard-maps it over the 'model' axis so TP /
    SP x TP meshes run the kernel on LOCAL heads instead of falling back.

    The kernel itself needs the TPU mosaic backend, so CPU tests swap in a
    math-equivalent stand-in behind the same dispatch seams and assert
    (a) ENGAGEMENT of the sharded path, (b) numerical equality with the
    unsharded reference, (c) differentiability through the shard_map."""

    def _patch_flash(self, monkeypatch, calls):
        import ltx2_tpu.ops.attention as oa

        monkeypatch.setattr(oa, "_flash_backend_ok", lambda: True)
        monkeypatch.setattr(oa, "FLASH_MIN_TOKENS", 128)

        def fake_factory(bq, bkv):
            def run(q, k, v, scale):
                calls.append(("flash", q.shape))
                return _dense_sdpa_ref(q, k, v, scale)

            return run

        monkeypatch.setattr(oa, "_flash_attention", fake_factory)
        oa.FLASH_ENGAGEMENTS.clear()
        return oa

    def test_tp_only_engages_sharded_flash(self, monkeypatch):
        """TP-only GSPMD jit + ambient mesh: flash runs head-sharded."""
        calls = []
        oa = self._patch_flash(monkeypatch, calls)

        mesh = create_mesh(data=2, model=4)
        b, h, t, d = 2, 8, 256, 128
        key = jax.random.PRNGKey(0)
        q, k, v = (
            jax.random.normal(kk, (b, h, t, d), jnp.float32)
            for kk in jax.random.split(key, 3)
        )
        expected = np.asarray(_dense_sdpa_ref(q, k, v))

        sh = NamedSharding(mesh, P(None, "model", None, None))
        qs, ks, vs = (jax.device_put(x, sh) for x in (q, k, v))
        with jax.sharding.set_mesh(mesh):
            out = jax.jit(oa.sdpa)(qs, ks, vs)
            np.testing.assert_allclose(np.asarray(out), expected, atol=2e-5)
            assert oa.FLASH_ENGAGEMENTS.get("flash_tp", 0) >= 1, (
                "sharded flash dispatch not engaged under TP mesh"
            )
            # Per-shard shapes: batch over 'data' (2/2), heads over
            # 'model' (8/4), tokens whole.
            assert calls and calls[0][1] == (b // 2, h // 4, t, d)

            # Differentiable: grads flow through the shard_map wrapper.
            g = jax.jit(
                jax.grad(lambda q_: jnp.sum(oa.sdpa(q_, ks, vs) ** 2))
            )(qs)
            ge = jax.grad(lambda q_: jnp.sum(_dense_sdpa_ref(q_, k, v) ** 2))(q)
            np.testing.assert_allclose(np.asarray(g), np.asarray(ge), atol=2e-4)

    def test_tp_only_masked_flash_sharded(self, monkeypatch):
        """Key-padding masked flash (segment-id path) also shards."""
        calls = []
        import ltx2_tpu.ops.attention as oa

        monkeypatch.setattr(oa, "_flash_backend_ok", lambda: True)
        monkeypatch.setattr(oa, "FLASH_MIN_TOKENS", 128)

        def fake_masked_factory(bq, bkv):
            def run(q, k, v, scale, kv_valid):
                calls.append(q.shape)
                mask = jnp.where(kv_valid, 0.0, -1e30)[:, None, None, :]
                s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
                s = s * scale + mask
                w = jax.nn.softmax(s, -1).astype(q.dtype)
                return jnp.einsum("bhqk,bhkd->bhqd", w, v)

            return run

        monkeypatch.setattr(oa, "_flash_attention_masked", fake_masked_factory)
        oa.FLASH_ENGAGEMENTS.clear()

        mesh = create_mesh(data=2, model=4)
        b, h, t, d = 2, 8, 256, 128
        key = jax.random.PRNGKey(1)
        q, k, v = (
            jax.random.normal(kk, (b, h, t, d), jnp.float32)
            for kk in jax.random.split(key, 3)
        )
        neg = -0.7 * np.finfo(np.float32).max
        mask = jnp.where(jnp.arange(t) < t - 32, 0.0, neg)[None, None, None, :]
        mask = jnp.broadcast_to(mask, (b, 1, 1, t))
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
        s = s * (d**-0.5) + mask.astype(jnp.float32)
        w = jax.nn.softmax(s, -1).astype(q.dtype)
        expected = np.asarray(jnp.einsum("bhqk,bhkd->bhqd", w, v))
        calls.clear()

        sh = NamedSharding(mesh, P(None, "model", None, None))
        qs, ks, vs = (jax.device_put(x, sh) for x in (q, k, v))
        with jax.sharding.set_mesh(mesh):
            out = jax.jit(lambda a, b_, c: oa.sdpa(a, b_, c, mask=mask))(qs, ks, vs)
        np.testing.assert_allclose(np.asarray(out), expected, atol=2e-5)
        assert oa.FLASH_ENGAGEMENTS.get("flash_masked_tp", 0) >= 1
        assert calls and calls[0] == (b // 2, h // 4, t, d)

    def test_ring_inner_flash_under_sp_tp(self, monkeypatch):
        """SP x TP: the ring attention inner drops into a nested shard_map
        over the auto 'model' axis and runs the (stand-in) kernel on local
        heads — it must NOT fall back to dense."""
        import ltx2_tpu.ops.attention as oa
        import ltx2_tpu.parallel.ring_attention as ra

        monkeypatch.setattr(oa, "_flash_backend_ok", lambda: True)
        monkeypatch.setattr(ra, "RING_FLASH_BLOCK_Q", 64)
        monkeypatch.setattr(ra, "RING_FLASH_BLOCK_KV", 64)
        shapes = []

        def fake_impl(q, k_blk, v_blk, scale):
            shapes.append(q.shape)
            o, l, m = ra._dense_block_residuals(q, k_blk, v_blk, scale)
            return o, l, m

        monkeypatch.setattr(ra, "_flash_impl_residuals", fake_impl)
        ra.RING_ENGAGEMENTS.clear()

        mesh = create_mesh(data=2, model=2, seq=2)
        b, h, t, d = 2, 4, 256, 128
        key = jax.random.PRNGKey(2)
        q, k, v = (
            jax.random.normal(kk, (b, h, t, d), jnp.float32)
            for kk in jax.random.split(key, 3)
        )
        expected = np.asarray(_dense_sdpa_ref(q, k, v))

        def body(q_, k_, v_):
            return ra.ring_attention_local(
                q_, k_, v_, axis_name="seq", model_axis="model"
            )

        fn = jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(P(None, None, "seq", None),) * 3,
            out_specs=P(None, None, "seq", None),
            axis_names=frozenset({"data", "seq"}),
        )
        sh = NamedSharding(mesh, P(None, "model", "seq", None))
        qs, ks, vs = (jax.device_put(x, sh) for x in (q, k, v))
        out = jax.jit(fn)(qs, ks, vs)
        np.testing.assert_allclose(np.asarray(out), expected, atol=2e-5)
        assert ra.RING_ENGAGEMENTS.get("ring_flash_tp", 0) >= 1, (
            "ring inner fell back to dense under SP x TP"
        )
        # Per-shard: heads local (4/2=2), tokens local (256/2=128).
        assert shapes and shapes[0] == (b, h // 2, t // 2, d)

    def test_ring_inner_flash_sp_only_unchanged(self, monkeypatch):
        """SP-only: heads unsharded -> the kernel is called directly
        (no nested shard_map), as before."""
        import ltx2_tpu.ops.attention as oa
        import ltx2_tpu.parallel.ring_attention as ra

        monkeypatch.setattr(oa, "_flash_backend_ok", lambda: True)
        monkeypatch.setattr(ra, "RING_FLASH_BLOCK_Q", 64)
        monkeypatch.setattr(ra, "RING_FLASH_BLOCK_KV", 64)
        monkeypatch.setattr(
            ra, "_flash_impl_residuals",
            lambda q, k_, v_, s: ra._dense_block_residuals(q, k_, v_, s),
        )
        ra.RING_ENGAGEMENTS.clear()

        mesh = create_mesh(data=1, model=1, seq=8)
        b, h, t, d = 1, 2, 512, 128
        key = jax.random.PRNGKey(3)
        q, k, v = (
            jax.random.normal(kk, (b, h, t, d), jnp.float32)
            for kk in jax.random.split(key, 3)
        )
        expected = np.asarray(_dense_sdpa_ref(q, k, v))
        got = ra.ring_sdpa(q, k, v, mesh=mesh, inner="auto")
        np.testing.assert_allclose(np.asarray(got), expected, atol=2e-5)
        assert ra.RING_ENGAGEMENTS.get("ring_flash", 0) >= 1


class TestSequenceParallel:
    """Full DiT forward with tokens sharded over the seq axis must match the
    unsharded forward (ring self-attn + replicated-context cross-attn)."""

    def test_video_forward_matches(self):
        from ltx2_tpu.models.transformer.model import x0_model_apply
        from ltx2_tpu.parallel.sequence_parallel import make_sequence_parallel_forward

        cfg = tiny_config()
        params = cached_params(cfg)
        # 2*4*4 = 32 tokens over 8 seq shards -> 4 tokens per device.
        video = make_video_modality(cfg, batch=2, frames=2, height=4, width=4)

        expected = np.asarray(
            jax.jit(lambda p, v: x0_model_apply(p, cfg, video=v))(params, video)
        )
        mesh = create_mesh(data=1, model=1, seq=8)
        sp = make_sequence_parallel_forward(mesh, cfg)
        got = np.asarray(sp(params, video))
        np.testing.assert_allclose(got, expected, atol=2e-4)

    def test_av_forward_matches(self):
        from ltx2_tpu.models.transformer.model import LTXModelType, x0_model_apply
        from ltx2_tpu.parallel.sequence_parallel import make_sequence_parallel_forward
        from tests.test_dit import make_audio_modality

        cfg = tiny_config(model_type=LTXModelType.AudioVideo)
        params = cached_params(cfg)
        video = make_video_modality(cfg, batch=1, frames=2, height=2, width=4)  # 16 tok
        audio = make_audio_modality(cfg, batch=1, frames=8)  # 8 tok -> 2/device

        v_ref, a_ref = jax.jit(
            lambda p, v, a: x0_model_apply(p, cfg, video=v, audio=a)
        )(params, video, audio)
        mesh = create_mesh(data=1, model=1, seq=4, devices=jax.devices()[:4])
        sp = make_sequence_parallel_forward(mesh, cfg)
        v_got, a_got = sp(params, video, audio)
        np.testing.assert_allclose(np.asarray(v_got), np.asarray(v_ref), atol=2e-4)
        np.testing.assert_allclose(np.asarray(a_got), np.asarray(a_ref), atol=2e-4)


class TestRuntime:
    def test_axis_layout(self):
        from ltx2_tpu.parallel.runtime import axis_layout

        assert axis_layout(8, data=2, seq=2) == (2, 2, 2)
        assert axis_layout(8, data=1, seq=1, model=8) == (1, 1, 8)
        with pytest.raises(ValueError):
            axis_layout(8, data=3)
        with pytest.raises(ValueError):
            axis_layout(8, data=2, seq=2, model=3)

    def test_hybrid_mesh_single_slice(self):
        from ltx2_tpu.parallel.runtime import create_hybrid_mesh

        mesh = create_hybrid_mesh(data=2, seq=2, model=2)
        assert mesh.axis_names == ("data", "seq", "model")
        assert mesh.devices.shape == (2, 2, 2)

    def test_sequence_parallel_on_hybrid_mesh(self):
        """The seq-parallel forward runs on a runtime-built mesh."""
        from ltx2_tpu.models.transformer.model import x0_model_apply
        from ltx2_tpu.parallel.runtime import create_hybrid_mesh
        from ltx2_tpu.parallel.sequence_parallel import make_sequence_parallel_forward

        cfg = tiny_config()
        params = cached_params(cfg)
        video = make_video_modality(cfg, batch=1, frames=2, height=2, width=4)  # 16 tok
        mesh = create_hybrid_mesh(data=1, seq=8, model=1)
        expected = np.asarray(
            jax.jit(lambda p, v: x0_model_apply(p, cfg, video=v))(params, video)
        )
        got = np.asarray(make_sequence_parallel_forward(mesh, cfg)(params, video))
        np.testing.assert_allclose(got, expected, atol=2e-4)


class TestSequenceParallelDenoiseLoop:
    """Round-2: sequence parallelism wired INTO the scanned denoise loop —
    a full generation runs token-sharded end-to-end, not just one forward."""

    def _setup(self, cfg, frames=2, height=2, width=4):
        from ltx2_tpu.components import GaussianNoiser, VideoLatentPatchifier
        from ltx2_tpu.conditioning.tools import VideoLatentTools
        from ltx2_tpu.types import VideoLatentShape

        shape = VideoLatentShape(
            batch=1, channels=cfg.in_channels, frames=frames, height=height, width=width
        )
        tools = VideoLatentTools(
            patchifier=VideoLatentPatchifier(1), target_shape=shape, fps=24.0
        )
        state = GaussianNoiser()(
            jax.random.PRNGKey(0), tools.create_initial_state(), 1.0
        )
        sigmas = jnp.asarray([1.0, 0.6, 0.2, 0.0])
        ctx = jax.random.normal(
            jax.random.PRNGKey(1),
            (1, 5, tiny_config().caption_channels or cfg.cross_attention_dim),
        )
        return state, sigmas, ctx

    def test_video_loop_matches_unsharded(self):
        from ltx2_tpu.components import CFGGuider
        from ltx2_tpu.pipelines.denoise import DenoiseLoopConfig, make_video_denoise_loop

        cfg = tiny_config()
        params = cached_params(cfg)
        state, sigmas, ctx = self._setup(cfg)  # 16 tokens / 8 shards

        loop_cfg = DenoiseLoopConfig(guider=CFGGuider(3.0))
        expected = np.asarray(
            make_video_denoise_loop(cfg, loop_cfg)(params, state, sigmas, ctx, ctx).latent
        )
        mesh = create_mesh(data=1, model=1, seq=8)
        sp_loop = make_video_denoise_loop(cfg, loop_cfg, mesh=mesh)
        got = np.asarray(sp_loop(params, state, sigmas, ctx, ctx).latent)
        np.testing.assert_allclose(got, expected, atol=5e-4)

    def test_video_loop_sp_with_stg_heun(self):
        """STG perturbation rows + Heun's second forward, token-sharded."""
        from ltx2_tpu.components import CFGGuider
        from ltx2_tpu.pipelines.denoise import DenoiseLoopConfig, make_video_denoise_loop

        cfg = tiny_config()
        params = cached_params(cfg)
        state, sigmas, ctx = self._setup(cfg)

        loop_cfg = DenoiseLoopConfig(
            guider=CFGGuider(3.0), stg_scale=1.0, sampler="heun"
        )
        expected = np.asarray(
            make_video_denoise_loop(cfg, loop_cfg)(params, state, sigmas, ctx, ctx).latent
        )
        mesh = create_mesh(data=1, model=1, seq=4, devices=jax.devices()[:4])
        got = np.asarray(
            make_video_denoise_loop(cfg, loop_cfg, mesh=mesh)(
                params, state, sigmas, ctx, ctx
            ).latent
        )
        np.testing.assert_allclose(got, expected, atol=5e-4)

    def test_av_loop_matches_unsharded(self):
        from ltx2_tpu.components import AudioPatchifier, CFGGuider, GaussianNoiser
        from ltx2_tpu.conditioning.tools import AudioLatentTools
        from ltx2_tpu.models.transformer.model import LTXModelType
        from ltx2_tpu.pipelines.denoise import DenoiseLoopConfig, make_av_denoise_loop
        from ltx2_tpu.types import AudioLatentShape

        cfg = tiny_config(model_type=LTXModelType.AudioVideo)
        params = cached_params(cfg)
        v_state, sigmas, ctx = self._setup(cfg)

        a_shape = AudioLatentShape(batch=1, channels=cfg.audio_in_channels // 1, frames=8, mel_bins=1)
        a_tools = AudioLatentTools(patchifier=AudioPatchifier(1), target_shape=a_shape)
        a_state = GaussianNoiser()(
            jax.random.PRNGKey(3), a_tools.create_initial_state(), 1.0
        )
        a_ctx = jax.random.normal(
            jax.random.PRNGKey(4), (1, 5, cfg.caption_channels or cfg.audio_inner_dim)
        )

        loop_cfg = DenoiseLoopConfig(guider=CFGGuider(2.0), audio_guider=CFGGuider(2.0))
        ref_v, ref_a = make_av_denoise_loop(cfg, loop_cfg)(
            params, v_state, a_state, sigmas, ctx, ctx, a_ctx, a_ctx
        )
        mesh = create_mesh(data=1, model=1, seq=4, devices=jax.devices()[:4])
        got_v, got_a = make_av_denoise_loop(cfg, loop_cfg, mesh=mesh)(
            params, v_state, a_state, sigmas, ctx, ctx, a_ctx, a_ctx
        )
        np.testing.assert_allclose(
            np.asarray(got_v.latent), np.asarray(ref_v.latent), atol=5e-4
        )
        np.testing.assert_allclose(
            np.asarray(got_a.latent), np.asarray(ref_a.latent), atol=5e-4
        )

    def test_indivisible_tokens_rejected(self):
        from ltx2_tpu.components import CFGGuider
        from ltx2_tpu.pipelines.denoise import DenoiseLoopConfig, make_video_denoise_loop

        cfg = tiny_config()
        params = cached_params(cfg)
        state, sigmas, ctx = self._setup(cfg, frames=1, height=3, width=3)  # 9 tokens
        mesh = create_mesh(data=1, model=1, seq=8)
        loop = make_video_denoise_loop(
            cfg, DenoiseLoopConfig(guider=CFGGuider(2.0)), mesh=mesh
        )
        with pytest.raises(ValueError, match="divisible"):
            loop(params, state, sigmas, ctx, ctx)

    def test_multimodal_loop_matches_unsharded(self):
        from ltx2_tpu.components import AudioPatchifier, GaussianNoiser
        from ltx2_tpu.conditioning.tools import AudioLatentTools
        from ltx2_tpu.models.transformer.model import LTXModelType
        from ltx2_tpu.pipelines.denoise import (
            MultiModalLoopConfig,
            make_multimodal_av_denoise_loop,
        )
        from ltx2_tpu.types import AudioLatentShape

        cfg = tiny_config(model_type=LTXModelType.AudioVideo)
        params = cached_params(cfg)
        v_state, sigmas, ctx = self._setup(cfg)
        a_shape = AudioLatentShape(batch=1, channels=cfg.audio_in_channels, frames=8, mel_bins=1)
        a_tools = AudioLatentTools(patchifier=AudioPatchifier(1), target_shape=a_shape)
        a_state = GaussianNoiser()(jax.random.PRNGKey(3), a_tools.create_initial_state(), 1.0)
        a_ctx = jax.random.normal(
            jax.random.PRNGKey(4), (1, 5, cfg.caption_channels or cfg.audio_inner_dim)
        )

        mm = MultiModalLoopConfig(video_cfg_scale=3.0, audio_cfg_scale=5.0, modality_scale=2.0)
        ref_v, ref_a = make_multimodal_av_denoise_loop(cfg, mm)(
            params, v_state, a_state, sigmas, ctx, ctx, a_ctx, a_ctx
        )
        mesh = create_mesh(data=1, model=1, seq=4, devices=jax.devices()[:4])
        got_v, got_a = make_multimodal_av_denoise_loop(cfg, mm, mesh=mesh)(
            params, v_state, a_state, sigmas, ctx, ctx, a_ctx, a_ctx
        )
        np.testing.assert_allclose(np.asarray(got_v.latent), np.asarray(ref_v.latent), atol=5e-4)
        np.testing.assert_allclose(np.asarray(got_a.latent), np.asarray(ref_a.latent), atol=5e-4)


class TestGemmaTP:
    """Gemma-3 TP: QKV/MLP sharded over 'model', equality vs unsharded."""

    def test_rules(self):
        from ltx2_tpu.parallel.sharding import gemma_spec_for_path

        assert gemma_spec_for_path("layers/self_attn/q_proj/weight") == P(None, "model", None)
        assert gemma_spec_for_path("layers/self_attn/o_proj/weight") == P(None, None, "model")
        assert gemma_spec_for_path("layers/mlp/down_proj/weight") == P(None, None, "model")
        # per-head norms + embeddings + layernorms replicate
        assert gemma_spec_for_path("layers/self_attn/q_norm/weight") == P()
        assert gemma_spec_for_path("embed_tokens/weight") == P()
        assert gemma_spec_for_path("layers/input_layernorm/weight") == P()

    def test_sharded_forward_matches(self):
        from ltx2_tpu.models.text_encoder.gemma3 import (
            Gemma3Config,
            gemma3_apply,
            init_gemma3,
        )
        from ltx2_tpu.parallel.sharding import gemma_param_shardings, shard_gemma_params

        cfg = Gemma3Config.tiny()  # 4 q heads / 2 kv heads
        params = init_gemma3(jax.random.PRNGKey(0), cfg)
        ids = jnp.asarray(np.arange(16)[None] % cfg.vocab_size)
        mask = jnp.ones((1, 16), jnp.int32)

        fn = jax.jit(lambda p: gemma3_apply(p, cfg, ids, mask)[1])
        expected = np.asarray(fn(params))

        mesh = create_mesh(data=1, model=2, devices=jax.devices()[:2])
        sharded = shard_gemma_params(mesh, params)
        # params actually sharded: q_proj out-features split over 2 devices
        q = sharded["layers"]["self_attn"]["q_proj"]["weight"]
        assert len({d for shard in q.addressable_shards for d in [shard.device]}) == 2
        assert q.addressable_shards[0].data.shape[1] == q.shape[1] // 2

        got = np.asarray(fn(sharded))
        np.testing.assert_allclose(got, expected, atol=2e-5)

    def test_full_attention_and_padding_sharded(self):
        """Sliding/full layer mix + padding mask still correct under TP."""
        from ltx2_tpu.models.text_encoder.gemma3 import (
            Gemma3Config,
            gemma3_apply,
            init_gemma3,
        )
        from ltx2_tpu.parallel.sharding import shard_gemma_params

        cfg = Gemma3Config.tiny()
        params = init_gemma3(jax.random.PRNGKey(1), cfg)
        ids = jnp.asarray(np.arange(12)[None] % cfg.vocab_size)
        mask = jnp.asarray(np.array([[1] * 9 + [0] * 3]))

        expected = np.asarray(
            jax.jit(lambda p: gemma3_apply(p, cfg, ids, mask)[0])(params)
        )
        mesh = create_mesh(data=1, model=2, devices=jax.devices()[:2])
        got = np.asarray(
            jax.jit(lambda p: gemma3_apply(p, cfg, ids, mask)[0])(
                shard_gemma_params(mesh, params)
            )
        )
        np.testing.assert_allclose(got, expected, atol=2e-5)


class TestPipelineParallel:
    """Round-2: GPipe pipeline parallelism over the block stack — the
    stacked (L, ...) param layout shards along the layer axis over 'pipe',
    activations rotate stage-to-stage via ppermute."""

    def test_video_forward_matches(self):
        from ltx2_tpu.parallel.pipeline_parallel import make_pipeline_parallel_forward

        cfg = tiny_config(num_layers=4)
        params = cached_params(cfg)
        video = make_video_modality(cfg)  # batch 2 -> 2 microbatches
        expected = np.asarray(jitted_forward(cfg)(params, video))

        mesh = create_mesh(data=1, model=1, pipe=4, devices=jax.devices()[:4])
        pp = make_pipeline_parallel_forward(mesh, cfg, num_microbatches=2, x0=False)
        got = np.asarray(pp(params, video))
        np.testing.assert_allclose(got, expected, atol=5e-5)

    def test_av_forward_matches_with_stg(self):
        from ltx2_tpu.components.perturbations import create_stg_perturbation
        from ltx2_tpu.components.perturbations import (
            BatchedPerturbationConfig,
            PerturbationConfig,
        )
        from ltx2_tpu.models.transformer.model import LTXModelType
        from ltx2_tpu.parallel.pipeline_parallel import make_pipeline_parallel_forward
        from tests.test_dit import make_audio_modality

        cfg = tiny_config(model_type=LTXModelType.AudioVideo, num_layers=4)
        params = cached_params(cfg)
        video = make_video_modality(cfg)
        audio = make_audio_modality(cfg)
        # Per-sample perturbation: row 1 skips self-attn in block 1.
        pert = BatchedPerturbationConfig(
            perturbations=(
                PerturbationConfig.empty(),
                create_stg_perturbation(skip_video_self_attn=True, blocks=[1]),
            )
        )
        expected_v, expected_a = jitted_forward(cfg, perturbations=pert)(
            params, video, audio
        )

        mesh = create_mesh(data=1, model=1, pipe=4, devices=jax.devices()[:4])
        pp = make_pipeline_parallel_forward(
            mesh, cfg, num_microbatches=2, x0=False, perturbations=pert
        )
        got_v, got_a = pp(params, video, audio)
        np.testing.assert_allclose(np.asarray(got_v), np.asarray(expected_v), atol=5e-5)
        np.testing.assert_allclose(np.asarray(got_a), np.asarray(expected_a), atol=5e-5)

    def test_x0_matches(self):
        from ltx2_tpu.parallel.pipeline_parallel import make_pipeline_parallel_forward

        cfg = tiny_config(num_layers=4)
        params = cached_params(cfg)
        video = make_video_modality(cfg)
        expected = np.asarray(jitted_forward(cfg, x0=True)(params, video))

        mesh = create_mesh(data=1, model=1, pipe=2, devices=jax.devices()[:2])
        pp = make_pipeline_parallel_forward(mesh, cfg, num_microbatches=2, x0=True)
        got = np.asarray(pp(params, video))
        np.testing.assert_allclose(got, expected, atol=5e-5)

    def test_params_actually_sharded(self):
        from ltx2_tpu.parallel.pipeline_parallel import shard_pipeline_params

        cfg = tiny_config(num_layers=8)
        params = cached_params(cfg)
        mesh = create_mesh(data=1, model=1, pipe=8)
        sharded = shard_pipeline_params(mesh, params)
        q = sharded["transformer_blocks"]["attn1"]["to_q"]["weight"]
        # 8 layers over 8 stages: one block per device.
        assert q.addressable_shards[0].data.shape[0] == 1
        assert len(q.addressable_shards) == 8

    def test_bad_divisibility_rejected(self):
        from ltx2_tpu.parallel.pipeline_parallel import make_pipeline_parallel_forward

        cfg = tiny_config(num_layers=3)
        params = cached_params(cfg)
        video = make_video_modality(cfg)
        mesh = create_mesh(data=1, model=1, pipe=2, devices=jax.devices()[:2])
        with pytest.raises(ValueError, match="divide"):
            make_pipeline_parallel_forward(mesh, cfg, num_microbatches=2)(params, video)


class TestPipelineParallelDenoiseLoop:
    """Pipeline parallelism wired INTO the scanned denoise loop — guidance
    rows become the GPipe microbatches."""

    def _setup(self, cfg):
        from ltx2_tpu.components import GaussianNoiser, VideoLatentPatchifier
        from ltx2_tpu.conditioning.tools import VideoLatentTools
        from ltx2_tpu.types import VideoLatentShape

        shape = VideoLatentShape(
            batch=1, channels=cfg.in_channels, frames=2, height=2, width=3
        )
        tools = VideoLatentTools(
            patchifier=VideoLatentPatchifier(1), target_shape=shape, fps=24.0
        )
        state = GaussianNoiser()(
            jax.random.PRNGKey(0), tools.create_initial_state(), 1.0
        )
        sigmas = jnp.asarray([1.0, 0.6, 0.2, 0.0])
        ctx = jax.random.normal(
            jax.random.PRNGKey(1), (1, 5, cfg.caption_channels)
        )
        return state, sigmas, ctx

    def test_video_loop_matches_unsharded(self):
        from ltx2_tpu.components import CFGGuider
        from ltx2_tpu.pipelines.denoise import DenoiseLoopConfig, make_video_denoise_loop

        cfg = tiny_config(num_layers=4)
        params = cached_params(cfg)
        state, sigmas, ctx = self._setup(cfg)

        loop_cfg = DenoiseLoopConfig(guider=CFGGuider(3.0))  # 2 rows -> M=2
        expected = np.asarray(
            make_video_denoise_loop(cfg, loop_cfg)(params, state, sigmas, ctx, ctx).latent
        )
        mesh = create_mesh(data=1, model=1, pipe=4, devices=jax.devices()[:4])
        pp_loop = make_video_denoise_loop(cfg, loop_cfg, mesh=mesh, pipeline_axis="pipe")
        got = np.asarray(pp_loop(params, state, sigmas, ctx, ctx).latent)
        np.testing.assert_allclose(got, expected, atol=5e-4)

    def test_video_loop_pp_with_stg(self):
        """STG adds a third row (3 microbatches) with per-row perturbations."""
        from ltx2_tpu.components import CFGGuider
        from ltx2_tpu.pipelines.denoise import DenoiseLoopConfig, make_video_denoise_loop

        cfg = tiny_config(num_layers=2)
        params = cached_params(cfg)
        state, sigmas, ctx = self._setup(cfg)

        loop_cfg = DenoiseLoopConfig(guider=CFGGuider(3.0), stg_scale=1.0)
        expected = np.asarray(
            make_video_denoise_loop(cfg, loop_cfg)(params, state, sigmas, ctx, ctx).latent
        )
        mesh = create_mesh(data=1, model=1, pipe=2, devices=jax.devices()[:2])
        pp_loop = make_video_denoise_loop(cfg, loop_cfg, mesh=mesh, pipeline_axis="pipe")
        got = np.asarray(pp_loop(params, state, sigmas, ctx, ctx).latent)
        np.testing.assert_allclose(got, expected, atol=5e-4)

    def test_av_loop_matches_unsharded(self):
        from ltx2_tpu.components import AudioPatchifier, CFGGuider, GaussianNoiser
        from ltx2_tpu.conditioning.tools import AudioLatentTools
        from ltx2_tpu.models.transformer.model import LTXModelType
        from ltx2_tpu.pipelines.denoise import DenoiseLoopConfig, make_av_denoise_loop
        from ltx2_tpu.types import AudioLatentShape

        cfg = tiny_config(model_type=LTXModelType.AudioVideo, num_layers=4)
        params = cached_params(cfg)
        v_state, sigmas, ctx = self._setup(cfg)
        a_shape = AudioLatentShape(
            batch=1, channels=cfg.audio_in_channels, frames=8, mel_bins=1
        )
        a_tools = AudioLatentTools(patchifier=AudioPatchifier(1), target_shape=a_shape)
        a_state = GaussianNoiser()(
            jax.random.PRNGKey(3), a_tools.create_initial_state(), 1.0
        )
        a_ctx = jax.random.normal(
            jax.random.PRNGKey(4), (1, 5, cfg.caption_channels or cfg.audio_inner_dim)
        )

        loop_cfg = DenoiseLoopConfig(guider=CFGGuider(2.0), audio_guider=CFGGuider(2.0))
        args = (params, v_state, a_state, sigmas, ctx, ctx, a_ctx, a_ctx)
        ev, ea = make_av_denoise_loop(cfg, loop_cfg)(*args)
        mesh = create_mesh(data=1, model=1, pipe=4, devices=jax.devices()[:4])
        gv, ga = make_av_denoise_loop(cfg, loop_cfg, mesh=mesh, pipeline_axis="pipe")(*args)
        np.testing.assert_allclose(np.asarray(gv.latent), np.asarray(ev.latent), atol=5e-4)
        np.testing.assert_allclose(np.asarray(ga.latent), np.asarray(ea.latent), atol=5e-4)


class TestShardedLoading:
    """Checkpoint leaves stream DIRECTLY onto their mesh shards via the
    loader's device_put hook — no single-chip staging of the full tree
    (the point of PP/TP when the model outgrows one device's HBM)."""

    def _write_ckpt(self, tmp_path, num_layers=4):
        from tests.helpers import params_to_checkpoint
        from ltx2_tpu.loader.safetensors_io import write_safetensors

        cfg = tiny_config(num_layers=num_layers)
        params = cached_params(cfg)
        path = str(tmp_path / "m.safetensors")
        write_safetensors(path, params_to_checkpoint(params))
        return cfg, params, path

    def test_pipeline_sharded_load(self, tmp_path):
        from ltx2_tpu.loader.weight_loader import load_transformer_params
        from ltx2_tpu.parallel.pipeline_parallel import pipeline_device_put

        cfg, params, path = self._write_ckpt(tmp_path)
        mesh = create_mesh(data=1, model=1, pipe=4, devices=jax.devices()[:4])
        loaded = load_transformer_params(
            path, target_dtype="float32", num_layers=cfg.num_layers,
            device_put=pipeline_device_put(mesh),
        )
        q = loaded["transformer_blocks"]["attn1"]["to_q"]["weight"]
        # 4 layers over 4 stages: each shard holds exactly one block.
        assert q.addressable_shards[0].data.shape[0] == 1
        assert len(q.addressable_shards) == 4
        # Values identical to the unsharded tree.
        np.testing.assert_allclose(
            np.asarray(q), np.asarray(params["transformer_blocks"]["attn1"]["to_q"]["weight"]),
            atol=1e-6,
        )
        # Non-block leaves replicate.
        top = loaded["proj_out"]["weight"]
        assert top.sharding.is_fully_replicated

    def test_pp_tp_composed_sharded_load(self, tmp_path):
        """PP x TP: checkpoint leaves land layer-sharded over 'pipe' AND
        feature-sharded over 'model' as they stream in (~1/(P*T) per chip)."""
        from ltx2_tpu.loader.weight_loader import load_transformer_params
        from ltx2_tpu.parallel.pipeline_parallel import pipeline_device_put

        cfg, params, path = self._write_ckpt(tmp_path)
        mesh = create_mesh(data=1, model=2, pipe=2, devices=jax.devices()[:4])
        loaded = load_transformer_params(
            path, target_dtype="float32", num_layers=cfg.num_layers,
            device_put=pipeline_device_put(mesh, model_axis="model"),
        )
        q = loaded["transformer_blocks"]["attn1"]["to_q"]["weight"]
        assert q.sharding.spec == P("pipe", "model", None)
        shard = q.addressable_shards[0].data.shape
        assert shard[0] == q.shape[0] // 2 and shard[1] == q.shape[1] // 2
        np.testing.assert_allclose(
            np.asarray(q),
            np.asarray(params["transformer_blocks"]["attn1"]["to_q"]["weight"]),
            atol=1e-6,
        )
        out = loaded["transformer_blocks"]["attn1"]["to_out"]["weight"]
        assert out.sharding.spec == P("pipe", None, "model")

    def test_tp_sharded_load_and_forward(self, tmp_path):
        from ltx2_tpu.loader.weight_loader import load_transformer_params
        from ltx2_tpu.parallel.sharding import tp_device_put

        cfg, params, path = self._write_ckpt(tmp_path)
        mesh = create_mesh(data=1, model=2, devices=jax.devices()[:2])
        loaded = load_transformer_params(
            path, target_dtype="float32", num_layers=cfg.num_layers,
            device_put=tp_device_put(mesh),
        )
        q = loaded["transformer_blocks"]["attn1"]["to_q"]["weight"]
        # Column-parallel: out-features (dim 1 of the stacked leaf) split.
        assert q.addressable_shards[0].data.shape[1] == q.shape[1] // 2
        # The sharded load must compute the same forward as the host tree.
        video = make_video_modality(cfg)
        expected = np.asarray(jitted_forward(cfg)(params, video))
        got = np.asarray(jitted_forward(cfg)(loaded, video))
        np.testing.assert_allclose(got, expected, atol=2e-5)


class TestPipelineDataComposition:
    """PP x DP: batch rows shard over 'data' while the block stack stages
    over 'pipe' — perturbation masks address each shard's global row range."""

    def test_forward_matches(self):
        from ltx2_tpu.parallel.pipeline_parallel import make_pipeline_parallel_forward

        cfg = tiny_config(num_layers=4)
        params = cached_params(cfg)
        video = make_video_modality(cfg, batch=4)
        expected = np.asarray(jitted_forward(cfg)(params, video))

        mesh = create_mesh(data=2, model=1, pipe=2, devices=jax.devices()[:4])
        pp = make_pipeline_parallel_forward(
            mesh, cfg, num_microbatches=2, x0=False, data_axis="data"
        )
        got = np.asarray(pp(params, video))
        np.testing.assert_allclose(got, expected, atol=5e-5)

    def test_forward_with_per_row_perturbations(self):
        """Row 3 (on data shard 1) skips self-attn — the mask slice must
        address GLOBAL rows, not local ones."""
        from ltx2_tpu.components.perturbations import (
            BatchedPerturbationConfig,
            PerturbationConfig,
            create_stg_perturbation,
        )
        from ltx2_tpu.parallel.pipeline_parallel import make_pipeline_parallel_forward

        cfg = tiny_config(num_layers=2)
        params = cached_params(cfg)
        video = make_video_modality(cfg, batch=4)
        pert = BatchedPerturbationConfig(
            perturbations=(
                PerturbationConfig.empty(),
                PerturbationConfig.empty(),
                PerturbationConfig.empty(),
                create_stg_perturbation(skip_video_self_attn=True, blocks=[1]),
            )
        )
        expected = np.asarray(
            jitted_forward(cfg, perturbations=pert)(params, video)
        )
        mesh = create_mesh(data=2, model=1, pipe=2, devices=jax.devices()[:4])
        pp = make_pipeline_parallel_forward(
            mesh, cfg, num_microbatches=2, x0=False,
            perturbations=pert, data_axis="data",
        )
        got = np.asarray(pp(params, video))
        np.testing.assert_allclose(got, expected, atol=5e-5)

    def test_denoise_loop_pp_dp(self):
        """CFG rows ride 'data' while blocks stage over 'pipe', end to end
        in the scanned loop (batch 2 clips -> 4 global rows)."""
        from ltx2_tpu.components import CFGGuider, GaussianNoiser, VideoLatentPatchifier
        from ltx2_tpu.conditioning.tools import VideoLatentTools
        from ltx2_tpu.pipelines.denoise import DenoiseLoopConfig, make_video_denoise_loop
        from ltx2_tpu.types import VideoLatentShape

        cfg = tiny_config(num_layers=2)
        params = cached_params(cfg)
        shape = VideoLatentShape(
            batch=2, channels=cfg.in_channels, frames=2, height=2, width=3
        )
        tools = VideoLatentTools(
            patchifier=VideoLatentPatchifier(1), target_shape=shape, fps=24.0
        )
        state = GaussianNoiser()(
            jax.random.PRNGKey(0), tools.create_initial_state(), 1.0
        )
        sigmas = jnp.asarray([1.0, 0.5, 0.0])
        ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 5, cfg.caption_channels))

        loop_cfg = DenoiseLoopConfig(guider=CFGGuider(3.0))  # 2 rows x 2 clips
        expected = np.asarray(
            make_video_denoise_loop(cfg, loop_cfg)(params, state, sigmas, ctx, ctx).latent
        )
        mesh = create_mesh(data=2, model=1, pipe=2, devices=jax.devices()[:4])
        got = np.asarray(
            make_video_denoise_loop(
                cfg, loop_cfg, mesh=mesh, pipeline_axis="pipe",
                pipeline_microbatches=4,
            )(params, state, sigmas, ctx, ctx).latent
        )
        np.testing.assert_allclose(got, expected, atol=5e-4)

class TestPipelineTensorComposition:
    """PP x TP (x DP): blocks stage over 'pipe' while their weights
    feature-shard over 'model' (Megatron rules via auto_axes inside each
    stage) — per-chip weight HBM ~1/(P*T)."""

    def _cfg(self, num_layers=4):
        # heads=4 so the model axis (2) divides head-sharded dims.
        return tiny_config(
            num_attention_heads=4, attention_head_dim=16,
            cross_attention_dim=64, num_layers=num_layers,
        )

    def test_forward_matches(self):
        from ltx2_tpu.parallel.pipeline_parallel import (
            make_pipeline_parallel_forward,
            shard_pipeline_params,
        )

        cfg = self._cfg()
        params = cached_params(cfg)
        video = make_video_modality(cfg)
        expected = np.asarray(jitted_forward(cfg)(params, video))

        mesh = create_mesh(data=1, model=2, pipe=2, devices=jax.devices()[:4])
        sharded = shard_pipeline_params(mesh, params, model_axis="model")
        pp = make_pipeline_parallel_forward(
            mesh, cfg, num_microbatches=2, x0=False, model_axis="model"
        )
        got = np.asarray(pp(sharded, video))
        np.testing.assert_allclose(got, expected, atol=5e-5)

    def test_forward_matches_pp_tp_dp(self):
        """All three composed on the full 8-device mesh (2x2x2)."""
        from ltx2_tpu.parallel.pipeline_parallel import (
            make_pipeline_parallel_forward,
            shard_pipeline_params,
        )

        cfg = self._cfg()
        params = cached_params(cfg)
        video = make_video_modality(cfg, batch=4)
        expected = np.asarray(jitted_forward(cfg)(params, video))

        mesh = create_mesh(data=2, model=2, pipe=2)
        sharded = shard_pipeline_params(mesh, params, model_axis="model")
        pp = make_pipeline_parallel_forward(
            mesh, cfg, num_microbatches=2, x0=False,
            data_axis="data", model_axis="model",
        )
        got = np.asarray(pp(sharded, video))
        np.testing.assert_allclose(got, expected, atol=5e-5)

    def test_params_sharded_both_axes(self):
        from ltx2_tpu.parallel.pipeline_parallel import shard_pipeline_params

        cfg = self._cfg()
        params = cached_params(cfg)
        mesh = create_mesh(data=1, model=2, pipe=2, devices=jax.devices()[:4])
        sharded = shard_pipeline_params(mesh, params, model_axis="model")
        q = sharded["transformer_blocks"]["attn1"]["to_q"]["weight"]
        # (L, in, out) column-parallel: L/2 over pipe, out/2 over model.
        assert q.sharding.spec == P("pipe", "model", None)
        shard = q.addressable_shards[0].data.shape
        assert shard[0] == q.shape[0] // 2 and shard[1] == q.shape[1] // 2
        out = sharded["transformer_blocks"]["attn1"]["to_out"]["weight"]
        # Row-parallel: in-features shard over model.
        assert out.sharding.spec == P("pipe", None, "model")

    def test_denoise_loop_pp_tp(self):
        """PP x TP end to end inside the scanned denoise loop."""
        from ltx2_tpu.components import CFGGuider, GaussianNoiser, VideoLatentPatchifier
        from ltx2_tpu.conditioning.tools import VideoLatentTools
        from ltx2_tpu.parallel.pipeline_parallel import shard_pipeline_params
        from ltx2_tpu.pipelines.denoise import DenoiseLoopConfig, make_video_denoise_loop
        from ltx2_tpu.types import VideoLatentShape

        cfg = self._cfg(num_layers=2)
        params = cached_params(cfg)
        shape = VideoLatentShape(
            batch=1, channels=cfg.in_channels, frames=2, height=2, width=3
        )
        tools = VideoLatentTools(
            patchifier=VideoLatentPatchifier(1), target_shape=shape, fps=24.0
        )
        state = GaussianNoiser()(
            jax.random.PRNGKey(0), tools.create_initial_state(), 1.0
        )
        sigmas = jnp.asarray([1.0, 0.5, 0.0])
        ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 5, cfg.caption_channels))

        loop_cfg = DenoiseLoopConfig(guider=CFGGuider(3.0))  # 2 rows -> M=2
        expected = np.asarray(
            make_video_denoise_loop(cfg, loop_cfg)(params, state, sigmas, ctx, ctx).latent
        )
        mesh = create_mesh(data=1, model=2, pipe=2, devices=jax.devices()[:4])
        sharded = shard_pipeline_params(mesh, params, model_axis="model")
        got = np.asarray(
            make_video_denoise_loop(
                cfg, loop_cfg, mesh=mesh, pipeline_axis="pipe",
                pipeline_microbatches=2,
            )(sharded, state, sigmas, ctx, ctx).latent
        )
        np.testing.assert_allclose(got, expected, atol=5e-4)


class TestSequenceTensorComposition:
    """SP x TP: tokens shard over 'seq' (ring attention, head-sharded) while
    block weights feature-shard over 'model' (Megatron rules; GSPMD owns the
    model-axis collectives, row-parallel projections psum via auto_axes)."""

    def _cfg(self, **kw):
        return tiny_config(
            num_attention_heads=4, attention_head_dim=16,
            cross_attention_dim=64, **kw,
        )

    def test_video_forward_matches(self):
        from ltx2_tpu.parallel.sequence_parallel import make_sequence_parallel_forward

        cfg = self._cfg()
        params = cached_params(cfg)
        video = make_video_modality(cfg)  # 12 tokens over seq=4
        expected = np.asarray(jitted_forward(cfg, x0=True)(params, video))

        mesh = create_mesh(data=1, model=2, seq=4)
        sharded = shard_dit_params(mesh, params)
        sp = make_sequence_parallel_forward(mesh, cfg, x0=True, model_axis="model")
        got = np.asarray(sp(sharded, video))
        np.testing.assert_allclose(got, expected, atol=5e-5)

    def test_av_forward_matches(self):
        from ltx2_tpu.models.transformer.model import LTXModelType
        from ltx2_tpu.parallel.sequence_parallel import make_sequence_parallel_forward
        from tests.test_dit import make_audio_modality

        cfg = self._cfg(model_type=LTXModelType.AudioVideo, audio_heads=4)
        params = cached_params(cfg)
        video = make_video_modality(cfg)
        audio = make_audio_modality(cfg)
        expected_v, expected_a = jitted_forward(cfg, x0=True)(params, video, audio)

        mesh = create_mesh(data=1, model=2, seq=2, devices=jax.devices()[:4])
        sharded = shard_dit_params(mesh, params)
        sp = make_sequence_parallel_forward(mesh, cfg, x0=True, model_axis="model")
        got_v, got_a = sp(sharded, video, audio)
        np.testing.assert_allclose(np.asarray(got_v), np.asarray(expected_v), atol=5e-5)
        np.testing.assert_allclose(np.asarray(got_a), np.asarray(expected_a), atol=5e-5)

    def test_denoise_loop_sp_tp(self):
        """SP x TP end to end inside the scanned denoise loop."""
        from ltx2_tpu.components import CFGGuider, GaussianNoiser, VideoLatentPatchifier
        from ltx2_tpu.conditioning.tools import VideoLatentTools
        from ltx2_tpu.pipelines.denoise import DenoiseLoopConfig, make_video_denoise_loop
        from ltx2_tpu.types import VideoLatentShape

        cfg = self._cfg(num_layers=2)
        params = cached_params(cfg)
        shape = VideoLatentShape(
            batch=1, channels=cfg.in_channels, frames=2, height=2, width=3
        )
        tools = VideoLatentTools(
            patchifier=VideoLatentPatchifier(1), target_shape=shape, fps=24.0
        )
        state = GaussianNoiser()(
            jax.random.PRNGKey(0), tools.create_initial_state(), 1.0
        )
        sigmas = jnp.asarray([1.0, 0.5, 0.0])
        ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 5, cfg.caption_channels))

        loop_cfg = DenoiseLoopConfig(guider=CFGGuider(3.0))
        expected = np.asarray(
            make_video_denoise_loop(cfg, loop_cfg)(params, state, sigmas, ctx, ctx).latent
        )
        mesh = create_mesh(data=1, model=2, seq=4)
        sharded = shard_dit_params(mesh, params)
        got = np.asarray(
            make_video_denoise_loop(cfg, loop_cfg, mesh=mesh)(
                sharded, state, sigmas, ctx, ctx
            ).latent
        )
        np.testing.assert_allclose(got, expected, atol=5e-4)

    def test_params_sharded(self):
        cfg = self._cfg()
        params = cached_params(cfg)
        mesh = create_mesh(data=1, model=2, seq=4)
        sharded = shard_dit_params(mesh, params)
        q = sharded["transformer_blocks"]["attn1"]["to_q"]["weight"]
        assert q.sharding.spec == P(None, "model", None)


class TestConsolidateLatent:
    """SP/PP loop outputs are sharded; conv consumers (VAE decode,
    upscalers) must receive a consolidated latent — GSPMD's conv halo
    exchange miscomputes when a shard is smaller than the halo width
    (observed: 2D-sharded tiny latent, max error ~60% of signal)."""

    def test_sharded_decode_matches_after_consolidation(self):
        from ltx2_tpu.models.video_vae import VideoDecoderConfig, init_video_decoder
        from ltx2_tpu.models.video_vae.decoder import video_decoder_apply
        from ltx2_tpu.pipelines.common import consolidate_latent

        cfg = VideoDecoderConfig(base_channels=16)
        params = jax.jit(lambda k: init_video_decoder(k, cfg))(jax.random.PRNGKey(1))
        lat = jax.random.normal(jax.random.PRNGKey(2), (1, 128, 2, 2, 4), jnp.float32)
        dec = jax.jit(lambda z: video_decoder_apply(params, cfg, z, timestep=0.05))
        expected = np.asarray(dec(lat))

        mesh = create_mesh(data=1, model=1, seq=4, devices=jax.devices()[:4])
        # The hazardous layout: T and H sharded to single-element shards.
        sharded = jax.device_put(
            lat, NamedSharding(mesh, P(None, None, None, None, "seq"))
        )
        consolidated = consolidate_latent(sharded)
        # Host gather: an uncommitted array can feed any later computation
        # (incl. a stage-2 multi-device shard_map).
        assert isinstance(consolidated, np.ndarray)
        got = np.asarray(dec(consolidated))
        np.testing.assert_allclose(got, expected, atol=1e-5)


class TestWShardedDecode:
    """Explicit-halo W-sharded VAE decode (tiling.decode_w_sharded): one
    oversized frame decodes sharded over 'data' with per-conv boundary
    ppermutes — including the 1-wide-shard case where GSPMD's automatic
    conv halo exchange miscomputes (the r2 consolidate_latent guard)."""

    def _setup(self, base_channels=16):
        from ltx2_tpu.models.video_vae import VideoDecoderConfig, init_video_decoder

        cfg = VideoDecoderConfig(base_channels=base_channels)
        params = jax.jit(lambda k: init_video_decoder(k, cfg))(jax.random.PRNGKey(1))
        return cfg, params

    def test_shard_narrower_than_halo_matches(self):
        """W=4 over 4 devices -> 1-wide shards == the halo width. This
        exact layout produced ~60% error through GSPMD's conv partitioner;
        the explicit exchange must be exact."""
        from ltx2_tpu.models.video_vae.decoder import video_decoder_apply
        from ltx2_tpu.models.video_vae.tiling import decode_w_sharded

        cfg, params = self._setup()
        lat = jax.random.normal(jax.random.PRNGKey(2), (1, 128, 2, 2, 4), jnp.float32)
        expected = np.asarray(
            jax.jit(
                lambda z: video_decoder_apply(
                    params, cfg, z, timestep=0.05, noise_key=None
                )
            )(lat)
        )
        mesh = create_mesh(data=4, model=1, devices=jax.devices()[:4])
        got = np.asarray(
            decode_w_sharded(lat, params, cfg, mesh, axis="data", key=None)
        )
        np.testing.assert_allclose(got, expected, atol=2e-5)

    def test_wider_shards_match_and_scale(self):
        """W=8 over 2 devices (normal serving split) — equality plus the
        per-device shard shapes actually 1/n."""
        from ltx2_tpu.models.video_vae.decoder import video_decoder_apply
        from ltx2_tpu.models.video_vae.tiling import decode_w_sharded

        cfg, params = self._setup()
        lat = jax.random.normal(jax.random.PRNGKey(3), (1, 128, 2, 3, 8), jnp.float32)
        expected = np.asarray(
            jax.jit(
                lambda z: video_decoder_apply(
                    params, cfg, z, timestep=0.05, noise_key=None
                )
            )(lat)
        )
        mesh = create_mesh(data=2, model=1, devices=jax.devices()[:2])
        out = decode_w_sharded(lat, params, cfg, mesh, axis="data", key=None)
        shard_ws = {s.data.shape[-1] for s in out.addressable_shards}
        assert shard_ws == {out.shape[-1] // 2}, shard_ws
        np.testing.assert_allclose(np.asarray(out), expected, atol=2e-5)


class TestPipelineSequenceComposition:
    """PP x SP (x TP): blocks stage over 'pipe' while tokens shard over
    'seq' — the GPipe ppermute and the ring-attention ppermute ride
    independent mesh axes; with 'model' > 1 the stage body additionally
    runs TP under auto_axes."""

    def test_forward_matches(self):
        import dataclasses

        from ltx2_tpu.parallel.pipeline_parallel import (
            make_pipeline_parallel_forward,
            shard_pipeline_params,
        )

        cfg = tiny_config(num_layers=4)
        params = cached_params(cfg)
        video = make_video_modality(cfg)  # batch 2, 12 tokens
        expected = np.asarray(jitted_forward(cfg)(params, video))

        mesh = create_mesh(data=1, model=1, pipe=2, seq=2, devices=jax.devices()[:4])
        sharded = shard_pipeline_params(mesh, params)
        sp_cfg = dataclasses.replace(cfg, sequence_axis="seq")
        pp = make_pipeline_parallel_forward(mesh, sp_cfg, num_microbatches=2, x0=False)
        got = np.asarray(pp(sharded, video))
        np.testing.assert_allclose(got, expected, atol=5e-5)

    def test_forward_matches_pp_sp_tp(self):
        """Three-way composition on the full 8-device mesh (2x2x2)."""
        import dataclasses

        from ltx2_tpu.parallel.pipeline_parallel import (
            make_pipeline_parallel_forward,
            shard_pipeline_params,
        )

        cfg = tiny_config(
            num_attention_heads=4, attention_head_dim=16,
            cross_attention_dim=64, num_layers=4,
        )
        params = cached_params(cfg)
        video = make_video_modality(cfg)
        expected = np.asarray(jitted_forward(cfg)(params, video))

        mesh = create_mesh(data=1, model=2, pipe=2, seq=2)
        sharded = shard_pipeline_params(mesh, params, model_axis="model")
        sp_cfg = dataclasses.replace(cfg, sequence_axis="seq")
        pp = make_pipeline_parallel_forward(
            mesh, sp_cfg, num_microbatches=2, x0=False, model_axis="model"
        )
        got = np.asarray(pp(sharded, video))
        np.testing.assert_allclose(got, expected, atol=5e-5)

    def test_denoise_loop_pp_sp(self):
        from ltx2_tpu.components import CFGGuider, GaussianNoiser, VideoLatentPatchifier
        from ltx2_tpu.conditioning.tools import VideoLatentTools
        from ltx2_tpu.parallel.pipeline_parallel import shard_pipeline_params
        from ltx2_tpu.pipelines.denoise import DenoiseLoopConfig, make_video_denoise_loop
        from ltx2_tpu.types import VideoLatentShape

        cfg = tiny_config(num_layers=2)
        params = cached_params(cfg)
        shape = VideoLatentShape(
            batch=1, channels=cfg.in_channels, frames=2, height=2, width=3
        )
        tools = VideoLatentTools(
            patchifier=VideoLatentPatchifier(1), target_shape=shape, fps=24.0
        )
        state = GaussianNoiser()(
            jax.random.PRNGKey(0), tools.create_initial_state(), 1.0
        )
        sigmas = jnp.asarray([1.0, 0.5, 0.0])
        ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 5, cfg.caption_channels))

        loop_cfg = DenoiseLoopConfig(guider=CFGGuider(3.0))  # 2 rows -> M=2
        expected = np.asarray(
            make_video_denoise_loop(cfg, loop_cfg)(params, state, sigmas, ctx, ctx).latent
        )
        mesh = create_mesh(data=1, model=1, pipe=2, seq=2, devices=jax.devices()[:4])
        sharded = shard_pipeline_params(mesh, params)
        got = np.asarray(
            make_video_denoise_loop(
                cfg, loop_cfg, mesh=mesh, pipeline_axis="pipe",
                pipeline_microbatches=2,
            )(sharded, state, sigmas, ctx, ctx).latent
        )
        np.testing.assert_allclose(got, expected, atol=5e-4)
