"""Rectified-flow fine-tuning tests (new TPU-first capability — the
reference is inference-only).

The train step must (1) actually learn — loss drops by an order of
magnitude overfitting one batch on a tiny DiT, (2) honor the trainable
mask — frozen leaves bit-identical after updates, (3) compose with the
parallelism layer — TP-sharded params + DP-sharded batches produce the
same losses as single-device training.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ltx2_tpu.ops.rope import create_position_grid
from ltx2_tpu.training import (
    TrainBatch,
    TrainConfig,
    make_optimizer,
    make_train_step,
    trainable_mask,
)
from tests.helpers import cached_params
from tests.test_dit import tiny_config

pytestmark = pytest.mark.multichip


def make_batch(cfg, batch=2, frames=2, height=2, width=3, seed=0):
    n = frames * height * width
    grid = create_position_grid(batch, frames, height, width).astype(jnp.float32)
    positions = jnp.stack([grid, grid + 1], axis=-1)
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    ctx_dim = cfg.caption_channels or cfg.cross_attention_dim
    return TrainBatch(
        x0=jax.random.normal(k1, (batch, n, cfg.in_channels), jnp.float32),
        positions=positions,
        context=jax.random.normal(k2, (batch, 5, ctx_dim), jnp.float32) * 0.1,
    )


class TestTrainStep:
    def test_loss_decreases_overfitting_one_batch(self):
        cfg = tiny_config(num_layers=2)
        params = jax.tree_util.tree_map(jnp.copy, cached_params(cfg))
        tc = TrainConfig(learning_rate=3e-3, logit_normal_loc=None)
        opt = make_optimizer(tc)
        step = make_train_step(cfg, opt, tc)
        opt_state = opt.init(params)
        batch = make_batch(cfg)

        losses = []
        for i in range(60):
            # Fixed key: deterministic (sigma, noise) -> a true overfit target.
            loss, params, opt_state = step(params, opt_state, batch, jax.random.PRNGKey(7))
            losses.append(float(loss))
        assert losses[-1] < losses[0] / 10, (losses[0], losses[-1])
        assert np.isfinite(losses).all()

    def test_trainable_mask_freezes_params(self):
        cfg = tiny_config(num_layers=2)
        params = jax.tree_util.tree_map(jnp.copy, cached_params(cfg))
        mask = trainable_mask(params, lambda p: "attn1" in p)
        tc = TrainConfig(learning_rate=1e-2)
        opt = make_optimizer(tc, mask=mask)
        step = make_train_step(cfg, opt, tc)
        opt_state = opt.init(params)
        before = jax.tree_util.tree_map(np.asarray, params)
        batch = make_batch(cfg)
        _, params, _ = step(params, opt_state, batch, jax.random.PRNGKey(0))

        flat_b = jax.tree_util.tree_leaves_with_path(before)
        flat_a = dict(
            (jax.tree_util.keystr(p), l)
            for p, l in jax.tree_util.tree_leaves_with_path(params)
        )
        changed = frozen_same = 0
        for path, b in flat_b:
            a = np.asarray(flat_a[jax.tree_util.keystr(path)])
            if "attn1" in jax.tree_util.keystr(path):
                changed += int(not np.array_equal(a, b))
            else:
                assert np.array_equal(a, b), f"frozen leaf changed: {path}"
                frozen_same += 1
        assert changed > 0 and frozen_same > 0

    def test_tp_dp_training_matches_single_device(self):
        """TP-sharded params + DP-sharded batch: identical losses (GSPMD
        propagates shardings through grads and Adam moments)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ltx2_tpu.parallel.mesh import create_mesh
        from ltx2_tpu.parallel.sharding import shard_dit_params

        cfg = tiny_config(
            num_attention_heads=4, attention_head_dim=16,
            cross_attention_dim=64, num_layers=2,
        )
        tc = TrainConfig(learning_rate=1e-3, logit_normal_loc=None)
        opt = make_optimizer(tc)
        step = make_train_step(cfg, opt, tc)
        batch = make_batch(cfg)

        def run(params, batch):
            opt_state = opt.init(params)
            losses = []
            for i in range(3):
                loss, params, opt_state = step(
                    params, opt_state, batch, jax.random.PRNGKey(i)
                )
                losses.append(float(loss))
            return losses

        expected = run(jax.tree_util.tree_map(jnp.copy, cached_params(cfg)), batch)

        mesh = create_mesh(data=2, model=4)
        sharded = shard_dit_params(
            mesh, jax.tree_util.tree_map(jnp.copy, cached_params(cfg))
        )
        dp = lambda a: jax.device_put(
            a, NamedSharding(mesh, P("data", *([None] * (a.ndim - 1))))
        )
        sharded_batch = TrainBatch(
            x0=dp(batch.x0), positions=dp(batch.positions), context=dp(batch.context)
        )
        got = run(sharded, sharded_batch)
        np.testing.assert_allclose(got, expected, rtol=2e-4)

    def test_grad_accumulation_matches_manual_average(self):
        """accum_steps=2 must produce the identical update to manually
        averaging the two microbatches' gradients (same per-micro keys)
        followed by one optimizer step."""
        import optax

        from ltx2_tpu.training.trainer import rectified_flow_loss

        cfg = tiny_config(num_layers=2)
        tc = TrainConfig(learning_rate=1e-3, logit_normal_loc=None)
        opt = make_optimizer(tc)
        batch = make_batch(cfg, batch=4)
        key = jax.random.PRNGKey(7)

        params_a = jax.tree_util.tree_map(jnp.copy, cached_params(cfg))
        step = make_train_step(cfg, opt, tc, accum_steps=2)
        loss_a, params_a, _ = step(params_a, opt.init(params_a), batch, key)

        # Manual reference: per-micro grads with the same split keys.
        params_b = jax.tree_util.tree_map(jnp.copy, cached_params(cfg))
        keys = jax.random.split(key, 2)
        micro = jax.tree_util.tree_map(
            lambda x: None if x is None else x.reshape(2, 2, *x.shape[1:]), batch
        )
        losses, grad_acc = [], None
        for i in range(2):
            mb = jax.tree_util.tree_map(lambda x: None if x is None else x[i], micro)
            loss, grads = jax.value_and_grad(rectified_flow_loss)(
                params_b, cfg, mb, keys[i], tc
            )
            losses.append(loss)
            grads = jax.tree_util.tree_map(lambda g: g.astype(jnp.float32), grads)
            grad_acc = grads if grad_acc is None else jax.tree_util.tree_map(
                lambda a, g: a + g, grad_acc, grads
            )
        grad_acc = jax.tree_util.tree_map(
            lambda g, p: (g / 2).astype(p.dtype), grad_acc, params_b
        )
        updates, _ = opt.update(grad_acc, opt.init(params_b), params_b)
        params_b = optax.apply_updates(params_b, updates)

        np.testing.assert_allclose(
            float(loss_a), float((losses[0] + losses[1]) / 2), rtol=1e-6
        )
        for pa, pb in zip(
            jax.tree_util.tree_leaves(params_a), jax.tree_util.tree_leaves(params_b)
        ):
            # jitted-scan vs eager-loop fp reassociation: not bit-equal.
            np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), atol=3e-5)

    def test_zero1_shards_moments_and_matches_replicated(self):
        """ZeRO-1: Adam mu/nu shard over 'data' (per-device bytes ~1/D)
        while the training losses stay equal to the replicated baseline."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ltx2_tpu.parallel.mesh import create_mesh
        from ltx2_tpu.parallel.sharding import dit_param_shardings, shard_dit_params
        from ltx2_tpu.training import zero1_opt_state_shardings

        cfg = tiny_config(
            num_attention_heads=4, attention_head_dim=16,
            cross_attention_dim=64, num_layers=2,
        )
        tc = TrainConfig(learning_rate=1e-3, logit_normal_loc=None)
        opt = make_optimizer(tc)
        batch = make_batch(cfg)

        # Replicated baseline.
        base_step = make_train_step(cfg, opt, tc)
        params = jax.tree_util.tree_map(jnp.copy, cached_params(cfg))
        opt_state = opt.init(params)
        expected = []
        for i in range(3):
            loss, params, opt_state = base_step(
                params, opt_state, batch, jax.random.PRNGKey(i)
            )
            expected.append(float(loss))

        # ZeRO-1 on a (data=2, model=4) mesh.
        mesh = create_mesh(data=2, model=4)
        sharded = shard_dit_params(
            mesh, jax.tree_util.tree_map(jnp.copy, cached_params(cfg))
        )
        opt_state = opt.init(sharded)
        shardings = zero1_opt_state_shardings(
            opt_state, sharded, dit_param_shardings(mesh, sharded), mesh
        )
        opt_state = jax.tree_util.tree_map(jax.device_put, opt_state, shardings)

        # Adam moments are physically 1/data-sharded (on top of TP).
        adam_state = opt_state[1][0]  # chain(clip, adamw-chain)[ScaleByAdam]
        mu_leaf = adam_state.mu["transformer_blocks"]["attn1"]["to_q"]["weight"]
        shard_shapes = {s.data.shape for s in mu_leaf.addressable_shards}
        assert all(shape[0] == mu_leaf.shape[0] // 2 for shape in shard_shapes), (
            f"mu not data-sharded: {shard_shapes} vs {mu_leaf.shape}"
        )
        # TP sharding preserved too (to_q is column-parallel over 4).
        assert all(shape[1] == mu_leaf.shape[1] // 4 for shape in shard_shapes)

        dp = lambda a: jax.device_put(  # noqa: E731
            a, NamedSharding(mesh, P("data", *([None] * (a.ndim - 1))))
        )
        sharded_batch = TrainBatch(
            x0=dp(batch.x0), positions=dp(batch.positions), context=dp(batch.context)
        )
        z_step = make_train_step(cfg, opt, tc, opt_state_shardings=shardings)
        got = []
        for i in range(3):
            loss, sharded, opt_state = z_step(
                sharded, opt_state, sharded_batch, jax.random.PRNGKey(i)
            )
            got.append(float(loss))
        np.testing.assert_allclose(got, expected, rtol=2e-4)
        # Layout survives the step (donation + with_sharding_constraint).
        adam_state = opt_state[1][0]
        mu_leaf = adam_state.mu["transformer_blocks"]["attn1"]["to_q"]["weight"]
        shard_shapes = {s.data.shape for s in mu_leaf.addressable_shards}
        assert all(shape[0] == mu_leaf.shape[0] // 2 for shape in shard_shapes)

    def test_zero2_grad_reduce_scatter_matches_replicated(self):
        """ZeRO-2: pinning grads data-sharded (on top of ZeRO-1 moments)
        keeps losses equal to the replicated baseline, lowers the
        cross-'data' gradient sync to reduce-scatter in the compiled HLO,
        and composes with microbatch accumulation."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ltx2_tpu.parallel.mesh import create_mesh
        from ltx2_tpu.parallel.sharding import dit_param_shardings, shard_dit_params
        from ltx2_tpu.training import (
            zero1_opt_state_shardings, zero2_grad_shardings,
        )

        cfg = tiny_config(
            num_attention_heads=4, attention_head_dim=16,
            cross_attention_dim=64, num_layers=2,
        )
        tc = TrainConfig(learning_rate=1e-3, logit_normal_loc=None)
        opt = make_optimizer(tc)
        batch = make_batch(cfg, batch=4)

        # Replicated baseline with the same accumulation schedule (fp32
        # accumulation reassociates, so compare like against like).
        base_step = make_train_step(cfg, opt, tc, accum_steps=2)
        params = jax.tree_util.tree_map(jnp.copy, cached_params(cfg))
        opt_state = opt.init(params)
        expected = []
        for i in range(3):
            loss, params, opt_state = base_step(
                params, opt_state, batch, jax.random.PRNGKey(i)
            )
            expected.append(float(loss))

        mesh = create_mesh(data=2, model=4)
        sharded = shard_dit_params(
            mesh, jax.tree_util.tree_map(jnp.copy, cached_params(cfg))
        )
        param_shardings = dit_param_shardings(mesh, sharded)
        opt_state = opt.init(sharded)
        opt_shardings = zero1_opt_state_shardings(
            opt_state, sharded, param_shardings, mesh
        )
        opt_state = jax.tree_util.tree_map(jax.device_put, opt_state, opt_shardings)
        grad_shardings = zero2_grad_shardings(sharded, param_shardings, mesh)

        # The grad layout rule puts 'data' on the first free divisible dim
        # on top of the TP spec.
        gs = grad_shardings["transformer_blocks"]["attn1"]["to_q"]["weight"]
        # Stacked-block leaf (L, out, in): 'data' lands on the free layer
        # dim, TP's 'model' spec preserved.
        assert gs.spec == P("data", "model", None), gs.spec

        dp = lambda a: jax.device_put(  # noqa: E731
            a, NamedSharding(mesh, P("data", *([None] * (a.ndim - 1))))
        )
        sharded_batch = TrainBatch(
            x0=dp(batch.x0), positions=dp(batch.positions), context=dp(batch.context)
        )
        z_step = make_train_step(
            cfg, opt, tc, accum_steps=2,
            opt_state_shardings=opt_shardings, grad_shardings=grad_shardings,
        )

        # Engagement: compare per-device buffer shapes in the compiled
        # modules WITHOUT ZeRO-1 moment pinning (whose sharding already
        # back-propagates into the grads, masking the grad constraint's own
        # effect). A to_q-grad-sized fp32 buffer is f32[2,16,64] per device
        # under TP-only layout (global (L=2, 64, 64), 'model'/4 on dim 1)
        # and f32[1,16,64] once 'data'/2 lands on the layer dim. The grad
        # constraint must flip the compiled module from full-size-dominated
        # to 1/D-dominated. (reduce-scatter itself is not observable on the
        # CPU backend — its decomposer rewrites it before scheduling.)
        counts = {}
        for label, g in [("plain", None), ("zero2", grad_shardings)]:
            s = make_train_step(cfg, opt, tc, accum_steps=2, grad_shardings=g)
            hlo = s.lower(
                sharded, opt.init(sharded), sharded_batch, jax.random.PRNGKey(0)
            ).compile().as_text()
            counts[label] = (hlo.count("f32[2,16,64]"), hlo.count("f32[1,16,64]"))
        full_plain, shard_plain = counts["plain"]
        full_z2, shard_z2 = counts["zero2"]
        assert full_plain > 10 * shard_plain, counts   # plain DP: replicated grads
        assert shard_z2 > 5 * full_z2, counts          # ZeRO-2: 1/D grads dominate

        got = []
        for i in range(3):
            loss, sharded, opt_state = z_step(
                sharded, opt_state, sharded_batch, jax.random.PRNGKey(i)
            )
            got.append(float(loss))
        np.testing.assert_allclose(got, expected, rtol=2e-4)

    def test_fsdp_shards_params_and_matches_replicated(self):
        """ZeRO-3/FSDP: the PARAMETERS shard over 'data' on top of TP —
        per-device weight bytes physically drop — while losses stay equal
        to the replicated baseline and the layout survives donated steps."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ltx2_tpu.parallel.mesh import create_mesh
        from ltx2_tpu.parallel.sharding import dit_param_shardings
        from ltx2_tpu.training import (
            fsdp_param_shardings, zero1_opt_state_shardings,
            zero2_grad_shardings,
        )

        cfg = tiny_config(
            num_attention_heads=4, attention_head_dim=16,
            cross_attention_dim=64, num_layers=2,
        )
        tc = TrainConfig(learning_rate=1e-3, logit_normal_loc=None)
        opt = make_optimizer(tc)
        batch = make_batch(cfg)

        base_step = make_train_step(cfg, opt, tc)
        params = jax.tree_util.tree_map(jnp.copy, cached_params(cfg))
        opt_state = opt.init(params)
        expected = []
        for i in range(3):
            loss, params, opt_state = base_step(
                params, opt_state, batch, jax.random.PRNGKey(i)
            )
            expected.append(float(loss))

        mesh = create_mesh(data=2, model=4)
        raw = cached_params(cfg)
        fsdp = fsdp_param_shardings(raw, dit_param_shardings(mesh, raw), mesh)

        # Stacked block leaves keep the scan axis whole: 'data' lands on a
        # free NON-layer dim on top of the TP spec (a data-sharded scan
        # axis would gather the whole stack per step).
        qs = fsdp["transformer_blocks"]["attn1"]["to_q"]["weight"]
        assert qs.spec == P(None, "model", "data"), qs.spec

        sharded = jax.tree_util.tree_map(
            lambda p, s: jax.device_put(jnp.copy(p), s), raw, fsdp
        )
        # Parameter bytes are physically ~1/(data*model) for matmul weights.
        q_leaf = sharded["transformer_blocks"]["attn1"]["to_q"]["weight"]
        shard_shapes = {s.data.shape for s in q_leaf.addressable_shards}
        assert shard_shapes == {
            (q_leaf.shape[0], q_leaf.shape[1] // 4, q_leaf.shape[2] // 2)
        }, shard_shapes

        # The ZeRO helpers pass data-sharded specs through unchanged, so
        # moments and grads inherit the FSDP layout (no double-'data').
        opt_state = opt.init(sharded)
        opt_shardings = zero1_opt_state_shardings(opt_state, sharded, fsdp, mesh)
        opt_state = jax.tree_util.tree_map(
            jax.device_put, opt_state, opt_shardings
        )
        grad_shardings = zero2_grad_shardings(sharded, fsdp, mesh)
        assert grad_shardings["transformer_blocks"]["attn1"]["to_q"][
            "weight"
        ].spec == P(None, "model", "data")

        dp = lambda a: jax.device_put(  # noqa: E731
            a, NamedSharding(mesh, P("data", *([None] * (a.ndim - 1))))
        )
        sharded_batch = TrainBatch(
            x0=dp(batch.x0), positions=dp(batch.positions), context=dp(batch.context)
        )
        step = make_train_step(
            cfg, opt, tc, opt_state_shardings=opt_shardings,
            grad_shardings=grad_shardings, param_shardings=fsdp,
        )
        got = []
        for i in range(3):
            loss, sharded, opt_state = step(
                sharded, opt_state, sharded_batch, jax.random.PRNGKey(i)
            )
            got.append(float(loss))
        np.testing.assert_allclose(got, expected, rtol=2e-4)

        # Layout survives donation + the param constraint across steps.
        q_leaf = sharded["transformer_blocks"]["attn1"]["to_q"]["weight"]
        shard_shapes = {s.data.shape for s in q_leaf.addressable_shards}
        assert shard_shapes == {
            (q_leaf.shape[0], q_leaf.shape[1] // 4, q_leaf.shape[2] // 2)
        }, shard_shapes

    def test_remat_train_step_runs(self):
        """remat=True: backprop through the checkpointed block scan."""
        import dataclasses

        cfg = dataclasses.replace(tiny_config(num_layers=2), remat=True)
        params = jax.tree_util.tree_map(jnp.copy, cached_params(cfg))
        tc = TrainConfig()
        opt = make_optimizer(tc)
        step = make_train_step(cfg, opt, tc)
        loss, params, _ = step(params, opt.init(params), make_batch(cfg), jax.random.PRNGKey(0))
        assert np.isfinite(float(loss))


class TestTrainCLI:
    """scripts/train.py end to end: placeholder model, synthetic data,
    partial fine-tune, save in reference checkpoint format, reload through
    the standard loader, and verify the trained subtree actually changed."""

    def test_train_save_reload(self, tmp_path):
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
        import train as train_cli

        from ltx2_tpu.loader.weight_loader import load_transformer_params

        out = tmp_path / "tuned.safetensors"
        train_cli.main([
            "--placeholder", "--synthetic", "2", "2", "3",
            "--steps", "3", "--batch-size", "2", "--lr", "1e-2",
            "--trainable", "attn1", "--seed", "0",
            "--save", str(out),
        ])
        tuned = load_transformer_params(
            str(out), target_dtype="float32", num_layers=4
        )

        # Reference baseline: untouched placeholder init (same seed).
        from ltx2_tpu.models.transformer.model import LTXModelConfig, init_ltx_model

        cfg = LTXModelConfig(
            num_attention_heads=4, attention_head_dim=32, num_layers=4,
            cross_attention_dim=128, caption_channels=None,
            compute_dtype="bfloat16", remat=True,
        )
        init = jax.jit(lambda k: init_ltx_model(k, cfg))(jax.random.PRNGKey(0))

        q_t = np.asarray(tuned["transformer_blocks"]["attn1"]["to_q"]["weight"])
        q_0 = np.asarray(init["transformer_blocks"]["attn1"]["to_q"]["weight"], np.float32)
        assert not np.allclose(q_t, q_0), "trained attn weights did not change"
        ff_t = np.asarray(
            tuned["transformer_blocks"]["ff"]["project_out"]["weight"]
        )
        ff_0 = np.asarray(
            init["transformer_blocks"]["ff"]["project_out"]["weight"], np.float32
        )
        np.testing.assert_allclose(ff_t, ff_0, atol=3e-3)  # frozen (bf16 export rounding)


    def test_fsdp_cli_smoke(self, tmp_path):
        """scripts/train.py --fsdp on a (data=2, model=2) virtual mesh:
        params place data-sharded, the run completes, and the export
        round-trips through the standard loader."""
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
        import train as train_cli

        from ltx2_tpu.loader.safetensors_io import SafetensorsFile

        out = tmp_path / "fsdp.safetensors"
        train_cli.main([
            "--placeholder", "--synthetic", "2", "2", "3",
            "--steps", "2", "--batch-size", "2", "--lr", "1e-3",
            "--dp-devices", "2", "--tp-devices", "2", "--fsdp",
            "--seed", "0", "--save", str(out),
        ])
        f = SafetensorsFile(str(out))
        assert any(k.startswith("model.diffusion_model.") for k in f.keys())

    def test_grad_clip_zero_disables_clipping(self, tmp_path):
        """--grad-clip 0 must DISABLE clipping (the conventional spelling),
        not install clip_by_global_norm(0.0) which silently zeroes every
        gradient and turns the run into a no-op fine-tune."""
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
        import train as train_cli

        from ltx2_tpu.loader.safetensors_io import SafetensorsFile

        out = tmp_path / "adapter.safetensors"
        train_cli.main([
            "--placeholder", "--synthetic", "2", "2", "3",
            "--steps", "3", "--batch-size", "2", "--lr", "1e-2",
            "--lora-rank", "2", "--grad-clip", "0", "--save", str(out),
        ])
        f = SafetensorsFile(str(out))
        b_keys = [k for k in f.keys() if k.endswith(".lora_B.weight")]
        assert b_keys
        # B starts at exactly 0; with weight decay 0 the ONLY way it moves
        # is a non-zero gradient — zeroed grads would leave every B at 0.
        assert any(np.abs(np.asarray(f.get(k))).max() > 0 for k in b_keys), (
            "--grad-clip 0 zeroed every gradient instead of disabling clipping"
        )
        with pytest.raises(SystemExit, match="grad-clip"):
            train_cli.main([
                "--placeholder", "--synthetic", "2", "2", "3",
                "--steps", "1", "--grad-clip", "-1",
            ])

    def test_bench_train_fp8_base_requires_lora(self):
        """bench_train --fp8-base without --lora-rank would benchmark AdamW
        updates in fp8 storage precision — a configuration train.py rejects;
        the bench must fail fast the same way."""
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
        import bench_train

        with pytest.raises(SystemExit, match="lora-rank"):
            bench_train.main(["--fp8-base"])

    def test_resume_is_exact(self, tmp_path):
        """--save-state/--resume: an interrupted run resumed mid-stream
        produces a final checkpoint BYTE-IDENTICAL to the uninterrupted
        run (optimizer state, batch-index stream, and per-step keys all
        restored exactly)."""
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
        import train as train_cli

        common = [
            "--placeholder", "--synthetic", "2", "2", "3",
            "--batch-size", "2", "--lr", "1e-2",
            "--trainable", "attn1", "--seed", "0",
        ]
        straight = tmp_path / "straight.safetensors"
        train_cli.main(common + ["--steps", "4", "--save", str(straight)])

        state = tmp_path / "state.safetensors"
        train_cli.main(common + [
            "--steps", "2", "--save-state", str(state), "--save-every", "2",
        ])
        resumed = tmp_path / "resumed.safetensors"
        train_cli.main(common + [
            "--steps", "4", "--resume", str(state), "--save", str(resumed),
        ])
        assert straight.read_bytes() == resumed.read_bytes()

        # A mismatched config (different trainable set -> different tree)
        # must fail loudly, not scramble leaves.
        with pytest.raises(ValueError, match="different configuration"):
            train_cli.main(common[:-4] + [
                "--trainable", "ff", "--seed", "0",
                "--steps", "4", "--resume", str(state),
            ])

    def test_export_carry_from_merges_non_dit_tensors(self, tmp_path):
        """A fine-tuned export must be a COMPLETE single-file checkpoint:
        non-DiT tensors (VAE, projections) carried verbatim from the
        source checkpoint, tuned DiT keys winning over stale source ones
        (advisor r2: tuned.safetensors as sole --checkpoint)."""
        from ltx2_tpu.loader.export import export_transformer_checkpoint
        from ltx2_tpu.loader.safetensors_io import SafetensorsFile, write_safetensors
        from ltx2_tpu.models.transformer.model import LTXModelConfig, init_ltx_model

        cfg = LTXModelConfig(
            num_attention_heads=2, attention_head_dim=8, num_layers=2,
            cross_attention_dim=32, caption_channels=None,
        )
        params = init_ltx_model(jax.random.PRNGKey(0), cfg)
        src = tmp_path / "src.safetensors"
        write_safetensors(str(src), {
            "model.diffusion_model.patchify_proj.weight": np.zeros((4, 4), np.float32),
            "vae.decoder.conv_in.conv.weight": np.ones((2, 2, 3, 3, 3), np.float32),
            "text_embedding_projection.aggregate_embed.weight": np.ones((8, 8), np.float32),
        })
        out = tmp_path / "tuned.safetensors"
        export_transformer_checkpoint(str(out), params, carry_from=str(src))
        f = SafetensorsFile(str(out))
        keys = set(f.keys())
        assert "vae.decoder.conv_in.conv.weight" in keys
        assert "text_embedding_projection.aggregate_embed.weight" in keys
        np.testing.assert_allclose(f.get("vae.decoder.conv_in.conv.weight"), 1.0)
        # Tuned DiT keys win over the stale (4,4) source tensor.
        assert f.get("model.diffusion_model.patchify_proj.weight").shape != (4, 4)

    def test_export_carry_from_drops_stale_fp8_scales(self, tmp_path):
        """Fine-tuning from an fp8 checkpoint (loader dequantizes) then
        exporting must NOT carry the source's .weight_scale siblings of
        re-emitted DiT weights: on reload the loader would 'dequantize'
        the fine-tuned fp32 weight, destroying it. Scales for tensors the
        export does NOT re-emit (connectors etc.) still carry."""
        from ltx2_tpu.loader.export import export_transformer_checkpoint
        from ltx2_tpu.loader.safetensors_io import SafetensorsFile, write_safetensors
        from ltx2_tpu.models.transformer.model import LTXModelConfig, init_ltx_model

        cfg = LTXModelConfig(
            num_attention_heads=2, attention_head_dim=8, num_layers=2,
            cross_attention_dim=32, caption_channels=None,
        )
        params = init_ltx_model(jax.random.PRNGKey(0), cfg)
        src = tmp_path / "src.safetensors"
        write_safetensors(str(src), {
            # Stale fp8 scale for a weight the export re-emits (any DiT key).
            "model.diffusion_model.patchify_proj.weight_scale":
                np.asarray(0.5, np.float32),
            # Scale for a NON-re-emitted tensor (connector): must carry.
            "model.diffusion_model.video_embeddings_connector.blk.weight":
                np.ones((2, 2), np.float32),
            "model.diffusion_model.video_embeddings_connector.blk.weight_scale":
                np.asarray(0.25, np.float32),
        })
        out = tmp_path / "tuned.safetensors"
        export_transformer_checkpoint(str(out), params, carry_from=str(src))
        keys = set(SafetensorsFile(str(out)).keys())
        assert "model.diffusion_model.patchify_proj.weight_scale" not in keys
        assert (
            "model.diffusion_model.video_embeddings_connector.blk.weight_scale"
            in keys
        )

    def test_fp8_serving_rejects_trainable_quantized_leaves(self, tmp_path):
        """--fp8-serving + a --trainable regex that selects quantized matmul
        weights must refuse (grads in fp8 storage precision are useless);
        --lora-rank remains the supported combo (advisor r2)."""
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
        import train as train_cli

        with pytest.raises(SystemExit, match="fp8-quantized leaves"):
            train_cli.main([
                "--placeholder", "--synthetic", "2", "2", "3",
                "--steps", "1", "--fp8-serving", "--trainable", "attn",
                "--save", str(tmp_path / "x.safetensors"),
            ])


class TestLoRA:
    """LoRA adapters: identity at init (B=0), runtime application in
    linear, lora-only training, and export -> fuse round trip through the
    standard --lora loader."""

    def _setup(self, rank=4, alpha=8.0):
        from ltx2_tpu.training.lora import add_lora_params

        cfg = tiny_config(num_layers=2)
        base = jax.tree_util.tree_map(jnp.copy, cached_params(cfg))
        # Deep-copy the leaves going into the LoRA tree: the train step
        # donates its buffers and must not invalidate `base`.
        lora_params, n = add_lora_params(
            jax.random.PRNGKey(5),
            jax.tree_util.tree_map(jnp.copy, base),
            rank=rank, alpha=alpha,
        )
        assert n > 0
        return cfg, base, lora_params

    def test_identity_at_init(self):
        from tests.helpers import jitted_forward
        from tests.test_dit import make_video_modality

        cfg, base, lora_params = self._setup()
        video = make_video_modality(cfg)
        a = np.asarray(jitted_forward(cfg)(base, video))
        b = np.asarray(jitted_forward(cfg)(lora_params, video))
        np.testing.assert_allclose(a, b, atol=1e-6)  # B=0 -> exact base model

    def test_lora_training_changes_output_and_freezes_base(self):
        from ltx2_tpu.training.lora import lora_trainable_mask

        cfg, base, lora_params = self._setup()
        # Snapshot BEFORE stepping: the train step donates its input
        # buffers, and lora_params shares the base leaves.
        w_before = np.asarray(
            base["transformer_blocks"]["attn1"]["to_q"]["weight"]
        ).copy()
        mask = lora_trainable_mask(lora_params)
        tc = TrainConfig(learning_rate=1e-2, logit_normal_loc=None)
        opt = make_optimizer(tc, mask=mask)
        step = make_train_step(cfg, opt, tc)
        state = opt.init(lora_params)
        batch = make_batch(cfg)
        for i in range(3):
            loss, lora_params, state = step(
                lora_params, state, batch, jax.random.PRNGKey(i)
            )
        q_b = lora_params["transformer_blocks"]["attn1"]["to_q"]
        assert not np.allclose(np.asarray(q_b["lora_B"]), 0.0)
        np.testing.assert_array_equal(np.asarray(q_b["weight"]), w_before)

    def test_export_fuse_round_trip(self, tmp_path):
        """Trained adapter -> reference-format LoRA file -> fuse via the
        standard loader must equal the runtime-LoRA forward."""
        from ltx2_tpu.loader.lora import LoRAConfig, fuse_lora_into_params
        from ltx2_tpu.training.lora import (
            export_lora_checkpoint,
            lora_trainable_mask,
            strip_lora_params,
        )
        from tests.helpers import jitted_forward
        from tests.test_dit import make_video_modality

        cfg, base, lora_params = self._setup()
        mask = lora_trainable_mask(lora_params)
        tc = TrainConfig(learning_rate=1e-2, logit_normal_loc=None)
        opt = make_optimizer(tc, mask=mask)
        step = make_train_step(cfg, opt, tc)
        state = opt.init(lora_params)
        batch = make_batch(cfg)
        for i in range(3):
            _, lora_params, state = step(
                lora_params, state, batch, jax.random.PRNGKey(i)
            )

        video = make_video_modality(cfg)
        runtime_out = np.asarray(jitted_forward(cfg)(lora_params, video))
        base_out = np.asarray(jitted_forward(cfg)(base, video))
        assert not np.allclose(runtime_out, base_out)  # training had effect

        path = tmp_path / "adapter.safetensors"
        export_lora_checkpoint(str(path), lora_params)
        fused, _ = fuse_lora_into_params(
            jax.tree_util.tree_map(jnp.copy, base),
            [LoRAConfig(path=str(path), strength=1.0)],
            return_deltas=True,
        )
        fused_out = np.asarray(jitted_forward(cfg)(fused, video))
        np.testing.assert_allclose(fused_out, runtime_out, atol=2e-4)

        stripped = strip_lora_params(lora_params)
        np.testing.assert_allclose(
            np.asarray(jitted_forward(cfg)(stripped, video)), base_out, atol=1e-6
        )

    def test_lora_cli(self, tmp_path):
        """scripts/train.py --lora-rank: trains adapters only and saves a
        reference-format LoRA file with A/B pairs for every target."""
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
        import train as train_cli

        from ltx2_tpu.loader.safetensors_io import SafetensorsFile

        out = tmp_path / "adapter.safetensors"
        train_cli.main([
            "--placeholder", "--synthetic", "2", "2", "3",
            "--steps", "2", "--lr", "1e-2", "--lora-rank", "4",
            "--save", str(out),
        ])
        f = SafetensorsFile(str(out))
        keys = list(f.keys())
        a_keys = [k for k in keys if k.endswith(".lora_A.weight")]
        b_keys = [k for k in keys if k.endswith(".lora_B.weight")]
        assert len(a_keys) == len(b_keys) > 0
        assert all(k.startswith("diffusion_model.") for k in keys)
        # Per-block unstacked: rank-4 A is (4, in).
        assert np.asarray(f.get(a_keys[0])).shape[0] == 4
        # Reference key scheme (not tree naming): to_out.0 / ff.net.0.proj /
        # ff.net.2 — the reference LoRA loader matches THESE base keys.
        assert any(".to_out.0.lora_A" in k for k in keys)
        assert any(".ff.net.0.proj.lora_A" in k for k in keys)
        assert any(".ff.net.2.lora_A" in k for k in keys)
        assert not any(".project_in." in k or ".project_out." in k for k in keys)

    def test_lora_tp_training_matches(self):
        """LoRA adapters shard with their base weights (B out-features on
        column-parallel targets, A in-features on row-parallel): TP x DP
        LoRA training produces the same losses as single-device."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ltx2_tpu.parallel.mesh import create_mesh
        from ltx2_tpu.parallel.sharding import shard_dit_params
        from ltx2_tpu.training.lora import add_lora_params, lora_trainable_mask

        cfg = tiny_config(
            num_attention_heads=4, attention_head_dim=16,
            cross_attention_dim=64, num_layers=2,
        )

        def fresh():
            lp, _ = add_lora_params(
                jax.random.PRNGKey(5),
                jax.tree_util.tree_map(jnp.copy, cached_params(cfg)),
                rank=4,
            )
            return lp

        tc = TrainConfig(learning_rate=1e-2, logit_normal_loc=None)
        batch = make_batch(cfg)

        def run(params, batch):
            mask = lora_trainable_mask(params)
            opt = make_optimizer(tc, mask=mask)
            step = make_train_step(cfg, opt, tc)
            state = opt.init(params)
            losses = []
            for i in range(3):
                loss, params, state = step(params, state, batch, jax.random.PRNGKey(i))
                losses.append(float(loss))
            return losses

        expected = run(fresh(), batch)

        mesh = create_mesh(data=2, model=4)
        sharded = shard_dit_params(mesh, fresh())
        q = sharded["transformer_blocks"]["attn1"]["to_q"]
        assert q["lora_B"].sharding.spec == P(None, "model", None)
        out = sharded["transformer_blocks"]["attn1"]["to_out"]
        assert out["lora_A"].sharding.spec == P(None, None, "model")
        dp = lambda a: jax.device_put(
            a, NamedSharding(mesh, P("data", *([None] * (a.ndim - 1))))
        )
        sharded_batch = TrainBatch(
            x0=dp(batch.x0), positions=dp(batch.positions), context=dp(batch.context)
        )
        got = run(sharded, sharded_batch)
        np.testing.assert_allclose(got, expected, rtol=2e-4)


class TestPrepareData:
    """scripts/prepare_data.py: pixels -> VAE-encoded, patchified,
    position-annotated dataset that train.py consumes directly."""

    def test_pixels_to_dataset_to_training(self, tmp_path):
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
        import prepare_data
        import train as train_cli

        px = (np.random.RandomState(0).rand(2, 3, 9, 64, 96) * 2 - 1).astype(
            np.float32
        )
        np.savez(tmp_path / "clips.npz", pixels=px)
        out = tmp_path / "lat.npz"
        prepare_data.main([
            "--pixels", str(tmp_path / "clips.npz"), "--placeholder",
            "--context-dim", "128", "--output", str(out),
        ])
        data = np.load(out)
        assert data["x0"].shape == (2, 12, 128)  # 2x2x3 latent grid
        assert data["positions"].shape == (2, 3, 12, 2)
        assert np.isfinite(data["x0"]).all()

        # The dataset feeds train.py directly (placeholder DiT is 128ch).
        train_cli.main([
            "--placeholder", "--data", str(out), "--steps", "2",
            "--batch-size", "2", "--lora-rank", "4",
            "--save", str(tmp_path / "adapter.safetensors"),
        ])
        assert (tmp_path / "adapter.safetensors").exists()

        # --pixels clips with a non-8k+1 frame count snap (trim) like the
        # --videos path instead of feeding the causal VAE bad geometry.
        px10 = (np.random.RandomState(1).rand(1, 3, 10, 64, 96) * 2 - 1).astype(
            np.float32
        )
        np.savez(tmp_path / "clips10.npz", pixels=px10)
        out10 = tmp_path / "lat10.npz"
        prepare_data.main([
            "--pixels", str(tmp_path / "clips10.npz"), "--placeholder",
            "--context-dim", "128", "--output", str(out10),
        ])
        # 10 -> 9 frames -> 2 latent frames -> 2*2*3 tokens.
        assert np.load(out10)["x0"].shape == (1, 12, 128)


class TestAVTraining:
    """Joint audio-video fine-tuning: both modalities share the per-sample
    sigma and the loss sums their flow-matching MSEs."""

    def test_av_loss_decreases(self):
        from ltx2_tpu.models.transformer.model import LTXModelType

        cfg = tiny_config(
            model_type=LTXModelType.AudioVideo, num_layers=2, audio_heads=4
        )
        params = jax.tree_util.tree_map(jnp.copy, cached_params(cfg))
        vb = make_batch(cfg)
        b, frames = 2, 4
        t = jnp.arange(frames, dtype=jnp.float32)[None, None, :].repeat(b, 0)
        batch = TrainBatch(
            x0=vb.x0,
            positions=vb.positions,
            context=vb.context,
            audio_x0=jax.random.normal(
                jax.random.PRNGKey(3), (b, frames, cfg.audio_in_channels)
            ),
            audio_positions=jnp.stack([t, t + 0.1], axis=-1),
            audio_context=jax.random.normal(
                jax.random.PRNGKey(4),
                (b, 5, cfg.caption_channels or cfg.audio_inner_dim),
            ) * 0.1,
        )
        tc = TrainConfig(learning_rate=3e-3, logit_normal_loc=None)
        opt = make_optimizer(tc)
        step = make_train_step(cfg, opt, tc)
        state = opt.init(params)
        losses = []
        for _ in range(40):
            loss, params, state = step(params, state, batch, jax.random.PRNGKey(7))
            losses.append(float(loss))
        assert losses[-1] < losses[0] / 5, (losses[0], losses[-1])
        assert np.isfinite(losses).all()


class TestAudioBranchFreeze:
    """An AV model trained on video-only batches: the audio branch's grads
    are exactly zero (the loss never touches it), but AdamW weight decay
    still shrinks the untrained audio weights every step — silently
    corrupting the checkpoint's audio capability at export.
    freeze_audio_branch_mask must keep the branch bit-identical."""

    @staticmethod
    def _av_cfg():
        from ltx2_tpu.models.transformer.model import LTXModelType

        return tiny_config(
            model_type=LTXModelType.AudioVideo, num_layers=2, audio_heads=4
        )

    @staticmethod
    def _split_leaves(params):
        import re

        from ltx2_tpu.training.trainer import AUDIO_BRANCH_PATTERN

        audio_re = re.compile(AUDIO_BRANCH_PATTERN)
        audio, video = {}, {}
        for path, leaf in jax.tree_util.tree_leaves_with_path(params):
            key = jax.tree_util.keystr(path).replace("']['", "/").strip("'[]")
            (audio if audio_re.search(key) else video)[key] = np.asarray(leaf)
        return audio, video

    def test_weight_decay_decays_untrained_audio_without_freeze(self):
        """Documents the hazard the freeze exists for: without a mask,
        wd > 0 changes audio weights that never received a gradient."""
        cfg = self._av_cfg()
        params = jax.tree_util.tree_map(jnp.copy, cached_params(cfg))
        audio_before, _ = self._split_leaves(params)
        assert audio_before, "AV config produced no audio-branch params"
        tc = TrainConfig(learning_rate=1e-2, weight_decay=0.1,
                         logit_normal_loc=None)
        opt = make_optimizer(tc)
        step = make_train_step(cfg, opt, tc)
        opt_state = opt.init(params)
        batch = make_batch(cfg)  # video-only
        for i in range(3):
            _, params, opt_state = step(
                params, opt_state, batch, jax.random.PRNGKey(i)
            )
        audio_after, _ = self._split_leaves(params)
        decayed = [k for k, b in audio_before.items()
                   if b.any() and not np.array_equal(audio_after[k], b)]
        assert decayed, "expected weight decay to move untrained audio params"

    def test_freeze_mask_keeps_audio_bit_identical(self):
        from ltx2_tpu.training import (
            freeze_audio_branch_mask,
            merge_params,
            partition_params,
        )

        cfg = self._av_cfg()
        params = jax.tree_util.tree_map(jnp.copy, cached_params(cfg))
        audio_before, video_before = self._split_leaves(params)
        mask = freeze_audio_branch_mask(params)
        tc = TrainConfig(learning_rate=1e-2, weight_decay=0.1,
                         logit_normal_loc=None)
        opt = make_optimizer(tc)
        step = make_train_step(cfg, opt, tc, trainable_mask=mask)
        trainable, frozen = partition_params(params, mask)
        opt_state = opt.init(trainable)
        batch = make_batch(cfg)  # video-only
        for i in range(3):
            _, trainable, opt_state = step(
                trainable, opt_state, frozen, batch, jax.random.PRNGKey(i)
            )
        merged = merge_params(trainable, frozen)
        audio_after, video_after = self._split_leaves(merged)
        for k, b in audio_before.items():
            assert np.array_equal(audio_after[k], b), f"audio leaf moved: {k}"
        changed = [k for k, b in video_before.items()
                   if not np.array_equal(video_after[k], b)]
        assert changed, "video branch should still train"

    def test_freeze_mask_intersects_existing_mask(self):
        """freeze_audio_branch_mask(params, mask) must freeze audio leaves
        a user regex selected (e.g. 'attn1' matches audio_attn1 too) while
        leaving the regex's video selections trainable."""
        from ltx2_tpu.training import freeze_audio_branch_mask

        cfg = self._av_cfg()
        params = cached_params(cfg)
        base = trainable_mask(params, lambda p: "attn1" in p)
        mask = freeze_audio_branch_mask(params, base)
        flags = {
            jax.tree_util.keystr(p).replace("']['", "/").strip("'[]"): m
            for p, m in jax.tree_util.tree_leaves_with_path(mask)
        }
        audio_attn = [k for k in flags if "audio_attn1" in k]
        video_attn = [k for k in flags
                      if "attn1" in k and "audio" not in k]
        assert audio_attn and video_attn
        assert not any(flags[k] for k in audio_attn)
        assert all(flags[k] for k in video_attn)

    def test_train_cli_av_freeze_on_video_only_data(self, tmp_path):
        """--placeholder --audio + a video-only npz + weight decay: the
        exported checkpoint's audio branch matches the init (freeze), the
        video branch trained."""
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
        import train as train_cli

        from ltx2_tpu.loader.weight_loader import load_transformer_params
        from ltx2_tpu.models.transformer.model import (
            LTXModelConfig,
            LTXModelType,
            init_ltx_model,
        )

        rng = np.random.RandomState(0)
        f, h, w = 2, 2, 3
        grid = np.asarray(create_position_grid(1, f, h, w), np.float32)
        pos = np.stack([grid, grid + 1], axis=-1)
        np.savez(
            tmp_path / "vid.npz",
            x0=rng.randn(4, f * h * w, 128).astype(np.float32),
            positions=np.repeat(pos, 4, axis=0),
            context=(rng.randn(4, 8, 128) * 0.1).astype(np.float32),
        )
        out = tmp_path / "tuned.safetensors"
        train_cli.main([
            "--placeholder", "--audio", "--data", str(tmp_path / "vid.npz"),
            "--steps", "3", "--batch-size", "2", "--seed", "0",
            # Aggressive lr*wd so an (incorrectly) decaying audio branch
            # would shrink far beyond bf16 export rounding.
            "--lr", "0.5", "--weight-decay", "0.5",
            "--save", str(out),
        ])
        tuned = load_transformer_params(
            str(out), include_audio=True, target_dtype="float32", num_layers=4
        )
        # The train.py placeholder AV config, same seed.
        cfg = LTXModelConfig(
            model_type=LTXModelType.AudioVideo,
            num_attention_heads=4, attention_head_dim=32, num_layers=4,
            cross_attention_dim=128, caption_channels=None,
            compute_dtype="bfloat16", remat=True,
            audio_heads=4, audio_head_dim=16,
            audio_in_channels=32, audio_out_channels=32,
        )
        init = jax.jit(lambda k: init_ltx_model(k, cfg))(jax.random.PRNGKey(0))
        a_t = np.asarray(tuned["audio_patchify_proj"]["weight"])
        a_0 = np.asarray(init["audio_patchify_proj"]["weight"], np.float32)
        np.testing.assert_allclose(a_t, a_0, atol=3e-3)  # frozen (export rounding)
        v_t = np.asarray(tuned["transformer_blocks"]["attn1"]["to_q"]["weight"])
        v_0 = np.asarray(init["transformer_blocks"]["attn1"]["to_q"]["weight"], np.float32)
        assert not np.allclose(v_t, v_0), "video branch did not train"

    def test_train_cli_av_synthetic_trains_both_branches(self, tmp_path):
        """--placeholder --audio --synthetic generates joint-AV batches:
        both modalities' weights move."""
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
        import train as train_cli

        from ltx2_tpu.loader.weight_loader import load_transformer_params
        from ltx2_tpu.models.transformer.model import (
            LTXModelConfig,
            LTXModelType,
            init_ltx_model,
        )

        out = tmp_path / "tuned.safetensors"
        train_cli.main([
            "--placeholder", "--audio", "--synthetic", "2", "2", "3",
            "--steps", "3", "--batch-size", "2", "--lr", "1e-2",
            "--seed", "0", "--save", str(out),
        ])
        tuned = load_transformer_params(
            str(out), include_audio=True, target_dtype="float32", num_layers=4
        )
        cfg = LTXModelConfig(
            model_type=LTXModelType.AudioVideo,
            num_attention_heads=4, attention_head_dim=32, num_layers=4,
            cross_attention_dim=128, caption_channels=None,
            compute_dtype="bfloat16", remat=True,
            audio_heads=4, audio_head_dim=16,
            audio_in_channels=32, audio_out_channels=32,
        )
        init = jax.jit(lambda k: init_ltx_model(k, cfg))(jax.random.PRNGKey(0))
        for key in ("audio_patchify_proj", "patchify_proj"):
            t = np.asarray(tuned[key]["weight"])
            z = np.asarray(init[key]["weight"], np.float32)
            assert not np.allclose(t, z), f"{key} did not train"


class TestPartitionedTrainStep:
    """trainable_mask in make_train_step differentiates ONLY the selected
    subtree (frozen params are loss constants — no grad/Adam buffers for
    them) and must match the optax-masked (zeroed-updates) approach."""

    def test_matches_masked_optimizer(self):
        from ltx2_tpu.training import partition_params

        cfg = tiny_config(num_layers=2)
        mask_fn = lambda params: trainable_mask(params, lambda p: "attn1" in p)
        batch = make_batch(cfg)
        tc = TrainConfig(learning_rate=1e-2, logit_normal_loc=None)

        # Reference: optax multi_transform zeroed-updates path.
        p1 = jax.tree_util.tree_map(jnp.copy, cached_params(cfg))
        opt1 = make_optimizer(tc, mask=mask_fn(p1))
        step1 = make_train_step(cfg, opt1, tc)
        s1 = opt1.init(p1)
        # Partitioned path: step carries only the trainable subtree.
        from ltx2_tpu.training import merge_params

        p2 = jax.tree_util.tree_map(jnp.copy, cached_params(cfg))
        m2 = mask_fn(p2)
        tr2, fz2 = partition_params(p2, m2)
        opt2 = make_optimizer(tc)
        step2 = make_train_step(cfg, opt2, tc, trainable_mask=m2)
        s2 = opt2.init(tr2)

        for i in range(3):
            l1, p1, s1 = step1(p1, s1, batch, jax.random.PRNGKey(i))
            l2, tr2, s2 = step2(tr2, s2, fz2, batch, jax.random.PRNGKey(i))
            np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
        p2 = merge_params(tr2, fz2)
        for (path1, a), (path2, b) in zip(
            jax.tree_util.tree_leaves_with_path(p1),
            jax.tree_util.tree_leaves_with_path(p2),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-6,
                err_msg=jax.tree_util.keystr(path1),
            )

    def test_fp8_frozen_base_lora(self):
        """QLoRA-style: fp8-serving frozen base + fp32 adapters. The loss
        must be finite and decrease with ONLY adapter updates."""
        from ltx2_tpu.loader.fp8 import quantize_params_fp8
        from ltx2_tpu.training import partition_params
        from ltx2_tpu.training.lora import add_lora_params, lora_trainable_mask

        cfg = tiny_config(num_layers=2)
        base = jax.jit(quantize_params_fp8)(
            jax.tree_util.tree_map(jnp.copy, cached_params(cfg))
        )
        params, n = add_lora_params(jax.random.PRNGKey(5), base, rank=4)
        assert n > 0
        mask = lora_trainable_mask(params)
        tc = TrainConfig(learning_rate=1e-2, logit_normal_loc=None)
        opt = make_optimizer(tc)
        step = make_train_step(cfg, opt, tc, trainable_mask=mask)
        trainable, frozen = partition_params(params, mask)
        state = opt.init(trainable)
        batch = make_batch(cfg)
        losses = []
        for _ in range(20):
            loss, trainable, state = step(
                trainable, state, frozen, batch, jax.random.PRNGKey(7)
            )
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0], (losses[0], losses[-1])


class TestScheduleEmaVal:
    """Round-3 additions: LR schedules (warmup + cosine/linear decay), EMA
    weight shadowing, and validation loss — production fine-tuning staples
    the inference-only reference never needed."""

    def test_learning_rate_schedule_shapes(self):
        from ltx2_tpu.training import TrainConfig, learning_rate_schedule

        # Plain constant: a float, no schedule machinery.
        assert learning_rate_schedule(TrainConfig(learning_rate=3e-4)) == 3e-4

        # Warmup + cosine: 0 at step 0, peak at warmup end, ~0 at horizon.
        tc = TrainConfig(
            learning_rate=1e-3, warmup_steps=10,
            lr_schedule="cosine", total_steps=110,
        )
        sched = learning_rate_schedule(tc)
        assert float(sched(0)) == 0.0
        np.testing.assert_allclose(float(sched(10)), 1e-3, rtol=1e-6)
        assert float(sched(110)) < 1e-3 * 1e-3

        # Linear decay reaches exactly 0; midpoint is half.
        tc = TrainConfig(learning_rate=1e-3, lr_schedule="linear", total_steps=100)
        sched = learning_rate_schedule(tc)
        np.testing.assert_allclose(float(sched(0)), 1e-3, rtol=1e-6)
        np.testing.assert_allclose(float(sched(50)), 5e-4, rtol=1e-5)
        np.testing.assert_allclose(float(sched(100)), 0.0, atol=1e-12)

        # Warmup + constant stays flat after warmup.
        tc = TrainConfig(learning_rate=1e-3, warmup_steps=4)
        sched = learning_rate_schedule(tc)
        np.testing.assert_allclose(float(sched(1000)), 1e-3, rtol=1e-6)

        # Decay without a horizon must refuse.
        with pytest.raises(ValueError, match="total_steps"):
            learning_rate_schedule(TrainConfig(lr_schedule="cosine"))
        with pytest.raises(ValueError, match="lr_schedule"):
            learning_rate_schedule(TrainConfig(lr_schedule="poly"))

    def test_ema_math_and_no_aliasing(self):
        from ltx2_tpu.training import ema_params, init_ema, make_ema_update

        target = {
            "a": jnp.full((3,), 2.0, jnp.float32),
            "b": {"w": jnp.full((2,), 4.0, jnp.bfloat16), "frozen": None},
        }
        ema = init_ema(target)
        update = make_ema_update(0.9)

        new1 = jax.tree_util.tree_map(lambda p: p * 0 + 10.0, target)
        ema = update(ema, new1)
        # After one update: 0.9 * init + 0.1 * 10
        np.testing.assert_allclose(np.asarray(ema["a"]), 0.9 * 2.0 + 1.0, rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(ema["b"]["w"]), 0.9 * 4.0 + 1.0, rtol=1e-2
        )
        ema = update(ema, new1)
        np.testing.assert_allclose(
            np.asarray(ema["a"]), 0.9 * (0.9 * 2.0 + 1.0) + 1.0, rtol=1e-6
        )

        # Cast-back preserves the live tree's dtypes.
        out = ema_params(ema, target)
        assert out["a"].dtype == jnp.float32
        assert out["b"]["w"].dtype == jnp.bfloat16
        assert out["b"]["frozen"] is None

        # No aliasing with donated targets: deleting the source buffers
        # (what a donating train step does) must leave the EMA usable.
        t2 = {"a": jnp.ones((4,), jnp.float32)}
        e2 = init_ema(t2)
        t2["a"].delete()
        assert float(jnp.sum(e2["a"])) == 4.0

    def test_train_cli_ema_warmup_val(self, tmp_path):
        """CLI wiring: --ema-decay exports the EMA (differs from the
        last-step weights of an identical run without EMA), --val-fraction
        holds out data, --warmup-steps/--lr-schedule run."""
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
        import train as train_cli

        from ltx2_tpu.loader.safetensors_io import SafetensorsFile

        common = [
            "--placeholder", "--synthetic", "2", "2", "3",
            "--synthetic-samples", "8", "--steps", "4", "--batch-size", "2",
            "--lr", "1e-2", "--lora-rank", "4", "--seed", "0",
            "--val-fraction", "0.25", "--eval-every", "2",
            "--warmup-steps", "2", "--lr-schedule", "cosine",
        ]
        plain = tmp_path / "plain.safetensors"
        ema = tmp_path / "ema.safetensors"
        train_cli.main(common + ["--save", str(plain)])
        train_cli.main(common + ["--ema-decay", "0.5", "--save", str(ema)])

        fa, fb = SafetensorsFile(str(plain)), SafetensorsFile(str(ema))
        assert set(fa.keys()) == set(fb.keys())
        # Same seed/schedule -> identical trajectory; the EMA export must
        # differ from the raw last-step weights on at least the B adapters
        # (A matrices move too; B starts at 0 so differences are largest).
        diffs = [
            float(np.abs(fa.get(k).astype(np.float32)
                         - fb.get(k).astype(np.float32)).max())
            for k in fa.keys()
        ]
        assert max(diffs) > 0.0
