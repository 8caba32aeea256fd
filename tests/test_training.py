"""Training step tests: losses are finite, only LoRA updates, dp-sharded
step runs on the virtual 8-device mesh."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from invertible_cd_tpu.diffusion.schedule import make_schedule
from invertible_cd_tpu.diffusion.solver import make_train_solver
from invertible_cd_tpu.models import UNet2DCondition, UNetConfig
from invertible_cd_tpu.parallel import make_mesh, shard_batch
from invertible_cd_tpu.training import (
    ICDTrainState,
    LossConfig,
    TrainConfig,
    init_train_state,
    make_train_step,
    sample_w,
)


@pytest.fixture(scope="module")
def setup():
    """One mesh, one replicated base, ONE compiled train-step
    specialization shared by every test below — each extra (sharding,
    placement) combination would re-trace the full 4-loss step (~40 s on
    this 1-core CPU runner)."""
    from invertible_cd_tpu.parallel import replicated

    cfg = UNetConfig.tiny()
    unet = UNet2DCondition(cfg)
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((1, 8, 8, 4))
    ctx = jnp.zeros((1, 77, cfg.cross_attention_dim))
    wv = jnp.zeros((1, cfg.time_cond_proj_dim))
    base = unet.init(rng, sample, jnp.zeros((1,), jnp.int32), ctx, wv)
    schedule = make_schedule()
    solver = make_train_solver(
        np.asarray(schedule.alphas_cumprod),
        num_endpoints=4, num_forward_endpoints=4,
        endpoints="0,259,519,779", forward_endpoints="259,519,779,999",
    )
    tcfg = TrainConfig(
        lora_rank=4,
        loss=LossConfig(w_embed_dim=cfg.time_cond_proj_dim),
    )
    mesh = make_mesh(dp=8, fsdp=1)
    base = jax.tree.map(lambda x: jax.device_put(x, replicated(mesh)), base)

    def fresh_state(seed):
        st = init_train_state(jax.random.PRNGKey(seed), base, tcfg)
        return jax.tree.map(lambda x: jax.device_put(x, replicated(mesh)), st)

    step = make_train_step(unet, base, base, solver, schedule, tcfg)
    return unet, cfg, base, schedule, solver, tcfg, mesh, fresh_state, step


def make_batch(cfg, b=8, seed=0):
    k = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(k)
    return {
        "latents": jax.random.normal(k1, (b, 8, 8, 4)),
        "context": jax.random.normal(k2, (b, 77, cfg.cross_attention_dim)) * 0.1,
    }


class TestTrainStep:
    def test_losses_finite_and_state_advances(self, setup):
        unet, cfg, base, schedule, solver, tcfg, mesh, fresh_state, step = setup
        batch = shard_batch(make_batch(cfg), mesh)
        new_state, metrics = step(fresh_state(4), base, base, batch, jax.random.PRNGKey(2))
        assert int(new_state.step) == 1
        for k, v in metrics.items():
            assert np.isfinite(float(v)), (k, v)
        for k in (
            "reverse_cd_loss", "forward_cd_loss",
            "forward_preserve_loss", "reverse_preserve_loss",
        ):
            assert k in metrics

    def test_lora_updates_are_nonzero(self, setup):
        unet, cfg, base, schedule, solver, tcfg, mesh, fresh_state, step = setup
        batch = shard_batch(make_batch(cfg, seed=3), mesh)
        # the train step donates its state arg -> make a fresh one
        new_state, _ = step(fresh_state(5), base, base, batch, jax.random.PRNGKey(3))
        # 'up' matrices start at 0; after one step some must move.
        def max_abs(tree):
            return max(float(jnp.max(jnp.abs(v["up"]))) for v in tree.values())
        assert max_abs(new_state.lora_reverse) > 0
        assert max_abs(new_state.lora_forward) > 0

    def test_sample_w_discrete(self, setup):
        tcfg = TrainConfig(discrete_w=(0.0, 7.0, 19.0))
        w = sample_w(jax.random.PRNGKey(0), 64, tcfg)
        assert set(np.unique(np.asarray(w))).issubset({0.0, 7.0, 19.0})

    def test_dp_sharded_step(self, setup):
        unet, cfg, base, schedule, solver, tcfg, mesh, fresh_state, step = setup
        batch = shard_batch(make_batch(cfg, b=8, seed=4), mesh)
        new_state, metrics = step(fresh_state(9), base, base, batch, jax.random.PRNGKey(4))
        assert np.isfinite(float(metrics["reverse_total_loss"]))
        # batch really is dp-sharded over the mesh
        assert len(batch["latents"].sharding.device_set) == 8


class TestResumeOnMesh:
    def test_restored_state_steps_on_mesh(self, setup, tmp_path):
        """orbax restore lands on the default device; the state must be
        device_put back onto the mesh before stepping (regression for the
        resume bug fixed in cli/train_icd.py)."""
        from invertible_cd_tpu.parallel import replicated
        from invertible_cd_tpu.training.checkpoint import (
            restore_checkpoint, save_checkpoint,
        )

        unet, cfg, base, schedule, solver, tcfg, mesh, fresh_state, step = setup
        st = fresh_state(11)
        d = str(tmp_path / "ckpt")
        save_checkpoint(d, st, keep=1)
        restored = restore_checkpoint(d, init_train_state(jax.random.PRNGKey(12), base, tcfg))
        restored = jax.tree.map(
            lambda x: jax.device_put(x, replicated(mesh)), restored
        )
        batch = shard_batch(make_batch(cfg, b=8, seed=7), mesh)
        new_state, metrics = step(restored, base, base, batch, jax.random.PRNGKey(7))
        assert np.isfinite(float(metrics["reverse_total_loss"]))
        assert int(new_state.step) == 1

    def test_cross_mesh_restore(self, setup, tmp_path):
        """The multi-pod operational path (reference analog
        `train_icd_sd15_lora.py:828-857`): a checkpoint saved under one
        mesh shape must restore bit-identically under another — dp4
        (replicated params) -> dp2xfsdp2 (genuinely fsdp-sharded leaves)
        and back — and the round-tripped state must take a finite step."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from invertible_cd_tpu.parallel import replicated
        from invertible_cd_tpu.parallel.mesh import param_sharding
        from invertible_cd_tpu.training.checkpoint import (
            restore_checkpoint, save_checkpoint,
        )

        unet, cfg, base, schedule, solver, tcfg, mesh, fresh_state, step = setup
        devs = jax.devices()[:4]
        mesh_a = make_mesh(dp=4, devices=devs)
        mesh_b = make_mesh(dp=2, fsdp=2, devices=devs)

        def put(state, target_mesh, min_size=None):
            if min_size is None:
                return jax.tree.map(
                    lambda x: jax.device_put(x, replicated(target_mesh)), state
                )
            sh = param_sharding(
                jax.tree.map(lambda x: x, state), target_mesh, min_size=min_size
            )
            return jax.tree.map(jax.device_put, state, sh)

        st = put(fresh_state(21), mesh_a)  # dp4, replicated (DDP semantics)
        d = str(tmp_path / "xmesh")
        save_checkpoint(d, st, keep=1)

        # restore onto dp2xfsdp2 with real fsdp sharding of the adapters
        template = put(
            init_train_state(jax.random.PRNGKey(22), base, tcfg),
            mesh_b, min_size=64,
        )
        restored_b = restore_checkpoint(d, template)
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)
            ),
            _as_tree(st), _as_tree(restored_b),
        )
        # at least one adapter leaf must actually be split over fsdp
        fsdp_split = [
            v for v in jax.tree.leaves(restored_b.lora_reverse)
            if isinstance(v.sharding, NamedSharding)
            and v.sharding.mesh.shape.get("fsdp", 1) == 2
            and not v.sharding.is_fully_replicated
        ]
        assert fsdp_split, "no lora leaf came back fsdp-sharded"

        # reverse direction: save the fsdp-sharded state, restore onto the
        # session mesh replicated, and take a step with the shared program
        d2 = str(tmp_path / "xmesh2")
        save_checkpoint(d2, restored_b, keep=1)
        back = restore_checkpoint(
            d2, init_train_state(jax.random.PRNGKey(23), base, tcfg)
        )
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)
            ),
            _as_tree(st), _as_tree(back),
        )
        back = jax.tree.map(
            lambda x: jax.device_put(x, replicated(mesh)), back
        )
        batch = shard_batch(make_batch(cfg, b=8, seed=8), mesh)
        new_state, metrics = step(back, base, base, batch, jax.random.PRNGKey(8))
        assert np.isfinite(float(metrics["reverse_total_loss"]))
        assert int(new_state.step) == 1


def _as_tree(state):
    return {
        "step": state.step,
        "lora_reverse": state.lora_reverse,
        "lora_forward": state.lora_forward,
        "opt_reverse": state.opt_reverse,
        "opt_forward": state.opt_forward,
    }


class TestSplitStep:
    def test_split_matches_fused(self, setup):
        """split=True (two XLA programs) must produce the same updates as
        the fused step — both halves read the pre-step counterpart and the
        same rng."""
        from invertible_cd_tpu.training import make_train_step

        unet, cfg, base, schedule, solver, tcfg, mesh, fresh_state, step = setup
        split_step = make_train_step(
            unet, base, base, solver, schedule, tcfg, split=True
        )
        batch = shard_batch(make_batch(cfg, seed=21), mesh)
        rng = jax.random.PRNGKey(21)
        fused_state, fused_m = step(fresh_state(30), base, base, batch, rng)
        split_state, split_m = split_step(fresh_state(30), base, base, batch, rng)
        assert set(fused_m) == set(split_m)
        for k in fused_m:
            np.testing.assert_allclose(
                float(fused_m[k]), float(split_m[k]), rtol=2e-5, atol=1e-6
            )
        for a, b in zip(
            jax.tree.leaves(fused_state.lora_reverse),
            jax.tree.leaves(split_state.lora_reverse),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
            )
        assert int(split_state.step) == 1


def test_shard_batch_divisibility_error():
    """A batch not divisible by dp must fail with an actionable message,
    not XLA's raw pjit_check_aval_sharding error (VERDICT r2 item 4)."""
    mesh = make_mesh(dp=8, fsdp=1)
    batch = {"latents": jnp.zeros((4, 8, 8, 4))}
    with pytest.raises(ValueError, match="not divisible by the mesh's dp=8"):
        shard_batch(batch, mesh)
    # divisible batches still shard
    out = shard_batch({"latents": jnp.zeros((8, 8, 8, 4))}, mesh)
    assert out["latents"].sharding.spec[0] == "dp"


def test_train_cli_rejects_indivisible_batch(tmp_path):
    """The CLI exits with a friendly message before building any model."""
    import sys

    sys.path.insert(0, "cli")
    try:
        import train_icd
    finally:
        sys.path.pop(0)
    with pytest.raises(SystemExit, match="not divisible"):
        train_icd.main([
            "--model", "tiny", "--synthetic_data", "--max_steps", "1",
            "--batch_size", "3", "--output_dir", str(tmp_path),
        ])


def test_train_cli_inversion_eval_cadence(tmp_path):
    """End-to-end tiny CLI run driving the forward-student eval wiring
    (VERDICT r2 item 2 / C26): triptych panels + eval_inversion metrics on
    cadence, mirroring reference train_icd_sd15_lora.py:1049,1085."""
    import sys

    sys.path.insert(0, "cli")
    try:
        import train_icd
    finally:
        sys.path.pop(0)
    out = str(tmp_path / "run")
    train_icd.main([
        "--model", "tiny", "--synthetic_data", "--max_steps", "2",
        "--batch_size", "8", "--output_dir", out,
        "--validation_steps", "2", "--validation_prompts_max", "1",
        "--validation_batch", "2", "--inversion_validation_samples", "2",
        "--inversion_eval_steps", "2", "--inversion_eval_samples", "4",
        "--checkpointing_steps", "2", "--log_every", "1",
    ])
    import json

    metrics = [
        json.loads(line)
        for line in open(os.path.join(out, "logs", "metrics.jsonl"))
    ]
    keys = {k for m in metrics for k in m}
    # eval_inversion ran and logged the recon MSE
    assert "eval/inversion_latent_mse" in keys
    # the triptych panel pass ran (its own latent-MSE scalar)
    assert "inversion_panel_latent_mse" in keys
    # the reverse-student validation panels also ran on the same cadence
    assert "validation_image_std" in keys


class TestLazyLora:
    def test_lazy_step_matches_merged_step(self, setup):
        """lazy_lora=True must reproduce the merged-parameter step exactly
        (linearity of dense/conv): same metrics, same updated adapters —
        from a state whose adapters are NON-zero so the low-rank path
        actually contributes."""
        import dataclasses

        unet, cfg, base, schedule, solver, tcfg, mesh, fresh_state, step = setup

        def bumped():
            # fresh buffers each time: the train step donates its state
            st = fresh_state(31)
            bump = jax.tree.map(
                lambda v: v + 0.03 * jax.random.normal(
                    jax.random.PRNGKey(32), v.shape, v.dtype
                ),
                {"r": st.lora_reverse, "f": st.lora_forward},
            )
            return dataclasses.replace(
                st, lora_reverse=bump["r"], lora_forward=bump["f"]
            )

        st = bumped()
        st2 = bumped()

        lazy_step = make_train_step(
            unet, base, base, solver, schedule,
            dataclasses.replace(tcfg, lazy_lora=True),
        )
        batch = shard_batch(make_batch(cfg, b=8, seed=33), mesh)
        s_merged, m_merged = step(st, base, base, batch, jax.random.PRNGKey(34))
        s_lazy, m_lazy = lazy_step(st2, base, base, batch, jax.random.PRNGKey(34))
        for k in m_merged:
            a, b_ = float(m_merged[k]), float(m_lazy[k])
            assert abs(a - b_) < 5e-4 + 5e-4 * abs(a), (k, a, b_)
        worst = max(
            float(jnp.abs(a - b_).max())
            for a, b_ in zip(
                jax.tree.leaves(s_merged.lora_reverse),
                jax.tree.leaves(s_lazy.lora_reverse),
            )
        )
        assert worst < 5e-5, worst


class TestSkipNonfinite:
    """skip_nonfinite guards the adapters against NaN/Inf gradients
    (optax apply_if_finite wrapping). The reference has no equivalent —
    a bad batch silently poisons its peft adapters."""

    def test_optimizer_skips_nonfinite_and_recovers(self):
        from invertible_cd_tpu.training.trainer import make_optimizer

        opt = make_optimizer(
            TrainConfig(skip_nonfinite=True, max_nonfinite_skips=3)
        )
        params = {"w": jnp.ones((4,))}
        state = opt.init(params)
        bad = {"w": jnp.array([1.0, jnp.nan, 0.0, 2.0])}
        upd, state = opt.update(bad, state, params)
        assert float(jnp.abs(upd["w"]).max()) == 0.0
        assert int(state.total_notfinite) == 1
        good = {"w": jnp.ones((4,))}
        upd, state = opt.update(good, state, params)
        assert float(jnp.abs(upd["w"]).max()) > 0.0
        assert int(state.notfinite_count) == 0  # consecutive counter reset
        assert int(state.total_notfinite) == 1

    def test_nan_batch_leaves_adapters_unchanged(self, setup):
        """End to end: a NaN batch through the real train step must not
        move either student and must report the skip in metrics."""
        import dataclasses

        unet, cfg, base, schedule, solver, tcfg, mesh, fresh_state, step = setup
        guarded_cfg = dataclasses.replace(
            tcfg,
            skip_nonfinite=True,
            # cd2-only keeps this one-off specialization's compile small
            use_forward_preserve=False,
            use_reverse_preserve=False,
        )
        guarded_step = make_train_step(
            unet, base, base, solver, schedule, guarded_cfg
        )
        st = init_train_state(jax.random.PRNGKey(7), base, guarded_cfg)
        before = jax.tree.map(jnp.copy, {"r": st.lora_reverse,
                                         "f": st.lora_forward})
        step_before = int(st.step)  # the train step donates st's buffers
        batch = make_batch(cfg, b=8, seed=40)
        batch["latents"] = batch["latents"].at[0, 0, 0, 0].set(jnp.nan)
        batch = shard_batch(batch, mesh)
        new_state, metrics = guarded_step(
            st, base, base, batch, jax.random.PRNGKey(41)
        )
        assert int(metrics["reverse_nonfinite_skips"]) == 1
        assert int(metrics["forward_nonfinite_skips"]) == 1
        for key, tree in (("r", new_state.lora_reverse),
                          ("f", new_state.lora_forward)):
            for a, b_ in zip(jax.tree.leaves(before[key]),
                             jax.tree.leaves(tree)):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))
        # the guarded step still advances the step counter
        assert int(new_state.step) == step_before + 1
