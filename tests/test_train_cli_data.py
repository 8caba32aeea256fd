"""Train-CLI data plumbing: the SDXL real-data path must build dual-encoder
context + pooled embeds + time_ids per batch (VERDICT round-1 item 4;
reference `train_icd_xl_lora.py:822-861`)."""
import argparse
import csv
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("ds")
    rng = np.random.default_rng(0)
    rows = []
    for i in range(10):
        Image.fromarray(
            rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)
        ).save(root / f"img{i}.jpg")
        rows.append((f"img{i}.jpg", f"a photo number {i}"))
    with open(root / "train.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["file_name", "caption"])
        w.writerows(rows)
    return str(root)


def _args(**kw):
    ns = argparse.Namespace(
        model="sdxl", synthetic_data=False, data_subset="train",
        resolution=32, batch_size=4, seed=0,
    )
    for k, v in kw.items():
        setattr(ns, k, v)
    return ns


def test_sdxl_real_data_batch_has_added_cond(dataset, tiny_pipe_xl):
    from cli.train_icd import batch_iterator

    pipe = tiny_pipe_xl
    args = _args(data_root=dataset)
    batch = next(batch_iterator(args, pipe.unet.cfg, 16, pipe=pipe))
    assert batch["latents"].shape == (4, 16, 16, 4)
    assert batch["context"].shape == (4, 77, 64)
    added = batch["added_cond"]
    assert added["text_embeds"].shape == (4, 16)
    np.testing.assert_array_equal(
        np.asarray(added["time_ids"]), [[32, 32, 0, 0, 32, 32]] * 4
    )
    # distinct captions -> distinct contexts (the text encoder really ran)
    ctx = np.asarray(batch["context"])
    assert not np.array_equal(ctx[0], ctx[1])


def test_sdxl_real_data_batch_trains(dataset, tiny_pipe_xl):
    """The CLI-built SDXL batch must flow through the dual-student train
    step (added_cond reaches all four losses)."""
    import jax
    import numpy as np

    from cli.train_icd import batch_iterator
    from invertible_cd_tpu.diffusion.schedule import make_schedule
    from invertible_cd_tpu.diffusion.solver import make_train_solver
    from invertible_cd_tpu.parallel import make_mesh, shard_batch, shard_params
    from invertible_cd_tpu.training import (
        LossConfig, TrainConfig, init_train_state, make_train_step,
    )

    pipe = tiny_pipe_xl
    args = _args(data_root=dataset, batch_size=8)
    batch = next(batch_iterator(args, pipe.unet.cfg, 16, pipe=pipe))

    schedule = make_schedule()
    solver = make_train_solver(
        np.asarray(schedule.alphas_cumprod),
        num_endpoints=4, num_forward_endpoints=4,
        endpoints="0,259,519,779", forward_endpoints="259,519,779,999",
    )
    # CD losses only: this test pins the CLI->step data contract; the
    # preserve losses' added-cond coverage lives in test_training_sdxl,
    # and the full 4-loss tiny-SDXL compile costs minutes on 1 CPU core.
    tcfg = TrainConfig(
        lora_rank=4,
        use_forward_preserve=False,
        use_reverse_preserve=False,
        loss=LossConfig(w_embed_dim=pipe.unet.cfg.time_cond_proj_dim),
    )
    base = pipe.params["teacher"]
    mesh = make_mesh()
    with mesh:
        base = shard_params(base, mesh)
        state = init_train_state(jax.random.PRNGKey(0), base, tcfg)
        step_fn = make_train_step(
            pipe.unet, base, base, solver, schedule, tcfg, mesh
        )
        state, metrics = step_fn(
            state, base, base, shard_batch(batch, mesh), jax.random.PRNGKey(1)
        )
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k


def test_collect_val_batch_real_data(dataset, tiny_pipe):
    """The inversion-eval val set (C26) encodes real images + captions
    through the VAE/CLIP when a data_root is given."""
    from cli.train_icd import collect_val_batch

    args = _args(
        model="tiny", data_root=dataset, val_data_subset="train",
        synthetic_data=False,
    )
    out = collect_val_batch(args, tiny_pipe.unet.cfg, 16, tiny_pipe, n=3)
    assert out["latents"].shape == (3, 16, 16, 4)
    assert out["context"].shape[0] == 3
    # distinct captions -> distinct contexts
    ctx = np.asarray(out["context"])
    assert not np.array_equal(ctx[0], ctx[1])


def test_collect_val_batch_synthetic():
    """Synthetic mode produces deterministic val tensors (no dataset)."""
    from cli.train_icd import collect_val_batch
    from invertible_cd_tpu.models import UNetConfig

    args = _args(model="tiny", data_root=None, synthetic_data=True)
    cfg = UNetConfig.tiny()
    a = collect_val_batch(args, cfg, 8, None, n=4)
    b = collect_val_batch(args, cfg, 8, None, n=4)
    assert a["latents"].shape == (4, 8, 8, 4)
    np.testing.assert_array_equal(np.asarray(a["latents"]), np.asarray(b["latents"]))
