"""Generation-FID wiring on cli/generate.py (reference
`running/sd1.5/generate.py` computes FID of the generated set against
--path_to_fid_reference stats with the FID InceptionV3). Drives the CLI
end-to-end on the tiny bundle with synthetic Inception weights and a
random reference-stats npz."""
import json
import os

import numpy as np


def _synthetic_inception_pt(path):
    """Torch-style state dict with the FID-Inception names/shapes, built by
    inverting the flax tree (same construction as tests/test_convert.py)."""
    import jax
    import jax.numpy as jnp
    import torch

    from invertible_cd_tpu.metrics.inception import InceptionV3Features

    mod = InceptionV3Features(resize_input=False)
    variables = mod.init(jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3)))
    sd = {}
    for keypath, leaf in jax.tree_util.tree_flatten_with_path(variables)[0]:
        keys = [k.key for k in keypath]
        path_keys = keys[1:]
        torch_name = ".".join(path_keys[:-1])
        last = path_keys[-1]
        arr = np.asarray(leaf)
        if last == "kernel":
            sd[f"{torch_name}.weight"] = torch.from_numpy(
                arr.transpose(3, 2, 0, 1).copy()
            )
        elif last == "scale":
            sd[f"{torch_name}.weight"] = torch.from_numpy(arr.copy())
        elif last == "bias":
            sd[f"{torch_name}.bias"] = torch.from_numpy(arr.copy())
        elif last == "mean":
            sd[f"{torch_name}.running_mean"] = torch.from_numpy(arr.copy())
        elif last == "var":
            sd[f"{torch_name}.running_var"] = torch.from_numpy(arr.copy())
    torch.save(sd, path)


def test_generate_cli_fid(tmp_path):
    from cli.generate import main

    weights = str(tmp_path / "inception.pt")
    _synthetic_inception_pt(weights)
    rng = np.random.default_rng(0)
    stats = str(tmp_path / "ref_stats.npz")
    feats = rng.normal(size=(64, 2048)).astype(np.float64)
    np.savez(stats, mu=feats.mean(0), sigma=np.cov(feats, rowvar=False))

    out = str(tmp_path / "out")
    main([
        "--model", "tiny", "--prompt", "a cat", "--prompt", "a dog",
        "--batch_size", "2", "--out", out, "--calc_metrics",
        "--fid_stats", stats, "--inception_weights", weights,
    ])
    with open(os.path.join(out, "metrics.json")) as f:
        metrics = json.load(f)
    assert metrics["n_images"] == 2
    assert metrics["fid"] is not None and np.isfinite(metrics["fid"])
    # scorerless metrics stay None rather than crashing
    assert metrics["clip_score"] is None
