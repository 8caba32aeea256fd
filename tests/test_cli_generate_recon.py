"""cli/generate.py invert/reconstruct mode (reference
`running/sd1.5/generate.py:304-340` path_to_images branch): invert each
real benchmark image under its caption (forward-CD or 50-step DDIM) and
regenerate from the inverted latent, saving real/reconstruction pairs."""
import json
import os

import numpy as np
import pytest
from PIL import Image


@pytest.fixture()
def bench(tmp_path):
    rng = np.random.default_rng(7)
    img_root = tmp_path / "imgs"
    img_root.mkdir()
    for n in ("a.png", "b.png", "c.png"):
        Image.fromarray(
            rng.integers(0, 255, (32, 32, 3), np.uint8)
        ).save(img_root / n)
    csv = tmp_path / "gen.csv"
    csv.write_text(
        ",file_name,caption\n"
        "0,a.png,a cat on the beach\n"
        "1,b.png,a dog in the park\n"
        "2,c.png,a red car\n"
    )
    return str(csv), str(img_root)


def run_recon(tmp_path, bench, *extra):
    from cli.generate import main

    csv, img_root = bench
    out = str(tmp_path / "out")
    main([
        "--model", "tiny", "--benchmark", csv, "--image_root", img_root,
        "--batch_size", "2", "--num_ddim_steps", "6", "--out", out, *extra,
    ])
    with open(os.path.join(out, "reconstruction_metrics.json")) as f:
        summary = json.load(f)
    assert summary["n_images"] == 3
    recs = sorted(os.listdir(os.path.join(out, "generated_images")))
    reals = sorted(os.listdir(os.path.join(out, "real_images")))
    assert len(recs) == len(reals) == 3
    img = np.asarray(Image.open(os.path.join(out, "generated_images", recs[0])))
    assert img.shape == (32, 32, 3)
    return out


def test_recon_cons(tmp_path, bench):
    run_recon(tmp_path, bench)


def test_recon_ddim(tmp_path, bench):
    run_recon(tmp_path, bench, "--no-cons_inversion")


def test_recon_requires_benchmark(tmp_path, bench):
    from cli.generate import main

    _, img_root = bench
    with pytest.raises(SystemExit, match="benchmark"):
        main([
            "--model", "tiny", "--image_root", img_root,
            "--out", str(tmp_path / "out"),
        ])
