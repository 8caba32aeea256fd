"""cli/edit.py DDIM-inversion baselines (reference NTI/NPI launch scripts).

The reference ships three editing entry configurations
(`running/sd1.5/launch_editing_{iCD,NTI,NPI}_sd1.5.sh`): consistency
editing, Null-Text-Inversion editing and Negative-Prompt-Inversion
editing — the latter two run 50-step DDIM inversion + CFG DDIM sampling
with the p2p controller on the TEACHER model
(`running/sd1.5/edit.py:363-397`). These tests drive all three modes
end-to-end through the CLI on the tiny bundle (6-step grid via the
reference's --num_ddim_steps flag, so CPU stays fast).
"""
import json
import os
import pickle

import numpy as np
import pytest
from PIL import Image


@pytest.fixture()
def input_image(tmp_path):
    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (32, 32, 3), np.uint8)
    path = tmp_path / "in.png"
    Image.fromarray(img).save(path)
    return str(path)


def run_edit(tmp_path, input_image, *extra):
    from cli.edit import main

    out = str(tmp_path / "out")
    main([
        "--model", "tiny", "--image", input_image,
        "--source", "a cat on the beach", "--target", "a dog on the beach",
        "--out", out, "--num_ddim_steps", "6", *extra,
    ])
    with open(os.path.join(out, "results.json")) as f:
        res = json.load(f)
    assert len(res["results"]) == 1
    edited = np.asarray(Image.open(res["results"][0]["file"]))
    assert edited.shape == (32, 32, 3)
    return edited


def test_baseline_ddim(tmp_path, input_image):
    run_edit(tmp_path, input_image, "--baseline", "ddim")


def test_baseline_npi(tmp_path, input_image):
    run_edit(tmp_path, input_image, "--baseline", "npi")


def test_baseline_nti_with_cache(tmp_path, input_image):
    cache = str(tmp_path / "uncond.pkl")
    edited = run_edit(
        tmp_path, input_image, "--baseline", "nti",
        "--nti_inner_steps", "2", "--uncond_cache", cache,
    )
    # cache round trip: keyed by source prompt, (n_steps, 1, 77, D)
    with open(cache, "rb") as f:
        stored = pickle.load(f)
    (prompt, arr), = stored.items()
    assert prompt == "a cat on the beach"
    assert arr.shape[0] == 6 and arr.shape[2] == 77
    # second run must reuse the cache (and reproduce the image bit-exactly,
    # since the cached embeddings fully determine the trajectory)
    edited2 = run_edit(
        tmp_path, input_image, "--baseline", "nti",
        "--nti_inner_steps", "2", "--uncond_cache", cache,
    )
    np.testing.assert_array_equal(edited, edited2)


def test_is_replacement_strict_mode(tmp_path, input_image):
    """--is_replacement (reference edit.py:355-359,410-415): benchmark rows
    that are not one-word same-length swaps are skipped; kept rows run the
    forced replace controller with blend/equalizer on the swapped pair."""
    import shutil

    from cli.edit import main

    img_root = tmp_path / "imgs"
    img_root.mkdir()
    shutil.copy(input_image, img_root / "a.png")
    shutil.copy(input_image, img_root / "b.png")
    shutil.copy(input_image, img_root / "c.png")
    csv = tmp_path / "edit.csv"
    csv.write_text(
        ",file_name,old_caption,edited_caption,blended_words\n"
        "0,a.png,a cat on grass,a dog on grass,\"('cat', 'dog')\"\n"
        "1,b.png,a cake,a big square cake, \n"   # length mismatch -> skip
        "2,c.png,red car blue sky,red bus blue sea, \n"  # 2 diffs -> skip
    )
    out = str(tmp_path / "out")
    main([
        "--model", "tiny", "--benchmark", str(csv),
        "--image_root", str(img_root), "--out", out, "--is_replacement",
    ])
    with open(os.path.join(out, "results.json")) as f:
        res = json.load(f)
    assert len(res["results"]) == 1
    assert res["results"][0]["source"] == "a cat on grass"


def test_is_replacement_changes_controller(tmp_path, input_image):
    """Forcing the replace controller + equalizer must alter the edit
    relative to the default heuristic path (amplify off by default there)."""
    a = run_edit(tmp_path, input_image, "--is_replacement")
    b = run_edit(tmp_path, input_image)
    assert not np.array_equal(a, b)


def test_baseline_rejects_sdxl(tmp_path, input_image):
    """--baseline is SD1.5-only; SDXL must fail fast, not silently run the
    cons protocol at the baseline guidance default."""
    from cli.edit import main

    with pytest.raises(SystemExit, match="SD1.5-only"):
        main([
            "--model", "sdxl", "--image", input_image,
            "--source", "a cat", "--target", "a dog",
            "--out", str(tmp_path / "out"), "--baseline", "nti",
        ])


def test_nti_cache_stale_grid_recomputed(tmp_path, input_image):
    """A cache entry recorded on a different --num_ddim_steps grid is
    recomputed (and overwritten), not broadcast into a shape error."""
    cache = str(tmp_path / "uncond.pkl")
    run_edit(tmp_path, input_image, "--baseline", "nti",
             "--nti_inner_steps", "1", "--uncond_cache", cache)
    with open(cache, "rb") as f:
        assert next(iter(pickle.load(f).values())).shape[0] == 6
    # re-run on a 4-step grid against the 6-step cache
    from cli.edit import main

    out2 = str(tmp_path / "out4")
    main([
        "--model", "tiny", "--image", input_image,
        "--source", "a cat on the beach", "--target", "a dog on the beach",
        "--out", out2, "--num_ddim_steps", "4", "--baseline", "nti",
        "--nti_inner_steps", "1", "--uncond_cache", cache,
    ])
    with open(cache, "rb") as f:
        assert next(iter(pickle.load(f).values())).shape[0] == 4


def test_is_replacement_amplify_zero_respected():
    """--amplify 0 must disable amplification (equalizer value 0), not
    fall back to the 3.0 default through a falsy-zero check."""
    import argparse

    from cli.edit import _build_edit_controller
    from invertible_cd_tpu.testing import tiny_bundle

    pipe = tiny_bundle()
    ns = argparse.Namespace(
        is_replacement=True, no_blend=False, amplify=0.0,
        cross_replace_steps=0.6, self_replace_steps=0.4,
    )
    spec, arrays = _build_edit_controller(
        pipe, ns, "a cat here", "a dog here", (), 4
    )
    eq = np.asarray(arrays.equalizer)
    assert eq.min() == 0.0  # the swapped word's column is zeroed
    ns.amplify = None
    spec, arrays = _build_edit_controller(
        pipe, ns, "a cat here", "a dog here", (), 4
    )
    assert np.asarray(arrays.equalizer).max() == 3.0


def test_baseline_differs_from_cons(tmp_path, input_image):
    """The baseline path must actually take the DDIM branch: teacher-model
    50(->6)-step editing produces a different image than 4-step cons."""
    a = run_edit(tmp_path, input_image, "--baseline", "ddim")
    b = run_edit(tmp_path, input_image)
    assert not np.array_equal(a, b)
