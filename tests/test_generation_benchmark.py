"""Generation-benchmark stand-ins + the generation eval harness
end-to-end (VERDICT r4 item 5; C30/C15).

The reference's generation eval runs CLIP/ImageReward scoring over the
COCO-caption (8,817 rows) and Parti-Prompts (128 rows) CSVs
(`running/sd1.5/generate.py:404-425`, `utils/loading.py:151-175`). Those
assets can't enter this container, so tools/make_benchmark_standin.py
vendors schema-exact stand-ins (benchmarks/generation_coco_standin.csv,
600 rows; benchmarks/generation_parti_standin.csv, 128 rows). These
tests drive `cli/generate.py --benchmark ... --calc_metrics` over them on
the tiny bundle and pin that a multi-batch sweep rides ONE compiled
program (the edit_sweep discipline applied to generation — the tail batch
is padded, not recompiled)."""
import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.make_benchmark_standin import (  # noqa: E402
    write_generation_csvs,
)

_BENCH_DIR = os.path.join(os.path.dirname(__file__), "..", "benchmarks")


class TestSchemas:
    def test_vendored_csvs_match_reference_schemas(self):
        """The in-repo CSVs parse through both loader paths."""
        from invertible_cd_tpu.data import load_benchmark

        coco = os.path.join(_BENCH_DIR, "generation_coco_standin.csv")
        parti = os.path.join(_BENCH_DIR, "generation_parti_standin.csv")

        prompts = load_benchmark(coco, kind="generation")
        assert len(prompts) == 600
        assert all(p.endswith(".") for p in prompts)  # sentence captions

        pairs = load_benchmark(coco, kind="generation", with_files=True)
        assert len(pairs) == 600
        assert pairs[0][0].startswith("COCO_standin_")

        # Parti schema: (id, caption), NO file_name column — sniffed as
        # generation; with_files falls back to "<id>.jpg"
        pp = load_benchmark(parti)
        assert len(pp) == 128
        pp_files = load_benchmark(parti, with_files=True)
        assert pp_files[0][0] == "0.jpg"
        assert len({n for n, _ in pp_files}) == 128

    def test_regenerable(self, tmp_path):
        """The tool reproduces the vendored files byte-for-byte."""
        coco, parti = write_generation_csvs(
            str(tmp_path / "coco.csv"), str(tmp_path / "parti.csv")
        )
        for fresh, vendored in [
            (coco, os.path.join(_BENCH_DIR, "generation_coco_standin.csv")),
            (parti, os.path.join(_BENCH_DIR, "generation_parti_standin.csv")),
        ]:
            with open(fresh, "rb") as a, open(vendored, "rb") as b:
                assert a.read() == b.read(), vendored


class TestGenerationSweep:
    def _run(self, tiny_pipe, out, benchmark, max_cnt, batch_size=4):
        from cli.generate import main

        main(
            [
                "--model", "tiny", "--benchmark", benchmark,
                "--max_cnt", str(max_cnt), "--batch_size", str(batch_size),
                "--out", out, "--calc_metrics", "--seed", "7",
            ],
            _pipe=tiny_pipe,
        )
        with open(os.path.join(out, "metrics.json")) as f:
            metrics = json.load(f)
        with open(os.path.join(out, "manifest.json")) as f:
            manifest = json.load(f)
        return metrics, manifest

    def test_coco_sweep_one_program(self, tiny_pipe, tmp_path):
        """10 rows at batch 4 = two full batches + a padded tail; the
        program set must not grow after the first batch."""
        coco = os.path.join(_BENCH_DIR, "generation_coco_standin.csv")

        m1, _ = self._run(tiny_pipe, str(tmp_path / "warm"), coco, max_cnt=4)
        programs = len(tiny_pipe._jit_cache)

        m2, manifest = self._run(
            tiny_pipe, str(tmp_path / "full"), coco, max_cnt=10
        )
        assert len(tiny_pipe._jit_cache) == programs, (
            "generation sweep recompiled (tail batch must be padded)"
        )
        assert m2["n_images"] == 10
        assert len(manifest["files"]) == 10
        assert all(os.path.exists(p) for p in manifest["files"])
        # weight-gated metrics report None, never crash (no weights here)
        assert m2["clip_score"] is None and m2["image_reward"] is None

    def test_parti_sweep(self, tiny_pipe, tmp_path):
        parti = os.path.join(_BENCH_DIR, "generation_parti_standin.csv")
        m, manifest = self._run(
            tiny_pipe, str(tmp_path / "parti"), parti, max_cnt=6
        )
        assert m["n_images"] == 6
        assert len(manifest["prompts"]) == 6


@pytest.mark.slow
def test_full_600_row_coco_sweep(tmp_path):
    """The complete 600-row protocol on the tiny bundle: one compiled
    program for all 150 batches (compare program count at 1 batch vs
    600 rows)."""
    from cli.generate import main
    from invertible_cd_tpu.testing import tiny_bundle

    coco = os.path.join(_BENCH_DIR, "generation_coco_standin.csv")
    pipe = tiny_bundle()

    def run(out, max_cnt):
        main(
            ["--model", "tiny", "--benchmark", coco, "--max_cnt",
             str(max_cnt), "--batch_size", "4", "--out", out,
             "--calc_metrics"],
            _pipe=pipe,
        )

    run(str(tmp_path / "warm"), 4)
    programs = len(pipe._jit_cache)
    run(str(tmp_path / "full"), 600)
    assert len(pipe._jit_cache) == programs
    with open(str(tmp_path / "full/metrics.json")) as f:
        assert json.load(f)["n_images"] == 600
