"""bench.py --mode all plan sanity (no chip needed).

The driver runs bare `python bench.py`; a MODE_PLAN entry that drifts
out of the argparse choices would make its subprocess exit 2 and
silently drop that config from BENCH_r*.json. Pin the wiring here."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import bench


def test_mode_plan_entries_are_valid_modes():
    src_choices = {
        "all", "gen", "gen_int8", "gen_int8_vae", "latency",
        "latency_int8", "gen_int8_static", "edit", "edit_sweep",
        "sdxl", "sdxl_int8", "sdxl_edit", "serve", "train",
        "train4", "train_lazy", "sdxl_train",
    }
    for mode, cap in bench.MODE_PLAN:
        assert mode in src_choices, mode
        assert mode != "all"
        assert 60 <= cap <= 1800, (mode, cap)
    # headline first — the driver's parsed field reads the first line
    assert bench.MODE_PLAN[0][0] == "gen"


def test_mode_plan_matches_argparse():
    """The set above must match bench.main's actual choices (guards the
    test itself against drift)."""
    import ast
    import inspect

    tree = ast.parse(inspect.getsource(bench.main))
    found = None
    for node in ast.walk(tree):
        if isinstance(node, ast.keyword) and node.arg == "choices":
            found = {
                n.value for n in ast.walk(node.value)
                if isinstance(n, ast.Constant) and isinstance(n.value, str)
            }
    assert found is not None
    for mode, _ in bench.MODE_PLAN:
        assert mode in found, (mode, found)
