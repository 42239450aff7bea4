"""Sweep/crossval tooling: grid expansion + importable API shape."""

import sys
from pathlib import Path

TOOLS = Path(__file__).resolve().parents[1] / "tools"
if str(TOOLS) not in sys.path:
    sys.path.insert(0, str(TOOLS))


def test_grid_expansion_is_cross_product():
    from sweep import GRIDS, expand

    combos = expand({"a": [1, 2], "b": ["x", "y", "z"]})
    assert len(combos) == 6
    assert {"a": 1, "b": "z"} in combos
    for name, grid in GRIDS.items():
        combos = expand(grid)
        assert combos, name
        # every combo carries every axis
        assert all(set(c) == set(grid) for c in combos)


def test_run_crossval_importable():
    from crossval import run_crossval

    import inspect

    sig = inspect.signature(run_crossval)
    for param in ("model", "folds", "epochs", "augment", "aug_kinds",
                  "protocol", "verbose"):
        assert param in sig.parameters
