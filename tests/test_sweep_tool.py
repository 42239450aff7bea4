"""Sweep/crossval tooling: grid expansion + importable API shape."""

import sys
from pathlib import Path

import pytest

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
                  "protocol", "verbose", "seeds"):
        assert param in sig.parameters


def test_family_model_kw_routing():
    """Per-family overrides ("fam:key") reach only that family; bare keys
    reach every family; stratified routing drops foreign prefixes."""
    from crossval import family_model_kw

    kw = {"logcov8_5:whiten": True, "logcov8_5:dropout": 0.0,
          "lru5:depth": 2, "seed_features": 7}
    assert family_model_kw(kw, "logcov8_5") == {
        "whiten": True, "dropout": 0.0, "seed_features": 7}
    assert family_model_kw(kw, "lru5") == {"depth": 2, "seed_features": 7}
    assert family_model_kw(kw, "tcn") == {"seed_features": 7}
    assert family_model_kw(None, "tcn") == {}


@pytest.mark.slow
def test_crossval_ensemble_smoke():
    """Tiny end-to-end crossval of a cross-family ensemble ("a+b" spec):
    summary carries the ensemble and per-member numbers, all in [0, 1]."""
    from crossval import run_crossval

    summary = run_crossval(
        model="logcov+tcn_small", folds=2, epochs=1, augment=0.0,
        seeds=1, verbose=False,
    )
    assert summary["model"] == "logcov+tcn_small"
    for proto in ("nested", "last", "biased"):
        row = summary["by_protocol"][proto]
        assert len(row["folds"]) == 2
        assert 0.0 <= row["mean"] <= 1.0
    ps = summary["per_seed_nested"]
    assert len(ps["folds"]) == 2
    assert 0.0 <= ps["mean"] <= 1.0
