"""tools/ensemble_size_study.py: subset-averaged accuracy-vs-K curve."""

import json

import numpy as np

from tools.ensemble_size_study import _subsets, size_curve


def test_subsets_exact_then_sampled():
    rng = np.random.default_rng(0)
    assert _subsets(5, 2, max_subsets=30, rng=rng) == [
        s for s in __import__("itertools").combinations(range(5), 2)
    ]
    sampled = _subsets(9, 4, max_subsets=10, rng=rng)
    assert len(sampled) == 10
    assert len(set(sampled)) == 10
    assert all(len(s) == 4 and len(set(s)) == 4 for s in sampled)


def test_size_curve_full_k_matches_plain_mean(tmp_path):
    rng = np.random.default_rng(3)
    y = np.repeat([0, 1, 2], 10)
    member_probs = rng.dirichlet(np.ones(3), size=(4, len(y)))
    # tilt members toward the truth so accuracies are non-trivial
    for p in member_probs:
        p[np.arange(len(y)), y] += 0.3
    member_probs /= member_probs.sum(axis=2, keepdims=True)
    path = tmp_path / "cv.json"
    path.write_text(
        json.dumps(
            {
                "fold_detail": [
                    {
                        "y_val": y.tolist(),
                        "members": list("abcd"),
                        "member_nested_probs": member_probs.tolist(),
                    }
                ]
            }
        )
    )
    curve = size_curve(str(path), draws=50)
    assert set(curve) == {1, 2, 3, 4}
    # k = K has exactly one subset (the full ensemble): zero subset
    # spread, and per-window equal to the plain mean-softmax accuracy
    full = curve[4]
    assert full["n_subsets"] == 1
    assert full["per_window_subset_std"] == 0.0
    direct = float(
        (member_probs.mean(axis=0).argmax(1) == y).mean()
    )
    assert abs(full["per_window"] - direct) < 1e-12
    # k = 1 averages the four single-member accuracies
    singles = [
        float((member_probs[i].argmax(1) == y).mean()) for i in range(4)
    ]
    assert abs(curve[1]["per_window"] - np.mean(singles)) < 1e-12
    # seed-lottery spread shrinks as members are added (1 vs K-1)
    assert (
        curve[1]["per_window_subset_std"]
        >= curve[3]["per_window_subset_std"]
    )
