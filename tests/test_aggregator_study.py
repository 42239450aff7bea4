"""tools/aggregator_study.py: post-hoc ensemble combiner replay.

Pure-numpy checks on hand-built member probabilities (robustness of
median/trim/vote to one adversarial member; geomean's veto semantics),
plus an end-to-end study_file run over a synthetic crossval JSON."""

import json

import numpy as np
import pytest

from tools.aggregator_study import AGGREGATORS, aggregate, study_file


def test_mean_is_baseline():
    p = np.array([[[0.6, 0.4]], [[0.2, 0.8]]])
    np.testing.assert_allclose(aggregate(p, "mean"), [[0.4, 0.6]])


def test_median_ignores_one_adversarial_member():
    # two members mildly right, one confidently wrong: mean flips to the
    # wrong class, median does not
    p = np.array(
        [
            [[0.55, 0.45]],
            [[0.60, 0.40]],
            [[0.01, 0.99]],
        ]
    )
    assert aggregate(p, "mean")[0].argmax() == 1
    assert aggregate(p, "median")[0].argmax() == 0
    assert aggregate(p, "trim1")[0].argmax() == 0
    assert aggregate(p, "vote")[0].argmax() == 0


def test_geomean_vetoes_near_zero_true_class():
    # one member assigns ~0 to class 0: the product-of-experts combiner
    # vetoes it even though the arithmetic mean still prefers class 0
    p = np.array(
        [
            [[0.9, 0.1]],
            [[0.9, 0.1]],
            [[1e-9, 1.0 - 1e-9]],
        ]
    )
    assert aggregate(p, "mean")[0].argmax() == 0
    assert aggregate(p, "geomean")[0].argmax() == 1


def test_vote_tiebreak_never_overturns_margin():
    # 3 vs 1 vote with the minority member extremely confident: the
    # epsilon mean tiebreak must not overturn a strict vote margin
    p = np.array(
        [
            [[0.51, 0.49]],
            [[0.51, 0.49]],
            [[0.51, 0.49]],
            [[0.0, 1.0]],
        ]
    )
    assert aggregate(p, "vote")[0].argmax() == 0
    # genuine 1-1 tie resolves by mean softmax: (1.0+0.2)/2 > (0.0+0.8)/2
    tie = np.array([[[1.0, 0.0]], [[0.2, 0.8]]])
    assert aggregate(tie, "vote")[0].argmax() == 0
    tie2 = np.array([[[0.6, 0.4]], [[0.1, 0.9]]])
    assert aggregate(tie2, "vote")[0].argmax() == 1


def test_aggregate_rows_renormalized():
    rng = np.random.default_rng(0)
    p = rng.dirichlet(np.ones(3), size=(5, 17))  # [K=5, N=17, C=3]
    for how in AGGREGATORS:
        out = aggregate(p, how)
        assert out.shape == (17, 3)
        np.testing.assert_allclose(out.sum(axis=1), 1.0, atol=1e-9)


def test_trim1_falls_back_to_mean_below_three_members():
    p = np.array([[[0.6, 0.4]], [[0.2, 0.8]]])
    np.testing.assert_allclose(
        aggregate(p, "trim1"), aggregate(p, "mean")
    )


def test_study_file_end_to_end(tmp_path):
    # synthetic 2-fold crossval JSON: member 2 is anti-correlated noise,
    # members 0/1 are weakly right — robust combiners should score >= mean
    rng = np.random.default_rng(7)
    folds = []
    for _ in range(2):
        y = np.repeat([0, 1, 2], 12)
        k_probs = []
        for quality in (0.7, 0.7, -1.0):
            logits = rng.normal(size=(len(y), 3))
            if quality > 0:
                logits[np.arange(len(y)), y] += quality
            else:
                logits[np.arange(len(y)), (y + 1) % 3] += 2.0
            e = np.exp(logits - logits.max(1, keepdims=True))
            k_probs.append(e / e.sum(1, keepdims=True))
        folds.append(
            {
                "y_val": y.tolist(),
                "members": ["a", "b", "c"],
                "member_nested_probs": [p.tolist() for p in k_probs],
            }
        )
    path = tmp_path / "cv.json"
    path.write_text(json.dumps({"fold_detail": folds}))

    out = study_file(str(path), draws=50)
    assert set(out) == set(AGGREGATORS)
    for how, r in out.items():
        assert 0.0 <= r["per_window"] <= 1.0
        assert 0.0 <= r["session"] <= 1.0
        assert len(r["per_window_folds"]) == 2
    # the adversarial member drags the mean below the robust combiners
    assert out["median"]["per_window"] >= out["mean"]["per_window"]


def test_study_file_requires_fold_detail(tmp_path):
    path = tmp_path / "bare.json"
    path.write_text(json.dumps({"model": "x"}))
    with pytest.raises(SystemExit):
        study_file(str(path))
