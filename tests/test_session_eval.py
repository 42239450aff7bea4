"""Session-level (10-window averaged) accuracy tool — the reference's
product metric (reference: Neuro-Alpha-App/Utilities/tester.py:88-98)."""

import json
from pathlib import Path

import numpy as np
import pytest

from tools.session_eval import evaluate, session_accuracy_from_probs

REPO_ROOT = Path(__file__).resolve().parents[1]
FLAGSHIP_CV = REPO_ROOT / "checkpoints" / "crossval_logcov8_whiten_cleanfit.json"


def test_session_accuracy_perfect_and_broken():
    labels = np.repeat([0, 1, 2], 15)
    right = np.full((45, 3), 0.2, np.float32)
    right[np.arange(45), labels] = 0.6
    rng = np.random.default_rng(0)
    assert session_accuracy_from_probs(right, labels, draws=50, rng=rng) == 1.0
    wrong = np.full((45, 3), 0.4, np.float32)
    wrong[np.arange(45), labels] = 0.2
    rng = np.random.default_rng(0)
    assert session_accuracy_from_probs(wrong, labels, draws=50, rng=rng) == 0.0


def test_session_averaging_beats_per_window_for_iid_errors():
    """Mean-softmax over 10 windows integrates out iid per-window noise —
    the statistical reason the reference averages trials at all."""
    rng_data = np.random.default_rng(1)
    labels = np.repeat([0, 1, 2], 30)
    logits = rng_data.normal(0, 1.0, (90, 3)).astype(np.float32)
    logits[np.arange(90), labels] += 0.8  # weak per-window signal
    probs = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
    per_window = float((probs.argmax(1) == labels).mean())
    rng = np.random.default_rng(2)
    session = session_accuracy_from_probs(probs, labels, draws=500, rng=rng)
    assert per_window < 0.9  # the signal really is weak per-window
    assert session > per_window + 0.1


def test_small_class_uses_replacement():
    labels = np.array([0, 0, 0, 1, 1, 1])  # 3 windows < 10 per class
    probs = np.full((6, 2), 0.5, np.float32)
    probs[np.arange(6), labels] = 0.7
    rng = np.random.default_rng(0)
    assert session_accuracy_from_probs(probs, labels, draws=20, rng=rng) == 1.0


@pytest.mark.skipif(not FLAGSHIP_CV.exists(), reason="flagship CV JSON absent")
def test_evaluate_on_shipped_cv_json():
    """End-to-end on the shipped flagship CV run: fold reconstruction
    matches the stored y_val (guards dataset/seed drift), and the session
    figure clears the per-window one."""
    r = evaluate(str(FLAGSHIP_CV), draws=50, with_reference=False)
    assert r["session"]["mean"] > r["per_window"]["mean"]
    assert len(r["session"]["folds"]) == 5
