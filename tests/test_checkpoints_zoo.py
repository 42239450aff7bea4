"""Every committed checkpoint must load through the registry + engine.

Guards against drift between the model registry's configs and the .npz
artifacts shipped in checkpoints/ (shape changes, renamed keys, families
removed)."""

from pathlib import Path

import numpy as np
import pytest

REPO_ROOT = Path(__file__).resolve().parents[1]

ZOO = [
    ("lstm", "lstm3_retrained.npz"),
    ("lstm5", "lstm5.npz"),
    ("lstm5", "lstm5_best.npz"),
    ("eegnet", "eegnet3.npz"),
    ("eegnet", "eegnet3_aug.npz"),
    ("eegnet", "eegnet3_best.npz"),
    ("eegnet", "eegnet3_cosine.npz"),
    ("eegnet5", "eegnet5_best.npz"),
    ("transformer", "transformer3.npz"),
    ("transformer", "transformer3_aug.npz"),
    ("transformer", "transformer3_best.npz"),
    ("transformer5", "transformer5_best.npz"),
    ("tcn", "tcn3_best.npz"),
    ("tcn", "tcn3_cosine.npz"),
    ("tcn", "tcn3_deploy.npz"),
    ("tcn5", "tcn5_best.npz"),
]


@pytest.mark.parametrize("family,name", ZOO)
def test_checkpoint_decodes(family, name, dataset):
    path = REPO_ROOT / "checkpoints" / name
    if not path.is_file():
        pytest.skip(f"{name} not committed")
    from neural_speech_decoding_tpu.runtime.engine import InferenceEngine

    engine = InferenceEngine(str(path), model=family)
    probs, label = engine.predict(dataset.windows[0])
    assert probs.shape == (len(engine.class_names),)
    assert abs(probs.sum() - 1.0) < 1e-4
    assert label in engine.class_names
