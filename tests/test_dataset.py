import numpy as np
import pytest

from neural_speech_decoding_tpu.config import FIVE_CLASS_PREFIXES
from neural_speech_decoding_tpu.io.dataset import load_trials


def test_three_class_load(dataset):
    # SURVEY.md §2.5: food 69, water 70, backgroundnoise 40.
    assert dataset.windows.shape == (179, 625, 8)
    assert dataset.windows.dtype == np.float32
    counts = dataset.class_counts()
    assert counts.tolist() == [69, 70, 40]
    assert len(dataset.files) == 179


def test_five_class_load(data_dir):
    ds = load_trials(data_dir, class_prefixes=FIVE_CLASS_PREFIXES)
    assert ds.windows.shape == (324, 625, 8)
    assert ds.class_counts().tolist() == [69, 70, 40, 74, 71]


def test_values_match_loadtxt(data_dir, dataset):
    # Spot-check the fast parser against np.loadtxt on one file.
    name = dataset.files[0]
    ref = np.loadtxt(data_dir / name, delimiter=",").astype(np.float32)
    np.testing.assert_array_equal(dataset.windows[0], ref)


def test_stratified_split(dataset):
    train, val = dataset.split(val_fraction=0.2, seed=0)
    assert len(train) + len(val) == len(dataset)
    # every class represented in both splits
    assert (train.class_counts() > 0).all()
    assert (val.class_counts() > 0).all()
    # no overlap
    assert not set(train.files) & set(val.files)


def test_missing_dir_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        load_trials(tmp_path / "nope")
    with pytest.raises(FileNotFoundError):
        load_trials(tmp_path)  # exists but empty
