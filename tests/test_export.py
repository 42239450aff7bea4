"""Torch-checkpoint export tests (round-trips through torch itself)."""

import numpy as np
import pytest

from neural_speech_decoding_tpu.io.checkpoint import (
    load_decoder_params,
    load_torch_checkpoint,
    torch_lstm_state_to_params,
)
from neural_speech_decoding_tpu.io.export import (
    decoder_params_to_torch_state,
    save_torch_checkpoint,
)


def test_export_reads_back_with_our_loader(tmp_path):
    state = {
        "a.weight": np.arange(12, dtype=np.float32).reshape(3, 4),
        "a.bias": np.array([1.5, -2.0, 0.0], dtype=np.float32),
    }
    path = tmp_path / "mini.pth"
    save_torch_checkpoint(path, state)
    back = load_torch_checkpoint(path)
    assert set(back) == set(state)
    for k in state:
        np.testing.assert_array_equal(back[k], state[k])


def test_export_loads_in_torch(tmp_path, checkpoint_path):
    torch = pytest.importorskip("torch")
    params = load_decoder_params(checkpoint_path)
    state = decoder_params_to_torch_state(params)
    path = tmp_path / "exported.pth"
    save_torch_checkpoint(path, state)

    loaded = torch.load(path, map_location="cpu", weights_only=True)
    assert set(loaded) == set(state)
    for k in state:
        np.testing.assert_array_equal(loaded[k].numpy(), state[k])


def test_roundtrip_preserves_reference_behavior(tmp_path, checkpoint_path, dataset, golden):
    """reference .pth -> our pytree -> exported .pth -> our pytree:
    identical decode."""
    from neural_speech_decoding_tpu.config import FilterConfig
    from neural_speech_decoding_tpu.models.lstm import decoder_logits
    from neural_speech_decoding_tpu.ops.kuramoto import mai_filter_batch

    params = load_decoder_params(checkpoint_path)
    path = tmp_path / "roundtrip.pth"
    save_torch_checkpoint(path, decoder_params_to_torch_state(params))
    params2 = torch_lstm_state_to_params(load_torch_checkpoint(path))

    filtered = mai_filter_batch(dataset.windows[:8], FilterConfig())
    a = np.asarray(decoder_logits(params, filtered))
    b = np.asarray(decoder_logits(params2, filtered))
    np.testing.assert_array_equal(a, b)
    from conftest import golden_rows

    rows = golden_rows(golden, dataset.files[:8])
    np.testing.assert_allclose(a, golden["logits"][rows], atol=1e-4)


def test_torch_model_accepts_export(tmp_path, checkpoint_path):
    """The reference model class loads our exported checkpoint strictly."""
    torch = pytest.importorskip("torch")
    import sys

    sys.path.insert(0, str((tmp_path / "..").resolve()))
    from tools.make_golden import build_torch_model

    params = load_decoder_params(checkpoint_path)
    path = tmp_path / "for_reference.pth"
    save_torch_checkpoint(path, decoder_params_to_torch_state(params))
    model = build_torch_model(str(path))  # strict load inside
    x = torch.zeros(1, 625, 8)
    with torch.inference_mode():
        out = model(x)
    assert out.shape == (1, 3)


def test_unsupported_dtype_rejected(tmp_path):
    with pytest.raises(ValueError, match="unsupported dtype"):
        save_torch_checkpoint(
            tmp_path / "bad.pth", {"x": np.zeros(3, dtype=np.complex64)}
        )
