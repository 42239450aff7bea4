import numpy as np
import pytest

from neural_speech_decoding_tpu.io.checkpoint import (
    load_decoder_params,
    load_torch_checkpoint,
)

# Expected state_dict contract (SURVEY.md §2.4).
EXPECTED_SHAPES = {
    "lstm.weight_ih_l0": (192, 8),
    "lstm.weight_hh_l0": (192, 48),
    "lstm.bias_ih_l0": (192,),
    "lstm.bias_hh_l0": (192,),
    "lstm.weight_ih_l1": (192, 48),
    "lstm.weight_hh_l1": (192, 48),
    "lstm.bias_ih_l1": (192,),
    "lstm.bias_hh_l1": (192,),
    "ln.weight": (48,),
    "ln.bias": (48,),
    "attn.weight": (1, 48),
    "attn.bias": (1,),
    "fc.0.weight": (32, 48),
    "fc.0.bias": (32,),
    "fc.3.weight": (3, 32),
    "fc.3.bias": (3,),
}


def test_stdlib_reader_shapes(checkpoint_path):
    state = load_torch_checkpoint(checkpoint_path)
    assert set(state) == set(EXPECTED_SHAPES)
    for k, shape in EXPECTED_SHAPES.items():
        assert state[k].shape == shape, k
        assert state[k].dtype == np.float32, k
    total = sum(v.size for v in state.values())
    assert total == 31764  # SURVEY.md §2.4


def test_stdlib_reader_matches_torch(checkpoint_path):
    torch = pytest.importorskip("torch")
    ours = load_torch_checkpoint(checkpoint_path)
    ref = torch.load(checkpoint_path, map_location="cpu", weights_only=True)
    assert set(ours) == set(ref)
    for k in ref:
        np.testing.assert_array_equal(ours[k], ref[k].numpy())


def test_param_pytree_layout(checkpoint_path):
    params = load_decoder_params(checkpoint_path)
    assert len(params["lstm"]) == 2
    l0, l1 = params["lstm"]
    assert l0["w_ih"].shape == (8, 192)
    assert l0["w_hh"].shape == (48, 192)
    assert l0["b"].shape == (192,)
    assert l1["w_ih"].shape == (48, 192)
    assert params["attn"]["w"].shape == (48,)
    assert params["attn"]["b"].shape == ()
    assert params["fc1"]["w"].shape == (48, 32)
    assert params["fc2"]["w"].shape == (32, 3)

    # bias folding: b == bias_ih + bias_hh
    state = load_torch_checkpoint(checkpoint_path)
    np.testing.assert_allclose(
        l0["b"], state["lstm.bias_ih_l0"] + state["lstm.bias_hh_l0"], rtol=0, atol=0
    )


def test_wrapped_state_dict(tmp_path, checkpoint_path):
    torch = pytest.importorskip("torch")
    state = torch.load(checkpoint_path, map_location="cpu", weights_only=True)
    wrapped_path = tmp_path / "wrapped.pth"
    torch.save({"state_dict": state, "epoch": 3}, wrapped_path)
    ours = load_torch_checkpoint(wrapped_path)
    assert set(EXPECTED_SHAPES) <= set(ours)
    np.testing.assert_array_equal(ours["ln.weight"], state["ln.weight"].numpy())
