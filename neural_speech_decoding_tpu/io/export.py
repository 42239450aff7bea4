"""Torch-compatible checkpoint export (stdlib only).

The inverse of io/checkpoint.py: write our decoder parameter pytree as a
PyTorch zip checkpoint that `torch.load` + the reference's
`EEG_LSTM.load_state_dict(strict=True)` accept (reference:
lstm_eeg_model.py:77-81), so models trained in this framework can be
consumed by the original stack. No torch import — the pickle stream is
emitted directly (the format is small and regular: an OrderedDict of
tensors rebuilt via torch._utils._rebuild_tensor_v2 with persistent-id
storage references).

Bias note: torch LSTMs carry two bias vectors per layer (bias_ih, bias_hh)
whose *sum* is what the cell uses; our pytree folds them. Export writes the
folded vector as bias_ih and zeros as bias_hh — numerically identical.
"""

from __future__ import annotations

import struct
import zipfile
from pathlib import Path
from typing import Any, Dict, Sequence

import numpy as np

__all__ = ["save_torch_checkpoint", "decoder_params_to_torch_state"]

_DTYPE_STORAGE = {
    np.dtype("float32"): "FloatStorage",
    np.dtype("float64"): "DoubleStorage",
    np.dtype("int64"): "LongStorage",
    np.dtype("int32"): "IntStorage",
}


class _PickleEmitter:
    """Minimal pickle protocol-2 writer for the checkpoint structure."""

    def __init__(self):
        self.out = bytearray(b"\x80\x02")  # PROTO 2

    def global_(self, module: str, name: str):
        self.out += b"c" + module.encode() + b"\n" + name.encode() + b"\n"

    def string(self, s: str):
        b = s.encode("utf-8")
        self.out += b"X" + struct.pack("<I", len(b)) + b  # BINUNICODE

    def integer(self, i: int):
        if 0 <= i < 256:
            self.out += b"K" + bytes([i])
        elif 0 <= i < 65536:
            self.out += b"M" + struct.pack("<H", i)
        else:
            self.out += b"J" + struct.pack("<i", i)

    def boolean(self, v: bool):
        self.out += b"\x88" if v else b"\x89"

    def mark(self):
        self.out += b"("

    def tuple_from_mark(self):
        self.out += b"t"

    def empty_tuple(self):
        self.out += b")"

    def reduce(self):
        self.out += b"R"

    def binpersid(self):
        self.out += b"Q"

    def setitems_from_mark(self):
        self.out += b"u"

    def stop(self):
        self.out += b"."
        return bytes(self.out)


def _emit_state_dict_pickle(state: Dict[str, np.ndarray]) -> bytes:
    p = _PickleEmitter()
    # empty OrderedDict via REDUCE
    p.global_("collections", "OrderedDict")
    p.empty_tuple()
    p.reduce()
    p.mark()
    for key_index, (name, arr) in enumerate(state.items()):
        arr = np.ascontiguousarray(arr)
        storage_cls = _DTYPE_STORAGE[arr.dtype]
        p.string(name)
        p.global_("torch._utils", "_rebuild_tensor_v2")
        p.mark()  # args tuple
        # persistent id: ('storage', StorageType, key, location, numel)
        p.mark()
        p.string("storage")
        p.global_("torch", storage_cls)
        p.string(str(key_index))
        p.string("cpu")
        p.integer(arr.size)
        p.tuple_from_mark()
        p.binpersid()
        p.integer(0)  # storage offset
        p.mark()
        for d in arr.shape:
            p.integer(d)
        p.tuple_from_mark()
        p.mark()
        for s in _contig_strides(arr.shape):
            p.integer(s)
        p.tuple_from_mark()
        p.boolean(False)  # requires_grad
        # backward hooks: empty OrderedDict
        p.global_("collections", "OrderedDict")
        p.empty_tuple()
        p.reduce()
        p.tuple_from_mark()
        p.reduce()
    p.setitems_from_mark()
    return p.stop()


def _contig_strides(shape: Sequence[int]):
    strides = []
    acc = 1
    for d in reversed(shape):
        strides.append(acc)
        acc *= d
    return tuple(reversed(strides))


def save_torch_checkpoint(
    path, state: Dict[str, np.ndarray], archive_name: str = "archive"
) -> None:
    """Write `{name: array}` as a torch.load-able zip checkpoint."""
    for k, v in state.items():
        if np.asarray(v).dtype not in _DTYPE_STORAGE:
            raise ValueError(f"{k}: unsupported dtype {np.asarray(v).dtype}")
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    pkl = _emit_state_dict_pickle(state)
    with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as zf:
        zf.writestr(f"{archive_name}/data.pkl", pkl)
        for i, arr in enumerate(state.values()):
            zf.writestr(
                f"{archive_name}/data/{i}",
                np.ascontiguousarray(arr).tobytes(),
            )
        zf.writestr(f"{archive_name}/version", "3\n")
        zf.writestr(f"{archive_name}/byteorder", "little")


def decoder_params_to_torch_state(params: Any) -> Dict[str, np.ndarray]:
    """Our LSTM-decoder pytree -> reference state_dict key layout
    (inverse of io/checkpoint.torch_lstm_state_to_params)."""
    f32 = lambda a: np.ascontiguousarray(np.asarray(a), dtype=np.float32)  # noqa: E731
    state: Dict[str, np.ndarray] = {}
    for l, layer in enumerate(params["lstm"]):
        state[f"lstm.weight_ih_l{l}"] = f32(np.asarray(layer["w_ih"]).T)
        state[f"lstm.weight_hh_l{l}"] = f32(np.asarray(layer["w_hh"]).T)
        state[f"lstm.bias_ih_l{l}"] = f32(layer["b"])
        state[f"lstm.bias_hh_l{l}"] = np.zeros_like(f32(layer["b"]))
    state["ln.weight"] = f32(params["ln"]["scale"])
    state["ln.bias"] = f32(params["ln"]["bias"])
    state["attn.weight"] = f32(np.asarray(params["attn"]["w"]).reshape(1, -1))
    state["attn.bias"] = f32(np.asarray(params["attn"]["b"]).reshape(1))
    state["fc.0.weight"] = f32(np.asarray(params["fc1"]["w"]).T)
    state["fc.0.bias"] = f32(params["fc1"]["b"])
    state["fc.3.weight"] = f32(np.asarray(params["fc2"]["w"]).T)
    state["fc.3.bias"] = f32(params["fc2"]["b"])
    return state
