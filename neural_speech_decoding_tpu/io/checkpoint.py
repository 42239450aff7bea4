"""Torch-free checkpoint ingestion.

The reference ships its trained decoder as a PyTorch zip checkpoint
(reference: Neuro-Alpha-App/Utilities/LSTM_Model/
lstm_classifier_Water_Food_Bg_Noise.pth; loaded at lstm_eeg_model.py:77-81
with tolerant `{"state_dict": ...}` unwrapping). This module reads that
format with the standard library only (zipfile + a restricted pickle
Unpickler), so the TPU framework has no torch dependency, and converts the
state_dict into the JAX parameter pytree used by
`neural_speech_decoding_tpu.models.lstm`.

Checkpoint layout (PyTorch zip serialization, version 2):
  <name>/data.pkl     pickle of the state_dict; tensors are rebuilt through
                      torch._utils._rebuild_tensor_v2(storage, offset, size,
                      stride, requires_grad, hooks) where `storage` comes in
                      through persistent_load as
                      ('storage', StorageType, key, location, numel)
  <name>/data/<key>   raw little-endian tensor storage bytes
"""

from __future__ import annotations

import io as _io
import pickle
import zipfile
from pathlib import Path
from typing import Any, Dict, Tuple

import numpy as np

__all__ = [
    "load_torch_checkpoint",
    "load_decoder_params",
    "torch_lstm_state_to_params",
]

# torch storage class name -> numpy dtype of the raw bytes.
_STORAGE_DTYPES = {
    "FloatStorage": np.dtype("<f4"),
    "DoubleStorage": np.dtype("<f8"),
    "HalfStorage": np.dtype("<f2"),
    "LongStorage": np.dtype("<i8"),
    "IntStorage": np.dtype("<i4"),
    "ShortStorage": np.dtype("<i2"),
    "CharStorage": np.dtype("<i1"),
    "ByteStorage": np.dtype("<u1"),
    "BoolStorage": np.dtype("<?"),
    "BFloat16Storage": np.dtype("<u2"),  # decoded to f32 below
    "UntypedStorage": np.dtype("<u1"),
}


class _StorageType:
    """Stand-in for `torch.FloatStorage` & friends inside the pickle."""

    def __init__(self, name: str):
        self.name = name
        self.dtype = _STORAGE_DTYPES[name]

    def __repr__(self):  # pragma: no cover
        return f"_StorageType({self.name})"


class _LazyStorage:
    """A (dtype, archive key) pair; bytes are fetched once on demand."""

    def __init__(self, reader: "_ZipReader", dtype: np.dtype, key: str, numel: int):
        self.reader = reader
        self.dtype = dtype
        self.key = key
        self.numel = numel
        self._array = None

    def array(self) -> np.ndarray:
        if self._array is None:
            raw = self.reader.storage_bytes(self.key)
            self._array = np.frombuffer(raw, dtype=self.dtype)
        return self._array


def _bf16_to_f32(u16: np.ndarray) -> np.ndarray:
    return (u16.astype(np.uint32) << 16).view(np.float32)


def _rebuild_tensor_v2(
    storage: _LazyStorage,
    storage_offset: int,
    size: Tuple[int, ...],
    stride: Tuple[int, ...],
    requires_grad: bool = False,
    backward_hooks: Any = None,
    metadata: Any = None,
) -> np.ndarray:
    flat = storage.array()
    base = flat[storage_offset:]
    arr = np.lib.stride_tricks.as_strided(
        base,
        shape=tuple(size),
        strides=tuple(s * flat.dtype.itemsize for s in stride),
    ).copy()
    if storage.dtype == _STORAGE_DTYPES["BFloat16Storage"]:
        arr = _bf16_to_f32(arr)
    return arr


def _rebuild_parameter(data: np.ndarray, requires_grad: bool = True, hooks: Any = None):
    return data


class _ZipReader:
    def __init__(self, zf: zipfile.ZipFile):
        self.zf = zf
        names = zf.namelist()
        pkl = [n for n in names if n.endswith("/data.pkl") or n == "data.pkl"]
        if not pkl:
            raise ValueError("not a PyTorch zip checkpoint: no data.pkl")
        self.pkl_name = pkl[0]
        self.prefix = self.pkl_name[: -len("data.pkl")]

    def storage_bytes(self, key: str) -> bytes:
        return self.zf.read(f"{self.prefix}data/{key}")


class _Unpickler(pickle.Unpickler):
    """Restricted unpickler: resolves only the torch symbols a plain
    state_dict needs; everything else is refused."""

    def __init__(self, file, reader: _ZipReader):
        super().__init__(file)
        self.reader = reader

    def find_class(self, module: str, name: str):
        if module == "torch._utils" and name in (
            "_rebuild_tensor_v2",
            "_rebuild_tensor",
        ):
            return _rebuild_tensor_v2
        if module == "torch._utils" and name == "_rebuild_parameter":
            return _rebuild_parameter
        if module == "torch" and name in _STORAGE_DTYPES:
            return _StorageType(name)
        if module == "torch.storage" and name == "TypedStorage":
            return _StorageType
        if module == "collections" and name == "OrderedDict":
            # real OrderedDict: torch attaches a `_metadata` attribute via
            # BUILD, which plain dict instances cannot carry
            import collections

            return collections.OrderedDict
        if module == "torch.serialization" and name == "_get_layout":
            return lambda *_: None
        raise pickle.UnpicklingError(
            f"refusing to unpickle {module}.{name} from checkpoint"
        )

    def persistent_load(self, pid):
        # ('storage', StorageType, key, location, numel)
        if not (isinstance(pid, tuple) and pid and pid[0] == "storage"):
            raise pickle.UnpicklingError(f"unexpected persistent id {pid!r}")
        storage_type, key, _location, numel = pid[1], pid[2], pid[3], pid[4]
        dtype = storage_type.dtype if isinstance(storage_type, _StorageType) else np.dtype("<f4")
        return _LazyStorage(self.reader, dtype, str(key), int(numel))


def load_torch_checkpoint(path) -> Dict[str, np.ndarray]:
    """Read a PyTorch zip checkpoint into `{key: np.ndarray}`.

    Accepts both a raw state_dict and the `{"state_dict": ...}` wrapper the
    reference tolerates (lstm_eeg_model.py:79-81).
    """
    path = Path(path)
    with zipfile.ZipFile(path) as zf:
        reader = _ZipReader(zf)
        with zf.open(reader.pkl_name) as f:
            obj = _Unpickler(_io.BufferedReader(f), reader).load()
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    if not isinstance(obj, dict):
        raise ValueError(f"checkpoint did not contain a state_dict: {type(obj)}")
    return {k: np.asarray(v) for k, v in obj.items()}


def torch_lstm_state_to_params(state: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Convert the reference EEG_LSTM state_dict into our parameter pytree.

    Torch shapes (SURVEY.md §2.4): per layer l, weight_ih_l{l} [4H, in],
    weight_hh_l{l} [4H, H], bias_ih/bias_hh [4H], gates stacked in
    (i, f, g, o) row order. We store right-multiplication layouts
    (x @ w_ih [in,4H]) and fold the two biases into one, preserving gate
    order; the recurrence itself handles the i,f,g,o split.
    """
    f32 = lambda a: np.ascontiguousarray(a, dtype=np.float32)  # noqa: E731

    layers = []
    l = 0
    while f"lstm.weight_ih_l{l}" in state:
        layers.append(
            {
                "w_ih": f32(state[f"lstm.weight_ih_l{l}"].T),
                "w_hh": f32(state[f"lstm.weight_hh_l{l}"].T),
                "b": f32(state[f"lstm.bias_ih_l{l}"] + state[f"lstm.bias_hh_l{l}"]),
            }
        )
        l += 1
    if not layers:
        raise KeyError("no lstm.weight_ih_l0 in state_dict")

    return {
        "lstm": layers,
        "attn": {
            "w": f32(state["attn.weight"].reshape(-1)),  # [H]
            # note: ascontiguousarray promotes 0-d to 1-d, so cast first
            "b": f32(state["attn.bias"]).reshape(()),
        },
        "ln": {"scale": f32(state["ln.weight"]), "bias": f32(state["ln.bias"])},
        "fc1": {"w": f32(state["fc.0.weight"].T), "b": f32(state["fc.0.bias"])},
        "fc2": {"w": f32(state["fc.3.weight"].T), "b": f32(state["fc.3.bias"])},
    }


def load_decoder_params(path) -> Dict[str, Any]:
    """One-shot: .pth file -> JAX-ready parameter pytree (numpy leaves)."""
    return torch_lstm_state_to_params(load_torch_checkpoint(path))
