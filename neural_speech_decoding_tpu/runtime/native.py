"""ctypes bindings for the C++ board runtime (native/nsd_board.cpp).

The reference's acquisition stack is native C++ (BrainFlow BoardController:
serial protocol, ring buffer, board threads — SURVEY.md §2.3). Our native
equivalent keeps the host sample path out of Python: a lock-free SPSC ring
buffer fed by a C++ producer thread (synthetic generator or replay source),
drained by `get_current_board_data` into caller-provided NumPy memory.

Build: `make -C native` (g++, no external deps) -> native/build/libnsdboard.so
"""

from __future__ import annotations

import ctypes
import os
from pathlib import Path
from typing import Optional

import numpy as np

_LIB_ENV = "NSD_NATIVE_LIB"
_DEFAULT_LIB = Path(__file__).resolve().parents[2] / "native" / "build" / "libnsdboard.so"

_MODES = {"synthetic": 0, "replay": 1}

_lib_cache: Optional[ctypes.CDLL] = None
_lib_tried = False


def load_library() -> Optional[ctypes.CDLL]:
    """Load libnsdboard.so, or None if it isn't built."""
    global _lib_cache, _lib_tried
    if _lib_tried:
        return _lib_cache
    _lib_tried = True
    path = Path(os.environ.get(_LIB_ENV, _DEFAULT_LIB))
    if not path.is_file():
        return None
    lib = ctypes.CDLL(str(path))

    lib.nsd_board_create.restype = ctypes.c_void_p
    lib.nsd_board_create.argtypes = [
        ctypes.c_int,  # mode
        ctypes.c_int,  # num_rows
        ctypes.c_int,  # num_channels
        ctypes.c_int,  # sample_rate
        ctypes.c_uint64,  # seed
    ]
    lib.nsd_board_load_replay.restype = ctypes.c_int
    lib.nsd_board_load_replay.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,  # channels
        ctypes.c_long,  # total samples
    ]
    lib.nsd_board_start.restype = ctypes.c_int
    lib.nsd_board_start.argtypes = [ctypes.c_void_p, ctypes.c_long, ctypes.c_double]
    lib.nsd_board_stop.restype = None
    lib.nsd_board_stop.argtypes = [ctypes.c_void_p]
    lib.nsd_board_release.restype = None
    lib.nsd_board_release.argtypes = [ctypes.c_void_p]
    lib.nsd_board_data_count.restype = ctypes.c_long
    lib.nsd_board_data_count.argtypes = [ctypes.c_void_p]
    lib.nsd_board_get_current.restype = ctypes.c_long
    lib.nsd_board_get_current.argtypes = [
        ctypes.c_void_p,
        ctypes.c_long,
        ctypes.POINTER(ctypes.c_double),
    ]

    # DSP (nsd_dsp.cpp)
    lib.nsd_dsp_detrend_constant.restype = None
    lib.nsd_dsp_detrend_constant.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_long,
    ]
    for fn in (lib.nsd_dsp_sosfilt, lib.nsd_dsp_sosfiltfilt):
        fn.restype = ctypes.c_int
        fn.argtypes = [
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int,
        ]
    _lib_cache = lib
    return lib


def _as_c_double(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def native_detrend_constant(x: np.ndarray) -> np.ndarray:
    """Per-channel constant detrend via the C++ DSP. x: [..., T]."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("native lib not built — run `make -C native`")
    out = np.ascontiguousarray(x, dtype=np.float64).copy()
    flat = out.reshape(-1, out.shape[-1])
    for row in flat:
        lib.nsd_dsp_detrend_constant(_as_c_double(row), row.shape[0])
    return out


def native_sosfilt(x: np.ndarray, sos: np.ndarray, zero_phase: bool = False) -> np.ndarray:
    """Biquad cascade along the last axis via the C++ DSP (scipy.signal
    sosfilt semantics; zero_phase = pad-free forward-backward)."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("native lib not built — run `make -C native`")
    sos = np.ascontiguousarray(sos, dtype=np.float64)
    if sos.ndim != 2 or sos.shape[1] != 6:
        raise ValueError(f"sos must be [S, 6], got {sos.shape}")
    out = np.ascontiguousarray(x, dtype=np.float64).copy()
    flat = out.reshape(-1, out.shape[-1])
    fn = lib.nsd_dsp_sosfiltfilt if zero_phase else lib.nsd_dsp_sosfilt
    for row in flat:
        rc = fn(_as_c_double(row), row.shape[0], _as_c_double(sos), sos.shape[0])
        if rc != 0:
            raise RuntimeError(f"native sosfilt failed rc={rc}")
    return out


class NativeBoardHandle:
    """Owns one C++ board instance."""

    def __init__(self, lib: ctypes.CDLL, mode: str, num_rows: int,
                 num_channels: int, sample_rate: int, seed: int = 0):
        self.lib = lib
        self.num_rows = num_rows
        self._ptr = lib.nsd_board_create(
            _MODES[mode], num_rows, num_channels, sample_rate,
            ctypes.c_uint64(seed),
        )
        if not self._ptr:
            raise RuntimeError("nsd_board_create failed")

    def load_replay(self, data_ct: np.ndarray) -> None:
        assert data_ct.dtype == np.float32 and data_ct.flags.c_contiguous
        rc = self.lib.nsd_board_load_replay(
            self._ptr,
            data_ct.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            data_ct.shape[0],
            data_ct.shape[1],
        )
        if rc != 0:
            raise RuntimeError(f"nsd_board_load_replay failed rc={rc}")

    def start(self, buffer_size: int, speed: float) -> None:
        rc = self.lib.nsd_board_start(self._ptr, buffer_size, speed)
        if rc != 0:
            raise RuntimeError(f"nsd_board_start failed rc={rc}")

    def stop(self) -> None:
        self.lib.nsd_board_stop(self._ptr)

    def release(self) -> None:
        if self._ptr:
            self.lib.nsd_board_release(self._ptr)
            self._ptr = None

    def data_count(self) -> int:
        return int(self.lib.nsd_board_data_count(self._ptr))

    def get_current(self, n: int) -> np.ndarray:
        out = np.empty((self.num_rows, n), dtype=np.float64)
        got = self.lib.nsd_board_get_current(
            self._ptr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
        )
        return out[:, : int(got)] if got < n else out

    def __del__(self):  # pragma: no cover
        try:
            self.release()
        except Exception:
            pass
