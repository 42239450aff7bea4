"""Inference engine: compile-once, batched, device-resident decoding.

Replaces the reference's SimplePredictor (reference: lstm_eeg_model.py:42-101)
with a TPU-first design:

  * the whole window->probabilities pipeline (Kuramoto filter -> LSTM ->
    softmax) is ONE jitted function — XLA fuses the elementwise chains and
    keeps everything on device,
  * batch sizes are bucketed to powers of two so arbitrary request sizes hit
    a small set of compiled executables (static shapes, no recompiles),
  * parameters are transferred once and live in device memory,
  * dispatch is asynchronous — callers overlap host acquisition with device
    compute for free; `predict` blocks only to read the result back.
"""

from __future__ import annotations

import math
import threading
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from neural_speech_decoding_tpu.config import DecoderConfig, FilterConfig, PipelineConfig
from neural_speech_decoding_tpu.io.checkpoint import load_decoder_params
from neural_speech_decoding_tpu.models.lstm import decoder_apply
from neural_speech_decoding_tpu.ops.kuramoto import mai_filter_batch


def _bucket(n: int) -> int:
    return 1 << max(0, math.ceil(math.log2(n)))


class _ServingBase:
    """Shared serving surface for InferenceEngine and EnsembleEngine: the
    thread-safe guard-flag stats fold, power-of-two batch bucketing, and
    the predict / predict_batch / predict_batch_async contract.

    Subclasses set `self._pipeline`, `self.params`, `self.config`,
    `self.class_names`, `self._has_aux`, `self._pad_multiple` in their
    __init__ and then call `_init_serving()`. The subtle parts — the
    detach-fold-reacquire lock protocol in `stats` and the parked-list
    overflow bound — live HERE exactly once so the two engines cannot
    drift."""

    #: parked guard-flag vectors are folded (one bulk host fetch) when the
    #: list exceeds this, so a caller that never reads .stats cannot pin
    #: unbounded device buffers
    _MAX_PARKED_FLAGS = 4096

    def _init_serving(self) -> None:
        # guard-counter surface: windows decoded / windows whose covariance
        # spectrum was clamped by the logcov domain guard (always 0 for
        # families without apply_ex). Dispatches park their device flag
        # vectors in _flag_futures; stats() folds them in. The stream
        # decode thread appends while the dashboard's HTTP thread reads
        # stats, so both structures live under _stats_lock.
        self._compiled_buckets: Dict[int, bool] = {}
        self._stats = {"windows": 0, "guard_flagged": 0}
        self._flag_futures: list = []
        self._stats_lock = threading.Lock()

    @property
    def stats(self) -> Dict[str, int]:
        """{"windows", "guard_flagged"} — folds any parked async flag
        vectors (one bulk host fetch) before returning. Thread-safe: the
        pending list is detached under the lock, the (slow) host fetches
        happen outside it, and the fold re-acquires to update."""
        with self._stats_lock:
            pending, self._flag_futures = self._flag_futures, []
        if pending:
            folded = [(int(np.asarray(flags)[:b].sum()), b) for flags, b in pending]
            with self._stats_lock:
                for flagged, b in folded:
                    self._stats["guard_flagged"] += flagged
                    self._stats["windows"] += b
        with self._stats_lock:
            return dict(self._stats)

    def _park_flags(self, flags, b: int) -> None:
        """Park a guard-flag device array instead of fetching it inline: a
        synchronous device_get costs an extra ~29 ms tunnel round-trip on
        the real-time latency path; stats() folds parked vectors in bulk."""
        with self._stats_lock:
            self._flag_futures.append((flags, b))
            overflow = len(self._flag_futures) > self._MAX_PARKED_FLAGS
        if overflow:  # bound the parked list
            _ = self.stats

    def _bucket_padded(self, b: int) -> int:
        """Power-of-two bucket, rounded up to a multiple of the mesh 'dp'
        axis so sharded batches divide evenly."""
        bb = _bucket(b)
        m = self._pad_multiple
        return -(-bb // m) * m

    def warmup(self, batch_sizes: Sequence[int] = (1,)) -> None:
        t, c = self.config.window_samples, self.config.num_channels
        for b in batch_sizes:
            b = self._bucket_padded(b)
            if b in self._compiled_buckets:
                continue
            dummy = jnp.zeros((b, t, c), jnp.float32)
            out = self._pipeline(self.params, dummy)
            np.asarray(out[0] if self._has_aux else out)
            self._compiled_buckets[b] = True

    def predict_batch(self, windows_btc: np.ndarray) -> np.ndarray:
        """[B, T, C] -> probabilities [B, num_classes] (f32)."""
        windows_btc = np.asarray(windows_btc, dtype=np.float32)
        b = windows_btc.shape[0]
        if b == 0:
            return np.zeros((0, len(self.class_names)), np.float32)
        bb = self._bucket_padded(b)
        if bb != b:
            pad = np.zeros((bb - b,) + windows_btc.shape[1:], np.float32)
            windows_btc = np.concatenate([windows_btc, pad], axis=0)
        out = self._pipeline(self.params, windows_btc)
        self._compiled_buckets[bb] = True
        if self._has_aux:
            probs, flags = out
            self._park_flags(flags, b)
            return np.asarray(probs)[:b]
        with self._stats_lock:
            self._stats["windows"] += b
        return np.asarray(out)[:b]

    def predict(self, window_tc: np.ndarray) -> Tuple[np.ndarray, str]:
        """One [T, C] window -> (probs [classes] f32, label str) — the
        reference SimplePredictor.predict contract."""
        probs = self.predict_batch(window_tc[None])[0]
        return probs.astype(np.float32), self.class_names[int(np.argmax(probs))]

    def predict_batch_async(self, windows_btc: jnp.ndarray):
        """Dispatch without blocking; returns the device array future.
        Callers pipeline acquisition against device compute. Guard flags
        (apply_ex families) are parked device-side and folded into stats
        on the next stats read — no extra host round-trip here."""
        out = self._pipeline(self.params, windows_btc)
        if self._has_aux:
            probs, flags = out
            self._park_flags(flags, int(windows_btc.shape[0]))
            return probs
        with self._stats_lock:
            self._stats["windows"] += int(windows_btc.shape[0])
        return out


class InferenceEngine(_ServingBase):
    def __init__(
        self,
        model_path: Optional[str] = None,
        *,
        params=None,
        config: Optional[PipelineConfig] = None,
        class_names: Optional[Sequence[str]] = None,
        sample_rate: Optional[int] = None,
        model: str = "lstm",
        turbo: bool = False,
        donate: bool = False,
        model_kw: Optional[dict] = None,
        mesh=None,
    ):
        """`model` is a registry family name (`model_kw` forwards config
        overrides, e.g. whiten=True for a whitened logcov checkpoint);
        `model_path` accepts the reference .pth (LSTM families) or our
        native .npz pytrees.
        `turbo` runs the LSTM recurrence in bfloat16 (~1.9x throughput,
        100% argmax agreement on the shipped trials); it is a no-op for non-recurrent families,
        which have no serial bottleneck to relax.
        `mesh`: a jax.sharding.Mesh with a 'dp' axis — the decode batch
        then shards over it (params replicated; GSPMD partitions the
        pipeline). Without it the engine serves single-device."""
        import dataclasses as _dc

        from neural_speech_decoding_tpu.models.registry import get_model

        spec = get_model(model, **(model_kw or {}))
        if params is None:
            if model_path is None:
                raise ValueError("need model_path or params")
            if str(model_path).endswith(".npz"):
                from neural_speech_decoding_tpu.io.params_io import load_params_npz

                params = load_params_npz(model_path)
            else:
                if not model.startswith("lstm"):
                    raise ValueError(
                        f".pth checkpoints are LSTM-family; got model={model!r}"
                    )
                params = load_decoder_params(model_path)
        # Serving default: the FAST filter. In f32 the two precision modes
        # share every matmul (all HIGHEST) and differ only in the 8x8 ridge
        # solve — batched LAPACK-style LU vs unrolled Gauss-Jordan + one
        # Newton-Schulz step. Both hold the <=1e-4 golden-logit budget
        # (docs/BENCHMARKS.md Fidelity), but on TPU the LU path costs 2.3x
        # the whole filter (49.5 vs 21.2 ms at B=16384, 2026-08-18) — it
        # was the single largest avoidable cost in the serving engines.
        # Pass an explicit PipelineConfig to opt back into fidelity mode
        # (f64 on CPU with x64).
        config = config or PipelineConfig(
            class_names=spec.class_names,
            decoder=spec.config if model.startswith("lstm") else PipelineConfig().decoder,
            filter=FilterConfig(precision="fast"),
        )
        if sample_rate is not None and sample_rate != config.sample_rate:
            # reference quirk: the predictor adopts the *stream's* reported
            # sample rate (tester.py:70-75); the filter is sr-independent so
            # this only affects window geometry bookkeeping.
            config = PipelineConfig(
                sample_rate=int(sample_rate),
                num_channels=config.num_channels,
                window_seconds=config.window_seconds,
                trials=config.trials,
                class_names=config.class_names,
                filter=config.filter,
                decoder=config.decoder,
            )
        self.config = config
        self.class_names = tuple(class_names or config.class_names)
        self._mesh = mesh
        self._pad_multiple = 1
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self._pad_multiple = int(mesh.shape["dp"])
            self.params = jax.device_put(params, NamedSharding(mesh, P()))
        else:
            self.params = jax.device_put(params)

        filter_cfg: FilterConfig = config.filter
        decoder_cfg: DecoderConfig = config.decoder
        if turbo:
            decoder_cfg = _dc.replace(decoder_cfg, recurrence_dtype="bfloat16")

        # families exposing apply_ex (logcov's spectrum guard) also emit
        # per-window domain flags; the pipeline carries them out so serving
        # surfaces degraded-electrode windows in self.stats instead of
        # silently decoding garbage
        self._has_aux = (not model.startswith("lstm")) and spec.apply_ex is not None
        if model.startswith("lstm"):
            # reference-parity path: honor any custom DecoderConfig coming
            # through PipelineConfig (SimplePredictor compat surface)
            apply_fn = lambda p, x: decoder_apply(p, x, decoder_cfg, train=False)  # noqa: E731
        else:
            apply_fn = lambda p, x: spec.apply(p, x, train=False)  # noqa: E731

        if self._has_aux:

            def _pipeline(p, windows_btc: jnp.ndarray):
                filtered = mai_filter_batch(windows_btc, filter_cfg)
                logits, aux = spec.apply_ex(p, filtered, train=False)
                return jax.nn.softmax(logits, axis=-1), aux["domain_flags"]

        else:

            def _pipeline(p, windows_btc: jnp.ndarray) -> jnp.ndarray:
                filtered = mai_filter_batch(windows_btc, filter_cfg)
                return jax.nn.softmax(apply_fn(p, filtered), axis=-1)

        if mesh is not None:
            # shard_map over 'dp', params replicated: the pipeline is
            # embarrassingly batch-parallel, and its Pallas routes (the
            # fused filter kernel and logcov's fused feats kernel) are
            # Mosaic custom calls GSPMD cannot auto-partition — under a
            # plain sharded jit they would force a full-batch all-gather
            # per chip (or fail to partition). Each device runs the whole
            # pipeline on its local batch shard instead.
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            out_specs = (P("dp"), P("dp")) if self._has_aux else P("dp")
            self._pipeline = jax.jit(
                shard_map(
                    _pipeline,
                    mesh=mesh,
                    in_specs=(P(), P("dp", None, None)),
                    out_specs=out_specs,
                    check_vma=False,
                )
            )
        else:
            self._pipeline = jax.jit(_pipeline)
        self._init_serving()

    def decode_recording(
        self,
        signal_tc: np.ndarray,
        hop_seconds: float = 1.0,
        max_batch: int = 4096,
    ):
        """Bulk-decode a continuous recording [T_total, C]: epoch into
        sliding windows on device and decode batched. Returns
        (probs [N, classes], window_start_seconds [N])."""
        from neural_speech_decoding_tpu.ops.epoching import (
            frame_signal,
            frame_times,
            num_frames,
        )

        window = self.config.window_samples
        hop = max(1, int(hop_seconds * self.config.sample_rate))
        total = signal_tc.shape[0]
        n = num_frames(total, window, hop)
        if n <= 0:
            raise ValueError(
                f"recording of {total} samples is shorter than one "
                f"{window}-sample window"
            )
        windows = np.asarray(
            frame_signal(jnp.asarray(signal_tc, jnp.float32), window, hop)
        )
        chunks = [
            self.predict_batch(windows[i : i + max_batch])
            for i in range(0, n, max_batch)
        ]
        starts, _ = frame_times(total, window, hop, self.config.sample_rate)
        return np.concatenate(chunks, axis=0), np.asarray(starts)
