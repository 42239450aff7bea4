"""Typed configuration for the whole pipeline.

The reference scatters its configuration across module constants and keyword
defaults (reference: Neuro-Alpha-App/Utilities/tester.py:17-20,78-85,
Frontend/app.py:36-40). Here it is one set of frozen dataclasses, hashable so
they can be closed over by jit as static arguments.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

# Class index order is the behavioral contract fixed by the shipped
# checkpoint head (reference: SURVEY.md §2.4): 0=Food, 1=Water, 2=Background.
THREE_CLASS_NAMES: Tuple[str, ...] = ("Food", "Water", "BG-Noise")
# The five-class variant re-adds yes/no (reference: readme.md:52,70 dropped
# them for confusion; BASELINE.json configs ask for the 5-class retrain).
FIVE_CLASS_NAMES: Tuple[str, ...] = ("Food", "Water", "BG-Noise", "Yes", "No")

# Filename prefixes in EEG_data_collection/ -> class index, per class set.
THREE_CLASS_PREFIXES: Tuple[str, ...] = ("food", "water", "backgroundnoise")
FIVE_CLASS_PREFIXES: Tuple[str, ...] = ("food", "water", "backgroundnoise", "yes", "no")


@dataclasses.dataclass(frozen=True)
class FilterConfig:
    """Kuramoto-phase spatial filter ("MindsAI") configuration.

    `lambd` is the tailoring lambda; the production inference path uses
    1.25e-29 (reference: tester.py:84) while the vendored filter's default is
    1e-25 (reference: MindsAI/mindsai_filter_python/core.py:10). `renorm`
    follows the reference's "diag" renormalization with eps clip 1e-12
    (core.py:27-31).
    """

    lambd: float = 1.25e-29
    renorm: str = "diag"  # "diag" | "none"
    eps: float = 1e-12
    # "highest": compute the phase/operator algebra in float64 when the
    # backend supports it (CPU tests; bit-faithfulness target).
    # "fast": float32 end to end (TPU throughput path).
    precision: str = "highest"
    # "kernel": fast mode on TPU fuses Hilbert + c2/s2 + pair grams into
    # one Pallas pass (ops/pallas/kuramoto.py) in mai_filter_batch;
    # "stages" keeps the XLA stages path. Gated to TPU + precision=fast
    # either way — CPU, f64, and per-window callers always take stages.
    fused: str = "kernel"


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    """LSTM decoder hyperparameters.

    Mirrors the shipped checkpoint contract (reference: lstm_eeg_model.py:14,
    tester.py:78-85): input 8, hidden 48, 2 layers, 3 classes, dropout 0.60
    between LSTM layers and in the MLP head, attention pooling + LayerNorm +
    Linear(48,32) -> RReLU -> Dropout -> Linear(32,classes).
    """

    input_size: int = 8
    hidden_size: int = 48
    num_layers: int = 2
    num_classes: int = 3
    dropout: float = 0.60
    # torch nn.RReLU bounds; eval mode uses the deterministic mean slope
    # (1/8 + 1/3) / 2, train mode samples U(lower, upper) per element.
    rrelu_lower: float = 1.0 / 8.0
    rrelu_upper: float = 1.0 / 3.0
    layernorm_eps: float = 1e-5
    # dtype of the LSTM recurrence (gate math + recurrent matmul).
    # "float32" is the parity default; "bfloat16" is the TPU turbo mode:
    # ~1.9x decode throughput; 100% argmax agreement on all 179 shipped
    # trials (max logit delta ~2.6e-1 — see docs/BENCHMARKS.md Fidelity).
    # Attention/head always run f32.
    recurrence_dtype: str = "float32"
    # tanh/sigmoid implementation for the recurrence. "rational" evaluates
    # ~1-ulp minimax rationals from correctly-rounded VPU mul/adds — the
    # TPU builtin tanh is ~1350 ulp off, which compounds to ~2e-3 logit
    # error over 625 steps (ops/gates.py). "builtin" keeps the backend's.
    gate_math: str = "rational"
    # Eval-path pipelined fusion of the two LSTM layers into one scan step
    # (models/lstm.py:_lstm_two_layer_fused): one [B,2H]x[2H,8H] matmul per
    # timestep instead of two [B,H]x[H,4H], riding the same K=128 MXU tile.
    # Measured on-chip: ~113-115k vs ~105-111k windows/s f32 (B=16384), max
    # logit delta vs torch golden 3.7e-5 (same as per-layer), 100% argmax.
    # Training always runs per-layer (inter-layer dropout needs the
    # boundary); False restores the per-layer eval scan.
    fused_scan: bool = True
    # Streaming eval scan (models/lstm.py:_lstm_two_layer_streaming): the
    # input projection folds into the fused per-step matmul (K = 2H + C =
    # 104 rides the same 128-wide MXU tile) and attention pooling runs
    # online in the carry, so neither the [T, B, 4H] input projection nor
    # the [T, B, H] outputs ever stream through HBM — those were ~40% of
    # the eval path's HBM bytes (checkpoints/roofline_r4.json). Same math
    # as the fused scan up to fp summation order. Applies when fused_scan
    # is on; False restores the materializing fused scan.
    streaming_scan: bool = True
    # lax.scan unroll factor for the per-layer recurrence (the training
    # path): >1 trades HLO size for fewer loop trips. Must divide T.
    scan_unroll: int = 1
    # lax.scan unroll factor for the STREAMING eval scan (need not divide
    # T+1; jax handles the remainder). Replicating the step body lets XLA
    # overlap the next step's gate math with the current step's matmul.
    # Measured on chip at B=16384 (2026-08-19, two runs): bf16 turbo
    # 574k -> 610-621k windows/s (+6-8%, consistent) at unroll 4-8, f32
    # flat within the ~3-5% run-to-run spread; logits shift <=7e-7 dprob
    # in f32 (pinned by tests/test_model_golden.py unroll-parity test).
    eval_scan_unroll: int = 4
    # gradient rematerialization over the recurrence: split the T-step
    # scan into this many jax.checkpoint-ed chunks (outer scan over
    # chunks, inner scan over T/chunks steps). Backward recomputes each
    # chunk's activations instead of storing all T steps — the standard
    # sqrt-residual treatment for backprop-through-long-scan; also the
    # compile-time lever for the 625-step training graph. 0/1 disables.
    remat_chunks: int = 0


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """End-to-end pipeline configuration (device + window geometry)."""

    sample_rate: int = 125  # Hz, Neuropawn Knight board
    num_channels: int = 8
    window_seconds: float = 5.0
    trials: int = 10  # windows averaged per snapshot (reference: tester.py:31)
    class_names: Tuple[str, ...] = THREE_CLASS_NAMES
    filter: FilterConfig = dataclasses.field(default_factory=FilterConfig)
    decoder: DecoderConfig = dataclasses.field(default_factory=DecoderConfig)

    @property
    def window_samples(self) -> int:
        return max(1, int(self.window_seconds * self.sample_rate))


def five_class_pipeline() -> PipelineConfig:
    return PipelineConfig(
        class_names=FIVE_CLASS_NAMES,
        decoder=DecoderConfig(num_classes=5),
    )
