"""TPU-native imagined-speech EEG decoding framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the reference
"NeuroAlpha" pipeline (aa217/Neural-Speech-Decoding): 8-channel 125 Hz EEG
windows -> Kuramoto-phase spatial filter -> LSTM/attention decoder ->
class probabilities, plus the streaming runtime, data collection tooling,
training loop and frontend that surround it.

Layer map (mirrors SURVEY.md section 1, re-architected TPU-first):

  io/        dataset loading + checkpoint ingestion (stdlib .pth reader)
  ops/       numerical kernels: hilbert, kuramoto filter, IIR chains,
             fused preprocessing (jnp + Pallas)
  models/    decoder families: LSTM (reference parity), EEGNet-style conv,
             transformer encoder — all pure-functional JAX
  train/     optax training loop reconstruction + augmentation
  runtime/   boards (replay/synthetic/native C++), streaming producer,
             inference engine, public `run_trials` API
  parallel/  mesh + sharding helpers (dp/tp over jax.sharding.Mesh)
  utils/     timing/latency metrics, logging
  frontend/  Streamlit UI equivalent
  collector/ collection-side filter chain (batch re-preprocessing tool)
"""

__version__ = "0.1.0"

from neural_speech_decoding_tpu.config import (  # noqa: F401
    DecoderConfig,
    FilterConfig,
    PipelineConfig,
    THREE_CLASS_NAMES,
    FIVE_CLASS_NAMES,
)
