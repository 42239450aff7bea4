"""`Utilities.lstm_eeg_model` — reference-parity module path.

`SimplePredictor` keeps the reference constructor surface
(lstm_eeg_model.py:49-84) on top of the TPU InferenceEngine; `predict`
returns (probs f32 [classes], label) exactly as the reference does
(lstm_eeg_model.py:86-101).
"""

from typing import Optional, Sequence

import numpy as np

from neural_speech_decoding_tpu.config import (
    DecoderConfig,
    FilterConfig,
    PipelineConfig,
    THREE_CLASS_NAMES,
)
from neural_speech_decoding_tpu.runtime.engine import InferenceEngine

CLASS_NAMES = list(THREE_CLASS_NAMES)


class SimplePredictor:
    def __init__(
        self,
        pth_path: str,
        sr: int,
        channel_order=None,
        input_size: int = 8,
        hidden_size: int = 48,
        num_layers: int = 2,
        num_classes: int = 3,
        dropout: float = 0.60,
        device: str = "tpu",
        tailoring_lambda: float = 1.25e-29,
        class_names: Optional[Sequence[str]] = None,
    ):
        config = PipelineConfig(
            sample_rate=int(sr),
            num_channels=input_size,
            class_names=tuple(class_names or CLASS_NAMES),
            filter=FilterConfig(lambd=tailoring_lambda),
            decoder=DecoderConfig(
                input_size=input_size,
                hidden_size=hidden_size,
                num_layers=num_layers,
                num_classes=num_classes,
                dropout=dropout,
            ),
        )
        self._engine = InferenceEngine(pth_path, config=config,
                                       class_names=config.class_names)

    def predict(self, chunk_TxC: np.ndarray):
        return self._engine.predict(np.asarray(chunk_TxC, dtype=np.float32))
