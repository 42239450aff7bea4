"""`Utilities.preprocessor` — reference-parity module path.

`PreProcessor` keeps the reference's surface (reference:
preprocessor.py:15-36): [T, C] float32 in, Kuramoto-filtered [T, C]
float32 out, with the tailoring lambda.
"""

import numpy as np

from neural_speech_decoding_tpu.config import FilterConfig
from neural_speech_decoding_tpu.ops.kuramoto import mai_filter


class PreProcessor:
    def __init__(self, sr: int, tailoring_lambda: float = 1.25e-29):
        self.sr = sr
        self.tailoring_lambda = tailoring_lambda
        self._config = FilterConfig(lambd=tailoring_lambda)
        self._jitted = None

    def transform(self, chunk_samples_by_channels: np.ndarray) -> np.ndarray:
        x = np.asarray(chunk_samples_by_channels)
        if x.ndim != 2:
            raise ValueError(
                f"Expected 2D array [samples, channels], got {x.shape}"
            )
        if self._jitted is None:
            import jax

            cfg = self._config
            self._jitted = jax.jit(lambda w: mai_filter(w, cfg))
        return np.asarray(self._jitted(x.astype(np.float32)), dtype=np.float32)
