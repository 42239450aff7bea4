from neural_speech_decoding_tpu.ops.hilbert import analytic_signal, instantaneous_phase  # noqa: F401
from neural_speech_decoding_tpu.ops.kuramoto import (  # noqa: F401
    kuramoto_operator,
    mai_filter,
    mai_filter_batch,
)
