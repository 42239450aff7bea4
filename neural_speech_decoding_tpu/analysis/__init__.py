from neural_speech_decoding_tpu.analysis.metrics import (  # noqa: F401
    compute_filter_metrics,
    snr_db,
)
from neural_speech_decoding_tpu.analysis.io import (  # noqa: F401
    detect_orientation,
    detect_unit_scale,
    read_numeric_csv,
)
