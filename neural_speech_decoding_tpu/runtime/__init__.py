from neural_speech_decoding_tpu.runtime.board import (  # noqa: F401
    Board,
    ReplayBoard,
    SyntheticBoard,
    open_board,
)
from neural_speech_decoding_tpu.runtime.streaming import StreamingProducer  # noqa: F401
from neural_speech_decoding_tpu.runtime.engine import InferenceEngine  # noqa: F401
from neural_speech_decoding_tpu.runtime.ensemble import EnsembleEngine  # noqa: F401
from neural_speech_decoding_tpu.runtime.tester import (  # noqa: F401
    TrialResult,
    RunStats,
    run_trials,
    run_trials_ex,
)
