"""`Utilities.tester` — reference-parity module path.

Forwards to neural_speech_decoding_tpu.runtime.tester (same signatures:
reference tester.py:23-37).
"""

from neural_speech_decoding_tpu.runtime.tester import (  # noqa: F401
    DEFAULT_SERIAL,
    TrialResult,
    main,
    run_trials,
    run_trials_ex,
)
