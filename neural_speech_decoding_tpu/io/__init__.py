from neural_speech_decoding_tpu.io.dataset import (  # noqa: F401
    TrialDataset,
    default_data_dir,
    load_trials,
)
from neural_speech_decoding_tpu.io.checkpoint import (  # noqa: F401
    load_torch_checkpoint,
    load_decoder_params,
)
