from neural_speech_decoding_tpu.models.lstm import (  # noqa: F401
    init_decoder_params,
    decoder_apply,
    decoder_logits,
)
