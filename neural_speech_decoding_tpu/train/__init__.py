from neural_speech_decoding_tpu.train.loop import (  # noqa: F401
    TrainConfig,
    TrainState,
    make_train_step,
    train,
)
