from neural_speech_decoding_tpu.ops.pallas.lstm import lstm_layer_pallas  # noqa: F401
