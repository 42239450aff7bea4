from neural_speech_decoding_tpu.utils.timing import LatencyStats, Stopwatch  # noqa: F401
