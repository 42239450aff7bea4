"""`Utilities.streaming_process` — reference-parity module path.

`StreamingProcess` is the thread-based producer with the reference's
surface (reference: streaming_process.py:10-77): recording_flag.value,
stop(), payload dicts on the out queue. `serial_port` accepts board specs
(replay/synthetic/native-*) or Board instances since real serial hardware
is absent here.
"""

from neural_speech_decoding_tpu.runtime.streaming import (  # noqa: F401
    StreamingProducer,
)


class StreamingProcess(StreamingProducer):
    def __init__(
        self,
        serial_port,
        num_channels: int = 8,
        window_seconds: float = 5.0,
        out_queue=None,
        start_recording: bool = False,
        buffer_size: int = 450000,
        **kwargs,
    ):
        super().__init__(
            serial_port,
            num_channels=num_channels,
            window_seconds=window_seconds,
            out_queue=out_queue,
            start_recording=start_recording,
            buffer_size=buffer_size,
        )
