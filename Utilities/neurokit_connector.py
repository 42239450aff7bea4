"""`Utilities.neurokit_connector` — reference-parity module path.

`NeuroPawnConnector` keeps the reference surface (reference:
neurokit_connector.py:10-67): start_stream / get_window([C, T]) /
stop_stream over a board resolved from `serial_port` (board specs or
Board instances; real serial hardware is absent here).
"""

from neural_speech_decoding_tpu.runtime.connector import Connector


class NeuroPawnConnector(Connector):
    def __init__(self, serial_port, num_channels: int = 8, buffer_size: int = 450000):
        super().__init__(
            serial_port, num_channels=num_channels, buffer_size=buffer_size
        )
        self.params = None  # BrainFlowInputParams equivalent not needed

    def get_window(self, seconds: float):
        return super().get_window(seconds)
