"""Compatibility package: the reference's import surface.

Reference user code does `from Utilities.tester import run_trials`
(reference: Frontend/app.py:28, readme.md:21-26). This package forwards
that surface to the TPU-native implementation in
`neural_speech_decoding_tpu.runtime`.
"""
