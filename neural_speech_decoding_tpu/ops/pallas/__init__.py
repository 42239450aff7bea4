"""Pallas TPU kernels for the hot serving ops.

Modules (import directly, no re-exports):
  bandcov    lane-batched per-band covariance grams
  logm       lane-batched Chebyshev/Clenshaw matrix log on SPD 8x8s
  logmfeats  fused whitened-logcov feature kernel (shrinkage + guard +
             Clenshaw + triu in one lane-major pass)
  iir        forward-backward biquad cascades (collector chain experiment)

A fused LSTM recurrence kernel lived here through round 4 and was retired
after losing to the XLA `lax.scan` path twice (see docs/BENCHMARKS.md,
"Retired: the Pallas LSTM kernel").
"""
