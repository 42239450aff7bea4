"""Accurate f32 gate activations for the LSTM recurrence.

The TPU VPU's builtin transcendentals are fast approximations: measured on
the real chip, `jnp.tanh` has max absolute error 4.4e-5 (~1350 ulp of f32)
and `jax.nn.sigmoid` 1.2e-6, vs ~5 ulp for both on XLA:CPU. Through the
reference model's 625-step recurrence that per-op error compounds into a
~1.9e-3 max logit delta against the torch CPU golden — the entire on-TPU
fidelity gap (the filter stage holds 1.5e-5).

Multiplies and adds ARE correctly rounded on the VPU, so a minimax rational
approximation evaluated in f32 beats the builtin by ~100x on device:
measured max abs error 3.95e-7 (tanh) / 1.89e-7 (sigmoid) over [-10, 10].
This is the classic 13/6-degree odd rational used by Eigen/XLA:CPU
(tanh(x) = x * P(x^2) / Q(x^2), clamped where tanh has saturated to 1 in
f32), built from adds, multiplies, and one divide — MXU/VPU friendly, no
data-dependent control flow, and in practice as fast as the builtin.

Only meaningful in float32: for other dtypes (bf16 turbo recurrence, f64
CPU fidelity) the functions fall back to the builtins, which are already
at (or beyond) the dtype's resolution there.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Numerator (odd powers of x: coefficient of x^13 first) and denominator
# (even powers: x^6 first) of the minimax rational approximation.
_TANH_P = (
    -2.76076847742355e-16,
    2.00018790482477e-13,
    -8.60467152213735e-11,
    5.12229709037114e-08,
    1.48572235717979e-05,
    6.37261928875436e-04,
    4.89352455891786e-03,
)
_TANH_Q = (
    1.19825839466702e-06,
    1.18534705686654e-04,
    2.26843463243900e-03,
    4.89352518554385e-03,
)
# |x| beyond which f32 tanh(x) rounds to +/-1 exactly; clamping there keeps
# the polynomial in its fitted range without a select on the output.
_TANH_SATURATION = 7.99


def tanh(x: jnp.ndarray) -> jnp.ndarray:
    """~1-ulp f32 tanh from correctly-rounded mul/add/div (see module doc)."""
    if x.dtype != jnp.float32:
        return jnp.tanh(x)
    x = jnp.clip(x, -_TANH_SATURATION, _TANH_SATURATION)
    x2 = x * x
    p = jnp.asarray(_TANH_P[0], x.dtype)
    for coef in _TANH_P[1:]:
        p = x2 * p + coef
    q = jnp.asarray(_TANH_Q[0], x.dtype)
    for coef in _TANH_Q[1:]:
        q = x2 * q + coef
    return (x * p) / q


def sigmoid(x: jnp.ndarray) -> jnp.ndarray:
    """sigmoid(x) = 0.5 * (1 + tanh(x/2)) on the accurate tanh."""
    if x.dtype != jnp.float32:
        return jax.nn.sigmoid(x)
    return 0.5 + 0.5 * tanh(0.5 * x)


# ---------------------------------------------------------------------------
# LSTM gate-block evaluation for the lax.scan recurrence (models/lstm.py).
# (Also served the retired Pallas LSTM kernel; kept factored out so any
# future recurrence backend reuses the exact same gate numerics.)
# ---------------------------------------------------------------------------
def sigmoid_fold_mask(h_dim: int, dtype=jnp.float32) -> jnp.ndarray:
    """[4H] mask that pre-halves the sigmoid gates' columns (i, f, o in
    torch order; g stays x1). sigmoid(x) = 0.5 + 0.5 * tanh(x/2), so with
    pre-halved inputs ONE whole-block tanh covers all four gates; x0.5 is a
    power of two, hence exact, and scaling weights/bias before the matmul
    rounds identically to scaling its output."""
    m = jnp.ones((4 * h_dim,), dtype).at[: 2 * h_dim].set(0.5)
    return m.at[3 * h_dim :].set(0.5)


def lstm_gate_block(gates: jnp.ndarray, h_dim: int, gate_math: str):
    """(i, f, g, o) activations from one pre-activation block [..., 4H]
    (torch gate order). gate_math="rational" expects the i/f/o columns to
    have been pre-scaled with sigmoid_fold_mask (weights or activations);
    "builtin" uses the backend transcendentals on unscaled gates."""
    if gate_math == "rational":
        y = tanh(gates)
        sig = 0.5 + 0.5 * y
        return (
            sig[..., 0 * h_dim : 1 * h_dim],
            sig[..., 1 * h_dim : 2 * h_dim],
            y[..., 2 * h_dim : 3 * h_dim],
            sig[..., 3 * h_dim : 4 * h_dim],
        )
    sig = jax.nn.sigmoid(gates)
    tg = jnp.tanh(gates)
    return (
        sig[..., 0 * h_dim : 1 * h_dim],
        sig[..., 1 * h_dim : 2 * h_dim],
        tg[..., 2 * h_dim : 3 * h_dim],
        sig[..., 3 * h_dim : 4 * h_dim],
    )


def cell_tanh(x: jnp.ndarray, gate_math: str) -> jnp.ndarray:
    """tanh for the cell-state output path under the chosen gate_math."""
    return tanh(x) if gate_math == "rational" else jnp.tanh(x)
