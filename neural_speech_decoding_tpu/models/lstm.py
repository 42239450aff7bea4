"""EEG LSTM decoder — reference-parity model family, TPU-first.

Behavioral spec (reference: Neuro-Alpha-App/Utilities/lstm_eeg_model.py:13-39):
  x [B, T, C=8]
  -> 2-layer LSTM (hidden 48, batch_first, dropout 0.60 *between* layers,
     torch gate order i, f, g, o)
  -> per-timestep attention score Linear(48, 1), softmax over T,
     attention-weighted sum pooling                     [B, 48]
  -> LayerNorm(48)
  -> Linear(48, 32) -> RReLU -> Dropout(0.60) -> Linear(32, classes)

TPU mapping: the input projection of every LSTM layer is hoisted out of the
recurrence into ONE [B*T, in] x [in, 4H] matmul (MXU-friendly, amortized
over the whole sequence); the `lax.scan` body then only carries the small
[B, H] x [H, 4H] recurrent matmul plus fused elementwise gate math. At eval
time the two layers are software-pipelined into a single scan
(_lstm_two_layer_fused; DecoderConfig.fused_scan) — one [B, 2H] x [2H, 8H]
matmul per timestep instead of two, riding the same K=128 MXU tile. No
Python-level time loop, static shapes throughout, batch axis is the
sharding axis for data parallelism.

RReLU semantics: torch eval mode is the deterministic slope
(lower + upper) / 2 = (1/8 + 1/3) / 2 = 11/48 for negatives; train mode
samples the slope U(lower, upper) per element (used by train/).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from neural_speech_decoding_tpu.config import DecoderConfig
from neural_speech_decoding_tpu.ops import gates as gates_ops

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Initialization (torch-default compatible: U(-1/sqrt(fan), 1/sqrt(fan)))
# ---------------------------------------------------------------------------
def _uniform(rng, shape, bound):
    return jax.random.uniform(rng, shape, jnp.float32, -bound, bound)


def init_decoder_params(rng: jax.Array, config: DecoderConfig) -> Params:
    h = config.hidden_size
    keys = jax.random.split(rng, 4 * config.num_layers + 8)
    k = iter(range(len(keys)))

    layers = []
    bound = 1.0 / jnp.sqrt(h)
    for l in range(config.num_layers):
        in_size = config.input_size if l == 0 else h
        layers.append(
            {
                "w_ih": _uniform(keys[next(k)], (in_size, 4 * h), bound),
                "w_hh": _uniform(keys[next(k)], (h, 4 * h), bound),
                # two torch bias vectors folded into one (their sum is what
                # the cell uses); init as the sum of two U(-bound, bound)
                "b": _uniform(keys[next(k)], (4 * h,), bound)
                + _uniform(keys[next(k)], (4 * h,), bound),
            }
        )

    def linear(key, fan_in, fan_out):
        kw, kb = jax.random.split(key)
        bound = 1.0 / jnp.sqrt(fan_in)
        return {
            "w": _uniform(kw, (fan_in, fan_out), bound),
            "b": _uniform(kb, (fan_out,), bound),
        }

    attn = linear(keys[next(k)], h, 1)
    return {
        "lstm": layers,
        "attn": {"w": attn["w"].reshape(-1), "b": attn["b"].reshape(())},
        "ln": {"scale": jnp.ones((h,), jnp.float32), "bias": jnp.zeros((h,), jnp.float32)},
        "fc1": linear(keys[next(k)], h, 32),
        "fc2": linear(keys[next(k)], 32, config.num_classes),
    }


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------
def _lstm_layer(
    layer: Params,
    x_btc: jnp.ndarray,
    precision,
    recurrence_dtype=jnp.float32,
    gate_math: str = "rational",
    unroll: int = 1,
    remat_chunks: int = 0,
) -> jnp.ndarray:
    """One LSTM layer over the full sequence. [B, T, in] -> [B, T, H].

    `recurrence_dtype` controls the dtype of the recurrent matmul + gate
    math (bfloat16 = TPU turbo mode; input projection and outputs stay
    f32-accumulated). `gate_math` picks the tanh/sigmoid implementation:
    "rational" (default) uses ops/gates.py's ~1-ulp f32 rational
    approximations — on TPU the builtin tanh is ~1350 ulp off and compounds
    to ~2e-3 logit error over the 625-step recurrence; "builtin" keeps the
    backend transcendentals."""
    b, t, _ = x_btc.shape
    h_dim = layer["w_hh"].shape[0]

    # Hoisted input projection: one big MXU matmul for all timesteps.
    xp = (
        jnp.einsum("bti,ih->bth", x_btc, layer["w_ih"], precision=precision)
        + layer["b"]
    ).astype(recurrence_dtype)
    xp_tbh = jnp.transpose(xp, (1, 0, 2))  # time-major for scan

    w_hh = layer["w_hh"].astype(recurrence_dtype)

    if gate_math == "rational":
        # One rational-tanh pass covers all four gates (ops/gates.py:
        # sigmoid_fold_mask / lstm_gate_block): halving the i, f, o gate
        # columns turns the whole [B, 4H] block into a single tanh, folded
        # into the recurrent weights and the hoisted input projection —
        # zero extra ops inside the scan. 1.25 rational evals per step
        # (block + tanh(c)) instead of 2.25, at ~100x the on-TPU builtin
        # gate accuracy. Exact in binary (x0.5), so this changes no
        # results vs the two-eval formulation.
        half_sig = gates_ops.sigmoid_fold_mask(h_dim, recurrence_dtype)
        w_hh = w_hh * half_sig[None, :]
        xp_tbh = xp_tbh * half_sig

    def step(carry: Tuple[jnp.ndarray, jnp.ndarray], xp_t: jnp.ndarray):
        h, c = carry
        # whole-block activations, then slice (torch gate order i,f,g,o):
        # one full-tile VPU pass each beats four padded quarter-width
        # passes (~6% whole-model, measured)
        gates = xp_t + jnp.matmul(h, w_hh, precision=precision)
        i, f, g, o = gates_ops.lstm_gate_block(gates, h_dim, gate_math)
        c = f * c + i * g
        h = o * gates_ops.cell_tanh(c, gate_math)
        return (h, c), h

    # derive the zero state from the data (not a fresh constant) so it
    # carries the same shard-varying axes under shard_map
    zero = (
        jnp.zeros((b, h_dim), recurrence_dtype)
        + (x_btc[:, :1, 0] * 0.0).astype(recurrence_dtype)
    )
    init = (zero, zero)
    if remat_chunks and remat_chunks > 1:
        # chunked gradient rematerialization: the backward pass stores one
        # carry per chunk and recomputes the chunk's T/chunks activations,
        # instead of saving all T step residuals (config.remat_chunks)
        if t % remat_chunks:
            raise ValueError(
                f"remat_chunks={remat_chunks} does not divide T={t}"
            )
        chunk_len = t // remat_chunks
        xs = xp_tbh.reshape(remat_chunks, chunk_len, b, xp_tbh.shape[-1])

        @functools.partial(jax.checkpoint, prevent_cse=False)
        def chunk_body(carry, xc):
            return jax.lax.scan(step, carry, xc, unroll=unroll)

        _, hs = jax.lax.scan(chunk_body, init, xs)
        hs = hs.reshape(t, b, h_dim)
    else:
        _, hs = jax.lax.scan(step, init, xp_tbh, unroll=unroll)
    return jnp.transpose(hs, (1, 0, 2)).astype(jnp.float32)  # [B, T, H]


def _lstm_two_layer_fused(
    layers,
    x_btc: jnp.ndarray,
    precision,
    recurrence_dtype=jnp.float32,
    gate_math: str = "rational",
) -> jnp.ndarray:
    """Both LSTM layers in ONE pipelined scan. [B, T, C] -> [B, T, H].

    The per-layer scan issues two sequential [B, H] x [H, 4H] matmuls per
    timestep (H=48, so each pads to a K=128 MXU tile it mostly wastes).
    Software pipelining with a one-step delay — at combined step s, layer 1
    consumes x_s while layer 2 consumes layer 1's output from step s-1,
    which is already in the carry — fuses them into a single
    [B, 2H] x [2H, 8H] matmul: the K dimension rides the same 128 tile,
    and the scan body runs once per timestep instead of twice.

        gates_s = [xp1_s | b2] + [h1_{s-1}, h2_prev] @ [[W_hh1, W_ih2],
                                                        [    0, W_hh2]]

    Layer 2's input projection therefore happens inside the fused matmul
    (same contraction, single K=96 dot instead of two K=48 dots — rounding
    differs by ~1 ulp). The scan runs T+1 steps; layer 2's update is masked
    at s=0 (it has no input yet) and its outputs are taken from steps 1..T.
    Eval-path only: training needs inter-layer dropout between the layers.
    """
    l1, l2 = layers
    b, t, _ = x_btc.shape
    h_dim = l1["w_hh"].shape[0]

    xp1 = (
        jnp.einsum("bti,ih->bth", x_btc, l1["w_ih"], precision=precision)
        + l1["b"]
    ).astype(recurrence_dtype)
    xp1_tbh = jnp.transpose(xp1, (1, 0, 2))  # [T, B, 4H]
    # one trailing zero step so layer 2 can drain the pipeline
    xp1_tbh = jnp.concatenate(
        [xp1_tbh, jnp.zeros((1, b, 4 * h_dim), recurrence_dtype)], axis=0
    )
    b2 = l2["b"].astype(recurrence_dtype)

    w = jnp.concatenate(
        [
            jnp.concatenate([l1["w_hh"], l2["w_ih"]], axis=1),
            jnp.concatenate(
                [jnp.zeros((h_dim, 4 * h_dim), l2["w_hh"].dtype), l2["w_hh"]],
                axis=1,
            ),
        ],
        axis=0,
    ).astype(recurrence_dtype)  # [2H, 8H]

    if gate_math == "rational":
        half_sig = gates_ops.sigmoid_fold_mask(h_dim, recurrence_dtype)
        w = w * jnp.concatenate([half_sig, half_sig])[None, :]
        xp1_tbh = xp1_tbh * half_sig
        b2 = b2 * half_sig

    # layer 2 has nothing to consume at combined step 0
    live2 = jnp.arange(t + 1) >= 1

    def step(carry, inp):
        h1, c1, h2, c2 = carry
        xp1_t, v2 = inp
        hh = jnp.matmul(
            jnp.concatenate([h1, h2], axis=-1), w, precision=precision
        )
        i1, f1, g1, o1 = gates_ops.lstm_gate_block(
            hh[:, : 4 * h_dim] + xp1_t, h_dim, gate_math
        )
        c1_new = f1 * c1 + i1 * g1
        h1_new = o1 * gates_ops.cell_tanh(c1_new, gate_math)
        i2, f2, g2, o2 = gates_ops.lstm_gate_block(
            hh[:, 4 * h_dim :] + b2, h_dim, gate_math
        )
        c2_new = jnp.where(v2, f2 * c2 + i2 * g2, c2)
        h2_new = jnp.where(
            v2, o2 * gates_ops.cell_tanh(c2_new, gate_math), h2
        )
        return (h1_new, c1_new, h2_new, c2_new), h2_new

    zero = (
        jnp.zeros((b, h_dim), recurrence_dtype)
        + (x_btc[:, :1, 0] * 0.0).astype(recurrence_dtype)
    )
    _, hs = jax.lax.scan(step, (zero, zero, zero, zero), (xp1_tbh, live2))
    return jnp.transpose(hs[1:], (1, 0, 2)).astype(jnp.float32)  # [B, T, H]


def _lstm_two_layer_streaming(
    params: Params,
    x_btc: jnp.ndarray,
    precision,
    recurrence_dtype=jnp.float32,
    gate_math: str = "rational",
    unroll: int = 1,
) -> jnp.ndarray:
    """Both LSTM layers + attention pooling in ONE pipelined scan with no
    [T, B, ·] intermediate in HBM. [B, T, C] -> pooled [B, H] (f32).

    The fused scan (_lstm_two_layer_fused) still streams two large
    buffers through HBM per batch: the hoisted input projection
    xp [T, B, 4H] (written once, then read 4H/C = 24x the input's bytes
    per step) and the layer-2 outputs hs [T, B, H] (written per step,
    re-read by the attention head). Per XLA's own cost model those are
    ~40% of the path's 2.3 MB/window of traffic (tools/roofline.py,
    checkpoints/roofline_r4.json). This variant eliminates both:

    * the input projection folds INTO the fused recurrent matmul — the
      per-step contraction becomes [B, 2H+C] x [2H+C, 8H] with
      K = 104, riding the same 128-wide MXU tile as the K=96 fused form
      (one K=104 dot instead of a K=96 dot plus a hoisted K=C einsum;
      rounding differs by ~1 ulp, same class of reordering as the fused
      scan's layer-2 projection), so each step reads x_t [B, C] from HBM
      instead of xp_t [B, 4H];
    * attention pooling runs ONLINE in the carry (streaming softmax): per
      step the layer-2 output contributes score s_t = h2_t . w_attn + b,
      and (l, acc) carry the exp-sum and exp-weighted h2 sum. Instead of
      a flash-attention running max, the shift is the CONSTANT upper
      bound S = b + ||w_attn||_1 (LSTM outputs satisfy |h2| < 1, so
      s_t <= S always): exp(s_t - S) never overflows, and pooled =
      acc / l is the exact two-pass softmax-weighted sum up to summation
      order — ONE exp per step and no rescaling chain. (A running-max
      variant was measured at 2.45e-4 on-chip model dlogit vs this
      form's ~2e-5: every max update rescales acc/l through another TPU
      VPU exp, and those errors compound across the 625 steps.) Models
      with extreme attention norms (exp(-2 ||w_attn||_1) underflowing
      f32) should set streaming_scan=False; the shipped checkpoint's
      ||w_attn||_1 is ~2.

    Pipelining and gate math are identical to _lstm_two_layer_fused:
    layer 2 consumes layer 1's previous step from the carry, the scan
    runs T+1 steps with layer 2 masked at s=0, and one rational-tanh
    pass covers all four gates of both layers (weights pre-scaled by
    sigmoid_fold_mask — which now also covers the folded W_ih1, scaling
    the x contribution identically). The pooling accumulators stay f32
    even in the bf16 turbo mode. Eval-path only (training needs
    inter-layer dropout and the per-step outputs).
    """
    l1, l2 = params["lstm"]
    b, t, c = x_btc.shape
    h_dim = l1["w_hh"].shape[0]

    x_tbc = jnp.transpose(x_btc, (1, 0, 2)).astype(recurrence_dtype)
    # one trailing zero step so layer 2 can drain the pipeline
    x_tbc = jnp.concatenate(
        [x_tbc, jnp.zeros((1, b, c), recurrence_dtype)], axis=0
    )
    b1 = l1["b"].astype(recurrence_dtype)
    b2 = l2["b"].astype(recurrence_dtype)

    zblock = jnp.zeros((h_dim, 4 * h_dim), l2["w_hh"].dtype)
    w = jnp.concatenate(
        [
            jnp.concatenate([l1["w_hh"], l2["w_ih"]], axis=1),
            jnp.concatenate([zblock, l2["w_hh"]], axis=1),
            jnp.concatenate(
                [l1["w_ih"], jnp.zeros((c, 4 * h_dim), l1["w_ih"].dtype)],
                axis=1,
            ),
        ],
        axis=0,
    ).astype(recurrence_dtype)  # [2H + C, 8H]

    if gate_math == "rational":
        half_sig = gates_ops.sigmoid_fold_mask(h_dim, recurrence_dtype)
        w = w * jnp.concatenate([half_sig, half_sig])[None, :]
        b1 = b1 * half_sig
        b2 = b2 * half_sig

    attn_w = params["attn"]["w"].astype(jnp.float32)
    attn_b = params["attn"]["b"].astype(jnp.float32)
    # constant softmax shift: s_t = h2 . w + b with |h2| < 1 bounds
    # s_t < b + ||w||_1 = S, so exp(s_t - S) is always in (0, 1] — no
    # running max, no rescaling (see the docstring's fidelity note)
    shift = attn_b + jnp.sum(jnp.abs(attn_w))

    # layer 2 has nothing to consume at combined step 0
    live2 = jnp.arange(t + 1) >= 1

    def step(carry, inp):
        h1, c1, h2, c2, l, acc = carry
        x_t, v2 = inp
        hh = jnp.matmul(
            jnp.concatenate([h1, h2, x_t], axis=-1), w, precision=precision
        )
        i1, f1, g1, o1 = gates_ops.lstm_gate_block(
            hh[:, : 4 * h_dim] + b1, h_dim, gate_math
        )
        c1_new = f1 * c1 + i1 * g1
        h1_new = o1 * gates_ops.cell_tanh(c1_new, gate_math)
        i2, f2, g2, o2 = gates_ops.lstm_gate_block(
            hh[:, 4 * h_dim :] + b2, h_dim, gate_math
        )
        c2_new = jnp.where(v2, f2 * c2 + i2 * g2, c2)
        h2_new = jnp.where(
            v2, o2 * gates_ops.cell_tanh(c2_new, gate_math), h2
        )
        # online softmax pooling over the live layer-2 outputs (f32)
        h2f = h2_new.astype(jnp.float32)
        s_t = (
            jnp.matmul(h2f, attn_w[:, None], precision=precision)[:, 0]
            + attn_b
        )
        wgt = jnp.exp(s_t - shift)
        l_new = jnp.where(v2, l + wgt, l)
        acc_new = jnp.where(v2, acc + wgt[:, None] * h2f, acc)
        return (h1_new, c1_new, h2_new, c2_new, l_new, acc_new), None

    zero = (
        jnp.zeros((b, h_dim), recurrence_dtype)
        + (x_btc[:, :1, 0] * 0.0).astype(recurrence_dtype)
    )
    zf = zero.astype(jnp.float32)
    init = (
        zero,
        zero,
        zero,
        zero,
        jnp.zeros((b,), jnp.float32) + zf[:, 0],
        jnp.zeros((b, h_dim), jnp.float32) + zf,
    )
    (_, _, _, _, l, acc), _ = jax.lax.scan(
        step, init, (x_tbc, live2), unroll=unroll
    )
    return acc / l[:, None]


def _rrelu(
    x: jnp.ndarray,
    config: DecoderConfig,
    train: bool,
    rng: Optional[jax.Array],
) -> jnp.ndarray:
    if train:
        slope = jax.random.uniform(
            rng, x.shape, x.dtype, config.rrelu_lower, config.rrelu_upper
        )
    else:
        slope = jnp.asarray(
            (config.rrelu_lower + config.rrelu_upper) / 2.0, x.dtype
        )
    return jnp.where(x >= 0, x, x * slope)


def decoder_apply(
    params: Params,
    x_btc: jnp.ndarray,
    config: DecoderConfig = DecoderConfig(),
    *,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    precision=jax.lax.Precision.HIGHEST,
) -> jnp.ndarray:
    """Logits for a batch of windows. [B, T, C] f32 -> [B, classes] f32."""
    if train and rng is None:
        raise ValueError("train=True requires rng")
    x = x_btc.astype(jnp.float32)

    n_layers = len(params["lstm"])
    rngs = jax.random.split(rng, n_layers + 2) if train else [None] * (n_layers + 2)

    rec_dtype = jnp.dtype(config.recurrence_dtype)
    out = x
    if not train and config.fused_scan and len(params["lstm"]) == 2:
        if config.streaming_scan:
            pooled = _lstm_two_layer_streaming(
                params, out, precision, rec_dtype, config.gate_math,
                unroll=config.eval_scan_unroll,
            )
            return _head_from_pooled(
                params, pooled, config, train, rngs, precision
            )
        out = _lstm_two_layer_fused(
            params["lstm"], out, precision, rec_dtype, config.gate_math
        )
        return _head(params, out, config, train, rngs, precision)
    for l, layer in enumerate(params["lstm"]):
        out = _lstm_layer(
            layer, out, precision, rec_dtype, config.gate_math,
            unroll=config.scan_unroll, remat_chunks=config.remat_chunks,
        )
        if train and config.dropout > 0 and l < n_layers - 1:
            # torch applies inter-layer dropout to every layer output except
            # the last one (nn.LSTM dropout semantics).
            keep = 1.0 - config.dropout
            mask = jax.random.bernoulli(rngs[l], keep, out.shape)
            out = jnp.where(mask, out / keep, 0.0)
    return _head(params, out, config, train, rngs, precision)


def _head(params, out, config, train, rngs, precision):
    """Attention pooling + LayerNorm + MLP head. [B, T, H] -> [B, classes]."""
    # Attention pooling over time.
    scores = jnp.einsum("bth,h->bt", out, params["attn"]["w"], precision=precision)
    scores = scores + params["attn"]["b"]
    weights = jax.nn.softmax(scores, axis=1)
    pooled = jnp.einsum("bth,bt->bh", out, weights, precision=precision)
    return _head_from_pooled(params, pooled, config, train, rngs, precision)


def _head_from_pooled(params, pooled, config, train, rngs, precision):
    """LayerNorm + MLP head on already-pooled features. [B, H] ->
    [B, classes] (the streaming scan pools online in its carry)."""
    # LayerNorm (torch: biased variance, eps inside sqrt).
    mean = jnp.mean(pooled, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(pooled - mean), axis=-1, keepdims=True)
    normed = (pooled - mean) / jnp.sqrt(var + config.layernorm_eps)
    normed = normed * params["ln"]["scale"] + params["ln"]["bias"]

    hidden = (
        jnp.matmul(normed, params["fc1"]["w"], precision=precision)
        + params["fc1"]["b"]
    )
    hidden = _rrelu(hidden, config, train, rngs[-2] if train else None)
    if train and config.dropout > 0:
        keep = 1.0 - config.dropout
        mask = jax.random.bernoulli(rngs[-1], keep, hidden.shape)
        hidden = jnp.where(mask, hidden / keep, 0.0)
    return (
        jnp.matmul(hidden, params["fc2"]["w"], precision=precision)
        + params["fc2"]["b"]
    )


def decoder_logits(params: Params, x_btc: jnp.ndarray, config: DecoderConfig = DecoderConfig()):
    """Eval-mode logits (the inference path)."""
    return decoder_apply(params, x_btc, config, train=False)
