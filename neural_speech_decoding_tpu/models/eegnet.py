"""EEGNet-style temporal + spatial convolutional EEG encoder.

One of the reference's planned model variants (BASELINE.json configs:
"EEGNet-style temporal+spatial 1D-conv encoder swapped in behind the same
run_trials API"). Classic EEGNet staging — temporal conv bank, depthwise
spatial filter across electrodes, separable temporal conv, pooling —
re-expressed TPU-first:

  * convolutions via lax.conv_general_dilated in NCHW with static shapes,
  * stateless normalization (per-sample LayerNorm over features) instead of
    BatchNorm: no running statistics to carry through pjit/shard_map, no
    train/eval state split, and at these dataset sizes it trains as well,
  * ELU activations, average pooling, dropout in train mode.

Input [B, T, C] -> logits [B, num_classes].
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class EEGNetConfig:
    num_channels: int = 8
    num_classes: int = 3
    temporal_filters: int = 8  # F1
    depth_multiplier: int = 2  # D
    separable_filters: int = 16  # F2
    temporal_kernel: int = 64
    separable_kernel: int = 16
    pool1: int = 4
    pool2: int = 8
    dropout: float = 0.5
    window_samples: int = 625


def init_eegnet_params(rng: jax.Array, cfg: EEGNetConfig) -> Params:
    k = jax.random.split(rng, 5)
    f1, d, f2 = cfg.temporal_filters, cfg.depth_multiplier, cfg.separable_filters

    def he(key, shape, fan_in):
        return jax.random.normal(key, shape, jnp.float32) * jnp.sqrt(2.0 / fan_in)

    t_after = cfg.window_samples // cfg.pool1 // cfg.pool2
    feat = f2 * t_after
    return {
        # temporal conv: [out=F1, in=1, kh=1, kw=K]
        "conv_t": he(k[0], (f1, 1, 1, cfg.temporal_kernel), cfg.temporal_kernel),
        # depthwise spatial: [out=F1*D, in=1 (per group), kh=C, kw=1]
        "conv_s": he(k[1], (f1 * d, 1, cfg.num_channels, 1), cfg.num_channels),
        # separable: depthwise temporal + pointwise
        "conv_dw": he(k[2], (f1 * d, 1, 1, cfg.separable_kernel), cfg.separable_kernel),
        "conv_pw": he(k[3], (f2, f1 * d, 1, 1), f1 * d),
        "ln1": {"scale": jnp.ones((f1 * d,), jnp.float32), "bias": jnp.zeros((f1 * d,), jnp.float32)},
        "ln2": {"scale": jnp.ones((f2,), jnp.float32), "bias": jnp.zeros((f2,), jnp.float32)},
        "head": {
            "w": he(k[4], (feat, cfg.num_classes), feat),
            "b": jnp.zeros((cfg.num_classes,), jnp.float32),
        },
    }


def _conv(x, w, groups=1, padding="SAME"):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=padding,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=groups,
        precision=jax.lax.Precision.DEFAULT,
    )


def _channel_layernorm(x_nchw, ln, eps=1e-5):
    # normalize each sample over (C, H, W), scale/bias per feature channel
    mean = jnp.mean(x_nchw, axis=(1, 2, 3), keepdims=True)
    var = jnp.var(x_nchw, axis=(1, 2, 3), keepdims=True)
    y = (x_nchw - mean) / jnp.sqrt(var + eps)
    return y * ln["scale"][None, :, None, None] + ln["bias"][None, :, None, None]


def _avgpool_time(x_nchw, k):
    return jax.lax.reduce_window(
        x_nchw, 0.0, jax.lax.add, (1, 1, 1, k), (1, 1, 1, k), "VALID"
    ) / float(k)


def eegnet_apply(
    params: Params,
    x_btc: jnp.ndarray,
    cfg: EEGNetConfig = EEGNetConfig(),
    *,
    train: bool = False,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    if train and rng is None:
        raise ValueError("train=True requires rng")
    b, t, c = x_btc.shape
    x = jnp.transpose(x_btc, (0, 2, 1))[:, None, :, :]  # [B, 1, C, T]

    h = _conv(x, params["conv_t"])  # [B, F1, C, T]
    h = _conv(h, params["conv_s"], groups=params["conv_t"].shape[0],
              padding="VALID")  # [B, F1*D, 1, T]
    h = _channel_layernorm(h, params["ln1"])
    h = jax.nn.elu(h)
    h = _avgpool_time(h, cfg.pool1)

    if train:
        rng, k1 = jax.random.split(rng)
        keep = 1.0 - cfg.dropout
        h = jnp.where(jax.random.bernoulli(k1, keep, h.shape), h / keep, 0.0)

    h = _conv(h, params["conv_dw"], groups=h.shape[1])  # depthwise temporal
    h = _conv(h, params["conv_pw"])  # pointwise -> F2
    h = _channel_layernorm(h, params["ln2"])
    h = jax.nn.elu(h)
    h = _avgpool_time(h, cfg.pool2)

    if train:
        rng, k2 = jax.random.split(rng)
        keep = 1.0 - cfg.dropout
        h = jnp.where(jax.random.bernoulli(k2, keep, h.shape), h / keep, 0.0)

    flat = h.reshape(b, -1)
    return flat @ params["head"]["w"] + params["head"]["b"]
