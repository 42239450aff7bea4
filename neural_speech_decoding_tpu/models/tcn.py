"""Temporal convolutional network (residual stack) EEG decoder.

The reference README describes its decoder as an "LSTM + residual stack"
(reference: readme.md:64) though the shipped code has no residual blocks;
this family supplies the residual-stack interpretation properly: dilated
causal 1-D convolutions with residual connections (standard TCN), global
average pooling, linear head. TPU-friendly: every op is a conv/matmul with
static shapes, no recurrence at all — the whole window is one parallel
pass, so it scales on the MXU far better than the LSTM.

Input [B, T, C] -> logits [B, num_classes].
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class TCNConfig:
    num_channels: int = 8
    num_classes: int = 3
    width: int = 48
    kernel: int = 7
    # dilations double per block: receptive field = 1 + (k-1) * sum(dilations)
    blocks: int = 5
    dropout: float = 0.3
    ln_eps: float = 1e-5


def init_tcn_params(rng: jax.Array, cfg: TCNConfig) -> Params:
    keys = iter(jax.random.split(rng, 2 * cfg.blocks + 2))

    def conv_w(key, in_ch, out_ch, k):
        fan_in = in_ch * k
        return jax.random.normal(key, (out_ch, in_ch, k), jnp.float32) * jnp.sqrt(
            2.0 / fan_in
        )

    blocks = []
    in_ch = cfg.num_channels
    for _ in range(cfg.blocks):
        blocks.append(
            {
                "w1": conv_w(next(keys), in_ch, cfg.width, cfg.kernel),
                "b1": jnp.zeros((cfg.width,), jnp.float32),
                "w2": conv_w(next(keys), cfg.width, cfg.width, cfg.kernel),
                "b2": jnp.zeros((cfg.width,), jnp.float32),
                "ln": {
                    "scale": jnp.ones((cfg.width,), jnp.float32),
                    "bias": jnp.zeros((cfg.width,), jnp.float32),
                },
            }
        )
        in_ch = cfg.width
    return {
        "blocks": blocks,
        "proj": jax.random.normal(
            next(keys), (cfg.num_channels, cfg.width), jnp.float32
        ) * jnp.sqrt(1.0 / cfg.num_channels),
        "head": {
            "w": jax.random.normal(next(keys), (cfg.width, cfg.num_classes), jnp.float32)
            * jnp.sqrt(1.0 / cfg.width),
            "b": jnp.zeros((cfg.num_classes,), jnp.float32),
        },
    }


def _causal_conv(x_bct: jnp.ndarray, w_oik: jnp.ndarray, dilation: int) -> jnp.ndarray:
    k = w_oik.shape[-1]
    pad = (k - 1) * dilation
    return jax.lax.conv_general_dilated(
        x_bct,
        w_oik,
        window_strides=(1,),
        padding=[(pad, 0)],  # causal: left pad only
        rhs_dilation=(dilation,),
        dimension_numbers=("NCH", "OIH", "NCH"),
    )


def _ln_channels(x_bct, p, eps):
    mean = jnp.mean(x_bct, axis=1, keepdims=True)
    var = jnp.var(x_bct, axis=1, keepdims=True)
    y = (x_bct - mean) / jnp.sqrt(var + eps)
    return y * p["scale"][None, :, None] + p["bias"][None, :, None]


def tcn_apply(
    params: Params,
    x_btc: jnp.ndarray,
    cfg: TCNConfig = TCNConfig(),
    *,
    train: bool = False,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    if train and rng is None:
        raise ValueError("train=True requires rng")
    x = jnp.transpose(x_btc.astype(jnp.float32), (0, 2, 1))  # [B, C, T]

    # channel projection for the first residual connection
    res = jnp.einsum("bct,cw->bwt", x, params["proj"])
    h = x
    for i, blk in enumerate(params["blocks"]):
        dilation = 2 ** i
        y = _causal_conv(h, blk["w1"], dilation) + blk["b1"][None, :, None]
        y = jax.nn.gelu(y)
        y = _causal_conv(y, blk["w2"], dilation) + blk["b2"][None, :, None]
        y = _ln_channels(y, blk["ln"], cfg.ln_eps)
        if train and cfg.dropout > 0:
            rng, k = jax.random.split(rng)
            keep = 1.0 - cfg.dropout
            y = jnp.where(jax.random.bernoulli(k, keep, y.shape), y / keep, 0.0)
        h = jax.nn.gelu(y + res)
        res = h

    pooled = jnp.mean(h, axis=-1)  # [B, width]
    return pooled @ params["head"]["w"] + params["head"]["b"]
