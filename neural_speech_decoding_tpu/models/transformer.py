"""Transformer EEG encoder.

The reference README's "next steps" model and a BASELINE.json config
("Transformer/attention EEG encoder over epoched windows"). TPU-first
design choices:

  * the 625-sample window is patchified into tokens (patch p over time x
    all channels -> linear embed), turning the sequential LSTM recurrence
    into MXU-friendly batched matmuls over ~25 tokens,
  * pre-LN blocks, multi-head self-attention via one einsum chain, GELU
    FFN — every matmul carries the embed or FFN dim on the lane axis,
  * tensor-parallel friendly: head projections and FFN hidden split over
    'tp' (see parallel/sharding.py),
  * sinusoidal positions (no learned state tied to sequence length).

Input [B, T, C] -> logits [B, num_classes].
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class TransformerConfig:
    num_channels: int = 8
    num_classes: int = 3
    window_samples: int = 625
    patch: int = 25  # tokens = window_samples // patch
    embed: int = 64
    heads: int = 4
    layers: int = 2
    ffn: int = 128
    dropout: float = 0.3
    ln_eps: float = 1e-5

    @property
    def tokens(self) -> int:
        return self.window_samples // self.patch


def _sinusoid(tokens: int, dim: int) -> np.ndarray:
    pos = np.arange(tokens)[:, None]
    i = np.arange(dim)[None, :]
    angle = pos / np.power(10000.0, (2 * (i // 2)) / dim)
    enc = np.where(i % 2 == 0, np.sin(angle), np.cos(angle))
    return enc.astype(np.float32)


def init_transformer_params(rng: jax.Array, cfg: TransformerConfig) -> Params:
    n_keys = 2 + cfg.layers * 4  # embed + head + 4 weight matrices per block
    keys = iter(jax.random.split(rng, n_keys))

    def glorot(key, shape):
        fan_in, fan_out = shape[0], shape[-1]
        s = jnp.sqrt(2.0 / (fan_in + fan_out))
        return jax.random.normal(key, shape, jnp.float32) * s

    d, f = cfg.embed, cfg.ffn
    in_dim = cfg.patch * cfg.num_channels
    blocks = []
    for _ in range(cfg.layers):
        blocks.append(
            {
                "ln1": {"scale": jnp.ones((d,), jnp.float32), "bias": jnp.zeros((d,), jnp.float32)},
                "wqkv": glorot(next(keys), (d, 3 * d)),
                "wo": glorot(next(keys), (d, d)),
                "ln2": {"scale": jnp.ones((d,), jnp.float32), "bias": jnp.zeros((d,), jnp.float32)},
                "w1": glorot(next(keys), (d, f)),
                "b1": jnp.zeros((f,), jnp.float32),
                "w2": glorot(next(keys), (f, d)),
                "b2": jnp.zeros((d,), jnp.float32),
            }
        )
    return {
        "embed": {"w": glorot(next(keys), (in_dim, d)), "b": jnp.zeros((d,), jnp.float32)},
        "pos": jnp.asarray(_sinusoid(cfg.tokens, d)),
        "blocks": blocks,
        "ln_f": {"scale": jnp.ones((d,), jnp.float32), "bias": jnp.zeros((d,), jnp.float32)},
        "head": {"w": glorot(next(keys), (d, cfg.num_classes)),
                 "b": jnp.zeros((cfg.num_classes,), jnp.float32)},
    }


def _ln(x, p, eps):
    mean = jnp.mean(x, -1, keepdims=True)
    var = jnp.var(x, -1, keepdims=True)
    return (x - mean) / jnp.sqrt(var + eps) * p["scale"] + p["bias"]


def _dropout(x, rate, rng):
    keep = 1.0 - rate
    return jnp.where(jax.random.bernoulli(rng, keep, x.shape), x / keep, 0.0)


def transformer_apply(
    params: Params,
    x_btc: jnp.ndarray,
    cfg: TransformerConfig = TransformerConfig(),
    *,
    train: bool = False,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    if train and rng is None:
        raise ValueError("train=True requires rng")
    b, t, c = x_btc.shape
    n, p, d, h = cfg.tokens, cfg.patch, cfg.embed, cfg.heads
    dh = d // h

    x = x_btc[:, : n * p, :].reshape(b, n, p * c)
    tok = x @ params["embed"]["w"] + params["embed"]["b"] + params["pos"]

    for blk in params["blocks"]:
        y = _ln(tok, blk["ln1"], cfg.ln_eps)
        qkv = y @ blk["wqkv"]  # [B, N, 3D]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, n, h, dh)
        k = k.reshape(b, n, h, dh)
        v = v.reshape(b, n, h, dh)
        att = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(float(dh))
        att = jax.nn.softmax(att, axis=-1)
        if train:
            rng, kd = jax.random.split(rng)
            att = _dropout(att, cfg.dropout, kd)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", att, v).reshape(b, n, d)
        tok = tok + ctx @ blk["wo"]

        y = _ln(tok, blk["ln2"], cfg.ln_eps)
        y = jax.nn.gelu(y @ blk["w1"] + blk["b1"]) @ blk["w2"] + blk["b2"]
        if train:
            rng, kd = jax.random.split(rng)
            y = _dropout(y, cfg.dropout, kd)
        tok = tok + y

    pooled = jnp.mean(_ln(tok, params["ln_f"], cfg.ln_eps), axis=1)
    return pooled @ params["head"]["w"] + params["head"]["b"]
