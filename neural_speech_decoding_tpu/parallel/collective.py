"""Explicit shard_map collectives.

GSPMD (parallel/sharding.py) covers the automatic path; this module is the
manual-collective path for computations where the communication pattern is
part of the algorithm: per-shard partial results combined with psum over
the ICI mesh. Used for sharded evaluation/aggregation and as the template
for scaling beyond one host.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map


def sharded_eval(
    mesh: Mesh,
    apply_fn: Callable,
    params: Any,
    windows: np.ndarray,
    labels: np.ndarray,
):
    """Data-parallel evaluation with explicit psum reduction.

    Each 'dp' shard decodes its slice of windows and contributes partial
    (correct, total) counts; one psum over the mesh yields global accuracy
    without gathering logits to the host. Returns (accuracy, n_evaluated).
    """
    dp = mesh.shape["dp"]
    n = windows.shape[0]
    pad = (-n) % dp
    if pad:
        windows = np.concatenate([windows, np.repeat(windows[:1], pad, 0)], 0)
        labels = np.concatenate([labels, np.full(pad, -1, labels.dtype)])

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P("dp", None, None), P("dp")),
        out_specs=P(),
    )
    def _eval(p, w, y):
        logits = apply_fn(p, w)
        pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        valid = (y >= 0).astype(jnp.float32)
        correct = jnp.sum((pred == y).astype(jnp.float32) * valid)
        total = jnp.sum(valid)
        # explicit ICI collective: combine partial counts across 'dp' AND
        # 'tp' (tp shards see replicated data; average them out via the
        # tp-axis mean after summing dp)
        correct = jax.lax.psum(correct, "dp")
        total = jax.lax.psum(total, "dp")
        correct = jax.lax.pmean(correct, "tp")
        total = jax.lax.pmean(total, "tp")
        return jnp.stack([correct, total])

    placed_w = jax.device_put(
        windows.astype(np.float32), NamedSharding(mesh, P("dp", None, None))
    )
    placed_y = jax.device_put(
        labels.astype(np.int32), NamedSharding(mesh, P("dp"))
    )
    out = np.asarray(_eval(params, placed_w, placed_y))
    correct, total = float(out[0]), float(out[1])
    return (correct / total if total else 0.0), int(total)


def all_gather_probs(mesh: Mesh, probs_fn: Callable, params: Any, windows: np.ndarray):
    """Decode dp-sharded windows and all-gather the probabilities back to
    every device (explicit all_gather over 'dp')."""
    dp = mesh.shape["dp"]
    n = windows.shape[0]
    if n % dp:
        raise ValueError(f"batch {n} not divisible by dp={dp}")

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P("dp", None, None)),
        out_specs=P(),
        # replication holds by construction (all_gather over dp + pmean
        # over tp) but cannot be statically inferred by the rep checker
        check_vma=False,
    )
    def _decode(p, w):
        probs = probs_fn(p, w)
        gathered = jax.lax.all_gather(probs, "dp", axis=0, tiled=True)
        return jax.lax.pmean(gathered, "tp")

    placed = jax.device_put(
        windows.astype(np.float32), NamedSharding(mesh, P("dp", None, None))
    )
    return np.asarray(_decode(params, placed))
