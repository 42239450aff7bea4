"""Sharding specs and sharded execution helpers.

Design: annotate shardings on inputs/params, let GSPMD insert collectives
over ICI. Data (windows) shard over 'dp'; the LSTM's stacked-gate dimension
(4H), the attention/fc hidden dims, and anything model-wide shards over
'tp'. For the production LSTM tp is usually 1 (the model is tiny); the same
specs drive the bigger transformer family.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def batch_sharding(mesh: Mesh, ndim: int = 3) -> NamedSharding:
    """Shard the leading (batch) axis over 'dp', replicate the rest."""
    return NamedSharding(mesh, P("dp", *([None] * (ndim - 1))))


def replicate(mesh: Mesh, tree: Any) -> Any:
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def _tp_spec_for_leaf(path: str, ndim: int) -> P:
    """Tensor-parallel PartitionSpec for a decoder param leaf.

    LSTM gate matrices [in, 4H] and biases [4H] shard the gate dim; fc1
    shards its output dim; fc2 shards its input dim (row-parallel, output
    replicated via psum inserted by GSPMD). LayerNorm/attention stay
    replicated (tiny).
    """
    if "lstm" in path:
        if "w_ih" in path or "w_hh" in path:
            return P(None, "tp")
        if path.endswith("b"):
            return P("tp")
    if "fc1" in path:
        return P(None, "tp") if ndim == 2 else P("tp")
    if "fc2" in path and ndim == 2:
        return P("tp", None)
    return P(*([None] * ndim))


def shard_params_tp(mesh: Mesh, params: Any) -> Any:
    """Place decoder params with tensor-parallel shardings over 'tp'."""

    def place(path, leaf):
        pathstr = jax.tree_util.keystr(path)
        spec = _tp_spec_for_leaf(pathstr, jnp.ndim(leaf))
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def sharded_predict_fn(
    mesh: Mesh, pipeline_fn: Callable, params: Any, tp_shard: bool = False
):
    """jit `pipeline_fn(params, windows)` with windows sharded over 'dp'
    (and params optionally tensor-parallel over 'tp').

    Returns (jitted_fn, placed_params). The caller feeds global arrays;
    GSPMD partitions per device and rides ICI for any cross-shard math.
    """
    placed = shard_params_tp(mesh, params) if tp_shard else replicate(mesh, params)
    fn = jax.jit(
        pipeline_fn,
        in_shardings=(None, batch_sharding(mesh)),
        out_shardings=NamedSharding(mesh, P("dp")),
    )
    return fn, placed
