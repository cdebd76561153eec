"""Tensor-parallel Mega-NeRF MLP inference.

Megatron-style alternating column/row partitioning of the stacked
per-cluster MLP weights over the ``model`` mesh axis:

  * even layers: column-parallel — weight sharded on the output-feature
    axis, activations become feature-sharded, ReLU applied locally;
  * odd layers: row-parallel — weight sharded on the input-feature axis,
    partial sums combined with one ``psum`` over ICI.

The reference has no model parallelism (single-GPU TorchScript); this is
new capability for scaling wide refinement batches across a slice.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..models.meganerf import MLPParams
from .mesh import MODEL_AXIS


def tp_layer_kind(l: int, n_layers: int, skips: Tuple[int, ...] = ()) -> str:
    """'col', 'row', or 'rep' for layer l (last odd layer is replicated).

    Models with skip-concats fall back to fully replicated weights (pure
    data parallelism): a skip re-injects the replicated input into a
    feature-sharded activation, which would break row-parallel alignment.
    """
    if skips:
        return "rep"
    if l == n_layers - 1 and n_layers % 2 == 1:
        return "rep"
    return "col" if l % 2 == 0 else "row"


def tp_param_specs(params: MLPParams) -> MLPParams:
    """PartitionSpecs for each weight/bias leaf (stack axis unsharded)."""
    n = len(params.weights)
    wspecs, bspecs = [], []
    for l in range(n):
        kind = tp_layer_kind(l, n, params.skips)
        if kind == "col":
            wspecs.append(P(None, None, MODEL_AXIS))
            bspecs.append(P(None, MODEL_AXIS))
        elif kind == "row":
            wspecs.append(P(None, MODEL_AXIS, None))
            bspecs.append(P(None, None))
        else:
            wspecs.append(P(None, None, None))
            bspecs.append(P(None, None))
    return MLPParams(weights=wspecs, biases=bspecs, skips=params.skips)


def mlp_forward_tp(params: MLPParams, cluster: jax.Array,
                   x: jax.Array, axis: str = MODEL_AXIS) -> jax.Array:
    """Forward under shard_map with params sharded per tp_param_specs.

    ``x`` is replicated over the model axis; output is replicated.
    """
    n_layers = len(params.weights)
    h = x
    for l in range(n_layers):
        kind = tp_layer_kind(l, n_layers, params.skips)
        if l in params.skips:
            h = jnp.concatenate([h, x], axis=-1)
        w = params.weights[l][cluster]
        b = params.biases[l][cluster]
        if kind == "row":
            # h is feature-sharded from the previous col layer
            out = jnp.dot(h, w, preferred_element_type=jnp.float32)
            out = jax.lax.psum(out, axis)
            h = out + b
        else:
            h = jnp.dot(h, w, preferred_element_type=jnp.float32) + b
        if l < n_layers - 1:
            h = jax.nn.relu(h)
    # after the loop h is replicated: the last layer is 'row' (psum) or
    # 'rep'; for even layer counts ending on 'row' this holds by
    # construction, for odd counts the final layer is replicated.
    return h


def mlp_forward_all_tp(params: MLPParams, cluster_ids: jax.Array,
                       x: jax.Array, axis: str = MODEL_AXIS) -> jax.Array:
    """Dense per-sample-cluster tp forward (select over clusters)."""
    outs = jax.vmap(lambda c: mlp_forward_tp(params, c, x, axis))(
        jnp.arange(params.n_clusters))
    return jnp.take_along_axis(
        outs, cluster_ids[None, :, None].astype(jnp.int32), axis=0)[0]
