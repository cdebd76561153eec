"""Fully-jitted multi-chip frame + refinement step.

The distributed analogue of one iteration of the reference's event loop
(render -> vote -> expand, cuda_renderer.cpp:68-163) as a single compiled
dispatch over a 2-D (rays, model) mesh:

  * rays data-parallel over the ``rays`` axis (tree replicated, visit
    marks combined with pmax),
  * refinement MLP fill tensor-parallel over the ``model`` axis
    (Megatron-style col/row sharding, one psum per row layer) and
    data-parallel over ``rays``,
  * the tree update itself is replicated (every chip applies the same
    expansion deterministically).

This is the function the driver's multi-chip dry run compiles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..options import RenderOptions
from ..n3tree.tree import N3Tree
from ..models.meganerf import MLPParams
from ..ops.render import render_rays, RenderResult
from ..ops import refine
from .mesh import RAY_AXIS, MODEL_AXIS
from .model import tp_param_specs, mlp_forward_all_tp


def make_frame_refine_step(mesh: Mesh, opt: RenderOptions):
    """Build the jitted step: (tree, params, model_meta, rays, key) ->
    (image_rgba [R,4], tree, visit_tracker, n_added).

    Raises ValueError up front when the refinement fill's sample batch
    (``split_batch_size * N3 * samples_per_corner``, N3 = 8) does not
    divide the ``rays`` mesh axis — the shard_map inside would
    otherwise fail at trace time with an opaque sharding error."""
    dp = mesh.shape[RAY_AXIS]
    fill_rows = opt.split_batch_size * 8 * opt.samples_per_corner
    if fill_rows % dp:
        raise ValueError(
            f"split_batch_size*8*samples_per_corner ({fill_rows}) must "
            f"divide the '{RAY_AXIS}' mesh axis ({dp}); adjust "
            f"split_batch_size or samples_per_corner")

    def step(tree: N3Tree, params: MLPParams, grid_dim, min_position,
             pos_range, dirs, vdirs, cen, visit_tracker, key):
        # ---- sharded render (dp over rays) ----
        tree_spec = jax.tree_util.tree_map(lambda _: P(), tree)

        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(tree_spec, P(RAY_AXIS), P(RAY_AXIS), P()),
            out_specs=RenderResult(P(RAY_AXIS), P(RAY_AXIS),
                                   P(RAY_AXIS), P()),
            check_vma=False)
        def _render(tree, dirs, vdirs, cen):
            res = render_rays(tree, dirs, vdirs, cen, opt,
                              track_visit=True)
            visited = jax.lax.pmax(res.visited, RAY_AXIS)
            visited = jax.lax.pmax(visited, MODEL_AXIS)
            return RenderResult(res.out, res.split_vote, res.sample_vote,
                                visited)

        res = _render(tree, dirs, vdirs, cen)
        visit_tracker = jnp.maximum(visit_tracker, res.visited)

        # ---- tp+dp MLP apply for the refinement fill ----
        pspecs = tp_param_specs(params)

        def mlp_apply(params_arg, cluster_ids, x):
            @functools.partial(
                shard_map, mesh=mesh,
                in_specs=(pspecs, P(RAY_AXIS), P(RAY_AXIS)),
                out_specs=P(RAY_AXIS),
                check_vma=False)
            def _apply(p, cid, xx):
                return mlp_forward_all_tp(p, cid, xx, MODEL_AXIS)
            return _apply(params_arg, cluster_ids, x)

        new_tree, visit_tracker2, n_added = refine.expand_voxels_jit(
            tree, params, grid_dim, min_position, pos_range, opt,
            res.split_vote, visit_tracker, key, mlp_apply=mlp_apply)
        return res.out, new_tree, visit_tracker2, n_added

    return jax.jit(step)
