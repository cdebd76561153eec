"""Multi-chip guided sampling: collection, MLP query and compositing
sharded over the ray mesh axis.

Each chip owns a contiguous ray shard and runs the ENTIRE guided
pipeline locally — leaf-map t collection, device compaction, sample
reconstruction, grouped-matmul MLP query (weights replicated), and the
segmented-scan composite (ops/guided.py) — so the only collective is a
``pmax`` on the per-shard overflow flag.  This mirrors BASELINE config
5's layout (tree + weights replicated, rays sharded over ICI) applied
to the reference's guided-sampling mode (cuda_renderer.cpp:107-139).

The compact budget is per-shard and static; a shard whose valid-sample
count exceeds it raises the overflow flag so the caller escalates
(double and re-run), the same protocol as the fast path's shading
segments.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..options import RenderOptions
from ..n3tree.tree import N3Tree
from ..ops import guided as G
from ..models.meganerf import MLPParams, query_grouped
from .mesh import RAY_AXIS


@functools.lru_cache(maxsize=32)
def _guided_sharded_program(mesh: Mesh, opt: RenderOptions, budget: int,
                            chunk_size: int, basis_dim: int,
                            fmt_sh: bool, tree_treedef, lm_treedef,
                            params_treedef):
    tree_spec = jax.tree_util.tree_unflatten(
        tree_treedef, [P()] * tree_treedef.num_leaves)
    lm_spec = jax.tree_util.tree_unflatten(
        lm_treedef, [P()] * lm_treedef.num_leaves)
    params_spec = jax.tree_util.tree_unflatten(
        params_treedef, [P()] * params_treedef.num_leaves)
    other = tuple(n for n in mesh.axis_names if n != RAY_AXIS)

    @jax.jit
    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(tree_spec, lm_spec, params_spec,
                  P(RAY_AXIS), P(RAY_AXIS), P(), P(), P(), P()),
        out_specs=(P(RAY_AXIS), P()),
        check_vma=False)
    def _run(tree, lm, params, dirs, vdirs, cen, grid_dim, min_position,
             pos_range):
        t_buf, ns = G.collect_t_fast(tree, lm, dirs, cen, opt,
                                     chunk_size=chunk_size)
        x, cids, z_c, ray_of_p, offs = G._compact_reconstruct(
            tree, dirs, vdirs, cen, t_buf, ns, grid_dim, min_position,
            pos_range, opt, budget)
        res_c = query_grouped(params, cids, x)
        out = G.composite_results_compact(
            res_c, z_c, ray_of_p, offs, ns, vdirs, opt, basis_dim,
            fmt_sh)
        overflow = (jnp.sum(ns) > budget).astype(jnp.int32)
        overflow = jax.lax.pmax(overflow, RAY_AXIS)
        if other:
            overflow = jax.lax.pmax(overflow, other)
        return out, overflow

    return _run


def guided_frame_sharded(tree: N3Tree, leaf_map, model, camera,
                         opt: RenderOptions, mesh: Mesh,
                         budget: int = 1 << 18,
                         chunk_size: int = 0):
    """One sharded guided frame: rays split over the 'rays' axis, the
    full collect -> compact -> MLP -> composite pipeline local to each
    chip.  Returns ([H, W, 4] f32, overflow bool) — on overflow, call
    again with a doubled per-shard ``budget``.
    """
    from ..ops.rays import screen2worlddir, rodrigues
    import numpy as np
    w, h = camera.width, camera.height
    n_shards = mesh.shape[RAY_AXIS]
    dirs, cen = screen2worlddir(w, h, camera.fx, camera.fy,
                                camera.cx, camera.cy,
                                jnp.asarray(camera.transform))
    vdirs = rodrigues(jnp.asarray(opt.rot_dirs, jnp.float32), dirs)
    R = dirs.shape[0]
    quantum = n_shards * max(chunk_size, 1)
    pad = (-R) % quantum
    if pad:
        dirs = jnp.concatenate([dirs, jnp.tile(dirs[-1:], (pad, 1))])
        vdirs = jnp.concatenate([vdirs, jnp.tile(vdirs[-1:], (pad, 1))])
    run = _guided_sharded_program(
        mesh, opt, budget, chunk_size,
        tree.data_format.basis_dim, tree.data_format.format == "SH",
        jax.tree_util.tree_structure(tree),
        jax.tree_util.tree_structure(leaf_map),
        jax.tree_util.tree_structure(model.params))
    out, overflow = run(
        tree, leaf_map, model.params, dirs, vdirs, cen,
        jnp.asarray(model.grid_dim, jnp.int32),
        jnp.asarray(model.min_position, jnp.float32),
        jnp.asarray(model.range, jnp.float32))
    return out[:R].reshape(h, w, 4), bool(overflow)
