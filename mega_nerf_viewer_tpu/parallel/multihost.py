"""Multi-HOST execution: jax.distributed SPMD over several processes.

The reference is a single-process, single-GPU app (SURVEY §2 statement;
the only device selection is ``torch::cuda::is_available()``,
cuda_renderer.cpp:521), and BASELINE config 5 (v5e-8) is one host.
Beyond a single host the TPU-idiomatic recipe (SURVEY §5's
"distributed communication backend" row) is:

1. ``initialize()`` jax.distributed on every process (TPU pods do this
   implicitly; CPU/GPU fleets pass coordinator/process ids);
2. ``broadcast()`` the octree + model weights from process 0 ONCE at
   startup — the only DCN data movement in the design (tree and
   weights are replicated per chip; frames never cross hosts);
3. run the SAME shard_map programs as single-host ``parallel.render``
   over the GLOBAL mesh: rays shard globally, the per-frame collectives
   (scalar overflow pmax, visit-mark pmax) ride ICI within a host and
   DCN across hosts.

Process-local inputs (camera-derived rays, the replicated tree) are
lifted to global ``jax.Array``s here; outputs come back fully
replicated so every host can consume its frame directly.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..options import RenderOptions
from ..n3tree.tree import N3Tree
from .mesh import RAY_AXIS


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None, **kw) -> None:
    """Join the jax.distributed job (no-op args on TPU pods, where the
    runtime autodetects; explicit on CPU/GPU fleets)."""
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id, **kw)


def global_mesh(axis: str = RAY_AXIS) -> Mesh:
    """1-D mesh over every device of every process."""
    return Mesh(np.asarray(jax.devices()), (axis,))


def broadcast(pytree):
    """One-time DCN broadcast of process-0's pytree (octree arrays,
    converted MLP weights) to all hosts — the multi-host analogue of
    the reference's host->GPU ``move_to_device`` (n3tree.cpp:207-246).
    Returns the pytree with every leaf holding process-0's values."""
    from jax.experimental import multihost_utils
    leaves, treedef = jax.tree_util.tree_flatten(pytree)
    leaves = multihost_utils.broadcast_one_to_all(tuple(leaves))
    return jax.tree_util.tree_unflatten(treedef, list(leaves))


def _replicated(x, mesh: Mesh):
    """Lift identical per-process data to a fully-replicated global
    array (every process must hold the same values — use
    :func:`broadcast` first for host-loaded data)."""
    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, P()), np.asarray(x))


def _ray_sharded(x_local: np.ndarray, mesh: Mesh, global_rows: int):
    """Lift each process's ray slice to a global array sharded over the
    mesh's ray axis (rows split evenly between processes in process
    order, matching ``process_ray_slice``)."""
    sharding = NamedSharding(mesh, P(RAY_AXIS))
    return jax.make_array_from_process_local_data(
        sharding, np.asarray(x_local), (global_rows,) + x_local.shape[1:])


def process_ray_slice(n_rows: int) -> slice:
    """The contiguous row range this process contributes (rows are
    dealt to processes in process-index order)."""
    n_proc = jax.process_count()
    per = n_rows // n_proc
    pid = jax.process_index()
    return slice(pid * per, (pid + 1) * per)


def render_frame_fast_sharded_multihost(
        tree: N3Tree, leaf_map, camera, opt: RenderOptions,
        mesh: Optional[Mesh] = None, max_dense: int = 32,
        chunk_size: int = 0):
    """Leaf-map fast frame with rays sharded over the GLOBAL mesh.

    Every process calls this with the same (broadcast) tree/leaf map
    and camera; raygen runs host-side for the process's ray slice
    only, the march runs shard-local exactly like the single-host
    ``parallel.render_rays_fast_sharded`` (same compiled body), and
    the output is returned fully REPLICATED so each host holds the
    complete [H, W, 4] frame (frames are small; replication costs one
    cross-host all-gather of the output tile).

    Returns (img [H, W, 4] jax.Array, overflow count i32).
    """
    from ..ops.rays import screen2worlddir_indices, rodrigues
    from ..ops.render import composite_background
    from ..ops.accel import render_rays_fast
    from jax import shard_map
    import functools

    if mesh is None:
        mesh = global_mesh()
    n = mesh.devices.size
    w, h = camera.width, camera.height
    R = w * h
    pad = (-R) % n
    Rp = R + pad
    sl = process_ray_slice(Rp)

    # raygen for the local slice only (pixel indices; pad rays repeat
    # the last pixel like the single-host path)
    pix = np.minimum(np.arange(Rp, dtype=np.int32)[sl], R - 1)
    transform = jnp.asarray(camera.transform)
    dirs_l, cen = screen2worlddir_indices(
        jnp.asarray(pix), w, camera.fx, camera.fy, camera.cx, camera.cy,
        transform)
    vdirs_l = rodrigues(jnp.asarray(opt.rot_dirs, jnp.float32), dirs_l)

    tree_g = jax.tree_util.tree_map(lambda x: _replicated(x, mesh), tree)
    lm_g = jax.tree_util.tree_map(lambda x: _replicated(x, mesh),
                                  leaf_map)
    dirs_g = _ray_sharded(np.asarray(dirs_l), mesh, Rp)
    vdirs_g = _ray_sharded(np.asarray(vdirs_l), mesh, Rp)
    cen_g = _replicated(np.asarray(cen), mesh)

    tree_spec = jax.tree_util.tree_map(lambda _: P(), tree)
    lm_spec = jax.tree_util.tree_map(lambda _: P(), leaf_map)

    @jax.jit
    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(tree_spec, lm_spec, P(RAY_AXIS), P(RAY_AXIS), P()),
        out_specs=(P(), P()),
        check_vma=False)
    def _run(tree, lm, dirs, vdirs, cen):
        res = render_rays_fast(tree, lm, dirs, vdirs, cen, opt,
                               max_dense=max_dense,
                               chunk_size=chunk_size)
        ov = jax.lax.psum(res.overflow, RAY_AXIS)
        # replicate the output tile to every device (small [R, 4]
        # frames; lets each HOST consume the full image directly)
        out = jax.lax.all_gather(res.out, RAY_AXIS, axis=0,
                                 tiled=True)
        return out, ov

    out, overflow = _run(tree_g, lm_g, dirs_g, vdirs_g, cen_g)
    img = composite_background(out[:R], opt)
    return img.reshape(h, w, 4), overflow


def guided_frame_sharded_multihost(
        tree: N3Tree, leaf_map, model, camera, opt: RenderOptions,
        mesh: Optional[Mesh] = None, budget: int = 1 << 14,
        chunk_size: int = 0):
    """Guided-sampling frame over the GLOBAL mesh (the multi-host
    variant of ``parallel.guided_frame_sharded``): every device runs
    the full collect -> compact -> grouped-MLP -> composite pipeline
    on its ray shard, with the octree, leaf map, and converted MLP
    weights replicated (``broadcast()`` them from process 0 first).
    The frame comes back REPLICATED on every host; ``overflow`` is the
    pmax-combined per-shard budget flag (re-call with a doubled
    ``budget`` when set, the single-host escalation protocol).

    Returns (img [H, W, 4] jax.Array, overflow i32 scalar)."""
    from ..ops.rays import screen2worlddir_indices, rodrigues
    from ..ops import guided as G
    from ..models.meganerf import query_grouped
    from jax import shard_map
    import functools

    if mesh is None:
        mesh = global_mesh()
    n = mesh.devices.size
    w, h = camera.width, camera.height
    R = w * h
    pad = (-R) % (n * max(chunk_size, 1))
    Rp = R + pad
    sl = process_ray_slice(Rp)

    pix = np.minimum(np.arange(Rp, dtype=np.int32)[sl], R - 1)
    transform = jnp.asarray(camera.transform)
    dirs_l, cen = screen2worlddir_indices(
        jnp.asarray(pix), w, camera.fx, camera.fy, camera.cx, camera.cy,
        transform)
    vdirs_l = rodrigues(jnp.asarray(opt.rot_dirs, jnp.float32), dirs_l)

    tree_g = jax.tree_util.tree_map(lambda x: _replicated(x, mesh), tree)
    lm_g = jax.tree_util.tree_map(lambda x: _replicated(x, mesh),
                                  leaf_map)
    params_g = jax.tree_util.tree_map(lambda x: _replicated(x, mesh),
                                      model.params)
    dirs_g = _ray_sharded(np.asarray(dirs_l), mesh, Rp)
    vdirs_g = _ray_sharded(np.asarray(vdirs_l), mesh, Rp)
    cen_g = _replicated(np.asarray(cen), mesh)
    gd = _replicated(np.asarray(model.grid_dim, np.int32), mesh)
    mp = _replicated(np.asarray(model.min_position, np.float32), mesh)
    pr = _replicated(np.asarray(model.range, np.float32), mesh)

    tree_spec = jax.tree_util.tree_map(lambda _: P(), tree)
    lm_spec = jax.tree_util.tree_map(lambda _: P(), leaf_map)
    params_spec = jax.tree_util.tree_map(lambda _: P(), model.params)
    basis_dim = tree.data_format.basis_dim
    fmt_sh = tree.data_format.format == "SH"

    @jax.jit
    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(tree_spec, lm_spec, params_spec,
                  P(RAY_AXIS), P(RAY_AXIS), P(), P(), P(), P()),
        out_specs=(P(), P()),
        check_vma=False)
    def _run(tree, lm, params, dirs, vdirs, cen, grid_dim,
             min_position, pos_range):
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
        out = jax.lax.all_gather(out, RAY_AXIS, axis=0, tiled=True)
        return out, overflow

    out, overflow = _run(tree_g, lm_g, params_g, dirs_g, vdirs_g,
                         cen_g, gd, mp, pr)
    return out[:R].reshape(h, w, 4), overflow
