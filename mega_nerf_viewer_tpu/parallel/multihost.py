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
   weights are replicated per chip; frames never cross hosts) — then
   ``replicate()`` them onto the global mesh ONCE (multi-GB lifts must
   not repeat per frame);
3. run the SAME shard_map programs as single-host ``parallel.render``
   over the GLOBAL mesh: rays shard globally, the per-frame collectives
   (scalar overflow pmax, output all-gather) ride ICI within a host
   and DCN across hosts.

The frame programs are lru_cached like their single-host siblings
(``parallel.render``/``parallel.guided``): per-frame calls reuse one
compiled executable, and already-replicated global arrays pass through
untouched.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax import shard_map
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
    array; global arrays already replicated on this mesh pass through
    (so per-frame calls never re-copy a multi-GB tree)."""
    sharding = NamedSharding(mesh, P())
    if isinstance(x, jax.Array) and x.sharding.is_equivalent_to(
            sharding, x.ndim):
        return x
    return jax.make_array_from_process_local_data(
        sharding, np.asarray(x))


def replicate(pytree, mesh: Optional[Mesh] = None):
    """Lift a (broadcast) pytree onto the global mesh, fully
    replicated.  Do this ONCE per tree/model and reuse the result for
    every frame — the frame functions pass through already-global
    leaves untouched."""
    if mesh is None:
        mesh = global_mesh()
    return jax.tree_util.tree_map(lambda x: _replicated(x, mesh),
                                  pytree)


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


def _local_raygen(camera, opt: RenderOptions, mesh: Mesh,
                  chunk_size: int):
    """Raygen for this process's ray slice; returns global (dirs,
    vdirs, cen) plus (R, Rp)."""
    from ..ops.rays import screen2worlddir_indices, rodrigues
    n = mesh.devices.size
    w, h = camera.width, camera.height
    R = w * h
    pad = (-R) % (n * max(chunk_size, 1))
    Rp = R + pad
    sl = process_ray_slice(Rp)
    # pad rays repeat the last pixel like the single-host path
    pix = np.minimum(np.arange(Rp, dtype=np.int32)[sl], R - 1)
    transform = jnp.asarray(camera.transform)
    dirs_l, cen = screen2worlddir_indices(
        jnp.asarray(pix), w, camera.fx, camera.fy, camera.cx, camera.cy,
        transform)
    vdirs_l = rodrigues(jnp.asarray(opt.rot_dirs, jnp.float32), dirs_l)
    dirs_g = _ray_sharded(np.asarray(dirs_l), mesh, Rp)
    vdirs_g = _ray_sharded(np.asarray(vdirs_l), mesh, Rp)
    cen_g = _replicated(np.asarray(cen), mesh)
    return dirs_g, vdirs_g, cen_g, R, Rp


@functools.lru_cache(maxsize=32)
def _fast_multihost_program(mesh: Mesh, opt: RenderOptions,
                            max_dense: int, chunk_size: int,
                            tree_treedef, lm_treedef):
    from ..ops.accel import render_rays_fast
    tree_spec = jax.tree_util.tree_unflatten(
        tree_treedef, [P()] * tree_treedef.num_leaves)
    lm_spec = jax.tree_util.tree_unflatten(
        lm_treedef, [P()] * lm_treedef.num_leaves)

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
        out = jax.lax.all_gather(res.out, RAY_AXIS, axis=0, tiled=True)
        return out, ov

    return _run


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
    complete [H, W, 4] frame.  Pass ``replicate()``d tree/leaf-map for
    zero per-frame lift cost; the compiled program is lru-cached.

    Returns (img [H, W, 4] jax.Array, overflow count i32).
    """
    from ..ops.render import composite_background
    if mesh is None:
        mesh = global_mesh()
    tree_g = replicate(tree, mesh)
    lm_g = replicate(leaf_map, mesh)
    dirs_g, vdirs_g, cen_g, R, _ = _local_raygen(camera, opt, mesh,
                                                 chunk_size)
    run = _fast_multihost_program(
        mesh, opt, max_dense, chunk_size,
        jax.tree_util.tree_structure(tree),
        jax.tree_util.tree_structure(leaf_map))
    out, overflow = run(tree_g, lm_g, dirs_g, vdirs_g, cen_g)
    img = composite_background(out[:R], opt)
    return img.reshape(camera.height, camera.width, 4), overflow


@functools.lru_cache(maxsize=32)
def _guided_multihost_program(mesh: Mesh, opt: RenderOptions,
                              budget: int, chunk_size: int,
                              basis_dim: int, fmt_sh: bool,
                              tree_treedef, lm_treedef, params_treedef):
    from ..ops import guided as G
    from ..models.meganerf import query_grouped
    tree_spec = jax.tree_util.tree_unflatten(
        tree_treedef, [P()] * tree_treedef.num_leaves)
    lm_spec = jax.tree_util.tree_unflatten(
        lm_treedef, [P()] * lm_treedef.num_leaves)
    params_spec = jax.tree_util.tree_unflatten(
        params_treedef, [P()] * params_treedef.num_leaves)

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

    return _run


def guided_frame_sharded_multihost(
        tree: N3Tree, leaf_map, model, camera, opt: RenderOptions,
        mesh: Optional[Mesh] = None, budget: int = 1 << 14,
        chunk_size: int = 0):
    """Guided-sampling frame over the GLOBAL mesh (the multi-host
    variant of ``parallel.guided_frame_sharded``): every device runs
    the full collect -> compact -> grouped-MLP -> composite pipeline
    on its ray shard, with the octree, leaf map, and converted MLP
    weights replicated (``broadcast()`` + ``replicate()`` them from
    process 0 first; already-global leaves pass through untouched).
    The frame comes back REPLICATED on every host; ``overflow`` is the
    pmax-combined per-shard budget flag (re-call with a doubled
    ``budget`` when set, the single-host escalation protocol).

    Returns (img [H, W, 4] jax.Array, overflow i32 scalar)."""
    if mesh is None:
        mesh = global_mesh()
    tree_g = replicate(tree, mesh)
    lm_g = replicate(leaf_map, mesh)
    params_g = replicate(model.params, mesh)
    dirs_g, vdirs_g, cen_g, R, _ = _local_raygen(camera, opt, mesh,
                                                 chunk_size)
    gd = _replicated(np.asarray(model.grid_dim, np.int32), mesh)
    mp = _replicated(np.asarray(model.min_position, np.float32), mesh)
    pr = _replicated(np.asarray(model.range, np.float32), mesh)
    run = _guided_multihost_program(
        mesh, opt, budget, chunk_size,
        tree.data_format.basis_dim, tree.data_format.format == "SH",
        jax.tree_util.tree_structure(tree),
        jax.tree_util.tree_structure(leaf_map),
        jax.tree_util.tree_structure(model.params))
    out, overflow = run(tree_g, lm_g, params_g, dirs_g, vdirs_g,
                        cen_g, gd, mp, pr)
    return out[:R].reshape(camera.height, camera.width, 4), overflow
