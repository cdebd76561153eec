"""Multi-chip frame rendering via shard_map over the device mesh.

Rays (pixels) are sharded across the ``rays`` mesh axis; the octree and
options are replicated.  Visit marks are combined with a ``pmax``
collective so refinement bookkeeping sees the union of all chips' marks;
votes ride back with their rays (the host-side top-k aggregation already
operates on the full vote set).  This realizes BASELINE config 5: rays
sharded over chips, tiles gathered per frame — collectives ride ICI.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..options import RenderOptions
from ..n3tree.tree import N3Tree
from ..ops.render import render_rays, RenderResult, composite_background, \
    DEFAULT_MAX_LEVELS
from ..ops.rays import screen2worlddir, rodrigues
from .mesh import RAY_AXIS, default_mesh


def render_rays_sharded(tree: N3Tree,
                        dirs: jax.Array, vdirs: jax.Array,
                        cen_world: jax.Array,
                        opt: RenderOptions,
                        mesh: Mesh,
                        track_visit: bool = False,
                        max_levels: int = DEFAULT_MAX_LEVELS) -> RenderResult:
    """Shard the ray batch over ``mesh`` axis 'rays'.

    R must be divisible by the axis size (pad upstream).
    """
    tree_spec = jax.tree_util.tree_map(lambda _: P(), tree)
    other_axes = tuple(n for n in mesh.axis_names if n != RAY_AXIS)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(tree_spec, P(RAY_AXIS), P(RAY_AXIS), P()),
        out_specs=RenderResult(P(RAY_AXIS), P(RAY_AXIS), P(RAY_AXIS), P()),
        check_vma=False)
    def _run(tree, dirs, vdirs, cen):
        res = render_rays(tree, dirs, vdirs, cen, opt,
                          track_visit=track_visit, max_levels=max_levels)
        visited = jax.lax.pmax(res.visited, RAY_AXIS)
        if other_axes:
            visited = jax.lax.pmax(visited, other_axes)
        return RenderResult(res.out, res.split_vote, res.sample_vote,
                            visited)

    return _run(tree, dirs, vdirs, cen_world)


def render_frame_sharded(tree: N3Tree, camera, opt: RenderOptions,
                         mesh: Optional[Mesh] = None,
                         track_visit: bool = False):
    """Full sharded frame: ray gen (replicated, cheap) -> sharded march ->
    gather -> background composite.  Returns [H, W, 4] f32."""
    if mesh is None:
        mesh = default_mesh()
    n_shards = mesh.shape[RAY_AXIS]
    w, h = camera.width, camera.height
    dirs, cen = screen2worlddir(w, h, camera.fx, camera.fy,
                                camera.cx, camera.cy,
                                jnp.asarray(camera.transform))
    vdirs = rodrigues(jnp.asarray(opt.rot_dirs, jnp.float32), dirs)
    R = dirs.shape[0]
    pad = (-R) % n_shards
    if pad:
        dirs = jnp.concatenate(
            [dirs, jnp.tile(dirs[-1:], (pad, 1))], axis=0)
        vdirs = jnp.concatenate(
            [vdirs, jnp.tile(vdirs[-1:], (pad, 1))], axis=0)
    res = render_rays_sharded(tree, dirs, vdirs, cen, opt, mesh,
                              track_visit=track_visit)
    img = composite_background(res.out[:R], opt)
    return img.reshape(h, w, 4)
