"""Generate the committed real-artifact fixtures.

Run from the repo root: ``python tests/fixtures/gen_fixtures.py``.
Deterministic (seeded); artifacts are committed so the golden tests pin
renderer behavior across rounds.

The npz files are written by :func:`write_svox_npz` — an INDEPENDENT
writer that replicates the svox on-disk schema the reference consumes
(``/root/reference/src/n3tree/n3tree.cpp:28-205``), not this package's
``N3Tree.save_npz``:

  * ``data_format`` as a numpy unicode scalar (UTF-32 on disk — the
    reference strips every 4th byte, n3tree.cpp:33-37),
  * scalar ``invradius`` (f32) instead of ``invradius3``
    (n3tree.cpp:49-52 handles both),
  * ``child`` as i32 ``[cap, N, N, N]``, ``parent_depth`` as i32
    ``[cap, 2]`` with the depth column populated (only column 0 is
    read, stride-2, n3tree.cpp:99-107),
  * svox extras the loader must tolerate: ``depth_limit``,
    ``geom_resize_fact``, ``extra_data``,
  * VQ variant: ``quant_colors`` f16 ``[nq, 65536, 3]`` codebook +
    ``quant_map`` u16 + ``sigma`` (n3tree.cpp:109-175).

The TorchScript container replicates the Mega-NeRF submodule family
(``cuda_renderer.cpp:518-543``): ``sub_module_<i>`` 8-layer MLPs with a
NeRF skip reinjection, container attrs grid_dim / min_position /
max_position / centroids / need_viewdir / need_appearance_embedding.
A real PlenOctree/container download is not possible in this hermetic
environment; these fixtures replicate the artifact FORMATS exactly while
the content is a deterministic synthetic scene.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

HERE = os.path.dirname(os.path.abspath(__file__))


# ----------------------------------------------------------------------
def write_svox_npz(path, data, child, parent_depth, invradius, offset,
                   data_format, vq=None):
    """Independent svox-schema writer (see module docstring)."""
    fields = dict(
        data_dim=np.int64(data.shape[-1] if vq is None
                          else vq["data_dim"]),
        data_format=np.str_(data_format),
        invradius=np.float32(invradius),
        offset=np.asarray(offset, np.float32),
        child=np.ascontiguousarray(child.astype(np.int32)),
        parent_depth=np.ascontiguousarray(parent_depth.astype(np.int32)),
        # svox extras (ignored by the reference and by this package)
        depth_limit=np.int32(10),
        geom_resize_fact=np.float64(1.0),
        extra_data=np.zeros((0,), np.float32),
    )
    if vq is None:
        fields["data"] = np.ascontiguousarray(data.astype(np.float16))
    else:
        fields.update(
            quant_colors=vq["quant_colors"],
            quant_map=vq["quant_map"],
            sigma=vq["sigma"],
        )
    np.savez(path, **fields)


def scene_sdf_color(vc):
    """A 'digger'-style composition: ground slab, body box, cab box,
    blade wedge, exhaust sphere.  Returns (occupied, rgb) for a voxel
    center in tree coords."""
    x, y, z = vc
    parts = []
    # ground slab
    parts.append((0.05 < y < 0.18 and 0.1 < x < 0.9 and 0.1 < z < 0.9,
                  (0.55, 0.45, 0.3)))
    # body
    parts.append((0.3 < x < 0.62 and 0.18 < y < 0.42 and 0.3 < z < 0.7,
                  (0.85, 0.7, 0.1)))
    # cab
    parts.append((0.36 < x < 0.56 and 0.42 < y < 0.6 and 0.38 < z < 0.62,
                  (0.2, 0.3, 0.8)))
    # blade (wedge: height shrinks with x)
    parts.append((0.62 < x < 0.8 and 0.18 < y < 0.18 + (0.8 - x)
                  and 0.34 < z < 0.66, (0.7, 0.15, 0.1)))
    # exhaust sphere
    r = np.linalg.norm(vc - np.array([0.34, 0.66, 0.5]))
    parts.append((r < 0.06, (0.15, 0.15, 0.18)))
    for occ, rgb in parts:
        if occ:
            return True, np.asarray(rgb, np.float64)
    return False, None


def terrain_height(x, z):
    """Deterministic multi-octave height field (Mill-19-style aerial
    terrain occupancy: a large rolling surface that forces 2^d-scale
    leaf populations along it)."""
    return (0.14
            + 0.06 * np.sin(6.1 * x + 1.0) * np.cos(5.3 * z)
            + 0.03 * np.sin(13.7 * x + 0.4) * np.sin(11.9 * z + 2.0)
            + 0.015 * np.sin(29.0 * x + 31.0 * z))


def big_scene_sdf_color(vc):
    """Terrain + the digger parts: realistic aerial-scene occupancy
    (one dominant surface + structures) for the large fixture."""
    x, y, z = vc
    h = terrain_height(x, z)
    if y < h:
        g = 0.35 + 0.3 * (h - y) / max(h, 1e-3)
        return True, np.asarray((0.35, g, 0.25), np.float64)
    return scene_sdf_color(vc)


def build_scene_tree(depth=6, basis_dim=4, sdf=None, max_chunks=200000,
                     sigma=120.0):
    from mega_nerf_viewer_tpu.n3tree.synthetic import build_host_tree

    sdf = sdf or scene_sdf_color
    data_dim = 3 * basis_dim + 1

    def depth_map(vc, d):
        if d >= depth:
            return False
        # subdivide near any part boundary: sample corners of the voxel
        size = 2.0 ** (-d)
        occs = []
        for dx in (-0.5, 0.5):
            for dy in (-0.5, 0.5):
                for dz in (-0.5, 0.5):
                    p = vc + np.array([dx, dy, dz]) * size
                    occs.append(sdf(np.clip(p, 0, 1))[0])
        return any(occs) and not all(occs)

    def data_fn(vc, size):
        out = np.zeros(data_dim, np.float64)
        occ, rgb = sdf(vc)
        if occ:
            # logit-space DC so sigmoid(SH_C0 * c0) lands on rgb, plus a
            # small deterministic directional component
            c0 = 0.28209479177387814
            out[0::basis_dim][:3] = np.log(rgb / (1 - rgb)) / c0
            if basis_dim > 1:
                out[1::basis_dim][:3] = 0.25 * np.sin(
                    vc.sum() * 37.0 + np.arange(3))
            out[-1] = sigma
        return out

    return build_host_tree(depth_map, data_fn, data_dim, basis_dim,
                           max_chunks=max_chunks)


def make_scene_npz():
    data, child, parent, scale, offset, fmt = build_scene_tree()
    cap = data.shape[0]
    N = child.shape[1] if child.ndim == 2 else 2
    child4 = child.reshape(cap, 2, 2, 2)
    # depth column: chunk depth via parent walk (svox stores it; only
    # column 0 is consumed)
    depth_col = np.zeros(cap, np.int32)
    pc = parent // 8
    for i in range(1, cap):
        depth_col[i] = depth_col[pc[i]] + 1
    parent_depth = np.stack([parent, depth_col], axis=1)
    path = os.path.join(HERE, "digger_sh4.npz")
    write_svox_npz(path, data, child4, parent_depth,
                   invradius=float(scale[0]), offset=offset,
                   data_format=fmt.to_string())
    print("wrote", path, f"({cap} chunks, {os.path.getsize(path)} bytes)")
    return path


def big_occ_v(p):
    """Vectorized occupancy of the big aerial scene ([..., 3] -> bool)."""
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    occ = y < terrain_height(x, z)
    occ |= (0.05 < y) & (y < 0.18) & (0.1 < x) & (x < 0.9) \
        & (0.1 < z) & (z < 0.9)
    occ |= (0.3 < x) & (x < 0.62) & (0.18 < y) & (y < 0.42) \
        & (0.3 < z) & (z < 0.7)
    occ |= (0.36 < x) & (x < 0.56) & (0.42 < y) & (y < 0.6) \
        & (0.38 < z) & (z < 0.62)
    occ |= (0.62 < x) & (x < 0.8) & (0.18 < y) \
        & (y < 0.18 + (0.8 - x)) & (0.34 < z) & (z < 0.66)
    occ |= ((p - np.array([0.34, 0.66, 0.5])) ** 2).sum(-1) < 0.06 ** 2
    return occ


def big_rgb_v(p):
    """Vectorized color field matching big_occ_v's part priorities."""
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    h = terrain_height(x, z)
    g = 0.35 + 0.3 * (h - y) / np.maximum(h, 1e-3)
    rgb = np.stack([np.full_like(x, 0.35), np.clip(g, 0.05, 0.95),
                    np.full_like(x, 0.25)], axis=-1)

    def put(mask, color):
        rgb[mask] = color
    put(~(y < h) & (0.05 < y) & (y < 0.18) & (0.1 < x) & (x < 0.9)
        & (0.1 < z) & (z < 0.9), (0.55, 0.45, 0.3))
    put((0.3 < x) & (x < 0.62) & (0.18 < y) & (y < 0.42)
        & (0.3 < z) & (z < 0.7) & ~(y < h), (0.85, 0.7, 0.1))
    put((0.36 < x) & (x < 0.56) & (0.42 < y) & (y < 0.6)
        & (0.38 < z) & (z < 0.62) & ~(y < h), (0.2, 0.3, 0.8))
    put((0.62 < x) & (x < 0.8) & (0.18 < y) & (y < 0.18 + (0.8 - x))
        & (0.34 < z) & (z < 0.66) & ~(y < h), (0.7, 0.15, 0.1))
    put((((p - np.array([0.34, 0.66, 0.5])) ** 2).sum(-1) < 0.06 ** 2)
        & ~(y < h), (0.15, 0.15, 0.18))
    return rgb


BIG_CACHE = os.path.join(HERE, ".cache", "aerial_sh4_d9.npz")


def make_big_scene_npz(path=BIG_CACHE, depth=9, basis_dim=4):
    """Mill-19-scale svox artifact (VERDICT r2 item 7): >= 100k chunks
    of realistic aerial occupancy (terrain surface + structures), built
    with the vectorized field builder and written through the
    INDEPENDENT svox writer.  Deterministic; cached on disk (too large
    to commit) — tests regenerate it when absent."""
    from mega_nerf_viewer_tpu.n3tree.synthetic import field_tree_arrays
    os.makedirs(os.path.dirname(path), exist_ok=True)
    data, child, parent, scale, offset, fmt, depths = field_tree_arrays(
        big_occ_v, big_rgb_v, depth=depth, basis_dim=basis_dim,
        sigma=120.0)
    cap = data.shape[0]
    parent_depth = np.stack([parent, depths], axis=1)
    write_svox_npz(path, data, child.reshape(cap, 2, 2, 2), parent_depth,
                   invradius=float(scale[0]), offset=offset,
                   data_format=fmt.to_string())
    print("wrote", path,
          f"({cap} chunks, {os.path.getsize(path)} bytes)")
    return path, cap


HUGE_CACHE = os.path.join(HERE, ".cache", "aerial_sh4_d11.npz")


def make_huge_scene_npz(path=HUGE_CACHE, depth=11, basis_dim=4,
                        max_chunks=3_200_000):
    """Multi-million-chunk depth-11 svox artifact (VERDICT r4 item 3):
    the same aerial occupancy field as :func:`make_big_scene_npz`
    subdivided two levels deeper, growing ~4x chunks per level
    (175k @ d9 -> ~2.8M @ d11).  Proves the scale regime the reference
    defaults to (20M-chunk capacity, opts.cpp:24; Mill-19 trees are
    depth 10-12): load, leaf-map level cap + ``deep_levels >= 2``
    descent, memory fit, and fps are recorded in PERFORMANCE.md.
    Deterministic; cached on disk (too large to commit)."""
    from mega_nerf_viewer_tpu.n3tree.synthetic import field_tree_arrays
    os.makedirs(os.path.dirname(path), exist_ok=True)
    data, child, parent, scale, offset, fmt, depths = field_tree_arrays(
        big_occ_v, big_rgb_v, depth=depth, basis_dim=basis_dim,
        sigma=120.0, max_chunks=max_chunks)
    cap = data.shape[0]
    parent_depth = np.stack([parent, depths], axis=1)
    write_svox_npz(path, data, child.reshape(cap, 2, 2, 2), parent_depth,
                   invradius=float(scale[0]), offset=offset,
                   data_format=fmt.to_string())
    print("wrote", path,
          f"({cap} chunks, {os.path.getsize(path)} bytes)")
    return path, cap


def make_vq_npz():
    """VQ variant: RGB (SH1) payload quantized through a codebook."""
    data, child, parent, scale, offset, fmt = build_scene_tree(
        depth=4, basis_dim=1)
    cap = data.shape[0]
    rng = np.random.RandomState(11)
    colors = data[:, :, :3].astype(np.float32).reshape(-1, 3)
    # tiny codebook padded to svox's fixed 65536 entries
    uniq = np.unique(np.round(colors, 3), axis=0)
    book = np.zeros((65536, 3), np.float16)
    book[:len(uniq)] = uniq[:65536].astype(np.float16)
    # nearest codebook entry per voxel
    d2 = ((colors[:, None, :] - uniq[None, :len(uniq), :]) ** 2).sum(-1)
    qmap = d2.argmin(1).astype(np.uint16).reshape(1, cap, 8)
    vq = dict(
        data_dim=4,
        quant_colors=book[None],                       # [1, 65536, 3] f16
        quant_map=qmap,                                # [1, cap, 8] u16
        sigma=data[:, :, 3].astype(np.float16),
    )
    child4 = child.reshape(cap, 2, 2, 2)
    depth_col = np.zeros(cap, np.int32)
    pc = parent // 8
    for i in range(1, cap):
        depth_col[i] = depth_col[pc[i]] + 1
    parent_depth = np.stack([parent, depth_col], axis=1)
    path = os.path.join(HERE, "digger_vq.npz")
    write_svox_npz(path, None, child4, parent_depth,
                   invradius=float(scale[0]), offset=offset,
                   data_format="SH1", vq=vq)
    print("wrote", path, f"({cap} chunks, {os.path.getsize(path)} bytes)")
    return path


def make_torchscript_container():
    import torch

    torch.manual_seed(3)
    hidden, n_layers, skip_at = 64, 8, 4
    in_dim = 7                                   # xyz + viewdir + app

    class Sub(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.skip_at = skip_at
            self.layers = torch.nn.ModuleList()
            d = in_dim
            for l in range(n_layers):
                di = d + (in_dim if l == skip_at else 0)
                do = hidden if l < n_layers - 1 else 5   # SH1 rgb+sigma+1
                self.layers.append(torch.nn.Linear(di, do))
                d = do

        def forward(self, x, sigma_only: bool = False):
            h = x
            for l, lin in enumerate(self.layers):
                if l == self.skip_at:
                    h = torch.cat([h, x], dim=-1)
                h = lin(h)
                if l < len(self.layers) - 1:
                    h = torch.relu(h)
            return h

    class Container(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.grid_dim = torch.tensor([2, 2], dtype=torch.int64)
            self.min_position = torch.tensor([-1.2, -1.2, -1.2])
            self.max_position = torch.tensor([1.2, 1.2, 1.2])
            self.centroids = torch.zeros(4, 3)
            self.need_viewdir = True
            self.need_appearance_embedding = True
            self.sub_module_0 = torch.jit.script(Sub())
            self.sub_module_1 = torch.jit.script(Sub())
            self.sub_module_2 = torch.jit.script(Sub())
            self.sub_module_3 = torch.jit.script(Sub())

    path = os.path.join(HERE, "meganerf_8x64.pt")
    torch.jit.save(torch.jit.script(Container()), path)
    print("wrote", path, f"({os.path.getsize(path)} bytes)")
    return path


def make_goldens():
    """Render the committed scene with the exact renderer (CPU) and pin
    the image."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from mega_nerf_viewer_tpu import Camera, RenderOptions
    from mega_nerf_viewer_tpu.n3tree import N3Tree
    from mega_nerf_viewer_tpu.ops.render import render_frame, to_rgba8
    from mega_nerf_viewer_tpu.utils.png import write_png

    tree = N3Tree.open(os.path.join(HERE, "digger_sh4.npz"))
    cam = Camera(160, 160, 170.0)
    cam.center = np.array([-1.1, 0.9, 1.6], np.float32)
    cam.v_back = cam.center / np.linalg.norm(cam.center)
    cam._update()
    opt = RenderOptions(background_brightness=0.9)
    img, _ = render_frame(tree, cam.width, cam.height, cam.fx, cam.fy,
                          cam.cx, cam.cy, jnp.asarray(cam.transform), opt)
    path = os.path.join(HERE, "digger_sh4_golden.png")
    write_png(path, np.asarray(to_rgba8(img)))
    alpha = float(np.asarray(img)[..., 3].max())
    print("wrote", path, "alpha_max=%.3f" % alpha)
    assert alpha > 0.99, "golden view misses the scene"


def aerial_camera():
    from mega_nerf_viewer_tpu import Camera
    cam = Camera(160, 160, 150.0)
    cam.center = np.array([-0.9, 1.1, 1.5], np.float32)
    cam.v_back = cam.center / np.linalg.norm(cam.center)
    cam._update()
    return cam


def make_big_golden():
    """Golden for the Mill-19-scale aerial fixture: pinned 160x160
    EXACT render (the npz itself is cached, not committed — the golden
    PNG is what crosses rounds)."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from mega_nerf_viewer_tpu import RenderOptions
    from mega_nerf_viewer_tpu.n3tree import N3Tree
    from mega_nerf_viewer_tpu.ops.render import render_frame, to_rgba8
    from mega_nerf_viewer_tpu.utils.png import write_png

    if not os.path.exists(BIG_CACHE):
        make_big_scene_npz()
    tree = N3Tree.open(BIG_CACHE)
    cam = aerial_camera()
    opt = RenderOptions(background_brightness=0.9)
    img, _ = render_frame(tree, cam.width, cam.height, cam.fx, cam.fy,
                          cam.cx, cam.cy, jnp.asarray(cam.transform), opt)
    path = os.path.join(HERE, "aerial_sh4_d9_golden.png")
    write_png(path, np.asarray(to_rgba8(img)))
    alpha = float(np.asarray(img)[..., 3].max())
    print("wrote", path, "alpha_max=%.3f" % alpha)
    assert alpha > 0.99, "golden view misses the scene"


if __name__ == "__main__":
    make_scene_npz()
    make_vq_npz()
    make_torchscript_container()
    make_goldens()
    make_big_golden()
