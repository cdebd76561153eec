"""Quickstart: every major capability in ~60 lines.

Run from the repo root:  python examples/quickstart.py [outdir]
Produces PNGs demonstrating static rendering, depth mode, the octree
grid overlay, dynamic MLP-driven refinement, and guided ray sampling.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

from mega_nerf_viewer_tpu import Viewer, RenderOptions, Camera
from mega_nerf_viewer_tpu.n3tree import sphere_tree
from mega_nerf_viewer_tpu.models import MegaNeRFModel
from mega_nerf_viewer_tpu.ops.render import to_rgba8
from mega_nerf_viewer_tpu.utils import write_png


def save(img, path):
    import jax.numpy as jnp
    write_png(path, np.asarray(to_rgba8(jnp.asarray(img))))
    print(f"wrote {path}")


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/mnv_quickstart"
    os.makedirs(outdir, exist_ok=True)

    # a synthetic PlenOctree (or use N3Tree.open("tree.npz"))
    tree = sphere_tree(basis_dim=9, depth=5, max_capacity=20000)
    cam = Camera(400, 400, 420.0)
    cam.center = np.array([-1.6, 0.2, 1.5], np.float32)

    viewer = Viewer(tree, camera=cam,
                    options=RenderOptions(background_brightness=1.0),
                    max_tree_capacity=20000)

    # 1. static render (leaf-map fast path)
    save(viewer.render(), f"{outdir}/static.png")

    # 2. expected-depth visualization
    viewer.options = viewer.options.replace(render_depth=True)
    save(viewer.render(), f"{outdir}/depth.png")
    viewer.options = viewer.options.replace(render_depth=False)

    # 3. octree wireframe overlay (GUI 'show grid')
    viewer.options = viewer.options.replace(show_grid=True,
                                            grid_max_depth=3)
    save(viewer.render(), f"{outdir}/grid.png")
    viewer.options = viewer.options.replace(show_grid=False)

    # 4. dynamic refinement (GUI key M) — needs a Mega-NeRF model;
    #    a synthetic stand-in here, MegaNeRFModel.from_torchscript(path)
    #    for real checkpoints
    viewer.model = MegaNeRFModel.synthetic(
        data_dim=28, n_clusters=4, grid_dim=(2, 2),
        min_position=(-2, -2, -2), max_position=(2, 2, 2))
    viewer.key_event("m")
    cap0 = int(viewer.tree.capacity)
    img = viewer.render()
    print(f"refinement: {cap0} -> {int(viewer.tree.capacity)} chunks")
    save(img, f"{outdir}/refined.png")
    viewer.key_event("m")

    # 5. guided ray sampling (GUI key R): octree places samples, the
    #    MLP shades them
    viewer.key_event("r")
    save(viewer.render(), f"{outdir}/guided.png")
    viewer.key_event("r")

    # 6. overlay meshes: the reference GL mesh layer, headless — a lit
    #    triangle composited into the volume render by depth
    from mega_nerf_viewer_tpu.utils.mesh import Mesh
    tri = Mesh(face_size=3)
    c, back = viewer.camera.center, viewer.camera.v_back
    p = c - back * 0.6
    r, u = viewer.camera.v_right * 0.3, viewer.camera.v_up * 0.3
    tri.vert = np.stack([
        np.concatenate([p - r - u, [1, 0.2, 0.2], back]),
        np.concatenate([p + r - u, [1, 0.2, 0.2], back]),
        np.concatenate([p + u, [1, 0.2, 0.2], back])]).astype(np.float32)
    viewer.meshes.append(tri)
    save(viewer.render(), f"{outdir}/mesh_overlay.png")
    viewer.meshes.clear()

    # 7. orbit the camera and save a session checkpoint
    viewer.mouse_button("right", True, 0, 0)
    viewer.cursor(60.0, 10.0)
    viewer.mouse_button("right", False, 60.0, 10.0)
    save(viewer.render(), f"{outdir}/orbited.png")
    viewer.save_state(f"{outdir}/session.json",
                      tree_path=f"{outdir}/session_tree.npz")
    print(f"session checkpoint -> {outdir}/session.json")


if __name__ == "__main__":
    main()
