"""Multi-host rendering example: N processes, one global device mesh.

Run one copy per host (here: two local processes for demonstration):

    python examples/multihost_render.py 0 &
    python examples/multihost_render.py 1

Process 0 loads (here: builds) the octree; ``broadcast()`` ships it to
every host over the coordinator link once at startup; every process
then renders the same frame with rays sharded over the GLOBAL mesh and
receives the full replicated image.  On a TPU pod, drop the
coordinator arguments — ``jax.distributed`` autodetects.
"""
import os
import sys

# demo-only: 4 virtual CPU devices per process (a real pod uses its
# local TPU chips); set BEFORE jax initializes
os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=4")

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    pid = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    # demo-only CPU force (some TPU plugins ignore JAX_PLATFORMS; a
    # real pod run deletes these two lines and the XLA_FLAGS above)
    import jax
    jax.config.update("jax_platforms", "cpu")
    from mega_nerf_viewer_tpu.parallel import multihost
    multihost.initialize("127.0.0.1:29765", num_processes=2,
                         process_id=pid)
    import jax
    print(f"[{pid}] {jax.process_count()} processes, "
          f"{len(jax.devices())} global devices")

    from mega_nerf_viewer_tpu import RenderOptions, Camera
    from mega_nerf_viewer_tpu.n3tree import sphere_tree
    from mega_nerf_viewer_tpu.ops import accel

    # process 0 owns the data; everyone else receives it over DCN
    tree = sphere_tree(basis_dim=4, depth=4) if pid == 0 else \
        sphere_tree(basis_dim=4, depth=4, sigma_inside=0.0)
    tree = multihost.broadcast(tree)
    lm = accel.build_leaf_map(tree)
    # lift ONCE onto the global mesh; reuse for every frame
    tree_g = multihost.replicate(tree)
    lm_g = multihost.replicate(lm)

    cam = Camera(320, 240, 300.0)
    cam.center = np.array([-1.5, 0.1, 1.4], np.float32)
    cam._update()
    img, overflow = multihost.render_frame_fast_sharded_multihost(
        tree_g, lm_g, cam, RenderOptions(), max_dense=32)
    img = np.asarray(img)
    print(f"[{pid}] frame {img.shape}, alpha max "
          f"{img[..., 3].max():.3f}, overflow {int(overflow)}")
    if pid == 0:
        from mega_nerf_viewer_tpu.utils import write_png
        from mega_nerf_viewer_tpu.ops.render import to_rgba8
        import jax.numpy as jnp
        out = "/tmp/multihost_frame.png"
        write_png(out, np.asarray(to_rgba8(jnp.asarray(img))))
        print(f"[0] wrote {out}")


if __name__ == "__main__":
    main()
