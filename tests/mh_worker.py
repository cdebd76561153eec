"""Worker for test_parallel's multi-HOST test: one jax.distributed
process of a 2-process CPU job (4 virtual devices each, 8 global).

Process 1 deliberately constructs a WRONG (transparent) tree so the
test proves the DCN startup broadcast actually carried process-0's
arrays; both processes then render the same globally-sharded frame,
which comes back replicated.  Invoked as:
    python tests/mh_worker.py <port> <process_id> <outdir>
"""
import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax                                    # noqa: E402
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    port, pid, outdir = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    import numpy as np
    from mega_nerf_viewer_tpu.parallel import multihost
    multihost.initialize(f"127.0.0.1:{port}", num_processes=2,
                         process_id=pid)
    assert jax.process_count() == 2
    assert len(jax.devices()) == 8

    from mega_nerf_viewer_tpu import RenderOptions, Camera
    from mega_nerf_viewer_tpu.n3tree import sphere_tree
    from mega_nerf_viewer_tpu.ops import accel

    # process 0 "loads the file"; process 1 holds a same-shape but
    # WRONG (transparent) tree until the broadcast replaces it
    tree = sphere_tree(basis_dim=4, depth=3,
                       sigma_inside=0.0 if pid else 20.0)
    tree = multihost.broadcast(tree)
    lm = accel.build_leaf_map(tree)

    cam = Camera(32, 24, 20.0)
    cam.center = np.array([-1.5, 0.1, 1.4], np.float32)
    cam._update()
    opt = RenderOptions()

    img, overflow = multihost.render_frame_fast_sharded_multihost(
        tree, lm, cam, opt, max_dense=32)
    np.save(os.path.join(outdir, f"mh_{pid}.npy"), np.asarray(img))

    # second frame with PRE-replicated inputs: global leaves must pass
    # through untouched (no per-frame re-lift) and reuse the cached
    # program, producing the identical frame
    tree_g = multihost.replicate(tree)
    lm_g = multihost.replicate(lm)
    img2, _ = multihost.render_frame_fast_sharded_multihost(
        tree_g, lm_g, cam, opt, max_dense=32)
    assert np.array_equal(np.asarray(img2), np.asarray(img))

    # guided pipeline over the global mesh: model weights broadcast
    # from process 0 (process 1 starts with different random weights)
    from mega_nerf_viewer_tpu.models import MegaNeRFModel
    model = MegaNeRFModel.synthetic(
        data_dim=13, n_clusters=4, grid_dim=(2, 2),
        min_position=(-2, -2, -2), max_position=(2, 2, 2),
        seed=pid)                      # WRONG weights on process 1
    params = multihost.broadcast(model.params)
    model = MegaNeRFModel(params, model.grid_dim, model.min_position,
                          model.max_position, model.need_viewdir,
                          model.need_appearance_embedding)
    opt_g = RenderOptions(max_guided_samples=8,
                          use_guided_sampling=True)
    gimg, g_ov = multihost.guided_frame_sharded_multihost(
        tree, lm, model, cam, opt_g, budget=1 << 12)
    assert int(g_ov) == 0
    np.save(os.path.join(outdir, f"mhg_{pid}.npy"), np.asarray(gimg))

    if pid == 0:
        from mega_nerf_viewer_tpu.ops import guided as G
        cache = G.collect_and_query_fast(tree, lm, model, cam, opt_g,
                                         chunk_size=0)
        gref = G.composite_frame(tree, cam, opt_g, cache,
                                 use_pallas=False)
        np.save(os.path.join(outdir, "mhg_ref.npy"), np.asarray(gref))

    if pid == 0:
        # single-process reference on local devices only
        from mega_nerf_viewer_tpu.ops.render import composite_background
        from mega_nerf_viewer_tpu.ops.rays import screen2worlddir, \
            rodrigues
        import jax.numpy as jnp
        dirs, cen = screen2worlddir(
            cam.width, cam.height, cam.fx, cam.fy, cam.cx, cam.cy,
            jnp.asarray(cam.transform))
        vdirs = rodrigues(jnp.asarray(opt.rot_dirs, jnp.float32), dirs)
        res = accel.render_rays_fast(tree, lm, dirs, vdirs, cen, opt,
                                     max_dense=32)
        ref = composite_background(res.out, opt).reshape(
            cam.height, cam.width, 4)
        np.save(os.path.join(outdir, "mh_ref.npy"), np.asarray(ref))
    print(f"mh_worker {pid} ok", flush=True)


if __name__ == "__main__":
    main()
