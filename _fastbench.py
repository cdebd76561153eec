import time, numpy as np, jax, jax.numpy as jnp
from mega_nerf_viewer_tpu.camera import Camera
from mega_nerf_viewer_tpu.options import RenderOptions
from mega_nerf_viewer_tpu.n3tree import shell_tree
from mega_nerf_viewer_tpu.ops import accel
from mega_nerf_viewer_tpu.ops.rays import screen2worlddir, rodrigues

tree = shell_tree(depth=8, basis_dim=9, sigma_inside=400.0)
print("chunks", int(tree.capacity), flush=True)
t0=time.time()
lm = accel.build_leaf_map(tree)
print("leaf map level", lm.level, "deep", lm.deep_levels, "build", round(time.time()-t0,1), "s", flush=True)

opt = RenderOptions()
cam = Camera(1920, 1080, 1111.0)
cam.center = np.array([-1.4, 0.1, 1.3], np.float32); cam._update()

for chunk_size, block in [(1<<15, 64), (1<<16, 64)]:
    t0=time.time()
    img, ov = accel.render_frame_fast(tree, lm, cam, opt, max_dense=16,
                                      chunk_size=chunk_size, block=block)
    img = np.asarray(img)
    tc = time.time()-t0
    n=3
    t0=time.perf_counter()
    for _ in range(n):
        img, ov = accel.render_frame_fast(tree, lm, cam, opt, max_dense=16,
                                          chunk_size=chunk_size, block=block)
    img = np.asarray(img)
    dt=(time.perf_counter()-t0)/n
    print(f"chunk={chunk_size} block={block}: {dt*1000:.0f} ms/frame ({1/dt:.2f} fps) overflow={bool(ov)} compile={tc:.0f}s alpha={img[...,3].max():.2f}", flush=True)
