import time, numpy as np, jax, jax.numpy as jnp
from mega_nerf_viewer_tpu.camera import Camera
from mega_nerf_viewer_tpu.options import RenderOptions
from mega_nerf_viewer_tpu.n3tree import shell_tree
from mega_nerf_viewer_tpu.ops import accel

tree = shell_tree(depth=8, basis_dim=9, sigma_inside=400.0)
lm = accel.build_leaf_map(tree)
cam = Camera(1920, 1080, 1111.0)
cam.center = np.array([-1.4, 0.1, 1.3], np.float32); cam._update()

def run(opt, md, name):
    t0=time.time()
    img, ov = accel.render_frame_fast(tree, lm, cam, opt, max_dense=md, chunk_size=1<<16, block=64)
    img=np.asarray(img); tc=time.time()-t0
    t0=time.perf_counter()
    for _ in range(3):
        img, ov = accel.render_frame_fast(tree, lm, cam, opt, max_dense=md, chunk_size=1<<16, block=64)
    img=np.asarray(img)
    print(f"{name:30s} {(time.perf_counter()-t0)/3*1000:7.0f} ms (compile {tc:.0f}s) ov={bool(ov)}", flush=True)

run(RenderOptions(render_depth=True), 16, "depth mode (no shading gather)")
run(RenderOptions(), 8, "color max_dense=8")
run(RenderOptions(), 16, "color max_dense=16")
