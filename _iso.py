import time, numpy as np, jax, jax.numpy as jnp
from mega_nerf_viewer_tpu.camera import Camera
from mega_nerf_viewer_tpu.options import RenderOptions
from mega_nerf_viewer_tpu.n3tree import shell_tree
from mega_nerf_viewer_tpu.ops import accel
from mega_nerf_viewer_tpu.ops.rays import screen2worlddir, rodrigues
from mega_nerf_viewer_tpu.ops.render import _dda_world_batch, _dda_unit_batch

tree = shell_tree(depth=8, basis_dim=9, sigma_inside=400.0)
lm = accel.build_leaf_map(tree)
opt = RenderOptions()
cam = Camera(1920, 1080, 1111.0)
cam.center = np.array([-1.4, 0.1, 1.3], np.float32); cam._update()
dirs, cen = screen2worlddir(cam.width, cam.height, cam.fx, cam.fy, cam.cx, cam.cy, jnp.asarray(cam.transform))
vdirs = rodrigues(jnp.asarray(opt.rot_dirs, jnp.float32), dirs)
perm, inv = accel.block_permutation(1920, 1080, 64)
dirs = jnp.take(dirs, perm, axis=0)
R0 = dirs.shape[0]
CH = 1<<15
pad = (-R0) % CH
dirs = jnp.concatenate([dirs, jnp.tile(dirs[-1:], (pad,1))])
G = lm.grid
rows_flat = lm.rows

def march(dirs, use_gather, use_buffers, max_dense=64):
    R = dirs.shape[0]
    cen_t = tree.offset + tree.scale * cen
    d = dirs * tree.scale[None,:]
    ds = 1.0/jnp.linalg.norm(d, axis=-1); d = d*ds[:,None]
    invdir = 1.0/(d+1e-9)
    tmin, tmax = _dda_world_batch(cen_t, invdir, opt.render_bbox)
    t = tmin; T = jnp.ones((R,), jnp.float32)
    active = (tmax >= 0) & (tmin <= tmax)
    nd = jnp.zeros((R,), jnp.int32)
    w_buf = jnp.zeros((R, max_dense), jnp.float32)
    srange = jnp.arange(max_dense)
    def cond(c): return jnp.any(c[-1])
    def body(c):
        t, T, nd, w_buf, active = c
        pos = jnp.clip(cen_t[None,:]+t[:,None]*d, 0.0, jnp.float32(1-1e-6))
        cell = jnp.floor(pos*G).astype(jnp.int32)
        lin = (cell[:,0]*G+cell[:,1])*G+cell[:,2]
        if use_gather:
            row = jnp.take(rows_flat, lin, axis=0, mode='clip')
            meta = row[:,1]
        else:
            meta = lin | 8  # fake
        depth = meta & 31
        sigma = accel._f16_bits_to_f32((meta>>16)&0xFFFF)
        cube = jnp.exp2(depth.astype(jnp.float32))
        u = pos*cube[:,None]; frac = u-jnp.floor(u)
        dt = _dda_unit_batch(frac, invdir)/cube + jnp.float32(opt.step_size)
        dense = active & (sigma > opt.sigma_thresh)
        att = jnp.exp(-dt*ds*sigma)
        w = T*(1-att)
        if use_buffers:
            m = dense[:,None] & (nd[:,None]==srange[None,:])
            w_buf = jnp.where(m, w[:,None], w_buf)
            nd = jnp.where(dense, nd+1, nd)
        T = jnp.where(dense, T*att, T)
        stop = dense & (T < opt.stop_thresh)
        t = jnp.where(active, t+dt, t)
        active = active & ~stop & (t < tmax)
        return (t, T, nd, w_buf, active)
    c = jax.lax.while_loop(cond, body, (t,T,nd,w_buf,active))
    return c[1].sum() + c[3].sum()

def bench(name, fn, iters=3):
    f = jax.jit(fn)
    t0=time.perf_counter(); _=np.asarray(f(dirs)); tc=time.perf_counter()-t0
    t0=time.perf_counter()
    for _2 in range(iters): out=np.asarray(f(dirs))
    print(f"{name:42s} {(time.perf_counter()-t0)/iters*1000:8.0f} ms (compile {tc:.0f}s)", flush=True)

def chunked(fn):
    def run(dirs):
        dd = dirs.reshape(-1, CH, 3)
        return jax.lax.map(fn, dd).sum()
    return run

bench("full: gather+buffers", chunked(lambda d: march(d, True, True)))
bench("no buffers", chunked(lambda d: march(d, True, False)))
bench("no gather (fake)", chunked(lambda d: march(d, False, True)))
bench("neither", chunked(lambda d: march(d, False, False)))
