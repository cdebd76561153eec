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

# count per-ray steps with a simple instrumented march (subsampled rays)
sub = dirs[::37]  # ~56k rays
R = sub.shape[0]
G = lm.grid
rows_flat = lm.rows

@jax.jit
def steps(dirs):
    R = dirs.shape[0]
    cen_t = tree.offset + tree.scale * cen
    d = dirs * tree.scale[None,:]
    ds = 1.0/jnp.linalg.norm(d, axis=-1); d = d*ds[:,None]
    invdir = 1.0/(d+1e-9)
    tmin, tmax = _dda_world_batch(cen_t, invdir, opt.render_bbox)
    t = tmin; T = jnp.ones((R,), jnp.float32)
    active = (tmax >= 0) & (tmin <= tmax)
    nsteps = jnp.zeros((R,), jnp.int32)
    ndense = jnp.zeros((R,), jnp.int32)
    def cond(c): return jnp.any(c[-1])
    def body(c):
        t, T, nsteps, ndense, active = c
        pos = jnp.clip(cen_t[None,:]+t[:,None]*d, 0.0, jnp.float32(1-1e-6))
        cell = jnp.floor(pos*G).astype(jnp.int32)
        lin = (cell[:,0]*G+cell[:,1])*G+cell[:,2]
        row = jnp.take(rows_flat, lin, axis=0, mode='clip')
        meta = row[:,1]
        depth = meta & 31
        sigma = accel._f16_bits_to_f32((meta>>16)&0xFFFF)
        cube = jnp.exp2(depth.astype(jnp.float32))
        u = pos*cube[:,None]; frac = u-jnp.floor(u)
        dt = _dda_unit_batch(frac, invdir)/cube + jnp.float32(opt.step_size)
        dense = active & (sigma > opt.sigma_thresh)
        att = jnp.exp(-dt*ds*sigma)
        T = jnp.where(dense, T*att, T)
        nsteps = nsteps + active
        ndense = ndense + dense
        stop = dense & (T < opt.stop_thresh)
        t = jnp.where(active, t+dt, t)
        active = active & ~stop & (t < tmax)
        return (t, T, nsteps, ndense, active)
    t, T, nsteps, ndense, _ = jax.lax.while_loop(cond, body, (t,T,nsteps,ndense,active))
    return nsteps, ndense

ns, nd = steps(sub)
ns = np.asarray(ns); nd = np.asarray(nd)
print("steps: mean %.1f p50 %d p90 %d p99 %d max %d" % (ns.mean(), *np.percentile(ns,[50,90,99]).astype(int), ns.max()))
print("dense: mean %.1f p99 %d max %d" % (nd.mean(), np.percentile(nd,99), nd.max()))
