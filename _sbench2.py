import sys, time, numpy as np, jax, jax.numpy as jnp
which = sys.argv[1]
R = 1<<15; S = 64
key = jax.random.PRNGKey(0)
ridx = jnp.arange(R, dtype=jnp.int32)
slot = jax.random.randint(key, (R,), 0, S+1, jnp.int32)
val = jax.random.normal(key, (R,), jnp.float32)

def bench(name, fn, *args, iters=3):
    f = jax.jit(fn)
    t0=time.perf_counter(); _ = np.asarray(f(*args)); tc = time.perf_counter()-t0
    t0=time.perf_counter()
    for _2 in range(iters): out = np.asarray(f(*args))
    print(f"{name:50s} {(time.perf_counter()-t0)/iters*1000:9.2f} ms (compile {tc:.0f}s)", flush=True)

if which == "scatter":
    def scat1_loop(slot, val):
        buf = jnp.zeros((R, S+1), jnp.float32)
        def body(k, c):
            buf, slot = c
            buf = buf.at[ridx, (slot+k) % (S+1)].set(val, mode='drop')
            return (buf, slot)
        return jax.lax.fori_loop(0, 30, body, (buf, slot))[0].sum()
    bench("30 scalar-scatters [32k]->[32k,65]", scat1_loop, slot, val)
elif which == "onehot":
    def onehot_loop(slot, val):
        buf = jnp.zeros((R, S+1), jnp.float32)
        srange = jnp.arange(S+1)
        def body(k, c):
            buf, slot = c
            sl = (slot+k) % (S+1)
            m = sl[:,None] == srange[None,:]
            buf = jnp.where(m, val[:,None], buf)
            return (buf, slot)
        return jax.lax.fori_loop(0, 30, body, (buf, slot))[0].sum()
    bench("30 one-hot-selects [32k,65]", onehot_loop, slot, val)
