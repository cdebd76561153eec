import time, numpy as np, jax, jax.numpy as jnp
R = 1<<15  # 32k
S = 64
key = jax.random.PRNGKey(0)
ridx = jnp.arange(R, dtype=jnp.int32)
slot = jax.random.randint(key, (R,), 0, S+1, jnp.int32)
rec = jax.random.randint(key, (R,2), 0, 100, jnp.int32)
val = jax.random.normal(key, (R,), jnp.float32)

def bench(name, fn, *args, iters=3):
    f = jax.jit(fn)
    _ = np.asarray(f(*args))
    t0=time.perf_counter()
    for _2 in range(iters): out = np.asarray(f(*args))
    print(f"{name:50s} {(time.perf_counter()-t0)/iters*1000:9.2f} ms", flush=True)

def scat_loop(slot, rec):
    buf = jnp.zeros((R, S+1, 2), jnp.int32)
    def body(k, c):
        buf, slot = c
        buf = buf.at[ridx, (slot+k) % (S+1)].set(rec, mode='drop')
        return (buf, slot)
    return jax.lax.fori_loop(0, 30, body, (buf, slot))[0].sum()
bench("30 row-scatters [32k]->[32k,65,2]", scat_loop, slot, rec)

def scat1_loop(slot, val):
    buf = jnp.zeros((R, S+1), jnp.float32)
    def body(k, c):
        buf, slot = c
        buf = buf.at[ridx, (slot+k) % (S+1)].set(val, mode='drop')
        return (buf, slot)
    return jax.lax.fori_loop(0, 30, body, (buf, slot))[0].sum()
bench("30 scalar-scatters [32k]->[32k,65]", scat1_loop, slot, val)

# one-hot alternative: buf = where(slot==s for each s)? via equality broadcast
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

# gather for comparison
tab = jnp.zeros((1<<19,), jnp.int32)
idx = jax.random.randint(key, (R,), 0, 1<<19, jnp.int32)
def g_loop(tab, idx):
    def body(k, acc):
        return acc + jnp.take(tab, (idx+k) % (1<<19), mode='clip')
    return jax.lax.fori_loop(0, 30, body, jnp.zeros((R,), jnp.int32)).sum()
bench("30 gathers [32k] from [512k]", g_loop, tab, idx)
