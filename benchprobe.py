import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

rng = np.random.RandomState(0)


def timeloop(name, body_fn, init, n):
    jfn = jax.jit(lambda a: jax.lax.fori_loop(0, n, body_fn, a))
    r = jfn(init)
    float(jnp.sum(r) if hasattr(r, 'ndim') else r)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        r = jfn(init)
        float(jnp.sum(r))
        ts.append(time.perf_counter() - t0)
    print(f"{name}: total {min(ts)*1000:.2f} ms, per-iter {min(ts)/n*1000:.4f} ms")


# empty-ish loop: tiny scalar op
timeloop("empty loop n=100", lambda i, a: a + 1e-9, jnp.zeros(()), 100)
timeloop("empty loop n=1000", lambda i, a: a + 1e-9, jnp.zeros(()), 1000)

# small vector op loop
v = jnp.asarray(rng.randn(128, 128).astype(np.float32))
timeloop("128x128 add n=100", lambda i, a: a * 1.0000001 + 1e-9, v, 100)

# matmul loop
xm = jnp.asarray(rng.randn(7040, 2560).astype(np.float32))
wm = jnp.asarray(rng.randn(2560, 128).astype(np.float32) * 0.01)
state = jnp.zeros((7040, 128))
timeloop("matmul loop n=50",
         lambda i, a: a * 1e-30 + jnp.dot(xm + a[0, 0] * 1e-30, wm),
         state, 50)

# 5 matmuls per iteration
def body5(i, a):
    y = a
    for _ in range(5):
        y = jnp.dot(xm + y[0, 0] * 1e-30, wm) * 1e-30 + a
    return y
timeloop("5x matmul loop n=20", body5, state, 20)
