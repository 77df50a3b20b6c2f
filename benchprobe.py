import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import ptlflow_tpu
from ptlflow_tpu import nn
from ptlflow_tpu.ops.correlation import build_corr_pyramid, corr_pyramid_lookup, coords_grid

rng = np.random.RandomState(0)
B, h, w = 1, 55, 128
N = 50


def timeit(name, fn, *args, n=N):
    def chained(*a):
        def body(i, acc):
            out = fn(*(x + acc * 1e-30 if jnp.issubdtype(x.dtype, jnp.floating)
                       else x for x in a))
            return acc + jnp.sum(out[(0,) * (out.ndim - 1) + (slice(0, 1),)]).astype(jnp.float32)
        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))
    jfn = jax.jit(chained)
    float(jfn(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jfn(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {min(ts)/n*1000:.3f} ms")


# raw conv 1x5, 512->128
x512 = jnp.asarray(rng.randn(B, h, w, 512).astype(np.float32))
wconv = jnp.asarray(rng.randn(1, 5, 512, 128).astype(np.float32) * 0.01)
def conv15(x):
    return jax.lax.conv_general_dilated(
        x, wconv, (1, 1), ((0, 0), (2, 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
timeit("conv 1x5 512->128", conv15, x512)

# equivalent matmul
xm = jnp.asarray(rng.randn(7040, 2560).astype(np.float32))
wm = jnp.asarray(rng.randn(2560, 128).astype(np.float32) * 0.01)
timeit("matmul 7040x2560x128", lambda a: jnp.dot(a, wm), xm)

# conv 3x3 256->192
x256 = jnp.asarray(rng.randn(B, h, w, 256).astype(np.float32))
w33 = jnp.asarray(rng.randn(3, 3, 256, 192).astype(np.float32) * 0.01)
def conv33(x):
    return jax.lax.conv_general_dilated(
        x, w33, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
timeit("conv 3x3 256->192", conv33, x256)

model = ptlflow_tpu.get_model("raft", args={"iters": 12})
model.init_params()
p = model.params

net0 = jnp.asarray(rng.randn(B, h, w, 128).astype(np.float32))
inp0 = jnp.asarray(rng.randn(B, h, w, 128).astype(np.float32))
corr0 = jnp.asarray(rng.randn(B, h, w, 324).astype(np.float32))
flow0 = jnp.asarray(rng.randn(B, h, w, 2).astype(np.float32))

timeit("SepConvGRU only",
       lambda n_, x_: model.update_block.gru(
           p["update_block"]["gru"], n_, x_),
       net0, jnp.asarray(rng.randn(B, h, w, 256).astype(np.float32)))
timeit("motion encoder only",
       lambda f_, c_: model.update_block.encoder(
           p["update_block"]["encoder"], f_, c_),
       flow0, corr0)
timeit("mask head",
       lambda n_: model.update_block.mask(p["update_block"]["mask"], n_),
       net0)
timeit("flow head",
       lambda n_: model.update_block.flow_head(
           p["update_block"]["flow_head"], n_),
       net0)

# corr lookup alone (pyramid precomputed outside the timed fn)
fm1 = jnp.asarray(rng.randn(B, h, w, 256).astype(np.float32))
fm2 = jnp.asarray(rng.randn(B, h, w, 256).astype(np.float32))
pyr = build_corr_pyramid(fm1, fm2, 4)
coords = coords_grid(B, h, w) + flow0
timeit("corr lookup (pyr fixed)",
       lambda c_: corr_pyramid_lookup(pyr, c_, 4), coords)
