import time, numpy as np, jax, jax.numpy as jnp
import ptlflow_tpu
from ptlflow_tpu.ops.correlation import (
    build_corr_pyramid, corr_pyramid_lookup, coords_grid)
from ptlflow_tpu.ops.upsample import convex_upsample

model = ptlflow_tpu.get_model("raft", args={"iters": 12})
model.init_params()
rng = np.random.RandomState(0)
B, H, W = 1, 440, 1024
h, w = H // 8, W // 8
img = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
fm1 = jnp.asarray(rng.randn(B, h, w, 256).astype(np.float32))
fm2 = jnp.asarray(rng.randn(B, h, w, 256).astype(np.float32))
coords = coords_grid(B, h, w) + jnp.asarray(
    rng.randn(B, h, w, 2).astype(np.float32))
p = model.params

N = 20


def timeit(name, fn, *args):
    """Chain fn N times with a scalar data dependency; amortizes RPC."""
    def chained(*a):
        def body(i, acc):
            perturbed = tuple(
                x + acc * 1e-30 if isinstance(x, jnp.ndarray) and
                jnp.issubdtype(x.dtype, jnp.floating) else x for x in a)
            out = fn(*perturbed)
            return acc + jnp.sum(out[..., :1, :1]) * 1e-30
        return jax.lax.fori_loop(0, N, body, jnp.zeros((), jnp.float32))
    jfn = jax.jit(chained)
    float(jfn(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jfn(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {min(ts)/N*1000:.2f} ms")


timeit("fnet", lambda x: model.fnet(p["fnet"], x), img)
timeit("cnet", lambda x: model.cnet(p["cnet"], x), img)
timeit("corr volume+pyr", lambda a, b: build_corr_pyramid(a, b, 4)[3], fm1, fm2)


def one_iter(a, b, c):
    pyr = build_corr_pyramid(a, b, 4)
    return corr_pyramid_lookup(pyr, c, 4)

timeit("volume+1 lookup", one_iter, fm1, fm2, coords)

corr_in = jnp.asarray(rng.randn(B, h, w, 324).astype(np.float32))
flow_in = jnp.asarray(rng.randn(B, h, w, 2).astype(np.float32))
net0 = jnp.asarray(rng.randn(B, h, w, 128).astype(np.float32))
inp0 = jnp.asarray(rng.randn(B, h, w, 128).astype(np.float32))

timeit("1x update block",
       lambda n, i, c, f: model.update_block(p["update_block"], n, i, c, f)[0],
       net0, inp0, corr_in, flow_in)

mask_in = jnp.asarray(rng.randn(B, h, w, 576).astype(np.float32))
timeit("convex upsample", convex_upsample, flow_in, mask_in)

# full forward
inputs = {"images": jnp.asarray(rng.rand(B, 2, 3, H, W).astype(np.float32))}
timeit("FULL forward",
       lambda im: model.forward(p, {"images": im})["flows"][:, 0, 0],
       inputs["images"])
