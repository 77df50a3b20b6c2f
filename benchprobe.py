import time, numpy as np, jax, jax.numpy as jnp
import ptlflow_tpu
from ptlflow_tpu.ops.correlation import (
    build_corr_pyramid, corr_pyramid_lookup, coords_grid)

model = ptlflow_tpu.get_model("raft", args={"iters": 12})
model.init_params()
rng = np.random.RandomState(0)
B, H, W = 1, 440, 1024
h, w = H // 8, W // 8
images = jnp.asarray(rng.rand(B, 2, 2, H, W, 3).astype(np.float32))[:, 0]
fm1 = jnp.asarray(rng.randn(B, h, w, 256).astype(np.float32))
fm2 = jnp.asarray(rng.randn(B, h, w, 256).astype(np.float32))
coords = coords_grid(B, h, w) + jnp.asarray(
    rng.randn(B, h, w, 2).astype(np.float32))
net0 = jnp.asarray(rng.randn(B, h, w, 128).astype(np.float32))
inp0 = jnp.asarray(rng.randn(B, h, w, 128).astype(np.float32))


def timeit(name, fn, *args, n=3):
    jfn = jax.jit(lambda *a: jnp.sum(fn(*a)))
    v = float(jfn(*args))  # compile
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(jfn(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {min(ts)*1000:.1f} ms")


p = model.params

timeit("fnet(1 image)", lambda x: model.fnet(p["fnet"], x), images[:, 0])
timeit("cnet", lambda x: model.cnet(p["cnet"], x), images[:, 0])
timeit("corr volume+pyramid",
       lambda a, b: build_corr_pyramid(a, b, 4)[3], fm1, fm2)


def lookup12(a, b, c):
    pyr = build_corr_pyramid(a, b, 4)
    def body(i, acc):
        out = corr_pyramid_lookup(pyr, c + acc * 1e-30, 4)
        return acc + jnp.sum(out[..., :1])
    return jax.lax.fori_loop(0, 12, body, jnp.zeros((), jnp.float32))

timeit("12x corr lookup", lookup12, fm1, fm2, coords)


def update12(net, inp, corr, flow):
    def body(i, carry):
        net, acc = carry
        net, mask, delta = model.update_block(
            p["update_block"], net, inp, corr, flow + acc * 1e-30)
        return (net, acc + jnp.sum(delta[..., :1]))
    _, acc = jax.lax.fori_loop(0, 12, body, (net, jnp.zeros((), jnp.float32)))
    return acc

corr_in = jnp.asarray(rng.randn(B, h, w, 324).astype(np.float32))
flow_in = jnp.asarray(rng.randn(B, h, w, 2).astype(np.float32))
timeit("12x update block", update12, net0, inp0, corr_in, flow_in)

from ptlflow_tpu.ops.upsample import convex_upsample
mask_in = jnp.asarray(rng.randn(B, h, w, 576).astype(np.float32))
timeit("convex upsample", convex_upsample, flow_in, mask_in)
