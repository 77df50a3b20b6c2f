import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import ptlflow_tpu
from ptlflow_tpu import nn

model = ptlflow_tpu.get_model("raft", args={"iters": 12})
model.init_params()
rng = np.random.RandomState(0)
H, W = 440, 1024
N = 10


def timeit(name, fn, *args):
    def chained(*a):
        def body(i, acc):
            out = fn(a[0], {"images": a[1] + acc * 1e-30})
            return acc + jnp.sum(out["flows"][..., :1, :1].astype(jnp.float32))
        return jax.lax.fori_loop(0, N, body, jnp.zeros((), jnp.float32))
    jfn = jax.jit(chained)
    float(jfn(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jfn(*args))
        ts.append(time.perf_counter() - t0)
    b = args[1].shape[0]
    ms = min(ts) / N * 1000
    print(f"{name}: {ms:.2f} ms/batch = {b / (ms / 1000):.1f} fps")


fwd = lambda p, x: model.forward(p, x, training=False)

for b in (1, 4):
    imgs = jnp.asarray(rng.rand(b, 2, 3, H, W).astype(np.float32))
    timeit(f"fp32 batch{b}", fwd, model.params, imgs)

# bf16 everything (measures the ceiling; numerics unchecked)
p16 = nn.cast_params(model.params, jnp.bfloat16)
for b in (1, 4):
    imgs = jnp.asarray(rng.rand(b, 2, 3, H, W).astype(np.bfloat16))
    timeit(f"bf16 batch{b}", fwd, p16, imgs)
