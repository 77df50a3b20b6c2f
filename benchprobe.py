import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import ptlflow_tpu

rng = np.random.RandomState(0)
B, H, W = 1, 440, 1024
imgs = jnp.asarray(rng.rand(B, 2, 3, H, W).astype(np.float32))
N = 10
OVERHEAD_MS = 29.3


def timeit(name, model):
    fwd = lambda p, x: model.forward(p, {"images": x}, training=False)

    def chained(p, x):
        def body(i, acc):
            out = fwd(p, x + acc * 1e-30)
            return acc + jnp.sum(out["flows"][..., :1, :1])
        return jax.lax.fori_loop(0, N, body, jnp.zeros((), jnp.float32))
    jfn = jax.jit(chained)
    float(jfn(model.params, imgs))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jfn(model.params, imgs))
        ts.append(time.perf_counter() - t0)
    real = (min(ts) * 1000 - OVERHEAD_MS) / N
    print(f"{name}: {real:.2f} ms real per forward = {1000/real:.1f} fps")


m = ptlflow_tpu.get_model("raft", args={"iters": 12})
m.init_params()
m.scan_unroll = 12
timeit("raft iters=12 unroll=12", m)
