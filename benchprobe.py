import time, numpy as np, jax, jax.numpy as jnp
import ptlflow_tpu

model = ptlflow_tpu.get_model("raft", args={"iters": 12})
model.init_params()
rng = np.random.RandomState(0)
images = jnp.asarray(rng.rand(1, 2, 3, 436, 1024).astype(np.float32))
inputs = {"images": images}
fwd = jax.jit(lambda p, x: jnp.sum(model.forward(p, x, training=False)["flows"]))
t0 = time.perf_counter()
v = float(fwd(model.params, inputs))
print("compile+run:", time.perf_counter() - t0, v)
for i in range(5):
    t0 = time.perf_counter()
    v = float(fwd(model.params, inputs))
    print("run:", time.perf_counter() - t0)
