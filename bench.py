"""Headline benchmark: RAFT frames/sec/chip at Sintel 1024x436, 12 GRU iters.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Baseline anchor (BASELINE.md / SURVEY.md §6): reference RAFT fp32 on RTX 3090
runs 139.294 ms at 500x1000 ≈ 7.18 fps; scaled to 1024x436 pixel count
(~0.874x) ≈ 8.2 fps reference-class.  vs_baseline = our_fps / 8.2.

Measurement notes: the axon-tunneled backend dispatches asynchronously and
only host transfers synchronize, so we time N data-dependent chained
forwards inside one jitted fori_loop that reduces to a scalar, and subtract
the measured null-dispatch overhead (one tunnel round trip).
"""

import json
import time

import numpy as np

BASELINE_FPS = 8.2
N_CHAIN = 10


def main():
    import os

    import jax

    # persistent compile cache: first compile through the remote-compile
    # tunnel is very slow (~20 min); cached reruns take seconds
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import ptlflow_tpu

    model = ptlflow_tpu.get_model("raft", args={"iters": 12})
    model.init_params()
    model.scan_unroll = 12  # unrolled GRU loop: ~16% faster than scan

    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.rand(1, 2, 3, 436, 1024).astype(np.float32))

    def chained(p, x):
        def body(i, acc):
            out = model.forward(p, {"images": x + acc * 1e-30},
                                training=False)
            return acc + jnp.sum(out["flows"][..., :1, :1])
        return jax.lax.fori_loop(0, N_CHAIN, body, jnp.zeros((), jnp.float32))

    jfn = jax.jit(chained)
    float(jfn(model.params, imgs))  # compile + warmup

    # measured null-dispatch overhead (tunnel round trip)
    null = jax.jit(lambda a: a + 1.0)
    float(null(jnp.zeros(())))
    null_ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(null(jnp.zeros(())))
        null_ts.append(time.perf_counter() - t0)
    overhead = float(np.median(null_ts))

    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jfn(model.params, imgs))
        ts.append(time.perf_counter() - t0)
    latency = (min(ts) - overhead) / N_CHAIN
    fps = 1.0 / latency

    print(json.dumps({
        "metric": "raft_fps_sintel_1024x436_12iters",
        "value": round(fps, 3),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
