"""Headline benchmark: RAFT frames/sec/chip at Sintel 1024x436, 12 GRU iters.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Baseline anchor (BASELINE.md / SURVEY.md §6): reference RAFT fp32 on RTX 3090
runs 139.294 ms at 500x1000 ≈ 7.18 fps; scaled to 1024x436 pixel count
(~0.874x) ≈ 8.2 fps reference-class.  vs_baseline = our_fps / 8.2.

Measurement notes: the axon-tunneled backend dispatches asynchronously
(``block_until_ready`` returns immediately; only host transfers sync), and
wrapping the forward in a device-side loop makes the remote compile
pathologically slow.  So we use the device execution queue itself: enqueue N
forwards back-to-back, then fetch one scalar reduced from the last output —
the fetch completes only after the whole queue drains, giving
N * forward_time + one round trip.
"""

import json
import time

import numpy as np

BASELINE_FPS = 8.2
N_RUNS = 20


def main():
    import os

    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import ptlflow_tpu

    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.rand(1, 2, 3, 436, 1024).astype(np.float32))
    summarize = jax.jit(lambda f: jnp.sum(f[..., :1, :1]))

    # measured null round-trip overhead
    null = jax.jit(lambda a: a + 1.0)
    float(null(jnp.zeros(())))
    overhead = min(
        (lambda t0=time.perf_counter(): (float(null(jnp.zeros(()))),
                                         time.perf_counter() - t0)[1])()
        for _ in range(5))

    def measure(mixed_precision: bool) -> float:
        model = ptlflow_tpu.get_model(
            "raft", args={"iters": 12, "mixed_precision": mixed_precision})
        model.init_params()
        model.scan_unroll = 12  # unrolled GRU: ~16% faster than lax.scan

        fwd = jax.jit(lambda p, x: model.forward(p, {"images": x},
                                                 training=False)["flows"])
        # compile + warmup (sync via scalar fetch)
        float(summarize(fwd(model.params, imgs)))

        def timed_pass():
            t0 = time.perf_counter()
            out = None
            for _ in range(N_RUNS):
                out = fwd(model.params, imgs)
            float(summarize(out))  # drains the device queue
            return time.perf_counter() - t0

        total = min(timed_pass() for _ in range(3))
        return N_RUNS / (total - overhead)

    # Secondary line: the guarded bf16 mixed-precision path (analog of the
    # reference's fp16 benchmark column; reference RAFT fp16 is ~84.99 ms at
    # 500x1000 => ~13.5 fps scaled to 1024x436 pixel count).
    fps_bf16 = measure(mixed_precision=True)
    print(json.dumps({
        "metric": "raft_fps_sintel_1024x436_12iters_mixed_precision",
        "value": round(fps_bf16, 3),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps_bf16 / BASELINE_FPS, 3),
    }))

    # Headline (LAST line, parsed by the driver): fp32, directly comparable
    # with the fp32 reference anchor and with previous rounds.
    fps = measure(mixed_precision=False)
    print(json.dumps({
        "metric": "raft_fps_sintel_1024x436_12iters",
        "value": round(fps, 3),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
