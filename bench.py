"""Headline benchmark: RAFT frames/sec/chip at Sintel 1024x436, 12 GRU iters.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Baseline anchor (BASELINE.md / SURVEY.md §6): reference RAFT fp32 on RTX 3090
runs 139.294 ms at 500x1000 ≈ 7.18 fps; scaled to 1024x436 pixel count
(~0.874x) ≈ 8.2 fps reference-class.  vs_baseline = our_fps / 8.2.
"""

import json
import time

import numpy as np

BASELINE_FPS = 8.2


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

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(1, 2, 3, 436, 1024).astype(np.float32))

    from ptlflow_tpu.utils.timing import measure_latency

    inputs = {"images": images}
    latency = measure_latency(model.forward, model.params, inputs,
                              n_chain=5, repeats=3)
    fps = 1.0 / latency

    print(json.dumps({
        "metric": "raft_fps_sintel_1024x436_12iters",
        "value": round(fps, 3),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
