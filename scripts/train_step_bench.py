"""Measure one fwd+bwd optimizer step on the TPU at train crop size.

Usage: python scripts/train_step_bench.py MODEL [--size H W] [--batch B]

Covers the path the eval benchmark misses: the VJP of every scan/kernel
(e.g. separableflow's GANet directional recursions, reference trains
through GANet_kernel.cu backward — ptlflow/models/separableflow/libs/).
Appends a train-step row to outputs/benchmark_tpu/train_steps.csv.
"""

import argparse
import csv
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model")
    ap.add_argument("--size", type=int, nargs=2, default=[368, 768])
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--runs", type=int, default=4)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--args", action="append", default=[])
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import ptlflow_tpu
    from ptlflow_tpu.parallel import (make_mesh, make_optimizer,
                                      create_train_state, build_train_step,
                                      shard_batch)

    margs = {}
    for kv in args.args:
        k, v = kv.split("=", 1)
        try:
            v = int(v)
        except ValueError:
            pass
        margs[k] = v

    model = ptlflow_tpu.get_model(args.model, args=margs)
    model.init_params()
    mesh = make_mesh(1)
    tx = make_optimizer(lr=1e-4, total_steps=100)
    state = create_train_state(model, tx)
    step = build_train_step(model, tx, mesh=mesh)

    h, w = args.size
    b = args.batch
    rng = np.random.RandomState(0)
    batch = shard_batch({
        "images": jnp.asarray(rng.rand(b, 2, 3, h, w).astype(np.float32)),
        "flows": jnp.asarray(
            rng.randn(b, 1, 2, h, w).astype(np.float32)),
        "valids": jnp.ones((b, 1, 1, h, w), jnp.float32),
    }, mesh)

    t0 = time.perf_counter()
    with mesh:
        state, metrics = step(state, batch)
    loss = float(metrics["loss"])
    compile_s = time.perf_counter() - t0
    assert np.isfinite(loss), loss

    def timed():
        nonlocal state
        t0 = time.perf_counter()
        with mesh:
            for _ in range(args.runs):
                state, metrics = step(state, batch)
        float(metrics["loss"])
        return time.perf_counter() - t0

    total = min(timed() for _ in range(args.reps))
    ms = total / args.runs * 1000
    commit = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                            capture_output=True, text=True,
                            cwd=REPO).stdout.strip()
    print(f"{args.model} train-step b{b} {h}x{w}: {ms:.2f} ms "
          f"(loss {loss:.3f}, compile {compile_s:.1f}s)")

    out = os.path.join(REPO, "outputs", "benchmark_tpu", "train_steps.csv")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    new = not os.path.exists(out)
    with open(out, "a", newline="") as f:
        wcsv = csv.writer(f)
        if new:
            wcsv.writerow(["model", "batch", "input_h", "input_w",
                           "train_step_ms", "commit", "device"])
        wcsv.writerow([args.model, b, h, w, round(ms, 2), commit,
                       "TPU v5 lite"])


if __name__ == "__main__":
    main()
