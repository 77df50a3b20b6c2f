"""Per-model TPU latency sweep over tuning knobs (corr_impl, scan_unroll).

Usage: python scripts/perf_sweep.py MODEL [--size H W] [--knob name=v ...]

Measures the eval forward with the queue-drain pattern (see bench.py
measurement notes: the axon backend dispatches asynchronously, so we
enqueue N forwards and fetch one scalar reduced from the last output).
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model")
    ap.add_argument("--size", type=int, nargs=2, default=[500, 1000])
    ap.add_argument("--runs", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--knob", action="append", default=[],
                    help="attr=value set on the model (int/str)")
    ap.add_argument("--args", action="append", default=[],
                    help="model __init__ kwarg k=v")
    args = ap.parse_args()

    import jax
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import ptlflow_tpu

    def parse_v(v):
        try:
            return int(v)
        except ValueError:
            try:
                return float(v)
            except ValueError:
                return v

    margs = {}
    for kv in args.args:
        k, v = kv.split("=", 1)
        margs[k] = parse_v(v)

    model = ptlflow_tpu.get_model(args.model, args=margs)
    model.init_params()
    for kv in args.knob:
        k, v = kv.split("=", 1)
        setattr(model, k, parse_v(v))

    h, w = args.size
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.rand(1, 2, 3, h, w).astype(np.float32))

    fwd = jax.jit(lambda p, x: model.forward(p, {"images": x},
                                             training=False)["flows"])
    summarize = jax.jit(lambda f: jnp.sum(f[..., :1, :1]))

    null = jax.jit(lambda a: a + 1.0)
    float(null(jnp.zeros(())))
    overhead = min(
        (lambda t0=time.perf_counter(): (float(null(jnp.zeros(()))),
                                         time.perf_counter() - t0)[1])()
        for _ in range(5))

    t0 = time.perf_counter()
    float(summarize(fwd(model.params, imgs)))
    compile_s = time.perf_counter() - t0

    def timed_pass():
        t0 = time.perf_counter()
        out = None
        for _ in range(args.runs):
            out = fwd(model.params, imgs)
        float(summarize(out))
        return time.perf_counter() - t0

    total = min(timed_pass() for _ in range(args.reps))
    ms = (total - overhead) / args.runs * 1000
    print(f"{args.model} knobs={args.knob} margs={margs} "
          f"size={h}x{w}: {ms:.2f} ms (compile {compile_s:.1f}s)")


if __name__ == "__main__":
    main()
