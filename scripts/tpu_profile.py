"""Capture a TPU trace of one model forward and print the op-time table.

Usage: python scripts/tpu_profile.py MODEL [--size H W] [--args k=v ...]

Wraps the forward in ``jax.profiler.trace`` (the analog of the
reference's ``torch.profiler`` path in model_benchmark.py:141-161) and
summarizes the resulting xplane with xprof's op_profile converter, so a
perf session can name the dominant op without leaving the terminal.
"""

import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model")
    ap.add_argument("--size", type=int, nargs=2, default=[500, 1000])
    ap.add_argument("--args", action="append", default=[])
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--out", default="/tmp/tpu_profile")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import ptlflow_tpu

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
    h, w = args.size
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.rand(1, 2, 3, h, w).astype(np.float32))
    fwd = jax.jit(lambda p, x: model.forward(p, {"images": x},
                                             training=False)["flows"])
    out = fwd(model.params, imgs)
    out.block_until_ready()

    os.makedirs(args.out, exist_ok=True)
    with jax.profiler.trace(args.out):
        for _ in range(3):
            out = fwd(model.params, imgs)
        out.block_until_ready()

    xspaces = sorted(glob.glob(
        os.path.join(args.out, "**", "*.xplane.pb"), recursive=True))
    if not xspaces:
        print("no xplane captured", file=sys.stderr)
        return
    from xprof.convert import raw_to_tool_data
    data, _ = raw_to_tool_data.xspace_to_tool_data(
        [xspaces[-1]], "op_profile", {})
    prof = json.loads(data)

    # op_profile is a tree: byProgram/byCategory -> children. Flatten
    # leaf xla ops by self time.
    rows = []

    def walk(node, cat):
        ch = node.get("children", [])
        m = node.get("metrics", {})
        name = node.get("name", "")
        if node.get("xla", {}).get("program_id") or not ch:
            if m.get("time"):
                rows.append((m.get("time", 0.0), name, cat,
                             m.get("flops", 0.0),
                             m.get("memoryBandwidth", 0.0)))
            return
        for c in ch:
            walk(c, cat or name)

    root = prof.get("byCategory", prof.get("byProgram", {}))
    for c in root.get("children", []):
        walk(c, c.get("name", ""))
    rows.sort(reverse=True)
    total = sum(r[0] for r in rows) or 1.0
    print(f"{'self%':>6} {'cum%':>6} {'flops%':>7}  op  [category]")
    cum = 0.0
    for t, name, cat, fl, bw in rows[:args.top]:
        cum += t
        print(f"{100*t/total:6.2f} {100*cum/total:6.2f} {100*fl:7.2f}  "
              f"{name[:90]}  [{cat}]")


if __name__ == "__main__":
    main()
