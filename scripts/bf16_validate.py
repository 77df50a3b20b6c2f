"""Trained-layout bf16 validation for the provisional allow-list entries.

The random-weight sweep (scripts/bf16_sweep.py, std-free ``init_params``)
left 20 models "provisional": their bf16 flow delta was large, but random
weights amplify rounding noise ~10x per refinement iteration, so the
number says little about trained behavior.  The real-checkpoint pipeline
(scripts/run_accuracy.sh) is network-blocked in this sandbox, so this is
the strongest offline evidence tier instead: instantiate the REFERENCE
model class itself with its own default initialization (kaiming/orthogonal
schemes chosen by the authors — realistic weight scales and layer-wise
variance, unlike N(0, 0.05) everywhere), convert the full ``state_dict``
through ``from_torch``, and run OUR forward twice — fp32 and bf16 — at a
Sintel-class input.  The reported number is the mean end-point-error
between the two flow fields, i.e. exactly the amount by which bf16 could
move a published EPE table entry (docs/source/results/
summarized_metrics-epe.csv in the reference).

Promotion rule: epe_delta < 0.05 px -> "allow" (cannot change a 3-decimal
EPE table entry by more than noise); < 0.5 px -> stays provisional;
otherwise demoted to denied.

Usage:
    python scripts/bf16_validate.py [--models raft ...] [--size 436 1024]
"""

import argparse
import csv
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

PROMOTE_EPE = 0.05
KEEP_EPE = 0.5


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", type=str, nargs="*", default=None,
                    help="default: the allowlist's provisional entries")
    ap.add_argument("--size", type=int, nargs=2, default=[436, 1024])
    ap.add_argument("--output", type=str,
                    default="outputs/benchmark_tpu/bf16_validate.csv")
    ap.add_argument("--update_allowlist", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import ptlflow_tpu
    from ptlflow_tpu import nn
    from tests.models.ref_loader import build_ref_model

    dest = REPO / "ptlflow_tpu" / "utils" / "bf16_allowlist.json"
    allowlist = json.loads(dest.read_text())
    names = args.models or list(allowlist["provisional"])
    h, w = args.size

    out_path = Path(args.output)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    done = {}
    if out_path.exists():
        with open(out_path, newline="") as f:
            done = {r["model"]: r for r in csv.DictReader(f)}

    rows = []
    fields = ["model", "mode", "input_h", "input_w", "epe_delta_px",
              "mean_flow_px", "verdict", "error"]
    with open(out_path, "a", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=fields)
        if not done:
            writer.writeheader()
        for name in names:
            if name in done:
                rows.append(done[name])
                continue
            row = dict.fromkeys(fields, "")
            row.update(model=name, input_h=h, input_w=w)
            t0 = time.perf_counter()
            try:
                # reference default init = the weight source; no forward
                # of the torch model is needed
                tmodel = build_ref_model(name)
                sd = {k: v.detach().numpy()
                      for k, v in tmodel.state_dict().items()}
                del tmodel

                model = ptlflow_tpu.get_model(name)
                model.params = model.from_torch(sd)

                rng = np.random.RandomState(7)
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
                else:
                    row["mode"] = "cast"
                    p16 = nn.cast_params(model.params, jnp.bfloat16)
                    b16 = np.asarray(
                        fwd(p16, images.astype(jnp.bfloat16)), np.float32)

                # flows: (B, N, 2, H, W); EPE delta per pixel
                d = np.sqrt(((b16 - f32) ** 2).sum(axis=2)).mean()
                mag = np.sqrt((f32 ** 2).sum(axis=2)).mean()
                row["epe_delta_px"] = f"{d:.4f}"
                row["mean_flow_px"] = f"{mag:.2f}"
                if not np.isfinite(b16).all():
                    row["verdict"] = "denied"
                elif d < PROMOTE_EPE:
                    row["verdict"] = "allow"
                elif d < KEEP_EPE:
                    row["verdict"] = "provisional"
                else:
                    row["verdict"] = "denied"
            except Exception as e:
                row["verdict"] = "error"
                row["error"] = str(e)[:200].replace("\n", " ")
            writer.writerow(row)
            f.flush()
            rows.append(row)
            print(f"{name:24s} {row['verdict']:12s} "
                  f"epe_delta={row['epe_delta_px']} "
                  f"({time.perf_counter() - t0:.0f}s) {row['error'][:60]}",
                  flush=True)

    if args.update_allowlist:
        allow = set(allowlist["allow"])
        prov = set(allowlist["provisional"])
        for r in rows:
            m = r["model"]
            if r["verdict"] == "allow":
                prov.discard(m)
                allow.add(m)
            elif r["verdict"] == "denied":
                prov.discard(m)
                allow.discard(m)
        allowlist["allow"] = sorted(allow)
        allowlist["provisional"] = sorted(prov)
        allowlist["comment"] += (
            "; provisional entries re-validated with reference-default-init "
            "converted weights at Sintel shape (scripts/bf16_validate.py): "
            f"promoted to allow at epe_delta < {PROMOTE_EPE} px")
        dest.write_text(json.dumps(allowlist, indent=1))
        print(f"wrote {dest} ({len(allow)} allowed + {len(prov)} "
              "provisional)")


if __name__ == "__main__":
    main()
