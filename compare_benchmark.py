"""Join a model_benchmark.py CSV against the reference's published
model_benchmark-all.csv and emit a speedup table (markdown + CSV).

Counterpart of compare_paper_results.py for speed instead of EPE; reference
numbers are RTX 3090 fp32 (docs/source/results/model_benchmark.rst:5-11).

Usage::

    python compare_benchmark.py --ours outputs/benchmark_tpu/benchmark.csv \
        --reference /path/to/model_benchmark-all.csv \
        --output_path docs/results/benchmark_vs_reference.md
"""

from __future__ import annotations

import argparse
import csv
from pathlib import Path


def _parse_args():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--ours", type=str,
                        default="outputs/benchmark_tpu/benchmark.csv")
    parser.add_argument("--reference", type=str, required=True,
                        help="reference model_benchmark-all.csv")
    parser.add_argument("--output_path", type=str,
                        default="docs/results/benchmark_vs_reference.md")
    return parser.parse_args()


def load_reference(path):
    ref = {}
    with open(path, newline="") as f:
        for r in csv.DictReader(f):
            ref[r["Model"]] = {
                "fp32_ms": _f(r.get("Time(ms)-fp32")),
                "fp16_ms": _f(r.get("Time(ms)-fp16")),
                "params_m": _f(r.get("Params")),
            }
    return ref


def _f(v):
    try:
        return float(v)
    except (TypeError, ValueError):
        return None


def compare(ours_csv, ref_csv):
    ref = load_reference(ref_csv)
    by_model = {}
    with open(ours_csv, newline="") as f:
        for r in csv.DictReader(f):
            if r["datatype"] != "fp32":
                continue
            prev = by_model.get(r["model"])
            # dedup: fastest wins (contention only ever inflates latency)
            if prev is None or float(r["time_ms"]) < float(prev["time_ms"]):
                by_model[r["model"]] = r
    rows = []
    for m, r in by_model.items():
        ours_ms = float(r["time_ms"])
        ref_ms = ref.get(m, {}).get("fp32_ms")
        rows.append({
            "model": m,
            "ours_ms": ours_ms,
            "ref_ms": ref_ms,
            "speedup": (ref_ms / ours_ms) if ref_ms else None,
            "params_m": float(r["params"]) / 1e6,
        })
    rows.sort(key=lambda r: -(r["speedup"] or 0))
    return rows


def main():
    args = _parse_args()
    rows = compare(args.ours, args.reference)
    out = Path(args.output_path)
    out.parent.mkdir(parents=True, exist_ok=True)
    lines = [
        "# Forward latency: one TPU chip vs reference RTX 3090 (fp32, "
        "500x1000)", "",
        "| model | params (M) | TPU ms | 3090 ms | speedup |",
        "|---|---|---|---|---|",
    ]
    speedups = [r["speedup"] for r in rows if r["speedup"]]
    for r in rows:
        su = f"{r['speedup']:.2f}x" if r["speedup"] else "—"
        rm = f"{r['ref_ms']:.1f}" if r["ref_ms"] else "—"
        lines.append(f"| {r['model']} | {r['params_m']:.2f} | "
                     f"{r['ours_ms']:.1f} | {rm} | {su} |")
    if speedups:
        import statistics

        lines += ["", f"Covered: {len(speedups)} models; median speedup "
                  f"{statistics.median(speedups):.2f}x; "
                  f"faster than reference on "
                  f"{sum(s > 1 for s in speedups)}/{len(speedups)}."]
    out.write_text("\n".join(lines) + "\n")
    print("\n".join(lines[2:6] + ["..."] + lines[-2:]))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
