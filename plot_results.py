"""Plot accuracy-vs-speed scatter charts from benchmark + metric CSVs.

Parity with /root/reference/plot_results.py; uses matplotlib (plotly is not
available in this environment).
"""

from __future__ import annotations

import argparse
from pathlib import Path

import pandas as pd


def _parse_args():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--benchmark_csv", type=str,
                        default="outputs/benchmark/benchmark.csv")
    parser.add_argument("--metrics_csv", type=str,
                        default="outputs/summary/summarized_metrics-epe.csv")
    parser.add_argument("--metric_dataset", type=str,
                        default="sintel-clean-trainval")
    parser.add_argument("--output_path", type=str, default="outputs/plots")
    parser.add_argument("--models", type=str, nargs="*", default=None,
                        help="restrict the plot to these models (reference "
                        "plot_results.py --models)")
    parser.add_argument("--exclude_models", type=str, nargs="*", default=None,
                        help="models to leave out (reference plot_results.py "
                        "--exclude_models)")
    parser.add_argument("--checkpoint_names", type=str, nargs="*",
                        default=None,
                        help="restrict metric rows to these checkpoints")
    parser.add_argument("--log_x", action=argparse.BooleanOptionalAction,
                        default=True)
    parser.add_argument("--log_y", action=argparse.BooleanOptionalAction,
                        default=False)
    return parser.parse_args()


def save_plot(benchmark_csv: str, metrics_csv: str, metric_dataset: str,
              output_path: str, models=None, exclude_models=None,
              checkpoint_names=None, log_x: bool = True,
              log_y: bool = False):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    bench = pd.read_csv(benchmark_csv)
    if models:
        bench = bench[bench["model"].isin(models)]
    if exclude_models:
        bench = bench[~bench["model"].isin(exclude_models)]
    out_dir = Path(output_path)
    out_dir.mkdir(parents=True, exist_ok=True)

    fig, ax = plt.subplots(figsize=(8, 6))
    have_metrics = Path(metrics_csv).exists()
    metrics = pd.read_csv(metrics_csv) if have_metrics else None
    if metrics is not None and checkpoint_names \
            and "checkpoint" in metrics.columns:
        metrics = metrics[metrics["checkpoint"].isin(checkpoint_names)]
    for _, row in bench.iterrows():
        x = row["time_ms"]
        y = None
        if metrics is not None:
            sel = metrics[metrics["model"] == row["model"]]
            if not sel.empty and metric_dataset in sel.columns:
                y = float(sel.iloc[0][metric_dataset])
        if y is None:
            y = row["params"] / 1e6
        ax.scatter(x, y)
        ax.annotate(row["model"], (x, y), fontsize=8)
    ax.set_xlabel("inference time (ms)")
    ax.set_ylabel(f"EPE {metric_dataset}" if have_metrics else "params (M)")
    if log_x:
        ax.set_xscale("log")
    if log_y:
        ax.set_yscale("log")
    dest = out_dir / "speed_accuracy.png"
    fig.savefig(dest, dpi=120, bbox_inches="tight")
    print(f"wrote {dest}")
    return dest


if __name__ == "__main__":
    args = _parse_args()
    save_plot(args.benchmark_csv, args.metrics_csv, args.metric_dataset,
              args.output_path, models=args.models,
              exclude_models=args.exclude_models,
              checkpoint_names=args.checkpoint_names,
              log_x=args.log_x, log_y=args.log_y)
