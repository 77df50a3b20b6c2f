"""Pivot validate metric CSVs into summary tables.

Parity with /root/reference/summary_metrics.py: collects
outputs/validate/*/metrics.csv and writes one pivoted CSV per metric
(rows = model/checkpoint, columns = dataset).
"""

from __future__ import annotations

import argparse
from pathlib import Path

import pandas as pd


def _parse_args():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--metrics_path", type=str,
                        default="outputs/validate")
    parser.add_argument("--output_path", type=str,
                        default="outputs/summary")
    parser.add_argument("--metrics", type=str, nargs="*",
                        default=["epe", "px1", "flall", "wauc"])
    parser.add_argument("--sort_by", type=str, default="model",
                        help="column to sort the output tables by "
                        "(reference summary_metrics.py --sort_by)")
    parser.add_argument("--drop_checkpoints", type=str, nargs="*",
                        default=None,
                        help="checkpoint-name substrings to exclude "
                        "(reference summary_metrics.py --drop_checkpoints)")
    parser.add_argument("--save_plots", action="store_true",
                        help="save a per-metric bar plot beside each CSV "
                        "(reference summary_metrics.py --save_plots)")
    parser.add_argument("--plot_ignore_models", type=str, nargs="*",
                        default=None,
                        help="models to leave out of the plots")
    return parser.parse_args()


def summarize(metrics_path: str, output_path: str, metrics,
              sort_by: str = "model", drop_checkpoints=None,
              save_plots: bool = False, plot_ignore_models=None):
    frames = []
    for csv_path in Path(metrics_path).glob("*/metrics.csv"):
        frames.append(pd.read_csv(csv_path))
    if not frames:
        print(f"no metrics.csv found under {metrics_path}")
        return {}
    df = pd.concat(frames, ignore_index=True)
    if drop_checkpoints:
        # substring match, as in the reference (summary_metrics.py
        # --drop_checkpoints)
        ckpt = df["checkpoint"].astype(str)
        for sub in drop_checkpoints:
            df = df[~ckpt.str.contains(sub, na=False)]
            ckpt = df["checkpoint"].astype(str)
    out_dir = Path(output_path)
    out_dir.mkdir(parents=True, exist_ok=True)
    written = {}
    for metric in metrics:
        if metric not in df.columns:
            continue
        pivot = df.pivot_table(index=["model", "checkpoint"],
                               columns="dataset", values=metric)
        if sort_by and sort_by in ("model", "checkpoint"):
            pivot = pivot.sort_index(level=sort_by)
        elif sort_by and sort_by in pivot.columns:
            pivot = pivot.sort_values(sort_by)
        dest = out_dir / f"summarized_metrics-{metric}.csv"
        pivot.to_csv(dest)
        written[metric] = dest
        print(f"wrote {dest}")
        if save_plots:
            plot_df = pivot.reset_index()
            if plot_ignore_models:
                plot_df = plot_df[~plot_df["model"]
                                  .isin(plot_ignore_models)]
            try:
                import matplotlib

                matplotlib.use("Agg")
                import matplotlib.pyplot as plt

                ax = (plot_df.drop(columns=["checkpoint"])
                      .set_index("model").plot.bar(figsize=(12, 5)))
                ax.set_ylabel(metric)
                fig = ax.get_figure()
                fig.tight_layout()
                png = out_dir / f"summarized_metrics-{metric}.png"
                fig.savefig(png)
                plt.close(fig)
                written[f"{metric}_plot"] = png
                print(f"wrote {png}")
            except Exception as e:  # plotting backend optional
                print(f"--save_plots unavailable: {e}")
    return written


if __name__ == "__main__":
    args = _parse_args()
    summarize(args.metrics_path, args.output_path, args.metrics,
              sort_by=args.sort_by, drop_checkpoints=args.drop_checkpoints,
              save_plots=args.save_plots,
              plot_ignore_models=args.plot_ignore_models)
