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
    return parser.parse_args()


def summarize(metrics_path: str, output_path: str, metrics):
    frames = []
    for csv_path in Path(metrics_path).glob("*/metrics.csv"):
        frames.append(pd.read_csv(csv_path))
    if not frames:
        print(f"no metrics.csv found under {metrics_path}")
        return {}
    df = pd.concat(frames, ignore_index=True)
    out_dir = Path(output_path)
    out_dir.mkdir(parents=True, exist_ok=True)
    written = {}
    for metric in metrics:
        if metric not in df.columns:
            continue
        pivot = df.pivot_table(index=["model", "checkpoint"],
                               columns="dataset", values=metric)
        dest = out_dir / f"summarized_metrics-{metric}.csv"
        pivot.to_csv(dest)
        written[metric] = dest
        print(f"wrote {dest}")
    return written


if __name__ == "__main__":
    args = _parse_args()
    summarize(args.metrics_path, args.output_path, args.metrics)
