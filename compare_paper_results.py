"""Compare validation metrics against published paper numbers.

Parity with /root/reference/compare_paper_results.py: joins the summarized
metrics CSV with a table of paper-reported results and reports deltas.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import pandas as pd


def _parse_args():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--summary_csv", type=str,
                        default="outputs/summary/summarized_metrics-epe.csv")
    parser.add_argument("--paper_csv", type=str, required=True,
                        help="CSV with columns model,dataset,value")
    parser.add_argument("--output_path", type=str, default="outputs/compare")
    parser.add_argument("--add_delta", action=argparse.BooleanOptionalAction,
                        default=True,
                        help="include the ours-minus-paper delta column "
                        "(reference compare_paper_results.py --add_delta)")
    return parser.parse_args()


def compare(summary_csv: str, paper_csv: str, output_path: str,
            add_delta: bool = True):
    ours = pd.read_csv(summary_csv)
    paper = pd.read_csv(paper_csv)
    rows = []
    for _, prow in paper.iterrows():
        sel = ours[ours["model"] == prow["model"]]
        if sel.empty or prow["dataset"] not in sel.columns:
            continue
        our_val = float(sel.iloc[0][prow["dataset"]])
        row = {
            "model": prow["model"], "dataset": prow["dataset"],
            "paper": float(prow["value"]), "ours": our_val,
        }
        if add_delta:
            row["delta"] = our_val - float(prow["value"])
        rows.append(row)
    df = pd.DataFrame(rows)
    out_dir = Path(output_path)
    out_dir.mkdir(parents=True, exist_ok=True)
    dest = out_dir / "paper_comparison.csv"
    df.to_csv(dest, index=False)
    if not df.empty:
        print(df.to_string(index=False))
    print(f"wrote {dest}")
    return df


if __name__ == "__main__":
    args = _parse_args()
    compare(args.summary_csv, args.paper_csv, args.output_path,
            add_delta=args.add_delta)
