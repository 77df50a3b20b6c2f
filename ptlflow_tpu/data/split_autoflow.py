"""Create the AutoFlow validation-split file (``AutoFlow_val.txt``).

Parity with /root/reference/ptlflow/data/split_autoflow.py:26-102: walks the
four ``static_40k_png_{i}_of_4`` part directories, groups the 40k samples by
their table index, and samples ``val_percentage`` of each table (carrying the
fractional remainder over between tables so the global ratio is exact), with
a fixed RNG seed so the split is reproducible.

Usage::

    python -m ptlflow_tpu.data.split_autoflow --autoflow_root /data/autoflow
"""

from __future__ import annotations

import random
from argparse import ArgumentParser
from pathlib import Path

_THIS_DIR = Path(__file__).resolve().parent


def build_parser() -> ArgumentParser:
    parser = ArgumentParser(description=__doc__)
    parser.add_argument("--autoflow_root", type=str, required=True)
    parser.add_argument("--output_file", type=str,
                        default=str(_THIS_DIR / "AutoFlow_val.txt"))
    parser.add_argument("--val_percentage", type=float, default=0.05)
    parser.add_argument("--expected_total", type=int, default=40000,
                        help="sanity-check sample count (0 disables)")
    return parser


def split_autoflow(autoflow_root: str, val_percentage: float = 0.05,
                   expected_total: int = 40000, seed: int = 42):
    """Return the sorted list of validation sample names."""
    rng = random.Random(seed)
    root = Path(autoflow_root)
    sample_dirs = []
    for i in range(4):
        part = root / f"static_40k_png_{i + 1}_of_4"
        sample_dirs.extend(sorted(f.stem for f in part.glob("*")
                                  if f.is_dir()))
    sample_dirs.sort()
    if expected_total and len(sample_dirs) != expected_total:
        raise ValueError(
            f"AutoFlow should have {expected_total} samples, found "
            f"{len(sample_dirs)}")

    tables = {}
    for sdir in sample_dirs:
        tables.setdefault(sdir.split("_")[1], []).append(sdir)

    val_samples = []
    carry = 0.0
    for dir_list in tables.values():
        want = val_percentage * len(dir_list) + carry
        take = int(want)
        carry = want - take
        rng.shuffle(dir_list)
        val_samples.extend(dir_list[:take])

    val_samples.sort(
        key=lambda x: 1000 * int(x.split("_")[1]) + int(x.split("_")[-1]))
    return val_samples


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    val_samples = split_autoflow(args.autoflow_root, args.val_percentage,
                                 args.expected_total)
    Path(args.output_file).write_text("\n".join(val_samples))
    print(f"Saved {len(val_samples)} sample names to {args.output_file}")


if __name__ == "__main__":
    main()
