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
                                   load_config, model_from_args,
                                   parse_with_config)
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
    parser.add_argument("--seq_val_mode", type=str, default="all",
                        choices=("all", "first", "middle", "last"),
                        help="which prediction frame to evaluate when the "
                        "model predicts more than one (reference "
                        "validate.py:141-148)")
    parser.add_argument("--bf16", action="store_true",
                        help="bfloat16 inference (analog of the reference "
                        "--fp16, validate.py:138): models with a "
                        "mixed_precision switch use their guarded bf16 path "
                        "(fp32 coords/flow state); others get a generic "
                        "bfloat16 parameter cast, which, as with the "
                        "reference's fp16, is not supported by every model")
    parser.add_argument("--max_samples", type=int, default=None)
    parser.add_argument("--show", action="store_true",
                        help="display results on screen (reference "
                        "validate.py:85-89)")
    parser.add_argument("--max_show_side", type=int, default=1000,
                        help="downscale displayed images whose longest side "
                        "exceeds this (reference validate.py:115-123)")
    parser.add_argument("--flow_format", type=str, default="original",
                        choices=("flo", "png", "original"),
                        help="format for saved flow; 'original' matches the "
                        "dataset's GT format (reference validate.py:90-99)")
    parser.add_argument("--reversed", action="store_true",
                        help="with --all/--select: iterate the model list "
                        "in reversed order (reference validate.py:137-140)")
    parser.add_argument("--write_individual_metrics", action="store_true",
                        help="save a per-image metrics table (reference "
                        "validate.py:149-153)")
    parser.add_argument("--epe_clip", type=float, default=5.0,
                        help="EPE clipping for the error-map visualization "
                        "(reference validate.py:154-159)")
    parser.add_argument("--metric_exclude", type=str, nargs="*", default=None,
                        help="metric names to drop from saved results "
                        "(reference validate.py:160-165)")
    parser.add_argument("--spatial_shards", type=int, default=None,
                        help="shard the correlation volume / global "
                        "matching over N devices ('spatial' mesh axis) for "
                        "very high resolutions (Spring 1080p/4K, SURVEY.md "
                        "§5.7); supported by RAFT-family and GMFlow/"
                        "UniMatch models")
    return parse_with_config(parser)


def _make_scaler(images, args):
    """InputScaler honoring --scale_factor / --max_forward_side (reference
    validate.py:100-114): max_forward_side caps the longest side; otherwise
    scale_factor applies directly. Returns None when no scaling is needed."""
    from ptlflow_tpu.ops.resize import InputScaler

    scale = args.scale_factor
    if args.max_forward_side is not None:
        side = max(int(images.shape[-2]), int(images.shape[-1]))
        if side > args.max_forward_side:
            scale = args.max_forward_side / side
    if scale is None or scale == 1.0:
        return None
    # InputScaler works on NHWC trailing dims.
    nhwc_shape = images.shape[:-3] + images.shape[-2:] + images.shape[-3:-2]
    return InputScaler(nhwc_shape, scale_factor=scale)


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
        images = jnp.asarray(batch["images"])
        scaler = _make_scaler(images, args)
        if scaler is not None:
            x = jnp.moveaxis(images, -3, -1)
            images = jnp.moveaxis(scaler.fill(x), -1, -3)
        inputs = {"images": images}
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
        if scaler is not None:
            # Unscale flow predictions back to original resolution before
            # metrics/outputs (reference validate.py:413-415 via IOAdapter).
            unscaled = {}
            for k, v in preds.items():
                if hasattr(v, "ndim") and v.ndim >= 4 and "small" not in k:
                    x = jnp.moveaxis(v, -3, -1)
                    x = scaler.unfill(x, is_flow="flow" in k)
                    unscaled[k] = jnp.moveaxis(x, -1, -3)
                else:
                    unscaled[k] = v
            preds = unscaled
        n_flows = batch["flows"].shape[1] if "flows" in batch else 1
        if n_flows > 1 and getattr(args, "seq_val_mode", "all") != "all":
            # evaluate a single frame of multi-frame predictions
            # (reference validate.py:423-438)
            if args.seq_val_mode == "first":
                k = 0
            elif args.seq_val_mode == "middle":
                k = batch["images"].shape[1] // 2
            else:
                k = n_flows - 1
            for key in ("flows", "valids", "occs"):
                if key in batch and batch[key].ndim == 5:
                    batch[key] = batch[key][:, k:k + 1]
            if hasattr(preds.get("flows"), "shape") \
                    and preds["flows"].shape[1] > 1:
                preds = dict(preds)
                preds["flows"] = preds["flows"][:, k:k + 1]
        targets = None
        if "flows" in batch:
            targets = {"flows": jnp.asarray(batch["flows"])}
            if "valids" in batch:
                targets["valids"] = jnp.asarray(batch["valids"])
            if "occs" in batch:
                targets["occs"] = jnp.asarray(batch["occs"])
            metrics.update({"flows": preds["flows"]}, targets)
            if getattr(args, "write_individual_metrics", False):
                # per-image metrics table (reference validate.py:149-153,
                # written at :466-474)
                one = FlowMetrics()
                one.update({"flows": preds["flows"]}, targets)
                rows.append({"dataset": dataset_name, "index": i,
                             **{k: float(v) for k, v in
                                one.compute().items()}})
        if args.write_outputs or getattr(args, "show", False):
            flow = np.transpose(np.asarray(preds["flows"])[0, 0], (1, 2, 0))
            stem = f"{i:06d}"
            sub = out_dir / dataset_name
            import cv2 as cv

            viz = flow_to_rgb(flow)[..., ::-1]
            epe_map = None
            if targets is not None:
                gt = np.transpose(np.asarray(batch["flows"])[0, 0], (1, 2, 0))
                epe_map = np.linalg.norm(flow - gt, axis=-1)
                # EPE visualization clipped at --epe_clip (reference
                # validate.py:154-159, rendering at :186-199)
                clip = max(getattr(args, "epe_clip", 5.0), 1e-6)
                epe_img = (np.clip(epe_map / clip, 0, 1)
                           * 255).astype(np.uint8)
                epe_img = cv.applyColorMap(epe_img, cv.COLORMAP_JET)
            if args.write_outputs:
                sub.mkdir(parents=True, exist_ok=True)
                fmt = getattr(args, "flow_format", "original")
                if fmt == "original":
                    # match the dataset's own GT format (reference
                    # validate.py:90-99): KITTI/HD1K use 16-bit PNG,
                    # everything else .flo
                    fmt = ("png" if any(s in dataset_name.lower()
                                        for s in ("kitti", "hd1k"))
                           else "flo")
                flow_io.flow_write(sub / f"{stem}.{fmt}", flow)
                cv.imwrite(str(sub / f"{stem}_viz.png"), viz)
                if epe_map is not None:
                    cv.imwrite(str(sub / f"{stem}_epe.png"), epe_img)
            if getattr(args, "show", False):
                # --max_show_side downscale (reference validate.py:115-123)
                side = max(viz.shape[:2])
                if side > args.max_show_side:
                    s = args.max_show_side / side
                    viz = cv.resize(viz, None, fx=s, fy=s)
                try:
                    cv.imshow(f"{dataset_name} flow", viz)
                    cv.waitKey(1)
                except cv.error as e:  # headless environment
                    print(f"--show unavailable: {e}")
                    args.show = False
    if rows and getattr(args, "write_individual_metrics", False):
        import csv

        out_dir.mkdir(parents=True, exist_ok=True)
        with open(out_dir / f"{dataset_name}_individual_metrics.csv", "w",
                  newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(rows[0]))
            w.writeheader()
            w.writerows(rows)
    result = metrics.compute()
    return result


def validate(args, model=None, model_name: Optional[str] = None):
    cfg = load_config(args)
    if args.iters is not None:
        # --iters overrides the model's recurrent iteration count
        # (reference validate.py passes it into model init args).
        cfg.setdefault("model", {}).setdefault("init_args", {})["iters"] = \
            args.iters
    if model is None:
        model, model_name = model_from_args(args, cfg)
        if model.params is None:
            model.init_params()
    elif args.iters is not None and hasattr(model, "iters"):
        model.iters = args.iters

    if getattr(args, "spatial_shards", None):
        import jax as _jax

        from ptlflow_tpu.parallel import make_mesh

        n = args.spatial_shards
        assert len(_jax.devices()) >= n, \
            f"--spatial_shards {n} needs {n} devices"
        model.spatial_mesh = make_mesh(n, spatial=n)

    if getattr(args, "bf16", False):
        if hasattr(model, "mixed_precision"):
            model.mixed_precision = True
        else:
            # blind parameter cast — only for models the bf16 sweep verified
            # (scripts/bf16_sweep.py; analog of the reference's fp16
            # exclude-list, tests/ptlflow/models/test_models.py:46-57)
            import json

            import jax.numpy as jnp

            from ptlflow_tpu import nn as _nn

            allow_path = (Path(ptlflow_tpu.__file__).parent / "utils" /
                          "bf16_allowlist.json")
            allow = provisional = None
            if allow_path.exists():
                with open(allow_path) as f:
                    d = json.load(f)
                allow = set(d["allow"])
                provisional = set(d.get("provisional", []))
            if allow is not None and model_name not in allow \
                    and model_name not in (provisional or set()):
                print(f"[{model_name}] not on the bf16 allow-list "
                      f"({allow_path.name}); validating in fp32")
            else:
                if provisional and model_name in provisional:
                    print(f"[{model_name}] bf16 support is PROVISIONAL "
                          f"(random-weight rel delta 0.3-1.0; re-validate "
                          f"with real checkpoints — scripts/run_accuracy.sh)")
                model.params = _nn.cast_params(model.params, jnp.bfloat16)

    dm = datamodule_from_cfg(cfg, output_stride=model.output_stride,
                             val_dataset=args.val_dataset)
    dm.setup("validate")

    out_dir = Path(args.output_path) / (model_name or "model")
    out_dir.mkdir(parents=True, exist_ok=True)

    all_metrics = {}
    drop = set(getattr(args, "metric_exclude", None) or [])
    for name, loader in zip(dm.val_dataset_names, dm.val_dataloader()):
        m = validate_one_dataloader(model, loader, name, args, out_dir)
        if drop:
            # --metric_exclude (reference validate.py:160-165)
            m = {k: v for k, v in m.items() if k not in drop}
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
    names = list(args.select or ptlflow_tpu.get_model_names())
    if getattr(args, "reversed", False):
        # iterate in reversed order so two sweeps can split the zoo from
        # both ends (reference validate.py:137-140)
        names.reverse()
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
