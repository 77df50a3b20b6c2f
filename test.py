"""Benchmark-submission output generation for sintel/kitti/spring test
splits.

Parity with /root/reference/test.py: runs the model over each dataset's
test split and writes predictions using each benchmark's required file
naming (sintel: <seq>/frame_NNNN.flo; kitti: NNNNNN_10.png;
spring: flow_FW_left_NNNN.flo5).
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from ptlflow_tpu.utils import flow_io
from ptlflow_tpu.utils.cli import (add_common_model_args, datamodule_from_cfg,
                                   load_config, model_from_args,
                                   parse_with_config)


def _parse_args():
    parser = argparse.ArgumentParser(description=__doc__)
    add_common_model_args(parser)
    parser.add_argument("--test_dataset", type=str, default="sintel-test",
                        help="e.g. sintel-test+kitti-2015-test")
    parser.add_argument("--output_path", type=str, default="outputs/test")
    parser.add_argument("--max_samples", type=int, default=None)
    parser.add_argument("--scale_factor", type=float, default=None,
                        help="multiply the input by this factor before the "
                        "forward (reference test.py --scale_factor)")
    parser.add_argument("--max_forward_side", type=int, default=None,
                        help="downscale inputs whose longest side exceeds "
                        "this; predictions are upscaled back (reference "
                        "test.py --max_forward_side)")
    parser.add_argument("--save_viz", action="store_true",
                        help="also save RGB flow visualizations (reference "
                        "test.py --save_viz)")
    parser.add_argument("--show", action="store_true",
                        help="display each result on screen")
    parser.add_argument("--max_show_side", type=int, default=1000)
    return parse_with_config(parser)


def generate_outputs(model, loader, dataset_name: str, out_root: Path,
                     max_samples=None, args=None):
    """Benchmark-specific naming (reference test.py:98)."""
    import jax.numpy as jnp

    from validate import _make_scaler

    for i, batch in enumerate(loader):
        if max_samples is not None and i >= max_samples:
            break
        images = jnp.asarray(batch["images"])
        scaler = _make_scaler(images, args) if args is not None else None
        if scaler is not None:
            # --scale_factor / --max_forward_side: forward at reduced
            # resolution, upscale flow back (reference test.py via IOAdapter)
            x = jnp.moveaxis(images, -3, -1)
            images = jnp.moveaxis(scaler.fill(x), -1, -3)
        preds = model({"images": images})
        flows = preds["flows"]
        if scaler is not None:
            x = jnp.moveaxis(flows, -3, -1)
            flows = jnp.moveaxis(scaler.unfill(x, is_flow=True), -1, -3)
        flow = np.transpose(np.asarray(flows)[0, 0], (1, 2, 0))
        meta = batch.get("meta", {})
        img_path = None
        if meta.get("image_paths"):
            first = meta["image_paths"][0]
            img_path = Path(first[0] if isinstance(first, list) else first)
        if dataset_name.startswith("sintel"):
            seq = meta.get("misc", ["seq"])[0]
            sub = out_root / dataset_name / seq
            sub.mkdir(parents=True, exist_ok=True)
            name = img_path.stem if img_path is not None else f"frame_{i:04d}"
            flow_io.write_flo(sub / f"{name}.flo", flow)
        elif dataset_name.startswith("kitti"):
            sub = out_root / dataset_name / "flow"
            sub.mkdir(parents=True, exist_ok=True)
            name = img_path.name if img_path is not None else f"{i:06d}_10.png"
            flow_io.write_flow_png(sub / name, flow)
        elif dataset_name.startswith("spring"):
            seq_side = meta.get("misc", ["0000_left"])[0]
            seq, side = seq_side.rsplit("_", 1)
            sub = out_root / dataset_name / seq / f"flow_FW_{side}"
            sub.mkdir(parents=True, exist_ok=True)
            name = img_path.stem.replace("frame", "flow_FW") \
                if img_path is not None else f"flow_FW_{side}_{i:04d}"
            flow_io.write_flo5(sub / f"{name}.flo5", flow)
        else:
            sub = out_root / dataset_name
            sub.mkdir(parents=True, exist_ok=True)
            flow_io.write_flo(sub / f"{i:06d}.flo", flow)
        if args is not None and (getattr(args, "save_viz", False)
                                 or getattr(args, "show", False)):
            import cv2 as cv

            from ptlflow_tpu.utils.flow_viz import flow_to_rgb

            viz = flow_to_rgb(flow)[..., ::-1]
            if args.save_viz:
                vdir = out_root / dataset_name / "viz"
                vdir.mkdir(parents=True, exist_ok=True)
                cv.imwrite(str(vdir / f"{i:06d}.png"), viz)
            if getattr(args, "show", False):
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


def main():
    args = _parse_args()
    cfg = load_config(args)
    model, model_name = model_from_args(args, cfg)
    if model.params is None:
        model.init_params()
    dm = datamodule_from_cfg(cfg, output_stride=model.output_stride,
                             test_dataset=args.test_dataset)
    dm.setup("test")
    out_root = Path(args.output_path) / (model_name or "model")
    for name, loader in zip(dm.test_dataset_names, dm.test_dataloader()):
        generate_outputs(model, loader, name, out_root, args.max_samples,
                         args=args)
        print(f"wrote {name} submission files to {out_root / name}")


if __name__ == "__main__":
    main()
