"""Inference on image pairs, folders, or videos.

CLI parity with /root/reference/infer.py: --model, --ckpt_path,
--input_path (two images | folder | video), --output_path, --flow_format,
optional GT EPE printing; writes flow files + RGB visualizations.
"""

from __future__ import annotations

import argparse
from pathlib import Path
from typing import List, Optional

import numpy as np

from ptlflow_tpu.utils import flow_io
from ptlflow_tpu.utils.cli import (add_common_model_args, load_config,
                                   model_from_args,
                                   parse_with_config)
from ptlflow_tpu.utils.flow_viz import flow_to_rgb
from ptlflow_tpu.utils.io_adapter import IOAdapter

IMG_EXTS = (".png", ".jpg", ".jpeg", ".ppm", ".bmp")
VID_EXTS = (".mp4", ".avi", ".mkv", ".webm")


def _parse_args():
    parser = argparse.ArgumentParser(description=__doc__)
    add_common_model_args(parser)
    parser.add_argument("--input_path", type=str, nargs="+", required=True,
                        help="two images | a folder of frames | a video file"
                             " | a webcam index (e.g. 0)")
    parser.add_argument("--max_frames", type=int, default=None,
                        help="stop a webcam stream after this many frames")
    parser.add_argument("--output_path", type=str, default="outputs/infer")
    parser.add_argument("--flow_format", type=str, default="flo",
                        choices=["flo", "png", "flo5", "npy"])
    parser.add_argument("--gt_path", type=str, default=None,
                        help="optional GT flow to print EPE")
    parser.add_argument("--scale_factor", type=float, default=None)
    parser.add_argument("--max_forward_side", type=int, default=None)
    parser.add_argument("--write_viz", action="store_true", default=True)
    parser.add_argument("--not_write_outputs", action="store_true",
                        help="do not save flow/viz files (reference "
                        "infer.py --not_write_outputs)")
    parser.add_argument("--input_size", type=int, nargs=2, default=[0, 0],
                        help="if larger than zero, resize the input before "
                        "forwarding (reference infer.py --input_size)")
    parser.add_argument("--show", action="store_true",
                        help="display each result on screen")
    parser.add_argument("--max_show_side", type=int, default=1000,
                        help="downscale displayed images whose longest side "
                        "exceeds this")
    parser.add_argument("--auto_forward", action="store_true",
                        help="with --show: advance without waiting for a "
                        "key press")
    parser.add_argument("--bf16", action="store_true",
                        help="bfloat16 inference (analog of the reference "
                        "--fp16)")
    return parse_with_config(parser)


def _imread_checked(path):
    import cv2 as cv

    img = cv.imread(str(path))
    if img is None:
        raise FileNotFoundError(f"cannot read image: {path}")
    return img


def init_input(input_path: List[str], max_frames: int = None):
    """Yield (name, frame) pairs from images / a folder / a video file / a
    webcam index (reference infer.py:234-258: a bare integer opens
    ``cv.VideoCapture(index)`` on the camera device)."""
    import cv2 as cv

    if len(input_path) == 1 and input_path[0].isdigit():
        cap = cv.VideoCapture(int(input_path[0]))
        if not cap.isOpened():
            raise RuntimeError(f"cannot open webcam {input_path[0]}")
        i = 0
        while max_frames is None or i < max_frames:
            ok, frame = cap.read()
            if not ok:
                break
            yield f"{i:06d}", frame
            i += 1
        cap.release()
    elif len(input_path) == 1 and Path(input_path[0]).is_dir():
        frames = sorted(p for p in Path(input_path[0]).iterdir()
                        if p.suffix.lower() in IMG_EXTS)
        for p in frames:
            yield p.stem, _imread_checked(p)
    elif len(input_path) == 1 and \
            Path(input_path[0]).suffix.lower() in VID_EXTS:
        cap = cv.VideoCapture(input_path[0])
        i = 0
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            yield f"{i:06d}", frame
            i += 1
        cap.release()
    else:
        for p in input_path:
            yield Path(p).stem, _imread_checked(p)


def infer(args):
    model, name = model_from_args(args, load_config(args))
    if model.params is None:
        model.init_params()

    if getattr(args, "bf16", False):
        if hasattr(model, "mixed_precision"):
            model.mixed_precision = True
        else:
            import jax.numpy as jnp

            from ptlflow_tpu import nn as _nn

            model.params = _nn.cast_params(model.params, jnp.bfloat16)

    scale = args.scale_factor
    target_size = None
    in_size = getattr(args, "input_size", [0, 0]) or [0, 0]
    if min(in_size) > 0:
        # fixed forward resolution (reference infer.py --input_size)
        target_size = tuple(in_size)
    io_adapter = IOAdapter(model, target_scale_factor=scale,
                           target_size=target_size)

    out_dir = Path(args.output_path)
    out_dir.mkdir(parents=True, exist_ok=True)

    prev_name, prev_frame = None, None
    for cur_name, frame in init_input(args.input_path,
                                      getattr(args, "max_frames", None)):
        if prev_frame is None:
            prev_name, prev_frame = cur_name, frame
            continue
        inputs = io_adapter.prepare_inputs([prev_frame, frame])
        preds = model(inputs)
        preds = io_adapter.unscale(preds)
        flow = np.asarray(preds["flows"])[0, 0]  # (2, H, W)
        flow_hwc = np.transpose(flow, (1, 2, 0))

        stem = f"{prev_name}"
        write = not getattr(args, "not_write_outputs", False)
        if write:
            flow_io.flow_write(out_dir / f"{stem}.{args.flow_format}",
                               flow_hwc)
        viz = None
        if (write and args.write_viz) or getattr(args, "show", False):
            import cv2 as cv

            viz = flow_to_rgb(flow_hwc)[..., ::-1]
            if write and args.write_viz:
                cv.imwrite(str(out_dir / f"{stem}_viz.png"), viz)
        if getattr(args, "show", False):
            import cv2 as cv

            disp = np.concatenate([frame, viz], axis=1)
            side = max(disp.shape[:2])
            if side > args.max_show_side:
                s = args.max_show_side / side
                disp = cv.resize(disp, None, fx=s, fy=s)
            try:
                cv.imshow("ptlflow_tpu infer", disp)
                # --auto_forward: advance without a key press (reference
                # infer.py show_outputs); ESC quits either way
                key = cv.waitKey(1 if args.auto_forward else 0)
                if key == 27:
                    break
            except cv.error as e:  # headless environment
                print(f"--show unavailable: {e}")
                args.show = False

        if args.gt_path is not None:
            gt = flow_io.flow_read(args.gt_path)
            valid = ~np.isnan(gt[..., 0])
            epe = np.linalg.norm(flow_hwc - np.nan_to_num(gt), axis=-1)
            print(f"{stem}: EPE = {epe[valid].mean():.4f}")

        prev_name, prev_frame = cur_name, frame
    print(f"wrote outputs to {out_dir}")


if __name__ == "__main__":
    infer(_parse_args())
