"""Serialize a model for deployment (TPU-native analog of ONNX export).

The reference ships RapidFlow with ONNX/TensorRT export scripts
(/root/reference/ptlflow/models/rapidflow/convert_to_onnx.py:35-140,
onnx_infer.py:34-120).  The JAX deployment path is ``jax.export``: the jitted
forward (weights baked in, like ONNX) is lowered to StableHLO and serialized
to a portable artifact that any later JAX runtime — or IFRT/PJRT C++ serving
stack — can load and run without the Python model definition.

Works for ANY registered model, not just RapidFlow::

    python -m ptlflow_tpu.models.rapidflow.export --model rapidflow_it6 \
        --ckpt_path things --input_size 440 1024 --output_path rf.stablehlo

    from ptlflow_tpu.models.rapidflow.export import load_exported
    fn = load_exported("rf.stablehlo")      # (1,2,3,H,W) float32 -> flow
"""

from __future__ import annotations

from argparse import ArgumentParser
from pathlib import Path
from typing import Optional, Sequence, Tuple

import numpy as np


def export_model(model, input_size: Tuple[int, int],
                 batch_size: int = 1, num_images: int = 2):
    """Return a ``jax.export.Exported`` of the model's forward pass.

    The exported function maps an image stack ``(B, N, 3, H, W)`` float32 in
    [0, 1] (the public NCHW contract) to the final ``(B, 2, H, W)`` flow —
    the same interface as the reference's ONNX graph
    (convert_to_onnx.py:119-139: inputs are the stacked images, output the
    flow).  Weights are embedded as constants.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    if model.params is None:
        model.init_params()
    params = model.params

    def forward(images):
        out = model.forward(params, {"images": images}, training=False)
        flows = out["flows"]
        return flows[:, -1] if flows.ndim == 5 else flows

    h, w = input_size
    spec = jax.ShapeDtypeStruct((batch_size, num_images, 3, h, w),
                                jnp.float32)
    return jexport.export(jax.jit(forward))(spec)


def save_exported(exported, path: str) -> None:
    Path(path).write_bytes(exported.serialize())


def load_exported(path: str):
    """Load a serialized artifact -> callable ``fn(images) -> flow``."""
    from jax import export as jexport

    exported = jexport.deserialize(Path(path).read_bytes())
    return exported.call


def build_parser() -> ArgumentParser:
    parser = ArgumentParser(description=__doc__)
    parser.add_argument("--model", type=str, default="rapidflow")
    parser.add_argument("--ckpt_path", type=str, default=None)
    parser.add_argument("--input_size", type=int, nargs=2,
                        default=(440, 1024), help="(H, W); padded to the "
                        "model's output stride")
    parser.add_argument("--batch_size", type=int, default=1)
    parser.add_argument("--output_path", type=str, default=None)
    parser.add_argument("--iters", type=int, default=None,
                        help="override recurrent iteration count")
    return parser


def main(argv: Optional[Sequence[str]] = None) -> None:
    import ptlflow_tpu
    from ptlflow_tpu.data.datamodule import make_divisible

    args = build_parser().parse_args(argv)
    margs = {"iters": args.iters} if args.iters is not None else None
    model = ptlflow_tpu.get_model(args.model, ckpt_path=args.ckpt_path,
                                  args=margs)
    stride = getattr(model, "output_stride", 8)
    h = make_divisible(args.input_size[0], stride)
    w = make_divisible(args.input_size[1], stride)
    exported = export_model(model, (h, w), batch_size=args.batch_size)
    out = args.output_path or f"{args.model}_{h}x{w}.stablehlo"
    save_exported(exported, out)
    print(f"Exported {args.model} at input (B={args.batch_size}, 2, 3, "
          f"{h}, {w}) to {out} "
          f"({Path(out).stat().st_size / 1e6:.1f} MB)")

    fn = load_exported(out)
    images = np.zeros((args.batch_size, 2, 3, h, w), np.float32)
    flow = np.asarray(fn(images))
    print(f"Verified: output flow shape {flow.shape}, "
          f"finite={np.isfinite(flow).all()}")


if __name__ == "__main__":
    main()
