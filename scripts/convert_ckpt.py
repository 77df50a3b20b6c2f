"""Convert a PyTorch PTLFlow checkpoint into a native orbax checkpoint.

Counterpart of the reference's named-checkpoint resolution + restore path
(/root/reference/ptlflow/__init__.py:201-285): resolves a local ``.ckpt``
path or a named pretrained checkpoint (downloaded through the torch-hub
cache with hash verification), converts the torch ``state_dict`` into the
model's JAX param pytree via ``Module.from_torch`` (strict by default, so a
layout mismatch fails loudly instead of silently), and writes an orbax
checkpoint plus a ``hparams.json`` sidecar carrying the extra
hyper-parameters some models need at inference (``train_size``,
``train_avg_length``, ``extra_params`` — reference ``restore_model``,
ptlflow/__init__.py:254-285).

Usage::

    python scripts/convert_ckpt.py --model raft --ckpt things \
        --output_path outputs/ckpt/raft_things
    python scripts/convert_ckpt.py --model raft --ckpt /path/to/file.ckpt \
        --output_path outputs/ckpt/raft_custom --verify
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _parse_args(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model", type=str, required=True,
                        help="registered model name")
    parser.add_argument("--ckpt", type=str, required=True,
                        help="local .ckpt path or named pretrained ckpt")
    parser.add_argument("--output_path", type=str, required=True,
                        help="output orbax checkpoint directory")
    parser.add_argument("--no_strict", action="store_true",
                        help="tolerate missing/extra torch keys")
    parser.add_argument("--verify", action="store_true",
                        help="after writing, reload the orbax checkpoint and "
                             "check every leaf is bit-identical")
    return parser.parse_args(argv)


def convert(model_name: str, ckpt: str, output_path: str,
            strict: bool = True, verify: bool = False) -> dict:
    import numpy as np

    import ptlflow_tpu
    from ptlflow_tpu.utils.ckpt import (load_torch_state_dict, load_orbax,
                                        resolve_checkpoint_path, save_orbax)

    model = ptlflow_tpu.get_model(model_name)
    path = resolve_checkpoint_path(model, ckpt)
    flat, hparams = load_torch_state_dict(path)
    params = model.from_torch(flat, strict=strict)

    out = Path(output_path)
    out.parent.mkdir(parents=True, exist_ok=True)
    save_orbax(str(out), params)

    sidecar = {}
    for key in ("train_size", "train_avg_length", "extra_params"):
        if hparams.get(key) is not None:
            val = hparams[key]
            sidecar[key] = list(val) if key == "train_size" else val
    if sidecar:
        (out / "hparams.json").write_text(json.dumps(sidecar, default=str))

    if verify:
        reloaded = load_orbax(str(out))
        import jax

        flat_a = jax.tree_util.tree_leaves_with_path(params)
        flat_b = dict(jax.tree_util.tree_leaves_with_path(reloaded))
        # tree_leaves_with_path returns a list of (path, leaf) pairs
        flat_b = {p: l for p, l in jax.tree_util.tree_leaves_with_path(reloaded)}
        for p, leaf in flat_a:
            other = flat_b[p]
            if not np.array_equal(np.asarray(leaf), np.asarray(other)):
                raise AssertionError(f"verify failed at {p}")
        print(f"verified {len(flat_a)} arrays bit-identical")

    n = sum(np.asarray(l).size
            for l in __import__("jax").tree_util.tree_leaves(params))
    print(f"wrote {out} ({n / 1e6:.2f} M params"
          + (f", sidecar {sorted(sidecar)}" if sidecar else "") + ")")
    return {"params": n, "sidecar": sidecar}


if __name__ == "__main__":
    a = _parse_args()
    convert(a.model, a.ckpt, a.output_path, strict=not a.no_strict,
            verify=a.verify)
