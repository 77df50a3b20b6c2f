"""Small CLI/config helper shared by the entry-point scripts.

The reference uses jsonargparse/LightningCLI
(/root/reference/ptlflow/utils/lightning/ptlflow_cli.py); here the same
surface — ``--model``, ``--ckpt_path``, ``--config`` YAML with
``model.init_args`` / ``data.*`` trees, plus dotted overrides — is provided
on top of argparse (jsonargparse is not available in this environment).
"""

from __future__ import annotations

import argparse
import ast
import sys
from typing import Any, Dict, Optional

import yaml


def parse_value(v: str) -> Any:
    try:
        return ast.literal_eval(v)
    except (ValueError, SyntaxError):
        return v


def add_common_model_args(parser: argparse.ArgumentParser):
    parser.add_argument("--model", type=str, required=False,
                        help="Registered model name")
    parser.add_argument("--ckpt_path", type=str, default=None,
                        help="Checkpoint name (e.g. 'things') or local path")
    parser.add_argument("--config", type=str, default=None,
                        help="YAML config (model.init_args / data trees)")
    parser.add_argument("--set", nargs="*", default=[], metavar="KEY=VALUE",
                        help="Dotted config overrides, e.g. model.iters=12")


def parse_with_config(parser: argparse.ArgumentParser,
                      argv=None) -> argparse.Namespace:
    """Parse CLI args with jsonargparse-style precedence
    (CLI > --config YAML > parser default), as the reference's
    LightningCLI does: top-level scalar keys in the YAML (e.g. ``all``,
    ``output_path``, ``metric_exclude`` in
    configs/results/validate_all.yaml) fill any argument the user left at
    its parser default."""
    args = parser.parse_args(argv)
    if getattr(args, "config", None):
        with open(args.config) as f:
            cfg = yaml.safe_load(f) or {}
        passed = {a.split("=")[0].lstrip("-").replace("-", "_")
                  for a in (argv if argv is not None else sys.argv[1:])
                  if a.startswith("--")}
        for action in parser._actions:
            d = action.dest
            if d in ("help", "config", "set") or d not in cfg:
                continue
            if d not in passed and cfg[d] is not None:
                setattr(args, d, cfg[d])
    return args


def load_config(args: argparse.Namespace) -> Dict[str, Any]:
    cfg: Dict[str, Any] = {}
    if args.config:
        with open(args.config) as f:
            cfg = yaml.safe_load(f) or {}
    for kv in args.set:
        key, _, value = kv.partition("=")
        node = cfg
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = parse_value(value)
    return cfg


def model_from_args(args: argparse.Namespace, cfg: Dict[str, Any]):
    import ptlflow_tpu

    model_cfg = cfg.get("model", {})
    name = args.model or model_cfg.get("name") \
        or str(model_cfg.get("class_path", "")).split(".")[-1]
    if not name:
        raise SystemExit("--model is required (or set model.name in config)")
    init_args = dict(model_cfg.get("init_args", {}))
    ckpt = args.ckpt_path or cfg.get("ckpt_path")
    model = ptlflow_tpu.get_model(name, ckpt_path=ckpt, args=init_args)
    return model, name


def datamodule_from_cfg(cfg: Dict[str, Any], output_stride: int = 8,
                        **overrides):
    from ..data import FlowDataModule

    data_cfg = dict(cfg.get("data", {}))
    data_cfg.update({k: v for k, v in overrides.items() if v is not None})
    data_cfg.setdefault("output_stride", output_stride)
    return FlowDataModule(**data_cfg)
