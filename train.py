"""Training entry point: data-parallel jit over the device mesh.

CLI parity with /root/reference/train.py (model + data + trainer trees,
YAML configs, checkpointing last/best) with a TPU-native runtime: one jitted
train step (AdamW + OneCycle, grad clip), batch sharded over the mesh 'data'
axis, orbax checkpoints, periodic validation with the headline metric per
dataset (reference BaseModel.DATASET_MAIN_METRIC).
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import numpy as np

import ptlflow_tpu
from ptlflow_tpu import nn
from ptlflow_tpu.parallel import (
    make_mesh, make_optimizer, TrainState, create_train_state,
    build_train_step, shard_batch,
)
from ptlflow_tpu.utils.checkpoint_manager import CheckpointManager
from ptlflow_tpu.utils.ckpt import save_orbax
from ptlflow_tpu.utils.cli import (add_common_model_args, datamodule_from_cfg,
                                   load_config, model_from_args)
from ptlflow_tpu.utils.flow_metrics import FlowMetrics

# per-dataset headline metric (reference base_model.py:40-59)
DATASET_MAIN_METRIC = {
    "chairs": "epe", "chairs2": "epe", "things": "epe", "sintel": "epe",
    "kitti": "flall", "hd1k": "flall", "spring": "px1", "viper": "wauc",
    "autoflow": "epe", "kubric": "epe", "middlebury": "epe", "monkaa": "epe",
    "tartanair": "epe",
}

# metric direction: px1 (fraction of pixels within 1px) and wauc are
# higher-is-better; epe/flall are lower-is-better.
METRIC_MODE = {"epe": "min", "flall": "min", "px1": "max", "wauc": "max"}


def _parse_args():
    parser = argparse.ArgumentParser(description=__doc__)
    add_common_model_args(parser)
    parser.add_argument("--train_dataset", type=str, default=None)
    parser.add_argument("--val_dataset", type=str, default=None)
    parser.add_argument("--lr", type=float, default=None)
    parser.add_argument("--wdecay", type=float, default=None)
    parser.add_argument("--max_steps", type=int, default=None)
    parser.add_argument("--max_epochs", type=int, default=None,
                        help="used when --max_steps is unset: max_steps = "
                        "epochs * ceil(steps_per_epoch / n_devices) "
                        "(reference base_model.py:507-539)")
    parser.add_argument("--train_batch_size", type=int, default=None)
    parser.add_argument("--train_crop_size", type=int, nargs=2, default=None)
    parser.add_argument("--train_num_workers", type=int, default=None)
    parser.add_argument("--grad_clip", "--gradient_clip_val",
                        dest="grad_clip", type=float, default=None,
                        help="global-norm gradient clip (Lightning "
                        "Trainer.gradient_clip_val; falls back to the "
                        "config's trainer.gradient_clip_val, then 1.0)")
    parser.add_argument("--accumulate_grad_batches", type=int, default=None,
                        help="average gradients over k micro-batches per "
                        "optimizer step (Lightning "
                        "Trainer.accumulate_grad_batches; used by e.g. the "
                        "dpflow sintel stage)")
    parser.add_argument("--resume", action="store_true",
                        help="auto-resume from <ckpt_dir>/<model>/last_state "
                        "(full optimizer+step state), falling back to HPC "
                        "checkpoints then weights-only 'last' — the "
                        "reference connector's resume priority "
                        "(ptlflow_checkpoint_connector.py:46-52)")
    parser.add_argument("--resume_ckpt", type=str, default=None,
                        help="explicit checkpoint (orbax dir) to resume "
                        "from; weight-only checkpoints are tolerated "
                        "(reference ptlflow_trainer.py:402-408)")
    parser.add_argument("--val_every_n_steps", type=int, default=1000)
    parser.add_argument("--log_every_n_steps", type=int, default=100)
    parser.add_argument("--ckpt_dir", type=str, default="ptlflow_checkpoints")
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--n_devices", type=int, default=None)
    parser.add_argument("--num_nodes", type=int, default=1,
                        help="hybrid (node, data) mesh: leading axis on DCN "
                        "(reference Trainer(num_nodes=...)); >1 calls "
                        "jax.distributed.initialize on startup")
    parser.add_argument("--coordinator_address", type=str, default=None,
                        help="host:port of process 0 for multi-host "
                        "non-TPU-pod runs (TPU pods auto-discover)")
    parser.add_argument("--process_id", type=int, default=None,
                        help="this process's rank for multi-host "
                        "non-TPU-pod runs")
    parser.add_argument("--detect_anomaly", action="store_true",
                        help="jax_debug_nans: fail fast on NaN/inf in any "
                        "jitted computation (reference "
                        "Trainer(detect_anomaly=...), ptlflow_trainer.py:103)")
    parser.add_argument("--loggers", type=str, nargs="*",
                        default=["tensorboard"],
                        choices=["tensorboard", "wandb", "comet", "neptune",
                                 "swanlab", "none"],
                        help="scalar/image logging backends (the 5 the "
                        "reference LoggerCallback dispatches to, "
                        "callbacks/logger.py:56-131); missing packages are "
                        "skipped with a notice")
    parser.add_argument("--log_num_images", type=int, default=5,
                        help="validation flow-grid images logged per "
                        "validation run (reference LoggerCallback "
                        "num_images)")
    return parser.parse_args()


def run_validation(model, state, dm, logger=None, step=0, num_images=5):
    import numpy as np

    import jax.numpy as jnp

    from ptlflow_tpu.utils.logger import ImageSampler, make_flow_grid

    full = nn.merge_params(state.params, state.state)
    results = {}
    for name, loader in zip(dm.val_dataset_names, dm.val_dataloader()):
        metrics = FlowMetrics()
        sampler = ImageSampler(num_images=num_images,
                               epoch_size=max(len(loader), 1)) \
            if logger is not None else None
        for i, batch in enumerate(loader):
            inputs = {"images": jnp.asarray(batch["images"])}
            preds = model.forward(full, inputs, training=False)
            targets = {"flows": jnp.asarray(batch["flows"])}
            if "valids" in batch:
                targets["valids"] = jnp.asarray(batch["valids"])
            metrics.update({"flows": preds["flows"]}, targets)
            if sampler is not None and sampler.should_log(i):
                img = np.asarray(batch["images"][0, 0]).transpose(1, 2, 0)
                pred = np.asarray(preds["flows"][0, 0]).transpose(1, 2, 0)
                gt = np.asarray(batch["flows"][0, 0]).transpose(1, 2, 0)
                grid = make_flow_grid(img, pred, gt)
                logger.log_image(f"val/{name}/{i}", grid, step)
        results[name] = metrics.compute()
    return results


def main():
    args = _parse_args()
    if args.detect_anomaly:
        import jax

        jax.config.update("jax_debug_nans", True)
    cfg = load_config(args)
    model, model_name = model_from_args(args, cfg)
    if model.params is None:
        model.init_params(args.seed)
    assert model.loss_fn is not None, \
        f"model {model_name} has no loss function and cannot be trained"

    train_cfg = cfg.get("trainer", {})
    lr = args.lr or cfg.get("model", {}).get("init_args", {}).get("lr") or 1e-4
    wdecay = args.wdecay or 1e-4
    max_steps = args.max_steps or train_cfg.get("max_steps")

    dm = datamodule_from_cfg(
        cfg, output_stride=model.output_stride,
        train_dataset=args.train_dataset, val_dataset=args.val_dataset,
        train_batch_size=args.train_batch_size,
        train_crop_size=tuple(args.train_crop_size)
        if args.train_crop_size else None,
        train_num_workers=args.train_num_workers)
    dm.setup()

    if args.num_nodes > 1:
        from ptlflow_tpu.parallel import init_distributed

        init_distributed(num_nodes=args.num_nodes,
                         coordinator_address=getattr(
                             args, "coordinator_address", None),
                         process_id=getattr(args, "process_id", None))
    mesh = make_mesh(args.n_devices, num_nodes=args.num_nodes)
    if not max_steps:
        # epochs -> steps conversion, divided across the data-parallel mesh
        # (reference base_model.py:507-539)
        max_epochs = args.max_epochs or train_cfg.get("max_epochs")
        if max_epochs:
            import math as _math

            steps_per_epoch = max(
                1, _math.ceil(len(dm.train_data)
                              / (dm.train_batch_size or 1)))
            n_dev = len(mesh.devices.flat)
            max_steps = max_epochs * _math.ceil(steps_per_epoch / n_dev)
            print(f"--max_steps unset: using {max_steps} "
                  f"({max_epochs} epochs * {steps_per_epoch} steps "
                  f"/ {n_dev} devices)")
        else:
            max_steps = 100000
    accum = (args.accumulate_grad_batches
             or train_cfg.get("accumulate_grad_batches") or 1)
    grad_clip = args.grad_clip
    if grad_clip is None:
        grad_clip = train_cfg.get("gradient_clip_val", 1.0)
    if not grad_clip:  # 0 disables clipping (Lightning semantics)
        grad_clip = None
    tx = make_optimizer(lr=lr, wdecay=wdecay, total_steps=max_steps,
                        grad_clip=grad_clip, accumulate_steps=accum)
    if accum > 1:
        print(f"gradient accumulation: {accum} micro-batches per "
              f"optimizer step")
    state = create_train_state(model, tx, seed=args.seed)
    step_fn = build_train_step(model, tx, mesh=mesh)

    ckpt_dir = Path(args.ckpt_dir) / model_name
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    main_name = dm.val_dataset_names[0] if dm.val_dataset_names else ""
    main_key = next((v for k, v in DATASET_MAIN_METRIC.items()
                     if k in main_name), "epe")
    main_mode = METRIC_MODE.get(main_key, "min")
    ckpt_manager = CheckpointManager(str(ckpt_dir), top_k=1,
                                     monitor=f"val/{main_key}",
                                     mode=main_mode)
    best_val = float("inf") if main_mode == "min" else -float("inf")

    start_step = 0
    if args.resume or args.resume_ckpt:
        import os as _os

        import orbax.checkpoint as ocp

        from ptlflow_tpu.utils.ckpt import load_orbax
        rpath = args.resume_ckpt
        if rpath is None:
            cand = ckpt_dir / "last_state"
            rpath = (str(cand) if cand.exists()
                     else ckpt_manager.resolve_resume_path())
        if rpath is None:
            print("--resume: no checkpoint found; starting fresh")
        else:
            tpl = {"params": state.params, "state": state.state,
                   "opt_state": state.opt_state, "step": state.step}
            try:
                with ocp.StandardCheckpointer() as ckptr:
                    restored = ckptr.restore(_os.path.abspath(rpath), tpl)
                state = TrainState(restored["params"], restored["state"],
                                   restored["opt_state"], restored["step"])
                start_step = int(restored["step"])
                print(f"resumed training state from {rpath} "
                      f"at step {start_step}")
            except Exception:
                # weights-only checkpoint: restore params, keep a fresh
                # optimizer (reference ptlflow_trainer.py:402-408)
                full = load_orbax(rpath)
                trainable, bn = nn.split_trainable(
                    full, getattr(model, "frozen_prefixes", ()))
                state = TrainState(trainable, bn, state.opt_state,
                                   state.step)
                print(f"resumed weights only from {rpath}")

    from ptlflow_tpu.utils.logger import MultiLogger
    backends = [b for b in args.loggers if b != "none"]
    logger = MultiLogger(str(ckpt_dir / "logs"), backends=backends,
                         project="ptlflow_tpu") if backends else None

    step = start_step
    t0 = time.perf_counter()
    print(f"training {model_name}: {max_steps} steps, lr={lr}, "
          f"devices={len(mesh.devices.flat)}")
    with mesh:
        while step < max_steps:
            for batch in dm.train_dataloader():
                if step >= max_steps:
                    break
                device_batch = shard_batch({
                    k: v for k, v in batch.items() if k != "meta"}, mesh)
                state, metrics = step_fn(state, device_batch)
                step += 1
                if step % args.log_every_n_steps == 0:
                    loss = float(metrics["loss"])
                    dt = time.perf_counter() - t0
                    print(f"step {step}/{max_steps} loss={loss:.4f} "
                          f"({step / dt:.2f} it/s)")
                    if logger is not None:
                        logger.log_scalars(
                            {"train/loss": loss,
                             "train/it_per_s": step / dt}, step)
                if args.val_dataset and step % args.val_every_n_steps == 0:
                    results = run_validation(model, state, dm, logger=logger,
                                             step=step,
                                             num_images=args.log_num_images)
                    for name, m in results.items():
                        print(f"  val {name}: epe={m.get('epe', -1):.4f}")
                        if logger is not None:
                            logger.log_scalars(
                                {f"val/{name}/{k}": float(v)
                                 for k, v in m.items()}, step)
                    default = (float("inf") if main_mode == "min"
                               else -float("inf"))
                    score = results[main_name].get(main_key, default)
                    ckpt_manager.save_step(
                        nn.merge_params(state.params, state.state), step,
                        {f"val/{main_key}": score})
                    improved = (score < best_val if main_mode == "min"
                                else score > best_val)
                    if improved:
                        best_val = score
                        print(f"  new best {main_key}={score:.4f} -> saved")
                    # full resumable state (optimizer + step), refreshed at
                    # every validation point
                    save_orbax(str(ckpt_dir / "last_state"),
                               {"params": state.params, "state": state.state,
                                "opt_state": state.opt_state,
                                "step": state.step})

    if logger is not None:
        logger.flush()
        logger.close()
    save_orbax(str(ckpt_dir / "last"), nn.merge_params(state.params,
                                                       state.state))
    save_orbax(str(ckpt_dir / "last_state"),
               {"params": state.params, "state": state.state,
                "opt_state": state.opt_state, "step": state.step})
    with open(ckpt_dir / "train_info.json", "w") as f:
        json.dump({"model": model_name, "steps": step, "lr": lr,
                   "best_val": best_val}, f)
    print(f"done; checkpoints in {ckpt_dir}")


if __name__ == "__main__":
    main()
