"""Training step builders: optax AdamW + OneCycle, data-parallel jit.

Optimization recipe matches the reference BaseModel.configure_optimizers
(/root/reference/ptlflow/models/base_model/base_model.py:491-565):
AdamW(lr, weight_decay) + OneCycleLR(pct_start=0.05, anneal='linear'),
stepped per optimizer step.

TPU-native structure: one jitted ``train_step(state, batch) -> (state,
metrics)`` whose gradients are computed only for trainable leaves;
batch-norm running stats are threaded through the params tree functionally.
Data parallelism comes from sharding the batch over the mesh 'data' axis and
keeping params replicated — XLA inserts the gradient all-reduce (psum) over
ICI automatically.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import nn
from .mesh import data_sharding, replicated


def onecycle_linear(max_lr: float, total_steps: int,
                    pct_start: float = 0.05) -> optax.Schedule:
    """OneCycleLR with linear anneal (torch semantics: warmup from
    max_lr/div_factor=25 to max_lr, then anneal to max_lr/(25*1e4))."""
    div_factor = 25.0
    final_div_factor = 1e4
    initial = max_lr / div_factor
    final = initial / final_div_factor
    warm = max(int(pct_start * total_steps) - 1, 1)
    return optax.join_schedules([
        optax.linear_schedule(initial, max_lr, warm),
        optax.linear_schedule(max_lr, final, max(total_steps - warm, 1)),
    ], [warm])


def make_optimizer(lr: float = 1e-4, wdecay: float = 1e-4,
                   total_steps: int = 100000, pct_start: float = 0.05,
                   grad_clip: Optional[float] = 1.0,
                   schedule: Optional[optax.Schedule] = None,
                   accumulate_steps: int = 1
                   ) -> optax.GradientTransformation:
    """``accumulate_steps > 1`` wraps the chain in ``optax.MultiSteps`` —
    Lightning's Trainer(accumulate_grad_batches=k) (used by e.g. the
    reference dpflow-train3-sintel.yaml): gradients average over k
    micro-batches and the inner optimizer (and its schedule) advances once
    per k."""
    sched = schedule or onecycle_linear(lr, total_steps, pct_start)
    txs = []
    if grad_clip is not None:
        txs.append(optax.clip_by_global_norm(grad_clip))
    txs.append(optax.adamw(sched, weight_decay=wdecay, eps=1e-8))
    tx = optax.chain(*txs)
    if accumulate_steps and accumulate_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate_steps)
    return tx


@dataclass
class TrainState:
    params: Dict[str, Any]       # trainable leaves
    state: Dict[str, Any]        # non-trainable (BN stats)
    opt_state: Any
    step: jnp.ndarray


def create_train_state(model, tx: optax.GradientTransformation,
                       seed: int = 0) -> TrainState:
    full = model.params if model.params is not None else model.init_params(seed)
    trainable, state = nn.split_trainable(
        full, getattr(model, "frozen_prefixes", ()))
    return TrainState(params=trainable, state=state,
                      opt_state=tx.init(trainable),
                      step=jnp.zeros((), jnp.int32))


jax.tree_util.register_pytree_node(
    TrainState,
    lambda s: ((s.params, s.state, s.opt_state, s.step), None),
    lambda _, c: TrainState(*c))


def build_train_step(model, tx: optax.GradientTransformation,
                     mesh: Optional[Mesh] = None) -> Callable:
    """Returns jitted (state, batch) -> (state, metrics)."""

    def loss_and_updates(trainable, bn_state, batch):
        full = nn.merge_params(nn.tree_copy(trainable),
                               nn.tree_copy(bn_state))
        outputs = model.forward(full, batch, training=True)
        loss = model.loss_fn(outputs, batch)
        _, new_state = nn.split_trainable(
            full, getattr(model, "frozen_prefixes", ()))  # BN stats mutated
        return loss, new_state

    def train_step(state: TrainState, batch) -> Tuple[TrainState, Dict]:
        (loss, new_bn), grads = jax.value_and_grad(
            loss_and_updates, has_aux=True)(state.params, state.state, batch)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        gnorm = optax.global_norm(grads)
        metrics = {"loss": loss, "grad_norm": gnorm}
        return TrainState(new_params, new_bn, new_opt, state.step + 1), metrics

    if mesh is None:
        return jax.jit(train_step)
    rep = replicated(mesh)
    dat = data_sharding(mesh)
    return jax.jit(
        train_step,
        in_shardings=(rep, dat),
        out_shardings=(rep, rep),
    )
