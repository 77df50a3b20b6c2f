"""Data-parallel training step over the virtual 8-device CPU mesh."""

import numpy as np

import jax
import jax.numpy as jnp

import ptlflow_tpu
from ptlflow_tpu.parallel import (
    make_mesh, make_optimizer, create_train_state, build_train_step,
    shard_batch, onecycle_linear,
)


def _tiny_batch(b, h, w, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "images": jnp.asarray(rng.rand(b, 2, 3, h, w).astype(np.float32)),
        "flows": jnp.asarray(rng.randn(b, 1, 2, h, w).astype(np.float32)),
        "valids": jnp.ones((b, 1, 1, h, w), jnp.float32),
    }


def test_onecycle_schedule_shape():
    sched = onecycle_linear(4e-4, 100)
    assert float(sched(0)) < float(sched(4))
    assert abs(float(sched(4)) - 4e-4) < 1e-9
    assert float(sched(99)) < 1e-5


def test_single_device_train_step_decreases_loss():
    model = ptlflow_tpu.get_model("raft_small", args={"iters": 2})
    model.init_params()
    tx = make_optimizer(lr=1e-4, total_steps=50)
    state = create_train_state(model, tx)
    step = build_train_step(model, tx)
    batch = _tiny_batch(1, 128, 128)
    losses = []
    for _ in range(3):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert int(state.step) == 3


def test_data_parallel_train_step_8_devices():
    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
    mesh = make_mesh(8)
    model = ptlflow_tpu.get_model("raft_small", args={"iters": 2})
    model.init_params()
    tx = make_optimizer(lr=1e-4, total_steps=50)
    state = create_train_state(model, tx)
    step = build_train_step(model, tx, mesh=mesh)
    batch = shard_batch(_tiny_batch(8, 128, 128), mesh)
    with mesh:
        state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))

    # dp-equivalence: same per-example grads as single-device on same batch
    # (loss is mean over batch, so 8-way dp must match 1-device 8-batch).
    model2 = ptlflow_tpu.get_model("raft_small", args={"iters": 2})
    model2.params = jax.tree_util.tree_map(lambda x: x, model.params)
    state2 = create_train_state(model2, tx)
    step2 = build_train_step(model2, tx)
    state2, metrics2 = step2(state2, _tiny_batch(8, 128, 128))
    np.testing.assert_allclose(float(metrics["loss"]),
                               float(metrics2["loss"]), rtol=2e-5)


def test_hybrid_node_data_mesh_train_step():
    """2 nodes x 4 devices hybrid mesh (reference Trainer(num_nodes=...)):
    gradients psum hierarchically over ('node', 'data')."""
    assert len(jax.devices()) == 8
    mesh = make_mesh(8, num_nodes=2)
    assert mesh.axis_names == ("node", "data")
    model = ptlflow_tpu.get_model("raft_small", args={"iters": 2})
    model.init_params()
    tx = make_optimizer(lr=1e-4, total_steps=50)
    state = create_train_state(model, tx)
    step = build_train_step(model, tx, mesh=mesh)
    batch = shard_batch(_tiny_batch(8, 128, 128), mesh)
    with mesh:
        state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
