"""NeuFlow forward/loss smoke + param sanity (reference: 3.85 M params)."""

import numpy as np

import jax.numpy as jnp

import ptlflow_tpu


def test_neuflow_forward_and_loss():
    model = ptlflow_tpu.get_model("neuflow")
    model.init_params()
    rng = np.random.RandomState(0)
    b, h, w = 1, 128, 160
    images = rng.rand(b, 2, 3, h, w).astype(np.float32)
    out = model({"images": images})
    assert out["flows"].shape == (b, 1, 2, h, w)
    assert np.isfinite(np.asarray(out["flows"])).all()

    inputs = {
        "images": jnp.asarray(images),
        "flows": jnp.asarray(rng.randn(b, 1, 2, h, w).astype(np.float32)),
        "valids": jnp.ones((b, 1, 1, h, w), jnp.float32),
    }
    tr = model.forward(model.params, inputs, training=True)
    assert len(tr["flow_preds"]) == 2
    assert np.isfinite(float(model.loss_fn(tr, inputs)))


def test_neuflow_param_count():
    model = ptlflow_tpu.get_model("neuflow")
    model.init_params()
    n = model.describe_parameters()
    # reference model_benchmark: 3.85 M
    assert 3.2e6 < n < 4.5e6
