"""PWCNet: local-correlation oracle parity + forward/loss smoke tests."""

import importlib.util
import sys

import numpy as np
import pytest
import torch

import jax.numpy as jnp

import ptlflow_tpu
from ptlflow_tpu.ops.correlation import local_correlation


@pytest.fixture(scope="module")
def ref_correlation():
    spec = importlib.util.spec_from_file_location(
        "ref_correlation", "/root/reference/ptlflow/utils/correlation.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_correlation"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_local_correlation_matches_torch_sampler(ref_correlation):
    """Shift-based local correlation vs the reference pure-torch
    spatial correlation sampler (correlation.py:35, kernel 1, the config
    every zoo model uses)."""
    rng = np.random.RandomState(0)
    b, c, h, w = 2, 16, 10, 12
    md = 3
    f1 = rng.randn(b, c, h, w).astype(np.float32)
    f2 = rng.randn(b, c, h, w).astype(np.float32)
    with torch.no_grad():
        ref = ref_correlation.iter_spatial_correlation_sample(
            torch.from_numpy(f1), torch.from_numpy(f2), kernel_size=1,
            patch_size=2 * md + 1)
        ref = ref.view(b, -1, h, w).permute(0, 2, 3, 1).numpy()
    out = local_correlation(
        jnp.asarray(np.transpose(f1, (0, 2, 3, 1))),
        jnp.asarray(np.transpose(f2, (0, 2, 3, 1))), md, normalize=False)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


def test_pwcnet_forward_shapes():
    model = ptlflow_tpu.get_model("pwcnet")
    model.init_params()
    rng = np.random.RandomState(1)
    images = rng.rand(1, 2, 3, 128, 128).astype(np.float32)
    out = model({"images": images})
    assert out["flows"].shape == (1, 1, 2, 128, 128)
    assert np.isfinite(np.asarray(out["flows"])).all()


def test_pwcnet_training_and_loss():
    model = ptlflow_tpu.get_model("pwcnet")
    model.init_params()
    rng = np.random.RandomState(2)
    b, h, w = 1, 128, 128
    inputs = {
        "images": jnp.asarray(rng.rand(b, 2, 3, h, w).astype(np.float32)),
        "flows": jnp.asarray(rng.randn(b, 1, 2, h, w).astype(np.float32)),
        "valids": jnp.ones((b, 1, 1, h, w), jnp.float32),
    }
    out = model.forward(model.params, inputs, training=True)
    assert len(out["flow_preds"]) == 5
    # fine-to-coarse resolutions: 1/4 ... 1/64
    assert out["flow_preds"][0].shape == (b, h // 4, w // 4, 2)
    assert out["flow_preds"][-1].shape == (b, h // 64, w // 64, 2)
    loss = model.loss_fn(out, inputs)
    assert np.isfinite(float(loss))


def test_pwc_param_count_close_to_reference():
    """Reference PWC-Net has ~9.37 M params (model_benchmark table)."""
    model = ptlflow_tpu.get_model("pwcnet")
    model.init_params()
    n = model.describe_parameters()
    assert 8.5e6 < n < 10.5e6
