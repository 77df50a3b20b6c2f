"""FlowNet family: dilated correlation oracle parity + forward smoke tests
for every variant (mirrors reference test_models.py forward sweep)."""

import importlib.util
import sys

import numpy as np
import pytest
import torch

import jax.numpy as jnp

import ptlflow_tpu
from ptlflow_tpu.ops.correlation import local_correlation


def test_dilated_correlation_matches_torch_sampler():
    spec = importlib.util.spec_from_file_location(
        "ref_correlation2", "/root/reference/ptlflow/utils/correlation.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_correlation2"] = mod
    spec.loader.exec_module(mod)

    rng = np.random.RandomState(0)
    b, c, h, w = 1, 8, 12, 14
    f1 = rng.randn(b, c, h, w).astype(np.float32)
    f2 = rng.randn(b, c, h, w).astype(np.float32)
    with torch.no_grad():
        ref = mod.iter_spatial_correlation_sample(
            torch.from_numpy(f1), torch.from_numpy(f2), kernel_size=1,
            patch_size=21, dilation_patch=2)
        ref = ref.view(b, -1, h, w).permute(0, 2, 3, 1).numpy() / c
    out = local_correlation(
        jnp.asarray(np.transpose(f1, (0, 2, 3, 1))),
        jnp.asarray(np.transpose(f2, (0, 2, 3, 1))), 10, normalize=False,
        dilation=2) / c
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


@pytest.mark.parametrize("name,n_preds", [
    ("flownets", 5), ("flownetc", 5), ("flownetsd", 5),
])
def test_single_flownets_forward(name, n_preds):
    model = ptlflow_tpu.get_model(name)
    model.init_params()
    rng = np.random.RandomState(1)
    images = rng.rand(1, 2, 3, 128, 128).astype(np.float32)
    out = model({"images": images})
    assert out["flows"].shape == (1, 1, 2, 128, 128)
    assert np.isfinite(np.asarray(out["flows"])).all()

    inputs = {
        "images": jnp.asarray(images),
        "flows": jnp.asarray(rng.randn(1, 1, 2, 128, 128).astype(np.float32)),
        "valids": jnp.ones((1, 1, 1, 128, 128), jnp.float32),
    }
    tr = model.forward(model.params, inputs, training=True)
    assert len(tr["flow_preds"]) == n_preds
    assert np.isfinite(float(model.loss_fn(tr, inputs)))


@pytest.mark.parametrize("name", ["flownetcs", "flownetcss", "flownet2"])
def test_stacked_flownets_forward(name):
    model = ptlflow_tpu.get_model(name)
    model.init_params()
    rng = np.random.RandomState(2)
    images = rng.rand(1, 2, 3, 128, 128).astype(np.float32)
    out = model({"images": images})
    assert out["flows"].shape == (1, 1, 2, 128, 128)
    assert np.isfinite(np.asarray(out["flows"])).all()
