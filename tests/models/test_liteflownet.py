"""LiteFlowNet forward smoke + strided/dilated correlation parity."""

import importlib.util
import sys

import numpy as np
import torch

import jax.numpy as jnp

import ptlflow_tpu
from ptlflow_tpu.ops.correlation import local_correlation


def test_strided_dilated_correlation_matches_torch_sampler():
    spec = importlib.util.spec_from_file_location(
        "ref_correlation3", "/root/reference/ptlflow/utils/correlation.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_correlation3"] = mod
    spec.loader.exec_module(mod)

    rng = np.random.RandomState(0)
    b, c, h, w = 1, 8, 12, 16
    f1 = rng.randn(b, c, h, w).astype(np.float32)
    f2 = rng.randn(b, c, h, w).astype(np.float32)
    with torch.no_grad():
        ref = mod.iter_spatial_correlation_sample(
            torch.from_numpy(f1), torch.from_numpy(f2), kernel_size=1,
            patch_size=7, stride=2, dilation_patch=2)
        ref = ref.view(b, 49, h // 2, w // 2).permute(0, 2, 3, 1).numpy()
    out = local_correlation(
        jnp.asarray(np.transpose(f1, (0, 2, 3, 1))),
        jnp.asarray(np.transpose(f2, (0, 2, 3, 1))), 3, normalize=False,
        dilation=2, stride=2)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


def test_liteflownet_forward():
    model = ptlflow_tpu.get_model("liteflownet")
    model.init_params()
    rng = np.random.RandomState(1)
    images = rng.rand(1, 2, 3, 128, 160).astype(np.float32)
    out = model({"images": images})
    assert out["flows"].shape == (1, 1, 2, 128, 160)
    assert np.isfinite(np.asarray(out["flows"])).all()
    assert "liteflownet" not in ptlflow_tpu.get_trainable_model_names()
