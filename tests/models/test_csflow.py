"""CSFlow: strip corr parity vs reference + forward smoke."""

import importlib.util
import sys

import numpy as np
import pytest
import torch

import jax.numpy as jnp

import ptlflow_tpu
from ptlflow_tpu.models.csflow.csflow import StripCrossCorrMap_v2


@pytest.fixture(scope="module")
def ref_csflow():
    # csflow.py imports ptlflow registry/BaseModel — extract only the
    # torch-only classes by executing with stub modules
    import types

    stub = types.ModuleType("ptlflow.utils.registry")
    stub.register_model = lambda c: c
    stub.trainable = lambda c: c
    stub_base = types.ModuleType("ptlflow.models.base_model.base_model")

    class _FakeBase(torch.nn.Module):
        def __init__(self, *a, **k):
            super().__init__()

    stub_base.BaseModel = _FakeBase
    stub_utils = types.ModuleType("ptlflow.utils.utils")
    stub_utils.forward_interpolate_batch = lambda x: x
    pk = types.ModuleType("ptlflow")
    pk.utils = types.ModuleType("ptlflow.utils")
    pk.models = types.ModuleType("ptlflow.models")
    pk.models.base_model = types.ModuleType("ptlflow.models.base_model")
    for name, mod in [
        ("ptlflow", pk), ("ptlflow.utils", pk.utils),
        ("ptlflow.utils.registry", stub),
        ("ptlflow.utils.utils", stub_utils),
        ("ptlflow.models", pk.models),
        ("ptlflow.models.base_model", pk.models.base_model),
        ("ptlflow.models.base_model.base_model", stub_base),
    ]:
        sys.modules[name] = mod
    pk.models.csflow = types.ModuleType("ptlflow.models.csflow")
    sys.modules["ptlflow.models.csflow"] = pk.models.csflow
    spec = importlib.util.spec_from_file_location(
        "ptlflow.models.csflow.csflow",
        "/root/reference/ptlflow/models/csflow/csflow.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ptlflow.models.csflow.csflow"] = mod
    spec.loader.exec_module(mod)
    yield mod
    for name in list(sys.modules):
        if name.startswith("ptlflow.") or name == "ptlflow":
            if not name.startswith("ptlflow_tpu"):
                del sys.modules[name]


def test_strip_corr_parity(ref_csflow):
    torch.manual_seed(0)
    t_blk = ref_csflow.StripCrossCorrMap_v2(in_chan=32, out_chan=32).eval()
    j_blk = StripCrossCorrMap_v2(in_chan=32, out_chan=32)
    params = j_blk.from_torch(
        {k: v.detach().numpy() for k, v in t_blk.state_dict().items()})
    rng = np.random.RandomState(0)
    f1 = rng.randn(1, 32, 6, 8).astype(np.float32)
    f2 = rng.randn(1, 32, 6, 8).astype(np.float32)
    with torch.no_grad():
        t_strip, t_w, t_h = t_blk([torch.from_numpy(f1),
                                   torch.from_numpy(f2)])
    j_strip, j_w, j_h = j_blk(
        params, jnp.asarray(np.transpose(f1, (0, 2, 3, 1))),
        jnp.asarray(np.transpose(f2, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.asarray(j_w), t_w.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_h), t_h.numpy(), atol=1e-4)
    # strip map layout: (b, h, w, 1, h, w) channel axis at dim 3
    np.testing.assert_allclose(
        np.asarray(j_strip).reshape(t_strip.shape), t_strip.numpy(),
        atol=1e-4)


def test_csflow_forward():
    model = ptlflow_tpu.get_model("csflow", args={"iters": 2})
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
    assert tr["flow_preds"].shape[0] == 3  # init + 2 iters
    assert np.isfinite(float(model.loss_fn(tr, inputs)))
