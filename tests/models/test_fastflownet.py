"""FastFlowNet parity vs the reference torch model (read-only oracle).

The reference model file (/root/reference/ptlflow/models/fastflownet/
fastflownet.py) is self-contained torch apart from the registry/BaseModel
imports, which are stubbed here; the full forward is compared through the
generic ``from_torch`` state-dict walk.
"""

import importlib.util
import sys
import types

import numpy as np
import pytest
import torch

import jax.numpy as jnp

import ptlflow_tpu

REF = "/root/reference/ptlflow/models/fastflownet"


@pytest.fixture(scope="module")
def ref_mod():
    # stub ptlflow registry/BaseModel so the reference file imports clean
    reg = types.ModuleType("ptlflow.utils.registry")
    reg.register_model = lambda c: c
    reg.trainable = lambda c: c
    reg.ptlflow_trained = lambda c: c
    ptlflow_pkg = types.ModuleType("ptlflow")
    utils_pkg = types.ModuleType("ptlflow.utils")
    sys.modules.setdefault("ptlflow", ptlflow_pkg)
    sys.modules["ptlflow.utils"] = utils_pkg
    sys.modules["ptlflow.utils.registry"] = reg

    corr_mod = types.ModuleType("ptlflow.utils.correlation")

    class IterSpatialCorrelationSampler(torch.nn.Module):
        """Literal torch transcription of the sampler call used by
        fastflownet (kernel 1, patch 2*md+1)."""

        def __init__(self, kernel_size=1, patch_size=9, stride=1,
                     padding=0, dilation=1, dilation_patch=1):
            super().__init__()
            self.patch_size = patch_size

        def forward(self, f1, f2):
            d = self.patch_size // 2
            b, c, h, w = f1.shape
            f2p = torch.nn.functional.pad(f2, (d, d, d, d))
            outs = []
            for dy in range(self.patch_size):
                for dx in range(self.patch_size):
                    outs.append((f1 * f2p[:, :, dy:dy + h, dx:dx + w])
                                .sum(dim=1))
            return torch.stack(outs, 1).view(b, self.patch_size,
                                             self.patch_size, h, w)

    corr_mod.IterSpatialCorrelationSampler = IterSpatialCorrelationSampler
    sys.modules["ptlflow.utils.correlation"] = corr_mod

    base_mod = types.ModuleType("refffn_base")

    class _FakeBase(torch.nn.Module):
        def __init__(self, **kw):
            super().__init__()

        def preprocess_images(self, images, **kw):
            return images, None

        def postprocess_predictions(self, preds, resizer, is_flow=False):
            return preds

    base_mod.BaseModel = _FakeBase
    parent = types.ModuleType("refffn")
    parent.__path__ = []
    bm_pkg = types.ModuleType("refffn.base_model")
    bm_pkg.__path__ = []
    bm_mod = types.ModuleType("refffn.base_model.base_model")
    bm_mod.BaseModel = _FakeBase
    sys.modules["refffn"] = parent
    sys.modules["refffn.base_model"] = bm_pkg
    sys.modules["refffn.base_model.base_model"] = bm_mod

    fn_pkg = types.ModuleType("refffn.flownet")
    fn_pkg.__path__ = []
    fn_losses = types.ModuleType("refffn.flownet.losses")

    class MultiScale:  # loss stub: structural import only
        def __init__(self, *a, **kw):
            pass

    fn_losses.MultiScale = MultiScale
    sys.modules["refffn.flownet"] = fn_pkg
    sys.modules["refffn.flownet.losses"] = fn_losses

    # load inside a fake subpackage so ``..base_model`` etc. resolve
    mpkg = types.ModuleType("refffn.fastflownet")
    mpkg.__path__ = [REF]
    sys.modules["refffn.fastflownet"] = mpkg
    spec = importlib.util.spec_from_file_location(
        "refffn.fastflownet.fastflownet", f"{REF}/fastflownet.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["refffn.fastflownet.fastflownet"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_fastflownet_decoder_parity(ref_mod):
    torch.manual_seed(0)
    t_dec = ref_mod.Decoder(87, groups=3).eval()
    from ptlflow_tpu.models.fastflownet.fastflownet import Decoder as JDec

    j_dec = JDec(87, groups=3)
    params = j_dec.from_torch(
        {k: v.detach().numpy() for k, v in t_dec.state_dict().items()})
    rng = np.random.RandomState(0)
    x = rng.randn(2, 87, 12, 16).astype(np.float32)
    with torch.no_grad():
        t_out = t_dec(torch.from_numpy(x))
    j_out = j_dec(params, jnp.moveaxis(jnp.asarray(x), 1, -1))
    np.testing.assert_allclose(np.asarray(jnp.moveaxis(j_out, -1, 1)),
                               t_out.numpy(), atol=2e-5)


def test_fastflownet_forward_shapes():
    model = ptlflow_tpu.get_model("fastflownet")
    model.init_params()
    rng = np.random.RandomState(1)
    images = jnp.asarray(rng.rand(1, 2, 3, 128, 192).astype(np.float32))
    out = model.forward(model.params, {"images": images}, training=False)
    assert out["flows"].shape == (1, 1, 2, 128, 192)
    assert bool(jnp.all(jnp.isfinite(out["flows"])))
