"""HD3 parity vs reference torch modules (read-only oracle imports).

Covers the pieces with nontrivial math: hd3_ops (_prob2flow — the dense 4D
probability → flow decoding, flow_warp's hard validity mask, vector2density)
and the HDA decoder block.  Reference: /root/reference/ptlflow/models/hd3/
{hd3_ops.py,decoder.py}.
"""

import importlib.util
import sys

import numpy as np
import pytest
import torch

import jax.numpy as jnp

import ptlflow_tpu
from ptlflow_tpu.models.hd3.hd3 import (HDADecoder as JHDADecoder,
                                        density2vector as j_density2vector,
                                        hd3_flow_warp, vector2density
                                        as j_vector2density)

REF = "/root/reference/ptlflow/models/hd3"


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ops():
    return _load("ref_hd3_ops", f"{REF}/hd3_ops.py")


@pytest.fixture(scope="module")
def ref_decoder():
    return _load("ref_hd3_decoder", f"{REF}/decoder.py")


def test_prob2flow_parity(ops):
    rng = np.random.RandomState(0)
    prob = rng.randn(2, 81, 8, 10).astype(np.float32)
    t = ops._prob2flow(torch.from_numpy(prob), normalize=True)
    j = j_density2vector(jnp.moveaxis(jnp.asarray(prob), 1, -1),
                         normalize=True)
    np.testing.assert_allclose(np.asarray(jnp.moveaxis(j, -1, 1)),
                               t.numpy(), atol=1e-5)


def test_vector2density_parity(ops):
    rng = np.random.RandomState(1)
    vect = (rng.randn(2, 2, 8, 10) * 3).astype(np.float32)
    t = ops.vector2density(torch.from_numpy(vect), 4, dim=2)
    j = j_vector2density(jnp.moveaxis(jnp.asarray(vect), 1, -1), 4)
    np.testing.assert_allclose(np.asarray(jnp.moveaxis(j, -1, 1)),
                               t.numpy(), atol=1e-5)


def test_flow_warp_parity(ops):
    rng = np.random.RandomState(2)
    x = rng.randn(2, 6, 12, 16).astype(np.float32)
    flo = (rng.randn(2, 2, 12, 16) * 4).astype(np.float32)
    t = ops.flow_warp(torch.from_numpy(x), torch.from_numpy(flo))
    j = hd3_flow_warp(jnp.moveaxis(jnp.asarray(x), 1, -1),
                      jnp.moveaxis(jnp.asarray(flo), 1, -1))
    np.testing.assert_allclose(np.asarray(jnp.moveaxis(j, -1, 1)),
                               t.detach().numpy(), atol=1e-5)


def test_hda_decoder_parity(ref_decoder):
    torch.manual_seed(0)
    t_dec = ref_decoder.HDADecoder(20, 16).eval()
    j_dec = JHDADecoder(20, 16)
    params = j_dec.from_torch(
        {k: v.detach().numpy() for k, v in t_dec.state_dict().items()})
    rng = np.random.RandomState(3)
    x = rng.randn(2, 20, 8, 10).astype(np.float32)
    with torch.no_grad():
        t_out = t_dec(torch.from_numpy(x))
    j_out = j_dec(params, jnp.moveaxis(jnp.asarray(x), 1, -1),
                  training=False)
    np.testing.assert_allclose(
        np.asarray(jnp.moveaxis(j_out, -1, 1)), t_out.numpy(), atol=2e-5)


def test_hd3_forward_shapes():
    model = ptlflow_tpu.get_model("hd3")
    model.init_params()
    rng = np.random.RandomState(4)
    images = jnp.asarray(rng.rand(1, 2, 3, 128, 192).astype(np.float32))
    out = model.forward(model.params, {"images": images}, training=False)
    assert out["flows"].shape == (1, 1, 2, 128, 192)
    assert bool(jnp.all(jnp.isfinite(out["flows"])))
