"""FlowSeek parity tests."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

import ptlflow_tpu
from ptlflow_tpu.models.flowseek.flowseek import create_bases


def test_create_bases_parity():
    """Oracle re-implementation of flowseek.py:185-230 in torch."""
    def torch_create_bases(disp):
        B, C, H, W = disp.shape
        ys = torch.linspace(0.5 / H, 1.0 - 0.5 / H, H)
        xs = torch.linspace(0.5 / W, 1.0 - 0.5 / W, W)
        u, v = torch.meshgrid(xs, ys, indexing="xy")
        u = (u - 0.5)[None, None].repeat(B, 1, 1, 1)
        v = (v - 0.5)[None, None].repeat(B, 1, 1, 1)
        aspect_ratio = W / H
        Tx = torch.cat([-torch.ones_like(disp), torch.zeros_like(disp)], 1)
        Ty = torch.cat([torch.zeros_like(disp), -torch.ones_like(disp)], 1)
        Tz = torch.cat([u, v], 1)
        nrm = lambda t: t / torch.linalg.vector_norm(t, dim=(1, 2, 3),
                                                     keepdim=True)
        Tx, Ty, Tz = 2 * disp * nrm(Tx), 2 * disp * nrm(Ty), \
            2 * disp * nrm(Tz)
        R1x = nrm(torch.cat([torch.zeros_like(disp),
                             torch.ones_like(disp)], 1))
        R2x = nrm(torch.cat([u * v, v * v], 1))
        R1y = nrm(torch.cat([-torch.ones_like(disp),
                             torch.zeros_like(disp)], 1))
        R2y = nrm(torch.cat([-u * u, -u * v], 1))
        Rz = nrm(torch.cat([-v / aspect_ratio, u * aspect_ratio], 1))
        return torch.cat([Tx, Ty, Tz, R1x, R2x, R1y, R2y, Rz], 1)

    rng = np.random.RandomState(0)
    disp = np.abs(rng.randn(2, 1, 12, 16)).astype(np.float32)
    ref = torch_create_bases(torch.from_numpy(disp))
    out = create_bases(jnp.asarray(np.transpose(disp, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.asarray(out),
                               ref.permute(0, 2, 3, 1).numpy(), atol=1e-5)


@pytest.mark.parametrize("name", ["flowseek_t"])
def test_flowseek_forward_and_loss(name):
    model = ptlflow_tpu.get_model(name, args={"iters": 1})
    model.init_params()
    rng = np.random.RandomState(5)
    b, h, w = 1, 64, 96
    inputs = {
        "images": jnp.asarray(rng.rand(b, 2, 3, h, w).astype(np.float32)),
        "flows": jnp.asarray(rng.randn(b, 1, 2, h, w).astype(np.float32)),
        "valids": jnp.ones((b, 1, 1, h, w), jnp.float32),
    }
    out = model.forward(model.params, inputs)
    assert out["flows"].shape == (b, 1, 2, h, w)
    assert np.isfinite(np.asarray(out["flows"])).all()
    outt = model.forward(model.params, inputs, training=True)
    assert outt["flow_preds"].shape[0] == 2  # init + 1 iter
    assert np.isfinite(float(model.loss_fn(outt, inputs)))


def test_flowseek_frozen_dav2():
    from ptlflow_tpu.nn import split_trainable
    model = ptlflow_tpu.get_model("flowseek_t", args={"iters": 0})
    model.init_params()
    tr, _ = split_trainable(model.params, model.frozen_prefixes)
    assert "dav2" not in tr
