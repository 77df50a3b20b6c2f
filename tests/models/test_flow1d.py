"""Flow1D: 1-D correlation lookup parity vs torch oracle + forward smoke."""

import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

import ptlflow_tpu
from ptlflow_tpu.models.flow1d.flow1d import (corr_1d_x, corr_1d_y,
                                              lookup_1d)


def _torch_corr1d_lookup_x(f1, f2, coords_x, radius):
    """Oracle for the reference Correlation1D x path (correlation.py:5-107)."""
    b, c, h, w = f1.shape
    f1p = f1.permute(0, 2, 3, 1)
    f2p = f2.permute(0, 2, 1, 3)
    corr = torch.matmul(f1p, f2p) / (c ** 0.5)  # (B, H, W, W2)
    corr = corr.reshape(b * h * w, 1, 1, w)
    r = radius
    dx = torch.linspace(-r, r, 2 * r + 1)
    cx = coords_x.reshape(b * h * w, 1, 1, 1) + dx.view(1, 1, 2 * r + 1, 1)
    gx = 2 * cx[..., 0] / (w - 1) - 1
    grid = torch.stack([gx, torch.full_like(gx, -1.0)], dim=-1)
    out = F.grid_sample(corr, grid, mode="bilinear", align_corners=True)
    return out.reshape(b, h, w, 2 * r + 1)


def test_corr_1d_x_lookup_parity():
    rng = np.random.RandomState(0)
    b, c, h, w = 1, 16, 6, 20
    f1 = rng.randn(b, c, h, w).astype(np.float32)
    f2 = rng.randn(b, c, h, w).astype(np.float32)
    coords_x = (rng.rand(b, h, w) * w).astype(np.float32)
    r = 4
    ref = _torch_corr1d_lookup_x(torch.from_numpy(f1), torch.from_numpy(f2),
                                 torch.from_numpy(coords_x), r).numpy()
    rows = corr_1d_x(jnp.asarray(np.transpose(f1, (0, 2, 3, 1))),
                     jnp.asarray(np.transpose(f2, (0, 2, 3, 1))))
    out = lookup_1d(rows, jnp.asarray(coords_x), r)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


def test_flow1d_forward():
    model = ptlflow_tpu.get_model("flow1d", args={"iters": 2,
                                                  "corr_radius": 8})
    model.init_params()
    rng = np.random.RandomState(1)
    images = rng.rand(1, 2, 3, 128, 160).astype(np.float32)
    out = model({"images": images})
    assert out["flows"].shape == (1, 1, 2, 128, 160)
    assert np.isfinite(np.asarray(out["flows"])).all()
