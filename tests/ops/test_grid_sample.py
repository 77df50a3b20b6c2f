"""Parity tests for grid_sample/interpolate against torch (CPU oracle)."""

import numpy as np
import pytest

import jax.numpy as jnp
import torch
import torch.nn.functional as F

from ptlflow_tpu.ops import grid_sample, bilinear_sampler, interpolate


def _rand(*shape, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randn(*shape).astype(np.float32)


@pytest.mark.parametrize("align_corners", [True, False])
@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
def test_grid_sample_bilinear_matches_torch(align_corners, padding_mode):
    img = _rand(2, 7, 9, 3)
    grid = (_rand(2, 5, 6, 2, seed=1) * 1.2)  # includes out-of-bounds

    out = grid_sample(jnp.asarray(img), jnp.asarray(grid),
                      padding_mode=padding_mode,
                      align_corners=align_corners)

    t_img = torch.from_numpy(img).permute(0, 3, 1, 2)
    t_out = F.grid_sample(t_img, torch.from_numpy(grid), mode="bilinear",
                          padding_mode=padding_mode,
                          align_corners=align_corners)
    ref = t_out.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_grid_sample_nearest_matches_torch():
    img = _rand(1, 8, 8, 2)
    grid = _rand(1, 4, 4, 2, seed=2) * 0.9
    out = grid_sample(jnp.asarray(img), jnp.asarray(grid), mode="nearest",
                      align_corners=True)
    t_img = torch.from_numpy(img).permute(0, 3, 1, 2)
    t_out = F.grid_sample(t_img, torch.from_numpy(grid), mode="nearest",
                          align_corners=True)
    np.testing.assert_allclose(
        np.asarray(out), t_out.permute(0, 2, 3, 1).numpy(), atol=1e-6)


def test_bilinear_sampler_pixel_coords():
    """Match the reference's pixel-coordinate wrapper semantics
    (normalize by (size-1), align_corners=True, OOB mask)."""
    img = _rand(2, 6, 10, 4)
    coords = np.stack(
        [_rand(2, 3, 5, seed=3) * 4 + 4, _rand(2, 3, 5, seed=4) * 2 + 2],
        axis=-1).astype(np.float32)

    out, mask = bilinear_sampler(jnp.asarray(img), jnp.asarray(coords),
                                 mask=True)

    H, W = 6, 10
    xg = 2 * coords[..., 0] / (W - 1) - 1
    yg = 2 * coords[..., 1] / (H - 1) - 1
    t_grid = torch.from_numpy(np.stack([xg, yg], -1))
    t_img = torch.from_numpy(img).permute(0, 3, 1, 2)
    ref = F.grid_sample(t_img, t_grid, align_corners=True)
    np.testing.assert_allclose(
        np.asarray(out), ref.permute(0, 2, 3, 1).numpy(), atol=1e-5)
    ref_mask = ((xg > -1) & (xg < 1) & (yg > -1) & (yg < 1))
    np.testing.assert_array_equal(np.asarray(mask) > 0.5, ref_mask)


@pytest.mark.parametrize("align_corners", [True, False])
@pytest.mark.parametrize("size", [(14, 22), (3, 5), (7, 11)])
def test_interpolate_bilinear_matches_torch(align_corners, size):
    img = _rand(2, 7, 11, 3)
    out = interpolate(jnp.asarray(img), size, mode="bilinear",
                      align_corners=align_corners)
    t_img = torch.from_numpy(img).permute(0, 3, 1, 2)
    ref = F.interpolate(t_img, size=size, mode="bilinear",
                        align_corners=align_corners)
    np.testing.assert_allclose(
        np.asarray(out), ref.permute(0, 2, 3, 1).numpy(), atol=1e-5)


def test_interpolate_nearest_matches_torch():
    img = _rand(1, 5, 7, 2)
    out = interpolate(jnp.asarray(img), (10, 14), mode="nearest")
    t_img = torch.from_numpy(img).permute(0, 3, 1, 2)
    ref = F.interpolate(t_img, size=(10, 14), mode="nearest")
    np.testing.assert_allclose(
        np.asarray(out), ref.permute(0, 2, 3, 1).numpy(), atol=1e-6)
