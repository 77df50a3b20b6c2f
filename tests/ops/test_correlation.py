"""Correlation pyramid + convex upsample parity vs a torch oracle.

The oracle reimplements the reference semantics
(/root/reference/ptlflow/models/raft/corr.py and raft.py:112-123) directly in
torch inside the test, so any layout/ordering drift in the TPU ops is caught.
"""

import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from ptlflow_tpu.ops import (
    CorrBlock, coords_grid, convex_upsample, upflow, local_correlation,
    backward_warp,
)


def torch_corr_block(fmap1, fmap2, coords, num_levels=4, radius=4):
    """Oracle: all-pairs corr pyramid lookup (NCHW torch)."""
    batch, dim, ht, wd = fmap1.shape
    f1 = fmap1.view(batch, dim, ht * wd)
    f2 = fmap2.view(batch, dim, ht * wd)
    corr = torch.matmul(f1.transpose(1, 2), f2).view(batch, ht, wd, 1, ht, wd)
    corr = corr / torch.sqrt(torch.tensor(float(dim)))
    corr = corr.reshape(batch * ht * wd, 1, ht, wd)
    pyramid = [corr]
    for _ in range(num_levels - 1):
        corr = F.avg_pool2d(corr, 2, stride=2)
        pyramid.append(corr)

    r = radius
    coords = coords.permute(0, 2, 3, 1)
    b, h1, w1, _ = coords.shape
    out_pyramid = []
    for i, corr in enumerate(pyramid):
        dx = torch.linspace(-r, r, 2 * r + 1)
        dy = torch.linspace(-r, r, 2 * r + 1)
        delta = torch.stack(torch.meshgrid(dy, dx, indexing="ij"), axis=-1)
        centroid = coords.reshape(b * h1 * w1, 1, 1, 2) / 2 ** i
        coords_lvl = centroid + delta.view(1, 2 * r + 1, 2 * r + 1, 2)
        H, W = corr.shape[-2:]
        xg = 2 * coords_lvl[..., 0] / (W - 1) - 1
        yg = 2 * coords_lvl[..., 1] / (H - 1) - 1
        grid = torch.stack([xg, yg], dim=-1)
        sampled = F.grid_sample(corr, grid, align_corners=True)
        out_pyramid.append(sampled.view(b, h1, w1, -1))
    out = torch.cat(out_pyramid, dim=-1)
    return out.permute(0, 3, 1, 2).contiguous()


def test_corr_block_matches_torch_oracle():
    rng = np.random.RandomState(0)
    b, h, w, c = 2, 8, 12, 16
    f1 = rng.randn(b, h, w, c).astype(np.float32)
    f2 = rng.randn(b, h, w, c).astype(np.float32)
    flow = (rng.randn(b, h, w, 2) * 2).astype(np.float32)

    coords = np.asarray(coords_grid(b, h, w)) + flow
    block = CorrBlock(jnp.asarray(f1), jnp.asarray(f2), num_levels=3, radius=2)
    out = block(jnp.asarray(coords))  # (B, H, W, L*(2r+1)^2)

    t_f1 = torch.from_numpy(f1).permute(0, 3, 1, 2)
    t_f2 = torch.from_numpy(f2).permute(0, 3, 1, 2)
    t_coords = torch.from_numpy(np.transpose(coords, (0, 3, 1, 2)))
    ref = torch_corr_block(t_f1, t_f2, t_coords, num_levels=3, radius=2)
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


def test_corr_pyramid_bf16_close_to_fp32():
    """The opt-in bfloat16 pyramid (corr_dtype knob) stays within bf16
    rounding of the fp32 path."""
    from ptlflow_tpu.ops.correlation import (build_corr_pyramid,
                                             corr_pyramid_lookup)

    rng = np.random.RandomState(1)
    b, h, w, c = 1, 8, 16, 32
    f1 = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    f2 = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    coords = (jnp.asarray(coords_grid(b, h, w))
              + jnp.asarray(rng.randn(b, h, w, 2).astype(np.float32)))
    p32 = build_corr_pyramid(f1, f2, 3)
    pbf = build_corr_pyramid(f1, f2, 3, dtype=jnp.bfloat16)
    assert pbf[0].dtype == jnp.bfloat16
    o32 = np.asarray(corr_pyramid_lookup(p32, coords, 2))
    obf = np.asarray(corr_pyramid_lookup(pbf, coords, 2).astype(jnp.float32))
    scale = np.abs(o32).max()
    assert np.abs(o32 - obf).max() < 0.02 * scale


def torch_upsample_flow(flow, mask, factor=8):
    """Oracle: RAFT convex upsampling (raft.py:112-123)."""
    N, _, H, W = flow.shape
    mask = mask.view(N, 1, 9, factor, factor, H, W)
    mask = torch.softmax(mask, dim=2)
    up_flow = F.unfold(factor * flow, [3, 3], padding=1)
    up_flow = up_flow.view(N, 2, 9, 1, 1, H, W)
    up_flow = torch.sum(mask * up_flow, dim=2)
    up_flow = up_flow.permute(0, 1, 4, 2, 5, 3)
    return up_flow.reshape(N, 2, factor * H, factor * W)


def test_convex_upsample_matches_torch_oracle():
    rng = np.random.RandomState(1)
    b, h, w = 2, 6, 9
    flow = rng.randn(b, h, w, 2).astype(np.float32)
    mask = rng.randn(b, h, w, 9 * 64).astype(np.float32)

    out = convex_upsample(jnp.asarray(flow), jnp.asarray(mask))

    t_flow = torch.from_numpy(flow).permute(0, 3, 1, 2)
    t_mask = torch.from_numpy(mask).permute(0, 3, 1, 2)
    ref = torch_upsample_flow(t_flow, t_mask).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


def test_upflow_matches_torch():
    rng = np.random.RandomState(2)
    flow = rng.randn(1, 5, 7, 2).astype(np.float32)
    out = upflow(jnp.asarray(flow), 8)
    t_flow = torch.from_numpy(flow).permute(0, 3, 1, 2)
    ref = 8 * F.interpolate(t_flow, size=(40, 56), mode="bilinear",
                            align_corners=True)
    np.testing.assert_allclose(
        np.asarray(out), ref.permute(0, 2, 3, 1).numpy(), atol=1e-5)


def test_local_correlation_shift_equals_sampled():
    """Windowed correlation: shift path vs coords path must agree on the
    identity grid (away from borders where bilinear OOB masking differs)."""
    rng = np.random.RandomState(3)
    b, h, w, c = 1, 10, 11, 8
    f1 = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    f2 = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    d = 2
    out_shift = local_correlation(f1, f2, d)
    coords = coords_grid(b, h, w)
    out_coords = local_correlation(f1, f2, d, coords=coords)
    interior = (slice(None), slice(d, h - d), slice(d, w - d))
    np.testing.assert_allclose(np.asarray(out_shift)[interior],
                               np.asarray(out_coords)[interior], atol=1e-4)
    # channel order: (dy, dx) row-major
    assert out_shift.shape == (b, h, w, (2 * d + 1) ** 2)


def test_backward_warp_zero_flow_identity():
    rng = np.random.RandomState(4)
    img = jnp.asarray(rng.randn(2, 7, 9, 3).astype(np.float32))
    flow = jnp.zeros((2, 7, 9, 2), jnp.float32)
    out = backward_warp(img, flow)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


def test_pallas_lookup_matches_grouped():
    """The Pallas lookup (one-hot selectors generated in-register; see
    ops/correlation.py::_lookup_pallas) must be bit-compatible with the
    XLA grouped/ungrouped formulations, including out-of-range coords
    (zero-padding semantics) and the x-offset-major channel order.
    Runs in interpret mode on CPU (same kernel body the TPU compiles)."""
    from ptlflow_tpu.ops.correlation import (
        build_corr_pyramid, corr_pyramid_lookup, _lookup_pallas)

    rng = np.random.RandomState(11)
    b, h, w, c = 1, 8, 16, 12  # q = 128: query-tile divisor exists
    f1 = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    f2 = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    pyramid = build_corr_pyramid(f1, f2, 4)
    # in-range, fractional, and out-of-range sample points
    coords = jnp.asarray((rng.rand(b, h, w, 2) * 24 - 4).astype(np.float32))

    got = np.asarray(_lookup_pallas(pyramid, coords, 4))
    ungrouped = np.asarray(corr_pyramid_lookup(pyramid, coords, 4, group=0))
    grouped = np.asarray(corr_pyramid_lookup(pyramid, coords, 4, group=None))
    assert got.shape == (b, h, w, 4 * 81)
    np.testing.assert_allclose(got, ungrouped, atol=1e-5)
    np.testing.assert_allclose(got, grouped, atol=1e-6)


def test_pallas_lookup_no_divisor_fallback():
    """Prime query counts have no tile divisor: _lookup_pallas returns
    None and make_corr_lookup(impl='pallas') falls back to XLA."""
    from ptlflow_tpu.ops.correlation import (
        build_corr_pyramid, corr_pyramid_lookup, _lookup_pallas,
        make_corr_lookup)

    rng = np.random.RandomState(12)
    b, h, w, c = 1, 1, 37, 8  # q = 37 (prime)
    f1 = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    f2 = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    pyramid = build_corr_pyramid(f1, f2, 2)
    coords = jnp.asarray((rng.rand(b, h, w, 2) * 40 - 2).astype(np.float32))
    assert _lookup_pallas(pyramid, coords, 4) is None
    out = make_corr_lookup(pyramid, 4, impl="pallas")(coords)
    want = corr_pyramid_lookup(pyramid, coords, 4, group=0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-5)
