"""Warping and forward-projection ops.

- ``backward_warp``: warp an image towards flow targets (grid_sample based),
  the standard PWC/LiteFlowNet warping op.
- ``forward_interpolate``: device-side forward splat replacing the
  reference's CPU scipy.griddata nearest scatter
  (/root/reference/ptlflow/utils/external/raft.py:155-185), used by the
  RAFT warm-start path.  The reference runs nearest-neighbor interpolation of
  scattered points (every cell filled); here we forward-splat each source
  pixel's flow onto its rounded target cell (last-write-wins scatter) and
  then fill unhit cells by iterative dilation of the splatted values — a
  jit-compatible approximation of the nearest fill with the same role (flow
  initialization), avoiding the host round-trip entirely.
- ``fb_check``: forward-backward consistency occlusion estimation
  (/root/reference/ptlflow/utils/flow_utils.py:216-246).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .correlation import coords_grid
from .grid_sample import bilinear_sampler


def backward_warp(img: jnp.ndarray, flow: jnp.ndarray,
                  return_mask: bool = False):
    """Sample ``img`` at (grid + flow).  img: (B,H,W,C), flow: (B,H,W,2)."""
    b, h, w, _ = flow.shape
    coords = coords_grid(b, h, w, dtype=flow.dtype) + flow
    return bilinear_sampler(img, coords, mask=return_mask)


def _box3_sum(x: jnp.ndarray) -> jnp.ndarray:
    """3x3 box-filter sum over the H, W axes of a (B, H, W, C) array."""
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 1, 1, 1), padding="SAME")


def forward_interpolate(flow: jnp.ndarray, fill_iters: int = 12) -> jnp.ndarray:
    """Forward-project a flow field: out[round(p + flow(p))] = flow(p).

    flow: (B, H, W, 2).  Out-of-frame targets are dropped, mirroring the
    validity mask in the reference implementation.  Unhit target cells are
    filled by ``fill_iters`` rounds of 3x3 dilation of the splatted values
    (averaging hit neighbours), approximating the reference's
    scipy.griddata nearest-neighbour fill; cells still unhit after dilation
    (empty regions wider than ``3*fill_iters``) stay 0.
    """
    b, h, w, _ = flow.shape
    coords = coords_grid(b, h, w, dtype=flow.dtype)
    tgt = coords + flow
    tx = jnp.round(tgt[..., 0]).astype(jnp.int32)
    ty = jnp.round(tgt[..., 1]).astype(jnp.int32)
    valid = (tgt[..., 0] > 0) & (tgt[..., 0] < w - 1) & \
            (tgt[..., 1] > 0) & (tgt[..., 1] < h - 1)
    # invalid pixels scatter to a dump cell outside the output
    flat_idx = jnp.where(valid, ty * w + tx, h * w)
    src = flow.reshape(b, h * w, 2)

    def splat_one(idx, vals):
        out = jnp.zeros((h * w + 1, 3), vals.dtype)
        vals1 = jnp.concatenate([vals, jnp.ones_like(vals[..., :1])], -1)
        out = out.at[idx].set(vals1, mode="drop")
        return out[:h * w]

    out = jax.vmap(splat_one)(flat_idx.reshape(b, h * w), src)
    out = out.reshape(b, h, w, 3)
    vals, hit = out[..., :2], out[..., 2:]

    if fill_iters > 0:
        def fill_step(_, carry):
            vals, hit = carry
            num = _box3_sum(vals * hit)
            den = _box3_sum(hit)
            neighbor = num / jnp.maximum(den, 1.0)
            grown = (den > 0).astype(hit.dtype)
            vals = jnp.where(hit > 0, vals, neighbor)
            return vals, jnp.maximum(hit, grown)

        vals, hit = jax.lax.fori_loop(0, fill_iters, fill_step, (vals, hit))
    return vals * (hit > 0)


def fb_check(flow_fw: jnp.ndarray, flow_bw: jnp.ndarray,
             alpha_1: float = 0.01, alpha_2: float = 0.5) -> jnp.ndarray:
    """Forward-backward consistency check.  Returns occlusion mask (B,H,W,1).

    A pixel is occluded when |fw + bw(warped)|^2 exceeds
    alpha_1 * (|fw|^2 + |bw_warped|^2) + alpha_2.
    """
    bw_warped = backward_warp(flow_bw, flow_fw)
    diff = flow_fw + bw_warped
    mag_sq = jnp.sum(flow_fw ** 2, axis=-1, keepdims=True) + \
        jnp.sum(bw_warped ** 2, axis=-1, keepdims=True)
    occ = jnp.sum(diff ** 2, axis=-1, keepdims=True) > \
        (alpha_1 * mag_sq + alpha_2)
    return occ.astype(flow_fw.dtype)


def softsplat_average(x: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Average-mode soft forward splatting (SplatFlow's softsplat.py:435-467,
    a CUDA kernel in the reference): each source pixel bilinearly scatters
    its value to the four integer corners of p + flow(p); the result is
    normalized by the splatted weight sum (1 where empty).

    x: (B, H, W, C); flow: (B, H, W, 2). TPU note: implemented as four
    batched scatter-adds with OOB drops.
    """
    b, h, w, c = x.shape
    coords = coords_grid(b, h, w, dtype=flow.dtype) + flow
    xs = coords[..., 0]
    ys = coords[..., 1]
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    fx = xs - x0
    fy = ys - y0
    vals = jnp.concatenate([x, jnp.ones((b, h, w, 1), x.dtype)], axis=-1)

    def splat_one(v, x0, y0, fx, fy):
        out = jnp.zeros((h * w + 1, c + 1), v.dtype)
        for dx, dy, wgt in ((0, 0, (1 - fx) * (1 - fy)),
                            (1, 0, fx * (1 - fy)),
                            (0, 1, (1 - fx) * fy),
                            (1, 1, fx * fy)):
            tx = (x0 + dx).astype(jnp.int32)
            ty = (y0 + dy).astype(jnp.int32)
            valid = (tx >= 0) & (tx < w) & (ty >= 0) & (ty < h)
            idx = jnp.where(valid, ty * w + tx, h * w).reshape(-1)
            out = out.at[idx].add((v * wgt[..., None]).reshape(-1, c + 1),
                                  mode="drop")
        return out[:h * w]

    out = jax.vmap(splat_one)(vals, x0, y0, fx, fy)
    out = out.reshape(b, h, w, c + 1)
    den = out[..., -1:]
    den = jnp.where(den == 0.0, 1.0, den)
    return out[..., :-1] / den
