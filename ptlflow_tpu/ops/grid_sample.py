"""Bilinear grid sampling with exact torch ``F.grid_sample`` semantics.

XLA has no native grid_sample; this gather-based implementation is the
correctness-critical primitive gating every EPE check (SURVEY.md §7 "hard
parts" #1).  Matches the reference's usage:
- ``bilinear_sampler`` (pixel coords, align_corners=True, zero padding):
  /root/reference/ptlflow/utils/external/raft.py:188-202
- ``F.interpolate`` bilinear with both align_corners settings (upflow8,
  InputScaler): /root/reference/ptlflow/models/raft/utils.py:94,
  /root/reference/ptlflow/utils/utils.py:93-213.

All functions take NHWC images.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _gather_2d(img: jnp.ndarray, ix: jnp.ndarray, iy: jnp.ndarray) -> jnp.ndarray:
    """Gather img[n, iy, ix, :] for integer index maps.

    img: (N, H, W, C); ix, iy: (N, P) int32 already clipped in range.
    Returns (N, P, C).
    """
    n, h, w, c = img.shape
    flat = img.reshape(n, h * w, c)
    idx = iy * w + ix  # (N, P)
    return jnp.take_along_axis(flat, idx[..., None], axis=1)


def grid_sample(img: jnp.ndarray, grid: jnp.ndarray, mode: str = "bilinear",
                padding_mode: str = "zeros",
                align_corners: bool = False) -> jnp.ndarray:
    """torch.nn.functional.grid_sample for NHWC images.

    img: (N, H, W, C); grid: (N, Ho, Wo, 2) with normalized (x, y) in [-1, 1].
    Returns (N, Ho, Wo, C).
    """
    n, h, w, c = img.shape
    _, ho, wo, _ = grid.shape
    gx = grid[..., 0].reshape(n, ho * wo)
    gy = grid[..., 1].reshape(n, ho * wo)

    compute_dtype = jnp.promote_types(img.dtype, jnp.float32)
    gx = gx.astype(compute_dtype)
    gy = gy.astype(compute_dtype)

    if align_corners:
        x = (gx + 1.0) * 0.5 * (w - 1)
        y = (gy + 1.0) * 0.5 * (h - 1)
    else:
        x = ((gx + 1.0) * w - 1.0) * 0.5
        y = ((gy + 1.0) * h - 1.0) * 0.5

    if padding_mode == "border":
        x = jnp.clip(x, 0.0, w - 1)
        y = jnp.clip(y, 0.0, h - 1)
    elif padding_mode == "reflection":
        # torch reflects about the boundary; with align_corners=True the
        # boundary is the corner pixel centers.
        def reflect(v, lo, hi):
            rng = hi - lo
            v = jnp.abs(jnp.mod(v - lo, 2 * rng) - rng) + lo - rng + rng
            return jnp.abs(jnp.mod(v - lo, 2 * rng) - rng) * -1 + hi  # placeholder
        raise NotImplementedError("reflection padding not needed by the zoo")

    imgf = img.astype(compute_dtype)

    if mode == "nearest":
        # torch rounds half away? It uses round-to-nearest-even via floor(x+0.5)
        ix = jnp.floor(x + 0.5).astype(jnp.int32)
        iy = jnp.floor(y + 0.5).astype(jnp.int32)
        if padding_mode == "zeros":
            valid = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
            out = _gather_2d(imgf, jnp.clip(ix, 0, w - 1), jnp.clip(iy, 0, h - 1))
            out = out * valid[..., None].astype(compute_dtype)
        else:
            out = _gather_2d(imgf, jnp.clip(ix, 0, w - 1), jnp.clip(iy, 0, h - 1))
        return out.reshape(n, ho, wo, c).astype(img.dtype)

    # bilinear — single fused gather.
    #
    # TPU point-gathers pay a fixed per-point cost, and a C-channel row is
    # far below the 512 B sublane granule for small C, so 4 separate corner
    # gathers (the naive formulation) run at ~1 GB/s effective on v5e
    # (28.9 ms for one 512x1024x3 warp).  Instead the 4 bilinear corners
    # are packed into the channel axis of ONE (H+1, W+1, 4C) "quad" image
    # built from a 1-pixel-padded copy (pure shifts, fused by XLA), so the
    # whole interpolation needs a single gather of 4C-wide rows (7.5x
    # measured on the MaskFlowNet full-res warp).  The pad ring encodes the
    # out-of-range corner values (zeros / replicated border) so per-corner
    # validity only needs the zero-padding weight mask.
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx1 = (x - x0)[..., None]
    wy1 = (y - y0)[..., None]
    ix = x0.astype(jnp.int32)
    iy = y0.astype(jnp.int32)

    pad_mode = "edge" if padding_mode == "border" else "constant"
    p = jnp.pad(imgf, ((0, 0), (1, 1), (1, 1), (0, 0)), mode=pad_mode)
    quad = jnp.concatenate(
        [p[:, :-1, :-1], p[:, :-1, 1:], p[:, 1:, :-1], p[:, 1:, 1:]],
        axis=-1)  # (N, H+1, W+1, 4C): [v00, v01, v10, v11] at (y0+1, x0+1)
    q = _gather_2d(quad, jnp.clip(ix + 1, 0, w), jnp.clip(iy + 1, 0, h))
    v00, v01, v10, v11 = (q[..., :c], q[..., c:2 * c],
                          q[..., 2 * c:3 * c], q[..., 3 * c:])

    w00 = (1 - wy1) * (1 - wx1)
    w01 = (1 - wy1) * wx1
    w10 = wy1 * (1 - wx1)
    w11 = wy1 * wx1
    if padding_mode == "zeros":
        # the pad ring already zeroes corners one step out of range; mask
        # the weights for indices beyond the ring (|offset| >= 2)
        vx0 = ((ix >= 0) & (ix <= w - 1)).astype(compute_dtype)[..., None]
        vx1 = ((ix >= -1) & (ix <= w - 2)).astype(compute_dtype)[..., None]
        vy0 = ((iy >= 0) & (iy <= h - 1)).astype(compute_dtype)[..., None]
        vy1 = ((iy >= -1) & (iy <= h - 2)).astype(compute_dtype)[..., None]
        w00 = w00 * vy0 * vx0
        w01 = w01 * vy0 * vx1
        w10 = w10 * vy1 * vx0
        w11 = w11 * vy1 * vx1
    out = v00 * w00 + v01 * w01 + v10 * w10 + v11 * w11
    return out.reshape(n, ho, wo, c).astype(img.dtype)


def bilinear_sampler(img: jnp.ndarray, coords: jnp.ndarray,
                     mask: bool = False, padding_mode: str = "zeros"):
    """Pixel-coordinate sampler, matching the reference ``bilinear_sampler``
    (align_corners=True; zero or border padding).

    img: (N, H, W, C); coords: (N, Ho, Wo, 2) in *pixel* coordinates (x, y).
    """
    h, w = img.shape[1], img.shape[2]
    xgrid = 2.0 * coords[..., 0] / (w - 1) - 1.0
    ygrid = 2.0 * coords[..., 1] / (h - 1) - 1.0
    grid = jnp.stack([xgrid, ygrid], axis=-1)
    out = grid_sample(img, grid, mode="bilinear", padding_mode=padding_mode,
                      align_corners=True)
    if mask:
        m = ((xgrid > -1) & (ygrid > -1) & (xgrid < 1) & (ygrid < 1))
        return out, m.astype(coords.dtype)
    return out


def bilinear_coverage(coords: jnp.ndarray, shape: Tuple[int, int],
                      dtype=None) -> jnp.ndarray:
    """Analytic equivalent of ``bilinear_sampler(ones((h, w, 1)), coords)``.

    Several zoo models (MaskFlowNet maskflownet.py:60-64, PWCNet, DICL)
    build a warp validity mask by bilinearly sampling an all-ones image —
    a second full gather.  Sampling a constant image only measures how much
    of the 2x2 stencil is in bounds, which is a closed-form product of the
    per-axis coverages; this computes it with pure VPU math (zero gathers).
    The coordinate arithmetic replays bilinear_sampler's normalize/
    denormalize round trip bit-for-bit so thresholds like ``>= 0.9999``
    cut at identical pixels.
    """
    h, w = shape
    compute_dtype = jnp.promote_types(coords.dtype, jnp.float32)
    # identical round trip to bilinear_sampler -> grid_sample(align_corners)
    gx = 2.0 * coords[..., 0].astype(compute_dtype) / (w - 1) - 1.0
    gy = 2.0 * coords[..., 1].astype(compute_dtype) / (h - 1) - 1.0
    x = (gx + 1.0) * 0.5 * (w - 1)
    y = (gy + 1.0) * 0.5 * (h - 1)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    ix = x0.astype(jnp.int32)
    iy = y0.astype(jnp.int32)
    vx0 = ((ix >= 0) & (ix <= w - 1)).astype(compute_dtype)
    vx1 = ((ix >= -1) & (ix <= w - 2)).astype(compute_dtype)
    vy0 = ((iy >= 0) & (iy <= h - 1)).astype(compute_dtype)
    vy1 = ((iy >= -1) & (iy <= h - 2)).astype(compute_dtype)
    cov = ((vy0 * (1 - fy) + vy1 * fy) * (vx0 * (1 - fx) + vx1 * fx))
    return cov[..., None].astype(dtype or coords.dtype)


def interpolate(x: jnp.ndarray, size: Tuple[int, int], mode: str = "bilinear",
                align_corners: bool = False) -> jnp.ndarray:
    """torch ``F.interpolate`` for NHWC input to an explicit (H, W) size."""
    n, h, w, c = x.shape
    oh, ow = size
    if (oh, ow) == (h, w):
        return x
    compute_dtype = jnp.promote_types(x.dtype, jnp.float32)
    if mode == "nearest":
        # torch nearest uses floor(dst * scale) index mapping
        ys = jnp.floor(jnp.arange(oh) * (h / oh)).astype(jnp.int32)
        xs = jnp.floor(jnp.arange(ow) * (w / ow)).astype(jnp.int32)
        return x[:, ys][:, :, xs]
    if mode != "bilinear":
        raise NotImplementedError(mode)
    if align_corners:
        ys = jnp.arange(oh, dtype=compute_dtype) * ((h - 1) / max(oh - 1, 1))
        xs = jnp.arange(ow, dtype=compute_dtype) * ((w - 1) / max(ow - 1, 1))
    else:
        ys = (jnp.arange(oh, dtype=compute_dtype) + 0.5) * (h / oh) - 0.5
        xs = (jnp.arange(ow, dtype=compute_dtype) + 0.5) * (w / ow) - 0.5
        ys = jnp.clip(ys, 0.0, h - 1)
        xs = jnp.clip(xs, 0.0, w - 1)
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy1 = (ys - y0)[:, None, None]  # (oh,1,1)
    wx1 = (xs - x0)[None, :, None]  # (1,ow,1)
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    xf = x.astype(compute_dtype)
    top = xf[:, y0][:, :, x0] * (1 - wx1) + xf[:, y0][:, :, x1] * wx1
    bot = xf[:, y1][:, :, x0] * (1 - wx1) + xf[:, y1][:, :, x1] * wx1
    out = top * (1 - wy1) + bot * wy1
    return out.astype(x.dtype)


def interpolate_like_torch_nchw(x_nchw: jnp.ndarray, size: Tuple[int, int],
                                mode: str = "bilinear",
                                align_corners: bool = False) -> jnp.ndarray:
    """Convenience wrapper for NCHW tensors (public-contract boundary)."""
    x = jnp.moveaxis(x_nchw, -3, -1)
    y = interpolate(x, size, mode=mode, align_corners=align_corners)
    return jnp.moveaxis(y, -1, -3)


def _cubic_weights(t: jnp.ndarray, a: float = -0.75):
    """Cubic convolution weights for the 4 taps around fractional offset t
    (torch ``upsample_bicubic2d``'s kernel, a=-0.75)."""
    # taps at distances (1+t, t, 1-t, 2-t)
    def k1(x):  # |x| <= 1
        return (a + 2) * x ** 3 - (a + 3) * x ** 2 + 1

    def k2(x):  # 1 < |x| < 2
        return a * x ** 3 - 5 * a * x ** 2 + 8 * a * x - 4 * a

    return (k2(t + 1.0), k1(t), k1(1.0 - t), k2(2.0 - t))


def interpolate_bicubic(x: jnp.ndarray, scale: Tuple[float, float],
                        size: Optional[Tuple[int, int]] = None) -> jnp.ndarray:
    """torch ``F.interpolate(mode="bicubic", align_corners=False)`` for NHWC.

    When ``scale`` (scale_h, scale_w) is given, coordinates map with the
    EXPLICIT scale factors (src = (dst + 0.5) / scale - 0.5) — matching
    torch when scale_factor= is passed — and the output size is
    floor(in * scale) unless ``size`` overrides it.  Edge taps clamp
    (replicate), as in torch's bicubic.
    """
    n, h, w, c = x.shape
    sh, sw = scale
    oh = size[0] if size is not None else int(h * sh)
    ow = size[1] if size is not None else int(w * sw)
    compute_dtype = jnp.promote_types(x.dtype, jnp.float32)
    ys = (jnp.arange(oh, dtype=compute_dtype) + 0.5) / sh - 0.5
    xs = (jnp.arange(ow, dtype=compute_dtype) + 0.5) / sw - 0.5
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    ty = ys - y0
    tx = xs - x0
    wy = _cubic_weights(ty)  # 4 x (oh,)
    wx = _cubic_weights(tx)  # 4 x (ow,)
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)
    xf = x.astype(compute_dtype)
    rows = 0.0
    for i in range(4):
        yi = jnp.clip(y0 + (i - 1), 0, h - 1)
        cols = 0.0
        for j in range(4):
            xj = jnp.clip(x0 + (j - 1), 0, w - 1)
            cols = cols + xf[:, yi][:, :, xj] * wx[j][None, :, None]
        rows = rows + cols * wy[i][:, None, None]
    return rows.astype(x.dtype)
