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

    # bilinear
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1 = x0 + 1.0
    y1 = y0 + 1.0
    wx1 = x - x0
    wx0 = 1.0 - wx1
    wy1 = y - y0
    wy0 = 1.0 - wy1

    out = jnp.zeros((n, ho * wo, c), compute_dtype)
    for yi, wyi in ((y0, wy0), (y1, wy1)):
        for xi, wxi in ((x0, wx0), (x1, wx1)):
            ixi = xi.astype(jnp.int32)
            iyi = yi.astype(jnp.int32)
            wgt = wxi * wyi
            if padding_mode == "zeros":
                valid = ((ixi >= 0) & (ixi < w) & (iyi >= 0) & (iyi < h))
                wgt = wgt * valid.astype(compute_dtype)
            v = _gather_2d(imgf, jnp.clip(ixi, 0, w - 1),
                           jnp.clip(iyi, 0, h - 1))
            out = out + v * wgt[..., None]
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
