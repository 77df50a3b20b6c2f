"""Device-side flow -> RGB conversion (jnp), for logging grids under jit.

Equivalent of the reference's torch backend
(/root/reference/ptlflow/utils/flowpy_torch.py:36-153): same color wheel and
hue interpolation as the numpy version (flow_viz.py), implemented with
jittable ops and batched over leading dims.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .flow_viz import make_colorwheel


def flow_to_rgb(flow: jnp.ndarray,
                flow_max_radius: Optional[float] = None,
                background: str = "bright") -> jnp.ndarray:
    """flow: (..., H, W, 2) -> uint8 RGB (..., H, W, 3); NaN -> invalid."""
    if background not in ("bright", "dark"):
        raise ValueError(f"invalid background '{background}'")
    wheel = jnp.asarray(np.vstack([make_colorwheel(),
                                   make_colorwheel()[:1]]), jnp.float32)
    ncols = wheel.shape[0] - 1

    fx = flow[..., 0].astype(jnp.float32)
    fy = flow[..., 1].astype(jnp.float32)
    nan_mask = jnp.isnan(fx) | jnp.isnan(fy)
    fx = jnp.where(nan_mask, 0.0, fx)
    fy = jnp.where(nan_mask, 0.0, fy)

    radius = jnp.sqrt(fx ** 2 + fy ** 2)
    angle = jnp.arctan2(fy, fx)
    if flow_max_radius is None:
        reduce_axes = tuple(range(flow.ndim - 3, flow.ndim - 1)) \
            if flow.ndim >= 3 else (0, 1)
        flow_max_radius = jnp.max(radius, axis=reduce_axes, keepdims=True)
    radius = radius / jnp.maximum(flow_max_radius, 1e-12)

    angle = jnp.where(angle < 0, angle + 2 * jnp.pi, angle)
    angle = angle * ((ncols - 1) / (2 * jnp.pi))
    a0 = jnp.floor(angle)
    frac = (angle - a0)[..., None]
    hue = wheel[a0.astype(jnp.int32)] * (1 - frac) + \
        wheel[jnp.ceil(angle).astype(jnp.int32)] * frac

    def move_v(h, f):
        return h * f[..., None]

    def move_s(h, f):
        return 255.0 - f[..., None] * (255.0 - h)

    if background == "dark":
        valid_col = move_v(hue, jnp.clip(radius, 0, 1))
        over_col = move_s(hue, 1 / jnp.maximum(radius, 1.0))
        invalid_color = jnp.asarray([255.0, 255.0, 255.0])
    else:
        valid_col = move_s(hue, jnp.clip(radius, 0, 1))
        over_col = move_v(hue, 1 / jnp.maximum(radius, 1.0))
        invalid_color = jnp.asarray([0.0, 0.0, 0.0])

    colors = jnp.where((radius > 1)[..., None], over_col, valid_col)
    colors = jnp.where(nan_mask[..., None], invalid_color, colors)
    return jnp.clip(colors, 0, 255).astype(jnp.uint8)
