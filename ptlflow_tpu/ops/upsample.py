"""Flow upsampling ops shared across the RAFT family.

- ``convex_upsample``: the 9-way convex-combination 8x upsampler
  (reference: RAFT.upsample_flow, /root/reference/ptlflow/models/raft/raft.py:112-123;
  the same pattern is copied into every RAFT-family model).
- ``upflow``: bilinear upsample + magnitude scale
  (reference: upflow8, /root/reference/ptlflow/models/raft/utils.py:94-96).

NHWC throughout.  The mask channel layout matches the torch version's
``view(N, 1, 9, f, f, H, W)`` flattening so converted weights drop in.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .grid_sample import interpolate


def convex_upsample(flow: jnp.ndarray, mask: jnp.ndarray,
                    factor: int = 8) -> jnp.ndarray:
    """Upsample flow (B, h, w, 2) -> (B, f*h, f*w, 2) with learned weights.

    mask: (B, h, w, 9*f*f) raw logits; channel index c = k*f*f + i*f + j for
    3x3-neighbor k (row-major dy,dx) and subpixel offset (i, j).
    """
    b, h, w, c = flow.shape
    f = factor
    m = mask.reshape(b, h, w, 9, f * f).astype(jnp.float32)
    m = jax.nn.softmax(m, axis=3)

    # 9 zero-padded 3x3 neighbors of (factor * flow), matching F.unfold order.
    fl = (flow * f).astype(jnp.float32)
    flp = jnp.pad(fl, ((0, 0), (1, 1), (1, 1), (0, 0)))
    neighbors = []
    for dy in (0, 1, 2):
        for dx in (0, 1, 2):
            neighbors.append(flp[:, dy:dy + h, dx:dx + w, :])
    neigh = jnp.stack(neighbors, axis=3)  # (B, h, w, 9, 2)

    # (B, h, w, f*f, 2)
    up = jnp.einsum("bhwks,bhwkc->bhwsc", m, neigh,
                    preferred_element_type=jnp.float32)
    up = up.reshape(b, h, w, f, f, c)
    # full-res pixel (f*y + i, f*x + j)
    up = up.transpose(0, 1, 3, 2, 4, 5).reshape(b, f * h, f * w, c)
    return up.astype(flow.dtype)


def convex_upsample_data(flow: jnp.ndarray, info: jnp.ndarray,
                         mask: jnp.ndarray, factor: int = 8):
    """SEA-RAFT variant: convex-upsample flow (scaled by factor) and an
    auxiliary info map (unscaled) with one shared mask
    (reference SEARAFT.upsample_data, sea_raft.py:146-163)."""
    b, h, w, c = flow.shape
    f = factor
    m = mask.reshape(b, h, w, 9, f * f).astype(jnp.float32)
    m = jax.nn.softmax(m, axis=3)

    def up(x, scale):
        xs = (x * scale).astype(jnp.float32)
        xp = jnp.pad(xs, ((0, 0), (1, 1), (1, 1), (0, 0)))
        neigh = jnp.stack([xp[:, dy:dy + h, dx:dx + w, :]
                           for dy in (0, 1, 2) for dx in (0, 1, 2)], axis=3)
        out = jnp.einsum("bhwks,bhwkc->bhwsc", m, neigh,
                         preferred_element_type=jnp.float32)
        c = x.shape[-1]
        out = out.reshape(b, h, w, f, f, c)
        out = out.transpose(0, 1, 3, 2, 4, 5).reshape(b, f * h, f * w, c)
        return out.astype(x.dtype)

    return up(flow, f), up(info, 1.0)


def upflow(flow: jnp.ndarray, factor: int = 8,
           mode: str = "bilinear") -> jnp.ndarray:
    """Bilinear (align_corners=True) upsample with flow magnitude scaling."""
    b, h, w, _ = flow.shape
    out = interpolate(flow, (factor * h, factor * w), mode=mode,
                      align_corners=True)
    return factor * out
