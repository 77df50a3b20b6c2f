"""Pallas TPU kernel for the RAFT correlation pyramid lookup.

The XLA path (ops/correlation.py corr_pyramid_lookup) runs the per-query
bilinear window sampling as two batched one-hot matmuls per level, reading
every query's whole slab; the 12-iteration RAFT loop spends ~6x the
bandwidth-limited time in lookups.

This kernel fuses one whole lookup (all pyramid levels) into a single grid
pass over query blocks, and — the key difference — DMAs only the 16
relevant slab rows per query out of HBM (the slabs never enter VMEM in
full).  Per level the windows are:
- bilinearly blended along y on the VPU (the y window is contiguous),
- contracted along x with one block-diagonal bilinear one-hot matmul on the
  MXU (out-of-range x matches no column -> grid_sample zero padding).

The pyramid must be pre-padded once per forward with ``prepare_pyramid``
(zero rows above/below), so row windows at the image border read exact
zeros; fully out-of-range windows are zeroed explicitly.  Output layout is
identical to corr_pyramid_lookup: level-major; within a level the first
window axis offsets x (the reference quirk, raft/corr.py:37-50).
"""

from __future__ import annotations

import functools
from typing import List, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PAD_TOP = 12
PAD_BOT = 16
FETCH = 16  # sublane-aligned row fetch (>= 2r+2 for r=4)


def prepare_pyramid(pyramid: Sequence[jnp.ndarray]) -> List[jnp.ndarray]:
    """Zero-pad each level once per forward: (Q, H, W, 1) ->
    (Q, PAD_TOP + H + PAD_BOT, ceil128(W)).

    Rows are padded for the windowed DMA; the width is padded to the 128
    lane tiling (HBM DMA slices must be lane-aligned).  The zero columns
    are harmless: out-of-range x one-hots hit only zeros."""
    out = []
    for lvl in pyramid:
        s = lvl[..., 0].astype(jnp.float32)
        wpad = (-s.shape[2]) % 128
        out.append(jnp.pad(s, ((0, 0), (PAD_TOP, PAD_BOT), (0, wpad))))
    return out


def _lookup_kernel(ys_ref, coords_ref, *refs, radius: int, q_block: int,
                   num_levels: int, heights):
    slab_refs = refs[:num_levels]
    out_ref = refs[num_levels]
    wbufs = refs[num_levels + 1:num_levels + 1 + num_levels]
    sems = refs[num_levels + 1 + num_levels]
    n = 2 * radius + 1
    qb = q_block
    m = qb * n
    i = pl.program_id(0)

    def dma(l, q):
        qg = i * qb + q
        return pltpu.make_async_copy(
            slab_refs[l].at[qg, pl.ds(ys_ref[qg * num_levels + l], FETCH), :],
            wbufs[l].at[q], sems.at[l, q])

    for l in range(num_levels):
        for q in range(qb):
            dma(l, q).start()

    for l in range(num_levels):
        for q in range(qb):
            dma(l, q).wait()
        w_l = wbufs[l].shape[2]
        h_l = heights[l]
        cl = coords_ref[...] / (2 ** l)  # (QB, 2)
        x0 = jnp.floor(cl[:, 0])
        y0 = jnp.floor(cl[:, 1])
        fx = cl[:, 0] - x0
        fy = cl[:, 1] - y0
        valid = ((y0 >= -(radius + 1.0)) &
                 (y0 <= h_l - 1.0 + radius)).astype(jnp.float32)

        rows = wbufs[l][...]  # (QB, FETCH, W)
        rows9 = rows[:, :n, :] * (1.0 - fy)[:, None, None] + \
            rows[:, 1:n + 1, :] * fy[:, None, None]
        rows9 = rows9 * valid[:, None, None]
        rows2d = rows9.reshape(m, w_l)  # (qb*n(b: y-offset), W)

        # per-query bilinear one-hot over x, stacked (qb*n(a: x-offset), W)
        sel_r = jax.lax.broadcasted_iota(jnp.int32, (m, qb), 0) // n
        sel_c = jax.lax.broadcasted_iota(jnp.int32, (m, qb), 1)
        sel = (sel_r == sel_c).astype(jnp.float32)
        x0_r = jax.lax.dot_general(sel, x0[:, None],
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        fx_r = jax.lax.dot_general(sel, fx[:, None],
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        rx_r = jax.lax.broadcasted_iota(jnp.int32, (m, w_l), 0)
        rx_x = jax.lax.broadcasted_iota(jnp.int32, (m, w_l), 1)
        a_rx = rx_r - (rx_r // n) * n
        tx = rx_x.astype(jnp.float32) - (
            x0_r + a_rx.astype(jnp.float32) - radius)
        rx = (tx == 0).astype(jnp.float32) * (1.0 - fx_r) + \
            (tx == 1).astype(jnp.float32) * fx_r

        # (m(a), W) @ (W, m(b)) -> (m, m); diagonal 9x9 blocks are the
        # per-query windows
        big = jax.lax.dot_general(
            rx, rows2d, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        for q in range(qb):
            blk = big[q * n:(q + 1) * n, q * n:(q + 1) * n]  # (a, b)
            for a in range(n):
                out_ref[q, l * n * n + a * n:l * n * n + (a + 1) * n] = \
                    blk[a, :]


@functools.partial(jax.jit, static_argnames=("radius", "q_block",
                                             "interpret", "heights"))
def _lookup_flat(slabs, coords, ys, radius, q_block, interpret, heights):
    num_levels = len(slabs)
    q = coords.shape[0]
    n = 2 * radius + 1

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(q // q_block,),
        in_specs=(
            [pl.BlockSpec((q_block, 2), lambda i, ys: (i, 0))]
            + [pl.BlockSpec(memory_space=pltpu.ANY) for _ in slabs]),
        out_specs=pl.BlockSpec((q_block, num_levels * n * n),
                               lambda i, ys: (i, 0)),
        scratch_shapes=(
            [pltpu.VMEM((q_block, FETCH, s.shape[2]), jnp.float32)
             for s in slabs]
            + [pltpu.SemaphoreType.DMA((num_levels, q_block))]),
    )
    kernel = functools.partial(_lookup_kernel, radius=radius,
                               q_block=q_block, num_levels=num_levels,
                               heights=heights)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((q, num_levels * n * n),
                                       jnp.float32),
        interpret=interpret,
    )(ys, coords, *slabs)


def corr_pyramid_lookup_pallas(prepared: Sequence[jnp.ndarray],
                               coords: jnp.ndarray, radius: int,
                               q_block: int = 16,
                               interpret: bool = False) -> jnp.ndarray:
    """Lookup on a ``prepare_pyramid``-padded pyramid.

    prepared: list of (B*H1*W1, PAD_TOP+H_l+PAD_BOT, W_l);
    coords: (B, H1, W1, 2).  Returns (B, H1, W1, L*(2r+1)^2).
    """
    b, h1, w1, _ = coords.shape
    q = b * h1 * w1
    n = 2 * radius + 1
    num_levels = len(prepared)
    heights = tuple(s.shape[1] - PAD_TOP - PAD_BOT for s in prepared)

    qb = q_block
    pad = (-q) % qb
    coords_flat = coords.reshape(q, 2).astype(jnp.float32)
    slabs = list(prepared)
    if pad:
        coords_flat = jnp.pad(coords_flat, ((0, pad), (0, 0)))
        slabs = [jnp.pad(s, ((0, pad), (0, 0), (0, 0))) for s in slabs]

    # per-level clamped integer row starts (scalar-prefetched for the DMAs)
    ys_cols = []
    for l, s in enumerate(slabs):
        hp = s.shape[1]
        y0 = jnp.floor(coords_flat[:, 1] / (2 ** l)).astype(jnp.int32)
        ys_cols.append(jnp.clip(y0 - radius + PAD_TOP, 0, hp - FETCH))
    ys = jnp.stack(ys_cols, axis=1).reshape(-1)  # flat (Q*L,) for SMEM

    out = _lookup_flat(tuple(slabs), coords_flat, ys, radius, qb, interpret,
                       heights)
    if pad:
        out = out[:q]
    return out.reshape(b, h1, w1, num_levels * n * n)
