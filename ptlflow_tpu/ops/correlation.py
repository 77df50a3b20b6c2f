"""Correlation-volume ops: the heart of RAFT-family models.

TPU-first design (SURVEY.md §2.2, §3.3):
- The all-pairs volume is one big MXU matmul over (H*W, C) feature matrices
  (reference: CorrBlock.corr, /root/reference/ptlflow/models/raft/corr.py:56-64).
- The multi-scale pyramid is built with 2x2 average pooling
  (corr.py:25-27) and looked up per GRU iteration with bilinear gathers in a
  (2r+1)^2 window (corr.py:29-54).  The lookup offset ordering intentionally
  reproduces the reference's quirk (meshgrid(dy, dx) added to (x, y) coords)
  so that converted pretrained weights see identical channel ordering.
- ``local_correlation`` covers the PWC-style spatial correlation sampler
  (/root/reference/ptlflow/utils/correlation.py:35-274).

Everything is NHWC and jit-friendly (static shapes, no Python data-dependent
control flow).
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..nn.layers import avg_pool2d
from .grid_sample import bilinear_sampler


def coords_grid(batch: int, ht: int, wd: int, dtype=jnp.float32) -> jnp.ndarray:
    """(B, H, W, 2) grid of (x, y) pixel coordinates.

    NHWC analog of the reference's coords_grid
    (/root/reference/ptlflow/models/raft/utils.py:84-91, which returns (B,2,H,W)).
    """
    y = jnp.arange(ht, dtype=dtype)
    x = jnp.arange(wd, dtype=dtype)
    xx, yy = jnp.meshgrid(x, y)  # (H, W) each
    grid = jnp.stack([xx, yy], axis=-1)
    return jnp.broadcast_to(grid[None], (batch, ht, wd, 2))


def all_pairs_correlation(fmap1: jnp.ndarray, fmap2: jnp.ndarray) -> jnp.ndarray:
    """Full HW x HW correlation volume, normalized by sqrt(C).

    fmap1, fmap2: (B, H, W, C). Returns (B, H*W, H, W) with a trailing
    1-channel layout left implicit: we reshape to (B*H*W, H2, W2, 1) for the
    pyramid.  The matmul runs in fp32 accumulation on the MXU.
    """
    b, h, w, c = fmap1.shape
    f1 = fmap1.reshape(b, h * w, c)
    f2 = fmap2.reshape(b, h * w, c)
    corr = jax.lax.dot_general(
        f1, f2, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    corr = corr / math.sqrt(c)
    return corr.reshape(b, h * w, h, w)


def build_corr_pyramid(fmap1: jnp.ndarray, fmap2: jnp.ndarray,
                       num_levels: int = 4,
                       dtype=None) -> List[jnp.ndarray]:
    """List of (B*H1*W1, H2/2^i, W2/2^i, 1) volumes.

    Each level is computed as a direct matmul against the 2^i-avg-pooled
    fmap2 — mathematically identical to avg-pooling the level-0 volume
    (the dot product is linear: avgpool_j(dot(f1, f2)) == dot(f1,
    avgpool(f2)), the same identity AltCorrBlock relies on) but ~5x faster
    on v5e at 500x1000: pooling the reference's way (corr.py:25-27) first
    materializes the (B, H1W1, H2W2) matmul output and then repacks it into
    (Q, H2, W2, 1) tiles, and when W2 is not a multiple of the 128-lane
    tile that reshape is a full strided copy of the volume (measured 35 ms
    of a 45 ms build at W2=125).  Writing each level straight from the MXU
    in its final layout skips the repack; the 1.3x extra matmul FLOPs are
    noise next to it.

    ``dtype`` optionally stores the pyramid in reduced precision (bfloat16):
    the volume is the dominant HBM traffic of the whole RAFT iteration loop
    (~260 MB/lookup at Sintel resolution), so halving it halves lookup time;
    accumulations stay fp32 either way.
    """
    b, h, w, c = fmap1.shape
    f1 = fmap1.reshape(b, h * w, c)
    scale = 1.0 / math.sqrt(c)
    pyramid = []
    for i in range(num_levels):
        lvl = jnp.einsum("bic,bhwc->bihw", f1, fmap2,
                         preferred_element_type=jnp.float32) * scale
        if dtype is not None:
            lvl = lvl.astype(dtype)
        hl, wl = lvl.shape[2], lvl.shape[3]
        pyramid.append(lvl.reshape(b * h * w, hl, wl, 1))
        if i < num_levels - 1:
            fmap2 = avg_pool2d(fmap2, 2, 2)
    return pyramid


def _bilinear_onehot(pos0: jnp.ndarray, frac: jnp.ndarray, radius: int,
                     size: int, dtype) -> jnp.ndarray:
    """(Q,) integer corner + (Q,) fraction -> (Q, 2r+1, size) selection
    matrix R with R[q, a, p] = bilinear weight of table position p for the
    sample at pos0[q] + frac[q] + (a - r).

    Out-of-range positions simply match no column, which reproduces
    grid_sample's zero-padding semantics exactly — no pad, no mask.
    """
    n = 2 * radius + 1
    pos = pos0[:, None] + jnp.arange(-radius, radius + 1,
                                     dtype=pos0.dtype)[None]  # (Q, n)
    cols = jnp.arange(size, dtype=pos0.dtype)  # (size,)
    eq0 = (cols[None, None] == pos[..., None]).astype(dtype)
    eq1 = (cols[None, None] == (pos + 1)[..., None]).astype(dtype)
    f = frac[:, None, None].astype(dtype)
    return eq0 * (1 - f) + eq1 * f


def _lookup_grouped(pyramid: Sequence[jnp.ndarray], coords: jnp.ndarray,
                    radius: int, group: int) -> jnp.ndarray:
    """Block-diagonal grouped lookup (bit-identical to the ungrouped path).

    Packs ``group`` queries' one-hot contractions into one matmul pair per
    level: RY becomes a (G*n, G*H2) block-diagonal operator over the G
    queries' stacked slabs.  The G-fold zero padding wastes FLOPs but turns
    the per-query (n x H2) matmul stubs into MXU-efficient shapes —
    measured ~25% faster end-to-end on v5e at Sintel resolution.
    """
    b, h1, w1, _ = coords.shape
    q = b * h1 * w1
    n = 2 * radius + 1
    g = q // group
    cdtype = jnp.promote_types(coords.dtype, jnp.float32)
    cf = coords.reshape(g, group, 2).astype(cdtype)
    m = group * n
    r_io = jnp.arange(m)
    qq = r_io // n
    aa = r_io % n
    outs = []
    for i, corr in enumerate(pyramid):
        h2, w2 = corr.shape[1], corr.shape[2]
        dt = corr.dtype
        slab = corr[..., 0].reshape(g, group * h2, w2)
        cl = cf / (2 ** i)
        x0 = jnp.floor(cl[..., 0])
        y0 = jnp.floor(cl[..., 1])
        fx = (cl[..., 0] - x0).astype(dt)
        fy = (cl[..., 1] - y0).astype(dt)
        col = jnp.arange(group * h2)
        same = (qq[:, None] == (col // h2)[None, :])
        yy = (col % h2).astype(cdtype)
        y0r = y0[:, qq]
        fyr = fy[:, qq]
        ty = yy[None, None, :] - (y0r[..., None]
                                  + aa[None, :, None].astype(cdtype) - radius)
        ry = jnp.where(same[None],
                       (ty == 0) * (1 - fyr[..., None])
                       + (ty == 1) * fyr[..., None], 0.0).astype(dt)
        tmp = jnp.einsum("gmh,ghw->gmw", ry, slab,
                         preferred_element_type=jnp.float32).astype(dt)
        x0r = x0[:, qq]
        fxr = fx[:, qq]
        xx = jnp.arange(w2).astype(cdtype)
        txx = xx[None, None, :] - (x0r[..., None]
                                   + aa[None, :, None].astype(cdtype)
                                   - radius)
        rx = ((txx == 0) * (1 - fxr[..., None])
              + (txx == 1) * fxr[..., None]).astype(dt)
        big = jnp.einsum("gaw,gbw->gab", rx, tmp,
                         preferred_element_type=jnp.float32).astype(dt)
        bigr = big.reshape(g, group, n, group, n)
        diag = jnp.einsum("gqaqb->gqab", bigr)
        outs.append(diag.reshape(b, h1, w1, n * n))
    return jnp.concatenate(outs, axis=-1)


def _pallas_tile(q: int, target: int = 9, lo: int = 4, hi: int = 24) -> int:
    """Divisor of ``q`` nearest ``target`` for the Pallas lookup's query
    tile (ties -> larger).  Same trade-off as ``_best_group``: the
    block-diagonal stage-1 matmul wastes FLOPs linearly in the tile size,
    while grid/DMA overhead grows as tiles shrink.  Returns 0 when no
    divisor exists (-> caller falls back to the XLA grouped path)."""
    best = 0
    for t in range(lo, hi + 1):
        if q % t == 0 and (best == 0
                           or abs(t - target) < abs(best - target)
                           or (abs(t - target) == abs(best - target)
                               and t > best)):
            best = t
    return best


def _lookup_pallas(pyramid: Sequence[jnp.ndarray], coords: jnp.ndarray,
                   radius: int) -> Optional[jnp.ndarray]:
    """Pallas lookup: the one-hot operands are generated in-register.

    The XLA formulations above are HBM-bound: per iteration they stream
    both the pyramid (~330 MB at Sintel resolution) *and* the materialized
    block-diagonal one-hot selectors (~250 MB, g-fold redundant vs their
    14 MB of true content) — see the structural-ceiling note on
    ``_best_group``.  This kernel removes the second stream entirely: each
    grid cell DMAs only its slab tile (T queries' level maps, one
    contiguous chunk of the (Q*H2, W2) view) and builds the bilinear
    selectors from the coords scalars with ``broadcasted_iota``-style
    comparisons directly in VMEM, then runs the same two MXU contractions
    as ``_lookup_grouped``:

        tmp  = RYblk (T*n, T*H2) @ slab (T*H2, W2)          # block-diag
        out2 = RX    (T*n, W2)   @ tmp^T-contraction         # full, then
        out[t, a, b] = out2[t*n + a, t*n + b]                # diag blocks

    Bit-matching semantics with the XLA paths (zero padding outside the
    map via no-match comparisons; the first window axis offsets x, the
    reference quirk from corr.py:37-50).  Returns None when no suitable
    query-tile divisor exists.
    """
    from jax.experimental import pallas as pl

    b, h1, w1, _ = coords.shape
    q = b * h1 * w1
    t_tile = _pallas_tile(q)
    if t_tile == 0:
        return None
    n = 2 * radius + 1
    tn = t_tile * n
    interpret = jax.default_backend() != "tpu"
    cf = coords.reshape(q, 2).astype(jnp.float32)
    out_dt = pyramid[0].dtype

    # static selector-index helpers (numpy: shapes are trace-time constants)
    rowt = np.arange(tn) // n
    sel = (rowt[:, None] == np.arange(t_tile)[None]).astype(np.float32)
    arow = (np.arange(tn) % n - radius).astype(np.float32)[:, None]

    outs = []
    for i, corr in enumerate(pyramid):
        h2, w2 = corr.shape[1], corr.shape[2]
        slab2d = corr.reshape(q * h2, w2)  # row-major view: no copy
        hcol = (np.arange(t_tile * h2) % h2).astype(np.float32)[None]
        maskh = (rowt[:, None] == (np.arange(t_tile * h2)[None] // h2)
                 ).astype(np.float32)
        wcol = np.arange(w2, dtype=np.float32)[None]
        inv = 1.0 / (2 ** i)

        def kernel(coords_ref, c_ref, sel_ref, arow_ref, hcol_ref,
                   maskh_ref, wcol_ref, o_ref):
            cxy = coords_ref[...]  # (T, 2) fp32
            xl = cxy[:, 0] * inv
            yl = cxy[:, 1] * inv
            x0 = jnp.floor(xl)
            y0 = jnp.floor(yl)
            fx = xl - x0
            fy = yl - y0
            s = sel_ref[...]  # (T*n, T) one-hot of each row's query
            y0r = (s * y0[None, :]).sum(1, keepdims=True)  # (T*n, 1)
            fyr = (s * fy[None, :]).sum(1, keepdims=True)
            x0r = (s * x0[None, :]).sum(1, keepdims=True)
            fxr = (s * fx[None, :]).sum(1, keepdims=True)
            a = arow_ref[...]  # (T*n, 1) window offset - radius
            ty = hcol_ref[...] - (y0r + a)  # (T*n, T*H2)
            ry = maskh_ref[...] * ((ty == 0) * (1 - fyr) + (ty == 1) * fyr)
            c = c_ref[...].astype(jnp.float32)  # (T*H2, W2)
            tmp = jax.lax.dot_general(
                ry, c, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (T*n, W2)
            tx = wcol_ref[...] - (x0r + a)  # (T*n, W2)
            rx = (tx == 0) * (1 - fxr) + (tx == 1) * fxr
            out2 = jax.lax.dot_general(
                rx, tmp, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # (T*n_a, T*n_b)
            for t in range(t_tile):
                o_ref[t] = out2[t * n:(t + 1) * n, t * n:(t + 1) * n]

        lvl = pl.pallas_call(
            kernel,
            grid=(q // t_tile,),
            in_specs=[
                pl.BlockSpec((t_tile, 2), lambda g: (g, 0)),
                pl.BlockSpec((t_tile * h2, w2), lambda g: (g, 0)),
                pl.BlockSpec((tn, t_tile), lambda g: (0, 0)),
                pl.BlockSpec((tn, 1), lambda g: (0, 0)),
                pl.BlockSpec((1, t_tile * h2), lambda g: (0, 0)),
                pl.BlockSpec((tn, t_tile * h2), lambda g: (0, 0)),
                pl.BlockSpec((1, w2), lambda g: (0, 0)),
            ],
            out_specs=pl.BlockSpec((t_tile, n, n), lambda g: (g, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((q, n, n), jnp.float32),
            interpret=interpret,
        )(cf, slab2d, sel, arow, hcol, maskh, wcol)
        outs.append(lvl.reshape(b, h1, w1, n * n).astype(out_dt))
    return jnp.concatenate(outs, axis=-1)


def _best_group(q: int, target: int = 8, lo: int = 3, hi: int = 12) -> int:
    """Divisor of ``q`` nearest ``target`` (ties -> larger).

    The block-diagonal grouped lookup needs ``q % group == 0``; swept
    in-model on v5e at RAFT@500x1000 (32-iter scan): g=9 75.1 ms, g=7 76.3,
    g=5 77.2 vs ungrouped 99 and packed 91 — small groups win (the one-hot
    operand, whose streaming load bounds the einsum, grows with g).
    Returns 0 when no divisor exists (-> ungrouped path).

    Structural ceiling (round-5 profile, raft_small@500x1000, 32 iters):
    the in-model lookup is ~1.2 ms/iter and every alternative measured
    slower (grouped3/5/7 57.7-62.5 ms total vs auto=grouped9 54.8; packed
    63.1; per-level 58.4; unroll=2 58.3; barriers no-op).  The iteration
    is HBM-bound: per iteration the einsums stream the full pyramid
    (~330 MB) plus the materialized block-diagonal one-hots (~250 MB,
    9x redundant vs their 14 MB of true content) — XLA cannot generate
    the one-hot tiles in VMEM, and the gather formulations that avoid
    them serialize (measured 5x slower).  Fusing the one-hot generation
    into the matmul needs a Pallas kernel whose LHS tile is computed
    in-register from the coords scalars; that is the one remaining lever
    for the RAFT-family per-iteration floor.
    """
    best = 0
    for g in range(lo, hi + 1):
        if q % g == 0 and (best == 0 or abs(g - target) < abs(best - target)
                           or (abs(g - target) == abs(best - target)
                               and g > best)):
            best = g
    return best


def pack_pyramid(pyramid: Sequence[jnp.ndarray]) -> Tuple[jnp.ndarray,
                                                          Tuple[Tuple[int, int], ...]]:
    """Concatenate a single-channel pyramid into one (Q, sum(H_l), Wp) slab.

    Wp is the widest level padded up to the 128-lane tile.  Done once per
    forward (outside the iteration loop) so the per-iteration lookup is a
    single pair of einsums over one contiguous buffer — fewer kernels and a
    stable layout, which matters more on TPU than the padded-width FLOPs.
    Returns (packed slab, ((H_l, W_l), ...) level shapes).
    """
    q = pyramid[0].shape[0] * (1 if pyramid[0].ndim == 3 else 1)
    shapes = tuple((int(p.shape[1]), int(p.shape[2])) for p in pyramid)
    wp = -(-max(w for _, w in shapes) // 128) * 128
    parts = []
    for p in pyramid:
        s = p[..., 0] if p.ndim == 4 else p
        parts.append(jnp.pad(s, ((0, 0), (0, 0), (0, wp - s.shape[2]))))
    return jnp.concatenate(parts, axis=1), shapes


def lookup_packed(packed: jnp.ndarray, shapes, coords: jnp.ndarray,
                  radius: int) -> jnp.ndarray:
    """Lookup on a :func:`pack_pyramid` slab; bit-identical output layout to
    :func:`corr_pyramid_lookup` for single-channel pyramids.

    Per level l, window slot s = l*n + o selects (bilinearly) row
    ``row_off[l] + y0/2^l + o - r``; rows outside the level's block are
    masked so a window never bleeds into the neighbouring level.  The x
    one-hot needs no mask: each level's rows are zero-padded to Wp, so
    out-of-width columns read exact zeros (grid_sample zero padding).
    """
    b, h1, w1, _ = coords.shape
    q = b * h1 * w1
    n = 2 * radius + 1
    L = len(shapes)
    m = L * n
    hsum, wp = packed.shape[1], packed.shape[2]
    dt = packed.dtype
    cdtype = jnp.promote_types(coords.dtype, jnp.float32)
    cf = coords.reshape(q, 2).astype(cdtype)

    lvl = jnp.arange(m) // n                       # (m,) level of each slot
    off = jnp.arange(m) % n - radius               # (m,) window offset
    row_off = jnp.asarray(
        np.cumsum([0] + [h for h, _ in shapes[:-1]]), cdtype)
    heights = jnp.asarray([h for h, _ in shapes], cdtype)
    scale = jnp.asarray([2.0 ** i for i in range(L)], cdtype)

    cy = cf[:, 1:2] / scale[None]                  # (q, L)
    cx = cf[:, 0:1] / scale[None]
    y0 = jnp.floor(cy)
    x0 = jnp.floor(cx)
    fy = (cy - y0)[:, lvl].astype(dt)              # (q, m)
    fx = (cx - x0)[:, lvl].astype(dt)

    ty = y0[:, lvl] + off[None]                    # (q, m) local target row
    hl = heights[lvl][None]                        # (1, m)
    aby = ty + row_off[lvl][None]                  # absolute row of floor tap
    rows = jnp.arange(hsum, dtype=cdtype)
    in0 = (ty >= 0) & (ty <= hl - 1)
    in1 = (ty + 1 >= 0) & (ty + 1 <= hl - 1)
    e0 = (rows[None, None] == aby[..., None]) & in0[..., None]
    e1 = (rows[None, None] == (aby + 1)[..., None]) & in1[..., None]
    ry = (e0.astype(dt) * (1 - fy)[..., None]
          + e1.astype(dt) * fy[..., None])         # (q, m, hsum)

    tx = x0[:, lvl] + off[None]                    # (q, m) target col
    cols = jnp.arange(wp, dtype=cdtype)
    f0 = cols[None, None] == tx[..., None]
    f1 = cols[None, None] == (tx + 1)[..., None]
    rx = (f0.astype(dt) * (1 - fx)[..., None]
          + f1.astype(dt) * fx[..., None])         # (q, m, wp)

    tmp = jnp.einsum("qbv,qvw->qbw", ry, packed,
                     preferred_element_type=jnp.float32).astype(dt)
    big = jnp.einsum("qaw,qbw->qab", rx, tmp,
                     preferred_element_type=jnp.float32).astype(dt)
    # per-level diagonal 9x9 blocks; a offsets x (the reference quirk)
    diag = jnp.einsum("qlalb->qlab", big.reshape(q, L, n, L, n))
    return diag.reshape(b, h1, w1, m * n)


def make_corr_lookup(pyramid: Sequence[jnp.ndarray], radius: int,
                     impl: str = "auto"):
    """Precompute a lookup closure for this pyramid (call OUTSIDE the scan).

    ``impl`` selects the formulation (all bit-identical):
    - "auto" (default): block-diagonal grouped with the best divisor of the
      query count near 8 (fastest measured in-model on v5e), ungrouped
      per-level if none exists
    - "packed": levels concatenated into one slab, one einsum pair per
      iteration (see :func:`lookup_packed`)
    - "packed_barrier": same, with an optimization barrier pinning the
      packed slab so its layout materializes outside the iteration loop
    - "levels": per-level one-hot einsums (smallest one-hot operands)
    - "levels_barrier": per-level + barrier on the pyramid
    - "grouped<g>": block-diagonal grouped with group g (e.g. "grouped5")
    """
    single = all(p.ndim == 4 and p.shape[3] == 1 for p in pyramid)
    if not single:
        return lambda coords: corr_pyramid_lookup(pyramid, coords, radius)
    if impl == "auto":
        # (measured and rejected: padding the query axis to the 128-sublane
        # tile makes the isolated lookup ~12% faster — q=7875 g=9 0.407
        # ms/iter vs q=7936 g=8 0.356 — but in-model the one-time pyramid
        # pad copy plus the per-iteration output slice eat the whole win:
        # raft_small 57.3 ms padded vs 56.7 grouped on v5e)
        return lambda coords: corr_pyramid_lookup(pyramid, coords, radius,
                                                  group=None)
    if impl == "pallas":
        def _pallas_or_grouped(coords):
            out = _lookup_pallas(pyramid, coords, radius)
            if out is None:  # no query-tile divisor: XLA grouped fallback
                return corr_pyramid_lookup(pyramid, coords, radius,
                                           group=None)
            return out
        return _pallas_or_grouped
    if impl.startswith("packed"):
        packed, shapes = pack_pyramid(pyramid)
        if impl.endswith("barrier"):
            packed = jax.lax.optimization_barrier(packed)
        return lambda coords: lookup_packed(packed, shapes, coords, radius)
    if impl.startswith("grouped"):
        g = int(impl[len("grouped"):] or 8)
        return lambda coords: corr_pyramid_lookup(pyramid, coords, radius,
                                                  group=g)
    if impl.endswith("barrier"):
        pyramid = jax.lax.optimization_barrier(tuple(pyramid))
    return lambda coords: corr_pyramid_lookup(pyramid, coords, radius,
                                              group=0)


def corr_pyramid_lookup(pyramid: Sequence[jnp.ndarray], coords: jnp.ndarray,
                        radius: int,
                        group: Optional[int] = None) -> jnp.ndarray:
    """Sample each pyramid level in a (2r+1)^2 window around coords.

    coords: (B, H1, W1, 2) pixel coords (x, y) on the level-0 grid.
    Returns (B, H1, W1, L*(2r+1)^2), channel order identical to the torch
    reference (level-major; within a level, the reference adds
    meshgrid(dy, dx)[..., (dy, dx)] to (x, y), i.e. the first window axis
    offsets x — reproduced exactly here; see corr.py:37-50).

    TPU-first implementation: because the bilinear fractions are shared by
    the whole (2r+1)^2 window (integer offsets), the lookup factorizes into
    two batched one-hot matmuls per level,
        out[q, a, b] = Rx[q, a, :] . slab[q] . Ry[q, b, :]^T,
    which run on the MXU instead of as XLA gathers (the reference's
    grid_sample path, corr.py:29-54, is a gather — the #1 TPU bottleneck).
    Single-channel pyramids additionally use the block-diagonal grouped
    form (see _lookup_grouped); ``group=None`` auto-picks the best divisor
    of the query count near 8 (see ``_best_group``), ``group=0`` disables.
    """
    b_, h1_, w1_, _ = coords.shape
    q_ = b_ * h1_ * w1_
    single_channel = all(p.ndim == 4 and p.shape[3] == 1 for p in pyramid)
    if group is None and single_channel:
        group = _best_group(q_)
    if group and group > 1 and single_channel and q_ % group == 0:
        return _lookup_grouped(pyramid, coords, radius, group)
    b, h1, w1, _ = coords.shape
    B = b * h1 * w1
    r = radius
    n = 2 * r + 1
    cdtype = jnp.promote_types(coords.dtype, jnp.float32)
    centroid = coords.reshape(B, 2).astype(cdtype)

    out_pyramid = []
    for i, corr in enumerate(pyramid):
        h2, w2 = corr.shape[1], corr.shape[2]
        nch = corr.shape[3] if corr.ndim == 4 else 1
        slab = corr.reshape(B, h2, w2, nch)
        xc = centroid[:, 0] / (2 ** i)
        yc = centroid[:, 1] / (2 ** i)
        x0 = jnp.floor(xc)
        y0 = jnp.floor(yc)
        dt = slab.dtype
        rx = _bilinear_onehot(x0, xc - x0, r, w2, dt)  # (B, n, W2)
        ry = _bilinear_onehot(y0, yc - y0, r, h2, dt)  # (B, n, H2)
        tmp = jnp.einsum("qby,qyxc->qbxc", ry, slab,
                         preferred_element_type=jnp.float32)
        # out[q, c, a, b]: channel-major; first window axis offsets x (the
        # reference quirk, corr.py:37-50)
        outl = jnp.einsum("qbxc,qax->qcab", tmp.astype(dt), rx,
                          preferred_element_type=jnp.float32)
        out_pyramid.append(outl.reshape(b, h1, w1, nch * n * n).astype(dt))
    return jnp.concatenate(out_pyramid, axis=-1)


class AltCorrBlock:
    """Memory-efficient on-the-fly windowed correlation (the reference's
    alt_cuda_corr extension, utils/external/alt_cuda_corr/correlation_kernel.cu:19-121
    via AlternateCorrBlock, models/raft/corr.py:67-118).

    Numerically identical to ``CorrBlock`` — the dot product is linear, so
    dot(f1, bilerp(avgpool(f2))) == bilerp(avgpool(dot(f1, f2))) — but uses
    O(HW * (2r+1)^2) memory per lookup instead of materializing the
    O((HW)^2) volume, which is what makes the fine scales of MS-RAFT+/CCMR+
    (1/4 and 1/2 resolution) representable at all.
    """

    def __init__(self, fmap1: jnp.ndarray, fmap2: jnp.ndarray,
                 num_levels: int = 4, radius: int = 4):
        self.num_levels = num_levels
        self.radius = radius
        self.fmap1 = fmap1
        m = 2 * radius + 2
        # Each level is zero-padded by the window extent ONCE here —
        # __call__ runs inside the iteration scan, and XLA does not
        # reliably hoist the pad copy out of the loop body.  (A
        # take_along_axis variant on the unpadded maps — the round-3
        # lowering — was re-measured against this one on v5e and lost at
        # every AltCorr user's shape: ccmr 527 vs 470 ms total; the r3
        # file itself measures 785 ms in today's runtime, so the old
        # 225 ms row reflected an older libtpu, not a faster lowering.)
        self.f2_pyramid = []
        for _ in range(num_levels):
            self.f2_pyramid.append(
                jnp.pad(fmap2, ((0, 0), (m, m), (m, m), (0, 0))))
            fmap2 = avg_pool2d(fmap2, 2, 2)

    # Cap on the gathered-patch intermediate, in unpadded fp32 elements.
    # At the finest CCMR+/MS-RAFT+ level (1/2 res, q = 256x512 at
    # 500x1000 input) the all-queries patch tensor is q*m*m*c = 838M
    # elements = 3.1 GB unpadded and >2x that after (8,128) tile padding
    # — it alone OOMs a 16 GB chip.  Chunking the query axis through
    # lax.map keeps HBM traffic identical (same gathers, serialized)
    # while bounding the live intermediate.
    _MAX_PATCH_ELEMS = 1 << 26

    def _level_corr(self, f1, f2p, base, r):
        """Windowed corr for one pyramid level over q queries.

        f1 (q, c) query features; f2p (h2+2m, w2+2m, c) ZERO-PADDED level
        map; base (q, 2) window centers in unpadded level coords;
        returns (q, n*n).  All (2r+1)^2 taps share the query's
        fractional offset, so instead of n^2 bilinear samples (4 corner
        gathers each — the reference CUDA kernel's memory pattern) this
        gathers the (n+1)x(n+1) integer patch around floor(base) once,
        contracts with f1 on the channel axis, and applies the shared
        2x2 bilinear stencil to the resulting SCALAR grid — 4C fewer
        bytes per tap.

        The patch is fetched as m ROW SEGMENTS per query via lax.gather
        with slice_sizes (1, m, c): each gather element is a contiguous
        m*c-float row strip, ~10x larger than the single-(y, x) rows
        take_along_axis lowers to, which measured 1.7x faster on v5e
        (43 vs 75 ms at the CCMR+ finest level, q = 256x512).  Boundary
        semantics come from the zero margin instead of per-tap masks:
        with pad = m >= r+2, every partially-overlapping window reads
        its out-of-range taps from the zeros, and fully-out-of-range
        windows (CLIP mode shifts their start) land entirely in the
        margin — exactly grid_sample's zeros padding, no masking ops.
        """
        q, c = f1.shape
        n = 2 * r + 1
        m = n + 1
        pad = m
        h2, w2 = f2p.shape[0] - 2 * pad, f2p.shape[1] - 2 * pad
        x0 = jnp.floor(base[..., 0])
        y0 = jnp.floor(base[..., 1])
        fx = (base[..., 0] - x0)[:, None, None]  # (q, 1, 1)
        fy = (base[..., 1] - y0)[:, None, None]
        sy = (y0.astype(jnp.int32) - r + pad)[:, None] + jnp.arange(m)
        sx = jnp.broadcast_to((x0.astype(jnp.int32) - r + pad)[:, None],
                              sy.shape)
        starts = jnp.stack([sy, sx], axis=-1).reshape(q * m, 2)
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2), collapsed_slice_dims=(0,),
            start_index_map=(0, 1))
        g = jax.lax.gather(f2p, starts, dn, slice_sizes=(1, m, c),
                           mode=jax.lax.GatherScatterMode.CLIP)
        d = jnp.einsum("qc,qtc->qt", f1,
                       g.reshape(q, m * m, c),
                       preferred_element_type=jnp.float32)
        d = d.reshape(q, m, m)
        wy0 = (1.0 - fy)
        wx0 = (1.0 - fx)
        val = (wy0 * (wx0 * d[:, :n, :n] + fx * d[:, :n, 1:])
               + fy * (wx0 * d[:, 1:, :n] + fx * d[:, 1:, 1:]))
        # (q, dy, dx) -> reference channel order: x on the SLOW
        # window axis (corr.py:40-47)
        return val.swapaxes(1, 2).reshape(q, n * n)

    def __call__(self, coords: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = self.fmap1.shape
        r = self.radius
        n = 2 * r + 1
        m = n + 1
        q = h * w
        f1 = self.fmap1.reshape(b, q, c)
        cdtype = jnp.promote_types(coords.dtype, jnp.float32)
        outs = []
        for i, f2p in enumerate(self.f2_pyramid):
            base = (coords.reshape(b, q, 2) / (2 ** i)).astype(cdtype)
            nchunks = 1
            while (q // nchunks) * m * m * c > self._MAX_PATCH_ELEMS \
                    and q % (nchunks * 2) == 0:
                nchunks *= 2

            def one_batch(f1b, f2pb, baseb):
                if nchunks == 1:
                    return self._level_corr(f1b, f2pb, baseb, r)
                qc = q // nchunks
                val = jax.lax.map(
                    lambda a: self._level_corr(a[0], f2pb, a[1], r),
                    (f1b.reshape(nchunks, qc, c),
                     baseb.reshape(nchunks, qc, 2)))
                return val.reshape(q, n * n)

            if b == 1:
                val = one_batch(f1[0], f2p[0], base[0])[None]
            else:
                val = jax.vmap(one_batch)(f1, f2p, base)
            val = val.reshape(b, h, w, n * n)
            outs.append((val / math.sqrt(c)).astype(self.fmap1.dtype))
        return jnp.concatenate(outs, axis=-1)


class CorrBlock:
    """Functional equivalent of the reference CorrBlock (corr.py:12-64)."""

    def __init__(self, fmap1: jnp.ndarray, fmap2: jnp.ndarray,
                 num_levels: int = 4, radius: int = 4):
        self.num_levels = num_levels
        self.radius = radius
        self.pyramid = build_corr_pyramid(fmap1, fmap2, num_levels)

    def __call__(self, coords: jnp.ndarray) -> jnp.ndarray:
        return corr_pyramid_lookup(self.pyramid, coords, self.radius)


def local_correlation(fmap1: jnp.ndarray, fmap2: jnp.ndarray,
                      max_displacement: int,
                      coords: Optional[jnp.ndarray] = None,
                      normalize: bool = True,
                      dilation: int = 1,
                      stride: int = 1) -> jnp.ndarray:
    """PWC-style local correlation over a (2d+1)^2 displacement window.

    Equivalent to ``iter_(translated_)spatial_correlation_sample`` with
    kernel_size=1 (/root/reference/ptlflow/utils/correlation.py:35,276) —
    the configuration every zoo model uses.  When ``coords`` is given the
    window is centered at the (flow-translated) coords instead of identity.

    Returns (B, H, W, (2d+1)^2); channel order (dy, dx) row-major, matching
    the torch sampler's (ph, pw) output layout flattened.
    """
    b, h, w, c = fmap1.shape
    d = max_displacement
    n = 2 * d + 1
    if coords is None:
        # Pure shifting — XLA handles this as cheap pads/slices.
        # ``dilation`` strides the displacement window (FlowNetC's
        # dilation_patch=2 correlation, flownet/submodules.py:138-152).
        pd = d * dilation
        f2pad = jnp.pad(fmap2, ((0, 0), (pd, pd), (pd, pd), (0, 0)))
        outs = []
        for dy in range(-d, d + 1):
            for dx in range(-d, d + 1):
                shifted = jax.lax.dynamic_slice(
                    f2pad, (0, pd + dy * dilation, pd + dx * dilation, 0),
                    (b, h, w, c))
                outs.append(jnp.sum(fmap1 * shifted, axis=-1))
        corr = jnp.stack(outs, axis=-1)
        if stride > 1:  # strided query positions (LiteFlowNet coarse levels)
            corr = corr[:, ::stride, ::stride]
    else:
        base = coords  # (B, H, W, 2) pixel coords into fmap2
        dr = jnp.arange(-d, d + 1, dtype=base.dtype)
        dyy, dxx = jnp.meshgrid(dr, dr, indexing="ij")
        offsets = jnp.stack([dxx, dyy], axis=-1).reshape(-1, 2)  # (n*n, 2):(x,y)
        sample_coords = base[:, :, :, None, :] + offsets[None, None, None]
        sc = sample_coords.reshape(b, h, w * n * n, 2)
        f2s = bilinear_sampler(fmap2, sc).reshape(b, h, w, n * n, c)
        corr = jnp.einsum("bhwc,bhwkc->bhwk", fmap1, f2s)
    if normalize:
        corr = corr / c
    return corr
