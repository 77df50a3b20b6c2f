"""GANet aggregation ops for SeparableFlow, TPU-native.

Replaces the reference's CUDA extension
(/root/reference/ptlflow/models/separableflow/libs/GANet/):

- ``sga``: semi-global aggregation (GANet_kernel.cu sga_down_forward :66-127,
  sga_up_forward :285-348, sga_right_forward :507-567, sga_left_forward
  :720-780, max-combined per sga_kernel_forward :935-1000).  Each direction
  is a first-order recursion over rows (or columns) of a (B, C, D, H, W)
  cost volume with 5 guidance weights: current, previous-aligned,
  previous-(d-1), previous-(d+1), and previous-argmax.  The argmax term
  makes the recursion non-associative, so each direction is a lax.scan over
  the ~H/8 scan axis with everything else vectorized.
- ``nlf_iter``: non-local filter chain down->up->right->left
  (NLF_kernel.cu :22-260, modules/GANet.py NLFIter :252-260).  Each
  direction is a 2-D recursion: across the scan axis it is sequential, and
  *within* each row (column) there is a first-order linear recurrence on the
  previous pixel, which we evaluate with an associative scan (parallel
  prefix) — O(H + log W) depth instead of the CUDA kernel's O(H*W) serial
  loop per lane.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _l1_normalize(g: jnp.ndarray, axis: int = 1) -> jnp.ndarray:
    """torch F.normalize(p=1): divide by sum of absolute values."""
    denom = jnp.sum(jnp.abs(g), axis=axis, keepdims=True)
    return g / jnp.maximum(denom, 1e-12)


def _sga_scan_down(x: jnp.ndarray, g: jnp.ndarray,
                   unroll: int = 8) -> jnp.ndarray:
    """One SGA direction, scanning axis 0.

    x: (H, B, C, W, D); g: (H, B, 5, W).  Returns (H, B, C, W, D).
    out[r] = x[r]*f0 + p*f1 + p(d-1)*f2 + p(d+1)*f3 + p[argmax d]*f4 with
    p = out[r-1]; all p-terms fall back to x[r] at boundaries.
    """
    f = g[:, :, :, None, :, None]  # (H, B, 5, 1, W, 1)

    def first_row(x0, f0):
        return x0 * jnp.sum(f0, axis=1)

    def step(prev, inp):
        x_r, f_r = inp
        f0, f1, f2, f3, f4 = [f_r[:, i] for i in range(5)]
        pdm = jnp.concatenate([x_r[..., :1], prev[..., :-1]], -1)
        pdp = jnp.concatenate([prev[..., 1:], x_r[..., -1:]], -1)
        k = jnp.argmax(prev, axis=-1)[..., None]
        pk = jnp.take_along_axis(prev, k, axis=-1)
        out = x_r * f0 + prev * f1 + pdm * f2 + pdp * f3 + pk * f4
        return out, out

    out0 = first_row(x[0], f[0])
    _, ys = jax.lax.scan(step, out0, (x[1:], f[1:]), unroll=unroll)
    return jnp.concatenate([out0[None], ys], axis=0)


def sga(x: jnp.ndarray, g0, g1, g2, g3) -> jnp.ndarray:
    """Semi-global aggregation, elementwise max over 4 directions.

    x: (B, C, D, H, W); g*: (B, 5, H, W) L1-normalized guidance for
    down/up/right/left.  Returns (B, C, D, H, W).

    Opposite directions share one scan (the flipped volume rides along in
    the batch axis), halving the sequential step count; ``unroll`` in the
    scans amortizes TPU loop dispatch overhead over fused steps.
    """
    b = x.shape[0]
    # down+up: scan over H. layout (H, 2B, C, W, D); up is H-flipped.
    xs = x.transpose(3, 0, 1, 4, 2)
    xp = jnp.concatenate([xs, xs[::-1]], axis=1)
    gp = jnp.concatenate([g0.transpose(2, 0, 1, 3),
                          g1.transpose(2, 0, 1, 3)[::-1]], axis=1)
    out = _sga_scan_down(xp, gp)
    best = jnp.maximum(out[:, :b], out[::-1, b:])
    # right+left: scan over W. layout (W, 2B, C, H, D)
    xs_w = x.transpose(4, 0, 1, 3, 2)
    xpw = jnp.concatenate([xs_w, xs_w[::-1]], axis=1)
    gpw = jnp.concatenate([g2.transpose(3, 0, 1, 2),
                           g3.transpose(3, 0, 1, 2)[::-1]], axis=1)
    outw = _sga_scan_down(xpw, gpw)
    best_w = jnp.maximum(outw[:, :b], outw[::-1, b:])
    # (W, B, C, H, D) -> (H, B, C, W, D)
    best = jnp.maximum(best, best_w.transpose(3, 1, 2, 0, 4))
    return best.transpose(1, 2, 4, 0, 3)


def _linear_recurrence(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """y[t] = a[t] + b[t] * y[t-1] along axis 0 via associative scan."""

    def combine(left, right):
        a1, b1 = left
        a2, b2 = right
        return a2 + b2 * a1, b2 * b1

    ys, _ = jax.lax.associative_scan(combine, (a, b), axis=0)
    return ys


def _nlf_direction(x: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    """One NLF direction in the 'down' orientation (NLF_kernel.cu:22-78).

    x: (B, C, H, W); g: (B, 5, H, W).  Row recursion with terms
    (r,c)*f0, (r-1,c)*f1, (r-1,c-1)*f2, (r-1,c+1)*f3, (r,c-1)*f4;
    boundary fallbacks use x[r,c].  The same-row (r,c-1) term is the
    linear-recurrence coefficient solved by associative scan per row.
    """
    b, c, h, w = x.shape
    xs = x.transpose(2, 0, 1, 3)  # (H, B, C, W)
    fs = g.transpose(2, 0, 1, 3)[:, :, :, None, :]  # (H, B, 5, 1, W)

    def row_update(prev, x_r, f_r):
        # prev: (B, C, W) updated previous row (or None semantics folded in)
        f0, f1, f2, f3, f4 = [f_r[:, i] for i in range(5)]
        pcm = jnp.concatenate([x_r[..., :1], prev[..., :-1]], -1)
        pcp = jnp.concatenate([prev[..., 1:], x_r[..., -1:]], -1)
        const = x_r * f0 + prev * f1 + pcm * f2 + pcp * f3
        # within-row: out[c] = const[c] + f4[c] * out[c-1]; col 0 falls back
        # to x_r[0] for the left term
        a = const.at[..., 0].add(x_r[..., 0] * f4[..., 0])
        bcoef = jnp.concatenate(
            [jnp.zeros_like(x_r[..., :1]),
             f4[..., 1:] * jnp.ones_like(x_r[..., 1:])], -1)
        # scan along W: move W to axis 0
        ys = _linear_recurrence(a.transpose(2, 0, 1), bcoef.transpose(2, 0, 1))
        return ys.transpose(1, 2, 0)

    def first_row(x0, f0_):
        f0, f1, f2, f3, f4 = [f0_[:, i] for i in range(5)]
        # at row 0 every (r-1, *) term falls back to x0[c]; the (r, c-1)
        # term still recurses within the row
        const = x0 * (f0 + f1 + f2 + f3)
        a = const.at[..., 0].add(x0[..., 0] * f4[..., 0])
        bcoef = jnp.concatenate(
            [jnp.zeros_like(x0[..., :1]),
             f4[..., 1:] * jnp.ones_like(x0[..., 1:])], -1)
        ys = _linear_recurrence(a.transpose(2, 0, 1), bcoef.transpose(2, 0, 1))
        return ys.transpose(1, 2, 0)

    out0 = first_row(xs[0], fs[0])

    def step(prev, inp):
        x_r, f_r = inp
        out = row_update(prev, x_r, f_r)
        return out, out

    _, ys = jax.lax.scan(step, out0, (xs[1:], fs[1:]), unroll=4)
    out = jnp.concatenate([out0[None], ys], axis=0)
    return out.transpose(1, 2, 0, 3)


def nlf_down(x, g):
    return _nlf_direction(x, g)


def _swap23(g):
    """Flip-induced channel fixup: mirroring both axes maps the template's
    diagonal terms (r-1,c-1)/(r-1,c+1) onto (r+1,c+1)/(r+1,c-1), but the
    reference up/left kernels pair f2 with (r+1,c-1) and f3 with (r+1,c+1)
    (NLF_kernel.cu:107-121, 222-238) — so guidance channels 2 and 3 swap."""
    return jnp.stack([g[:, 0], g[:, 1], g[:, 3], g[:, 2], g[:, 4]], axis=1)


def nlf_up(x, g):
    g = _swap23(g)
    return _nlf_direction(x[:, :, ::-1, ::-1], g[:, :, ::-1, ::-1])[
        :, :, ::-1, ::-1]


def nlf_right(x, g):
    # scan over W with within-column recursion over H: transpose H<->W
    return _nlf_direction(x.transpose(0, 1, 3, 2),
                          g.transpose(0, 1, 3, 2)).transpose(0, 1, 3, 2)


def nlf_left(x, g):
    g = _swap23(g)
    return _nlf_direction(x[:, :, ::-1, ::-1].transpose(0, 1, 3, 2),
                          g[:, :, ::-1, ::-1].transpose(0, 1, 3, 2)).transpose(
        0, 1, 3, 2)[:, :, ::-1, ::-1]


def nlf_iter(x, g0, g1, g2, g3):
    """Chained directional filters (modules/GANet.py NLFIter :252-260).
    x: (B, C, H, W); g*: (B, 5, H, W) (L1-normalized by the caller)."""
    x = nlf_down(x, g0)
    x = nlf_up(x, g1)
    x = nlf_right(x, g2)
    x = nlf_left(x, g3)
    return x
