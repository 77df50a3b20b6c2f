"""SCV: Sparse Cost Volume flow (Displacement-Invariant Matching, top-k).

Parity with /root/reference/ptlflow/models/scv/scv.py (compute_sparse_corr
:48-84, SCVQuarter :148-328, SCVEighth :328-502) and utils.py
(compute_interpolation_weights :148-175).

TPU design: the reference's faiss GPU k-NN (inner-product search,
knn.py:88-116) is an exact `jax.lax.top_k` over the full correlation matrix
— one MXU matmul + top-k, no external library.  The per-iteration sparse
bilinear splat into 9x9 windows at 5 scales (torch.sparse coalesce) is a
flat scatter-add with out-of-window entries dropped; the iteration loop is
a lax.scan with (net, coords1, displaced top-k coords, delta) carry.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ... import nn
from ...ops.correlation import coords_grid
from ...ops.upsample import convex_upsample
from ...ops.warp import forward_interpolate
from ...utils.registry import register_model, trainable
from ..base import BaseModel
from ..raft.raft import SequenceLoss
from .extractor import BasicEncoder, BasicEncoderQuarter
from .update import BasicUpdateBlock, BasicUpdateBlockQuarter


def compute_sparse_corr(fmap1: jnp.ndarray, fmap2: jnp.ndarray, k: int = 32,
                        row_chunk: int = 2048, col_chunk: int = 1024):
    """Top-k correlation hypotheses per query pixel (scv.py:48-84).

    fmap1, fmap2: (B, H, W, C).  Returns
    corr (B, N, k), coords0 (B, N, 2) (y, x), coords1 (B, N, k, 2)
    relative (y, x) displacements of the matches.

    TPU design: the reference's faiss GPU inner-product search (knn.py:88)
    becomes an exact block-max top-k — rows are processed in chunks (the
    full N x N correlation is never materialized: at 1/4 resolution of
    500x1000 it would be 3.9 GB).  Within a chunk, the columns are split
    into 128-wide blocks; the per-block MAX (one cheap VPU reduce, fused
    into the matmul consumer) selects the top-k blocks, those k blocks are
    gathered whole, and the final top-k runs over the k*128 candidates.
    Exact: if an element's block is not among the top-k blocks by max,
    then k blocks each hold a strictly larger element, so the element
    cannot be in the top-k.  This replaces ``lax.top_k`` over kilowide
    blocks — which XLA lowers to a full sort and which dominated the whole
    model's runtime (261 of 438 ms/forward profiled on v5e) — with one
    reduce plus two narrow (<=4096-lane) sorts: 320 -> ~45 ms.
    """
    b, h, w, c = fmap1.shape
    n = h * w
    f1 = fmap1.reshape(b, n, c)
    f2 = fmap2.reshape(b, n, c)

    block = min(col_chunk, 128)
    ncol = -(-n // block) * block
    f2p = jnp.pad(f2, ((0, 0), (0, ncol - n), (0, 0)))
    nrow = -(-n // row_chunk) * row_chunk
    f1p = jnp.pad(f1, ((0, 0), (0, nrow - n), (0, 0)))
    col_ids = jnp.arange(ncol)
    col_valid = col_ids < n  # padded columns must never be selected
    nb = ncol // block

    def one_chunk(rows):  # (B, row_chunk, C) -> (vals, idx) (B, rc, k)
        scores = jax.lax.dot_general(
            rows, f2p, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # (B, rc, ncol)
        scores = jnp.where(col_valid[None, None], scores, -jnp.inf)
        if ncol <= max(4096, 4 * k):  # small maps: direct top-k is fine
            return jax.lax.top_k(scores, k)
        sb = scores.reshape(b, row_chunk, nb, block)
        bmax = jnp.max(sb, axis=-1)                     # (B, rc, nb)
        _, bidx = jax.lax.top_k(bmax, k)                # (B, rc, k) blocks
        cand = jnp.take_along_axis(sb, bidx[..., None], axis=2)
        v, ci = jax.lax.top_k(cand.reshape(b, row_chunk, k * block), k)
        idx = (jnp.take_along_axis(bidx, ci // block, axis=2) * block
               + ci % block)
        return v, idx

    chunks = f1p.reshape(b, nrow // row_chunk, row_chunk, c)
    v, idx = jax.lax.map(one_chunk, jnp.moveaxis(chunks, 1, 0))
    corr_top = jnp.moveaxis(v, 0, 1).reshape(b, nrow, k)[:, :n]
    indices = jnp.moveaxis(idx, 0, 1).reshape(b, nrow, k)[:, :n]
    corr_top = corr_top / jnp.sqrt(jnp.asarray(c, jnp.float32))

    ys = (indices // w).astype(jnp.float32)
    xs = (indices % w).astype(jnp.float32)
    gy, gx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    coords0 = jnp.stack([gy.reshape(-1), gx.reshape(-1)], -1)  # (N, 2)
    coords1 = jnp.stack([ys, xs], -1) - coords0[None, :, None, :]
    return corr_top.astype(fmap1.dtype), coords0, coords1


def _bilinear_corners(coords: jnp.ndarray):
    """4 integer corners + weights of fractional (y, x) displacements
    (utils.py:148-175 ordering: (f,f), (c,f), (f,c), (c,c))."""
    y, x = coords[..., 0], coords[..., 1]
    yf, xf = jnp.floor(y), jnp.floor(x)
    yc, xc = yf + 1, xf + 1
    w0 = (yc - y) * (xc - x)
    w1 = (y - yf) * (xc - x)
    w2 = (yc - y) * (x - xf)
    w3 = (y - yf) * (x - xf)
    weights = jnp.stack([w0, w1, w2, w3], axis=-1)  # (..., 4)
    corners = jnp.stack([
        jnp.stack([yf, xf], -1), jnp.stack([yc, xf], -1),
        jnp.stack([yf, xc], -1), jnp.stack([yc, xc], -1)],
        axis=-2)  # (..., 4, 2)
    return weights, corners


def sparse_windows(corr: jnp.ndarray, coords1: jnp.ndarray, h: int, w: int,
                   num_scales: int = 5, search_range: int = 4):
    """Splat displaced top-k matches into dense per-pixel windows.

    corr: (B, N, k); coords1: (B, N, k, 2) fractional (y, x) displacements.
    Returns (B, H, W, num_scales * (2r+1)^2), level-major like the
    reference's concatenated sparse tensors (scv.py:252-298).
    """
    b, n_pix, k = corr.shape
    r = search_range
    ws = 2 * r + 1
    dt = corr.dtype
    slots = jnp.arange(ws, dtype=jnp.float32)[None, None, None]  # (1,1,1,ws)
    outs = []
    for i in range(num_scales):
        c = jax.lax.stop_gradient(coords1) * (0.5 ** i)
        y, x = c[..., 0], c[..., 1]
        yf, xf = jnp.floor(y), jnp.floor(x)
        fy, fx = y - yf, x - xf
        # Separable one-hot splat: the bilinear weights factorize as
        # wy(dy)*wx(dx), so the per-pixel 9x9 window is a fused
        # broadcast-reduce over the k matches — no scatter (TPU scatter-add
        # serializes; this was a ~280 ms/forward fusion per scale).
        # Corners outside [-r, r] match no slot, which reproduces the
        # reference's valid-mask drop (scv.py:266-276) exactly.
        iy, ix = yf + r, xf + r  # slot index of the floor corner
        ry = ((slots == iy[..., None]) * (1 - fy[..., None])
              + (slots == iy[..., None] + 1) * fy[..., None])  # (B,N,k,ws)
        rx = ((slots == ix[..., None]) * (1 - fx[..., None])
              + (slots == ix[..., None] + 1) * fx[..., None])
        contrib = (corr[..., None, None].astype(jnp.float32)
                   * ry[..., :, None] * rx[..., None, :])  # (B,N,k,ws,ws)
        out = jnp.sum(contrib, axis=2).astype(dt)  # (B, N, ws, ws)
        outs.append(out.reshape(b, h, w, ws * ws))
    return jnp.concatenate(outs, axis=-1)


class SCVBase(BaseModel):
    def __init__(self, num_k: int = 32, gamma: float = 0.8,
                 max_flow: float = 400.0, iters: int = 32,
                 stride: int = 8, **kwargs):
        super().__init__(loss_fn=SequenceLoss(gamma, max_flow),
                         output_stride=8, **kwargs)
        self.num_k = num_k
        self.iters = iters
        self.stride = stride

    def forward(self, params, inputs: Dict[str, Any],
                training: bool = False) -> Dict[str, jnp.ndarray]:
        images, image_resizer = self.preprocess_images(
            inputs["images"], bgr_add=-0.5, bgr_mult=2.0, bgr_to_rgb=True,
            resize_mode="pad", pad_mode="replicate", pad_two_side=True)

        image1 = images[:, 0]
        image2 = images[:, 1]
        # two per-frame fnet passes, NOT one batched concat pass: the
        # batched variant was measured slower on v5e (the concat/split HBM
        # relayout costs more than the second launch; see raft.py)
        fmap1 = self.fnet(params["fnet"], image1, training=training)
        fmap2 = self.fnet(params["fnet"], image2, training=training)
        cnet = self.cnet(params["cnet"], image1, training=training)
        net = jnp.tanh(cnet[..., :128])
        inp = nn.relu(cnet[..., 128:])

        b, h, w, _ = fmap1.shape
        coords0 = coords_grid(b, h, w, dtype=fmap1.dtype)
        coords1 = coords0
        prev = inputs.get("prev_preds")
        if prev is not None and prev.get("flow_small") is not None:
            flow_small = prev["flow_small"]
            if flow_small.ndim == 4 and flow_small.shape[-1] != 2:
                flow_small = jnp.moveaxis(flow_small, -3, -1)
            coords1 = coords1 + forward_interpolate(flow_small)

        corr_val, _, coords1_cv = compute_sparse_corr(fmap1, fmap2,
                                                      k=self.num_k)

        up_params = params["update_block"]
        f = self.stride
        mask0 = jnp.zeros((b, h, w, (f * f) * 9), fmap1.dtype)
        delta0 = jnp.zeros((b, h, w, 2), fmap1.dtype)

        def step(carry, _):
            net, coords1, coords1_cv, delta_flow, _ = carry
            # displace the stored (y, x) matches by the accumulated update
            # (scv.py:253-256: minus sign, xy->yx flip)
            d_yx = jnp.stack([delta_flow[..., 1], delta_flow[..., 0]], -1)
            coords1_cv = coords1_cv - jax.lax.stop_gradient(
                d_yx.reshape(b, h * w, 1, 2))
            corr = sparse_windows(corr_val, coords1_cv, h, w)
            coords1 = jax.lax.stop_gradient(coords1)
            flow = coords1 - coords0
            net, up_mask, delta_flow = self.update_block(
                up_params, net, inp, corr, flow)
            coords1 = coords1 + delta_flow
            ys = (coords1 - coords0, up_mask) if training else None
            return (net, coords1, coords1_cv, delta_flow, up_mask), ys

        (net, coords1, _, _, last_mask), ys = jax.lax.scan(
            step, (net, coords1, coords1_cv, delta0, mask0), None,
            length=self.iters)

        if training:
            flows_lr, masks = ys
            it, bb = flows_lr.shape[0], flows_lr.shape[1]
            flow_ups = convex_upsample(
                flows_lr.reshape(it * bb, h, w, 2),
                masks.reshape(it * bb, h, w, masks.shape[-1]), factor=f)
            flow_ups = flow_ups.reshape(it, bb, f * h, f * w, 2)
            flow_ups = self.postprocess_predictions(flow_ups, image_resizer,
                                                    is_flow=True)
            return {"flows": self.nhwc_flow_to_output(flow_ups[-1]),
                    "flow_preds": flow_ups}
        flow_up = convex_upsample(coords1 - coords0, last_mask, factor=f)
        flow_up = self.postprocess_predictions(flow_up, image_resizer,
                                               is_flow=True)
        return {"flows": self.nhwc_flow_to_output(flow_up),
                "flow_small": jnp.moveaxis(coords1 - coords0, -1, -3)}


class SCVQuarter(SCVBase):
    pretrained_checkpoints = {
        "chairs": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/scv-quarter-chairs-4726627e.ckpt",
        "kitti": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/scv-quarter-kitti-e86c7953.ckpt",
        "sintel": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/scv-quarter-sintel-2d9b4a05.ckpt",
        "things": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/scv-quarter-things-0dac9b66.ckpt",
    }

    def __init__(self, num_k: int = 32, gamma: float = 0.8,
                 max_flow: float = 400, iters: int = 32, **kwargs):
        super().__init__(num_k=num_k, gamma=gamma, max_flow=max_flow,
                         iters=iters, stride=4, **kwargs)
        self.fnet = BasicEncoderQuarter(output_dim=256, norm_fn="instance")
        self.cnet = BasicEncoderQuarter(output_dim=256, norm_fn="batch")
        self.update_block = BasicUpdateBlockQuarter(hidden_dim=128,
                                                    input_dim=405)


class SCVEighth(SCVBase):
    pretrained_checkpoints = {
        "chairs": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/scv-eighth-chairs-8ba57294.ckpt",
        "things": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/scv-eighth-things-9c893323.ckpt",
    }

    def __init__(self, num_k: int = 32, gamma: float = 0.8,
                 max_flow: float = 400, iters: int = 32, **kwargs):
        super().__init__(num_k=num_k, gamma=gamma, max_flow=max_flow,
                         iters=iters, stride=8, **kwargs)
        self.fnet = BasicEncoder(output_dim=256, norm_fn="instance")
        self.cnet = BasicEncoder(output_dim=256, norm_fn="batch")
        self.update_block = BasicUpdateBlock(hidden_dim=128, input_dim=405)


@register_model
@trainable
class scv4(SCVQuarter):
    pass


@register_model
@trainable
class scv8(SCVEighth):
    pass
