"""LCV-RAFT: RAFT with a learned (Mahalanobis) cost-volume metric.

Parity with /root/reference/ptlflow/models/lcv/{lcv_raft.py, corr_lcv.py}:
the correlation uses a learned SPD matrix W = P^T D P where P comes from a
Cayley transform of a triangular parameter and D is a positive diagonal
(corr_lcv.py:19-50).  Pyramid pooling stops when the level is smaller than
the lookup window.  Quirk preserved: images are NOT flipped to RGB
(bgr_to_rgb=False, lcv_raft.py:129).
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp

from ... import nn
from ...ops.correlation import coords_grid, corr_pyramid_lookup
from ...ops.upsample import convex_upsample, upflow
from ...ops.warp import forward_interpolate
from ...utils.registry import register_model, trainable
from ..base import BaseModel
from ..raft.extractor import BasicEncoder, SmallEncoder
from ..raft.raft import SequenceLoss
from ..raft.update import BasicUpdateBlock, SmallUpdateBlock


class LearnableCorrBlock(nn.Module):
    """Learned metric cost volume (corr_lcv.py:8-77)."""

    def __init__(self, dim: int, num_levels: int = 4, radius: int = 4):
        super().__init__()
        self.dim = dim
        self.num_levels = num_levels
        self.radius = radius

    def init(self, key):
        return {"raw_P": jnp.eye(self.dim, dtype=jnp.float32),
                "raw_D": jnp.zeros((self.dim,), jnp.float32)}

    def _torch_leaves(self):
        return {"raw_P": lambda p: p, "raw_D": lambda d: d}

    def _torch_ignore(self):
        # constant identity buffer (corr_lcv.py:17); recomputed in
        # weight_matrix, never learned
        return {"eye"}

    def weight_matrix(self, params):
        import math

        eye = jnp.eye(self.dim, dtype=jnp.float32)
        upper = jnp.triu(params["raw_P"].astype(jnp.float32))
        skew = (upper - upper.T) / 2
        P = jnp.matmul(eye + skew, jnp.linalg.inv(eye - skew))
        trans_D = jnp.arctan(params["raw_D"].astype(jnp.float32)) * 2 / math.pi
        D = jnp.diag((1 + trans_D) / (1 - trans_D))
        return P.T @ D @ P

    def compute_cost_volume(self, params, fmap1, fmap2) -> List[jnp.ndarray]:
        # Each level is a direct matmul against the pooled fmap2 — identical
        # to avg-pooling the level-0 volume (corr_lcv.py:59-66) by dot
        # linearity: avgpool_j((f1 W) . f2_j) == (f1 W) . avgpool(f2).
        # Pooling the (Q, h, w, 1) volume itself repacks Q strided tiles per
        # level (the repack measured ~24 ms of lcv_raft's 93 ms forward on
        # v5e at 500x1000); pooling fmap2 first writes every level straight
        # from the MXU in its final layout (same rationale and identity as
        # ops/correlation.py::build_corr_pyramid).
        b, h, w, c = fmap1.shape
        W = self.weight_matrix(params).astype(fmap1.dtype)
        f1w = fmap1.reshape(b, h * w, c) @ W
        scale = 1.0 / jnp.sqrt(float(c))
        pyramid = []
        f2 = fmap2
        for i in range(self.num_levels + 1):
            lvl = jnp.einsum("bic,bhwc->bihw", f1w, f2,
                             preferred_element_type=jnp.float32) * scale
            hl, wl = lvl.shape[2], lvl.shape[3]
            pyramid.append(lvl.reshape(b * h * w, hl, wl, 1)
                           .astype(fmap1.dtype))
            if (i < self.num_levels
                    and min(hl, wl) > 2 * self.radius + 1):
                f2 = nn.avg_pool2d(f2, 2, 2)
        return pyramid

    def __call__(self, params, pyramid, coords, **kw):
        return corr_pyramid_lookup(pyramid[:self.num_levels], coords,
                                   self.radius)


class LCV_RAFT(BaseModel):
    pretrained_checkpoints = {
        "chairs": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/lcv_raft-chairs-8063d698.ckpt",
        "things": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/lcv_raft-things-4c7233b8.ckpt",
    }

    def __init__(self, corr_levels: int = 4, corr_radius: int = 4,
                 dropout: float = 0.0, gamma: float = 0.8,
                 max_flow: float = 400, iters: int = 32, **kwargs):
        super().__init__(output_stride=8,
                         loss_fn=SequenceLoss(gamma, max_flow), **kwargs)
        self.corr_levels = corr_levels
        self.corr_radius = corr_radius
        self.iters = iters
        self.hidden_dim = 128
        self.context_dim = 128
        self.fnet = BasicEncoder(output_dim=256, norm_fn="instance",
                                 dropout=dropout)
        self.cnet = BasicEncoder(output_dim=256, norm_fn="batch",
                                 dropout=dropout)
        self.update_block = BasicUpdateBlock(corr_levels, corr_radius,
                                             hidden_dim=self.hidden_dim)
        self.corr_block = LearnableCorrBlock(256, corr_levels, corr_radius)

    def forward(self, params, inputs: Dict[str, Any],
                training: bool = False) -> Dict[str, jnp.ndarray]:
        images, image_resizer = self.preprocess_images(
            inputs["images"], bgr_add=-0.5, bgr_mult=2.0, bgr_to_rgb=False,
            resize_mode="pad", pad_mode="replicate", pad_two_side=True)
        image1 = images[:, 0]
        image2 = images[:, 1]

        # two per-frame fnet passes, NOT one batched concat pass: the
        # batched variant was measured slower on v5e (the concat/split HBM
        # relayout costs more than the second launch; see raft.py)
        fmap1 = self.fnet(params["fnet"], image1, training=training)
        fmap2 = self.fnet(params["fnet"], image2, training=training)
        pyramid = self.corr_block.compute_cost_volume(
            params["corr_block"], fmap1, fmap2)

        cnet = self.cnet(params["cnet"], image1, training=training)
        net = jnp.tanh(cnet[..., :self.hidden_dim])
        inp = nn.relu(cnet[..., self.hidden_dim:])

        b, h, w, _ = fmap1.shape
        coords0 = coords_grid(b, h, w, dtype=fmap1.dtype)
        coords1 = coords0
        prev = inputs.get("prev_preds")
        if prev is not None and prev.get("flow_small") is not None:
            fs = prev["flow_small"]
            if fs.ndim == 4 and fs.shape[-1] != 2:
                fs = jnp.moveaxis(fs, -3, -1)
            coords1 = coords1 + forward_interpolate(fs)

        up_params = params["update_block"]
        has_mask = not isinstance(self.update_block, SmallUpdateBlock)
        mask_ch = 64 * 9

        def step(carry, _):
            net, coords1, last_mask = carry
            coords1 = jax.lax.stop_gradient(coords1)
            corr = self.corr_block(params["corr_block"], pyramid, coords1)
            flow = coords1 - coords0
            net, up_mask, delta_flow = self.update_block(
                up_params, net, inp, corr, flow)
            coords1 = coords1 + delta_flow
            if up_mask is None:
                up_mask = last_mask
            ys = (coords1 - coords0, up_mask) if training else None
            return (net, coords1, up_mask), ys

        mask0 = jnp.zeros((b, h, w, mask_ch if has_mask else 1), fmap1.dtype)
        (net, coords1, last_mask), ys = jax.lax.scan(
            step, (net, coords1, mask0), None, length=self.iters)

        def upsample(flow_lr, mask):
            if has_mask:
                return convex_upsample(flow_lr, mask)
            return upflow(flow_lr, 8)

        if training:
            flows_lr, masks = ys
            it, bb = flows_lr.shape[0], flows_lr.shape[1]
            flow_ups = upsample(flows_lr.reshape(it * bb, h, w, 2),
                                masks.reshape(it * bb, h, w,
                                              masks.shape[-1]))
            flow_ups = flow_ups.reshape(it, bb, 8 * h, 8 * w, 2)
            flow_ups = self.postprocess_predictions(flow_ups, image_resizer,
                                                    is_flow=True)
            return {"flows": self.nhwc_flow_to_output(flow_ups[-1]),
                    "flow_preds": flow_ups}
        flow_up = upsample(coords1 - coords0, last_mask)
        flow_up = self.postprocess_predictions(flow_up, image_resizer,
                                               is_flow=True)
        return {"flows": self.nhwc_flow_to_output(flow_up),
                "flow_small": jnp.moveaxis(coords1 - coords0, -1, -3)}


class LCV_RAFTSmall(LCV_RAFT):
    pretrained_checkpoints = {}

    def __init__(self, corr_levels: int = 4, corr_radius: int = 3,
                 dropout: float = 0.0, gamma: float = 0.8,
                 max_flow: float = 400, iters: int = 32, **kwargs):
        super().__init__(corr_levels=corr_levels, corr_radius=corr_radius,
                         dropout=dropout, gamma=gamma, max_flow=max_flow,
                         iters=iters, **kwargs)
        self.hidden_dim = 96
        self.context_dim = 64
        self.fnet = SmallEncoder(output_dim=128, norm_fn="instance",
                                 dropout=dropout)
        self.cnet = SmallEncoder(output_dim=self.hidden_dim +
                                 self.context_dim, norm_fn="none",
                                 dropout=dropout)
        self.update_block = SmallUpdateBlock(corr_levels, corr_radius,
                                             hidden_dim=self.hidden_dim)
        self.corr_block = LearnableCorrBlock(128, corr_levels, corr_radius)


@register_model
@trainable
class lcv_raft(LCV_RAFT):
    pass


@register_model
@trainable
class lcv_raft_small(LCV_RAFTSmall):
    pass
