"""RAFT, TPU-native.

Behavioral parity with /root/reference/ptlflow/models/raft/raft.py:48-247:
same preprocessing (bgr [-0.5, x2], BGR->RGB, replicate pad to /8), same
correlation pyramid + lookup ordering, same update block, same convex
upsampling, same SequenceLoss.

TPU-first differences (SURVEY.md §3.3 "TPU mapping"):
- the GRU iteration is a ``lax.scan`` with carry (net, coords1); iteration
  count is static so the loop compiles once;
- during training the scan stacks the *low-res* flow + upsample mask per
  iteration and the full-res convex upsampling of all iterations runs
  batched afterwards (identical math, better layout for the MXU);
- everything is NHWC.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ... import nn
from ...ops.correlation import build_corr_pyramid, make_corr_lookup, coords_grid
from ...ops.upsample import convex_upsample, upflow
from ...ops.warp import forward_interpolate
from ...utils.registry import register_model, trainable, ptlflow_trained
from ..base import BaseModel
from .extractor import BasicEncoder, SmallEncoder
from .update import BasicUpdateBlock, SmallUpdateBlock


class SequenceLoss:
    """gamma-weighted L1 over the iteration sequence (raft.py:20-45)."""

    def __init__(self, gamma: float, max_flow: float):
        self.gamma = gamma
        self.max_flow = max_flow

    def __call__(self, outputs: Dict[str, Any], inputs: Dict[str, Any]):
        flow_preds = outputs["flow_preds"]  # (iters, B, H, W, 2) NHWC stack
        flow_gt = jnp.moveaxis(inputs["flows"][:, 0], -3, -1)  # (B, H, W, 2)
        valid = jnp.moveaxis(inputs["valids"][:, 0], -3, -1)  # (B, H, W, 1)

        n_predictions = flow_preds.shape[0]
        mag = jnp.sqrt(jnp.sum(flow_gt ** 2, axis=-1, keepdims=True))
        valid = ((valid >= 0.5) & (mag < self.max_flow)).astype(flow_gt.dtype)

        i = jnp.arange(n_predictions)
        weights = self.gamma ** (n_predictions - i - 1).astype(jnp.float32)
        i_loss = jnp.abs(flow_preds - flow_gt[None])  # (it, B, H, W, 2)
        per_iter = jnp.mean(valid[None] * i_loss, axis=(1, 2, 3, 4))
        return jnp.sum(weights * per_iter)


class RAFT(BaseModel):
    pretrained_checkpoints = {
        "chairs": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/raft-chairs-590f38f7.ckpt",
        "things": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/raft-things-802bbcfd.ckpt",
        "sintel": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/raft-sintel-fb44381e.ckpt",
        "kitti": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/raft-kitti-3a831a4b.ckpt",
    }

    def __init__(self, corr_levels: int = 4, corr_radius: int = 4,
                 dropout: float = 0.0, gamma: float = 0.8,
                 max_flow: float = 400, iters: int = 32,
                 alternate_corr: bool = False, corr_dtype: str = None,
                 mixed_precision: bool = False, **kwargs):
        super().__init__(output_stride=8,
                         loss_fn=SequenceLoss(gamma, max_flow), **kwargs)
        self.corr_levels = corr_levels
        self.corr_radius = corr_radius
        # "bfloat16" halves cost-volume HBM traffic (the lookup bottleneck);
        # accumulation stays fp32.  Default fp32 for exact reference parity.
        self.corr_dtype = corr_dtype
        # Inference-only bf16 for the encoders + update block (the analog of
        # the reference's --fp16 mode); implies a bf16 corr pyramid.
        self.mixed_precision = mixed_precision
        self.dropout = dropout
        self.gamma = gamma
        self.max_flow = max_flow
        self.iters = iters
        self.alternate_corr = alternate_corr

        self.hidden_dim = 128
        self.context_dim = 128

        self.fnet = BasicEncoder(output_dim=256, norm_fn="instance",
                                 dropout=dropout)
        self.cnet = BasicEncoder(output_dim=self.hidden_dim + self.context_dim,
                                 norm_fn="batch", dropout=dropout)
        self.update_block = BasicUpdateBlock(corr_levels, corr_radius,
                                             hidden_dim=self.hidden_dim)

    # ------------------------------------------------------------------ body
    def forward(self, params, inputs: Dict[str, Any],
                training: bool = False) -> Dict[str, jnp.ndarray]:
        images, image_resizer = self.preprocess_images(
            inputs["images"], bgr_add=-0.5, bgr_mult=2.0, bgr_to_rgb=True,
            resize_mode="pad", pad_mode="replicate", pad_two_side=True)

        image1 = images[:, 0]
        image2 = images[:, 1]

        amp = self.mixed_precision and not training
        corr_dtype = jnp.bfloat16 if amp else self.corr_dtype
        if amp:
            params = nn.cast_params(params, jnp.bfloat16)
            image1 = image1.astype(jnp.bfloat16)
            image2 = image2.astype(jnp.bfloat16)

        # two per-frame fnet passes, NOT one batched pass over
        # concat([image1, image2]): the batched variant was measured 21%
        # slower end-to-end on v5e at 1024x436 (29.0 vs 36.6 fps) — the
        # concat/split forces an HBM relayout that costs more than the
        # extra launch, and XLA overlaps the two calls anyway.
        fmap1 = self.fnet(params["fnet"], image1, training=training)
        fmap2 = self.fnet(params["fnet"], image2, training=training)
        smesh = getattr(self, "spatial_mesh", None)
        if smesh is not None:
            # Spatially-sharded correlation (SURVEY.md §5.7): the query (H)
            # axis of the O((HW)^2) volume is sharded over the mesh's
            # 'spatial' axis, so Spring-1080p/4K volumes that would OOM one
            # chip split across the slice.  fmap2 stays replicated (every
            # query row needs the full target); GSPMD inserts the
            # collectives.  Enabled via validate.py --spatial_shards.
            from ...parallel.mesh import shard_spatial

            fmap1 = shard_spatial(fmap1, smesh, dim=1)
            pyramid = build_corr_pyramid(fmap1, fmap2, self.corr_levels,
                                         dtype=corr_dtype)
            pyramid = [shard_spatial(p, smesh, dim=0) for p in pyramid]
            # ungrouped per-level path: queries stay on the leading dim, so
            # the one-hot einsums shard trivially over 'spatial'
            inner = make_corr_lookup(pyramid, self.corr_radius, impl="levels")

            def corr_lookup(coords):
                out = inner(shard_spatial(coords, smesh, dim=1))
                return shard_spatial(out, smesh, dim=1)
        else:
            pyramid = build_corr_pyramid(fmap1, fmap2, self.corr_levels,
                                         dtype=corr_dtype)
            corr_lookup = make_corr_lookup(pyramid, self.corr_radius,
                                           impl=getattr(self, "corr_impl",
                                                        "auto"))

        cnet = self.cnet(params["cnet"], image1, training=training)
        net = jnp.tanh(cnet[..., :self.hidden_dim])
        inp = nn.relu(cnet[..., self.hidden_dim:])

        b, h, w, _ = fmap1.shape
        # coords stay fp32 even under mixed_precision: bf16 cannot represent
        # pixel positions ~1000 px to sub-pixel accuracy.
        coords0 = coords_grid(b, h, w,
                              dtype=jnp.promote_types(fmap1.dtype,
                                                      jnp.float32))
        coords1 = coords0

        prev = inputs.get("prev_preds")
        if prev is not None and prev.get("flow_small") is not None:
            # warm start (raft.py:162-167); device-side forward splat
            flow_small = prev["flow_small"]
            if flow_small.ndim == 4 and flow_small.shape[-1] != 2:
                flow_small = jnp.moveaxis(flow_small, -3, -1)
            coords1 = coords1 + forward_interpolate(flow_small)

        up_params = params["update_block"]
        has_mask = not isinstance(self.update_block, SmallUpdateBlock)
        mask_ch = 64 * 9

        def step(carry, _):
            net, coords1, last_mask = carry
            coords1 = jax.lax.stop_gradient(coords1)
            corr = corr_lookup(coords1)
            flow = coords1 - coords0
            # under mixed_precision the fp32 flow would re-promote the whole
            # update block; cast it at the boundary (coords stay fp32)
            net, up_mask, delta_flow = self.update_block(
                up_params, net, inp, corr, flow.astype(net.dtype))
            coords1 = coords1 + delta_flow
            if up_mask is None:
                up_mask = last_mask
            ys = (coords1 - coords0, up_mask) if training else None
            return (net, coords1, up_mask), ys

        mask0 = jnp.zeros((b, h, w, mask_ch if has_mask else 1), fmap1.dtype)
        (net, coords1, last_mask), ys = jax.lax.scan(
            step, (net, coords1, mask0), None, length=self.iters,
            unroll=getattr(self, "scan_unroll", 1))

        def upsample(flow_lr, mask):
            if has_mask:
                return convex_upsample(flow_lr, mask)
            return upflow(flow_lr, 8)

        if training:
            flows_lr, masks = ys  # (iters, B, h, w, 2/mask_ch)
            it, bb = flows_lr.shape[0], flows_lr.shape[1]
            flow_ups = upsample(
                flows_lr.reshape(it * bb, h, w, 2),
                masks.reshape(it * bb, h, w, masks.shape[-1]))
            flow_ups = flow_ups.reshape(it, bb, 8 * h, 8 * w, 2)
            flow_ups = self.postprocess_predictions(
                flow_ups, image_resizer, is_flow=True)
            return {
                "flows": self.nhwc_flow_to_output(flow_ups[-1]),
                "flow_preds": flow_ups,
            }
        else:
            flow_up = upsample(coords1 - coords0, last_mask)
            flow_up = self.postprocess_predictions(
                flow_up, image_resizer, is_flow=True)
            flow_small = jnp.moveaxis(coords1 - coords0, -1, -3)
            return {
                "flows": self.nhwc_flow_to_output(flow_up),
                "flow_small": flow_small,
            }


class RAFTSmall(RAFT):
    pretrained_checkpoints = {
        "things": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/raft_small-things-b7d9f997.ckpt"
    }

    def __init__(self, corr_levels: int = 4, corr_radius: int = 3,
                 dropout: float = 0.0, gamma: float = 0.8,
                 max_flow: float = 400, iters: int = 32,
                 alternate_corr: bool = False, **kwargs):
        super().__init__(corr_levels=corr_levels, corr_radius=corr_radius,
                         dropout=dropout, gamma=gamma, max_flow=max_flow,
                         iters=iters, alternate_corr=alternate_corr, **kwargs)
        self.hidden_dim = 96
        self.context_dim = 64
        self.fnet = SmallEncoder(output_dim=128, norm_fn="instance",
                                 dropout=dropout)
        self.cnet = SmallEncoder(output_dim=self.hidden_dim + self.context_dim,
                                 norm_fn="none", dropout=dropout)
        self.update_block = SmallUpdateBlock(corr_levels, corr_radius,
                                             hidden_dim=self.hidden_dim)


@register_model
@trainable
@ptlflow_trained
class raft(RAFT):
    pass


@register_model
@trainable
@ptlflow_trained
class raft_small(RAFTSmall):
    pass
