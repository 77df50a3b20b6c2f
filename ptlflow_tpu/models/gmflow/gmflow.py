"""GMFlow: global-matching optical flow via softmax correspondence.

Parity with /root/reference/ptlflow/models/gmflow/gmflow.py:46-362 and
matching.py:7-123: CNN encoder (+trident multi-scale), feature transformer,
global/local correlation softmax, self-attn flow propagation, convex
upsampling.  The coarse-to-fine scale loop is a static python loop (fixed
num_scales), everything inside is jit-friendly.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp

from ... import nn
from ...ops.correlation import coords_grid, local_correlation
from ...ops.grid_sample import interpolate
from ...ops.upsample import convex_upsample
from ...ops.warp import backward_warp
from ...utils.registry import register_model, trainable
from ..base import BaseModel
from .backbone import CNNEncoder
from .transformer import (FeatureFlowAttention, FeatureTransformer,
                          feature_add_position)


class SequenceLoss:
    """gamma-weighted L1 over scale/iteration predictions
    (gmflow.py:16-44; gamma=0.9)."""

    def __init__(self, gamma: float, max_flow: float):
        self.gamma = gamma
        self.max_flow = max_flow

    def __call__(self, outputs, inputs):
        flow_preds = outputs["flow_preds"]  # (n, B, H, W, 2)
        flow_gt = jnp.moveaxis(inputs["flows"][:, 0], -3, -1)
        valid = jnp.moveaxis(inputs["valids"][:, 0], -3, -1)
        mag = jnp.sqrt(jnp.sum(flow_gt ** 2, axis=-1, keepdims=True))
        valid = ((valid >= 0.5) & (mag < self.max_flow)).astype(flow_gt.dtype)
        n = flow_preds.shape[0]
        weights = self.gamma ** (n - jnp.arange(n) - 1).astype(jnp.float32)
        i_loss = jnp.abs(flow_preds - flow_gt[None])
        per = jnp.mean(valid[None] * i_loss, axis=(1, 2, 3, 4))
        return jnp.sum(weights * per)


def global_correlation_softmax(feature0: jnp.ndarray, feature1: jnp.ndarray):
    """Softmax-argmax correspondence over the full H*W (matching.py:7-47)."""
    b, h, w, c = feature0.shape
    f0 = feature0.reshape(b, h * w, c)
    f1 = feature1.reshape(b, h * w, c)
    corr = jnp.einsum("blc,bmc->blm", f0, f1,
                      preferred_element_type=jnp.float32) / (c ** 0.5)
    grid = coords_grid(b, h, w, dtype=jnp.float32).reshape(b, h * w, 2)
    prob = jax.nn.softmax(corr, axis=-1)
    correspondence = jnp.einsum("blm,bmc->blc", prob, grid,
                                preferred_element_type=jnp.float32)
    flow = correspondence.reshape(b, h, w, 2) - \
        coords_grid(b, h, w, dtype=jnp.float32)
    return flow.astype(feature0.dtype), prob


def dispatch_global_matching(model, feature0: jnp.ndarray,
                             feature1: jnp.ndarray) -> jnp.ndarray:
    """Global softmax matching, ring-sharded when the model carries a
    ('data','spatial') mesh (set via validate.py --spatial_shards).

    The ring path (parallel/ring_corr.py) never materializes a full row
    block of the (HW)^2 score matrix on one device — target shards rotate
    over ICI with an online-softmax accumulator — so Spring-1080p/4K global
    matching fits where the dense volume would OOM (SURVEY.md §5.7).
    """
    smesh = getattr(model, "spatial_mesh", None)
    if (smesh is not None and "spatial" in smesh.axis_names
            and feature0.shape[1] % smesh.shape["spatial"] == 0):
        from ...parallel.ring_corr import ring_global_correlation_softmax

        return ring_global_correlation_softmax(feature0, feature1, smesh)
    return global_correlation_softmax(feature0, feature1)[0]


def local_correlation_softmax(feature0: jnp.ndarray, feature1: jnp.ndarray,
                              local_radius: int):
    """Windowed softmax correspondence (matching.py:50-123).

    The reference grid_samples feature1 at coords + window — but the window
    offsets are INTEGER and the query coords are the identity grid, so the
    whole sampling is a stack of (2r+1)^2 integer shifts: the TPU build
    computes it via :func:`local_correlation` (pad + static slices, zero
    gathers; 36 ms -> shift kernels at GMFlow's 1/8 scale on v5e).
    Out-of-bounds taps, which grid_sample zero-fills and the reference then
    masks to -1e9, are masked identically here; the soft-argmax
    correspondence is coords + sum_k prob_k * window_k, accumulated
    analytically instead of against materialized sample coordinates.
    """
    b, h, w, c = feature0.shape
    r = local_radius
    n = 2 * r + 1
    coords_init = coords_grid(b, h, w, dtype=jnp.float32)
    # (dy slow, dx fast) — identical to the reference's transposed meshgrid
    # flattening (matching.py:62-66) and to local_correlation's tap order
    corr = local_correlation(feature0, feature1, r,
                             normalize=False) / (c ** 0.5)
    dr = jnp.arange(-r, r + 1, dtype=jnp.float32)
    dyy, dxx = jnp.meshgrid(dr, dr, indexing="ij")
    window = jnp.stack([dxx, dyy], axis=-1).reshape(-1, 2)  # (n2, (x, y))
    sample_xy = coords_init[:, :, :, None, :] + window[None, None, None]
    valid = ((sample_xy[..., 0] >= 0) & (sample_xy[..., 0] < w) &
             (sample_xy[..., 1] >= 0) & (sample_xy[..., 1] < h))
    corr = jnp.where(valid, corr, -1e9)
    prob = jax.nn.softmax(corr, axis=-1)  # (B, H, W, n2)
    flow = jnp.einsum("bhwk,kd->bhwd", prob, window,
                      preferred_element_type=jnp.float32)
    return (flow.astype(feature0.dtype),
            prob.reshape(b, h * w, n * n))


class GMFlow(BaseModel):
    pretrained_checkpoints = {
        "chairs": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/gmflow-chairs-4922131e.ckpt",
        "things": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/gmflow-things-5a18a9e8.ckpt",
        "sintel": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/gmflow-sintel-d6f83ccd.ckpt",
        "kitti": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/gmflow-kitti-af50eb2e.ckpt",
    }

    def __init__(self, attention_type: str = "swin",
                 attn_splits_list: Sequence[int] = (2,),
                 corr_radius_list: Sequence[int] = (-1,),
                 feature_channels: int = 128, ffn_dim_expansion: int = 4,
                 gamma: float = 0.9, max_flow: float = 400.0,
                 num_head: int = 1, num_scales: int = 1,
                 num_transformer_layers: int = 6,
                 pred_bidir_flow: bool = False,
                 prop_radius_list: Sequence[int] = (-1,),
                 upsample_factor: int = 8, **kwargs):
        super().__init__(output_stride=32,
                         loss_fn=SequenceLoss(gamma, max_flow), **kwargs)
        self.attn_splits_list = attn_splits_list
        self.corr_radius_list = corr_radius_list
        self.feature_channels = feature_channels
        self.num_scales = num_scales
        self.prop_radius_list = prop_radius_list
        self.upsample_factor = upsample_factor

        self.backbone = CNNEncoder(output_dim=feature_channels,
                                   num_output_scales=num_scales)
        self.transformer = FeatureTransformer(
            num_layers=num_transformer_layers, d_model=feature_channels,
            nhead=num_head, attention_type=attention_type,
            ffn_dim_expansion=ffn_dim_expansion)
        self.feature_flow_attn = FeatureFlowAttention(
            in_channels=feature_channels)
        self.upsampler = nn.Sequential(
            nn.Conv2d(2 + feature_channels, 256, 3, 1, 1), nn.relu,
            nn.Conv2d(256, upsample_factor ** 2 * 9, 1, 1, 0))

    def _upsample_flow(self, params, flow, feature, bilinear=False,
                       upsample_factor=8):
        if bilinear:
            b, h, w, _ = flow.shape
            return upsample_factor * interpolate(
                flow, (h * upsample_factor, w * upsample_factor),
                mode="bilinear", align_corners=True)
        concat = jnp.concatenate([flow, feature], axis=-1)
        mask = self.upsampler(params["upsampler"], concat)
        return convex_upsample(flow, mask, factor=self.upsample_factor)

    def forward(self, params, inputs: Dict[str, Any],
                training: bool = False) -> Dict[str, jnp.ndarray]:
        images, image_resizer = self.preprocess_images(
            inputs["images"],
            bgr_add=(-0.406, -0.456, -0.485),
            bgr_mult=(1 / 0.225, 1 / 0.224, 1 / 0.229),
            bgr_to_rgb=True, resize_mode="pad", pad_mode="replicate",
            pad_two_side=True)
        img0 = images[:, 0]
        img1 = images[:, 1]

        both = jnp.concatenate([img0, img1], axis=0)
        features = self.backbone(params["backbone"], both)[::-1]
        feature0_list = [jnp.split(f, 2, axis=0)[0] for f in features]
        feature1_list = [jnp.split(f, 2, axis=0)[1] for f in features]

        flow_preds = []
        flow = None
        for scale_idx in range(self.num_scales):
            feature0 = feature0_list[scale_idx]
            feature1 = feature1_list[scale_idx]
            upsample_factor = self.upsample_factor * (
                2 ** (self.num_scales - 1 - scale_idx))
            if scale_idx > 0:
                b, h, w, _ = flow.shape
                flow = 2 * interpolate(flow, (h * 2, w * 2), mode="bilinear",
                                       align_corners=True)
            if flow is not None:
                flow = jax.lax.stop_gradient(flow)
                feature1 = backward_warp(feature1, flow)

            attn_splits = self.attn_splits_list[scale_idx]
            corr_radius = self.corr_radius_list[scale_idx]
            prop_radius = self.prop_radius_list[scale_idx]

            feature0, feature1 = feature_add_position(
                feature0, feature1, attn_splits, self.feature_channels)
            feature0, feature1 = self.transformer(
                params["transformer"], feature0, feature1,
                attn_num_splits=attn_splits)

            if corr_radius == -1:
                flow_pred = dispatch_global_matching(self, feature0, feature1)
            else:
                flow_pred = local_correlation_softmax(feature0, feature1,
                                                      corr_radius)[0]
            flow = flow + flow_pred if flow is not None else flow_pred

            if training:
                fb = self._upsample_flow(params, flow, None, bilinear=True,
                                         upsample_factor=upsample_factor)
                flow_preds.append(self.postprocess_predictions(
                    fb, image_resizer, is_flow=True))

            flow = self.feature_flow_attn(
                params["feature_flow_attn"], feature0,
                jax.lax.stop_gradient(flow),
                local_window_attn=prop_radius > 0,
                local_window_radius=prop_radius)

            if training and scale_idx < self.num_scales - 1:
                fu = self._upsample_flow(params, flow, feature0,
                                         bilinear=True,
                                         upsample_factor=upsample_factor)
                flow_preds.append(self.postprocess_predictions(
                    fu, image_resizer, is_flow=True))

            if scale_idx == self.num_scales - 1:
                flow_up = self._upsample_flow(params, flow, feature0)
                flow_up = self.postprocess_predictions(
                    flow_up, image_resizer, is_flow=True)
                flow_preds.append(flow_up)

        if training:
            return {"flows": self.nhwc_flow_to_output(flow_preds[-1]),
                    "flow_preds": jnp.stack(flow_preds)}
        return {"flows": self.nhwc_flow_to_output(flow_preds[-1])}


class GMFlowWithRefinement(GMFlow):
    pretrained_checkpoints = {
        "chairs": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/gmflow_refine-chairs-88cdc009.ckpt",
        "things": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/gmflow_refine-things-e40899f5.ckpt",
        "sintel": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/gmflow_refine-sintel-ee46a2c4.ckpt",
        "kitti": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/gmflow_refine-kitti-b7bf2fda.ckpt",
    }

    def __init__(self, attn_splits_list: Sequence[int] = (2, 8),
                 corr_radius_list: Sequence[int] = (-1, 4),
                 num_scales: int = 2,
                 prop_radius_list: Sequence[int] = (-1, 1),
                 upsample_factor: int = 4, **kwargs):
        super().__init__(attn_splits_list=attn_splits_list,
                         corr_radius_list=corr_radius_list,
                         num_scales=num_scales,
                         prop_radius_list=prop_radius_list,
                         upsample_factor=upsample_factor, **kwargs)


@register_model
@trainable
class gmflow(GMFlow):
    pass


@register_model
@trainable
class gmflow_refine(GMFlowWithRefinement):
    pass
