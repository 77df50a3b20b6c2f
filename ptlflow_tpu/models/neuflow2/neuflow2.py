"""NeuFlow v2 (reference: ptlflow/models/neuflow2/neuflow2.py:45-333,
backbone_v7.py, transformer.py, corr.py, refine.py, upsample.py).

Efficiency-first two-scale design: global matching at 1/16 with cross
attention, then iterative refinement at 1/16 and 1/8 with a lightweight
conv refiner carrying an iteration context (Hardtanh-clipped), and a
full-scale convex upsampler.  The corr lookup reuses the MXU one-hot
pyramid lookup (levels=1).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ... import nn
from ...nn import Module
from ...ops.correlation import CorrBlock, coords_grid
from ...ops.grid_sample import interpolate
from ...ops.upsample import convex_upsample
from ...utils.registry import register_model, trainable
from ..base.base_model import BaseModel
from ..neuflow.neuflow import TransformerLayer, lrelu, sdpa


class ConvBlock2(Module):
    """backbone_v7.py:5-45 (conv-BN-lrelu x2, no residual)."""

    def __init__(self, in_planes, out_planes, kernel_size, stride, padding):
        super().__init__()
        self.conv1 = nn.Conv2d(in_planes, out_planes, kernel_size,
                               stride=stride, padding=padding, bias=False)
        self.conv2 = nn.Conv2d(out_planes, out_planes, 3, stride=1,
                               padding=1, bias=False)
        self.norm1 = nn.BatchNorm2d(out_planes)
        self.norm2 = nn.BatchNorm2d(out_planes)

    def __call__(self, params, x, **kw):
        x = lrelu(self.norm1(params["norm1"], self.conv1(params["conv1"], x),
                             **kw))
        x = lrelu(self.norm2(params["norm2"], self.conv2(params["conv2"], x),
                             **kw))
        return x


class CNNEncoder2(Module):
    """backbone_v7.py:48-123; appends centered (y, x) position channels at
    1/16 (init_pos)."""

    def __init__(self, feature_dim_s16, context_dim_s16, feature_dim_s8,
                 context_dim_s8):
        super().__init__()
        self.block_8_1 = ConvBlock2(3, feature_dim_s8 * 2, 8, 4, 2)
        self.block_8_2 = ConvBlock2(3, feature_dim_s8, 6, 2, 2)
        self.block_cat_8 = ConvBlock2(feature_dim_s8 * 3,
                                      feature_dim_s8 + context_dim_s8, 3, 1,
                                      1)
        self.block_16_1 = ConvBlock2(3, feature_dim_s16, 6, 2, 2)
        self.block_8_16 = ConvBlock2(feature_dim_s8 + context_dim_s8,
                                     feature_dim_s16, 6, 2, 2)
        self.block_cat_16 = ConvBlock2(
            feature_dim_s16 * 2, feature_dim_s16 + context_dim_s16 - 2, 3, 1,
            1)

    def __call__(self, params, img, **kw):
        img = nn.avg_pool2d(img, 2, 2)
        x_8 = self.block_8_1(params["block_8_1"], img, **kw)
        img = nn.avg_pool2d(img, 2, 2)
        x_8_2 = self.block_8_2(params["block_8_2"], img, **kw)
        x_8 = self.block_cat_8(params["block_cat_8"],
                               jnp.concatenate([x_8, x_8_2], axis=-1), **kw)
        img = nn.avg_pool2d(img, 2, 2)
        x_16 = self.block_16_1(params["block_16_1"], img, **kw)
        x_16_2 = self.block_8_16(params["block_8_16"], x_8, **kw)
        x_16 = self.block_cat_16(params["block_cat_16"],
                                 jnp.concatenate([x_16, x_16_2], axis=-1),
                                 **kw)
        b, h, w, _ = x_16.shape
        ys = jnp.arange(h, dtype=x_16.dtype) - h / 2
        xs = jnp.arange(w, dtype=x_16.dtype) - w / 2
        yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
        pos = jnp.broadcast_to(jnp.stack([yy, xx], axis=-1)[None],
                               (b, h, w, 2))
        return jnp.concatenate([x_16, pos], axis=-1), x_8


class FeatureAttention2(Module):
    """transformer.py:60-102 (post_norm = BatchNorm2d)."""

    def __init__(self, feature_dim, num_layers, ffn=True,
                 ffn_dim_expansion=1, post_norm=False):
        super().__init__()
        self.layers = nn.ModuleList([
            TransformerLayer(feature_dim, ffn=ffn,
                             ffn_dim_expansion=ffn_dim_expansion)
            for _ in range(num_layers)])
        self.post_norm = post_norm
        if post_norm:
            self.norm = nn.BatchNorm2d(feature_dim)

    def __call__(self, params, concat_features, **kw):
        # concat_features: (2B, H, W, C), frames stacked in batch
        b2, h, w, c = concat_features.shape
        concat0 = concat_features.reshape(b2, h * w, c)
        c0, c1 = jnp.split(concat0, 2, axis=0)
        concat1 = jnp.concatenate([c1, c0], axis=0)
        for i, layer in enumerate(self.layers):
            concat0 = layer(params["layers"][str(i)], concat0, concat1)
            c0, c1 = jnp.split(concat0, 2, axis=0)
            concat1 = jnp.concatenate([c1, c0], axis=0)
        out = concat0.reshape(b2, h, w, c)
        if self.post_norm:
            out = self.norm(params["norm"], out, **kw)
        return out


class Refine(Module):
    """refine.py:23-89; constant radius-embedding channel, Hardtanh(-4, 4)
    on the iteration context."""

    def __init__(self, context_dim, iter_context_dim, num_layers, levels,
                 radius, inter_dim):
        super().__init__()
        self.radius = radius
        self.conv1 = _RefineConv(
            (radius * 2 + 1) ** 2 * levels + context_dim + iter_context_dim
            + 2 + 1, context_dim + iter_context_dim)
        self.conv2 = _RefineConv(context_dim + iter_context_dim, inter_dim)
        self.conv_layers = nn.ModuleList(
            [_RefineConv(inter_dim, inter_dim) for _ in range(num_layers)])
        self.conv3 = nn.Conv2d(inter_dim, iter_context_dim + 2, 3, 1, 1)

    def __call__(self, params, corrs, context, iter_context, flow0, **kw):
        b, h, w, _ = flow0.shape
        radius_emb = jnp.full((b, h, w, 1), float(self.radius), flow0.dtype)
        x = jnp.concatenate([corrs, context, iter_context, flow0,
                             radius_emb], axis=-1)
        x = self.conv1(params["conv1"], x)
        x = self.conv2(params["conv2"], x)
        for i, layer in enumerate(self.conv_layers):
            x = layer(params["conv_layers"][str(i)], x)
        x = self.conv3(params["conv3"], x)
        return jnp.clip(x[..., 2:], -4.0, 4.0), x[..., :2]


class _RefineConv(Module):
    def __init__(self, in_planes, out_planes):
        super().__init__()
        self.conv = nn.Conv2d(in_planes, out_planes, 3, 1, 1, bias=False)

    def __call__(self, params, x, **kw):
        return lrelu(self.conv(params["conv"], x))


class UpSample(Module):
    """upsample.py:7-40; the reference unfolds the unscaled flow and
    multiplies by 8 outside — equal to our scaled convex_upsample."""

    def __init__(self, feature_dim, upsample_factor):
        super().__init__()
        self.upsample_factor = upsample_factor
        self.conv1 = nn.Conv2d(2 + feature_dim, 256, 3, 1, 1)
        self.conv2 = nn.Conv2d(256, 512, 3, 1, 1)
        self.conv3 = nn.Conv2d(512, upsample_factor ** 2 * 9, 1, 1, 0)

    def __call__(self, params, feature, flow, **kw):
        concat = jnp.concatenate([flow, feature], axis=-1)
        mask = self.conv3(params["conv3"], nn.relu(self.conv2(
            params["conv2"], nn.relu(self.conv1(params["conv1"], concat)))))
        return convex_upsample(flow, mask, self.upsample_factor)


class SequenceLoss2:
    """neuflow2.py:17-42 — fixed [0.2, 1] weights."""

    def __init__(self, gamma: float, max_flow: float):
        self.max_flow = max_flow

    def __call__(self, outputs, inputs):
        flow_preds = outputs["flow_preds"]
        flow_gt = jnp.moveaxis(inputs["flows"][:, 0], -3, -1)
        valid = jnp.moveaxis(inputs["valids"][:, 0], -3, -1)
        mag = jnp.sqrt(jnp.sum(flow_gt ** 2, axis=-1, keepdims=True))
        valid = ((valid >= 0.5) & (mag < self.max_flow)).astype(
            flow_gt.dtype)
        weights = [0.2, 1.0]
        total = 0.0
        for i in range(len(flow_preds)):
            w = weights[i] if i < len(weights) else 1.0
            total += w * jnp.mean(valid * jnp.abs(flow_preds[i] - flow_gt))
        return total


class NeuFlow2(BaseModel):
    pretrained_checkpoints = {
        "mixed": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/neuflow2-mixed-acac1a70.ckpt",
        "sintel": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/neuflow2-sintel-15c625f8.ckpt",
        "things": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/neuflow2-things-6ed47437.ckpt",
    }

    def __init__(self, gamma: float = 0.8, max_flow: float = 400,
                 feature_dim_s16: int = 128, context_dim_s16: int = 64,
                 iter_context_dim_s16: int = 64, feature_dim_s8: int = 128,
                 context_dim_s8: int = 64, iter_context_dim_s8: int = 64,
                 feature_dim_s1: int = 128, iters_s16: int = 1,
                 iters_s8: int = 8, **kwargs):
        super().__init__(output_stride=16,
                         loss_fn=SequenceLoss2(gamma, max_flow), **kwargs)
        self.feature_dim_s16 = feature_dim_s16
        self.context_dim_s16 = context_dim_s16
        self.iter_context_dim_s16 = iter_context_dim_s16
        self.feature_dim_s8 = feature_dim_s8
        self.context_dim_s8 = context_dim_s8
        self.iter_context_dim_s8 = iter_context_dim_s8
        self.iters_s16 = iters_s16
        self.iters_s8 = iters_s8

        self.backbone = CNNEncoder2(feature_dim_s16, context_dim_s16,
                                    feature_dim_s8, context_dim_s8)
        self.cross_attn_s16 = FeatureAttention2(
            feature_dim_s16 + context_dim_s16, num_layers=2, ffn=True,
            ffn_dim_expansion=1, post_norm=True)
        self.merge_s8 = nn.Sequential(
            nn.Conv2d(feature_dim_s16 + feature_dim_s8, feature_dim_s8, 3,
                      1, 1, bias=False),
            nn.gelu,
            nn.Conv2d(feature_dim_s8, feature_dim_s8, 3, 1, 1, bias=False),
            nn.BatchNorm2d(feature_dim_s8))
        self.context_merge_s8 = nn.Sequential(
            nn.Conv2d(context_dim_s16 + context_dim_s8, context_dim_s8, 3,
                      1, 1, bias=False),
            nn.gelu,
            nn.Conv2d(context_dim_s8, context_dim_s8, 3, 1, 1, bias=False),
            nn.BatchNorm2d(context_dim_s8))
        self.refine_s16 = Refine(context_dim_s16, iter_context_dim_s16,
                                 num_layers=5, levels=1, radius=4,
                                 inter_dim=128)
        self.refine_s8 = Refine(context_dim_s8, iter_context_dim_s8,
                                num_layers=5, levels=1, radius=4,
                                inter_dim=96)
        self.conv_s8 = ConvBlock2(3, feature_dim_s1, 8, 8, 0)
        self.upsample_s8 = UpSample(feature_dim_s1, upsample_factor=8)

    def _split_features(self, features, context_dim):
        # [context, features] channel order (neuflow2.py:210-216); the
        # context keeps only the first frame's chunk
        context = features[..., :context_dim]
        feats = features[..., context_dim:]
        context = jnp.split(context, 2, axis=0)[0]
        return feats, nn.relu(context)

    def forward(self, params, inputs: Dict[str, Any],
                training: bool = False) -> Dict[str, jnp.ndarray]:
        images, image_resizer = self.preprocess_images(
            inputs["images"], bgr_add=0.0, bgr_mult=1.0, bgr_to_rgb=False,
            resize_mode="interpolation",
            interpolation_align_corners=False)
        img0 = images[:, 0]
        img1 = images[:, 1]
        b = img0.shape[0]
        kw = dict(training=training)

        features_s16, features_s8 = self.backbone(
            params["backbone"], jnp.concatenate([img0, img1], axis=0), **kw)
        features_s16 = self.cross_attn_s16(params["cross_attn_s16"],
                                           features_s16, **kw)
        features_s16, context_s16 = self._split_features(
            features_s16, self.context_dim_s16)
        features_s8, context_s8 = self._split_features(
            features_s8, self.context_dim_s8)

        f0_s16, f1_s16 = jnp.split(features_s16, 2, axis=0)
        h16, w16 = f0_s16.shape[1], f0_s16.shape[2]

        # global matching via sdpa with the coords grid as values
        grid16 = coords_grid(b, h16, w16, dtype=f0_s16.dtype)
        corr_val = sdpa(f0_s16.reshape(b, h16 * w16, -1),
                        f1_s16.reshape(b, h16 * w16, -1),
                        grid16.reshape(b, h16 * w16, 2))
        flow0 = corr_val.reshape(b, h16, w16, 2) - grid16

        corr_fn_s16 = CorrBlock(f0_s16, f1_s16, num_levels=1, radius=4)
        iter_context = jnp.zeros((b, h16, w16, self.iter_context_dim_s16),
                                 img0.dtype)
        flow_list = []
        for _ in range(self.iters_s16):
            corrs = corr_fn_s16(grid16 + flow0)
            iter_context, delta = self.refine_s16(
                params["refine_s16"], corrs, context_s16, iter_context,
                flow0)
            flow0 = flow0 + delta
            if training:
                up = 16 * interpolate(flow0, (h16 * 16, w16 * 16),
                                      mode="bilinear")
                flow_list.append(self.postprocess_predictions(
                    up, image_resizer, is_flow=True))

        # to 1/8
        flow0 = 2 * interpolate(flow0, (h16 * 2, w16 * 2), mode="nearest")
        features_s16_up = interpolate(features_s16, (h16 * 2, w16 * 2),
                                      mode="nearest")
        features_s8 = self.merge_s8(
            params["merge_s8"],
            jnp.concatenate([features_s8, features_s16_up], axis=-1), **kw)
        f0_s8, f1_s8 = jnp.split(features_s8, 2, axis=0)
        h8, w8 = f0_s8.shape[1], f0_s8.shape[2]
        corr_fn_s8 = CorrBlock(f0_s8, f1_s8, num_levels=1, radius=4)
        context_s16_up = interpolate(context_s16, (h16 * 2, w16 * 2),
                                     mode="nearest")
        context_s8 = self.context_merge_s8(
            params["context_merge_s8"],
            jnp.concatenate([context_s8, context_s16_up], axis=-1), **kw)

        grid8 = coords_grid(b, h8, w8, dtype=img0.dtype)
        iter_context = jnp.zeros((b, h8, w8, self.iter_context_dim_s8),
                                 img0.dtype)

        def step(carry, _):
            flow0, iter_context = carry
            corrs = corr_fn_s8(grid8 + flow0)
            iter_context, delta = self.refine_s8(
                params["refine_s8"], corrs, context_s8, iter_context, flow0)
            flow0 = flow0 + delta
            ys = None
            if training:
                feature0_s1 = self.conv_s8(params["conv_s8"], img0, **kw)
                up = self.upsample_s8(params["upsample_s8"], feature0_s1,
                                      flow0)
                ys = self.postprocess_predictions(up, image_resizer,
                                                  is_flow=True)
            return (flow0, iter_context), ys

        (flow0, iter_context), ys = jax.lax.scan(
            step, (flow0, iter_context), None, length=self.iters_s8)

        if training:
            flow_list.extend(ys[i] for i in range(self.iters_s8))
            up_flow0 = flow_list[-1]
            return {"flows": self.nhwc_flow_to_output(up_flow0),
                    "flow_preds": flow_list}
        feature0_s1 = self.conv_s8(params["conv_s8"], img0, **kw)
        up_flow0 = self.upsample_s8(params["upsample_s8"], feature0_s1,
                                    flow0)
        up_flow0 = self.postprocess_predictions(up_flow0, image_resizer,
                                                is_flow=True)
        return {"flows": self.nhwc_flow_to_output(up_flow0)}


@register_model
@trainable
class neuflow2(NeuFlow2):
    pass
