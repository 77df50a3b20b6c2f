"""NeuFlow: highly efficient global-matching flow network.

Parity with /root/reference/ptlflow/models/neuflow/{neuflow.py, backbone.py,
matching.py, transformer.py, refine.py, upsample.py, utils.py}: multi-scale
strided-conv backbone with normalized (y, x) position channels, scaled-dot-
product cross attention at 1/16, global correlation softmax producing
correspondence (attention over the coords grid), flow self-attention,
merge + local-correlation refinement at 1/8, convex upsample to full
resolution.  NHWC; all attention runs as MXU matmuls.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ... import nn
from ...ops.correlation import coords_grid, local_correlation
from ...ops.grid_sample import interpolate
from ...ops.upsample import convex_upsample
from ...ops.warp import backward_warp
from ...utils.registry import register_model, trainable
from ..base import BaseModel


def lrelu(x):
    return nn.leaky_relu(x, 0.1)


def sdpa(q, k, v):
    """torch F.scaled_dot_product_attention for (B, L, C) tensors."""
    scale = 1.0 / jnp.sqrt(q.shape[-1]).astype(jnp.float32)
    scores = jnp.einsum("blc,bmc->blm", q, k,
                        preferred_element_type=jnp.float32) * scale
    attn = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    return jnp.einsum("blm,bmc->blc", attn, v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


class SequenceLoss:
    """Two-prediction weighted L1 (neuflow.py:17-42; weights [0.2, 1])."""

    def __init__(self, gamma: float, max_flow: float):
        self.max_flow = max_flow

    def __call__(self, outputs, inputs):
        flow_preds = outputs["flow_preds"]
        flow_gt = jnp.moveaxis(inputs["flows"][:, 0], -3, -1)
        valid = jnp.moveaxis(inputs["valids"][:, 0], -3, -1)
        mag = jnp.sqrt(jnp.sum(flow_gt ** 2, axis=-1, keepdims=True))
        valid = ((valid >= 0.5) & (mag < self.max_flow)).astype(flow_gt.dtype)
        weights = [0.2, 1.0]
        loss = 0.0
        for i, pred in enumerate(flow_preds):
            loss = loss + weights[i] * jnp.mean(
                valid * jnp.abs(pred - flow_gt))
        return loss


class ConvBlock(nn.Module):
    """backbone.py:5-35: two convs, residual, affine-free batch norm."""

    def __init__(self, in_planes, out_planes, kernel_size, stride, padding):
        super().__init__()
        self.conv1 = nn.Conv2d(in_planes, out_planes, kernel_size,
                               stride=stride, padding=padding, bias=False)
        self.conv2 = nn.Conv2d(out_planes, out_planes, 3, stride=1,
                               padding=1, bias=False)
        self.norm = nn.BatchNorm2d(out_planes, eps=1e-6, affine=False)

    def __call__(self, params, x, **kw):
        x1 = lrelu(self.conv1(params["conv1"], x))
        x2 = lrelu(self.conv2(params["conv2"], x1))
        return self.norm(params.get("norm", {}), x1 + x2, **kw)


class DownDimBlock(nn.Module):
    def __init__(self, in_planes, out_planes):
        super().__init__()
        self.conv_block = ConvBlock(in_planes, out_planes, 1, 1, 0)

    def __call__(self, params, x, **kw):
        return self.conv_block(params["conv_block"], lrelu(x), **kw)


def _pos_channels(b, h, w, dtype):
    ys = jnp.arange(h, dtype=dtype) / (h - 1)
    xs = jnp.arange(w, dtype=dtype) / (w - 1)
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    pos = jnp.stack([yy, xx], axis=-1)  # (H, W, 2), (y, x) order
    return jnp.broadcast_to(pos[None], (b, h, w, 2))


class CNNEncoder(nn.Module):
    def __init__(self, feature_dim):
        super().__init__()
        self.block1_1 = ConvBlock(3, feature_dim, 8, 8, 0)
        self.block1_2 = ConvBlock(3, feature_dim, 8, 4, 2)
        self.block1_3 = ConvBlock(3, feature_dim, 8, 2, 3)
        self.block1_4 = ConvBlock(3, feature_dim, 7, 1, 3)
        self.block1_dd = DownDimBlock(feature_dim * 4, feature_dim)
        self.block1_ds = ConvBlock(feature_dim, feature_dim, 2, 2, 0)
        self.block2 = ConvBlock(3, feature_dim, 7, 1, 3)
        self.block2_dd = DownDimBlock(feature_dim * 2, feature_dim)

    def __call__(self, params, img, **kw):
        b = img.shape[0]
        x1_1 = self.block1_1(params["block1_1"], img, **kw)
        img = nn.avg_pool2d(img, 2, 2)
        x1_2 = self.block1_2(params["block1_2"], img, **kw)
        img = nn.avg_pool2d(img, 2, 2)
        x1_3 = self.block1_3(params["block1_3"], img, **kw)
        img = nn.avg_pool2d(img, 2, 2)
        x1_4 = self.block1_4(params["block1_4"], img, **kw)
        x1 = jnp.concatenate([x1_1, x1_2, x1_3, x1_4], axis=-1)
        x1 = self.block1_dd(params["block1_dd"], x1, **kw)
        img = nn.avg_pool2d(img, 2, 2)
        x2 = self.block2(params["block2"], img, **kw)
        x2 = jnp.concatenate(
            [self.block1_ds(params["block1_ds"], x1, **kw), x2], axis=-1)
        x2 = self.block2_dd(params["block2_dd"], x2, **kw)
        x1 = jnp.concatenate(
            [x1, _pos_channels(b, x1.shape[1], x1.shape[2], x1.dtype)],
            axis=-1)
        x2 = jnp.concatenate(
            [x2, _pos_channels(b, x2.shape[1], x2.shape[2], x2.dtype)],
            axis=-1)
        return x1, x2


class TransformerLayer(nn.Module):
    def __init__(self, feature_dim, ffn=True, ffn_dim_expansion=1):
        super().__init__()
        self.q_proj = nn.Linear(feature_dim, feature_dim)
        self.k_proj = nn.Linear(feature_dim, feature_dim)
        self.v_proj = nn.Linear(feature_dim, feature_dim)
        self.merge = nn.Linear(feature_dim, feature_dim)
        self.norm1 = nn.LayerNorm(feature_dim)
        self.use_ffn = ffn
        if ffn:
            in_ch = feature_dim * 2
            self.mlp = nn.Sequential(
                nn.Linear(in_ch, in_ch * ffn_dim_expansion, bias=False),
                nn.gelu,
                nn.Linear(in_ch * ffn_dim_expansion, feature_dim,
                          bias=False))
            self.norm2 = nn.LayerNorm(feature_dim)

    def __call__(self, params, source, target, **kw):
        q = self.q_proj(params["q_proj"], source)
        k = self.k_proj(params["k_proj"], target)
        v = self.v_proj(params["v_proj"], target)
        message = self.merge(params["merge"], sdpa(q, k, v))
        message = self.norm1(params["norm1"], message)
        if self.use_ffn:
            message = self.mlp(params["mlp"],
                               jnp.concatenate([source, message], axis=-1))
            message = self.norm2(params["norm2"], message)
        return source + message


class FeatureAttention(nn.Module):
    def __init__(self, feature_dim, num_layers, bidir=True, ffn=True,
                 ffn_dim_expansion=1, post_norm=False):
        super().__init__()
        self.bidir = bidir
        self.layers = nn.ModuleList([
            TransformerLayer(feature_dim, ffn=ffn,
                             ffn_dim_expansion=ffn_dim_expansion)
            for _ in range(num_layers)])
        self.post_norm = post_norm
        if post_norm:
            self.norm = nn.LayerNorm(feature_dim, eps=1e-6)

    def __call__(self, params, feature0, feature1, **kw):
        b, h, w, c = feature0.shape
        f0 = feature0.reshape(b, h * w, c)
        f1 = feature1.reshape(b, h * w, c)
        concat0 = jnp.concatenate([f0, f1], axis=0)
        concat1 = jnp.concatenate([f1, f0], axis=0)
        for i, layer in enumerate(self.layers):
            concat0 = layer(params["layers"][str(i)], concat0, concat1)
            c0, c1 = jnp.split(concat0, 2, axis=0)
            concat1 = jnp.concatenate([c1, c0], axis=0)
        if self.post_norm:
            concat0 = self.norm(params["norm"], concat0)
        f0, f1 = jnp.split(concat0, 2, axis=0)
        return f0.reshape(b, h, w, c), f1.reshape(b, h, w, c)


class FlowAttention(nn.Module):
    def __init__(self, feature_dim):
        super().__init__()
        self.q_proj = nn.Linear(feature_dim, feature_dim)
        self.k_proj = nn.Linear(feature_dim, feature_dim)

    def __call__(self, params, feature, flow, **kw):
        b, h, w, c = feature.shape
        f = feature.reshape(b, h * w, c)
        v = flow.reshape(b, h * w, 2)
        q = self.q_proj(params["q_proj"], f)
        k = self.k_proj(params["k_proj"], f)
        out = sdpa(q, k, v)
        return out.reshape(b, h, w, 2)


class RefineConvBlock(nn.Module):
    def __init__(self, in_planes, out_planes, kernel_size, stride, padding):
        super().__init__()
        self.conv = nn.Conv2d(in_planes, out_planes, kernel_size,
                              stride=stride, padding=padding, bias=True)

    def __call__(self, params, x, **kw):
        return lrelu(self.conv(params["conv"], x))


class Refine(nn.Module):
    def __init__(self, feature_dim, patch_size, num_layers):
        super().__init__()
        self.patch_size = patch_size
        self.conv1 = RefineConvBlock(patch_size ** 2 + feature_dim + 2, 96,
                                     3, 1, 1)
        self.conv_layers = nn.ModuleList([
            RefineConvBlock(96, 96, 3, 1, 1) for _ in range(num_layers)])
        self.conv2 = RefineConvBlock(96, 64, 3, 1, 1)
        self.conv3 = RefineConvBlock(64, 32, 3, 1, 1)
        self.conv4 = nn.Conv2d(32, 2, 3, 1, 1, bias=True)

    def __call__(self, params, feature0, feature1, flow0, **kw):
        attn = local_correlation(feature0, feature1,
                                 self.patch_size // 2, normalize=False)
        x = jnp.concatenate([attn, feature0, flow0], axis=-1)
        x = self.conv1(params["conv1"], x)
        for i, layer in enumerate(self.conv_layers):
            x = layer(params["conv_layers"][str(i)], x)
        x = self.conv2(params["conv2"], x)
        x = self.conv3(params["conv3"], x)
        return self.conv4(params["conv4"], x)


class UpSample(nn.Module):
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
        return convex_upsample(flow, mask, factor=self.upsample_factor)


class NeuFlow(BaseModel):
    pretrained_checkpoints = {
        "things": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/neuflow-things-c402aa7a.ckpt",
        "sintel": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/neuflow-sintel-0d969ea2.ckpt",
    }

    def __init__(self, gamma: float = 0.8, max_flow: float = 400.0,
                 feature_dim: int = 90, **kwargs):
        super().__init__(output_stride=16,
                         loss_fn=SequenceLoss(gamma, max_flow), **kwargs)
        self.feature_dim = feature_dim
        self.backbone = CNNEncoder(feature_dim)
        self.cross_attn_s16 = FeatureAttention(
            feature_dim + 2, num_layers=2, bidir=True, ffn=True,
            ffn_dim_expansion=1, post_norm=True)
        self.flow_attn_s16 = FlowAttention(feature_dim + 2)
        self.merge_s8 = nn.Sequential(
            nn.Conv2d((feature_dim + 2) * 2, feature_dim * 2, 3, 1, 1,
                      bias=False),
            nn.gelu,
            nn.Conv2d(feature_dim * 2, feature_dim, 3, 1, 1, bias=False))
        self.refine_s8 = Refine(feature_dim, patch_size=7, num_layers=6)
        self.conv_s8 = ConvBlock(3, feature_dim, 8, 8, 0)
        self.upsample_s1 = UpSample(feature_dim, upsample_factor=8)

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
        kw = dict(training=training)

        f0_s8, f0_s16 = self.backbone(params["backbone"], img0, **kw)
        f1_s8, f1_s16 = self.backbone(params["backbone"], img1, **kw)

        f0_s16, f1_s16 = self.cross_attn_s16(params["cross_attn_s16"],
                                             f0_s16, f1_s16)
        # global correlation softmax (matching.py:16-31) == attention over
        # the coordinate grid
        b, h16, w16, c = f0_s16.shape
        grid = coords_grid(b, h16, w16, dtype=f0_s16.dtype)
        corresp = sdpa(f0_s16.reshape(b, h16 * w16, c),
                       f1_s16.reshape(b, h16 * w16, c),
                       grid.reshape(b, h16 * w16, 2))
        flow0 = corresp.reshape(b, h16, w16, 2) - grid
        flow0 = self.flow_attn_s16(params["flow_attn_s16"], f0_s16, flow0)

        f0_s16 = interpolate(f0_s16, (h16 * 2, w16 * 2), mode="nearest")
        f1_s16 = interpolate(f1_s16, (h16 * 2, w16 * 2), mode="nearest")
        f0_s8 = self.merge_s8(params["merge_s8"],
                              jnp.concatenate([f0_s8, f0_s16], axis=-1))
        f1_s8 = self.merge_s8(params["merge_s8"],
                              jnp.concatenate([f1_s8, f1_s16], axis=-1))

        h8, w8 = h16 * 2, w16 * 2
        flow0 = 2 * interpolate(flow0, (h8, w8), mode="nearest")
        delta = self.refine_s8(params["refine_s8"], f0_s8,
                               backward_warp(f1_s8, flow0), flow0)
        flow0 = flow0 + delta

        flow_list = []
        if training:
            up0 = 8 * interpolate(flow0, (h8 * 8, w8 * 8), mode="bilinear",
                                  align_corners=True)
            flow_list.append(self.postprocess_predictions(
                up0, image_resizer, is_flow=True))

        f0_s8 = self.conv_s8(params["conv_s8"], img0, **kw)
        flow_full = self.upsample_s1(params["upsample_s1"], f0_s8, flow0)
        flow_full = self.postprocess_predictions(flow_full, image_resizer,
                                                 is_flow=True)
        flow_list.append(flow_full)

        outputs = {"flows": self.nhwc_flow_to_output(flow_full)}
        if training:
            outputs["flow_preds"] = flow_list
        return outputs


@register_model
@trainable
class neuflow(NeuFlow):
    pass
