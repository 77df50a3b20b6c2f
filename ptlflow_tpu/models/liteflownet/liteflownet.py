"""LiteFlowNet: cascaded Matching / SubPixel / Regularization pyramid.

Parity with /root/reference/ptlflow/models/liteflownet/liteflownet.py:18-357
and warp.py:25-45: 6-stage feature extractor (5 pyramid levels used),
per-level descriptor matching (7x7 correlation, strided+dilated at coarse
levels with grouped-deconv corr upsampling), sub-pixel refinement, and
feature-driven local flow regularization (negative-square-softmax distance
over unfolded flows).  Quirks preserved: the regularization brightness error
broadcasts the warped image's green channel (liteflownet.py:214-229), the
warp normalizes flow by (size-1) with align_corners=True and masks at
mask >= 1.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax.numpy as jnp

from ... import nn
from ...ops.correlation import coords_grid, local_correlation
from ...ops.grid_sample import bilinear_sampler, interpolate
from ...utils.registry import register_model
from ..base import BaseModel


def lrelu(x):
    return nn.leaky_relu(x, 0.1)


def lfn_warp(x: jnp.ndarray, flow: jnp.ndarray, mult: float) -> jnp.ndarray:
    """WarpingLayer (warp.py:25-45): pixel shift = flow * mult (the reference
    passes div_flow=1/mult and divides), align_corners=True, mask >= 1."""
    b, h, w, c = x.shape
    coords = coords_grid(b, h, w, dtype=flow.dtype) + flow * mult
    out = bilinear_sampler(x, coords)
    # torch's mask (grid_sample of ones >= 1) is exactly "sample fully in
    # bounds"; computing it analytically avoids fp-noise at the threshold
    mask = ((coords[..., 0] >= 0) & (coords[..., 0] <= w - 1) &
            (coords[..., 1] >= 0) & (coords[..., 1] <= h - 1))
    return out * mask[..., None].astype(x.dtype)


class FeatureExtractor(nn.Module):
    def __init__(self):
        super().__init__()
        self.convs = nn.ModuleList([
            nn.Sequential(nn.Conv2d(3, 32, 7, 1, 3), lrelu),
            nn.Sequential(nn.Conv2d(32, 32, 3, 2, 1), lrelu,
                          nn.Conv2d(32, 32, 3, 1, 1), lrelu,
                          nn.Conv2d(32, 32, 3, 1, 1), lrelu),
            nn.Sequential(nn.Conv2d(32, 64, 3, 2, 1), lrelu,
                          nn.Conv2d(64, 64, 3, 1, 1), lrelu),
            nn.Sequential(nn.Conv2d(64, 96, 3, 2, 1), lrelu,
                          nn.Conv2d(96, 96, 3, 1, 1), lrelu),
            nn.Sequential(nn.Conv2d(96, 128, 3, 2, 1), lrelu),
            nn.Sequential(nn.Conv2d(128, 192, 3, 2, 1), lrelu),
        ])

    def __call__(self, params, images, **kw):
        """images: (B, 2, H, W, 3) -> list of (B, 2, h, w, c), coarse first."""
        b, n = images.shape[:2]
        x = images.reshape(b * n, *images.shape[2:])
        feats = []
        for i, conv in enumerate(self.convs):
            x = conv(params["convs"][str(i)], x)
            if i > 0:
                feats.append(x.reshape(b, n, *x.shape[1:]))
        return feats[::-1]


class Matching(nn.Module):
    def __init__(self, level: int, num_levels: int = 5,
                 div_flow: float = 20.0):
        super().__init__()
        self.level = level
        self.corr_stride = [1, 1, 1, 2, 2][level]
        flow_kernel_size = [3, 3, 5, 5, 7][level]
        self.mult = [div_flow / 2 ** (num_levels - i)
                     for i in range(num_levels)][level]
        if level != 0:
            self.up_flow = nn.ConvTranspose2d(2, 2, 4, 2, 1, bias=False,
                                              groups=2)
        else:
            self.up_flow = None
        if level >= 3:
            self.up_corr = nn.ConvTranspose2d(49, 49, 4, 2, 1, bias=False,
                                              groups=49)
        else:
            self.up_corr = None
        self.flow_net = nn.Sequential(
            nn.Conv2d(49, 128, 3, 1, 1), lrelu,
            nn.Conv2d(128, 64, 3, 1, 1), lrelu,
            nn.Conv2d(64, 32, 3, 1, 1), lrelu,
            nn.Conv2d(32, 2, flow_kernel_size, 1, flow_kernel_size // 2))

    def __call__(self, params, feats, flow: Optional[jnp.ndarray], **kw):
        feat1 = feats[:, 0]
        warped_feat2 = feats[:, 1]
        if flow is not None:
            flow = self.up_flow(params["up_flow"], flow)
            warped_feat2 = lfn_warp(feats[:, 1], flow, self.mult)
        corr = local_correlation(feat1, warped_feat2, 3, normalize=False,
                                 dilation=self.corr_stride,
                                 stride=self.corr_stride) / feats.shape[-1]
        corr = lrelu(corr)
        if self.up_corr is not None:
            corr = self.up_corr(params["up_corr"], corr)
        new_flow = self.flow_net(params["flow_net"], corr)
        if flow is not None:
            new_flow = flow + new_flow
        return new_flow


class SubPixel(nn.Module):
    def __init__(self, level: int, num_levels: int = 5,
                 div_flow: float = 20.0):
        super().__init__()
        inputs_dims = [386, 258, 194, 130, 130][level]
        flow_kernel_size = [3, 3, 5, 5, 7][level]
        self.mult = [div_flow / 2 ** (num_levels - i)
                     for i in range(num_levels)][level]
        self.flow_net = nn.Sequential(
            nn.Conv2d(inputs_dims, 128, 3, 1, 1), lrelu,
            nn.Conv2d(128, 64, 3, 1, 1), lrelu,
            nn.Conv2d(64, 32, 3, 1, 1), lrelu,
            nn.Conv2d(32, 2, flow_kernel_size, 1, flow_kernel_size // 2))

    def __call__(self, params, feats, flow, **kw):
        feat_warped = lfn_warp(feats[:, 1], flow, self.mult)
        x = jnp.concatenate([feats[:, 0], feat_warped, flow], axis=-1)
        return flow + self.flow_net(params["flow_net"], x)


class Regularization(nn.Module):
    def __init__(self, level: int, num_levels: int = 5,
                 div_flow: float = 20.0):
        super().__init__()
        self.level = level
        inputs_dims = [195, 131, 99, 67, 35][level]
        self.k = [3, 3, 5, 5, 7][level]
        self.mult = [div_flow / 2 ** (num_levels - i)
                     for i in range(num_levels)][level]
        if level < 2:
            self.feat_conv = nn.Sequential()
        else:
            self.feat_conv = nn.Sequential(
                nn.Conv2d(inputs_dims - 3, 128, 1, 1, 0), lrelu)
            inputs_dims = 131
        self.feat_net = nn.Sequential(
            nn.Conv2d(inputs_dims, 128, 3, 1, 1), lrelu,
            nn.Conv2d(128, 128, 3, 1, 1), lrelu,
            nn.Conv2d(128, 64, 3, 1, 1), lrelu,
            nn.Conv2d(64, 64, 3, 1, 1), lrelu,
            nn.Conv2d(64, 32, 3, 1, 1), lrelu,
            nn.Conv2d(32, 32, 3, 1, 1), lrelu)
        k = self.k
        if level < 2:
            self.dist = nn.Conv2d(32, k * k, 3, 1, 1)
        else:
            self.dist = nn.Sequential(
                nn.Conv2d(32, k * k, (k, 1), 1, (k // 2, 0)),
                nn.Conv2d(k * k, k * k, (1, k), 1, (0, k // 2)))

    def __call__(self, params, images, feats, flow, **kw):
        # images: (B, 2, h, w, 3)
        img2_warped = lfn_warp(images[:, 1], flow, self.mult)
        # reference quirk: only the warped green channel broadcasts
        diff = images[:, 0] - img2_warped[..., 1:2]
        img_diff_norm = jnp.linalg.norm(diff, axis=-1, keepdims=True)

        flow_mean = jnp.mean(flow, axis=(1, 2), keepdims=True)
        flow_nomean = flow - flow_mean
        feat = self.feat_conv(params.get("feat_conv", {}), feats[:, 0])
        x = jnp.concatenate([img_diff_norm, flow_nomean, feat], axis=-1)
        x = self.feat_net(params["feat_net"], x)
        dist = self.dist(params["dist"], x)
        dist = -jnp.square(dist)
        dist = jnp.exp(dist - jnp.max(dist, axis=-1, keepdims=True))
        div = jnp.sum(dist, axis=-1, keepdims=True)

        b, h, w, _ = flow.shape
        k = self.k
        fp = jnp.pad(flow, ((0, 0), (k // 2, k // 2), (k // 2, k // 2),
                            (0, 0)))
        # unfold order: kernel positions row-major (dy, dx)
        neigh = jnp.stack([fp[:, dy:dy + h, dx:dx + w, :]
                           for dy in range(k) for dx in range(k)], axis=3)
        # (B, h, w, k*k, 2)
        sm = jnp.sum(neigh * dist[..., None], axis=3) / div
        return sm


class LiteFlowNet(BaseModel):
    pretrained_checkpoints = {
        "kitti": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/liteflownet-kitti-49f1991a.ckpt",
        "sintel": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/liteflownet-sintel-17991e50.ckpt",
        "things": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/liteflownet-things-a4d066e2.ckpt",
    }

    def __init__(self, div_flow: float = 20.0, **kwargs):
        super().__init__(loss_fn=None, output_stride=32, **kwargs)
        self.div_flow = div_flow
        self.num_levels = 5
        self.feature_net = FeatureExtractor()
        self.matching_nets = nn.ModuleList(
            [Matching(i, self.num_levels, div_flow)
             for i in range(self.num_levels)])
        self.subpixel_nets = nn.ModuleList(
            [SubPixel(i, self.num_levels, div_flow)
             for i in range(self.num_levels)])
        self.regularization_nets = nn.ModuleList(
            [Regularization(i, self.num_levels, div_flow)
             for i in range(self.num_levels)])
        self.feat2_conv = nn.Sequential(nn.Conv2d(32, 64, 1, 1, 0), lrelu)

    def forward(self, params, inputs: Dict[str, Any],
                training: bool = False) -> Dict[str, jnp.ndarray]:
        images, image_resizer = self.preprocess_images(
            inputs["images"],
            bgr_add=(-0.454253, -0.434631, -0.411618), bgr_mult=1.0,
            bgr_to_rgb=True, resize_mode="interpolation",
            interpolation_mode="bilinear",
            interpolation_align_corners=False)

        feats_pyr = self.feature_net(params["feature_net"], images)
        b, n = images.shape[:2]
        flat_imgs = images.reshape(b * n, *images.shape[2:])
        images_pyr = [
            interpolate(flat_imgs, f.shape[2:4], mode="bilinear",
                        align_corners=False).reshape(b, n, *f.shape[2:4], 3)
            for f in feats_pyr]

        flow = None
        flow_preds: List[jnp.ndarray] = []
        for i in range(self.num_levels):
            feats2 = feats_pyr[i]
            if i == self.num_levels - 1:
                f = feats2.reshape(b * n, *feats2.shape[2:])
                f = self.feat2_conv(params["feat2_conv"], f)
                feats2 = f.reshape(b, n, *f.shape[1:])
            flow = self.matching_nets[i](
                params["matching_nets"][str(i)], feats2, flow)
            flow = self.subpixel_nets[i](
                params["subpixel_nets"][str(i)], feats2, flow)
            flow = self.regularization_nets[i](
                params["regularization_nets"][str(i)], images_pyr[i],
                feats_pyr[i], flow)
            flow_preds.append(flow)

        flow = flow * self.div_flow
        h, w = flow.shape[1:3]
        flow = interpolate(flow, (2 * h, 2 * w), mode="bilinear",
                           align_corners=False)
        flow = self.postprocess_predictions(flow, image_resizer, is_flow=True)
        outputs = {"flows": self.nhwc_flow_to_output(flow)}
        if training:
            outputs["flow_preds"] = flow_preds
        return outputs


@register_model
class liteflownet(LiteFlowNet):
    pass
