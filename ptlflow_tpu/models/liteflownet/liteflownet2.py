"""LiteFlowNet2 (reference: ptlflow/models/liteflownet/liteflownet2.py).

Same M/S/R cascade design as LiteFlowNet but with a 4-level decoder, deeper
flow nets, and an optional "pseudo" extra upsampling stage (KITTI variant).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax.numpy as jnp

from ... import nn
from ...nn import Module
from ...ops.correlation import local_correlation
from ...ops.grid_sample import interpolate
from ...utils.registry import register_model
from ..base.base_model import BaseModel
from .liteflownet import lfn_warp, lrelu


class FeatureExtractor2(Module):
    """liteflownet2.py:18-61 (shared with LiteFlowNet3)."""

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
        b, n = images.shape[:2]
        x = images.reshape(b * n, *images.shape[2:])
        feats = []
        for i, conv in enumerate(self.convs):
            x = conv(params["convs"][str(i)], x)
            if i > 1:
                feats.append(x.reshape(b, n, *x.shape[1:]))
        return feats[::-1]


def _mults(num_levels, div_flow):
    return [div_flow / 2 ** (num_levels - i + 1) for i in range(num_levels)]


class Matching2(Module):
    """liteflownet2.py:64-128."""

    def __init__(self, level: int, num_levels: int = 4,
                 div_flow: float = 20.0):
        super().__init__()
        self.corr_stride = [1, 1, 1, 2][level]
        flow_kernel_size = [3, 3, 5, 5][level]
        self.mult = _mults(num_levels, div_flow)[level]
        self.up_flow = None if level == 0 else nn.ConvTranspose2d(
            2, 2, 4, 2, 1, bias=False, groups=2)
        self.up_corr = None if level < 3 else nn.ConvTranspose2d(
            49, 49, 4, 2, 1, bias=False, groups=49)
        self.flow_net = nn.Sequential(
            nn.Conv2d(49, 128, 3, 1, 1), lrelu,
            nn.Conv2d(128, 128, 3, 1, 1), lrelu,
            nn.Conv2d(128, 96, 3, 1, 1), lrelu,
            nn.Conv2d(96, 64, 3, 1, 1), lrelu,
            nn.Conv2d(64, 32, 3, 1, 1), lrelu,
            nn.Conv2d(32, 2, flow_kernel_size, 1, flow_kernel_size // 2))

    def __call__(self, params, feats, flow: Optional[jnp.ndarray], **kw):
        warped_feat2 = feats[:, 1]
        if flow is not None:
            flow = self.up_flow(params["up_flow"], flow)
            warped_feat2 = lfn_warp(feats[:, 1], flow, self.mult)
        corr = lrelu(local_correlation(
            feats[:, 0], warped_feat2, 3, normalize=False,
            dilation=self.corr_stride,
            stride=self.corr_stride)) / feats.shape[-1]
        if self.up_corr is not None:
            corr = self.up_corr(params["up_corr"], corr)
        new_flow = self.flow_net(params["flow_net"], corr)
        if flow is not None:
            new_flow = flow + new_flow
        return new_flow


class SubPixel2(Module):
    """liteflownet2.py:131-168 (shared with LiteFlowNet3); also returns the
    penultimate features for the pseudo stage."""

    def __init__(self, level: int, num_levels: int = 4,
                 div_flow: float = 20.0):
        super().__init__()
        inputs_dims = [386, 258, 194, 130][level]
        flow_kernel_size = [3, 3, 5, 5][level]
        self.mult = _mults(num_levels, div_flow)[level]
        self.feat_net = nn.Sequential(
            nn.Conv2d(inputs_dims, 128, 3, 1, 1), lrelu,
            nn.Conv2d(128, 128, 3, 1, 1), lrelu,
            nn.Conv2d(128, 96, 3, 1, 1), lrelu,
            nn.Conv2d(96, 64, 3, 1, 1), lrelu,
            nn.Conv2d(64, 32, 3, 1, 1), lrelu)
        self.flow_net = nn.Conv2d(32, 2, flow_kernel_size, 1,
                                  flow_kernel_size // 2)

    def __call__(self, params, feats, flow, **kw):
        feat_warped = lfn_warp(feats[:, 1], flow, self.mult)
        x = jnp.concatenate([feats[:, 0], feat_warped, flow], axis=-1)
        x = self.feat_net(params["feat_net"], x)
        return flow + self.flow_net(params["flow_net"], x), x


def smooth_flow(flow, dist, k):
    """Distance-weighted local flow smoothing shared by the R units:
    dist logits -> exp(-d^2) weights over a k*k unfold of the flow."""
    dist = -jnp.square(dist)
    dist = jnp.exp(dist - jnp.max(dist, axis=-1, keepdims=True))
    div = jnp.sum(dist, axis=-1, keepdims=True)
    b, h, w, _ = flow.shape
    fp = jnp.pad(flow, ((0, 0), (k // 2, k // 2), (k // 2, k // 2), (0, 0)))
    neigh = jnp.stack([fp[:, dy:dy + h, dx:dx + w, :]
                       for dy in range(k) for dx in range(k)], axis=3)
    return jnp.sum(neigh * dist[..., None], axis=3) / div


class Regularization2(Module):
    """liteflownet2.py:171-264."""

    def __init__(self, level: int, num_levels: int = 4,
                 div_flow: float = 20.0):
        super().__init__()
        self.level = level
        inputs_dims = [195, 131, 99, 67][level]
        self.k = [3, 3, 5, 5][level]
        self.mult = _mults(num_levels, div_flow)[level]
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
        img2_warped = lfn_warp(images[:, 1], flow, self.mult)
        # reference quirk kept: only the warped green channel broadcasts
        # (liteflownet2.py:236-238)
        diff = images[:, 0] - img2_warped[..., 1:2]
        img_diff_norm = jnp.linalg.norm(diff, axis=-1, keepdims=True)
        flow_nomean = flow - jnp.mean(flow, axis=(1, 2), keepdims=True)
        feat = self.feat_conv(params.get("feat_conv", {}), feats[:, 0])
        x = jnp.concatenate([img_diff_norm, flow_nomean, feat], axis=-1)
        x = self.feat_net(params["feat_net"], x)
        dist = self.dist(params["dist"], x)
        return smooth_flow(flow, dist, self.k), x


class PseudoSubpixel(Module):
    """liteflownet2.py:267-278 (shared with LiteFlowNet3)."""

    def __init__(self):
        super().__init__()
        self.up_flow = nn.ConvTranspose2d(2, 2, 4, 2, 1, bias=False,
                                          groups=2)
        self.flow_net = nn.Sequential(
            nn.ConvTranspose2d(32, 32, 4, 2, 1), nn.Conv2d(32, 2, 7, 1, 3))

    def __call__(self, params, sub_feat, flow, **kw):
        return self.up_flow(params["up_flow"], flow) + \
            self.flow_net(params["flow_net"], sub_feat)


class PseudoRegularization(Module):
    """liteflownet2.py:281-313 (shared with LiteFlowNet3)."""

    def __init__(self):
        super().__init__()
        self.feat_net = nn.Sequential(
            nn.ConvTranspose2d(32, 32, 4, 2, 1),
            nn.Conv2d(32, 49, (7, 1), 1, (3, 0)),
            nn.Conv2d(49, 49, (1, 7), 1, (0, 3)))

    def __call__(self, params, reg_feat, flow, **kw):
        dist = self.feat_net(params["feat_net"], reg_feat)
        return smooth_flow(flow, dist, 7)


class LiteFlowNet2(BaseModel):
    pretrained_checkpoints = {
        "sintel": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/liteflownet2-sintel-1e1eb282.ckpt",
    }

    def __init__(self, div_flow: float = 20.0,
                 use_pseudo_regularization: bool = False, **kwargs):
        super().__init__(loss_fn=None, output_stride=32, **kwargs)
        self.div_flow = div_flow
        self.use_pseudo_regularization = use_pseudo_regularization
        self.num_levels = 4
        self.feature_net = FeatureExtractor2()
        self.matching_nets = nn.ModuleList(
            [Matching2(i, self.num_levels, div_flow)
             for i in range(self.num_levels)])
        self.subpixel_nets = nn.ModuleList(
            [SubPixel2(i, self.num_levels, div_flow)
             for i in range(self.num_levels)])
        self.regularization_nets = nn.ModuleList(
            [Regularization2(i, self.num_levels, div_flow)
             for i in range(self.num_levels)])
        if use_pseudo_regularization:
            self.pseudo_subpixel = PseudoSubpixel()
            self.pseudo_regularization = PseudoRegularization()
            self.up_flow = nn.ConvTranspose2d(2, 2, 4, 2, 1, bias=False,
                                              groups=2)
        else:
            self.up_flow = nn.ConvTranspose2d(2, 2, 8, 4, 2, bias=False,
                                              groups=2)

    def _images_pyr(self, images, feats_pyr):
        b, n = images.shape[:2]
        flat = images.reshape(b * n, *images.shape[2:])
        return [interpolate(flat, f.shape[2:4], mode="bilinear",
                            align_corners=False).reshape(
                    b, n, *f.shape[2:4], 3)
                for f in feats_pyr]

    def forward(self, params, inputs: Dict[str, Any],
                training: bool = False) -> Dict[str, jnp.ndarray]:
        images, image_resizer = self.preprocess_images(
            inputs["images"],
            bgr_add=(-0.454253, -0.434631, -0.411618), bgr_mult=1.0,
            bgr_to_rgb=True, resize_mode="interpolation",
            interpolation_mode="bilinear",
            interpolation_align_corners=False)
        feats_pyr = self.feature_net(params["feature_net"], images)
        images_pyr = self._images_pyr(images, feats_pyr)

        flow = None
        flow_preds: List[jnp.ndarray] = []
        for i in range(self.num_levels):
            flow = self.matching_nets[i](
                params["matching_nets"][str(i)], feats_pyr[i], flow)
            flow, sub_feat = self.subpixel_nets[i](
                params["subpixel_nets"][str(i)], feats_pyr[i], flow)
            flow, reg_feat = self.regularization_nets[i](
                params["regularization_nets"][str(i)], images_pyr[i],
                feats_pyr[i], flow)
            flow_preds.append(flow)

        if self.use_pseudo_regularization:
            flow = self.pseudo_subpixel(params["pseudo_subpixel"], sub_feat,
                                        flow)
            flow = self.pseudo_regularization(params["pseudo_regularization"],
                                              reg_feat, flow)
        flow = self.up_flow(params["up_flow"], flow)
        flow = flow * self.div_flow
        flow = self.postprocess_predictions(flow, image_resizer,
                                            is_flow=True)
        outputs = {"flows": self.nhwc_flow_to_output(flow)}
        if training:
            outputs["flow_preds"] = flow_preds
        return outputs


class LiteFlowNet2PseudoReg(LiteFlowNet2):
    pretrained_checkpoints = {
        "kitti": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/liteflownet2-kitti-da069fca.ckpt",
    }

    def __init__(self, div_flow: float = 20.0,
                 use_pseudo_regularization: bool = True, **kwargs):
        super().__init__(div_flow, use_pseudo_regularization, **kwargs)


@register_model
class liteflownet2(LiteFlowNet2):
    pass


@register_model
class liteflownet2_pseudoreg(LiteFlowNet2PseudoReg):
    pass
