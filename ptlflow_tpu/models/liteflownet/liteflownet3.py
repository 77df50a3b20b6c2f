"""LiteFlowNet3 (reference: ptlflow/models/liteflownet/liteflownet3.py).

LiteFlowNet2 plus flow-field deformation (warping the flow by a predicted
displacement using self-correlation + confidence) and cost-volume
modulation (learned per-position scale/offset of the 9x9 correlation).
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
from .liteflownet2 import (FeatureExtractor2, PseudoRegularization,
                           PseudoSubpixel, SubPixel2, _mults, smooth_flow)


class FlowFieldDeformation(Module):
    """liteflownet3.py:64-118."""

    def __init__(self, level: int):
        super().__init__()
        self.patch_size = [None, 5, 7, 9][level]
        pred_kernel_size = [None, 3, 5, 5][level]
        self.up_conf = nn.ConvTranspose2d(1, 1, 4, 2, 1, bias=False)
        self.up_flow = nn.ConvTranspose2d(2, 2, 4, 2, 1, bias=False,
                                          groups=2)
        self.feat_net = nn.Sequential(
            nn.Conv2d(self.patch_size ** 2 + 1, 128, 3, 1, 1), lrelu,
            nn.Conv2d(128, 64, 3, 1, 1), lrelu,
            nn.Conv2d(64, 32, 3, 1, 1), lrelu)
        self.disp_pred = nn.Conv2d(32, 2, pred_kernel_size, 1,
                                   pred_kernel_size // 2)
        self.conf_pred = nn.Sequential(
            nn.Conv2d(32, 1, pred_kernel_size, 1, pred_kernel_size // 2),
            nn.sigmoid)

    def __call__(self, params, feats, flow, conf, **kw):
        conf = self.up_conf(params["up_conf"], conf)
        flow = self.up_flow(params["up_flow"], flow)
        self_corr = lrelu(local_correlation(
            feats[:, 0], feats[:, 0], self.patch_size // 2, normalize=False,
            dilation=2)) / feats.shape[-1]
        x = jnp.concatenate([self_corr, conf], axis=-1)
        x = self.feat_net(params["feat_net"], x)
        disp = self.disp_pred(params["disp_pred"], x)
        # warp the flow field itself by the predicted displacement
        flow = lfn_warp(flow, disp, 1.0)
        conf = self.conf_pred(params["conf_pred"], x)
        return flow, conf


class CostVolumeModulation(Module):
    """liteflownet3.py:121-172."""

    def __init__(self, level: int, num_levels: int = 4,
                 div_flow: float = 20.0):
        super().__init__()
        input_dims = [None, 210, 178, 146][level]
        self.mult = _mults(num_levels, div_flow)[level]
        self.feat_net = nn.Sequential(
            nn.Conv2d(input_dims, 128, 3, 1, 1), lrelu,
            nn.Conv2d(128, 64, 3, 1, 1), lrelu)
        self.mod_scalar_net = nn.Sequential(
            nn.Conv2d(64, 32, 3, 1, 1), lrelu, nn.Conv2d(32, 81, 1, 1, 0))
        self.mod_offset_net = nn.Sequential(
            nn.Conv2d(64, 32, 3, 1, 1), lrelu, nn.Conv2d(32, 81, 1, 1, 0))

    def __call__(self, params, feats, flow, conf, **kw):
        warped_feat2 = lfn_warp(feats[:, 1], flow, self.mult)
        corr = lrelu(local_correlation(
            feats[:, 0], warped_feat2, 4, normalize=False)) / feats.shape[-1]
        x = jnp.concatenate([feats[:, 0], corr, conf], axis=-1)
        x = self.feat_net(params["feat_net"], x)
        mod_scalar = self.mod_scalar_net(params["mod_scalar_net"], x)
        mod_offset = self.mod_offset_net(params["mod_offset_net"], x)
        return mod_scalar * corr + mod_offset


class Matching3(Module):
    """liteflownet3.py:175-243."""

    def __init__(self, level: int, num_levels: int = 4,
                 div_flow: float = 20.0, use_s_version: bool = False):
        super().__init__()
        flow_kernel_size = [3, 3, 5, 5][level]
        self.mult = _mults(num_levels, div_flow)[level]
        self.up_flow = nn.ConvTranspose2d(2, 2, 4, 2, 1, bias=False,
                                          groups=2) \
            if (level == 1 and not use_s_version) else None
        self.has_corr = level < 2
        self.flow_net = nn.Sequential(
            nn.Conv2d(81, 128, 3, 1, 1), lrelu,
            nn.Conv2d(128, 128, 3, 1, 1), lrelu,
            nn.Conv2d(128, 96, 3, 1, 1), lrelu,
            nn.Conv2d(96, 64, 3, 1, 1), lrelu,
            nn.Conv2d(64, 32, 3, 1, 1), lrelu,
            nn.Conv2d(32, 2, flow_kernel_size, 1, flow_kernel_size // 2))

    def __call__(self, params, feats, flow: Optional[jnp.ndarray],
                 corr: Optional[jnp.ndarray], **kw):
        if self.up_flow is not None:
            flow = self.up_flow(params["up_flow"], flow)
        if corr is None:
            warped_feat2 = feats[:, 1]
            if flow is not None:
                warped_feat2 = lfn_warp(feats[:, 1], flow, self.mult)
            corr = lrelu(local_correlation(
                feats[:, 0], warped_feat2, 4,
                normalize=False)) / feats.shape[-1]
        new_flow = self.flow_net(params["flow_net"], corr)
        if flow is not None:
            new_flow = flow + new_flow
        return new_flow


class Regularization3(Module):
    """liteflownet3.py:286-396 (full-image diff norm + confidence head)."""

    def __init__(self, level: int, num_levels: int = 4,
                 div_flow: float = 20.0, use_s_version: bool = False):
        super().__init__()
        inputs_dims = [195, 131, 99, 67][level]
        self.k = [3, 3, 5, 5][level]
        conf_kernel_size = [3, 3, 5, None][level]
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
        if (level == 0 and not use_s_version) or level == 3:
            self.conf_pred = None
        else:
            self.conf_pred = nn.Sequential(
                nn.Conv2d(32, 1, conf_kernel_size, 1,
                          conf_kernel_size // 2), nn.sigmoid)

    def __call__(self, params, images, feats, flow, **kw):
        img2_warped = lfn_warp(images[:, 1], flow, self.mult)
        diff = images[:, 0] - img2_warped
        img_diff_norm = jnp.linalg.norm(diff, axis=-1, keepdims=True)
        flow_nomean = flow - jnp.mean(flow, axis=(1, 2), keepdims=True)
        feat = self.feat_conv(params.get("feat_conv", {}), feats[:, 0])
        x = jnp.concatenate([img_diff_norm, flow_nomean, feat], axis=-1)
        x = self.feat_net(params["feat_net"], x)
        dist = self.dist(params["dist"], x)
        flow = smooth_flow(flow, dist, self.k)
        conf = None
        if self.conf_pred is not None:
            conf = self.conf_pred(params["conf_pred"], x)
        return flow, conf, x


class LiteFlowNet3(BaseModel):
    pretrained_checkpoints = {
        "sintel": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/liteflownet3-sintel-d985929f.ckpt",
    }

    def __init__(self, div_flow: float = 20.0,
                 use_pseudo_regularization: bool = False,
                 use_s_version: bool = False, **kwargs):
        super().__init__(loss_fn=None, output_stride=32, **kwargs)
        self.div_flow = div_flow
        self.use_pseudo_regularization = use_pseudo_regularization
        self.use_s_version = use_s_version
        self.num_levels = 4
        self.min_mod_level = 1 if use_s_version else 2
        self.feature_net = FeatureExtractor2()
        self.deformation_nets = nn.ModuleList(
            [FlowFieldDeformation(i)
             for i in range(self.min_mod_level, self.num_levels)])
        self.modulation_nets = nn.ModuleList(
            [CostVolumeModulation(i, self.num_levels, div_flow)
             for i in range(self.min_mod_level, self.num_levels)])
        self.matching_nets = nn.ModuleList(
            [Matching3(i, self.num_levels, div_flow, use_s_version)
             for i in range(self.num_levels)])
        self.subpixel_nets = nn.ModuleList(
            [SubPixel2(i, self.num_levels, div_flow)
             for i in range(self.num_levels)])
        self.regularization_nets = nn.ModuleList(
            [Regularization3(i, self.num_levels, div_flow, use_s_version)
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
        conf = None
        corr = None
        flow_preds: List[jnp.ndarray] = []
        conf_preds: List[jnp.ndarray] = []
        for i in range(self.num_levels):
            if i >= self.min_mod_level:
                j = str(i - self.min_mod_level)
                flow, conf = self.deformation_nets[i - self.min_mod_level](
                    params["deformation_nets"][j], feats_pyr[i], flow, conf)
                if conf is not None:
                    conf_preds.append(conf)
                corr = self.modulation_nets[i - self.min_mod_level](
                    params["modulation_nets"][j], feats_pyr[i], flow, conf)
            flow = self.matching_nets[i](
                params["matching_nets"][str(i)], feats_pyr[i], flow, corr)
            flow, sub_feat = self.subpixel_nets[i](
                params["subpixel_nets"][str(i)], feats_pyr[i], flow)
            flow, conf, reg_feat = self.regularization_nets[i](
                params["regularization_nets"][str(i)], images_pyr[i],
                feats_pyr[i], flow)
            flow_preds.append(flow)
            if conf is not None:
                conf_preds.append(conf)

        if self.use_pseudo_regularization:
            flow = self.pseudo_subpixel(params["pseudo_subpixel"], sub_feat,
                                        flow)
            flow = self.pseudo_regularization(params["pseudo_regularization"],
                                              reg_feat, flow)
        flow = self.up_flow(params["up_flow"], flow)
        flow = flow * self.div_flow
        flow = self.postprocess_predictions(flow, image_resizer,
                                            is_flow=True)
        cf = conf_preds[-1]
        cf = interpolate(cf, (cf.shape[1] * 4, cf.shape[2] * 4),
                         mode="bilinear", align_corners=False)
        cf = self.postprocess_predictions(cf, image_resizer, is_flow=False)
        outputs = {"flows": self.nhwc_flow_to_output(flow),
                   "confs": jnp.moveaxis(cf, -1, -3)[:, None]}
        if training:
            outputs["flow_preds"] = flow_preds
            outputs["conf_preds"] = conf_preds
        return outputs


class LiteFlowNet3PseudoReg(LiteFlowNet3):
    pretrained_checkpoints = {
        "kitti": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/liteflownet3-kitti-b5d32443.ckpt",
    }

    def __init__(self, div_flow: float = 20.0,
                 use_pseudo_regularization: bool = True,
                 use_s_version: bool = False, **kwargs):
        super().__init__(div_flow, use_pseudo_regularization, use_s_version,
                         **kwargs)


class LiteFlowNet3S(LiteFlowNet3):
    pretrained_checkpoints = {
        "sintel": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/liteflownet3s-sintel-89793e34.ckpt",
    }

    def __init__(self, div_flow: float = 20.0,
                 use_pseudo_regularization: bool = False,
                 use_s_version: bool = True, **kwargs):
        super().__init__(div_flow, use_pseudo_regularization, use_s_version,
                         **kwargs)


class LiteFlowNet3SPseudoReg(LiteFlowNet3):
    pretrained_checkpoints = {
        "kitti": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/liteflownet3s-kitti-5dffb261.ckpt",
    }

    def __init__(self, div_flow: float = 20.0,
                 use_pseudo_regularization: bool = True,
                 use_s_version: bool = True, **kwargs):
        super().__init__(div_flow, use_pseudo_regularization, use_s_version,
                         **kwargs)


@register_model
class liteflownet3(LiteFlowNet3):
    pass


@register_model
class liteflownet3_pseudoreg(LiteFlowNet3PseudoReg):
    pass


@register_model
class liteflownet3s(LiteFlowNet3S):
    pass


@register_model
class liteflownet3s_pseudoreg(LiteFlowNet3SPseudoReg):
    pass
