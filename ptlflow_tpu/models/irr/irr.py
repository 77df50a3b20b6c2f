"""IRR — Iterative Residual Refinement PWC models
(reference: ptlflow/models/irr/{pwcnet,pwcnet_irr,irr_pwc}.py,
losses.py:439-739).

Three variants: plain PWC cascade with per-level estimators (irr_pwcnet),
weight-shared iterative residual estimator (irr_pwcnet_irr), and the full
bidirectional flow+occlusion model with shared refinement (irr_pwc).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp

from ... import nn
from ...ops.grid_sample import interpolate
from ...utils.registry import register_model, trainable
from ..base.base_model import BaseModel
from .pwc_modules import (ContextNetwork, FeatureExtractor,
                          FlowEstimatorDense, OccContextNetwork,
                          OccEstimatorDense, OccUpsampleNetwork, RefineFlow,
                          RefineOcc, compute_cost_volume, conv, irr_warp,
                          lrelu, rescale_flow, upsample2d_as)


def _downsample_as(x, hw):
    """adaptive_avg_pool2d for integer ratios (losses.py:18-20)."""
    h, w = x.shape[1], x.shape[2]
    th, tw = hw
    if (h, w) == (th, tw):
        return x
    fh, fw = h // th, w // tw
    b, _, _, c = x.shape
    return x.reshape(b, th, fh, tw, fw, c).mean(axis=(2, 4))


def _epe_sum(pred, target):
    return jnp.sum(jnp.sqrt(jnp.sum((pred - target) ** 2, axis=-1)))


class MultiScaleEPE_PWC:
    """losses.py:439-469 (training scalar)."""

    def __init__(self, div_flow, train_batch_size=None):
        self.div_flow = div_flow
        self.batch_size = train_batch_size
        self.weights = [0.32, 0.08, 0.02, 0.01, 0.005]

    def __call__(self, outputs, inputs):
        target = self.div_flow * jnp.moveaxis(inputs["flows"][:, 0], -3, -1)
        bs = self.batch_size or target.shape[0]
        total = 0.0
        for i, out in enumerate(outputs["flow_preds"]):
            t = _downsample_as(target, out.shape[1:3])
            total += self.weights[i] * _epe_sum(out, t)
        return total / bs


def f1_score_bal_loss(y_pred, y_true):
    """losses.py:47-71."""
    eps = 1e-8
    tp = -jnp.sum(y_true * jnp.log(y_pred + eps), axis=(1, 2, 3))
    fn = -jnp.sum((1 - y_true) * jnp.log(1 - y_pred + eps), axis=(1, 2, 3))
    denom_tp = jnp.sum(y_true, axis=(1, 2, 3)) + \
        jnp.sum(y_pred, axis=(1, 2, 3)) + eps
    denom_fn = jnp.sum(1 - y_true, axis=(1, 2, 3)) + \
        jnp.sum(1 - y_pred, axis=(1, 2, 3)) + eps
    return (jnp.sum(tp / denom_tp) + jnp.sum(fn / denom_fn)) * \
        y_pred.shape[1] * y_pred.shape[2] * 0.5


class MultiScaleEPE_PWC_Bi_Occ_upsample:
    """losses.py:656-739 (training scalar; occluded-region aware)."""

    def __init__(self, div_flow, train_batch_size=None):
        self.div_flow = div_flow
        self.batch_size = train_batch_size
        self.weights = [0.32, 0.08, 0.02, 0.01, 0.005, 0.00125, 0.0003125]

    def __call__(self, outputs, inputs):
        tf_f = self.div_flow * jnp.moveaxis(inputs["flows"][:, 0], -3, -1)
        tf_b = self.div_flow * jnp.moveaxis(
            inputs.get("flows_b", inputs["flows"])[:, 0], -3, -1)
        occs = inputs.get("occs")
        to_f = jnp.moveaxis(occs[:, 0], -3, -1) if occs is not None else \
            jnp.zeros(tf_f.shape[:3] + (1,), tf_f.dtype)
        occs_b = inputs.get("occs_b")
        to_b = jnp.moveaxis(occs_b[:, 0], -3, -1) if occs_b is not None \
            else to_f
        bs = self.batch_size or tf_f.shape[0]

        flow_loss = 0.0
        for i, out_i in enumerate(outputs["flow_preds"]):
            loss_i = 0.0
            for j in range(len(out_i) // 2):
                loss_i += _epe_sum(out_i[2 * j],
                                   _downsample_as(tf_f,
                                                  out_i[2 * j].shape[1:3]))
                loss_i += _epe_sum(
                    out_i[2 * j + 1],
                    _downsample_as(tf_b, out_i[2 * j + 1].shape[1:3]))
            flow_loss += self.weights[i] * loss_i / len(out_i)

        occ_loss = 0.0
        for i, out_i in enumerate(outputs["occ_preds"]):
            loss_i = 0.0
            for j in range(len(out_i) // 2):
                of = jax.nn.sigmoid(out_i[2 * j])
                ob = jax.nn.sigmoid(out_i[2 * j + 1])
                loss_i += f1_score_bal_loss(
                    of, _downsample_as(to_f, of.shape[1:3]))
                loss_i += f1_score_bal_loss(
                    ob, _downsample_as(to_b, ob.shape[1:3]))
            occ_loss += self.weights[i] * loss_i / len(out_i)

        f_l = jax.lax.stop_gradient(flow_loss)
        o_l = jax.lax.stop_gradient(occ_loss)
        f_w = jnp.where(f_l > o_l, 1.0, o_l / f_l)
        o_w = jnp.where(f_l > o_l, f_l / o_l, 1.0)
        return (flow_loss * f_w + occ_loss * o_w) / bs


class IRRPWCNet(BaseModel):
    """Per-level dense estimators (pwcnet.py:24-157)."""

    pretrained_checkpoints = {
        "things": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/irr_pwcnet-things-3f7fb8ca.ckpt",
    }

    def __init__(self, div_flow: float = 0.05, search_range: int = 4,
                 output_level: int = 4,
                 num_chs: Sequence[int] = (3, 16, 32, 64, 96, 128, 196),
                 train_batch_size: Optional[int] = None, **kwargs):
        super().__init__(
            output_stride=64,
            loss_fn=MultiScaleEPE_PWC(div_flow, train_batch_size), **kwargs)
        self.div_flow = div_flow
        self.search_range = search_range
        self.output_level = output_level
        self.feature_pyramid_extractor = FeatureExtractor(num_chs)
        dim_corr = (search_range * 2 + 1) ** 2
        self.flow_estimators = nn.ModuleList([
            FlowEstimatorDense(dim_corr if l == 0 else dim_corr + ch + 2)
            for l, ch in enumerate(num_chs[::-1][:output_level + 1])])
        self.context_networks = ContextNetwork(dim_corr + 32 + 2 + 448 + 2)

    def forward(self, params, inputs: Dict[str, Any],
                training: bool = False) -> Dict[str, jnp.ndarray]:
        images, image_resizer = self.preprocess_images(
            inputs["images"], bgr_add=0.0, bgr_mult=1.0, bgr_to_rgb=True,
            resize_mode="interpolation", interpolation_mode="bilinear",
            interpolation_align_corners=False)
        x1_raw = images[:, 0]
        x2_raw = images[:, 1]
        b, height_im, width_im, _ = x1_raw.shape
        x1_pyr = self.feature_pyramid_extractor(
            params["feature_pyramid_extractor"], x1_raw) + [x1_raw]
        x2_pyr = self.feature_pyramid_extractor(
            params["feature_pyramid_extractor"], x2_raw) + [x2_raw]

        flows = []
        flow = jnp.zeros(x1_pyr[0].shape[:3] + (2,), x1_raw.dtype)
        for l, (x1, x2) in enumerate(zip(x1_pyr, x2_pyr)):
            if l == 0:
                x2_warp = x2
            else:
                flow = upsample2d_as(flow, x1.shape[1:3])
                x2_warp = irr_warp(x2, flow, height_im, width_im,
                                   self.div_flow)
            corr = lrelu(compute_cost_volume(x1, x2_warp,
                                             self.search_range))
            if l == 0:
                x_intm, flow = self.flow_estimators[l](
                    params["flow_estimators"][str(l)], corr)
            else:
                x_intm, flow = self.flow_estimators[l](
                    params["flow_estimators"][str(l)],
                    jnp.concatenate([corr, x1, flow], axis=-1))
            if l != self.output_level:
                flows.append(flow)
            else:
                flow = flow + self.context_networks(
                    params["context_networks"],
                    jnp.concatenate([x_intm, flow], axis=-1))
                flows.append(flow)
                break

        flow_up = upsample2d_as(flow, (height_im, width_im)) / self.div_flow
        flow_up = self.postprocess_predictions(flow_up, image_resizer,
                                               is_flow=True)
        outputs = {"flows": self.nhwc_flow_to_output(flow_up)}
        if training:
            outputs["flow_preds"] = flows
        return outputs


class IRRPWCNetIRR(BaseModel):
    """Weight-shared iterative residual estimator (pwcnet_irr.py:24-162)."""

    pretrained_checkpoints = {
        "things": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/irr_pwcnet_irr-things-41a07190.ckpt",
    }

    def __init__(self, div_flow: float = 0.05, search_range: int = 4,
                 output_level: int = 4,
                 num_chs: Sequence[int] = (3, 16, 32, 64, 96, 128, 196),
                 train_batch_size: Optional[int] = None, **kwargs):
        super().__init__(
            output_stride=64,
            loss_fn=MultiScaleEPE_PWC(div_flow, train_batch_size), **kwargs)
        self.div_flow = div_flow
        self.search_range = search_range
        self.output_level = output_level
        self.feature_pyramid_extractor = FeatureExtractor(num_chs)
        dim_corr = (search_range * 2 + 1) ** 2
        num_ch_in = dim_corr + 32 + 2
        self.flow_estimators = FlowEstimatorDense(num_ch_in)
        self.context_networks = ContextNetwork(num_ch_in + 448 + 2)
        self.conv_1x1 = nn.ModuleList([
            conv(c, 32, kernel_size=1) for c in (196, 128, 96, 64, 32)])

    def forward(self, params, inputs: Dict[str, Any],
                training: bool = False) -> Dict[str, jnp.ndarray]:
        images, image_resizer = self.preprocess_images(
            inputs["images"], bgr_add=0.0, bgr_mult=1.0, bgr_to_rgb=True,
            resize_mode="interpolation", interpolation_mode="bilinear",
            interpolation_align_corners=False)
        x1_raw = images[:, 0]
        x2_raw = images[:, 1]
        b, height_im, width_im, _ = x1_raw.shape
        x1_pyr = self.feature_pyramid_extractor(
            params["feature_pyramid_extractor"], x1_raw) + [x1_raw]
        x2_pyr = self.feature_pyramid_extractor(
            params["feature_pyramid_extractor"], x2_raw) + [x2_raw]

        flows = []
        flow = jnp.zeros(x1_pyr[0].shape[:3] + (2,), x1_raw.dtype)
        for l, (x1, x2) in enumerate(zip(x1_pyr, x2_pyr)):
            if l == 0:
                x2_warp = x2
            else:
                flow = upsample2d_as(flow, x1.shape[1:3])
                x2_warp = irr_warp(x2, flow, height_im, width_im,
                                   self.div_flow)
            corr = lrelu(compute_cost_volume(x1, x2_warp,
                                             self.search_range))
            flow = rescale_flow(flow, self.div_flow, width_im, height_im,
                                to_local=True)
            x1_1by1 = self.conv_1x1[l](params["conv_1x1"][str(l)], x1)
            x_intm, flow_res = self.flow_estimators(
                params["flow_estimators"],
                jnp.concatenate([corr, x1_1by1, flow], axis=-1))
            flow = flow + flow_res
            flow = flow + self.context_networks(
                params["context_networks"],
                jnp.concatenate([x_intm, flow], axis=-1))
            flow = rescale_flow(flow, self.div_flow, width_im, height_im,
                                to_local=False)
            flows.append(flow)
            if l == self.output_level:
                break

        flow_up = upsample2d_as(flow, (height_im, width_im)) / self.div_flow
        flow_up = self.postprocess_predictions(flow_up, image_resizer,
                                               is_flow=True)
        outputs = {"flows": self.nhwc_flow_to_output(flow_up)}
        if training:
            outputs["flow_preds"] = flows
        return outputs


class IRRPWC(BaseModel):
    """Full bidirectional flow + occlusion IRR model (irr_pwc.py:27-331)."""

    _cont_extra_rescale = False

    pretrained_checkpoints = {
        "chairs_occ": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/irr_pwc-chairs_occ-02066cc4.ckpt",
        "things": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/irr_pwc-things-c143e848.ckpt",
        "sintel": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/irr_pwc-sintel-6ad65777.ckpt",
        "kitti": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/irr_pwc-kitti-74d8868f.ckpt",
    }

    def __init__(self, div_flow: float = 0.05, search_range: int = 4,
                 output_level: int = 4, num_levels: int = 7,
                 num_chs: Sequence[int] = (3, 16, 32, 64, 96, 128, 196),
                 train_batch_size: Optional[int] = None, **kwargs):
        super().__init__(
            output_stride=64,
            loss_fn=MultiScaleEPE_PWC_Bi_Occ_upsample(div_flow,
                                                      train_batch_size),
            **kwargs)
        self.div_flow = div_flow
        self.search_range = search_range
        self.output_level = output_level
        self.num_levels = num_levels
        self.feature_pyramid_extractor = FeatureExtractor(num_chs)
        dim_corr = (search_range * 2 + 1) ** 2
        self.num_ch_in_flo = dim_corr + 32 + 2
        self.num_ch_in_occ = dim_corr + 32 + 1
        self.flow_estimators = FlowEstimatorDense(self.num_ch_in_flo)
        self.context_networks = ContextNetwork(self.num_ch_in_flo + 448 + 2)
        self.occ_estimators = OccEstimatorDense(self.num_ch_in_occ)
        self.occ_context_networks = OccContextNetwork(
            self.num_ch_in_occ + 448 + 1)
        self.occ_shuffle_upsample = OccUpsampleNetwork(11, 1)
        self.conv_1x1 = nn.ModuleList([
            conv(c, 32, kernel_size=1) for c in (196, 128, 96, 64)])
        self.conv_1x1_1 = conv(16, 3, kernel_size=1)
        self.refine_flow = RefineFlow(2 + 1 + 32)
        self.refine_occ = RefineOcc(1 + 32 + 32)

    def forward(self, params, inputs: Dict[str, Any],
                training: bool = False) -> Dict[str, jnp.ndarray]:
        images, image_resizer = self.preprocess_images(
            inputs["images"], bgr_add=0.0, bgr_mult=1.0, bgr_to_rgb=True,
            resize_mode="interpolation", interpolation_mode="bilinear",
            interpolation_align_corners=False)
        x1_raw = images[:, 0]
        x2_raw = images[:, 1]
        b, height_im, width_im, _ = x1_raw.shape
        hw = (height_im, width_im)
        dv = self.div_flow
        x1_pyr = self.feature_pyramid_extractor(
            params["feature_pyramid_extractor"], x1_raw) + [x1_raw]
        x2_pyr = self.feature_pyramid_extractor(
            params["feature_pyramid_extractor"], x2_raw) + [x2_raw]

        flows = []
        occs = []
        sh = x1_pyr[0].shape[:3]
        flow_f = jnp.zeros(sh + (2,), x1_raw.dtype)
        flow_b = jnp.zeros(sh + (2,), x1_raw.dtype)
        occ_f = jnp.zeros(sh + (1,), x1_raw.dtype)
        occ_b = jnp.zeros(sh + (1,), x1_raw.dtype)

        for l, (x1, x2) in enumerate(zip(x1_pyr, x2_pyr)):
            if l <= self.output_level:
                if l > 0:
                    flow_f = upsample2d_as(flow_f, x1.shape[1:3])
                    flow_b = upsample2d_as(flow_b, x2.shape[1:3])
                    occ_f = upsample2d_as(occ_f, x1.shape[1:3])
                    occ_b = upsample2d_as(occ_b, x2.shape[1:3])
                    x2_warp = irr_warp(x2, flow_f, height_im, width_im, dv)
                    x1_warp = irr_warp(x1, flow_b, height_im, width_im, dv)
                else:
                    x2_warp = x2
                    x1_warp = x1
                corr_f = lrelu(compute_cost_volume(x1, x2_warp,
                                                   self.search_range))
                corr_b = lrelu(compute_cost_volume(x2, x1_warp,
                                                   self.search_range))
                if l != self.output_level:
                    x1_1by1 = self.conv_1x1[l](params["conv_1x1"][str(l)],
                                               x1)
                    x2_1by1 = self.conv_1x1[l](params["conv_1x1"][str(l)],
                                               x2)
                else:
                    x1_1by1 = x1
                    x2_1by1 = x2
                flow_f = rescale_flow(flow_f, dv, width_im, height_im, True)
                flow_b = rescale_flow(flow_b, dv, width_im, height_im, True)

                xi_f, res_f = self.flow_estimators(
                    params["flow_estimators"],
                    jnp.concatenate([corr_f, x1_1by1, flow_f], axis=-1))
                xi_b, res_b = self.flow_estimators(
                    params["flow_estimators"],
                    jnp.concatenate([corr_b, x2_1by1, flow_b], axis=-1))
                flow_est_f = flow_f + res_f
                flow_est_b = flow_b + res_b
                flow_cont_f = flow_est_f + self.context_networks(
                    params["context_networks"],
                    jnp.concatenate([xi_f, flow_est_f], axis=-1))
                flow_cont_b = flow_est_b + self.context_networks(
                    params["context_networks"],
                    jnp.concatenate([xi_b, flow_est_b], axis=-1))

                xo_f, ores_f = self.occ_estimators(
                    params["occ_estimators"],
                    jnp.concatenate([corr_f, x1_1by1, occ_f], axis=-1))
                xo_b, ores_b = self.occ_estimators(
                    params["occ_estimators"],
                    jnp.concatenate([corr_b, x2_1by1, occ_b], axis=-1))
                occ_est_f = occ_f + ores_f
                occ_est_b = occ_b + ores_b
                occ_cont_f = occ_est_f + self.occ_context_networks(
                    params["occ_context_networks"],
                    jnp.concatenate([xo_f, occ_est_f], axis=-1))
                occ_cont_b = occ_est_b + self.occ_context_networks(
                    params["occ_context_networks"],
                    jnp.concatenate([xo_b, occ_est_b], axis=-1))

                img1_resize = upsample2d_as(x1_raw, flow_f.shape[1:3])
                img2_resize = upsample2d_as(x2_raw, flow_b.shape[1:3])
                flow_cont_f = rescale_flow(flow_cont_f, dv, width_im,
                                           height_im, False)
                flow_cont_b = rescale_flow(flow_cont_b, dv, width_im,
                                           height_im, False)
                img2_warp = irr_warp(img2_resize, flow_cont_f, height_im,
                                     width_im, dv)
                img1_warp = irr_warp(img1_resize, flow_cont_b, height_im,
                                     width_im, dv)

                flow_f = self.refine_flow(
                    params["refine_flow"],
                    jax.lax.stop_gradient(flow_cont_f),
                    img1_resize - img2_warp, x1_1by1)
                flow_b = self.refine_flow(
                    params["refine_flow"],
                    jax.lax.stop_gradient(flow_cont_b),
                    img2_resize - img1_warp, x2_1by1)
                flow_f = rescale_flow(flow_f, dv, width_im, height_im,
                                      False)
                flow_b = rescale_flow(flow_b, dv, width_im, height_im,
                                      False)

                x2_1by1_warp = irr_warp(x2_1by1, flow_f, height_im,
                                        width_im, dv)
                x1_1by1_warp = irr_warp(x1_1by1, flow_b, height_im,
                                        width_im, dv)
                occ_f = self.refine_occ(
                    params["refine_occ"],
                    jax.lax.stop_gradient(occ_cont_f), x1_1by1,
                    x1_1by1 - x2_1by1_warp)
                occ_b = self.refine_occ(
                    params["refine_occ"],
                    jax.lax.stop_gradient(occ_cont_b), x2_1by1,
                    x2_1by1 - x1_1by1_warp)

                if self._cont_extra_rescale:
                    # ScopeFlow quirk (irr_pwc_v2.py:494-541): flow_cont is
                    # rescaled to global units twice before being appended
                    flows.append([
                        rescale_flow(flow_cont_f, dv, width_im, height_im,
                                     False),
                        rescale_flow(flow_cont_b, dv, width_im, height_im,
                                     False), flow_f, flow_b])
                else:
                    flows.append([flow_cont_f, flow_cont_b, flow_f, flow_b])
                occs.append([occ_cont_f, occ_cont_b, occ_f, occ_b])
            else:
                flow_f = upsample2d_as(flow_f, x1.shape[1:3])
                flow_b = upsample2d_as(flow_b, x2.shape[1:3])
                flows.append([flow_f, flow_b])
                x2_warp = irr_warp(x2, flow_f, height_im, width_im, dv)
                x1_warp = irr_warp(x1, flow_b, height_im, width_im, dv)
                flow_b_warp = irr_warp(flow_b, flow_f, height_im, width_im,
                                       dv)
                flow_f_warp = irr_warp(flow_f, flow_b, height_im, width_im,
                                       dv)
                if l != self.num_levels - 1:
                    x1_in = self.conv_1x1_1(params["conv_1x1_1"], x1)
                    x2_in = self.conv_1x1_1(params["conv_1x1_1"], x2)
                    x1_w_in = self.conv_1x1_1(params["conv_1x1_1"], x1_warp)
                    x2_w_in = self.conv_1x1_1(params["conv_1x1_1"], x2_warp)
                else:
                    x1_in, x2_in = x1, x2
                    x1_w_in, x2_w_in = x1_warp, x2_warp
                occ_f = self.occ_shuffle_upsample(
                    params["occ_shuffle_upsample"], occ_f,
                    jnp.concatenate([x1_in, x2_w_in, flow_f, flow_b_warp],
                                    axis=-1))
                occ_b = self.occ_shuffle_upsample(
                    params["occ_shuffle_upsample"], occ_b,
                    jnp.concatenate([x2_in, x1_w_in, flow_b, flow_f_warp],
                                    axis=-1))
                occs.append([occ_f, occ_b])

        flow_f_up = upsample2d_as(flow_f, hw) / dv
        flow_f_up = self.postprocess_predictions(flow_f_up, image_resizer,
                                                 is_flow=True)
        flow_b_up = upsample2d_as(flow_b, hw) / dv
        flow_b_up = self.postprocess_predictions(flow_b_up, image_resizer,
                                                 is_flow=True)
        occ_f_up = upsample2d_as(jax.nn.sigmoid(occ_f), hw)
        occ_f_up = self.postprocess_predictions(occ_f_up, image_resizer,
                                                is_flow=False)
        occ_b_up = upsample2d_as(jax.nn.sigmoid(occ_b), hw)
        occ_b_up = self.postprocess_predictions(occ_b_up, image_resizer,
                                                is_flow=False)

        outputs = {
            "flows": self.nhwc_flow_to_output(flow_f_up),
            "occs": jnp.moveaxis(occ_f_up, -1, -3)[:, None],
            "flows_b": self.nhwc_flow_to_output(flow_b_up),
            "occs_b": jnp.moveaxis(occ_b_up, -1, -3)[:, None],
        }
        if training:
            outputs["flow_preds"] = flows
            outputs["occ_preds"] = occs
        else:
            outputs["occ_preds"] = occs
        return outputs


class ScopeFlow(IRRPWC):
    """ScopeFlow (reference scopeflow/irr_pwc_v2.py:28-602) — identical
    architecture and parameters to IRR-PWC; differs only in training-time
    scoping augmentations and the flow_cont rescale quirk."""

    _cont_extra_rescale = True

    pretrained_checkpoints = {
        "chairs": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/scopeflow-chairs-ebfaa62d.ckpt",
        "things": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/scopeflow-things-70e22d63.ckpt",
        "kitti": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/scopeflow-kitti-a20c434d.ckpt",
        "sintel": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/scopeflow-sintel-21a91683.ckpt",
    }


@register_model
@trainable
class irr_pwc(IRRPWC):
    pass


@register_model
@trainable
class scopeflow(ScopeFlow):
    pass


@register_model
@trainable
class irr_pwcnet(IRRPWCNet):
    pass


@register_model
@trainable
class irr_pwcnet_irr(IRRPWCNetIRR):
    pass
