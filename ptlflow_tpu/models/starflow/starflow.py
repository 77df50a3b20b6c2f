"""StarFlow — spatiotemporal recurrent IRR-PWC over image sequences
(reference: ptlflow/models/starflow/starflow.py:20-460,
pwc_modules.py:241-277).

Reuses the IRR pwc modules; adds a per-level temporal feature memory that
is backward-warped between frame pairs and a joint flow+occ dense
estimator/context network.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp

from ... import nn
from ...nn import Module
from ...utils.registry import register_model
from ..base.base_model import BaseModel
from ..irr.pwc_modules import (FeatureExtractor, OccUpsampleNetwork,
                               RefineFlow, RefineOcc, compute_cost_volume,
                               conv, irr_warp, lrelu, rescale_flow,
                               upsample2d_as)


class FlowAndOccEstimatorDense(Module):
    """pwc_modules.py:241-258."""

    def __init__(self, ch_in):
        super().__init__()
        self.conv1 = conv(ch_in, 128)
        self.conv2 = conv(ch_in + 128, 128)
        self.conv3 = conv(ch_in + 256, 96)
        self.conv4 = conv(ch_in + 352, 64)
        self.conv5 = conv(ch_in + 416, 32)
        self.conv_last = conv(ch_in + 448, 3, isReLU=False)

    def __call__(self, params, x, **kw):
        x1 = jnp.concatenate([self.conv1(params["conv1"], x), x], axis=-1)
        x2 = jnp.concatenate([self.conv2(params["conv2"], x1), x1], axis=-1)
        x3 = jnp.concatenate([self.conv3(params["conv3"], x2), x2], axis=-1)
        x4 = jnp.concatenate([self.conv4(params["conv4"], x3), x3], axis=-1)
        x5 = jnp.concatenate([self.conv5(params["conv5"], x4), x4], axis=-1)
        out = self.conv_last(params["conv_last"], x5)
        return x5, out[..., :2], out[..., 2:3]


class FlowAndOccContextNetwork(Module):
    """pwc_modules.py:261-277."""

    def __init__(self, ch_in):
        super().__init__()
        self.convs = nn.Sequential(
            conv(ch_in, 128, 3, 1, 1), conv(128, 128, 3, 1, 2),
            conv(128, 128, 3, 1, 4), conv(128, 96, 3, 1, 8),
            conv(96, 64, 3, 1, 16), conv(64, 32, 3, 1, 1),
            conv(32, 3, isReLU=False))

    def __call__(self, params, x, **kw):
        out = self.convs(params["convs"], x)
        return out[..., :2], out[..., 2:3]


class StarFlow(BaseModel):
    pretrained_checkpoints = {
        "things": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/starflow-things-d3966a93.ckpt",
        "sintel": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/starflow-sintel-3c06b844.ckpt",
        "kitti": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/starflow-kitti-34b9a3ed.ckpt",
    }

    def __init__(self, div_flow: float = 0.05, search_range: int = 4,
                 output_level: int = 4, num_levels: int = 7,
                 num_chs: Sequence[int] = (3, 16, 32, 64, 96, 128, 196),
                 train_batch_size: Optional[int] = None, **kwargs):
        super().__init__(output_stride=64, loss_fn=None, **kwargs)
        self.div_flow = div_flow
        self.search_range = search_range
        self.output_level = output_level
        self.num_levels = num_levels
        self.feature_pyramid_extractor = FeatureExtractor(num_chs)
        dim_corr = (search_range * 2 + 1) ** 2
        self.num_ch_in = dim_corr + 32 + 2 + 1
        self.flow_and_occ_estimators = FlowAndOccEstimatorDense(
            2 * self.num_ch_in)
        self.context_networks = FlowAndOccContextNetwork(
            2 * self.num_ch_in + 448 + 2 + 1)
        self.occ_shuffle_upsample = OccUpsampleNetwork(11, 1)
        self.conv_1x1 = nn.ModuleList([
            conv(c, 32, kernel_size=1) for c in (196, 128, 96, 64)])
        self.conv_1x1_1 = conv(16, 3, kernel_size=1)
        self.conv_1x1_time = conv(2 * self.num_ch_in + 448, self.num_ch_in,
                                  kernel_size=1)
        self.refine_flow = RefineFlow(2 + 1 + 32)
        self.refine_occ = RefineOcc(1 + 32 + 32)

    def forward(self, params, inputs: Dict[str, Any],
                training: bool = False) -> Dict[str, jnp.ndarray]:
        assert not training, \
            "training is not implemented for StarFlow (same as reference)"
        images, image_resizer = self.preprocess_images(
            inputs["images"], bgr_add=0.0, bgr_mult=1.0, bgr_to_rgb=True,
            resize_mode="interpolation", interpolation_mode="bilinear",
            interpolation_align_corners=False)
        n_frames = images.shape[1]
        list_imgs = [images[:, i] for i in range(n_frames)]
        b, height_im, width_im, _ = list_imgs[0].shape
        dv = self.div_flow
        pyramids = [
            self.feature_pyramid_extractor(
                params["feature_pyramid_extractor"], im) + [im]
            for im in list_imgs]

        flows_f_last = []
        flows_b_last = []
        occs_f_last = []
        occs_b_last = []
        prev_feats = [None] * (self.output_level + 1)
        prev_flow_b = [None] * (self.output_level + 1)

        for i in range(n_frames - 1):
            x1_pyr, x2_pyr = pyramids[i], pyramids[i + 1]
            sh = x1_pyr[0].shape[:3]
            flow_f = jnp.zeros(sh + (2,), images.dtype)
            flow_b = jnp.zeros(sh + (2,), images.dtype)
            occ_f = jnp.zeros(sh + (1,), images.dtype)
            occ_b = jnp.zeros(sh + (1,), images.dtype)

            for l, (x1, x2) in enumerate(zip(x1_pyr, x2_pyr)):
                if l <= self.output_level:
                    if prev_feats[l] is None:
                        prev_feats[l] = jnp.zeros(
                            x1.shape[:3] + (self.num_ch_in,), images.dtype)
                    if l > 0:
                        flow_f = upsample2d_as(flow_f, x1.shape[1:3])
                        flow_b = upsample2d_as(flow_b, x2.shape[1:3])
                        occ_f = upsample2d_as(occ_f, x1.shape[1:3])
                        occ_b = upsample2d_as(occ_b, x2.shape[1:3])
                        x2_warp = irr_warp(x2, flow_f, height_im, width_im,
                                           dv)
                        x1_warp = irr_warp(x1, flow_b, height_im, width_im,
                                           dv)
                    else:
                        x2_warp, x1_warp = x2, x1
                    corr_f = lrelu(compute_cost_volume(x1, x2_warp,
                                                       self.search_range))
                    corr_b = lrelu(compute_cost_volume(x2, x1_warp,
                                                       self.search_range))
                    if l != self.output_level:
                        x1_1by1 = self.conv_1x1[l](
                            params["conv_1x1"][str(l)], x1)
                        x2_1by1 = self.conv_1x1[l](
                            params["conv_1x1"][str(l)], x2)
                    else:
                        x1_1by1, x2_1by1 = x1, x2

                    if i > 0:
                        # temporal connection: warp the stored features by
                        # the previous pair's backward flow at this level
                        prev_feats[l] = irr_warp(
                            prev_feats[l], prev_flow_b[l], height_im,
                            width_im, dv)

                    flow_f = rescale_flow(flow_f, dv, width_im, height_im,
                                          True)
                    flow_b = rescale_flow(flow_b, dv, width_im, height_im,
                                          True)
                    features = jnp.concatenate(
                        [prev_feats[l], corr_f, x1_1by1, flow_f, occ_f],
                        axis=-1)
                    features_b = jnp.concatenate(
                        [jnp.zeros_like(prev_feats[l]), corr_b, x2_1by1,
                         flow_b, occ_b], axis=-1)
                    xi_f, fres_f, ores_f = self.flow_and_occ_estimators(
                        params["flow_and_occ_estimators"], features)
                    flow_est_f = flow_f + fres_f
                    occ_est_f = occ_f + ores_f
                    xi_b, fres_b, ores_b = self.flow_and_occ_estimators(
                        params["flow_and_occ_estimators"], features_b)
                    flow_est_b = flow_b + fres_b
                    occ_est_b = occ_b + ores_b

                    fcres_f, ocres_f = self.context_networks(
                        params["context_networks"],
                        jnp.concatenate([xi_f, flow_est_f, occ_est_f],
                                        axis=-1))
                    flow_cont_f = flow_est_f + fcres_f
                    occ_cont_f = occ_est_f + ocres_f
                    fcres_b, ocres_b = self.context_networks(
                        params["context_networks"],
                        jnp.concatenate([xi_b, flow_est_b, occ_est_b],
                                        axis=-1))
                    flow_cont_b = flow_est_b + fcres_b
                    occ_cont_b = occ_est_b + ocres_b

                    img1_resize = upsample2d_as(list_imgs[i],
                                                flow_f.shape[1:3])
                    img2_resize = upsample2d_as(list_imgs[i + 1],
                                                flow_b.shape[1:3])
                    flow_cont_f = rescale_flow(flow_cont_f, dv, width_im,
                                               height_im, False)
                    flow_cont_b = rescale_flow(flow_cont_b, dv, width_im,
                                               height_im, False)
                    img2_warp = irr_warp(img2_resize, flow_cont_f,
                                         height_im, width_im, dv)
                    img1_warp = irr_warp(img1_resize, flow_cont_b,
                                         height_im, width_im, dv)

                    flow_f = self.refine_flow(
                        params["refine_flow"], flow_cont_f,
                        img1_resize - img2_warp, x1_1by1)
                    flow_b = self.refine_flow(
                        params["refine_flow"], flow_cont_b,
                        img2_resize - img1_warp, x2_1by1)
                    flow_f = rescale_flow(flow_f, dv, width_im, height_im,
                                          False)
                    flow_b = rescale_flow(flow_b, dv, width_im, height_im,
                                          False)

                    x2_1by1_warp = irr_warp(x2_1by1, flow_f, height_im,
                                            width_im, dv)
                    x1_1by1_warp = irr_warp(x1_1by1, flow_b, height_im,
                                            width_im, dv)
                    occ_f = self.refine_occ(params["refine_occ"],
                                            occ_cont_f, x1_1by1,
                                            x1_1by1 - x2_1by1_warp)
                    occ_b = self.refine_occ(params["refine_occ"],
                                            occ_cont_b, x2_1by1,
                                            x2_1by1 - x1_1by1_warp)

                    prev_feats[l] = self.conv_1x1_time(
                        params["conv_1x1_time"], xi_f)
                    prev_flow_b[l] = flow_b
                else:
                    flow_f = upsample2d_as(flow_f, x1.shape[1:3])
                    flow_b = upsample2d_as(flow_b, x2.shape[1:3])
                    x2_warp = irr_warp(x2, flow_f, height_im, width_im, dv)
                    x1_warp = irr_warp(x1, flow_b, height_im, width_im, dv)
                    flow_b_warp = irr_warp(flow_b, flow_f, height_im,
                                           width_im, dv)
                    flow_f_warp = irr_warp(flow_f, flow_b, height_im,
                                           width_im, dv)
                    if l != self.num_levels - 1:
                        x1_in = self.conv_1x1_1(params["conv_1x1_1"], x1)
                        x2_in = self.conv_1x1_1(params["conv_1x1_1"], x2)
                        x1_w_in = self.conv_1x1_1(params["conv_1x1_1"],
                                                  x1_warp)
                        x2_w_in = self.conv_1x1_1(params["conv_1x1_1"],
                                                  x2_warp)
                    else:
                        x1_in, x2_in = x1, x2
                        x1_w_in, x2_w_in = x1_warp, x2_warp
                    occ_f = self.occ_shuffle_upsample(
                        params["occ_shuffle_upsample"], occ_f,
                        jnp.concatenate([x1_in, x2_w_in, flow_f,
                                         flow_b_warp], axis=-1))
                    occ_b = self.occ_shuffle_upsample(
                        params["occ_shuffle_upsample"], occ_b,
                        jnp.concatenate([x2_in, x1_w_in, flow_b,
                                         flow_f_warp], axis=-1))

            flows_f_last.append(flow_f)
            flows_b_last.append(flow_b)
            occs_f_last.append(occ_f)
            occs_b_last.append(occ_b)

        hw = (height_im, width_im)
        flow_f_up = jnp.stack(
            [upsample2d_as(f, hw) / dv for f in flows_f_last], axis=1)
        flow_b_up = jnp.stack(
            [upsample2d_as(f, hw) / dv for f in flows_b_last], axis=1)
        occ_f_up = jnp.stack(
            [upsample2d_as(jax.nn.sigmoid(o), hw) for o in occs_f_last],
            axis=1)
        occ_b_up = jnp.stack(
            [upsample2d_as(jax.nn.sigmoid(o), hw) for o in occs_b_last],
            axis=1)
        flow_f_up = self.postprocess_predictions(flow_f_up, image_resizer,
                                                 is_flow=True)
        flow_b_up = self.postprocess_predictions(flow_b_up, image_resizer,
                                                 is_flow=True)
        occ_f_up = self.postprocess_predictions(occ_f_up, image_resizer,
                                                is_flow=False)
        occ_b_up = self.postprocess_predictions(occ_b_up, image_resizer,
                                                is_flow=False)
        return {"flows": jnp.moveaxis(flow_f_up, -1, -3),
                "occs": jnp.moveaxis(occ_f_up, -1, -3),
                "flows_b": jnp.moveaxis(flow_b_up, -1, -3),
                "occs_b": jnp.moveaxis(occ_b_up, -1, -3)}


@register_model
class starflow(StarFlow):
    pass
