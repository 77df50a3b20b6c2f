"""FlowNet family: S, C, SD, CS, CSS, 2 (+fusion).

Parity with /root/reference/ptlflow/models/flownet/{flownets.py, flownetc.py,
flownetsd.py, flownetcs.py, flownetcss.py, flownet2.py, flownet_fusion.py,
submodules.py, flownet_base.py}: encoder-decoder CNNs with multi-scale flow
prediction; C adds a dilated (x2) 21x21 correlation; the stacked variants
chain C->S(->S) with image warping + brightness-error inputs; FlowNet2 adds
the SD branch and a fusion network.  Quirks preserved: per-image mean
subtraction, interpolation (not pad) resizing, SD's divide-by-div_flow
output, CS/CSS/2 skip-preprocess chaining.  NHWC throughout.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp

from ... import nn
from ...ops.correlation import local_correlation
from ...ops.grid_sample import interpolate
from ...utils.registry import register_model, trainable, ptlflow_trained
from ..base import BaseModel
from ..pwcnet.pwcnet import MultiScaleLoss, pwc_warp


def conv(batch_norm, in_planes, out_planes, kernel_size=3, stride=1):
    pad = (kernel_size - 1) // 2
    if batch_norm:
        return nn.Sequential(
            nn.Conv2d(in_planes, out_planes, kernel_size, stride=stride,
                      padding=pad, bias=False),
            nn.BatchNorm2d(out_planes),
            lambda x: nn.leaky_relu(x, 0.1))
    return nn.Sequential(
        nn.Conv2d(in_planes, out_planes, kernel_size, stride=stride,
                  padding=pad, bias=True),
        lambda x: nn.leaky_relu(x, 0.1))


def i_conv(batch_norm, in_planes, out_planes, kernel_size=3, stride=1,
           bias=True):
    pad = (kernel_size - 1) // 2
    if batch_norm:
        return nn.Sequential(
            nn.Conv2d(in_planes, out_planes, kernel_size, stride=stride,
                      padding=pad, bias=bias),
            nn.BatchNorm2d(out_planes))
    return nn.Sequential(
        nn.Conv2d(in_planes, out_planes, kernel_size, stride=stride,
                  padding=pad, bias=bias))


def predict_flow(in_planes):
    return nn.Conv2d(in_planes, 2, 3, stride=1, padding=1, bias=True)


def deconv(in_planes, out_planes):
    return nn.Sequential(
        nn.ConvTranspose2d(in_planes, out_planes, 4, 2, 1, bias=True),
        lambda x: nn.leaky_relu(x, 0.1))


def _mean_sub_preprocess(model, images):
    """Per-image BGR mean subtraction + bilinear interpolation resize to a
    /64 multiple (flownets.py:93-103)."""
    bgr_mean = jnp.mean(images, axis=(-2, -1), keepdims=True)
    return model.preprocess_images(
        images, bgr_add=-bgr_mean, bgr_mult=1.0, bgr_to_rgb=True,
        resize_mode="interpolation", interpolation_mode="bilinear",
        interpolation_align_corners=True)


class FlowNetBase(BaseModel):
    def __init__(self, div_flow: float = 20.0, input_channels: int = 6,
                 batch_norm: bool = False, loss_start_scale: int = 4,
                 loss_num_scales: int = 5, loss_base_weight: float = 0.32,
                 loss_norm: str = "L2", **kwargs):
        super().__init__(
            loss_fn=MultiScaleLoss(loss_start_scale, loss_num_scales,
                                   loss_base_weight, loss_norm),
            output_stride=64, **kwargs)
        self.div_flow = div_flow
        self.input_channels = input_channels
        self.batch_norm = batch_norm


class FlowNetS(FlowNetBase):
    pretrained_checkpoints = {
        "things": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/flownets-things-98cde14d.ckpt"
    }

    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        bn = self.batch_norm
        self.conv1 = conv(bn, self.input_channels, 64, 7, 2)
        self.conv2 = conv(bn, 64, 128, 5, 2)
        self.conv3 = conv(bn, 128, 256, 5, 2)
        self.conv3_1 = conv(bn, 256, 256)
        self.conv4 = conv(bn, 256, 512, stride=2)
        self.conv4_1 = conv(bn, 512, 512)
        self.conv5 = conv(bn, 512, 512, stride=2)
        self.conv5_1 = conv(bn, 512, 512)
        self.conv6 = conv(bn, 512, 1024, stride=2)
        self.conv6_1 = conv(bn, 1024, 1024)
        self.deconv5 = deconv(1024, 512)
        self.deconv4 = deconv(1026, 256)
        self.deconv3 = deconv(770, 128)
        self.deconv2 = deconv(386, 64)
        self.predict_flow6 = predict_flow(1024)
        self.predict_flow5 = predict_flow(1026)
        self.predict_flow4 = predict_flow(770)
        self.predict_flow3 = predict_flow(386)
        self.predict_flow2 = predict_flow(194)
        self.upsampled_flow6_to_5 = nn.ConvTranspose2d(2, 2, 4, 2, 1,
                                                       bias=False)
        self.upsampled_flow5_to_4 = nn.ConvTranspose2d(2, 2, 4, 2, 1,
                                                       bias=False)
        self.upsampled_flow4_to_3 = nn.ConvTranspose2d(2, 2, 4, 2, 1,
                                                       bias=False)
        self.upsampled_flow3_to_2 = nn.ConvTranspose2d(2, 2, 4, 2, 1,
                                                       bias=False)

    def forward(self, params, inputs: Dict[str, Any],
                training: bool = False, skip_preprocess: bool = False):
        images = inputs["images"]
        if skip_preprocess:
            image_resizer = None
            x = jnp.moveaxis(images, -3, -1) if images.shape[-1] != 3 \
                and images.ndim == 5 else images
            x = x.reshape(x.shape[0], x.shape[1], *x.shape[2:])
            # images already NHWC stacked channels when chained
            x = images
        else:
            images, image_resizer = _mean_sub_preprocess(self, images)
            b, n, h, w, c = images.shape
            x = images.transpose(0, 2, 3, 1, 4).reshape(b, h, w, n * c)

        kw = dict(training=training)
        out_conv1 = self.conv1(params["conv1"], x, **kw)
        out_conv2 = self.conv2(params["conv2"], out_conv1, **kw)
        out_conv3 = self.conv3_1(params["conv3_1"],
                                 self.conv3(params["conv3"], out_conv2, **kw),
                                 **kw)
        out_conv4 = self.conv4_1(params["conv4_1"],
                                 self.conv4(params["conv4"], out_conv3, **kw),
                                 **kw)
        out_conv5 = self.conv5_1(params["conv5_1"],
                                 self.conv5(params["conv5"], out_conv4, **kw),
                                 **kw)
        out_conv6 = self.conv6_1(params["conv6_1"],
                                 self.conv6(params["conv6"], out_conv5, **kw),
                                 **kw)

        flow6 = self.predict_flow6(params["predict_flow6"], out_conv6)
        flow6_up = self.upsampled_flow6_to_5(params["upsampled_flow6_to_5"],
                                             flow6)
        out_deconv5 = self.deconv5(params["deconv5"], out_conv6)
        concat5 = jnp.concatenate([out_conv5, out_deconv5, flow6_up], -1)
        flow5 = self.predict_flow5(params["predict_flow5"], concat5)
        flow5_up = self.upsampled_flow5_to_4(params["upsampled_flow5_to_4"],
                                             flow5)
        out_deconv4 = self.deconv4(params["deconv4"], concat5)
        concat4 = jnp.concatenate([out_conv4, out_deconv4, flow5_up], -1)
        flow4 = self.predict_flow4(params["predict_flow4"], concat4)
        flow4_up = self.upsampled_flow4_to_3(params["upsampled_flow4_to_3"],
                                             flow4)
        out_deconv3 = self.deconv3(params["deconv3"], concat4)
        concat3 = jnp.concatenate([out_conv3, out_deconv3, flow4_up], -1)
        flow3 = self.predict_flow3(params["predict_flow3"], concat3)
        flow3_up = self.upsampled_flow3_to_2(params["upsampled_flow3_to_2"],
                                             flow3)
        out_deconv2 = self.deconv2(params["deconv2"], concat3)
        concat2 = jnp.concatenate([out_conv2, out_deconv2, flow3_up], -1)
        flow2 = self.predict_flow2(params["predict_flow2"], concat2)

        b, h, w, _ = flow2.shape
        out_flow = self.div_flow * interpolate(flow2, (4 * h, 4 * w),
                                               mode="bilinear",
                                               align_corners=False)
        if image_resizer is not None:
            out_flow = self.postprocess_predictions(out_flow, image_resizer,
                                                    is_flow=True)
        outputs = {"flows": self.nhwc_flow_to_output(out_flow)}
        if training:
            outputs["flow_preds"] = [flow2, flow3, flow4, flow5, flow6]
        return outputs


class FlowNetC(FlowNetBase):
    pretrained_checkpoints = {
        "things": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/flownetc-things-cc8ac7fd.ckpt"
    }

    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        bn = self.batch_norm
        self.conv1 = conv(bn, 3, 64, 7, 2)
        self.conv2 = conv(bn, 64, 128, 5, 2)
        self.conv3 = conv(bn, 128, 256, 5, 2)
        self.conv_redir = conv(bn, 256, 32, 1, 1)
        self.conv3_1 = conv(bn, 473, 256)
        self.conv4 = conv(bn, 256, 512, stride=2)
        self.conv4_1 = conv(bn, 512, 512)
        self.conv5 = conv(bn, 512, 512, stride=2)
        self.conv5_1 = conv(bn, 512, 512)
        self.conv6 = conv(bn, 512, 1024, stride=2)
        self.conv6_1 = conv(bn, 1024, 1024)
        self.deconv5 = deconv(1024, 512)
        self.deconv4 = deconv(1026, 256)
        self.deconv3 = deconv(770, 128)
        self.deconv2 = deconv(386, 64)
        self.predict_flow6 = predict_flow(1024)
        self.predict_flow5 = predict_flow(1026)
        self.predict_flow4 = predict_flow(770)
        self.predict_flow3 = predict_flow(386)
        self.predict_flow2 = predict_flow(194)
        for name in ["upsampled_flow6_to_5", "upsampled_flow5_to_4",
                     "upsampled_flow4_to_3", "upsampled_flow3_to_2"]:
            setattr(self, name, nn.ConvTranspose2d(2, 2, 4, 2, 1, bias=True))

    def forward(self, params, inputs: Dict[str, Any],
                training: bool = False, skip_preprocess: bool = False):
        images = inputs["images"]
        if skip_preprocess:
            image_resizer = None
        else:
            images, image_resizer = _mean_sub_preprocess(self, images)
        x1 = images[:, 0]
        x2 = images[:, 1]

        kw = dict(training=training)
        oc1a = self.conv1(params["conv1"], x1, **kw)
        oc2a = self.conv2(params["conv2"], oc1a, **kw)
        oc3a = self.conv3(params["conv3"], oc2a, **kw)
        oc1b = self.conv1(params["conv1"], x2, **kw)
        oc2b = self.conv2(params["conv2"], oc1b, **kw)
        oc3b = self.conv3(params["conv3"], oc2b, **kw)

        out_corr = local_correlation(oc3a, oc3b, 10, normalize=False,
                                     dilation=2) / oc3a.shape[-1]
        out_corr = nn.leaky_relu(out_corr, 0.1)
        out_redir = self.conv_redir(params["conv_redir"], oc3a, **kw)
        out_conv3_1 = self.conv3_1(params["conv3_1"],
                                   jnp.concatenate([out_redir, out_corr], -1),
                                   **kw)
        out_conv4 = self.conv4_1(params["conv4_1"],
                                 self.conv4(params["conv4"], out_conv3_1,
                                            **kw), **kw)
        out_conv5 = self.conv5_1(params["conv5_1"],
                                 self.conv5(params["conv5"], out_conv4, **kw),
                                 **kw)
        out_conv6 = self.conv6_1(params["conv6_1"],
                                 self.conv6(params["conv6"], out_conv5, **kw),
                                 **kw)

        flow6 = self.predict_flow6(params["predict_flow6"], out_conv6)
        flow6_up = self.upsampled_flow6_to_5(params["upsampled_flow6_to_5"],
                                             flow6)
        out_deconv5 = self.deconv5(params["deconv5"], out_conv6)
        concat5 = jnp.concatenate([out_conv5, out_deconv5, flow6_up], -1)
        flow5 = self.predict_flow5(params["predict_flow5"], concat5)
        flow5_up = self.upsampled_flow5_to_4(params["upsampled_flow5_to_4"],
                                             flow5)
        out_deconv4 = self.deconv4(params["deconv4"], concat5)
        concat4 = jnp.concatenate([out_conv4, out_deconv4, flow5_up], -1)
        flow4 = self.predict_flow4(params["predict_flow4"], concat4)
        flow4_up = self.upsampled_flow4_to_3(params["upsampled_flow4_to_3"],
                                             flow4)
        out_deconv3 = self.deconv3(params["deconv3"], concat4)
        concat3 = jnp.concatenate([out_conv3_1, out_deconv3, flow4_up], -1)
        flow3 = self.predict_flow3(params["predict_flow3"], concat3)
        flow3_up = self.upsampled_flow3_to_2(params["upsampled_flow3_to_2"],
                                             flow3)
        out_deconv2 = self.deconv2(params["deconv2"], concat3)
        concat2 = jnp.concatenate([oc2a, out_deconv2, flow3_up], -1)
        flow2 = self.predict_flow2(params["predict_flow2"], concat2)

        b, h, w, _ = flow2.shape
        out_flow = self.div_flow * interpolate(flow2, (4 * h, 4 * w),
                                               mode="bilinear",
                                               align_corners=False)
        if image_resizer is not None:
            out_flow = self.postprocess_predictions(out_flow, image_resizer,
                                                    is_flow=True)
        outputs = {"flows": self.nhwc_flow_to_output(out_flow)}
        if training:
            outputs["flow_preds"] = [flow2, flow3, flow4, flow5, flow6]
        return outputs


class FlowNetSD(FlowNetBase):
    pretrained_checkpoints = {
        "things": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/flownetsd-things-f87246fa.ckpt"
    }

    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        bn = self.batch_norm
        self.conv0 = conv(bn, 6, 64)
        self.conv1 = conv(bn, 64, 64, stride=2)
        self.conv1_1 = conv(bn, 64, 128)
        self.conv2 = conv(bn, 128, 128, stride=2)
        self.conv2_1 = conv(bn, 128, 128)
        self.conv3 = conv(bn, 128, 256, stride=2)
        self.conv3_1 = conv(bn, 256, 256)
        self.conv4 = conv(bn, 256, 512, stride=2)
        self.conv4_1 = conv(bn, 512, 512)
        self.conv5 = conv(bn, 512, 512, stride=2)
        self.conv5_1 = conv(bn, 512, 512)
        self.conv6 = conv(bn, 512, 1024, stride=2)
        self.conv6_1 = conv(bn, 1024, 1024)
        self.deconv5 = deconv(1024, 512)
        self.deconv4 = deconv(1026, 256)
        self.deconv3 = deconv(770, 128)
        self.deconv2 = deconv(386, 64)
        self.inter_conv5 = i_conv(bn, 1026, 512)
        self.inter_conv4 = i_conv(bn, 770, 256)
        self.inter_conv3 = i_conv(bn, 386, 128)
        self.inter_conv2 = i_conv(bn, 194, 64)
        self.predict_flow6 = predict_flow(1024)
        self.predict_flow5 = predict_flow(512)
        self.predict_flow4 = predict_flow(256)
        self.predict_flow3 = predict_flow(128)
        self.predict_flow2 = predict_flow(64)
        for name in ["upsampled_flow6_to_5", "upsampled_flow5_to_4",
                     "upsampled_flow4_to_3", "upsampled_flow3_to_2"]:
            setattr(self, name, nn.ConvTranspose2d(2, 2, 4, 2, 1))

    def forward(self, params, inputs: Dict[str, Any],
                training: bool = False, skip_preprocess: bool = False):
        images = inputs["images"]
        if skip_preprocess:
            image_resizer = None
            x = images
        else:
            images, image_resizer = _mean_sub_preprocess(self, images)
            b, n, h, w, c = images.shape
            x = images.transpose(0, 2, 3, 1, 4).reshape(b, h, w, n * c)

        kw = dict(training=training)
        oc0 = self.conv0(params["conv0"], x, **kw)
        oc1 = self.conv1_1(params["conv1_1"],
                           self.conv1(params["conv1"], oc0, **kw), **kw)
        oc2 = self.conv2_1(params["conv2_1"],
                           self.conv2(params["conv2"], oc1, **kw), **kw)
        oc3 = self.conv3_1(params["conv3_1"],
                           self.conv3(params["conv3"], oc2, **kw), **kw)
        oc4 = self.conv4_1(params["conv4_1"],
                           self.conv4(params["conv4"], oc3, **kw), **kw)
        oc5 = self.conv5_1(params["conv5_1"],
                           self.conv5(params["conv5"], oc4, **kw), **kw)
        oc6 = self.conv6_1(params["conv6_1"],
                           self.conv6(params["conv6"], oc5, **kw), **kw)

        flow6 = self.predict_flow6(params["predict_flow6"], oc6)
        flow6_up = self.upsampled_flow6_to_5(params["upsampled_flow6_to_5"],
                                             flow6)
        out_deconv5 = self.deconv5(params["deconv5"], oc6)
        concat5 = jnp.concatenate([oc5, out_deconv5, flow6_up], -1)
        inter5 = self.inter_conv5(params["inter_conv5"], concat5, **kw)
        flow5 = self.predict_flow5(params["predict_flow5"], inter5)
        flow5_up = self.upsampled_flow5_to_4(params["upsampled_flow5_to_4"],
                                             flow5)
        out_deconv4 = self.deconv4(params["deconv4"], concat5)
        concat4 = jnp.concatenate([oc4, out_deconv4, flow5_up], -1)
        inter4 = self.inter_conv4(params["inter_conv4"], concat4, **kw)
        flow4 = self.predict_flow4(params["predict_flow4"], inter4)
        flow4_up = self.upsampled_flow4_to_3(params["upsampled_flow4_to_3"],
                                             flow4)
        out_deconv3 = self.deconv3(params["deconv3"], concat4)
        concat3 = jnp.concatenate([oc3, out_deconv3, flow4_up], -1)
        inter3 = self.inter_conv3(params["inter_conv3"], concat3, **kw)
        flow3 = self.predict_flow3(params["predict_flow3"], inter3)
        flow3_up = self.upsampled_flow3_to_2(params["upsampled_flow3_to_2"],
                                             flow3)
        out_deconv2 = self.deconv2(params["deconv2"], concat3)
        concat2 = jnp.concatenate([oc2, out_deconv2, flow3_up], -1)
        inter2 = self.inter_conv2(params["inter_conv2"], concat2, **kw)
        flow2 = self.predict_flow2(params["predict_flow2"], inter2)

        b, h, w, _ = flow2.shape
        # SD divides by div_flow (quirk documented at flownetsd.py:147-150)
        out_flow = interpolate(flow2, (4 * h, 4 * w), mode="bilinear",
                               align_corners=False) / self.div_flow
        if image_resizer is not None:
            out_flow = self.postprocess_predictions(out_flow, image_resizer,
                                                    is_flow=True)
        outputs = {"flows": self.nhwc_flow_to_output(out_flow)}
        if training:
            outputs["flow_preds"] = [flow2, flow3, flow4, flow5, flow6]
        return outputs


class FlowNetFusion(FlowNetBase):
    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        bn = self.batch_norm
        self.conv0 = conv(bn, 11, 64)
        self.conv1 = conv(bn, 64, 64, stride=2)
        self.conv1_1 = conv(bn, 64, 128)
        self.conv2 = conv(bn, 128, 128, stride=2)
        self.conv2_1 = conv(bn, 128, 128)
        self.deconv1 = deconv(128, 32)
        self.deconv0 = deconv(162, 16)
        self.inter_conv1 = i_conv(bn, 162, 32)
        self.inter_conv0 = i_conv(bn, 82, 16)
        self.predict_flow2 = predict_flow(128)
        self.predict_flow1 = predict_flow(32)
        self.predict_flow0 = predict_flow(16)
        self.upsampled_flow2_to_1 = nn.ConvTranspose2d(2, 2, 4, 2, 1)
        self.upsampled_flow1_to_0 = nn.ConvTranspose2d(2, 2, 4, 2, 1)

    def forward(self, params, inputs: Dict[str, Any],
                training: bool = False):
        x = inputs["images"]  # already stacked NHWC (B, H, W, 11)
        kw = dict(training=training)
        oc0 = self.conv0(params["conv0"], x, **kw)
        oc1 = self.conv1_1(params["conv1_1"],
                           self.conv1(params["conv1"], oc0, **kw), **kw)
        oc2 = self.conv2_1(params["conv2_1"],
                           self.conv2(params["conv2"], oc1, **kw), **kw)
        flow2 = self.predict_flow2(params["predict_flow2"], oc2)
        flow2_up = self.upsampled_flow2_to_1(params["upsampled_flow2_to_1"],
                                             flow2)
        out_deconv1 = self.deconv1(params["deconv1"], oc2)
        concat1 = jnp.concatenate([oc1, out_deconv1, flow2_up], -1)
        inter1 = self.inter_conv1(params["inter_conv1"], concat1, **kw)
        flow1 = self.predict_flow1(params["predict_flow1"], inter1)
        flow1_up = self.upsampled_flow1_to_0(params["upsampled_flow1_to_0"],
                                             flow1)
        out_deconv0 = self.deconv0(params["deconv0"], concat1)
        concat0 = jnp.concatenate([oc0, out_deconv0, flow1_up], -1)
        inter0 = self.inter_conv0(params["inter_conv0"], concat0, **kw)
        flow0 = self.predict_flow0(params["predict_flow0"], inter0)
        outputs = {"flows": self.nhwc_flow_to_output(flow0)}
        if training:
            outputs["flow_preds"] = [flow0, flow1, flow2]
        return outputs


def _brightness_error(img0, warped):
    return jnp.linalg.norm(img0 - warped, axis=-1, keepdims=True)


class FlowNetCS(FlowNetBase):
    pretrained_checkpoints = {
        "things": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/flownetcs-things-4bdecffa.ckpt"
    }

    def __init__(self, input_channels: int = 12, **kwargs):
        super().__init__(input_channels=input_channels, **kwargs)
        self.flownetc = FlowNetC(div_flow=self.div_flow,
                                 batch_norm=self.batch_norm)
        self.flownets_1 = FlowNetS(div_flow=self.div_flow,
                                   input_channels=input_channels,
                                   batch_norm=self.batch_norm)

    def _stage_input(self, images, flow):
        img0 = images[:, 0]
        img1 = images[:, 1]
        flow_nhwc = jnp.moveaxis(flow, -3, -1)
        resampled = pwc_warp(img1, flow_nhwc)
        err = _brightness_error(img0, resampled)
        return jnp.concatenate(
            [img0, img1, resampled, flow_nhwc / self.div_flow, err], axis=-1)

    def forward(self, params, inputs: Dict[str, Any],
                training: bool = False):
        images, image_resizer = _mean_sub_preprocess(self, inputs["images"])
        c_out = self.flownetc(params["flownetc"], {"images": images},
                              training=training, skip_preprocess=True)
        concat1 = self._stage_input(images, c_out["flows"][:, 0])
        s1_out = self.flownets_1(params["flownets_1"], {"images": concat1},
                                 training=training, skip_preprocess=True)
        flows = self.postprocess_predictions(
            jnp.moveaxis(s1_out["flows"][:, 0], -3, -1), image_resizer,
            is_flow=True)
        out = {"flows": self.nhwc_flow_to_output(flows)}
        if training:
            out["flow_preds"] = s1_out["flow_preds"]
        return out


class FlowNetCSS(FlowNetCS):
    pretrained_checkpoints = {
        "things": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/flownetcss-things-dd05a3b9.ckpt"
    }

    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        self.flownets_2 = FlowNetS(div_flow=self.div_flow,
                                   input_channels=self.input_channels,
                                   batch_norm=self.batch_norm)

    def forward(self, params, inputs: Dict[str, Any],
                training: bool = False):
        images, image_resizer = _mean_sub_preprocess(self, inputs["images"])
        c_out = self.flownetc(params["flownetc"], {"images": images},
                              training=training, skip_preprocess=True)
        concat1 = self._stage_input(images, c_out["flows"][:, 0])
        s1_out = self.flownets_1(params["flownets_1"], {"images": concat1},
                                 training=training, skip_preprocess=True)
        concat2 = self._stage_input(images, s1_out["flows"][:, 0])
        s2_out = self.flownets_2(params["flownets_2"], {"images": concat2},
                                 training=training, skip_preprocess=True)
        flows = self.postprocess_predictions(
            jnp.moveaxis(s2_out["flows"][:, 0], -3, -1), image_resizer,
            is_flow=True)
        out = {"flows": self.nhwc_flow_to_output(flows)}
        if training:
            out["flow_preds"] = s2_out["flow_preds"]
        return out


class FlowNet2(FlowNetCSS):
    pretrained_checkpoints = {
        "things": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/flownet2-things-2a58d37d.ckpt"
    }

    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        self.flownets_d = FlowNetSD(div_flow=self.div_flow,
                                    batch_norm=self.batch_norm)
        self.flownetfusion = FlowNetFusion(div_flow=self.div_flow,
                                           batch_norm=self.batch_norm)

    def forward(self, params, inputs: Dict[str, Any],
                training: bool = False):
        images, image_resizer = _mean_sub_preprocess(self, inputs["images"])
        img0 = images[:, 0]
        img1 = images[:, 1]

        c_out = self.flownetc(params["flownetc"], {"images": images},
                              training=training, skip_preprocess=True)
        concat1 = self._stage_input(images, c_out["flows"][:, 0])
        s1_out = self.flownets_1(params["flownets_1"], {"images": concat1},
                                 training=training, skip_preprocess=True)
        concat2 = self._stage_input(images, s1_out["flows"][:, 0])
        s2_out = self.flownets_2(params["flownets_2"], {"images": concat2},
                                 training=training, skip_preprocess=True)
        flownets2_flow = jnp.moveaxis(s2_out["flows"][:, 0], -3, -1)
        norm_s2 = jnp.linalg.norm(flownets2_flow, axis=-1, keepdims=True)
        diff_s2 = _brightness_error(img0, pwc_warp(img1, flownets2_flow))

        b, n, h, w, c = images.shape
        sd_in = images.transpose(0, 2, 3, 1, 4).reshape(b, h, w, n * c)
        sd_out = self.flownets_d(params["flownets_d"], {"images": sd_in},
                                 training=training, skip_preprocess=True)
        flownetsd_flow = jnp.moveaxis(sd_out["flows"][:, 0], -3, -1) \
            / self.div_flow ** 2
        norm_sd = jnp.linalg.norm(flownetsd_flow, axis=-1, keepdims=True)
        diff_sd = _brightness_error(img0, pwc_warp(img1, flownetsd_flow))

        concat3 = jnp.concatenate(
            [img0, flownetsd_flow, flownets2_flow, norm_sd, norm_s2,
             diff_sd, diff_s2], axis=-1)
        fusion_out = self.flownetfusion(params["flownetfusion"],
                                        {"images": concat3},
                                        training=training)
        flows = self.postprocess_predictions(
            jnp.moveaxis(fusion_out["flows"][:, 0], -3, -1), image_resizer,
            is_flow=True)
        out = {"flows": self.nhwc_flow_to_output(flows)}
        if training:
            out["flow_preds"] = fusion_out["flow_preds"]
        return out


@register_model
@trainable
class flownets(FlowNetS):
    pass


@register_model
@trainable
class flownetc(FlowNetC):
    pass


@register_model
@trainable
class flownetsd(FlowNetSD):
    pass


@register_model
@trainable
class flownetcs(FlowNetCS):
    pass


@register_model
@trainable
class flownetcss(FlowNetCSS):
    pass


@register_model
@trainable
class flownet2(FlowNet2):
    pass
