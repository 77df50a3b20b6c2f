"""PWC-Net: pyramid, warping, cost-volume coarse-to-fine CNN.

Parity with /root/reference/ptlflow/models/pwcnet/pwcnet.py:21-330 and the
MultiScale loss (/root/reference/ptlflow/models/flownet/losses.py:59-120).
The local cost volume uses the shift-based ``local_correlation`` op (the
TPU replacement for the spatial_correlation_sampler CUDA package); warping
uses grid_sample with the PWC validity mask.  NHWC; DenseNet-style decoder
concatenations are feature-axis concats.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

from ... import nn
from ...ops.correlation import coords_grid, local_correlation
from ...ops.grid_sample import (bilinear_coverage, bilinear_sampler,
                                interpolate)
from ...utils.registry import register_model, trainable, ptlflow_trained
from ..base import BaseModel


class MultiScaleLoss:
    """Multi-scale L1/L2 on downsampled div_flow-scaled GT
    (flownet/losses.py:59-120)."""

    def __init__(self, start_scale=4, num_scales=5, l_weight=0.32,
                 norm="L2"):
        self.start_scale = start_scale
        self.num_scales = num_scales
        self.weights = [l_weight / (2 ** s) for s in range(num_scales)]
        self.norm = norm
        self.div_flow = 0.05

    def __call__(self, outputs, inputs):
        preds = outputs["flow_preds"]  # list of NHWC, fine-to-coarse
        target = jnp.moveaxis(inputs["flows"][:, 0], -3, -1) * self.div_flow
        loss = 0.0
        for i, pred in enumerate(preds):
            k = self.start_scale * (2 ** i)
            t = nn.avg_pool2d(target, k, k)
            if self.norm == "L1":
                loss = loss + self.weights[i] * jnp.mean(jnp.abs(pred - t))
            else:
                loss = loss + self.weights[i] * jnp.mean(
                    jnp.linalg.norm(pred - t, axis=-1))
        return loss


def conv(in_planes, out_planes, kernel_size=3, stride=1, padding=1,
         dilation=1):
    return nn.Sequential(
        nn.Conv2d(in_planes, out_planes, kernel_size, stride=stride,
                  padding=padding, dilation=dilation, bias=True),
        lambda x: nn.leaky_relu(x, 0.1))


def predict_flow(in_planes):
    return nn.Conv2d(in_planes, 2, 3, stride=1, padding=1, bias=True)


def deconv(in_planes, out_planes, kernel_size=4, stride=2, padding=1):
    return nn.ConvTranspose2d(in_planes, out_planes, kernel_size, stride,
                              padding, bias=True)


def pwc_warp(x: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Backward warp with the PWC validity mask (pwcnet.py:165-195):
    bilinear-sampled ones thresholded at 0.9999."""
    b, h, w, c = x.shape
    coords = coords_grid(b, h, w, dtype=flow.dtype) + flow
    out = bilinear_sampler(x, coords)
    mask = bilinear_coverage(coords, (h, w), dtype=x.dtype)
    mask = (mask >= 0.9999).astype(x.dtype)
    return out * mask


class PWCNet(BaseModel):
    pretrained_checkpoints = {
        "things": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/pwcnet-things-6a2e540b.ckpt",
        "sintel": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/pwcnet-sintel-533815e5.ckpt",
    }

    def __init__(self, div_flow: float = 20.0, md: int = 4,
                 loss_start_scale: int = 4, loss_num_scales: int = 5,
                 loss_base_weight: float = 0.32, loss_norm: str = "L2",
                 **kwargs):
        super().__init__(
            loss_fn=MultiScaleLoss(loss_start_scale, loss_num_scales,
                                   loss_base_weight, loss_norm),
            output_stride=64, **kwargs)
        self.div_flow = div_flow
        self.md = md

        dims = [(3, 16), (16, 32), (32, 64), (64, 96), (96, 128), (128, 196)]
        names = ["1", "2", "3", "4", "5", "6"]
        for name, (cin, cout) in zip(names, dims):
            if name == "6":
                setattr(self, "conv6aa", conv(cin, cout, stride=2))
                setattr(self, "conv6a", conv(cout, cout, stride=1))
                setattr(self, "conv6b", conv(cout, cout, stride=1))
            else:
                setattr(self, f"conv{name}a", conv(cin, cout, stride=2))
                setattr(self, f"conv{name}aa", conv(cout, cout, stride=1))
                setattr(self, f"conv{name}b", conv(cout, cout, stride=1))

        nd = (2 * md + 1) ** 2
        dd = np.cumsum([128, 128, 96, 64, 32])
        self._decoder_in = {}
        for lvl, extra in zip(["6", "5", "4", "3", "2"],
                              [0, 128 + 4, 96 + 4, 64 + 4, 32 + 4]):
            od = nd + extra
            setattr(self, f"conv{lvl}_0", conv(od, 128))
            setattr(self, f"conv{lvl}_1", conv(od + dd[0], 128))
            setattr(self, f"conv{lvl}_2", conv(od + dd[1], 96))
            setattr(self, f"conv{lvl}_3", conv(od + dd[2], 64))
            setattr(self, f"conv{lvl}_4", conv(od + dd[3], 32))
            setattr(self, f"predict_flow{lvl}", predict_flow(od + dd[4]))
            if lvl != "2":
                setattr(self, f"deconv{lvl}", deconv(2, 2))
                setattr(self, f"upfeat{lvl}", deconv(od + dd[4], 2))

    def _pyramid(self, params, im):
        feats = []
        x = im
        for lvl in ["1", "2", "3", "4", "5", "6"]:
            if lvl == "6":
                x = self.conv6aa(params["conv6aa"], x)
                x = self.conv6a(params["conv6a"], x)
                x = self.conv6b(params["conv6b"], x)
            else:
                x = getattr(self, f"conv{lvl}a")(params[f"conv{lvl}a"], x)
                x = getattr(self, f"conv{lvl}aa")(params[f"conv{lvl}aa"], x)
                x = getattr(self, f"conv{lvl}b")(params[f"conv{lvl}b"], x)
            feats.append(x)
        return feats  # levels 1..6

    def _decode(self, params, lvl, x):
        for i in range(5):
            m = getattr(self, f"conv{lvl}_{i}")
            x = jnp.concatenate([m(params[f"conv{lvl}_{i}"], x), x], axis=-1)
        flow = getattr(self, f"predict_flow{lvl}")(
            params[f"predict_flow{lvl}"], x)
        return x, flow

    def forward(self, params, inputs: Dict[str, Any],
                training: bool = False) -> Dict[str, jnp.ndarray]:
        images, image_resizer = self.preprocess_images(
            inputs["images"], bgr_add=0.0, bgr_mult=1.0, bgr_to_rgb=False,
            resize_mode="interpolation", interpolation_mode="bilinear",
            interpolation_align_corners=False)
        im1 = images[:, 0]
        im2 = images[:, 1]

        c1 = self._pyramid(params, im1)
        c2 = self._pyramid(params, im2)

        def corr_act(f1, f2):
            c = local_correlation(f1, f2, self.md, normalize=False) \
                / f1.shape[-1]
            return nn.leaky_relu(c, 0.1)

        # level 6
        corr6 = corr_act(c1[5], c2[5])
        x, flow6 = self._decode(params, "6", corr6)
        up_flow = self.deconv6(params["deconv6"], flow6)
        up_feat = self.upfeat6(params["upfeat6"], x)

        flows = [flow6]
        scales = {"5": 0.625, "4": 1.25, "3": 2.5, "2": 5.0}
        for lvl in ["5", "4", "3", "2"]:
            idx = int(lvl) - 1
            warp = pwc_warp(c2[idx], up_flow * scales[lvl])
            corr = corr_act(c1[idx], warp)
            x = jnp.concatenate([corr, c1[idx], up_flow, up_feat], axis=-1)
            x, flow = self._decode(params, lvl, x)
            flows.append(flow)
            if lvl != "2":
                up_flow = getattr(self, f"deconv{lvl}")(
                    params[f"deconv{lvl}"], flow)
                up_feat = getattr(self, f"upfeat{lvl}")(
                    params[f"upfeat{lvl}"], x)

        flow2 = flows[-1]
        if hasattr(self, "dc_conv1"):  # PWCDCNet dilated-context refinement
            flow2 = self._dc_refine(params, x, flow2)
            flows[-1] = flow2
        b, h, w, _ = flow2.shape
        flow_up = interpolate(flow2 * self.div_flow, (4 * h, 4 * w),
                              mode="bilinear", align_corners=True)
        flow_up = self.postprocess_predictions(flow_up, image_resizer,
                                               is_flow=True)
        outputs = {"flows": self.nhwc_flow_to_output(flow_up)}
        if training:
            outputs["flow_preds"] = flows[::-1]  # fine (2) to coarse (6)
        return outputs


class PWCDCNet(PWCNet):
    """PWC-Net + dilated-context refinement network
    (pwcnet.py:331-463; the variant registered as ``pwcnet``)."""

    pretrained_checkpoints = {
        "things": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/pwcdcnet-things-cc223701.ckpt",
        "sintel": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/pwcdcnet-sintel-c7d08a46.ckpt",
    }

    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        nd = (2 * self.md + 1) ** 2
        od = nd + 32 + 4 + int(np.cumsum([128, 128, 96, 64, 32])[4])
        self.dc_conv1 = conv(od, 128, kernel_size=3, padding=1, dilation=1)
        self.dc_conv2 = conv(128, 128, kernel_size=3, padding=2, dilation=2)
        self.dc_conv3 = conv(128, 128, kernel_size=3, padding=4, dilation=4)
        self.dc_conv4 = conv(128, 96, kernel_size=3, padding=8, dilation=8)
        self.dc_conv5 = conv(96, 64, kernel_size=3, padding=16, dilation=16)
        self.dc_conv6 = conv(64, 32, kernel_size=3, padding=1, dilation=1)
        self.dc_conv7 = predict_flow(32)

    def _dc_refine(self, params, x, flow2):
        y = self.dc_conv1(params["dc_conv1"], x)
        y = self.dc_conv2(params["dc_conv2"], y)
        y = self.dc_conv3(params["dc_conv3"], y)
        y = self.dc_conv4(params["dc_conv4"], y)
        y = self.dc_conv5(params["dc_conv5"], y)
        y = self.dc_conv6(params["dc_conv6"], y)
        return flow2 + self.dc_conv7(params["dc_conv7"], y)


@register_model
@trainable
@ptlflow_trained
class pwcnet(PWCDCNet):
    pass


@register_model
@trainable
class pwcnet_nodc(PWCNet):
    pass
