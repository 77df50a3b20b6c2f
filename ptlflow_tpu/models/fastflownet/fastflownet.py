"""FastFlowNet: lightweight coarse-to-fine net with sparse cost volume.

Parity with /root/reference/ptlflow/models/fastflownet/fastflownet.py:19-334:
shared pyramid conv encoder + avg-pooled upper levels, center-dense
dissipated cost volume (a fixed 53-entry subset of the 9x9 correlation,
fastflownet.py:142-176), grouped shuffle decoders, per-level warping.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

from ... import nn
from ...ops.correlation import coords_grid, local_correlation
from ...ops.grid_sample import bilinear_sampler, interpolate
from ...utils.registry import register_model, trainable
from ..base import BaseModel
from ..pwcnet.pwcnet import MultiScaleLoss

# the center-dense dissipated index set (fastflownet.py:142-176)
CV_INDEX = np.array([
    0, 2, 4, 6, 8, 10, 12, 14, 16, 18, 20, 21, 22, 23, 24, 26, 28, 29, 30,
    31, 32, 33, 34, 36, 38, 39, 40, 41, 42, 44, 46, 47, 48, 49, 50, 51, 52,
    54, 56, 57, 58, 59, 60, 62, 64, 66, 68, 70, 72, 74, 76, 78, 80])


def convrelu(cin, cout, k=3, stride=1, padding=1, groups=1):
    return nn.Sequential(
        nn.Conv2d(cin, cout, k, stride, padding, groups=groups, bias=True),
        lambda x: nn.leaky_relu(x, 0.1))


class Decoder(nn.Module):
    def __init__(self, in_channels: int, groups: int):
        super().__init__()
        self.groups = groups
        self.conv1 = convrelu(in_channels, 96, 3, 1)
        self.conv2 = convrelu(96, 96, 3, 1, groups=groups)
        self.conv3 = convrelu(96, 96, 3, 1, groups=groups)
        self.conv4 = convrelu(96, 96, 3, 1, groups=groups)
        self.conv5 = convrelu(96, 64, 3, 1)
        self.conv6 = convrelu(64, 32, 3, 1)
        self.conv7 = nn.Conv2d(32, 2, 3, 1, 1)

    @staticmethod
    def _shuffle(x, groups):
        b, h, w, c = x.shape
        x = x.reshape(b, h, w, groups, c // groups)
        return jnp.swapaxes(x, 3, 4).reshape(b, h, w, c)

    def __call__(self, params, x, **kw):
        out = self.conv1(params["conv1"], x)
        out = self._shuffle(self.conv2(params["conv2"], out), self.groups)
        out = self._shuffle(self.conv3(params["conv3"], out), self.groups)
        out = self._shuffle(self.conv4(params["conv4"], out), self.groups)
        out = self.conv6(params["conv6"], self.conv5(params["conv5"], out))
        return self.conv7(params["conv7"], out)


class FastFlowNet(BaseModel):
    pretrained_checkpoints = {
        "chairs": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/fastflownet-chairs-89e7a48e.ckpt",
        "kitti": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/fastflownet-kitti-6d3526a8.ckpt",
        "mix": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/fastflownet-mix-fd9b8c0d.ckpt",
        "sintel": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/fastflownet-sintel-6475ea96.ckpt",
        "things": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/fastflownet-things3d-fc093d29.ckpt",
    }

    def __init__(self, div_flow: float = 20.0, md: int = 4, groups: int = 3,
                 loss_start_scale: int = 4, loss_num_scales: int = 5,
                 loss_base_weight: float = 0.32, loss_norm: str = "L2",
                 **kwargs):
        super().__init__(
            loss_fn=MultiScaleLoss(loss_start_scale, loss_num_scales,
                                   loss_base_weight, loss_norm),
            output_stride=64, **kwargs)
        self.div_flow = div_flow
        self.md = md
        self.groups = groups

        self.pconv1_1 = convrelu(3, 16, 3, 2)
        self.pconv1_2 = convrelu(16, 16, 3, 1)
        self.pconv2_1 = convrelu(16, 32, 3, 2)
        self.pconv2_2 = convrelu(32, 32, 3, 1)
        self.pconv2_3 = convrelu(32, 32, 3, 1)
        self.pconv3_1 = convrelu(32, 64, 3, 2)
        self.pconv3_2 = convrelu(64, 64, 3, 1)
        self.pconv3_3 = convrelu(64, 64, 3, 1)

        self.rconv2 = convrelu(32, 32, 3, 1)
        self.rconv3 = convrelu(64, 32, 3, 1)
        self.rconv4 = convrelu(64, 32, 3, 1)
        self.rconv5 = convrelu(64, 32, 3, 1)
        self.rconv6 = convrelu(64, 32, 3, 1)

        for lvl in ("3", "4", "5", "6"):
            setattr(self, f"up{lvl}",
                    nn.ConvTranspose2d(2, 2, 4, 2, 1, bias=True))
        for lvl in ("2", "3", "4", "5", "6"):
            setattr(self, f"decoder{lvl}", Decoder(87, groups))

    def _corr(self, f1, f2):
        c = local_correlation(f1, f2, self.md, normalize=False) / f1.shape[-1]
        return c[..., CV_INDEX]

    @staticmethod
    def _warp(x, flow):
        b, h, w, _ = flow.shape
        coords = coords_grid(b, h, w, dtype=flow.dtype) + flow
        return bilinear_sampler(x, coords)

    def forward(self, params, inputs: Dict[str, Any],
                training: bool = False) -> Dict[str, jnp.ndarray]:
        mean_bgr = jnp.mean(inputs["images"], axis=(1, 3, 4),
                            keepdims=True)
        images, image_resizer = self.preprocess_images(
            inputs["images"], bgr_add=-mean_bgr, bgr_mult=1.0,
            bgr_to_rgb=False, resize_mode="interpolation",
            interpolation_mode="bilinear",
            interpolation_align_corners=False)
        img1 = images[:, 0]
        img2 = images[:, 1]

        def pyr(img):
            f1 = self.pconv1_2(params["pconv1_2"],
                               self.pconv1_1(params["pconv1_1"], img))
            f2 = self.pconv2_3(params["pconv2_3"], self.pconv2_2(
                params["pconv2_2"],
                self.pconv2_1(params["pconv2_1"], f1)))
            f3 = self.pconv3_3(params["pconv3_3"], self.pconv3_2(
                params["pconv3_2"],
                self.pconv3_1(params["pconv3_1"], f2)))
            f4 = nn.avg_pool2d(f3, 2, 2)
            f5 = nn.avg_pool2d(f4, 2, 2)
            f6 = nn.avg_pool2d(f5, 2, 2)
            return {"2": f2, "3": f3, "4": f4, "5": f5, "6": f6}

        p1 = pyr(img1)
        p2 = pyr(img2)

        b = img1.shape[0]
        f16 = p1["6"]
        flow_up = jnp.zeros((b, f16.shape[1], f16.shape[2], 2), f16.dtype)
        scales = {"6": None, "5": 0.625, "4": 1.25, "3": 2.5, "2": 5.0}
        rconvs = {lvl: getattr(self, f"rconv{lvl}")
                  for lvl in ("2", "3", "4", "5", "6")}
        flows = {}
        flow = None
        for lvl in ("6", "5", "4", "3", "2"):
            f1l = p1[lvl]
            f2l = p2[lvl]
            if lvl != "6":
                up_name = f"up{int(lvl) + 1}"  # deconv from level lvl+1
                flow_up = getattr(self, up_name)(params[up_name], flow)
                f2l = self._warp(f2l, flow_up * scales[lvl])
            cv = self._corr(f1l, f2l)
            r1 = rconvs[lvl](params[f"rconv{lvl}"], f1l)
            cat = jnp.concatenate([cv, r1, flow_up], axis=-1)
            delta = getattr(self, f"decoder{lvl}")(
                params[f"decoder{lvl}"], cat)
            flow = delta if lvl == "6" else delta + flow_up
            flows[lvl] = flow

        h, w = img2.shape[1:3]
        flow_full = self.div_flow * interpolate(
            flows["2"], (h, w), mode="bilinear", align_corners=False)
        flow_full = self.postprocess_predictions(flow_full, image_resizer,
                                                 is_flow=True)
        outputs = {"flows": self.nhwc_flow_to_output(flow_full)}
        if training:
            outputs["flow_preds"] = [flows[lvl]
                                     for lvl in ("2", "3", "4", "5", "6")]
        return outputs


@register_model
@trainable
class fastflownet(FastFlowNet):
    pass
