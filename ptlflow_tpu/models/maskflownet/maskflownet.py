"""MaskFlowNet: PWC-style pyramid with learnable occlusion masks and
deformable-conv warping.

Parity with /root/reference/ptlflow/models/maskflownet/maskflownet.py:40-962:
- triangular-kernel Upsample/Downsample (maskflownet.py:80-125);
- deformable warping: the flow (internal (y, x) order!) repeated per tap
  feeds torchvision-style DeformConv2d (:276-283, :389-393);
- occlusion-mask gating (sigmoid mask * warp + tradeoff features);
- two-stage full model: MaskFlownet_S then a second fusion pyramid over
  [image, warped image + mask] streams (:520-890);
- MultiscaleEpe loss with mask (:892-950).

Quirk preserved: internal flows are (y, x) and are flipped at the output
(:828-829); the output "flows" follow the standard (x, y) contract.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ... import nn
from ...ops.correlation import coords_grid, local_correlation
from ...ops.deform_conv import DeformConv2d
from ...ops.grid_sample import (bilinear_coverage, bilinear_sampler,
                                interpolate)
from ...utils.registry import register_model, trainable
from ..base import BaseModel


def lrelu(x):
    return nn.leaky_relu(x, 0.1)


def conv(cin, cout, kernel_size=3, stride=1, padding=1, dilation=1,
         activation=True):
    mods = [nn.Conv2d(cin, cout, kernel_size, stride=stride, padding=padding,
                      dilation=dilation, bias=True)]
    if activation:
        mods.append(lrelu)
    return nn.Sequential(*mods)


def predict_flow(cin):
    return nn.Conv2d(cin, 2, 3, 1, 1, bias=True)


def predict_mask(cin):
    return nn.Conv2d(cin, 1, 3, 1, 1, bias=True)


def deconv(cin, cout, kernel_size=4, stride=2, padding=1):
    return nn.ConvTranspose2d(cin, cout, kernel_size, stride, padding,
                              bias=True)


def _upsample_kernel2d(w: int) -> np.ndarray:
    c = w // 2
    k = 1 - np.abs(c - np.arange(w, dtype=np.float32)) / (c + 1)
    return k[:, None] * k[None, :]


def mfn_upsample(img: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Custom triangular-kernel upsampling (maskflownet.py:80-107)."""
    if factor == 1:
        return img
    b, h, w, c = img.shape
    x = jnp.pad(img, ((0, 0), (0, 1), (0, 1), (0, 0)), mode="edge")
    kw = factor * 2 - 1
    kernel = jnp.asarray(_upsample_kernel2d(kw), img.dtype)
    kernel = jnp.tile(kernel[:, :, None, None], (1, 1, 1, c)) * \
        jnp.eye(c, dtype=img.dtype)[None, None]
    # conv_transpose(stride=f, padding=f-1) == lhs-dilated conv with
    # padding kw-1-(f-1) per side
    pad = kw - 1 - (factor - 1)
    out = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1), padding=((pad, pad), (pad, pad)),
        lhs_dilation=(factor, factor),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out[:, :-1, :-1, :]


def mfn_downsample(img: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Normalized triangular-kernel downsampling (maskflownet.py:110-125)."""
    if factor == 1:
        return img
    b, h, w, c = img.shape
    wk = factor // 2
    kk = factor * 2 + 1
    k1 = ((wk * 2 + 1) - np.abs(
        wk * 2 - np.arange(kk, dtype=np.float32))) / (2 * wk * 2 + 1)
    # reference: ((w+1) - |w - arange(2w+1)|) / (2w+1) with w = factor//2
    wref = factor // 2
    k1 = ((wref + 1) - np.abs(
        wref - np.arange(wref * 2 + 1, dtype=np.float32))) / (2 * wref + 1)
    k2d = jnp.asarray(k1[:, None] * k1[None, :], img.dtype)
    kernel = jnp.tile(k2d[:, :, None, None], (1, 1, 1, c)) * \
        jnp.eye(c, dtype=img.dtype)[None, None]
    pad = wref
    num = jax.lax.conv_general_dilated(
        img, kernel, window_strides=(factor, factor),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    den = jax.lax.conv_general_dilated(
        jnp.ones_like(img), kernel, window_strides=(factor, factor),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return num / den


def mfn_warp(x: jnp.ndarray, flow_yx: jnp.ndarray,
             clamp: bool = False) -> jnp.ndarray:
    """Backward warp for MaskFlowNet's (y, x) flows with 0.9999 mask."""
    b, h, w, _ = flow_yx.shape
    flow_xy = flow_yx[..., ::-1]
    coords = coords_grid(b, h, w, dtype=flow_xy.dtype) + flow_xy
    if clamp:
        norm = jnp.asarray([(w - 1) / 2.0, (h - 1) / 2.0], coords.dtype)
        g = jnp.clip(coords / norm - 1.0, -1.1, 1.1)
        coords = (g + 1.0) * norm
    out = bilinear_sampler(x, coords)
    mask = bilinear_coverage(coords, (h, w), dtype=x.dtype)
    return out * (mask >= 0.9999).astype(x.dtype)


class EpeLossWithMask:
    def __init__(self, eps=1e-8, q=None):
        self.eps = eps
        self.q = q

    def __call__(self, pred, label, mask):
        # NHWC; pred/label (B, H, W, 2), mask (B, H, W, 1)
        if self.q is not None:
            loss = (jnp.sum(jnp.abs(pred - label), axis=-1) + self.eps) \
                ** self.q
        else:
            loss = jnp.sqrt(jnp.sum((pred - label) ** 2, axis=-1) + self.eps)
        loss = loss * mask[..., 0]
        b = loss.shape[0]
        return loss.reshape(b, -1).sum(1) / \
            jnp.clip(mask.reshape(b, -1).sum(1), 1e-8)


class MultiscaleEpe:
    def __init__(self, scales, weights, match, eps=1e-8, q=None):
        self.scales = scales
        self.weights = weights
        self.match = match
        self.eps = eps
        self.q = q

    def __call__(self, outputs, inputs):
        flow = jnp.moveaxis(inputs["flows"][:, 0], -3, -1)
        mask = jnp.moveaxis(inputs["valids"][:, 0], -3, -1)
        preds = outputs["flow_preds"]  # NHWC, coarse->fine
        epe = EpeLossWithMask(eps=self.eps, q=self.q)
        losses = 0
        if self.match == "upsampling":
            for p, w, s in zip(preds, self.weights, self.scales):
                losses = losses + w * epe(mfn_upsample(p, s), flow, mask)
        elif self.match == "downsampling":
            for p, w, s in zip(preds, self.weights, self.scales):
                losses = losses + w * epe(p, mfn_downsample(flow, s),
                                          mfn_downsample(mask, s))
        else:
            raise NotImplementedError(self.match)
        return jnp.mean(losses)


class MaskFlownet_S(BaseModel):
    pretrained_checkpoints = {
        "sintel": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/maskflownet_s-sintel-79196ff3.ckpt",
        "things": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/maskflownet_s-things-a8a8ed9e.ckpt",
    }

    def __init__(self, div_flow: float = 20.0, md: int = 4,
                 flow_multiplier: float = 1.0, deform_bias: bool = True,
                 strides: Sequence[int] = (64, 32, 16, 8, 4),
                 upfeat_ch: Sequence[int] = (16, 16, 16, 16),
                 loss_weights: Sequence[float] = (0.005, 0.01, 0.02, 0.08,
                                                  0.32),
                 loss_match: str = "upsampling", loss_eps: float = 1e-8,
                 loss_q: Optional[float] = None, **kwargs):
        super().__init__(
            loss_fn=MultiscaleEpe(strides, loss_weights, loss_match,
                                  loss_eps, loss_q),
            output_stride=64, **kwargs)
        self.div_flow = div_flow
        self.md = md
        self.strides = strides
        self.scale = div_flow * flow_multiplier

        dims = [(3, 16), (16, 32), (32, 64), (64, 96), (96, 128), (128, 196)]
        for i, (cin, cout) in enumerate(dims, start=1):
            setattr(self, f"conv{i}a", conv(cin, cout, stride=2))
            setattr(self, f"conv{i}b", conv(cout, cout, stride=1))
            setattr(self, f"conv{i}c", conv(cout, cout, stride=1))

        nd = (2 * md + 1) ** 2
        dd = np.cumsum([128, 128, 96, 64, 32])
        extras = {"6": 0, "5": 128 + 18, "4": 96 + 18, "3": 64 + 18,
                  "2": 32 + 18}
        for lvl, extra in extras.items():
            od = nd + extra
            setattr(self, f"conv{lvl}_0", conv(od, 128))
            setattr(self, f"conv{lvl}_1", conv(od + dd[0], 128))
            setattr(self, f"conv{lvl}_2", conv(od + dd[1], 96))
            setattr(self, f"conv{lvl}_3", conv(od + dd[2], 64))
            setattr(self, f"conv{lvl}_4", conv(od + dd[3], 32))
            setattr(self, f"pred_flow{lvl}", predict_flow(od + dd[4]))
            if lvl != "2":
                setattr(self, f"pred_mask{lvl}", predict_mask(od + dd[4]))
                up_idx = str(int(lvl) - 1)
                setattr(self, f"upfeat{up_idx}",
                        deconv(od + dd[4], 16))

        od2 = nd + 32 + 18
        self.dc_conv1 = conv(od2 + dd[4], 128, padding=1, dilation=1)
        self.dc_conv2 = conv(128, 128, padding=2, dilation=2)
        self.dc_conv3 = conv(128, 128, padding=4, dilation=4)
        self.dc_conv4 = conv(128, 96, padding=8, dilation=8)
        self.dc_conv5 = conv(96, 64, padding=16, dilation=16)
        self.dc_conv6 = conv(64, 32, padding=1, dilation=1)
        self.dc_conv7 = predict_flow(32)

        self.deform5 = DeformConv2d(128, 128)
        self.deform4 = DeformConv2d(96, 96)
        self.deform3 = DeformConv2d(64, 64)
        self.deform2 = DeformConv2d(32, 32)
        self.conv5f = conv(16, 128, activation=False)
        self.conv4f = conv(16, 96, activation=False)
        self.conv3f = conv(16, 64, activation=False)
        self.conv2f = conv(16, 32, activation=False)

    def _features(self, params, im):
        feats = []
        x = im
        for i in range(1, 7):
            x = getattr(self, f"conv{i}a")(params[f"conv{i}a"], x)
            x = getattr(self, f"conv{i}b")(params[f"conv{i}b"], x)
            x = getattr(self, f"conv{i}c")(params[f"conv{i}c"], x)
            feats.append(x)
        return feats  # c?1..c?6

    def _corr(self, f1, f2):
        c = local_correlation(f1, f2, self.md, normalize=False) / f2.shape[-1]
        return lrelu(c)

    def _decode(self, params, lvl, x):
        for i in range(5):
            m = getattr(self, f"conv{lvl}_{i}")
            x = jnp.concatenate([m(params[f"conv{lvl}_{i}"], x), x], axis=-1)
        return x

    def forward(self, params, inputs: Dict[str, Any],
                training: bool = False, skip_preprocess: bool = False):
        if skip_preprocess:
            images = inputs["images"]
            image_resizer = None
        else:
            bgr_mean = jnp.mean(inputs["images"], axis=(1, 3, 4),
                                keepdims=True)
            images, image_resizer = self.preprocess_images(
                inputs["images"], bgr_add=-bgr_mean, bgr_mult=1.0,
                bgr_to_rgb=True, resize_mode="interpolation",
                interpolation_mode="bilinear",
                interpolation_align_corners=False)
        im1 = images[:, 0]
        im2 = images[:, 1]

        c1 = self._features(params, im1)
        c2 = self._features(params, im2)

        x = self._decode(params, "6", self._corr(c1[5], c2[5]))
        flow6 = self.pred_flow6(params["pred_flow6"], x)
        mask6 = self.pred_mask6(params["pred_mask6"], x)

        flows = {"6": flow6}
        flow, mask = flow6, mask6
        deforms = {"5": self.deform5, "4": self.deform4, "3": self.deform3,
                   "2": self.deform2}
        convfs = {"5": self.conv5f, "4": self.conv4f, "3": self.conv3f,
                  "2": self.conv2f}
        for lvl, stride_idx in zip(("5", "4", "3", "2"), (1, 2, 3, 4)):
            idx = int(lvl) - 1
            feat = lrelu(getattr(self, f"upfeat{lvl}")(
                params[f"upfeat{lvl}"], x))
            flow = mfn_upsample(flow, 2)
            mask = mfn_upsample(mask, 2)
            off = flow * (self.scale / self.strides[stride_idx])
            off9 = jnp.tile(off, (1, 1, 1, 9))
            warp = deforms[lvl](params[f"deform{lvl}"], c2[idx], off9)
            warp = warp * nn.sigmoid(mask) + convfs[lvl](
                params[f"conv{lvl}f"], feat)
            warp = lrelu(warp)
            corr = self._corr(c1[idx], warp)
            x = jnp.concatenate([corr, c1[idx], feat, flow], axis=-1)
            x = self._decode(params, lvl, x)
            flow = flow + getattr(self, f"pred_flow{lvl}")(
                params[f"pred_flow{lvl}"], x)
            if lvl != "2":
                mask = getattr(self, f"pred_mask{lvl}")(
                    params[f"pred_mask{lvl}"], x)
            flows[lvl] = flow

        y = self.dc_conv4(params["dc_conv4"], self.dc_conv3(
            params["dc_conv3"], self.dc_conv2(
                params["dc_conv2"], self.dc_conv1(params["dc_conv1"], x))))
        flow2 = flows["2"] + self.dc_conv7(params["dc_conv7"], self.dc_conv6(
            params["dc_conv6"], self.dc_conv5(params["dc_conv5"], y)))
        flows["2"] = flow2
        mask2 = mask  # mask at level 2 (predicted at level 3 then upsampled)

        # internal flows are (y, x); flip to (x, y) and scale
        preds = [flows[lvl][..., ::-1] * self.scale
                 for lvl in ("6", "5", "4", "3", "2")]
        occ2 = 1 - nn.sigmoid(mask2)

        mask0 = nn.sigmoid(mfn_upsample(mask2, 4)) - 0.5
        c30 = jnp.concatenate([im1, jnp.zeros_like(mask0)], axis=-1)
        warped_im2 = mfn_warp(im2, mfn_upsample(flow2, 4) * self.scale)
        c40 = jnp.concatenate([warped_im2, mask0], axis=-1)
        # reference quirk (maskflownet.py:491): c2s mixes image-1 features at
        # levels 2 and 3 — preserved for checkpoint-faithful behavior
        c2s = [c2[0], c1[1], c1[2], c2[3], c2[4], c2[5]]
        srcs = (c1, c2s, [flows[lvl] for lvl in ("6", "5", "4", "3", "2")],
                c30, c40)

        h, w = im1.shape[1:3]
        flow_up = interpolate(preds[-1], (h, w), mode="bilinear",
                              align_corners=True)
        occ_up = interpolate(occ2, (h, w), mode="bilinear",
                             align_corners=True)
        if image_resizer is not None:
            flow_up = self.postprocess_predictions(flow_up, image_resizer,
                                                   is_flow=True)
            occ_up = self.postprocess_predictions(occ_up, image_resizer,
                                                  is_flow=False)
        output = {
            "flows": self.nhwc_flow_to_output(flow_up),
            "occs": jnp.moveaxis(occ_up, -1, -3)[:, None],
            "srcs": srcs,
        }
        if training:
            output["flow_preds"] = preds
            output["occ_preds"] = [occ2]
        return output


class MaskFlownet(BaseModel):
    pretrained_checkpoints = {
        "kitti": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/maskflownet-kitti-d2ccb09b.ckpt",
        "sintel": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/maskflownet-sintel-c52423aa.ckpt",
    }

    def __init__(self, div_flow: float = 20.0, md: int = 4, md2: int = 2,
                 flow_multiplier: float = 1.0, deform_bias: bool = True,
                 strides: Sequence[int] = (64, 32, 16, 8, 4),
                 upfeat_ch: Sequence[int] = (16, 16, 16, 16),
                 loss_weights: Sequence[float] = (0.005, 0.01, 0.02, 0.08,
                                                  0.32),
                 loss_match: str = "upsampling", loss_eps: float = 1e-8,
                 loss_q: Optional[float] = None, **kwargs):
        super().__init__(
            loss_fn=MultiscaleEpe(strides, loss_weights, loss_match,
                                  loss_eps, loss_q),
            output_stride=64, **kwargs)
        self.div_flow = div_flow
        self.md2 = md2
        self.strides = strides
        self.scale = div_flow * flow_multiplier

        self.MaskFlownet_S = MaskFlownet_S(
            div_flow=div_flow, md=md, flow_multiplier=flow_multiplier,
            strides=strides, upfeat_ch=upfeat_ch)

        dims = [(4, 16), (16, 32), (32, 64), (64, 96), (96, 128), (128, 196)]
        for i, (cin, cout) in enumerate(dims, start=1):
            setattr(self, f"conv{i}x", conv(cin, cout, stride=2))
            setattr(self, f"conv{i}y", conv(cout, cout, stride=1))
            setattr(self, f"conv{i}z", conv(cout, cout, stride=1))

        nd = (2 * md2 + 1) ** 2
        dd = np.cumsum([128, 128, 96, 64, 32])
        extras = {"6": nd + 2, "5": nd + 128 + 16 + 2 + 2,
                  "4": nd + 96 + 16 + 2 + 2, "3": nd + 64 + 16 + 2 + 2,
                  "2": nd + 32 + 16 + 2 + 2}
        for lvl, extra in extras.items():
            od = nd + extra
            setattr(self, f"conv{lvl}_0", conv(od, 128))
            setattr(self, f"conv{lvl}_1", conv(od + dd[0], 128))
            setattr(self, f"conv{lvl}_2", conv(od + dd[1], 96))
            setattr(self, f"conv{lvl}_3", conv(od + dd[2], 64))
            setattr(self, f"conv{lvl}_4", conv(od + dd[3], 32))
            setattr(self, f"pred_flow{lvl}", predict_flow(od + dd[4]))
            if lvl != "2":
                up_idx = str(int(lvl) - 1)
                setattr(self, f"upfeat{up_idx}", deconv(od + dd[4], 16))

        od2 = nd + nd + 32 + 16 + 2 + 2
        self.dc_conv1 = conv(od2 + dd[4], 128, padding=1, dilation=1)
        self.dc_conv2 = conv(128, 128, padding=2, dilation=2)
        self.dc_conv3 = conv(128, 128, padding=4, dilation=4)
        self.dc_conv4 = conv(128, 96, padding=8, dilation=8)
        self.dc_conv5 = conv(96, 64, padding=16, dilation=16)
        self.dc_conv6 = conv(64, 32, padding=1, dilation=1)
        self.dc_conv7 = predict_flow(32)

        self.deform6 = DeformConv2d(196, 196)
        self.deform5 = DeformConv2d(128, 128)
        self.deform4 = DeformConv2d(96, 96)
        self.deform3 = DeformConv2d(64, 64)
        self.deform2 = DeformConv2d(32, 32)

    def _features(self, params, im):
        feats = []
        x = im
        for i in range(1, 7):
            x = getattr(self, f"conv{i}x")(params[f"conv{i}x"], x)
            x = getattr(self, f"conv{i}y")(params[f"conv{i}y"], x)
            x = getattr(self, f"conv{i}z")(params[f"conv{i}z"], x)
            feats.append(x)
        return feats

    def _corr(self, f1, f2):
        c = local_correlation(f1, f2, self.md2, normalize=False) \
            / f2.shape[-1]
        return lrelu(c)

    def _decode(self, params, lvl, x):
        for i in range(5):
            m = getattr(self, f"conv{lvl}_{i}")
            x = jnp.concatenate([m(params[f"conv{lvl}_{i}"], x), x], axis=-1)
        return x

    def forward(self, params, inputs: Dict[str, Any],
                training: bool = False) -> Dict[str, jnp.ndarray]:
        bgr_mean = jnp.mean(inputs["images"], axis=(1, 3, 4), keepdims=True)
        images, image_resizer = self.preprocess_images(
            inputs["images"], bgr_add=-bgr_mean, bgr_mult=1.0,
            bgr_to_rgb=True, resize_mode="interpolation",
            interpolation_mode="bilinear",
            interpolation_align_corners=False)

        s_out = self.MaskFlownet_S(
            params["MaskFlownet_S"], {"images": images},
            training=training, skip_preprocess=True)
        c1, c2, flows_s, c30, c40 = s_out["srcs"]

        c3 = self._features(params, c30)
        c4 = self._features(params, c40)

        deforms = {"6": self.deform6, "5": self.deform5, "4": self.deform4,
                   "3": self.deform3, "2": self.deform2}

        flow = flows_s[0]
        preds_internal = []
        x = None
        for i, lvl in enumerate(("6", "5", "4", "3", "2")):
            idx = int(lvl) - 1
            if lvl != "6":
                feat = lrelu(getattr(self, f"upfeat{lvl}")(
                    params[f"upfeat{lvl}"], x))
                flow = mfn_upsample(flow, 2)
            off = flow * (self.scale / self.strides[i])
            off9 = jnp.tile(off, (1, 1, 1, 9))
            warp_u = lrelu(deforms[lvl](params[f"deform{lvl}"], c2[idx],
                                        off9))
            corr_u = self._corr(c1[idx], warp_u)
            corr_v = self._corr(c3[idx], c4[idx])
            if lvl == "6":
                x = jnp.concatenate([corr_u, corr_v, flow], axis=-1)
            else:
                x = jnp.concatenate([c1[idx], feat, corr_u, corr_v, flow,
                                     flows_s[i]], axis=-1)
            x = self._decode(params, lvl, x)
            flow = flow + getattr(self, f"pred_flow{lvl}")(
                params[f"pred_flow{lvl}"], x)
            preds_internal.append(flow)

        y = self.dc_conv4(params["dc_conv4"], self.dc_conv3(
            params["dc_conv3"], self.dc_conv2(
                params["dc_conv2"], self.dc_conv1(params["dc_conv1"], x))))
        flow = flow + self.dc_conv7(params["dc_conv7"], self.dc_conv6(
            params["dc_conv6"], self.dc_conv5(params["dc_conv5"], y)))
        preds_internal[-1] = flow

        preds = [f[..., ::-1] * self.scale for f in preds_internal]
        h, w = images.shape[2:4]
        flow_up = interpolate(preds[-1], (h, w), mode="bilinear",
                              align_corners=False)
        flow_up = self.postprocess_predictions(flow_up, image_resizer,
                                               is_flow=True)
        output = {"flows": self.nhwc_flow_to_output(flow_up)}
        if training:
            output["flow_preds"] = preds
        return output


@register_model
@trainable
class maskflownet_s(MaskFlownet_S):
    pass


@register_model
@trainable
class maskflownet(MaskFlownet):
    pass
