"""DPFlow — dual-pyramid bidirectional CGU network
(reference: ptlflow/models/dpflow/dpflow.py:93-547,
cgu_bidir_dual_encoder.py:32-314, update.py:25-306, res_stem.py:21-97).

TPU notes: the pyramid depth is derived from the *static* input shape at
trace time (compute_pyramid_levels), so the dynamic-resolution behavior of
the reference becomes one compiled program per input size.  Refinement
iterations run under ``lax.scan``; the all-pairs correlation is the MXU
one-hot lookup.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ... import nn
from ...nn import Module
from ...ops.correlation import CorrBlock, coords_grid
from ...ops.grid_sample import interpolate
from ...ops.upsample import convex_upsample
from ...ops.warp import forward_interpolate
from ...utils.registry import register_model, trainable, ptlflow_trained
from ..base.base_model import BaseModel
from ..rapidflow.rapidflow import rescale_flow
from .cgu import CGUStage, group_norm, layer_norm2d


def compute_pyramid_levels(images_shape) -> int:
    """reference utils.py:28-34: 3 levels at ~1K, +1 per octave above."""
    img_diag = math.sqrt(images_shape[-2] ** 2 + images_shape[-1] ** 2)
    input_factor = max(1.0, img_diag / 1100)
    return int(round(math.log2(input_factor))) + 3


class ResidualBlock(Module):
    """reference res_stem.py:21-51."""

    def __init__(self, in_planes, planes, norm=group_norm, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(in_planes, planes, 3, padding=1,
                               stride=stride)
        self.conv2 = nn.Conv2d(planes, planes, 3, padding=1)
        self.norm_fn = norm
        if stride == 1 and in_planes == planes:
            self.downsample = None
        else:
            # torch wraps the conv in an nn.Sequential with the (param-less)
            # norm, so checkpoint keys are "downsample.0.*"
            self.downsample = nn.Sequential(
                nn.Conv2d(in_planes, planes, 1, stride=stride))

    def __call__(self, params, x, **kw):
        y = nn.relu(self.norm_fn(self.conv1(params["conv1"], x)))
        y = nn.relu(self.norm_fn(self.conv2(params["conv2"], y)))
        if self.downsample is not None:
            x = self.norm_fn(self.downsample(params["downsample"], x))
        return nn.relu(x + y)


class ResStem(Module):
    """Stride-4 residual stem (reference res_stem.py:54-97)."""

    def __init__(self, hidden_chs: Sequence[int], norm=group_norm):
        super().__init__()
        self.norm_fn = norm
        self.conv1 = nn.Conv2d(3, hidden_chs[0], 7, stride=2, padding=3)
        self.layer1 = nn.Sequential(
            ResidualBlock(hidden_chs[0], hidden_chs[0], norm, stride=1),
            ResidualBlock(hidden_chs[0], hidden_chs[0], norm, stride=1))
        self.layer2 = nn.Sequential(
            ResidualBlock(hidden_chs[0], hidden_chs[1], norm, stride=2),
            ResidualBlock(hidden_chs[1], hidden_chs[1], norm, stride=1))
        self.conv2 = nn.Conv2d(hidden_chs[1], hidden_chs[2], 1)

    def __call__(self, params, x, **kw):
        x = nn.relu(self.norm_fn(self.conv1(params["conv1"], x)))
        x = self.layer1(params["layer1"], x)
        x = self.layer2(params["layer2"], x)
        return self.conv2(params["conv2"], x)


class ConvGRU(Module):
    def __init__(self, hidden_dim, input_dim):
        super().__init__()
        self.convz = nn.Conv2d(hidden_dim + input_dim, hidden_dim, 3,
                               padding=1)
        self.convr = nn.Conv2d(hidden_dim + input_dim, hidden_dim, 3,
                               padding=1)
        self.convq = nn.Conv2d(hidden_dim + input_dim, hidden_dim, 3,
                               padding=1)

    def __call__(self, params, h, x, **kw):
        hx = jnp.concatenate([h, x], axis=-1)
        z = jax.nn.sigmoid(self.convz(params["convz"], hx))
        r = jax.nn.sigmoid(self.convr(params["convr"], hx))
        q = jnp.tanh(self.convq(
            params["convq"], jnp.concatenate([r * h, x], axis=-1)))
        return (1 - z) * h + z * q


class CGUGRU(Module):
    """GRU whose gates are CGU stages (reference update.py:64-140)."""

    def __init__(self, hidden_dim, input_dim, norm=layer_norm2d, depth=4,
                 mlp_ratio=2, mlp_use_dw_conv=True, mlp_dw_kernel_size=7,
                 mlp_in_kernel_size=1, mlp_out_kernel_size=1,
                 layer_scale_init_value=1e-2):
        super().__init__()
        kw = dict(stride=1, norm=norm, depth=depth, use_cross=False,
                  mlp_ratio=mlp_ratio, mlp_use_dw_conv=mlp_use_dw_conv,
                  mlp_dw_kernel_size=mlp_dw_kernel_size,
                  mlp_in_kernel_size=mlp_in_kernel_size,
                  mlp_out_kernel_size=mlp_out_kernel_size,
                  layer_scale_init_value=layer_scale_init_value)
        self.convz = CGUStage(hidden_dim + input_dim, hidden_dim, **kw)
        self.convr = CGUStage(hidden_dim + input_dim, hidden_dim, **kw)
        self.convq = CGUStage(hidden_dim + input_dim, hidden_dim, **kw)

    def __call__(self, params, h, x, **kw):
        hx = jnp.concatenate([h, x], axis=-1)
        z = jax.nn.sigmoid(self.convz(params["convz"], hx))
        r = jax.nn.sigmoid(self.convr(params["convr"], hx))
        q = jnp.tanh(self.convq(
            params["convq"], jnp.concatenate([r * h, x], axis=-1)))
        return (1 - z) * h + z * q


class FlowHead(Module):
    def __init__(self, input_dim, hidden_dim=256, info_pred=False):
        super().__init__()
        self.conv1 = nn.Conv2d(input_dim, hidden_dim, 3, padding=1)
        self.conv2 = nn.Conv2d(hidden_dim, 6 if info_pred else 2, 3,
                               padding=1)

    def __call__(self, params, x, **kw):
        return self.conv2(params["conv2"],
                          nn.relu(self.conv1(params["conv1"], x)))


class ConvexMask(Module):
    def __init__(self, net_chs, pred_stride):
        super().__init__()
        self.conv1 = nn.Conv2d(net_chs, net_chs * 2, 3, padding=1)
        self.conv2 = nn.Conv2d(net_chs * 2, pred_stride ** 2 * 9, 1)

    def __call__(self, params, x, **kw):
        return self.conv2(params["conv2"],
                          nn.relu(self.conv1(params["conv1"], x)))


class MotionEncoder(Module):
    """reference update.py:159-211."""

    def __init__(self, corr_levels, corr_range, dec_motion_chs,
                 corr_hidden=256, corr_out=192, flow_hidden=128, flow_out=64,
                 flow_kernel_size=7):
        super().__init__()
        cor_planes = corr_levels * (2 * corr_range + 1) ** 2
        self.convc1 = nn.Conv2d(cor_planes, corr_hidden, 1)
        self.convc2 = nn.Conv2d(corr_hidden, corr_out, 3, padding=1)
        self.convf1 = nn.Conv2d(2, flow_hidden, flow_kernel_size,
                                padding=flow_kernel_size // 2)
        self.convf2 = nn.Conv2d(flow_hidden, flow_out, 3, padding=1)
        self.conv = nn.Conv2d(flow_out + corr_out, dec_motion_chs - 2, 3,
                              padding=1)

    def __call__(self, params, flow, corr, **kw):
        cor = nn.relu(self.convc1(params["convc1"], corr))
        cor = nn.relu(self.convc2(params["convc2"], cor))
        flo = nn.relu(self.convf1(params["convf1"], flow))
        flo = nn.relu(self.convf2(params["convf2"], flo))
        out = nn.relu(self.conv(params["conv"],
                                jnp.concatenate([cor, flo], axis=-1)))
        return jnp.concatenate([out, flow], axis=-1)


class UpdateBlock(Module):
    """reference update.py:214-306."""

    def __init__(self, corr_levels, corr_range, net_chs_fixed,
                 inp_chs_fixed, dec_motion_chs=128, dec_flow_kernel_size=7,
                 dec_flow_head_chs=256, dec_gru_norm=layer_norm2d,
                 dec_gru_depth=4, dec_gru_iters=1, dec_gru_mlp_ratio=2.0,
                 mlp_use_dw_conv=True, mlp_dw_kernel_size=7,
                 mlp_in_kernel_size=1, mlp_out_kernel_size=1,
                 layer_scale_init_value=1e-2, loss="laplace",
                 use_upsample_mask=True, upmask_gradient_scale=1.0):
        super().__init__()
        self.use_upsample_mask = use_upsample_mask
        self.upmask_gradient_scale = upmask_gradient_scale
        self.encoder = MotionEncoder(
            corr_levels, corr_range, dec_motion_chs,
            flow_kernel_size=dec_flow_kernel_size)
        self.gru_list = nn.ModuleList([
            CGUGRU(net_chs_fixed, dec_motion_chs + inp_chs_fixed,
                   norm=dec_gru_norm, depth=dec_gru_depth,
                   mlp_ratio=dec_gru_mlp_ratio,
                   mlp_use_dw_conv=mlp_use_dw_conv,
                   mlp_dw_kernel_size=mlp_dw_kernel_size,
                   mlp_in_kernel_size=mlp_in_kernel_size,
                   mlp_out_kernel_size=mlp_out_kernel_size,
                   layer_scale_init_value=layer_scale_init_value)
            for _ in range(dec_gru_iters)])
        self.flow_head = FlowHead(net_chs_fixed, hidden_dim=dec_flow_head_chs,
                                  info_pred=loss == "laplace")
        if use_upsample_mask:
            self.mask = ConvexMask(net_chs_fixed, 8)

    def __call__(self, params, net, inp, corr, flow, get_mask=True, **kw):
        motion_features = self.encoder(params["encoder"], flow, corr)
        inp = jnp.concatenate([inp, motion_features], axis=-1)
        for i, gru in enumerate(self.gru_list):
            net = gru(params["gru_list"][str(i)], net, inp)
        delta_flow = self.flow_head(params["flow_head"], net)
        mask = None
        if self.use_upsample_mask and get_mask:
            mask = self.upmask_gradient_scale * self.mask(params["mask"],
                                                          net)
        return delta_flow, net, mask


class CGUBidirDualEncoder(Module):
    """Bidirectional dual-image recurrent CGU pyramid encoder
    (reference cgu_bidir_dual_encoder.py:32-314): a forward GRU carried down
    the pyramid, a backward GRU carried up, a low-res image stem per level,
    and a cross-image CGU stage applied at every step."""

    def __init__(self, hidden_chs: Sequence[int], out_1x1_abs_chs: int,
                 out_1x1_factor: Optional[float], num_out_stages: int = 1,
                 norm=group_norm, depth: int = 4, mlp_ratio: float = 2.0,
                 mlp_use_dw_conv: bool = True, mlp_dw_kernel_size: int = 7,
                 mlp_in_kernel_size: int = 1, mlp_out_kernel_size: int = 1,
                 layer_scale_init_value: float = 1e-2):
        super().__init__()
        self.hidden_chs = list(hidden_chs)
        self.out_1x1_abs_chs = out_1x1_abs_chs
        self.out_1x1_factor = out_1x1_factor
        self.num_out_stages = num_out_stages
        hc = hidden_chs[-1]
        self.forward_gru = ConvGRU(hc, hc)
        self.down_gru = nn.Conv2d(hc, hc, 3, stride=2, padding=1)
        self.backward_gru = ConvGRU(hc, hc)
        self.up_gru = nn.ConvTranspose2d(hc, hc, 4, stride=2, padding=1)
        self.stem = ResStem([hidden_chs[0], hidden_chs[1], 2 * hc], norm)
        self.lowres_stem = ResStem(list(hidden_chs), norm)
        if out_1x1_abs_chs > 0:
            self.out_1x1 = nn.Conv2d(hc, out_1x1_abs_chs, 1)
        stage_kw = dict(stride=2, norm=norm, depth=depth, use_cross=True,
                        mlp_ratio=mlp_ratio,
                        mlp_use_dw_conv=mlp_use_dw_conv,
                        mlp_dw_kernel_size=mlp_dw_kernel_size,
                        mlp_in_kernel_size=mlp_in_kernel_size,
                        mlp_out_kernel_size=mlp_out_kernel_size,
                        layer_scale_init_value=layer_scale_init_value)
        self.rec_stage = CGUStage(hc, hc, **stage_kw)
        self.back_stage = CGUStage(hc, hc, **{**stage_kw, "stride": 1})
        if num_out_stages > 0:
            self.out_merge_conv = nn.Conv2d(3 * hc, hc, 1)
            self.out_stages = CGUStage(
                hc, hc, **{**stage_kw, "stride": 1,
                           "depth": num_out_stages * depth})

    def __call__(self, params, x, y, pyr_levels: int, **kw):
        input_x, input_y = x, y
        x_pyr, y_pyr = [], []
        for i in range(pyr_levels + 1):
            if i == 0:
                x = self.stem(params["stem"], x)
                y = self.stem(params["stem"], y)
                half = x.shape[-1] // 2
                x, hx = x[..., :half], jnp.tanh(x[..., half:])
                y, hy = y[..., :half], jnp.tanh(y[..., half:])
            else:
                hx = self.forward_gru(params["forward_gru"], hx, x)
                hy = self.forward_gru(params["forward_gru"], hy, y)
                x, y = self.rec_stage(params["rec_stage"], hx, hy)
                if i < pyr_levels:
                    hx = jnp.tanh(self.down_gru(params["down_gru"], hx))
                    hy = jnp.tanh(self.down_gru(params["down_gru"], hy))
            if i >= 1:
                x_pyr.append(x)
                y_pyr.append(y)

        hx = jnp.zeros_like(x_pyr[-1])
        hy = jnp.zeros_like(y_pyr[-1])
        for i in range(len(x_pyr) - 1, -1, -1):
            x, y = x_pyr[i], y_pyr[i]
            hx = self.backward_gru(params["backward_gru"], hx, x)
            hy = self.backward_gru(params["backward_gru"], hy, y)
            x2, y2 = self.back_stage(params["back_stage"], hx, hy)
            size = (x.shape[1] * 4, x.shape[2] * 4)
            x_low = self.lowres_stem(
                params["lowres_stem"],
                interpolate(input_x, size, align_corners=True))
            y_low = self.lowres_stem(
                params["lowres_stem"],
                interpolate(input_y, size, align_corners=True))
            x_pyr[i] = jnp.concatenate([x, x2, x_low], axis=-1)
            y_pyr[i] = jnp.concatenate([y, y2, y_low], axis=-1)
            if i > 0:
                hx = jnp.tanh(self.up_gru(params["up_gru"], hx))
                hy = jnp.tanh(self.up_gru(params["up_gru"], hy))

        outs_x, outs_y = [], []
        for x, y in zip(x_pyr, y_pyr):
            if self.num_out_stages > 0:
                x = self.out_merge_conv(params["out_merge_conv"],
                                        nn.relu(x))
                y = self.out_merge_conv(params["out_merge_conv"],
                                        nn.relu(y))
                x, y = self.out_stages(params["out_stages"], x, y)
            if self.out_1x1_abs_chs > 0:
                x = self.out_1x1(params["out_1x1"], x)
                y = self.out_1x1(params["out_1x1"], y)
            outs_x.append(x)
            outs_y.append(y)
        return outs_x[::-1], outs_y[::-1]  # coarsest first


class DPFlowSequenceLoss:
    """L1 or Laplace-mixture sequence loss (reference dpflow.py:44-90)."""

    def __init__(self, loss: str, max_flow: float, gamma: float):
        self.loss = loss
        self.max_flow = max_flow
        self.gamma = gamma

    def __call__(self, outputs, inputs):
        flow_preds = outputs["flow_preds"]  # (it, B, H, W, 2)
        flow_gt = jnp.moveaxis(inputs["flows"][:, 0], -3, -1)
        valid = jnp.moveaxis(inputs["valids"][:, 0], -3, -1)
        n = flow_preds.shape[0]
        mag = jnp.sqrt(jnp.sum(flow_gt ** 2, axis=-1, keepdims=True))
        valid = (valid >= 0.5) & (mag < self.max_flow)
        total = 0.0
        for i in range(n):
            w = self.gamma ** (n - i - 1)
            if self.loss == "laplace" and outputs.get("nf_preds") is not None:
                nf = outputs["nf_preds"][i]  # (B, H, W, 2)
                m = jnp.isfinite(jax.lax.stop_gradient(nf)) & valid
                total += w * jnp.sum(jnp.where(m, nf, 0.0)) / \
                    jnp.maximum(m.sum(), 1)
            else:
                total += w * jnp.mean(
                    valid * jnp.abs(flow_preds[i] - flow_gt))
        return total


class DPFlow(BaseModel):
    pretrained_checkpoints = {
        "chairs": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/dpflow-chairs-f94e717a.ckpt",
        "kitti": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/dpflow-kitti-4e97eac6.ckpt",
        "sintel": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/dpflow-sintel-b44b072c.ckpt",
        "spring": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/dpflow-spring-69bac7fa.ckpt",
        "things": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/dpflow-things-2012b5d6.ckpt",
    }

    def __init__(self, pyramid_levels: Optional[int] = None,
                 iters_per_level: int = 4, corr_levels: int = 1,
                 corr_range: int = 4, enc_depth: int = 4,
                 enc_mlp_ratio: float = 2.0,
                 enc_hidden_chs: Sequence[int] = (64, 96, 128),
                 enc_num_out_stages: int = 1, enc_out_1x1_chs: str = "384",
                 dec_gru_iters: int = 1, dec_gru_depth: int = 4,
                 dec_gru_mlp_ratio: float = 2.0, dec_net_chs: int = 128,
                 dec_inp_chs: int = 128, dec_motion_chs: int = 128,
                 dec_flow_kernel_size: int = 7,
                 dec_flow_head_chs: int = 256,
                 use_upsample_mask: bool = True,
                 upmask_gradient_scale: float = 1.0,
                 cgu_mlp_dw_kernel_size: int = 7,
                 cgu_layer_scale_init_value: float = 0.01,
                 loss: str = "laplace", gamma: float = 0.8,
                 max_flow: float = 400.0, use_var: bool = True,
                 var_min: float = 0.0, var_max: float = 10.0, **kwargs):
        output_stride = (int(2 ** (pyramid_levels + 2))
                         if pyramid_levels is not None else None)
        super().__init__(
            output_stride=output_stride if output_stride else 32,
            loss_fn=DPFlowSequenceLoss(loss, max_flow, gamma), **kwargs)
        self.pyramid_levels = pyramid_levels
        self.iters_per_level = iters_per_level
        self.corr_levels = corr_levels
        self.corr_range = corr_range
        self.loss = loss
        self.use_var = use_var
        self.var_min = var_min
        self.var_max = var_max
        self.use_upsample_mask = use_upsample_mask

        enc_out_1x1_chs = (float(enc_out_1x1_chs)
                           if isinstance(enc_out_1x1_chs, str)
                           and "." in enc_out_1x1_chs
                           else int(enc_out_1x1_chs))
        if isinstance(enc_out_1x1_chs, float):
            out_1x1_factor = enc_out_1x1_chs
            out_1x1_abs_chs = int(enc_out_1x1_chs * enc_hidden_chs[-1])
        else:
            out_1x1_factor = None
            out_1x1_abs_chs = enc_out_1x1_chs

        self.fnet = CGUBidirDualEncoder(
            hidden_chs=enc_hidden_chs, out_1x1_abs_chs=out_1x1_abs_chs,
            out_1x1_factor=out_1x1_factor,
            num_out_stages=enc_num_out_stages, norm=group_norm,
            depth=enc_depth, mlp_ratio=enc_mlp_ratio,
            mlp_dw_kernel_size=cgu_mlp_dw_kernel_size,
            layer_scale_init_value=cgu_layer_scale_init_value)
        self.update_block = UpdateBlock(
            corr_levels=corr_levels, corr_range=corr_range,
            net_chs_fixed=dec_net_chs, inp_chs_fixed=dec_inp_chs,
            dec_motion_chs=dec_motion_chs,
            dec_flow_kernel_size=dec_flow_kernel_size,
            dec_flow_head_chs=dec_flow_head_chs, dec_gru_norm=layer_norm2d,
            dec_gru_depth=dec_gru_depth, dec_gru_iters=dec_gru_iters,
            dec_gru_mlp_ratio=dec_gru_mlp_ratio,
            mlp_dw_kernel_size=cgu_mlp_dw_kernel_size,
            layer_scale_init_value=cgu_layer_scale_init_value, loss=loss,
            use_upsample_mask=use_upsample_mask,
            upmask_gradient_scale=upmask_gradient_scale)

    def _upsample(self, x, mask):
        # reference upsample_flow (dpflow.py:289-302) does not pre-scale the
        # values; convex_upsample multiplies by the factor, so divide first
        # (exact for powers of 2)
        return convex_upsample(x / 8, mask, 8)

    def forward(self, params, inputs: Dict[str, Any],
                training: bool = False) -> Dict[str, jnp.ndarray]:
        if self.pyramid_levels is None:
            pyr_levels = compute_pyramid_levels(inputs["images"].shape)
            output_stride = 2 ** (pyr_levels + 2)
        else:
            pyr_levels = self.pyramid_levels
            output_stride = self.output_stride

        images, image_resizer = self.preprocess_images(
            inputs["images"], stride=output_stride, bgr_add=-0.5,
            bgr_mult=2.0, bgr_to_rgb=True, resize_mode="pad",
            pad_mode="replicate", pad_two_side=True)
        x1_raw = images[:, 0]
        x2_raw = images[:, 1]
        b, height_im, width_im, _ = x1_raw.shape

        x1_pyramid, x2_pyramid = self.fnet(params["fnet"], x1_raw, x2_raw,
                                           pyr_levels=pyr_levels)

        h0, w0 = x1_pyramid[0].shape[1], x1_pyramid[0].shape[2]
        prev = inputs.get("prev_preds")
        flow_init = prev.get("flow_small") if prev is not None else None
        if flow_init is not None:
            if flow_init.shape[-1] != 2:
                flow_init = jnp.moveaxis(flow_init, -3, -1)
            flow = rescale_flow(flow_init, w0, h0, to_local=False)
            flow = interpolate(flow, (h0, w0), align_corners=True)
            flow = forward_interpolate(flow)
        else:
            flow = jnp.zeros((b, h0, w0, 2), x1_raw.dtype)

        flow_preds = []
        info_preds = []
        for l, (x1f, x2f) in enumerate(zip(x1_pyramid, x2_pyramid)):
            xh = x1f.shape[-1]
            ch = xh // 3
            halfch = ch // 2
            x1, cn1 = x1f[..., :xh - ch], x1f[..., xh - ch:]
            x2, cn2 = x2f[..., :xh - ch], x2f[..., xh - ch:]
            i1, n1 = cn1[..., :ch - halfch], cn1[..., ch - halfch:]
            i2, n2 = cn2[..., :ch - halfch], cn2[..., ch - halfch:]
            inp = nn.relu(jnp.concatenate([i1, i2], axis=-1))
            net = jnp.tanh(jnp.concatenate([n1, n2], axis=-1))

            h, w = x1.shape[1], x1.shape[2]
            coords0 = coords_grid(b, h, w, dtype=x1.dtype)
            corr_fn = CorrBlock(x1, x2, num_levels=self.corr_levels,
                                radius=self.corr_range)
            if l > 0:
                flow = rescale_flow(flow, w, h, to_local=False)
                flow = interpolate(flow, (h, w), align_corners=True)

            def step(carry, _, corr_fn=corr_fn, coords0=coords0, inp=inp):
                flow, net = carry
                flow = jax.lax.stop_gradient(flow)
                corr = corr_fn(coords0 + flow)
                delta, net, mask = self.update_block(
                    params["update_block"], net, inp, corr, flow,
                    get_mask=training and self.use_upsample_mask)
                info = None
                if self.loss == "laplace":
                    info = delta[..., 2:]
                    delta = delta[..., :2]
                flow = flow + delta
                ys = None
                if training:
                    out_flow = rescale_flow(flow, width_im, height_im,
                                            to_local=False)
                    out_info = info
                    if mask is not None:
                        out_flow = self._upsample(out_flow, mask)
                        if out_info is not None:
                            out_info = self._upsample(out_info, mask)
                    out_flow = interpolate(out_flow, (height_im, width_im),
                                           align_corners=True)
                    out_flow = self.postprocess_predictions(
                        out_flow, image_resizer, is_flow=True)
                    if out_info is not None:
                        out_info = interpolate(
                            out_info, (height_im, width_im),
                            align_corners=True)
                        out_info = self.postprocess_predictions(
                            out_info, image_resizer, is_flow=False)
                    ys = (out_flow, out_info) if out_info is not None \
                        else (out_flow,)
                return (flow, net), ys

            (flow, net), ys = jax.lax.scan(
                step, (flow, net), None, length=self.iters_per_level)
            if training:
                for i in range(self.iters_per_level):
                    flow_preds.append(ys[0][i])
                    info_preds.append(ys[1][i] if len(ys) > 1 else None)

        if training:
            final = flow_preds[-1]
        else:
            out_flow = rescale_flow(flow, width_im, height_im,
                                    to_local=False)
            if self.use_upsample_mask:
                mask = self.update_block.upmask_gradient_scale * \
                    self.update_block.mask(
                        params["update_block"]["mask"], net)
                out_flow = self._upsample(out_flow, mask)
            out_flow = interpolate(out_flow, (height_im, width_im),
                                   align_corners=True)
            final = self.postprocess_predictions(out_flow, image_resizer,
                                                 is_flow=True)

        outputs = {"flows": self.nhwc_flow_to_output(final),
                   "flow_small": flow}
        if training:
            outputs["flow_preds"] = jnp.stack(flow_preds)
            if self.loss == "laplace":
                outputs["nf_preds"] = self._nf_losses(flow_preds, info_preds,
                                                      inputs)
        return outputs

    def _nf_losses(self, flow_preds, info_preds, inputs):
        """Laplace-mixture NLL per prediction (reference dpflow.py:404-434)."""
        flow_gt = jnp.moveaxis(inputs["flows"][:, 0], -3, -1)
        var_max = self.var_max if self.use_var else 0.0
        var_min = self.var_min if self.use_var else 0.0
        nf = []
        for pred, info in zip(flow_preds, info_preds):
            if info is None:
                nf.append(None)
                continue
            weight = info[..., :2]  # (B, H, W, 2) mixture logits
            raw_b = info[..., 2:]
            log_b = jnp.stack([
                jnp.clip(raw_b[..., 0], 0.0, var_max),
                jnp.clip(raw_b[..., 1], var_min, 0.0)], axis=-1)
            # term2: |gt - pred| (flow dims) x exp(-log_b) (mixture dims)
            err = jnp.abs(flow_gt - pred)[..., :, None]  # (B,H,W,2,1)
            term2 = err * jnp.exp(-log_b)[..., None, :]  # (B,H,W,2,2)
            term1 = weight - math.log(2) - log_b  # (B,H,W,2)
            nf_loss = jax.nn.logsumexp(weight, axis=-1, keepdims=True) - \
                jax.nn.logsumexp(term1[..., None, :] - term2, axis=-1)
            nf.append(nf_loss)  # (B, H, W, 2)
        return jnp.stack(nf) if all(v is not None for v in nf) else None


@register_model
@trainable
@ptlflow_trained
class dpflow(DPFlow):
    pass
