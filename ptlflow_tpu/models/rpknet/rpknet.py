"""RPKNet — Partial-Kernel recurrent pyramid network
(reference: ptlflow/models/rpknet/rpknet.py:109-464, update_partial.py:29-292,
pkconv_slk_encoder.py:31-197).

TPU design: the per-level refinement loop runs under ``lax.scan``; the
recurrent encoder's channel growth across pyramid iterations is static
Python control flow, so each (in, out) channel pair of a PKConv compiles to
its own statically-sliced conv.  The all-pairs correlation uses the MXU
one-hot-matmul lookup (ops/correlation.py) in place of CorrBlock /
alt_cuda_corr (reference corr.py).
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
from ..raft.raft import SequenceLoss
from ..rapidflow.rapidflow import rescale_flow
from .pkconv_slk import (PKConv2d, PKConvSLK, group_norm, layer_norm2d,
                         make_norm)


class ConvPartialGRU(Module):
    """reference update_partial.py:44-82."""

    def __init__(self, hidden_dim, input_dim):
        super().__init__()
        self.convz = PKConv2d(hidden_dim + input_dim, hidden_dim, 3,
                              padding=1)
        self.convr = PKConv2d(hidden_dim + input_dim, hidden_dim, 3,
                              padding=1)
        self.convq = PKConv2d(hidden_dim + input_dim, hidden_dim, 3,
                              padding=1)

    def __call__(self, params, h, x, out_ch, **kw):
        hx = jnp.concatenate([h, x], axis=-1)
        z = jax.nn.sigmoid(self.convz(params["convz"], hx, out_ch=out_ch))
        r = jax.nn.sigmoid(self.convr(params["convr"], hx, out_ch=out_ch))
        q = jnp.tanh(self.convq(
            params["convq"], jnp.concatenate([r * h, x], axis=-1),
            out_ch=out_ch))
        return (1 - z) * h + z * q


class PKConvSLKGRU(Module):
    """GRU whose gates are SLK stages (reference update_partial.py:85-140)."""

    def __init__(self, hidden_dim, input_dim, depth=2, mlp_ratio=4):
        super().__init__()
        kw = dict(mlp_ratio=mlp_ratio, norm=layer_norm2d, stride=1,
                  depth=depth)
        self.convz = PKConvSLK(hidden_dim + input_dim, hidden_dim, **kw)
        self.convr = PKConvSLK(hidden_dim + input_dim, hidden_dim, **kw)
        self.convq = PKConvSLK(hidden_dim + input_dim, hidden_dim, **kw)

    def __call__(self, params, h, x, out_ch, **kw):
        hx = jnp.concatenate([h, x], axis=-1)
        z = jax.nn.sigmoid(self.convz(params["convz"], hx, out_ch=out_ch))
        r = jax.nn.sigmoid(self.convr(params["convr"], hx, out_ch=out_ch))
        q = jnp.tanh(self.convq(
            params["convq"], jnp.concatenate([r * h, x], axis=-1),
            out_ch=out_ch))
        return (1 - z) * h + z * q


class FlowHeadPartial(Module):
    def __init__(self, input_dim, hidden_dim=256):
        super().__init__()
        self.conv1 = PKConv2d(input_dim, hidden_dim, 3, padding=1)
        self.conv2 = PKConv2d(hidden_dim, 2, 3, padding=1)

    def __call__(self, params, x, **kw):
        return self.conv2(params["conv2"],
                          nn.relu(self.conv1(params["conv1"], x)))


class ConvexMask(Module):
    """reference update_partial.py:143-163."""

    def __init__(self, net_chs, pred_stride):
        super().__init__()
        self.conv1 = PKConv2d(net_chs, net_chs * 2, 3, padding=1)
        self.conv2 = PKConv2d(net_chs * 2, pred_stride ** 2 * 9, 1)

    def __call__(self, params, x, **kw):
        in_chs = x.shape[-1]
        x = nn.relu(self.conv1(params["conv1"], x, out_ch=2 * in_chs))
        return self.conv2(params["conv2"], x)


class MotionEncoderPartial(Module):
    """reference update_partial.py:166-217."""

    def __init__(self, corr_levels, corr_range, dec_motion_chs):
        super().__init__()
        cor_planes = corr_levels * (2 * corr_range + 1) ** 2
        self.convc1 = PKConv2d(cor_planes, 256, 1)
        self.convc2 = PKConv2d(256, 192, 3, padding=1)
        self.convf1 = PKConv2d(2, 128, 7, padding=3)
        self.convf2 = PKConv2d(128, 64, 3, padding=1)
        self.conv = PKConv2d(64 + 192, dec_motion_chs - 2, 3, padding=1)

    def __call__(self, params, flow, corr, **kw):
        cor = nn.relu(self.convc1(params["convc1"], corr))
        cor = nn.relu(self.convc2(params["convc2"], cor))
        flo = nn.relu(self.convf1(params["convf1"], flow))
        flo = nn.relu(self.convf2(params["convf2"], flo))
        out = nn.relu(self.conv(params["conv"],
                                jnp.concatenate([cor, flo], axis=-1)))
        return jnp.concatenate([out, flow], axis=-1)


class UpdatePartialBlock(Module):
    """reference update_partial.py:220-292."""

    def __init__(self, pyramid_ranges, corr_levels, corr_range,
                 net_chs_fixed, inp_chs_fixed, dec_motion_chs, dec_gru_depth,
                 dec_gru_iters, dec_gru_mlp_ratio, use_upsample_mask,
                 upmask_gradient_scale):
        super().__init__()
        self.use_upsample_mask = use_upsample_mask
        self.upmask_gradient_scale = upmask_gradient_scale
        self.encoder = MotionEncoderPartial(corr_levels, corr_range,
                                            dec_motion_chs)
        self.gru_list = nn.ModuleList([
            PKConvSLKGRU(net_chs_fixed, dec_motion_chs + inp_chs_fixed,
                         depth=dec_gru_depth, mlp_ratio=dec_gru_mlp_ratio)
            for _ in range(dec_gru_iters)])
        self.flow_head = FlowHeadPartial(net_chs_fixed, hidden_dim=256)
        if use_upsample_mask:
            self.mask = ConvexMask(net_chs_fixed, min(pyramid_ranges))

    def __call__(self, params, net, inp, corr, flow, get_mask=True, **kw):
        motion_features = self.encoder(params["encoder"], flow, corr)
        inp = jnp.concatenate([inp, motion_features], axis=-1)
        for i, gru in enumerate(self.gru_list):
            net = gru(params["gru_list"][str(i)], net, inp, net.shape[-1])
        delta_flow = self.flow_head(params["flow_head"], net)
        mask = None
        if self.use_upsample_mask and get_mask:
            mask = self.upmask_gradient_scale * self.mask(params["mask"],
                                                          net)
        return delta_flow, net, mask


class PKConvSLKEncoder(Module):
    """Recurrent PKConv-SLK pyramid encoder
    (reference pkconv_slk_encoder.py:31-197): one shared SLK stage applied
    repeatedly with growing channel counts, a ConvGRU hidden state carried
    down the pyramid, and a partial 1x1 output head."""

    def __init__(self, pyr_range, hidden_chs: Sequence[int],
                 out_1x1_abs_chs: int, out_1x1_factor: Optional[float],
                 stem_stride: int = 2, norm=group_norm, mlp_ratio: float = 4,
                 depth: int = 2):
        super().__init__()
        self.pyr_level_range = [int(math.log2(v)) for v in pyr_range]
        self.hidden_chs = list(hidden_chs)
        self.out_1x1_abs_chs = out_1x1_abs_chs
        self.out_1x1_factor = out_1x1_factor
        self.stem_stride = stem_stride
        self.forward_gru = ConvPartialGRU(hidden_chs[-1], hidden_chs[-1])
        self.down_gru = PKConv2d(hidden_chs[-1], hidden_chs[-1], 3, stride=2,
                                 padding=1, bias=True)
        self.stem = nn.Sequential(
            PKConv2d(3, hidden_chs[0], 7, stride=stem_stride, padding=3),
            norm)
        self.rec_stage = PKConvSLK(hidden_chs[-1], hidden_chs[-1],
                                   mlp_ratio=mlp_ratio, norm=norm, stride=2,
                                   depth=depth)
        if out_1x1_abs_chs > 0:
            self.out_1x1 = PKConv2d(hidden_chs[-1], out_1x1_abs_chs, 1)

    def __call__(self, params, x, **kw):
        pyramid = []
        if self.pyr_level_range[0] == 0:
            pyramid.append(x)
        pyr_iters = self.pyr_level_range[1]
        offset = 1
        if self.stem_stride > 2:
            extra = int(math.log2(self.stem_stride)) - 1
            pyr_iters -= extra
            offset += extra
        for i in range(pyr_iters):
            if i == 0:
                x = self.stem(params["stem"], x)
                h = jnp.zeros_like(x)
            else:
                in_ch = self.hidden_chs[min(i - 1, len(self.hidden_chs) - 1)]
                out_ch = self.hidden_chs[min(i, len(self.hidden_chs) - 1)]
                h = self.forward_gru(params["forward_gru"], h, x, in_ch)
                x = self.rec_stage(params["rec_stage"], h, out_ch=out_ch)
                if i < pyr_iters - 1:
                    h = jnp.tanh(self.down_gru(params["down_gru"], h,
                                               out_ch=out_ch))
            if i >= self.pyr_level_range[0] - offset:
                pyramid.append(x)
        out = []
        for x in pyramid:
            if self.out_1x1_abs_chs > 0:
                if self.out_1x1_factor is None:
                    x = self.out_1x1(params["out_1x1"], x)
                else:
                    x = self.out_1x1(
                        params["out_1x1"], x,
                        out_ch=int(self.out_1x1_factor * x.shape[-1]))
            out.append(x)
        return out[::-1]  # coarsest level first


class ResidualPartialBlock(Module):
    """reference utils.py:77-149 (stride-1 use only)."""

    def __init__(self, in_planes, planes, norm=group_norm,
                 use_out_activation=True):
        super().__init__()
        self.use_out_activation = use_out_activation
        self.conv1 = PKConv2d(in_planes, planes, 3, padding=1)
        self.conv2 = PKConv2d(planes, planes, 3, padding=1)
        self.norm_fn = norm

    def __call__(self, params, x, out_ch, **kw):
        y = nn.relu(self.norm_fn(self.conv1(params["conv1"], x, out_ch)))
        y = self.norm_fn(self.conv2(params["conv2"], y, out_ch))
        if self.use_out_activation:
            y = nn.relu(y)
        out = x + y
        if self.use_out_activation:
            out = nn.relu(out)
        return out


class UpNetPartial(Module):
    """Gate head for cross-level net fusion (reference rpknet.py:73-106)."""

    def __init__(self, net_chs_fixed, norm=group_norm):
        super().__init__()
        self.conv = PKConv2d(2 * net_chs_fixed, net_chs_fixed, 1)
        self.res = ResidualPartialBlock(net_chs_fixed, net_chs_fixed,
                                        norm=norm, use_out_activation=False)

    def __call__(self, params, x, **kw):
        x = nn.relu(self.conv(params["conv"], x,
                              out_ch=x.shape[-1] // 2))
        return self.res(params["res"], x, x.shape[-1])


class RPKNet(BaseModel):
    pretrained_checkpoints = {
        "chairs": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/rpknet-chairs-a705b345.ckpt",
        "kitti": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/rpknet-kitti-39504eb4.ckpt",
        "sintel": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/rpknet-sintel-e7cc969e.ckpt",
        "things": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/rpknet-things-f79b0d81.ckpt",
    }

    def __init__(self, pyramid_ranges: Tuple[int, ...] = (32, 8),
                 iters: int = 12, input_pad_one_side: bool = False,
                 input_bgr_to_rgb: bool = False,
                 upgate_norm_type: str = "group",
                 group_norm_num_groups: int = 8, corr_levels: int = 1,
                 corr_range: int = 4, enc_norm_type: str = "group",
                 enc_stem_stride: int = 2, enc_depth: int = 2,
                 enc_mlp_ratio: float = 4.0,
                 enc_hidden_chs: Sequence[int] = (32, 64, 96),
                 enc_out_1x1_chs: str = "2.0", dec_gru_iters: int = 2,
                 dec_gru_depth: int = 2, dec_gru_mlp_ratio: float = 4.0,
                 dec_net_chs: Optional[int] = None,
                 dec_inp_chs: Optional[int] = None,
                 dec_motion_chs: int = 128, use_upsample_mask: bool = True,
                 upmask_gradient_scale: float = 1.0, gamma: float = 0.8,
                 max_flow: float = 400, **kwargs):
        num_recurrent_layers = int(math.log2(max(pyramid_ranges))) - 1
        super().__init__(output_stride=int(2 ** (num_recurrent_layers + 1)),
                         loss_fn=SequenceLoss(gamma, max_flow), **kwargs)
        self.pyramid_ranges = pyramid_ranges
        self.iters = iters
        self.input_pad_one_side = input_pad_one_side
        self.input_bgr_to_rgb = input_bgr_to_rgb
        self.corr_levels = corr_levels
        self.corr_range = corr_range

        if isinstance(enc_out_1x1_chs, str):
            enc_out_1x1_chs = (float(enc_out_1x1_chs)
                               if "." in enc_out_1x1_chs
                               else int(enc_out_1x1_chs))
        if isinstance(enc_out_1x1_chs, float):
            self.out_1x1_factor = enc_out_1x1_chs
            self.out_1x1_abs_chs = int(enc_out_1x1_chs * enc_hidden_chs[-1])
        else:
            self.out_1x1_factor = None
            self.out_1x1_abs_chs = enc_out_1x1_chs

        net_chs, inp_chs = dec_net_chs, dec_inp_chs
        if net_chs is None or inp_chs is None:
            base_chs = self.out_1x1_abs_chs
            if base_chs < 1:
                base_chs = enc_hidden_chs[-1]
            base_chs = base_chs // 3 * 2
            if net_chs is None and inp_chs is None:
                net_chs = inp_chs = base_chs // 2
            elif net_chs is None:
                net_chs = base_chs - inp_chs
            else:
                inp_chs = base_chs - net_chs
        self.net_chs_fixed = net_chs
        self.inp_chs_fixed = inp_chs

        self.pyramid_levels = [
            num_recurrent_layers + 1 - int(math.log2(v))
            for v in pyramid_ranges]

        enc_norm = make_norm(enc_norm_type, group_norm_num_groups)
        self.fnet = PKConvSLKEncoder(
            pyr_range=[min(pyramid_ranges), max(pyramid_ranges)],
            hidden_chs=enc_hidden_chs, out_1x1_abs_chs=self.out_1x1_abs_chs,
            out_1x1_factor=self.out_1x1_factor, stem_stride=enc_stem_stride,
            norm=enc_norm, mlp_ratio=enc_mlp_ratio, depth=enc_depth)
        self.update_block = UpdatePartialBlock(
            pyramid_ranges=pyramid_ranges, corr_levels=corr_levels,
            corr_range=corr_range, net_chs_fixed=net_chs,
            inp_chs_fixed=inp_chs, dec_motion_chs=dec_motion_chs,
            dec_gru_depth=dec_gru_depth, dec_gru_iters=dec_gru_iters,
            dec_gru_mlp_ratio=dec_gru_mlp_ratio,
            use_upsample_mask=use_upsample_mask,
            upmask_gradient_scale=upmask_gradient_scale)
        self.use_upsample_mask = use_upsample_mask
        self.upnet_gate_layer = UpNetPartial(
            net_chs_fixed=net_chs, norm=make_norm(enc_norm_type,
                                                  group_norm_num_groups))

    def _upsample_flow(self, out_flow, mask):
        f = min(self.pyramid_ranges)
        return convex_upsample(out_flow / f, mask, f)

    def forward(self, params, inputs: Dict[str, Any],
                training: bool = False) -> Dict[str, jnp.ndarray]:
        images, image_resizer = self.preprocess_images(
            inputs["images"], bgr_add=-0.5, bgr_mult=2.0,
            bgr_to_rgb=self.input_bgr_to_rgb, resize_mode="pad",
            pad_mode="replicate",
            pad_two_side=not self.input_pad_one_side)
        x1_raw = images[:, 0]
        x2_raw = images[:, 1]
        b, height_im, width_im, _ = x1_raw.shape

        x1_pyramid = self.fnet(params["fnet"], x1_raw)
        x2_pyramid = self.fnet(params["fnet"], x2_raw)

        # training alternates pyramid-range pairs per step when more than two
        # ranges are configured (rpknet.py:353-356); the published configs
        # use a single (32, 8) pair so the first pair is always used here.
        start_level, output_level = self.pyramid_levels[:2]
        pyr1 = x1_pyramid[start_level:output_level + 1]
        pyr2 = x2_pyramid[start_level:output_level + 1]
        num_levels = output_level - start_level + 1
        iters_per_level = int(math.ceil(self.iters / num_levels))

        h0, w0 = pyr1[0].shape[1], pyr1[0].shape[2]
        prev = inputs.get("prev_preds")
        flow_init = prev.get("flow_small") if prev is not None else None
        if flow_init is not None:
            if flow_init.shape[-1] != 2:
                flow_init = jnp.moveaxis(flow_init, -3, -1)
            flow = forward_interpolate(flow_init)
        else:
            flow = jnp.zeros((b, h0, w0, 2), x1_raw.dtype)

        flow_preds = []
        net = None
        for l, (x1f, x2f) in enumerate(zip(pyr1, pyr2)):
            # split features into matching / input / net context channels
            # (rpknet.py:388-399)
            xh = x1f.shape[-1]
            ch = xh // 3
            halfch = ch // 2
            x1, cn1 = x1f[..., :xh - ch], x1f[..., xh - ch:]
            x2, cn2 = x2f[..., :xh - ch], x2f[..., xh - ch:]
            i1, n1 = cn1[..., :ch - halfch], cn1[..., ch - halfch:]
            i2, n2 = cn2[..., :ch - halfch], cn2[..., ch - halfch:]
            inp = nn.relu(jnp.concatenate([i1, i2], axis=-1))
            net_tmp = jnp.concatenate([n1, n2], axis=-1)

            h, w = x1.shape[1], x1.shape[2]
            coords0 = coords_grid(b, h, w, dtype=x1.dtype)
            corr_fn = CorrBlock(x1, x2, num_levels=self.corr_levels,
                                radius=self.corr_range)

            if net is None:
                net = jnp.tanh(net_tmp)
            else:
                net = jnp.tanh(interpolate(net, (h, w), align_corners=True))
                net_skip = jnp.tanh(net_tmp)
                gate = jax.nn.sigmoid(self.upnet_gate_layer(
                    params["upnet_gate_layer"],
                    jnp.concatenate([net, net_skip], axis=-1)))
                net = gate * net + (1.0 - gate) * net_skip
            if l > 0:
                flow = rescale_flow(flow, w, h, to_local=False)
                flow = interpolate(flow, (h, w), align_corners=True)

            is_output_level = l == num_levels - 1

            def step(carry, _, corr_fn=corr_fn, coords0=coords0, inp=inp,
                     is_output_level=is_output_level):
                flow, net = carry
                flow = jax.lax.stop_gradient(flow)
                corr = corr_fn(coords0 + flow)
                delta, net, mask = self.update_block(
                    params["update_block"], net, inp, corr, flow,
                    get_mask=training and self.use_upsample_mask)
                flow = flow + delta
                y = None
                if training:
                    out_flow = rescale_flow(flow, width_im, height_im,
                                            to_local=False)
                    if is_output_level and mask is not None:
                        out_flow = self._upsample_flow(out_flow, mask)
                    y = interpolate(out_flow, (height_im, width_im),
                                    align_corners=True)
                return (flow, net), y

            (flow, net), ys = jax.lax.scan(
                step, (flow, net), None, length=iters_per_level)
            if training:
                flow_preds.extend(ys[i] for i in range(iters_per_level))

        if training:
            flow_preds = [self.postprocess_predictions(f, image_resizer,
                                                       is_flow=True)
                          for f in flow_preds]
            final = flow_preds[-1]
        else:
            out_flow = rescale_flow(flow, width_im, height_im,
                                    to_local=False)
            if self.use_upsample_mask:
                mask = self.update_block.upmask_gradient_scale * \
                    self.update_block.mask(
                        params["update_block"]["mask"], net)
                out_flow = self._upsample_flow(out_flow, mask)
            else:
                out_flow = interpolate(out_flow, (height_im, width_im),
                                       align_corners=True)
            final = self.postprocess_predictions(out_flow, image_resizer,
                                                 is_flow=True)

        # warm-start flow at the coarsest level (rpknet.py:449-455)
        small = rescale_flow(flow, w0, h0, to_local=False)
        small = interpolate(small, (h0, w0), align_corners=True)

        outputs = {"flows": self.nhwc_flow_to_output(final),
                   "flow_small": small}
        if training:
            outputs["flow_preds"] = jnp.stack(flow_preds)
        return outputs


@register_model
@trainable
@ptlflow_trained
class rpknet(RPKNet):
    pass
