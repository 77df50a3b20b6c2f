"""DICL — Displacement-Invariant Cost Learning
(reference: ptlflow/models/dicl/dicl.py:21-877, loss_functions.py:7-79).

A learned matching net scores every displacement hypothesis independently:
the (2r+1)^2 shifted feature concats are folded into the batch dimension and
run through one shared 2-D conv matching net — an embarrassingly parallel
batched-conv workload that maps directly onto the MXU (the reference offers
a CUDA sampler for the volume construction; here it is 49 static
pad-and-shift slices).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp

from ... import nn
from ...nn import Module
from ...ops.correlation import coords_grid
from ...ops.grid_sample import (bilinear_coverage, bilinear_sampler,
                                interpolate)
from ...utils.registry import register_model, trainable
from ..base.base_model import BaseModel


def lrelu(x):
    return nn.leaky_relu(x, 0.1)


class BasicConv(Module):
    """dicl.py:685-708."""

    def __init__(self, in_channels, out_channels, deconv=False, bn=True,
                 relu=True, **kwargs):
        super().__init__()
        self.use_relu = relu
        self.use_bn = bn
        if self.use_bn:
            self.bn = nn.BatchNorm2d(out_channels)
        if deconv:
            self.conv = nn.ConvTranspose2d(in_channels, out_channels,
                                           bias=False, **kwargs)
        else:
            self.conv = nn.Conv2d(in_channels, out_channels, bias=False,
                                  **kwargs)

    def __call__(self, params, x, **kw):
        x = self.conv(params["conv"], x)
        if self.use_bn:
            x = self.bn(params["bn"], x, **kw)
        if self.use_relu:
            x = nn.relu(x)
        return x


class Conv2x(Module):
    """dicl.py:711-760."""

    def __init__(self, in_channels, out_channels, deconv=False, concat=True,
                 bn=True, relu=True):
        super().__init__()
        self.concat = concat
        kernel = 4 if deconv else 3
        self.conv1 = BasicConv(in_channels, out_channels, deconv, bn=False,
                               relu=True, kernel_size=kernel, stride=2,
                               padding=1)
        self.conv2 = BasicConv(out_channels * (2 if concat else 1),
                               out_channels, False, bn, relu, kernel_size=3,
                               stride=1, padding=1)

    def __call__(self, params, x, rem, **kw):
        x = self.conv1(params["conv1"], x, **kw)
        if self.concat:
            x = jnp.concatenate([x, rem], axis=-1)
        else:
            x = x + rem
        return self.conv2(params["conv2"], x, **kw)


class FeatureGA(Module):
    """GANet-style double-U feature backbone (dicl.py:763-874)."""

    def __init__(self):
        super().__init__()
        self.conv_start = nn.Sequential(
            BasicConv(3, 32, kernel_size=3, padding=1),
            BasicConv(32, 32, kernel_size=3, stride=2, padding=1),
            BasicConv(32, 32, kernel_size=3, padding=1))
        self.conv1a = BasicConv(32, 48, kernel_size=3, stride=2, padding=1)
        self.conv2a = BasicConv(48, 64, kernel_size=3, stride=2, padding=1)
        self.conv3a = BasicConv(64, 96, kernel_size=3, stride=2, padding=1)
        self.conv4a = BasicConv(96, 128, kernel_size=3, stride=2, padding=1)
        self.conv5a = BasicConv(128, 160, kernel_size=3, stride=2, padding=1)
        self.conv6a = BasicConv(160, 192, kernel_size=3, stride=2, padding=1)
        self.deconv6a = Conv2x(192, 160, deconv=True)
        self.deconv5a = Conv2x(160, 128, deconv=True)
        self.deconv4a = Conv2x(128, 96, deconv=True)
        self.deconv3a = Conv2x(96, 64, deconv=True)
        self.deconv2a = Conv2x(64, 48, deconv=True)
        self.deconv1a = Conv2x(48, 32, deconv=True)
        self.conv1b = Conv2x(32, 48)
        self.conv2b = Conv2x(48, 64)
        self.conv3b = Conv2x(64, 96)
        self.conv4b = Conv2x(96, 128)
        self.conv5b = Conv2x(128, 160)
        self.conv6b = Conv2x(160, 192)
        self.deconv6b = Conv2x(192, 160, deconv=True)
        self.outconv_6 = BasicConv(160, 32, kernel_size=3, padding=1)
        self.deconv5b = Conv2x(160, 128, deconv=True)
        self.outconv_5 = BasicConv(128, 32, kernel_size=3, padding=1)
        self.deconv4b = Conv2x(128, 96, deconv=True)
        self.outconv_4 = BasicConv(96, 32, kernel_size=3, padding=1)
        self.deconv3b = Conv2x(96, 64, deconv=True)
        self.outconv_3 = BasicConv(64, 32, kernel_size=3, padding=1)
        self.deconv2b = Conv2x(64, 48, deconv=True)
        self.outconv_2 = BasicConv(48, 32, kernel_size=3, padding=1)

    def __call__(self, params, x, **kw):
        p = params
        x = self.conv_start(p["conv_start"], x, **kw)
        rem0 = x
        x = self.conv1a(p["conv1a"], x, **kw); rem1 = x  # noqa: E702
        x = self.conv2a(p["conv2a"], x, **kw); rem2 = x  # noqa: E702
        x = self.conv3a(p["conv3a"], x, **kw); rem3 = x  # noqa: E702
        x = self.conv4a(p["conv4a"], x, **kw); rem4 = x  # noqa: E702
        x = self.conv5a(p["conv5a"], x, **kw); rem5 = x  # noqa: E702
        x = self.conv6a(p["conv6a"], x, **kw); rem6 = x  # noqa: E702
        x = self.deconv6a(p["deconv6a"], x, rem5, **kw); rem5 = x  # noqa
        x = self.deconv5a(p["deconv5a"], x, rem4, **kw); rem4 = x  # noqa
        x = self.deconv4a(p["deconv4a"], x, rem3, **kw); rem3 = x  # noqa
        x = self.deconv3a(p["deconv3a"], x, rem2, **kw); rem2 = x  # noqa
        x = self.deconv2a(p["deconv2a"], x, rem1, **kw); rem1 = x  # noqa
        x = self.deconv1a(p["deconv1a"], x, rem0, **kw); rem0 = x  # noqa
        x = self.conv1b(p["conv1b"], x, rem1, **kw); rem1 = x  # noqa
        x = self.conv2b(p["conv2b"], x, rem2, **kw); rem2 = x  # noqa
        x = self.conv3b(p["conv3b"], x, rem3, **kw); rem3 = x  # noqa
        x = self.conv4b(p["conv4b"], x, rem4, **kw); rem4 = x  # noqa
        x = self.conv5b(p["conv5b"], x, rem5, **kw); rem5 = x  # noqa
        x = self.conv6b(p["conv6b"], x, rem6, **kw)
        x = self.deconv6b(p["deconv6b"], x, rem5, **kw)
        x6 = self.outconv_6(p["outconv_6"], x, **kw)
        x = self.deconv5b(p["deconv5b"], x, rem4, **kw)
        x5 = self.outconv_5(p["outconv_5"], x, **kw)
        x = self.deconv4b(p["deconv4b"], x, rem3, **kw)
        x4 = self.outconv_4(p["outconv_4"], x, **kw)
        x = self.deconv3b(p["deconv3b"], x, rem2, **kw)
        x3 = self.outconv_3(p["outconv_3"], x, **kw)
        x = self.deconv2b(p["deconv2b"], x, rem1, **kw)
        x2 = self.outconv_2(p["outconv_2"], x, **kw)
        return x2, x3, x4, x5, x6


class DICLMatch(Module):
    """Shared per-displacement matching net (dicl.py:21-39)."""

    def __init__(self):
        super().__init__()
        self.match = nn.Sequential(
            BasicConv(64, 96, kernel_size=3, padding=1, dilation=1),
            BasicConv(96, 128, kernel_size=3, stride=2, padding=1),
            BasicConv(128, 128, kernel_size=3, padding=1, dilation=1),
            BasicConv(128, 64, kernel_size=3, padding=1, dilation=1),
            BasicConv(64, 32, kernel_size=4, padding=1, stride=2,
                      deconv=True),
            nn.Conv2d(32, 1, kernel_size=3, stride=1, padding=1, bias=True))

    def __call__(self, params, x, **kw):
        return self.match(params["match"], x, **kw)


def flow_entropy(cost):
    """dicl.py:42-56; cost (B, U, V, H, W) -> (B, H, W, 1)."""
    b, u, v, h, w = cost.shape
    x = cost.reshape(b, u * v, h, w)
    x = jax.nn.softmax(x.astype(jnp.float32), axis=1)
    ent = -jnp.sum(x * jnp.log(jnp.clip(x, 1e-9, 1 - 1e-9)), axis=1)
    ent = ent / jnp.log(u * v)
    return ent[..., None].astype(cost.dtype)


def flow_regression(cost, max_u, max_v, by_max=True):
    """2-D soft argmax (dicl.py:59-100); cost (B, U, V, H, W) ->
    flow (B, H, W, 2) with (x, y) = (u, v) displacement order."""
    b, su, sv, h, w = cost.shape
    x = cost.reshape(b, su * sv, h, w).astype(jnp.float32)
    prob = jax.nn.softmax(x if by_max else -x, axis=1)
    disp_u = jnp.arange(-max_u, max_u + 1, dtype=jnp.float32)
    disp_v = jnp.arange(-max_v, max_v + 1, dtype=jnp.float32)
    du = jnp.tile(disp_u[:, None], (1, sv)).reshape(-1)
    dv = jnp.tile(disp_v[None, :], (su, 1)).reshape(-1)
    flow_u = jnp.einsum("bkhw,k->bhw", prob, du)
    flow_v = jnp.einsum("bkhw,k->bhw", prob, dv)
    return jnp.stack([flow_u, flow_v], axis=-1).astype(cost.dtype)


class DAP(Module):
    """Displacement-aware projection (dicl.py:103-129)."""

    def __init__(self, md=3, dap_by_temperature=False):
        super().__init__()
        self.dap_by_temperature = dap_by_temperature
        dim_c = (2 * md + 1) ** 2
        self.dim_c = dim_c
        out_c = 1 if dap_by_temperature else dim_c
        self.dap_layer = BasicConv(dim_c, out_c, bn=False, relu=False,
                                   kernel_size=1, padding=0, stride=1)

    def init(self, key):
        params = super().init(key)
        if not self.dap_by_temperature:
            # reference inits the projection to identity (dicl.py:309-330)
            params["dap_layer"]["conv"]["weight"] = jnp.eye(
                self.dim_c)[None, None]
        return params

    def __call__(self, params, cost, **kw):
        # cost: (B, U, V, H, W)
        b, u, v, h, w = cost.shape
        x = cost.reshape(b, u * v, h, w).transpose(0, 2, 3, 1)
        if self.dap_by_temperature:
            temp = self.dap_layer(params["dap_layer"], x) + 1e-6
            x = x * temp
        else:
            x = self.dap_layer(params["dap_layer"], x)
        return x.transpose(0, 3, 1, 2).reshape(b, u, v, h, w)


def dicl_warp(x, flow):
    """dicl.py:332-364 (mask threshold 0.9999)."""
    b, h, w, c = x.shape
    coords = coords_grid(b, h, w, dtype=flow.dtype) + flow
    out = bilinear_sampler(x, coords)
    mask = bilinear_coverage(coords, (h, w), dtype=x.dtype)
    return out * (mask >= 0.9999).astype(x.dtype)


class MultiScaleUP:
    """loss_functions.py:7-79 (scalar loss only)."""

    def __init__(self, loss_type="L1",
                 weight=(1.0, 0.75, 0.50, 0.25, 0.25)):
        self.loss_type = loss_type
        self.weight = weight

    def __call__(self, outputs, inputs):
        target = jnp.moveaxis(inputs["flows"][:, 0], -3, -1)
        h, w = target.shape[1], target.shape[2]
        total = 0.0
        preds = outputs["flow_preds"]
        for i, cur in enumerate(preds):
            real = interpolate(cur, (h, w), align_corners=True)
            scale = jnp.asarray([w / cur.shape[2], h / cur.shape[1]],
                                real.dtype)
            real = real * scale
            if self.loss_type == "L2":
                lv = jnp.linalg.norm(real - target, axis=-1)
            elif self.loss_type == "robust":
                lv = (jnp.sum(jnp.abs(real - target), axis=-1) + 1e-8) ** 0.4
            else:
                lv = jnp.sum(jnp.abs(real - target), axis=-1)
            total += jnp.mean(lv) * self.weight[i]
        return total / len(preds)


class DICL(BaseModel):
    pretrained_checkpoints = {
        "chairs": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/dicl-chairs-fdc24e2f.ckpt",
        "kitti": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/dicl-kitti-4813ccab.ckpt",
        "sintel": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/dicl-sintel-fa9fc259.ckpt",
        "things": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/dicl-things-20bc573d.ckpt",
    }

    def __init__(self, ctf_context: bool = True,
                 dap_by_temperature: bool = False, dap_layer: bool = True,
                 flow_reg_by_max: bool = True,
                 remove_warp_hole: bool = True,
                 scale_context: Sequence[float] = (0.03125, 0.0625, 0.125,
                                                   0.25, 0.5),
                 search_range: Sequence[int] = (3, 3, 3, 3, 3),
                 loss_type: str = "L1",
                 loss_weight: Sequence[float] = (1.0, 0.75, 0.50, 0.25,
                                                 0.25),
                 **kwargs):
        super().__init__(loss_fn=MultiScaleUP(loss_type, loss_weight),
                         output_stride=128, **kwargs)
        self.ctf_context = ctf_context
        self.flow_reg_by_max = flow_reg_by_max
        self.remove_warp_hole = remove_warp_hole
        self.scale_context = scale_context
        self.search_range = search_range
        self.use_dap = dap_layer

        self.feature = FeatureGA()
        if dap_layer:
            for lvl in range(2, 7):
                setattr(self, f"dap_layer{lvl}",
                        DAP(md=search_range[lvl - 2],
                            dap_by_temperature=dap_by_temperature))
        for lvl in range(2, 7):
            setattr(self, f"matching{lvl}", DICLMatch())

        def ctx_net(dims_dils):
            layers = [BasicConv(i, o, kernel_size=3, padding=d, dilation=d)
                      for i, o, d in dims_dils]
            layers.append(nn.Conv2d(32, 2, kernel_size=3, stride=1,
                                    padding=1, bias=True))
            return nn.Sequential(*layers)

        if ctf_context:
            full = [(38, 64, 1), (64, 128, 2), (128, 128, 4), (128, 96, 8),
                    (96, 64, 16), (64, 32, 1)]
            self.context_net2 = ctx_net(full)
            self.context_net3 = ctx_net(full)
            self.context_net4 = ctx_net([(38, 64, 1), (64, 128, 2),
                                         (128, 128, 4), (128, 64, 8),
                                         (64, 32, 1)])
            self.context_net5 = ctx_net([(38, 64, 1), (64, 128, 2),
                                         (128, 64, 4), (64, 32, 1)])
            self.context_net6 = ctx_net([(38, 64, 1), (64, 64, 2),
                                         (64, 32, 1)])

    def compute_cost(self, params, x, y, matchnet, max_u, max_v,
                     training=False):
        """dicl.py:553-620 — 49 static shifted concats through one shared
        matching net, displacements folded into batch."""
        b, h, w, c = x.shape
        su, sv = 2 * max_u + 1, 2 * max_v + 1
        slices = []
        for i in range(su):
            ind = i - max_u  # x displacement
            for j in range(sv):
                indd = j - max_v  # y displacement
                # valid output region; y sourced at (+indd, +ind), x kept in
                # place; both zero outside (dicl.py:577-602); clamped so a
                # displacement larger than the grid gives an empty region
                r0 = max(0, -indd)
                r1 = max(r0, min(h, h - indd))
                c0 = max(0, -ind)
                c1 = max(c0, min(w, w - ind))
                xs = jnp.zeros_like(x)
                xs = xs.at[:, r0:r1, c0:c1].set(x[:, r0:r1, c0:c1])
                ys = jnp.zeros_like(y)
                ys = ys.at[:, r0:r1, c0:c1].set(
                    y[:, r0 + indd:r1 + indd, c0 + ind:c1 + ind])
                slices.append(jnp.concatenate([xs, ys], axis=-1))
        cost = jnp.stack(slices, axis=1)  # (B, U*V, H, W, 2C)
        if self.remove_warp_hole:
            valid = (jnp.sum(cost[..., c:], axis=-1, keepdims=True) != 0)
            cost = cost * valid.astype(cost.dtype)
        cost = cost.reshape(b * su * sv, h, w, 2 * c)
        cost = matchnet(params, cost, training=training)
        return cost.reshape(b, su, sv, h, w)

    def _level(self, params, lvl, x_feat, y_feat, img_small, up_flow,
               training):
        sr = self.search_range[lvl - 2]
        if up_flow is not None:
            y_feat = dicl_warp(y_feat, up_flow)
        cost = self.compute_cost(params[f"matching{lvl}"], x_feat, y_feat,
                                 getattr(self, f"matching{lvl}"), sr, sr,
                                 training)
        if self.use_dap:
            cost = getattr(self, f"dap_layer{lvl}")(
                params[f"dap_layer{lvl}"], cost)
        flow = flow_regression(cost, sr, sr, self.flow_reg_by_max)
        if up_flow is not None:
            flow = flow + up_flow
        if self.ctf_context:
            entro = flow_entropy(cost)
            feat = jnp.concatenate(
                [jax.lax.stop_gradient(flow),
                 jax.lax.stop_gradient(entro), x_feat, img_small], axis=-1)
            ctx = getattr(self, f"context_net{lvl}")(
                params[f"context_net{lvl}"], feat, training=training)
            flow = flow + ctx * self.scale_context[6 - lvl]
        return flow

    def forward(self, params, inputs: Dict[str, Any],
                training: bool = False) -> Dict[str, jnp.ndarray]:
        images, image_resizer = self.preprocess_images(
            inputs["images"], bgr_add=-0.5, bgr_mult=2.0, bgr_to_rgb=True,
            resize_mode="pad", pad_mode="replicate", pad_two_side=False)
        x_img = images[:, 0]
        y_img = images[:, 1]
        h, w = x_img.shape[1], x_img.shape[2]

        x2, x3, x4, x5, x6 = self.feature(params["feature"], x_img,
                                          training=training)
        y2, y3, y4, y5, y6 = self.feature(params["feature"], y_img,
                                          training=training)

        flows = {}
        up_flow = None
        feats = {2: (x2, y2), 3: (x3, y3), 4: (x4, y4), 5: (x5, y5),
                 6: (x6, y6)}
        for lvl in (6, 5, 4, 3, 2):
            stride = 2 ** lvl
            img_small = interpolate(x_img, (h // stride, w // stride),
                                    align_corners=True)
            flow = self._level(params, lvl, feats[lvl][0], feats[lvl][1],
                               img_small, up_flow, training)
            flows[lvl] = flow
            if lvl > 2:
                nh, nw = feats[lvl - 1][0].shape[1:3]
                up_flow = 2.0 * interpolate(flow, (nh, nw),
                                            align_corners=True)
                up_flow = jax.lax.stop_gradient(up_flow)

        flow2 = flows[2]
        out = interpolate(flow2, (h, w), align_corners=True)
        scale = jnp.asarray([w / flow2.shape[2], h / flow2.shape[1]],
                            out.dtype)
        out = out * scale
        out = self.postprocess_predictions(out, image_resizer, is_flow=True)
        outputs = {"flows": self.nhwc_flow_to_output(out)}
        if training:
            outputs["flow_preds"] = [flows[i] for i in (2, 3, 4, 5, 6)]
        return outputs


@register_model
@trainable
class dicl(DICL):
    pass
