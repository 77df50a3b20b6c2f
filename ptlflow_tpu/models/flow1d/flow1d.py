"""Flow1D: decomposed 1-D correlation volumes with cross attention.

Parity with /root/reference/ptlflow/models/flow1d/{flow1d.py, correlation.py,
attention.py, extractor.py, update.py, position.py}: x/y cross-attended
features, per-axis 1-D correlation rows/columns, 1-D bilinear lookups in a
(2r+1) window per axis, RAFT-style GRU updates.

TPU-first: the 1-D bilinear lookups use the same one-hot-matmul trick as the
2-D pyramid lookup (ops/correlation.py) — a single batched matvec per axis
on the MXU instead of grid_sample gathers.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ... import nn
from ...ops.correlation import _bilinear_onehot, coords_grid
from ...ops.upsample import convex_upsample
from ...ops.warp import forward_interpolate
from ...utils.registry import register_model, trainable
from ..base import BaseModel
from ..gmflow.transformer import position_embedding_sine
from ..raft.raft import SequenceLoss
from ..raft.update import FlowHead, SepConvGRU


class ResidualBlock(nn.Module):
    """flow1d/extractor.py:5-64 (dilation-capable)."""

    def __init__(self, in_planes, planes, norm_fn="group", stride=1,
                 dilation=1):
        super().__init__()
        self.conv1 = nn.Conv2d(in_planes, planes, 3, padding=dilation,
                               stride=stride, dilation=dilation)
        self.conv2 = nn.Conv2d(planes, planes, 3, padding=dilation,
                               dilation=dilation)

        def make_norm():
            if norm_fn == "group":
                return nn.GroupNorm(planes // 8, planes)
            if norm_fn == "batch":
                return nn.BatchNorm2d(planes)
            if norm_fn == "instance":
                return nn.InstanceNorm2d(planes)
            return nn.Sequential()

        self.norm1 = make_norm()
        self.norm2 = make_norm()
        if stride == 1:
            self.downsample = None
        else:
            self.norm3 = make_norm()
            self.downsample = nn.Sequential(
                nn.Conv2d(in_planes, planes, 1, stride=stride), make_norm())

    def __call__(self, params, x, **kw):
        y = nn.relu(self.norm1(params.get("norm1", {}),
                               self.conv1(params["conv1"], x), **kw))
        y = nn.relu(self.norm2(params.get("norm2", {}),
                               self.conv2(params["conv2"], y), **kw))
        if self.downsample is not None:
            x = self.downsample(params["downsample"], x, **kw)
        return nn.relu(x + y)


class BasicEncoder(nn.Module):
    """flow1d/extractor.py:66-149 (dims 64/96/128)."""

    def __init__(self, output_dim=128, norm_fn="batch", dropout=0.0):
        super().__init__()
        dims = [64, 96, 128]
        if norm_fn == "group":
            self.norm1 = nn.GroupNorm(8, dims[0])
        elif norm_fn == "batch":
            self.norm1 = nn.BatchNorm2d(dims[0])
        elif norm_fn == "instance":
            self.norm1 = nn.InstanceNorm2d(dims[0])
        else:
            self.norm1 = nn.Sequential()
        self.conv1 = nn.Conv2d(3, dims[0], 7, stride=2, padding=3)
        self.layer1 = nn.Sequential(ResidualBlock(dims[0], dims[0], norm_fn, 1),
                                    ResidualBlock(dims[0], dims[0], norm_fn, 1))
        self.layer2 = nn.Sequential(ResidualBlock(dims[0], dims[1], norm_fn, 2),
                                    ResidualBlock(dims[1], dims[1], norm_fn, 1))
        self.layer3 = nn.Sequential(ResidualBlock(dims[1], dims[2], norm_fn, 2),
                                    ResidualBlock(dims[2], dims[2], norm_fn, 1))
        self.conv2 = nn.Conv2d(dims[2], output_dim, 1)

    def __call__(self, params, x, **kw):
        x = nn.relu(self.norm1(params.get("norm1", {}),
                               self.conv1(params["conv1"], x), **kw))
        x = self.layer1(params["layer1"], x, **kw)
        x = self.layer2(params["layer2"], x, **kw)
        x = self.layer3(params["layer3"], x, **kw)
        return self.conv2(params["conv2"], x)


class Attention1D(nn.Module):
    """Cross attention along x or y (attention.py:6-78)."""

    def __init__(self, in_channels: int, y_attention: bool = False,
                 double_cross_attn: bool = False):
        super().__init__()
        self.y_attention = y_attention
        self.double_cross_attn = double_cross_attn
        if double_cross_attn:
            self.self_attn = Attention1D(in_channels,
                                         y_attention=not y_attention)
        self.query_conv = nn.Conv2d(in_channels, in_channels, 1)
        self.key_conv = nn.Conv2d(in_channels, in_channels, 1)

    def __call__(self, params, feature1, feature2, position=None, **kw):
        b, h, w, c = feature1.shape
        if self.double_cross_attn:
            feature1 = self.self_attn(params["self_attn"], feature1,
                                      feature1, position)[0]
        query = feature1 + position if position is not None else feature1
        query = self.query_conv(params["query_conv"], query)
        key = feature2 + position if position is not None else feature2
        key = self.key_conv(params["key_conv"], key)
        value = feature2
        scale = c ** 0.5
        if self.y_attention:
            scores = jnp.einsum("bhwc,bywc->bwhy", query, key,
                                preferred_element_type=jnp.float32) / scale
            attn = jax.nn.softmax(scores, axis=-1).astype(value.dtype)
            out = jnp.einsum("bwhy,bywc->bhwc", attn, value,
                             preferred_element_type=jnp.float32)
        else:
            scores = jnp.einsum("bhwc,bhxc->bhwx", query, key,
                                preferred_element_type=jnp.float32) / scale
            attn = jax.nn.softmax(scores, axis=-1).astype(value.dtype)
            out = jnp.einsum("bhwx,bhxc->bhwc", attn, value,
                             preferred_element_type=jnp.float32)
        return out.astype(feature1.dtype), attn


def corr_1d_x(feature1, feature2):
    """(B,H,W,C) x2 -> rows (B, H, W1, W2) / sqrt(C)."""
    c = feature1.shape[-1]
    return jnp.einsum("bhwc,bhxc->bhwx", feature1, feature2,
                      preferred_element_type=jnp.float32) / (c ** 0.5)


def corr_1d_y(feature1, feature2):
    """(B,H,W,C) x2 -> columns (B, H1, W, H2) / sqrt(C)."""
    c = feature1.shape[-1]
    return jnp.einsum("bhwc,bywc->bhwy", feature1, feature2,
                      preferred_element_type=jnp.float32) / (c ** 0.5)


def lookup_1d(rows: jnp.ndarray, coords: jnp.ndarray, radius: int):
    """1-D bilinear window lookup via one-hot matvec.

    rows: (B, H, W, L) table per pixel; coords: (B, H, W) positions along L.
    Returns (B, H, W, 2r+1).
    """
    b, h, w, length = rows.shape
    q = coords.reshape(b * h * w).astype(jnp.float32)
    p0 = jnp.floor(q)
    R = _bilinear_onehot(p0, q - p0, radius, length, rows.dtype)  # (Q, n, L)
    out = jnp.einsum("qnl,ql->qn", R, rows.reshape(b * h * w, length),
                     preferred_element_type=jnp.float32)
    return out.reshape(b, h, w, 2 * radius + 1).astype(rows.dtype)


class BasicMotionEncoder(nn.Module):
    def __init__(self, corr_channels=324):
        super().__init__()
        self.convc1 = nn.Conv2d(corr_channels, 256, 1, padding=0)
        self.convc2 = nn.Conv2d(256, 192, 3, padding=1)
        self.convf1 = nn.Conv2d(2, 128, 7, padding=3)
        self.convf2 = nn.Conv2d(128, 64, 3, padding=1)
        self.conv = nn.Conv2d(64 + 192, 128 - 2, 3, padding=1)

    def __call__(self, params, flow, corr, **kw):
        cor = nn.relu(self.convc1(params["convc1"], corr))
        cor = nn.relu(self.convc2(params["convc2"], cor))
        flo = nn.relu(self.convf1(params["convf1"], flow))
        flo = nn.relu(self.convf2(params["convf2"], flo))
        out = nn.relu(self.conv(params["conv"],
                                jnp.concatenate([cor, flo], axis=-1)))
        return jnp.concatenate([out, flow], axis=-1)


class BasicUpdateBlock(nn.Module):
    def __init__(self, corr_channels=324, hidden_dim=128, context_dim=128,
                 downsample_factor=8):
        super().__init__()
        self.encoder = BasicMotionEncoder(corr_channels=corr_channels)
        self.gru = SepConvGRU(hidden_dim=hidden_dim,
                              input_dim=context_dim + hidden_dim)
        self.flow_head = FlowHead(hidden_dim, hidden_dim=256)
        self.mask = nn.Sequential(
            nn.Conv2d(hidden_dim, 256, 3, padding=1), nn.relu,
            nn.Conv2d(256, downsample_factor ** 2 * 9, 1, padding=0))

    def __call__(self, params, net, inp, corr, flow, **kw):
        motion_features = self.encoder(params["encoder"], flow, corr)
        inp = jnp.concatenate([inp, motion_features], axis=-1)
        net = self.gru(params["gru"], net, inp)
        delta_flow = self.flow_head(params["flow_head"], net)
        mask = 0.25 * self.mask(params["mask"], net)
        return net, mask, delta_flow


class Flow1D(BaseModel):
    pretrained_checkpoints = {
        "chairs": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/flow1d-chairs-75cd85a1.ckpt",
        "things": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/flow1d-things-bcd92815.ckpt",
        "sintel": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/flow1d-sintel-28a093d3.ckpt",
        "kitti": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/flow1d-kitti-803a0181.ckpt",
        "highres": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/flow1d-highres-7ab476dc.ckpt",
    }

    def __init__(self, downsample_factor: int = 8,
                 feature_channels: int = 256, hidden_dim: int = 128,
                 context_dim: int = 128, corr_radius: int = 32,
                 iters: int = 32, gamma: float = 0.8, max_flow: float = 400,
                 **kwargs):
        super().__init__(output_stride=8,
                         loss_fn=SequenceLoss(gamma, max_flow), **kwargs)
        self.downsample_factor = downsample_factor
        self.feature_channels = feature_channels
        self.hidden_dim = hidden_dim
        self.context_dim = context_dim
        self.corr_radius = corr_radius
        self.iters = iters

        self.fnet = BasicEncoder(output_dim=feature_channels,
                                 norm_fn="instance")
        self.cnet = BasicEncoder(output_dim=hidden_dim + context_dim,
                                 norm_fn="batch")
        self.attn_x = Attention1D(feature_channels, y_attention=False,
                                  double_cross_attn=True)
        self.attn_y = Attention1D(feature_channels, y_attention=True,
                                  double_cross_attn=True)
        corr_channels = (2 * corr_radius + 1) * 2
        self.update_block = BasicUpdateBlock(
            corr_channels=corr_channels, hidden_dim=hidden_dim,
            context_dim=context_dim, downsample_factor=downsample_factor)

    def forward(self, params, inputs: Dict[str, Any],
                training: bool = False) -> Dict[str, jnp.ndarray]:
        images, image_resizer = self.preprocess_images(
            inputs["images"], bgr_add=-0.5, bgr_mult=2.0, bgr_to_rgb=True,
            resize_mode="pad", pad_mode="replicate", pad_two_side=True)
        image1 = images[:, 0]
        image2 = images[:, 1]
        kw = dict(training=training)

        # two per-frame fnet passes, NOT one batched concat pass: the
        # batched variant was measured slower on v5e (the concat/split HBM
        # relayout costs more than the second launch; see raft.py)
        feature1 = self.fnet(params["fnet"], image1, **kw)
        feature2 = self.fnet(params["fnet"], image2, **kw)
        b, h, w, c = feature1.shape
        position = position_embedding_sine(h, w, self.feature_channels // 2,
                                           dtype=feature1.dtype)

        feature2_x, _ = self.attn_x(params["attn_x"], feature1, feature2,
                                    position)
        rows_y = corr_1d_y(feature1, feature2_x).astype(feature1.dtype)
        feature2_y, _ = self.attn_y(params["attn_y"], feature1, feature2,
                                    position)
        rows_x = corr_1d_x(feature1, feature2_y).astype(feature1.dtype)

        cnet = self.cnet(params["cnet"], image1, **kw)
        net = jnp.tanh(cnet[..., :self.hidden_dim])
        inp = nn.relu(cnet[..., self.hidden_dim:])

        coords0 = coords_grid(b, h, w, dtype=feature1.dtype)
        coords1 = coords0
        prev = inputs.get("prev_preds")
        if prev is not None and prev.get("flow_small") is not None:
            fs = prev["flow_small"]
            if fs.ndim == 4 and fs.shape[-1] != 2:
                fs = jnp.moveaxis(fs, -3, -1)
            coords1 = coords1 + forward_interpolate(fs)

        up_params = params["update_block"]
        r = self.corr_radius

        def step(carry, _):
            net, coords1, last_mask = carry
            coords1 = jax.lax.stop_gradient(coords1)
            corr_x = lookup_1d(rows_x, coords1[..., 0], r)
            corr_y = lookup_1d(rows_y, coords1[..., 1], r)
            corr = jnp.concatenate([corr_x, corr_y], axis=-1)
            flow = coords1 - coords0
            net, up_mask, delta_flow = self.update_block(
                up_params, net, inp, corr, flow)
            coords1 = coords1 + delta_flow
            ys = (coords1 - coords0, up_mask) if training else None
            return (net, coords1, up_mask), ys

        df = self.downsample_factor
        mask0 = jnp.zeros((b, h, w, df * df * 9), feature1.dtype)
        (net, coords1, last_mask), ys = jax.lax.scan(
            step, (net, coords1, mask0), None, length=self.iters)

        if training:
            flows_lr, masks = ys
            it, bb = flows_lr.shape[0], flows_lr.shape[1]
            flow_ups = convex_upsample(
                flows_lr.reshape(it * bb, h, w, 2),
                masks.reshape(it * bb, h, w, masks.shape[-1]), factor=df)
            flow_ups = flow_ups.reshape(it, bb, df * h, df * w, 2)
            flow_ups = self.postprocess_predictions(flow_ups, image_resizer,
                                                    is_flow=True)
            return {"flows": self.nhwc_flow_to_output(flow_ups[-1]),
                    "flow_preds": flow_ups}
        flow_up = convex_upsample(coords1 - coords0, last_mask, factor=df)
        flow_up = self.postprocess_predictions(flow_up, image_resizer,
                                               is_flow=True)
        return {"flows": self.nhwc_flow_to_output(flow_up),
                "flow_small": jnp.moveaxis(coords1 - coords0, -1, -3)}


@register_model
@trainable
class flow1d(Flow1D):
    pass
