"""CCMR / CCMR+ — coarse-to-fine RAFT with XCiT cross-covariance global
context grouping.

Behavioral parity with /root/reference/ptlflow/models/ccmr/:
- ccmr.py:41-275 (3- or 4-scale pyramid from 1/16, shared update block,
  the "MS-RAFT flow-upsampling bug fixed" coords promotion at ccmr.py:
  195-202: the FLOW is convex-upsampled and re-anchored on the new grid);
- extractor.py:6-275 (resconv encoders with 1x1 after-convs; same
  shared-norm3 / drop-residual quirks as MS-RAFT+);
- update.py:110-168 (SepConvGRU update with per-scale XCA_separate
  aggregators);
- xcit.py:58-427 (Fourier positional encoding, cross-covariance
  attention over CHANNELS with L2-normalized q/k and learned temperature,
  LPI depthwise mixing, LayerScale gammas).

TPU-first: XCA attends over channels (d_h x d_h matmuls — tiny and MXU
friendly at any resolution); per-level iterations are ``lax.scan``; the
pyramid loop is static Python.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp

from ... import nn
from ...nn import Module
from ...ops.correlation import AltCorrBlock, CorrBlock, coords_grid
from ...ops.grid_sample import interpolate
from ...ops.upsample import convex_upsample, upflow
from ...utils.registry import register_model, ptlflow_trained
from ..base import BaseModel
from ..ms_raft_plus.ms_raft_plus import (MSResidualBlock, _downflow,
                                         _ms_layer)
from ..raft.extractor import make_norm
from ..raft.raft import SequenceLoss
from ..raft.update import BasicMotionEncoder, FlowHead, SepConvGRU


def fourier_pos_encoding(b, h, w, hidden_dim=32, temperature=10000,
                         dtype=jnp.float32):
    """xcit.py:58-95 (PositionalEncodingFourier before the projection):
    returns (1, H, W, 2*hidden_dim) [pos_y, pos_x] sin/cos features."""
    scale = 2 * math.pi
    eps = 1e-6
    y = jnp.arange(1, h + 1, dtype=dtype)
    x = jnp.arange(1, w + 1, dtype=dtype)
    y = y / (y[-1] + eps) * scale
    x = x / (x[-1] + eps) * scale
    dim_t = jnp.arange(hidden_dim, dtype=dtype)
    dim_t = temperature ** (2 * jnp.floor(dim_t / 2) / hidden_dim)
    pos_x = x[:, None] / dim_t  # (W, hidden)
    pos_y = y[:, None] / dim_t  # (H, hidden)

    def interleave(p):
        return jnp.stack([jnp.sin(p[:, 0::2]), jnp.cos(p[:, 1::2])],
                         axis=-1).reshape(p.shape[0], -1)

    pos_x = interleave(pos_x)
    pos_y = interleave(pos_y)
    pos = jnp.concatenate([
        jnp.broadcast_to(pos_y[:, None, :], (h, w, hidden_dim)),
        jnp.broadcast_to(pos_x[None, :, :], (h, w, hidden_dim)),
    ], axis=-1)
    return jnp.broadcast_to(pos[None], (b, h, w, 2 * hidden_dim))


class PositionalEncodingFourier(Module):
    def __init__(self, hidden_dim=32, dim=128):
        super().__init__()
        self.hidden_dim = hidden_dim
        self.token_projection = nn.Conv2d(hidden_dim * 2, dim, 1)

    def __call__(self, params, b, h, w, dtype, **kw):
        pos = fourier_pos_encoding(b, h, w, self.hidden_dim, dtype=dtype)
        return self.token_projection(params["token_projection"], pos)


class LPI(Module):
    """xcit.py:98-139 — two depthwise 3x3 convs with GELU + GroupNorm."""

    def __init__(self, dim):
        super().__init__()
        self.conv1 = nn.Conv2d(dim, dim, 3, padding=1, groups=dim)
        self.bn = nn.GroupNorm(num_groups=8, num_channels=dim)
        self.conv2 = nn.Conv2d(dim, dim, 3, padding=1, groups=dim)

    def __call__(self, params, x, **kw):
        x = nn.gelu(self.conv1(params["conv1"], x))
        x = self.bn(params.get("bn", {}), x)
        return self.conv2(params["conv2"], x)


def _xca_attend(q, k, v, temperature, num_heads):
    """Cross-covariance attention core: channels attend over channels
    (xcit.py:167-186). q/k/v: (B, HW, C) -> (B, HW, C)."""
    b, n, c = q.shape
    hd = c // num_heads

    def split(t):  # (B, heads, hd, N)
        return t.reshape(b, n, num_heads, hd).transpose(0, 2, 3, 1)

    q, k, v = split(q), split(k), split(v)
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    k = k / jnp.maximum(jnp.linalg.norm(k, axis=-1, keepdims=True), 1e-12)
    attn = jnp.einsum("bhcn,bhdn->bhcd", q, k,
                      preferred_element_type=jnp.float32)
    attn = attn * temperature[None].astype(attn.dtype)
    attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhcd,bhdn->bhcn", attn, v)
    return out.transpose(0, 3, 1, 2).reshape(b, n, c)


class XCA(Module):
    def __init__(self, dim, num_heads=8, qkv_bias=True):
        super().__init__()
        self.num_heads = num_heads
        self.qkv = nn.Linear(dim, dim * 3, bias=qkv_bias)
        self.proj = nn.Linear(dim, dim)

    def init(self, key):
        p = super().init(key)
        p["temperature"] = jnp.ones((self.num_heads, 1, 1), jnp.float32)
        return p

    def _torch_leaves(self):
        return {"temperature": lambda t: t}

    def __call__(self, params, x, **kw):
        qkv = self.qkv(params["qkv"], x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        out = _xca_attend(q, k, v, params["temperature"], self.num_heads)
        return self.proj(params["proj"], out)


class XCASeparate(Module):
    """xcit.py:193-235 — cross variant: q/k from context, v from motion."""

    def __init__(self, dim, num_heads=8, qkv_bias=True):
        super().__init__()
        self.num_heads = num_heads
        self.to_qk = nn.Linear(dim, dim * 2, bias=qkv_bias)
        self.to_v = nn.Linear(dim, dim, bias=qkv_bias)
        self.proj = nn.Linear(dim, dim)

    def init(self, key):
        p = super().init(key)
        p["temperature"] = jnp.ones((self.num_heads, 1, 1), jnp.float32)
        return p

    def _torch_leaves(self):
        return {"temperature": lambda t: t}

    def __call__(self, params, x_qk, x_v, **kw):
        qk = self.to_qk(params["to_qk"], x_qk)
        q, k = jnp.split(qk, 2, axis=-1)
        v = self.to_v(params["to_v"], x_v)
        out = _xca_attend(q, k, v, params["temperature"], self.num_heads)
        return self.proj(params["proj"], out)


class XCAMlp(Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.fc2 = nn.Linear(hidden, dim)

    def __call__(self, params, x, **kw):
        return self.fc2(params["fc2"], nn.gelu(self.fc1(params["fc1"], x)))


class XCABlock(Module):
    """xcit.py:242-300 (eta=1.0 LayerScale; norm1 applied to BOTH inputs
    in the separate variant)."""

    def __init__(self, dim, num_heads=8, mlp_ratio=1, separate=False):
        super().__init__()
        self.dim = dim
        self.separate = separate
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        if separate:
            self.attn = XCASeparate(dim, num_heads)
        else:
            self.attn = XCA(dim, num_heads)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = XCAMlp(dim, int(dim * mlp_ratio))
        self.norm3 = nn.LayerNorm(dim, eps=1e-6)
        self.local_mp = LPI(dim)

    def init(self, key):
        p = super().init(key)
        for g in ("gamma1", "gamma2", "gamma3"):
            p[g] = jnp.ones((self.dim,), jnp.float32)
        return p

    def _torch_leaves(self):
        return {g: (lambda t: t) for g in ("gamma1", "gamma2", "gamma3")}

    def __call__(self, params, x, h, w, x_v=None, **kw):
        b, n, c = x.shape
        if self.separate:
            a = self.attn(params["attn"], self.norm1(params["norm1"], x),
                          self.norm1(params["norm1"], x_v))
        else:
            a = self.attn(params["attn"], self.norm1(params["norm1"], x))
        x = x + params["gamma1"].astype(x.dtype) * a
        lp = self.local_mp(params["local_mp"],
                           self.norm3(params["norm3"], x).reshape(b, h, w, c)
                           ).reshape(b, n, c)
        x = x + params["gamma3"].astype(x.dtype) * lp
        m = self.mlp(params["mlp"], self.norm2(params["norm2"], x))
        return x + params["gamma2"].astype(x.dtype) * m


class XCiT(Module):
    """xcit.py:304-427 — depth-1 stack with Fourier positions."""

    def __init__(self, embed_dim=128, depth=1, num_heads=8, mlp_ratio=1,
                 separate=False):
        super().__init__()
        self.separate = separate
        if separate:
            depth = 1
        self.blocks = nn.ModuleList([
            XCABlock(embed_dim, num_heads, mlp_ratio, separate=separate)
            for _ in range(depth)])
        self.pos_embeder = PositionalEncodingFourier(dim=embed_dim)

    def __call__(self, params, x, x_v=None, **kw):
        b, h, w, c = x.shape
        pos = self.pos_embeder(params["pos_embeder"], b, h, w, x.dtype)
        tokens = (x + pos).reshape(b, h * w, c)
        tokens_v = None if x_v is None else x_v.reshape(b, h * w, c)
        for i, blk in enumerate(self.blocks):
            tokens = blk(params["blocks"][str(i)], tokens, h, w,
                         x_v=tokens_v)
        return tokens.reshape(b, h, w, c)


class CCMREncoder(Module):
    """extractor.py:62-172 (BasicEncoder_resconv) and 175-275
    (Basic_Context_Encoder_resconv via context_mode)."""

    def __init__(self, output_dim=256, norm_fn="group", num_scales=3,
                 context_mode=False):
        super().__init__()
        self.num_scales = num_scales
        self.context_mode = context_mode
        self.norm1 = make_norm(norm_fn, 64)
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3)
        self.layer1 = _ms_layer(64, 64, norm_fn, 1)
        self.layer2 = _ms_layer(64, 96, norm_fn, 2)
        self.layer3 = _ms_layer(96, 128, norm_fn, 2)
        self.layer4 = _ms_layer(128, 160, norm_fn, 2)
        if context_mode:
            self.conv2 = nn.Conv2d(160, output_dim, 1)
            self.up_layer2 = _ms_layer(output_dim + 128, 128, norm_fn, 1)
            self.after_up_layer2_conv = nn.Conv2d(128, output_dim, 1)
            self.up_layer1 = _ms_layer(output_dim + 96, 96, norm_fn, 1)
            self.after_up_layer1_conv = nn.Conv2d(96, output_dim, 1)
            if num_scales == 4:
                self.up_layer0 = _ms_layer(output_dim + 64, 64, norm_fn, 1)
                self.after_up_layer0_conv = nn.Conv2d(64, output_dim, 1)
        else:
            self.conv2 = nn.Conv2d(160, 160, 1)
            self.up_layer2 = _ms_layer(160 + 128, 128, norm_fn, 1)
            self.after_up_layer2_conv = nn.Conv2d(128, 128, 1)
            self.up_layer1 = _ms_layer(128 + 96, 96, norm_fn, 1)
            self.after_up_layer1_conv = nn.Conv2d(96, 96, 1)
            if num_scales == 4:
                self.up_layer0 = _ms_layer(96 + 64, 64, norm_fn, 1)
                self.after_up_layer0_conv = nn.Conv2d(64, 64, 1)

    def __call__(self, params, x, **kw):
        x = nn.relu(self.norm1(params.get("norm1", {}),
                               self.conv1(params["conv1"], x), **kw))
        e1 = self.layer1(params["layer1"], x, **kw)
        e2 = self.layer2(params["layer2"], e1, **kw)
        e3 = self.layer3(params["layer3"], e2, **kw)
        e4 = self.layer4(params["layer4"], e3, **kw)
        e4 = self.conv2(params["conv2"], e4)

        up2_in = jnp.concatenate(
            [interpolate(e4, e3.shape[1:3]), e3], axis=-1)
        up2 = self.after_up_layer2_conv(
            params["after_up_layer2_conv"],
            self.up_layer2(params["up_layer2"], up2_in, **kw))
        up1_in = jnp.concatenate(
            [interpolate(up2, e2.shape[1:3]), e2], axis=-1)
        up1 = self.after_up_layer1_conv(
            params["after_up_layer1_conv"],
            self.up_layer1(params["up_layer1"], up1_in, **kw))
        outs = [e4, up2, up1]
        if self.num_scales == 4:
            up0_in = jnp.concatenate(
                [interpolate(up1, e1.shape[1:3]), e1], axis=-1)
            up0 = self.after_up_layer0_conv(
                params["after_up_layer0_conv"],
                self.up_layer0(params["up_layer0"], up0_in, **kw))
            outs.append(up0)
        return outs


class CCMRUpdateBlock(Module):
    """update.py:110-168."""

    def __init__(self, correlation_depth, hidden_dim=128, scale=2,
                 num_heads=8, depth=1, mlp_ratio=1, num_scales=3):
        super().__init__()
        self.encoder = BasicMotionEncoder(2, 4)  # 2 levels * 81 = depth
        assert correlation_depth == 2 * 81
        self.gru = SepConvGRU(hidden_dim=hidden_dim,
                              input_dim=256 + hidden_dim)
        self.flow_head = FlowHead(hidden_dim, hidden_dim=256)
        self.mask = nn.Sequential(
            nn.Conv2d(128, 256, 3, padding=1), nn.relu,
            nn.Conv2d(256, scale * scale * 9, 1, padding=0))
        self.aggregator = nn.ModuleList([
            XCiT(embed_dim=128, depth=depth, num_heads=num_heads,
                 mlp_ratio=mlp_ratio, separate=True)
            for _ in range(num_scales)])

    def __call__(self, params, net, inp, corr, flow, global_context,
                 level_index=0, **kw):
        motion_features = self.encoder(params["encoder"], flow, corr)
        motion_features_global = self.aggregator[level_index](
            params["aggregator"][str(level_index)], global_context,
            x_v=motion_features)
        inp_cat = jnp.concatenate(
            [inp, motion_features, motion_features_global], axis=-1)
        net = self.gru(params["gru"], net, inp_cat)
        delta_flow = self.flow_head(params["flow_head"], net)
        mask = 0.25 * self.mask(params["mask"], net)
        return net, mask, delta_flow


class CCMR(BaseModel):
    pretrained_checkpoints = {
        "kitti": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/ccmr-kitti-612444b9.ckpt",
        "sintel": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/ccmr-sintel-e1760f37.ckpt",
    }

    def __init__(self, corr_levels: int = 4, corr_radius: int = 4,
                 iters: Sequence[int] = (8, 10, 15),
                 lookup_pyramid_levels: int = 2, lookup_radius: int = 4,
                 model_type: str = "CCMR", cnet_norm: str = "group",
                 fnet_norm: str = "group", num_scales: int = 3,
                 gamma: float = 0.8, max_flow: float = 400,
                 alternate_corr: bool = True, **kwargs):
        super().__init__(output_stride=32,
                         loss_fn=SequenceLoss(gamma, max_flow), **kwargs)
        # reference default (ccmr.py:52): on-the-fly windowed correlation —
        # at CCMR+'s 1/2-scale the dense volume is O(70 GB) at Sintel size,
        # so AltCorrBlock is what makes the fine scales representable.
        self.alternate_corr = alternate_corr
        self.iters = tuple(iters)
        self.lookup_pyramid_levels = lookup_pyramid_levels
        self.lookup_radius = lookup_radius
        self.num_scales = num_scales
        self.fnet = CCMREncoder(output_dim=256, norm_fn=fnet_norm,
                                num_scales=num_scales)
        self.cnet = CCMREncoder(output_dim=256, norm_fn=cnet_norm,
                                num_scales=num_scales, context_mode=True)
        depth_corr = (2 * lookup_radius + 1) ** 2 * lookup_pyramid_levels
        self.update_block = CCMRUpdateBlock(
            depth_corr, hidden_dim=128, scale=2, num_heads=8, depth=1,
            mlp_ratio=1, num_scales=num_scales)
        self.xcit = nn.ModuleList([
            XCiT(embed_dim=128, depth=1, num_heads=8, mlp_ratio=1,
                 separate=False) for _ in range(num_scales)])

    def forward(self, params, inputs: Dict[str, Any],
                training: bool = False) -> Dict[str, jnp.ndarray]:
        images, image_resizer = self.preprocess_images(
            inputs["images"], bgr_add=-0.5, bgr_mult=2.0, bgr_to_rgb=True,
            resize_mode="pad", pad_mode="replicate", pad_two_side=True)
        image1 = images[:, 0]
        image2 = images[:, 1]
        kw = dict(training=training)

        both = jnp.concatenate([image1, image2], axis=0)
        fnet_pyr = self.fnet(params["fnet"], both, **kw)
        cnet_pyr = self.cnet(params["cnet"], image1, **kw)
        n_levels = len(fnet_pyr)

        b = image1.shape[0]
        h16, w16 = fnet_pyr[0].shape[1:3]
        coords0 = coords_grid(b, h16, w16, dtype=image1.dtype)
        coords1 = coords0

        prev = inputs.get("prev_preds")
        if prev is not None and prev.get("flow_small") is not None:
            from ...ops.warp import forward_interpolate
            flow_small = prev["flow_small"]
            if flow_small.ndim == 4 and flow_small.shape[-1] != 2:
                flow_small = jnp.moveaxis(flow_small, -3, -1)
            coords1 = coords1 + forward_interpolate(flow_small)

        up_params = params["update_block"]
        # ccmr.py:176-178
        ups_offset = (self.num_scales - 1 if self.num_scales == 4
                      else self.num_scales)
        flow_preds = []
        up_mask = None
        for index in range(n_levels):
            fmap1, fmap2 = jnp.split(fnet_pyr[index], 2, axis=0)
            corr_cls = AltCorrBlock if self.alternate_corr else CorrBlock
            corr_fn = corr_cls(fmap1, fmap2,
                               num_levels=self.lookup_pyramid_levels,
                               radius=self.lookup_radius)
            cnet = cnet_pyr[index][:b]
            net = jnp.tanh(cnet[..., :128])
            inp = nn.relu(cnet[..., 128:])
            global_context = self.xcit[index](params["xcit"][str(index)],
                                              inp)

            if index >= 1:
                # MS-RAFT's coords upsampling bug fixed (ccmr.py:195-202):
                # upsample the FLOW, then re-anchor on the finer grid
                flow = convex_upsample(coords1 - coords0, up_mask, 2)
                bh, bw = fnet_pyr[index].shape[1:3]
                coords0 = coords_grid(b, bh, bw, dtype=image1.dtype)
                coords1 = coords0 + flow

            def step(carry, _):
                net, coords1 = carry
                coords1 = jax.lax.stop_gradient(coords1)
                corr = corr_fn(coords1)
                flow = coords1 - coords0
                net, up_mask, delta = self.update_block(
                    up_params, net, inp, corr, flow, global_context,
                    level_index=index)
                coords1 = coords1 + delta
                return (net, coords1), (coords1 - coords0, up_mask)

            (net, coords1), (flows_lr, masks) = jax.lax.scan(
                step, (net, coords1), None, length=self.iters[index])
            up_mask = masks[-1]

            if training:
                it = flows_lr.shape[0]
                hh, ww = flows_lr.shape[2:4]
                ups = convex_upsample(
                    flows_lr.reshape(it * b, hh, ww, 2),
                    masks.reshape(it * b, hh, ww, masks.shape[-1]), 2)
                ups = ups.reshape(it, b, 2 * hh, 2 * ww, 2)
                for _ in range(ups_offset - index):
                    s = ups.shape
                    ups = upflow(ups.reshape(it * b, s[2], s[3], 2), 2)
                    ups = ups.reshape(it, b, 2 * s[2], 2 * s[3], 2)
                ups = self.postprocess_predictions(ups, image_resizer,
                                                   is_flow=True)
                flow_preds.append(ups)

        flow_up = convex_upsample(coords1 - coords0, up_mask, 2)
        for _ in range(ups_offset - (n_levels - 1)):
            flow_up = upflow(flow_up, 2)
        flow_up = self.postprocess_predictions(flow_up, image_resizer,
                                               is_flow=True)
        if training:
            return {"flows": self.nhwc_flow_to_output(flow_preds[-1][-1]),
                    "flow_preds": jnp.concatenate(flow_preds, axis=0)}
        flow_small = jnp.moveaxis(_downflow(flow_up, 0.0625), -1, -3)
        return {"flows": self.nhwc_flow_to_output(flow_up),
                "flow_small": flow_small}


class CCMRPlus(CCMR):
    pretrained_checkpoints = {
        "kitti": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/ccmr+-kitti-c289d5e6.ckpt",
        "sintel": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/ccmr+-sintel-055b44ec.ckpt",
    }

    def __init__(self, iters: Sequence[int] = (8, 10, 10, 10),
                 model_type: str = "CCMR+", num_scales: int = 4, **kwargs):
        super().__init__(iters=iters, model_type=model_type,
                         num_scales=num_scales, **kwargs)


@register_model
@ptlflow_trained
class ccmr(CCMR):
    pass


@register_model
@ptlflow_trained
class ccmr_p(CCMRPlus):
    pass
