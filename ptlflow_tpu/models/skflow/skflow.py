"""SKFlow: GMA-style RAFT with super-kernel (large depthwise) PCBlocks.

Parity with /root/reference/ptlflow/models/skflow/{skflow.py,update.py}
(attribute names preserved).  Reuses the shared RAFT encoders, the GMA
attention/aggregation, and the scan-based iteration loop.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp

from ... import nn
from ...ops.correlation import build_corr_pyramid, corr_pyramid_lookup, coords_grid
from ...ops.upsample import convex_upsample
from ...ops.warp import forward_interpolate
from ...utils.registry import register_model, trainable
from ..base import BaseModel
from ..gma.gma_utils import Aggregate, Attention
from ..raft.extractor import BasicEncoder
from ..raft.raft import SequenceLoss


class PCBlock4_Deep_nopool_res(nn.Module):
    """Residual depthwise large-kernel block (skflow/update.py:7-37)."""

    def __init__(self, c_in: int, c_out: int, k_conv: Sequence[int]):
        super().__init__()
        self.conv_list = nn.ModuleList([
            nn.Conv2d(c_in, c_in, k, stride=1, padding=k // 2, groups=c_in)
            for k in k_conv])
        self.ffn1 = nn.Sequential(
            nn.Conv2d(c_in, int(1.5 * c_in), 1, padding=0), nn.gelu,
            nn.Conv2d(int(1.5 * c_in), c_in, 1, padding=0))
        self.pw = nn.Conv2d(c_in, c_in, 1, padding=0)
        self.ffn2 = nn.Sequential(
            nn.Conv2d(c_in, int(1.5 * c_in), 1, padding=0), nn.gelu,
            nn.Conv2d(int(1.5 * c_in), c_out, 1, padding=0))

    def __call__(self, params, x, **kw):
        x = nn.gelu(x + self.ffn1(params["ffn1"], x))
        for i, conv in enumerate(self.conv_list):
            x = nn.gelu(x + conv(params["conv_list"][str(i)], x))
        x = nn.gelu(x + self.pw(params["pw"], x))
        return self.ffn2(params["ffn2"], x)


class SKMotionEncoder6_Deep_nopool_res(nn.Module):
    def __init__(self, corr_levels, corr_radius, k_conv):
        super().__init__()
        cor_planes = corr_levels * (2 * corr_radius + 1) ** 2
        self.convc1 = PCBlock4_Deep_nopool_res(cor_planes, 256, k_conv)
        self.convc2 = PCBlock4_Deep_nopool_res(256, 192, k_conv)
        self.convf1 = nn.Conv2d(2, 128, 1, 1, 0)
        self.convf2 = PCBlock4_Deep_nopool_res(128, 64, k_conv)
        self.conv = PCBlock4_Deep_nopool_res(64 + 192, 128 - 2, k_conv)

    def __call__(self, params, flow, corr, **kw):
        cor = nn.gelu(self.convc1(params["convc1"], corr))
        cor = self.convc2(params["convc2"], cor)
        flo = self.convf1(params["convf1"], flow)
        flo = self.convf2(params["convf2"], flo)
        out = self.conv(params["conv"],
                        jnp.concatenate([cor, flo], axis=-1))
        return jnp.concatenate([out, flow], axis=-1)


class SKUpdateBlock6_Deep_nopoolres_AllDecoder(nn.Module):
    def __init__(self, corr_levels, corr_radius, k_conv, PCUpdater_conv,
                 num_heads, hidden_dim):
        super().__init__()
        self.encoder = SKMotionEncoder6_Deep_nopool_res(
            corr_levels, corr_radius, k_conv)
        self.gru = PCBlock4_Deep_nopool_res(
            128 + hidden_dim + hidden_dim + 128, 128, PCUpdater_conv)
        self.flow_head = PCBlock4_Deep_nopool_res(128, 2, k_conv)
        self.mask = nn.Sequential(
            nn.Conv2d(128, 256, 3, padding=1), nn.relu,
            nn.Conv2d(256, 64 * 9, 1, padding=0))
        self.aggregator = Aggregate(dim=128, dim_head=128, heads=num_heads)

    def __call__(self, params, net, inp, corr, flow, attention, **kw):
        motion_features = self.encoder(params["encoder"], flow, corr)
        motion_global = self.aggregator(params["aggregator"], attention,
                                        motion_features)
        inp_cat = jnp.concatenate([inp, motion_features, motion_global],
                                  axis=-1)
        net = self.gru(params["gru"],
                       jnp.concatenate([net, inp_cat], axis=-1))
        delta_flow = self.flow_head(params["flow_head"], net)
        mask = 0.25 * self.mask(params["mask"], net)
        return net, mask, delta_flow


class SKFlow(BaseModel):
    pretrained_checkpoints = {
        "kitti": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/skflow-kitti-4e1f8b63.ckpt",
        "sintel": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/skflow-sintel-98fb67cf.ckpt",
        "things": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/skflow-things-f84e6538.ckpt",
    }

    def __init__(self, corr_levels: int = 4, corr_radius: int = 4,
                 dropout: float = 0.0, gamma: float = 0.8,
                 max_flow: float = 400, iters: int = 32,
                 k_conv: Sequence[int] = (1, 15),
                 PCUpdater_conv: Sequence[int] = (1, 7),
                 num_heads: int = 1, position_only: bool = False,
                 position_and_content: bool = False,
                 alternate_corr: bool = False, **kwargs):
        super().__init__(output_stride=8,
                         loss_fn=SequenceLoss(gamma, max_flow), **kwargs)
        self.corr_levels = corr_levels
        self.corr_radius = corr_radius
        self.iters = iters
        self.hidden_dim = hdim = 128
        self.context_dim = cdim = 128
        self.fnet = BasicEncoder(output_dim=256, norm_fn="instance",
                                 dropout=dropout)
        self.cnet = BasicEncoder(output_dim=hdim + cdim, norm_fn="batch",
                                 dropout=dropout)
        self.update_block = SKUpdateBlock6_Deep_nopoolres_AllDecoder(
            corr_levels=corr_levels, corr_radius=corr_radius, k_conv=k_conv,
            PCUpdater_conv=PCUpdater_conv, num_heads=num_heads,
            hidden_dim=hdim)
        self.att = Attention(dim=cdim, position_only=position_only,
                             position_and_content=position_and_content,
                             heads=num_heads, max_pos_size=160,
                             dim_head=cdim)

    def forward(self, params, inputs: Dict[str, Any],
                training: bool = False) -> Dict[str, jnp.ndarray]:
        images, image_resizer = self.preprocess_images(
            inputs["images"], bgr_add=-0.5, bgr_mult=2.0, bgr_to_rgb=True,
            resize_mode="pad", pad_mode="replicate", pad_two_side=True)
        image1 = images[:, 0]
        image2 = images[:, 1]

        # two per-frame fnet passes, NOT one batched concat pass: the
        # batched variant was measured slower on v5e (the concat/split HBM
        # relayout costs more than the second launch; see raft.py)
        fmap1 = self.fnet(params["fnet"], image1, training=training)
        fmap2 = self.fnet(params["fnet"], image2, training=training)
        pyramid = build_corr_pyramid(fmap1, fmap2, self.corr_levels)

        cnet = self.cnet(params["cnet"], image1, training=training)
        net = jnp.tanh(cnet[..., :self.hidden_dim])
        inp = nn.relu(cnet[..., self.hidden_dim:])
        attention = self.att(params["att"], inp)

        b, h, w, _ = fmap1.shape
        coords0 = coords_grid(b, h, w, dtype=fmap1.dtype)
        coords1 = coords0
        prev = inputs.get("prev_preds")
        if prev is not None and prev.get("flow_small") is not None:
            fs = prev["flow_small"]
            if fs.ndim == 4 and fs.shape[-1] != 2:
                fs = jnp.moveaxis(fs, -3, -1)
            coords1 = coords1 + forward_interpolate(fs)

        up_params = params["update_block"]

        def step(carry, _):
            net, coords1, last_mask = carry
            coords1 = jax.lax.stop_gradient(coords1)
            corr = corr_pyramid_lookup(pyramid, coords1, self.corr_radius)
            flow = coords1 - coords0
            net, up_mask, delta_flow = self.update_block(
                up_params, net, inp, corr, flow, attention)
            coords1 = coords1 + delta_flow
            ys = (coords1 - coords0, up_mask) if training else None
            return (net, coords1, up_mask), ys

        mask0 = jnp.zeros((b, h, w, 64 * 9), fmap1.dtype)
        (net, coords1, last_mask), ys = jax.lax.scan(
            step, (net, coords1, mask0), None, length=self.iters)

        if training:
            flows_lr, masks = ys
            it, bb = flows_lr.shape[0], flows_lr.shape[1]
            flow_ups = convex_upsample(
                flows_lr.reshape(it * bb, h, w, 2),
                masks.reshape(it * bb, h, w, masks.shape[-1]))
            flow_ups = flow_ups.reshape(it, bb, 8 * h, 8 * w, 2)
            flow_ups = self.postprocess_predictions(flow_ups, image_resizer,
                                                    is_flow=True)
            return {"flows": self.nhwc_flow_to_output(flow_ups[-1]),
                    "flow_preds": flow_ups}
        flow_up = convex_upsample(coords1 - coords0, last_mask)
        flow_up = self.postprocess_predictions(flow_up, image_resizer,
                                               is_flow=True)
        return {"flows": self.nhwc_flow_to_output(flow_up),
                "flow_small": jnp.moveaxis(coords1 - coords0, -1, -3)}


@register_model
@trainable
class skflow(SKFlow):
    pass
