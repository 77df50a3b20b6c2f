"""CSFlow: RAFT with cross-strip correlation augmentation.

Parity with /root/reference/ptlflow/models/csflow/csflow.py:38-750:
strip cross-correlation maps (vertical/horizontal pooled feature strips,
csflow.py:227-297) concatenated as a second channel of the correlation
volume (CorrBlock_v2, :445-536), a strip-softmax flow initialization before
the GRU iterations (:175-195), and a doubled-width motion encoder.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ... import nn
from ...ops.correlation import (all_pairs_correlation, coords_grid,
                                corr_pyramid_lookup)
from ...ops.upsample import convex_upsample, upflow
from ...ops.warp import forward_interpolate
from ...utils.registry import register_model, trainable
from ..base import BaseModel
from ..raft.extractor import BasicEncoder
from ..raft.raft import SequenceLoss
from ..raft.update import FlowHead, SepConvGRU


class ConvBNReLU(nn.Module):
    def __init__(self, in_chan, out_chan, ks=3, stride=1, padding=1):
        super().__init__()
        self.conv = nn.Conv2d(in_chan, out_chan, ks, stride=stride,
                              padding=padding, bias=False)
        self.bn = nn.BatchNorm2d(out_chan)

    def __call__(self, params, x, **kw):
        return nn.relu(self.bn(params["bn"],
                               self.conv(params["conv"], x), **kw))


class StripCrossCorrMap_v2(nn.Module):
    """csflow.py:227-297; NHWC formulation with the same einsum structure."""

    def __init__(self, in_chan=256, out_chan=256):
        super().__init__()
        self.conv1_1 = ConvBNReLU(in_chan, out_chan, ks=1, stride=1, padding=0)
        self.conv1_2 = ConvBNReLU(in_chan, out_chan, ks=1, stride=1, padding=0)
        self.conv2_1 = ConvBNReLU(in_chan, out_chan, ks=1, stride=1, padding=0)
        self.conv2_2 = ConvBNReLU(in_chan, out_chan, ks=1, stride=1, padding=0)

    def __call__(self, params, fmap1, fmap2, **kw):
        b, h, w, c = fmap1.shape
        f1w = self.conv1_1(params["conv1_1"], fmap1, **kw)  # (B,H,W,C)
        f1h = self.conv1_2(params["conv1_2"], fmap1, **kw)
        f2w = self.conv2_1(params["conv2_1"], fmap2, **kw)
        f2h = self.conv2_2(params["conv2_2"], fmap2, **kw)
        # vertical strips: average over H -> per-column descriptors (W2, C)
        f2w = jnp.mean(f2w, axis=1)  # (B, W, C)
        # horizontal strips: average over W -> per-row descriptors (H2, C)
        f2h = jnp.mean(f2h, axis=2)  # (B, H, C)
        # (B, W2, H1*W1) -> (B, H1, W1, 1, W2)
        corr_w = jnp.einsum("bwc,bhxc->bhxw", f2w, f1w,
                            preferred_element_type=jnp.float32)
        corr_w = corr_w[:, :, :, None, :]  # B H1 W1 1 W2
        corr_h = jnp.einsum("byc,bhxc->bhxy", f2h, f1h,
                            preferred_element_type=jnp.float32)
        corr_h = corr_h[:, :, :, :, None]  # B H1 W1 H2 1
        strip = (corr_w + corr_h).reshape(b, h, w, 1, h, w)
        return strip.astype(fmap1.dtype), corr_w.astype(fmap1.dtype), \
            corr_h.astype(fmap1.dtype)


class BasicMotionEncoder_v2(nn.Module):
    """Doubled corr planes from the strip concat (csflow.py:654-676)."""

    def __init__(self, corr_levels: int, corr_radius: int):
        super().__init__()
        cor_planes = 2 * (corr_levels * (2 * corr_radius + 1) ** 2)
        self.convc1 = nn.Conv2d(cor_planes, 256, 1, padding=0)
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
    def __init__(self, corr_levels: int, corr_radius: int,
                 hidden_dim: int = 128):
        super().__init__()
        self.encoder = BasicMotionEncoder_v2(corr_levels, corr_radius)
        self.gru = SepConvGRU(hidden_dim=hidden_dim,
                              input_dim=128 + hidden_dim)
        self.flow_head = FlowHead(hidden_dim, hidden_dim=256)
        self.mask = nn.Sequential(
            nn.Conv2d(128, 256, 3, padding=1), nn.relu,
            nn.Conv2d(256, 64 * 9, 1, padding=0))

    def __call__(self, params, net, inp, corr, flow, **kw):
        motion_features = self.encoder(params["encoder"], flow, corr)
        inp = jnp.concatenate([inp, motion_features], axis=-1)
        net = self.gru(params["gru"], net, inp)
        delta_flow = self.flow_head(params["flow_head"], net)
        mask = 0.25 * self.mask(params["mask"], net)
        return net, mask, delta_flow


def build_csflow_pyramid(fmap1, fmap2, strip_corr, num_levels=4):
    """Volume with [matmul corr, strip corr] channels, avg-pooled pyramid."""
    b, h, w, _ = fmap1.shape
    corr = all_pairs_correlation(fmap1, fmap2).reshape(b * h * w, h, w, 1)
    strip = strip_corr.reshape(b * h * w, h, w, 1)
    vol = jnp.concatenate([corr, strip], axis=-1)
    pyramid = [vol]
    for _ in range(num_levels - 1):
        vol = nn.avg_pool2d(vol, 2, 2)
        pyramid.append(vol)
    return pyramid


class CSFlow(BaseModel):
    pretrained_checkpoints = {
        "chairs": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/csflow-chairs-458a9436.ckpt",
        "things": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/csflow-things-ebdd403b.ckpt",
        "kitti": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/csflow-kitti-dc66357a.ckpt",
    }

    def __init__(self, corr_levels: int = 4, corr_radius: int = 4,
                 dropout: float = 0.0, gamma: float = 0.8,
                 max_flow: float = 400, iters: int = 32, **kwargs):
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
        self.strip_corr_block_v2 = StripCrossCorrMap_v2(in_chan=256,
                                                        out_chan=256)
        self.update_block = BasicUpdateBlock(corr_levels=corr_levels,
                                             corr_radius=corr_radius,
                                             hidden_dim=hdim)

    def forward(self, params, inputs: Dict[str, Any],
                training: bool = False) -> Dict[str, jnp.ndarray]:
        images, image_resizer = self.preprocess_images(
            inputs["images"], bgr_add=-0.5, bgr_mult=2.0, bgr_to_rgb=True,
            resize_mode="pad", pad_mode="replicate", pad_two_side=True)
        image1 = images[:, 0]
        image2 = images[:, 1]

        fmap1 = self.fnet(params["fnet"], image1, training=training)
        fmap2 = self.fnet(params["fnet"], image2, training=training)
        cnet = self.cnet(params["cnet"], image1, training=training)
        net = jnp.tanh(cnet[..., :self.hidden_dim])
        inp = nn.relu(cnet[..., self.hidden_dim:])

        strip, corr_w, corr_h = self.strip_corr_block_v2(
            params["strip_corr_block_v2"], fmap1, fmap2, training=training)
        pyramid = build_csflow_pyramid(fmap1, fmap2, strip, self.corr_levels)

        b, h, w, _ = fmap1.shape
        coords0 = coords_grid(b, h, w, dtype=fmap1.dtype)
        coords1 = coords0
        prev = inputs.get("prev_preds")
        if prev is not None and prev.get("flow_small") is not None:
            fs = prev["flow_small"]
            if fs.ndim == 4 and fs.shape[-1] != 2:
                fs = jnp.moveaxis(fs, -3, -1)
            coords1 = coords1 + forward_interpolate(fs)

        # strip flow initialization (csflow.py:175-195).  The reference
        # softmaxes over the SINGLETON axis (dim 3 of B H1 W1 1 W2 /
        # dim 4 of B H1 W1 H2 1), which is identically 1.0 — so the
        # "softmax-weighted regression" its comment describes degenerates
        # to a plain sum over the strip.  The released checkpoints were
        # trained with that behavior, so reproduce it exactly.
        flow_v = jnp.sum(corr_w, axis=(3, 4))  # B H1 W1
        flow_u = jnp.sum(corr_h, axis=(3, 4))
        corr_init = jnp.stack([flow_u, flow_v], axis=-1).astype(fmap1.dtype)
        coords1 = jax.lax.stop_gradient(coords1) + corr_init

        init_up = upflow(coords1 - coords0, 8)
        init_up = self.postprocess_predictions(init_up, image_resizer,
                                               is_flow=True)

        up_params = params["update_block"]

        def step(carry, _):
            net, coords1, last_mask = carry
            coords1 = jax.lax.stop_gradient(coords1)
            corr = corr_pyramid_lookup(pyramid, coords1, self.corr_radius)
            flow = coords1 - coords0
            net, up_mask, delta_flow = self.update_block(
                up_params, net, inp, corr, flow)
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
            all_preds = jnp.concatenate([init_up[None], flow_ups], axis=0)
            return {"flows": self.nhwc_flow_to_output(flow_ups[-1]),
                    "flow_preds": all_preds}
        flow_up = convex_upsample(coords1 - coords0, last_mask)
        flow_up = self.postprocess_predictions(flow_up, image_resizer,
                                               is_flow=True)
        return {"flows": self.nhwc_flow_to_output(flow_up),
                "flow_small": jnp.moveaxis(coords1 - coords0, -1, -3)}


@register_model
@trainable
class csflow(CSFlow):
    pass
