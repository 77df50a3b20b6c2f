"""MS-RAFT+ — multi-scale RAFT with a shared update block over a 4-level
coarse-to-fine pyramid (1/16 -> 1/2), TPU-native.

Behavioral parity with /root/reference/ptlflow/models/ms_raft_plus/:
- ms_raft_plus.py:66-226 (MSRAFTPlus.forward: per-level GRU iterations,
  coords upsampled x2 between levels with the previous level's mask,
  per-iteration convex x2 upsample followed by chained bilinear
  ``upflow2`` to full resolution);
- extractor.py:123-330 (BasicEncoder / Basic_Context_Encoder U-shaped
  pyramid encoders; the up-layer ResidualBlocks drop the residual when
  input/output channels differ, extractor.py:56-58);
- update.py:119-153 (BasicUpdateBlock with scale=2 -> 36-channel mask);
- corr.py:13-64 (2-level corr pyramid, radius 4; the ``alternate_corr``
  path is mathematically identical to pooling the corr volume, which is
  what our ``CorrBlock`` does).

TPU-first notes: each level's iterations run as a ``lax.scan`` (static
trip count per level), the pyramid loop is a Python loop over 4 static
levels, everything NHWC, corr lookup is the one-hot-matmul MXU kernel.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp

from ... import nn
from ...nn import Module
from ...ops.correlation import AltCorrBlock, CorrBlock, coords_grid
from ...ops.grid_sample import interpolate
from ...ops.upsample import convex_upsample, upflow
from ...utils.registry import register_model, trainable, ptlflow_trained
from ..base import BaseModel
from ..raft.extractor import make_norm
from ..raft.raft import SequenceLoss
from ..raft.update import BasicMotionEncoder, FlowHead, SepConvGRU


class MSResidualBlock(Module):
    """extractor.py:6-59. Quirks faithfully kept: the stride-2 projection
    shares one norm instance (``norm3`` also listed as ``downsample.1``),
    and stride-1 blocks with in != out channels return the branch output
    without the residual sum (used by all up-layers)."""

    def __init__(self, in_planes, planes, norm_fn="group", stride=1):
        super().__init__()
        self.in_planes = in_planes
        self.planes = planes
        self.stride = stride
        self.conv1 = nn.Conv2d(in_planes, planes, 3, padding=1, stride=stride)
        self.conv2 = nn.Conv2d(planes, planes, 3, padding=1)
        self.norm1 = make_norm(norm_fn, planes)
        self.norm2 = make_norm(norm_fn, planes)
        if stride != 1:
            self.norm3 = make_norm(norm_fn, planes)
            self.downsample = nn.Sequential(
                nn.Conv2d(in_planes, planes, 1, stride=stride))
        else:
            self.downsample = None

    def from_torch(self, flat, strict=True, _path=""):
        flat = {k: v for k, v in flat.items()
                if not k.startswith("downsample.1.")}
        return super().from_torch(flat, strict=strict, _path=_path)

    def __call__(self, params, x, **kw):
        y = nn.relu(self.norm1(params.get("norm1", {}),
                               self.conv1(params["conv1"], x), **kw))
        y = nn.relu(self.norm2(params.get("norm2", {}),
                               self.conv2(params["conv2"], y), **kw))
        if self.downsample is not None:
            x = self.downsample(params["downsample"], x, **kw)
            x = self.norm3(params.get("norm3", {}), x, **kw)
        elif self.in_planes != self.planes:
            return y  # extractor.py:56-58 — up-layer without residual
        return nn.relu(x + y)


def _ms_layer(in_planes, dim, norm_fn, stride):
    return nn.Sequential(MSResidualBlock(in_planes, dim, norm_fn, stride),
                         MSResidualBlock(dim, dim, norm_fn, 1))


class MSBasicEncoder(Module):
    """extractor.py:123-221 — down path to 1/16 then up path producing a
    [1/16 (output_dim), 1/8 (128), 1/4 (96), 1/2 (64)] feature pyramid.
    Up-path resizes are bilinear half-pixel (torchvision ``TF.resize``,
    upscaling so antialias is inert)."""

    def __init__(self, output_dim=256, norm_fn="group",
                 context_mode=False):
        super().__init__()
        self.context_mode = context_mode
        self.norm1 = make_norm(norm_fn, 64)
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3)
        self.layer1 = _ms_layer(64, 64, norm_fn, 1)
        self.layer2 = _ms_layer(64, 96, norm_fn, 2)
        self.layer3 = _ms_layer(96, 128, norm_fn, 2)
        self.layer4 = _ms_layer(128, 160, norm_fn, 2)
        self.conv2 = nn.Conv2d(160, output_dim, 1)
        if context_mode:
            # Basic_Context_Encoder: all up-layers emit output_dim channels
            self.up_layer2 = _ms_layer(output_dim + 128, output_dim,
                                       norm_fn, 1)
            self.up_layer1 = _ms_layer(output_dim + 96, output_dim,
                                       norm_fn, 1)
            self.up_layer0 = _ms_layer(output_dim + 64, output_dim,
                                       norm_fn, 1)
        else:
            self.up_layer2 = _ms_layer(output_dim + 128, 128, norm_fn, 1)
            self.up_layer1 = _ms_layer(128 + 96, 96, norm_fn, 1)
            self.up_layer0 = _ms_layer(96 + 64, 64, norm_fn, 1)

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
        up2 = self.up_layer2(params["up_layer2"], up2_in, **kw)
        up1_in = jnp.concatenate(
            [interpolate(up2, e2.shape[1:3]), e2], axis=-1)
        up1 = self.up_layer1(params["up_layer1"], up1_in, **kw)
        up0_in = jnp.concatenate(
            [interpolate(up1, e1.shape[1:3]), e1], axis=-1)
        up0 = self.up_layer0(params["up_layer0"], up0_in, **kw)
        return [e4, up2, up1, up0]


class MSUpdateBlock(Module):
    """update.py:119-153 with scale=2: standard RAFT motion encoder + GRU
    plus a 2*2*9-channel convex-upsample mask head."""

    def __init__(self, corr_levels, corr_radius, hidden_dim=128, scale=2):
        super().__init__()
        self.encoder = BasicMotionEncoder(corr_levels, corr_radius)
        self.gru = SepConvGRU(hidden_dim=hidden_dim,
                              input_dim=128 + hidden_dim)
        self.flow_head = FlowHead(hidden_dim, hidden_dim=256)
        self.mask = nn.Sequential(
            nn.Conv2d(128, 256, 3, padding=1), nn.relu,
            nn.Conv2d(256, scale * scale * 9, 1, padding=0))

    def __call__(self, params, net, inp, corr, flow, **kw):
        motion_features = self.encoder(params["encoder"], flow, corr)
        inp = jnp.concatenate([inp, motion_features], axis=-1)
        net = self.gru(params["gru"], net, inp)
        delta_flow = self.flow_head(params["flow_head"], net)
        mask = 0.25 * self.mask(params["mask"], net)
        return net, mask, delta_flow


def _downflow(flow_nhwc, factor):
    """ms_raft_plus.py:22-35 — bilinear align_corners=True resize with
    per-axis magnitude rescale."""
    b, h, w, _ = flow_nhwc.shape
    nh, nw = int(factor * h), int(factor * w)
    out = interpolate(flow_nhwc, (nh, nw), align_corners=True)
    return out * jnp.asarray([nw / w, nh / h], out.dtype)


class MSRAFTPlus(BaseModel):
    pretrained_checkpoints = {
        "mixed": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/ms_raft_plus-mixed-2bb01f62.ckpt",
    }

    def __init__(self, gamma: float = 0.8, max_flow: float = 400,
                 iters: Sequence[int] = (4, 6, 5, 10),
                 lookup_pyramid_levels: int = 2, lookup_radius: int = 4,
                 alternate_corr: bool = True, **kwargs):
        super().__init__(output_stride=16,
                         loss_fn=SequenceLoss(gamma, max_flow), **kwargs)
        self.gamma = gamma
        self.max_flow = max_flow
        self.iters = tuple(iters)
        self.alternate_corr = alternate_corr
        self.lookup_pyramid_levels = lookup_pyramid_levels
        self.lookup_radius = lookup_radius
        self.hidden_dim = 128
        self.context_dim = 128

        self.fnet = MSBasicEncoder(output_dim=256, norm_fn="group")
        self.cnet = MSBasicEncoder(output_dim=256, norm_fn="group",
                                   context_mode=True)
        self.update_block = MSUpdateBlock(lookup_pyramid_levels,
                                          lookup_radius,
                                          hidden_dim=self.hidden_dim,
                                          scale=2)

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
        flow_preds = []
        up_mask = None
        for index in range(n_levels):
            fmap1, fmap2 = jnp.split(fnet_pyr[index], 2, axis=0)
            # reference default alternate_corr=True (ms_raft_plus.py:78):
            # the 1/4-scale dense volume is O(4 GB)/Sintel frame, the 1/2
            # scale O(70 GB) — on-the-fly windowed corr keeps fine scales
            # representable.
            corr_cls = (AltCorrBlock if getattr(self, "alternate_corr", True)
                        else CorrBlock)
            corr_fn = corr_cls(fmap1, fmap2,
                               num_levels=self.lookup_pyramid_levels,
                               radius=self.lookup_radius)
            cnet = cnet_pyr[index][:b]
            net = jnp.tanh(cnet[..., :self.hidden_dim])
            inp = nn.relu(cnet[..., self.hidden_dim:])

            if index >= 1:
                # promote coords to the finer grid with the previous
                # level's mask (ms_raft_plus.py:198-200); convex_upsample
                # scales by the factor, matching upsample_flow(coords, 2)
                coords1 = convex_upsample(coords1, up_mask, 2)
                bh, bw = fnet_pyr[index].shape[1:3]
                coords0 = coords_grid(b, bh, bw, dtype=image1.dtype)

            def step(carry, _):
                net, coords1 = carry
                coords1 = jax.lax.stop_gradient(coords1)
                corr = corr_fn(coords1)
                flow = coords1 - coords0
                net, up_mask, delta = self.update_block(
                    up_params, net, inp, corr, flow)
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
                for _ in range(n_levels - index - 1):
                    s = ups.shape
                    ups = upflow(ups.reshape(it * b, s[2], s[3], 2), 2)
                    ups = ups.reshape(it, b, 2 * s[2], 2 * s[3], 2)
                ups = self.postprocess_predictions(ups, image_resizer,
                                                   is_flow=True)
                flow_preds.append(ups)

        flow_up = convex_upsample(coords1 - coords0, up_mask, 2)
        flow_up = self.postprocess_predictions(flow_up, image_resizer,
                                               is_flow=True)
        if training:
            return {"flows": self.nhwc_flow_to_output(flow_preds[-1][-1]),
                    "flow_preds": jnp.concatenate(flow_preds, axis=0)}
        flow_small = jnp.moveaxis(_downflow(flow_up, 0.0625), -1, -3)
        return {"flows": self.nhwc_flow_to_output(flow_up),
                "flow_small": flow_small}


@register_model
@trainable
@ptlflow_trained
class ms_raft_p(MSRAFTPlus):
    pass
