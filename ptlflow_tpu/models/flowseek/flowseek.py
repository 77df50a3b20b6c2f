"""FlowSeek — SEA-RAFT iterations seeded with depth-foundation features
and ego-motion basis fields.

Behavioral parity with /root/reference/ptlflow/models/flowseek/
flowseek.py:49-461: frozen DepthAnythingV2 (518x518 resize) provides a
feature path and a monocular depth map; the depth spawns 8 normalized
instantaneous-motion basis fields (create_bases, flowseek.py:185-230)
encoded by a second ResNetFPN (bnet); the update loop is SEA-RAFT's
ConvNeXt stack with the feature maps augmented by projected DA features
(merge_head's three stride-2 convs land exactly on the padded /8 grid).
extractor/layer/update/corr match SEA-RAFT's (shared with our sea_raft).

TPU-first: the decoder runs as ``lax.scan``; the frozen ViT is excluded
from optimization via ``frozen_prefixes``; corr lookup is the one-hot
matmul kernel (dilation is identically 1 in the reference wrapper).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp

from ... import nn
from ...nn import Module
from ...ops.correlation import build_corr_pyramid, corr_pyramid_lookup, coords_grid
from ...ops.grid_sample import interpolate
from ...ops.upsample import convex_upsample_data
from ...utils.registry import register_model, trainable, ptlflow_trained
from ..base import BaseModel
from ..sea_raft.layer import conv3x3
from ..sea_raft.sea_raft import BasicUpdateBlock, ResNetFPN
from ..waft.backbones import VIT_CONFIGS
from ..waft.dinov2 import DinoVisionTransformer
from ..waft.dpt import DPTHeadA1
from ..waft.waft import WAFTSequenceLoss


class FlowSeekDAV2(Module):
    """flowseek/depth_anything_v2/dpt.py:180-216 — frozen DINOv2 + DPT
    head returning (path_1, relu(depth))."""

    def __init__(self, encoder="vits"):
        super().__init__()
        cfg = VIT_CONFIGS[encoder]
        self.idx = cfg["idx"]
        self.features = cfg["features"]
        self.pretrained = DinoVisionTransformer(encoder)
        self.depth_head = DPTHeadA1(self.pretrained.embed_dim,
                                    cfg["features"], cfg["out_channels"],
                                    patch_size=14)

    def __call__(self, params, x, **kw):
        h, w = x.shape[1:3]
        feats = self.pretrained.get_intermediate_layers(
            params["pretrained"], x, self.idx)
        ph, pw = h // 14, w // 14
        out, p1, _p2, _p3, _p4 = self.depth_head(params["depth_head"],
                                                 feats, ph, pw)
        depth = self.depth_head.scratch.output_conv2(
            params["depth_head"]["scratch"]["output_conv2"], out)
        return p1, nn.relu(depth)


def create_bases(disp):
    """flowseek.py:185-230 — 8 globally-normalized instantaneous-motion
    basis flow fields from disparity; disp (B, H, W, 1) -> (B, H, W, 16)
    with channel pairs [Tx, Ty, Tz, R1x, R2x, R1y, R2y, Rz]."""
    b, h, w, _ = disp.shape
    dtype = disp.dtype
    ys = jnp.linspace(0.5 / h, 1.0 - 0.5 / h, h, dtype=dtype) - 0.5
    xs = jnp.linspace(0.5 / w, 1.0 - 0.5 / w, w, dtype=dtype) - 0.5
    u = jnp.broadcast_to(xs[None, None, :, None], (b, h, w, 1))
    v = jnp.broadcast_to(ys[None, :, None, None], (b, h, w, 1))
    aspect = w / h

    ones = jnp.ones_like(disp)
    zeros = jnp.zeros_like(disp)

    def norm(f):
        return f / jnp.sqrt(jnp.sum(f.astype(jnp.float32) ** 2,
                                    axis=(1, 2, 3), keepdims=True)
                            ).astype(dtype)

    tx = 2 * disp * norm(jnp.concatenate([-ones, zeros], axis=-1))
    ty = 2 * disp * norm(jnp.concatenate([zeros, -ones], axis=-1))
    tz = 2 * disp * norm(jnp.concatenate([u, v], axis=-1))
    r1x = norm(jnp.concatenate([zeros, ones], axis=-1))
    r2x = norm(jnp.concatenate([u * v, v * v], axis=-1))
    r1y = norm(jnp.concatenate([-ones, zeros], axis=-1))
    r2y = norm(jnp.concatenate([-u * u, -u * v], axis=-1))
    rz = norm(jnp.concatenate([-v / aspect, u * aspect], axis=-1))
    return jnp.concatenate([tx, ty, tz, r1x, r2x, r1y, r2y, rz], axis=-1)


class FlowSeek(BaseModel):
    frozen_prefixes = ("dav2",)

    def __init__(self, corr_levels: int = 4, radius: int = 4,
                 pretrain: str = "resnet18", da_size: str = "vits",
                 dim: int = 128, initial_dim: int = 64,
                 num_blocks: int = 2,
                 block_dims: Sequence[int] = (64, 128, 256),
                 gamma: float = 0.8, max_flow: float = 400,
                 iters: int = 4, use_var: bool = True,
                 var_min: float = 0, var_max: float = 10, **kwargs):
        super().__init__(output_stride=8,
                         loss_fn=WAFTSequenceLoss(gamma, max_flow),
                         **kwargs)
        self.dim = dim
        self.iters = iters
        self.use_var = use_var
        self.var_min = var_min
        self.var_max = var_max
        self.corr_levels = corr_levels
        self.corr_radius = radius
        self.corr_channel = corr_levels * (radius * 2 + 1) ** 2

        self.cnet = ResNetFPN(block_dims=list(block_dims),
                              initial_dim=initial_dim, pretrain=pretrain,
                              input_dim=6, output_dim=2 * dim)
        self.dav2 = FlowSeekDAV2(da_size)
        feats = VIT_CONFIGS[da_size]["features"]
        self.merge_head = nn.Sequential(
            nn.Conv2d(feats, feats // 2 * 3, 3, stride=2, padding=1),
            nn.relu,
            nn.Conv2d(feats // 2 * 3, feats * 2, 3, stride=2, padding=1),
            nn.relu,
            nn.Conv2d(feats * 2, feats * 2, 3, stride=2, padding=1))
        self.bnet = ResNetFPN(block_dims=list(block_dims),
                              initial_dim=initial_dim, pretrain=pretrain,
                              input_dim=16, output_dim=2 * dim)
        self.init_conv = conv3x3(2 * dim, 2 * dim)
        self.upsample_weight = nn.Sequential(
            nn.Conv2d(dim * 2, dim * 2, 3, padding=1), nn.relu,
            nn.Conv2d(dim * 2, 64 * 9, 1, padding=0))
        self.flow_head = nn.Sequential(
            nn.Conv2d(dim * 2, 2 * dim, 3, padding=1), nn.relu,
            nn.Conv2d(2 * dim, 6, 3, padding=1))
        if iters > 0:
            self.fnet = ResNetFPN(block_dims=list(block_dims),
                                  initial_dim=initial_dim,
                                  pretrain=pretrain, input_dim=3,
                                  output_dim=2 * dim)
            self.update_block = BasicUpdateBlock(
                corr_channel=self.corr_channel, num_blocks=num_blocks,
                hdim=dim * 2, cdim=dim * 2)

    def _nf_map(self, flow_pred, info_pred, flow_gt):
        """flowseek.py:380-406 — same Laplace mixture as WAFT/SEA-RAFT."""
        var_max = self.var_max if self.use_var else 0
        var_min = self.var_min if self.use_var else 0
        raw_b = info_pred[..., 2:]
        log_b = jnp.stack([
            jnp.clip(raw_b[..., 0], 0, var_max),
            jnp.clip(raw_b[..., 1], var_min, 0),
        ], axis=-1)
        weight = info_pred[..., :2]
        err = jnp.abs(flow_gt - flow_pred)
        term2 = err[..., :, None] * jnp.exp(-log_b)[..., None, :]
        term1 = weight - math.log(2) - log_b
        lse = jax.nn.logsumexp(term1[..., None, :] - term2, axis=-1)
        return jax.nn.logsumexp(weight, axis=-1, keepdims=True) - lse

    def forward(self, params, inputs: Dict[str, Any],
                training: bool = False) -> Dict[str, jnp.ndarray]:
        # ---- frozen depth branch at 518x518 (flowseek.py:260-294)
        images_res, _ = self.preprocess_images(
            inputs["images"], bgr_add=[-0.406, -0.456, -0.485],
            bgr_mult=[1 / 0.225, 1 / 0.224, 1 / 0.229], bgr_to_rgb=True,
            target_size=(518, 518), resize_mode="interpolation",
            interpolation_align_corners=False)
        sg = jax.lax.stop_gradient
        p1_1, depth1 = self.dav2(params["dav2"], images_res[:, 0])
        p1_2, _ = self.dav2(params["dav2"], images_res[:, 1])
        p1_1, depth1, p1_2 = sg(p1_1), sg(depth1), sg(p1_2)

        h_orig, w_orig = inputs["images"].shape[-2:]
        p1_1 = interpolate(p1_1, (h_orig, w_orig))
        p1_2 = interpolate(p1_2, (h_orig, w_orig))
        bases1 = create_bases(interpolate(depth1, (h_orig, w_orig)))
        # merge_head: three ceil-div stride-2 convs -> the padded /8 grid
        mono1 = self.merge_head(params["merge_head"], p1_1)
        mono2 = self.merge_head(params["merge_head"], p1_2)

        # ---- RAFT branch (padded to /8)
        images, image_resizer = self.preprocess_images(
            inputs["images"], bgr_add=-0.5, bgr_mult=2.0, bgr_to_rgb=True,
            resize_mode="pad", pad_mode="constant", pad_two_side=True)
        image1 = images[:, 0]
        image2 = images[:, 1]
        kw = dict(training=training)

        cnet = self.cnet(params["cnet"],
                         jnp.concatenate([image1, image2], axis=-1), **kw)
        cnet = self.init_conv(params["init_conv"], cnet)
        net = cnet[..., :self.dim]
        context = cnet[..., self.dim:]

        bases1 = image_resizer.pad(bases1)
        bnet = self.bnet(params["bnet"], bases1, **kw)
        bnet = self.init_conv(params["init_conv"], bnet)
        net = jnp.concatenate([net, bnet[..., :self.dim]], axis=-1)
        context = jnp.concatenate([context, bnet[..., self.dim:]], axis=-1)

        def heads(net):
            flow_update = self.flow_head(params["flow_head"], net)
            weight_update = 0.25 * self.upsample_weight(
                params["upsample_weight"], net)
            return flow_update, weight_update

        flow_update, weight_update = heads(net)
        flow_8x = flow_update[..., :2]
        info_8x = flow_update[..., 2:]

        def emit_full(flow_8x, info_8x, weight_update):
            flow_up, info_up = convex_upsample_data(flow_8x, info_8x,
                                                    weight_update, 8)
            flow_up = self.postprocess_predictions(flow_up, image_resizer,
                                                   is_flow=True)
            info_up = self.postprocess_predictions(info_up, image_resizer,
                                                   is_flow=False)
            return flow_up, info_up

        flow_up0, info_up0 = emit_full(flow_8x, info_8x, weight_update)

        if self.iters > 0:
            # fnet is BatchNorm-based: run per frame like the
            # reference (train-mode batch stats must match)
            fmap1 = self.fnet(params["fnet"], image1, **kw)
            fmap2 = self.fnet(params["fnet"], image2, **kw)
            fmap1 = jnp.concatenate([fmap1, mono1], axis=-1)
            fmap2 = jnp.concatenate([fmap2, mono2], axis=-1)
            # SEA-RAFT corr: per-level corr with bilinear-halved fmap2 ==
            # avg-pooled corr volume (our pyramid)
            pyramid = build_corr_pyramid(fmap1, fmap2, self.corr_levels)
            b, h, w, _ = fmap1.shape
            grid = coords_grid(b, h, w, dtype=image1.dtype)
            up_params = params["update_block"]

            def step(carry, _):
                net, flow_8x = carry
                flow_8x = jax.lax.stop_gradient(flow_8x)
                coords2 = jax.lax.stop_gradient(grid + flow_8x)
                corr = corr_pyramid_lookup(pyramid, coords2,
                                           self.corr_radius)
                net = self.update_block(up_params, net, context, corr,
                                        flow_8x)
                flow_update, weight_update = heads(net)
                flow_8x = flow_8x + flow_update[..., :2]
                info_8x = flow_update[..., 2:]
                return (net, flow_8x), (flow_8x, info_8x, weight_update)

            (net, flow_8x), (flows, infos, weights) = jax.lax.scan(
                step, (net, flow_8x), None, length=self.iters)
            it = flows.shape[0]
            hh, ww = flows.shape[2:4]
            f_up, i_up = emit_full(flows.reshape(it * b, hh, ww, 2),
                                   infos.reshape(it * b, hh, ww, -1),
                                   weights.reshape(it * b, hh, ww, -1))
            flow_preds = jnp.concatenate(
                [flow_up0[None], f_up.reshape(it, b, *f_up.shape[1:])])
            info_preds = jnp.concatenate(
                [info_up0[None], i_up.reshape(it, b, *i_up.shape[1:])])
        else:
            flow_preds = flow_up0[None]
            info_preds = info_up0[None]

        flow_up = flow_preds[-1]
        if training:
            flow_gt = jnp.moveaxis(inputs["flows"][:, 0], -3, -1)
            nf_preds = jnp.stack([
                self._nf_map(flow_preds[i], info_preds[i], flow_gt)
                for i in range(flow_preds.shape[0])])
            return {"flows": self.nhwc_flow_to_output(flow_up),
                    "flow_preds": flow_preds,
                    "info_preds": info_preds,
                    "nf_preds": nf_preds}
        return {"flows": self.nhwc_flow_to_output(flow_up),
                "flow_small": jnp.moveaxis(flow_8x, -1, -3)}


class FlowSeekT(FlowSeek):
    pretrained_checkpoints = {
        "things": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/flowseek_t-things-16757c61.ckpt",
        "tar-c-t": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/flowseek_t-tar-c-t-6be37a8c.ckpt",
    }

    def __init__(self, pretrain: str = "resnet18", da_size: str = "vits",
                 **kwargs):
        super().__init__(pretrain=pretrain, da_size=da_size, **kwargs)


class FlowSeekM(FlowSeek):
    pretrained_checkpoints = {
        "things": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/flowseek_m-things-503e3693.ckpt",
        "tar-c-t": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/flowseek_m-tar-c-t-261fd770.ckpt",
    }

    def __init__(self, pretrain: str = "resnet34", da_size: str = "vitb",
                 **kwargs):
        super().__init__(pretrain=pretrain, da_size=da_size, **kwargs)


@register_model
@ptlflow_trained
class flowseek_t(FlowSeekT):
    pass


@register_model
@ptlflow_trained
class flowseek_m(FlowSeekM):
    pass
