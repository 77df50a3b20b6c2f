"""SEA-RAFT: simple, efficient, accurate RAFT variant.

Parity with /root/reference/ptlflow/models/sea_raft/sea_raft.py:52-441,
update.py:5-54: ResNet-FPN context/feature encoders, direct initial flow
regression from context, ConvNeXt refinement blocks (no GRU), Laplace
mixture uncertainty head (nf_preds loss terms, sea_raft.py:238-265), shared
convex upsampling of flow + info.  The refinement loop is a lax.scan.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp

from ... import nn
from ...ops.correlation import build_corr_pyramid, corr_pyramid_lookup, coords_grid
from ...ops.upsample import convex_upsample_data
from ...utils.registry import register_model, trainable, ptlflow_trained
from ..base import BaseModel
from .layer import ConvNextBlock, ResNetFPN, conv3x3


class SequenceLoss:
    """gamma-weighted mean of the Laplace-mixture NLL terms with NaN/inf
    masking (sea_raft.py:22-50)."""

    def __init__(self, gamma: float, max_flow: float):
        self.gamma = gamma
        self.max_flow = max_flow

    def __call__(self, outputs: Dict[str, Any], inputs: Dict[str, Any]):
        flow_gt = jnp.moveaxis(inputs["flows"][:, 0], -3, -1)
        valid = jnp.moveaxis(inputs["valids"][:, 0], -3, -1)
        mag = jnp.sqrt(jnp.sum(flow_gt ** 2, axis=-1, keepdims=True))
        valid = (valid >= 0.5) & (mag < self.max_flow)

        nf_preds = outputs["nf_preds"]  # (n, B, H, W, 1)
        n = nf_preds.shape[0]
        loss = 0.0
        for i in range(n):
            li = nf_preds[i]
            det = jax.lax.stop_gradient(li)
            final_mask = (~jnp.isnan(det)) & (~jnp.isinf(det)) & valid
            fm = final_mask.astype(li.dtype)
            li = jnp.where(final_mask, li, 0.0)
            w = self.gamma ** (n - i - 1)
            loss = loss + w * jnp.sum(fm * li) / jnp.clip(jnp.sum(fm), 1)
        return loss


class BasicMotionEncoder(nn.Module):
    """SEA-RAFT motion encoder (update.py:18-36)."""

    def __init__(self, corr_channel: int, dim: int = 128):
        super().__init__()
        self.convc1 = nn.Conv2d(corr_channel, dim * 2, 1, padding=0)
        self.convc2 = nn.Conv2d(dim * 2, dim + dim // 2, 3, padding=1)
        self.convf1 = nn.Conv2d(2, dim, 7, padding=3)
        self.convf2 = nn.Conv2d(dim, dim // 2, 3, padding=1)
        self.conv = nn.Conv2d(dim * 2, dim - 2, 3, padding=1)

    def __call__(self, params, flow, corr, **kw):
        cor = nn.relu(self.convc1(params["convc1"], corr))
        cor = nn.relu(self.convc2(params["convc2"], cor))
        flo = nn.relu(self.convf1(params["convf1"], flow))
        flo = nn.relu(self.convf2(params["convf2"], flo))
        out = nn.relu(self.conv(params["conv"],
                                jnp.concatenate([cor, flo], axis=-1)))
        return jnp.concatenate([out, flow], axis=-1)


class BasicUpdateBlock(nn.Module):
    """ConvNeXt refinement stack (update.py:39-54)."""

    def __init__(self, corr_channel: int, num_blocks: int, hdim: int = 128,
                 cdim: int = 128):
        super().__init__()
        self.encoder = BasicMotionEncoder(corr_channel=corr_channel, dim=cdim)
        self.refine = nn.ModuleList(
            [ConvNextBlock(2 * cdim + hdim, hdim) for _ in range(num_blocks)])

    def __call__(self, params, net, inp, corr, flow, **kw):
        motion_features = self.encoder(params["encoder"], flow, corr)
        inp = jnp.concatenate([inp, motion_features], axis=-1)
        for i, blk in enumerate(self.refine):
            net = blk(params["refine"][str(i)],
                      jnp.concatenate([net, inp], axis=-1))
        return net


class SEARAFT(BaseModel):
    pretrained_checkpoints = {}

    def __init__(self, corr_levels: int = 4, corr_radius: int = 4,
                 dim: int = 128, initial_dim: int = 64, num_blocks: int = 2,
                 block_dims: Sequence[int] = (64, 128, 256),
                 pretrain: str = "resnet18", gamma: float = 0.8,
                 max_flow: float = 400, iters: int = 4,
                 alternate_corr: bool = False, use_var: bool = True,
                 var_min: float = 0, var_max: float = 10,
                 corr_dtype: str = None, mixed_precision: bool = False,
                 **kwargs):
        super().__init__(output_stride=8,
                         loss_fn=SequenceLoss(gamma, max_flow), **kwargs)
        self.corr_levels = corr_levels
        self.corr_radius = corr_radius
        self.dim = dim
        self.iters = iters
        self.use_var = use_var
        self.var_min = var_min
        self.var_max = var_max
        self.corr_channel = corr_levels * (corr_radius * 2 + 1) ** 2
        # "bfloat16" halves cost-volume HBM traffic (see raft.py)
        self.corr_dtype = corr_dtype
        # inference-only bf16 compute; coords/flow accumulation stay fp32
        self.mixed_precision = mixed_precision

        self.cnet = ResNetFPN(block_dims=list(block_dims),
                              initial_dim=initial_dim, pretrain=pretrain,
                              input_dim=6, output_dim=2 * dim)
        self.init_conv = conv3x3(2 * dim, 2 * dim)
        self.upsample_weight = nn.Sequential(
            nn.Conv2d(dim, dim * 2, 3, padding=1), nn.relu,
            nn.Conv2d(dim * 2, 64 * 9, 1, padding=0))
        self.flow_head = nn.Sequential(
            nn.Conv2d(dim, 2 * dim, 3, padding=1), nn.relu,
            nn.Conv2d(2 * dim, 6, 3, padding=1))
        if iters > 0:
            self.fnet = ResNetFPN(block_dims=list(block_dims),
                                  initial_dim=initial_dim, pretrain=pretrain,
                                  input_dim=3, output_dim=2 * dim)
            self.update_block = BasicUpdateBlock(
                corr_channel=self.corr_channel, num_blocks=num_blocks,
                hdim=dim, cdim=dim)

    def _nf_loss(self, flow_pred, info_pred, flow_gt):
        """Laplace-mixture NLL (sea_raft.py:238-265); all NHWC."""
        var_max = self.var_max if self.use_var else 0
        var_min = self.var_min if self.use_var else 0
        raw_b = info_pred[..., 2:]  # (B, H, W, 2)
        log_b = jnp.stack([
            jnp.clip(raw_b[..., 0], 0, var_max),
            jnp.clip(raw_b[..., 1], var_min, 0),
        ], axis=-1)
        weight = info_pred[..., :2]  # (B, H, W, 2=mixture)
        # term2[b,h,w,c,m] = |gt - pred|_c * exp(-log_b_m)
        err = jnp.abs(flow_gt - flow_pred)  # (B, H, W, 2=flow c)
        term2 = err[..., :, None] * jnp.exp(-log_b)[..., None, :]
        term1 = weight - math.log(2) - log_b  # (B, H, W, 2=m)
        # logsumexp over the mixture dim, per flow channel -> (B, H, W, 2c)
        lse = jax.nn.logsumexp(term1[..., None, :] - term2, axis=-1)
        return jax.nn.logsumexp(weight, axis=-1, keepdims=True) - lse

    def forward(self, params, inputs: Dict[str, Any],
                training: bool = False) -> Dict[str, jnp.ndarray]:
        images, image_resizer = self.preprocess_images(
            inputs["images"], bgr_add=-0.5, bgr_mult=2.0, bgr_to_rgb=True,
            resize_mode="pad", pad_mode="replicate", pad_two_side=True)
        image1 = images[:, 0]
        image2 = images[:, 1]

        amp = self.mixed_precision and not training
        corr_dtype = jnp.bfloat16 if amp else self.corr_dtype
        if amp:
            params = nn.cast_params(params, jnp.bfloat16)
            image1 = image1.astype(jnp.bfloat16)
            image2 = image2.astype(jnp.bfloat16)

        cnet = self.cnet(params["cnet"],
                         jnp.concatenate([image1, image2], axis=-1),
                         training=training)
        cnet = self.init_conv(params["init_conv"], cnet)
        net = cnet[..., :self.dim]
        context = cnet[..., self.dim:]

        flow_update = self.flow_head(params["flow_head"], net)
        weight_update = 0.25 * self.upsample_weight(params["upsample_weight"],
                                                    net)
        # flow state accumulates in fp32 even under mixed_precision
        flow_8x = flow_update[..., :2].astype(jnp.float32)
        info_8x = flow_update[..., 2:]

        flows_up = [None]
        infos_up = [None]
        flow_up, info_up = convex_upsample_data(flow_8x, info_8x,
                                                weight_update)
        flows_up[0] = self.postprocess_predictions(flow_up, image_resizer,
                                                   is_flow=True)
        infos_up[0] = self.postprocess_predictions(info_up, image_resizer,
                                                   is_flow=False)

        if self.iters > 0:
            # fnet is BatchNorm-based: run per frame like the
            # reference (train-mode batch stats must match)
            fmap1 = self.fnet(params["fnet"], image1, training=training)
            fmap2 = self.fnet(params["fnet"], image2, training=training)
            pyramid = build_corr_pyramid(fmap1, fmap2, self.corr_levels,
                                         dtype=corr_dtype)
            b, h, w, _ = fmap1.shape
            grid = coords_grid(
                b, h, w,
                dtype=jnp.promote_types(fmap1.dtype, jnp.float32))
            up_params = params["update_block"]

            def step(carry, _):
                net, flow_8x = carry
                flow_8x = jax.lax.stop_gradient(flow_8x)
                coords2 = jax.lax.stop_gradient(grid + flow_8x)
                corr = corr_pyramid_lookup(pyramid, coords2,
                                           self.corr_radius)
                net = self.update_block(up_params, net, context, corr,
                                        flow_8x.astype(net.dtype))
                flow_update = self.flow_head(params["flow_head"], net)
                weight_update = 0.25 * self.upsample_weight(
                    params["upsample_weight"], net)
                flow_8x = flow_8x + flow_update[..., :2].astype(
                    jnp.float32)
                info_8x = flow_update[..., 2:]
                return (net, flow_8x), (flow_8x, info_8x, weight_update)

            (net, flow_8x), ys = jax.lax.scan(
                step, (net, flow_8x), None, length=self.iters)
            fs, infos, weights = ys
            it, bb = fs.shape[0], fs.shape[1]
            f_up, i_up = convex_upsample_data(
                fs.reshape(it * bb, h, w, 2),
                infos.reshape(it * bb, h, w, 4),
                weights.reshape(it * bb, h, w, 64 * 9))
            f_up = self.postprocess_predictions(
                f_up.reshape(it, bb, 8 * h, 8 * w, 2), image_resizer,
                is_flow=True)
            i_up = self.postprocess_predictions(
                i_up.reshape(it, bb, 8 * h, 8 * w, 4), image_resizer,
                is_flow=False)
            for i in range(it):
                flows_up.append(f_up[i])
                infos_up.append(i_up[i])
            flow_up = f_up[-1]

        if training:
            flow_gt = jnp.moveaxis(inputs["flows"][:, 0], -3, -1) \
                if "flows" in inputs else jnp.zeros_like(flows_up[-1])
            nf_preds = jnp.stack([
                self._nf_loss(flows_up[i], infos_up[i], flow_gt)
                for i in range(len(flows_up))])
            return {
                "flows": self.nhwc_flow_to_output(flow_up),
                "flow_preds": jnp.stack(flows_up),
                "info_preds": jnp.stack(infos_up),
                "nf_preds": nf_preds,
            }
        return {
            "flows": self.nhwc_flow_to_output(flow_up),
            "flow_small": jnp.moveaxis(flow_8x, -1, -3)
            if self.iters > 0 else jnp.moveaxis(flow_8x, -1, -3),
        }


_URL = "https://github.com/hmorimitsu/ptlflow/releases/download/weights1"


class SEARAFT_S(SEARAFT):
    pretrained_checkpoints = {
        k: f"{_URL}/sea_raft_s-{v}.ckpt" for k, v in {
            "tartan": "tartan-f7e26f21", "chairs": "chairs-6980249f",
            "things": "things-a15c1713", "sintel": "sintel-bb63371a",
            "kitti": "kitti-3a96c1cc", "spring": "spring-4d13c106"}.items()}


class SEARAFT_M(SEARAFT):
    pretrained_checkpoints = {
        k: f"{_URL}/sea_raft_m-{v}.ckpt" for k, v in {
            "tartan": "tartan-e684ed5f", "chairs": "chairs-1cb7b11e",
            "things": "things-ac45dd7f", "sintel": "sintel-f8bb7e3f",
            "kitti": "kitti-e51f7603", "spring": "spring-de7c13e2"}.items()}

    def __init__(self, pretrain: str = "resnet34", **kwargs):
        super().__init__(pretrain=pretrain, **kwargs)


class SEARAFT_L(SEARAFT_M):
    def __init__(self, iters: int = 12, **kwargs):
        super().__init__(iters=iters, **kwargs)


@register_model
@trainable
class sea_raft(SEARAFT):
    pass


@register_model
@trainable
class sea_raft_s(SEARAFT_S):
    pass


@register_model
@trainable
class sea_raft_m(SEARAFT_M):
    pass


@register_model
@trainable
class sea_raft_l(SEARAFT_L):
    pass
