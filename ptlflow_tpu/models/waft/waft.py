"""WAFT — warping-alone field transforms at 1/2 resolution.

Behavioral parity with /root/reference/ptlflow/models/waft/waft_a1.py
(WAFTa1.forward:208-294) and waft_a2.py (WAFTa2.forward:204-282): frozen
depth-foundation features + a trainable ViT refine network iterated with
pure warping (no cost volume), joint flow/uncertainty head, 2x convex
upsample, Laplace-mixture NLL sequence loss.

TPU-first: the refine iterations run as a Python loop over a static
``iters`` (the ViT inside makes scan carry layouts awkward and iters is
tiny); warping is the shared ``grid_sample``; attention/matmuls are MXU
einsums. The frozen backbone params live in ``frozen_prefixes`` so the
trainer excludes them, matching requires_grad=False in the reference.
"""

from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp

from ... import nn
from ...nn import Module
from ...ops.correlation import coords_grid
from ...ops.grid_sample import bilinear_sampler
from ...ops.upsample import convex_upsample_data
from ...utils.registry import register_model, trainable, ptlflow_trained
from ..base import BaseModel
from .backbones import (VIT_CONFIGS, DepthAnythingFeatureA1,
                        DepthAnythingFeatureA2, RefineViT, ResNet18DeconvA1,
                        ResNet18DeconvA2, TwinsFeatureEncoder)


class WAFTSequenceLoss:
    """waft_a1.py:78-106: gamma-weighted mean of the per-iteration NLL
    maps, masked by validity and finiteness."""

    def __init__(self, gamma: float, max_flow: float):
        self.gamma = gamma
        self.max_flow = max_flow

    def __call__(self, outputs, inputs):
        nf_preds = outputs["nf_preds"]  # (iters, B, H, W, 1)
        flow_gt = jnp.moveaxis(inputs["flows"][:, 0], -3, -1)
        valid = jnp.moveaxis(inputs["valids"][:, 0], -3, -1)
        mag = jnp.sqrt(jnp.sum(flow_gt ** 2, axis=-1, keepdims=True))
        valid = (valid >= 0.5) & (mag < self.max_flow)
        n = nf_preds.shape[0]
        loss = 0.0
        for i in range(n):
            nf = nf_preds[i]
            mask = (jnp.isfinite(jax.lax.stop_gradient(nf)) & valid
                    ).astype(nf.dtype)
            w = self.gamma ** (n - i - 1)
            loss = loss + w * jnp.sum(mask * jnp.nan_to_num(nf)) / \
                jnp.maximum(jnp.sum(mask), 1.0)
        return loss


class WAFTBase(BaseModel):
    def _nf_map(self, flow_pred, info_pred, flow_gt):
        """Per-pixel NLL (B, H, W, 1): logsumexp(weight) - sum over flow
        channels is NOT taken in the reference — it keeps (B, 1, H, W)
        via keepdim on the weight lse minus the per-channel lse summed
        over the mixture. Match exactly: result has one channel."""
        raw_b = info_pred[..., 2:]
        log_b = jnp.stack([
            jnp.clip(raw_b[..., 0], 0, self.var_max),
            jnp.clip(raw_b[..., 1], self.var_min, 0),
        ], axis=-1)
        weight = info_pred[..., :2]  # (B,H,W,2) mixture logits
        err = jnp.abs(flow_gt - flow_pred)  # (B,H,W,2) flow channels
        # term2[..., c, m]; term1[..., m]
        term2 = err[..., :, None] * jnp.exp(-log_b)[..., None, :]
        term1 = weight - math.log(2) - log_b
        # torch: logsumexp(term1.unsqueeze(1) - term2, dim=2) over mixture
        # -> (B, 2, H, W); minus from logsumexp(weight, keepdim) (B,1,H,W)
        # broadcasts to (B, 2, H, W)
        lse = jax.nn.logsumexp(term1[..., None, :] - term2, axis=-1)
        return jax.nn.logsumexp(weight, axis=-1, keepdims=True) - lse

    def _iterate(self, params, fmap1_2x, fmap2_2x, net, image_resizer,
                 training):
        n, h2, w2, _ = fmap1_2x.shape
        flow_2x = jnp.zeros((n, h2, w2, 2), fmap1_2x.dtype)
        grid = coords_grid(n, h2, w2, dtype=fmap1_2x.dtype)
        flow_preds = []
        info_preds = []
        for _ in range(self.iters):
            flow_2x = jax.lax.stop_gradient(flow_2x)
            coords2 = grid + flow_2x
            warp_2x = bilinear_sampler(fmap2_2x, coords2)
            refine_inp = self.warp_linear(
                params["warp_linear"],
                jnp.concatenate([fmap1_2x, warp_2x, net, flow_2x],
                                axis=-1))
            refine_outs = self.refine_net(params["refine_net"], refine_inp)
            net = self.refine_transform(
                params["refine_transform"],
                jnp.concatenate([refine_outs["out"], net], axis=-1))
            flow_update = self.flow_head(params["flow_head"], net)
            weight_update = 0.25 * self.upsample_weight(
                params["upsample_weight"], net)
            flow_2x = flow_2x + flow_update[..., :2]
            info_2x = flow_update[..., 2:]
            flow_up, info_up = convex_upsample_data(flow_2x, info_2x,
                                                    weight_update, 2)
            flow_up = self.postprocess_predictions(flow_up, image_resizer,
                                                   is_flow=True)
            info_up = self.postprocess_predictions(info_up, image_resizer,
                                                   is_flow=False)
            flow_preds.append(flow_up)
            info_preds.append(info_up)
        return flow_preds, info_preds

    def _outputs(self, flow_preds, info_preds, inputs, training):
        flow_up = flow_preds[-1]
        if training:
            flow_gt = jnp.moveaxis(inputs["flows"][:, 0], -3, -1)
            nf_preds = [self._nf_map(f, i, flow_gt)
                        for f, i in zip(flow_preds, info_preds)]
            return {
                "flows": self.nhwc_flow_to_output(flow_up),
                "flow_preds": jnp.stack(flow_preds),
                "info_preds": jnp.stack(info_preds),
                "nf_preds": jnp.stack(nf_preds),
            }
        return {"flows": self.nhwc_flow_to_output(flow_up)}

    def _heads(self, dim):
        self.warp_linear = nn.Conv2d(3 * dim + 2, dim, 1)
        self.refine_transform = nn.Conv2d(dim // 2 * 3, dim, 1)
        self.upsample_weight = nn.Sequential(
            nn.Conv2d(dim, 2 * dim, 3, padding=1), nn.relu,
            nn.Conv2d(2 * dim, 4 * 9, 1))
        self.flow_head = nn.Sequential(
            nn.Conv2d(dim, 2 * dim, 3, padding=1), nn.relu,
            nn.Conv2d(2 * dim, 6, 1))


class WAFTa1(WAFTBase):
    pretrained_checkpoints = {
        "chairs": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/waft-chairs-16b9cbc4.ckpt",
        "things": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/waft-things-24bd04dc.ckpt",
        "tar": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/waft-tar-48597867.ckpt",
        "tar-c-t": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/waft-tar-c-t-eaa5c133.ckpt",
    }
    frozen_prefixes = ("da_feature",)

    def __init__(self, dav2_backbone: str = "vits",
                 network_backbone: str = "vits", gamma: float = 0.8,
                 max_flow: float = 400, iters: int = 5,
                 var_min: float = 0, var_max: float = 10, **kwargs):
        super().__init__(output_stride=112,
                         loss_fn=WAFTSequenceLoss(gamma, max_flow),
                         **kwargs)
        self.iters = iters
        self.var_min = var_min
        self.var_max = var_max
        self.da_feature = DepthAnythingFeatureA1(dav2_backbone)
        self.pretrain_dim = VIT_CONFIGS[dav2_backbone]["features"]
        self.network_dim = VIT_CONFIGS[network_backbone]["features"]
        self.refine_net = RefineViT(network_backbone, self.network_dim,
                                    patch_size=8)
        self.fnet = ResNet18DeconvA1(self.pretrain_dim // 2 + 3, 64)
        self.fmap_conv = nn.Conv2d(self.pretrain_dim // 2 + 64,
                                   self.network_dim, 1)
        self.hidden_conv = nn.Conv2d(self.network_dim * 2, self.network_dim,
                                     1)
        self._heads(self.network_dim)

    def forward(self, params, inputs: Dict[str, Any],
                training: bool = False) -> Dict[str, jnp.ndarray]:
        images, image_resizer = self.preprocess_images(
            inputs["images"], bgr_add=[-0.406, -0.456, -0.485],
            bgr_mult=[1 / 0.225, 1 / 0.224, 1 / 0.229], bgr_to_rgb=True,
            resize_mode="pad", pad_mode="constant", pad_two_side=True)
        image1 = images[:, 0]
        image2 = images[:, 1]
        h, w = image1.shape[1:3]

        # frozen features never take gradients (waft_a1.py:183-189)
        da1 = jax.tree.map(jax.lax.stop_gradient, self.da_feature(
            params["da_feature"], image1))
        da2 = jax.tree.map(jax.lax.stop_gradient, self.da_feature(
            params["da_feature"], image2))
        f1 = self.fnet(params["fnet"],
                       jnp.concatenate([da1["out"], image1], axis=-1),
                       training=training)
        f2 = self.fnet(params["fnet"],
                       jnp.concatenate([da2["out"], image2], axis=-1),
                       training=training)
        from ...ops.grid_sample import interpolate
        da1_2x = interpolate(da1["out"], (h // 2, w // 2),
                             align_corners=True)
        da2_2x = interpolate(da2["out"], (h // 2, w // 2),
                             align_corners=True)
        fmap1_2x = self.fmap_conv(params["fmap_conv"],
                                  jnp.concatenate([f1[0], da1_2x], axis=-1))
        fmap2_2x = self.fmap_conv(params["fmap_conv"],
                                  jnp.concatenate([f2[0], da2_2x], axis=-1))
        net = self.hidden_conv(params["hidden_conv"],
                               jnp.concatenate([fmap1_2x, fmap2_2x],
                                               axis=-1))
        flow_preds, info_preds = self._iterate(params, fmap1_2x, fmap2_2x,
                                               net, image_resizer, training)
        return self._outputs(flow_preds, info_preds, inputs, training)


class WAFTa2(WAFTBase):
    frozen_prefixes = ()

    def __init__(self, feature_encoder: str = "twins",
                 iterative_module: str = "vits", gamma: float = 0.8,
                 max_flow: float = 400, iters: int = 5,
                 var_min: float = 0, var_max: float = 10, **kwargs):
        output_stride = 112 if feature_encoder == "dav2" else 64
        super().__init__(output_stride=output_stride,
                         loss_fn=WAFTSequenceLoss(gamma, max_flow),
                         **kwargs)
        self.iters = iters
        self.var_min = var_min
        self.var_max = var_max
        if feature_encoder == "twins":
            self.encoder = TwinsFeatureEncoder()
            self.frozen_prefixes = ("encoder.backbone",)
        elif feature_encoder == "dav2":
            self.encoder = DepthAnythingFeatureA2("vits", lvl=-3)
            self.frozen_prefixes = ("encoder.encoder",)
        elif feature_encoder == "dinov3":
            raise NotImplementedError(
                "DINOv3 weights are gated (request from Meta); the "
                "reference similarly requires a local thirdparty/dinov3 "
                "checkout (waft/backbone/dinov3.py:46-52)")
        else:
            raise ValueError(f"Unknown feature encoder: {feature_encoder}")
        self.pretrain_dim = self.encoder.output_dim
        self.fnet = ResNet18DeconvA2(3, self.pretrain_dim)
        self.iter_dim = VIT_CONFIGS[iterative_module]["features"]
        self.refine_net = RefineViT(iterative_module, self.iter_dim,
                                    patch_size=8)
        self.fmap_conv = nn.Conv2d(self.pretrain_dim * 2, self.iter_dim, 1)
        self.hidden_conv = nn.Conv2d(self.iter_dim * 2, self.iter_dim, 1)
        self._heads(self.iter_dim)

    def forward(self, params, inputs: Dict[str, Any],
                training: bool = False) -> Dict[str, jnp.ndarray]:
        images, image_resizer = self.preprocess_images(
            inputs["images"], bgr_add=[-0.406, -0.456, -0.485],
            bgr_mult=[1 / 0.225, 1 / 0.224, 1 / 0.229], bgr_to_rgb=True,
            resize_mode="pad", pad_mode="constant", pad_two_side=True)
        image1 = images[:, 0]
        image2 = images[:, 1]

        f1_pre = self.encoder(params["encoder"], image1, training=training)
        f2_pre = self.encoder(params["encoder"], image2, training=training)
        f1_img = self.fnet(params["fnet"], image1, training=training)[0]
        f2_img = self.fnet(params["fnet"], image2, training=training)[0]
        fmap1_2x = self.fmap_conv(params["fmap_conv"],
                                  jnp.concatenate([f1_pre, f1_img],
                                                  axis=-1))
        fmap2_2x = self.fmap_conv(params["fmap_conv"],
                                  jnp.concatenate([f2_pre, f2_img],
                                                  axis=-1))
        net = self.hidden_conv(params["hidden_conv"],
                               jnp.concatenate([fmap1_2x, fmap2_2x],
                                               axis=-1))
        flow_preds, info_preds = self._iterate(params, fmap1_2x, fmap2_2x,
                                               net, image_resizer, training)
        return self._outputs(flow_preds, info_preds, inputs, training)


@register_model
@trainable
@ptlflow_trained
class waft_dav2_a1(WAFTa1):
    pass


@register_model
@trainable
@ptlflow_trained
class waft_dav2_a2(WAFTa2):
    pretrained_checkpoints = {
        "sintel": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/waft_dav2_a2-sintel-b346e853.ckpt",
        "zero_shot": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/waft_dav2_a2-zero_shot-4d51a008.ckpt",
    }

    def __init__(self, feature_encoder="dav2", **kwargs):
        super().__init__(feature_encoder, **kwargs)


@register_model
@trainable
class waft_dinov3_a2(WAFTa2):
    def __init__(self, feature_encoder="dinov3", **kwargs):
        super().__init__(feature_encoder, **kwargs)


@register_model
@trainable
@ptlflow_trained
class waft_twins_a2(WAFTa2):
    pretrained_checkpoints = {
        "sintel": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/waft_twins_a2-sintel-c3348f5f.ckpt",
        "zero_shot": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/waft_twins_a2-zero_shot-f81e2579.ckpt",
    }

    def __init__(self, feature_encoder="twins", **kwargs):
        super().__init__(feature_encoder, **kwargs)
