"""UniMatch (GMFlow+) — unified dense matching with optional local
regression refinement (reference: ptlflow/models/unimatch/unimatch.py:52-496,
reg_refine.py:6-145, matching.py:126-186).

Shares the GMFlow backbone/transformer/matching/propagation modules
(ptlflow_tpu/models/gmflow) — the reference files are identical or
flow-path-identical (unimatch/backbone.py == gmflow/backbone.py; the
transformer's 1-D attention variants are stereo/depth-only and unused by
the registered flow models).  New here: the RAFT-style regression
refinement head and flow-conditioned local correlation.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp

from ... import nn
from ...ops.correlation import coords_grid
from ...ops.grid_sample import bilinear_sampler, interpolate
from ...ops.upsample import convex_upsample
from ...ops.warp import backward_warp
from ...utils.registry import register_model, trainable
from ..base.base_model import BaseModel
from ..gmflow.backbone import CNNEncoder
from ..gmflow.gmflow import (SequenceLoss, dispatch_global_matching,
                             local_correlation_softmax)
from ..gmflow.transformer import (FeatureFlowAttention, FeatureTransformer,
                                  feature_add_position)
from ..raft.update import FlowHead, SepConvGRU
from ...nn import Module


def local_correlation_with_flow(feature0, feature1, flow, local_radius,
                                dilation=1):
    """Correlation over a (2r+1)^2 window centered at coords+flow
    (reference matching.py:126-186); NHWC, returns (B, H, W, (2r+1)^2)."""
    b, h, w, c = feature0.shape
    r = local_radius
    n = 2 * r + 1
    coords = coords_grid(b, h, w, dtype=jnp.float32).reshape(b, h * w, 2)
    dr = jnp.linspace(-r, r, n, dtype=jnp.float32)
    wx, wy = jnp.meshgrid(dr, dr, indexing="ij")
    window = jnp.stack([wx, wy], axis=-1).transpose(1, 0, 2).reshape(-1, 2)
    sample_coords = coords[:, :, None, :] + window[None, None] * dilation
    sample_coords = sample_coords + flow.reshape(b, h * w, 1, 2)
    sc = sample_coords.reshape(b, h, w * n * n, 2)
    window_feature = bilinear_sampler(feature1, sc).reshape(b, h * w,
                                                            n * n, c)
    corr = jnp.einsum("blc,blkc->blk", feature0.reshape(b, h * w, c),
                      window_feature,
                      preferred_element_type=jnp.float32) / (c ** 0.5)
    return corr.reshape(b, h, w, n * n).astype(feature0.dtype)


class BasicMotionEncoder(Module):
    """reference reg_refine.py:73-95 (explicit corr/flow channel counts)."""

    def __init__(self, corr_channels=324, flow_channels=2):
        super().__init__()
        self.convc1 = nn.Conv2d(corr_channels, 256, 1)
        self.convc2 = nn.Conv2d(256, 192, 3, padding=1)
        self.convf1 = nn.Conv2d(flow_channels, 128, 7, padding=3)
        self.convf2 = nn.Conv2d(128, 64, 3, padding=1)
        self.conv = nn.Conv2d(64 + 192, 128 - flow_channels, 3, padding=1)

    def __call__(self, params, flow, corr, **kw):
        cor = nn.relu(self.convc1(params["convc1"], corr))
        cor = nn.relu(self.convc2(params["convc2"], cor))
        flo = nn.relu(self.convf1(params["convf1"], flow))
        flo = nn.relu(self.convf2(params["convf2"], flo))
        out = nn.relu(self.conv(params["conv"],
                                jnp.concatenate([cor, flo], axis=-1)))
        return jnp.concatenate([out, flow], axis=-1)


class BasicUpdateBlock(Module):
    """reference reg_refine.py:98-145."""

    def __init__(self, corr_channels=324, hidden_dim=128, context_dim=128,
                 downsample_factor=8, flow_dim=2, bilinear_up=False):
        super().__init__()
        self.encoder = BasicMotionEncoder(corr_channels, flow_dim)
        self.gru = SepConvGRU(hidden_dim=hidden_dim,
                              input_dim=context_dim + hidden_dim)
        self.flow_head = FlowHead(hidden_dim, hidden_dim=256)
        self.bilinear_up = bilinear_up
        if not bilinear_up:
            self.mask = nn.Sequential(
                nn.Conv2d(hidden_dim, 256, 3, padding=1), nn.relu,
                nn.Conv2d(256, downsample_factor ** 2 * 9, 1))

    def __call__(self, params, net, inp, corr, flow, **kw):
        motion_features = self.encoder(params["encoder"], flow, corr)
        inp = jnp.concatenate([inp, motion_features], axis=-1)
        net = self.gru(params["gru"], net, inp)
        delta_flow = self.flow_head(params["flow_head"], net)
        mask = None
        if not self.bilinear_up:
            mask = self.mask(params["mask"], net)
        return net, mask, delta_flow


class UniMatch(BaseModel):
    pretrained_checkpoints = {
        "mix": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/unimatch-mixdata-9d7c1e4d.ckpt",
        "things": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/unimatch-things-2433864a.ckpt",
    }

    def __init__(self, gamma: float = 0.9, max_flow: float = 400.0,
                 feature_channels: int = 128, num_scales: int = 1,
                 upsample_factor: int = 8, reg_refine: bool = False,
                 num_transformer_layers: int = 6, num_head: int = 1,
                 ffn_dim_expansion: int = 4, num_reg_refine: int = 1,
                 attn_type: str = "swin",
                 attn_splits_list: Sequence[int] = (2,),
                 corr_radius_list: Sequence[int] = (-1,),
                 prop_radius_list: Sequence[int] = (-1,), **kwargs):
        super().__init__(output_stride=32,
                         loss_fn=SequenceLoss(gamma, max_flow), **kwargs)
        self.feature_channels = feature_channels
        self.num_scales = num_scales
        self.upsample_factor = upsample_factor
        self.reg_refine = reg_refine
        self.num_reg_refine = num_reg_refine
        self.attn_splits_list = attn_splits_list
        self.corr_radius_list = corr_radius_list
        self.prop_radius_list = prop_radius_list

        self.backbone = CNNEncoder(output_dim=feature_channels,
                                   num_output_scales=num_scales)
        self.transformer = FeatureTransformer(
            num_layers=num_transformer_layers, d_model=feature_channels,
            nhead=num_head, attention_type=attn_type,
            ffn_dim_expansion=ffn_dim_expansion)
        self.feature_flow_attn = FeatureFlowAttention(
            in_channels=feature_channels)
        if not reg_refine:
            self.upsampler = nn.Sequential(
                nn.Conv2d(2 + feature_channels, 256, 3, 1, 1), nn.relu,
                nn.Conv2d(256, upsample_factor ** 2 * 9, 1, 1, 0))
        else:
            self.refine_proj = nn.Conv2d(128, 256, 1)
            self.refine = BasicUpdateBlock(
                corr_channels=(2 * 4 + 1) ** 2,
                downsample_factor=upsample_factor, flow_dim=2,
                bilinear_up=False)

    def _upsample_flow(self, params, flow, feature, bilinear=False,
                       upsample_factor=8):
        if bilinear:
            b, h, w, _ = flow.shape
            return upsample_factor * interpolate(
                flow, (h * upsample_factor, w * upsample_factor),
                mode="bilinear", align_corners=True)
        concat = jnp.concatenate([flow, feature], axis=-1)
        mask = self.upsampler(params["upsampler"], concat)
        return convex_upsample(flow, mask, factor=self.upsample_factor)

    def forward(self, params, inputs: Dict[str, Any],
                training: bool = False) -> Dict[str, jnp.ndarray]:
        images, image_resizer = self.preprocess_images(
            inputs["images"],
            bgr_add=(-0.406, -0.456, -0.485),
            bgr_mult=(1 / 0.225, 1 / 0.224, 1 / 0.229),
            bgr_to_rgb=True, resize_mode="pad", pad_mode="replicate",
            pad_two_side=True)
        img0 = images[:, 0]
        img1 = images[:, 1]

        both = jnp.concatenate([img0, img1], axis=0)
        features = self.backbone(params["backbone"], both)[::-1]
        feature0_list = [jnp.split(f, 2, axis=0)[0] for f in features]
        feature1_list = [jnp.split(f, 2, axis=0)[1] for f in features]

        flow_preds = []
        flow = None
        for scale_idx in range(self.num_scales):
            feature0 = feature0_list[scale_idx]
            feature1 = feature1_list[scale_idx]
            feature0_ori, feature1_ori = feature0, feature1
            upsample_factor = self.upsample_factor * (
                2 ** (self.num_scales - 1 - scale_idx))
            if scale_idx > 0:
                b, h, w, _ = flow.shape
                flow = 2 * interpolate(flow, (h * 2, w * 2), mode="bilinear",
                                       align_corners=True)
            if flow is not None:
                flow = jax.lax.stop_gradient(flow)
                feature1 = backward_warp(feature1, flow)

            attn_splits = self.attn_splits_list[scale_idx]
            corr_radius = self.corr_radius_list[scale_idx]
            prop_radius = self.prop_radius_list[scale_idx]

            feature0, feature1 = feature_add_position(
                feature0, feature1, attn_splits, self.feature_channels)
            feature0, feature1 = self.transformer(
                params["transformer"], feature0, feature1,
                attn_num_splits=attn_splits)

            if corr_radius == -1:
                flow_pred = dispatch_global_matching(self, feature0, feature1)
            else:
                flow_pred = local_correlation_softmax(feature0, feature1,
                                                      corr_radius)[0]
            flow = flow + flow_pred if flow is not None else flow_pred

            if training:
                fb = self._upsample_flow(params, flow, None, bilinear=True,
                                         upsample_factor=upsample_factor)
                flow_preds.append(self.postprocess_predictions(
                    fb, image_resizer, is_flow=True))

            flow = self.feature_flow_attn(
                params["feature_flow_attn"], feature0,
                jax.lax.stop_gradient(flow),
                local_window_attn=prop_radius > 0,
                local_window_radius=prop_radius)

            if training and scale_idx < self.num_scales - 1:
                fu = self._upsample_flow(params, flow, feature0,
                                         bilinear=True,
                                         upsample_factor=upsample_factor)
                flow_preds.append(self.postprocess_predictions(
                    fu, image_resizer, is_flow=True))

            if scale_idx == self.num_scales - 1:
                if not self.reg_refine:
                    flow_up = self._upsample_flow(params, flow, feature0)
                    flow_up = self.postprocess_predictions(
                        flow_up, image_resizer, is_flow=True)
                    flow_preds.append(flow_up)
                else:
                    if training:
                        fu = self._upsample_flow(
                            params, flow, feature0, bilinear=True,
                            upsample_factor=upsample_factor)
                        flow_preds.append(self.postprocess_predictions(
                            fu, image_resizer, is_flow=True))
                    # the reference recomputes net/inp from feature0 at
                    # EVERY refinement iteration (unimatch.py:331-336) —
                    # the GRU hidden state is not carried across iterations
                    proj = self.refine_proj(params["refine_proj"], feature0)
                    net0, inp = jnp.split(proj, 2, axis=-1)
                    net0 = jnp.tanh(net0)
                    inp = nn.relu(inp)

                    # The reference re-gathers an 81-tap bilinear window of
                    # feature1 at coords+flow EVERY refinement iteration
                    # (matching.py:126-186) — 6 x 36 ms of gathers on v5e.
                    # TPU build: the features are loop-invariant, so build
                    # the all-pairs volume once (one MXU matmul; identical
                    # math, dot commutes with bilinear interp) and per
                    # iteration run the tuned one-hot corr lookup, exactly
                    # like RAFT.  Lookup emits x-major window order; the
                    # reference's window is y-major — swap the window axes.
                    from ...ops.correlation import (build_corr_pyramid,
                                                    make_corr_lookup)
                    rr = 4
                    nn_ = 2 * rr + 1
                    vol = build_corr_pyramid(feature0_ori, feature1_ori,
                                             num_levels=1)
                    ref_lookup = make_corr_lookup(vol, rr)
                    bb, hh, ww, _ = feature0_ori.shape
                    grid = coords_grid(bb, hh, ww, dtype=jnp.float32)

                    def step(flow, _):
                        flow = jax.lax.stop_gradient(flow)
                        correlation = ref_lookup(grid + flow)
                        correlation = correlation.reshape(
                            bb, hh, ww, nn_, nn_).swapaxes(-1, -2).reshape(
                            bb, hh, ww, nn_ * nn_).astype(feature0_ori.dtype)
                        _, up_mask, residual_flow = self.refine(
                            params["refine"], net0, inp, correlation, flow)
                        flow = flow + residual_flow
                        fu = convex_upsample(flow, up_mask,
                                             factor=self.upsample_factor)
                        fu = self.postprocess_predictions(
                            fu, image_resizer, is_flow=True)
                        return flow, fu

                    flow, fus = jax.lax.scan(
                        step, flow, None, length=self.num_reg_refine)
                    if training:
                        flow_preds.extend(
                            fus[i] for i in range(self.num_reg_refine))
                    else:
                        flow_preds.append(fus[-1])

        outputs = {"flows": self.nhwc_flow_to_output(flow_preds[-1])}
        if training:
            outputs["flow_preds"] = jnp.stack(flow_preds)
        else:
            outputs["flow_small"] = flow
        return outputs


class UniMatchScale2(UniMatch):
    pretrained_checkpoints = {
        "mix": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/unimatch_scale2-mixdata-b514dde2.ckpt",
        "things": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/unimatch_scale2-things-e75ae2f7.ckpt",
        "sintel": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/unimatch_scale2-sintel-f43b76ab.ckpt",
    }

    def __init__(self, num_scales: int = 2, upsample_factor: int = 4,
                 attn_splits_list: Sequence[int] = (2, 8),
                 corr_radius_list: Sequence[int] = (-1, 4),
                 prop_radius_list: Sequence[int] = (-1, 1), **kwargs):
        super().__init__(num_scales=num_scales,
                         upsample_factor=upsample_factor,
                         attn_splits_list=attn_splits_list,
                         corr_radius_list=corr_radius_list,
                         prop_radius_list=prop_radius_list, **kwargs)


class UniMatchScale2With6Refinements(UniMatch):
    pretrained_checkpoints = {
        "mix": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/unimatch_scale2_refine6-mixdata-398760b1.ckpt",
        "things": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/unimatch_scale2_refine6-things-54d7505b.ckpt",
        "sintel": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/unimatch_scale2_refine6-sintel-95ab1410.ckpt",
        "kitti": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/unimatch_scale2_refine6-kitti-0626279a.ckpt",
    }

    def __init__(self, num_scales: int = 2, upsample_factor: int = 4,
                 reg_refine: bool = True, num_reg_refine: int = 6,
                 attn_splits_list: Sequence[int] = (2, 8),
                 corr_radius_list: Sequence[int] = (-1, 4),
                 prop_radius_list: Sequence[int] = (-1, 1), **kwargs):
        super().__init__(num_scales=num_scales,
                         upsample_factor=upsample_factor,
                         reg_refine=reg_refine,
                         num_reg_refine=num_reg_refine,
                         attn_splits_list=attn_splits_list,
                         corr_radius_list=corr_radius_list,
                         prop_radius_list=prop_radius_list, **kwargs)


@register_model
@trainable
class unimatch(UniMatch):
    pass


@register_model
@trainable
class unimatch_sc2(UniMatchScale2):
    pass


@register_model
@trainable
class unimatch_sc2_ref6(UniMatchScale2With6Refinements):
    pass


@register_model
@trainable
class gmflow_p(UniMatch):
    pass


@register_model
@trainable
class gmflow_p_sc2(UniMatchScale2):
    pass


@register_model
@trainable
class gmflow_p_sc2_ref6(UniMatchScale2With6Refinements):
    pass
