"""RAPIDFlow — recurrent pyramid flow with a single shared NeXt1D stage
(reference: ptlflow/models/rapidflow/rapidflow.py:71-512, update.py:32-152).

TPU design notes:
- The per-level refinement loop runs under ``lax.scan`` (static iteration
  count per level); the Python loop over pyramid levels stays unrolled since
  shapes change between levels.
- The all-pairs correlation block reuses the MXU one-hot-matmul lookup from
  :mod:`ptlflow_tpu.ops.correlation`, replacing both CorrBlock and
  alt_cuda_corr (reference corr.py:32-138).
- Flows are carried in level-local pixel units exactly like the reference
  (pwc_modules.rescale_flow) and rescaled to image units only for outputs.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ... import nn
from ...nn import Module
from ...ops.correlation import CorrBlock, coords_grid
from ...ops.grid_sample import interpolate
from ...ops.upsample import convex_upsample
from ...ops.warp import forward_interpolate
from ...utils.registry import register_model, trainable, ptlflow_trained
from ..base.base_model import BaseModel
from ..raft.raft import SequenceLoss
from .next1d import Next1dEncoder, Next1dStage


def rescale_flow(flow, width_im, height_im, to_local=True):
    """Convert flow between image-pixel and level-local pixel units
    (reference pwc_modules.py:33-45); flow is NHWC (B, H, W, 2)."""
    h, w = flow.shape[1], flow.shape[2]
    if to_local:
        scale = (w / width_im, h / height_im)
    else:
        scale = (width_im / w, height_im / h)
    return flow * jnp.asarray(scale, flow.dtype)


class FlowHead(Module):
    def __init__(self, input_dim=128, hidden_dim=256):
        super().__init__()
        self.conv1 = nn.Conv2d(input_dim, hidden_dim, 3, padding=1)
        self.conv2 = nn.Conv2d(hidden_dim, 2, 3, padding=1)

    def __call__(self, params, x, **kw):
        return self.conv2(params["conv2"],
                          nn.relu(self.conv1(params["conv1"], x)))


class MotionEncoder(Module):
    """reference update.py:73-97."""

    def __init__(self, corr_levels, corr_range, dec_motion_chs):
        super().__init__()
        cor_planes = corr_levels * (2 * corr_range + 1) ** 2
        self.convc1 = nn.Conv2d(cor_planes, 256, 1)
        self.convc2 = nn.Conv2d(256, 192, 3, padding=1)
        self.convf1 = nn.Conv2d(2, 128, 7, padding=3)
        self.convf2 = nn.Conv2d(128, 64, 3, padding=1)
        self.conv = nn.Conv2d(64 + 192, dec_motion_chs - 2, 3, padding=1)

    def __call__(self, params, flow, corr, **kw):
        cor = nn.relu(self.convc1(params["convc1"], corr))
        cor = nn.relu(self.convc2(params["convc2"], cor))
        flo = nn.relu(self.convf1(params["convf1"], flow))
        flo = nn.relu(self.convf2(params["convf2"], flo))
        out = nn.relu(self.conv(params["conv"],
                                jnp.concatenate([cor, flo], axis=-1)))
        return jnp.concatenate([out, flow], axis=-1)


class Next1dDecoder(Module):
    """NeXt1D GRU replacement: stage + tanh (reference update.py:43-70)."""

    def __init__(self, hidden_dim, input_dim, ksize=7, depth=1,
                 mlp_ratio=4.0, fuse_next1d_weights=False):
        super().__init__()
        self.conv = Next1dStage(
            hidden_dim + input_dim, hidden_dim, kernel_size=ksize, stride=1,
            depth=depth, mlp_ratio=mlp_ratio,
            fuse_next1d_weights=fuse_next1d_weights)

    def __call__(self, params, h, x, **kw):
        return jnp.tanh(self.conv(params["conv"],
                                  jnp.concatenate([h, x], axis=-1)))


class UpdateBlock(Module):
    """reference update.py:100-152."""

    def __init__(self, pyramid_ranges, corr_levels, corr_range, dec_net_chs,
                 dec_inp_chs, dec_motion_chs, dec_depth, dec_mlp_ratio,
                 fuse_next1d_weights, use_upsample_mask):
        super().__init__()
        self.use_upsample_mask = use_upsample_mask
        self.encoder = MotionEncoder(corr_levels, corr_range, dec_motion_chs)
        self.decoder = Next1dDecoder(
            dec_net_chs, dec_motion_chs + dec_inp_chs, ksize=7,
            depth=dec_depth, mlp_ratio=dec_mlp_ratio,
            fuse_next1d_weights=fuse_next1d_weights)
        self.flow_head = FlowHead(dec_net_chs, hidden_dim=256)
        pred_stride = min(8, min(pyramid_ranges)) if use_upsample_mask else 8
        self.mask = nn.Sequential(
            nn.Conv2d(dec_net_chs, dec_net_chs * 2, 3, padding=1),
            nn.relu,
            nn.Conv2d(dec_net_chs * 2, pred_stride ** 2 * 9, 1))

    def __call__(self, params, net, inp, corr, flow, get_mask=False, **kw):
        motion_features = self.encoder(params["encoder"], flow, corr)
        inp = jnp.concatenate([inp, motion_features], axis=-1)
        net = self.decoder(params["decoder"], net, inp)
        delta_flow = self.flow_head(params["flow_head"], net)
        mask = None
        if self.use_upsample_mask and get_mask:
            mask = self.mask(params["mask"], net)
        return delta_flow, net, mask


class RAPIDFlow(BaseModel):
    pretrained_checkpoints = {
        "chairs": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/rapidflow-chairs-9c8c182a.ckpt",
        "things": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/rapidflow-things-0377c8fa.ckpt",
        "sintel": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/rapidflow-sintel-89a21262.ckpt",
        "kitti": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/rapidflow-kitti-2561329f.ckpt",
    }

    def __init__(self, pyramid_ranges: Tuple[int, int] = (32, 8),
                 iters: int = 12, corr_levels: int = 1, corr_range: int = 4,
                 enc_hidden_chs: int = 64, enc_out_chs: int = 128,
                 enc_stem_stride: int = 4, enc_mlp_ratio: float = 4.0,
                 enc_depth: int = 4, dec_net_chs: int = 64,
                 dec_inp_chs: int = 64, dec_motion_chs: int = 128,
                 dec_depth: int = 2, dec_mlp_ratio: float = 4.0,
                 use_upsample_mask: bool = True,
                 fuse_next1d_weights: bool = False, gamma: float = 0.8,
                 max_flow: float = 400.0, **kwargs):
        num_recurrent_layers = int(math.log2(max(pyramid_ranges))) - 1
        super().__init__(output_stride=int(2 ** (num_recurrent_layers + 1)),
                         loss_fn=SequenceLoss(gamma, max_flow), **kwargs)
        self.pyramid_ranges = pyramid_ranges
        self.iters = iters
        self.corr_levels = corr_levels
        self.corr_range = corr_range
        self.dec_net_chs = dec_net_chs
        self.dec_inp_chs = dec_inp_chs
        self.use_upsample_mask = use_upsample_mask
        # level index (coarsest-first) of each endpoint of the range
        self.pyramid_levels = [
            num_recurrent_layers + 1 - int(math.log2(v))
            for v in pyramid_ranges]
        self.pred_stride = min(8, min(pyramid_ranges))

        max_pyr_range = (min(pyramid_ranges), max(pyramid_ranges))
        enc_kw = dict(max_pyr_range=max_pyr_range,
                      stem_stride=enc_stem_stride,
                      num_recurrent_layers=num_recurrent_layers,
                      hidden_chs=enc_hidden_chs, out_chs=enc_out_chs,
                      mlp_ratio=enc_mlp_ratio, depth=enc_depth,
                      fuse_next1d_weights=fuse_next1d_weights)
        self.fnet = Next1dEncoder(**enc_kw)
        self.cnet = Next1dEncoder(**enc_kw)
        self.update_block = UpdateBlock(
            pyramid_ranges=pyramid_ranges, corr_levels=corr_levels,
            corr_range=corr_range, dec_net_chs=dec_net_chs,
            dec_inp_chs=dec_inp_chs, dec_motion_chs=dec_motion_chs,
            dec_depth=dec_depth, dec_mlp_ratio=dec_mlp_ratio,
            fuse_next1d_weights=fuse_next1d_weights,
            use_upsample_mask=use_upsample_mask)
        self.upnet_layer = nn.Sequential(
            nn.Conv2d(2 * dec_net_chs, dec_net_chs, 1),
            nn.relu,
            Next1dStage(dec_net_chs, dec_net_chs, stride=1, depth=2,
                        mlp_ratio=dec_mlp_ratio,
                        fuse_next1d_weights=fuse_next1d_weights))

    def _upsample_flow(self, out_flow, mask):
        # reference upsample_flow (rapidflow.py:213-224) does NOT pre-scale
        # the flow values (they are already in image units); convex_upsample
        # multiplies by the factor, so divide first (exact for powers of 2).
        f = self.pred_stride
        return convex_upsample(out_flow / f, mask, f)

    def forward(self, params, inputs: Dict[str, Any],
                training: bool = False) -> Dict[str, jnp.ndarray]:
        images, image_resizer = self.preprocess_images(
            inputs["images"], bgr_add=-0.5, bgr_mult=2.0, bgr_to_rgb=False,
            resize_mode="pad", pad_mode="replicate", pad_two_side=True)
        x1_raw = images[:, 0]
        x2_raw = images[:, 1]
        b, height_im, width_im, _ = x1_raw.shape

        x_pyr = self.fnet(params["fnet"],
                          jnp.concatenate([x1_raw, x2_raw], axis=0))
        cnet_pyr = self.cnet(params["cnet"], x1_raw)

        start_level, output_level = self.pyramid_levels
        pyr1 = [x[:b] for x in x_pyr][start_level:output_level + 1]
        pyr2 = [x[b:] for x in x_pyr][start_level:output_level + 1]
        pyr_cnet = cnet_pyr[start_level:output_level + 1]
        num_levels = output_level - start_level + 1
        iters_per_level = int(math.ceil(self.iters / num_levels))

        # warm start from the previous frame's flow (rapidflow.py:274-290)
        h0, w0 = pyr1[0].shape[1], pyr1[0].shape[2]
        prev = inputs.get("prev_preds")
        prev_flows = (prev or {}).get("flows") if prev is not None \
            else inputs.get("prev_flows")
        if prev_flows is not None:
            pf = prev_flows[:, 0] if prev_flows.ndim == 5 else prev_flows
            if pf.shape[-1] != 2:
                pf = jnp.moveaxis(pf, -3, -1)
            flow = interpolate(pf, (h0, w0), align_corners=True)
            flow = rescale_flow(flow, width_im, height_im, to_local=True)
            flow = forward_interpolate(flow)
        else:
            flow = jnp.zeros((b, h0, w0, 2), x1_raw.dtype)

        flow_preds = []
        net = None
        for l, (x1, x2, cnet_feat) in enumerate(zip(pyr1, pyr2, pyr_cnet)):
            h, w = x1.shape[1], x1.shape[2]
            coords0 = coords_grid(b, h, w, dtype=x1.dtype)
            corr_fn = CorrBlock(x1, x2, num_levels=self.corr_levels,
                                radius=self.corr_range)
            net_tmp = jnp.tanh(cnet_feat[..., :self.dec_net_chs])
            inp = nn.relu(
                cnet_feat[..., self.dec_net_chs:
                          self.dec_net_chs + self.dec_inp_chs])
            if net is None:
                net = net_tmp
            else:
                net = interpolate(net, (h, w), align_corners=True)
                gate = jax.nn.sigmoid(self.upnet_layer(
                    params["upnet_layer"],
                    jnp.concatenate([net, net_tmp], axis=-1)))
                net = gate * net + (1.0 - gate) * net_tmp
            if l > 0:
                flow = rescale_flow(flow, w, h, to_local=False)
                flow = interpolate(flow, (h, w), align_corners=True)

            is_output_level = l == num_levels - 1

            def step(carry, _, corr_fn=corr_fn, coords0=coords0,
                     is_output_level=is_output_level, h=h, w=w):
                flow, net = carry
                flow = jax.lax.stop_gradient(flow)
                corr = corr_fn(coords0 + flow)
                delta, net, mask = self.update_block(
                    params["update_block"], net, inp, corr, flow,
                    get_mask=training and self.use_upsample_mask)
                flow = flow + delta
                y = None
                if training:
                    out_flow = rescale_flow(flow, width_im, height_im,
                                            to_local=False)
                    if mask is not None and is_output_level:
                        out_flow = self._upsample_flow(out_flow, mask)
                    y = interpolate(out_flow, (height_im, width_im),
                                    align_corners=True)
                return (flow, net), y

            (flow, net), ys = jax.lax.scan(
                step, (flow, net), None, length=iters_per_level)
            if training:
                flow_preds.extend(ys[i] for i in range(iters_per_level))

        if training:
            flow_preds = [self.postprocess_predictions(f, image_resizer,
                                                       is_flow=True)
                          for f in flow_preds]
            final = flow_preds[-1]
        else:
            out_flow = rescale_flow(flow, width_im, height_im,
                                    to_local=False)
            if self.use_upsample_mask:
                mask = self.update_block.mask(
                    params["update_block"]["mask"], net)
                out_flow = self._upsample_flow(out_flow, mask)
            out_flow = interpolate(out_flow, (height_im, width_im),
                                   align_corners=True)
            final = self.postprocess_predictions(out_flow, image_resizer,
                                                 is_flow=True)

        outputs = {"flows": self.nhwc_flow_to_output(final)}
        if training:
            outputs["flow_preds"] = jnp.stack(flow_preds)
        return outputs


class RAPIDFlow_it1(RAPIDFlow):
    def __init__(self, pyramid_ranges=(32, 32), iters=1, **kwargs):
        super().__init__(pyramid_ranges, iters, **kwargs)


class RAPIDFlow_it2(RAPIDFlow):
    def __init__(self, pyramid_ranges=(32, 16), iters=2, **kwargs):
        super().__init__(pyramid_ranges, iters, **kwargs)


class RAPIDFlow_it3(RAPIDFlow):
    def __init__(self, pyramid_ranges=(32, 8), iters=3, **kwargs):
        super().__init__(pyramid_ranges, iters, **kwargs)


class RAPIDFlow_it6(RAPIDFlow):
    def __init__(self, pyramid_ranges=(32, 8), iters=6, **kwargs):
        super().__init__(pyramid_ranges, iters, **kwargs)


@register_model
@trainable
@ptlflow_trained
class rapidflow(RAPIDFlow):
    pass


@register_model
@trainable
@ptlflow_trained
class rapidflow_it1(RAPIDFlow_it1):
    pass


@register_model
@trainable
@ptlflow_trained
class rapidflow_it2(RAPIDFlow_it2):
    pass


@register_model
@trainable
@ptlflow_trained
class rapidflow_it3(RAPIDFlow_it3):
    pass


@register_model
@trainable
@ptlflow_trained
class rapidflow_it6(RAPIDFlow_it6):
    pass
