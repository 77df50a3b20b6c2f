"""VideoFlow — multi-frame bidirectional flow (BOF: 3 frames, MOF: N frames)
(reference: ptlflow/models/videoflow/videoflow_bof.py:18-235,
videoflow_mof.py:15-371, Networks/BOFNet/sk2.py, Networks/MOFNetStack/stack.py).

Reuses the Twins-SVT backbone (flowformer), GMA attention/aggregation, the
SKFlow PCBlock and the MXU corr-pyramid lookup.  The recurrent decoder runs
under ``lax.scan``; the MOF temporal hidden state is a scan carry.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ... import nn
from ...nn import Module
from ...ops.correlation import CorrBlock, coords_grid
from ...ops.grid_sample import bilinear_sampler
from ...ops.upsample import convex_upsample
from ...utils.registry import register_model
from ..base.base_model import BaseModel
from ..flowformer.twins_tpu import twins_svt_large
from ..gma.gma_utils import Aggregate, Attention
from ..skflow.skflow import PCBlock4_Deep_nopool_res


class SKMotionEncoderBOF(Module):
    """Dual-direction SK motion encoder (BOFNet/sk2.py:40-67)."""

    def __init__(self, corr_radius, corr_levels, cost_heads_num, k_conv):
        super().__init__()
        self.cor_planes = (corr_radius * 2 + 1) ** 2 * cost_heads_num * \
            corr_levels
        self.convc1 = PCBlock4_Deep_nopool_res(self.cor_planes, 128, k_conv)
        self.convc2 = PCBlock4_Deep_nopool_res(256, 192, k_conv)
        self.convf1_ = nn.Conv2d(4, 128, 1, 1, 0)
        self.convf2 = PCBlock4_Deep_nopool_res(128, 64, k_conv)
        self.conv = PCBlock4_Deep_nopool_res(64 + 192, 128 - 4, k_conv)

    def __call__(self, params, flow, corr, **kw):
        corr1 = corr[..., :self.cor_planes]
        corr2 = corr[..., self.cor_planes:]
        cor = nn.gelu(jnp.concatenate(
            [self.convc1(params["convc1"], corr1),
             self.convc1(params["convc1"], corr2)], axis=-1))
        cor = self.convc2(params["convc2"], cor)
        flo = self.convf1_(params["convf1_"], flow)
        flo = self.convf2(params["convf2"], flo)
        out = self.conv(params["conv"],
                        jnp.concatenate([cor, flo], axis=-1))
        return jnp.concatenate([out, flow], axis=-1)


class SKUpdateBlockBOF(Module):
    """BOFNet/sk2.py:70-110 (GMA-SK2)."""

    def __init__(self, corr_radius, corr_levels, cost_heads_num, hidden_dim):
        super().__init__()
        k_conv = [1, 15]
        PCUpdater_conv = [1, 7]
        self.encoder = SKMotionEncoderBOF(corr_radius, corr_levels,
                                          cost_heads_num, k_conv)
        self.gru = PCBlock4_Deep_nopool_res(
            128 + hidden_dim + hidden_dim + 128, 128, PCUpdater_conv)
        self.flow_head = PCBlock4_Deep_nopool_res(128, 4, k_conv)
        self.mask = nn.Sequential(
            nn.Conv2d(128, 256, 3, padding=1), nn.relu,
            nn.Conv2d(256, 64 * 9 * 2, 1, padding=0))
        self.aggregator = Aggregate(dim=128, dim_head=128, heads=1)

    def __call__(self, params, net, inp, corr, flow, attention,
                 get_mask=True, **kw):
        motion_features = self.encoder(params["encoder"], flow, corr)
        motion_global = self.aggregator(params["aggregator"], attention,
                                        motion_features)
        inp_cat = jnp.concatenate([inp, motion_features, motion_global],
                                  axis=-1)
        net = self.gru(params["gru"],
                       jnp.concatenate([net, inp_cat], axis=-1))
        delta_flow = self.flow_head(params["flow_head"], net)
        mask = None
        if get_mask:
            mask = 0.25 * self.mask(params["mask"], net)
        return net, mask, delta_flow


class VideoFlowBOF(BaseModel):
    pretrained_checkpoints = {
        "things_288960": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/videoflow_bof-things_288960noise-d581490a.ckpt",
        "sintel": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/videoflow_bof-sintel-c2010097.ckpt",
        "kitti": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/videoflow_bof-kitti-fa9af79c.ckpt",
    }

    def __init__(self, corr_levels: int = 4, corr_radius: int = 4,
                 gma: str = "GMA-SK2", decoder_depth: int = 32,
                 cost_heads_num: int = 1, **kwargs):
        super().__init__(loss_fn=None, output_stride=8, **kwargs)
        assert gma == "GMA-SK2", "only the published GMA-SK2 configuration"
        self.corr_levels = corr_levels
        self.corr_radius = corr_radius
        self.decoder_depth = decoder_depth
        self.hidden_dim = 128
        self.context_dim = 128
        self.cnet = twins_svt_large()
        self.fnet = twins_svt_large()
        self.update_block = SKUpdateBlockBOF(
            corr_radius=corr_radius, corr_levels=corr_levels,
            cost_heads_num=cost_heads_num, hidden_dim=128)
        self.att = Attention(dim=128, heads=1, max_pos_size=160,
                             dim_head=128)

    def _pad_frames(self, images):
        if images.shape[1] == 2:
            images = jnp.concatenate([images[:, :1], images], axis=1)
        assert images.shape[1] == 3, "videoflow_bof takes 3 frames"
        return images

    def forward(self, params, inputs: Dict[str, Any],
                training: bool = False) -> Dict[str, jnp.ndarray]:
        images = self._pad_frames(inputs["images"])
        images, image_resizer = self.preprocess_images(
            images, bgr_add=-0.5, bgr_mult=2.0, bgr_to_rgb=True,
            resize_mode="pad", pad_mode="replicate", pad_two_side=True)
        b, n, h, w, _ = images.shape

        fmaps = self.fnet(params["fnet"],
                          images.reshape(b * n, h, w, 3))
        hf, wf = fmaps.shape[1], fmaps.shape[2]
        fmaps = fmaps.reshape(b, n, hf, wf, -1)
        corr_fn_21 = CorrBlock(fmaps[:, 1], fmaps[:, 0],
                               num_levels=self.corr_levels,
                               radius=self.corr_radius)
        corr_fn_23 = CorrBlock(fmaps[:, 1], fmaps[:, 2],
                               num_levels=self.corr_levels,
                               radius=self.corr_radius)

        cnet = self.cnet(params["cnet"], images[:, 1])
        net = jnp.tanh(cnet[..., :self.hidden_dim])
        inp = nn.relu(cnet[..., self.hidden_dim:])
        attention = self.att(params["att"], inp)

        coords0 = coords_grid(b, hf, wf, dtype=images.dtype)
        flow21 = jnp.zeros((b, hf, wf, 2), images.dtype)
        flow23 = jnp.zeros((b, hf, wf, 2), images.dtype)

        def step(carry, _):
            in_dtypes = tuple(c.dtype for c in carry)
            flow23, flow21, net = carry
            flow23 = jax.lax.stop_gradient(flow23)
            flow21 = jax.lax.stop_gradient(flow21)
            corr21 = corr_fn_21(coords0 + flow21)
            corr23 = corr_fn_23(coords0 + flow23)
            corr = jnp.concatenate([corr23, corr21], axis=-1)
            flow = jnp.concatenate([flow23, flow21], axis=-1)
            net, up_mask, delta = self.update_block(
                params["update_block"], net, inp, corr, flow, attention,
                get_mask=training)
            flow23 = flow23 + delta[..., 0:2]
            flow21 = flow21 + delta[..., 2:4]
            ys = None
            if training:
                # channel order: [mask_21 (first 576), mask_23]
                mask21 = up_mask[..., :64 * 9]
                mask23 = up_mask[..., 64 * 9:]
                up23 = self.postprocess_predictions(
                    convex_upsample(flow23, mask23, 8), image_resizer,
                    is_flow=True)
                up21 = self.postprocess_predictions(
                    convex_upsample(flow21, mask21, 8), image_resizer,
                    is_flow=True)
                ys = (up23, up21)
            # pin carry dtypes: mixed-precision runs can upcast inside the
            # body, and lax.scan requires input/output carry types to match
            out = tuple(x.astype(d) for x, d in
                        zip((flow23, flow21, net), in_dtypes))
            return out, ys

        (flow23, flow21, net), ys = jax.lax.scan(
            step, (flow23, flow21, net), None, length=self.decoder_depth)

        if training:
            flow_preds = jnp.stack(
                [jnp.stack([ys[0][i], ys[1][i]], axis=1)
                 for i in range(self.decoder_depth)])
            up23 = ys[0][-1]
            up21 = ys[1][-1]
            return {"flows": self.nhwc_flow_to_output(up23),
                    "flows_bw": self.nhwc_flow_to_output(up21),
                    "flow_preds": flow_preds}
        up_mask = 0.25 * self.update_block.mask(
            params["update_block"]["mask"], net)
        mask21 = up_mask[..., :64 * 9]
        mask23 = up_mask[..., 64 * 9:]
        up23 = self.postprocess_predictions(
            convex_upsample(flow23, mask23, 8), image_resizer, is_flow=True)
        up21 = self.postprocess_predictions(
            convex_upsample(flow21, mask21, 8), image_resizer, is_flow=True)
        return {"flows": self.nhwc_flow_to_output(up23),
                "flows_bw": self.nhwc_flow_to_output(up21),
                "flow_small": flow23, "flow_bw_small": flow21}


# --------------------------------------------------------------------- MOF

class VelocityUpdateBlock(Module):
    """Defined (and checkpointed) but unused by the reference forward
    (MOFNetStack/stack.py:42-54); kept for state_dict parity."""

    def __init__(self, c_in=43 + 128 + 43, c_out=43, c_hidden=64):
        super().__init__()
        self.mlp = nn.Sequential(
            nn.Conv2d(c_in, c_hidden, 3, padding=1), nn.gelu,
            nn.Conv2d(c_hidden, c_hidden, 3, padding=1), nn.gelu,
            nn.Conv2d(c_hidden, c_out, 3, padding=1))

    def __call__(self, params, x, **kw):
        return self.mlp(params["mlp"], x)


class SKMotionEncoderMOF(Module):
    """Temporal motion encoder with a 48-ch hidden state per frame
    (MOFNetStack/stack.py:57-155)."""

    def __init__(self, corr_radius, corr_levels, cost_heads_num, k_conv):
        super().__init__()
        self.cor_planes = (corr_radius * 2 + 1) ** 2 * cost_heads_num * \
            corr_levels
        self.convc1 = PCBlock4_Deep_nopool_res(self.cor_planes, 128, k_conv)
        self.convc2 = PCBlock4_Deep_nopool_res(256, 192, k_conv)
        self.convf1_ = nn.Conv2d(4, 128, 1, 1, 0)
        self.convf2 = PCBlock4_Deep_nopool_res(128, 64, k_conv)
        self.conv = PCBlock4_Deep_nopool_res(64 + 192 + 48 * 3, 128 - 4 + 48,
                                             k_conv)
        self.velocity_update_block = VelocityUpdateBlock()

    def init(self, key):
        params = super().init(key)
        params["init_hidden_state"] = jax.random.normal(
            key, (1, 1, 1, 1, 48), dtype=jnp.float32)
        return params

    def _torch_leaves(self):
        # torch shape (1, 1, 48, 1, 1) -> (1, 1, 1, 1, 48)
        return {"init_hidden_state":
                lambda p: np.transpose(p, (0, 1, 3, 4, 2))}

    def __call__(self, params, motion_hidden_state, forward_flow,
                 backward_flow, coords0, forward_corr, backward_corr, bs,
                 **kw):
        bn, h, w, _ = forward_flow.shape
        n = bn // bs
        if motion_hidden_state is None:
            motion_hidden_state = jnp.tile(
                params["init_hidden_state"], (bs, n, h, w, 1))
        else:
            motion_hidden_state = motion_hidden_state.reshape(bs, n, h, w,
                                                              48)
        forward_loc = forward_flow + coords0
        backward_loc = backward_flow + coords0
        zeros = jnp.zeros((bs, 1, h, w, 48), motion_hidden_state.dtype)
        fwd_mhs = jnp.concatenate(
            [motion_hidden_state[:, 1:], zeros], axis=1).reshape(bn, h, w,
                                                                 48)
        fwd_mhs = bilinear_sampler(fwd_mhs, forward_loc)
        bwd_mhs = jnp.concatenate(
            [zeros, motion_hidden_state[:, :n - 1]], axis=1).reshape(
                bn, h, w, 48)
        bwd_mhs = bilinear_sampler(bwd_mhs, backward_loc)

        cor = nn.gelu(jnp.concatenate(
            [self.convc1(params["convc1"], forward_corr),
             self.convc1(params["convc1"], backward_corr)], axis=-1))
        cor = self.convc2(params["convc2"], cor)
        flow = jnp.concatenate([forward_flow, backward_flow], axis=-1)
        flo = self.convf1_(params["convf1_"], flow)
        flo = self.convf2(params["convf2"], flo)
        out = self.conv(params["conv"], jnp.concatenate(
            [cor, flo, fwd_mhs, bwd_mhs,
             motion_hidden_state.reshape(bn, h, w, 48)], axis=-1))
        out, motion_hidden_state = out[..., :124], out[..., 124:]
        return (jnp.concatenate([out, flow], axis=-1), motion_hidden_state)


class SKUpdateBlockMOF(Module):
    """MOFNetStack/stack.py:158-221 (Tfusion=stack)."""

    def __init__(self, feat_dim, down_ratio, corr_radius, corr_levels,
                 cost_heads_num, hidden_dim):
        super().__init__()
        k_conv = [1, 15]
        PCUpdater_conv = [1, 7]
        ratio = 256 // feat_dim
        self.encoder = SKMotionEncoderMOF(corr_radius, corr_levels,
                                          cost_heads_num, k_conv)
        self.gru = PCBlock4_Deep_nopool_res(
            128 + hidden_dim + hidden_dim + 128, 128 // ratio,
            PCUpdater_conv)
        self.flow_head = PCBlock4_Deep_nopool_res(128 // ratio, 4, k_conv)
        self.mask = nn.Sequential(
            nn.Conv2d(128 // ratio, 256 // ratio, 3, padding=1), nn.relu,
            nn.Conv2d(256 // ratio, down_ratio ** 2 * 9 * 2, 1, padding=0))
        self.aggregator = Aggregate(dim=128, dim_head=128, heads=1)

    def __call__(self, params, net, motion_hidden_state, inp, forward_corr,
                 backward_corr, forward_flow, backward_flow, coords0,
                 attention, bs, get_mask=True, **kw):
        motion_features, motion_hidden_state = self.encoder(
            params["encoder"], motion_hidden_state, forward_flow,
            backward_flow, coords0, forward_corr, backward_corr, bs=bs)
        motion_global = self.aggregator(params["aggregator"], attention,
                                        motion_features)
        inp_cat = jnp.concatenate([inp, motion_features, motion_global],
                                  axis=-1)
        net = self.gru(params["gru"],
                       jnp.concatenate([net, inp_cat], axis=-1))
        delta_flow = self.flow_head(params["flow_head"], net)
        mask = None
        if get_mask:
            mask = 100.0 * self.mask(params["mask"], net)
        return net, motion_hidden_state, mask, delta_flow


class VideoFlowMOF(BaseModel):
    pretrained_checkpoints = {
        "kitti": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/videoflow_mof-kitti-293b4f59.ckpt",
        "sintel": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/videoflow_mof-sintel-739e4d3a.ckpt",
        "things": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/videoflow_mof-things-e24551af.ckpt",
        "things_288960": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/videoflow_mof-things_288960noise-0615a42e.ckpt",
    }

    def __init__(self, corr_levels: int = 4, corr_radius: int = 4,
                 gma: str = "GMA-SK2", decoder_depth: int = 32,
                 feat_dim: int = 256, Tfusion: str = "stack",
                 down_ratio: int = 8, cost_heads_num: int = 1, **kwargs):
        super().__init__(loss_fn=None, output_stride=8, **kwargs)
        assert Tfusion == "stack" and down_ratio == 8, \
            "only the published stack/8x configuration"
        self.corr_levels = corr_levels
        self.corr_radius = corr_radius
        self.decoder_depth = decoder_depth
        self.down_ratio = down_ratio
        self.hidden_dim = feat_dim // 2
        self.context_dim = feat_dim // 2
        ratio = 256 // feat_dim
        self.cnet = twins_svt_large()
        self.fnet = twins_svt_large()
        self.update_block = SKUpdateBlockMOF(
            feat_dim=feat_dim, down_ratio=down_ratio,
            corr_radius=corr_radius, corr_levels=corr_levels,
            cost_heads_num=cost_heads_num, hidden_dim=128 // ratio)
        self.att = Attention(dim=128 // ratio, heads=1, max_pos_size=160,
                             dim_head=128 // ratio)

    def forward(self, params, inputs: Dict[str, Any],
                training: bool = False) -> Dict[str, jnp.ndarray]:
        images = inputs["images"]
        if images.shape[1] == 2:
            images = jnp.concatenate([images[:, :1], images], axis=1)
        images, image_resizer = self.preprocess_images(
            images, bgr_add=-0.5, bgr_mult=2.0, bgr_to_rgb=True,
            resize_mode="pad", pad_mode="replicate", pad_two_side=True)
        b, n, h, w, _ = images.shape
        dr = self.down_ratio

        fmaps = self.fnet(params["fnet"], images.reshape(b * n, h, w, 3))
        hf, wf = fmaps.shape[1], fmaps.shape[2]
        fmaps = fmaps.reshape(b, n, hf, wf, -1)
        center = fmaps[:, 1:n - 1].reshape(b * (n - 2), hf, wf, -1)
        forward_corr_fn = CorrBlock(
            center, fmaps[:, 2:n].reshape(b * (n - 2), hf, wf, -1),
            num_levels=self.corr_levels, radius=self.corr_radius)
        backward_corr_fn = CorrBlock(
            center, fmaps[:, 0:n - 2].reshape(b * (n - 2), hf, wf, -1),
            num_levels=self.corr_levels, radius=self.corr_radius)

        cnet = self.cnet(params["cnet"],
                         images[:, 1:n - 1].reshape(b * (n - 2), h, w, 3))
        net = jnp.tanh(cnet[..., :self.hidden_dim])
        inp = nn.relu(cnet[..., self.hidden_dim:])
        attention = self.att(params["att"], inp)

        bn = b * (n - 2)
        coords0 = coords_grid(bn, hf, wf, dtype=images.dtype)
        fwd_flow = jnp.zeros((bn, hf, wf, 2), images.dtype)
        bwd_flow = jnp.zeros((bn, hf, wf, 2), images.dtype)
        mhs0 = jnp.tile(
            params["update_block"]["encoder"]["init_hidden_state"],
            (b, n - 2, hf, wf, 1)).reshape(bn, hf, wf, 48)

        def step(carry, _):
            in_dtypes = tuple(c.dtype for c in carry)
            fwd_flow, bwd_flow, net, mhs = carry
            fwd_flow = jax.lax.stop_gradient(fwd_flow)
            bwd_flow = jax.lax.stop_gradient(bwd_flow)
            fwd_corr = forward_corr_fn(coords0 + fwd_flow)
            bwd_corr = backward_corr_fn(coords0 + bwd_flow)
            net, mhs, up_mask, delta = self.update_block(
                params["update_block"], net, mhs, inp, fwd_corr, bwd_corr,
                fwd_flow, bwd_flow, coords0, attention, bs=b,
                get_mask=training)
            fwd_flow = fwd_flow + delta[..., 0:2]
            bwd_flow = bwd_flow + delta[..., 2:4]
            ys = None
            if training:
                fm = up_mask[..., :dr ** 2 * 9]
                bm = up_mask[..., dr ** 2 * 9:]
                fu = self.postprocess_predictions(
                    convex_upsample(fwd_flow, fm, dr), image_resizer,
                    is_flow=True)
                bu = self.postprocess_predictions(
                    convex_upsample(bwd_flow, bm, dr), image_resizer,
                    is_flow=True)
                ys = (fu, bu)
            # pin carry dtypes (see the BOF scan above)
            out = tuple(x.astype(d) for x, d in
                        zip((fwd_flow, bwd_flow, net, mhs), in_dtypes))
            return out, ys

        (fwd_flow, bwd_flow, net, mhs), ys = jax.lax.scan(
            step, (fwd_flow, bwd_flow, net, mhs0), None,
            length=self.decoder_depth)

        pred_mid = (n - 2) // 2

        def pick(x):
            # (B*(N-2), H, W, 2) -> middle frame (B, H, W, 2)
            return x.reshape(b, n - 2, *x.shape[1:])[:, pred_mid]

        if training:
            flow_preds = jnp.stack(
                [jnp.stack([pick(ys[0][i]), pick(ys[1][i])], axis=1)
                 for i in range(self.decoder_depth)])
            return {"flows": self.nhwc_flow_to_output(pick(ys[0][-1])),
                    "flows_bw": self.nhwc_flow_to_output(pick(ys[1][-1])),
                    "flow_preds": flow_preds}
        up_mask = 100.0 * self.update_block.mask(
            params["update_block"]["mask"], net)
        fm = up_mask[..., :dr ** 2 * 9]
        bm = up_mask[..., dr ** 2 * 9:]
        fu = self.postprocess_predictions(
            convex_upsample(fwd_flow, fm, dr), image_resizer, is_flow=True)
        bu = self.postprocess_predictions(
            convex_upsample(bwd_flow, bm, dr), image_resizer, is_flow=True)
        return {"flows": self.nhwc_flow_to_output(pick(fu)),
                "flows_bw": self.nhwc_flow_to_output(pick(bu)),
                "flow_small": fwd_flow, "flow_bw_small": bwd_flow}


@register_model
class videoflow_bof(VideoFlowBOF):
    pass


@register_model
class videoflow_mof(VideoFlowMOF):
    pass
