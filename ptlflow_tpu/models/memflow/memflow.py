"""MemFlow — streaming optical flow with a bounded key/value motion
memory.

Behavioral parity with /root/reference/ptlflow/models/memflow/:
- memflow.py:64-267 (MemFlow wrapper: per-frame context/feature encoding,
  decoder loop reading the memory each iteration, memory write after the
  frame unless the sequence ends);
- MemFlowNet/MemFlow.py:21-238 (encoders, upsample, att.to_qk split);
- MemFlowNet/sk2.py:97-254 (SK2 update block: PCBlock GRU, get_motion_and_
  value -> aggregator.to_v, gamma-scaled memory readout);
- memory_manager_skflow.py:34-125 + kv_memory_store.py (work memory with
  mem_every=1, max=min=2 mid-term frames -> a 2-frame sliding window) and
  MemFlowNet/memory_util.py:42-70 (softmax readout with the
  log(N, train_avg_length) scale).

TPU-first redesign of the memory: the reference's K/V store grows and
shrinks via torch.cat/slicing (dynamic shapes).  Here it is a FIXED
capacity ring buffer (capacity = max_mid_term_frames) with a frame-count
scalar; invalid slots are masked with -inf in the attention logits, so
the jitted graph has static shapes for the whole stream.  The decoder
loop is a ``lax.scan`` (memory is constant within a frame).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ... import nn
from ...nn import Module
from ...ops.correlation import build_corr_pyramid, corr_pyramid_lookup, coords_grid
from ...ops.upsample import convex_upsample
from ...ops.warp import forward_interpolate
from ...utils.registry import register_model, trainable
from ..base import BaseModel
from ..flowformer.twins_tpu import twins_svt_large
from ..gma.gma_utils import Aggregate, Attention
from ..raft.extractor import BasicEncoder
from ..raft.raft import SequenceLoss
from ..skflow.skflow import (PCBlock4_Deep_nopool_res,
                             SKMotionEncoder6_Deep_nopool_res)


class SKUpdateBlockMem(Module):
    """sk2.py:201-254 (SKUpdateBlock6_Deep_nopoolres_AllDecoder2_Mem_
    skflow). The motion encoder is skflow's; the memory value head is the
    aggregator's to_v."""

    def __init__(self, corr_levels=4, corr_radius=4, hidden_dim=128):
        super().__init__()
        k_conv = [1, 15]
        pc_updater_conv = [1, 7]
        self.encoder = SKMotionEncoder6_Deep_nopool_res(
            corr_levels, corr_radius, k_conv)
        self.gru = PCBlock4_Deep_nopool_res(
            128 + hidden_dim + hidden_dim + 128, 128, pc_updater_conv)
        self.flow_head = PCBlock4_Deep_nopool_res(128, 2, k_conv)
        self.mask = nn.Sequential(
            nn.Conv2d(128, 256, 3, padding=1), nn.relu,
            nn.Conv2d(256, 64 * 9, 1, padding=0))
        self.aggregator = Aggregate(dim=128, dim_head=128, heads=1)

    def get_motion_and_value(self, params, flow, corr):
        motion_features = self.encoder(params["encoder"], flow, corr)
        value = self.aggregator.to_v(params["aggregator"]["to_v"],
                                     motion_features)
        return motion_features, value

    def __call__(self, params, net, inp, motion_features,
                 motion_features_global, **kw):
        inp_cat = jnp.concatenate(
            [inp, motion_features, motion_features_global], axis=-1)
        net = self.gru(params["gru"],
                       jnp.concatenate([net, inp_cat], axis=-1))
        delta_flow = self.flow_head(params["flow_head"], net)
        mask = 0.25 * self.mask(params["mask"], net)
        return net, mask, delta_flow


def empty_memory(b: int, hw: int, capacity: int, ck: int = 128,
                 cv: int = 128, dtype=jnp.float32) -> Dict[str, jnp.ndarray]:
    """Fixed-shape memory state (ring buffer over frames)."""
    return {
        "key": jnp.zeros((b, capacity, hw, ck), dtype),
        "value": jnp.zeros((b, capacity, hw, cv), dtype),
        "count": jnp.zeros((), jnp.int32),
    }


def match_affinity(query, cur_key, memory, att_scale, train_avg_length):
    """memory_manager_skflow.py:43-99 similarity+softmax: the query's
    affinity over [stored frames, current frame] keys with log-N
    temperature.

    query/cur_key: (B, H, W, Ck).  Invalid ring slots (slot <
    capacity - count) get -inf logits.  Returns (B, (cap+1)*HW, HW).

    Split out of :func:`match_memory` because everything here — query,
    stored keys, the current frame's context key — is constant across
    the decoder iterations; only the VALUE's last frame changes.  The
    reference recomputes this whole softmax every iteration
    (MemFlow.py calls match_memory per decoder step); hoisting it out
    of the ``lax.scan`` drops ~2/3 of the memory path's per-iteration
    FLOPs and all of its softmax HBM traffic, with identical math.
    """
    b, h, w, ck = query.shape
    hw = h * w
    cap = memory["key"].shape[1]
    q = query.reshape(b, hw, ck)
    mem_k = jnp.concatenate(
        [memory["key"].reshape(b, cap * hw, ck),
         cur_key.reshape(b, hw, ck)], axis=1)
    count = jnp.minimum(memory["count"], cap)
    n_total = (count + 1) * hw
    scale = att_scale * jnp.log(n_total.astype(jnp.float32)) / \
        math.log(train_avg_length)
    sim = jnp.einsum("blc,btc->btl", q, mem_k,
                     preferred_element_type=jnp.float32) * scale
    # slots [0, cap - count) of the ring are unfilled; current is valid
    slot = jnp.arange(cap + 1)
    valid = slot >= (cap - count)  # slot == cap is the current frame
    valid = jnp.repeat(valid, hw)
    sim = jnp.where(valid[None, :, None], sim, -jnp.inf)
    return jax.nn.softmax(sim, axis=1).astype(query.dtype)


def match_memory(query, cur_key, cur_value, memory, att_scale,
                 train_avg_length):
    """Full readout (affinity + value contraction) — the reference's
    match_memory contract, used by the oracle test; the model itself
    hoists :func:`match_affinity` out of the iteration loop."""
    b, h, w, _ = query.shape
    hw = h * w
    cap = memory["key"].shape[1]
    affinity = match_affinity(query, cur_key, memory, att_scale,
                              train_avg_length)
    mem_v = jnp.concatenate(
        [memory["value"].reshape(b, cap * hw, -1),
         cur_value.reshape(b, hw, -1)], axis=1)
    out = jnp.einsum("btl,btc->blc", affinity, mem_v,
                     preferred_element_type=jnp.float32).astype(query.dtype)
    return out.reshape(b, h, w, -1)


def add_memory(memory, key, value):
    """kv_memory_store.py:32-61 + compress_features: append the frame and
    keep the most recent ``capacity`` frames (roll-in at the end)."""
    b, h, w, ck = key.shape
    hw = h * w
    new = dict(memory)
    new["key"] = jnp.concatenate(
        [memory["key"][:, 1:], key.reshape(b, 1, hw, ck)], axis=1)
    new["value"] = jnp.concatenate(
        [memory["value"][:, 1:], value.reshape(b, 1, hw, -1)], axis=1)
    new["count"] = jnp.minimum(memory["count"] + 1,
                               memory["key"].shape[1])
    return new


class MemFlow(BaseModel):
    pretrained_checkpoints = {
        "things": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/memflow-things-90d0b74c.ckpt",
        "sintel": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/memflow-sintel-38621d84.ckpt",
        "kitti": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/memflow-kitti-ee6cbf09.ckpt",
        "spring": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/memflow-spring-7ee1b984.ckpt",
    }

    def __init__(self, corr_levels: int = 4, corr_radius: int = 4,
                 cnet: str = "basicencoder", fnet: str = "basicencoder",
                 gma: str = "GMA-SK2", decoder_depth: int = 15,
                 mem_every: int = 1, max_mid_term_frames: int = 2,
                 min_mid_term_frames: int = 2,
                 train_avg_length: Optional[int] = None,
                 filter_epe: bool = False, gamma: float = 0.8,
                 max_flow: float = 400, **kwargs):
        super().__init__(output_stride=8,
                         loss_fn=SequenceLoss(gamma, max_flow), **kwargs)
        self.corr_levels = corr_levels
        self.corr_radius = corr_radius
        self.cnet_name = cnet
        self.fnet_name = fnet
        self.decoder_depth = decoder_depth
        self.mem_every = mem_every
        self.capacity = max_mid_term_frames
        self.train_avg_length = (train_avg_length if train_avg_length
                                 is not None else 6750)
        self.hidden_dim = 128
        self.context_dim = 128

        if cnet == "twins":
            self.cnet = twins_svt_large()
            self.proj = nn.Conv2d(256, 256, 1)
        else:
            self.cnet = BasicEncoder(output_dim=256, norm_fn="batch")
        if fnet == "twins":
            self.fnet = twins_svt_large()
            self.channel_convertor = nn.Conv2d(256, 256, 1, bias=False)
        else:
            self.fnet = BasicEncoder(output_dim=256, norm_fn="instance")
        self.update_block = SKUpdateBlockMem(corr_levels, corr_radius,
                                             hidden_dim=self.hidden_dim)
        self.att = Attention(dim=self.context_dim, heads=1,
                             max_pos_size=160, dim_head=self.context_dim)
        self.clear_memory()

    def from_torch(self, flat, strict=True, _path=""):
        """Reference checkpoints nest the whole net under ``network.``
        (memflow.py:92 ``self.network = MemFlowNet(...)``); our tree is
        flat with the same child names, so strip the wrapper prefix."""
        flat = {(k[len("network."):] if k.startswith("network.") else k): v
                for k, v in flat.items()}
        return super().from_torch(flat, strict=strict, _path=_path)

    # -------------------------------------------------------- streaming
    def clear_memory(self):
        self.curr_ti = -1
        self.last_mem_ti = -self.mem_every
        self._memory = None
        self._mem_jit = {}

    def infer(self, inputs, training: bool = False):
        """Stateful streaming entry (memflow.py:188-267): threads the
        fixed-shape memory through a jitted pure step."""
        meta = inputs.get("meta", {})
        if isinstance(meta, dict) and meta.get("is_seq_start"):
            self.clear_memory()
        self.curr_ti += 1
        end = bool(meta.get("is_seq_end", True)) if isinstance(meta, dict) \
            else True
        is_mem_frame = ((self.curr_ti - self.last_mem_ti >= self.mem_every)
                        and not end)
        images = jnp.asarray(inputs["images"])
        b = images.shape[0]
        h8 = -(-images.shape[-2] // 8)
        w8 = -(-images.shape[-1] // 8)
        hw = h8 * w8
        if self._memory is None or \
                self._memory["key"].shape[:3] != (b, self.capacity, hw):
            self._memory = empty_memory(b, hw, self.capacity)
        key = (is_mem_frame, training)
        if key not in self._mem_jit:
            self._mem_jit[key] = jax.jit(
                lambda p, x, m: self._step(p, x, m, write_memory=key[0],
                                           training=key[1]))
        fwd_inputs = {k: v for k, v in inputs.items() if k != "meta"}
        outputs, self._memory = self._mem_jit[key](self.params, fwd_inputs,
                                                   self._memory)
        if is_mem_frame:
            self.last_mem_ti = self.curr_ti
        return outputs

    # ------------------------------------------------------------ pure
    def forward(self, params, inputs: Dict[str, Any],
                training: bool = False) -> Dict[str, jnp.ndarray]:
        images = jnp.asarray(inputs["images"])
        b = images.shape[0]
        h8 = -(-images.shape[-2] // 8)
        w8 = -(-images.shape[-1] // 8)
        memory = empty_memory(b, h8 * w8, self.capacity)
        outputs, _ = self._step(params, inputs, memory, write_memory=False,
                                training=training)
        return outputs

    def _encode_context(self, params, image, training):
        cnet = self.cnet(params["cnet"], image, training=training)
        if self.cnet_name == "twins":
            cnet = self.proj(params["proj"], cnet)
        net = jnp.tanh(cnet[..., :self.hidden_dim])
        inp = nn.relu(cnet[..., self.hidden_dim:])
        qk = self.att.to_qk(params["att"]["to_qk"], inp)
        query, key = jnp.split(qk, 2, axis=-1)
        return query, key, net, inp

    def _step(self, params, inputs, memory, write_memory, training):
        images, image_resizer = self.preprocess_images(
            inputs["images"], bgr_add=-0.5, bgr_mult=2.0, bgr_to_rgb=True,
            resize_mode="pad", pad_mode="replicate", pad_two_side=True)
        image1 = images[:, 0]
        image2 = images[:, 1]

        query, ctx_key, net, inp = self._encode_context(params, image1,
                                                        training)
        both = jnp.concatenate([image1, image2], axis=0)
        fmaps = self.fnet(params["fnet"], both, training=training)
        if self.fnet_name == "twins":
            fmaps = self.channel_convertor(params["channel_convertor"],
                                           fmaps)
        fmap1, fmap2 = jnp.split(fmaps, 2, axis=0)
        pyramid = build_corr_pyramid(fmap1, fmap2, self.corr_levels)

        b, h, w, _ = fmap1.shape
        coords0 = coords_grid(b, h, w, dtype=image1.dtype)
        coords1 = coords0
        prev = inputs.get("prev_preds")
        if prev is not None and prev.get("flow_small") is not None:
            flow_small = prev["flow_small"]
            if flow_small.ndim == 4 and flow_small.shape[-1] != 2:
                flow_small = jnp.moveaxis(flow_small, -3, -1)
            coords1 = coords1 + forward_interpolate(flow_small)

        up_params = params["update_block"]
        gamma = up_params["aggregator"]["gamma"]

        # The affinity softmax depends only on (query, ctx_key, memory) —
        # all constant across decoder iterations; only the current frame's
        # VALUE changes per iteration.  Hoist it (and the stored-frames
        # part of the readout) out of the scan: identical math to the
        # reference's per-iteration match_memory, ~3x fewer memory-path
        # FLOPs per iteration.
        hw = memory["key"].shape[2]
        cap = memory["key"].shape[1]
        bq, hq, wq, _ = query.shape
        affinity = match_affinity(query, ctx_key, memory, self.att.scale,
                                  self.train_avg_length)  # (B, t, hw)
        aff_mem, aff_cur = affinity[:, :cap * hw], affinity[:, cap * hw:]
        mem_readout = jnp.einsum(
            "btl,btc->blc", aff_mem, memory["value"].reshape(bq, cap * hw, -1),
            preferred_element_type=jnp.float32).astype(query.dtype)

        def read_memory(current_value):
            cur = jnp.einsum("btl,btc->blc", aff_cur,
                             current_value.reshape(bq, hw, -1),
                             preferred_element_type=jnp.float32
                             ).astype(query.dtype)
            return (mem_readout + cur).reshape(bq, hq, wq, -1)

        def step(carry, _):
            net, coords1 = carry
            coords1 = jax.lax.stop_gradient(coords1)
            corr = corr_pyramid_lookup(pyramid, coords1, self.corr_radius)
            flow = coords1 - coords0
            motion_features, current_value = \
                self.update_block.get_motion_and_value(up_params, flow, corr)
            memory_readout = read_memory(current_value)
            motion_features_global = motion_features + \
                gamma.astype(flow.dtype) * memory_readout
            net, up_mask, delta_flow = self.update_block(
                up_params, net, inp, motion_features,
                motion_features_global)
            coords1 = coords1 + delta_flow
            ys = (coords1 - coords0, up_mask) if training else None
            return (net, coords1), (ys, current_value)

        (net, coords1), (ys, values) = jax.lax.scan(
            step, (net, coords1), None, length=self.decoder_depth)
        current_value = values[-1]

        if training:
            flows_lr, masks = ys
            it = flows_lr.shape[0]
            flow_ups = convex_upsample(
                flows_lr.reshape(it * b, h, w, 2),
                masks.reshape(it * b, h, w, masks.shape[-1]))
            flow_ups = flow_ups.reshape(it, b, 8 * h, 8 * w, 2)
            flow_ups = self.postprocess_predictions(flow_ups, image_resizer,
                                                    is_flow=True)
            outputs = {"flows": self.nhwc_flow_to_output(flow_ups[-1]),
                       "flow_preds": flow_ups}
        else:
            flow_lr = coords1 - coords0
            # the reference upsamples with the last iteration's up_mask,
            # which is a pure function of the final net state — recompute
            # it rather than carrying it through the scan
            up_mask = 0.25 * self.update_block.mask(
                up_params["mask"], net)
            flow_up = convex_upsample(flow_lr, up_mask)
            flow_up = self.postprocess_predictions(flow_up, image_resizer,
                                                   is_flow=True)
            outputs = {"flows": self.nhwc_flow_to_output(flow_up),
                       "flow_small": jnp.moveaxis(flow_lr, -1, -3)}

        if write_memory:
            memory = add_memory(memory, ctx_key, current_value)
        return outputs, memory


class MemFlowT(MemFlow):
    pretrained_checkpoints = {
        "things": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/memflow_t-things-6028d89f.ckpt",
        "sintel": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/memflow_t-sintel-d2df0424.ckpt",
        "kitti": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/memflow_t-kitti-9eeabb65.ckpt",
    }

    def __init__(self, cnet: str = "twins", fnet: str = "twins", **kwargs):
        super().__init__(cnet=cnet, fnet=fnet, **kwargs)


@register_model
@trainable
class memflow(MemFlow):
    pass


@register_model
@trainable
class memflow_t(MemFlowT):
    pass
