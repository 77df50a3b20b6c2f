"""LLA-Flow — local similarity aggregation on RAFT/GMA
(reference: ptlflow/models/llaflow/llaflow.py:50-262, aggregate.py:53-216,
corr.py:6-59).

Adds 5x5 local-similarity attention over the context features, an LSA
feature enhancement of fmap2, and a learnable blend of the standard
all-pairs correlation with a shift-aggregated correlation (ShiftLSA).  The
ShiftLSA volume is 25 full all-pairs matmuls (one per window shift) —
pure MXU work.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ... import nn
from ...nn import Module
from ...ops.correlation import all_pairs_correlation, coords_grid, \
    corr_pyramid_lookup
from ...ops.upsample import convex_upsample, upflow
from ...ops.warp import forward_interpolate
from ...utils.registry import register_model, trainable
from ...nn.layers import avg_pool2d
from ..base.base_model import BaseModel
from ..gma.gma import GMAUpdateBlock
from ..raft.extractor import BasicEncoder
from ..raft.raft import SequenceLoss
from ..raft.update import BasicUpdateBlock


def patch_extra(x, size):
    """(B, H, W, C) -> (B, H, W, size^2, C) replicate-padded neighborhoods
    (aggregate.py:53-58); window positions row-major."""
    b, h, w, c = x.shape
    p = size // 2
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="edge")
    return jnp.stack([xp[:, dy:dy + h, dx:dx + w]
                      for dy in range(size) for dx in range(size)], axis=3)


class GlobalAttention(Module):
    """llaflow gma.py:30-61 — GMA attention WITHOUT position embedding."""

    def __init__(self, dim=128, heads=1, dim_head=128):
        super().__init__()
        self.heads = heads
        self.dim_head = dim_head
        self.scale = dim_head ** -0.5
        self.to_qk = nn.Conv2d(dim, heads * dim_head * 2, 1, bias=False)

    def __call__(self, params, fmap, **kw):
        b, h, w, _ = fmap.shape
        qk = self.to_qk(params["to_qk"], fmap)
        q, k = jnp.split(qk, 2, axis=-1)
        q = q.reshape(b, h * w, self.heads, self.dim_head).transpose(
            0, 2, 1, 3) * self.scale
        k = k.reshape(b, h * w, self.heads, self.dim_head).transpose(
            0, 2, 1, 3)
        sim = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                         preferred_element_type=jnp.float32)
        return jax.nn.softmax(sim, axis=-1).astype(fmap.dtype)


class LocalSimilar(Module):
    """aggregate.py:97-129: softmax similarity over a 5x5 window."""

    def __init__(self, dim=128, heads=1, size=5):
        super().__init__()
        self.heads = heads
        self.scale = (dim // heads) ** -0.5
        self.size = size
        self.to_qk = nn.Conv2d(dim, dim * 2, 1, bias=False)

    def __call__(self, params, fmap, **kw):
        b, h, w, c = fmap.shape
        qk = self.to_qk(params["to_qk"], fmap)
        q, k = jnp.split(qk, 2, axis=-1)
        kn = patch_extra(k, self.size)  # (B, H, W, L, C)
        sim = jnp.einsum("bhwc,bhwlc->bhwl", q * self.scale, kn,
                         preferred_element_type=jnp.float32)
        return jax.nn.softmax(sim, axis=-1).astype(fmap.dtype)


class LSA(Module):
    """aggregate.py:190-216: attention-weighted local aggregation."""

    def __init__(self, dim=128, heads=1, size=5):
        super().__init__()
        self.size = size
        self.to_v = nn.Conv2d(dim, dim, 1, bias=False)

    def init(self, key):
        params = super().init(key)
        params["gamma"] = jnp.zeros((1,), jnp.float32)
        return params

    def _torch_leaves(self):
        return {"gamma": lambda g: g}

    def __call__(self, params, attn, fmap, **kw):
        v = self.to_v(params["to_v"], fmap)
        vn = patch_extra(v, self.size)  # (B, H, W, L, C)
        out = jnp.einsum("bhwl,bhwlc->bhwc", attn, vn,
                         preferred_element_type=jnp.float32).astype(
                             fmap.dtype)
        return fmap + params["gamma"].astype(fmap.dtype) * out


class ShiftLSA(Module):
    """aggregate.py:157-187: shift-aggregated correlation volume."""

    def __init__(self, dim=256, heads=1, size=5):
        super().__init__()
        self.dim = dim
        self.heads = heads
        self.size = size
        self.to_f1 = nn.Conv2d(dim, dim, 1, bias=False)
        self.to_f2 = nn.Conv2d(dim, dim, 1, bias=False)

    def __call__(self, params, attn, fmap, fmap2, **kw):
        b, h, w, c = fmap.shape
        size = self.size
        p = size // 2
        f1 = self.to_f1(params["to_f1"], fmap)
        f1n = patch_extra(f1, size)  # (B, H, W, L, C)
        f1s = attn[..., None] * f1n  # weighted neighborhoods
        f2 = self.to_f2(params["to_f2"], fmap2)
        f2p = jnp.pad(f2, ((0, 0), (p, p), (p, p), (0, 0)), mode="edge")
        # corr[n, m] = sum_l sum_d f1s[n, l, d] * f2_shift_l[m, d]
        corr = 0.0
        li = 0
        for dy in range(size):
            for dx in range(size):
                f2s = f2p[:, dy:dy + h, dx:dx + w].reshape(b, h * w, c)
                corr = corr + jnp.einsum(
                    "bnc,bmc->bnm", f1s[:, :, :, li].reshape(b, h * w, c),
                    f2s, preferred_element_type=jnp.float32)
                li += 1
        corr = corr / jnp.sqrt(jnp.asarray(self.dim // self.heads,
                                           jnp.float32))
        return corr.reshape(b, h * w, h, w)


class LLACorrBlock:
    """corr.py:6-59: all-pairs corr blended with the ShiftLSA volume."""

    def __init__(self, fmap1, fmap2, gamma, corr2, num_levels=4, radius=4):
        self.radius = radius
        b, h, w, _ = fmap1.shape
        corr = all_pairs_correlation(fmap1, fmap2)  # (B, HW, H, W)
        corr = corr + gamma.astype(corr.dtype) * corr2
        corr = corr.reshape(b * h * w, h, w, 1)
        self.pyramid = [corr]
        for _ in range(num_levels - 1):
            corr = avg_pool2d(corr, 2, 2)
            self.pyramid.append(corr)

    def __call__(self, coords):
        return corr_pyramid_lookup(self.pyramid, coords, self.radius)


class LLAFlow(BaseModel):
    pretrained_checkpoints = {
        "chairs": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/llaflow_gma-chairs-c4225e37.ckpt",
        "things": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/llaflow_gma-things-1cfce7fe.ckpt",
        "sintel": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/llaflow_gma-sintel-4ca6e4a9.ckpt",
        "kitti": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/llaflow_gma-kitti-ac312150.ckpt",
    }

    def __init__(self, corr_levels: int = 4, corr_radius: int = 4,
                 dropout: float = 0.0, gamma: float = 0.8,
                 max_flow: float = 400, iters: int = 32, gma: bool = True,
                 **kwargs):
        super().__init__(output_stride=8,
                         loss_fn=SequenceLoss(gamma, max_flow), **kwargs)
        self.corr_levels = corr_levels
        self.corr_radius = corr_radius
        self.iters = iters
        self.use_gma = gma
        self.hidden_dim = 128
        self.context_dim = 128
        self.fnet = BasicEncoder(output_dim=256, norm_fn="instance",
                                 dropout=dropout)
        self.cnet = BasicEncoder(output_dim=256, norm_fn="batch",
                                 dropout=dropout)
        self.ls1 = LocalSimilar(dim=128, heads=1, size=5)
        self.ls2 = LocalSimilar(dim=128, heads=1, size=5)
        self.s_lsa = ShiftLSA(dim=256, heads=1, size=5)
        self.lsa = LSA(dim=256, heads=1, size=5)
        if gma:
            self.update_block = GMAUpdateBlock(
                corr_levels=corr_levels, corr_radius=corr_radius,
                num_heads=1, hidden_dim=128)
            self.att = GlobalAttention(dim=128, heads=1, dim_head=128)
        else:
            self.update_block = BasicUpdateBlock(
                corr_levels=corr_levels, corr_radius=corr_radius,
                hidden_dim=128)
            self.att = None

    def init(self, key):
        params = super().init(key)
        # blend weight for the ShiftLSA corr volume (llaflow.py:95)
        params["gamma"] = jnp.zeros((1,), jnp.float32)
        return params

    def _torch_leaves(self):
        return {"gamma": lambda g: g}

    def forward(self, params, inputs: Dict[str, Any],
                training: bool = False) -> Dict[str, jnp.ndarray]:
        images, image_resizer = self.preprocess_images(
            inputs["images"], bgr_add=-0.5, bgr_mult=2.0, bgr_to_rgb=True,
            resize_mode="pad", pad_mode="replicate", pad_two_side=True)
        image1 = images[:, 0]
        image2 = images[:, 1]
        kw = dict(training=training)

        cnet = self.cnet(params["cnet"], image1, **kw)
        net = jnp.tanh(cnet[..., :self.hidden_dim])
        inp = nn.relu(cnet[..., self.hidden_dim:])
        inp2 = inp

        ls1 = self.ls1(params["ls1"], inp)
        ls2 = self.ls2(params["ls2"], inp2)
        attention = None
        if self.att is not None:
            attention = self.att(params["att"], inp)

        both = self.fnet(params["fnet"],
                         jnp.concatenate([image1, image2], axis=0), **kw)
        fmap1, fmap2 = jnp.split(both, 2, axis=0)
        fmap2 = self.lsa(params["lsa"], ls2, fmap2)
        corr2 = self.s_lsa(params["s_lsa"], ls1, fmap1, fmap2)

        corr_fn = LLACorrBlock(fmap1, fmap2, params["gamma"], corr2,
                               num_levels=self.corr_levels,
                               radius=self.corr_radius)

        b, h, w, _ = fmap1.shape
        coords0 = coords_grid(b, h, w, dtype=image1.dtype)
        coords1 = coords_grid(b, h, w, dtype=image1.dtype)
        prev = inputs.get("prev_preds")
        if prev is not None and prev.get("flow_small") is not None:
            fs = prev["flow_small"]
            if fs.shape[-1] != 2:
                fs = jnp.moveaxis(fs, -3, -1)
            coords1 = coords1 + forward_interpolate(fs)

        def step(carry, _):
            coords1, net = carry
            coords1 = jax.lax.stop_gradient(coords1)
            corr = corr_fn(coords1)
            flow = coords1 - coords0
            if self.att is not None:
                net, up_mask, delta = self.update_block(
                    params["update_block"], net, inp, corr, flow, attention)
            else:
                net, up_mask, delta = self.update_block(
                    params["update_block"], net, inp, corr, flow)
            coords1 = coords1 + delta
            ys = None
            if training:
                fu = convex_upsample(coords1 - coords0, up_mask, 8)
                ys = self.postprocess_predictions(fu, image_resizer,
                                                  is_flow=True)
            else:
                ys = up_mask
            return (coords1, net), ys

        (coords1, net), ys = jax.lax.scan(step, (coords1, net), None,
                                          length=self.iters)
        if training:
            flow_up = ys[-1]
            outputs = {"flows": self.nhwc_flow_to_output(flow_up),
                       "flow_preds": ys}
        else:
            flow_up = convex_upsample(coords1 - coords0, ys[-1], 8)
            flow_up = self.postprocess_predictions(flow_up, image_resizer,
                                                   is_flow=True)
            outputs = {"flows": self.nhwc_flow_to_output(flow_up),
                       "flow_small": coords1 - coords0}
        return outputs


class LLAFlowRAFT(LLAFlow):
    pretrained_checkpoints = {
        "chairs": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/llaflow_raft-chairs-a720c578.ckpt",
        "things": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/llaflow_raft-things-b6cb5f0e.ckpt",
        "sintel": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/llaflow_raft-sintel-69c82cea.ckpt",
        "kitti": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/llaflow_raft-kitti-b8b43046.ckpt",
    }

    def __init__(self, gma: bool = False, **kwargs):
        super().__init__(gma=gma, **kwargs)


@register_model
@trainable
class llaflow(LLAFlow):
    pass


@register_model
@trainable
class llaflow_raft(LLAFlowRAFT):
    pass
