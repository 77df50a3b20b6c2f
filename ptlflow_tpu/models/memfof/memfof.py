"""MEMFOF — memory-efficient multi-frame optical flow at 1/16 resolution
(reference: ptlflow/models/memfof/memfof.py:60-344, extractor.py:53-102,
corr.py:18-70, update.py:8-46, gma.py:9-76).

3-frame bidirectional SEA-RAFT-style design at stride 16 with dim 512.
Its corr pyramid downsamples the *target features* (bilinear) and
recomputes the full correlation per level — each level is one batched
matmul on the MXU; the window lookup reuses the one-hot matmul sampler.
The reference's host-side fmap_cache (video streaming) is a Python-level
memoization and is intentionally omitted (features are recomputed).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp

from ... import nn
from ...nn import Module
from ...ops.correlation import all_pairs_correlation, coords_grid, \
    corr_pyramid_lookup
from ...ops.grid_sample import interpolate
from ...ops.upsample import convex_upsample_data
from ...utils.registry import register_model
from ..base.base_model import BaseModel
from ..sea_raft.layer import ConvNextBlock


class TVBasicBlock(Module):
    """torchvision.models.resnet.BasicBlock (used by memfof's trunk)."""

    def __init__(self, in_planes, planes, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(in_planes, planes, 3, stride=stride,
                               padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        if stride != 1 or in_planes != planes:
            self.downsample = nn.Sequential(
                nn.Conv2d(in_planes, planes, 1, stride=stride, bias=False),
                nn.BatchNorm2d(planes))
        else:
            self.downsample = None

    def __call__(self, params, x, **kw):
        idt = x
        y = nn.relu(self.bn1(params["bn1"],
                             self.conv1(params["conv1"], x), **kw))
        y = self.bn2(params["bn2"], self.conv2(params["conv2"], y), **kw)
        if self.downsample is not None:
            idt = self.downsample(params["downsample"], x, **kw)
        return nn.relu(y + idt)


class TVResNetTrunk(Module):
    """torchvision resnet18/34 trunk (conv1..layer3), no maxpool — memfof
    deletes it (extractor.py:84-88), so layer1 runs at 1/2."""

    def __init__(self, input_dim, arch="resnet34"):
        super().__init__()
        blocks = {"resnet18": (2, 2, 2), "resnet34": (3, 4, 6)}[arch]
        self.conv1 = nn.Conv2d(input_dim, 64, 7, stride=2, padding=3,
                               bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        dims = (64, 128, 256)
        in_p = 64
        for li, (dim, num) in enumerate(zip(dims, blocks)):
            stride = 1 if li == 0 else 2
            layer = [TVBasicBlock(in_p, dim, stride)]
            layer += [TVBasicBlock(dim, dim) for _ in range(num - 1)]
            setattr(self, f"layer{li + 1}", nn.Sequential(*layer))
            in_p = dim

    def __call__(self, params, x, **kw):
        x = nn.relu(self.bn1(params["bn1"],
                             self.conv1(params["conv1"], x), **kw))
        x = self.layer1(params["layer1"], x, **kw)
        x = self.layer2(params["layer2"], x, **kw)
        return self.layer3(params["layer3"], x, **kw)


class ResNetFPN16x(Module):
    """extractor.py:53-102."""

    def __init__(self, input_dim, output_dim, arch="resnet34"):
        super().__init__()
        self.resnet = TVResNetTrunk(input_dim, arch)
        self.final_conv = nn.Conv2d(256, output_dim, 2, stride=2, padding=0)

    def __call__(self, params, x, **kw):
        x = self.resnet(params["resnet"], x, **kw)
        return self.final_conv(params["final_conv"], x)


class MemfofCorrBlock:
    """corr.py:18-60: per-level full corr against bilinearly-downsampled
    target features (fmap1 stays full-res)."""

    def __init__(self, fmap1, fmap2, num_levels=4, radius=4):
        self.radius = radius
        b, h, w, c = fmap1.shape
        f1 = fmap1.reshape(b, h * w, c)
        self.pyramid = []
        for i in range(num_levels):
            h2, w2 = fmap2.shape[1], fmap2.shape[2]
            corr = jnp.einsum(
                "bqc,bkc->bqk", f1, fmap2.reshape(b, h2 * w2, c),
                preferred_element_type=jnp.float32) / math.sqrt(c)
            self.pyramid.append(
                corr.astype(fmap1.dtype).reshape(b * h * w, h2, w2, 1))
            if i < num_levels - 1:
                fmap2 = interpolate(fmap2, (h2 // 2, w2 // 2),
                                    mode="bilinear", align_corners=False)

    def __call__(self, coords):
        return corr_pyramid_lookup(self.pyramid, coords, self.radius)


class MemfofAttention(Module):
    """gma.py:9-38 — GMA attention without position embedding, with the
    MemFlow log-scaling of queries."""

    def __init__(self, dim, heads, dim_head):
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
            0, 2, 1, 3)
        k = k.reshape(b, h * w, self.heads, self.dim_head).transpose(
            0, 2, 1, 3)
        q = q * self.scale * math.log(h * w, 3)
        sim = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                         preferred_element_type=jnp.float32)
        return jax.nn.softmax(sim, axis=-1).astype(fmap.dtype)


class MemfofAggregate(Module):
    """gma.py:41-76."""

    def __init__(self, dim, heads, dim_head):
        super().__init__()
        self.heads = heads
        self.dim_head = dim_head
        inner = heads * dim_head
        self.to_v = nn.Conv2d(dim, inner, 1, bias=False)
        self.project = None if dim == inner else nn.Conv2d(inner, dim, 1,
                                                           bias=False)
        self.inner = inner

    def init(self, key):
        params = super().init(key)
        params["gamma"] = jnp.zeros((1,), jnp.float32)
        return params

    def _torch_leaves(self):
        return {"gamma": lambda g: g}

    def __call__(self, params, attn, fmap, **kw):
        b, h, w, _ = fmap.shape
        v = self.to_v(params["to_v"], fmap)
        v = v.reshape(b, h * w, self.heads, self.dim_head).transpose(
            0, 2, 1, 3)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v,
                         preferred_element_type=jnp.float32).astype(
                             fmap.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(b, h, w, self.inner)
        if self.project is not None:
            out = self.project(params["project"], out)
        return fmap + params["gamma"].astype(fmap.dtype) * out


class BasicMotionEncoder(Module):
    """update.py:8-26 (dual-direction: corr and flow channels doubled)."""

    def __init__(self, corr_channel, dim):
        super().__init__()
        self.convc1 = nn.Conv2d(corr_channel * 2, dim * 2, 1)
        self.convc2 = nn.Conv2d(dim * 2, dim + dim // 2, 3, padding=1)
        self.convf1 = nn.Conv2d(4, dim, 7, padding=3)
        self.convf2 = nn.Conv2d(dim, dim // 2, 3, padding=1)
        self.conv = nn.Conv2d(dim * 2, dim - 4, 3, padding=1)

    def __call__(self, params, flow, corr, **kw):
        cor = nn.relu(self.convc1(params["convc1"], corr))
        cor = nn.relu(self.convc2(params["convc2"], cor))
        flo = nn.relu(self.convf1(params["convf1"], flow))
        flo = nn.relu(self.convf2(params["convf2"], flo))
        out = nn.relu(self.conv(params["conv"],
                                jnp.concatenate([cor, flo], axis=-1)))
        return jnp.concatenate([out, flow], axis=-1)


class GMAUpdateBlock(Module):
    """update.py:29-46."""

    def __init__(self, num_blocks, corr_channel, hdim, cdim):
        super().__init__()
        self.encoder = BasicMotionEncoder(corr_channel, cdim)
        self.refine = nn.ModuleList(
            [ConvNextBlock(3 * cdim + hdim, hdim) for _ in range(num_blocks)])
        self.aggregator = MemfofAggregate(cdim, 1, cdim)

    def __call__(self, params, net, inp, corr, flow, attention, **kw):
        motion_features = self.encoder(params["encoder"], flow, corr)
        motion_global = self.aggregator(params["aggregator"], attention,
                                        motion_features)
        inp_cat = jnp.concatenate([inp, motion_features, motion_global],
                                  axis=-1)
        for i, blk in enumerate(self.refine):
            net = blk(params["refine"][str(i)],
                      jnp.concatenate([net, inp_cat], axis=-1))
        return net


class MemfofSequenceLoss:
    """memfof.py:22-57 (Laplace mixture over both directions)."""

    def __init__(self, gamma, max_flow):
        self.gamma = gamma
        self.max_flow = max_flow

    def __call__(self, outputs, inputs):
        nf_preds = outputs["nf_preds"]  # list of (B, 2, H, W, 2)
        flow_gt = jnp.moveaxis(inputs["flows"][:, 0], -3, -1)
        valid = jnp.moveaxis(inputs["valids"][:, 0], -3, -1)
        mag = jnp.sqrt(jnp.sum(flow_gt ** 2, axis=-1, keepdims=True))
        valid = (valid >= 0.5) & (mag < self.max_flow)
        n = len(nf_preds)
        total = 0.0
        for i in range(n):
            w = self.gamma ** (n - i - 1)
            nf = nf_preds[i]
            m = jnp.isfinite(jax.lax.stop_gradient(nf)) & valid[:, None]
            total += w * jnp.sum(jnp.where(m, nf, 0.0)) / \
                jnp.maximum(m.sum(), 1)
        return total


class MEMFOF(BaseModel):
    pretrained_checkpoints = {
        "kitti": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/memfof-kitti-ed27d6f1.ckpt",
        "sintel": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/memfof-sintel-cbb45e24.ckpt",
        "spring": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/memfof-spring-f8a968f7.ckpt",
        "tartan": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/memfof-tartan-7ca03da2.ckpt",
        "things": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/memfof-things-11146736.ckpt",
        "tskh": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/memfof-tskh-6fb0c129.ckpt",
    }

    def __init__(self, backbone: str = "resnet34", dim: int = 512,
                 corr_levels: int = 4, corr_radius: int = 4, iters: int = 8,
                 num_blocks: int = 2, gamma: float = 0.8,
                 max_flow: float = 400, use_var: bool = True,
                 var_min: float = 0.0, var_max: float = 10.0, **kwargs):
        super().__init__(output_stride=32,
                         loss_fn=MemfofSequenceLoss(gamma, max_flow),
                         **kwargs)
        self.dim = dim
        self.corr_levels = corr_levels
        self.corr_radius = corr_radius
        self.iters = iters
        self.use_var = use_var
        self.var_min = var_min
        self.var_max = var_max
        self.cnet = ResNetFPN16x(9, dim * 2, backbone)
        self.init_conv = nn.Conv2d(2 * dim, 2 * dim, 3, padding=1)
        self.upsample_weight = nn.Sequential(
            nn.Conv2d(dim, dim * 2, 3, padding=1), nn.relu,
            nn.Conv2d(dim * 2, 2 * 16 * 16 * 9, 1))
        self.flow_head = nn.Sequential(
            nn.Conv2d(dim, 2 * dim, 3, padding=1), nn.relu,
            nn.Conv2d(2 * dim, 2 * 6, 3, padding=1))
        self.fnet = ResNetFPN16x(3, dim * 2, backbone)
        corr_channel = corr_levels * (corr_radius * 2 + 1) ** 2
        self.update_block = GMAUpdateBlock(num_blocks, corr_channel,
                                           hdim=dim, cdim=dim)
        self.att = MemfofAttention(dim=dim, heads=1, dim_head=dim)

    def _pad_frames(self, images):
        if images.shape[1] == 2:
            images = jnp.concatenate([images[:, :1], images], axis=1)
        assert images.shape[1] == 3, "memfof takes 3 frames"
        return images

    def _up(self, flow, info, mask):
        # reference _upsample_data (memfof.py:304-339): flow scaled by 16,
        # info unscaled, one shared softmax mask
        return convex_upsample_data(flow, info, mask, factor=16)

    def forward(self, params, inputs: Dict[str, Any],
                training: bool = False) -> Dict[str, jnp.ndarray]:
        images = self._pad_frames(inputs["images"])
        images, image_resizer = self.preprocess_images(
            images, bgr_add=-0.5, bgr_mult=2.0, bgr_to_rgb=True,
            resize_mode="pad", pad_mode="replicate", pad_two_side=True)
        b = images.shape[0]
        kw = dict(training=training)

        cnet = self.cnet(params["cnet"], jnp.concatenate(
            [images[:, 0], images[:, 1], images[:, 2]], axis=-1), **kw)
        cnet = self.init_conv(params["init_conv"], cnet)
        net = cnet[..., :self.dim]
        context = cnet[..., self.dim:]
        attention = self.att(params["att"], context)

        flow_update = self.flow_head(params["flow_head"], net)
        weight_update = 0.25 * self.upsample_weight(
            params["upsample_weight"], net)
        flow21 = flow_update[..., 0:2]
        info21 = flow_update[..., 2:6]
        flow23 = flow_update[..., 6:8]
        info23 = flow_update[..., 8:12]

        flow_preds = []
        info_preds = []

        def upsampled(flow21, info21, flow23, info23, weight_update):
            f21, i21 = self._up(flow21, info21,
                                weight_update[..., :16 * 16 * 9])
            f23, i23 = self._up(flow23, info23,
                                weight_update[..., 16 * 16 * 9:])
            f21 = self.postprocess_predictions(f21, image_resizer,
                                               is_flow=True)
            f23 = self.postprocess_predictions(f23, image_resizer,
                                               is_flow=True)
            i21 = self.postprocess_predictions(i21, image_resizer,
                                               is_flow=False)
            i23 = self.postprocess_predictions(i23, image_resizer,
                                               is_flow=False)
            return jnp.stack([f21, f23], 1), jnp.stack([i21, i23], 1)

        if training or self.iters == 0:
            fp, ip = upsampled(flow21, info21, flow23, info23, weight_update)
            flow_preds.append(fp)
            info_preds.append(ip)

        if self.iters > 0:
            fmap1 = self.fnet(params["fnet"], images[:, 0], **kw)
            fmap2 = self.fnet(params["fnet"], images[:, 1], **kw)
            fmap3 = self.fnet(params["fnet"], images[:, 2], **kw)
            corr_fn_21 = MemfofCorrBlock(fmap2, fmap1, self.corr_levels,
                                         self.corr_radius)
            corr_fn_23 = MemfofCorrBlock(fmap2, fmap3, self.corr_levels,
                                         self.corr_radius)
            hf, wf = fmap2.shape[1], fmap2.shape[2]
            grid = coords_grid(b, hf, wf, dtype=images.dtype)

            def step(carry, _):
                flow21, flow23, net = carry
                flow21 = jax.lax.stop_gradient(flow21)
                flow23 = jax.lax.stop_gradient(flow23)
                corr21 = corr_fn_21(grid + flow21)
                corr23 = corr_fn_23(grid + flow23)
                corr = jnp.concatenate([corr21, corr23], axis=-1)
                flow = jnp.concatenate([flow21, flow23], axis=-1)
                net2 = self.update_block(params["update_block"], net,
                                         context, corr, flow, attention)
                flow_update = self.flow_head(params["flow_head"], net2)
                weight_update = 0.25 * self.upsample_weight(
                    params["upsample_weight"], net2)
                flow21n = flow21 + flow_update[..., 0:2]
                info21n = flow_update[..., 2:6]
                flow23n = flow23 + flow_update[..., 6:8]
                info23n = flow_update[..., 8:12]
                ys = None
                if training:
                    ys = upsampled(flow21n, info21n, flow23n, info23n,
                                   weight_update)
                else:
                    ys = (info21n, info23n, weight_update)
                return (flow21n, flow23n, net2), ys

            (flow21, flow23, net), ys = jax.lax.scan(
                step, (flow21, flow23, net), None, length=self.iters)
            if training:
                for i in range(self.iters):
                    flow_preds.append(ys[0][i])
                    info_preds.append(ys[1][i])
            else:
                fp, ip = upsampled(flow21, ys[0][-1], flow23, ys[1][-1],
                                   ys[2][-1])
                flow_preds.append(fp)
                info_preds.append(ip)

        if not training:
            final = jnp.moveaxis(flow_preds[-1][:, 1:], -1, -3)
            return {"flows": final}

        flow_gt = inputs.get("flows")
        if flow_gt is not None:
            # (B, N, 2, H, W) -> per-direction NHWC (gt for 21 unsupplied
            # by the 1-flow datasets: replicate forward gt, matching the
            # reference's zero-fill fallback only when absent)
            gt = jnp.moveaxis(flow_gt, -3, -1)
            if gt.shape[1] == 1:
                gt = jnp.concatenate([gt, gt], axis=1)
        else:
            sh = flow_preds[0].shape
            gt = jnp.zeros((sh[0], 2) + sh[2:], flow_preds[0].dtype)

        var_max = self.var_max if self.use_var else 0.0
        var_min = self.var_min if self.use_var else 0.0
        nf_preds = []
        for i in range(len(info_preds)):
            nf_k = []
            for k in range(2):
                info = info_preds[i][:, k]
                weight = info[..., :2]
                raw_b = info[..., 2:]
                log_b = jnp.stack([
                    jnp.clip(raw_b[..., 0], 0.0, var_max),
                    jnp.clip(raw_b[..., 1], var_min, 0.0)], axis=-1)
                err = jnp.abs(gt[:, k] - flow_preds[i][:, k])[..., :, None]
                term2 = err * jnp.exp(-log_b)[..., None, :]
                term1 = weight - math.log(2) - log_b
                nf = jax.nn.logsumexp(weight, axis=-1, keepdims=True) - \
                    jax.nn.logsumexp(term1[..., None, :] - term2, axis=-1)
                nf_k.append(nf)
            nf_preds.append(jnp.stack(nf_k, axis=1))

        return {"flows": jnp.moveaxis(flow_preds[-1][:, 1:], -1, -3),
                "flow_preds": flow_preds, "info_preds": info_preds,
                "nf_preds": nf_preds}


@register_model
class memfof(MEMFOF):
    pass
