"""VCN: Volumetric Correspondence Networks.

Parity with /root/reference/ptlflow/models/vcn/vcn.py (flow_reg :117-230,
WarpModule :230-276, corrf :486-535, VCNSmall :276-863, VCN :863-1368,
VCNLoss :24-115).  Coarse-to-fine warping over a PSPNet pyramid; at each
level a per-channel shifted-product cost volume is filtered by a butterfly
4D U-Net, regressed by truncated soft winner-take-all, and the multi-channel
hypotheses are fused by dilated conv stacks.

TPU design: the (B, U, V, H, W, C) cost volume is built from U*V statically
unrolled shifted slices of the zero-padded target features (no gather); the
truncated-WTA argmax mask is a one-hot + max reduce_window; all 4D convs are
folded-batch 2D NHWC convs (see conv4d.py).

Deviation (documented): the reference loss's flow term uses
``torch.norm(x, 0, 1)`` — an L0 "norm" that counts nonzero components and
carries no gradient.  We use the L2 norm the original VCN paper/code
intends, so the flow term actually trains.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp

from ... import nn
from ...ops.grid_sample import bilinear_sampler, interpolate
from ...ops.correlation import coords_grid
from ...utils.registry import register_model, trainable
from ..base import BaseModel
from .conv4d import butterfly4D, sepConv4d
from .submodule import conv, pspnet, pspnet_s


def warp_with_mask(x: jnp.ndarray, flow: jnp.ndarray):
    """Backward warp with the reference's in-bounds mask
    (vcn.py:230-276: |normalized grid| < 1, align_corners=True)."""
    b, h, w, _ = x.shape
    coords = coords_grid(b, h, w, dtype=flow.dtype) + flow
    out = bilinear_sampler(x, coords)
    eps = 0.0
    mask = ((coords[..., 0] > eps) & (coords[..., 0] < w - 1 - eps) &
            (coords[..., 1] > eps) & (coords[..., 1] < h - 1 - eps))
    mask = mask[..., None].astype(x.dtype)
    return out * mask, mask


def corrf(ref: jnp.ndarray, target: jnp.ndarray, maxdisp: int,
          fac: int = 1) -> jnp.ndarray:
    """Per-channel shifted-product cost volume (vcn.py:486-535).

    ref, target: (B, H, W, C).  Returns (B, U, V, H, W, C) with
    U = 2*maxdisp+1 x-shifts and V = 2*(maxdisp//fac)+1 y-shifts;
    cost[u, v](y, x) = ref(y, x) * target(y + dv, x + du), 0 out of bounds,
    then leaky_relu(0.1).
    """
    b, h, w, c = ref.shape
    mdx = maxdisp
    mdy = int(maxdisp // fac)
    tpad = jnp.pad(target, ((0, 0), (mdy, mdy), (mdx, mdx), (0, 0)))
    rows = []
    for i in range(2 * mdx + 1):  # du = i - mdx (x shift)
        cols = []
        for j in range(2 * mdy + 1):  # dv = j - mdy (y shift)
            shifted = jax.lax.dynamic_slice(
                tpad, (0, j, i, 0), (b, h, w, c))
            cols.append(ref * shifted)
        rows.append(jnp.stack(cols, axis=1))
    cost = jnp.stack(rows, axis=1)  # (B, U, V, H, W, C)
    return nn.leaky_relu(cost, 0.1)


class flow_reg(nn.Module):
    """Truncated soft winner-take-all flow regression (vcn.py:117-230)."""

    def __init__(self, ent: bool = True, maxdisp: int = 4, fac: int = 1):
        super().__init__()
        self.ent = ent
        self.md = maxdisp
        self.fac = fac
        self.wsize = 3  # 7x7 truncation window
        self.flow_max = float(maxdisp)

    def __call__(self, params, x, **kw):
        # x: (B, U, V, H, W); U = x displacements, V = y displacements
        b, u, v, h, w = x.shape
        oldx = x
        # truncated softmax: 7x7 (u, v) window around the argmax
        flat = x.reshape(b, u * v, h, w)
        idx = jnp.argmax(flat, axis=1)
        mask = jax.nn.one_hot(idx, u * v, axis=1, dtype=x.dtype)
        mask = mask.reshape(b, u, v, h, w)
        k = 2 * self.wsize + 1
        mask = jax.lax.reduce_window(
            mask, -jnp.inf, jax.lax.max, (1, k, k, 1, 1), (1, 1, 1, 1, 1),
            padding=((0, 0), (self.wsize, self.wsize),
                     (self.wsize, self.wsize), (0, 0), (0, 0)))
        x = jnp.where(mask > 0, oldx, -jnp.inf)

        probs = nn.softmax(x.reshape(b, u * v, h, w).astype(jnp.float32),
                           axis=1).reshape(b, u, v, h, w)
        dispx = jnp.arange(-self.md, self.md + 1,
                           dtype=jnp.float32)  # over u
        dispy = jnp.arange(-int(self.md // self.fac),
                           int(self.md // self.fac) + 1,
                           dtype=jnp.float32)  # over v
        outx = jnp.einsum("buvhw,u->bhw", probs, dispx)[:, None]
        outy = jnp.einsum("buvhw,v->bhw", probs, dispy)[:, None]
        flow = jnp.concatenate([outx, outy], 1).astype(oldx.dtype)

        if not self.ent:
            return flow, None
        clip = jnp.clip(probs, 1e-9, 1 - 1e-9)
        local_entropy = (-probs * jnp.log(clip)).sum((1, 2))[:, None]
        local_entropy = local_entropy / jnp.log((2 * self.wsize + 1) ** 2)
        gprobs = nn.softmax(
            oldx.reshape(b, u * v, h, w).astype(jnp.float32),
            axis=1).reshape(b, u, v, h, w)
        gclip = jnp.clip(gprobs, 1e-9, 1 - 1e-9)
        global_entropy = (-gprobs * jnp.log(gclip)).sum((1, 2))[:, None]
        global_entropy = global_entropy / jnp.log(u * v)
        ent = jnp.concatenate([local_entropy, global_entropy],
                              1).astype(oldx.dtype)
        return flow, ent


def _dc_head(in_ch: int, out_ch: int):
    """Hypotheses-fusion dilated conv stack (vcn.py:345-395)."""
    return [conv(in_ch, 128, 3, 1, 1, 1),
            conv(128, 128, 3, 1, 2, 2),
            conv(128, 128, 3, 1, 4, 4),
            conv(128, 96, 3, 1, 8, 8),
            conv(96, 64, 3, 1, 16, 16),
            conv(64, 32, 3, 1, 1, 1),
            nn.Conv2d(32, out_ch, 3, stride=1, padding=1, bias=True)]


class VCNLoss:
    """Multi-scale flow + out-of-range losses (vcn.py:24-115; L2 flow norm,
    see module docstring)."""

    def __init__(self, maxdisp: float, fac: float):
        self.maxdisp = maxdisp
        self.fac = fac

    def __call__(self, outputs: Dict[str, Any], inputs: Dict[str, Any]):
        flow_gt = inputs["flows"][:, 0]  # (B, 2, H, W)
        valid = inputs["valids"][:, 0, 0]
        mask = ((valid == 1)
                & (jnp.abs(flow_gt[:, 0]) < self.maxdisp)
                & (jnp.abs(flow_gt[:, 1]) < (self.maxdisp // self.fac)))
        mask = mask.astype(flow_gt.dtype)
        denom = jnp.maximum(mask.sum(), 1.0)

        im1 = jnp.moveaxis(inputs["images"][:, 0], -3, -1)
        im2 = jnp.moveaxis(inputs["images"][:, 1], -3, -1)
        gt_nhwc = jnp.moveaxis(flow_gt, -3, -1)
        im_warp, _ = warp_with_mask(im2, gt_nhwc)
        occ_mask = (jnp.linalg.norm(im_warp - im1, axis=-1) > 0.3)

        loss = 0.0
        m = 64.0
        ws = [0.25, 0.25, 0.25, 0.5, 1.0]
        flow_preds = outputs["flow_preds"]
        for i, wgt in enumerate(ws[:len(flow_preds)]):
            err = jnp.linalg.norm(flow_preds[i] * m - flow_gt, axis=1)
            loss = loss + wgt * (err * mask).sum() / denom
            m /= 2

        h, w = flow_gt.shape[-2:]
        up_flows = [0.0]
        m = 32.0
        for uf in outputs["up_flows_preds"]:
            uf = jnp.moveaxis(interpolate(
                jnp.moveaxis(uf, -3, -1), (h, w), mode="bilinear",
                align_corners=False), -1, -3) * m
            up_flows.append(uf)
            m /= 2
        m = 64.0
        for i, oor in enumerate(outputs["oors_preds"]):
            oor = interpolate(oor[..., None], (h, w), mode="bilinear",
                              align_corners=False)[..., 0]
            loss = loss + self._oor_loss(
                flow_gt - up_flows[i], oor,
                m * outputs["flow_reg_maxs_preds"][i], occ_mask)
            m /= 2
        return loss

    def _oor_loss(self, flow_res, oor, maxdisp, occ_mask):
        oor_gt = (jnp.abs(flow_res) > maxdisp).sum(1) > 0
        oor_gt = (oor_gt | occ_mask).astype(flow_res.dtype)
        frac = oor_gt.mean()
        weights = oor_gt * (1 - frac) + (1 - oor_gt) * frac
        logits = oor
        ce = jnp.maximum(logits, 0) - logits * oor_gt + \
            jnp.log1p(jnp.exp(-jnp.abs(logits)))
        return (weights * ce).mean()


class VCNSmall(BaseModel):
    """4-level VCN (vcn.py:276-863)."""

    pretrained_checkpoints = {
        "chairs": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/vcn_small-chairs-56243688.ckpt",
        "things": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/vcn_small-things-2f19af2d.ckpt",
    }

    _n_levels = 4

    def __init__(self, fac: float = 1.0, maxdisp: int = 256,
                 md: Sequence[int] = (4, 4, 4, 4, 4),
                 train_batch_size: Optional[int] = None, **kwargs):
        super().__init__(loss_fn=VCNLoss(maxdisp, fac), output_stride=64,
                         **kwargs)
        self.md = list(md)
        self.fac = int(fac)
        self.maxdisp = maxdisp
        withbn = True
        fdima1 = 128
        fdima2 = 64
        fdimb1 = 16
        fdimb2 = 12
        self.fdimb1 = fdimb1
        self.fdimb2 = fdimb2

        if self._n_levels == 4:
            self.pspnet = pspnet_s(is_proj=False)
        else:
            self.pspnet = pspnet(is_proj=False)

        self.f6 = butterfly4D(fdima1, fdimb1, withbn=withbn)
        self.p6 = sepConv4d(fdimb1, fdimb1, with_bn=False)
        self.f5 = butterfly4D(fdima1, fdimb1, withbn=withbn)
        self.p5 = sepConv4d(fdimb1, fdimb1, with_bn=False)
        self.f4 = butterfly4D(fdima1, fdimb1, withbn=withbn)
        self.p4 = sepConv4d(fdimb1, fdimb1, with_bn=False)
        self.f3 = butterfly4D(fdima2, fdimb1, withbn=withbn)
        self.p3 = sepConv4d(fdimb1, fdimb1, with_bn=False)

        self.flow_reg64 = flow_reg(ent=True, maxdisp=self.md[0],
                                   fac=self.fac)
        self.flow_reg32 = flow_reg(ent=True, maxdisp=self.md[1])
        self.flow_reg16 = flow_reg(ent=True, maxdisp=self.md[2])
        self.flow_reg8 = flow_reg(ent=True, maxdisp=self.md[3])

        for lvl, in_extra in (("6", 4 * fdimb1), ("5", 4 * fdimb1 * 2),
                              ("4", 4 * fdimb1 * 3)):
            mods = _dc_head(128 + in_extra, {
                "6": 2 * fdimb1, "5": 2 * fdimb1 * 2,
                "4": 2 * fdimb1 * 3}[lvl])
            for k, mod in enumerate(mods):
                setattr(self, f"dc{lvl}_conv{k + 1}", mod)
            setattr(self, f"dc{lvl}_convo",
                    nn.Sequential(*_dc_head(128 + in_extra, 1)))
        mods = _dc_head(64 + 16 * fdimb1, 8 * fdimb1)
        for k, mod in enumerate(mods):
            setattr(self, f"dc3_conv{k + 1}", mod)
        self.dc3_convo = nn.Sequential(*_dc_head(64 + 16 * fdimb1, 1))

    # ------------------------------------------------------------ per level
    def _level(self, params, lvl: str, feat_net, p_net, reg, c1, c2n, c1n,
               up_flow, prev_flowh, prev_enth, maxdisp, fac, training):
        """One matching level: cost volume -> butterfly -> WTA -> fusion."""
        if up_flow is not None:
            warped, _ = warp_with_mask(c2n, up_flow_nhwc(up_flow))
        else:
            warped = c2n
        feat = corrf(c1n, warped, maxdisp, fac=fac)
        feat = feat_net(params[f"f{lvl}"], feat, training=training)
        cost = p_net(params[f"p{lvl}"], feat, training=training)
        # cost: (B, U, V, H, W, C) -> per-channel WTA on (B*C, U, V, H, W)
        b, u, v, h, w, c = cost.shape
        cost_flat = cost.transpose(0, 5, 1, 2, 3, 4).reshape(
            b * c, u, v, h, w)
        flowh, enth = reg({}, cost_flat)  # (B*C, 2, H, W), (B*C, 2, H, W)
        flowh = flowh.reshape(b, c, 2, h, w)
        if up_flow is not None:
            flowh = flowh + up_flow[:, None]
        flowh = flowh.reshape(b, c * 2, h, w)
        enth = enth.reshape(b, c * 2, h, w)

        if prev_flowh is not None:
            prev_fh = jnp.moveaxis(interpolate(
                jnp.moveaxis(jax.lax.stop_gradient(prev_flowh) * 2, -3, -1),
                (h, w), mode="bilinear", align_corners=False), -1, -3)
            flowh = jnp.concatenate([flowh, prev_fh], 1)
            prev_eh = jnp.moveaxis(interpolate(
                jnp.moveaxis(prev_enth, -3, -1), (h, w), mode="bilinear",
                align_corners=False), -1, -3)
            enth = jnp.concatenate([enth, prev_eh], 1)

        x = jnp.concatenate([
            jnp.moveaxis(jax.lax.stop_gradient(enth), -3, -1),
            jnp.moveaxis(jax.lax.stop_gradient(flowh), -3, -1), c1], -1)
        oor = None
        if training:
            oor = getattr(self, f"dc{lvl}_convo")(
                params[f"dc{lvl}_convo"], x, training=training)[..., 0]
        y = x
        for k in range(1, 7):
            y = getattr(self, f"dc{lvl}_conv{k}")(
                params[f"dc{lvl}_conv{k}"], y, training=training)
        va = getattr(self, f"dc{lvl}_conv7")(params[f"dc{lvl}_conv7"], y)
        nhyp = va.shape[-1] // 2
        va = va.reshape(b, h, w, nhyp, 2).transpose(0, 3, 4, 1, 2)
        weights = nn.softmax(va.astype(jnp.float32), axis=1).astype(va.dtype)
        flow = (flowh.reshape(b, nhyp, 2, h, w) * weights).sum(1)
        return flow, flowh, enth, oor

    def _forward_impl(self, params, inputs, training, levels):
        mean_bgr = [0.33, 0.33, 0.33]
        if self.extra_params is not None and "mean_bgr_L" in self.extra_params:
            mean_bgr = list(self.extra_params["mean_bgr_L"])
        images, image_resizer = self.preprocess_images(
            inputs["images"], bgr_add=[-x for x in mean_bgr], bgr_mult=1.0,
            bgr_to_rgb=True, resize_mode="interpolation",
            interpolation_mode="bilinear", interpolation_align_corners=True)

        im = images.reshape((-1,) + images.shape[2:])  # (2B, H, W, 3)
        bs = im.shape[0] // 2
        feats = self.pspnet(params["pspnet"], im, training=training)

        def norm(f):
            return f / (jnp.linalg.norm(f, axis=-1, keepdims=True) + 1e-9)

        h_full, w_full = im.shape[1], im.shape[2]
        up_flows, oors, flow_reg_maxs, flows_lr = [], [], [], []
        up_flow = None
        prev_flowh = prev_enth = None
        regs = {"6": self.flow_reg64, "5": self.flow_reg32,
                "4": self.flow_reg16, "3": self.flow_reg8}
        if hasattr(self, "flow_reg4"):
            regs["2"] = self.flow_reg4
        for li, lvl in enumerate(levels):
            cl = feats[li]
            c1 = cl[:bs]
            c2 = cl[bs:]
            c1n, c2n = norm(c1), norm(c2)
            fac = self.fac if lvl == "6" else 1
            maxdisp = self.md[li]
            reg = regs[lvl]
            if up_flow is not None:
                stride = {"5": 32, "4": 16, "3": 8, "2": 4}[lvl]
                up_flow = jnp.moveaxis(interpolate(
                    jnp.moveaxis(up_flow, -3, -1),
                    (h_full // stride, w_full // stride), mode="bilinear",
                    align_corners=False), -1, -3) * 2
                up_flows.append(up_flow)
            flow, prev_flowh, prev_enth, oor = self._level(
                params, lvl, getattr(self, f"f{lvl}"),
                getattr(self, f"p{lvl}"), reg, c1, c2n, c1n, up_flow,
                prev_flowh if li > 0 else None,
                prev_enth if li > 0 else None, maxdisp, fac, training)
            flow_reg_maxs.append(reg.flow_max)
            if oor is not None:
                oors.append(oor)
            flows_lr.append(flow)
            up_flow = flow

        # upsample every level's flow to full (preprocessed) resolution
        flows_full = []
        for flow in flows_lr:
            f = jnp.moveaxis(interpolate(
                jnp.moveaxis(flow, -3, -1), (h_full, w_full),
                mode="bilinear", align_corners=False), -1, -3)
            f = self.postprocess_predictions(
                jnp.moveaxis(f, -3, -1), image_resizer, is_flow=True)
            flows_full.append(jnp.moveaxis(f, -1, -3))
        if len(levels) == 4:
            # VCNSmall appends a synthetic finest*2 entry ("flow2",
            # vcn.py:846-848)
            flows_full.append(flows_full[-1] * 2)

        # final output = finest-level flow scaled to pixel units
        # (vcn.py:852-859, 1355-1362: flow2[:, None] * 4)
        outputs = {"flows": (flows_full[-1] * 4)[:, None]}
        if training:
            outputs["flow_preds"] = flows_full
            outputs["up_flows_preds"] = up_flows
            outputs["oors_preds"] = oors
            outputs["flow_reg_maxs_preds"] = flow_reg_maxs
        return outputs

    def forward(self, params, inputs: Dict[str, Any],
                training: bool = False) -> Dict[str, jnp.ndarray]:
        return self._forward_impl(params, inputs, training,
                                  levels=("6", "5", "4", "3"))


def up_flow_nhwc(up_flow):
    return jnp.moveaxis(up_flow, -3, -1)


class VCN(VCNSmall):
    """5-level VCN (vcn.py:863-1368)."""

    pretrained_checkpoints = {
        "chairs": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/vcn-chairs-db33dc85.ckpt",
        "things": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/vcn-things-25524737.ckpt",
        "sintel": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/vcn-sintel-eeeee701.ckpt",
        "kitti": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/vcn-kitti-5d050b7a.ckpt",
    }

    _n_levels = 5

    def __init__(self, fac: float = 1.0, maxdisp: int = 256,
                 md: Sequence[int] = (4, 4, 4, 4, 4),
                 train_batch_size: Optional[int] = None, **kwargs):
        super().__init__(fac=fac, maxdisp=maxdisp, md=md,
                         train_batch_size=train_batch_size, **kwargs)
        self.output_stride = 64
        fdima2 = 64
        fdimb1 = 16
        fdimb2 = 12
        withbn = True
        self.f2 = butterfly4D(fdima2, fdimb2, withbn=withbn)
        self.p2 = sepConv4d(fdimb2, fdimb2, with_bn=False)
        self.flow_reg4 = flow_reg(ent=True, maxdisp=self.md[4])
        mods = _dc_head(64 + 16 * fdimb1 + 4 * fdimb2, 2 * fdimb2 + 8 * fdimb1)
        for k, mod in enumerate(mods):
            setattr(self, f"dc2_conv{k + 1}", mod)
        self.dc2_convo = nn.Sequential(
            *_dc_head(64 + 16 * fdimb1 + 4 * fdimb2, 1))

    def forward(self, params, inputs: Dict[str, Any],
                training: bool = False) -> Dict[str, jnp.ndarray]:
        return self._forward_impl(params, inputs, training,
                                  levels=("6", "5", "4", "3", "2"))


@register_model
@trainable
class vcn(VCN):
    pass


@register_model
@trainable
class vcn_small(VCNSmall):
    pass
