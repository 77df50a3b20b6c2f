"""HD3 — hierarchical discrete distribution decomposition for match
density estimation.

Behavioral parity with /root/reference/ptlflow/models/hd3/:
- hd3.py:24-301 (Context/Decoder heads, 5-level coarse-to-fine match
  density decoding from 1/64 with residual density per level);
- hd3_ops.py (flow_warp with <0.9999 validity mask; density2vector:
  2x2-average peak selection then corner-probability expectation;
  vector2density: bilinear scatter into the (2c+1)^2 support grid);
- hd3losses.py:7-44 (per-level KL divergence against the ground-truth
  match density);
- decoder.py (PreActBlock ResNet / HDA decoders), dla.py/dla_up.py and
  vgg.py encoders.

TPU-first: density<->vector conversions are argmax/one-hot matmuls over
the (2c+1)^2 support (static tiny dims -> VPU friendly); the pyramid is
a static Python loop; correlation is the shifting local-corr op.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp

from ... import nn
from ...nn import Module
from ...ops.correlation import coords_grid, local_correlation
from ...ops.grid_sample import bilinear_sampler, interpolate
from ...utils.registry import register_model, trainable, ptlflow_trained
from ..base import BaseModel
from .dla import DLAEncoder


# ------------------------------------------------------------------ ops
def hd3_flow_warp(x, flo, mul=True):
    """hd3_ops.py:19-56 — border-padded warp with a hard validity mask."""
    b, h, w, c = x.shape
    coords = coords_grid(b, h, w, dtype=flo.dtype) + flo
    out = bilinear_sampler(x, coords, padding_mode="border")
    # mask: bilinear of ones with zeros padding, then < 0.9999 -> 0.
    # Exactly: all four sampled corners in bounds (fp-robust analytic form)
    mask = ((coords[..., 0] >= 0) & (coords[..., 0] <= w - 1) &
            (coords[..., 1] >= 0) & (coords[..., 1] <= h - 1))
    mask = mask[..., None].astype(x.dtype)
    if mul:
        return out * mask
    return out, mask


def vector2density(vect, c):
    """hd3_ops.py:148-205 (_flow2distribution): bilinear scatter of the
    clamped flow into a (2c+1)^2 one-hot support; NHWC (B,H,W,2) ->
    (B,H,W,(2c+1)^2)."""
    d = 2 * c + 1
    flo = jnp.clip(vect, -c, c)
    x = flo[..., 0]
    y = flo[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1 = x0 + 1
    y1 = y0 + 1
    in_x1 = x1 <= c
    in_y1 = y1 <= c
    wx0 = x1 - x
    wx1 = (x - x0) * in_x1
    wy0 = y1 - y
    wy1 = (y - y0) * in_y1
    x0i = jnp.clip(x0, -c, c).astype(jnp.int32) + c
    y0i = jnp.clip(y0, -c, c).astype(jnp.int32) + c
    x1i = jnp.clip(x1, -c, c).astype(jnp.int32) + c
    y1i = jnp.clip(y1, -c, c).astype(jnp.int32) + c
    out = 0.0
    for yi, xi, wgt in ((y0i, x0i, wx0 * wy0), (y0i, x1i, wx1 * wy0),
                        (y1i, x0i, wx0 * wy1), (y1i, x1i, wx1 * wy1)):
        label = yi * d + xi
        out = out + jax.nn.one_hot(label, d * d, dtype=vect.dtype) * \
            wgt[..., None]
    return out


def density2vector(prob, normalize=True):
    """hd3_ops.py:208-262 (_prob2flow): find the peak 2x2 cell of the
    support grid, then convert the 4 corner probabilities to a local
    expectation around it."""
    b, h, w, ch = prob.shape
    d = int(math.sqrt(ch))
    if normalize:
        prob = jax.nn.softmax(prob, axis=-1)
    grid = prob.reshape(b, h, w, d, d)
    # 2x2 average pooling over the support grid (stride 1)
    pooled = (grid[..., :-1, :-1] + grid[..., :-1, 1:] +
              grid[..., 1:, :-1] + grid[..., 1:, 1:])
    flat = pooled.reshape(b, h, w, (d - 1) * (d - 1))
    idx = jnp.argmax(flat, axis=-1)  # index in the (d-1)^2 grid
    # convert to top-left index in the original d-grid
    idx = idx + idx // (d - 1)

    # pick the 4 cell-corner probabilities via one-hot masked reductions —
    # a per-pixel channel gather is a TPU point-gather (1.6 ms at the /4
    # level on v5e); the 81-wide select+reduce is pure VPU work
    ch_iota = jnp.arange(ch)

    def gather(off):
        onehot = (ch_iota == (idx + off)[..., None]).astype(prob.dtype)
        return jnp.sum(prob * onehot, axis=-1)

    p_lt = gather(0)
    p_rt = gather(1)
    p_lb = gather(d)
    p_rb = gather(d + 1)
    total = p_lt + p_rt + p_lb + p_rb
    p_lt_n = p_lt / total
    p_rt_n = p_rt / total
    p_lb_n = p_lb / total
    # corner flows (hd3_ops.py _prob2cornerflow.indice2flow)
    rt_x = ((idx + 1) % d - d // 2).astype(prob.dtype)
    lb_y = ((idx + d) // d - d // 2).astype(prob.dtype)
    out_x = rt_x - p_lt_n - p_lb_n
    out_y = lb_y - p_lt_n - p_rt_n
    return jnp.stack([out_x, out_y], axis=-1)


def downsample_flow_dense(flo, scale_factor):
    """hd3_ops.py:116-135 dense branch (bilinear align_corners=True,
    values NOT rescaled); returns (flow, ones-mask)."""
    b, h, w, _ = flo.shape
    nh, nw = int(h * scale_factor), int(w * scale_factor)
    out = interpolate(flo, (nh, nw), align_corners=True)
    return out, jnp.ones((b, nh, nw, 1), flo.dtype)


class HD3Loss:
    """hd3losses.py:7-44 — multi-level KL divergence on match densities."""

    def __call__(self, outputs, inputs):
        ms_prob = outputs["ms_prob"]
        ms_pred = outputs["ms_pred"]
        corr_range = outputs["corr_range"]
        ds = outputs["downsample"]
        gt = jnp.moveaxis(inputs["flows"][:, 0], -3, -1)
        bsz, h, w, _ = gt.shape
        kld = 0.0
        for level, prob in enumerate(ms_prob):
            scaled_gt, valid = downsample_flow_dense(
                gt, 1 / 2 ** (ds - level))
            if level > 0:
                prev = ms_pred[level - 1]
                up = interpolate(prev, (2 * prev.shape[1],
                                        2 * prev.shape[2]),
                                 align_corners=True)
                scaled_gt = scaled_gt - up
            scaled_gt = scaled_gt / 2 ** (ds - level)
            gt_dist = jax.lax.stop_gradient(
                vector2density(scaled_gt, corr_range[level]) * valid)
            logp = jax.nn.log_softmax(prob, axis=-1)
            # torch KLDivLoss(batchmean): sum(t*(log t - logp)) / B
            tlogt = jnp.where(gt_dist > 0, gt_dist * jnp.log(
                jnp.maximum(gt_dist, 1e-30)), 0.0)
            kl = jnp.sum(tlogt - gt_dist * logp) / bsz
            kld = kld + 4.0 ** (ds - level) / (h * w) * kl
        return kld


# -------------------------------------------------------------- decoders
class PreActBlock(Module):
    """decoder.py:7-42."""

    def __init__(self, in_planes, planes, stride=1, normalize=True):
        super().__init__()
        self.normalize = normalize
        if normalize:
            self.bn1 = nn.BatchNorm2d(in_planes)
        self.conv1 = nn.Conv2d(in_planes, planes, 3, stride=stride,
                               padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, padding=1, bias=False)
        if stride != 1 or in_planes != planes:
            self.shortcut = nn.Sequential(
                nn.Conv2d(in_planes, planes, 1, stride=stride, bias=False))
        else:
            self.shortcut = None

    def __call__(self, params, x, **kw):
        out = nn.relu(self.bn1(params["bn1"], x, **kw)) if self.normalize \
            else x
        shortcut = self.shortcut(params["shortcut"], out, **kw) \
            if self.shortcut is not None else x
        out = self.conv1(params["conv1"], out)
        out = self.conv2(params["conv2"],
                         nn.relu(self.bn2(params["bn2"], out, **kw)))
        return out + shortcut


class ResnetDecoder(Module):
    def __init__(self, inplane, outplane):
        super().__init__()
        self.block1 = PreActBlock(inplane, outplane, normalize=False)
        self.block2 = PreActBlock(outplane, outplane, normalize=True)

    def __call__(self, params, x, **kw):
        return self.block2(params["block2"],
                           self.block1(params["block1"], x, **kw), **kw)


class HDADecoder(Module):
    def __init__(self, inplane, outplane):
        super().__init__()
        self.block1 = PreActBlock(inplane, outplane, normalize=False)
        self.block2 = PreActBlock(outplane, outplane, normalize=True)
        self.root = nn.Sequential(
            nn.BatchNorm2d(outplane * 2), nn.relu,
            nn.Conv2d(outplane * 2, outplane, 1, bias=False))

    def __call__(self, params, x, **kw):
        y1 = self.block1(params["block1"], x, **kw)
        y2 = self.block2(params["block2"], y1, **kw)
        return self.root(params["root"],
                         jnp.concatenate([y1, y2], axis=-1), **kw)


class HD3Decoder(Module):
    """hd3.py:61-88."""

    def __init__(self, inplane, block, classes, up_classes):
        super().__init__()
        self.mapping = block(inplane, 128)
        self.cls = nn.Sequential(
            nn.BatchNorm2d(128), nn.relu,
            nn.Conv2d(128, classes, 1))
        if up_classes > 0:
            self.up = nn.Sequential(
                nn.BatchNorm2d(128), nn.relu,
                nn.ConvTranspose2d(128, up_classes, 4, stride=2, padding=1,
                                   bias=False),
                nn.BatchNorm2d(up_classes), nn.relu)
        else:
            self.up = None

    def __call__(self, params, x, **kw):
        out = self.mapping(params["mapping"], x, **kw)
        prob = self.cls(params["cls"], out, **kw)
        up_feat = self.up(params["up"], out, **kw) \
            if self.up is not None else None
        return prob, up_feat


class HD3ContextHead(Module):
    """hd3.py:24-58 — dilated context head for the finest level."""

    def __init__(self, inplane, classes):
        super().__init__()
        ch = [inplane, 128, 128, 128, 128, 128, 128, 128]
        dilations = [1, 1, 2, 4, 8, 16, 1]
        self.num_convs = 7
        for i in range(self.num_convs):
            setattr(self, f"dc_conv_{i}", nn.Sequential(
                nn.Conv2d(ch[i], ch[i + 1], 3, padding=dilations[i],
                          dilation=dilations[i], bias=False),
                nn.BatchNorm2d(ch[i + 1]), nn.relu))
        self.cls = nn.Conv2d(ch[-1], classes, 1)

    def __call__(self, params, x, **kw):
        out = x
        for i in range(self.num_convs):
            out = getattr(self, f"dc_conv_{i}")(params[f"dc_conv_{i}"],
                                                out, **kw)
        return self.cls(params["cls"], out), None


# ------------------------------------------------------------ vgg encoder
class VGGBasicBlock(Module):
    """vgg.py:120-174 triple-conv stride-2 block."""

    def __init__(self, in_planes, out_planes):
        super().__init__()
        self.conv1 = nn.Conv2d(in_planes, out_planes, 3, stride=2,
                               padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(out_planes)
        self.conv2 = nn.Conv2d(out_planes, out_planes, 3, padding=1,
                               bias=False)
        self.bn2 = nn.BatchNorm2d(out_planes)
        self.conv3 = nn.Conv2d(out_planes, out_planes, 3, padding=1,
                               bias=False)
        self.bn3 = nn.BatchNorm2d(out_planes)

    def __call__(self, params, x, **kw):
        x = nn.relu(self.bn1(params["bn1"],
                             self.conv1(params["conv1"], x), **kw))
        x = nn.relu(self.bn2(params["bn2"],
                             self.conv2(params["conv2"], x), **kw))
        return nn.relu(self.bn3(params["bn3"],
                                self.conv3(params["conv3"], x), **kw))


class VGGEncoder(Module):
    def __init__(self, planes):
        super().__init__()
        self.levels = len(planes)
        in_p = 3
        for i, p in enumerate(planes):
            setattr(self, f"block_{i}", VGGBasicBlock(in_p, p))
            in_p = p

    def __call__(self, params, x, **kw):
        # natural fine-to-coarse order, same contract as DLAEncoder
        # (hd3.py:198-200 reverses to coarse-to-fine)
        outs = []
        for i in range(self.levels):
            x = getattr(self, f"block_{i}")(params[f"block_{i}"], x, **kw)
            outs.append(x)
        return outs


# ------------------------------------------------------------------ model
class HD3(BaseModel):
    pretrained_checkpoints = {
        "chairs": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/hd3-chairs-0d46c9fd.ckpt",
        "things": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/hd3-things-afcd2eb4.ckpt",
        "sintel": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/hd3-sintel-10689995.ckpt",
        "kitti": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/hd3-kitti-6eb77dd3.ckpt",
    }

    def __init__(self, task: str = "flow", encoder: str = "dlaup",
                 decoder: str = "hda", downsample: int = 6,
                 corr_range: Sequence[int] = (4, 4, 4, 4, 4, 4),
                 context: bool = False, **kwargs):
        super().__init__(output_stride=int(2 ** downsample),
                         loss_fn=HD3Loss(), **kwargs)
        assert task == "flow"
        self.downsample = downsample
        self.corr_range = list(corr_range)[:5]
        self.context = context
        self.levels = len(self.corr_range)
        self.classes = [(2 * d + 1) ** 2 for d in self.corr_range]

        if encoder == "vgg":
            pyr_channels = [16, 32, 64, 96, 128, 196]
            self.encoder = VGGEncoder(pyr_channels)
        else:
            pyr_channels = [16, 32, 64, 128, 256, 512, 512]
            self.encoder = DLAEncoder(pyr_channels)

        dec_block = HDADecoder if decoder == "hda" else ResnetDecoder
        feat_d_offset = pyr_channels[::-1]
        feat_d_offset[0] = 0
        up_d_offset = [0] + self.classes[1:]
        for level in range(self.levels):
            setattr(self, f"cost_bn_{level}",
                    nn.BatchNorm2d(self.classes[level]))
            input_d = (self.classes[level] + feat_d_offset[level] +
                       up_d_offset[level] + 2 * (level > 0))
            up_classes = self.classes[level + 1] \
                if level < self.levels - 1 else -1
            if self.context and level == self.levels - 1:
                setattr(self, f"Decoder_{level}",
                        HD3ContextHead(input_d, self.classes[level]))
            else:
                setattr(self, f"Decoder_{level}",
                        HD3Decoder(input_d, dec_block, self.classes[level],
                                   up_classes=up_classes))

    def forward(self, params, inputs: Dict[str, Any],
                training: bool = False) -> Dict[str, jnp.ndarray]:
        images, image_resizer = self.preprocess_images(
            inputs["images"], bgr_add=[-0.485, -0.456, -0.406],
            bgr_mult=[1 / 0.229, 1 / 0.224, 1 / 0.225], bgr_to_rgb=False,
            resize_mode="interpolation", interpolation_mode="bilinear",
            interpolation_align_corners=True)
        kw = dict(training=training)
        bs = images.shape[0]
        feat_list = self.encoder(
            params["encoder"],
            jnp.concatenate([images[:, 0], images[:, 1]], axis=0), **kw)
        fp_0 = [f[:bs] for f in feat_list[::-1]]
        fp_1 = [f[bs:] for f in feat_list[::-1]]

        ms_prob = []
        ms_vect = []
        up_curr_vect = None
        up_feat = None
        for level in range(self.levels):
            ref_feat = fp_0[level]
            tar_feat = fp_1[level]
            if level == 0:
                tar_corr = tar_feat
            else:
                tar_corr = hd3_flow_warp(tar_feat, up_curr_vect)
            cost_vol = local_correlation(ref_feat, tar_corr, 4,
                                         normalize=True)
            cost_bn = getattr(self, f"cost_bn_{level}")
            cost_vol = cost_bn(params[f"cost_bn_{level}"], cost_vol, **kw)

            if level == 0:
                dec_in = cost_vol
            else:
                dec_in = jnp.concatenate(
                    [cost_vol, ref_feat, up_feat, up_curr_vect], axis=-1)
            dec = getattr(self, f"Decoder_{level}")
            prob_map, up_feat = dec(params[f"Decoder_{level}"], dec_in,
                                    **kw)
            curr_vect = density2vector(prob_map, normalize=True)
            if level > 0:
                curr_vect = curr_vect + up_curr_vect
            ms_prob.append(prob_map)
            ms_vect.append(curr_vect * 2 ** (self.downsample - level))
            if level < self.levels - 1:
                up = interpolate(curr_vect, (2 * curr_vect.shape[1],
                                             2 * curr_vect.shape[2]),
                                 align_corners=True)
                up_curr_vect = 2 * up

        flow_last = ms_vect[-1]
        flow_up = interpolate(flow_last, (4 * flow_last.shape[1],
                                          4 * flow_last.shape[2]),
                              align_corners=False)
        flow_up = self.postprocess_predictions(flow_up, image_resizer,
                                               is_flow=True)
        outputs = {"flows": self.nhwc_flow_to_output(flow_up)}
        if training:
            outputs["ms_prob"] = ms_prob
            outputs["ms_pred"] = ms_vect
            outputs["corr_range"] = self.corr_range
            outputs["downsample"] = self.downsample
        return outputs


class HD3Context(HD3):
    pretrained_checkpoints = {
        "chairs": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/hd3_ctxt-chairs-d7448468.ckpt",
        "things": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/hd3_ctxt-things-f1681f75.ckpt",
        "sintel": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/hd3_ctxt-sintel-22e655e9.ckpt",
        "kitti": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/hd3_ctxt-kitti-e7d69776.ckpt",
    }

    def __init__(self, context: bool = True, **kwargs):
        super().__init__(context=context, **kwargs)


@register_model
@trainable
@ptlflow_trained
class hd3(HD3):
    pass


@register_model
@trainable
@ptlflow_trained
class hd3_ctxt(HD3Context):
    pass
