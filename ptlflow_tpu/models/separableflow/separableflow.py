"""SeparableFlow: separated 1-D cost volumes with semi-global aggregation.

Parity with /root/reference/ptlflow/models/separableflow/separableflow.py
(Guidance :41-207, SeparableFlow :207-384), corr.py (NLF :18-37, CorrBlock
:40-145, CorrBlock1D :185-274), update.py (BasicMotionEncoder :94-124,
BasicUpdateBlock :142-166).  The GANet CUDA extension is replaced by the
scan-based ops in ganet.py.

Note: like the reference, the 3D aggregation U-Nets require the 1/8-scale
dims to survive three stride-2 halvings and exact doublings, i.e. H and W
divisible by 64.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ... import nn
from ...ops.correlation import coords_grid, corr_pyramid_lookup
from ...ops.upsample import convex_upsample
from ...utils.registry import register_model, trainable
from ..base import BaseModel
from ..raft.extractor import BasicEncoder
from ..raft.raft import SequenceLoss
from ..raft.update import FlowHead, SepConvGRU
from .cost_agg import CostAggregation, linear_resize_axis, trilinear_resize
from .ganet import _l1_normalize, nlf_iter


def _in_relu(channels):
    return [nn.InstanceNorm2d(channels), nn.relu]


def _conv_in_relu(cin, cout, stride=1):
    return [nn.Conv2d(cin, cout, 3, stride=stride, padding=1),
            nn.InstanceNorm2d(cout), nn.relu]


class Guidance(nn.Module):
    """Guidance weight heads (separableflow.py:41-207)."""

    def __init__(self, channels=32):
        super().__init__()
        self.wsize = 20
        self.bn_relu = nn.Sequential(*_in_relu(channels))
        self.conv0 = nn.Sequential(
            nn.Conv2d(3, 16, 3, padding=1), nn.InstanceNorm2d(16), nn.relu,
            *_conv_in_relu(16, channels // 4, stride=2),
            *_conv_in_relu(channels // 4, channels // 2, stride=2),
            *_conv_in_relu(channels // 2, channels, stride=2))
        inner = channels // 4
        self.conv1 = nn.Sequential(*_conv_in_relu(channels * 2, inner))
        self.conv2 = nn.Sequential(*_conv_in_relu(inner, inner),
                                   *_conv_in_relu(inner, inner))
        self.conv3 = nn.Sequential(*_conv_in_relu(inner, inner),
                                   *_conv_in_relu(inner, inner))
        self.conv11 = nn.Sequential(*_conv_in_relu(inner, inner * 2,
                                                   stride=2))
        self.conv12 = nn.Sequential(*_conv_in_relu(inner * 2, inner * 2),
                                    *_conv_in_relu(inner * 2, inner * 2))
        self.weights = nn.Sequential(
            *_conv_in_relu(inner, inner),
            nn.Conv2d(inner, self.wsize, 3, stride=1, padding=1))
        for name, cin in (("weight_sg1", inner), ("weight_sg2", inner),
                          ("weight_sg3", inner), ("weight_sg11", inner * 2),
                          ("weight_sg12", inner * 2)):
            setattr(self, name, nn.Sequential(
                *_conv_in_relu(cin, cin),
                nn.Conv2d(cin, self.wsize * 2, 3, stride=1, padding=1)))

    def __call__(self, params, fea, img, training: bool = False, **kw):
        kwt = dict(training=training)
        x = self.conv0(params["conv0"], img, **kwt)
        x = jnp.concatenate(
            [self.bn_relu(params.get("bn_relu", {}), fea, **kwt), x], -1)
        x = self.conv1(params["conv1"], x, **kwt)
        rem = x
        x = self.conv2(params["conv2"], x, **kwt) + rem
        rem = x
        guid = self.weights(params["weights"], x, **kwt)
        x = self.conv3(params["conv3"], x, **kwt) + rem
        sgs = {}
        for name in ("sg1", "sg2", "sg3"):
            out = getattr(self, f"weight_{name}")(
                params[f"weight_{name}"], x, **kwt)
            sgs[name] = (out[..., :self.wsize], out[..., self.wsize:])
        x = self.conv11(params["conv11"], x, **kwt)
        rem = x
        x = self.conv12(params["conv12"], x, **kwt) + rem
        for name in ("sg11", "sg12"):
            out = getattr(self, f"weight_{name}")(
                params[f"weight_{name}"], x, **kwt)
            sgs[name] = (out[..., :self.wsize], out[..., self.wsize:])
        guid_u = {k: v[0] for k, v in sgs.items()}
        guid_v = {k: v[1] for k, v in sgs.items()}
        return guid, guid_u, guid_v


def nlf_volume(corr: jnp.ndarray, guid: jnp.ndarray) -> jnp.ndarray:
    """Guided non-local filtering of the full correlation volume
    (corr.py NLF :18-37): channels = target-frame pixels, spatial dims =
    reference-frame pixels.  corr: (B, H2, W2, H1, W1); guid: NHWC
    (B, H1, W1, 20)."""
    b, h2, w2, h1, w1 = corr.shape
    x = corr.reshape(b, h2 * w2, h1, w1)
    g = jnp.moveaxis(guid, -1, 1)
    k1, k2, k3, k4 = jnp.split(g, 4, axis=1)
    gs = [_l1_normalize(k, axis=1) for k in (k1, k2, k3, k4)]
    x = nlf_iter(x, *gs)
    return x.reshape(b, h2, w2, h1, w1)


class BasicMotionEncoder(nn.Module):
    """3-volume motion encoder (update.py:94-124)."""

    def __init__(self, corr_levels, corr_radius):
        super().__init__()
        cor_planes = corr_levels * (2 * corr_radius + 1) ** 2
        cor1_planes = corr_levels * (2 * corr_radius + 1)
        self.convc1 = nn.Conv2d(cor_planes, 256, 1, padding=0)
        self.convc11 = nn.Conv2d(cor1_planes, 64, 1, padding=0)
        self.convc12 = nn.Conv2d(cor1_planes, 64, 1, padding=0)
        self.convc2 = nn.Conv2d(256, 192, 3, padding=1)
        self.convc21 = nn.Conv2d(64, 64, 3, padding=1)
        self.convc22 = nn.Conv2d(64, 64, 3, padding=1)
        self.convf1 = nn.Conv2d(2, 128, 7, padding=3)
        self.convf2 = nn.Conv2d(128, 64, 3, padding=1)
        self.conv = nn.Conv2d(64 + 192 + 64 * 2, 128 - 2, 3, padding=1)

    def __call__(self, params, flow, corr, corr1, corr2, **kw):
        cor = nn.relu(self.convc1(params["convc1"], corr))
        cor = nn.relu(self.convc2(params["convc2"], cor))
        c1 = nn.relu(self.convc11(params["convc11"], corr1))
        c1 = nn.relu(self.convc21(params["convc21"], c1))
        c2 = nn.relu(self.convc12(params["convc12"], corr2))
        c2 = nn.relu(self.convc22(params["convc22"], c2))
        flo = nn.relu(self.convf1(params["convf1"], flow))
        flo = nn.relu(self.convf2(params["convf2"], flo))
        out = nn.relu(self.conv(params["conv"], jnp.concatenate(
            [cor, c1, c2, flo], -1)))
        return jnp.concatenate([out, flow], -1)


class BasicUpdateBlock(nn.Module):
    def __init__(self, corr_levels, corr_radius, hidden_dim=128):
        super().__init__()
        self.encoder = BasicMotionEncoder(corr_levels, corr_radius)
        self.gru = SepConvGRU(hidden_dim=hidden_dim,
                              input_dim=128 + hidden_dim)
        self.flow_head = FlowHead(hidden_dim, hidden_dim=256)
        self.mask = nn.Sequential(
            nn.Conv2d(128, 256, 3, padding=1), nn.relu,
            nn.Conv2d(256, 64 * 9, 1, padding=0))

    def __call__(self, params, net, inp, corr, corr1, corr2, flow, **kw):
        motion = self.encoder(params["encoder"], flow, corr, corr1, corr2)
        inp = jnp.concatenate([inp, motion], -1)
        net = self.gru(params["gru"], net, inp)
        delta_flow = self.flow_head(params["flow_head"], net)
        mask = 0.25 * self.mask(params["mask"], net)
        return net, mask, delta_flow


def separate_volume(pyramid, shape):
    """Max+mean separation of each pyramid level (corr.py:60-96).

    pyramid: list of (B*H1*W1, H2_l, W2_l, 1); shape = (B, H1, W1, H2, W2).
    Returns sep_u (B, 2L, W2, H1, W1) and sep_v (B, 2L, H2, H1, W1).
    """
    b, h1, w1, h2, w2 = shape
    sep_u, sep_v = [], []
    for corr in pyramid:
        cl = corr[..., 0]  # (BHW, H2l, W2l)
        # u: reduce over H2 -> profiles along W2
        m1 = cl.max(axis=1)
        m2 = cl.mean(axis=1)
        sep = jnp.stack([m1, m2], axis=1)  # (BHW, 2, W2l)
        sep = sep.reshape(b, h1, w1, 2, -1).transpose(0, 3, 4, 1, 2)
        # (B, 2, W2l, H1, W1) -> upsample W2l -> W2 (align_corners=True)
        sep = linear_resize_axis(sep, 2, w2, align_corners=True)
        sep_u.append(sep)
        m1 = cl.max(axis=2)
        m2 = cl.mean(axis=2)
        sep = jnp.stack([m1, m2], axis=2)  # (BHW, H2l, 2)
        sep = sep.reshape(b, h1, w1, -1, 2).transpose(0, 4, 3, 1, 2)
        sep = linear_resize_axis(sep, 2, h2, align_corners=True)
        sep_v.append(sep)
    return jnp.concatenate(sep_u, 1), jnp.concatenate(sep_v, 1)


def lookup_1d(corr1d, coords_1c, radius, num_levels=4, clamp_coords=False):
    """1-D pyramid lookup (corr.py CorrBlock1D :185-274).

    corr1d: (B, H1, W1, D) base volume; coords_1c: (B, H1, W1) positions.
    Builds the avg-pool pyramid on the fly and linearly samples
    (2r+1) offsets per level (zero padding OOB).  ``clamp_coords``
    reproduces the reference's pyramid-1 quirk of clamping the *pixel*
    coordinates to [-1, 1] before sampling (corr.py:243).
    """
    b, h1, w1, d = corr1d.shape
    vol = corr1d.reshape(b * h1 * w1, d)
    out = []
    dx = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    base = coords_1c.reshape(-1)[:, None]
    for i in range(num_levels):
        dl = vol.shape[-1]
        pos = base / (2 ** i) + dx[None]
        if clamp_coords:
            pos = jnp.clip(pos, -1.0, 1.0)
        # Linear interpolation as a dense weight contraction: the weight of
        # bin d is relu(1 - |pos - d|) — (1-frac) at floor(pos), frac at
        # floor(pos)+1, zero outside the volume.  A take_along_axis gather
        # here costs ~12.5 ms/GRU-iter on v5e (gathers serialize); the
        # dense form is vectorized elementwise work + a tiny reduction.
        dgrid = jnp.arange(dl, dtype=jnp.float32)
        wmat = jax.nn.relu(1.0 - jnp.abs(pos[:, :, None] - dgrid))
        out.append(jnp.einsum("qad,qd->qa", wmat, vol))
        # avg_pool kernel 2 stride 2 along D (drops a trailing odd element)
        even = dl - dl % 2
        vol = 0.5 * (vol[:, 0:even:2] + vol[:, 1:even:2])
    out = jnp.concatenate(out, axis=1)
    return out.reshape(b, h1, w1, -1)


class SeparableFlow(BaseModel):
    pretrained_checkpoints = {
        "things": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/separableflow-things-31fe3b2d.ckpt",
        "sintel": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/separableflow-sintel-4c9a8c03.ckpt",
        "kitti": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/separableflow-kitti-c9395318.ckpt",
        "universal": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/separableflow-universal-87350d91.ckpt",
    }

    def __init__(self, corr_levels: int = 4, corr_radius: int = 4,
                 dropout: float = 0.0, gamma: float = 0.8,
                 max_flow: float = 400, iters: int = 32,
                 hidden_dim: int = 128, context_dim: int = 128, **kwargs):
        # The reference uses output_stride=8 (separableflow.py:228) and its
        # GANet CUDA kernels tolerate odd grids; our scan-based aggregation
        # U-Net halves H/8 and W/8 twice, so inputs pad to /64 instead —
        # behavior-equivalent (extra padding is cropped from the output).
        super().__init__(output_stride=64,
                         loss_fn=SequenceLoss(gamma, max_flow), **kwargs)
        self.corr_levels = corr_levels
        self.corr_radius = corr_radius
        self.iters = iters
        self.hidden_dim = hidden_dim
        self.context_dim = context_dim
        self.fnet = BasicEncoder(output_dim=256, norm_fn="instance",
                                 dropout=dropout)
        self.cnet = BasicEncoder(output_dim=hidden_dim + context_dim,
                                 norm_fn="batch", dropout=dropout)
        self.update_block = BasicUpdateBlock(corr_levels=corr_levels,
                                             corr_radius=corr_radius,
                                             hidden_dim=hidden_dim)
        self.guidance = Guidance(channels=256)
        self.cost_agg1 = CostAggregation(in_channel=8)
        self.cost_agg2 = CostAggregation(in_channel=8)

    def forward(self, params, inputs: Dict[str, Any],
                training: bool = False) -> Dict[str, jnp.ndarray]:
        images, image_resizer = self.preprocess_images(
            inputs["images"], bgr_add=-0.5, bgr_mult=2.0, bgr_to_rgb=True,
            resize_mode="pad", pad_mode="replicate", pad_two_side=True)

        image1 = images[:, 0]
        image2 = images[:, 1]
        # two per-frame fnet passes, NOT one batched concat pass: the
        # batched variant was measured slower on v5e (the concat/split HBM
        # relayout costs more than the second launch; see raft.py)
        fmap1 = self.fnet(params["fnet"], image1, training=training)
        fmap2 = self.fnet(params["fnet"], image2, training=training)
        guid, guid_u, guid_v = self.guidance(
            params["guidance"], jax.lax.stop_gradient(fmap1), image1,
            training=training)

        b, h, w, c = fmap1.shape
        # reverse correlation + NLF (corr.py corr_compute :124-145)
        f1 = fmap1.reshape(b, h * w, c)
        f2 = fmap2.reshape(b, h * w, c)
        corr = jax.lax.dot_general(
            f2, f1, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) / jnp.sqrt(
            jnp.asarray(c, jnp.float32))
        corr = corr.reshape(b, h, w, h, w)  # (B, H2, W2, H1, W1)
        corr = nlf_volume(corr, guid)
        corr = corr.transpose(0, 3, 4, 1, 2)  # (B, H1, W1, H2, W2)

        pyramid = [corr.reshape(b * h * w, h, w, 1).astype(fmap1.dtype)]
        for _ in range(self.corr_levels - 1):
            pyramid.append(nn.avg_pool2d(pyramid[-1], 2, 2))

        cnet = self.cnet(params["cnet"], image1, training=training)
        net = jnp.tanh(cnet[..., :self.hidden_dim])
        inp = nn.relu(cnet[..., self.hidden_dim:])

        sep_u, sep_v = separate_volume(pyramid, (b, h, w, h, w))
        # cost_agg expects NDHWC
        u_out = self.cost_agg1(params["cost_agg1"],
                               sep_u.transpose(0, 2, 3, 4, 1), guid_u,
                               max_shift=384, is_ux=True, training=training)
        v_out = self.cost_agg2(params["cost_agg2"],
                               sep_v.transpose(0, 2, 3, 4, 1), guid_v,
                               max_shift=384, is_ux=False, training=training)
        if training:
            u0, u1, flow_u, corr1 = u_out
            v0, v1, flow_v, corr2 = v_out
            inits = [jnp.concatenate([u0, v0], 1),
                     jnp.concatenate([u1, v1], 1)]
        else:
            flow_u, corr1 = u_out
            flow_v, corr2 = v_out
            inits = []
        flow_init = jnp.concatenate([flow_u, flow_v], axis=1)  # (B,2,H*,W*)

        # downscale init flow to 1/8 (separableflow.py:345-351)
        from ...ops.grid_sample import interpolate

        fi = jnp.moveaxis(jax.lax.stop_gradient(flow_init) / 8.0, 1, -1)
        fi = interpolate(fi, (h, w), mode="bilinear", align_corners=True)
        coords0 = coords_grid(b, h, w, dtype=fmap1.dtype)
        coords1 = coords0 + fi

        # 1D volumes: corr1 (B, D=W2, H1, W1, 1) -> (B, H1, W1, W2)
        corr1d_u = corr1[..., 0].transpose(0, 2, 3, 1)
        corr1d_v = corr2[..., 0].transpose(0, 2, 3, 1)

        up_params = params["update_block"]

        def step(carry, _):
            net, coords1, _ = carry
            coords1 = jax.lax.stop_gradient(coords1)
            corr = corr_pyramid_lookup(pyramid, coords1, self.corr_radius)
            c1 = lookup_1d(corr1d_u, coords1[..., 0], self.corr_radius,
                           self.corr_levels, clamp_coords=True)
            c2 = lookup_1d(corr1d_v, coords1[..., 1], self.corr_radius,
                           self.corr_levels, clamp_coords=False)
            flow = coords1 - coords0
            net, up_mask, delta_flow = self.update_block(
                up_params, net, inp, corr, c1, c2, flow)
            coords1 = coords1 + delta_flow
            ys = (coords1 - coords0, up_mask) if training else None
            return (net, coords1, up_mask), ys

        mask0 = jnp.zeros((b, h, w, 64 * 9), fmap1.dtype)
        (net, coords1, last_mask), ys = jax.lax.scan(
            step, (net, coords1, mask0), None, length=self.iters)

        if training:
            flows_lr, masks = ys
            it, bb = flows_lr.shape[0], flows_lr.shape[1]
            flow_ups = convex_upsample(
                flows_lr.reshape(it * bb, h, w, 2),
                masks.reshape(it * bb, h, w, masks.shape[-1]))
            flow_ups = flow_ups.reshape(it, bb, 8 * h, 8 * w, 2)
            flow_ups = self.postprocess_predictions(flow_ups, image_resizer,
                                                    is_flow=True)
            init_preds = [self.postprocess_predictions(
                jnp.moveaxis(f, 1, -1), image_resizer, is_flow=True)
                for f in inits + [flow_init]]
            all_preds = jnp.stack(
                init_preds + [flow_ups[i] for i in range(it)], axis=0)
            return {"flows": self.nhwc_flow_to_output(flow_ups[-1]),
                    "flow_preds": all_preds}
        flow_up = convex_upsample(coords1 - coords0, last_mask)
        flow_up = self.postprocess_predictions(flow_up, image_resizer,
                                               is_flow=True)
        return {"flows": self.nhwc_flow_to_output(flow_up),
                "flow_small": jnp.moveaxis(coords1 - coords0, -1, -3)}


@register_model
@trainable
class separableflow(SeparableFlow):
    pass
