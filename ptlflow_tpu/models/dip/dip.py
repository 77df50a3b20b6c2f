"""DIP — Deep Inverse Patchmatch
(reference: ptlflow/models/dip/dip.py:42-352, path_match.py:12-74,
update.py:76-165, extractor.py:197-266).

Patchmatch-style flow: random initialization, inverse propagation (the
4 diagonal-shifted target copies warped in one grid_sample) and a 5x5
local search, alternating small/basic update blocks at 1/16 then 1/4.

Notes vs the reference:
- random flow init uses a fixed jax PRNG key in eval (the reference seeds
  torch's RNG with 20; the distributions match, the draws are not
  bit-identical).
- the warm-start ``inference`` path sizes its pyramid from the previous
  flow magnitude (data-dependent python control flow); the standard
  two-stage forward is used for all inputs here.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ... import nn
from ...nn import Module
from ...nn.layers import avg_pool2d
from ...ops.correlation import coords_grid
from ...ops.grid_sample import grid_sample
from ...ops.upsample import convex_upsample
from ...utils.registry import register_model, trainable
from ..base.base_model import BaseModel
from ..raft.raft import SequenceLoss
from ..raft.update import ConvGRU, FlowHead, SepConvGRU


class DIPResidualBlock(Module):
    """extractor.py:6-60 — the downsample 1x1 conv ALWAYS exists (even at
    stride 1 with equal channels), unlike RAFT's block."""

    def __init__(self, in_planes, planes, norm_fn="instance", stride=1):
        super().__init__()
        assert norm_fn == "instance"
        self.conv1 = nn.Conv2d(in_planes, planes, 3, padding=1,
                               stride=stride)
        self.conv2 = nn.Conv2d(planes, planes, 3, padding=1)
        self.norm1 = nn.InstanceNorm2d(planes)
        self.norm2 = nn.InstanceNorm2d(planes)
        self.norm3 = nn.InstanceNorm2d(planes)
        self.downsample = nn.Sequential(
            nn.Conv2d(in_planes, planes, 1, stride=stride))

    def __call__(self, params, x, **kw):
        y = nn.relu(self.norm1({}, self.conv1(params["conv1"], x)))
        y = nn.relu(self.norm2({}, self.conv2(params["conv2"], y)))
        x = self.norm3({}, self.downsample(params["downsample"], x))
        return nn.relu(x + y)


class BasicEncoderQuarter(Module):
    """extractor.py:197-266 (stride 4)."""

    def __init__(self, output_dim=256, norm_fn="instance", dropout=0.0):
        super().__init__()
        self.norm_fn = norm_fn
        if norm_fn == "instance":
            self.norm1 = nn.InstanceNorm2d(64)
        elif norm_fn == "batch":
            self.norm1 = nn.BatchNorm2d(64)
        else:
            self.norm1 = None
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3)
        self.layer1 = nn.Sequential(DIPResidualBlock(64, 64, norm_fn, 1),
                                    DIPResidualBlock(64, 64, norm_fn, 1))
        self.layer2 = nn.Sequential(DIPResidualBlock(64, 96, norm_fn, 2),
                                    DIPResidualBlock(96, 96, norm_fn, 1))
        self.layer3 = nn.Sequential(DIPResidualBlock(96, 128, norm_fn, 1),
                                    DIPResidualBlock(128, 128, norm_fn, 1))
        self.conv2 = nn.Conv2d(128, output_dim, 1)

    def __call__(self, params, x, **kw):
        x = self.conv1(params["conv1"], x)
        if self.norm1 is not None:
            x = self.norm1(params.get("norm1", {}), x, **kw)
        x = nn.relu(x)
        x = self.layer1(params["layer1"], x, **kw)
        x = self.layer2(params["layer2"], x, **kw)
        x = self.layer3(params["layer3"], x, **kw)
        return self.conv2(params["conv2"], x)


class PathMatch:
    """path_match.py:12-74 (NHWC)."""

    def __init__(self, fmap1, fmap2):
        self.map1 = fmap1
        self.map2 = fmap2
        b, h, w, c = fmap1.shape
        self.b, self.h, self.w, self.c = b, h, w, c
        self.coords = coords_grid(b, h, w, dtype=fmap1.dtype)
        # [fmap2, top-left, top-right, down-left, down-right] shifted copies
        f = fmap2
        tl = jnp.pad(f, ((0, 0), (1, 0), (1, 0), (0, 0)),
                     mode="edge")[:, :h, :w]
        tr = jnp.pad(f, ((0, 0), (1, 0), (0, 1), (0, 0)),
                     mode="edge")[:, :h, 1:]
        dl = jnp.pad(f, ((0, 0), (0, 1), (1, 0), (0, 0)),
                     mode="edge")[:, 1:, :w]
        dr = jnp.pad(f, ((0, 0), (0, 1), (0, 1), (0, 0)),
                     mode="edge")[:, 1:, 1:]
        self.shift_map2 = jnp.concatenate([f, tl, tr, dl, dr], axis=-1)

    def _warp(self, coords, image):
        xg = 2.0 * coords[..., 0] / max(self.w - 1, 1) - 1.0
        yg = 2.0 * coords[..., 1] / max(self.h - 1, 1) - 1.0
        grid = jnp.stack([xg, yg], axis=-1)
        return grid_sample(image, grid, mode="bilinear",
                           padding_mode="border", align_corners=True)

    def search(self, flow):
        map2_warp = self._warp(self.coords + flow, self.map2)
        p = jnp.pad(map2_warp, ((0, 0), (2, 2), (2, 2), (0, 0)),
                    mode="edge")
        corrs = [jnp.mean(self.map1 * p[:, j:j + self.h, i:i + self.w],
                          axis=-1, keepdims=True)
                 for i in range(5) for j in range(5)]
        return jnp.concatenate(corrs, axis=-1)

    def inverse_propagation(self, flow):
        map2_warp = self._warp(self.coords + flow, self.shift_map2)
        m2 = map2_warp.reshape(self.b, self.h, self.w, self.c // 2, 2, 5)
        m1 = self.map1.reshape(self.b, self.h, self.w, self.c // 2, 2, 1)
        corr = jnp.mean(m2 * m1, axis=3)  # (B, H, W, 2, 5)
        return corr.reshape(self.b, self.h, self.w, 10)

    def __call__(self, flow, is_search=True):
        return self.search(flow) if is_search else \
            self.inverse_propagation(flow)


class SmallMotionEncoder(Module):
    """update.py:76-91 (10-ch inverse-propagation corr)."""

    def __init__(self):
        super().__init__()
        self.convc1 = nn.Conv2d(10, 96, 1)
        self.convf1 = nn.Conv2d(2, 64, 5, padding=2)
        self.convf2 = nn.Conv2d(64, 32, 3, padding=1)
        self.conv = nn.Conv2d(128, 96 - 2, 3, padding=1)

    def __call__(self, params, flow, corr, **kw):
        cor = nn.relu(self.convc1(params["convc1"], corr))
        flo = nn.relu(self.convf1(params["convf1"], flow))
        flo = nn.relu(self.convf2(params["convf2"], flo))
        out = nn.relu(self.conv(params["conv"],
                                jnp.concatenate([cor, flo], axis=-1)))
        return jnp.concatenate([out, flow], axis=-1)


class DIPBasicMotionEncoder(Module):
    """update.py:94-112 (25-ch search corr)."""

    def __init__(self):
        super().__init__()
        self.convc1 = nn.Conv2d(25, 64, 1)
        self.convc2 = nn.Conv2d(64, 128, 3, padding=1)
        self.convf1 = nn.Conv2d(2, 64, 5, padding=2)
        self.convf2 = nn.Conv2d(64, 64, 3, padding=1)
        self.conv = nn.Conv2d(64 + 128, 128 - 2, 3, padding=1)

    def __call__(self, params, flow, corr, **kw):
        cor = nn.relu(self.convc1(params["convc1"], corr))
        cor = nn.relu(self.convc2(params["convc2"], cor))
        flo = nn.relu(self.convf1(params["convf1"], flow))
        flo = nn.relu(self.convf2(params["convf2"], flo))
        out = nn.relu(self.conv(params["conv"],
                                jnp.concatenate([cor, flo], axis=-1)))
        return jnp.concatenate([out, flow], axis=-1)


class SmallUpdateBlock(Module):
    def __init__(self, hidden_dim=128):
        super().__init__()
        self.encoder = SmallMotionEncoder()
        self.gru = ConvGRU(hidden_dim=hidden_dim, input_dim=96 + hidden_dim)
        self.flow_head = FlowHead(hidden_dim, hidden_dim=128)
        self.mask = nn.Sequential(
            nn.Conv2d(128, 256, 3, padding=1), nn.relu,
            nn.Conv2d(256, 16 * 9, 1))

    def __call__(self, params, net, inp, corr, flow, **kw):
        mf = self.encoder(params["encoder"], flow, corr)
        inp = jnp.concatenate([inp, mf], axis=-1)
        net = self.gru(params["gru"], net, inp)
        delta = self.flow_head(params["flow_head"], net)
        mask = 0.25 * self.mask(params["mask"], net)
        return net, mask, delta


class DIPBasicUpdateBlock(Module):
    def __init__(self, hidden_dim=128):
        super().__init__()
        self.encoder = DIPBasicMotionEncoder()
        self.gru = SepConvGRU(hidden_dim=hidden_dim,
                              input_dim=128 + hidden_dim)
        self.flow_head = FlowHead(hidden_dim, hidden_dim=256)
        self.mask = nn.Sequential(
            nn.Conv2d(128, 256, 3, padding=1), nn.relu,
            nn.Conv2d(256, 16 * 9, 1))

    def __call__(self, params, net, inp, corr, flow, **kw):
        mf = self.encoder(params["encoder"], flow, corr)
        inp = jnp.concatenate([inp, mf], axis=-1)
        net = self.gru(params["gru"], net, inp)
        delta = self.flow_head(params["flow_head"], net)
        mask = 0.25 * self.mask(params["mask"], net)
        return net, mask, delta


class DIP(BaseModel):
    pretrained_checkpoints = {
        "kitti": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/dip-kitti-b0b678b4.ckpt",
        "sintel": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/dip-sintel-7abeb652.ckpt",
        "things": "https://github.com/hmorimitsu/ptlflow/releases/download/weights1/dip-things-688d52a0.ckpt",
    }

    def __init__(self, gamma: float = 0.8, max_flow: float = 400,
                 iters: int = 20, max_offset: int = 256, **kwargs):
        super().__init__(output_stride=16,
                         loss_fn=SequenceLoss(gamma, max_flow), **kwargs)
        self.iters = iters
        self.max_offset = max_offset
        self.hidden_dim = 128
        self.context_dim = 128
        self.fnet = BasicEncoderQuarter(output_dim=256, norm_fn="instance")
        self.update_block_s = SmallUpdateBlock(hidden_dim=self.hidden_dim)
        self.update_block = DIPBasicUpdateBlock(hidden_dim=self.hidden_dim)

    def forward(self, params, inputs: Dict[str, Any],
                training: bool = False) -> Dict[str, jnp.ndarray]:
        images, image_resizer = self.preprocess_images(
            inputs["images"], bgr_add=-0.5, bgr_mult=2.0, bgr_to_rgb=False,
            resize_mode="pad", pad_mode="constant", pad_two_side=True,
            pad_value=-1)
        image1 = images[:, 0]
        image2 = images[:, 1]
        kw = dict(training=training)

        both = self.fnet(params["fnet"],
                         jnp.concatenate([image1, image2], axis=0), **kw)
        fmap1, fmap2 = jnp.split(both, 2, axis=0)
        net = jnp.tanh(fmap1[..., :self.hidden_dim])
        inp = nn.relu(fmap1[..., self.hidden_dim:])

        s_fmap1 = avg_pool2d(fmap1, 4, 4)
        s_fmap2 = avg_pool2d(fmap2, 4, 4)
        s_net = avg_pool2d(net, 4, 4)
        s_inp = avg_pool2d(inp, 4, 4)

        s_patch = PathMatch(s_fmap1, s_fmap2)
        b, sh, sw, _ = s_fmap1.shape
        key = jax.random.PRNGKey(20)
        s_flow = (jax.random.uniform(key, (b, sh, sw, 2),
                                     dtype=image1.dtype) - 0.5) * 2 * \
            (self.max_offset // 16)

        def s_step(carry, _):
            s_flow, s_net = carry
            s_flow = jax.lax.stop_gradient(s_flow)
            corr = s_patch(s_flow, is_search=False)
            s_net, mask1, d1 = self.update_block_s(
                params["update_block_s"], s_net, s_inp, corr, s_flow)
            s_flow1 = s_flow + d1
            s_flow2 = jax.lax.stop_gradient(s_flow1)
            corr = s_patch(s_flow2, is_search=True)
            s_net, mask2, d2 = self.update_block(
                params["update_block"], s_net, s_inp, corr, s_flow2)
            s_flow = s_flow2 + d2
            return (s_flow, s_net), (s_flow1, mask1, s_flow, mask2)

        (s_flow, s_net), ys = jax.lax.scan(s_step, (s_flow, s_net), None,
                                           length=self.iters)
        # flow at 1/4 from the last small-stage upsample (dip.py:299-300)
        flow = convex_upsample(s_flow, ys[3][-1], 4)

        patch = PathMatch(fmap1, fmap2)

        def l_step(carry, _):
            flow, net = carry
            flow = jax.lax.stop_gradient(flow)
            corr = patch(flow, is_search=False)
            net, mask1, d1 = self.update_block_s(
                params["update_block_s"], net, inp, corr, flow)
            flow1 = flow + d1
            flow2 = jax.lax.stop_gradient(flow1)
            corr = patch(flow2, is_search=True)
            net, mask2, d2 = self.update_block(
                params["update_block"], net, inp, corr, flow2)
            flow = flow2 + d2
            return (flow, net), (flow1, mask1, flow, mask2)

        (flow, net), lys = jax.lax.scan(l_step, (flow, net), None,
                                        length=self.iters)
        flow_up = convex_upsample(flow, lys[3][-1], 4)
        flow_up = self.postprocess_predictions(flow_up, image_resizer,
                                               is_flow=True)

        if training:
            # per-iteration full-res supervision at both stages
            # (dip.py:289-338): small-stage flows are convex-upsampled to
            # 1/4 then bilinearly x4'd; large-stage flows upsampled directly
            def upflow4(f):
                b_, h_, w_, _ = f.shape
                return 4 * jax.image.resize(
                    f, (b_, h_ * 4, w_ * 4, 2), method="linear")

            preds = []
            for i in range(self.iters):
                for f_i, m_i in ((ys[0][i], ys[1][i]), (ys[2][i], ys[3][i])):
                    up = upflow4(convex_upsample(f_i, m_i, 4))
                    preds.append(self.postprocess_predictions(
                        up, image_resizer, is_flow=True))
            for i in range(self.iters):
                for f_i, m_i in ((lys[0][i], lys[1][i]),
                                 (lys[2][i], lys[3][i])):
                    preds.append(self.postprocess_predictions(
                        convex_upsample(f_i, m_i, 4), image_resizer,
                        is_flow=True))
            return {"flows": self.nhwc_flow_to_output(flow_up),
                    "flow_preds": jnp.stack(preds)}
        return {"flows": self.nhwc_flow_to_output(flow_up),
                "flow_small": flow}


@register_model
@trainable
class dip(DIP):
    pass
