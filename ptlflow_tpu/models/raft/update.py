"""RAFT update blocks: motion encoder + (Sep)ConvGRU + flow head.

Structural parity with /root/reference/ptlflow/models/raft/update.py:6-153
(attribute names match for checkpoint conversion).  The GRU step is designed
to be the body of a ``lax.scan`` over iterations (SURVEY.md §3.3): a pure
function of (net, inp, corr, flow).
"""

from __future__ import annotations

import jax.numpy as jnp

from ... import nn


class FlowHead(nn.Module):
    def __init__(self, input_dim=128, hidden_dim=256):
        super().__init__()
        self.conv1 = nn.Conv2d(input_dim, hidden_dim, 3, padding=1)
        self.conv2 = nn.Conv2d(hidden_dim, 2, 3, padding=1)

    def __call__(self, params, x, **kw):
        return self.conv2(params["conv2"],
                          nn.relu(self.conv1(params["conv1"], x)))


class ConvGRU(nn.Module):
    def __init__(self, hidden_dim=128, input_dim=192 + 128):
        super().__init__()
        self.convz = nn.Conv2d(hidden_dim + input_dim, hidden_dim, 3, padding=1)
        self.convr = nn.Conv2d(hidden_dim + input_dim, hidden_dim, 3, padding=1)
        self.convq = nn.Conv2d(hidden_dim + input_dim, hidden_dim, 3, padding=1)

    def __call__(self, params, h, x, **kw):
        hx = jnp.concatenate([h, x], axis=-1)
        z, r = SepConvGRU._zr(self.convz, params["convz"], params["convr"],
                              hx)
        q = nn.tanh(self.convq(params["convq"],
                               jnp.concatenate([r * h, x], axis=-1)))
        return (1 - z) * h + z * q


class SepConvGRU(nn.Module):
    def __init__(self, hidden_dim=128, input_dim=192 + 128):
        super().__init__()
        self.convz1 = nn.Conv2d(hidden_dim + input_dim, hidden_dim, (1, 5),
                                padding=(0, 2))
        self.convr1 = nn.Conv2d(hidden_dim + input_dim, hidden_dim, (1, 5),
                                padding=(0, 2))
        self.convq1 = nn.Conv2d(hidden_dim + input_dim, hidden_dim, (1, 5),
                                padding=(0, 2))
        self.convz2 = nn.Conv2d(hidden_dim + input_dim, hidden_dim, (5, 1),
                                padding=(2, 0))
        self.convr2 = nn.Conv2d(hidden_dim + input_dim, hidden_dim, (5, 1),
                                padding=(2, 0))
        self.convq2 = nn.Conv2d(hidden_dim + input_dim, hidden_dim, (5, 1),
                                padding=(2, 0))

    @staticmethod
    def _zr(conv, pz, pr, hx):
        """Run the z and r convs as ONE conv by concatenating their kernels
        on the output-channel axis: same math, but ``hx`` (the widest tensor
        in the GRU) is read from HBM once instead of twice.  The weight
        concat is loop-invariant, so XLA CSEs it across iterations."""
        w = jnp.concatenate([pz["weight"], pr["weight"]], axis=-1)
        b = jnp.concatenate([pz["bias"], pr["bias"]])
        zr = conv({"weight": w, "bias": b}, hx)
        z, r = jnp.split(zr, 2, axis=-1)
        return nn.sigmoid(z), nn.sigmoid(r)

    def __call__(self, params, h, x, **kw):
        # horizontal pass
        hx = jnp.concatenate([h, x], axis=-1)
        z, r = self._zr(self.convz1, params["convz1"], params["convr1"], hx)
        q = nn.tanh(self.convq1(params["convq1"],
                                jnp.concatenate([r * h, x], axis=-1)))
        h = (1 - z) * h + z * q
        # vertical pass
        hx = jnp.concatenate([h, x], axis=-1)
        z, r = self._zr(self.convz2, params["convz2"], params["convr2"], hx)
        q = nn.tanh(self.convq2(params["convq2"],
                                jnp.concatenate([r * h, x], axis=-1)))
        return (1 - z) * h + z * q


class SmallMotionEncoder(nn.Module):
    def __init__(self, corr_levels, corr_radius):
        super().__init__()
        cor_planes = corr_levels * (2 * corr_radius + 1) ** 2
        self.convc1 = nn.Conv2d(cor_planes, 96, 1, padding=0)
        self.convf1 = nn.Conv2d(2, 64, 7, padding=3)
        self.convf2 = nn.Conv2d(64, 32, 3, padding=1)
        self.conv = nn.Conv2d(128, 80, 3, padding=1)

    def __call__(self, params, flow, corr, **kw):
        cor = nn.relu(self.convc1(params["convc1"], corr))
        flo = nn.relu(self.convf1(params["convf1"], flow))
        flo = nn.relu(self.convf2(params["convf2"], flo))
        out = nn.relu(self.conv(params["conv"],
                                jnp.concatenate([cor, flo], axis=-1)))
        return jnp.concatenate([out, flow], axis=-1)


class BasicMotionEncoder(nn.Module):
    def __init__(self, corr_levels, corr_radius):
        super().__init__()
        cor_planes = corr_levels * (2 * corr_radius + 1) ** 2
        self.convc1 = nn.Conv2d(cor_planes, 256, 1, padding=0)
        self.convc2 = nn.Conv2d(256, 192, 3, padding=1)
        self.convf1 = nn.Conv2d(2, 128, 7, padding=3)
        self.convf2 = nn.Conv2d(128, 64, 3, padding=1)
        self.conv = nn.Conv2d(64 + 192, 128 - 2, 3, padding=1)

    def __call__(self, params, flow, corr, **kw):
        cor = nn.relu(self.convc1(params["convc1"], corr))
        cor = nn.relu(self.convc2(params["convc2"], cor))
        flo = nn.relu(self.convf1(params["convf1"], flow))
        flo = nn.relu(self.convf2(params["convf2"], flo))
        out = nn.relu(self.conv(params["conv"],
                                jnp.concatenate([cor, flo], axis=-1)))
        return jnp.concatenate([out, flow], axis=-1)


class SmallUpdateBlock(nn.Module):
    def __init__(self, corr_levels, corr_radius, hidden_dim=96):
        super().__init__()
        self.encoder = SmallMotionEncoder(corr_levels, corr_radius)
        self.gru = ConvGRU(hidden_dim=hidden_dim, input_dim=82 + 64)
        self.flow_head = FlowHead(hidden_dim, hidden_dim=128)

    def __call__(self, params, net, inp, corr, flow, **kw):
        motion_features = self.encoder(params["encoder"], flow, corr)
        inp = jnp.concatenate([inp, motion_features], axis=-1)
        net = self.gru(params["gru"], net, inp)
        delta_flow = self.flow_head(params["flow_head"], net)
        return net, None, delta_flow


class BasicUpdateBlock(nn.Module):
    def __init__(self, corr_levels, corr_radius, hidden_dim=128,
                 input_dim=128):
        super().__init__()
        self.encoder = BasicMotionEncoder(corr_levels, corr_radius)
        self.gru = SepConvGRU(hidden_dim=hidden_dim,
                              input_dim=128 + hidden_dim)
        self.flow_head = FlowHead(hidden_dim, hidden_dim=256)
        self.mask = nn.Sequential(
            nn.Conv2d(128, 256, 3, padding=1), nn.relu,
            nn.Conv2d(256, 64 * 9, 1, padding=0))

    def __call__(self, params, net, inp, corr, flow, **kw):
        motion_features = self.encoder(params["encoder"], flow, corr)
        inp = jnp.concatenate([inp, motion_features], axis=-1)
        net = self.gru(params["gru"], net, inp)
        delta_flow = self.flow_head(params["flow_head"], net)
        # 0.25 scales mask gradients, as in the reference (update.py:151-152)
        mask = 0.25 * self.mask(params["mask"], net)
        return net, mask, delta_flow
