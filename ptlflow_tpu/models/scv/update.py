"""SCV update blocks (reference scv/update.py:108-176): the motion encoder
takes the 405-channel multi-scale sparse-window correlation, and the quarter
variant predicts a 16*9 upsample mask."""

from __future__ import annotations

import jax.numpy as jnp

from ... import nn
from ..raft.update import FlowHead, SepConvGRU


class BasicMotionEncoder(nn.Module):
    def __init__(self, input_dim: int = 128):
        super().__init__()
        self.convc1 = nn.Conv2d(input_dim, 256, 1, padding=0)
        self.convc2 = nn.Conv2d(256, 192, 3, padding=1)
        self.convf1 = nn.Conv2d(2, 128, 7, padding=3)
        self.convf2 = nn.Conv2d(128, 64, 3, padding=1)
        self.conv = nn.Conv2d(192 + 64, 128 - 2, 3, padding=1)

    def __call__(self, params, flow, corr, **kw):
        cor = nn.relu(self.convc1(params["convc1"], corr))
        cor = nn.relu(self.convc2(params["convc2"], cor))
        flo = nn.relu(self.convf1(params["convf1"], flow))
        flo = nn.relu(self.convf2(params["convf2"], flo))
        out = nn.relu(self.conv(params["conv"],
                                jnp.concatenate([cor, flo], axis=-1)))
        return jnp.concatenate([out, flow], axis=-1)


class _UpdateBlock(nn.Module):
    def __init__(self, hidden_dim: int = 128, input_dim: int = 128,
                 mask_chs: int = 64 * 9):
        super().__init__()
        self.encoder = BasicMotionEncoder(input_dim=input_dim)
        self.gru = SepConvGRU(hidden_dim=hidden_dim,
                              input_dim=128 + hidden_dim)
        self.flow_head = FlowHead(hidden_dim, hidden_dim=256)
        self.mask = nn.Sequential(
            nn.Conv2d(128, 256, 3, padding=1), nn.relu,
            nn.Conv2d(256, mask_chs, 1, padding=0))

    def __call__(self, params, net, inp, corr, flow, **kw):
        motion_features = self.encoder(params["encoder"], flow, corr)
        inp = jnp.concatenate([inp, motion_features], axis=-1)
        net = self.gru(params["gru"], net, inp)
        delta_flow = self.flow_head(params["flow_head"], net)
        mask = 0.25 * self.mask(params["mask"], net)
        return net, mask, delta_flow


class BasicUpdateBlock(_UpdateBlock):
    def __init__(self, hidden_dim: int = 128, input_dim: int = 128):
        super().__init__(hidden_dim, input_dim, mask_chs=64 * 9)


class BasicUpdateBlockQuarter(_UpdateBlock):
    def __init__(self, hidden_dim: int = 128, input_dim: int = 128):
        super().__init__(hidden_dim, input_dim, mask_chs=16 * 9)
