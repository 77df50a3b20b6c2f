"""SCV feature encoders.

Parity with /root/reference/ptlflow/models/scv/extractor.py: the residual
block ALWAYS carries a norm3 + 1x1 downsample projection (even at stride 1,
extractor.py:6-60 — unlike RAFT's conditional one), and the quarter encoder
stops at stride 4 (BasicEncoderQuarter :197-269).
"""

from __future__ import annotations

from ... import nn
from ..raft.extractor import make_norm


class ResidualBlock(nn.Module):
    def __init__(self, in_planes, planes, norm_fn="group", stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(in_planes, planes, 3, padding=1,
                               stride=stride)
        self.conv2 = nn.Conv2d(planes, planes, 3, padding=1)
        self.norm1 = make_norm(norm_fn, planes)
        self.norm2 = make_norm(norm_fn, planes)
        # norm3 is shared into the downsample Sequential in torch; store it
        # once (under downsample.1) so parameters are not double-counted.
        self.downsample = nn.Sequential(
            nn.Conv2d(in_planes, planes, 1, stride=stride),
            make_norm(norm_fn, planes))

    def from_torch(self, flat, strict=True, _path=""):
        # "norm3.*" duplicates "downsample.1.*" (same torch module)
        flat = {k: v for k, v in flat.items() if not k.startswith("norm3.")}
        return super().from_torch(flat, strict=strict, _path=_path)

    def __call__(self, params, x, training: bool = False, **kw):
        y = nn.relu(self.norm1(params.get("norm1", {}),
                               self.conv1(params["conv1"], x),
                               training=training))
        y = nn.relu(self.norm2(params.get("norm2", {}),
                               self.conv2(params["conv2"], y),
                               training=training))
        x = self.downsample(params["downsample"], x, training=training)
        return nn.relu(x + y)


class _Encoder(nn.Module):
    def __init__(self, output_dim=128, norm_fn="batch", dropout=0.0,
                 quarter=False):
        super().__init__()
        self.norm_fn = norm_fn
        self.norm1 = make_norm(norm_fn, 64)
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3)
        self.layer1 = nn.Sequential(
            ResidualBlock(64, 64, norm_fn, stride=1),
            ResidualBlock(64, 64, norm_fn, stride=1))
        self.layer2 = nn.Sequential(
            ResidualBlock(64, 96, norm_fn, stride=2),
            ResidualBlock(96, 96, norm_fn, stride=1))
        stride3 = 1 if quarter else 2
        self.layer3 = nn.Sequential(
            ResidualBlock(96, 128, norm_fn, stride=stride3),
            ResidualBlock(128, 128, norm_fn, stride=1))
        self.conv2 = nn.Conv2d(128, output_dim, 1, padding=0)

    def __call__(self, params, x, training: bool = False, **kw):
        x = nn.relu(self.norm1(params.get("norm1", {}),
                               self.conv1(params["conv1"], x),
                               training=training))
        x = self.layer1(params["layer1"], x, training=training)
        x = self.layer2(params["layer2"], x, training=training)
        x = self.layer3(params["layer3"], x, training=training)
        return self.conv2(params["conv2"], x)


class BasicEncoder(_Encoder):
    def __init__(self, output_dim=128, norm_fn="batch", dropout=0.0):
        super().__init__(output_dim, norm_fn, dropout, quarter=False)


class BasicEncoderQuarter(_Encoder):
    def __init__(self, output_dim=128, norm_fn="batch", dropout=0.0):
        super().__init__(output_dim, norm_fn, dropout, quarter=True)
