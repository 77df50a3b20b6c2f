"""RAFT feature/context encoders (TPU NHWC).

Structural parity with the reference encoders
(/root/reference/ptlflow/models/raft/extractor.py:6-267) so that converted
torch checkpoints map 1:1 onto the attribute tree (conv1/norm1/layer1..3/
conv2, residual blocks with conv1/conv2/norm1/norm2[/norm3+downsample]).
The computation is plain XLA convs — they lower straight onto the MXU.
"""

from __future__ import annotations

from ... import nn


def make_norm(norm_fn: str, planes: int):
    if norm_fn == "group":
        return nn.GroupNorm(num_groups=planes // 8, num_channels=planes)
    if norm_fn == "batch":
        return nn.BatchNorm2d(planes)
    if norm_fn == "instance":
        return nn.InstanceNorm2d(planes)
    if norm_fn == "none":
        return nn.Sequential()
    raise ValueError(norm_fn)


class ResidualBlock(nn.Module):
    def __init__(self, in_planes: int, planes: int, norm_fn: str = "group",
                 stride: int = 1):
        super().__init__()
        self.conv1 = nn.Conv2d(in_planes, planes, 3, padding=1, stride=stride)
        self.conv2 = nn.Conv2d(planes, planes, 3, padding=1)
        self.norm1 = make_norm(norm_fn, planes)
        self.norm2 = make_norm(norm_fn, planes)
        if stride == 1:
            self.downsample = None
        else:
            self.norm3 = make_norm(norm_fn, planes)
            self.downsample = nn.Sequential(
                nn.Conv2d(in_planes, planes, 1, stride=stride),
                make_norm(norm_fn, planes))

    def __call__(self, params, x, **kw):
        y = nn.relu(self.norm1(params.get("norm1", {}),
                               self.conv1(params["conv1"], x), **kw))
        y = nn.relu(self.norm2(params.get("norm2", {}),
                               self.conv2(params["conv2"], y), **kw))
        if self.downsample is not None:
            x = self.downsample(params["downsample"], x, **kw)
        return nn.relu(x + y)


class BottleneckBlock(nn.Module):
    def __init__(self, in_planes: int, planes: int, norm_fn: str = "group",
                 stride: int = 1):
        super().__init__()
        self.conv1 = nn.Conv2d(in_planes, planes // 4, 1, padding=0)
        self.conv2 = nn.Conv2d(planes // 4, planes // 4, 3, padding=1,
                               stride=stride)
        self.conv3 = nn.Conv2d(planes // 4, planes, 1, padding=0)
        self.norm1 = make_norm(norm_fn, planes // 4)
        self.norm2 = make_norm(norm_fn, planes // 4)
        self.norm3 = make_norm(norm_fn, planes)
        if stride == 1:
            self.downsample = None
        else:
            self.norm4 = make_norm(norm_fn, planes)
            self.downsample = nn.Sequential(
                nn.Conv2d(in_planes, planes, 1, stride=stride),
                make_norm(norm_fn, planes))

    def __call__(self, params, x, **kw):
        y = nn.relu(self.norm1(params.get("norm1", {}),
                               self.conv1(params["conv1"], x), **kw))
        y = nn.relu(self.norm2(params.get("norm2", {}),
                               self.conv2(params["conv2"], y), **kw))
        y = nn.relu(self.norm3(params.get("norm3", {}),
                               self.conv3(params["conv3"], y), **kw))
        if self.downsample is not None:
            x = self.downsample(params["downsample"], x, **kw)
        return nn.relu(x + y)


class BasicEncoder(nn.Module):
    def __init__(self, output_dim: int = 128, norm_fn: str = "batch",
                 dropout: float = 0.0):
        super().__init__()
        self.norm_fn = norm_fn
        self.norm1 = make_norm(norm_fn, 64)
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3)
        self.layer1 = nn.Sequential(ResidualBlock(64, 64, norm_fn, 1),
                                    ResidualBlock(64, 64, norm_fn, 1))
        self.layer2 = nn.Sequential(ResidualBlock(64, 96, norm_fn, 2),
                                    ResidualBlock(96, 96, norm_fn, 1))
        self.layer3 = nn.Sequential(ResidualBlock(96, 128, norm_fn, 2),
                                    ResidualBlock(128, 128, norm_fn, 1))
        self.conv2 = nn.Conv2d(128, output_dim, 1)
        self.dropout_p = dropout

    def __call__(self, params, x, **kw):
        x = nn.relu(self.norm1(params.get("norm1", {}),
                    self.conv1(params["conv1"], x), **kw))
        x = self.layer1(params["layer1"], x, **kw)
        x = self.layer2(params["layer2"], x, **kw)
        x = self.layer3(params["layer3"], x, **kw)
        return self.conv2(params["conv2"], x)


class SmallEncoder(nn.Module):
    def __init__(self, output_dim: int = 128, norm_fn: str = "batch",
                 dropout: float = 0.0):
        super().__init__()
        self.norm_fn = norm_fn
        self.norm1 = make_norm(norm_fn, 32)
        self.conv1 = nn.Conv2d(3, 32, 7, stride=2, padding=3)
        self.layer1 = nn.Sequential(BottleneckBlock(32, 32, norm_fn, 1),
                                    BottleneckBlock(32, 32, norm_fn, 1))
        self.layer2 = nn.Sequential(BottleneckBlock(32, 64, norm_fn, 2),
                                    BottleneckBlock(64, 64, norm_fn, 1))
        self.layer3 = nn.Sequential(BottleneckBlock(64, 96, norm_fn, 2),
                                    BottleneckBlock(96, 96, norm_fn, 1))
        self.conv2 = nn.Conv2d(96, output_dim, 1)
        self.dropout_p = dropout

    def __call__(self, params, x, **kw):
        x = nn.relu(self.norm1(params.get("norm1", {}),
                    self.conv1(params["conv1"], x), **kw))
        x = self.layer1(params["layer1"], x, **kw)
        x = self.layer2(params["layer2"], x, **kw)
        x = self.layer3(params["layer3"], x, **kw)
        return self.conv2(params["conv2"], x)
