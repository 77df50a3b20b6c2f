from .liteflownet import LiteFlowNet, liteflownet  # noqa: F401
