from .gmflownet import GMFlowNet, GMFlowNetMix, gmflownet, gmflownet_mix  # noqa: F401
