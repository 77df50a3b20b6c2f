"""ReCoVEr — SEA-RAFT-style flow with switchable efficient context
backbones (reference: ptlflow/models/recover/recover.py:52-332).

Shares the SEA-RAFT forward (init flow head + iterative refinement with
Laplace-mixture uncertainty); the context network is MobileNetV3-L,
ResNet34-FPN or ConvNeXt-T depending on the variant.
"""

from __future__ import annotations

from typing import Sequence

from ...utils.registry import register_model, trainable
from ..sea_raft.sea_raft import SEARAFT
from .backbones import ConvNeXtExtractor, MobileNetV3Extractor

_URL = "https://github.com/hmorimitsu/ptlflow/releases/download/weights1"


class ReCoVEr(SEARAFT):
    """recover.py:52-300; forward is SEA-RAFT's (dilation is all-ones)."""

    extractor_name = "rn"

    def __init__(self, corr_levels: int = 4, radius: int = 4,
                 dim: int = 128, initial_dim: int = 64, num_blocks: int = 2,
                 block_dims: Sequence[int] = (64, 128, 256),
                 pretrain: str = "resnet34", gamma: float = 0.8,
                 max_flow: float = 400, iters: int = 4,
                 use_var: bool = True, var_min: float = 0,
                 var_max: float = 10, **kwargs):
        super().__init__(corr_levels=corr_levels, corr_radius=radius,
                         dim=dim, initial_dim=initial_dim,
                         num_blocks=num_blocks, block_dims=block_dims,
                         pretrain=pretrain, gamma=gamma, max_flow=max_flow,
                         iters=iters, use_var=use_var, var_min=var_min,
                         var_max=var_max, **kwargs)
        if self.extractor_name == "mn":
            self.cnet = MobileNetV3Extractor(size="l", input_dim=6,
                                             output_dim=256)
        elif self.extractor_name == "cx":
            self.cnet = ConvNeXtExtractor(size="t", input_dim=6,
                                          output_dim=256)
        # "rn" keeps SEA-RAFT's ResNet34-FPN cnet (identical construction)


@register_model
@trainable
class recover_mn(ReCoVEr):
    extractor_name = "mn"
    pretrained_checkpoints = {
        "sintel": f"{_URL}/recover_mn-sintel-f70fe21a.ckpt",
    }


@register_model
@trainable
class recover_rn(ReCoVEr):
    extractor_name = "rn"
    pretrained_checkpoints = {
        "sintel": f"{_URL}/recover_rn-sintel-f04c5eb0.ckpt",
    }


@register_model
@trainable
class recover_cx(ReCoVEr):
    extractor_name = "cx"
    pretrained_checkpoints = {
        "sintel": f"{_URL}/recover_cx-sintel-3d446466.ckpt",
    }


class FlowAnything(SEARAFT):
    """flow_anything.py:48-280 — SEA-RAFT with the resnet34 (M) backbone
    and its own distilled checkpoints; forward identical."""

    pretrained_checkpoints = {
        "mixed288": f"{_URL}/flow_anything-mixed288-821b5025.ckpt",
        "mixed432": f"{_URL}/flow_anything-mixed432-0beef53e.ckpt",
        "mixed_tskh432": f"{_URL}/flow_anything-mixed_tskh432-4786f170.ckpt",
    }

    def __init__(self, pretrain: str = "resnet34", iters: int = 4,
                 **kwargs):
        super().__init__(pretrain=pretrain, iters=iters, **kwargs)


@register_model
class flow_anything(FlowAnything):
    pass
