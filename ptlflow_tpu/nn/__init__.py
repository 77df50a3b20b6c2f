from .module import (
    Module, Sequential, ModuleList, Identity,
    flatten_params, count_parameters, split_trainable, merge_params,
    tree_copy, cast_params, STATE_LEAVES,
)
from .layers import (
    Conv2d, Conv3d, ConvTranspose2d, ConvTranspose3d, Linear,
    BatchNorm2d, InstanceNorm2d, GroupNorm, LayerNorm, Dropout,
    relu, gelu, sigmoid, tanh, silu, leaky_relu, softmax,
    avg_pool2d, max_pool2d,
)
