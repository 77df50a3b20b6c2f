from .datasets import (
    BaseFlowDataset, FlyingChairsDataset, FlyingChairs2Dataset,
    FlyingThings3DDataset, Hd1kDataset, KittiDataset, MiddleburyDataset,
    SintelDataset, SpringDataset,
)
from .datamodule import (
    FlowDataModule, SimpleLoader, ConcatDataset, RepeatedDataset,
    numpy_collate, make_divisible,
)
from . import transforms
from . import dummy_datasets
