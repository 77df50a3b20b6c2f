from .datasets import (
    BaseFlowDataset, AutoFlowDataset, FlyingChairsDataset,
    FlyingChairs2Dataset, FlyingThings3DDataset,
    FlyingThings3DSubsetDataset, Hd1kDataset, KittiDataset, KubricDataset,
    MiddleburyDataset, MiddleburySTDataset, MonkaaDataset, SintelDataset,
    SpringDataset, TartanAirDataset, ViperDataset,
)
from .datamodule import (
    FlowDataModule, SimpleLoader, ConcatDataset, RepeatedDataset,
    numpy_collate, make_divisible,
)
from . import transforms
from . import dummy_datasets
