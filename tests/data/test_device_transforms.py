"""Device-side augmentation (train_transform_cuda analog).

The jitted DeviceCompose must mirror the numpy pipeline's semantics:
crop-size outputs, flow scaling/negation consistent with the spatial ops,
jitter/noise/eraser bounded, and the full datamodule path must produce
trainable batches (reference flow_datamodule.py:318 train_transform_cuda).
"""

import random

import numpy as np
import pytest

from ptlflow_tpu.data import transforms as ft
from ptlflow_tpu.data.device_transforms import DeviceCompose


def _sample(h=96, w=128, n=2, flow_mag=5.0, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "images": rng.rand(n, 3, h, w).astype(np.float32),
        "flows": (flow_mag * rng.randn(n - 1, 2, h, w)).astype(np.float32),
        "valids": np.ones((n - 1, 1, h, w), np.float32),
        "occs": np.zeros((n - 1, 1, h, w), np.float32),
    }


def _chairs_compose(crop=(64, 96)):
    return ft.Compose([
        ft.RandomScaleAndCrop(crop, (-0.1, 1.0), (-0.2, 0.2)),
        ft.ColorJitter(0.4, 0.4, 0.4, 0.5 / 3.14, 0.2),
        ft.GaussianNoise(0.02),
        ft.RandomPatchEraser(0.5, ((10, 30), (10, 30)), 3, "mean"),
        ft.RandomFlip(0.5, 0.1),
    ])


def test_from_compose_supported():
    dev = DeviceCompose.from_compose(_chairs_compose())
    assert dev is not None
    assert [s[0] for s in dev.steps] == [
        "scale_crop", "jitter", "noise", "eraser", "flip"]


def test_from_compose_sparse_falls_back():
    comp = ft.Compose([
        ft.RandomScaleAndCrop((64, 96), (-0.2, 0.4), (-0.2, 0.2),
                              sparse=True)])
    assert DeviceCompose.from_compose(comp) is None


def test_device_pipeline_output_contract():
    random.seed(0)
    dev = DeviceCompose.from_compose(_chairs_compose())
    for trial in range(4):
        out = dev(_sample(seed=trial))
        assert out["images"].shape == (2, 3, 64, 96)
        assert out["flows"].shape == (1, 2, 64, 96)
        assert out["valids"].shape == (1, 1, 64, 96)
        assert np.isfinite(out["images"]).all()
        assert np.isfinite(out["flows"]).all()
        assert out["images"].min() >= 0.0 and out["images"].max() <= 1.0
        # valids stay binary through the nearest resize
        assert set(np.unique(out["valids"])) <= {0.0, 1.0}


def test_device_scale_crop_scales_flow():
    """With a fixed upscale factor, flow values must scale by the same
    factor (numpy pipeline resize_dict semantics)."""
    random.seed(0)
    comp = ft.Compose([ft.RandomScaleAndCrop((64, 96), (0.5, 0.5),
                                             (0.0, 0.0))])
    dev = DeviceCompose.from_compose(comp)
    s = _sample()
    s["flows"] = np.full((1, 2, 96, 128), 4.0, np.float32)
    out = dev(s)
    # major scale 2**0.5 on both axes -> flow magnitude * 2**0.5
    assert np.allclose(out["flows"], 4.0 * 2 ** 0.5, atol=1e-3)


def test_device_flip_negates_flow():
    random.seed(0)
    comp = ft.Compose([ft.RandomScaleAndCrop((96, 128), (0.0, 0.0),
                                             (0.0, 0.0)),
                       ft.RandomFlip(1.0, 0.0)])
    dev = DeviceCompose.from_compose(comp)
    s = _sample()
    out = dev(s)
    want = s["flows"][..., ::-1].copy()
    want[:, 0] = -want[:, 0]
    # identity-scale pass carries a ~1e-3 subpixel epsilon (the min-scale
    # clamp), so edge pixels interpolate slightly; flow magnitude ~5
    assert np.allclose(out["flows"], want, atol=0.1)


def test_datamodule_train_transform_cuda(tmp_path):
    """End-to-end: FlowDataModule(train_transform_cuda=True) swaps the numpy
    Compose for the jitted DeviceCompose and still yields correct batches."""
    import yaml

    from ptlflow_tpu.data import dummy_datasets
    from ptlflow_tpu.data.datamodule import FlowDataModule
    from ptlflow_tpu.data.device_transforms import DeviceCompose as DC

    root = dummy_datasets.write_flying_chairs(tmp_path, n=3, size=(128, 128))
    cfg = tmp_path / "datasets.yaml"
    cfg.write_text(yaml.safe_dump({"flying_chairs": str(root)}))
    dm = FlowDataModule(train_dataset="chairs-trainval",
                        val_dataset=None,
                        train_batch_size=2, train_num_workers=0,
                        train_crop_size=(64, 64),
                        train_transform_cuda=True,
                        dataset_config_path=str(cfg))
    dm.setup("fit")
    assert isinstance(dm.train_data.transform, DC)
    batch = next(iter(dm.train_dataloader()))
    assert batch["images"].shape == (2, 2, 3, 64, 64)
    assert np.isfinite(batch["images"]).all()
    assert np.isfinite(batch["flows"]).all()


def test_datamodule_sparse_keeps_numpy(tmp_path):
    """KITTI's sparse scatter resize has no device equivalent; the numpy
    pipeline must be kept."""
    import yaml

    from ptlflow_tpu.data import dummy_datasets
    from ptlflow_tpu.data.datamodule import FlowDataModule

    root = dummy_datasets.write_kitti(tmp_path, n=2, size=(128, 128))
    cfg = tmp_path / "datasets.yaml"
    cfg.write_text(yaml.safe_dump({"kitti_2015": str(root)}))
    dm = FlowDataModule(train_dataset="kitti-2015-trainval",
                        val_dataset=None,
                        train_batch_size=1, train_num_workers=0,
                        train_crop_size=(64, 64),
                        train_transform_cuda=True,
                        dataset_config_path=str(cfg))
    dm.setup("fit")
    assert isinstance(dm.train_data.transform, ft.Compose)


def test_datamodule_train_transform_fp16(tmp_path):
    """train_transform_fp16 casts transform-output images to bfloat16 (the
    reference's fp16 transform flag, TPU analog)."""
    import yaml

    from ptlflow_tpu.data import dummy_datasets
    from ptlflow_tpu.data.datamodule import FlowDataModule

    root = dummy_datasets.write_flying_chairs(tmp_path, n=3, size=(128, 128))
    cfg = tmp_path / "datasets.yaml"
    cfg.write_text(yaml.safe_dump({"flying_chairs": str(root)}))
    dm = FlowDataModule(train_dataset="chairs-trainval",
                        val_dataset=None,
                        train_batch_size=1, train_num_workers=0,
                        train_crop_size=(64, 64),
                        train_transform_cuda=True,
                        train_transform_fp16=True,
                        dataset_config_path=str(cfg))
    dm.setup("fit")
    batch = next(iter(dm.train_dataloader()))
    assert batch["images"].dtype.name == "bfloat16"
    assert batch["flows"].dtype == np.float32  # flow precision kept
