"""Dataset classes against synthetic on-disk replicas (reference test
strategy: tests/ptlflow/data/test_datasets.py + dummy_datasets.py)."""

import numpy as np
import pytest

from ptlflow_tpu.data import datasets, dummy_datasets


def _check_sample(s, n_imgs=2, with_flow=True):
    assert s["images"].shape[0] == n_imgs
    assert s["images"].shape[1] == 3
    assert s["images"].dtype == np.float32
    assert 0.0 <= s["images"].min() and s["images"].max() <= 1.0
    if with_flow:
        assert s["flows"].shape[0] == n_imgs - 1
        assert s["flows"].shape[1] == 2
        assert s["valids"].shape[1] == 1
        assert np.isfinite(s["flows"]).all()
    assert "meta" in s


def test_flying_chairs(tmp_path):
    root = dummy_datasets.write_flying_chairs(tmp_path, n=4)
    ds = datasets.FlyingChairsDataset(str(root), split="train")
    assert len(ds) == 3
    _check_sample(ds[0])
    ds_val = datasets.FlyingChairsDataset(str(root), split="val")
    assert len(ds_val) == 1


def test_flying_chairs2(tmp_path):
    root = dummy_datasets.write_flying_chairs2(tmp_path, n=2)
    ds = datasets.FlyingChairs2Dataset(str(root), split="train")
    assert len(ds) == 2
    s = ds[0]
    _check_sample(s)
    assert "occs" in s and "mbs" in s and "flows_b" in s


def test_sintel(tmp_path):
    root = dummy_datasets.write_sintel(tmp_path, n_seqs=2, n_frames=4)
    ds = datasets.SintelDataset(str(root), split="trainval",
                                pass_names="clean")
    assert len(ds) == 2 * 3  # 2 seqs x (4 frames - 1) pairs
    s = ds[0]
    _check_sample(s)
    assert "occs" in s
    assert s["meta"]["is_seq_start"]
    assert not ds[1]["meta"]["is_seq_start"]

    # sequence mode
    ds3 = datasets.SintelDataset(str(root), split="trainval",
                                 pass_names="clean", sequence_length=3)
    s3 = ds3[0]
    assert s3["images"].shape[0] == 3
    assert s3["flows"].shape[0] == 2

    ds_test = datasets.SintelDataset(str(root), split="test",
                                     pass_names="clean")
    _check_sample(ds_test[0], with_flow=False)
    assert "flows" not in ds_test[0]


def test_kitti(tmp_path):
    root = dummy_datasets.write_kitti(tmp_path, year="2015", n=3)
    ds = datasets.KittiDataset(root_dir_2015=str(root), split="trainval",
                               versions="2015")
    assert len(ds) == 3
    s = ds[0]
    _check_sample(s)
    # sparse GT: some pixels invalid
    assert s["valids"].min() == 0.0 and s["valids"].max() == 1.0


def test_things(tmp_path):
    root = dummy_datasets.write_things(tmp_path)
    ds = datasets.FlyingThings3DDataset(str(root), split="train",
                                        pass_names="clean",
                                        side_names=("left", "right"))
    assert len(ds) > 0
    s = ds[0]
    _check_sample(s)
    assert "occs" in s and "mbs" in s


def test_hd1k(tmp_path):
    root = dummy_datasets.write_hd1k(tmp_path, n_seqs=2, n_frames=3)
    ds = datasets.Hd1kDataset(str(root), split="train")
    assert len(ds) == 4
    _check_sample(ds[0])


def test_spring(tmp_path):
    root = dummy_datasets.write_spring(tmp_path, n_seqs=1, n_frames=3)
    ds = datasets.SpringDataset(str(root), split="train")
    assert len(ds) == 2
    s = ds[0]
    _check_sample(s)
    # flow subsampled back to image resolution
    assert s["flows"].shape[-2:] == s["images"].shape[-2:]


def test_middlebury(tmp_path):
    root = dummy_datasets.write_middlebury(tmp_path, n_seqs=2)
    ds = datasets.MiddleburyDataset(str(root))
    assert len(ds) == 2
    _check_sample(ds[0])


def test_max_flow_clipping(tmp_path):
    from ptlflow_tpu.utils import flow_io
    root = dummy_datasets.write_flying_chairs(tmp_path, n=1)
    # overwrite with a huge flow
    flow = np.full((96, 128, 2), 500.0, np.float32)
    flow[0, 0] = 1.0
    flow_io.write_flo(root / "data" / "00001_flow.flo", flow)
    ds = datasets.FlyingChairsDataset(str(root), split=None, max_flow=100.0)
    s = ds[0]
    assert s["flows"].max() <= 100.0
    assert s["valids"][0, 0, 0, 0] == 1.0
    assert s["valids"][0, 0, 5, 5] == 0.0
