"""Datamodule: mini-language parsing, factories over dummy data, loaders."""

import numpy as np
import pytest
import yaml

from ptlflow_tpu.data import FlowDataModule, dummy_datasets


def test_parse_dataset_selection():
    parsed = FlowDataModule.parse_dataset_selection(
        "chairs-train+3*sintel-clean-trainval+kitti-2012-train*5")
    assert parsed == [(1, "chairs", "train"),
                      (3, "sintel", "clean", "trainval"),
                      (5, "kitti", "2012", "train")]


@pytest.fixture()
def data_roots(tmp_path):
    roots = {
        "flying_chairs": str(dummy_datasets.write_flying_chairs(tmp_path, n=4)),
        "mpi_sintel": str(dummy_datasets.write_sintel(tmp_path, n_seqs=2,
                                                      n_frames=3)),
        "kitti_2015": str(dummy_datasets.write_kitti(tmp_path, n=3)),
    }
    cfg = tmp_path / "datasets.yaml"
    cfg.write_text(yaml.safe_dump(roots))
    return tmp_path, cfg


def test_datamodule_train_and_val(data_roots):
    tmp_path, cfg = data_roots
    dm = FlowDataModule(
        train_dataset="chairs-train+2*sintel-clean-trainval",
        val_dataset="sintel-clean-trainval+kitti-2015-trainval",
        train_batch_size=2, train_num_workers=0,
        train_crop_size=(64, 64),
        dataset_config_path=str(cfg))
    dm.setup()
    assert len(dm.train_data) == 3 + 2 * 4
    assert dm.val_dataset_names == ["sintel-clean-trainval",
                                    "kitti-2015-trainval"]

    batch = next(iter(dm.train_dataloader()))
    assert batch["images"].shape == (2, 2, 3, 64, 64)
    assert batch["flows"].shape == (2, 1, 2, 64, 64)
    assert np.isfinite(batch["flows"]).all()

    val_loaders = dm.val_dataloader()
    assert len(val_loaders) == 2
    vb = next(iter(val_loaders[0]))
    assert vb["images"].shape[0] == 1


def test_datamodule_yaml_path_overrides(data_roots, tmp_path):
    _, cfg = data_roots
    dm = FlowDataModule(val_dataset="chairs-val",
                        dataset_config_path=str(cfg))
    dm.setup("validate")
    assert len(dm.val_data[0]) == 1  # one val sample in dummy chairs


def test_sintel_finetune_searaft_split(tmp_path):
    roots = {
        "flying_things3d": str(dummy_datasets.write_things(tmp_path)),
        "mpi_sintel": str(dummy_datasets.write_sintel(tmp_path, n_seqs=2,
                                                      n_frames=3)),
        "kitti_2015": str(dummy_datasets.write_kitti(tmp_path, n=3)),
        "hd1k": str(dummy_datasets.write_hd1k(tmp_path)),
    }
    cfg = tmp_path / "datasets.yaml"
    cfg.write_text(yaml.safe_dump(roots))

    def build(selector):
        dm = FlowDataModule(train_dataset=selector, train_batch_size=1,
                            train_num_workers=0, train_crop_size=(64, 64),
                            dataset_config_path=str(cfg))
        dm.setup("fit")
        return dm

    dm_sea = build("sintel_finetune-searaft_split")
    dm_std = build("sintel_finetune")
    n_sintel = 2 * 2  # 2 seqs x (3 frames - 1), per pass
    n_things, n_kitti, n_hd1k = 4, 3, 2  # dummy things writes 2 seqlets
    assert len(dm_sea.train_data) == (n_things + 2 * 20 * n_sintel
                                      + 80 * n_kitti + 30 * n_hd1k)
    assert len(dm_std.train_data) == (n_things + 2 * 100 * n_sintel
                                      + 200 * n_kitti + 5 * n_hd1k)
    with pytest.raises(ValueError):
        build("sintel_finetune-bogus")
    batch = next(iter(dm_sea.train_dataloader()))
    assert batch["images"].shape == (1, 2, 3, 64, 64)
    assert np.isfinite(batch["flows"]).all()


def test_sparse_kitti_train_pipeline(data_roots):
    tmp_path, cfg = data_roots
    dm = FlowDataModule(train_dataset="kitti-2015-trainval",
                        train_batch_size=1, train_num_workers=0,
                        train_crop_size=(64, 64),
                        dataset_config_path=str(cfg))
    dm.setup("fit")
    batch = next(iter(dm.train_dataloader()))
    assert batch["valids"].min() == 0.0  # sparse GT keeps holes
    assert np.isfinite(batch["flows"]).all()
