"""Remaining dataset classes vs synthetic on-disk replicas."""

import numpy as np

from ptlflow_tpu.data import datasets, dummy_datasets


def _check(s, n_imgs=2):
    assert s["images"].shape[0] == n_imgs
    assert s["flows"].shape[0] == n_imgs - 1
    assert np.isfinite(s["flows"]).all()


def test_autoflow(tmp_path):
    root = dummy_datasets.write_autoflow(tmp_path, n=3)
    ds = datasets.AutoFlowDataset(str(root), split="trainval")
    assert len(ds) == 3
    _check(ds[0])


def test_things_subset(tmp_path):
    root = dummy_datasets.write_things_subset(tmp_path, n_frames=4)
    ds = datasets.FlyingThings3DSubsetDataset(str(root), split="train",
                                              add_reverse=False)
    assert len(ds) > 0
    s = ds[0]
    _check(s)
    assert "occs" in s
    assert "flows_b" in s

    ds_rev = datasets.FlyingThings3DSubsetDataset(str(root), split="train",
                                                  add_reverse=True)
    assert len(ds_rev) == 2 * len(ds)


def test_tartanair(tmp_path):
    root = dummy_datasets.write_tartanair(tmp_path, n_frames=3)
    ds = datasets.TartanAirDataset(str(root))
    assert len(ds) == 2
    _check(ds[0])


def test_kubric(tmp_path):
    root = dummy_datasets.write_kubric(tmp_path, n_seqs=1, n_frames=3)
    ds = datasets.KubricDataset(str(root), get_backward=True)
    assert len(ds) == 2
    s = ds[0]
    _check(s)
    assert "flows_b" in s
    assert np.abs(s["flows"]).max() <= 20.0  # data_ranges scaling


def test_monkaa(tmp_path):
    root = dummy_datasets.write_monkaa(tmp_path, n_frames=3)
    ds = datasets.MonkaaDataset(str(root))
    assert len(ds) == 2
    _check(ds[0])


def test_middlebury_st(tmp_path):
    root = dummy_datasets.write_middlebury_st(tmp_path, n_seqs=2)
    ds = datasets.MiddleburySTDataset(str(root))
    assert len(ds) == 2
    s = ds[0]
    _check(s)
    # two-file disparity flow: y-component should be ~0, x negated disp <= 0
    assert np.abs(s["flows"][0, 1]).max() < 1e-5
    assert s["flows"][0, 0].max() <= 0.0


def test_viper(tmp_path):
    root = dummy_datasets.write_viper(tmp_path, n_frames=3)
    ds = datasets.ViperDataset(str(root), split="train")
    assert len(ds) == 2
    _check(ds[0])


def test_datamodule_factories_for_new_datasets(tmp_path):
    import yaml
    from ptlflow_tpu.data import FlowDataModule

    roots = {
        "autoflow": str(dummy_datasets.write_autoflow(tmp_path)),
        "flying_things3d_subset":
            str(dummy_datasets.write_things_subset(tmp_path)),
        "tartanair": str(dummy_datasets.write_tartanair(tmp_path)),
        "kubric": str(dummy_datasets.write_kubric(tmp_path)),
        "monkaa": str(dummy_datasets.write_monkaa(tmp_path)),
        "middlebury_st": str(dummy_datasets.write_middlebury_st(tmp_path)),
        "viper": str(dummy_datasets.write_viper(tmp_path)),
    }
    cfg = tmp_path / "datasets.yaml"
    cfg.write_text(yaml.safe_dump(roots))
    dm = FlowDataModule(
        val_dataset="autoflow-val+tartanair+kubric+monkaa+middlebury_st+viper-train+things_subset-val",
        dataset_config_path=str(cfg))
    dm.setup("validate")
    assert len(dm.val_data) == 7
    for ds in dm.val_data:
        if len(ds) > 0:
            _check(ds[0])
