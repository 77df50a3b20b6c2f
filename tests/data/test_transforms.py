"""Transform behavior tests (resize/flow scaling, flips, jitter ranges,
sparse resize, OOB occlusion updates)."""

import random

import numpy as np

from ptlflow_tpu.data import transforms as T


def _inputs(n=2, h=32, w=40, seed=0, sparse=False):
    rng = np.random.RandomState(seed)
    d = {
        "images": rng.rand(n, 3, h, w).astype(np.float32),
        "flows": (rng.randn(n - 1, 2, h, w) * 5).astype(np.float32),
        "valids": np.ones((n - 1, 1, h, w), np.float32),
        "occs": np.zeros((n - 1, 1, h, w), np.float32),
    }
    if sparse:
        d["valids"] = (rng.rand(n - 1, 1, h, w) > 0.5).astype(np.float32)
    return d


def test_resize_scales_flow_magnitude():
    d = _inputs()
    d["flows"][:] = 3.0  # constant field: resize then scale exactly doubles
    out = T.Resize((64, 80))(dict(d))
    assert out["images"].shape == (2, 3, 64, 80)
    assert out["flows"].shape == (1, 2, 64, 80)
    np.testing.assert_allclose(out["flows"], 6.0, rtol=1e-5)
    # binary keys resized with nearest: still binary
    assert set(np.unique(out["valids"])) <= {0.0, 1.0}


def test_random_scale_and_crop_shapes():
    random.seed(0)
    d = _inputs(h=64, w=64)
    t = T.RandomScaleAndCrop(crop_size=(32, 48), major_scale=(-0.2, 0.5),
                             space_scale=(-0.1, 0.1))
    out = t(dict(d))
    assert out["images"].shape == (2, 3, 32, 48)
    assert out["flows"].shape == (1, 2, 32, 48)
    assert out["valids"].shape == (1, 1, 32, 48)


def test_random_scale_and_crop_sparse():
    random.seed(1)
    d = _inputs(h=64, w=64, sparse=True)
    t = T.RandomScaleAndCrop(crop_size=(48, 48), major_scale=(0.0, 0.3),
                             space_scale=(0.0, 0.0), sparse=True)
    out = t(dict(d))
    assert out["flows"].shape == (1, 2, 48, 48)
    # sparse resize keeps valids binary and doesn't interpolate
    assert set(np.unique(out["valids"])) <= {0.0, 1.0}


def test_horizontal_flip_negates_u():
    random.seed(0)
    d = _inputs()
    t = T.RandomFlip(prob_horizontal=1.0, prob_vertical=0.0)
    out = t({k: v.copy() for k, v in d.items()})
    np.testing.assert_allclose(out["images"], d["images"][..., ::-1])
    np.testing.assert_allclose(out["flows"][:, 0], -d["flows"][:, 0, :, ::-1])
    np.testing.assert_allclose(out["flows"][:, 1], d["flows"][:, 1, :, ::-1])


def test_vertical_flip_negates_v():
    random.seed(0)
    d = _inputs()
    t = T.RandomFlip(prob_horizontal=0.0, prob_vertical=1.0)
    out = t({k: v.copy() for k, v in d.items()})
    np.testing.assert_allclose(out["flows"][:, 1], -d["flows"][:, 1, ::-1])


def test_color_jitter_stays_in_range():
    random.seed(0)
    d = _inputs()
    t = T.ColorJitter(brightness=0.4, contrast=0.4, saturation=0.4, hue=0.1,
                      asymmetric_prob=0.5)
    for _ in range(5):
        out = t({k: v.copy() for k, v in d.items()})
        assert out["images"].min() >= 0.0 and out["images"].max() <= 1.0
        assert out["images"].shape == d["images"].shape
    # flows untouched
    np.testing.assert_array_equal(out["flows"], d["flows"])


def test_gaussian_noise_clamped():
    random.seed(0)
    d = _inputs()
    out = T.GaussianNoise(stdev=0.5)({k: v.copy() for k, v in d.items()})
    assert out["images"].min() >= 0.0 and out["images"].max() <= 1.0


def test_patch_eraser_changes_only_second_image():
    random.seed(3)
    d = _inputs(h=128, w=128)
    t = T.RandomPatchEraser(prob=1.0, num_patches=2)
    orig = d["images"].copy()
    out = t(d)
    np.testing.assert_array_equal(out["images"][0], orig[0])
    assert not np.array_equal(out["images"][1], orig[1])


def test_center_crop():
    d = _inputs(h=40, w=50)
    out = T.CenterCrop((20, 30))(dict(d))
    assert out["images"].shape == (2, 3, 20, 30)


def test_oob_flow_marks_occlusion():
    d = _inputs(h=32, w=40)
    d["flows"][:] = 0.0
    d["flows"][0, 0, :, -5:] = 100.0  # points far out of bounds
    t = T.RandomScaleAndCrop(crop_size=None)
    out = t(dict(d))
    assert out["occs"][0, 0, 5, -1] == 1.0
    assert out["occs"][0, 0, 5, 5] == 0.0


def test_fb_check_generates_occlusions():
    d = _inputs()
    d["flows_b"] = -d["flows"].copy()
    # consistent flows: mostly unoccluded interior
    out = T.GenerateFBCheckFlowOcclusion(threshold=5.0)(dict(d))
    assert "occs" in out and "occs_b" in out
    assert out["occs"].shape == (1, 1, 32, 40)


def test_compose():
    d = _inputs()
    t = T.Compose([T.Resize((16, 20)), T.CenterCrop((8, 10))])
    out = t(dict(d))
    assert out["images"].shape == (2, 3, 8, 10)


def test_np_grid_sample_matches_torch():
    import torch

    rng = np.random.RandomState(3)
    x = rng.randn(2, 3, 9, 11).astype(np.float32)
    grid = (rng.rand(2, 9, 11, 2) * 2.4 - 1.2).astype(np.float32)
    for mode, ac in (("bilinear", True), ("nearest", False)):
        want = torch.nn.functional.grid_sample(
            torch.from_numpy(x), torch.from_numpy(grid), mode=mode,
            align_corners=True if mode == "bilinear" else None).numpy()
        got = T._np_grid_sample(x, grid, mode=mode)
        np.testing.assert_allclose(got, want, atol=1e-5, err_msg=mode)


def test_random_translate():
    random.seed(3)
    d = _inputs(h=40, w=48)
    t = T.RandomTranslate(translation=(6, 8))
    out = t({k: v.copy() for k, v in d.items()})
    # all arrays cropped consistently
    shapes = {v.shape[-2:] for v in out.values()}
    assert len(shapes) == 1
    oh, ow = next(iter(shapes))
    assert 40 - 6 <= oh <= 40 and 48 - 8 <= ow <= 48
    # flow compensated by the translation: constant-flow field stays
    # constant after adding the per-frame offset
    d2 = _inputs(h=40, w=48)
    d2["flows"][:] = 0.0
    out2 = T.RandomTranslate(translation=(4, 4))(
        {k: v.copy() for k, v in d2.items()})
    u = np.unique(out2["flows"][0, 0])
    v = np.unique(out2["flows"][0, 1])
    assert u.size == 1 and v.size == 1  # a single global offset


def test_random_rotate():
    random.seed(5)
    d = _inputs(h=32, w=32)
    t = T.RandomRotate(angle=10.0, diff_angle=2.0)
    out = t({k: v.copy() for k, v in d.items()})
    assert out["images"].shape == (2, 3, 32, 32)
    assert out["flows"].shape == (1, 2, 32, 32)
    assert np.isfinite(out["flows"]).all()
    # binary masks stay binary under nearest sampling
    assert set(np.unique(out["valids"])) <= {0.0, 1.0}
