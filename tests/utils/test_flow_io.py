"""Round-trip tests for all flow codecs + visualization invariants."""

import json

import numpy as np
import pytest

from ptlflow_tpu.utils import flow_io
from ptlflow_tpu.utils.flow_viz import flow_to_rgb, make_colorwheel


def _flow(h=13, w=17, seed=0, with_nan=True):
    rng = np.random.RandomState(seed)
    f = (rng.randn(h, w, 2) * 10).astype(np.float32)
    if with_nan:
        f[2:4, 3:6] = np.nan
    return f


def test_flo_roundtrip(tmp_path):
    f = _flow()
    p = tmp_path / "a.flo"
    flow_io.write_flo(p, f)
    g = flow_io.read_flo(p)
    np.testing.assert_allclose(g, f, atol=1e-6)


def test_flo_invalid_sentinel(tmp_path):
    f = _flow(with_nan=False)
    f[0, 0] = 2e9  # larger than 1e9 -> read back as NaN
    p = tmp_path / "a.flo"
    flow_io.write_flo(p, f)
    g = flow_io.read_flo(p)
    assert np.isnan(g[0, 0]).all()


@pytest.mark.parametrize("mult", [64.0, 128.0])
def test_kitti_png_roundtrip(tmp_path, mult):
    f = _flow()
    # png quantizes to 1/mult
    f = np.round(f * mult) / mult
    p = tmp_path / "a.png"
    flow_io.write_flow_png(p, f, mult=mult)
    g = flow_io.read_flow_png(p, mult=mult)
    np.testing.assert_allclose(g, f, atol=1.0 / mult)
    assert np.isnan(g[2, 3]).all()


def test_pfm_roundtrip(tmp_path):
    f = _flow(with_nan=False)
    p = tmp_path / "a.pfm"
    flow_io.write_pfm(p, f)
    g = flow_io.read_pfm(p)
    np.testing.assert_allclose(g, f, atol=1e-6)


def test_flo5_roundtrip(tmp_path):
    f = _flow()
    p = tmp_path / "a.flo5"
    flow_io.write_flo5(p, f)
    g = flow_io.read_flo5(p)
    np.testing.assert_allclose(g, f, atol=1e-6)


def test_viper_roundtrip(tmp_path):
    f = _flow(with_nan=False).astype(np.float16).astype(np.float32)
    p = tmp_path / "a.npz"
    flow_io.write_viper_flow(p, f)
    g = flow_io.read_viper_flow(p)
    np.testing.assert_allclose(g, f, atol=1e-2)


def test_kubric_png(tmp_path):
    import cv2 as cv
    rng = np.random.RandomState(1)
    raw = rng.randint(0, 65535, (8, 9, 3), dtype=np.uint16)
    cv.imwrite(str(tmp_path / "f.png"), raw)
    with open(tmp_path / "data_ranges.json", "w") as f:
        json.dump({"forward_flow": {"min": -2.0, "max": 3.0}}, f)
    g = flow_io.read_kubric_flow(tmp_path / "f.png", "forward_flow")
    assert g.shape == (8, 9, 2)
    assert g.min() >= -2.0 and g.max() <= 3.0


def test_dispatch_roundtrip(tmp_path):
    f = _flow()
    for name in ["a.flo", "a.png", "a.flo5", "a.npy"]:
        p = str(tmp_path / name)
        flow_io.flow_write(p, f)
        g = flow_io.flow_read(p)
        valid = ~np.isnan(f)
        np.testing.assert_allclose(g[valid], f[valid], atol=1.0 / 32)


def test_colorwheel_structure():
    wheel = make_colorwheel()
    assert wheel.shape == (55, 3)
    np.testing.assert_array_equal(wheel[0], [255, 0, 0])
    # transition boundaries hit the primary hues
    np.testing.assert_array_equal(wheel[15], [255, 255, 0])
    np.testing.assert_array_equal(wheel[21], [0, 255, 0])


def test_flow_to_rgb_semantics():
    # pure +x flow maps to the first hue region (red-ish); NaN -> invalid color
    f = np.zeros((4, 6, 2), np.float32)
    f[..., 0] = 10.0
    f[0, 0] = np.nan
    rgb = flow_to_rgb(f)
    assert rgb.dtype == np.uint8
    np.testing.assert_array_equal(rgb[0, 0], [0, 0, 0])  # bright bg invalid
    np.testing.assert_array_equal(rgb[1, 1], [255, 0, 0])  # angle 0 -> red
    rgb_dark = flow_to_rgb(f, background="dark")
    np.testing.assert_array_equal(rgb_dark[0, 0], [255, 255, 255])

    # zero flow: bright background -> white, dark -> black
    z = np.zeros((2, 2, 2), np.float32)
    np.testing.assert_array_equal(flow_to_rgb(z)[0, 0], [255, 255, 255])
    np.testing.assert_array_equal(flow_to_rgb(z, background="dark")[0, 0],
                                  [0, 0, 0])
