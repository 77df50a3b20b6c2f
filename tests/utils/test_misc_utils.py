"""Timer, logger, orbax checkpoints, IOAdapter."""

import time

import numpy as np

import jax
import jax.numpy as jnp

import ptlflow_tpu
from ptlflow_tpu import nn
from ptlflow_tpu.utils.ckpt import save_orbax, load_orbax, restore_model
from ptlflow_tpu.utils.io_adapter import IOAdapter
from ptlflow_tpu.utils.logger import ImageSampler, make_flow_grid
from ptlflow_tpu.utils.timer import Timer, TimerManager


def test_timer():
    t = Timer()
    with t:
        time.sleep(0.01)
    t.tic()
    time.sleep(0.02)
    t.toc()
    assert t.count == 2
    assert 0.005 < t.median() < 0.05
    tm = TimerManager()
    with tm("a"):
        pass
    assert "a" in tm.summary()


def test_make_flow_grid():
    rng = np.random.RandomState(0)
    img = rng.rand(32, 40, 3).astype(np.float32)
    pred = rng.randn(32, 40, 2).astype(np.float32)
    gt = rng.randn(32, 40, 2).astype(np.float32)
    grid = make_flow_grid(img, pred, gt)
    assert grid.shape == (4 * 32, 40, 3)
    assert grid.dtype == np.uint8
    grid2 = make_flow_grid(img, pred)
    assert grid2.shape == (2 * 32, 40, 3)


def test_image_sampler():
    s = ImageSampler(num_images=3, epoch_size=30)
    logged = [i for i in range(30) if s.should_log(i)]
    assert logged == [0, 10, 20]


def test_orbax_roundtrip(tmp_path):
    model = ptlflow_tpu.get_model("raft_small")
    model.init_params()
    path = str(tmp_path / "ckpt")
    save_orbax(path, model.params)
    restored = load_orbax(path)
    f0 = nn.flatten_params(model.params)
    f1 = nn.flatten_params(restored)
    assert set(f0) == set(f1)
    for k in f0:
        np.testing.assert_allclose(np.asarray(f0[k]), np.asarray(f1[k]))

    # restore_model accepts orbax dirs
    model2 = ptlflow_tpu.get_model("raft_small")
    restore_model(model2, path)
    np.testing.assert_allclose(
        np.asarray(nn.flatten_params(model2.params)["fnet.conv1.weight"]),
        np.asarray(f0["fnet.conv1.weight"]))


def test_io_adapter_prepare_and_unscale():
    rng = np.random.RandomState(0)
    img1 = (rng.rand(50, 62, 3) * 255).astype(np.uint8)
    img2 = (rng.rand(50, 62, 3) * 255).astype(np.uint8)
    adapter = IOAdapter(output_stride=8, target_scale_factor=0.5)
    inputs = adapter.prepare_inputs([img1, img2])
    assert inputs["images"].shape == (1, 2, 3, 25, 31)
    assert float(inputs["images"].max()) <= 1.0

    fake_flows = jnp.ones((1, 1, 2, 25, 31), jnp.float32)
    out = adapter.unscale({"flows": fake_flows})
    assert out["flows"].shape == (1, 1, 2, 50, 62)
    # magnitudes scaled back up by 2
    assert abs(float(out["flows"][0, 0, 0].mean()) - 2.0) < 0.01


def test_tensor_dict_to_numpy_and_release():
    from ptlflow_tpu.utils.misc import release_device, tensor_dict_to_numpy

    d = {"flows": jnp.ones((1, 1, 2, 8, 8)), "meta": {"a": 1}, "n": 3}
    out = tensor_dict_to_numpy(d)
    assert out["flows"].shape == (8, 8, 2)
    assert out["flows_viz"].shape == (8, 8, 3)
    assert out["meta"] == {"a": 1}

    d2 = {"x": jnp.ones((4,)), "y": "keep"}
    r = release_device(d2)
    assert isinstance(r["x"], np.ndarray) and r["y"] == "keep"


def test_forward_interpolate_batch_nchw():
    from ptlflow_tpu.utils.misc import forward_interpolate_batch

    flow = np.zeros((2, 2, 8, 8), np.float32)
    out = np.asarray(forward_interpolate_batch(flow))
    assert out.shape == (2, 2, 8, 8)
    np.testing.assert_allclose(out, flow, atol=1e-5)  # zero flow fixed point


def test_public_api_load_checkpoint(tmp_path):
    """ptlflow_tpu.load_checkpoint resolves local .ckpt files and returns the
    reference layout (ptlflow/__init__.py:201-251: state_dict +
    hyper_parameters); download_scripts is exported for API parity."""
    import torch

    assert callable(ptlflow_tpu.download_scripts)
    ref = ptlflow_tpu.get_model_reference("raft_small")
    sd = {"state_dict": {"x": torch.zeros(3)},
          "hyper_parameters": {"foo": 1}}
    torch.save(sd, tmp_path / "w.ckpt")
    out = ptlflow_tpu.load_checkpoint(str(tmp_path / "w.ckpt"), ref)
    assert out["hyper_parameters"]["foo"] == 1
    assert "x" in out["state_dict"]
