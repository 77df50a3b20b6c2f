"""LCV-RAFT: learned metric parity vs reference + forward smoke."""

import importlib.util
import sys

import numpy as np
import torch

import jax.numpy as jnp

import ptlflow_tpu
from ptlflow_tpu.models.lcv.lcv_raft import LearnableCorrBlock


def test_weight_matrix_matches_reference():
    spec = importlib.util.spec_from_file_location(
        "ref_lcv_corr", "/root/reference/ptlflow/models/lcv/corr_lcv.py")
    # corr_lcv imports .utils relatively; emulate the package
    import types

    pkg = types.ModuleType("reflcv")
    pkg.__path__ = ["/root/reference/ptlflow/models/lcv"]
    sys.modules["reflcv"] = pkg
    uspec = importlib.util.spec_from_file_location(
        "reflcv.utils", "/root/reference/ptlflow/models/lcv/utils.py")
    umod = importlib.util.module_from_spec(uspec)
    sys.modules["reflcv.utils"] = umod
    uspec.loader.exec_module(umod)
    cspec = importlib.util.spec_from_file_location(
        "reflcv.corr_lcv", "/root/reference/ptlflow/models/lcv/corr_lcv.py")
    cmod = importlib.util.module_from_spec(cspec)
    sys.modules["reflcv.corr_lcv"] = cmod
    cspec.loader.exec_module(cmod)

    torch.manual_seed(0)
    dim = 16
    t_blk = cmod.LearnableCorrBlock(dim, num_levels=2, radius=2)
    t_blk.raw_P.data = torch.randn(dim, dim) * 0.1 + torch.eye(dim)
    t_blk.raw_D.data = torch.randn(dim) * 0.1

    rng = np.random.RandomState(0)
    f1 = rng.randn(1, dim, 6, 8).astype(np.float32)
    f2 = rng.randn(1, dim, 6, 8).astype(np.float32)
    with torch.no_grad():
        ref_pyr = t_blk.compute_cost_volume(torch.from_numpy(f1),
                                            torch.from_numpy(f2))

    j_blk = LearnableCorrBlock(dim, num_levels=2, radius=2)
    params = {"raw_P": jnp.asarray(t_blk.raw_P.detach().numpy()),
              "raw_D": jnp.asarray(t_blk.raw_D.detach().numpy())}
    j_pyr = j_blk.compute_cost_volume(
        params, jnp.asarray(np.transpose(f1, (0, 2, 3, 1))),
        jnp.asarray(np.transpose(f2, (0, 2, 3, 1))))
    # level 0 comparison: torch (BHW, 1, H, W) vs ours (BHW, H, W, 1)
    np.testing.assert_allclose(
        np.asarray(j_pyr[0])[..., 0], ref_pyr[0].numpy()[:, 0], atol=1e-4)


def test_lcv_raft_forward():
    model = ptlflow_tpu.get_model("lcv_raft", args={"iters": 2})
    model.init_params()
    rng = np.random.RandomState(1)
    images = rng.rand(1, 2, 3, 128, 128).astype(np.float32)
    out = model({"images": images})
    assert out["flows"].shape == (1, 1, 2, 128, 128)
    assert np.isfinite(np.asarray(out["flows"])).all()
