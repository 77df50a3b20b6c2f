"""SCV parity vs reference torch modules and a torch.sparse splat oracle."""

import importlib.util
import sys
import types

import numpy as np
import pytest
import torch

import jax.numpy as jnp

import ptlflow_tpu
from ptlflow_tpu.models.scv import extractor as jext
from ptlflow_tpu.models.scv import update as jupd
from ptlflow_tpu.models.scv.scv import (compute_sparse_corr, sparse_windows)

REF = "/root/reference/ptlflow/models/scv"


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref():
    extr = _load("refscv_extractor", f"{REF}/extractor.py")
    upd = _load("refscv_update", f"{REF}/update.py")
    utils = _load("refscv_utils", f"{REF}/utils.py")
    return types.SimpleNamespace(extr=extr, upd=upd, utils=utils)


def _sd(mod):
    return {k: v.detach().numpy() for k, v in mod.state_dict().items()}


def to_nhwc(t):
    return t.permute(0, 2, 3, 1).detach().numpy()


def test_encoder_quarter_parity(ref):
    torch.manual_seed(0)
    t = ref.extr.BasicEncoderQuarter(output_dim=64,
                                     norm_fn="instance").eval()
    j = jext.BasicEncoderQuarter(output_dim=64, norm_fn="instance")
    params = j.from_torch(_sd(t))
    t_count = sum(p.numel() for p in t.parameters())
    from ptlflow_tpu.nn import count_parameters

    assert count_parameters(params) == t_count
    rng = np.random.RandomState(0)
    x = rng.randn(1, 3, 32, 40).astype(np.float32)
    with torch.no_grad():
        ref_out = t(torch.from_numpy(x)).numpy()
    out = j(params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    assert out.shape[1] == x.shape[2] // 4
    np.testing.assert_allclose(np.asarray(out),
                               np.transpose(ref_out, (0, 2, 3, 1)),
                               atol=1e-4)


def test_update_block_parity(ref):
    torch.manual_seed(1)
    t = ref.upd.BasicUpdateBlockQuarter(hidden_dim=128,
                                        input_dim=405).eval()
    j = jupd.BasicUpdateBlockQuarter(hidden_dim=128, input_dim=405)
    params = j.from_torch(_sd(t))
    rng = np.random.RandomState(1)
    b, h, w = 1, 6, 8
    net = rng.randn(b, 128, h, w).astype(np.float32)
    inp = rng.randn(b, 128, h, w).astype(np.float32)
    corr = rng.randn(b, 405, h, w).astype(np.float32)
    flow = rng.randn(b, 2, h, w).astype(np.float32)
    with torch.no_grad():
        t_net, t_mask, t_delta = t(*(torch.from_numpy(v) for v in
                                     (net, inp, corr, flow)))
    j_net, j_mask, j_delta = j(
        params, *(jnp.asarray(np.transpose(v, (0, 2, 3, 1))) for v in
                  (net, inp, corr, flow)))
    np.testing.assert_allclose(np.asarray(j_net), to_nhwc(t_net), atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_mask), to_nhwc(t_mask),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_delta), to_nhwc(t_delta),
                               atol=1e-4)


def test_compute_sparse_corr_topk():
    """Our top-k must equal brute-force torch.topk over the full
    correlation (the reference's faiss inner-product search)."""
    rng = np.random.RandomState(2)
    b, h, w, c = 2, 5, 6, 16
    k = 8
    f1 = rng.randn(b, h, w, c).astype(np.float32)
    f2 = rng.randn(b, h, w, c).astype(np.float32)
    corr, coords0, coords1 = compute_sparse_corr(
        jnp.asarray(f1), jnp.asarray(f2), k=k)
    t1 = torch.from_numpy(f1).reshape(b, h * w, c)
    t2 = torch.from_numpy(f2).reshape(b, h * w, c)
    full = torch.einsum("bnc,bmc->bnm", t1, t2)
    ref_vals, ref_idx = torch.topk(full, k, dim=2)
    ref_vals = ref_vals / np.sqrt(c)
    np.testing.assert_allclose(np.sort(np.asarray(corr), -1),
                               np.sort(ref_vals.numpy(), -1), atol=1e-4)
    # displacements: coords1 + coords0 must be the (y, x) of top indices
    got_abs = np.asarray(coords1) + np.asarray(coords0)[None, :, None, :]
    got_n = got_abs[..., 0] * w + got_abs[..., 1]
    np.testing.assert_array_equal(np.sort(got_n, -1),
                                  np.sort(ref_idx.numpy(), -1))


def test_compute_sparse_corr_topk_blockmax_path():
    """Large map so ncol > 4096: exercises the block-max exact top-k path
    (per-128-block max -> top-k blocks -> gather -> top-k of candidates)
    rather than the small-map direct lax.top_k fallback."""
    rng = np.random.RandomState(7)
    b, h, w, c = 1, 40, 110, 8  # n = 4400 > 4096
    k = 8
    f1 = rng.randn(b, h, w, c).astype(np.float32)
    f2 = rng.randn(b, h, w, c).astype(np.float32)
    corr, coords0, coords1 = compute_sparse_corr(
        jnp.asarray(f1), jnp.asarray(f2), k=k)
    t1 = torch.from_numpy(f1).reshape(b, h * w, c)
    t2 = torch.from_numpy(f2).reshape(b, h * w, c)
    full = torch.einsum("bnc,bmc->bnm", t1, t2)
    ref_vals, ref_idx = torch.topk(full, k, dim=2)
    ref_vals = ref_vals / np.sqrt(c)
    np.testing.assert_allclose(np.sort(np.asarray(corr), -1),
                               np.sort(ref_vals.numpy(), -1), atol=1e-4)
    got_abs = np.asarray(coords1) + np.asarray(coords0)[None, :, None, :]
    got_n = got_abs[..., 0] * w + got_abs[..., 1]
    np.testing.assert_array_equal(np.sort(got_n, -1),
                                  np.sort(ref_idx.numpy(), -1))


def test_sparse_windows_vs_torch_sparse(ref):
    """The scatter-splat must equal the reference's torch.sparse pipeline
    (scv.py:252-298) for one scale set."""
    rng = np.random.RandomState(3)
    b, h, w, k = 1, 4, 5, 6
    n = h * w
    corr = rng.randn(b, n, k).astype(np.float32)
    coords1 = (rng.randn(b, n, k, 2) * 3).astype(np.float32)

    out = np.asarray(sparse_windows(jnp.asarray(corr), jnp.asarray(coords1),
                                    h, w, num_scales=5, search_range=4))

    # torch.sparse oracle following the reference loop
    corr_t = torch.from_numpy(corr).permute(0, 2, 1)  # (B, k, N)
    coords1_cv = torch.from_numpy(coords1).permute(0, 3, 2, 1)  # (B,2,k,N)
    gy, gx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    coords0_cv = torch.from_numpy(
        np.stack([gy.reshape(-1), gx.reshape(-1)]).astype(np.float32))
    coords0_cv = coords0_cv.view(1, 2, 1, n).expand(b, -1, k, -1)
    batch_index = torch.zeros(b, 1, k, n)
    corr_rep = corr_t.repeat(1, 4, 1)
    search_range = 4
    levels = []
    for i in range(5):
        c_sp = coords1_cv * 0.5 ** i
        weights, c_sp = ref.utils.compute_interpolation_weights(c_sp)
        mask = (c_sp[:, 0].abs() <= search_range) & \
               (c_sp[:, 1].abs() <= search_range)
        batch_ind = batch_index.permute(0, 2, 3, 1).repeat(1, 4, 1, 1)[mask]
        coords0_sp = coords0_cv.permute(0, 2, 3, 1).repeat(1, 4, 1, 1)[mask]
        c_sp = c_sp.permute(0, 2, 3, 1)[mask] + search_range
        coords_sp = torch.cat([batch_ind, coords0_sp, c_sp], dim=1)
        vals = (weights * corr_rep)[mask].unsqueeze(1)
        sp = torch.sparse_coo_tensor(
            coords_sp.t().long(), vals,
            torch.Size([b, h, w, 9, 9, 1])).coalesce()
        levels.append(sp.to_dense().view(b, h, w, -1))
    ref_out = torch.cat(levels, dim=3).numpy()
    np.testing.assert_allclose(out, ref_out, atol=1e-4)


def test_scv_forward_shapes():
    for name in ("scv4", "scv8"):
        model = ptlflow_tpu.get_model(name, args={"iters": 2})
        model.init_params()
        rng = np.random.RandomState(4)
        images = rng.rand(1, 2, 3, 64, 64).astype(np.float32)
        out = model({"images": images})
        assert out["flows"].shape == (1, 1, 2, 64, 64)
        assert np.isfinite(np.asarray(out["flows"])).all()
