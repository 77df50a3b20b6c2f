"""CRAFT parity vs reference torch modules (read-only oracle imports)."""

import importlib.util
import sys
import types

import numpy as np
import pytest
import torch

import jax.numpy as jnp

import ptlflow_tpu
from ptlflow_tpu.models.craft import setrans as jst
from ptlflow_tpu.models.craft.craft import GMAUpdateBlock, TransCorrBlock

REF = "/root/reference/ptlflow/models/craft"


def load_ref(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref():
    pkg = types.ModuleType("refcraft")
    pkg.__path__ = [REF]
    sys.modules["refcraft"] = pkg
    load_ref("refcraft.utils", f"{REF}/utils.py")
    load_ref("refcraft.setrans_ablation", f"{REF}/setrans_ablation.py")
    st = load_ref("refcraft.setrans", f"{REF}/setrans.py")
    load_ref("refcraft.gma", f"{REF}/gma.py")
    upd = load_ref("refcraft.update", f"{REF}/update.py")
    corr = load_ref("refcraft.corr", f"{REF}/corr.py")
    return types.SimpleNamespace(st=st, upd=upd, corr=corr)


def _sd(mod):
    return {k: v.detach().numpy() for k, v in mod.state_dict().items()}


def _inter_cfg_ref(st):
    c = st.SETransConfig()
    c.in_feat_dim = 256
    c.feat_dim = 256
    c.max_pos_size = 160
    c.out_attn_scores_only = True
    c.attn_diag_cycles = 1000
    c.num_modes = 4
    c.tie_qk_scheme = "shared"
    c.qk_have_bias = True
    c.pos_code_type = "bias"
    c.pos_code_weight = 0.5
    c.pos_bias_radius = 7
    return c


def _f2_cfg_ref(st):
    c = st.SETransConfig()
    c.in_feat_dim = 256
    c.feat_dim = 256
    c.has_input_skip = True
    c.has_FFN = False
    c.attn_mask_radius = -1
    c.tie_qk_scheme = None
    c.qk_have_bias = False
    c.out_attn_probs_only = False
    c.attn_diag_cycles = 1000
    c.num_modes = 4
    c.pos_code_type = "bias"
    c.pos_code_weight = 0.5
    c.pos_bias_radius = 7
    return c


def _intra_cfg_ref(st, probs_only=True):
    c = st.SETransConfig()
    c.in_feat_dim = 128
    c.feat_dim = 128
    c.has_FFN = False
    c.has_input_skip = True
    c.attn_mask_radius = -1
    c.tie_qk_scheme = None
    c.qk_have_bias = False
    c.out_attn_probs_only = probs_only
    c.attn_diag_cycles = 1000
    c.num_modes = 4
    c.pos_code_type = "bias"
    c.pos_code_weight = 1.0
    c.pos_bias_radius = 7
    return c


def test_sliding_pos_biases_parity(ref):
    torch.manual_seed(0)
    t = ref.st.SlidingPosBiases2D(2, 7, (32, 32))
    with torch.no_grad():
        t.biases.normal_()
        ref_out = t((1, 1, 9, 11), torch.float32, "cpu").numpy()
    j = jst.SlidingPosBiases2D(2, 7)
    out = j({"biases": jnp.asarray(t.biases.detach().numpy())}, 9, 11)
    np.testing.assert_allclose(
        np.asarray(out).reshape(9, 11, 9, 11), ref_out, atol=1e-6)


def test_inter_cross_att_scores_parity(ref):
    torch.manual_seed(1)
    t = ref.st.CrossAttFeatTrans(_inter_cfg_ref(ref.st), "inter").eval()
    j = jst.CrossAttFeatTrans(jst.SETransConfig(
        in_feat_dim=256, feat_dim=256, num_modes=4, tie_qk_scheme="shared",
        qk_have_bias=True, pos_code_weight=0.5, out_attn_scores_only=True,
        has_FFN=False), "inter")
    params = j.from_torch(_sd(t))
    rng = np.random.RandomState(1)
    q = rng.randn(1, 24, 256).astype(np.float32)
    k = rng.randn(1, 24, 256).astype(np.float32)
    pos = rng.randn(1, 1, 24, 24).astype(np.float32)
    with torch.no_grad():
        ref_out = t(torch.from_numpy(q), torch.from_numpy(k),
                    torch.from_numpy(pos)).numpy()
    out = j(params, jnp.asarray(q), jnp.asarray(k), jnp.asarray(pos))
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=2e-5)


def test_f2_self_att_trans_parity(ref):
    torch.manual_seed(2)
    t = ref.st.SelfAttVisPosTrans(_f2_cfg_ref(ref.st), "F2").eval()
    j = jst.SelfAttVisPosTrans(jst.SETransConfig(
        in_feat_dim=256, feat_dim=256, num_modes=4, tie_qk_scheme=None,
        qk_have_bias=False, pos_code_weight=0.5, has_FFN=False,
        has_input_skip=True), "F2")
    params = j.from_torch(_sd(t))
    rng = np.random.RandomState(2)
    x = rng.randn(1, 256, 6, 8).astype(np.float32)
    with torch.no_grad():
        ref_out = t(torch.from_numpy(x)).numpy()
    out = j(params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.asarray(out),
                               np.transpose(ref_out, (0, 2, 3, 1)),
                               atol=1e-4)


def test_trans_corr_block_parity(ref):
    torch.manual_seed(3)
    t = ref.corr.TransCorrBlock(_inter_cfg_ref(ref.st), radius=4,
                                do_corr_global_norm=True).eval()
    j = TransCorrBlock(jst.SETransConfig(
        in_feat_dim=256, feat_dim=256, num_modes=4, tie_qk_scheme="shared",
        qk_have_bias=True, pos_code_weight=0.5, out_attn_scores_only=True,
        has_FFN=False), radius=4, num_levels=4, do_corr_global_norm=True)
    params = j.from_torch(_sd(t))
    rng = np.random.RandomState(3)
    # smallest pyramid level must be >= 2x2: the reference's
    # bilinear_sampler divides by (W-1), which NaNs on 1x1 levels
    b, c, h, w = 1, 256, 16, 16
    f1 = rng.randn(b, c, h, w).astype(np.float32)
    f2 = rng.randn(b, c, h, w).astype(np.float32)
    with torch.no_grad():
        coords1 = torch.stack(torch.meshgrid(
            torch.arange(w, dtype=torch.float32),
            torch.arange(h, dtype=torch.float32), indexing="xy"), dim=0)
        coords1 = coords1[None]
        t.update(torch.from_numpy(f1), torch.from_numpy(f2), None, None,
                 coords1)
        ref_corr = t(coords1).numpy()
    pyramid = j.build_pyramid(params, jnp.asarray(np.transpose(f1, (0, 2, 3, 1))),
                              jnp.asarray(np.transpose(f2, (0, 2, 3, 1))))
    from ptlflow_tpu.ops.correlation import coords_grid, corr_pyramid_lookup

    coords = coords_grid(b, h, w)
    out = corr_pyramid_lookup(pyramid, coords, 4)
    np.testing.assert_allclose(np.asarray(out),
                               np.transpose(ref_corr, (0, 2, 3, 1)),
                               atol=1e-4)


def test_update_block_parity(ref):
    torch.manual_seed(4)
    intra_ref = _intra_cfg_ref(ref.st, probs_only=False)
    t = ref.upd.GMAUpdateBlock(corr_levels=4, corr_multiplier=1,
                               corr_radius=4, use_setrans=True,
                               intra_trans_config=intra_ref, num_heads=1,
                               hidden_dim=128).eval()
    j = GMAUpdateBlock(corr_levels=4, corr_multiplier=1, corr_radius=4,
                       intra_trans_config=jst.SETransConfig(
                           in_feat_dim=128, feat_dim=128, num_modes=4,
                           has_FFN=False, has_input_skip=True),
                       hidden_dim=128)
    params = j.from_torch(_sd(t))
    rng = np.random.RandomState(4)
    b, h, w = 1, 6, 8
    hw = h * w
    net = rng.randn(b, 128, h, w).astype(np.float32)
    inp = rng.randn(b, 128, h, w).astype(np.float32)
    corr = rng.randn(b, 4 * 81, h, w).astype(np.float32)
    flow = rng.randn(b, 2, h, w).astype(np.float32)
    attn = np.abs(rng.rand(b, 4, hw, hw)).astype(np.float32)
    attn = attn / attn.sum(-1, keepdims=True)
    with torch.no_grad():
        t_net, t_mask, t_delta = t(
            *(torch.from_numpy(v) for v in (net, inp, corr, flow)),
            torch.from_numpy(attn))
    j_net, j_mask, j_delta = j(
        params,
        *(jnp.asarray(np.transpose(v, (0, 2, 3, 1))) for v in
          (net, inp, corr, flow)),
        jnp.asarray(attn))

    def to_nhwc(t):
        return t.permute(0, 2, 3, 1).numpy()

    np.testing.assert_allclose(np.asarray(j_net), to_nhwc(t_net), atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_delta), to_nhwc(t_delta),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_mask), to_nhwc(t_mask),
                               atol=1e-4)


def test_craft_forward_shapes():
    model = ptlflow_tpu.get_model("craft", args={"iters": 2})
    model.init_params()
    rng = np.random.RandomState(5)
    images = rng.rand(1, 2, 3, 128, 128).astype(np.float32)
    out = model({"images": images})
    assert out["flows"].shape == (1, 1, 2, 128, 128)
    assert np.isfinite(np.asarray(out["flows"])).all()
