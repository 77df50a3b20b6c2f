"""Forward sweep over every registered model (reference strategy:
tests/ptlflow/models/test_models.py:75-144 — instantiate with default args,
forward a random input at make_divisible(256, output_stride))."""

import numpy as np
import pytest

import ptlflow_tpu
from ptlflow_tpu.data.datamodule import make_divisible

# keep CPU runtime bounded: cap iteration counts where models support it
ARGS_OVERRIDE = {
    "raft": {"iters": 2}, "raft_small": {"iters": 2}, "gma": {"iters": 2},
    "sea_raft": {"iters": 1}, "sea_raft_s": {"iters": 1},
    "sea_raft_m": {"iters": 1}, "sea_raft_l": {"iters": 1},
    "skflow": {"iters": 2}, "csflow": {"iters": 2},
    "flow1d": {"iters": 2, "corr_radius": 8},
    "flowformer": {"decoder_depth": 2, "use_tile_input": False},
    "rapidflow": {"iters": 3}, "rapidflow_it6": {"iters": 3},
    "rpknet": {"iters": 3},
    "dpflow": {"iters_per_level": 1, "enc_depth": 2, "dec_gru_depth": 2},
    "unimatch_sc2_ref6": {"num_reg_refine": 2},
    "gmflow_p_sc2_ref6": {"num_reg_refine": 2},
    "videoflow_bof": {"decoder_depth": 2},
    "videoflow_mof": {"decoder_depth": 2},
    "neuflow2": {"iters_s8": 2},
    "llaflow": {"iters": 2}, "llaflow_raft": {"iters": 2},
    "recover_mn": {"iters": 1}, "recover_rn": {"iters": 1},
    "recover_cx": {"iters": 1}, "flow_anything": {"iters": 1},
    "splatflow": {"iters": 2}, "dip": {"iters": 2},
    "ms_raft_p": {"iters": (1, 1, 1, 1)},
    "waft_dav2_a1": {"iters": 1}, "waft_dav2_a2": {"iters": 1},
    "waft_twins_a2": {"iters": 1},
    "memflow": {"decoder_depth": 2}, "memflow_t": {"decoder_depth": 2},
    "flowseek_t": {"iters": 1}, "flowseek_m": {"iters": 1},
    "ccmr": {"iters": (1, 1, 1)}, "ccmr_p": {"iters": (1, 1, 1, 1)},
    "craft": {"iters": 2},
    "gmflownet": {"iters": 2}, "gmflownet_mix": {"iters": 2},
    "scv4": {"iters": 2}, "scv8": {"iters": 2},
    "matchflow": {"iters": 2, "use_tile_input": False},
    "matchflow_raft": {"iters": 2, "use_tile_input": False},
    "separableflow": {"iters": 2},
    "flowformer_pp": {"decoder_depth": 2, "use_tile_input": False},
}

# dicl needs >=256px inputs (7px search range at 1/64); its own test file
# covers it at that size

# models exercised heavily by their own dedicated test files
SKIP = {"dicl", "memfof",  # need >=256px / >=128px; own test files
        "streamflow",  # needs 4 frames; covered by test_streamflow.py
        # DINOv3 weights are gated; construction raises (parity with the
        # reference, which needs a local thirdparty/dinov3 checkout)
        "waft_dinov3_a2"}


def _family(name):
    ref = ptlflow_tpu.get_model_reference(name)
    return ref.__module__.rsplit(".", 2)[-2]


def _params():
    """One variant per family stays in the fast tier (VERDICT: <15-min
    default tier = infra + one model per family); sibling variants share
    the same blocks and run in the slow tier with the rest of the zoo."""
    seen = set()
    out = []
    for name in ptlflow_tpu.get_model_names():
        fam = _family(name)
        if fam in seen:
            out.append(pytest.param(name, marks=pytest.mark.slow))
        else:
            seen.add(fam)
            out.append(name)
    return out


@pytest.mark.parametrize("name", _params())
def test_forward_all_models(name):
    if name in SKIP:
        pytest.skip("covered elsewhere")
    model = ptlflow_tpu.get_model(name, args=ARGS_OVERRIDE.get(name, {}))
    model.init_params()
    s = make_divisible(256, model.output_stride)
    rng = np.random.RandomState(42)
    images = rng.rand(1, 2, 3, s, s).astype(np.float32)
    out = model({"images": images})
    assert out["flows"].shape == (1, 1, 2, s, s)
    assert np.isfinite(np.asarray(out["flows"])).all(), f"{name} NaN output"
