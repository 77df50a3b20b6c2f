"""Device flow_to_rgb matches the numpy implementation."""

import numpy as np

import jax.numpy as jnp

from ptlflow_tpu.utils.flow_viz import flow_to_rgb as np_flow_to_rgb
from ptlflow_tpu.utils.flow_viz_jax import flow_to_rgb as j_flow_to_rgb


def test_matches_numpy_backend():
    rng = np.random.RandomState(0)
    flow = (rng.randn(24, 32, 2) * 8).astype(np.float32)
    flow[2:4, 3:5] = np.nan
    for bg in ("bright", "dark"):
        ref = np_flow_to_rgb(flow, background=bg).astype(np.int32)
        out = np.asarray(j_flow_to_rgb(jnp.asarray(flow),
                                       background=bg)).astype(np.int32)
        # uint8 rounding differences of 1 are acceptable
        assert np.abs(ref - out).max() <= 1


def test_batched():
    rng = np.random.RandomState(1)
    flow = (rng.randn(2, 8, 10, 2) * 4).astype(np.float32)
    out = j_flow_to_rgb(jnp.asarray(flow))
    assert out.shape == (2, 8, 10, 3)
    assert out.dtype == np.uint8
