"""Spatially-sharded correlation vs dense reference on the 8-device mesh."""

import numpy as np

import jax
import jax.numpy as jnp

from ptlflow_tpu.models.gmflow.gmflow import global_correlation_softmax
from ptlflow_tpu.ops.correlation import all_pairs_correlation
from ptlflow_tpu.parallel import make_mesh
from ptlflow_tpu.parallel.ring_corr import (
    ring_global_correlation_softmax, sharded_corr_volume)


def test_sharded_corr_volume_matches_dense():
    assert len(jax.devices()) == 8
    mesh = make_mesh(8, spatial=8)  # pure spatial mesh (1 data x 8 spatial)
    rng = np.random.RandomState(0)
    b, h, w, c = 1, 16, 12, 32
    f1 = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    f2 = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    with mesh:
        sharded = sharded_corr_volume(f1, f2, mesh)
    dense = all_pairs_correlation(f1, f2)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(dense),
                               atol=1e-4)


def test_ring_global_matching_matches_dense():
    assert len(jax.devices()) == 8
    mesh = make_mesh(8, spatial=8)
    rng = np.random.RandomState(1)
    b, h, w, c = 1, 16, 12, 32
    f1 = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    f2 = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    with mesh:
        flow_ring = ring_global_correlation_softmax(f1, f2, mesh)
    flow_dense, _ = global_correlation_softmax(f1, f2)
    np.testing.assert_allclose(np.asarray(flow_ring),
                               np.asarray(flow_dense), atol=1e-4)
