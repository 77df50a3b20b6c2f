"""Spatially-sharded correlation for very high resolutions (multi-chip SP).

The reference bounds correlation memory with host-side chunking and tiling
(SURVEY.md §5.7: correlation.py chunk_size, FlowFormer++ tiling,
alt_cuda_corr).  The TPU-native scale-out instead shards the H*W token axis
of the correlation across devices (`shard_map` over a 'spatial' mesh axis)
with XLA collectives over ICI:

- ``sharded_corr_volume``: query-sharded all-pairs volume — each device
  holds a slab of query rows and the (all-gathered) target features;
  queries are independent so no further communication is needed.  This is
  the memory-scaling path for RAFT-family models at 4K/Spring resolutions:
  the O((HW)^2) volume is split n_devices-ways.

- ``ring_global_correlation_softmax``: GMFlow-style softmax correspondence
  where *both* sides are sharded and target shards rotate around the ring
  (`jax.lax.ppermute`) with an online-softmax accumulator — ring attention's
  schedule applied to the cost volume; no full row of the volume ever
  materializes.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.correlation import coords_grid


def sharded_corr_volume(fmap1: jnp.ndarray, fmap2: jnp.ndarray, mesh: Mesh,
                        axis: str = "spatial") -> jnp.ndarray:
    """All-pairs correlation with the query (H1) axis sharded over ``axis``.

    fmap1, fmap2: (B, H, W, C) with H divisible by the axis size.
    Returns (B, H*W, H, W) sharded on its query dim.
    """
    import math

    c = fmap1.shape[-1]

    def local(f1_blk, f2_full):
        b, hb, w, _ = f1_blk.shape
        h2, w2 = f2_full.shape[1], f2_full.shape[2]
        q = f1_blk.reshape(b, hb * w, c)
        t = f2_full.reshape(b, h2 * w2, c)
        corr = jax.lax.dot_general(
            q, t, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) / math.sqrt(c)
        return corr.reshape(b, hb * w, h2, w2)

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(None, axis, None, None), P()),
        out_specs=P(None, axis, None, None))
    return fn(fmap1, fmap2)


def ring_global_correlation_softmax(feature0: jnp.ndarray,
                                    feature1: jnp.ndarray, mesh: Mesh,
                                    axis: str = "spatial") -> jnp.ndarray:
    """GMFlow global matching (gmflow/matching.py:7-47) with the target axis
    ring-rotated: online-softmax over target shards.

    feature0, feature1: (B, H, W, C), H divisible by the axis size.
    Returns flow (B, H, W, 2), query-sharded over ``axis``.
    """
    b, h, w, c = feature0.shape
    n_shards = mesh.shape[axis]
    hb = h // n_shards

    def local(f0_blk, f1_blk):
        # f0_blk, f1_blk: (B, hb, W, C)
        idx = jax.lax.axis_index(axis)
        q = f0_blk.reshape(b, hb * w, c).astype(jnp.float32) / (c ** 0.5)

        def make_grid(shard_idx):
            # target coords for shard shard_idx: rows shard_idx*hb ...
            base = coords_grid(b, hb, w, dtype=jnp.float32)
            return base.at[..., 1].add(shard_idx * hb).reshape(b, hb * w, 2)

        # accumulators become device-varying inside the loop (they mix with
        # the device index); mark them varying from the start
        _vary = lambda x: jax.lax.pcast(x, (axis,), to="varying")
        m0 = _vary(jnp.full((b, hb * w, 1), -jnp.inf, jnp.float32))
        den0 = _vary(jnp.zeros((b, hb * w, 1), jnp.float32))
        num0 = _vary(jnp.zeros((b, hb * w, 2), jnp.float32))

        def body(step, carry):
            m, den, num, kv = carry
            src_shard = jax.lax.rem(idx + step, n_shards)
            k = kv.reshape(b, hb * w, c).astype(jnp.float32)
            grid = make_grid(src_shard)
            scores = jnp.einsum("blc,bmc->blm", q, k,
                                preferred_element_type=jnp.float32)
            blk_max = jnp.max(scores, axis=-1, keepdims=True)
            new_m = jnp.maximum(m, blk_max)
            scale = jnp.exp(m - new_m)
            p = jnp.exp(scores - new_m)
            den = den * scale + jnp.sum(p, axis=-1, keepdims=True)
            num = num * scale + jnp.einsum(
                "blm,bmc->blc", p, grid, preferred_element_type=jnp.float32)
            # rotate target shard to the next device
            kv = jax.lax.ppermute(
                kv, axis,
                [(i, (i + n_shards - 1) % n_shards)
                 for i in range(n_shards)])
            return new_m, den, num, kv

        m, den, num, _ = jax.lax.fori_loop(
            0, n_shards, body, (m0, den0, num0, f1_blk))
        correspondence = num / den
        my_grid = make_grid(idx)
        flow = (correspondence - my_grid).reshape(b, hb, w, 2)
        return flow.astype(feature0.dtype)

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(None, axis, None, None), P(None, axis, None, None)),
        out_specs=P(None, axis, None, None))
    return fn(feature0, feature1)
