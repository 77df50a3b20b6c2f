"""Latency measurement that is robust to async/remote dispatch.

The axon-tunneled TPU backend does not block on ``block_until_ready``
(dispatch is fully async and only host transfers synchronize), so we time a
jitted loop of N chained forwards that reduces to one scalar, and fetch the
scalar.  The transfer is O(bytes of one float), so wall time / N is the true
per-forward device latency.
"""

from __future__ import annotations

import time
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp


def timed_forward_fn(forward: Callable, n_chain: int = 10) -> Callable:
    """Wrap ``forward(params, inputs) -> dict`` into a jitted fn running it
    ``n_chain`` times with a data dependency, returning a scalar."""

    def chained(params, inputs):
        def body(i, acc):
            # fold the accumulator into the input so iterations can't be
            # CSEd/reordered — forwards are strictly serialized
            x = inputs["images"] + (acc * 1e-30)
            out = forward(params, {**inputs, "images": x})
            return acc + jnp.sum(out["flows"][..., :1, :1, :1])

        return jax.lax.fori_loop(0, n_chain, body, jnp.zeros((), jnp.float32))

    return jax.jit(chained)


def measure_latency(forward: Callable, params, inputs,
                    n_chain: int = 5, repeats: int = 3) -> float:
    """Median per-forward latency in seconds."""
    fn = timed_forward_fn(forward, n_chain)
    # compile + warmup
    float(fn(params, inputs))
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(fn(params, inputs))
        times.append(time.perf_counter() - t0)
    times.sort()
    med = times[len(times) // 2]
    return med / n_chain
