"""Benchmark: training-step throughput of the flagship per-subject optimizer.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Baseline derivation (BASELINE.md): the reference trains female-3-casual in
~1 day on a GTX 3090.  With the config.conf schedule (coarse 0-5 @ batch 3,
medium 6-11 @ batch 2, fine 12-200 @ batch 1, ~648 frames) that is ~125k
optimizer steps/day ~= 1.45 steps/s.  vs_baseline = our steps/s / 1.45,
i.e. >1.0 means faster than the reference per optimization step at the
fine-stage ray count (6144 rays/step).
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

REFERENCE_STEPS_PER_S = 1.45


def bench_train_step():
    """Time the full jitted train step on a synthetic scene if the trainer is
    available; fall back to the surface+loss hot path otherwise."""
    try:
        from selfreconcode_tpu.engine.trainer import build_synthetic_bench_step
        step, args = build_synthetic_bench_step(sample_rays=6144)
        name = "train_step"
    except (ImportError, AttributeError):
        step, args = _hotpath_step()
        name = "hotpath_step"

    # warmup/compile.  NOTE: jax.block_until_ready does NOT sync on the
    # axon remote-TPU tunnel; only a value fetch round-trips, so the loop
    # queues n executions and fetches one scalar from the LAST output (the
    # device queue is in-order).
    import numpy as np

    def fetch(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        return np.asarray(leaf.reshape(-1)[:1])

    fetch(step(*args))
    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        out = step(*args)
    fetch(out)
    dt = (time.perf_counter() - t0) / n
    return name, 1.0 / dt


def _hotpath_step():
    """Surface root-finding + IDR losses + grads at fine-stage scale."""
    import __graft_entry__ as g

    fn, args = g.entry()

    def loss_fn(params, pts, batch_inds, dcond, poses, trans, rays):
        sdf, d, colors = fn(params, pts, batch_inds, dcond, poses, trans, rays)
        return jnp.abs(colors).mean() + (sdf ** 2).mean() + (d ** 2).mean()

    grad_step = jax.jit(jax.grad(loss_fn))
    return grad_step, args


def main():
    name, steps_per_s = bench_train_step()
    print(json.dumps({
        "metric": f"{name}_per_s",
        "value": round(steps_per_s, 4),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_s / REFERENCE_STEPS_PER_S, 4),
    }))


if __name__ == "__main__":
    main()
