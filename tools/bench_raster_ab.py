"""A/B the Pallas vs XLA rasterizer paths at production shapes.

Run twice: `python tools/bench_raster_ab.py` (Pallas) and with
`SRTPU_NO_PALLAS=1` (XLA fallback).  Prints per-op ms.
"""
from __future__ import annotations

import argparse
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--v", type=int, default=225000)
    ap.add_argument("--f", type=int, default=445000)
    ap.add_argument("--n", type=int, default=3, help="frame batch (splat)")
    ap.add_argument("--hw", type=int, default=1080)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from selfreconcode_tpu.render.camera import Camera
    from selfreconcode_tpu.ops import rasterize as R

    print(f"PALLAS_ENABLED={R.PALLAS_ENABLED}", flush=True)

    def fetch(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        return np.asarray(leaf.reshape(-1)[:1])

    tiny = jax.jit(lambda x: x + 1.0)
    fetch(tiny(jnp.zeros(())))
    t0 = time.perf_counter()
    for _ in range(5):
        fetch(tiny(jnp.zeros(())))
    rtt = (time.perf_counter() - t0) / 5 * 1e3
    K = args.iters

    def bench(label, fn, *a):
        fetch(fn(*a))
        t0 = time.perf_counter()
        for _ in range(K):
            out = fn(*a)
        fetch(out)
        dt = ((time.perf_counter() - t0) * 1e3 - rtt) / K
        print(f"  {label:<40s} {dt:8.1f} ms", flush=True)
        return dt

    V, F, N, HW = args.v, args.f, args.n, args.hw
    rng = np.random.default_rng(0)
    cam = Camera(focal=jnp.asarray([1000.0, 1000.0]),
                 principal=jnp.asarray([HW / 2.0, HW / 2.0]),
                 R=jnp.eye(3), T=jnp.asarray([0.0, 0.0, 2.5]),
                 H=HW, W=HW)
    anchor = rng.uniform(-0.6, 0.6, (F, 1, 3)).astype(np.float32)
    tri = anchor + 0.004 * rng.standard_normal((F, 3, 3)).astype(np.float32)
    vstack = jnp.asarray(tri.reshape(-1, 3))
    fstack = jnp.arange(F * 3, dtype=jnp.int32).reshape(F, 3)
    fvalid = jnp.ones((F,), bool)
    print(f"[mesh {F} faces @{HW}p]")
    bench("rasterize_mesh fp=8", jax.jit(
        lambda v: R.rasterize_mesh(cam, v, fstack, fvalid, 8)), vstack)

    verts1 = jnp.asarray(rng.uniform(-0.6, 0.6, (V, 3)).astype(np.float32))
    pvalid = jnp.ones((V,), bool)
    print(f"[splat {V} pts @{HW}p, r_pix~2.4]")
    sfn = jax.jit(lambda v: R.splat_mask(cam, v, pvalid, 0.006))
    bench("splat fwd", sfn, verts1)
    bench("splat fwd+bwd", jax.jit(
        lambda v: jax.grad(lambda v_: sfn(v_).sum())(v)), verts1)


if __name__ == "__main__":
    main()
