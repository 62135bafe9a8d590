"""Bisect the warm-remesh device program: octree sweep vs marching cubes."""
from __future__ import annotations

import argparse
import os
import os.path as osp
import sys
import tempfile
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=1080)
    ap.add_argument("--stage", default="coarse")
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from selfreconcode_tpu.engine.trainer import build_synthetic_trainer
    from selfreconcode_tpu.ops.sparse_sdf import (sparse_sdf_grid,
                                                  grid_world_coords,
                                                  default_caps)
    from selfreconcode_tpu.ops.marching_cubes import marching_cubes
    from selfreconcode_tpu.models.sdf import sdf_value_only
    from tools.profile_step import PROD_RES

    root = osp.join(tempfile.gettempdir(), f"srtpu_prof_{args.h}")
    tr, ds = build_synthetic_trainer(root, n_frames=32, H=args.h, W=args.h,
                                     resolutions=PROD_RES)
    tr.set_stage(args.stage)
    res = tuple(tuple(int(v) for v in r)
                for r in tr.stage_cfg.resolutions)
    caps = tuple(default_caps(res))
    print(f"res={res[-1]} caps={caps}", flush=True)
    nv, nf = tr.remesh(1.0)
    print(f"remesh: {nv}v {nf}f; mc caps {tr._mc_caps[res[-1]]}", flush=True)

    params = tr.state.params["sdf"]
    sdf_net = tr.sdf_net
    b_min, b_max = tr.b_min, tr.b_max
    spacing, origin = grid_world_coords(res[-1], b_min, b_max)
    vcap_mc, fcap_mc, acap_mc = tr._mc_caps[res[-1]]
    ratio = jnp.asarray(1.0, jnp.float32)

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

    @jax.jit
    def sweep_only(params, ratio):
        def qf(p):
            return sdf_value_only(params, sdf_net, p, ratio)
        return sparse_sdf_grid(qf, res, b_min, b_max, 0.0, caps)

    vol = sweep_only(params, ratio)
    bench("sweep only", sweep_only, params, ratio)

    mc_j = jax.jit(lambda v: marching_cubes(v, origin, spacing, 0.0,
                                            vcap_mc, fcap_mc, acap_mc))
    bench("marching cubes only", mc_j, vol)

    # sdf eval at the sweep's total query budget, for reference
    ntot = int(np.prod(res[0])) + sum(caps)
    pts = jnp.zeros((ntot, 3))
    bench(f"sdf eval {ntot} pts", jax.jit(
        lambda p, q: sdf_value_only(p, sdf_net, q, 1.0)), params, pts)


if __name__ == "__main__":
    main()
