"""Bisect the inner (pc-loss) pass at production scale."""
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
    ap.add_argument("--n", type=int, default=None)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from selfreconcode_tpu.engine.trainer import (build_synthetic_trainer,
                                                  camera_from_bank)
    from selfreconcode_tpu.models.deformer import deformer_apply
    from selfreconcode_tpu.models.skinner import skinner_apply
    from selfreconcode_tpu.ops.rasterize import splat_mask
    from selfreconcode_tpu.engine import losses as L
    from selfreconcode_tpu.utils import meshops
    from tools.profile_step import PROD_RES, _fetch_scalar

    root = osp.join(tempfile.gettempdir(), f"srtpu_prof_{args.h}")
    tr, ds = build_synthetic_trainer(root, n_frames=32, H=args.h, W=args.h,
                                     resolutions=PROD_RES)
    tr.set_stage(args.stage)
    if args.n is not None and tr.stage_cfg.N != args.n:
        tr.override_stage(N=args.n)
    nv, nf = tr.remesh(1.0)
    print(f"remesh: {nv}v {nf}f", flush=True)
    cfg = tr.stage_cfg
    N, H, W, vcap = cfg.N, cfg.H, cfg.W, cfg.vcap
    state = tr.state
    deformer = tr.deformer
    tmp = state.tmp
    fids = jnp.arange(N, dtype=jnp.int32)

    tiny = jax.jit(lambda x: x + 1.0)
    _fetch_scalar(tiny(jnp.zeros(())))
    t0 = time.perf_counter()
    for _ in range(5):
        _fetch_scalar(tiny(jnp.zeros(())))
    rtt = (time.perf_counter() - t0) / 5 * 1e3
    K = args.iters

    def bench(label, fn, *a):
        _fetch_scalar(fn(*a))
        t0 = time.perf_counter()
        for _ in range(K):
            out = fn(*a)
        _fetch_scalar(out)
        dt = ((time.perf_counter() - t0) * 1e3 - rtt) / K
        print(f"  {label:<44s} {dt:8.1f} ms", flush=True)
        return dt

    bank = state.bank
    params = state.params
    poses = bank["poses"][fids]
    trans = bank["trans"][fids]
    dcond = bank["cond_deformer"][fids]
    cam = jax.tree_util.tree_map(jax.lax.stop_gradient,
                                 camera_from_bank(bank, H, W, cfg))
    binds = jnp.repeat(jnp.arange(N), vcap)
    flat = jnp.tile(tmp.verts, (N, 1))
    cot_nv3 = jnp.ones((N * vcap, 3))

    print(f"[inner pieces, N={N}, vcap={vcap}]")

    dfn = jax.jit(lambda tp, d, q: deformer_apply(
        tp, d, q, binds, dcond, poses, trans, 0.75)[0])
    bench("deformer fwd", dfn, params["trans"], deformer, flat)
    bench("deformer fwd+vjp", jax.jit(
        lambda tp, d, q: jax.vjp(lambda t_, q_: dfn(t_, d, q_), tp, q)[1](
            cot_nv3)), params["trans"], deformer, flat)

    def_verts = dfn(params["trans"], deformer, flat).reshape(N, vcap, 3)

    def splat_all(dv):
        return jnp.stack([splat_mask(cam, dv[i], tmp.vert_valid, cfg.radius)
                          for i in range(N)])

    bench("splat xN fwd", jax.jit(splat_all), def_verts)
    bench("splat xN fwd+bwd", jax.jit(
        lambda dv: jax.grad(lambda d_: splat_all(d_).sum())(dv)), def_verts)

    def regus(tv):
        lap = meshops.uniform_laplacian_loss(tv, tmp.edges, tmp.edge_valid,
                                             tmp.vert_valid)
        el = meshops.edge_length_loss(tv, tmp.edges, tmp.edge_valid)
        nc = meshops.normal_consistency_loss(tv, tmp.faces, tmp.edge_faces,
                                             tmp.ef_valid)
        return lap + el + nc

    bench("mesh regus fwd", jax.jit(regus), tmp.verts)
    bench("mesh regus fwd+bwd", jax.jit(jax.grad(regus)), tmp.verts)

    def defconst(tv):
        flat_ = jnp.tile(tv, (N, 1))
        d_, _ = deformer_apply(params["trans"], deformer, flat_, binds,
                               dcond, poses, trans, 0.75)
        lbs = skinner_apply(deformer.skinner, flat_, binds, poses, trans)
        return L.def_consistency_loss(d_.reshape(N, vcap, 3),
                                      lbs.reshape(N, vcap, 3),
                                      tmp.vert_valid, 0.01)

    bench("def-consistency fwd", jax.jit(defconst), tmp.verts)
    bench("def-consistency fwd+bwd", jax.jit(jax.grad(defconst)), tmp.verts)

    step = tr._get_step_fn()
    mgtMs = jnp.zeros((N, H, W))
    bench("inner_pass full", lambda: step.inner_pass(
        state, deformer, fids, mgtMs, jnp.asarray([1.0, 0.75, 1.0])))


if __name__ == "__main__":
    main()
