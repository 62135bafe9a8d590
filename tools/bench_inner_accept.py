"""Inner-pass piece timings AT the restored acceptance state.

bench_inner.py measures a fresh synthetic trainer; this restores the real
acceptance checkpoint (template nv/vcap, splat caps, conds) and times the
same pieces — the breakdown behind the fine-stage 0.15 s/it budget
(VERDICT r3 next-#2: inner pass = 159 ms of the 247 ms step).

    python tools/bench_inner_accept.py [--data /tmp/srtpu_accept]
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
    ap.add_argument("--data", default="/tmp/srtpu_accept")
    ap.add_argument("--model", default=None)
    ap.add_argument("--conf", default="configs/config.conf")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()
    model = args.model or osp.join(args.data, "rec", "latest.pkl")

    import jax
    import jax.numpy as jnp
    from profile_step import PROD_RES, _fetch_scalar
    from selfreconcode_tpu.config import parse_file
    from selfreconcode_tpu.data import SceneDataset
    from selfreconcode_tpu.engine.trainer import Trainer, camera_from_bank
    from selfreconcode_tpu.engine.checkpoint import load_checkpoint
    from selfreconcode_tpu.engine import losses as L
    from selfreconcode_tpu.models.deformer import deformer_apply
    from selfreconcode_tpu.models.skinner import skinner_apply
    from selfreconcode_tpu.models.synthetic_body import synthetic_body_model
    from selfreconcode_tpu.ops.rasterize import splat_mask
    from selfreconcode_tpu.utils import meshops

    conf = parse_file(args.conf)
    conds = {"deformer": conf.get_int("mlp_deformer.condlen"),
             "renderer": conf.get_int("render_net.condlen")}
    ds = SceneDataset(args.data, conds)
    tr = Trainer(ds, synthetic_body_model(), conf, PROD_RES,
                 save_root=osp.join(args.data, "rec"), data_root=args.data)
    epoch = load_checkpoint(model, tr)
    cfg = tr.stage_cfg
    state = tr.state
    tmp = state.tmp
    deformer = tr.deformer
    N, H, W, vcap = cfg.N, cfg.H, cfg.W, cfg.vcap
    nv = int(np.asarray(tmp.vert_valid).sum())
    print(f"epoch={epoch} stage={cfg.name} nv={nv} vcap={vcap} "
          f"splat={cfg.splat_cap}x{cfg.splat_cells} N={N}", flush=True)

    fids = jnp.arange(N, dtype=jnp.int32)
    tiny = jax.jit(lambda x: x + 1.0)
    _fetch_scalar(tiny(jnp.zeros(())))
    t0 = time.perf_counter()
    for _ in range(5):
        _fetch_scalar(tiny(jnp.zeros(())))
    rtt = (time.perf_counter() - t0) / 5 * 1e3
    print(f"rtt {rtt:.1f} ms", flush=True)
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

    print(f"[inner pieces @ acceptance state]", flush=True)

    dfn = jax.jit(lambda tp, d, q: deformer_apply(
        tp, d, q, binds, dcond, poses, trans, 0.75)[0])
    bench("deformer fwd", dfn, params["trans"], deformer, flat)
    bench("deformer fwd+vjp", jax.jit(
        lambda tp, d, q: jax.vjp(lambda t_, q_: dfn(t_, d, q_), tp, q)[1](
            cot_nv3)), params["trans"], deformer, flat)

    def_verts = dfn(params["trans"], deformer, flat).reshape(N, vcap, 3)

    def splat_all(dv):
        return jnp.stack([
            splat_mask(cam, dv[i], tmp.vert_valid, cfg.radius,
                       cell_cap=cfg.splat_cap, active_cells=cfg.splat_cells)
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

    bench("mesh regus fwd+bwd", jax.jit(jax.grad(regus)), tmp.verts)

    def defconst(tv):
        flat_ = jnp.tile(tv, (N, 1))
        d_, _ = deformer_apply(params["trans"], deformer, flat_, binds,
                               dcond, poses, trans, 0.75)
        lbs = skinner_apply(deformer.skinner, flat_, binds, poses, trans)
        return L.def_consistency_loss(d_.reshape(N, vcap, 3),
                                      lbs.reshape(N, vcap, 3),
                                      tmp.vert_valid, 0.01)

    bench("def-consistency fwd+bwd", jax.jit(jax.grad(defconst)), tmp.verts)

    step = tr._get_step_fn()
    mgtMs = jnp.zeros((N, H, W))
    bench("inner_pass full", lambda: step.inner_pass(
        state, deformer, fids, mgtMs, jnp.asarray([1.0, 0.75, 1.0])))


if __name__ == "__main__":
    main()
