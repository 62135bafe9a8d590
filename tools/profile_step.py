"""Production-scale training-step profiler.

Builds the synthetic trainer at a configurable scale (default: the
production-coarse setting used for PERF.md — 1080x1080, N=3, coarse octree
resolutions, ~225k-vert toy-SMPL template) and times the three jitted passes
plus the pipelined full step on the attached device.

Usage:
    python tools/profile_step.py [--h 1080] [--n 3] [--stage coarse]
                                 [--steps 10] [--small]
"""
from __future__ import annotations

import argparse
import os
import os.path as osp
import sys
import tempfile
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np


PROD_RES = {
    "coarse": [(15, 21, 9), (29, 41, 17), (57, 81, 33), (113, 161, 65),
               (225, 321, 129)],
    "medium": [(19, 25, 13), (37, 49, 25), (73, 97, 49), (145, 193, 97),
               (289, 385, 193)],
    "fine": [(21, 27, 15), (41, 53, 29), (81, 105, 57), (161, 209, 113),
             (321, 417, 225)],
}
SMALL_RES = {k: [(17, 17, 17), (33, 33, 33), (65, 65, 65)]
             for k in ("coarse", "medium", "fine")}


def _fetch_scalar(out):
    """Force real device sync: pull one scalar element to the host.

    On the axon remote-TPU tunnel, jax.block_until_ready returns before the
    computation actually finishes; only a value transfer round-trips.  The
    device queue is in-order, so fetching from the LAST output waits for
    every queued execution before it."""
    import jax
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf.reshape(-1)[:1])


def timed(label, fn, n, rtt_ms=0.0):
    _fetch_scalar(fn())  # warmup (compile) + sync
    t0 = time.perf_counter()
    out = None
    for _ in range(n):
        out = fn()        # queue n executions back-to-back
    _fetch_scalar(out)    # one sync at the end
    dt = ((time.perf_counter() - t0) * 1e3 - rtt_ms) / n
    print(f"  {label:<28s} {dt:9.1f} ms", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=1080)
    ap.add_argument("--n", type=int, default=3, help="frame batch")
    ap.add_argument("--stage", default="coarse")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--small", action="store_true",
                    help="small octree resolutions (faster remesh/compile)")
    ap.add_argument("--rays", type=int, default=None,
                    help="override sample_pix per frame")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from selfreconcode_tpu.engine.trainer import build_synthetic_trainer

    print("devices:", jax.devices(), flush=True)
    root = osp.join(tempfile.gettempdir(), f"srtpu_prof_{args.h}")
    os.makedirs(root, exist_ok=True)
    res = SMALL_RES if args.small else PROD_RES
    t0 = time.time()
    tr, ds = build_synthetic_trainer(root, n_frames=32, H=args.h, W=args.h,
                                     resolutions=res)
    tr.set_stage(args.stage)
    if tr.stage_cfg.N != args.n:
        tr.override_stage(N=args.n)
    if args.rays:
        tr.override_stage(sample_pix=args.rays)
    print(f"setup {time.time()-t0:.1f}s; stage={args.stage} "
          f"H={args.h} N={tr.stage_cfg.N} rays={tr.stage_cfg.sample_pix}",
          flush=True)

    t0 = time.time()
    nv, nf = tr.remesh(1.0)
    print(f"remesh {time.time()-t0:.1f}s: {nv} verts {nf} faces "
          f"(caps v{tr.stage_cfg.vcap} f{tr.stage_cfg.fcap})", flush=True)

    step = tr._get_step_fn()
    cfg = tr.stage_cfg
    fids = np.arange(cfg.N)
    batch = ds.batch_raw(fids)
    windows = jnp.asarray(ds.window_indices(fids, cfg.window)[0], jnp.int32)
    gtCs = jnp.asarray(batch["img"])
    gtMs = jnp.asarray(batch["mask"])
    gtNs = jnp.zeros((cfg.N, cfg.H, cfg.W, 3))
    fids_j = jnp.asarray(fids, jnp.int32)
    ratios = jnp.asarray([1.0, 0.5, 1.0], jnp.float32)
    lr = jnp.asarray(1e-4, jnp.float32)
    key = jax.random.PRNGKey(0)
    state = tr.state
    deformer = tr.deformer

    # measure the tunnel round-trip first (subtracted from every timing)
    tiny = jax.jit(lambda x: x + 1.0)
    _fetch_scalar(tiny(jnp.zeros(())))
    t0 = time.perf_counter()
    for _ in range(5):
        _fetch_scalar(tiny(jnp.zeros(())))
    rtt = (time.perf_counter() - t0) / 5 * 1e3
    print(f"\ntunnel RTT ~{rtt:.0f} ms; passes (mean of {args.steps}, "
          f"queued + single fetch):", flush=True)

    t_compile0 = time.time()
    geo = step.geom_pass(state, deformer, gtMs, fids_j, ratios, key)
    _fetch_scalar(geo)
    print(f"  [geom compile {time.time()-t_compile0:.0f}s]")
    d_geom = timed("geom_pass", lambda: step.geom_pass(
        state, deformer, gtMs, fids_j, ratios, key), args.steps, rtt)
    init_pts, sel_ok, ray_binds, ray_rows, ray_cols, mgtMs, _ovf = geo

    t_compile0 = time.time()
    inn = step.inner_pass(state, deformer, fids_j, mgtMs, ratios)
    _fetch_scalar(inn)
    print(f"  [inner compile {time.time()-t_compile0:.0f}s]")
    d_inner = timed("inner_pass", lambda: step.inner_pass(
        state, deformer, fids_j, mgtMs, ratios), args.steps, rtt)
    new_tmp, g_params_in, g_bank_in, pc_loss_val, masks, pc_info = inn

    t_compile0 = time.time()
    out = step.outer_pass(state, deformer, new_tmp, g_params_in, g_bank_in,
                          gtCs, gtNs, fids_j, init_pts, sel_ok, ray_rows,
                          ray_cols, ray_binds, windows, ratios, lr, key)
    _fetch_scalar(out)
    print(f"  [outer compile {time.time()-t_compile0:.0f}s]")
    d_outer = timed("outer_pass", lambda: step.outer_pass(
        state, deformer, new_tmp, g_params_in, g_bank_in, gtCs, gtNs,
        fids_j, init_pts, sel_ok, ray_rows, ray_cols, ray_binds, windows,
        ratios, lr, key), args.steps, rtt)

    print(f"  sum of passes               {d_geom+d_inner+d_outer:9.1f} ms")

    # full host-loop step, pipelined (one-step-delayed fetch)
    cached = tr.preload_frames(verbose=False)
    print(f"\nfull train_step (pipelined host loop, device cache "
          f"{'ON' if cached else 'off'}):", flush=True)
    tr.state = state
    import jax.random as jrandom
    k = jrandom.PRNGKey(1)
    # warm (includes any remesh-tick)
    tr.train_step(fids, batch, 1e-4, k, sync=False)
    t0 = time.perf_counter()
    pending = None
    nsteps = args.steps
    for i in range(nsteps):
        k, sk = jrandom.split(k)
        if tr.forward_time % cfg.remesh_intersect == 0:
            tr.forward_time += 1  # skip remesh ticks when profiling
        info = tr.train_step(fids, batch, 1e-4, sk, sync=False)
        if pending is not None:
            float(pending["loss"])
        pending = info
    float(pending["loss"])
    jax.block_until_ready(tr.state.params)
    dt = (time.perf_counter() - t0) / nsteps
    print(f"  steady state: {dt*1e3:.0f} ms/step  ({1.0/dt:.2f} steps/s)")


if __name__ == "__main__":
    main()
