"""Profile the training step AT the acceptance run's restored state.

Unlike profile_step.py (fresh synthetic scene), this restores a real
checkpoint from an acceptance run (template size, splat caps, conds and
optimizer state all as trained) and times the three jitted passes plus the
pipelined host-loop step — the numbers that actually decide the fine-stage
s/it budget (VERDICT r3 next-#2).

Usage:
    python tools/profile_accept.py [--data /tmp/srtpu_accept]
                                   [--model rec/latest.pkl] [--steps 10]
"""
from __future__ import annotations

import argparse
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np

from profile_step import PROD_RES, _fetch_scalar, timed  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="/tmp/srtpu_accept")
    ap.add_argument("--model", default=None,
                    help="checkpoint (default <data>/rec/latest.pkl)")
    ap.add_argument("--conf", default="configs/config.conf")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--stage", default=None,
                    help="override the checkpoint's stage")
    args = ap.parse_args()
    model = args.model or osp.join(args.data, "rec", "latest.pkl")

    import jax
    import jax.numpy as jnp
    from selfreconcode_tpu.config import parse_file
    from selfreconcode_tpu.data import SceneDataset
    from selfreconcode_tpu.engine.trainer import Trainer
    from selfreconcode_tpu.engine.checkpoint import load_checkpoint
    from selfreconcode_tpu.models.synthetic_body import synthetic_body_model

    print("devices:", jax.devices(), flush=True)
    conf = parse_file(args.conf)
    conds = {"deformer": conf.get_int("mlp_deformer.condlen"),
             "renderer": conf.get_int("render_net.condlen")}
    ds = SceneDataset(args.data, conds)
    tr = Trainer(ds, synthetic_body_model(), conf, PROD_RES,
                 save_root=osp.join(args.data, "rec"), data_root=args.data)
    epoch = load_checkpoint(model, tr)
    if args.stage:
        tr.set_stage(args.stage)
    cfg = tr.stage_cfg
    nv = int(np.asarray(tr.state.tmp.vert_valid).sum())
    nf = int(np.asarray(tr.state.tmp.face_valid).sum())
    print(f"restored epoch={epoch} stage={cfg.name} nv={nv} nf={nf} "
          f"vcap={cfg.vcap} fcap={cfg.fcap} splat_cap={cfg.splat_cap} "
          f"splat_cells={cfg.splat_cells} N={cfg.N} "
          f"rays={cfg.sample_pix}", flush=True)

    t0 = time.time()
    nv, nf = tr.remesh(1.0)
    print(f"remesh {time.time()-t0:.1f}s: {nv} verts {nf} faces "
          f"(caps v{tr.stage_cfg.vcap} f{tr.stage_cfg.fcap} "
          f"splat {tr.stage_cfg.splat_cap}x{tr.stage_cfg.splat_cells})",
          flush=True)

    step = tr._get_step_fn()
    cfg = tr.stage_cfg
    fids = np.arange(cfg.N)
    batch = ds.batch_raw(fids)
    windows = jnp.asarray(ds.window_indices(fids, cfg.window)[0], jnp.int32)
    gtCs = jnp.asarray(batch["img"])
    gtMs = jnp.asarray(batch["mask"])
    gtNs = (jnp.asarray(batch["normal"]) if "normal" in batch
            else jnp.zeros((cfg.N, cfg.H, cfg.W, 3)))
    fids_j = jnp.asarray(fids, jnp.int32)
    ratios = jnp.asarray([1.0, tr.opt_times / 2500.0 + 0.5, 1.0], jnp.float32)
    lr = jnp.asarray(1e-4, jnp.float32)
    key = jax.random.PRNGKey(0)
    state = tr.state
    deformer = tr.deformer

    tiny = jax.jit(lambda x: x + 1.0)
    _fetch_scalar(tiny(jnp.zeros(())))
    t0 = time.perf_counter()
    for _ in range(5):
        _fetch_scalar(tiny(jnp.zeros(())))
    rtt = (time.perf_counter() - t0) / 5 * 1e3
    print(f"\ntunnel RTT ~{rtt:.0f} ms; passes (mean of {args.steps}):",
          flush=True)

    tc = time.time()
    geo = step.geom_pass(state, deformer, gtMs, fids_j, ratios, key)
    _fetch_scalar(geo)
    print(f"  [geom compile {time.time()-tc:.0f}s]")
    timed("geom_pass", lambda: step.geom_pass(
        state, deformer, gtMs, fids_j, ratios, key), args.steps, rtt)
    init_pts, sel_ok, ray_binds, ray_rows, ray_cols, mgtMs, _ovf = geo

    tc = time.time()
    inn = step.inner_pass(state, deformer, fids_j, mgtMs, ratios)
    _fetch_scalar(inn)
    print(f"  [inner compile {time.time()-tc:.0f}s]")
    timed("inner_pass", lambda: step.inner_pass(
        state, deformer, fids_j, mgtMs, ratios), args.steps, rtt)
    new_tmp, g_params_in, g_bank_in, pc_loss_val, masks, pc_info = inn

    tc = time.time()
    out = step.outer_pass(state, deformer, new_tmp, g_params_in, g_bank_in,
                          gtCs, gtNs, fids_j, init_pts, sel_ok, ray_rows,
                          ray_cols, ray_binds, windows, ratios, lr, key)
    _fetch_scalar(out)
    print(f"  [outer compile {time.time()-tc:.0f}s]")
    timed("outer_pass", lambda: step.outer_pass(
        state, deformer, new_tmp, g_params_in, g_bank_in, gtCs, gtNs,
        fids_j, init_pts, sel_ok, ray_rows, ray_cols, ray_binds, windows,
        ratios, lr, key), args.steps, rtt)

    cached = tr.preload_frames(verbose=False)
    print(f"\nfull train_step (pipelined, device cache "
          f"{'ON' if cached else 'off'}):", flush=True)
    tr.state = state
    import jax.random as jrandom
    k = jrandom.PRNGKey(1)
    tr.train_step(fids, batch, 1e-4, k, sync=False)
    t0 = time.perf_counter()
    pending = None
    for i in range(args.steps):
        k, sk = jrandom.split(k)
        if tr.forward_time % cfg.remesh_intersect == 0:
            tr.forward_time += 1
        info = tr.train_step(fids, batch, 1e-4, sk, sync=False)
        if pending is not None:
            float(pending["loss"])
        pending = info
    float(pending["loss"])
    _fetch_scalar(tr.state.params)
    dt = (time.perf_counter() - t0) / args.steps
    print(f"  steady state: {dt*1e3:.0f} ms/step  ({1.0/dt:.2f} steps/s)",
          flush=True)


if __name__ == "__main__":
    main()
