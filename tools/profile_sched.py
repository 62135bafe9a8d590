"""Isolate the scheduled-path slowdown (PERF.md round 4).

The scheduled epoch path (trainer.train_step_scheduled) is semantically
equivalent to the plain step but ran 0.9-3.3 s/it at 1080p acceptance scale
vs 0.24 plain.  This times, at the restored acceptance state:

  1. geom_pass alone (plain, device batch pre-gathered)
  2. sched_geom alone (prologue fused: cache gather + window/ratio/key)
  3. a plain-step loop vs a scheduled loop (pipelined, K steps)

to tell whether the regression is inside the fused geom program (gather
fusion pathology) or in the host loop.

    python tools/profile_sched.py [--data /tmp/srtpu_accept] [--iters 10]
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
    from selfreconcode_tpu.engine.trainer import Trainer
    from selfreconcode_tpu.engine.checkpoint import load_checkpoint
    from selfreconcode_tpu.models.synthetic_body import synthetic_body_model

    conf = parse_file(args.conf)
    conds = {"deformer": conf.get_int("mlp_deformer.condlen"),
             "renderer": conf.get_int("render_net.condlen")}
    ds = SceneDataset(args.data, conds)
    tr = Trainer(ds, synthetic_body_model(), conf, PROD_RES,
                 save_root=osp.join(args.data, "rec"), data_root=args.data)
    epoch = load_checkpoint(model, tr)
    tr.preload_frames(verbose=False)
    cfg = tr.stage_cfg
    N = cfg.N
    print(f"epoch={epoch} stage={cfg.name} N={N}", flush=True)
    K = args.iters

    step = tr._get_step_fn()
    fused = tr._get_fused_fn()
    deformer = tr.deformer

    fids_np = np.arange(N, dtype=np.int32)
    batch = tr._batch_from_cache(fids_np)
    gtMs = batch["mask"]
    fids = jnp.asarray(fids_np)
    ratios = jnp.asarray([1.0, 0.75, 1.0], jnp.float32)
    key = jax.random.PRNGKey(0)

    def bench(label, fn):
        out = fn()
        _fetch_scalar(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).sum())
        t0 = time.perf_counter()
        for _ in range(K):
            out = fn()
        _fetch_scalar(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).sum())
        dt = (time.perf_counter() - t0) * 1e3 / K
        print(f"  {label:<40s} {dt:8.1f} ms", flush=True)

    bench("geom_pass (plain, pre-gathered batch)",
          lambda: step.geom_pass(tr.state, deformer, gtMs, fids, ratios,
                                 key))

    G = K + 4
    sched = np.stack([(fids_np + i) % ds.frame_num for i in range(G)])
    tr.begin_scheduled_epoch(sched.reshape(G, N), 1e-4, key)
    di = tr._di_dev
    bench("sched_geom (prologue fused into geom)",
          lambda: fused.sched_geom(
              tr.state, deformer, di, tr._frame_cache, tr._sched_dev,
              tr._win_dev, tr._lr_dev, tr._rdef_dev, tr._key_ep))

    # pipelined loops (one-step-delayed fetch), K steps each
    tr.begin_scheduled_epoch(sched.reshape(G, N), 1e-4, key)
    tr.forward_time = 1
    info = tr.train_step_scheduled()
    _fetch_scalar(info["loss"])
    t0 = time.perf_counter()
    for _ in range(K):
        info = tr.train_step_scheduled()
    _fetch_scalar(info["loss"])
    print(f"  scheduled loop                       "
          f"{(time.perf_counter() - t0) * 1e3 / K:8.1f} ms/step", flush=True)

    state = tr.state
    windows, _ = ds.window_indices(fids_np, cfg.window)
    lr = jnp.asarray(1e-4, jnp.float32)
    gtCs = batch["img"]
    gtNs = batch.get("normal", jnp.zeros((N, cfg.H, cfg.W, 3)))
    win_j = jnp.asarray(windows, jnp.int32)
    state, info = step(state, gtCs, gtMs, gtNs, fids, win_j, ratios, lr, key)
    _fetch_scalar(info["loss"])
    t0 = time.perf_counter()
    for _ in range(K):
        state, info = step(state, gtCs, gtMs, gtNs, fids, win_j, ratios,
                           lr, key)
    _fetch_scalar(info["loss"])
    print(f"  plain step loop (pre-staged args)    "
          f"{(time.perf_counter() - t0) * 1e3 / K:8.1f} ms/step", flush=True)


if __name__ == "__main__":
    main()
