"""Full-schedule deviation A/B at the TRAINED state (VERDICT r4 next #2).

ab_convergence.py certifies the shipped speed deviations (Newton surface
solve, point-based ray seeding, splat decimation, anchor subsample) on a
300-step COARSE run from scratch — which cannot clear them for the medium and
fine stages where the acceptance metric is actually earned.  This tool loads
a real acceptance-run stage checkpoint (coarse.pkl / medium.pkl, written at
the stage boundaries exactly like the reference's train.py:152,157) and runs
N epochs of the NEXT stage twice: once with the shipped defaults, once with
the reference-exact settings (fragment seeding FindSurfacePs.py:5-29, Cauchy
solve FindSurfacePs.py:114-163, undecimated splat CameraMine.py:266-304,
full-template anchor network.py:690-694) — same schedule, same RNG, same
frames.  Reports hard mesh-render mask-IoU on spaced frames (the errors.txt
metric, infer.py:172-181) plus the loss telemetry, for the PARITY.md table.

    python tools/ab_stage_resume.py --root /tmp/srtpu_accept \
        --ckpt medium.pkl --stage fine --epochs 2 [--variants base ref_exact]
"""
from __future__ import annotations

import argparse
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np

from ab_convergence import eval_mask_iou, PROD_RES

VARIANTS = {
    "base": {},                                   # shipped defaults
    "ref_exact": {"point_inits": False, "anchor_sub": 0,
                  "surf_newton": False,
                  "splat_cap": 1024, "splat_cap_max": 4096},
    "frag_inits": {"point_inits": False},
    "cauchy": {"surf_newton": False},
    "splat_free": {"splat_cap": 1024, "splat_cap_max": 4096},
    "anchor_full": {"anchor_sub": 0},
}


def run_variant(label, overrides, args):
    import jax
    from selfreconcode_tpu.config import parse_file
    from selfreconcode_tpu.data import SceneDataset, RandomSampler
    from selfreconcode_tpu.engine.trainer import Trainer
    from selfreconcode_tpu.engine.checkpoint import load_checkpoint
    from selfreconcode_tpu.models.synthetic_body import synthetic_body_model

    conf = parse_file(osp.join(args.root, "rec", "config.conf"))
    conds = {"deformer": conf.get_int("mlp_deformer.condlen"),
             "renderer": conf.get_int("render_net.condlen")}
    ds = SceneDataset(args.root, conds, seed=0)
    tr = Trainer(ds, synthetic_body_model(), conf, PROD_RES,
                 data_root=args.root)
    epoch0 = load_checkpoint(osp.join(args.root, "rec", args.ckpt), tr)
    if tr.stage_cfg is None or tr.stage_cfg.name != args.stage:
        tr.set_stage(args.stage)
    if overrides:
        tr.override_stage(**overrides)
    tr.preload_frames(verbose=False)
    print(f"[{label}] resumed {args.ckpt} (epoch {epoch0}) -> stage "
          f"{args.stage} overrides={overrides}", flush=True)

    bs = tr.stage_cfg.N
    lr_conf = conf.get_float("train.learning_rate")
    milestones = [int(m) for m in conf.get_list("train.scheduler.milestones")]
    factor = conf.get_float("train.scheduler.factor")
    key = jax.random.PRNGKey(42)
    t0 = time.time()
    last_info, n_done = {}, 0
    for ep in range(epoch0, epoch0 + args.epochs):
        lr = lr_conf * (factor ** sum(1 for m in milestones if ep >= m))
        sampler = RandomSampler(ds.frame_num, seed=123 + ep)
        ids = sampler.epoch_ids()
        for s in range(0, len(ids) - bs + 1, bs):
            fids = np.asarray(ids[s:s + bs])
            key, sk = jax.random.split(key)
            last_info = tr.train_step(fids, None, lr, sk, sync=False)
            n_done += 1
            if n_done % 100 == 0:
                li = {k: float(v) for k, v in
                      jax.device_get(last_info).items()}
                print(f"  [{label}] step {n_done}: loss={li['loss']:.4f} "
                      f"mask={li.get('pc_mask_loss', -1):.4f} "
                      f"rays={li.get('ray_converged', 0):.0f}", flush=True)
    li = {k: float(v) for k, v in jax.device_get(last_info).items()}
    dt = time.time() - t0
    eval_fids = np.linspace(0, ds.frame_num - 1, args.eval_frames).astype(int)
    iou = eval_mask_iou(tr, ds, eval_fids)
    wpix = tr.stage_cfg.weights.sample_pix_num
    P = (tr.stage_cfg.sample_pix if wpix == 0 else wpix) * bs
    res = {"label": label, "steps": n_done, "maskE": 1.0 - iou,
           "loss": li.get("loss", -1),
           "ray_frac": li.get("ray_converged", 0) / P,
           "mask_loss": li.get("pc_mask_loss", -1),
           "color_loss": li.get("color_loss", -1),
           "s_per_it": dt / max(n_done, 1), "wall_s": dt}
    print(f"  [{label}] DONE maskE={res['maskE']:.4f} "
          f"loss={res['loss']:.4f} {res['s_per_it']:.3f} s/it", flush=True)
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/srtpu_accept")
    ap.add_argument("--ckpt", default="medium.pkl")
    ap.add_argument("--stage", default="fine",
                    choices=["coarse", "medium", "fine"])
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--eval-frames", type=int, default=8)
    ap.add_argument("--variants", nargs="+", default=["base", "ref_exact"])
    args = ap.parse_args()

    results = [run_variant(v, VARIANTS[v], args) for v in args.variants]
    print(f"\nA/B from {args.ckpt} -> {args.epochs} {args.stage} epochs")
    print("| variant | maskE | loss | ray_frac | mask_loss | color_loss "
          "| s/it |")
    print("|---|---|---|---|---|---|---|")
    for r in results:
        print(f"| {r['label']} | {r['maskE']:.4f} | {r['loss']:.4f} | "
              f"{r['ray_frac']:.3f} | {r['mask_loss']:.4f} | "
              f"{r['color_loss']:.4f} | {r['s_per_it']:.3f} |")


if __name__ == "__main__":
    main()
