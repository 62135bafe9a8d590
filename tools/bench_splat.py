"""Splat cost + exactness vs cell cap, at REAL production density.

Loads an acceptance-run checkpoint (template + deformer + camera + gt mask),
deforms the template for one frame, and for each cap measures (a) fwd and
fwd+bwd wall time of the splat, (b) mask / IoU-loss / vertex-gradient error
vs the exact (occupancy-sized) cap.  This is the measurement behind the
splat-cap policy: the mask saturates (1 - exp(sum log(1-w))) wherever many
splats overlap, so a capped cell table with even-stride retention should be
near-exact — verify it HERE, on real data, not by argument.
(VERDICT r2 #2: "A/B mask-IoU vs the exact path at production density".)

Usage: python tools/bench_splat.py [--root /tmp/srtpu_accept] [--fid 0]
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
    ap.add_argument("--root", default="/tmp/srtpu_accept")
    ap.add_argument("--fid", type=int, default=0)
    ap.add_argument("--caps", type=int, nargs="+",
                    default=[64, 256, 512, 1152])
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from selfreconcode_tpu.config import parse_file
    from selfreconcode_tpu.data import SceneDataset
    from selfreconcode_tpu.engine.trainer import Trainer
    from selfreconcode_tpu.engine.checkpoint import load_checkpoint
    from selfreconcode_tpu.engine import losses as L
    from selfreconcode_tpu.engine.losses import max_pool_mask
    from selfreconcode_tpu.models.synthetic_body import synthetic_body_model
    from selfreconcode_tpu.models.deformer import deformer_apply
    from selfreconcode_tpu.render.camera import Camera
    from selfreconcode_tpu.ops.rasterize import splat_mask
    from selfreconcode_tpu.utils.math import quat2mat
    from selfreconcode_tpu.cli.train import RESOLUTIONS

    conf = parse_file(osp.join(args.root, "rec", "config.conf"))
    conds = {"deformer": conf.get_int("mlp_deformer.condlen"),
             "renderer": conf.get_int("render_net.condlen")}
    ds = SceneDataset(args.root, conds)
    tr = Trainer(ds, synthetic_body_model(), conf, RESOLUTIONS,
                 data_root=args.root)
    load_checkpoint(osp.join(args.root, "rec", "latest.pkl"), tr)
    cfg = tr.stage_cfg
    state = tr.state
    H, W = ds.H, ds.W
    bankc = state.bank["camera"]
    cam = Camera(focal=bankc["focal_length"],
                 principal=bankc["princeple_points"],
                 R=quat2mat(bankc["cam2world_coord_quat"].reshape(1, 4))[0],
                 T=bankc["world2cam_coord_trans"], H=H, W=W)
    fid = args.fid
    vcap = state.tmp.verts.shape[0]
    binds = jnp.zeros((vcap,), jnp.int32)
    dverts, _ = deformer_apply(
        state.params["trans"], tr.deformer, state.tmp.verts, binds,
        state.bank["cond_deformer"][fid][None],
        state.bank["poses"][fid][None], state.bank["trans"][fid][None], 1.0)
    pvalid = state.tmp.vert_valid
    gt = jnp.asarray(ds.frame_data(fid)["mask"].astype(np.float32))
    r_px = int(np.round(cfg.radius / 2.0 * float(min(H, W)) / 1.2))
    gt_pooled = max_pool_mask(gt[None], r_px)[0]
    print(f"template verts(valid)={int(np.asarray(pvalid).sum())}/{vcap}, "
          f"radius={cfg.radius} ({cfg.radius * W / 2:.2f}px), stage "
          f"{cfg.name}")

    def timeit(f, *xs):
        out = f(*xs)  # compile
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[:1]
        t0 = time.time()
        for _i in range(args.iters):
            out = f(*xs)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[:1]
        return (time.time() - t0) / args.iters * 1e3, out

    results = {}
    for cap in args.caps:
        fwd = jax.jit(lambda v, c=cap: splat_mask(
            cam, v, pvalid, cfg.radius, cell_cap=c, return_overflow=True))

        def loss(v, c=cap):
            m, _ = splat_mask(cam, v, pvalid, cfg.radius, cell_cap=c,
                              return_overflow=True)
            return L.iou_mask_loss(m[None], gt_pooled[None])

        vg = jax.jit(jax.value_and_grad(loss))
        t_f, (mask, st) = timeit(fwd, dverts)
        t_g, (lv, grad) = timeit(vg, dverts)
        st = np.asarray(st)
        results[cap] = (np.asarray(mask), float(lv), np.asarray(grad))
        print(f"cap {cap:5d}: fwd {t_f:7.2f} ms  fwd+bwd {t_g:7.2f} ms  "
              f"dropped={st[0]:8d} max_occ={st[1]:5d} loss={lv:.6f}",
              flush=True)

    exact = max(args.caps)
    m_e, l_e, g_e = results[exact]
    gn = np.linalg.norm(g_e)
    print(f"\nvs exact (cap {exact}):")
    for cap in args.caps:
        if cap == exact:
            continue
        m, lv, g = results[cap]
        dm = np.abs(m - m_e)
        dg = np.linalg.norm(g - g_e)
        cos = float((g * g_e).sum() / max(np.linalg.norm(g) * gn, 1e-12))
        print(f"cap {cap:5d}: mask max|d|={dm.max():.4f} "
              f"mean|d|={dm.mean():.6f} px>.01={int((dm > 0.01).sum())} "
              f"loss d={lv - l_e:+.6f} grad rel-l2={dg / max(gn, 1e-12):.4f} "
              f"cos={cos:.6f}")


if __name__ == "__main__":
    main()
