"""Splat cost + exactness vs cell cap, at REAL production density.

Loads an acceptance-run checkpoint (template + deformer + camera + gt mask),
deforms the template for one frame, and for each cap measures (a) fwd and
fwd+bwd wall time of the splat, (b) mask / IoU-loss / vertex-gradient error
vs the exact (occupancy-sized) cap.  This is the measurement behind the
splat-cap policy: the mask saturates (1 - exp(sum log(1-w))) wherever many
splats overlap, so a capped cell table with even-stride retention should be
near-exact — verify it HERE, on real data, not by argument.
(VERDICT r2 #2: "A/B mask-IoU vs the exact path at production density".)

Multi-frame certification (VERDICT r4 next #7): --fids takes several frame
ids (default: 8 spaced over the sequence) and the summary reports the
WORST-case mask delta / grad cosine across them; --focal-scale > 1 zooms the
camera in, raising per-cell splat density beyond the acceptance scene's
(the loose-cloth / dense-silhouette proxy).

Usage: python tools/bench_splat.py [--root /tmp/srtpu_accept]
           [--fids 0 56 112 ...] [--focal-scale 1.0]
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
    ap.add_argument("--fids", type=int, nargs="+", default=None,
                    help="frames to certify (default: 8 spaced)")
    ap.add_argument("--caps", type=int, nargs="+",
                    default=[64, 256, 512, 1152])
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--focal-scale", type=float, default=1.0,
                    help=">1 zooms in: higher per-cell splat density "
                         "(dense-silhouette stress, loose-cloth proxy)")
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
    cam = Camera(focal=bankc["focal_length"] * args.focal_scale,
                 principal=bankc["princeple_points"],
                 R=quat2mat(bankc["cam2world_coord_quat"].reshape(1, 4))[0],
                 T=bankc["world2cam_coord_trans"], H=H, W=W)
    fids = args.fids or np.linspace(0, ds.frame_num - 1, 8).astype(int).tolist()
    vcap = state.tmp.verts.shape[0]
    binds = jnp.zeros((vcap,), jnp.int32)
    pvalid = state.tmp.vert_valid
    r_px = int(np.round(cfg.radius / 2.0 * float(min(H, W)) / 1.2))
    print(f"template verts(valid)={int(np.asarray(pvalid).sum())}/{vcap}, "
          f"radius={cfg.radius} ({cfg.radius * W / 2:.2f}px), stage "
          f"{cfg.name}, focal x{args.focal_scale}, frames {fids}")

    def timeit(f, *xs):
        out = f(*xs)  # compile
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[:1]
        t0 = time.time()
        for _i in range(args.iters):
            out = f(*xs)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[:1]
        return (time.time() - t0) / args.iters * 1e3, out

    exact = max(args.caps)
    worst = {cap: {"dm": 0.0, "cos": 1.0, "rel": 0.0, "dl": 0.0, "fid": -1}
             for cap in args.caps}
    # deformer passed as an ARGUMENT: closure-capturing it in a fresh jit
    # inlines the skinner volume as an HLO constant and the remote compile
    # request 413s (PERF.md round 4, hard-won rule)
    deform = jax.jit(lambda f, dfm: deformer_apply(
        state.params["trans"], dfm, state.tmp.verts, binds,
        state.bank["cond_deformer"][f][None],
        state.bank["poses"][f][None], state.bank["trans"][f][None], 1.0)[0])
    fwd = {cap: jax.jit(lambda v, c=cap: splat_mask(
        cam, v, pvalid, cfg.radius, cell_cap=c, return_overflow=True))
        for cap in args.caps}

    def _loss(v, gtp, c):
        m, _ = splat_mask(cam, v, pvalid, cfg.radius, cell_cap=c,
                          return_overflow=True)
        return L.iou_mask_loss(m[None], gtp[None])

    # one jitted value_and_grad per cap, shared across frames (gt is an arg)
    vgs = {cap: jax.jit(jax.value_and_grad(
        lambda v, gtp, c=cap: _loss(v, gtp, c))) for cap in args.caps}

    for fi, fid in enumerate(fids):
        dverts = deform(jnp.asarray(fid, jnp.int32), tr.deformer)
        gt = jnp.asarray(ds.frame_data(int(fid))["mask"].astype(np.float32))
        gt_pooled = max_pool_mask(gt[None], r_px)[0]
        results = {}
        for cap in args.caps:
            vg = vgs[cap]
            t_f, (mask, st) = timeit(fwd[cap], dverts) if fi == 0 else \
                (0.0, fwd[cap](dverts))
            t_g, (lv, grad) = timeit(vg, dverts, gt_pooled) if fi == 0 else \
                (0.0, vg(dverts, gt_pooled))
            st = np.asarray(st)
            results[cap] = (np.asarray(mask), float(lv), np.asarray(grad))
            if fi == 0:
                print(f"cap {cap:5d}: fwd {t_f:7.2f} ms  fwd+bwd {t_g:7.2f} "
                      f"ms  dropped={st[0]:8d} max_occ={st[1]:5d} "
                      f"loss={float(lv):.6f}", flush=True)

        m_e, l_e, g_e = results[exact]
        gn = np.linalg.norm(g_e)
        print(f"frame {fid} vs exact (cap {exact}):")
        for cap in args.caps:
            if cap == exact:
                continue
            m, lv, g = results[cap]
            dm = float(np.abs(m - m_e).max())
            dg = np.linalg.norm(g - g_e)
            rel = float(dg / max(gn, 1e-12))
            cos = float((g * g_e).sum() / max(np.linalg.norm(g) * gn, 1e-12))
            dl = float(lv - l_e)
            print(f"  cap {cap:5d}: mask max|d|={dm:.4f} loss d={dl:+.6f} "
                  f"grad rel-l2={rel:.4f} cos={cos:.6f}", flush=True)
            w = worst[cap]
            if cos < w["cos"]:
                w.update(cos=cos, fid=fid)
            w["dm"] = max(w["dm"], dm)
            w["rel"] = max(w["rel"], rel)
            w["dl"] = max(w["dl"], abs(dl))

    print(f"\nWORST CASE over {len(fids)} frames (focal x{args.focal_scale}):")
    for cap in args.caps:
        if cap == exact:
            continue
        w = worst[cap]
        print(f"cap {cap:5d}: mask max|d|={w['dm']:.4f} |loss d|={w['dl']:.6f}"
              f" grad rel-l2={w['rel']:.4f} min cos={w['cos']:.6f} "
              f"(frame {w['fid']})", flush=True)


if __name__ == "__main__":
    main()
