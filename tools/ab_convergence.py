"""A/B convergence runs for the two defaults that deviate from the reference
(VERDICT r1 next-step #4):

  * point_inits  — vertex-projection ray seeding (fast default) vs fragment
    barycentric seeding (reference FindSurfacePs exact, utils/FindSurfacePs.py:5-29)
  * anchor_sub   — 16384-vertex subsampled sdf-anchor (fast default) vs all
    template verts (reference model/network.py:690-694 exact)

Same scene, same seed, same step count for every variant; reports final
hard-mask IoU (the reference's acceptance metric, infer.py:172-181), final
loss, and converged-ray fraction.  Results go into PARITY.md.

    python tools/ab_convergence.py [--steps 300] [--h 512] [--frames 24]
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


def eval_mask_iou(tr, ds, fids):
    """Hard mesh-render IoU of the CURRENT state on `fids` (infer parity)."""
    import jax.numpy as jnp
    from selfreconcode_tpu.models.deformer import deformer_apply
    from selfreconcode_tpu.ops.rasterize import rasterize_mesh

    tmp = tr.state.tmp
    bank = tr.state.bank
    cam = tr._host_camera()
    ious = []
    for fid in fids:
        f = jnp.asarray([fid])
        dv, _ = deformer_apply(
            tr.state.params["trans"], tr.deformer, tmp.verts,
            jnp.zeros((tmp.verts.shape[0],), jnp.int32),
            bank["cond_deformer"][f], bank["poses"][f], bank["trans"][f], 1.0)
        frags = rasterize_mesh(cam, dv, tmp.faces, tmp.face_valid,
                               tr.stage_cfg.raster_footprint)
        pred = np.asarray(frags.pix_to_face >= 0)
        gt = ds.frame_data(int(fid))["mask"] > 0
        inter = (pred & gt).sum()
        union = (pred | gt).sum()
        ious.append(inter / max(union, 1))
    return float(np.mean(ious))


def run_variant(label, overrides, args, root):
    import jax
    import jax.numpy as jnp
    from selfreconcode_tpu.config import parse_file
    from selfreconcode_tpu.data import SceneDataset, RandomSampler
    from selfreconcode_tpu.engine.trainer import Trainer
    from selfreconcode_tpu.models.synthetic_body import synthetic_body_model

    conf = parse_file(osp.join(osp.dirname(osp.dirname(
        osp.abspath(__file__))), "configs", "config.conf"))
    conds = {"deformer": conf.get_int("mlp_deformer.condlen"),
             "renderer": conf.get_int("render_net.condlen")}
    ds = SceneDataset(root, conds, seed=0)
    smpl = synthetic_body_model()
    tr = Trainer(ds, smpl, conf, PROD_RES, data_root=root)
    sdf_cache = osp.join(root, "initial_sdf_idr_6_1.npz")
    tr.initialize_sdf(1200, cache_path=sdf_cache)
    tr.set_stage(args.stage)
    if overrides:
        tr.override_stage(**overrides)
    tr.preload_frames(verbose=False)

    sampler = RandomSampler(ds.frame_num, seed=123)
    bs = tr.stage_cfg.N
    key = jax.random.PRNGKey(42)
    lr = 1e-4
    t0 = time.time()
    n_done, last_info, ray_acc = 0, {}, []
    while n_done < args.steps:
        ids = sampler.epoch_ids()
        for s in range(0, len(ids) - bs + 1, bs):
            if n_done >= args.steps:
                break
            fids = np.asarray(ids[s:s + bs])
            key, sk = jax.random.split(key)
            info = tr.train_step(fids, None, lr, sk, sync=False)
            last_info = info
            n_done += 1
            if n_done % 50 == 0:
                li = {k: float(v) for k, v in info.items()}
                ray_acc.append(li.get("ray_converged", 0.0))
                print(f"  [{label}] step {n_done}: loss={li['loss']:.4f} "
                      f"rays={li.get('ray_converged', 0):.0f}", flush=True)
    li = {k: float(v) for k, v in last_info.items()}
    dt = time.time() - t0
    eval_fids = np.linspace(0, ds.frame_num - 1, 8).astype(int)
    iou = eval_mask_iou(tr, ds, eval_fids)
    P = tr.stage_cfg.sample_pix * bs
    res = {"label": label, "steps": args.steps, "iou": iou,
           "loss": li["loss"], "ray_frac": li.get("ray_converged", 0) / P,
           "mask_loss": li.get("pc_mask_loss", -1),
           "color_loss": li.get("color_loss", -1), "wall_s": dt}
    print(f"  [{label}] DONE iou={iou:.4f} loss={li['loss']:.4f} "
          f"rayfrac={res['ray_frac']:.3f} wall={dt:.0f}s", flush=True)
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--h", type=int, default=512)
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--stage", default="coarse",
                    choices=["coarse", "medium", "fine"])
    ap.add_argument("--variants", nargs="+",
                    default=["base", "frag_inits", "anchor_full"])
    args = ap.parse_args()

    from selfreconcode_tpu.data.synthetic_subject import make_synthetic_subject

    root = osp.join(tempfile.gettempdir(),
                    f"srtpu_ab_{args.h}_{args.frames}")
    if not osp.isfile(osp.join(root, "camera.npz")):
        print("rendering A/B subject...", flush=True)
        make_synthetic_subject(root, n_frames=args.frames, H=args.h, W=args.h)

    variants = {
        "base": {},                                   # shipped defaults
        "frag_inits": {"point_inits": False},         # reference-exact seeding
        "anchor_full": {"anchor_sub": 0},             # reference-exact anchor
        "cauchy": {"surf_newton": False},             # reference-exact solve
                                                      # (FindSurfacePs.py:114)
        "splat_free": {"splat_cap": 1024,             # lift the certified
                       "splat_cap_max": 4096},        # splat decimation cap
        "ref_exact": {"point_inits": False, "anchor_sub": 0,
                      "surf_newton": False,
                      "splat_cap": 1024, "splat_cap_max": 4096},
    }
    results = []
    for v in args.variants:
        print(f"=== variant {v}: {variants[v]} ===", flush=True)
        results.append(run_variant(v, variants[v], args, root))

    print("\n| variant | IoU | loss | ray_frac | mask_loss | color_loss | s |")
    print("|---|---|---|---|---|---|---|")
    for r in results:
        print(f"| {r['label']} | {r['iou']:.4f} | {r['loss']:.4f} | "
              f"{r['ray_frac']:.3f} | {r['mask_loss']:.4f} | "
              f"{r['color_loss']:.4f} | {r['wall_s']:.0f} |")


if __name__ == "__main__":
    main()
