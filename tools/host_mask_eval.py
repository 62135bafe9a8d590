"""Host-exact silhouette evaluation for an acceptance run.

Round-5 finding: `make_synthetic_subject` rendered its gt masks through
`rasterize_mesh` with a footprint (=cell size) of 64 px derived from the
template's LONGEST edge, which routes to the XLA fallback with the default
cell_cap=48 — hundreds of candidate faces per 64px cell, so the cap silently
dropped most of them (`frags.overflow` was never checked) and every mask is
speckled with triangle-shaped holes (~35% of the true silhouette is missing).
Training against those masks floors the splat IoU-loss at ~0.16 and the
errors.txt maskE at ~0.65 regardless of how good the surface is.

This tool removes the corrupted gt from the measurement WITHOUT re-running
anything on the device:

1. re-derives the subject's TRUE silhouette per frame with an exact numpy
   coverage fill (projection via the repo's own `transform_points_screen` on
   CPU jax; inclusive barycentric test, winding-agnostic) -> masks_clean/;
2. rasterizes the trained model's deformed template (rec/meshs/%d.npy, the
   checkpoint's template faces, the TRAINED camera) the same exact way;
3. writes reference-format errors (infer.py:172-181) against the clean gt ->
   errors_clean.txt, plus the gt-corruption stats and the pred-vs-dirty
   maskE as a cross-check against the published errors.txt.

Usage: python tools/host_mask_eval.py [--root /tmp/srtpu_accept]
           [--frames -1] [--out reports]
"""
from __future__ import annotations

import argparse
import os
import os.path as osp
import pickle
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def coverage_fill(xy: np.ndarray, faces: np.ndarray, H: int, W: int
                  ) -> np.ndarray:
    """Exact union-coverage of projected triangles over pixel centers.

    xy: (V,2) float (col,row) screen coords; inclusive edge test (>=), both
    windings accepted — silhouette coverage needs no z or facing.
    """
    p = xy[faces]                                   # (F,3,2)
    mn = np.floor(p.min(1)).astype(np.int64)        # (F,2) col,row
    mx = np.ceil(p.max(1)).astype(np.int64)
    ext = (mx - mn).max(1)                          # (F,)
    on = ((mx[:, 0] >= 0) & (mn[:, 0] <= W - 1)
          & (mx[:, 1] >= 0) & (mn[:, 1] <= H - 1))
    mask = np.zeros(H * W, np.bool_)
    done = np.zeros(faces.shape[0], np.bool_)
    for w in (4, 8, 16, 32, 64, 128, 256):
        sel = on & ~done & (ext < w)
        done |= sel
        if not sel.any():
            continue
        (fsel,) = np.nonzero(sel)
        # bound the (S, w, w) working set (~7 float64 temporaries): chunk S
        step = max(1, int(3e7) // (w * w))
        for lo in range(0, fsel.size, step):
            fs = fsel[lo:lo + step]
            t = p[fs].astype(np.float32)            # (S,3,2)
            base = np.stack([np.clip(mn[fs, 0], 0, max(W - w, 0)),
                             np.clip(mn[fs, 1], 0, max(H - w, 0))], 1)
            d = np.arange(w)
            X = (base[:, 0, None, None] + d[None, None, :]).astype(np.float32)
            Y = (base[:, 1, None, None] + d[None, :, None]).astype(np.float32)
            ax, ay = t[:, 0, 0, None, None], t[:, 0, 1, None, None]
            bx, by = t[:, 1, 0, None, None], t[:, 1, 1, None, None]
            cx, cy = t[:, 2, 0, None, None], t[:, 2, 1, None, None]
            w0 = (cx - bx) * (Y - by) - (cy - by) * (X - bx)
            w1 = (ax - cx) * (Y - cy) - (ay - cy) * (X - cx)
            w2 = (bx - ax) * (Y - ay) - (by - ay) * (X - ax)
            area = ((bx - ax) * (cy - ay) - (by - ay) * (cx - ax))
            s = np.where(area >= 0, np.float32(1.0), np.float32(-1.0))
            inside = ((w0 * s >= 0) & (w1 * s >= 0) & (w2 * s >= 0)
                      & (np.abs(area) > 1e-12))
            Xi = np.broadcast_to(base[:, 0, None, None] + d[None, None, :],
                                 inside.shape)
            Yi = np.broadcast_to(base[:, 1, None, None] + d[None, :, None],
                                 inside.shape)
            ok = inside & (Xi >= 0) & (Xi < W) & (Yi >= 0) & (Yi < H)
            mask[(Yi[ok] * W + Xi[ok])] = True
        if done.all():
            break
    assert done[on].all(), f"triangle bbox exceeded 256px: {ext[on].max()}"
    return mask.reshape(H, W)


def iou(a: np.ndarray, b: np.ndarray) -> float:
    inter = float((a & b).sum())
    union = float((a | b).sum())
    return inter / max(union, 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/srtpu_accept")
    ap.add_argument("--rec", default="rec")
    ap.add_argument("--frames", type=int, default=-1)
    ap.add_argument("--out", default=None,
                    help="dir for errors_clean.txt (default: repo reports/)")
    ap.add_argument("--masks-only", action="store_true",
                    help="only (re)generate masks_clean/, skip the pred eval "
                         "(the honest errors come from re-running infer.py "
                         "against masks_clean — see tools/phase2 notes)")
    args = ap.parse_args()
    out_dir = args.out or osp.join(
        osp.dirname(osp.dirname(osp.abspath(__file__))), "reports")
    os.makedirs(out_dir, exist_ok=True)

    import cv2
    import jax.numpy as jnp
    from selfreconcode_tpu.models.synthetic_body import synthetic_body_model
    from selfreconcode_tpu.models.smpl import smpl_forward, SMPLModel
    from selfreconcode_tpu.data.synthetic_subject import clothing_offsets
    from selfreconcode_tpu.render.camera import (make_camera,
                                                 transform_points_screen)
    from selfreconcode_tpu.utils.meshops import vertex_normals
    from selfreconcode_tpu.utils.math import quat2mat

    root = args.root
    camz = np.load(osp.join(root, "camera.npz"))
    H = W = int(2 * float(camz["cx"]))
    rec = np.load(osp.join(root, "smpl_rec.npz"))
    poses, trans = rec["poses"], rec["trans"]
    n_frames = poses.shape[0] if args.frames < 0 else min(args.frames,
                                                          poses.shape[0])

    # -- the subject's true clothed template (must match gt_mesh.npz) ------
    body = synthetic_body_model()
    verts0 = np.asarray(body.v_template)
    faces_gt = np.asarray(body.faces)
    fv = jnp.ones((faces_gt.shape[0],), bool)
    vn0 = np.asarray(vertex_normals(jnp.asarray(verts0),
                                    jnp.asarray(faces_gt), fv))
    cloth = clothing_offsets(verts0, vn0, seed=0)
    gtm = np.load(osp.join(root, "gt_mesh.npz"))
    assert np.allclose(verts0 + cloth, gtm["verts"], atol=1e-5), \
        "re-derived clothed template != gt_mesh.npz (seed/params drift)"
    clothed = SMPLModel(
        v_template=jnp.asarray(verts0 + cloth), shapedirs=body.shapedirs,
        posedirs=body.posedirs, j_regressor=body.j_regressor,
        weights=body.weights, faces=body.faces, parents=body.parents)
    cam_gt = make_camera(np.array([camz["fx"], camz["fy"]], np.float32),
                         np.array([camz["cx"], camz["cy"]], np.float32),
                         camz["quat"], camz["T"], H, W)

    # -- trained model: template faces + trained camera --------------------
    if args.masks_only:
        clean_dir = osp.join(root, "masks_clean")
        os.makedirs(clean_dir, exist_ok=True)
        import time
        cov = []
        t0 = time.time()
        for fid in range(n_frames):
            cpath = osp.join(clean_dir, "%d.png" % fid)
            if osp.isfile(cpath):
                continue
            v = np.asarray(smpl_forward(clothed, jnp.zeros((1, 10)),
                                        jnp.asarray(poses[fid]).reshape(
                                            1, 24, 3))[0][0]) + trans[fid]
            xy = np.asarray(transform_points_screen(
                cam_gt, jnp.asarray(v)))[:, :2]
            clean = coverage_fill(xy, faces_gt, H, W)
            cv2.imwrite(cpath, clean.astype(np.uint8) * 255)
            dirty = cv2.imread(osp.join(root, "masks/%d.png" % fid),
                               cv2.IMREAD_GRAYSCALE) > 0
            cov.append(iou(dirty & clean, clean))
            if fid % 20 == 0:
                print(f"masks_clean {fid}/{n_frames} "
                      f"gt_holes={1 - cov[-1]:.3f} "
                      f"({(time.time() - t0) / max(fid, 1):.2f} s/frame)",
                      flush=True)
        if cov:
            print("dirty-gt hole fraction: mean %.3f" % (1 - np.mean(cov)))
        return

    with open(osp.join(root, args.rec, "latest.pkl"), "rb") as f:
        ck = pickle.load(f)
    tmp = ck["tmp"]
    fvalid = np.asarray(tmp.face_valid if hasattr(tmp, "face_valid")
                        else tmp["face_valid"])
    faces_pred = np.asarray(tmp.faces if hasattr(tmp, "faces")
                            else tmp["faces"])[fvalid]
    camd = ck["bank"]["camera"]
    cam_tr = make_camera(np.asarray(camd["focal_length"]),
                         np.asarray(camd["princeple_points"]),
                         np.asarray(camd["cam2world_coord_quat"]),
                         np.asarray(camd["world2cam_coord_trans"]), H, W)

    clean_dir = osp.join(root, "masks_clean")
    os.makedirs(clean_dir, exist_ok=True)

    es_clean = -1.0 * np.ones(poses.shape[0])
    es_dirty = -1.0 * np.ones(poses.shape[0])
    gt_cov = []     # dirty-mask coverage of the true silhouette
    for fid in range(n_frames):
        cpath = osp.join(clean_dir, "%d.png" % fid)
        if osp.isfile(cpath):
            clean = cv2.imread(cpath, cv2.IMREAD_GRAYSCALE) > 0
        else:
            v = np.asarray(smpl_forward(clothed, jnp.zeros((1, 10)),
                                        jnp.asarray(poses[fid]).reshape(
                                            1, 24, 3))[0][0]) + trans[fid]
            xy = np.asarray(transform_points_screen(
                cam_gt, jnp.asarray(v)))[:, :2]
            clean = coverage_fill(xy, faces_gt, H, W)
            cv2.imwrite(cpath, clean.astype(np.uint8) * 255)
        dirty = cv2.imread(osp.join(root, "masks/%d.png" % fid),
                           cv2.IMREAD_GRAYSCALE) > 0
        dv = np.load(osp.join(root, args.rec, "meshs/%d.npy" % fid))
        xyp = np.asarray(transform_points_screen(
            cam_tr, jnp.asarray(dv)))[:, :2]
        pred = coverage_fill(xyp, faces_pred, H, W)
        es_clean[fid] = 1.0 - iou(pred, clean)
        es_dirty[fid] = 1.0 - iou(pred, dirty)
        gt_cov.append(iou(dirty & clean, clean))
        if fid % 20 == 0:
            print(f"frame {fid}/{n_frames} maskE_clean={es_clean[fid]:.4f} "
                  f"maskE_dirty={es_dirty[fid]:.4f} "
                  f"gt_holes={1 - gt_cov[-1]:.3f}", flush=True)

    sel = es_clean >= 0
    with open(osp.join(out_dir, "errors_clean.txt"), "w") as ff:
        ff.write("maskE, mean: %f, max: %f, min: %f\n" % (
            es_clean[sel].mean(), es_clean[sel].max(), es_clean[sel].min()))
        ff.write("maskE:\n")
        ff.write("\n".join("%d: %f" % (i, e)
                           for i, e in enumerate(es_clean)))
    print("\n== host-exact evaluation over", int(sel.sum()), "frames ==")
    print("maskE vs CLEAN gt : mean %.4f max %.4f min %.4f" % (
        es_clean[sel].mean(), es_clean[sel].max(), es_clean[sel].min()))
    print("maskE vs dirty gt : mean %.4f (errors.txt cross-check)" %
          es_dirty[sel].mean())
    print("dirty-gt hole fraction: mean %.3f (fraction of true silhouette "
          "missing from the training masks)" % (1 - np.mean(gt_cov)))


if __name__ == "__main__":
    main()
