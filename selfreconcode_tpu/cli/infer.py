"""Inference CLI — parity with the reference's infer.py.

Same flags, same outputs: tmp.ply template mesh, colors/ meshs/ def1meshs/
image dirs + mp4 videos, meshs/%d.npy deformed vertices, errors.txt with the
per-frame mask-IoU error table (infer.py:23-184).
"""
from __future__ import annotations

import argparse
import os
import os.path as osp

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(description="SelfRecon-TPU inference")
    parser.add_argument("--gpu-ids", nargs="+", type=int, default=None)
    parser.add_argument("--batch-size", default=1, type=int,
                        help="frames whose geometry passes are dispatched "
                        "back-to-back before any host fetch (reference "
                        "infer.py:132 batches frames; here batching = "
                        "dispatch pipelining, shapes stay per-frame static)")
    parser.add_argument("--rec-root", default=None)
    parser.add_argument("--frames", default=-1, type=int)
    parser.add_argument("--nV", action="store_true", help="not save video")
    parser.add_argument("--nI", action="store_true", help="not save image")
    parser.add_argument("--C", action="store_true", help="overlay on gt img")
    parser.add_argument("--nColor", action="store_true")
    parser.add_argument("--toy-smpl", action="store_true")
    parser.add_argument("--synthetic-body", action="store_true")
    args = parser.parse_args(argv)
    assert not (args.nV and args.nI)

    import cv2
    import jax
    import jax.numpy as jnp
    from ..config import parse_file
    from ..data import SceneDataset
    from ..engine.trainer import Trainer
    from ..engine.checkpoint import load_checkpoint
    from ..engine.inference import make_infer_fn
    from .train import RESOLUTIONS

    rec_root = args.rec_root
    conf = parse_file(osp.join(rec_root, "config.conf"))
    data_root = osp.normpath(osp.join(rec_root, osp.pardir))
    conds = {"deformer": conf.get_int("mlp_deformer.condlen"),
             "renderer": conf.get_int("render_net.condlen")}
    dataset = SceneDataset(data_root, conds)

    if args.synthetic_body:
        from ..models.synthetic_body import synthetic_body_model
        smpl = synthetic_body_model()
    elif args.toy_smpl:
        from ..models.smpl import toy_smpl_model
        smpl = toy_smpl_model()
    else:
        from ..models.smpl import get_smpl
        smpl = get_smpl(dataset.gender)

    trainer = Trainer(dataset, smpl, conf, RESOLUTIONS, data_root=data_root)
    ckpt = osp.join(rec_root, "latest.pkl")
    print("load model:", ckpt)
    load_checkpoint(ckpt, trainer)
    if trainer.stage_cfg is None:
        trainer.set_stage("coarse")

    # template mesh at the coarse resolution (infer.py:47-53,116-119)
    verts, faces, nv, nf = trainer.discretize_sdf(
        1.0, resolutions=RESOLUTIONS["coarse"])
    _write_ply(osp.join(rec_root, "tmp.ply"), verts, faces)
    print(f"template: {nv} verts, {nf} faces -> tmp.ply")

    # pad template into the trainer state for the jitted infer fn
    nv_t, _ = trainer.remesh(1.0)

    H, W = dataset.H, dataset.W
    for sub in ("colors", "meshs", "def1meshs"):
        os.makedirs(osp.join(rec_root, sub), exist_ok=True)
    writers = {}
    if not args.nV:
        fourcc = cv2.VideoWriter.fourcc(*"mp4v")
        writers["meshs"] = cv2.VideoWriter(
            osp.join(rec_root, "meshs/video.mp4"), fourcc, 30.0, (W, H))
        writers["def1meshs"] = cv2.VideoWriter(
            osp.join(rec_root, "def1meshs/video.mp4"), fourcc, 30.0, (W, H))
        if not args.nColor:
            writers["colors"] = cv2.VideoWriter(
                osp.join(rec_root, "colors/video.mp4"), fourcc, 30.0, (W, H))

    infer_frame = make_infer_fn(trainer, notcolor=args.nColor)
    n_frames = dataset.frame_num if args.frames < 0 else min(
        args.frames, dataset.frame_num)
    mask_errors = -1.0 * np.ones(dataset.frame_num)
    state = trainer.state

    bs = max(1, args.batch_size)
    frame_iter = []
    for lo in range(0, n_frames, bs):
        frame_iter.append(list(range(lo, min(lo + bs, n_frames))))
    for fid_group in frame_iter:
      fds = [dataset.frame_data(fid) for fid in fid_group]
      outs = infer_frame.batched(
          state.params, state.bank, state.tmp, fid_group,
          [jnp.asarray(fd["mask"].astype(np.float32)) for fd in fds])
      for fid, fd, out in zip(fid_group, fds, outs):
        # one batched device->host transfer for every per-frame output
        # (serial np.asarray calls pay a tunnel round-trip EACH)
        out = jax.device_get(out)
        mask_errors[fid] = float(out["mask_err"])
        mesh_img = np.clip(out["mesh_img"] * 255, 0, 255).astype(np.uint8)
        def1_img = np.clip(out["def1_img"] * 255, 0, 255).astype(np.uint8)
        hit = out["hit"]
        if args.C:
            mesh_img = np.where(hit[..., None], mesh_img, fd["img"])
        # slice off the capacity padding: the reference writes the true
        # deformed vertices only (infer.py:146-152); rows past nv are
        # zero-padded lanes downstream consumers must never see
        np.save(osp.join(rec_root, "meshs/%d.npy" % fid),
                np.asarray(out["def_verts"])[:nv_t])
        if not args.nI:
            cv2.imwrite(osp.join(rec_root, "meshs/%d.png" % fid), mesh_img)
            cv2.imwrite(osp.join(rec_root, "def1meshs/%d.png" % fid), def1_img)
        if "meshs" in writers:
            writers["meshs"].write(mesh_img)
            writers["def1meshs"].write(def1_img)
        if not args.nColor and "color_img" in out:
            # render-net colors are BGR like the training images (cv2 load)
            color = np.clip(out["color_img"] * 255, 0, 255).astype(np.uint8)
            if args.C:
                color = np.where(hit[..., None], color, fd["img"])
            if not args.nI:
                cv2.imwrite(osp.join(rec_root, "colors/%d.png" % fid), color)
            if "colors" in writers:
                writers["colors"].write(color)
        if fid % 20 == 0:
            print(f"frame {fid}/{n_frames} maskE={mask_errors[fid]:.4f}",
                  flush=True)
            # flush partial stats: full-subject inference is minutes-long, so
            # an interrupted run must still leave valid errors.txt stats over
            # the frames it completed (same format as the final write)
            _write_errors(rec_root, mask_errors)

    for wv in writers.values():
        wv.release()

    mean_e = _write_errors(rec_root, mask_errors)
    print("errors.txt written; mean maskE =", mean_e)


def _write_errors(rec_root: str, mask_errors: np.ndarray) -> float:
    """errors.txt parity (reference infer.py:172-181): header with
    mean/max/min over evaluated frames + one `i: err` line per frame
    (unevaluated frames carry the -1 sentinel)."""
    sel = mask_errors >= 0.0
    with open(osp.join(rec_root, "errors.txt"), "w") as ff:
        ff.write("maskE, mean: %f, max: %f, min: %f\n" % (
            mask_errors[sel].mean(), mask_errors[sel].max(),
            mask_errors[sel].min()))
        ff.write("maskE:\n")
        ff.write("\n".join("%d: %f" % (i, e)
                           for i, e in enumerate(mask_errors)))
    return float(mask_errors[sel].mean())


def _write_ply(path, verts, faces):
    from ..utils.meshops import write_mesh
    write_mesh(path, verts, faces)


if __name__ == "__main__":
    main()
