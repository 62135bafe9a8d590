"""Texture CLIs.

`prepare` — parity with texture_mesh_prepare.py: deform the user's UV'd
template (template/uvmap.obj inside --rec-root) for --num evenly spaced
frames and write tex_predata.npz.

`extract` — replaces texture_mesh_extract.py WITHOUT the VideoAvatar/opendr
environment: bakes texture.png directly with our rasterizer (see texture/uv.py
for the aggregation semantics).
"""
from __future__ import annotations

import argparse
import os.path as osp

import numpy as np


def _load_trainer(rec_root: str, toy_smpl: bool, synthetic_body: bool = False):
    from ..config import parse_file
    from ..data import SceneDataset
    from ..engine.trainer import Trainer
    from ..engine.checkpoint import load_checkpoint
    from .train import RESOLUTIONS

    conf = parse_file(osp.join(rec_root, "config.conf"))
    data_root = osp.normpath(osp.join(rec_root, osp.pardir))
    conds = {"deformer": conf.get_int("mlp_deformer.condlen"),
             "renderer": conf.get_int("render_net.condlen")}
    dataset = SceneDataset(data_root, conds)
    if synthetic_body:
        from ..models.synthetic_body import synthetic_body_model
        smpl = synthetic_body_model()
    elif toy_smpl:
        from ..models.smpl import toy_smpl_model
        smpl = toy_smpl_model()
    else:
        from ..models.smpl import get_smpl
        smpl = get_smpl(dataset.gender)
    trainer = Trainer(dataset, smpl, conf, RESOLUTIONS, data_root=data_root)
    load_checkpoint(osp.join(rec_root, "latest.pkl"), trainer)
    return trainer, dataset


def prepare(argv=None):
    parser = argparse.ArgumentParser(description="texture prepare")
    parser.add_argument("--gpu-ids", nargs="+", type=int, default=None)
    parser.add_argument("--rec-root", required=True)
    parser.add_argument("--num", type=int, default=120)
    parser.add_argument("--toy-smpl", action="store_true")
    parser.add_argument("--synthetic-body", action="store_true")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from ..texture.uv import load_obj_with_uv
    from ..models.deformer import deformer_apply

    trainer, dataset = _load_trainer(args.rec_root, args.toy_smpl,
                                     args.synthetic_body)
    obj = osp.join(args.rec_root, "template", "uvmap.obj")
    verts, uvs, faces_v, faces_vt = load_obj_with_uv(obj)
    print(f"uvmap.obj: {len(verts)} verts, {len(faces_v)} faces, "
          f"{len(uvs)} uvs")

    n = min(args.num, dataset.frame_num)
    fids = np.linspace(0, dataset.frame_num - 1, n).astype(np.int64)
    state = trainer.state
    tverts = jnp.asarray(verts)
    binds = jnp.zeros((verts.shape[0],), jnp.int32)

    @jax.jit
    def deform(fid):
        poses = state.bank["poses"][fid][None]
        trans = state.bank["trans"][fid][None]
        dcond = state.bank["cond_deformer"][fid][None]
        out, _ = deformer_apply(state.params["trans"], trainer.deformer,
                                tverts, binds, dcond, poses, trans, 1.0)
        return out

    def_vs = np.stack([np.asarray(deform(jnp.asarray(int(f)))) for f in fids])
    cp = dataset.camera_params
    np.savez(osp.join(args.rec_root, "tex_predata.npz"),
             def_vs=def_vs, fids=fids, uvs=uvs, faces_v=faces_v,
             faces_vt=faces_vt,
             focal=cp["focal_length"], princeple=cp["princeple_points"],
             quat=cp["cam2world_coord_quat"],
             T=cp["world2cam_coord_trans"], H=dataset.H, W=dataset.W)
    print("tex_predata.npz written:", def_vs.shape)


def extract(argv=None):
    parser = argparse.ArgumentParser(description="texture extract")
    parser.add_argument("--rec-root", required=True)
    parser.add_argument("--tex-size", type=int, default=1024)
    parser.add_argument("--save-name", default="texture.png")
    parser.add_argument("--k-best", type=int, default=8,
                        help="per-texel best-viewing-angle slots for the "
                             "median aggregation (1 = weighted mean)")
    args = parser.parse_args(argv)

    import cv2
    from ..render.camera import make_camera
    from ..texture.uv import bake_texture, inpaint_texture

    data = np.load(osp.join(args.rec_root, "tex_predata.npz"))
    data_root = osp.normpath(osp.join(args.rec_root, osp.pardir))
    cam = make_camera(data["focal"], data["princeple"], data["quat"],
                      data["T"], int(data["H"]), int(data["W"]))
    imgs = []
    for fid in data["fids"]:
        img = cv2.imread(osp.join(data_root, "imgs/%d.png" % int(fid)))
        if img is None:
            img = cv2.imread(osp.join(data_root, "imgs/%d.jpg" % int(fid)))
        imgs.append(img[:, :, ::-1].astype(np.float32) / 255.0)  # RGB [0,1]
    tex, w = bake_texture(cam, list(data["def_vs"]), imgs, data["faces_v"],
                          data["faces_vt"], data["uvs"],
                          tex_size=args.tex_size, k_best=args.k_best)
    out = inpaint_texture(tex, w)
    cv2.imwrite(osp.join(args.rec_root, args.save_name), out[:, :, ::-1])
    print("texture written:", osp.join(args.rec_root, args.save_name),
          f"coverage={float((w > 0).mean()):.3f}")


if __name__ == "__main__":
    import sys
    cmd = sys.argv[1] if len(sys.argv) > 1 else "prepare"
    if cmd == "prepare":
        prepare(sys.argv[2:])
    elif cmd == "extract":
        extract(sys.argv[2:])
    else:
        raise SystemExit(f"unknown subcommand {cmd}")
