"""Per-frame inference wall-clock at the restored acceptance state.

Measures make_infer_fn end-to-end (geometry pass + chunked color solve +
host-side asarray) over a few frames — the number that decides whether the
450-frame acceptance inference fits the <5 s/frame budget (VERDICT r3
next-#10).

    python tools/bench_infer.py [--data /tmp/srtpu_accept] [--frames 3]
                                [--chunk 65536] [--no-early-exit]
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
    ap.add_argument("--frames", type=int, default=3)
    ap.add_argument("--chunk", type=int, default=65536)
    ap.add_argument("--ncolor", action="store_true")
    args = ap.parse_args()
    model = args.model or osp.join(args.data, "rec", "latest.pkl")

    import jax.numpy as jnp
    from profile_step import PROD_RES
    from selfreconcode_tpu.config import parse_file
    from selfreconcode_tpu.data import SceneDataset
    from selfreconcode_tpu.engine.trainer import Trainer
    from selfreconcode_tpu.engine.checkpoint import load_checkpoint
    from selfreconcode_tpu.engine.inference import make_infer_fn
    from selfreconcode_tpu.models.synthetic_body import synthetic_body_model

    conf = parse_file(args.conf)
    conds = {"deformer": conf.get_int("mlp_deformer.condlen"),
             "renderer": conf.get_int("render_net.condlen")}
    ds = SceneDataset(args.data, conds)
    tr = Trainer(ds, synthetic_body_model(), conf, PROD_RES,
                 save_root=osp.join(args.data, "rec"), data_root=args.data)
    epoch = load_checkpoint(model, tr)
    nv, nf = tr.remesh(1.0)
    print(f"epoch={epoch} nv={nv} nf={nf}", flush=True)

    infer_frame = make_infer_fn(tr, notcolor=args.ncolor, chunk=args.chunk)
    state = tr.state
    times = []
    for i in range(args.frames):
        fid = i * max(1, ds.frame_num // args.frames)
        fd = ds.frame_data(fid)
        gt_mask = jnp.asarray(fd["mask"].astype(np.float32))
        t0 = time.perf_counter()
        out = infer_frame(state.params, state.bank, state.tmp,
                          jnp.asarray(fid, jnp.int32), gt_mask)
        me = float(out["mask_err"])
        np.asarray(out["mesh_img"])   # include the image D2H like the CLI
        np.asarray(out["def1_img"])
        if "color_img" in out:
            np.asarray(out["color_img"])
        dt = time.perf_counter() - t0
        times.append(dt)
        print(f"frame {fid}: {dt:.2f}s maskE={me:.4f} "
              f"({'compile+' if i == 0 else ''}run)", flush=True)
    if len(times) > 1:
        warm = times[1:]
        print(f"warm mean {np.mean(warm):.2f}s/frame -> 450 frames ~ "
              f"{np.mean(warm)*450/60:.1f} min", flush=True)


if __name__ == "__main__":
    main()
