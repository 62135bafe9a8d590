"""Time a warm remesh (the per-30-step host boundary profile_step skips).

Breaks out: jitted octree+MC program, nv/nf scalar fetch, verts/faces
download, host edge-topology rebuild, padded template re-upload.
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=1080)
    ap.add_argument("--stage", default="coarse")
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from selfreconcode_tpu.engine.trainer import build_synthetic_trainer
    from selfreconcode_tpu.utils.meshops import build_edge_topology
    from tools.profile_step import PROD_RES

    root = osp.join(tempfile.gettempdir(), f"srtpu_prof_{args.h}")
    os.makedirs(root, exist_ok=True)
    t0 = time.time()
    tr, ds = build_synthetic_trainer(root, n_frames=32, H=args.h, W=args.h,
                                     resolutions=PROD_RES)
    tr.set_stage(args.stage)
    print(f"setup {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    nv, nf = tr.remesh(1.0)
    print(f"cold remesh {time.time()-t0:.1f}s: {nv}v {nf}f", flush=True)

    for i in range(args.iters):
        t0 = time.perf_counter()
        nv, nf = tr.remesh(1.0)
        print(f"warm remesh {(time.perf_counter()-t0)*1e3:.0f} ms "
              f"({nv}v {nf}f)", flush=True)

    # section timings
    params = tr.state.params["sdf"]
    res = tuple(tuple(int(v) for v in r) for r in tr.stage_cfg.resolutions)
    fn = tr._discretize_jit(res, tuple(
        __import__("selfreconcode_tpu.ops.sparse_sdf",
                   fromlist=["default_caps"]).default_caps(res)),
        tr._mc_caps[res[-1]])
    ratio = jnp.asarray(1.0, jnp.float32)

    t0 = time.perf_counter()
    mc = fn(params, ratio)
    nv_i = int(mc.nv)
    t1 = time.perf_counter()
    print(f"  device sweep+MC + nv fetch      {(t1-t0)*1e3:8.0f} ms")
    nf_i = int(mc.nf)
    verts = np.asarray(mc.verts[:nv_i])
    faces = np.asarray(mc.faces[:nf_i])
    t2 = time.perf_counter()
    print(f"  verts/faces download            {(t2-t1)*1e3:8.0f} ms "
          f"({(verts.nbytes+faces.nbytes)/1e6:.1f} MB)")
    topo = build_edge_topology(faces, nf_i, tr.stage_cfg.ecap)
    t3 = time.perf_counter()
    print(f"  host edge topology              {(t3-t2)*1e3:8.0f} ms")
    up = [jnp.asarray(topo["edges"]), jnp.asarray(topo["edge_valid"]),
          jnp.asarray(topo["edge_faces"]), jnp.asarray(topo["ef_valid"]),
          jnp.asarray(np.zeros((tr.stage_cfg.vcap, 3), np.float32))]
    np.asarray(up[0][:1])
    t4 = time.perf_counter()
    print(f"  template re-upload              {(t4-t3)*1e3:8.0f} ms")


if __name__ == "__main__":
    main()
