"""Bisect the Pallas mesh-rasterizer cost: binning vs gather vs kernel.

Times each internal stage of the fp<=8 path as its own jitted program at
production shapes, plus a warm remesh (the only per-30-step host cost the
step profiler skips).
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
    ap.add_argument("--f", type=int, default=148108)
    ap.add_argument("--hw", type=int, default=1080)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from selfreconcode_tpu.render.camera import Camera, transform_points_screen
    from selfreconcode_tpu.ops import rasterize as R
    from selfreconcode_tpu.ops import pallas_raster as PR
    from selfreconcode_tpu.ops.binning import build_cell_table, \
        bbox_cell_entries

    def fetch(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        return np.asarray(leaf.reshape(-1)[:1])

    tiny = jax.jit(lambda x: x + 1.0)
    fetch(tiny(jnp.zeros(())))
    t0 = time.perf_counter()
    for _ in range(5):
        fetch(tiny(jnp.zeros(())))
    rtt = (time.perf_counter() - t0) / 5 * 1e3
    K = args.iters

    def bench(label, fn, *a):
        fetch(fn(*a))
        t0 = time.perf_counter()
        for _ in range(K):
            out = fn(*a)
        fetch(out)
        dt = ((time.perf_counter() - t0) * 1e3 - rtt) / K
        print(f"  {label:<44s} {dt:8.1f} ms", flush=True)
        return dt

    F, HW = args.f, args.hw
    rng = np.random.default_rng(0)
    cam = Camera(focal=jnp.asarray([1000.0, 1000.0]),
                 principal=jnp.asarray([HW / 2.0, HW / 2.0]),
                 R=jnp.eye(3), T=jnp.asarray([0.0, 0.0, 2.5]),
                 H=HW, W=HW)
    anchor = rng.uniform(-0.6, 0.6, (F, 1, 3)).astype(np.float32)
    tri = anchor + 0.004 * rng.standard_normal((F, 3, 3)).astype(np.float32)
    vstack = jnp.asarray(tri.reshape(-1, 3))
    fstack = jnp.arange(F * 3, dtype=jnp.int32).reshape(F, 3)
    fvalid = jnp.ones((F,), bool)

    cs = 8
    H = W = HW
    ncy, ncx, Hp, Wp = R._cell_geometry(H, W, cs)
    cell_cap = 128
    print(f"[{F} faces @{HW}p, {ncy}x{ncx} cells cap={cell_cap}]")

    # stage 1: transform + bbox + entries
    def s1(v):
        screen = transform_points_screen(cam, v)
        sxy = screen[:, :2]
        sz = screen[:, 2]
        f0, f1, f2 = fstack[:, 0], fstack[:, 1], fstack[:, 2]
        p0, p1, p2 = sxy[f0], sxy[f1], sxy[f2]
        z0, z1, z2 = sz[f0], sz[f1], sz[f2]
        front = (z0 > 0) & (z1 > 0) & (z2 > 0) & fvalid
        bb_min_x = jnp.minimum(jnp.minimum(p0[:, 0], p1[:, 0]), p2[:, 0])
        bb_max_x = jnp.maximum(jnp.maximum(p0[:, 0], p1[:, 0]), p2[:, 0])
        bb_min_y = jnp.minimum(jnp.minimum(p0[:, 1], p1[:, 1]), p2[:, 1])
        bb_max_y = jnp.maximum(jnp.maximum(p0[:, 1], p1[:, 1]), p2[:, 1])
        on = (front & (bb_max_x >= 0) & (bb_min_x <= W - 1)
              & (bb_max_y >= 0) & (bb_min_y <= H - 1))
        cells, evalid, prims = bbox_cell_entries(
            bb_min_x, bb_min_y, bb_max_x, bb_max_y, on, cs, ncx, ncy)
        return (p0, p1, p2, z0, z1, z2, cells, evalid, prims)

    s1j = jax.jit(s1)
    bench("s1 transform+bbox+entries", s1j, vstack)
    p0, p1, p2, z0, z1, z2, cells, evalid, prims = s1j(vstack)

    # stage 2: sort-based cell table
    s2j = jax.jit(lambda c, e: build_cell_table(c, e, ncy * ncx, cell_cap))
    bench("s2 build_cell_table (sort)", s2j, cells, evalid)
    table, _, _ = s2j(cells, evalid)

    # stage 3: candidate gather -> (C,16,cap) tensor
    def s3(table, p0, p1, p2, z0, z1, z2):
        cand = jnp.where(table >= 0, prims[jnp.maximum(table, 0)], -1)
        cvalid = cand >= 0
        cf = jnp.maximum(cand, 0)
        Fn = fstack.shape[0]
        z = jnp.zeros((Fn,), jnp.float32)
        fdata = jnp.stack([
            p0[:, 0], p0[:, 1], p1[:, 0], p1[:, 1], p2[:, 0], p2[:, 1],
            z0, z1, z2, jnp.arange(Fn, dtype=jnp.float32),
            z, z, z, z, z, z], axis=1)
        arr = fdata[cf]
        vrow = cvalid.astype(jnp.float32)
        arr = jnp.concatenate([arr[..., :10], vrow[..., None],
                               arr[..., 11:]], axis=-1)
        return jnp.swapaxes(arr, 1, 2)

    s3j = jax.jit(s3)
    bench("s3 candidate gather (C,16,cap)", s3j, table, p0, p1, p2,
          z0, z1, z2)
    tri_t = s3j(table, p0, p1, p2, z0, z1, z2)
    tri_p, C = R._pad_cells(tri_t)

    # stage 4: the Pallas kernel
    s4j = jax.jit(lambda t: PR.mesh_fragments_cells(t, cs, ncx, R._CB))
    bench("s4 pallas kernel", s4j, tri_p)

    # stage 5: full path for reference
    bench("full rasterize_mesh fp=8", jax.jit(
        lambda v: R.rasterize_mesh(cam, v, fstack, fvalid, 8)), vstack)


if __name__ == "__main__":
    main()
