"""Bisect marching_cubes internals on a production-size volume."""
from __future__ import annotations

import argparse
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from selfreconcode_tpu.ops import marching_cubes as M

    X, Y, Z = 225, 321, 129
    vcap, fcap, acap = 708442, 1416884, 354221
    # synthetic SDF: sphere-ish, similar surface area to the template
    xs = np.linspace(-1, 1, X)[:, None, None]
    ys = np.linspace(-1.4, 1.4, Y)[None, :, None]
    zs = np.linspace(-0.6, 0.6, Z)[None, None, :]
    vol = np.sqrt(xs ** 2 + ys ** 2 + zs ** 2).astype(np.float32) - 0.8
    vol = jnp.asarray(vol)
    origin = jnp.zeros(3)
    spacing = jnp.ones(3) * 0.01
    iso = 0.0

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

    inside_j = jax.jit(lambda v: v < iso)
    inside = inside_j(vol)

    # --- pass-1 pieces -----------------------------------------------------
    def crossings(inside):
        cross = []
        for axis in range(3):
            if axis == 0:
                a, b = inside[:-1], inside[1:]
            elif axis == 1:
                a, b = inside[:, :-1], inside[:, 1:]
            else:
                a, b = inside[:, :, :-1], inside[:, :, 1:]
            cross.append(a != b)
        return jnp.concatenate([c.reshape(-1) for c in cross])

    cr_j = jax.jit(crossings)
    bench("p1 crossing flags", cr_j, inside)
    flat_cross = cr_j(inside)

    vid_j = jax.jit(lambda fc: jnp.cumsum(fc.astype(jnp.int32))
                    - fc.astype(jnp.int32))
    bench("p1 vid cumsum (27.8M)", vid_j, flat_cross)
    vid = vid_j(flat_cross)

    def vert_scatter(volume, flat_cross, vid):
        verts_out = jnp.zeros((vcap, 3), volume.dtype)
        Xl, Yl, Zl = volume.shape
        vgrid = jnp.stack(jnp.meshgrid(jnp.arange(Xl), jnp.arange(Yl),
                                       jnp.arange(Zl), indexing="ij"),
                          axis=-1)
        off = 0
        for axis in range(3):
            if axis == 0:
                v0 = volume[:-1]; v1 = volume[1:]; base = vgrid[:-1]
            elif axis == 1:
                v0 = volume[:, :-1]; v1 = volume[:, 1:]; base = vgrid[:, :-1]
            else:
                v0 = volume[:, :, :-1]; v1 = volume[:, :, 1:]
                base = vgrid[:, :, :-1]
            denom = v1 - v0
            t = jnp.where(jnp.abs(denom) > 1e-12, (iso - v0) / denom, 0.5)
            t = jnp.clip(t, 0.0, 1.0)
            pos = base.astype(volume.dtype)
            pos = pos.at[..., axis].add(t)
            pos = origin + pos * spacing
            n = v0.size
            cflat = flat_cross[off:off + n]
            vids_here = vid[off:off + n]
            idx = jnp.where(cflat, vids_here, vcap)
            verts_out = verts_out.at[idx].set(pos.reshape(-1, 3),
                                              mode="drop")
            off += n
        return verts_out

    bench("p1 vertex scatter (27.8M rows)", jax.jit(vert_scatter),
          vol, flat_cross, vid)

    # --- pass-2 pieces -----------------------------------------------------
    def case_ids(inside):
        Xl, Yl, Zl = inside.shape
        case = jnp.zeros((Xl - 1, Yl - 1, Zl - 1), jnp.int32)
        for c in range(8):
            ox, oy, oz = M._CORNER_OFF[c]
            bit = inside[ox:Xl - 1 + ox, oy:Yl - 1 + oy, oz:Zl - 1 + oz]
            case = case + (bit.astype(jnp.int32) << c)
        return case

    case_j = jax.jit(case_ids)
    bench("p2 case ids (8 shifted adds)", case_j, inside)
    case = case_j(inside)

    ntris_tbl = jnp.asarray(M.N_TRIS)

    def compact(case):
        ncubetris = ntris_tbl[case]
        active = ncubetris > 0
        aflat = active.reshape(-1)
        apos = jnp.cumsum(aflat.astype(jnp.int32)) - aflat.astype(jnp.int32)
        cube_ids = jnp.full((acap,), -1, jnp.int32)
        lin = jnp.arange(aflat.shape[0], dtype=jnp.int32)
        return cube_ids.at[jnp.where(aflat, apos, acap)].set(
            lin, mode="drop")

    bench("p2 active-cube compaction (9.2M scatter)", jax.jit(compact), case)

    # --- whole op ----------------------------------------------------------
    bench("marching_cubes full", jax.jit(
        lambda v: M.marching_cubes(v, origin, spacing, iso,
                                   vcap, fcap, acap)), vol)


if __name__ == "__main__":
    main()
