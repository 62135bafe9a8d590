#!/usr/bin/env python
"""Mesh acceptance metrics: bidirectional Chamfer distance + normal
consistency between two meshes (ours vs the reference's output), sampled on
the surface.  Used for the BASELINE.md parity check (mask-IoU comes from
infer.py's errors.txt; this covers geometry).

Usage: python tools/compare_meshes.py ours.ply theirs.ply [--samples 100000]
Prints one JSON line.
"""
from __future__ import annotations

import argparse
import json

import numpy as np


def load_mesh(path):
    if path.endswith(".npz"):  # e.g. the synthetic subject's gt_mesh.npz
        z = np.load(path)
        return (np.asarray(z["verts"], np.float64),
                np.asarray(z["faces"], np.int64))
    try:
        import trimesh
        m = trimesh.load(path, process=False)
        return (np.asarray(m.vertices, np.float64),
                np.asarray(m.faces, np.int64))
    except ImportError:
        return load_ascii_ply(path)


def load_ascii_ply(path):
    """Self-contained reader for the ascii PLY this framework writes
    (infer.py tmp.ply / meshs; x y z verts + triangle faces) — trimesh is
    not available in every deployment container."""
    with open(path) as f:
        assert f.readline().strip() == "ply"
        nv = nf = 0
        for line in f:
            t = line.strip().split()
            if t[:2] == ["element", "vertex"]:
                nv = int(t[2])
            elif t[:2] == ["element", "face"]:
                nf = int(t[2])
            elif t[0] == "format":
                assert t[1] == "ascii", f"binary ply needs trimesh: {path}"
            elif t[0] == "end_header":
                break
        verts = np.loadtxt(f, max_rows=nv, dtype=np.float64).reshape(nv, -1)
        faces = np.loadtxt(f, max_rows=nf, dtype=np.int64).reshape(nf, -1)
    assert (faces[:, 0] == 3).all(), "non-triangle ply face"
    return verts[:, :3], faces[:, 1:4]


def sample_surface(verts, faces, n, seed=0):
    rng = np.random.default_rng(seed)
    v0, v1, v2 = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    fn = np.cross(v1 - v0, v2 - v0)
    areas = 0.5 * np.linalg.norm(fn, axis=1)
    p = areas / areas.sum()
    fi = rng.choice(len(faces), n, p=p)
    u = rng.random(n)
    v = rng.random(n)
    flip = u + v > 1
    u[flip] = 1 - u[flip]
    v[flip] = 1 - v[flip]
    pts = v0[fi] + u[:, None] * (v1[fi] - v0[fi]) + v[:, None] * (v2[fi] - v0[fi])
    nrm = fn[fi] / np.clip(np.linalg.norm(fn[fi], axis=1, keepdims=True),
                           1e-12, None)
    return pts, nrm


def nn_dist_and_normal(a_pts, a_nrm, b_pts, b_nrm, chunk=2048):
    """For each point in a: distance to nearest b point + |cos| of normals."""
    from scipy.spatial import cKDTree
    tree = cKDTree(b_pts)
    d, idx = tree.query(a_pts, k=1)
    cos = np.abs((a_nrm * b_nrm[idx]).sum(1))
    return d, cos


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ours")
    ap.add_argument("theirs")
    ap.add_argument("--samples", type=int, default=100000)
    args = ap.parse_args()
    va, fa = load_mesh(args.ours)
    vb, fb = load_mesh(args.theirs)
    pa, na = sample_surface(va, fa, args.samples, seed=0)
    pb, nb = sample_surface(vb, fb, args.samples, seed=1)
    d_ab, c_ab = nn_dist_and_normal(pa, na, pb, nb)
    d_ba, c_ba = nn_dist_and_normal(pb, nb, pa, na)
    print(json.dumps({
        "chamfer_l1_mm": round(1000.0 * (d_ab.mean() + d_ba.mean()) / 2, 4),
        "chamfer_l2_mm2": round(1e6 * ((d_ab ** 2).mean()
                                       + (d_ba ** 2).mean()) / 2, 4),
        "normal_consistency": round((c_ab.mean() + c_ba.mean()) / 2, 4),
        "samples": args.samples,
    }))


if __name__ == "__main__":
    main()
