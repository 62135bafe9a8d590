"""Mesh operators on fixed-capacity (padded) triangle meshes.

The reference leans on pytorch3d's Meshes + loss ops and openmesh adjacency
(model/network.py:472-477,655-670; utils/utils.py:175-228).  Here every op is
pure jnp over padded buffers with validity masks, so remeshing only changes
*data*, never shapes, and the whole training step stays jit-compiled.

Conventions: verts (V,3) padded, faces (F,3) int32 padded (padding rows hold
0), face_valid (F,) bool, vert_valid (V,) bool, edges (E,2) padded unique
edges with edge_valid (E,).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .math import normalize


def face_normals(verts: jnp.ndarray, faces: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Unit face normals, (F,3). Parity: utils/utils.py:189-199."""
    v0 = verts[faces[:, 0]]
    v1 = verts[faces[:, 1]]
    v2 = verts[faces[:, 2]]
    n = jnp.cross(v1 - v0, v2 - v0)
    return n / jnp.clip(jnp.linalg.norm(n, axis=-1, keepdims=True), eps, None)


def face_areas(verts: jnp.ndarray, faces: jnp.ndarray) -> jnp.ndarray:
    """Triangle areas, (F,). Parity: utils/utils.py:175-186."""
    v0 = verts[faces[:, 0]]
    v1 = verts[faces[:, 1]]
    v2 = verts[faces[:, 2]]
    return jnp.linalg.norm(jnp.cross(v1 - v0, v2 - v0), axis=-1) / 2.0


def vertex_normals(verts: jnp.ndarray, faces: jnp.ndarray,
                   face_valid: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Area-uniform vertex normals: sum of incident unit face normals.

    Parity: utils/utils.py:222-228 (scatter-sum of face normals).
    """
    fn = face_normals(verts, faces) * face_valid[:, None]
    vnum = verts.shape[0]
    vn = jnp.zeros((vnum, 3), verts.dtype)
    for c in range(3):
        vn = vn.at[faces[:, c]].add(fn, mode="drop")
    return vn / jnp.clip(jnp.linalg.norm(vn, axis=-1, keepdims=True), eps, None)


def uniform_laplacian_loss(verts: jnp.ndarray, edges: jnp.ndarray,
                           edge_valid: jnp.ndarray, vert_valid: jnp.ndarray,
                           eps: float = 1e-12) -> jnp.ndarray:
    """Mean over valid verts of || mean_neighbor(v) - v ||.

    Parity: pytorch3d mesh_laplacian_smoothing(method='uniform') as used at
    model/network.py:658.
    """
    vnum = verts.shape[0]
    w = edge_valid.astype(verts.dtype)
    acc = jnp.zeros((vnum, 3), verts.dtype)
    deg = jnp.zeros((vnum,), verts.dtype)
    e0, e1 = edges[:, 0], edges[:, 1]
    acc = acc.at[e0].add(verts[e1] * w[:, None], mode="drop")
    acc = acc.at[e1].add(verts[e0] * w[:, None], mode="drop")
    deg = deg.at[e0].add(w, mode="drop")
    deg = deg.at[e1].add(w, mode="drop")
    lap = acc / jnp.clip(deg[:, None], 1.0, None) - verts
    per_v = jnp.sqrt(jnp.clip((lap * lap).sum(-1), eps, None))
    vv = vert_valid.astype(verts.dtype)
    return (per_v * vv).sum() / jnp.clip(vv.sum(), 1.0, None)


def edge_length_loss(verts: jnp.ndarray, edges: jnp.ndarray,
                     edge_valid: jnp.ndarray, target_length: float = 0.0) -> jnp.ndarray:
    """Mean over valid unique edges of (|e| - target)^2.

    Parity: pytorch3d mesh_edge_loss as used at model/network.py:663.
    """
    d = verts[edges[:, 0]] - verts[edges[:, 1]]
    lens = jnp.sqrt(jnp.clip((d * d).sum(-1), 1e-12, None))
    per_e = (lens - target_length) ** 2
    w = edge_valid.astype(verts.dtype)
    return (per_e * w).sum() / jnp.clip(w.sum(), 1.0, None)


def normal_consistency_loss(verts: jnp.ndarray, faces: jnp.ndarray,
                            edge_faces: jnp.ndarray, ef_valid: jnp.ndarray) -> jnp.ndarray:
    """Mean over interior edges of (1 - cos(n_f0, n_f1)).

    edge_faces (E,2): the two faces adjacent to each interior edge (host-built
    at remesh time); ef_valid masks padding / boundary edges.
    Parity: pytorch3d mesh_normal_consistency as used at model/network.py:668.
    """
    fn = face_normals(verts, faces)
    n0 = fn[edge_faces[:, 0]]
    n1 = fn[edge_faces[:, 1]]
    per_e = 1.0 - (n0 * n1).sum(-1)
    w = ef_valid.astype(verts.dtype)
    return (per_e * w).sum() / jnp.clip(w.sum(), 1.0, None)


# ---------------------------------------------------------------------------
# Host-side topology build (runs at the remesh boundary, numpy only).
# Replaces the reference's openmesh adjacency build (model/network.py:472-477).
# ---------------------------------------------------------------------------

def build_edge_topology_device(faces: jnp.ndarray, face_valid: jnp.ndarray,
                               edge_capacity: int):
    """Jittable build_edge_topology: unique undirected edges + adjacent-face
    pairs, sort/gather only (no host round-trip at the remesh boundary —
    replaces openmesh exactly like the host variant below, but stays on
    device; transfers through the TPU tunnel cost ~0.7 s per remesh).

    faces (F,3) int32 padded, face_valid (F,) bool.  Returns dict of
    device arrays shaped like the host variant plus num_edges () int32
    (watermark; may exceed edge_capacity).
    """
    F = faces.shape[0]
    M = 3 * F
    e = jnp.concatenate([faces[:, (0, 1)], faces[:, (1, 2)],
                         faces[:, (2, 0)]], axis=0)          # (M,2)
    fid = jnp.tile(jnp.arange(F, dtype=jnp.int32), 3)
    valid3 = jnp.tile(face_valid, 3)
    big = jnp.int32(2 ** 30)
    emin = jnp.where(valid3, jnp.minimum(e[:, 0], e[:, 1]), big)
    emax = jnp.where(valid3, jnp.maximum(e[:, 0], e[:, 1]), big)
    emin_s, emax_s, fid_s, e0_s, e1_s = jax.lax.sort(
        (emin, emax, fid, e[:, 0], e[:, 1]), num_keys=2, is_stable=True)
    prev_same = jnp.concatenate([
        jnp.zeros((1,), bool),
        (emin_s[1:] == emin_s[:-1]) & (emax_s[1:] == emax_s[:-1])])
    uniq = (~prev_same) & (emin_s < big)
    num_edges = uniq.sum().astype(jnp.int32)
    pos = jnp.cumsum(uniq.astype(jnp.int32)) - uniq.astype(jnp.int32)
    sel = jnp.full((edge_capacity,), -1, jnp.int32)
    lin = jnp.arange(M, dtype=jnp.int32)
    sel = sel.at[jnp.where(uniq, pos, edge_capacity)].set(lin, mode="drop")
    ev = sel >= 0
    s = jnp.maximum(sel, 0)
    # original orientation (host-variant parity); consumers are symmetric
    edges = jnp.where(ev[:, None],
                      jnp.stack([e0_s[s], e1_s[s]], axis=-1), 0)
    first_face = fid_s[s]
    nxt = jnp.minimum(s + 1, M - 1)
    same1 = (emin_s[nxt] == emin_s[s]) & (emax_s[nxt] == emax_s[s])
    second_face = jnp.where(same1, fid_s[nxt], 0)
    nxt2 = jnp.minimum(s + 2, M - 1)
    same2 = (emin_s[nxt2] == emin_s[s]) & (emax_s[nxt2] == emax_s[s])
    interior = ev & same1 & (~same2)   # exactly two adjacent faces
    return {
        "edges": edges.astype(jnp.int32),
        "edge_valid": ev,
        "edge_faces": jnp.where(
            interior[:, None],
            jnp.stack([first_face, second_face], axis=-1), 0).astype(jnp.int32),
        "ef_valid": interior,
        "num_edges": num_edges,
    }


def build_edge_topology(faces: np.ndarray, nf: int, edge_capacity: int):
    """Unique undirected edges + adjacent-face pairs from (F,3) int faces.

    Returns dict of padded numpy arrays:
      edges (E,2) int32, edge_valid (E,) bool,
      edge_faces (E,2) int32 (two adjacent faces; boundary edges invalid),
      ef_valid (E,) bool.
    """
    f = faces[:nf].astype(np.int64)
    e = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]], axis=0)
    fid = np.tile(np.arange(nf, dtype=np.int64), 3)
    key = np.minimum(e[:, 0], e[:, 1]) * (2 ** 31) + np.maximum(e[:, 0], e[:, 1])
    order = np.argsort(key, kind="stable")
    key_s, e_s, fid_s = key[order], e[order], fid[order]
    uniq_mask = np.ones(len(key_s), dtype=bool)
    uniq_mask[1:] = key_s[1:] != key_s[:-1]
    uniq_idx = np.nonzero(uniq_mask)[0]
    ne = len(uniq_idx)
    edges = np.zeros((edge_capacity, 2), np.int32)
    edge_valid = np.zeros((edge_capacity,), bool)
    edge_faces = np.zeros((edge_capacity, 2), np.int32)
    ef_valid = np.zeros((edge_capacity,), bool)
    ne_c = min(ne, edge_capacity)
    edges[:ne_c] = e_s[uniq_idx[:ne_c]].astype(np.int32)
    edge_valid[:ne_c] = True
    # group boundaries -> count of faces per edge; interior edges have exactly 2
    counts = np.diff(np.append(uniq_idx, len(key_s)))
    first_face = fid_s[uniq_idx]
    second_face = np.where(counts >= 2, fid_s[np.minimum(uniq_idx + 1, len(fid_s) - 1)], -1)
    interior = counts[:ne_c] == 2
    edge_faces[:ne_c, 0] = first_face[:ne_c].astype(np.int32)
    edge_faces[:ne_c, 1] = np.maximum(second_face[:ne_c], 0).astype(np.int32)
    ef_valid[:ne_c] = interior
    return {
        "edges": edges,
        "edge_valid": edge_valid,
        "edge_faces": edge_faces,
        "ef_valid": ef_valid,
        "num_edges": ne,
    }


def write_mesh(path, verts, faces):
    """Export a mesh; trimesh when available, else a plain ASCII PLY (this
    image ships no trimesh — an .npz fallback produced files downstream
    ply readers could not open)."""
    verts = np.asarray(verts)
    faces = np.asarray(faces)
    try:
        import trimesh
        trimesh.Trimesh(verts, faces, process=False).export(path)
        return
    except ImportError:
        pass
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(verts)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write(f"element face {len(faces)}\n")
        f.write("property list uchar int vertex_indices\nend_header\n")
        for v in verts:
            f.write(f"{v[0]} {v[1]} {v[2]}\n")
        for t in faces:
            f.write(f"3 {t[0]} {t[1]} {t[2]}\n")
