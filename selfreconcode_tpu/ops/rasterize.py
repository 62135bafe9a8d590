"""Rasterization on TPU: point-splat soft masks + mesh fragments.

This replaces the reference's pytorch3d dependency (the single largest
external build item, SURVEY §2.3):

* `splat_mask` — differentiable soft silhouette from a point cloud.
  Parity: PointsRasterizer(radius, points_per_pixel=50) + AlphaCompositor
  with unit features and weights w = 1 - d^2/r^2 (model/CameraMine.py:285-304,
  model/network.py:495-498).  With unit features, alpha-compositing K
  z-sorted splats equals 1 - prod_k (1 - w_k), which is *order-independent* —
  so instead of a z-sorted top-50 buffer we accumulate log(1 - w) and
  exponentiate.  (All covering points contribute, not just the nearest 50 —
  a strict refinement of the reference, and exactly differentiable.)

* `rasterize_mesh` — non-differentiable fragments (pix_to_face, perspective-
  correct barycentrics, zbuf) with faces_per_pixel=1.
  Parity: pytorch3d MeshRasterizer as consumed by utils/FindSurfacePs.py:5-29
  (the contract is "nearest face + barys per pixel", not general rendering).

TPU-first formulation (v2): XLA TPU scatters serialize (~1e5 elem/ms
measured), so both rasterizers are GATHER-ONLY.  Primitives are binned into
image cells with one lax.sort (ops/binning.py); every pixel then evaluates
only its cell's fixed-capacity candidate list with vectorized gathers and a
masked min/sum reduction.  The splat's backward is a jax.custom_vjp that
gathers the cotangent image at each point's k x k footprint — also
scatter-free.  MC triangles and splat radii are bounded (<= one voxel /
few px), so a primitive covers at most a 2x2 cell block by construction.

The original scatter-based implementations are kept as
`rasterize_mesh_scatter` / `splat_mask_scatter` as executable references for
the parity tests.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..render.camera import Camera, transform_points_screen
from .binning import build_cell_table, bbox_cell_entries, entry_ranks
from . import pallas_raster as PR


class Fragments(NamedTuple):
    pix_to_face: jnp.ndarray  # (H, W) int32, -1 for empty
    bary: jnp.ndarray         # (H, W, 3) perspective-correct barycentrics
    zbuf: jnp.ndarray         # (H, W) depth (+inf empty)
    # dropped candidate entries across all overfull cells (0 = every face got
    # a table slot).  Nonzero means the scene is denser than the cell_cap
    # tuning and masks degrade silently — surface this in telemetry.
    overflow: jnp.ndarray = np.int32(0)


def _cell_geometry(H: int, W: int, cell_size: int):
    ncy = -(-H // cell_size)
    ncx = -(-W // cell_size)
    return ncy, ncx, ncy * cell_size, ncx * cell_size


_CB = 16  # cells per Pallas grid step

# escape hatch / A-B benchmarking: SRTPU_NO_PALLAS=1 forces the XLA paths
import os as _os
PALLAS_ENABLED = _os.environ.get("SRTPU_NO_PALLAS", "0") != "1"


def _pad_cells(x, cb=_CB):
    C = x.shape[0]
    pad = (-C) % cb
    if pad:
        x = jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
    return x, C


# ---------------------------------------------------------------------------
# Mesh fragments (gather-only)
# ---------------------------------------------------------------------------

def rasterize_mesh(cam: Camera, verts: jnp.ndarray, faces: jnp.ndarray,
                   face_valid: jnp.ndarray, footprint: int = 10,
                   image_scale: int = 1, cell_cap: int = 48,
                   use_pallas: bool = True) -> Fragments:
    """Nearest-face fragments at (H/s, W/s).  Non-differentiable by design
    (the reference also rasterizes under no_grad, model/network.py:491-493).

    footprint: upper bound on a triangle's projected bbox extent in pixels
    (MC triangles never exceed one voxel, so the caller derives this from the
    voxel size); it doubles as the cell size for binning.

    When the footprint fits a 16px cell the candidate-vs-pixel evaluation
    runs as a Pallas kernel entirely in VMEM (ops/pallas_raster.py) — 8px
    cells/cap 128 for footprints <=8, 16px cells/cap 256 up to 16 (2x2 cell
    coverage in the binning requires footprint <= cell size).  The XLA
    formulation below is the fallback for larger footprints.
    """
    if use_pallas and PALLAS_ENABLED and int(footprint) <= 16:
        pcs, pcap = (8, 128) if int(footprint) <= 8 else (16, 256)
        return _rasterize_mesh_pallas(cam, verts, faces, face_valid,
                                      image_scale, cs=pcs, cell_cap=pcap)
    H, W = cam.H // image_scale, cam.W // image_scale
    cs = max(8, int(footprint))
    ncy, ncx, Hp, Wp = _cell_geometry(H, W, cs)

    screen = transform_points_screen(cam, verts)
    sxy = screen[:, :2] / image_scale
    sz = screen[:, 2]
    f0, f1, f2 = faces[:, 0], faces[:, 1], faces[:, 2]
    p0, p1, p2 = sxy[f0], sxy[f1], sxy[f2]       # (F,2)
    z0, z1, z2 = sz[f0], sz[f1], sz[f2]
    front = (z0 > 0) & (z1 > 0) & (z2 > 0) & face_valid

    bb_min_x = jnp.minimum(jnp.minimum(p0[:, 0], p1[:, 0]), p2[:, 0])
    bb_max_x = jnp.maximum(jnp.maximum(p0[:, 0], p1[:, 0]), p2[:, 0])
    bb_min_y = jnp.minimum(jnp.minimum(p0[:, 1], p1[:, 1]), p2[:, 1])
    bb_max_y = jnp.maximum(jnp.maximum(p0[:, 1], p1[:, 1]), p2[:, 1])
    on_screen = (front & (bb_max_x >= 0) & (bb_min_x <= W - 1)
                 & (bb_max_y >= 0) & (bb_min_y <= H - 1))

    cells, evalid, prims = bbox_cell_entries(
        bb_min_x, bb_min_y, bb_max_x, bb_max_y, on_screen, cs, ncx, ncy)
    table, counts, ovf = build_cell_table(cells, evalid, ncy * ncx, cell_cap)
    # entry index -> face id (entries enumerate faces 4x)
    F = faces.shape[0]
    cand = jnp.where(table >= 0, prims[jnp.maximum(table, 0)], -1)  # (C,cap)
    cvalid = cand >= 0
    cf = jnp.maximum(cand, 0)

    # gather per-candidate face data: (C, cap, ...)
    q0, q1, q2 = p0[cf], p1[cf], p2[cf]
    y0, y1, y2 = z0[cf], z1[cf], z2[cf]

    # pixel coords per cell: (C, cs*cs)
    cell_ids = jnp.arange(ncy * ncx)
    cell_x0 = (cell_ids % ncx) * cs
    cell_y0 = (cell_ids // ncx) * cs
    lx = jnp.arange(cs)
    px = (cell_x0[:, None] + jnp.tile(lx, cs)[None, :]).astype(verts.dtype)
    py = (cell_y0[:, None] + jnp.repeat(lx, cs)[None, :]).astype(verts.dtype)

    def edge(ax, ay, bx, by, X, Y):
        return ((bx - ax)[:, :, None] * (Y - ay[:, :, None])
                - (by - ay)[:, :, None] * (X - ax[:, :, None]))

    X = px[:, None, :]                              # (C,1,P)
    Y = py[:, None, :]
    area = ((q1[..., 0] - q0[..., 0]) * (q2[..., 1] - q0[..., 1])
            - (q1[..., 1] - q0[..., 1]) * (q2[..., 0] - q0[..., 0]))
    w0 = edge(q1[..., 0], q1[..., 1], q2[..., 0], q2[..., 1], X, Y)
    w1 = edge(q2[..., 0], q2[..., 1], q0[..., 0], q0[..., 1], X, Y)
    w2 = edge(q0[..., 0], q0[..., 1], q1[..., 0], q1[..., 1], X, Y)
    denom = jnp.where(jnp.abs(area) > 1e-12, area, 1.0)[:, :, None]
    b0, b1, b2 = w0 / denom, w1 / denom, w2 / denom
    # >= so shared-edge pixels belong to both faces (min-z reduce picks one
    # deterministically); strict > leaves holes along interior edges
    inside = ((b0 >= 0) & (b1 >= 0) & (b2 >= 0)
              & (jnp.abs(area) > 1e-12)[:, :, None] & cvalid[:, :, None])
    inv_z = (b0 / y0[:, :, None] + b1 / y1[:, :, None] + b2 / y2[:, :, None])
    zpix = 1.0 / jnp.clip(inv_z, 1e-12, None)
    big = jnp.asarray(jnp.inf, verts.dtype)
    zmasked = jnp.where(inside, zpix, big)          # (C,cap,P)

    # min-reduce over candidates; the (C,cap,P) intermediates fuse into this
    # reduction (nothing else consumes them — bary is recomputed winner-only)
    slot = jnp.argmin(zmasked, axis=1)               # (C,P)
    zmin = jnp.min(zmasked, axis=1)
    hit = jnp.isfinite(zmin)
    face_win = jnp.take_along_axis(cand, slot, axis=1)   # (C,P)
    face_win = jnp.where(hit, face_win, -1)

    # winner-only barycentrics: gather the winning face's verts per pixel
    fw = jnp.maximum(face_win, 0)
    u0, u1, u2 = p0[fw], p1[fw], p2[fw]              # (C,P,2)
    v0, v1, v2 = z0[fw], z1[fw], z2[fw]              # (C,P)

    def edge_p(ax, ay, bx, by):
        return (bx - ax) * (py.astype(verts.dtype) - ay) \
            - (by - ay) * (px.astype(verts.dtype) - ax)

    area_w = ((u1[..., 0] - u0[..., 0]) * (u2[..., 1] - u0[..., 1])
              - (u1[..., 1] - u0[..., 1]) * (u2[..., 0] - u0[..., 0]))
    denom_w = jnp.where(jnp.abs(area_w) > 1e-12, area_w, 1.0)
    c0 = edge_p(u1[..., 0], u1[..., 1], u2[..., 0], u2[..., 1]) / denom_w
    c1 = edge_p(u2[..., 0], u2[..., 1], u0[..., 0], u0[..., 1]) / denom_w
    c2 = edge_p(u0[..., 0], u0[..., 1], u1[..., 0], u1[..., 1]) / denom_w
    # perspective correction: b_i ∝ c_i / z_i
    t0 = c0 / jnp.clip(v0, 1e-12, None)
    t1 = c1 / jnp.clip(v1, 1e-12, None)
    t2 = c2 / jnp.clip(v2, 1e-12, None)
    ts = jnp.clip(t0 + t1 + t2, 1e-12, None)
    bary = jnp.stack([t0 / ts, t1 / ts, t2 / ts], axis=-1)
    bary = jnp.where(hit[..., None], bary, 0.0)

    def to_image(flat, fill):
        img = flat.reshape(ncy, ncx, cs, cs, *flat.shape[2:])
        img = jnp.moveaxis(img, 2, 1).reshape(Hp, Wp, *flat.shape[2:])
        return img[:H, :W]

    return Fragments(
        pix_to_face=to_image(face_win, -1).astype(jnp.int32),
        bary=to_image(bary, 0.0),
        zbuf=to_image(jnp.where(hit, zmin, big), big),
        overflow=ovf.astype(jnp.int32),
    )


def _rasterize_mesh_pallas(cam: Camera, verts: jnp.ndarray,
                           faces: jnp.ndarray, face_valid: jnp.ndarray,
                           image_scale: int = 1, cs: int = 8,
                           cell_cap: int = 128) -> Fragments:
    """Pallas-kernel fragments: same binning, but the (C, cap, P) candidate
    evaluation never touches HBM."""
    H, W = cam.H // image_scale, cam.W // image_scale
    ncy, ncx, Hp, Wp = _cell_geometry(H, W, cs)

    screen = transform_points_screen(cam, verts)
    sxy = screen[:, :2] / image_scale
    sz = screen[:, 2]
    f0, f1, f2 = faces[:, 0], faces[:, 1], faces[:, 2]
    p0, p1, p2 = sxy[f0], sxy[f1], sxy[f2]
    z0, z1, z2 = sz[f0], sz[f1], sz[f2]
    front = (z0 > 0) & (z1 > 0) & (z2 > 0) & face_valid

    bb_min_x = jnp.minimum(jnp.minimum(p0[:, 0], p1[:, 0]), p2[:, 0])
    bb_max_x = jnp.maximum(jnp.maximum(p0[:, 0], p1[:, 0]), p2[:, 0])
    bb_min_y = jnp.minimum(jnp.minimum(p0[:, 1], p1[:, 1]), p2[:, 1])
    bb_max_y = jnp.maximum(jnp.maximum(p0[:, 1], p1[:, 1]), p2[:, 1])
    on_screen = (front & (bb_max_x >= 0) & (bb_min_x <= W - 1)
                 & (bb_max_y >= 0) & (bb_min_y <= H - 1))

    cells, evalid, prims = bbox_cell_entries(
        bb_min_x, bb_min_y, bb_max_x, bb_max_y, on_screen, cs, ncx, ncy)
    table, _, ovf = build_cell_table(cells, evalid, ncy * ncx, cell_cap)
    cand = jnp.where(table >= 0, prims[jnp.maximum(table, 0)], -1)
    cvalid = cand >= 0
    cf = jnp.maximum(cand, 0)

    F = faces.shape[0]
    # one 64-byte row gather per candidate, then relayout to (C, 16, cap)
    fdata = jnp.stack([
        p0[:, 0], p0[:, 1], p1[:, 0], p1[:, 1], p2[:, 0], p2[:, 1],
        z0, z1, z2, jnp.arange(F, dtype=verts.dtype),
        jnp.zeros((F,), verts.dtype), jnp.zeros((F,), verts.dtype),
        jnp.zeros((F,), verts.dtype), jnp.zeros((F,), verts.dtype),
        jnp.zeros((F,), verts.dtype), jnp.zeros((F,), verts.dtype),
    ], axis=1)                                       # (F, 16)
    arr = fdata[cf]                                  # (C, cap, 16)
    valid_row = cvalid.astype(verts.dtype)
    arr = jnp.concatenate([arr[..., :10], valid_row[..., None],
                           arr[..., 11:]], axis=-1)
    tri = jnp.swapaxes(arr, 1, 2)                    # (C, 16, cap)
    # block sublane dim (cb) must be a multiple of 8 for the Mosaic lowering
    cb = max(8, (_CB * 64) // (cs * cs))
    tri, C = _pad_cells(tri, cb)

    z, face, b0, b1, b2 = PR.mesh_fragments_cells(tri, cs, ncx, cb)
    z, face = z[:C], face[:C]
    bary = jnp.stack([b0[:C], b1[:C], b2[:C]], axis=-1)   # (C, P, 3)
    hit = face >= 0.0

    def to_image(flat, fill):
        img = flat.reshape(ncy, ncx, cs, cs, *flat.shape[2:])
        img = jnp.moveaxis(img, 2, 1).reshape(Hp, Wp, *flat.shape[2:])
        return img[:H, :W]

    big = jnp.asarray(jnp.inf, verts.dtype)
    return Fragments(
        pix_to_face=to_image(jnp.where(hit, face, -1.0), -1).astype(jnp.int32),
        bary=to_image(bary, 0.0),
        zbuf=to_image(jnp.where(hit, z, big), big),
        overflow=ovf.astype(jnp.int32),
    )


# ---------------------------------------------------------------------------
# Point-splat soft mask (gather-only, custom_vjp)
# ---------------------------------------------------------------------------

def splat_mask(cam: Camera, points: jnp.ndarray, point_valid: jnp.ndarray,
               radius_ndc: float, footprint: int = 9,
               image_scale: int = 1, cell_cap: int = 64,
               active_cells: int = 4096,
               return_overflow: bool = False):
    """Soft mask (H/s, W/s) in [0, 1] from world-space points.

    radius_ndc: splat radius in NDC units (the reference's
    point_render.radius config value).  Differentiable w.r.t. points and the
    camera; forward is a binned per-pixel gather, backward gathers the
    cotangent at each point's k x k footprint (both scatter-free).

    cell_cap: per-cell candidate slots (rounded up to a multiple of 64).  The
    trainer grows this from measured occupancy telemetry (a watermark-repair
    policy like the template caps) so production-density clouds never drop
    silhouette coverage — the parity contract is the reference's exhaustive
    per-pixel scatter (PointsRasterizer(points_per_pixel=50) keeps EVERY
    covering splat up to 50/px, model/CameraMine.py:266-304).

    active_cells: capacity of the ACTIVE-cell compaction (Pallas path only;
    cells the cloud actually touches — ~10% of cells at 1080p — are gathered
    into a fixed-size list so kernel work scales with silhouette coverage).
    Cells beyond the capacity are dropped and counted into stats[0]; the
    trainer grows the stage's value from stats[2].

    return_overflow=True additionally returns a (3,) int32 stats vector:
    [dropped candidate entries (cap overflow + dropped cells),
     max cell occupancy, active cell count].
    stats[0] > 0 means the mask is degrading; stats[1]/stats[2] are the
    cell_cap/active_cells values that would have sufficed.
    """
    H, W = cam.H // image_scale, cam.W // image_scale
    r_pix = radius_ndc * (cam.W / image_scale) / 2.0
    k = int(footprint)
    cap = max(64, -(-int(cell_cap) // 64) * 64)
    screen = transform_points_screen(cam, points)
    col = screen[:, 0] / image_scale
    row = screen[:, 1] / image_scale
    z = screen[:, 2]
    if PALLAS_ENABLED and 2.0 * r_pix <= 8.0:
        # splat bbox fits an 8px cell -> Pallas kernel path
        mask, stats = _splat_core_pl(col, row, z, point_valid, float(r_pix),
                                     H, W, cap, int(active_cells))
    else:
        mask, stats = _splat_core(col, row, z, point_valid, float(r_pix), H,
                                  W, k, cap)
    if return_overflow:
        return mask, stats
    return mask


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _splat_core(col, row, z, point_valid, r_pix, H, W, k, cell_cap):
    mask, _, stats = _splat_fwd_impl(col, row, z, point_valid, r_pix, H, W, k,
                                     cell_cap)
    return mask, stats


def _log_term(dc, dr, r_pix):
    d2 = dc * dc + dr * dr
    w = 1.0 - d2 / (r_pix * r_pix)
    w = jnp.clip(w, 0.0, 1.0 - 1e-5)
    return jnp.log1p(-w)  # 0 where w <= 0


def _splat_bin(col, row, z, point_valid, r_pix, H, W, k, cell_cap):
    """Shared binning for fwd and bwd (deterministic)."""
    cs = max(8, k)
    ncy, ncx, Hp, Wp = _cell_geometry(H, W, cs)
    ok = point_valid & (z > 0.0)
    half = r_pix
    cells, evalid, prims = bbox_cell_entries(
        col - half, row - half, col + half, row + half,
        ok & (col + half >= 0) & (col - half <= W - 1)
        & (row + half >= 0) & (row - half <= H - 1), cs, ncx, ncy)
    table, counts, ovf = build_cell_table(cells, evalid, ncy * ncx, cell_cap)
    cand = jnp.where(table >= 0, prims[jnp.maximum(table, 0)], -1)
    cell_ids = jnp.arange(ncy * ncx)
    lx = jnp.arange(cs)
    px = ((cell_ids % ncx) * cs)[:, None] + jnp.tile(lx, cs)[None, :]
    py = ((cell_ids // ncx) * cs)[:, None] + jnp.repeat(lx, cs)[None, :]
    stats = jnp.stack([ovf, counts.max(),
                       (counts > 0).sum()]).astype(jnp.int32)
    return (cs, ncy, ncx, Hp, Wp, table, cand, px, py, stats)


def _splat_cell_acc(col, row, cand, px, py, r_pix):
    """Per-cell accumulated log terms, differentiable in (col, row)."""
    cvalid = cand >= 0
    cp = jnp.maximum(cand, 0)
    ccol, crow = col[cp], row[cp]                   # (C,cap)
    dc = ccol[:, :, None] - px[:, None, :].astype(col.dtype)
    dr = crow[:, :, None] - py[:, None, :].astype(col.dtype)
    lt = _log_term(dc, dr, r_pix)
    lt = jnp.where(cvalid[:, :, None], lt, 0.0)
    return lt.sum(axis=1)                            # (C, P)


def _splat_fwd_impl(col, row, z, point_valid, r_pix, H, W, k, cell_cap):
    (cs, ncy, ncx, Hp, Wp, table, cand, px, py, stats) = _splat_bin(
        col, row, z, point_valid, r_pix, H, W, k, cell_cap)
    acc = _splat_cell_acc(col, row, cand, px, py, r_pix)
    img = acc.reshape(ncy, ncx, cs, cs)
    img = jnp.moveaxis(img, 2, 1).reshape(Hp, Wp)[:H, :W]
    return 1.0 - jnp.exp(img), img, stats


def _splat_core_fwd(col, row, z, point_valid, r_pix, H, W, k, cell_cap):
    mask, acc_img, stats = _splat_fwd_impl(col, row, z, point_valid, r_pix, H,
                                           W, k, cell_cap)
    return (mask, stats), (col, row, z, point_valid, mask)


def _splat_core_bwd(r_pix, H, W, k, cell_cap, res, g):
    """Transpose of the forward through the SAME cell structure: per-cell vjp
    (vectorized, ~forward cost) then one unique-index scatter of C*cap
    per-candidate grads back to points (tiny vs the 50x larger naive
    per-point-footprint scatter)."""
    col, row, z, point_valid, mask = res
    g, _ = g  # (mask cotangent, int overflow cotangent — discarded)
    # dL/dacc[px] = -g[px] * exp(acc[px]) = -g[px] * (1 - mask[px])
    cot_acc = -g * (1.0 - mask)
    (cs, ncy, ncx, Hp, Wp, table, cand, px, py, _ovf) = _splat_bin(
        col, row, z, point_valid, r_pix, H, W, k, cell_cap)
    # image -> per-cell pixel layout (C, P)
    cot_pad = jnp.pad(cot_acc, ((0, Hp - H), (0, Wp - W)))
    cot_cells = jnp.moveaxis(
        cot_pad.reshape(ncy, cs, ncx, cs), 1, 2).reshape(ncy * ncx, cs * cs)

    _, vjp = jax.vjp(
        lambda c_, r_: _splat_cell_acc(c_, r_, cand, px, py, r_pix), col, row)
    g_col, g_row = vjp(cot_cells)
    g_z = jnp.zeros_like(z)
    g_valid = jnp.zeros_like(point_valid)
    return g_col, g_row, g_z, g_valid


_splat_core.defvjp(_splat_core_fwd, _splat_core_bwd)


# ---------------------------------------------------------------------------
# Pallas splat path (cs=8, cap=128): VMEM forward + scatter-free backward
# ---------------------------------------------------------------------------

_SPLAT_CAP = 64   # default per-cell candidate slots (kept as the floor; the
                  # trainer grows its stage cap from occupancy telemetry —
                  # see splat_mask's cell_cap docstring)


def _splat_bin_pl(col, row, z, point_valid, r_pix, H, W, cap,
                  active_cells=4096):
    """Deterministic binning shared by the Pallas fwd and bwd.

    Two structural properties keep cost and memory bounded at production
    density (1080p acceptance scene: ~216k entries, 18225 cells, max cell
    occupancy ~600-900):

    * The (cells, cap) candidate table is NEVER materialized: only
      O(entries)+O(cells) sort products are returned, and fwd/bwd construct
      (A, <=_CAP_SLICE) table slices on the fly (`_cand_slice`).  Peak HBM is
      then independent of how far the occupancy watermark grows the cap (the
      dense table at cap=1152 was ~170 MB per tensor x N frames -> OOM).
    * Only ACTIVE cells (any candidate; ~10% of cells — the silhouette) are
      processed: their ids are compacted into a fixed-size (A,) list consumed
      by the scalar-prefetch kernels, so kernel work + DMA + gathers scale
      with silhouette coverage, not image area (measured 18.6x less splat
      work at the acceptance scene).  stats[2] reports the true active count
      for the trainer's watermark.
    """
    cs = 8
    ncy, ncx, Hp, Wp = _cell_geometry(H, W, cs)
    ok = point_valid & (z > 0.0)
    half = r_pix
    cells, evalid, prims = bbox_cell_entries(
        col - half, row - half, col + half, row + half,
        ok & (col + half >= 0) & (col - half <= W - 1)
        & (row + half >= 0) & (row - half <= H - 1), cs, ncx, ncy)
    n_cells = ncy * ncx
    M = cells.shape[0]
    key = jnp.where(evalid, cells, n_cells).astype(jnp.int32)
    payload = jnp.arange(M, dtype=jnp.int32)
    sorted_key, sorted_idx = jax.lax.sort_key_val(key, payload)
    crange = jnp.arange(n_cells + 1, dtype=jnp.int32)
    starts = jnp.searchsorted(sorted_key, crange, side="left")
    counts = (starts[1:] - starts[:-1]).astype(jnp.int32)
    _, rank = jax.lax.sort_key_val(sorted_idx, payload)

    # active-cell compaction (ascending ids, padded with the n_cells
    # sentinel whose count is defined as 0 below).  When the true active
    # count exceeds A, nonzero(..., size=A) keeps the ascending-id PREFIX —
    # the dropped cells are always the highest cell ids, i.e. the BOTTOM
    # image rows render mask=0 with zero gradient until the watermark grows
    # the list (at most remesh_intersect steps).  The drop is counted in ovf;
    # the spatial bias is acceptable only because the repair is prompt.
    A = min(int(active_cells), n_cells)
    A = -(-A // _CB) * _CB
    act_ids = jnp.nonzero(counts > 0, size=A, fill_value=n_cells)[0] \
        .astype(jnp.int32)
    counts_ext = jnp.concatenate(
        [counts, jnp.zeros((1,), counts.dtype)])
    starts_a = starts[act_ids]                     # (A,) run starts
    counts_a = counts_ext[act_ids]                 # (A,) run lengths
    n_active = (counts > 0).sum()
    kept = jnp.minimum(counts_a, cap).sum()
    ovf = evalid.sum().astype(jnp.int32) - kept    # cap drops + cell drops
    stats = jnp.stack([ovf, counts.max(), n_active]).astype(jnp.int32)
    return (cs, ncy, ncx, Hp, Wp, cells, evalid, sorted_idx,
            act_ids, starts_a, counts_a, rank, starts, stats)


def _cand_slice(sorted_idx, starts_rows, counts_rows, n_pts, cap, lo, S):
    """Slots [lo, lo+S) of the candidate table rows described by
    (starts_rows, counts_rows) (one row per ACTIVE cell): (A, S) point ids
    or -1.  Same slot->run-offset rule as binning.build_cell_table (identity
    when the cell fits, even stride when it overflows)."""
    from .binning import _strided_slot
    slot = jnp.arange(lo, lo + S, dtype=jnp.int32)
    off = _strided_slot(slot, counts_rows, cap)             # (A, S)
    pos = jnp.clip(starts_rows[:, None] + off, 0, sorted_idx.shape[0] - 1)
    in_range = slot[None, :] < counts_rows[:, None]
    entry = sorted_idx[pos]
    # entries are 4 stacked blocks of arange(n_pts) (bbox_cell_entries), so
    # the prim id is entry mod n_pts — no (4N,) prims array to carry
    return jnp.where(in_range, entry % n_pts, -1)


def _splat_pts_tensor(col, row, cand):
    """(C, 2, S) candidate attribute tensor: rows [col, row]; invalid
    entries carry a sentinel col >= BIG/2 (checked in-kernel), so the
    tensor is half the width of a separate validity row."""
    cvalid = cand >= 0
    cp = jnp.maximum(cand, 0)
    pdata = jnp.stack([col, row], axis=1)                 # (N, 2)
    arr = pdata[cp]                                       # (C, S, 2)
    arr = jnp.where(cvalid[..., None], arr,
                    jnp.asarray(PR.BIG, col.dtype))
    return jnp.swapaxes(arr, 1, 2)                        # (C, 2, S)


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _splat_core_pl(col, row, z, point_valid, r_pix, H, W, cap, acells):
    mask, _, stats = _splat_fwd_pl(col, row, z, point_valid, r_pix, H, W,
                                   cap, acells)
    return mask, stats


def _splat_fwd_pl(col, row, z, point_valid, r_pix, H, W, cap, acells,
                  bin_=None):
    if bin_ is None:
        bin_ = _splat_bin_pl(col, row, z, point_valid, r_pix, H, W, cap,
                             acells)
    (cs, ncy, ncx, Hp, Wp, cells, evalid, sorted_idx, act_ids, starts_a,
     counts_a, rank, starts, stats) = bin_
    N = col.shape[0]
    n_cells = ncy * ncx
    acc = None
    for lo in range(0, cap, PR._CAP_SLICE):
        S = min(PR._CAP_SLICE, cap - lo)
        cand = _cand_slice(sorted_idx, starts_a, counts_a, N, cap, lo, S)
        pts_t = _splat_pts_tensor(col, row, cand)           # (A, 2, S)
        acc_s = PR.splat_fwd_cells_idx(pts_t, act_ids, cs, ncx, r_pix, _CB)
        acc = acc_s if acc is None else acc + acc_s
    # scatter-free image assembly: gather each full cell's row from the
    # compacted accumulator (act_ids ascending; misses -> empty cell)
    crange = jnp.arange(n_cells, dtype=jnp.int32)
    pos = jnp.clip(jnp.searchsorted(act_ids, crange), 0,
                   act_ids.shape[0] - 1)
    found = act_ids[pos] == crange
    acc_full = jnp.where(found[:, None], acc[pos], 0.0)     # (C, P)
    img = acc_full.reshape(ncy, ncx, cs, cs)
    img = jnp.moveaxis(img, 2, 1).reshape(Hp, Wp)[:H, :W]
    return 1.0 - jnp.exp(img), img, stats


def _splat_core_pl_fwd(col, row, z, point_valid, r_pix, H, W, cap, acells):
    # binning products ride in the residuals so the backward skips the sort
    bin_ = _splat_bin_pl(col, row, z, point_valid, r_pix, H, W, cap, acells)
    mask, _, stats = _splat_fwd_pl(col, row, z, point_valid, r_pix, H, W,
                                   cap, acells, bin_)
    return (mask, stats), (col, row, z, point_valid, mask,
                           bin_[5], bin_[6], bin_[7], bin_[8], bin_[9],
                           bin_[10], bin_[11], bin_[12])


def _splat_core_pl_bwd(r_pix, H, W, cap, acells, res, g):
    """Backward without any sort or searchsorted over the entry axis: a
    Pallas kernel produces per-candidate (d col, d row) sums over the active
    cells' pixels; those reduce to per-point grads either by scatter-add on
    the candidate point ids ("scatter" mode) or by the inverse table
    permutation gathered per entry ("gather" mode, the default).  Slice loop
    mirrors the forward's.

    SRTPU_SPLAT_BWD=scatter selects the scatter-add reduction: kernel
    outputs for sentinel (padding) candidates are exactly zero, so adding
    every table position to its candidate's point row equals the per-entry
    gather over the selected subset."""
    (col, row, z, point_valid, mask, cells, evalid, sorted_idx, act_ids,
     starts_a, counts_a, rank, starts) = res
    g, _ = g  # (mask cotangent, int overflow cotangent — discarded)
    cot_acc = -g * (1.0 - mask)
    cs = 8
    ncy, ncx, Hp, Wp = _cell_geometry(H, W, cs)
    n_cells = ncy * ncx
    cot_pad = jnp.pad(cot_acc, ((0, Hp - H), (0, Wp - W)))
    cot_cells = jnp.moveaxis(
        cot_pad.reshape(ncy, cs, ncx, cs), 1, 2).reshape(n_cells, cs * cs)
    cot_act = cot_cells[jnp.clip(act_ids, 0, n_cells - 1)]  # (A, P)
    N = col.shape[0]

    if _os.environ.get("SRTPU_SPLAT_BWD", "gather") == "scatter":
        gcp = jnp.zeros_like(col, shape=(N + 1,))
        grp = jnp.zeros_like(row, shape=(N + 1,))
        for lo in range(0, cap, PR._CAP_SLICE):
            S = min(PR._CAP_SLICE, cap - lo)
            cand = _cand_slice(sorted_idx, starts_a, counts_a, N, cap, lo, S)
            pts_t = _splat_pts_tensor(col, row, cand)       # (A, 2, S)
            gc = PR.splat_bwd_cells_idx(pts_t, act_ids, cot_act, cs, ncx,
                                        r_pix, _CB)
            idx = jnp.where(cand >= 0, cand, N).reshape(-1)
            gcp = gcp.at[idx].add(gc[:, 0, :].reshape(-1))
            grp = grp.at[idx].add(gc[:, 1, :].reshape(-1))
        return (gcp[:-1], grp[:-1],
                jnp.zeros_like(z), jnp.zeros_like(point_valid))

    # per-entry inverse mapping: run offset -> table slot (stride-aware:
    # cells over capacity keep an even subsample of their run, binning.py)
    # + the entry's ACTIVE row.  The cell id -> active row map is a dense
    # (n_cells+1,) table built with one tiny scatter: a searchsorted over
    # the 4N entry axis costs log2(A) serialized gather rounds, this is one.
    from .binning import table_slot_of_rank
    A = act_ids.shape[0]
    inv_act = jnp.zeros((n_cells + 1,), jnp.int32).at[act_ids].set(
        jnp.arange(A, dtype=jnp.int32) + 1)
    arow1 = inv_act[jnp.clip(cells, 0, n_cells)]            # (4N,)
    in_act = arow1 > 0                                      # dropped cells out
    arow = jnp.maximum(arow1 - 1, 0)
    counts_c = counts_a[arow]                               # masked by in_act
    slot, selected = table_slot_of_rank(rank - starts_a[arow], counts_c, cap)
    in_table = evalid & selected & in_act
    g_col_e = jnp.zeros_like(col, shape=(4 * N,))
    g_row_e = jnp.zeros_like(row, shape=(4 * N,))
    for lo in range(0, cap, PR._CAP_SLICE):
        S = min(PR._CAP_SLICE, cap - lo)
        cand = _cand_slice(sorted_idx, starts_a, counts_a, N, cap, lo, S)
        pts_t = _splat_pts_tensor(col, row, cand)           # (A, 2, S)
        gc = PR.splat_bwd_cells_idx(pts_t, act_ids, cot_act, cs, ncx,
                                    r_pix, _CB)
        flat = gc.reshape(-1)
        in_s = in_table & (slot >= lo) & (slot < lo + S)
        local = jnp.clip(slot - lo, 0, S - 1)
        base = (arow * 2) * S + local
        g_col_e = g_col_e + jnp.where(in_s, flat[base], 0.0)
        g_row_e = g_row_e + jnp.where(in_s, flat[base + S], 0.0)
    g_col = g_col_e.reshape(4, N).sum(0)
    g_row = g_row_e.reshape(4, N).sum(0)
    return g_col, g_row, jnp.zeros_like(z), jnp.zeros_like(point_valid)


_splat_core_pl.defvjp(_splat_core_pl_fwd, _splat_core_pl_bwd)


# ---------------------------------------------------------------------------
# Reference scatter-based implementations (kept for parity tests)
# ---------------------------------------------------------------------------

def splat_mask_scatter(cam: Camera, points: jnp.ndarray,
                       point_valid: jnp.ndarray, radius_ndc: float,
                       footprint: int = 9, image_scale: int = 1
                       ) -> jnp.ndarray:
    """Original scatter-add formulation (slow on TPU; used in tests)."""
    H, W = cam.H // image_scale, cam.W // image_scale
    screen = transform_points_screen(cam, points)
    col = screen[:, 0] / image_scale
    row = screen[:, 1] / image_scale
    z = screen[:, 2]
    r_pix = radius_ndc * (cam.W / image_scale) / 2.0

    k = footprint
    half = (k - 1) // 2
    base_c = jnp.floor(col)
    base_r = jnp.floor(row)
    offs = jnp.arange(k, dtype=jnp.float32) - half
    cand_c = base_c[:, None] + offs[None, :]
    cand_r = base_r[:, None] + offs[None, :]
    dc = cand_c[:, None, :] - col[:, None, None]
    dr = cand_r[:, :, None] - row[:, None, None]
    d2 = dc * dc + dr * dr
    w = 1.0 - d2 / (r_pix * r_pix)
    okm = (
        (w > 0.0)
        & (z[:, None, None] > 0.0)
        & point_valid[:, None, None]
        & (cand_c[:, None, :] >= 0) & (cand_c[:, None, :] <= W - 1)
        & (cand_r[:, :, None] >= 0) & (cand_r[:, :, None] <= H - 1)
    )
    log_term = jnp.log1p(-jnp.clip(w, 0.0, 1.0 - 1e-5))
    ci = jnp.clip(cand_c.astype(jnp.int32), 0, W - 1)
    ri = jnp.clip(cand_r.astype(jnp.int32), 0, H - 1)
    pix = ri[:, :, None] * W + ci[:, None, :]
    pix = jnp.where(okm, pix, H * W)
    acc = jnp.zeros((H * W,), points.dtype)
    acc = acc.at[pix.reshape(-1)].add(
        jnp.where(okm, log_term, 0.0).reshape(-1), mode="drop")
    return (1.0 - jnp.exp(acc)).reshape(H, W)


def rasterize_mesh_scatter(cam: Camera, verts: jnp.ndarray,
                           faces: jnp.ndarray, face_valid: jnp.ndarray,
                           footprint: int = 10, image_scale: int = 1
                           ) -> Fragments:
    """Original scatter-min z-buffer (slow on TPU; used in tests)."""
    H, W = cam.H // image_scale, cam.W // image_scale
    screen = transform_points_screen(cam, verts)
    sxy = screen[:, :2] / image_scale
    sz = screen[:, 2]

    f0, f1, f2 = faces[:, 0], faces[:, 1], faces[:, 2]
    p0, p1, p2 = sxy[f0], sxy[f1], sxy[f2]
    z0, z1, z2 = sz[f0], sz[f1], sz[f2]
    front = (z0 > 0) & (z1 > 0) & (z2 > 0) & face_valid

    k = footprint
    bb_min_c = jnp.floor(jnp.minimum(jnp.minimum(p0[:, 0], p1[:, 0]), p2[:, 0]))
    bb_min_r = jnp.floor(jnp.minimum(jnp.minimum(p0[:, 1], p1[:, 1]), p2[:, 1]))
    offs = jnp.arange(k, dtype=jnp.float32)
    cand_c = bb_min_c[:, None] + offs[None, :]
    cand_r = bb_min_r[:, None] + offs[None, :]

    def edge(a, b, px, py):
        return ((b[:, 0] - a[:, 0])[:, None, None] * (py - a[:, 1][:, None, None])
                - (b[:, 1] - a[:, 1])[:, None, None] * (px - a[:, 0][:, None, None]))

    px = cand_c[:, None, :]
    py = cand_r[:, :, None]
    area = ((p1[:, 0] - p0[:, 0]) * (p2[:, 1] - p0[:, 1])
            - (p1[:, 1] - p0[:, 1]) * (p2[:, 0] - p0[:, 0]))
    w0 = edge(p1, p2, px, py)
    w1 = edge(p2, p0, px, py)
    w2 = edge(p0, p1, px, py)
    denom = jnp.where(jnp.abs(area) > 1e-12, area, 1.0)[:, None, None]
    b0 = w0 / denom
    b1 = w1 / denom
    b2 = w2 / denom
    inside = (b0 >= 0) & (b1 >= 0) & (b2 >= 0) & (jnp.abs(area) > 1e-12)[:, None, None]

    inv_z = (b0 / z0[:, None, None] + b1 / z1[:, None, None]
             + b2 / z2[:, None, None])
    zpix = 1.0 / jnp.clip(inv_z, 1e-12, None)

    okm = (inside & front[:, None, None]
           & (px >= 0) & (px <= W - 1) & (py >= 0) & (py <= H - 1))
    ci = jnp.clip(cand_c.astype(jnp.int32), 0, W - 1)[:, None, :]
    ri = jnp.clip(cand_r.astype(jnp.int32), 0, H - 1)[:, :, None]
    pix = jnp.broadcast_to(ri * W + ci, zpix.shape)
    pix_ok = jnp.where(okm, pix, H * W)

    big = jnp.asarray(jnp.inf, verts.dtype)
    zmin = jnp.full((H * W,), big, verts.dtype)
    zmin = zmin.at[pix_ok.reshape(-1)].min(
        jnp.where(okm, zpix, big).reshape(-1), mode="drop")

    fids = jnp.broadcast_to(
        jnp.arange(faces.shape[0], dtype=jnp.int32)[:, None, None], zpix.shape)
    is_winner = okm & (zpix == zmin[pix_ok])
    face_win = jnp.full((H * W,), jnp.iinfo(jnp.int32).max, jnp.int32)
    face_win = face_win.at[jnp.where(is_winner, pix_ok, H * W).reshape(-1)].min(
        fids.reshape(-1), mode="drop")
    hit = face_win != jnp.iinfo(jnp.int32).max
    face_win = jnp.where(hit, face_win, -1)

    fw = jnp.maximum(face_win, 0)
    q0, q1, q2 = sxy[faces[fw, 0]], sxy[faces[fw, 1]], sxy[faces[fw, 2]]
    y0_, y1_, y2_ = sz[faces[fw, 0]], sz[faces[fw, 1]], sz[faces[fw, 2]]
    gr = jnp.arange(H * W)
    pcx = (gr % W).astype(verts.dtype)
    pcy = (gr // W).astype(verts.dtype)

    def edge1(a, b, px_, py_):
        return (b[:, 0] - a[:, 0]) * (py_ - a[:, 1]) - (b[:, 1] - a[:, 1]) * (px_ - a[:, 0])

    area1 = (q1[:, 0] - q0[:, 0]) * (q2[:, 1] - q0[:, 1]) - (q1[:, 1] - q0[:, 1]) * (q2[:, 0] - q0[:, 0])
    denom1 = jnp.where(jnp.abs(area1) > 1e-12, area1, 1.0)
    c0 = edge1(q1, q2, pcx, pcy) / denom1
    c1 = edge1(q2, q0, pcx, pcy) / denom1
    c2 = edge1(q0, q1, pcx, pcy) / denom1
    t0 = c0 / jnp.clip(y0_, 1e-12, None)
    t1 = c1 / jnp.clip(y1_, 1e-12, None)
    t2 = c2 / jnp.clip(y2_, 1e-12, None)
    ts = jnp.clip(t0 + t1 + t2, 1e-12, None)
    bary = jnp.stack([t0 / ts, t1 / ts, t2 / ts], axis=-1)
    bary = jnp.where(hit[:, None], bary, 0.0)

    return Fragments(
        pix_to_face=face_win.reshape(H, W),
        bary=bary.reshape(H, W, 3),
        zbuf=jnp.where(hit, zmin, big).reshape(H, W),
    )
