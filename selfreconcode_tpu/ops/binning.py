"""Sort-based spatial binning: gather-only candidate tables.

XLA TPU scatters serialize (~1e5 elements/ms measured on v5e), so the
rasterizers avoid them entirely: primitives are binned into image cells with
one `lax.sort`, and a fixed-capacity per-cell candidate table is built with
searchsorted + gathers.  Consumers then evaluate per-pixel candidates with
pure gathers/reductions; gradients (where needed) flow through a per-primitive
gather of the cotangent image — also scatter-free.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def build_cell_table(cell_ids: jnp.ndarray, valid: jnp.ndarray,
                     n_cells: int, cap: int):
    """cell_ids (M,) int32 in [0, n_cells) (invalid entries arbitrary),
    valid (M,) bool -> (table (n_cells, cap) int32 entry-index or -1,
    counts (n_cells,), overflow ()).

    Entry order within a cell follows the sort (stable by construction of
    the key).  Cells with more than `cap` entries keep an EVEN STRIDE of
    their run (positions floor(slot*count/cap)) rather than the first cap:
    entry order is spatially coherent (MC emission order), so a prefix
    truncation would drop a contiguous spatial chunk of the cell, while the
    stride keeps coverage uniform.  Dropped entries are counted in
    `overflow`.
    """
    M = cell_ids.shape[0]
    key = jnp.where(valid, cell_ids, n_cells).astype(jnp.int32)
    payload = jnp.arange(M, dtype=jnp.int32)
    sorted_key, sorted_idx = jax.lax.sort_key_val(key, payload)
    cells = jnp.arange(n_cells + 1, dtype=jnp.int32)
    starts = jnp.searchsorted(sorted_key, cells, side="left")
    counts = (starts[1:] - starts[:-1]).astype(jnp.int32)
    slot = jnp.arange(cap, dtype=jnp.int32)
    off = _strided_slot(slot, counts, cap)                  # (n_cells, cap)
    gather_pos = starts[:-1, None] + off
    in_range = slot[None, :] < counts[:, None]
    gather_pos = jnp.clip(gather_pos, 0, M - 1)
    table = jnp.where(in_range, sorted_idx[gather_pos], -1)
    overflow = jnp.maximum(counts - cap, 0).sum()
    return table, counts, overflow


def _strided_slot(slot, counts, cap: int):
    """Per-cell entry offset for table slot: identity when the cell fits,
    floor(slot*count/cap) when it overflows (even subsample of the run)."""
    over = counts[:, None] > cap
    strided = (slot[None, :] * counts[:, None]) // cap
    return jnp.where(over, strided, slot[None, :])


def build_cell_table_full(cell_ids: jnp.ndarray, valid: jnp.ndarray,
                          n_cells: int, cap: int):
    """build_cell_table + the pieces needed to invert the table:

    returns (table, counts, overflow, starts (n_cells+1,), rank (M,)) where
    rank[e] is entry e's position in the sorted order; invert with
    `table_slot_of_rank`.  All gather/sort only (the inverse permutation
    comes from a second sort_key_val, not a scatter).
    """
    M = cell_ids.shape[0]
    key = jnp.where(valid, cell_ids, n_cells).astype(jnp.int32)
    payload = jnp.arange(M, dtype=jnp.int32)
    sorted_key, sorted_idx = jax.lax.sort_key_val(key, payload)
    cells = jnp.arange(n_cells + 1, dtype=jnp.int32)
    starts = jnp.searchsorted(sorted_key, cells, side="left")
    counts = (starts[1:] - starts[:-1]).astype(jnp.int32)
    slot = jnp.arange(cap, dtype=jnp.int32)
    off = _strided_slot(slot, counts, cap)
    gather_pos = starts[:-1, None] + off
    in_range = slot[None, :] < counts[:, None]
    gather_pos = jnp.clip(gather_pos, 0, M - 1)
    table = jnp.where(in_range, sorted_idx[gather_pos], -1)
    overflow = jnp.maximum(counts - cap, 0).sum()
    _, rank = jax.lax.sort_key_val(sorted_idx, payload)
    return table, counts, overflow, starts, rank


def table_slot_of_rank(r, count, cap: int):
    """Invert the (possibly strided) slot selection: for an entry at
    run-offset r in a cell with `count` entries, return (slot, selected).
    Non-overflow: slot = r, selected iff r < count <= cap... (r < cap).
    Overflow: slot s maps to offset (s*count)//cap, strictly increasing, so
    s = ceil(r*cap/count) and selected iff it maps back exactly."""
    over = count > cap
    cnt = jnp.maximum(count, 1)
    s_over = (r * cap + cnt - 1) // cnt
    hit_over = ((s_over * cnt) // cap == r) & (s_over < cap)
    slot = jnp.where(over, s_over, r)
    selected = jnp.where(over, hit_over, r < cap)
    return slot, selected & (r >= 0)


def entry_ranks(sorted_idx: jnp.ndarray) -> jnp.ndarray:
    """rank[e] = position of entry e in sorted_idx (inverse permutation via a
    second sort — scatter-free)."""
    M = sorted_idx.shape[0]
    _, rank = jax.lax.sort_key_val(sorted_idx,
                                   jnp.arange(M, dtype=jnp.int32))
    return rank


def bbox_cell_entries(bb_min_x, bb_min_y, bb_max_x, bb_max_y, valid,
                      cell_size: int, ncx: int, ncy: int):
    """Per-primitive 2x2 cell coverage entries.

    Primitive bboxes are guaranteed <= cell_size (callers choose cell_size
    from the primitive size bound), so each touches at most a 2x2 cell block.
    Returns (cell_ids (4M,), entry_valid (4M,), prim_ids (4M,)).
    """
    cx0 = jnp.floor(bb_min_x / cell_size).astype(jnp.int32)
    cy0 = jnp.floor(bb_min_y / cell_size).astype(jnp.int32)
    cx1 = jnp.floor(bb_max_x / cell_size).astype(jnp.int32)
    cy1 = jnp.floor(bb_max_y / cell_size).astype(jnp.int32)
    M = bb_min_x.shape[0]
    prim = jnp.arange(M, dtype=jnp.int32)
    cells, valids, prims = [], [], []
    for dy in (0, 1):
        for dx in (0, 1):
            cx = jnp.where(dx == 0, cx0, cx1)
            cy = jnp.where(dy == 0, cy0, cy1)
            distinct = ((dx == 0) | (cx1 > cx0)) & ((dy == 0) | (cy1 > cy0))
            ok = (valid & distinct & (cx >= 0) & (cx < ncx) & (cy >= 0)
                  & (cy < ncy))
            cells.append(jnp.where(ok, cy * ncx + cx, 0))
            valids.append(ok)
            prims.append(prim)
    return (jnp.concatenate(cells), jnp.concatenate(valids),
            jnp.concatenate(prims))
