"""PointRend-style uncertainty selection (ops/uncertainty.py) vs the
reference semantics of MCAcc/utils.py:172-318 computed independently in
numpy."""
import numpy as np
import jax.numpy as jnp

from selfreconcode_tpu.ops.uncertainty import (
    calculate_uncertainty, uncertain_points_grid2d, uncertain_points_grid3d)


def _np_topk_coords(flat, k):
    order = np.argsort(-flat, kind="stable", axis=-1)[..., :k]
    return order


def test_calculate_uncertainty_class_agnostic():
    logits = np.random.RandomState(0).randn(4, 1, 5, 5).astype(np.float32)
    u = np.asarray(calculate_uncertainty(jnp.asarray(logits)))
    np.testing.assert_allclose(u, -np.abs(logits - 0.5), rtol=1e-6)


def test_calculate_uncertainty_class_specific():
    rs = np.random.RandomState(1)
    logits = rs.randn(3, 4, 6).astype(np.float32)
    classes = np.array([2, 0, 3])
    u = np.asarray(calculate_uncertainty(jnp.asarray(logits),
                                         jnp.asarray(classes)))
    expect = -np.abs(logits[np.arange(3), classes][:, None] - 0.5)
    np.testing.assert_allclose(u, expect, rtol=1e-6)


def test_grid2d_topk_matches_numpy():
    rs = np.random.RandomState(2)
    m = rs.rand(2, 1, 7, 9).astype(np.float32)
    idx, coords, valid = uncertain_points_grid2d(jnp.asarray(m), 10)
    idx, coords, valid = map(np.asarray, (idx, coords, valid))
    assert valid.all()
    flat = m.reshape(2, -1)
    # same score multiset as a host top-k (ties may permute)
    np.testing.assert_allclose(
        np.sort(np.take_along_axis(flat, idx, 1), axis=1),
        np.sort(np.take_along_axis(flat, _np_topk_coords(flat, 10), 1),
                axis=1))
    # coord convention: x = idx % W, y = idx // W (reference utils.py:268-270)
    np.testing.assert_array_equal(coords[..., 0], idx % 9)
    np.testing.assert_array_equal(coords[..., 1], idx // 9)


def test_grid3d_coords_convention():
    rs = np.random.RandomState(3)
    D, H, W = 4, 5, 6
    m = rs.rand(1, 1, D, H, W).astype(np.float32)
    idx, coords, valid = uncertain_points_grid3d(jnp.asarray(m), 8)
    idx, coords = np.asarray(idx), np.asarray(coords)
    # x-fastest unravel (reference utils.py:196-198)
    np.testing.assert_array_equal(coords[..., 0], idx % W)
    np.testing.assert_array_equal(coords[..., 1], idx % (H * W) // W)
    np.testing.assert_array_equal(coords[..., 2], idx // (H * W))
    # selected scores are the global top-8
    flat = np.sort(m.reshape(-1))[::-1]
    got = np.sort(m.reshape(-1)[idx[0]])[::-1]
    np.testing.assert_allclose(got, flat[:8])


def test_clip_min_pads_instead_of_truncating():
    m = np.zeros((1, 1, 4, 4), np.float32)
    m[0, 0, 1, 2] = 0.9
    m[0, 0, 3, 0] = 0.7
    idx, coords, valid = uncertain_points_grid2d(jnp.asarray(m), 5,
                                                 clip_min=0.5)
    idx, valid = np.asarray(idx), np.asarray(valid)
    # only the two above-threshold cells are valid; the rest are padding
    assert valid.sum() == 2
    picked = set(idx[0, valid[0]].tolist())
    assert picked == {1 * 4 + 2, 3 * 4 + 0}
    # valid entries come first (top-k of -inf-masked scores)
    assert valid[0, :2].all() and not valid[0, 2:].any()
