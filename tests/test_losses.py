import jax.numpy as jnp
import numpy as np

from selfreconcode_tpu.engine import losses as L


def test_iou_mask_loss_perfect_and_disjoint():
    m = jnp.zeros((1, 8, 8)).at[0, 2:6, 2:6].set(1.0)
    assert float(L.iou_mask_loss(m, m)) < 1e-6
    n = jnp.zeros((1, 8, 8)).at[0, 0:2, 0:2].set(1.0)
    assert float(L.iou_mask_loss(m, n)) > 0.99


def test_max_pool_mask_dilates():
    m = jnp.zeros((1, 9, 9)).at[0, 4, 4].set(1.0)
    d = L.max_pool_mask(m, 2)
    assert d.shape == (1, 9, 9)
    assert float(d[0, 2, 2]) == 1.0 and float(d[0, 6, 6]) == 1.0
    assert float(d[0, 1, 1]) == 0.0
    # radius 0 is the identity
    np.testing.assert_array_equal(np.asarray(L.max_pool_mask(m, 0)),
                                  np.asarray(m))


def test_eikonal_loss_unit_gradients():
    g = jnp.tile(jnp.asarray([1.0, 0.0, 0.0]), (10, 1))
    v = jnp.ones((10,), bool)
    assert float(L.eikonal_loss(g, v)) < 1e-9
    assert float(L.eikonal_loss(2 * g, v)) == 1.0


def test_color_l1_per_frame_scatter_mean():
    # frame 0: error 1 on each of 2 rays; frame 1: error 0 -> mean = 0.5
    pred = jnp.zeros((4, 3))
    gt = jnp.asarray([[1, 0, 0], [0, 1, 0], [0, 0, 0], [0, 0, 0]], jnp.float32)
    binds = jnp.asarray([0, 0, 1, 1])
    valid = jnp.ones((4,), bool)
    out = float(L.color_l1_loss(pred, gt, binds, valid, 2))
    assert abs(out - 0.5) < 1e-6
    # invalid rays are excluded
    valid2 = jnp.asarray([True, False, True, True])
    out2 = float(L.color_l1_loss(pred, gt, binds, valid2, 2))
    assert abs(out2 - 0.5) < 1e-6  # frame0 mean still 1 (one valid ray)


def test_dct_prior_zero_for_constant_trajectory():
    from selfreconcode_tpu.utils.math import dct_null_space
    nullsp = jnp.asarray(dct_null_space(3, 10))
    traj = jnp.ones((2, 10, 24, 3))  # constant in time
    # constant signals live in the DC basis -> null-space projection ~ 0
    assert float(L.dct_prior_loss(nullsp, traj)) < 1e-6
    rng = np.random.default_rng(0)
    noisy = jnp.asarray(rng.standard_normal((2, 10, 24, 3)), jnp.float32)
    assert float(L.dct_prior_loss(nullsp, noisy)) > 0.1


def test_def_consistency_gm_vs_sqrt():
    d = jnp.ones((1, 4, 3)) * 0.1
    z = jnp.zeros((1, 4, 3))
    vv = jnp.ones((4,), bool)
    gm = float(L.def_consistency_loss(d, z, vv, c=0.01))
    sq = float(L.def_consistency_loss(d, z, vv, c=0.0))
    assert gm > 0 and sq > 0
    # sqrt form is the distance, GM saturates near 2
    assert abs(sq - np.sqrt(0.03)) < 1e-5
    assert gm < 2.1


def test_sdf_anchor_loss():
    s = jnp.asarray([0.1, -0.1, 0.0, 5.0])
    vv = jnp.asarray([True, True, True, False])
    out = float(L.sdf_anchor_loss(s, vv, 0.0))
    assert abs(out - (0.2 / 3)) < 1e-6
