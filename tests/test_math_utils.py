import jax
import jax.numpy as jnp
import numpy as np

from selfreconcode_tpu.utils import math as mu
from selfreconcode_tpu.utils import pe as pe_mod
from selfreconcode_tpu.utils.sampling import subsample_mask_topk


def test_quat2mat_identity_and_orthonormal(rng):
    q = jnp.array([[1.0, 0, 0, 0]])
    np.testing.assert_allclose(mu.quat2mat(q)[0], np.eye(3), atol=1e-6)
    q = jnp.asarray(rng.normal(size=(32, 4)).astype(np.float32))
    R = np.asarray(mu.quat2mat(q))
    np.testing.assert_allclose(R @ R.transpose(0, 2, 1), np.tile(np.eye(3), (32, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), np.ones(32), atol=1e-5)


def test_rodrigues_matches_scipy(rng):
    from scipy.spatial.transform import Rotation
    theta = rng.normal(size=(64, 3)).astype(np.float32) * 1.5
    R = np.asarray(mu.batch_rodrigues(jnp.asarray(theta)))
    R_ref = Rotation.from_rotvec(theta).as_matrix()
    np.testing.assert_allclose(R, R_ref, atol=1e-4)


def test_inv3x3(rng):
    m = rng.normal(size=(128, 3, 3)).astype(np.float32)
    m += np.eye(3) * 0.5  # keep most well-conditioned
    inv, check = mu.inv3x3(jnp.asarray(m))
    inv, check = np.asarray(inv), np.asarray(check)
    ok = check
    prod = m[ok] @ inv[ok]
    np.testing.assert_allclose(prod, np.tile(np.eye(3), (ok.sum(), 1, 1)), atol=1e-3)
    # singular matrix -> masked with zero inverse
    sing = np.zeros((1, 3, 3), np.float32)
    inv_s, check_s = mu.inv3x3(jnp.asarray(sing))
    assert not bool(check_s[0])
    assert np.all(np.asarray(inv_s) == 0)


def test_inv3x3_grad_matches_analytic(rng):
    m = jnp.asarray(rng.normal(size=(3, 3)).astype(np.float32) + np.eye(3, dtype=np.float32) * 2)

    def f(x):
        inv, _ = mu.inv3x3(x[None])
        return inv[0].sum()

    g = jax.grad(f)(m)
    # d(A^-1)/dA with cotangent G=ones: grad = -A^-T G A^-T
    inv = np.linalg.inv(np.asarray(m))
    expected = -(inv.T @ np.ones((3, 3), np.float32) @ inv.T)
    np.testing.assert_allclose(np.asarray(g), expected, atol=1e-3)


def test_cross_matrix(rng):
    v = jnp.asarray(rng.normal(size=(16, 3)).astype(np.float32))
    u = jnp.asarray(rng.normal(size=(16, 3)).astype(np.float32))
    out = jnp.einsum("bij,bj->bi", mu.cross_matrix(v), u)
    np.testing.assert_allclose(np.asarray(out), np.cross(np.asarray(v), np.asarray(u)), atol=1e-5)


def test_dct_orthonormal():
    full = mu.dct_space(30, 30)
    np.testing.assert_allclose(full @ full.T, np.eye(30), atol=1e-5)
    null = mu.dct_null_space(10, 30)
    assert null.shape == (20, 30)
    # constant + low-freq signals are annihilated-ish by the null space
    t = np.arange(30, dtype=np.float32)
    smooth = np.cos(np.pi * (t + 0.5) * 2 / 30)
    assert np.abs(null @ smooth).max() < 1e-4


def test_log_singular_values(rng):
    # Realistic def_regu regime: J ~ I + small perturbation (well-conditioned).
    # For near-singular J the eigh(J^T J) route loses f32 precision, but there
    # the GM robustifier is saturated so the loss is insensitive.
    jac = 0.3 * rng.normal(size=(64, 3, 3)).astype(np.float32) + np.eye(3, dtype=np.float32)
    out = np.asarray(mu.log_singular_values_sq_sum(jnp.asarray(jac)))
    s = np.linalg.svd(jac, compute_uv=False)
    expected = (np.log(s) ** 2).sum(-1)
    # f32 eigh vs f64 svd: a few percent on (log sigma)^2 is expected
    np.testing.assert_allclose(out, expected, rtol=0.08, atol=0.02)


def test_gm_robust():
    # GM(x^2) with square=True equals GM(x) with square=False
    x = jnp.asarray(np.linspace(0, 3, 10, dtype=np.float32))
    a = mu.gm_robust(x * x, 0.5, square=True)
    b = mu.gm_robust(x, 0.5, square=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_annealing_weights_matches_reference_formula():
    multires, ratio = 6, 0.37
    w = np.asarray(pe_mod.annealing_band_weights(multires, ratio))
    alpha = ratio * multires
    expected = [(1.0 - np.cos(np.pi * min(max(alpha - k, 0.0), 1.0))) / 2.0 for k in range(multires)]
    np.testing.assert_allclose(w, expected, atol=1e-6)


def test_positional_encoding_shapes_and_ordering():
    x = jnp.asarray(np.array([[0.1, -0.2, 0.3]], np.float32))
    out = np.asarray(pe_mod.positional_encoding(x, 4))
    assert out.shape == (1, 3 * (1 + 8))
    np.testing.assert_allclose(out[0, :3], np.asarray(x)[0], atol=1e-7)
    # block 1 is sin(2^0 x), block 2 is cos(2^0 x), block 3 sin(2 x)...
    np.testing.assert_allclose(out[0, 3:6], np.sin(np.asarray(x)[0]), atol=1e-6)
    np.testing.assert_allclose(out[0, 6:9], np.cos(np.asarray(x)[0]), atol=1e-6)
    np.testing.assert_allclose(out[0, 9:12], np.sin(2 * np.asarray(x)[0]), atol=1e-6)
    # ratio=0 kills all bands but keeps input
    out0 = np.asarray(pe_mod.positional_encoding(x, 4, ratio=0.0))
    np.testing.assert_allclose(out0[0, 3:], 0.0, atol=1e-7)
    np.testing.assert_allclose(out0[0, :3], np.asarray(x)[0], atol=1e-7)
    # large ratio == no annealing
    out1 = np.asarray(pe_mod.positional_encoding(x, 4, ratio=10.0))
    np.testing.assert_allclose(out1, out, atol=1e-6)


def test_subsample_mask_topk(key):
    valid = jnp.asarray(np.array([True] * 5 + [False] * 10))
    idx, sel = subsample_mask_topk(key, valid, 8)
    idx, sel = np.asarray(idx), np.asarray(sel)
    assert sel.sum() == 5
    assert set(idx[sel]) == set(range(5))


def test_eigvals_sym3_matches_eigvalsh():
    from selfreconcode_tpu.utils.math import eigvals_sym3
    rng = np.random.default_rng(3)
    J = rng.standard_normal((500, 3, 3)).astype(np.float32)
    A = np.einsum("...ji,...jk->...ik", J, J)
    ref = np.sort(np.linalg.eigvalsh(A.astype(np.float64)), -1)
    got = np.sort(np.asarray(eigvals_sym3(jnp.asarray(A))), -1)
    scale = np.abs(ref).max(-1, keepdims=True)
    np.testing.assert_allclose(got, ref, atol=2e-4 * scale.max())
    # degenerate (isotropic) case
    iso = np.repeat(np.eye(3, dtype=np.float32)[None] * 2.5, 4, axis=0)
    got_iso = np.asarray(eigvals_sym3(jnp.asarray(iso)))
    np.testing.assert_allclose(got_iso, 2.5, atol=1e-6)
    # differentiable
    g = jax.grad(lambda a: eigvals_sym3(a).sum())(jnp.asarray(A[:8]))
    assert np.isfinite(np.asarray(g)).all()
