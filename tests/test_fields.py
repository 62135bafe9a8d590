import jax
import jax.numpy as jnp
import numpy as np

from selfreconcode_tpu.models.sdf import SDFNet, init_sdf_params, sdf_apply, sdf_value_and_grad
from selfreconcode_tpu.models.translator import (
    TranslatorNet, init_translator_params, translator_apply)
from selfreconcode_tpu.models.render import RenderNet, init_render_params, render_apply


def _perturbed_params(params, key, scale=0.02):
    """Add noise so the (geometrically zero-initialized) PE columns matter."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(key, len(leaves))
    noisy = [l + scale * jax.random.normal(k, l.shape) for l, k in zip(leaves, keys)]
    return jax.tree_util.tree_unflatten(treedef, noisy)


def test_sdf_geometric_init_is_approx_sphere(key):
    # Thresholds calibrated against a standalone torch re-execution of the
    # reference geometric init (model/network.py:41-70): origin sdf ~ -0.15,
    # monotone increasing in radius, outward gradients. The exact sphere of
    # radius `bias` is only approximate pre-IGR-pretraining.
    net = SDFNet()
    params = init_sdf_params(key, net)
    rng = np.random.default_rng(1)
    dirs = rng.normal(size=(256, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    on_sphere = jnp.asarray(dirs * net.bias)
    sdf_surf, feat = sdf_apply(params, net, on_sphere, ratio=None)
    assert feat.shape == (256, 256)
    assert float(jnp.abs(sdf_surf).mean()) < 0.3
    sdf_origin, _ = sdf_apply(params, net, jnp.zeros((1, 3)), ratio=None)
    assert float(sdf_origin[0]) < -0.1
    sdf_out, _ = sdf_apply(params, net, jnp.asarray(dirs * 1.5), ratio=None)
    assert float(sdf_out.mean()) > 0.3
    assert float(sdf_out.mean()) > float(sdf_surf.mean()) > float(sdf_origin[0])
    # gradients point outward on the sphere
    _, grad = sdf_value_and_grad(params, net, on_sphere, ratio=None)
    cos = (np.asarray(grad) * dirs).sum(-1) / np.linalg.norm(np.asarray(grad), axis=-1)
    assert cos.mean() > 0.9


def test_sdf_annealing_ratio_zero_vs_full(key):
    # Geometric init zeroes the PE columns, so annealing is a no-op at init
    # (true in the reference too); perturb params to make PE load-bearing.
    net = SDFNet()
    params = _perturbed_params(init_sdf_params(key, net), jax.random.PRNGKey(7))
    pts = jnp.asarray(np.random.default_rng(2).normal(size=(8, 3)).astype(np.float32) * 0.3)
    a, _ = sdf_apply(params, net, pts, ratio=0.0)
    b, _ = sdf_apply(params, net, pts, ratio=None)
    c, _ = sdf_apply(params, net, pts, ratio=1.0)
    # ratio=1 -> all bands fully on == None
    np.testing.assert_allclose(np.asarray(b), np.asarray(c), atol=1e-5)
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_sdf_jit_traced_ratio(key):
    net = SDFNet()
    params = _perturbed_params(init_sdf_params(key, net), jax.random.PRNGKey(8))
    pts = jnp.asarray(np.random.default_rng(9).normal(size=(4, 3)).astype(np.float32))

    @jax.jit
    def f(r):
        return sdf_apply(params, net, pts, ratio=r)[0]

    out1 = f(0.3)
    out2 = f(0.9)
    assert out1.shape == (4,)
    assert not np.allclose(np.asarray(out1), np.asarray(out2))


def test_translator_near_identity_at_init(key):
    net = TranslatorNet()
    params = init_translator_params(key, net)
    pts = jnp.asarray(np.random.default_rng(3).normal(size=(32, 3)).astype(np.float32))
    cond = jnp.zeros((32, net.cond_size))
    out, off = translator_apply(params, net, pts, cond, ratio=0.5)
    assert float(jnp.abs(off).max()) < 0.05
    np.testing.assert_allclose(np.asarray(out), np.asarray(pts + off), atol=1e-6)


def test_render_net_output_range(key):
    net = RenderNet()
    params = init_render_params(key, net)
    n = 16
    rng = np.random.default_rng(4)
    pts = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    normals = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    views = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    feats = jnp.asarray(rng.normal(size=(n, 256)).astype(np.float32))
    out = render_apply(params, net, pts, normals, views, feats, ratio=0.7)
    assert out.shape == (n, 3)
    assert float(jnp.abs(out).max()) <= 1.0
