import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow
import numpy as np

from selfreconcode_tpu.models.sdf import SDFNet, init_sdf_params, sdf_apply
from selfreconcode_tpu.engine.igr_init import igr_pretrain


def test_igr_pretrain_fits_sphere(key):
    # fit the SDF to a unit-ish sphere point cloud; after a few hundred steps
    # the zero level set should sit near radius 0.4 and the origin be inside
    net = SDFNet(hidden=(128,) * 4, skip_in=(2,))
    params = init_sdf_params(key, net)
    rng = np.random.default_rng(0)
    dirs = rng.standard_normal((2000, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    pts = jnp.asarray(dirs * 0.4)
    normals = jnp.asarray(dirs)
    params, info = igr_pretrain(
        jax.random.PRNGKey(1), params, net, pts, normals,
        n_iters=300, batch_size=512, lr=5e-3)
    assert np.isfinite(info["loss"])
    s_surf, _ = sdf_apply(params, net, pts[:256], 0.0)
    assert float(jnp.abs(s_surf).mean()) < 0.05
    s_o, _ = sdf_apply(params, net, jnp.zeros((1, 3)), 0.0)
    assert float(s_o[0]) < -0.1
    s_out, _ = sdf_apply(params, net, pts[:256] * 2.5, 0.0)
    assert float(s_out.mean()) > 0.1
