"""Checkpoint round-trip + inference smoke on the synthetic scene."""
import os.path as osp

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from selfreconcode_tpu.engine.trainer import build_synthetic_trainer
from selfreconcode_tpu.engine.checkpoint import save_checkpoint, load_checkpoint
from selfreconcode_tpu.engine.inference import make_infer_fn


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ck"))
    tr, ds = build_synthetic_trainer(root, n_frames=8, H=48, W=48)
    tr.mc_cap_floor = 4096
    tr.set_stage("coarse")
    tr.override_stage(sample_pix=32, eik_tmp=128, vcap=4096, fcap=8192,
                      ecap=16384, surf_iters=3)
    tr.initialize_sdf(30)
    fids = np.array([0, 1, 2])
    tr.train_step(fids, ds.batch(fids), 1e-4, jax.random.PRNGKey(0))
    return tr, ds, root


def test_checkpoint_roundtrip(trained):
    tr, ds, root = trained
    path = osp.join(root, "ck.pkl")
    save_checkpoint(path, tr, epoch=3)
    p_before = jax.tree_util.tree_leaves(tr.state.params)[0].copy()
    v_before = np.asarray(tr.state.tmp.verts)
    ot_before = tr.opt_times
    # clobber, then restore
    tr.state = tr.state._replace(
        params=jax.tree_util.tree_map(lambda x: x * 0.0, tr.state.params))
    epoch = load_checkpoint(path, tr)
    assert epoch == 3
    assert tr.opt_times == ot_before
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(tr.state.params)[0]),
        np.asarray(p_before))
    np.testing.assert_array_equal(np.asarray(tr.state.tmp.verts), v_before)
    # training continues after restore
    fids = np.array([3, 4, 5])
    info = tr.train_step(fids, ds.batch(fids), 1e-4, jax.random.PRNGKey(1))
    assert np.isfinite(info["loss"])


def test_checkpoint_restores_bbox_and_mc_caps(trained):
    """Grown sweep-bbox + per-resolution MC caps are watermark state: a
    resumed run must not re-pay the grow-and-retry remeshes (VERDICT r3 #7).
    """
    tr, ds, root = trained
    b_min0 = np.asarray(tr.b_min).copy()
    b_max0 = np.asarray(tr.b_max).copy()
    tr.b_min = b_min0 - 0.08          # simulate two directional growths
    tr.b_max = b_max0 + 0.04
    tr._mc_caps[(9, 13, 9)] = (4096, 8192, 512)
    path = osp.join(root, "ck_bbox.pkl")
    save_checkpoint(path, tr, epoch=4)
    tr.b_min, tr.b_max = b_min0, b_max0
    tr._mc_caps.pop((9, 13, 9))
    load_checkpoint(path, tr)
    np.testing.assert_allclose(np.asarray(tr.b_min), b_min0 - 0.08)
    np.testing.assert_allclose(np.asarray(tr.b_max), b_max0 + 0.04)
    assert tuple(tr._mc_caps[(9, 13, 9)]) == (4096, 8192, 512)


def test_exact_resume_reproduces_uninterrupted_step(trained):
    """save -> load into a FRESH trainer -> one step must reproduce the
    uninterrupted run's step (loss + params) to fp tolerance, including the
    stage caps, template verts and inner-SGD momentum (VERDICT r2 #7 — the
    acceptance run resumes mid-stage, so resume must not perturb training).
    """
    from selfreconcode_tpu.engine.trainer import build_synthetic_trainer
    tr, ds, root = trained
    path = osp.join(root, "resume.pkl")
    save_checkpoint(path, tr, epoch=5)

    # uninterrupted continuation
    fids = np.array([5, 6, 7])
    key = jax.random.PRNGKey(42)
    info_a = tr.train_step(fids, ds.batch(fids), 1e-4, key)
    params_a = jax.tree_util.tree_map(np.asarray, tr.state.params)
    verts_a = np.asarray(tr.state.tmp.verts)

    # fresh trainer (same scene), restore, same step
    tr2, ds2 = build_synthetic_trainer(root, n_frames=8, H=48, W=48)
    tr2.mc_cap_floor = 4096
    epoch = load_checkpoint(path, tr2)
    assert epoch == 5
    # load_checkpoint restores stage name + caps from the payload; any
    # sample-count overrides the session had applied live are NOT part of a
    # checkpoint, so mirror tr's current static view exactly
    tr2.stage_cfg = tr.stage_cfg
    tr2._step_fn = None
    assert tr2.opt_times == tr.opt_times - 1
    info_b = tr2.train_step(fids, ds2.batch(fids), 1e-4, key)
    params_b = jax.tree_util.tree_map(np.asarray, tr2.state.params)

    np.testing.assert_allclose(info_b["loss"], info_a["loss"],
                               rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(params_a),
                    jax.tree_util.tree_leaves(params_b)):
        np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(tr2.state.tmp.verts), verts_a,
                               rtol=1e-5, atol=1e-6)


def test_infer_frame_outputs(trained):
    tr, ds, root = trained
    infer = make_infer_fn(tr, footprint=8)
    fd = ds.frame_data(0)
    out = infer(tr.state.params, tr.state.bank, tr.state.tmp,
                jnp.asarray(0, jnp.int32),
                jnp.asarray(fd["mask"].astype(np.float32)))
    H, W = ds.H, ds.W
    assert out["mesh_img"].shape == (H, W, 3)
    assert out["def1_img"].shape == (H, W, 3)
    assert out["color_img"].shape == (H, W, 3)
    assert np.isfinite(float(out["mask_err"]))
    assert 0.0 <= float(out["mask_err"]) <= 1.0
    # the mesh renders something (hit pixels exist) and shading is in range
    assert int(np.asarray(out["hit"]).sum()) > 10
    img = np.asarray(out["mesh_img"])
    assert img.min() >= 0.0 and img.max() <= 1.0


def test_infer_batched_matches_per_frame(trained):
    """infer_frame.batched (the --batch-size dispatch-pipelined path) must
    produce exactly the per-frame results — batching only reorders dispatch,
    never computation (reference infer.py:132 frame batching parity)."""
    tr, ds, root = trained
    infer = make_infer_fn(tr, footprint=8)
    fids = [0, 1, 2]
    masks = [jnp.asarray(ds.frame_data(f)["mask"].astype(np.float32))
             for f in fids]
    singles = [jax.device_get(infer(tr.state.params, tr.state.bank,
                                    tr.state.tmp, jnp.asarray(f, jnp.int32),
                                    m))
               for f, m in zip(fids, masks)]
    batched = [jax.device_get(o) for o in
               infer.batched(tr.state.params, tr.state.bank, tr.state.tmp,
                             fids, masks)]
    for s, b in zip(singles, batched):
        assert set(s.keys()) == set(b.keys())
        for k in s:
            np.testing.assert_allclose(np.asarray(b[k]), np.asarray(s[k]),
                                       rtol=1e-6, atol=1e-6, err_msg=k)
