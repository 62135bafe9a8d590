"""Real-asset schema exercises (VERDICT r1 next-step #7).

The non-redistributable `*_smpl_with_cocoplus_reg.pkl` never ships in CI, so
these tests synthesize a schema-exact pickle (scipy-sparse J_regressor,
(V,3,B) shapedirs, uint32 kintree_table with the 4294967295 root sentinel —
reference smpl_pytorch/SMPL.py:40-75) and drive the REAL loading + FK code
path through it, plus an independent numpy FK cross-check and a
people_snapshot preprocessing smoke test on generated inputs.
"""
import os.path as osp
import pickle

import numpy as np
import jax.numpy as jnp
import pytest

from selfreconcode_tpu.models.smpl import (
    load_smpl_pickle, smpl_forward, shaped_verts_and_joints,
    global_rigid_transform, SMPL_PARENTS, NUM_JOINTS)
from selfreconcode_tpu.models.synthetic_body import (
    synthetic_body_model, save_smpl_pickle)
from selfreconcode_tpu.utils.math import batch_rodrigues


def _small_body():
    # small target keeps the fast tier fast; full-6890 fidelity is exercised
    # by the acceptance run, not unit tests
    return synthetic_body_model(n_verts=2000, res=40)


def test_pickle_schema_round_trip(tmp_path):
    model = _small_body()
    p = str(tmp_path / "female_smpl_with_cocoplus_reg.pkl")
    save_smpl_pickle(model, p)

    # the on-disk layout really is the reference schema
    with open(p, "rb") as f:
        raw = pickle.load(f, encoding="latin1")
    assert hasattr(raw["J_regressor"], "todense")  # scipy sparse, as shipped
    V = raw["v_template"].shape[0]
    assert raw["shapedirs"].shape == (V, 3, 10)
    assert raw["posedirs"].shape == (V, 3, 207)
    assert raw["kintree_table"].dtype == np.uint32
    assert raw["kintree_table"][0, 0] == np.uint32(4294967295)

    loaded = load_smpl_pickle(p)
    np.testing.assert_allclose(np.asarray(loaded.v_template),
                               np.asarray(model.v_template), atol=1e-6)
    np.testing.assert_allclose(np.asarray(loaded.shapedirs),
                               np.asarray(model.shapedirs), atol=1e-6)
    np.testing.assert_allclose(np.asarray(loaded.posedirs),
                               np.asarray(model.posedirs), atol=1e-6)
    np.testing.assert_allclose(np.asarray(loaded.j_regressor),
                               np.asarray(model.j_regressor), atol=1e-6)
    np.testing.assert_allclose(np.asarray(loaded.weights),
                               np.asarray(model.weights), atol=1e-6)
    np.testing.assert_array_equal(loaded.parents, SMPL_PARENTS)
    np.testing.assert_array_equal(loaded.faces, model.faces)


def test_fk_matches_independent_numpy(tmp_path):
    """FK through the LOADED pickle vs a straightforward recursive numpy FK
    (independent of utils.math / make_homo)."""
    p = str(tmp_path / "male_smpl_with_cocoplus_reg.pkl")
    save_smpl_pickle(_small_body(), p)
    model = load_smpl_pickle(p)

    rng = np.random.default_rng(3)
    theta = rng.normal(0, 0.3, (1, 24, 3)).astype(np.float32)
    beta = rng.normal(0, 1.0, (1, 10)).astype(np.float32)
    _, joints = shaped_verts_and_joints(model, jnp.asarray(beta))
    joints_np = np.asarray(joints)[0].astype(np.float64)

    # independent FK: world transform of joint i = parent's * local
    def rodrigues_np(a):
        t = np.linalg.norm(a)
        if t < 1e-12:
            return np.eye(3)
        k = a / t
        K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
        return np.eye(3) + np.sin(t) * K + (1 - np.cos(t)) * (K @ K)

    world = [None] * NUM_JOINTS
    for i in range(NUM_JOINTS):
        R = rodrigues_np(theta[0, i].astype(np.float64))
        t = (joints_np[i] - joints_np[SMPL_PARENTS[i]]) if i > 0 else joints_np[0]
        local = np.eye(4)
        local[:3, :3] = R
        local[:3, 3] = t
        world[i] = local if i == 0 else world[SMPL_PARENTS[i]] @ local
    posed_np = np.stack([w[:3, 3] for w in world])

    Rs = batch_rodrigues(jnp.asarray(theta.reshape(-1, 3))).reshape(
        1, NUM_JOINTS, 3, 3)
    posed, A = global_rigid_transform(Rs, joints, model.parents)
    np.testing.assert_allclose(np.asarray(posed)[0], posed_np, atol=2e-5)

    # rest pose: identity rotations -> verts unchanged by skinning
    v0, j0, _ = smpl_forward(model, jnp.asarray(beta),
                             jnp.zeros((1, 24, 3), jnp.float32))
    v_shaped, _ = shaped_verts_and_joints(model, jnp.asarray(beta))
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v_shaped),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(j0)[0], joints_np, atol=2e-5)


def test_synthetic_body_watertight_and_exact():
    model = _small_body()
    verts = np.asarray(model.v_template)
    faces = np.asarray(model.faces)
    assert verts.shape == (2000, 3)
    # watertight + consistently oriented: every undirected edge appears in
    # EXACTLY two faces, once per direction
    e = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]])
    key_dir = (e[:, 0].astype(np.int64) << 32) | e[:, 1]
    assert len(np.unique(key_dir)) == len(key_dir)  # each directed edge once
    key_und = (np.minimum(e[:, 0], e[:, 1]).astype(np.int64) << 32) \
        | np.maximum(e[:, 0], e[:, 1])
    _, counts = np.unique(key_und, return_counts=True)
    assert (counts == 2).all()
    # joint regressor is EXACT at beta=0 (synthetic_body._joint_regressor)
    _, joints = shaped_verts_and_joints(model, jnp.zeros((1, 10), jnp.float32))
    jr_joints = verts.T @ np.asarray(model.j_regressor)
    np.testing.assert_allclose(np.asarray(joints)[0], jr_joints.T, atol=1e-3)
    # skinning weights: rows sum to 1, nonnegative
    w = np.asarray(model.weights)
    np.testing.assert_allclose(w.sum(-1), 1.0, atol=1e-5)
    assert (w >= 0).all()


def test_people_snapshot_smoke(tmp_path):
    """cli/people_snapshot on generated inputs (people_snapshot_process.py
    parity: masks.hdf5 + mp4 + camera.pkl + reconstructed_poses.hdf5)."""
    import cv2
    import h5py
    from selfreconcode_tpu.cli import people_snapshot

    root = tmp_path / "female-9-test"
    root.mkdir()
    F, H, W = 4, 32, 24
    rng = np.random.default_rng(0)
    masks = (rng.random((F, H, W)) > 0.5).astype(np.uint8)
    with h5py.File(root / "masks.hdf5", "w") as f:
        f.create_dataset("masks", data=masks)
    vw = cv2.VideoWriter(str(root / "vid.mp4"),
                         cv2.VideoWriter_fourcc(*"mp4v"), 10.0, (W, H))
    if not vw.isOpened():
        pytest.skip("cv2 mp4 encoder unavailable")
    for i in range(F):
        vw.write(np.full((H, W, 3), 40 * i, np.uint8))
    vw.release()
    with open(root / "camera.pkl", "wb") as f:
        pickle.dump({"camera_rt": np.zeros(3), "camera_t": np.array([0, 0, 2.0]),
                     "camera_f": np.array([500.0, 500.0]),
                     "camera_c": np.array([W / 2, H / 2])}, f, protocol=2)
    with h5py.File(root / "reconstructed_poses.hdf5", "w") as f:
        f.create_dataset("betas", data=rng.normal(0, 1, 10))
        f.create_dataset("pose", data=rng.normal(0, 0.1, (F, 72)))
        f.create_dataset("trans", data=rng.normal(0, 0.1, (F, 3)))

    out = tmp_path / "out"
    people_snapshot.main(["--root", str(root), "--save_root", str(out),
                          "--sid", "1"])

    assert len(list((out / "masks").glob("*.png"))) == F - 1
    assert len(list((out / "imgs").glob("*.png"))) == F - 1
    cam = np.load(out / "camera.npz")
    assert float(cam["fx"]) == 500.0 and float(cam["cy"]) == H / 2
    np.testing.assert_allclose(
        cam["quat"], [np.cos(np.pi / 2), 0, 0, np.sin(np.pi / 2)], atol=1e-12)
    rec = np.load(out / "smpl_rec.npz")
    assert rec["poses"].shape == (F - 1, 24, 3)
    assert rec["trans"].shape == (F - 1, 3)
    assert str(rec["gender"]) == "female"


def test_schema_validator_rejects_corrupt_pickles(tmp_path):
    """load_smpl_pickle meets a real downloaded asset for the first time in a
    user's hands — every schema deviation must raise an actionable
    SMPLSchemaError naming the offending field, not a shape traceback deep in
    the FK (VERDICT r4 next #8)."""
    from selfreconcode_tpu.models.smpl import SMPLSchemaError

    model = _small_body()
    good_path = str(tmp_path / "neutral_smpl_with_cocoplus_reg.pkl")
    save_smpl_pickle(model, good_path)
    with open(good_path, "rb") as f:
        good = pickle.load(f, encoding="latin1")

    def corrupt(name, mutate):
        data = dict(good)
        mutate(data)
        p = str(tmp_path / f"bad_{name}.pkl")
        with open(p, "wb") as f:
            pickle.dump(data, f, protocol=2)
        with pytest.raises(SMPLSchemaError) as e:
            load_smpl_pickle(p)
        return str(e.value)

    msg = corrupt("missing", lambda d: d.pop("weights"))
    assert "weights" in msg
    msg = corrupt("posedirs", lambda d: d.update(
        posedirs=d["posedirs"][..., :206]))
    assert "posedirs" in msg and "207" in msg
    msg = corrupt("faces", lambda d: d.update(
        f=np.concatenate([d["f"], [[0, 1, d["v_template"].shape[0]]]])))
    assert "face" in msg
    V = good["v_template"].shape[0]
    msg = corrupt("jreg", lambda d: d.update(
        J_regressor=np.zeros((V, NUM_JOINTS + 1))))
    assert "J_regressor" in msg
    bad_kintree = np.array(good["kintree_table"])
    bad_kintree[0, 5] = 10  # child before parent breaks the unrolled FK
    msg = corrupt("kintree", lambda d: d.update(kintree_table=bad_kintree))
    assert "kintree" in msg and "topologically" in msg
    msg = corrupt("wsum", lambda d: d.update(weights=d["weights"] * 2.0))
    assert "convex" in msg
    msg = corrupt("notdict", lambda d: [d.clear(), d.update({})][0] or None)
    assert "missing required key" in msg

    # plain-SMPL (24,V) J_regressor orientation is normalized, not rejected
    data = dict(good)
    data["J_regressor"] = np.asarray(
        good["J_regressor"].todense()).T
    p = str(tmp_path / "transposed_jr.pkl")
    with open(p, "wb") as f:
        pickle.dump(data, f, protocol=2)
    loaded = load_smpl_pickle(p)
    np.testing.assert_allclose(np.asarray(loaded.j_regressor),
                               np.asarray(model.j_regressor), atol=1e-6)
