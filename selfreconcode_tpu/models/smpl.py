"""SMPL body model in JAX.

Parity targets: smpl_pytorch/SMPL.py (v_template + shapedirs + posedirs,
J_regressor, LBS weights, kinematic chain) and smpl_pytorch/util.py:70-103
(batch_global_rigid_transformation).  The model file is the standard
`*_smpl_with_cocoplus_reg.pkl` the reference README asks the user to download
(smpl_pytorch/SMPL.py:175-176); when no asset is available (tests / CI) a
deterministic synthetic "toy" model with the same tensor shapes and a valid
kinematic tree is generated instead.

TPU-first notes: the 24-joint forward-kinematics chain is unrolled at trace
time (parents[i] < i always holds for SMPL), producing 24 tiny matmuls that
XLA fuses; all heavy work (shape blend, pose blend, skinning) is batched
matmul on the MXU.
"""
from __future__ import annotations

import os
import pickle
from dataclasses import dataclass
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from ..utils.math import batch_rodrigues, make_homo

NUM_JOINTS = 24
NUM_VERTS = 6890
NUM_BETAS = 10

# SMPL kinematic tree (kintree_table row 0 of the standard model).
SMPL_PARENTS = np.array(
    [0, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17, 18, 19,
     20, 21], dtype=np.int32)


@dataclass(frozen=True)
class SMPLModel:
    """Immutable constants pytree (all jnp arrays)."""
    v_template: jnp.ndarray     # (V, 3)
    shapedirs: jnp.ndarray      # (num_betas, V*3)
    posedirs: jnp.ndarray       # (207, V*3)
    j_regressor: jnp.ndarray    # (V, 24)
    weights: jnp.ndarray        # (V, 24)
    faces: np.ndarray           # (F, 3) int32 — host-side constant
    parents: np.ndarray         # (24,) int32 — host-side constant


class SMPLSchemaError(ValueError):
    """A `*_smpl_with_cocoplus_reg.pkl` failed schema validation.

    Every message names the offending field, what was found, and what the
    standard asset (smpl_pytorch/SMPL.py:27-75) is expected to contain — the
    loader meets a real downloaded asset for the first time in a user's
    hands, so errors must be actionable, not shape-mismatch tracebacks deep
    in the FK code.
    """


def load_smpl_pickle(path: str) -> SMPLModel:
    """Load a `*_smpl_with_cocoplus_reg.pkl` (same asset the reference uses).

    Validates the full schema before building the model; raises
    SMPLSchemaError with an actionable message on any deviation.
    """
    with open(path, "rb") as f:
        model = pickle.load(f, encoding="latin1")

    def _fail(msg):
        raise SMPLSchemaError(f"{path}: {msg}")

    if not isinstance(model, dict):
        _fail(f"expected a pickled dict, got {type(model).__name__}; the "
              "asset is the HMR-style *_smpl_with_cocoplus_reg.pkl "
              "(reference README.md:28)")
    required = ("v_template", "shapedirs", "posedirs", "J_regressor",
                "weights", "kintree_table", "f")
    missing = [k for k in required if k not in model]
    if missing:
        _fail(f"missing required key(s) {missing}; present keys: "
              f"{sorted(model.keys())}")

    v_template = np.array(model["v_template"], dtype=np.float64)
    if v_template.ndim != 2 or v_template.shape[1] != 3 or \
            v_template.shape[0] < NUM_JOINTS:
        _fail(f"v_template must be (V,3) with V>={NUM_JOINTS}, got "
              f"{v_template.shape}")
    V = v_template.shape[0]

    shapedirs = np.array(model["shapedirs"], dtype=np.float64)
    num_betas = shapedirs.shape[-1]
    if shapedirs.size != V * 3 * num_betas or num_betas < 1:
        _fail(f"shapedirs must reshape to (V*3, num_betas)=(({V}*3), B), "
              f"got shape {shapedirs.shape}")
    shapedirs = shapedirs.reshape(-1, num_betas).T

    posedirs = np.array(model["posedirs"], dtype=np.float64)
    if posedirs.shape[-1] != 207 or posedirs.size != V * 3 * 207:
        _fail(f"posedirs must be (V,3,207) (pose-blend basis over the 23 "
              f"non-root joint rotations), got shape {posedirs.shape}")
    posedirs = posedirs.reshape(-1, posedirs.shape[-1]).T

    raw_jr = model["J_regressor"]
    if hasattr(raw_jr, "todense"):  # scipy sparse (the real asset ships CSC)
        j_regressor = np.asarray(raw_jr.todense(), dtype=np.float64)
    else:
        j_regressor = np.array(raw_jr, dtype=np.float64)
    if j_regressor.shape == (NUM_JOINTS, V) and V != NUM_JOINTS:
        # plain-SMPL orientation; the cocoplus asset stores (V,24)
        j_regressor = j_regressor.T
    if j_regressor.shape != (V, NUM_JOINTS):
        _fail(f"J_regressor must be (V,{NUM_JOINTS})=({V},{NUM_JOINTS}) "
              f"(dense or scipy-sparse), got {j_regressor.shape}")

    weights = np.array(model["weights"], dtype=np.float64)
    if weights.shape != (V, NUM_JOINTS):
        _fail(f"weights (LBS skinning weights) must be (V,{NUM_JOINTS})="
              f"({V},{NUM_JOINTS}), got {weights.shape}")
    wsum = weights.sum(axis=1)
    if weights.min() < -1e-4 or abs(wsum - 1.0).max() > 1e-3:
        _fail(f"weights rows must be a convex combination over joints "
              f"(min {weights.min():.3g}, row-sum range "
              f"[{wsum.min():.4f},{wsum.max():.4f}]); this does not look "
              "like an LBS weight matrix")

    kintree = np.array(model["kintree_table"])
    if kintree.ndim != 2 or kintree.shape[1] != NUM_JOINTS:
        _fail(f"kintree_table must be (2,{NUM_JOINTS}), got {kintree.shape}")
    parents = kintree[0].astype(np.int64)
    parents[0] = 0  # root sentinel (4294967295 in the real asset)
    if (parents[1:] >= np.arange(1, NUM_JOINTS)).any() or parents.min() < 0:
        _fail(f"kintree_table row 0 must be topologically ordered parents "
              f"(parent[i] < i for i>=1; SMPL's tree satisfies this), got "
              f"{parents.tolist()} — the unrolled FK chain "
              "(global_rigid_transform) requires it")
    parents = parents.astype(np.int32)

    faces = np.array(model["f"], dtype=np.int64)
    if faces.ndim != 2 or faces.shape[1] != 3 or faces.size == 0:
        _fail(f"f (faces) must be a non-empty (F,3) int array, got shape "
              f"{faces.shape}")
    if faces.min() < 0 or faces.max() >= V:
        _fail(f"face indices out of range [0,{V}): min {faces.min()}, max "
              f"{faces.max()} — 1-based or truncated face table?")
    faces = faces.astype(np.int32)
    return SMPLModel(
        v_template=jnp.asarray(v_template, jnp.float32),
        shapedirs=jnp.asarray(shapedirs, jnp.float32),
        posedirs=jnp.asarray(posedirs, jnp.float32),
        j_regressor=jnp.asarray(j_regressor, jnp.float32),
        weights=jnp.asarray(weights, jnp.float32),
        faces=faces,
        parents=parents,
    )


def get_smpl(gender: str, model_dir: str | None = None) -> SMPLModel:
    """Load by gender, searching the conventional asset locations."""
    candidates = []
    if model_dir:
        candidates.append(os.path.join(model_dir, f"{gender}_smpl_with_cocoplus_reg.pkl"))
    here = os.path.dirname(__file__)
    candidates.append(os.path.join(here, "assets", f"{gender}_smpl_with_cocoplus_reg.pkl"))
    env = os.environ.get("SMPL_MODEL_DIR")
    if env:
        candidates.append(os.path.join(env, f"{gender}_smpl_with_cocoplus_reg.pkl"))
    for c in candidates:
        if os.path.isfile(c):
            return load_smpl_pickle(c)
    raise FileNotFoundError(
        f"SMPL model for gender={gender!r} not found in {candidates}; download "
        "the neutral/male/female *_smpl_with_cocoplus_reg.pkl assets or set "
        "SMPL_MODEL_DIR.")


def toy_smpl_model(n_verts: int = 800, seed: int = 0) -> SMPLModel:
    """Deterministic synthetic stand-in with real SMPL topology semantics.

    A capsule-ish vertical body with 24 joints along plausible offsets; used
    by the test-suite and smoke benchmarks when the real pickle asset is
    absent.  Shapes match SMPL except the vertex count.
    """
    rng = np.random.default_rng(seed)
    # joints: a simple humanoid-ish skeleton in T-pose, y-up
    joints = np.zeros((NUM_JOINTS, 3), np.float32)
    heights = np.linspace(0.0, 0.7, 10)
    joints[0] = [0, 0, 0]
    joints[1] = [0.1, -0.05, 0]; joints[2] = [-0.1, -0.05, 0]   # hips
    joints[3] = [0, 0.1, 0]
    joints[4] = [0.12, -0.45, 0]; joints[5] = [-0.12, -0.45, 0]  # knees
    joints[6] = [0, 0.22, 0]
    joints[7] = [0.13, -0.85, 0]; joints[8] = [-0.13, -0.85, 0]  # ankles
    joints[9] = [0, 0.30, 0]
    joints[10] = [0.14, -0.95, 0.1]; joints[11] = [-0.14, -0.95, 0.1]  # feet
    joints[12] = [0, 0.45, 0]       # neck
    joints[13] = [0.08, 0.40, 0]; joints[14] = [-0.08, 0.40, 0]  # collars
    joints[15] = [0, 0.55, 0]       # head
    joints[16] = [0.2, 0.40, 0]; joints[17] = [-0.2, 0.40, 0]    # shoulders
    joints[18] = [0.45, 0.40, 0]; joints[19] = [-0.45, 0.40, 0]  # elbows
    joints[20] = [0.7, 0.40, 0]; joints[21] = [-0.7, 0.40, 0]    # wrists
    joints[22] = [0.78, 0.40, 0]; joints[23] = [-0.78, 0.40, 0]  # hands

    # vertices: cylinder around the spine + limbs via jitter near joints
    base = rng.integers(0, NUM_JOINTS, n_verts)
    v_template = joints[base] + rng.normal(0, 0.05, (n_verts, 3)).astype(np.float32)
    # weights: softmax of negative distance to joints
    d = np.linalg.norm(v_template[:, None, :] - joints[None, :, :], axis=-1)
    w = np.exp(-d / 0.05)
    weights = (w / w.sum(-1, keepdims=True)).astype(np.float32)
    # regressor: recovers the joints from template verts (least squares-ish)
    jr = np.exp(-d.T / 0.02)
    jr = jr / jr.sum(-1, keepdims=True)
    # correct so that v_template^T jr == joints exactly: scale trick not exact;
    # tests use fk invariants rather than exact joint recovery.
    shapedirs = (rng.normal(0, 0.01, (NUM_BETAS, n_verts * 3))).astype(np.float32)
    posedirs = (rng.normal(0, 0.001, (207, n_verts * 3))).astype(np.float32)
    # faces: arbitrary small triangulation (not watertight; only shapes matter)
    faces = rng.integers(0, n_verts, (2 * n_verts, 3)).astype(np.int32)
    return SMPLModel(
        v_template=jnp.asarray(v_template),
        shapedirs=jnp.asarray(shapedirs),
        posedirs=jnp.asarray(posedirs),
        j_regressor=jnp.asarray(jr.T.astype(np.float32)),
        weights=jnp.asarray(weights),
        faces=faces,
        parents=SMPL_PARENTS,
    )


def shaped_verts_and_joints(model: SMPLModel, beta: jnp.ndarray):
    """beta (B, num_betas) -> (v_shaped (B,V,3), joints (B,24,3)).

    Parity: SMPL.skeleton (smpl_pytorch/SMPL.py:163-173).
    """
    n_verts = model.v_template.shape[0]
    v_shaped = (beta @ model.shapedirs).reshape(-1, n_verts, 3) + model.v_template
    joints = jnp.einsum("bvc,vj->bjc", v_shaped, model.j_regressor)
    return v_shaped, joints


def global_rigid_transform(rot_mats: jnp.ndarray, joints: jnp.ndarray,
                           parents: np.ndarray):
    """FK over the kinematic tree.

    rot_mats (B,24,3,3), joints (B,24,3) -> (posed_joints (B,24,3),
    rel_transforms A (B,24,4,4)) where A removes the rest-pose joint location
    (the "subtract init_bone" step).
    Parity: smpl_pytorch/util.py:70-103.
    """
    B = rot_mats.shape[0]
    results = [make_homo(rot_mats[:, 0], joints[:, 0])]
    for i in range(1, len(parents)):
        j_rel = joints[:, i] - joints[:, parents[i]]
        a_here = make_homo(rot_mats[:, i], j_rel)
        results.append(jnp.einsum("bij,bjk->bik", results[parents[i]], a_here))
    results = jnp.stack(results, axis=1)  # (B,24,4,4)
    posed_joints = results[:, :, :3, 3]
    # A = results - pad(results @ [J;0]) — zeroes the rest joint translation
    j_homo = jnp.concatenate([joints, jnp.zeros((B, len(parents), 1))], axis=-1)
    init_bone = jnp.einsum("bjik,bjk->bji", results, j_homo)
    A = results.at[:, :, :3, 3].add(-init_bone[:, :, :3])
    return posed_joints, A


def smpl_forward(model: SMPLModel, beta: jnp.ndarray, theta: jnp.ndarray,
                 theta_in_rodrigues: bool = True):
    """Full SMPL: returns (verts (B,V,3), posed_joints (B,24,3), Rs).

    Parity: SMPL.forward (smpl_pytorch/SMPL.py:93-132), minus the cocoplus
    joint regressor output (we return the skeleton joints, which is what the
    reference's pipeline actually consumes via posedSkeleton).
    """
    B = beta.shape[0]
    n_verts = model.v_template.shape[0]
    v_shaped, joints = shaped_verts_and_joints(model, beta)
    if theta_in_rodrigues:
        Rs = batch_rodrigues(theta.reshape(-1, 3)).reshape(B, NUM_JOINTS, 3, 3)
    else:
        Rs = theta.reshape(B, NUM_JOINTS, 3, 3)
    pose_feature = (Rs[:, 1:] - jnp.eye(3)).reshape(B, 207)
    v_posed = (pose_feature @ model.posedirs).reshape(B, n_verts, 3) + v_shaped
    posed_joints, A = global_rigid_transform(Rs, joints, model.parents)
    T = jnp.einsum("vj,bjik->bvik", model.weights, A)  # (B,V,4,4)
    v_homo = jnp.concatenate([v_posed, jnp.ones((B, n_verts, 1))], axis=-1)
    verts = jnp.einsum("bvik,bvk->bvi", T, v_homo)[..., :3]
    return verts, posed_joints, Rs


def smpl_tmp_apose(init_pose_type: int = 0) -> np.ndarray:
    """Canonical A-pose used for the template space. Parity: utils/utils.py:56-72."""
    pose = np.zeros((24, 3))
    if init_pose_type == 0:
        pose[1] = [0, 0, 10.0 / 180.0 * np.pi]
        pose[2] = [0, 0, -10.0 / 180.0 * np.pi]
        pose[16] = [0, 0, -45.0 / 180.0 * np.pi]
        pose[17] = [0, 0, 45.0 / 180.0 * np.pi]
    elif init_pose_type == 1:
        pose[1] = [0, 0, 7.0 / 180.0 * np.pi]
        pose[2] = [0, 0, -7.0 / 180.0 * np.pi]
        pose[16] = [0, 0, -55.0 / 180.0 * np.pi]
        pose[17] = [0, 0, 55.0 / 180.0 * np.pi]
    else:
        raise ValueError(init_pose_type)
    return pose.astype(np.float32)
