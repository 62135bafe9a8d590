"""Reference-.pth compatibility loader (engine/torch_compat.py).

Validates the state_dict key mapping and — critically — the weight-norm
reconstruction against REAL torch semantics (nn.utils.weight_norm), since
that is the part a hand-rolled converter gets silently wrong.
Parity target: utils/utils.py:257-316 of the reference.
"""
import os.path as osp
import pickle

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from selfreconcode_tpu.engine.torch_compat import (
    is_torch_checkpoint, load_reference_pth, load_reference_sdf,
    _collect_layers)
from selfreconcode_tpu.models.layers import apply_linear


def test_weight_norm_layer_matches_torch(tmp_path):
    """apply_linear on the converted params must equal the torch
    weight-normed Linear bit-for-fp-bit."""
    torch.manual_seed(0)
    lin = torch.nn.utils.weight_norm(torch.nn.Linear(7, 5))
    sd = {f"sdf.lin0.{k}": v for k, v in lin.state_dict().items()}
    layers = _collect_layers(sd, "sdf", weight_norm=True)
    assert len(layers) == 1
    x = np.random.default_rng(1).normal(size=(11, 7)).astype(np.float32)
    with torch.no_grad():
        want = lin(torch.from_numpy(x)).numpy()
    got = np.asarray(apply_linear(
        {k: np.asarray(v) for k, v in layers[0].items()}, x))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def _reference_format_pth(params, bank, path, F):
    """Serialize this repo's param pytree as a reference-format torch
    checkpoint (the inverse of the loader under test)."""
    sd = {}
    for l, p in enumerate(params["sdf"]):
        sd[f"sdf.lin{l}.weight_v"] = torch.from_numpy(np.asarray(p["v"]))
        sd[f"sdf.lin{l}.weight_g"] = torch.from_numpy(
            np.asarray(p["g"]).reshape(-1, 1))
        sd[f"sdf.lin{l}.bias"] = torch.from_numpy(np.asarray(p["b"]))
    for l, p in enumerate(params["trans"]):
        sd[f"deformer.defs.0.lin{l}.weight"] = torch.from_numpy(
            np.asarray(p["w"]))
        sd[f"deformer.defs.0.lin{l}.bias"] = torch.from_numpy(
            np.asarray(p["b"]))
    for l, p in enumerate(params["render"]):
        sd[f"netRender.lin{l}.weight_v"] = torch.from_numpy(np.asarray(p["v"]))
        sd[f"netRender.lin{l}.weight_g"] = torch.from_numpy(
            np.asarray(p["g"]).reshape(-1, 1))
        sd[f"netRender.lin{l}.bias"] = torch.from_numpy(np.asarray(p["b"]))
    # keys the reference loader drops and ours must too
    sd["engine.b_min"] = torch.zeros(1, 3)
    sd["deformer.defs.1.ws"] = torch.zeros(2, 2, 2, 2, 2)
    sd["deformer.defs.1.Js"] = torch.zeros(24, 3)
    rng = np.random.default_rng(7)
    out = {"epoch": 42, "model_state_dict": sd,
           "poses": torch.from_numpy(
               rng.normal(size=(F, 24, 3)).astype(np.float32)),
           "trans": torch.from_numpy(
               rng.normal(size=(F, 3)).astype(np.float32)),
           "shape": torch.from_numpy(
               rng.normal(size=(10,)).astype(np.float32)),
           "dcond": torch.from_numpy(np.asarray(bank["cond_deformer"])),
           "rcond": torch.from_numpy(np.asarray(bank["cond_renderer"])),
           "focal_length": torch.tensor([500.0, 500.0]),
           "princeple_points": torch.tensor([24.0, 24.0]),
           "cam2world_coord_quat": torch.tensor([1.0, 0.0, 0.0, 0.0]),
           "world2cam_coord_trans": torch.tensor([0.0, 0.0, 2.5])}
    torch.save(out, path)


def test_detection_and_parse(tmp_path):
    pth = str(tmp_path / "ref.pth")
    pkl = str(tmp_path / "ours.pkl")
    sd = {}
    lin = torch.nn.utils.weight_norm(torch.nn.Linear(4, 3))
    for base in ["sdf.lin0", "netRender.lin0"]:
        for k, v in lin.state_dict().items():
            sd[f"{base}.{k}"] = v
    sd["deformer.defs.0.lin0.weight"] = torch.zeros(3, 4)
    sd["deformer.defs.0.lin0.bias"] = torch.zeros(3)
    torch.save({"epoch": 3, "model_state_dict": sd,
                "poses": torch.zeros(2, 24, 3)}, pth)
    with open(pkl, "wb") as f:
        pickle.dump({"epoch": 1, "params": {}}, f)
    assert is_torch_checkpoint(pth)
    assert not is_torch_checkpoint(pkl)
    # a protocol-2 pickle of OUR OWN checkpoint shares the b"\x80\x02" opcode
    # with torch legacy files; only the full legacy magic may route to torch
    pkl2 = str(tmp_path / "ours_p2.pkl")
    with open(pkl2, "wb") as f:
        pickle.dump({"epoch": 1, "params": {}}, f, protocol=2)
    assert not is_torch_checkpoint(pkl2)
    # ...while a real legacy-format torch file (pre-zip serialization) must
    # still be detected by its pickled magic number
    legacy = str(tmp_path / "legacy.pth")
    torch.save({"x": torch.zeros(2)}, legacy,
               _use_new_zipfile_serialization=False)
    assert is_torch_checkpoint(legacy)
    epoch, params, ds = load_reference_pth(pth)
    assert epoch == 3
    assert set(params) == {"sdf", "trans", "render"}
    assert "poses" in ds and ds["poses"].shape == (2, 24, 3)


def test_bare_sdf_state_dict(tmp_path):
    """--sdf-model with an unprefixed sdf dict (initial_sdf_idr_*.pth)."""
    pth = str(tmp_path / "sdf.pth")
    lin = torch.nn.utils.weight_norm(torch.nn.Linear(4, 3))
    torch.save({f"lin0.{k}": v for k, v in lin.state_dict().items()}, pth)
    layers = load_reference_sdf(pth)
    assert len(layers) == 1 and layers[0]["v"].shape == (3, 4)


@pytest.mark.slow
def test_full_checkpoint_roundtrip_into_trainer(tmp_path):
    """Trainer params -> reference .pth -> load_checkpoint recovers the exact
    params and dataset bank (the cross-framework A/B entry path)."""
    import jax
    from selfreconcode_tpu.engine.trainer import build_synthetic_trainer
    from selfreconcode_tpu.engine.checkpoint import load_checkpoint

    tr, ds = build_synthetic_trainer(str(tmp_path), n_frames=4, H=32, W=32)
    tr.set_stage("coarse")
    params0 = jax.tree_util.tree_map(np.asarray, tr.state.params)
    pth = str(tmp_path / "reference.pth")
    _reference_format_pth(params0, tr.state.bank, pth, F=ds.frame_num)

    # clobber, then restore through the compat route
    tr.state = tr.state._replace(params=jax.tree_util.tree_map(
        lambda x: x * 0.0, tr.state.params))
    epoch = load_checkpoint(pth, tr)
    assert epoch == 42
    for a, b in zip(jax.tree_util.tree_leaves(params0),
                    jax.tree_util.tree_leaves(tr.state.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=0, atol=0)
    # dataset-owned state restored with the reference's key names
    assert ds.poses.shape == (4, 24, 3)
    assert np.any(ds.poses != 0)  # crafted random poses landed
    np.testing.assert_allclose(
        np.asarray(tr.state.bank["camera"]["world2cam_coord_trans"]),
        [0.0, 0.0, 2.5])
    assert ds.shape.shape == (10,)
