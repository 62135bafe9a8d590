"""Reference-checkpoint (.pth) compatibility loader.

Parity target: utils.load_model (utils/utils.py:266-316 of the reference).
A reference checkpoint is one ``torch.save`` dict holding
``{"epoch", "model_state_dict"}`` plus the dataset-owned optimizables at the
top level (``poses, trans, shape, dcond, rcond`` and the four camera params,
utils/utils.py:257-264).  This module converts that dict into this repo's
pytree layout so a subject trained by the reference can be loaded for direct
A/B (infer / errors.txt / Chamfer) without any torch code on the hot path —
torch is used only to deserialize, on the host, at load time.

Mapping (reference module attribute -> our param tree):
  sdf.lin{l}.{weight_v,weight_g,bias}       -> params["sdf"][l]{v,g,b}
  deformer.defs.0.lin{l}.{weight,bias}      -> params["trans"][l]{w,b}
  netRender.lin{l}.{weight_v,weight_g,bias} -> params["render"][l]{v,g,b}
  poses/trans/dcond/rcond + camera keys     -> bank (+ dataset.shape)

Dropped, exactly like the reference loader: every ``engine.*`` key
(utils/utils.py:268), ``deformer.defs.1.ws`` (the buggy-volume workaround at
utils/utils.py:284-285 — we rebuild the weight volume from SMPL anyway), and
the skinner buffers (b_min/b_max/Js/init_pose are derived state here).
"""
from __future__ import annotations

import zipfile
from typing import Optional

import numpy as np


def is_torch_checkpoint(path: str) -> bool:
    """True for torch.save archives (zip format, torch >= 1.6) and legacy
    torch pickles (protocol magic + torch persistent ids)."""
    if zipfile.is_zipfile(path):
        try:
            with zipfile.ZipFile(path) as z:
                return any(n.endswith("data.pkl") for n in z.namelist())
        except Exception:
            return False
    # legacy (non-zip) torch files begin with pickle.dump(MAGIC_NUMBER,
    # protocol=2) where MAGIC_NUMBER = 0x1950a86a20f9469cfc6c — i.e. the
    # exact 14-byte prefix below.  Matching the full magic (not just the
    # protocol-2 opcode b"\x80\x02") keeps protocol-2 pickles of OUR OWN
    # checkpoint dicts out of the torch loading path.
    legacy = b"\x80\x02\x8a\x0a\x6c\xfc\x9c\x46\xf9\x20\x6a\xa8\x50\x19"
    try:
        with open(path, "rb") as f:
            head = f.read(len(legacy))
        return head == legacy
    except OSError:
        return False


def _np(t):
    return t.detach().cpu().numpy().astype(np.float32)


def _collect_layers(sd: dict, prefix: str, weight_norm: bool):
    """Gather lin0..linN under `prefix` into this repo's layer-param list."""
    layers = []
    l = 0
    while True:
        base = f"{prefix}.lin{l}" if prefix else f"lin{l}"
        if weight_norm:
            if f"{base}.weight_v" not in sd:
                break
            v = _np(sd[f"{base}.weight_v"])
            g = _np(sd[f"{base}.weight_g"]).reshape(-1)
            b = _np(sd[f"{base}.bias"])
            layers.append({"v": v, "g": g, "b": b})
        else:
            if f"{base}.weight" not in sd:
                break
            layers.append({"w": _np(sd[f"{base}.weight"]),
                           "b": _np(sd[f"{base}.bias"])})
        l += 1
    if not layers:
        raise KeyError(f"no '{prefix}.lin*' layers found in checkpoint")
    return layers


def load_reference_pth(path: str):
    """Parse a reference .pth -> (epoch, params, dataset_state) as numpy.

    dataset_state holds poses/trans/shape/dcond/rcond/camera with the
    reference's own key names; callers map them onto the bank.
    """
    import torch  # host-side deserialization only

    saved = torch.load(path, map_location="cpu", weights_only=False)
    sd = {k: v for k, v in saved["model_state_dict"].items()
          if "engine." not in k}
    params = {
        "sdf": _collect_layers(sd, "sdf", weight_norm=True),
        "trans": _collect_layers(sd, "deformer.defs.0", weight_norm=False),
        "render": _collect_layers(sd, "netRender", weight_norm=True),
    }
    cam_keys = ("focal_length", "princeple_points", "cam2world_coord_quat",
                "world2cam_coord_trans")
    ds = {"camera": {k: _np(saved[k]).reshape(-1) for k in cam_keys
                     if k in saved}}
    for k in ("poses", "trans", "shape", "dcond", "rcond"):
        if k in saved:
            ds[k] = _np(saved[k])
    return int(saved.get("epoch", 0)), params, ds


def load_reference_sdf(path: str):
    """SDF tower from a reference .pth — either a full checkpoint or a bare
    sdf state_dict (the `initial_sdf_idr_*.pth` cache / --sdf-model input,
    which the reference loads unprefixed at utils/utils.py:279-282)."""
    import torch

    saved = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(saved, dict) and "model_state_dict" in saved:
        return _collect_layers(saved["model_state_dict"], "sdf",
                               weight_norm=True)
    return _collect_layers(saved, "", weight_norm=True)


def restore_from_reference(path: str, trainer,
                           sdf_params: Optional[dict] = None) -> int:
    """Load a reference .pth into a live Trainer (the .pth analogue of
    engine.checkpoint.load_checkpoint).  Optimizer state is freshly
    initialized — exactly the reference's resume semantics, which never
    checkpoints Adam moments (utils/utils.py:257-264)."""
    import jax.numpy as jnp
    from .trainer import TrainState

    epoch, params, ds = load_reference_pth(path)
    if sdf_params is not None:
        params = {**params, "sdf": sdf_params}
    params = {k: [{n: jnp.asarray(a) for n, a in layer.items()}
                  for layer in v] for k, v in params.items()}

    dataset = trainer.dataset
    bank = {k: np.asarray(v) for k, v in trainer.state.bank.items()
            if not isinstance(v, dict)}
    bank["camera"] = {k: np.asarray(v)
                      for k, v in trainer.state.bank["camera"].items()}
    F = dataset.frame_num
    if "poses" in ds:
        assert ds["poses"].shape[0] >= F, "checkpoint has fewer frames"
        bank["poses"] = ds["poses"].reshape(-1, 24, 3)[:F]
    if "trans" in ds:
        bank["trans"] = ds["trans"].reshape(-1, 3)[:F]
    # conds are (F0, d) with F0 = the checkpoint's frame count; like
    # poses/trans above, keep the per-frame layout and slice to this
    # dataset's frames (reshape(F, -1) would silently re-stride a longer
    # bank into corrupt conditioning whenever F0 != F)
    if "dcond" in ds and "cond_deformer" in bank:
        dcond = ds["dcond"].reshape(ds["dcond"].shape[0], -1)
        assert dcond.shape[0] >= F, "checkpoint has fewer frames"
        bank["cond_deformer"] = dcond[:F]
    if "rcond" in ds and "cond_renderer" in bank:
        rcond = ds["rcond"].reshape(ds["rcond"].shape[0], -1)
        assert rcond.shape[0] >= F, "checkpoint has fewer frames"
        bank["cond_renderer"] = rcond[:F]
    for k, v in ds["camera"].items():
        bank["camera"][k] = v.reshape(bank["camera"][k].shape)
    if "shape" in ds:
        dataset.shape = ds["shape"].reshape(-1)
    bank = {k: ({n: jnp.asarray(a) for n, a in v.items()}
                if isinstance(v, dict) else jnp.asarray(v))
            for k, v in bank.items()}

    opt_state = trainer.optimizer.init((params, bank))
    trainer.state = TrainState(params, bank, opt_state, trainer.state.tmp)
    trainer.dataset.load_bank(
        {k: (dict(v) if isinstance(v, dict) else np.asarray(v))
         for k, v in bank.items()})
    return epoch
