"""Checkpoint save/load.

Parity target: utils.save_model / load_model (utils/utils.py:257-316) — one
file holding epoch + net params + camera params + poses/trans/shape + both
per-frame latent banks.  Here the whole TrainState IS one pytree, so a
checkpoint is the numpy-ified pytree plus host counters.  Load supports the
reference's knobs: substitute sdf params (--sdf-model) and key-prefix removal
is moot (no name-mangled state dict), and optimizer state IS saved (the
reference restarts Adam on resume; we keep moments — strictly better — but
also expose drop_opt_state for exact-parity resume).
"""
from __future__ import annotations

import pickle
from typing import Any, Optional

import numpy as np
import jax
import jax.numpy as jnp


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def _to_jnp(tree):
    return jax.tree_util.tree_map(
        lambda x: jnp.asarray(x) if isinstance(x, np.ndarray) else x, tree)


def save_checkpoint(path: str, trainer, epoch: int):
    from .trainer import TrainState
    state = trainer.state
    payload = {
        "epoch": epoch,
        "opt_times": trainer.opt_times,
        "forward_time": trainer.forward_time,
        "stage": trainer.stage_cfg.name if trainer.stage_cfg else None,
        "caps": ((trainer.stage_cfg.vcap, trainer.stage_cfg.fcap,
                  trainer.stage_cfg.ecap, trainer.stage_cfg.splat_cap,
                  trainer.stage_cfg.splat_cells)
                 if trainer.stage_cfg else None),
        # sweep-bbox growth + per-resolution MC caps are watermark state the
        # run discovered at remesh time; without them a resumed run re-pays
        # the grow-and-retry remeshes and their rejits through the tunnel
        "bbox": (np.asarray(trainer.b_min).tolist(),
                 np.asarray(trainer.b_max).tolist()),
        "mc_caps": dict(trainer._mc_caps),
        "params": _to_numpy(state.params),
        "bank": _to_numpy(state.bank),
        "opt_state": _to_numpy(state.opt_state),
        "tmp": _to_numpy(state.tmp._asdict()),
    }
    with open(path, "wb") as f:
        pickle.dump(payload, f)


def load_checkpoint(path: str, trainer, sdf_params: Optional[Any] = None,
                    drop_opt_state: bool = False) -> int:
    """Restore trainer state in place; returns the saved epoch.

    Accepts either this repo's pickle checkpoints or a reference-framework
    ``.pth`` (torch.save) file — the latter is routed through
    torch_compat.restore_from_reference for direct cross-framework A/B."""
    from .trainer import TrainState, TemplateState
    from .torch_compat import is_torch_checkpoint, restore_from_reference
    if is_torch_checkpoint(path):
        try:
            return restore_from_reference(path, trainer,
                                          sdf_params=sdf_params)
        except Exception as e:  # the cheap head-bytes probe can misfire on a
            # protocol-2 plain pickle (e.g. older tooling); fall through and
            # try our own format before giving up
            print(f"torch-checkpoint routing failed ({e!r}); "
                  f"retrying as a native pickle checkpoint", flush=True)
    with open(path, "rb") as f:
        payload = pickle.load(f)
    if payload.get("bbox"):
        trainer.b_min = np.asarray(payload["bbox"][0], np.float32)
        trainer.b_max = np.asarray(payload["bbox"][1], np.float32)
    for k, v in (payload.get("mc_caps") or {}).items():
        cur = trainer._mc_caps.get(k)
        trainer._mc_caps[k] = (tuple(v) if cur is None else
                               tuple(max(a, b) for a, b in zip(cur, v)))
    params = _to_jnp(payload["params"])
    if sdf_params is not None:  # --sdf-model substitution (train.py:102-106)
        params = {**params, "sdf": sdf_params}
    bank = _to_jnp(payload["bank"])
    if payload.get("stage"):
        trainer.set_stage(payload["stage"])
        if payload.get("caps"):
            caps = payload["caps"]
            trainer.override_stage(vcap=caps[0], fcap=caps[1], ecap=caps[2])
            if len(caps) > 3:  # splat cap added in r3; old ckpts lack it
                # clamp to the live session's saturation policy (a checkpoint
                # written under a larger SRTPU_SPLAT_CAP_MAX must not undo it)
                trainer.override_stage(splat_cap=min(
                    caps[3], trainer.stage_cfg.splat_cap_max))
            if len(caps) > 4:  # active-cell capacity added later in r3
                trainer.override_stage(splat_cells=caps[4])
    tmp = TemplateState(**_to_jnp(payload["tmp"]))
    if drop_opt_state or sdf_params is not None:
        opt_state = trainer.optimizer.init((params, bank))
    else:
        opt_state = _restore_opt_state(trainer, params, bank,
                                       payload["opt_state"])
    trainer.state = TrainState(params, bank, opt_state, tmp)
    trainer.opt_times = payload["opt_times"]
    trainer.forward_time = payload["forward_time"]
    # keep the dataset's host copy in sync (reference restores dataset conds,
    # utils/utils.py:300-314)
    trainer.dataset.load_bank(_to_numpy(bank))
    return payload["epoch"]


def _restore_opt_state(trainer, params, bank, saved):
    ref = trainer.optimizer.init((params, bank))
    ref_leaves, treedef = jax.tree_util.tree_flatten(ref)
    saved_leaves = jax.tree_util.tree_leaves(saved)
    if len(ref_leaves) != len(saved_leaves):
        return ref
    out = []
    for r, s in zip(ref_leaves, saved_leaves):
        s = jnp.asarray(s) if isinstance(s, np.ndarray) else s
        out.append(s if getattr(s, "shape", None) == getattr(r, "shape", None)
                   else r)
    return jax.tree_util.tree_unflatten(treedef, out)
