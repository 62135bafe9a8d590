"""Mesh-step validation bodies shared by the test suite and the driver's
`__graft_entry__.dryrun_multichip`.

Both callers need the same two exercises (SURVEY §2.4 / §5.8):

* `trainer_step_on_mesh(mesh)` — the FULL trainer step jitted over a device
  mesh: ray/pixel batch data-parallel on the "dp" axis via input shardings
  (GSPMD inserts the grad all-reduces), params/bank replicated.
* `shardmap_psum_step(mesh)` — the explicit `shard_map` + `psum` layout from
  `parallel.sharded.make_train_step_sharded`.

Unlike the original dryrun these mutate NO global state (no
`jax.config.update("jax_platforms", ...)`, no env flips) — the caller decides
which platform the mesh lives on.  The test suite calls them on the virtual
8-device CPU platform its conftest forces; `dryrun_multichip` does its own
platform setup in the driver's isolated subprocess and then calls these.
"""
from __future__ import annotations

import os.path as osp
import tempfile

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def trainer_step_on_mesh(mesh: Mesh, n_frames: int = 8,
                         smpl_verts: int = 200, root: str | None = None):
    """Run ONE full-trainer step with the real multi-chip layout on `mesh`.

    Image tensors are sharded over their W axis ("dp"), everything else
    replicated; the jitted step is otherwise the production program on tiny
    shapes.  Returns the info dict (host floats).
    """
    from ..engine.trainer import build_synthetic_trainer

    n = int(np.prod(mesh.devices.shape))
    root = root or tempfile.mkdtemp(prefix="srtpu_meshstep_")
    H = W = 8 * n  # divisible by the mesh axis
    tr, ds = build_synthetic_trainer(
        root, n_frames=n_frames, H=H, W=W,
        resolutions={s: [(9, 9, 9), (17, 17, 17)]
                     for s in ("coarse", "medium", "fine")},
        smpl_verts=smpl_verts)
    tr.mc_cap_floor = 2048
    tr.set_stage("coarse")
    tr.override_stage(sample_pix=8 * n, eik_tmp=64, vcap=1024,
                      fcap=2048, ecap=4096, surf_iters=2)
    tr.remesh(1.0)
    step = tr._get_step_fn()
    cfg = tr.stage_cfg
    fids = np.arange(cfg.N)
    batch = ds.batch(fids)
    windows, _ = ds.window_indices(fids, cfg.window)

    img_sharding = NamedSharding(mesh, P(None, "dp"))   # shard H axis
    repl = NamedSharding(mesh, P())
    gtCs = jax.device_put(jnp.asarray(batch["img"]), img_sharding)
    gtMs = jax.device_put(jnp.asarray(batch["mask"]), img_sharding)
    gtNs = jax.device_put(jnp.zeros((cfg.N, H, W, 3)), img_sharding)
    state = jax.device_put(tr.state, repl)
    new_state, info = step(
        state, gtCs, gtMs, gtNs, jnp.asarray(fids, jnp.int32),
        jnp.asarray(windows, jnp.int32),
        jnp.asarray([1.0, 0.5, 1.0], jnp.float32),
        jnp.asarray(1e-4, jnp.float32), jax.random.PRNGKey(0))
    jax.block_until_ready(info["loss"])
    return {k: float(v) for k, v in info.items()}


def shardmap_psum_step(mesh: Mesh, flagship_builder=None,
                       p_rays: int | None = None):
    """Run the explicit shard_map + psum training step on `mesh`.

    Returns (loss, new_params, new_bank) with loss as a host float.
    `flagship_builder` defaults to `__graft_entry__`'s tiny flagship nets but
    is injectable so tests can pass smaller ones.  `p_rays` pins the global
    ray count (must divide by the mesh size) — tests pass the SAME count to
    different mesh sizes so the losses are comparable; default scales with
    the mesh like the driver dryrun.
    """
    from .sharded import make_train_step_sharded

    if flagship_builder is None:
        from ..models.sdf import SDFNet, init_sdf_params
        from ..models.translator import TranslatorNet, init_translator_params
        from ..models.render import RenderNet, init_render_params
        from ..models.smpl import toy_smpl_model, smpl_tmp_apose
        from ..models.skinner import build_skinner
        from ..models.deformer import Deformer

        def flagship_builder(key):
            k1, k2, k3 = jax.random.split(key, 3)
            sdf_net = SDFNet()
            trans_net = TranslatorNet()
            render_net = RenderNet()
            smpl = toy_smpl_model(n_verts=400)
            skinner, _, _ = build_skinner(
                smpl, jnp.zeros(10), smpl_tmp_apose(1), resolution=(17, 29, 9))
            deformer = Deformer(translator=trans_net, skinner=skinner)
            return (sdf_net, render_net, deformer,
                    {"sdf": init_sdf_params(k1, sdf_net),
                     "trans": init_translator_params(k2, trans_net),
                     "render": init_render_params(k3, render_net)})

    sdf_net, render_net, deformer, params = flagship_builder(
        jax.random.PRNGKey(0))
    n = int(np.prod(mesh.devices.shape))
    B = 2
    P_rays = p_rays if p_rays is not None else 64 * n
    assert P_rays % n == 0, (P_rays, n)
    sh_step = make_train_step_sharded(mesh, sdf_net, render_net, deformer)
    rng = np.random.default_rng(0)
    pts = jnp.asarray(0.2 * rng.standard_normal((P_rays, 3)), jnp.float32)
    batch_inds = jnp.asarray(rng.integers(0, B, P_rays), jnp.int32)
    rays = jnp.tile(jnp.asarray([0.0, 0.0, 1.0], jnp.float32), (P_rays, 1))
    repl = NamedSharding(mesh, P())
    ray_sharding = NamedSharding(mesh, P("dp"))
    bank = {"dcond": jnp.zeros((B, 128)), "poses": jnp.zeros((B, 24, 3)),
            "trans": jnp.zeros((B, 3))}
    loss, new_params, new_bank = sh_step(
        jax.device_put(params, repl), jax.device_put(bank, repl),
        jax.device_put(pts, ray_sharding),
        jax.device_put(batch_inds, ray_sharding),
        jax.device_put(rays, ray_sharding),
        jax.device_put(jnp.zeros((P_rays, 3)), ray_sharding))
    jax.block_until_ready(loss)
    return float(loss), new_params, new_bank, (params, bank, pts, batch_inds,
                                               rays)
