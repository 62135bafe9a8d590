"""Training CLI — parity with the reference's train.py.

Same flags (`--gpu-ids` accepted and ignored: device selection is JAX's),
same config.conf semantics, same 3-stage hierarchical schedule, octree
resolutions, MultiStepLR, per-epoch checkpointing, and the per-step loss
printout including rayInfo/invInfo telemetry (train.py:12-189).
"""
from __future__ import annotations

import argparse
import os
import os.path as osp
import shutil
import time

import numpy as np


# per-stage octree resolutions (train.py:29-53 — config data, reused verbatim)
RESOLUTIONS = {
    "coarse": [(15, 21, 9), (29, 41, 17), (57, 81, 33), (113, 161, 65),
               (225, 321, 129)],
    "medium": [(19, 25, 13), (37, 49, 25), (73, 97, 49), (145, 193, 97),
               (289, 385, 193)],
    "fine": [(21, 27, 15), (41, 53, 29), (81, 105, 57), (161, 209, 113),
             (321, 417, 225)],
}


def main(argv=None, resolutions=None, skinner_res=None, tune=None):
    """CLI entry.  The keyword-only extras are test/debug injection points:
    `resolutions` replaces the production octree schedule, `skinner_res`
    shrinks the LBS weight volume, and `tune(trainer)` runs right before the
    epoch loop (tests lower capacities there so the CPU-mesh end-to-end run
    compiles in seconds)."""
    parser = argparse.ArgumentParser(description="SelfRecon-TPU per-subject "
                                                 "avatar optimization")
    parser.add_argument("--gpu-ids", nargs="+", type=int, default=None,
                        help="accepted for CLI parity; unused on TPU")
    parser.add_argument("--conf", default=None, help="config file (HOCON)")
    parser.add_argument("--data", default=None, help="data root")
    parser.add_argument("--model", default=None, help="checkpoint to resume")
    parser.add_argument("--sdf-model", default=None,
                        help="substitute sdf params from this checkpoint")
    parser.add_argument("--model-rm-prefix", nargs="+", default=None,
                        help="accepted for CLI parity (no name-mangled keys)")
    parser.add_argument("--save-folder", default=None)
    parser.add_argument("--toy-smpl", action="store_true",
                        help="use the synthetic SMPL stand-in (no pkl assets)")
    parser.add_argument("--synthetic-body", action="store_true",
                        help="use the watertight 6890-vert SMPL-schema body "
                             "(models/synthetic_body.py; acceptance runs)")
    parser.add_argument("--max-epochs", type=int, default=None,
                        help="cap epochs (debug)")
    parser.add_argument("--mesh", default=None, metavar="dp=N",
                        help="train data-parallel over a 1-D device mesh "
                             "(e.g. --mesh dp=8): image rows sharded over "
                             "the dp axis, params replicated, gradient "
                             "all-reduce over ICI (SURVEY §2.4)")
    args = parser.parse_args(argv)

    import jax
    from ..config import parse_file
    from ..data import SceneDataset, RandomSampler, batch_iterator
    from ..engine.trainer import Trainer
    from ..engine.checkpoint import save_checkpoint, load_checkpoint

    conf = parse_file(args.conf)
    assert args.save_folder is not None, "please set --save-folder..."
    data_root = args.data
    save_root = osp.join(data_root, args.save_folder)
    os.makedirs(osp.join(save_root, "debug"), exist_ok=True)
    shutil.copyfile(args.conf, osp.join(save_root, "config.conf"))

    conds = {"deformer": conf.get_int("mlp_deformer.condlen"),
             "renderer": conf.get_int("render_net.condlen")}
    dataset = SceneDataset(data_root, conds)
    print(f"scene data use {dataset.gender} smpl; {dataset.frame_num} frames "
          f"{dataset.H}x{dataset.W}")

    if args.synthetic_body:
        from ..models.synthetic_body import synthetic_body_model
        smpl = synthetic_body_model()
    elif args.toy_smpl:
        from ..models.smpl import toy_smpl_model
        smpl = toy_smpl_model()
    else:
        from ..models.smpl import get_smpl
        smpl = get_smpl(dataset.gender)

    res_sched = resolutions or RESOLUTIONS
    kw = {"skinner_res": skinner_res} if skinner_res else {}
    trainer = Trainer(dataset, smpl, conf, res_sched, save_root=save_root,
                      data_root=data_root, **kw)
    print("box:", trainer.b_min.tolist(), trainer.b_max.tolist())

    if args.mesh:
        from jax.sharding import Mesh
        spec = args.mesh.replace("dp=", "")
        n_dev = int(spec)
        devs = jax.devices()
        assert len(devs) >= n_dev, (
            f"--mesh dp={n_dev} needs {n_dev} devices, found {len(devs)} "
            f"({devs[0].platform}); for a virtual CPU mesh set "
            f"JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_"
            f"device_count={n_dev}")
        assert dataset.H % n_dev == 0, (
            f"image height {dataset.H} must divide by dp={n_dev} "
            f"(rows are sharded over the mesh)")
        trainer.set_mesh(Mesh(np.asarray(devs[:n_dev]), ("dp",)))
        print(f"device mesh: dp={n_dev} over {devs[0].platform}", flush=True)

    start_epoch = 0
    initial_iters = conf.get_int("train.initial_iters")
    pose_type = conf.get_int("train.skinner_pose_type")
    multires = conf.get_int("sdf_net.multires")
    sdf_cache = osp.join(data_root,
                         f"initial_sdf_idr_{multires}_{pose_type}.npz")
    if args.model and osp.isfile(args.model):
        print("load model:", args.model)
        sdf_sub = None
        if args.sdf_model and osp.isfile(args.sdf_model):
            from ..engine.torch_compat import (is_torch_checkpoint,
                                               load_reference_sdf)
            if is_torch_checkpoint(args.sdf_model):
                # a reference .pth: take its sdf tower (utils.py:279-282)
                sdf_sub = load_reference_sdf(args.sdf_model)
            else:
                import pickle
                with open(args.sdf_model, "rb") as f:
                    sdf_sub = pickle.load(f)["params"]["sdf"]
        start_epoch = load_checkpoint(args.model, trainer, sdf_params=sdf_sub)
    else:
        # IGR pretraining (cached like the reference, network.py:835-840)
        iters = abs(initial_iters)
        info = trainer.initialize_sdf(iters, cache_path=sdf_cache)
        print("initial sdf:", info)
        if not info.get("cached"):
            # export the initial iso-surface for inspection (train.py:129-132)
            from ..engine.trainer import _export_mesh
            verts, faces, nv, nf = trainer.discretize_sdf(
                0.0, resolutions=res_sched["coarse"])
            _export_mesh(osp.join(
                data_root,
                f"initial_sdf_idr_{multires}_{pose_type}.ply"), verts, faces)
            print(f"initial mesh: {nv} verts")

    if trainer.stage_cfg is None:
        trainer.set_stage("coarse")
    if tune is not None:
        tune(trainer)

    # TPU-first data path: park the whole (uint8) dataset in device memory
    # once; every step then gathers its batch on device with zero
    # host->device traffic.  Falls back to the threaded host loader when the
    # dataset exceeds the budget.
    device_cached = trainer.preload_frames()
    print(f"device frame cache: {'ON' if device_cached else 'off'}",
          flush=True)

    nepoch = conf.get_int("train.nepoch")
    if args.max_epochs is not None:
        nepoch = min(nepoch, args.max_epochs)
    base_lr = conf.get_float("train.learning_rate")
    milestones = [int(m) for m in conf.get_list("train.scheduler.milestones")]
    factor = conf.get_float("train.scheduler.factor")
    medium_at = conf.get_int("train.medium.start_epoch")
    fine_at = conf.get_int("train.fine.start_epoch")
    shuffle = conf.get_bool("train.shuffle")
    sampler = RandomSampler(dataset.frame_num, 1, shuffle)
    key = jax.random.PRNGKey(0)
    in_fine = False
    debug_root = osp.join(save_root, "debug")

    for epoch in range(start_epoch, nepoch + 1):
        if medium_at >= 0 and epoch == medium_at:
            save_checkpoint(osp.join(save_root, "coarse.pkl"), trainer, epoch)
            trainer.set_stage("medium")
            print("enable medium hierarchical")
        if fine_at >= 0 and epoch == fine_at:
            save_checkpoint(osp.join(save_root, "medium.pkl"), trainer, epoch)
            trainer.set_stage("fine")
            in_fine = True
            print("enable fine hierarchical")
        lr = base_lr * (factor ** sum(1 for m in milestones if epoch >= m))
        bs = trainer.stage_cfg.N
        t_epoch = time.time()
        def report(di, info, dt):
            # ONE batched transfer for the whole info dict: device_get issues
            # async host copies for every leaf then syncs once (~40 ms on the
            # tunnel), where per-key float() serializes ~15 round-trips
            # (~550 ms — measured; it dominated the fine-stage step wall)
            info = {k: float(v) for k, v in jax.device_get(info).items()}
            out = (f"({epoch}/{di}): loss = {info['loss']:.5f}; "
                   f"color_loss: {info.get('color_loss', -1):.5f}, "
                   f"eikonal_loss: {info.get('grad_loss', -1):.5f}")
            for k in ("normal_loss", "def_loss", "offset_loss", "dct_loss"):
                if k in info:
                    out += f" {k}: {info[k]:.5f},"
            out += (f"\n\tpc_sdf_l: {info.get('pc_loss_sdf', -1):.5f}; "
                    f"mask_loss: {info.get('pc_mask_loss', -1):.5f}\t")
            if "pc_defconst_loss" in info:
                out += f"defconst_loss: {info['pc_defconst_loss']:.5f}\t"
            # same ray-count resolution as the step itself (the stage's loss
            # block may override train.sample_pix_num, e.g. fine uses 6144)
            wpix = trainer.stage_cfg.weights.sample_pix_num
            P = (trainer.stage_cfg.sample_pix if wpix == 0 else wpix) * bs
            out += (f"\n\trayInfo({P},{int(info.get('ray_converged', 0))})\t"
                    f"invInfo({P},{int(info.get('inv_ok', 0))})\t"
                    f"remesh: {info['remesh']:.3f}\t{dt:.2f}s/it")
            # raster-cell overflow telemetry: density regressions must be
            # visible, not silent (dropped splats/faces degrade the mask)
            ovf = int(info.get("splat_overflow", 0)) + \
                int(info.get("frag_overflow", 0))
            if ovf > 0:
                out += f"\tOVERFLOW({ovf})"
            print(out, flush=True)

        # one-step-delayed reporting: the next step is DISPATCHED before the
        # previous step's scalars are fetched, so host latency (decode,
        # transfers, RPC dispatch) overlaps device compute
        pending = None
        # debug artifacts: the reference arms `draw` once per epoch (at the
        # previous epoch's end, train.py:186-187) and save_debug disarms it
        # after one dump (network.py:447) — i.e. ONE dump per fine epoch at
        # the first remesh tick, not one per tick (~3x/epoch = ~10-15 s of
        # host fetches at 1080p)
        drew = not in_fine
        if (device_cached and getattr(trainer, "_mesh", None) is None
                and os.environ.get("SRTPU_SCHED")):
            # scheduled path (OPT-IN via SRTPU_SCHED=1): the shuffled
            # schedule + lr + RNG key are uploaded ONCE and each step needs
            # 3 dispatches instead of ~10 host ops.  Semantically equivalent
            # (test_scheduled_epoch_matches_plain_steps) and it removes the
            # measured 0.077 s/step host-op gap — but the first production
            # trial at 1080p ran 0.9-3.3 s/it (vs 0.24 on the plain path),
            # cause not yet isolated (suspect: XLA fusing the full-cache
            # gather into geom's image consumers).  Off by default until
            # profiled.
            ids = sampler.epoch_ids()
            groups = np.asarray([ids[i:i + bs]
                                 for i in range(0, len(ids) - bs + 1, bs)],
                                np.int32).reshape(-1, bs)
            key, kep = jax.random.split(key)
            trainer.begin_scheduled_epoch(groups, lr, kep)
            for di in range(groups.shape[0]):
                t0 = time.time()
                info = trainer.train_step_scheduled()
                if pending is not None:
                    report(pending[0], pending[1], time.time() - pending[2])
                pending = (di, info, t0)
                if (not drew and trainer.forward_time
                        % trainer.stage_cfg.remesh_intersect == 1):
                    trainer.save_debug(debug_root, groups[di], None)
                    drew = True
            it = ()
        else:
            it = batch_iterator(dataset, sampler, bs)
        for di, (fids, batch) in enumerate(it):
            key, sk = jax.random.split(key)
            t0 = time.time()
            info = trainer.train_step(np.asarray(fids), batch, lr, sk,
                                      sync=False)
            if pending is not None:
                report(pending[0], pending[1], time.time() - pending[2])
            pending = (di, info, t0)
            # debug artifact dump, once per fine epoch (see `drew` above)
            if (not drew and trainer.forward_time
                    % trainer.stage_cfg.remesh_intersect == 1):
                trainer.save_debug(debug_root, np.asarray(fids), batch)
                drew = True
        if pending is not None:
            report(pending[0], pending[1], time.time() - pending[2])
        print(f"epoch {epoch} took {time.time() - t_epoch:.1f}s", flush=True)
        save_checkpoint(osp.join(save_root, "latest.pkl"), trainer, epoch + 1)

    print("training done.")


if __name__ == "__main__":
    main()
