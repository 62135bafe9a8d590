"""Bisect outer_pass cost: surface solve vs loss fwd vs backward vs Adam.

Builds the production-scale synthetic trainer (like tools/profile_step.py),
then times jitted sub-programs of the outer pass.
"""
from __future__ import annotations

import argparse
import os
import os.path as osp
import sys
import tempfile
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=1080)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--stage", default="coarse")
    ap.add_argument("--n", type=int, default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from selfreconcode_tpu.engine.trainer import build_synthetic_trainer
    from tools.profile_step import PROD_RES, _fetch_scalar

    root = osp.join(tempfile.gettempdir(), f"srtpu_prof_{args.h}")
    os.makedirs(root, exist_ok=True)
    tr, ds = build_synthetic_trainer(root, n_frames=32, H=args.h, W=args.h,
                                     resolutions=PROD_RES)
    tr.set_stage(args.stage)
    if args.n is not None and tr.stage_cfg.N != args.n:
        tr.override_stage(N=args.n)
    print("setup done", flush=True)
    t0 = time.time()
    nv, nf = tr.remesh(1.0)
    print(f"remesh {time.time()-t0:.0f}s: {nv}v {nf}f", flush=True)

    step = tr._get_step_fn()
    cfg = tr.stage_cfg
    fids = np.arange(cfg.N)
    batch = ds.batch_raw(fids)
    windows = jnp.asarray(ds.window_indices(fids, cfg.window)[0], jnp.int32)
    gtCs = jnp.asarray(batch["img"])
    gtMs = jnp.asarray(batch["mask"])
    gtNs = jnp.zeros((cfg.N, cfg.H, cfg.W, 3))
    fids_j = jnp.asarray(fids, jnp.int32)
    ratios = jnp.asarray([1.0, 0.5, 1.0], jnp.float32)
    lr = jnp.asarray(1e-4, jnp.float32)
    key = jax.random.PRNGKey(0)
    state = tr.state
    deformer = tr.deformer

    tiny = jax.jit(lambda x: x + 1.0)
    _fetch_scalar(tiny(jnp.zeros(())))
    t0 = time.perf_counter()
    for _ in range(5):
        _fetch_scalar(tiny(jnp.zeros(())))
    rtt = (time.perf_counter() - t0) / 5 * 1e3
    print(f"RTT ~{rtt:.0f} ms", flush=True)
    K = args.iters

    def bench(label, fn, *a):
        t0 = time.time()
        _fetch_scalar(fn(*a))
        print(f"  [{label} compile {time.time()-t0:.0f}s]", flush=True)
        t0 = time.perf_counter()
        for _ in range(K):
            out = fn(*a)
        _fetch_scalar(out)
        dt = ((time.perf_counter() - t0) * 1e3 - rtt) / K
        print(f"  {label:<40s} {dt:8.1f} ms", flush=True)
        return dt

    geo = step.geom_pass(state, deformer, gtMs, fids_j, ratios, key)
    init_pts, sel_ok, ray_binds, ray_rows, ray_cols, mgtMs, _ovf = geo
    inn = step.inner_pass(state, deformer, fids_j, mgtMs, ratios)
    new_tmp = inn[0]
    g_params_in, g_bank_in = inn[1], inn[2]
    _fetch_scalar(new_tmp.verts)

    # -- rebuild the outer-pass internals for piecewise timing --------------
    from selfreconcode_tpu.engine.trainer import (make_train_step,
                                                  camera_from_bank)
    from selfreconcode_tpu.engine.surface import (SurfaceConfig,
                                                  make_surface_points_fn)
    from selfreconcode_tpu.render.camera import view_rays, cam_pos
    surf_cfg = SurfaceConfig(n_iters=cfg.surf_iters, dthreshold=5e-5,
                             athreshold_deg=tr.ang_thresh, w1=3.05, w2=1.0)
    surface_points = make_surface_points_fn(tr.sdf_net, tr.trans_net,
                                            surf_cfg)
    N, H, W = cfg.N, cfg.H, cfg.W
    w = cfg.weights
    P = (cfg.sample_pix * N if w.sample_pix_num == 0
         else w.sample_pix_num * N)

    @jax.jit
    def surf_fwd(state, deformer, init_pts, ray_rows, ray_cols, ray_binds):
        params, bank = state.params, state.bank
        cam = camera_from_bank(bank, H, W, cfg)
        poses = bank["poses"][fids_j]
        trans = bank["trans"][fids_j]
        dcond = bank["cond_deformer"][fids_j]
        pix = jnp.stack([ray_cols.astype(jnp.float32),
                         ray_rows.astype(jnp.float32),
                         jnp.ones((P,), jnp.float32)], axis=-1)
        rays = view_rays(cam, pix)
        c = cam_pos(cam)
        pts, done = surface_points(
            jnp.asarray([1.0, 0.5]), deformer, params["sdf"],
            params["trans"], dcond, poses, trans, rays, c, init_pts,
            ray_binds)
        return pts, done

    bench("surface solve fwd (10 iters)", surf_fwd, state, deformer,
          init_pts, ray_rows, ray_cols, ray_binds)

    # IFT backward through the solve (custom_vjp) with a dummy cotangent
    @jax.jit
    def surf_bwd(state, deformer, init_pts, ray_rows, ray_cols, ray_binds):
        params, bank = state.params, state.bank
        cam = camera_from_bank(bank, H, W, cfg)
        poses = bank["poses"][fids_j]
        trans = bank["trans"][fids_j]
        dcond = bank["cond_deformer"][fids_j]
        pix = jnp.stack([ray_cols.astype(jnp.float32),
                         ray_rows.astype(jnp.float32),
                         jnp.ones((P,), jnp.float32)], axis=-1)
        rays = view_rays(cam, pix)
        c = cam_pos(cam)

        def f(sdf_p, trans_p):
            pts, done = surface_points(
                jnp.asarray([1.0, 0.5]), deformer, sdf_p, trans_p, dcond,
                poses, trans, rays, c, init_pts, ray_binds)
            return pts.sum()

        return jax.grad(f, argnums=(0, 1))(params["sdf"], params["trans"])

    bench("surface solve fwd+IFT bwd", surf_bwd, state, deformer,
          init_pts, ray_rows, ray_cols, ray_binds)

    from selfreconcode_tpu.models.sdf import sdf_grad
    from selfreconcode_tpu.models.deformer import deformer_jacobian
    eik_n = P + cfg.eik_tmp
    eikpts = jnp.zeros((eik_n + eik_n // 6, 3))
    bench(f"sdf_grad eikonal-size ({eikpts.shape[0]})", jax.jit(
        lambda pr, q: sdf_grad(pr, tr.sdf_net, q, 1.0)),
        state.params["sdf"], eikpts)

    drn = 2 * (P + cfg.eik_tmp) * N
    drpts = jnp.zeros((drn, 3))
    drbinds = jnp.zeros((drn,), jnp.int32)
    dcond0 = state.bank["cond_deformer"][fids_j]
    poses0 = state.bank["poses"][fids_j]
    trans0 = state.bank["trans"][fids_j]

    @jax.jit
    def defregu_jac(tp, deformer, q):
        from selfreconcode_tpu.models.translator import translator_apply
        conds = dcond0[drbinds]

        def tfun(qq):
            out, _ = translator_apply(tp, tr.trans_net, qq, conds, 0.5)
            return out

        cols = []
        for i in range(3):
            e = jnp.zeros_like(q).at[:, i].set(1.0)
            _, col = jax.jvp(tfun, (q,), (e,))
            cols.append(col)
        return jnp.stack(cols, axis=-1)

    bench(f"def_regu translator jac ({drn})", defregu_jac,
          state.params["trans"], deformer, drpts)

    # full outer for reference
    d_full = bench("outer_pass full", lambda *a: step.outer_pass(*a),
                   state, deformer, new_tmp, g_params_in, g_bank_in, gtCs,
                   gtNs, fids_j, init_pts, sel_ok, ray_rows, ray_cols,
                   ray_binds, windows, ratios, lr, key)

    # outer without the optimizer update: re-jit a grad-only variant by
    # calling the loss directly
    import optax
    opt = tr.optimizer

    @jax.jit
    def adam_only(state, g_params, g_bank):
        updates, opt_state = opt.update((g_params, g_bank), state.opt_state,
                                        (state.params, state.bank))
        return jax.tree_util.tree_map(lambda u: u * 1e-4, updates)

    bench("adam update alone", adam_only, state, g_params_in, g_bank_in)


if __name__ == "__main__":
    main()
