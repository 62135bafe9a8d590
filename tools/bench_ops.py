"""Component micro-benchmarks at production shapes (coarse stage, 1080p).

Times each hot kernel of the training step in isolation with the
queue-K-then-fetch-once method (jax.block_until_ready does not actually
sync on the axon tunnel — see tools/profile_step.py).

Usage: python tools/bench_ops.py [--v 225000] [--f 445000] [--iters 10]
"""
from __future__ import annotations

import argparse
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--v", type=int, default=74304, help="template verts")
    ap.add_argument("--f", type=int, default=148108, help="template faces")
    ap.add_argument("--n", type=int, default=3, help="frame batch")
    ap.add_argument("--hw", type=int, default=1080)
    ap.add_argument("--rays", type=int, default=2048, help="rays per frame")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from selfreconcode_tpu.models.sdf import SDFNet, init_sdf_params, \
        sdf_apply, sdf_grad
    from selfreconcode_tpu.models.translator import (TranslatorNet,
                                                     init_translator_params,
                                                     translator_apply)
    from selfreconcode_tpu.models.smpl import toy_smpl_model, smpl_tmp_apose
    from selfreconcode_tpu.models.skinner import (build_skinner,
                                                  sample_skin_weights,
                                                  skinner_apply)
    from selfreconcode_tpu.models.deformer import (Deformer, deformer_apply,
                                                   deformer_jacobian)
    from selfreconcode_tpu.render.camera import Camera
    from selfreconcode_tpu.ops.rasterize import rasterize_mesh, splat_mask
    from selfreconcode_tpu.engine.losses import max_pool_mask
    from selfreconcode_tpu.utils.sampling import subsample_mask_topk

    def fetch(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        return np.asarray(leaf.reshape(-1)[:1])

    tiny = jax.jit(lambda x: x + 1.0)
    fetch(tiny(jnp.zeros(())))
    t0 = time.perf_counter()
    for _ in range(5):
        fetch(tiny(jnp.zeros(())))
    rtt = (time.perf_counter() - t0) / 5 * 1e3
    print(f"devices={jax.devices()} RTT~{rtt:.0f}ms", flush=True)

    K = args.iters

    def bench(label, fn, *a):
        try:
            fetch(fn(*a))
            t0 = time.perf_counter()
            for _ in range(K):
                out = fn(*a)
            fetch(out)
            dt = ((time.perf_counter() - t0) * 1e3 - rtt) / K
            print(f"  {label:<42s} {dt:8.1f} ms", flush=True)
            return dt
        except Exception as e:  # keep the sweep going
            print(f"  {label:<42s} FAILED: {type(e).__name__} {e}")
            return None

    V, F, N, HW, P = args.v, args.f, args.n, args.hw, args.rays * args.n
    NV = N * V
    rng = np.random.default_rng(0)

    # nets + skinner (production sizes)
    sdf_net = SDFNet()
    trans_net = TranslatorNet()
    k0 = jax.random.PRNGKey(0)
    sdf_params = init_sdf_params(k0, sdf_net)
    tparams = init_translator_params(k0, trans_net)
    smpl = toy_smpl_model(n_verts=2048)
    skinner, _, _ = build_skinner(smpl, jnp.zeros(10), smpl_tmp_apose(1),
                                  resolution=(129, 225, 65))
    deformer = Deformer(translator=trans_net, skinner=skinner)
    print(f"weight table: {skinner.ws.shape} {skinner.ws.dtype} "
          f"({skinner.ws.nbytes/1e9:.2f} GB)", flush=True)

    pts = jnp.asarray(rng.uniform(-0.8, 0.8, (NV, 3)).astype(np.float32))
    binds = jnp.repeat(jnp.arange(N), V)
    dcond = jnp.zeros((N, 128))
    poses = jnp.asarray(0.1 * rng.standard_normal((N, 24, 3)), jnp.float32)
    trans = jnp.zeros((N, 3))

    print(f"\n[deformer stack, {NV} pts]")
    bench("translator fwd", jax.jit(
        lambda p, q: translator_apply(p, trans_net, q, dcond[binds], 0.5)[0]),
        tparams, pts)
    bench("weight gather (sample_skin_weights)", jax.jit(
        lambda sk, q: sample_skin_weights(sk, q)), skinner, pts)
    bench("skinner_apply", jax.jit(
        lambda sk, q: skinner_apply(sk, q, binds, poses, trans)),
        skinner, pts)
    dfn = jax.jit(lambda tp, d, q: deformer_apply(
        tp, d, q, binds, dcond, poses, trans, 0.5)[0])
    bench("deformer fwd", dfn, tparams, deformer, pts)
    cot = jnp.ones((NV, 3))
    bench("deformer fwd+vjp(pts,params)", jax.jit(
        lambda tp, d, q: jax.vjp(lambda tp_, q_: dfn(tp_, d, q_),
                                 tp, q)[1](cot)), tparams, deformer, pts)
    bench("deformer jacobian (3 jvp)", jax.jit(
        lambda tp, d, q: deformer_jacobian(tp, d, q, binds, dcond, poses,
                                           trans, 0.5)[0]),
        tparams, deformer, pts)

    # rasterization
    cam = Camera(focal=jnp.asarray([1000.0, 1000.0]),
                 principal=jnp.asarray([HW / 2.0, HW / 2.0]),
                 R=jnp.eye(3), T=jnp.asarray([0.0, 0.0, 2.5]),
                 H=HW, W=HW)
    verts1 = jnp.asarray(rng.uniform(-0.6, 0.6, (V, 3)).astype(np.float32))
    faces_np = rng.integers(0, V, (F, 3)).astype(np.int32)
    # make triangles tiny (MC-like): anchor + small offsets
    anchor = rng.uniform(-0.6, 0.6, (F, 1, 3)).astype(np.float32)
    tri = anchor + 0.004 * rng.standard_normal((F, 3, 3)).astype(np.float32)
    vstack = jnp.asarray(tri.reshape(-1, 3))
    fstack = jnp.arange(F * 3, dtype=jnp.int32).reshape(F, 3)
    fvalid = jnp.ones((F,), bool)
    print(f"\n[rasterize, {F} faces, {HW}p]")
    bench("rasterize_mesh fp=8", jax.jit(
        lambda v: rasterize_mesh(cam, v, fstack, fvalid, 8)), vstack)
    bench("rasterize_mesh fp=16", jax.jit(
        lambda v: rasterize_mesh(cam, v, fstack, fvalid, 16)), vstack)

    pvalid = jnp.ones((V,), bool)
    print(f"\n[splat, {V} pts, {HW}p]")
    sfn = jax.jit(lambda v: splat_mask(cam, v, pvalid, 0.006))
    bench("splat fwd", sfn, verts1)
    bench("splat fwd+bwd", jax.jit(
        lambda v: jax.grad(lambda v_: sfn(v_).sum())(v)), verts1)

    msk = jnp.asarray((rng.uniform(0, 1, (N, HW, HW)) > 0.7)
                      .astype(np.float32))
    print(f"\n[pixel ops, {N}x{HW}x{HW}]")
    bench("max_pool_mask r=3", jax.jit(
        lambda m: max_pool_mask(m, 3)), msk)
    flat_valid = msk.reshape(-1) > 0
    bench(f"subsample_mask_topk k={P}", jax.jit(
        lambda v: subsample_mask_topk(jax.random.PRNGKey(0), v, P)),
        flat_valid)

    # sdf / surface path at ray counts
    spts = jnp.asarray(rng.uniform(-0.5, 0.5, (P, 3)).astype(np.float32))
    print(f"\n[sdf, {P} pts]")
    bench("sdf fwd", jax.jit(
        lambda p, q: sdf_apply(p, sdf_net, q, 1.0)[0]), sdf_params, spts)
    bench("sdf_grad (3 jvp)", jax.jit(
        lambda p, q: sdf_grad(p, sdf_net, q, 1.0)), sdf_params, spts)
    ek = jnp.asarray(rng.uniform(-0.5, 0.5, (P + 4096 + (P + 4096) // 6, 3))
                     .astype(np.float32))
    bench("sdf_grad eikonal-size", jax.jit(
        lambda p, q: sdf_grad(p, sdf_net, q, 1.0)), sdf_params, ek)


if __name__ == "__main__":
    main()
