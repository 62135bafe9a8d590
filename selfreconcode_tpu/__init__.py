"""SelfRecon-TPU: a TPU-native (JAX/XLA/Pallas) framework for self-supervised
clothed-human avatar reconstruction from monocular video.

Re-designed from scratch for TPU with the capabilities of the reference
SelfRecon implementation (CVPR 2022): canonical SDF template + non-rigid MLP
deformation + SMPL LBS skinning + differentiable mask/IDR rendering, optimized
per subject.

Architecture (all compute-path code is JAX/XLA/Pallas; static shapes, jit):
  - models/   neural fields (SDF, translator, render net), SMPL body model,
              LBS skinner
  - ops/      geometry kernels: trilinear sampling, marching cubes, sparse
              (octree) SDF evaluation, mesh & point rasterization
  - render/   camera model
  - engine/   surface root-finding w/ implicit differentiation, losses,
              train/infer steps
  - data/     scene dataset + per-frame learnable parameter banks
  - parallel/ device-mesh sharding helpers
"""

__version__ = "0.1.0"


def _machine_tag() -> str:
    """Short hash of this host's CPU feature set.

    XLA:CPU persists AOT results keyed only by the HLO — loading an
    artifact compiled on a host with a wider ISA (e.g. avx512fp16) on a
    narrower one logs cpu_aot_loader errors and can SIGILL.  Scoping the
    cache directory per CPU-feature-set makes stale cross-machine
    artifacts unreachable instead of loadable."""
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    return hashlib.sha1(feats.encode()).hexdigest()[:10]
    except OSError:
        pass
    import platform

    return hashlib.sha1(platform.processor().encode()).hexdigest()[:10]


def enable_compile_cache(path: str | None = None) -> None:
    """Point JAX's persistent compilation cache at `path` (default:
    `.jax_cache/<cpu-feature-hash>/` next to this package).  Stage switches
    re-jit the whole step (~minutes through the remote-TPU tunnel); the
    cache makes every repeat run — A/B variants, resumes, bench — skip that
    entirely.  Opt out with SRTPU_NO_COMPILE_CACHE=1."""
    import os
    import os.path as osp

    if os.environ.get("SRTPU_NO_COMPILE_CACHE"):
        return
    import jax

    if path is None:
        path = osp.abspath(osp.join(osp.dirname(__file__), "..",
                                    ".jax_cache", _machine_tag()))
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # older jax without the knobs — cache is best-effort
        pass


enable_compile_cache()
