"""Point sampling helpers for eikonal / IGR losses.

Parity: utils/utils.py:74-84 (local Gaussian jitter + global uniform box
samples).  JAX-idiomatic: explicit PRNG keys, static shapes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_points(key, pc_input: jnp.ndarray, global_sigma: float,
                  local_sigma: float, ratio: int = 6) -> jnp.ndarray:
    """Sample off-manifold points around a point cloud.

    pc_input: (N, D). Returns (N + N//ratio, D) if ratio > 0 else (N, D):
    N local samples (Gaussian sigma=local_sigma around inputs) and N//ratio
    global samples (uniform in [-global_sigma, global_sigma]^D).
    """
    n, d = pc_input.shape
    k1, k2 = jax.random.split(key)
    local = pc_input + jax.random.normal(k1, (n, d), pc_input.dtype) * local_sigma
    if ratio > 0:
        glob = (jax.random.uniform(k2, (n // ratio, d), pc_input.dtype) * 2.0 - 1.0) * global_sigma
        return jnp.concatenate([local, glob], axis=0)
    return local


def subsample_mask_topk(key, valid: jnp.ndarray, k: int):
    """Pick up to k True entries of `valid` uniformly at random, fixed shape.

    Returns (idx, sel_valid): idx (k,) int32 indices into valid's flat axis,
    sel_valid (k,) bool marking which of the k slots landed on a True entry.
    TPU-idiomatic replacement for the reference's boolean-mask subsampling
    (model/network.py:517-526): random scores masked by validity + top-k keeps
    shapes static inside jit.
    """
    scores = jax.random.uniform(key, valid.shape)
    scores = jnp.where(valid, scores, -1.0)
    top_scores, idx = jax.lax.top_k(scores, k)
    return idx, top_scores >= 0.0
