"""Annealed NeRF positional encoding.

Parity: model/Embedder.py (include_input=True, log-sampled frequency bands,
per-band annealing weights) and utils/utils.py:40-46 (annealing schedule).

Unlike the reference, the annealing ratio is a *traced* scalar so the whole
training step stays inside one jit compilation; the per-band cosine window is
computed with jnp.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def embed_dim(multires: int, input_dims: int = 3) -> int:
    return input_dims * (1 + 2 * multires)


def annealing_band_weights(multires: int, ratio) -> jnp.ndarray:
    """Per-frequency-band window w_k = (1-cos(pi*clip(alpha-k,0,1)))/2.

    alpha = ratio * multires; returns (multires,) array (each band's weight is
    shared by its sin and cos features).  Parity: utils/utils.py:40-46.
    """
    alpha = ratio * multires
    ks = jnp.arange(multires, dtype=jnp.float32)
    x = jnp.clip(alpha - ks, 0.0, 1.0)
    return (1.0 - jnp.cos(jnp.pi * x)) / 2.0


def positional_encoding(x: jnp.ndarray, multires: int, ratio=None) -> jnp.ndarray:
    """PE with include_input and optional coarse-to-fine annealing.

    x: (..., D). Returns (..., D*(1+2*multires)).
    ratio semantics (parity with model/network.py:74-80):
      None       -> all band weights 1
      ratio <= 0 -> all band weights 0 (traced ratio handled via clip)
      else       -> annealing_band_weights(multires, ratio)
    Feature order matches the reference embedder: [x, sin(2^0 x), cos(2^0 x),
    sin(2^1 x), cos(2^1 x), ...], each block of width D.
    """
    if multires <= 0:
        return x
    freqs = 2.0 ** np.arange(multires, dtype=np.float32)  # log-sampled bands
    xf = x[..., None, :] * freqs[:, None]  # (..., L, D)
    sin = jnp.sin(xf)
    cos = jnp.cos(xf)
    if ratio is not None:
        w = annealing_band_weights(multires, ratio)  # (L,)
        sin = sin * w[:, None]
        cos = cos * w[:, None]
    feats = jnp.concatenate([sin[..., None, :], cos[..., None, :]], axis=-2)
    feats = feats.reshape(x.shape[:-1] + (2 * multires * x.shape[-1],))
    return jnp.concatenate([x, feats], axis=-1)
