"""Non-rigid deformation MLP (per-frame conditioned offset field).

Parity target: model/Deformer.py:22-76 (MLPTranslator) — 5 Linear layers
[PE(p)+cond, 512, 512, 512, 512, 3], ReLU, no weight norm, last layer
~zero-init (std 1e-3) so deformation starts as identity; returns p + offset
and exposes the raw offset for the offset-regularization loss.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.pe import positional_encoding, embed_dim
from .layers import apply_linear, dense_params


@dataclass(frozen=True)
class TranslatorNet:
    cond_size: int = 128      # mlp_deformer.condlen
    multires: int = 6
    hidden: Tuple[int, ...] = (512, 512, 512, 512)
    d_out: int = 3


def init_translator_params(key, net: TranslatorNet):
    rng = np.random.default_rng(int(jax.random.randint(key, (), 0, 2**31 - 1)))
    in_ch = embed_dim(net.multires, 3) if net.multires > 0 else 3
    dims = [in_ch + net.cond_size] + list(net.hidden) + [net.d_out]
    params = []
    for l in range(len(dims) - 1):
        in_dim, out_dim = dims[l], dims[l + 1]
        if l == len(dims) - 2:
            w = rng.normal(0.0, 1e-3, (out_dim, in_dim)).astype(np.float32)
            b = np.zeros((out_dim,), np.float32)
        else:
            # torch.nn.Linear default init: U(-1/sqrt(in), 1/sqrt(in))
            bound = 1.0 / np.sqrt(in_dim)
            w = rng.uniform(-bound, bound, (out_dim, in_dim)).astype(np.float32)
            b = rng.uniform(-bound, bound, (out_dim,)).astype(np.float32)
        params.append(dense_params(w, b))
    return params


def translator_offset(params, net: TranslatorNet, pts, cond, ratio=None):
    """pts (..., 3), cond (..., cond_size) broadcastable -> offset (..., 3)."""
    emb = positional_encoding(pts, net.multires, ratio)
    cond = jnp.broadcast_to(cond, emb.shape[:-1] + (net.cond_size,))
    x = jnp.concatenate([emb, cond], axis=-1)
    n = len(params)
    for l in range(n):
        x = apply_linear(params[l], x)
        if l < n - 1:
            x = jax.nn.relu(x)
    return x


def translator_apply(params, net: TranslatorNet, pts, cond, ratio=None):
    """Returns (deformed points p + offset, offset)."""
    off = translator_offset(params, net, pts, cond, ratio)
    return pts + off, off
