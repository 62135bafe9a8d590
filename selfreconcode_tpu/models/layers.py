"""Minimal functional layer helpers (explicit param pytrees).

We deliberately avoid a module framework: every net in this codebase is a
plain function over a dict-of-arrays pytree, which keeps jit/vmap/jacfwd and
custom_vjp composition trivial, and makes checkpointing a single pytree save.

Weight normalization follows torch.nn.utils.weight_norm(dim=0): for a Linear
with weight W (out, in), W = g * v / ||v||_row where g (out,) holds the row
norms. The reference applies this to the SDF net and render net
(model/network.py:65-66, model/RenderNet.py:46-47).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def weight_norm_params(w: np.ndarray, b: np.ndarray):
    """Split a dense weight into weight-norm (v, g) + bias."""
    g = np.linalg.norm(w, axis=1)
    return {"v": jnp.asarray(w), "g": jnp.asarray(g), "b": jnp.asarray(b)}


def dense_params(w: np.ndarray, b: np.ndarray):
    return {"w": jnp.asarray(w), "b": jnp.asarray(b)}


def apply_linear(p, x):
    """x (..., in) -> (..., out) for either weight-norm or plain params."""
    if "v" in p:
        v = p["v"]
        norm = jnp.linalg.norm(v, axis=1, keepdims=True)
        w = p["g"][:, None] * v / jnp.clip(norm, 1e-12, None)
    else:
        w = p["w"]
    return x @ w.T + p["b"]


def softplus_beta(x, beta: float = 100.0):
    """softplus with beta, matching torch.nn.Softplus(beta): threshold at
    beta*x > 20 switches to identity for numerical stability."""
    bx = beta * x
    return jnp.where(bx > 20.0, x, jax.nn.softplus(bx) / beta)
