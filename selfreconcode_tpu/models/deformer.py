"""Composite deformation: non-rigid MLP translator ∘ LBS skinning.

Parity: model/Deformer.py:10-20 (CompositeDeformer applies [MLPTranslator,
LBSkinner] in order; the skinner's weight lookup uses the *translated*
points).  Functional API: flat points + per-point frame indices keep every
call shape-static; the batched (B,P,3) case flattens to the same path.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from .skinner import Skinner, skinner_apply
from .translator import TranslatorNet, translator_apply


@dataclass(frozen=True)
class Deformer:
    translator: TranslatorNet   # static config (hashable frozen dataclass)
    skinner: Skinner            # pytree child (weight volume etc.)


# Registered as a pytree so jitted functions receive the deformer as an
# ARGUMENT (closure capture would inline the weight volume as an HLO
# constant — see Skinner's docstring).
jax.tree_util.register_pytree_node(
    Deformer,
    lambda d: ((d.skinner,), d.translator),
    lambda aux, leaves: Deformer(translator=aux, skinner=leaves[0]))


def deformer_apply(translator_params, deformer: Deformer, pts, batch_inds,
                   dcond, poses, trans, ratio=None):
    """pts (N,3), batch_inds (N,), dcond (B,C), poses (B,24,3), trans (B,3)
    -> (deformed (N,3), mlp_offset (N,3))."""
    cond = dcond[batch_inds]
    translated, offset = translator_apply(
        translator_params, deformer.translator, pts, cond, ratio)
    out = skinner_apply(deformer.skinner, translated, batch_inds, poses, trans)
    return out, offset


def deformer_apply_batched(translator_params, deformer: Deformer, pts_b,
                           dcond, poses, trans, ratio=None):
    """pts_b (B,P,3) -> (deformed (B,P,3), offset (B,P,3))."""
    B, P, _ = pts_b.shape
    flat = pts_b.reshape(-1, 3)
    batch_inds = jnp.repeat(jnp.arange(B), P)
    out, off = deformer_apply(translator_params, deformer, flat, batch_inds,
                              dcond, poses, trans, ratio)
    return out.reshape(B, P, 3), off.reshape(B, P, 3)


def deformer_jacobian(translator_params, deformer: Deformer, pts, batch_inds,
                      dcond, poses, trans, ratio=None):
    """Per-point 3x3 Jacobian d(deform)/d(point) via forward-mode.

    The reference computes this with three reverse-mode autograd.grad calls
    (utils/utils.py:106-120); with a 3-D input, jacfwd is exactly three JVP
    pushforwards at the same cost with no retained graph.  Arbitrarily
    re-differentiable (the normal loss differentiates through this).
    Returns (jac (N,3,3), deformed (N,3)).
    """
    def f(q):
        out, _ = deformer_apply(translator_params, deformer, q, batch_inds,
                                dcond, poses, trans, ratio)
        return out

    cols = []
    out = None
    for i in range(3):
        e = jnp.zeros_like(pts).at[:, i].set(1.0)
        out, col = jax.jvp(f, (pts,), (e,))
        cols.append(col)
    jac = jnp.stack(cols, axis=-1)  # jac[:, r, c] = d out_r / d p_c
    return jac, out
