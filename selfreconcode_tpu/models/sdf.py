"""Canonical SDF field: IDR-style ImplicitNetwork.

Parity target: model/network.py:14-118 of the reference —
  8x512 softplus(beta=100) MLP, skip connection at layer 4 (concat input and
  divide by sqrt(2)), geometric (sphere) initialization with bias 0.6,
  weight normalization, annealed positional encoding (multires=6), output =
  [sdf (1), rendcond feature (256)].

TPU-first: the net is a pure function over a param pytree; the gradient wrt
points is jax.grad (forward caller composes); no hidden state (`rendcond` is
returned, not stored on the module).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.pe import positional_encoding, embed_dim
from .layers import apply_linear, softplus_beta, weight_norm_params


@dataclass(frozen=True)
class SDFNet:
    d_in: int = 3
    d_out: int = 1
    feature_size: int = 256          # rendcond width (render_net.condlen)
    hidden: Tuple[int, ...] = (512,) * 8
    skip_in: Tuple[int, ...] = (4,)
    multires: int = 6
    bias: float = 0.6                # geometric-init sphere radius
    beta: float = 100.0


def init_sdf_params(key, net: SDFNet):
    """Geometric initialization (SAL/IGR), matching model/network.py:49-63.

    Layer l weights ~ N(0, sqrt(2)/sqrt(out_dim)); first layer zeroes the PE
    channels (cols 3:); skip layers zero the last (in_ch-3) columns; the final
    layer is ~N(sqrt(pi)/sqrt(in_dim), 1e-4) with bias -`bias` so the net
    starts as an approximate sphere of radius `bias`.
    """
    rng = np.random.default_rng(int(jax.random.randint(key, (), 0, 2**31 - 1)))
    in_ch = embed_dim(net.multires, net.d_in) if net.multires > 0 else net.d_in
    dims = [in_ch] + list(net.hidden) + [net.d_out + net.feature_size]
    n_layers = len(dims)
    params = []
    for l in range(n_layers - 1):
        # The layer feeding a skip target outputs dims[l+1]-dims[0] channels so
        # that after [x, input] concat the skip layer's input width is exactly
        # dims[l] (parity: model/network.py:41-45,88-89).
        if l + 1 in net.skip_in:
            out_dim = dims[l + 1] - dims[0]
        else:
            out_dim = dims[l + 1]
        in_dim = dims[l]
        w = np.zeros((out_dim, in_dim), np.float32)
        b = np.zeros((out_dim,), np.float32)
        if l == n_layers - 2:
            w = rng.normal(np.sqrt(np.pi) / np.sqrt(in_dim), 1e-4,
                           (out_dim, in_dim)).astype(np.float32)
            b[:] = -net.bias
        elif net.multires > 0 and l == 0:
            w[:, :3] = rng.normal(0.0, np.sqrt(2) / np.sqrt(out_dim),
                                  (out_dim, 3)).astype(np.float32)
        elif net.multires > 0 and l in net.skip_in:
            w = rng.normal(0.0, np.sqrt(2) / np.sqrt(out_dim),
                           (out_dim, in_dim)).astype(np.float32)
            w[:, -(dims[0] - 3):] = 0.0
        else:
            w = rng.normal(0.0, np.sqrt(2) / np.sqrt(out_dim),
                           (out_dim, in_dim)).astype(np.float32)
        params.append(weight_norm_params(w, b))
    return params


def _forward(params, net: SDFNet, x_embedded):
    x = x_embedded
    n = len(params)
    for l in range(n):
        if l in net.skip_in:
            x = jnp.concatenate([x, x_embedded], axis=-1) / np.sqrt(2)
        x = apply_linear(params[l], x)
        if l < n - 1:
            x = softplus_beta(x, net.beta)
    return x


def sdf_apply(params, net: SDFNet, pts, ratio=None):
    """pts (..., 3) -> (sdf (...,), rendcond (..., feature_size)).

    ratio: None (no annealing) or scalar (traced ok); parity with the
    reference ratio plumbing at model/network.py:72-80.
    """
    emb = positional_encoding(pts, net.multires, ratio)
    out = _forward(params, net, emb)
    return out[..., 0], out[..., net.d_out:]


def sdf_value_only(params, net: SDFNet, pts, ratio=None):
    return sdf_apply(params, net, pts, ratio)[0]


def sdf_grad(params, net: SDFNet, pts, ratio=None):
    """Point gradient (..., 3) of the SDF via FORWARD mode (3 JVPs).

    Equivalent to ImplicitNetwork.gradient (model/network.py:102-114).  A 3-D
    input makes forward mode the natural choice, and it matters doubly here:
    the XLA TPU compiler SIGILLs (priority-fusion cost model) on
    reverse-over-reverse graphs through this MLP, while reverse-over-forward
    compiles — so any gradient that is differentiated AGAIN in a loss must be
    this one.
    """
    def f(q):
        return sdf_value_only(params, net, q, ratio)

    cols = []
    for i in range(3):
        e = jnp.zeros_like(pts).at[..., i].set(1.0)
        _, col = jax.jvp(f, (pts,), (e,))
        cols.append(col)
    return jnp.stack(cols, axis=-1)


def sdf_value_and_grad(params, net: SDFNet, pts, ratio=None):
    """Returns (sdf (...), grad (..., 3)); grad in forward mode (see
    sdf_grad)."""
    sdf = sdf_value_only(params, net, pts, ratio)
    return sdf, sdf_grad(params, net, pts, ratio)
