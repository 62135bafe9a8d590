"""IDR-style color network.

Parity target: model/RenderNet.py:9-96 (RenderingNetwork_view_norm) —
input [points(3), view(PE_v), normal(PE_n), rendcond(256) + per-frame
rcond(?)], 4x512 ReLU, tanh output in [-1, 1], weight norm, separate annealed
PE for view (multires_v=4) and normal (multires_n=0 by default).

Note on the frame latent: the reference concatenates the SDF's 256-d
rendcond feature as `feature_vectors`; the per-frame rcond bank is handled by
the caller (utils.compute_netRender_color passes sdf.rendcond — the rcond
frame code participates via compute at model/network.py:612 where
`rendcond[batch_inds]` is passed but the network only consumes the sdf
feature; we keep the same call signature for parity).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.pe import positional_encoding, embed_dim
from .layers import apply_linear, weight_norm_params


@dataclass(frozen=True)
class RenderNet:
    feature_size: int = 256  # render_net.condlen
    d_in: int = 9            # [p, view, normal]
    d_out: int = 3
    hidden: Tuple[int, ...] = (512, 512, 512, 512)
    multires_v: int = 4
    multires_n: int = 0
    mode: str = "idr"


def _in_dim(net: RenderNet) -> int:
    d = net.d_in + net.feature_size
    if net.multires_v > 0:
        d += embed_dim(net.multires_v, 3) - 3
    if net.multires_n > 0:
        d += embed_dim(net.multires_n, 3) - 3
    return d


def init_render_params(key, net: RenderNet):
    rng = np.random.default_rng(int(jax.random.randint(key, (), 0, 2**31 - 1)))
    dims = [_in_dim(net)] + list(net.hidden) + [net.d_out]
    params = []
    for l in range(len(dims) - 1):
        in_dim, out_dim = dims[l], dims[l + 1]
        bound = 1.0 / np.sqrt(in_dim)
        w = rng.uniform(-bound, bound, (out_dim, in_dim)).astype(np.float32)
        b = rng.uniform(-bound, bound, (out_dim,)).astype(np.float32)
        params.append(weight_norm_params(w, b))
    return params


def render_apply(params, net: RenderNet, points, normals, view_dirs,
                 feature_vectors, ratio=None):
    """All args (..., C); returns colors (..., 3) in [-1, 1]."""
    if net.multires_v > 0:
        view_dirs = positional_encoding(view_dirs, net.multires_v, ratio)
    if net.multires_n > 0:
        normals = positional_encoding(normals, net.multires_n, ratio)
    if net.mode == "idr":
        x = jnp.concatenate([points, view_dirs, normals, feature_vectors], axis=-1)
    elif net.mode == "no_view_dir":
        x = jnp.concatenate([points, normals, feature_vectors], axis=-1)
    elif net.mode == "no_normal":
        x = jnp.concatenate([points, view_dirs, feature_vectors], axis=-1)
    else:
        raise ValueError(net.mode)
    n = len(params)
    for l in range(n):
        x = apply_linear(params[l], x)
        if l < n - 1:
            x = jax.nn.relu(x)
    return jnp.tanh(x)
