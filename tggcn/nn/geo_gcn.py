"""Geometry-level graph convolution (GeoGCN) with a learned similarity adjacency.

Semantics follow the reference Geo_gcn (pyrutils/torch/models_gcn.py:6-100):
BatchNorm over the flattened (channel, node) axis, two 1x1-conv embeddings
4 -> 64 -> 64, a similarity adjacency S = softmax((W1 h)(W2 h)^T) computed per
(batch, time) with 64 -> 128 projections, then out = S @ h @ W with
W in R^{64x128} initialised U(+-1/sqrt(128)).

TPU-first re-design: instead of the reference's permute/contiguous dance over
(B, C, V, T) tensors, everything is a batched einsum over a (B, T, V, C)
layout — XLA maps the (V,128)x(128,V) similarity and the S @ h @ W chain
straight onto the MXU with (B*T) as the batch dimension. A fused Pallas kernel
for this block lives in tggcn.ops.
"""

import jax
import jax.numpy as jnp

from tggcn.nn.batchnorm import apply_batchnorm, init_batchnorm
from tggcn.nn.init import fan_in_uniform
from tggcn.nn.mlp import apply_linear, init_linear


def init_geo_gcn(key, node_n: int, in_channels: int = 4, out_channels: int = 128) -> dict:
    k_bn, k1, k2, ks1, ks2, kw = jax.random.split(key, 6)
    del k_bn
    return {
        "bn": init_batchnorm((node_n, in_channels)),
        "embed1": init_linear(k1, in_channels, 64, bias=True),
        "embed2": init_linear(k2, 64, 64, bias=True),
        "s1": init_linear(ks1, 64, 128, bias=True),
        "s2": init_linear(ks2, 64, 128, bias=True),
        "weight": fan_in_uniform(kw, (64, out_channels), out_channels),
    }


def apply_geo_gcn(params: dict, x: jnp.ndarray, train: bool = False,
                  use_pallas: bool = False):
    """Apply GeoGCN to geometry features.

    Arguments:
        x - (batch, time, nodes, in_channels) geometry tensor.
        use_pallas - route the post-BatchNorm pipeline through the fused
            Pallas TPU kernel (tggcn/ops/geo_gcn_pallas.py). Differentiable:
            the kernel carries a custom VJP whose backward is the XLA
            reference implementation's.
    Returns:
        (out, new_bn_state): out is (batch, time, nodes, out_channels).
    """
    x, bn_state = apply_batchnorm(params["bn"], x, reduce_axes=(0, 1), train=train)
    if use_pallas:
        from tggcn.ops.geo_gcn_pallas import geo_gcn_fused

        b, t, v, c = x.shape
        out = geo_gcn_fused(
            x.reshape(b * t, v, c),
            params["embed1"]["w"], params["embed1"]["b"],
            params["embed2"]["w"], params["embed2"]["b"],
            params["s1"]["w"], params["s1"]["b"],
            params["s2"]["w"], params["s2"]["b"],
            params["weight"])
        return out.reshape(b, t, v, -1), bn_state
    h = jax.nn.relu(apply_linear(params["embed1"], x))
    h = jax.nn.relu(apply_linear(params["embed2"], h))          # (B, T, V, 64)
    s1 = apply_linear(params["s1"], h)                           # (B, T, V, 128)
    s2 = apply_linear(params["s2"], h)
    scores = jnp.einsum("btvc,btwc->btvw", s1, s2)
    adjacency = jax.nn.softmax(scores, axis=-1)                  # (B, T, V, V)
    out = jnp.einsum("btvw,btwc->btvc", adjacency, h)
    out = out @ params["weight"]                                 # (B, T, V, out)
    return out, bn_state
