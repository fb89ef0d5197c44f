"""Fused Pallas TPU kernel for the GeoGCN block.

Fuses the whole post-BatchNorm geometry pipeline for a tile of frames into a
single VMEM-resident kernel: embed (4 -> 64 -> 64, ReLU), the similarity
projections (64 -> 128), the per-frame V x V adjacency softmax, and the
S @ h @ W output chain (reference pyrutils/torch/models_gcn.py:30-100).

XLA already fuses much of this; the kernel removes the HBM round trips for
the h / s1 / s2 / adjacency intermediates (each (N, V, 64..128) tensors) and
keeps every weight resident in VMEM across the grid. A pure-XLA reference
implementation lives alongside for equivalence tests and CPU fallback.

Shapes: x (N, V, 4) with N = batch * time flattened, V in {19, 26, 30}.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def geo_gcn_reference(x_norm, w1, b1, w2, b2, ws1, bs1, ws2, bs2, w_out):
    """Pure-XLA reference of the fused block. x_norm (N, V, 4) -> (N, V, out)."""
    h = jax.nn.relu(x_norm @ w1 + b1)
    h = jax.nn.relu(h @ w2 + b2)                       # (N, V, 64)
    s1 = h @ ws1 + bs1                                  # (N, V, 128)
    s2 = h @ ws2 + bs2
    scores = jnp.einsum("nvc,nwc->nvw", s1, s2)
    adjacency = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("nvw,nwc->nvc", adjacency, h)
    return out @ w_out


def _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, ws1_ref, bs1_ref, ws2_ref,
            bs2_ref, w_out_ref, out_ref):
    tile_n, v, c_in = x_ref.shape
    x = x_ref[:].reshape(tile_n * v, c_in)
    h = jnp.maximum(jnp.dot(x, w1_ref[:], preferred_element_type=jnp.float32)
                    + b1_ref[:], 0.0)
    h = jnp.maximum(jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)
                    + b2_ref[:], 0.0)                               # (TN*V, 64)
    s1 = jnp.dot(h, ws1_ref[:], preferred_element_type=jnp.float32) + bs1_ref[:]
    s2 = jnp.dot(h, ws2_ref[:], preferred_element_type=jnp.float32) + bs2_ref[:]
    s1 = s1.reshape(tile_n, v, s1.shape[-1])
    s2 = s2.reshape(tile_n, v, s2.shape[-1])
    scores = jax.lax.dot_general(
        s1, s2, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                         # (TN, V, V)
    adjacency = jax.nn.softmax(scores, axis=-1)
    h3 = h.reshape(tile_n, v, h.shape[-1])
    mixed = jax.lax.dot_general(
        adjacency, h3, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                         # (TN, V, 64)
    out = jnp.dot(mixed.reshape(tile_n * v, -1), w_out_ref[:],
                  preferred_element_type=jnp.float32)
    out_ref[:] = out.reshape(tile_n, v, -1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11))
def geo_gcn_fused(x_norm, w1, b1, w2, b2, ws1, bs1, ws2, bs2, w_out,
                  tile_n: int = 16, interpret: bool = False):
    """Differentiable fused GeoGCN: Pallas forward, XLA-reference backward.

    The forward runs the VMEM-resident Pallas kernel; the backward is the VJP
    of the mathematically identical XLA implementation (geo_gcn_reference),
    so the kernel is usable in training, not just inference.
    """
    return _geo_gcn_fused_impl(x_norm, w1, b1, w2, b2, ws1, bs1, ws2, bs2, w_out,
                               tile_n=tile_n, interpret=interpret)


def _geo_gcn_fused_fwd(x_norm, w1, b1, w2, b2, ws1, bs1, ws2, bs2, w_out,
                       tile_n, interpret):
    out = _geo_gcn_fused_impl(x_norm, w1, b1, w2, b2, ws1, bs1, ws2, bs2, w_out,
                              tile_n=tile_n, interpret=interpret)
    return out, (x_norm, w1, b1, w2, b2, ws1, bs1, ws2, bs2, w_out)


def _geo_gcn_fused_bwd(tile_n, interpret, residuals, g):
    _, vjp = jax.vjp(geo_gcn_reference, *residuals)
    return vjp(g)


geo_gcn_fused.defvjp(_geo_gcn_fused_fwd, _geo_gcn_fused_bwd)


@functools.partial(jax.jit, static_argnames=("tile_n", "interpret"))
def _geo_gcn_fused_impl(x_norm, w1, b1, w2, b2, ws1, bs1, ws2, bs2, w_out,
                        tile_n: int = 16, interpret: bool = False):
    """Fused GeoGCN over (N, V, 4) frames; pads N up to a tile multiple."""
    n, v, c_in = x_norm.shape
    out_c = w_out.shape[-1]
    padded_n = ((n + tile_n - 1) // tile_n) * tile_n
    if padded_n != n:
        x_norm = jnp.pad(x_norm, ((0, padded_n - n), (0, 0), (0, 0)))
    grid = (padded_n // tile_n,)
    weight_spec = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    result = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, v, c_in), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            weight_spec(), weight_spec(), weight_spec(), weight_spec(),
            weight_spec(), weight_spec(), weight_spec(), weight_spec(),
            weight_spec(),
        ],
        out_specs=pl.BlockSpec((tile_n, v, out_c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((padded_n, v, out_c), x_norm.dtype),
        interpret=interpret,
    )(x_norm, w1, b1, w2, b2, ws1, bs1, ws2, bs2, w_out)
    return result[:n]
