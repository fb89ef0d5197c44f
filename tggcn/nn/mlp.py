"""Functional MLP with name-based activations.

Mirrors the reference's build_mlp (pyrutils/torch/models.py:8-36) and
pick_activation_function (pyrutils/torch/general.py:15-44), re-expressed as
init/apply pairs over parameter pytrees. Weights are stored as (in, out) so
``x @ w`` maps directly onto the MXU.
"""

from functools import partial
from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp

from tggcn.nn.init import fan_in_uniform


def init_linear(key, in_dim: int, out_dim: int, bias: bool = True) -> dict:
    wkey, bkey = jax.random.split(key)
    params = {"w": fan_in_uniform(wkey, (in_dim, out_dim), in_dim)}
    if bias:
        params["b"] = fan_in_uniform(bkey, (out_dim,), in_dim)
    return params


def apply_linear(params: dict, x: jnp.ndarray, precision=None) -> jnp.ndarray:
    y = jnp.matmul(x, params["w"], precision=precision)
    if "b" in params:
        y = y + params["b"]
    return y


def _pick_activation(activation: Union[str, dict, None]):
    if activation is None:
        return lambda x: x
    if isinstance(activation, dict):
        name = activation["name"]
        kwargs = {k: v for k, v in activation.items() if k != "name"}
    else:
        name, kwargs = activation, {}
    name = name.lower()
    if name == "identity":
        return lambda x: x
    if name == "relu":
        return jax.nn.relu
    if name == "sigmoid":
        return jax.nn.sigmoid
    if name == "tanh":
        return jnp.tanh
    if name == "softplus":
        return jax.nn.softplus
    if name == "logsigmoid":
        return jax.nn.log_sigmoid
    if name == "logsoftmax":
        return partial(jax.nn.log_softmax, axis=kwargs.get("dim", -1))
    if name == "softmax":
        return partial(jax.nn.softmax, axis=kwargs.get("dim", -1))
    raise ValueError(f"Unknown activation: {name}")


def init_mlp(key, dims: Sequence[int], bias: bool = True) -> dict:
    keys = jax.random.split(key, max(len(dims) - 1, 1))
    layers = [init_linear(k, d_in, d_out, bias=bias)
              for k, d_in, d_out in zip(keys, dims[:-1], dims[1:])]
    return {"layers": layers}


def apply_mlp(params: dict, x: jnp.ndarray,
              activations: Optional[Sequence[Union[str, dict]]] = None,
              dropout: float = 0.0, rng: Optional[jax.Array] = None,
              train: bool = False, precision=None) -> jnp.ndarray:
    layers = params["layers"]
    if activations is None:
        activations = ["identity"] * len(layers)
    if len(layers) != len(activations):
        raise ValueError("Number of activations must match the number of layers.")
    for i, (layer, activation) in enumerate(zip(layers, activations)):
        x = _pick_activation(activation)(apply_linear(layer, x, precision=precision))
        if dropout and train:
            rng, key = jax.random.split(rng)
            keep = jax.random.bernoulli(key, 1.0 - dropout, x.shape)
            x = jnp.where(keep, x / (1.0 - dropout), 0.0)
    return x


def init_bilinear(key, in1: int, in2: int, out: int, bias: bool = True) -> dict:
    """Bilinear layer y = x1^T A x2 + b (torch nn.Bilinear semantics)."""
    wkey, bkey = jax.random.split(key)
    params = {"w": fan_in_uniform(wkey, (out, in1, in2), in1)}
    if bias:
        params["b"] = fan_in_uniform(bkey, (out,), in1)
    return params


def apply_bilinear(params: dict, x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """x1 (..., in1), x2 (..., in2) -> (..., out)."""
    y = jnp.einsum("...i,oij,...j->...o", x1, params["w"], x2)
    if "b" in params:
        y = y + params["b"]
    return y
