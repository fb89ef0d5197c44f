"""Batch normalisation with running statistics.

Matches torch BatchNorm1d semantics (eps 1e-5, momentum 0.1, biased batch
variance for normalisation, unbiased for the running update), as used by the
geometry stream's norm_data block (reference pyrutils/torch/models_gcn.py:39-50).
"""

import jax.numpy as jnp


def init_batchnorm(shape) -> dict:
    return {
        "params": {"scale": jnp.ones(shape), "bias": jnp.zeros(shape)},
        "state": {"mean": jnp.zeros(shape), "var": jnp.ones(shape)},
    }


def apply_batchnorm(bn: dict, x: jnp.ndarray, reduce_axes, train: bool,
                    momentum: float = 0.1, eps: float = 1e-5):
    """Normalise x over reduce_axes; remaining axes must match the param shape.

    Returns (y, new_state). new_state equals the input state in eval mode.
    """
    params, state = bn["params"], bn["state"]
    if train:
        mean = jnp.mean(x, axis=reduce_axes)
        var = jnp.var(x, axis=reduce_axes)
        n = 1
        for axis in reduce_axes:
            n *= x.shape[axis]
        unbiased_var = var * n / max(n - 1, 1)
        new_state = {
            "mean": (1.0 - momentum) * state["mean"] + momentum * mean,
            "var": (1.0 - momentum) * state["var"] + momentum * unbiased_var,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    shape = [1 if i in reduce_axes else s for i, s in enumerate(x.shape)]
    mean_b = mean.reshape(shape)
    var_b = var.reshape(shape)
    scale_b = params["scale"].reshape(shape)
    bias_b = params["bias"].reshape(shape)
    y = (x - mean_b) * jnp.reciprocal(jnp.sqrt(var_b + eps)) * scale_b + bias_b
    return y, new_state
