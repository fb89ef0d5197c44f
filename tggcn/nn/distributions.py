"""Discrete decision estimators (straight-through and Gumbel-sigmoid).

Reference semantics: pyrutils/torch/distributions.py:4-53 and the
discrete_estimator dispatcher (vhoi/models.py:1620-1627). The Gumbel path
takes an explicit JAX PRNG key instead of torch's global RNG.
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def straight_through_estimator(x: jnp.ndarray, threshold: float = 0.5) -> jnp.ndarray:
    """Hard threshold in the forward pass, identity gradient in the backward."""
    hard = (x > threshold).astype(x.dtype)
    return x + jax.lax.stop_gradient(hard - x)


def sample_from_gumbel_sigmoid(key, probabilities: jnp.ndarray,
                               temperature: float = 1.0) -> jnp.ndarray:
    """Sample relaxed binary probabilities; input/output shape (..., 1)."""
    probs = jnp.concatenate([probabilities, 1.0 - probabilities], axis=-1)
    gumbel = jax.random.gumbel(key, probs.shape, dtype=probs.dtype)
    y = jnp.log(probs + 1e-20) + gumbel
    return jax.nn.softmax(y / temperature, axis=-1)[..., :1]


def straight_through_gumbel_sigmoid(key, probabilities: jnp.ndarray,
                                    temperature: float = 1.0,
                                    threshold: float = 0.5) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Hard/soft Gumbel-sigmoid decisions with a straight-through gradient."""
    y = sample_from_gumbel_sigmoid(key, probabilities, temperature=temperature)
    hard = (y > threshold).astype(y.dtype)
    z = y + jax.lax.stop_gradient(hard - y)
    return z, y


def discrete_estimator(x: jnp.ndarray, strategy: str = "straight-through",
                       threshold: float = 0.5,
                       key: Optional[jax.Array] = None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dispatch on strategy; returns (hard, soft) decisions."""
    if strategy in {"straight-through", "st"}:
        return straight_through_estimator(x, threshold), x
    if strategy in {"gumbel-sigmoid", "gs"}:
        if key is None:
            raise ValueError("gumbel-sigmoid strategy requires a PRNG key.")
        return straight_through_gumbel_sigmoid(key, x, threshold=threshold)
    raise ValueError(
        f"unknown discrete-estimator strategy {strategy!r}; expected "
        "'straight-through'/'st' or 'gumbel-sigmoid'/'gs'.")
