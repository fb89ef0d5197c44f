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


def _frame_indexed_gumbel(key, shape, dtype, frame_indices, time_axis):
    """Gumbel noise keyed per ABSOLUTE frame index along `time_axis`.

    Noise for frame t derives from fold_in(key, t), so the draw depends only
    on (key, t) — not on where a sliding window starts. This is what makes
    gs-strategy streaming bit-consistent with the offline run
    (tggcn/models/streaming.py): both sample identical noise at identical
    absolute frames.
    """
    per_frame = shape[:time_axis] + shape[time_axis + 1:]
    keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(frame_indices)
    g = jax.vmap(lambda k: jax.random.gumbel(k, per_frame, dtype=dtype))(keys)
    return jnp.moveaxis(g, 0, time_axis)


def sample_from_gumbel_sigmoid(key, probabilities: jnp.ndarray,
                               temperature: float = 1.0,
                               frame_indices: Optional[jnp.ndarray] = None,
                               time_axis: int = 1) -> jnp.ndarray:
    """Sample relaxed binary probabilities; input/output shape (..., 1)."""
    probs = jnp.concatenate([probabilities, 1.0 - probabilities], axis=-1)
    if frame_indices is None:
        gumbel = jax.random.gumbel(key, probs.shape, dtype=probs.dtype)
    else:
        gumbel = _frame_indexed_gumbel(key, probs.shape, probs.dtype,
                                       frame_indices, time_axis)
    y = jnp.log(probs + 1e-20) + gumbel
    return jax.nn.softmax(y / temperature, axis=-1)[..., :1]


def straight_through_gumbel_sigmoid(key, probabilities: jnp.ndarray,
                                    temperature: float = 1.0,
                                    threshold: float = 0.5,
                                    frame_indices: Optional[jnp.ndarray] = None,
                                    time_axis: int = 1) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Hard/soft Gumbel-sigmoid decisions with a straight-through gradient."""
    y = sample_from_gumbel_sigmoid(key, probabilities, temperature=temperature,
                                   frame_indices=frame_indices,
                                   time_axis=time_axis)
    hard = (y > threshold).astype(y.dtype)
    z = y + jax.lax.stop_gradient(hard - y)
    return z, y


def discrete_estimator(x: jnp.ndarray, strategy: str = "straight-through",
                       threshold: float = 0.5,
                       key: Optional[jax.Array] = None,
                       frame_indices: Optional[jnp.ndarray] = None,
                       time_axis: int = 1) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dispatch on strategy; returns (hard, soft) decisions.

    frame_indices (optional, gs only): absolute frame ids along `time_axis`
    of x — noise is then drawn per frame via fold_in(key, t) so windowed
    (streaming) evaluation samples the same noise as the offline run.
    """
    if strategy in {"straight-through", "st"}:
        return straight_through_estimator(x, threshold), x
    if strategy in {"gumbel-sigmoid", "gs"}:
        if key is None:
            raise ValueError("gumbel-sigmoid strategy requires a PRNG key.")
        return straight_through_gumbel_sigmoid(key, x, threshold=threshold,
                                               frame_indices=frame_indices,
                                               time_axis=time_axis)
    raise ValueError(
        f"unknown discrete-estimator strategy {strategy!r}; expected "
        "'straight-through'/'st' or 'gumbel-sigmoid'/'gs'.")
