"""Temporal/segment helpers: decision filtering, state reordering, positional features.

TPU re-designs of the reference's per-step Python loops:
  * filter_soft_decisions (vhoi/models.py:1637-1664): 3-point local-maximum
    window expressed as shifted tensors (no loop over T).
  * reorder_hidden_states (vhoi/models.py:1567-1586): the reference's
    per-example nonzero() loop becomes a single reverse-time lax.scan that
    broadcasts each segment-end hidden state backwards over the segment.
  * make_periodic_embedding (vhoi/models.py:1778-1794), time tensor
    (:935-952) and segment-length tensor (:954-981).
"""

import jax
import jax.numpy as jnp


def filter_soft_decisions(u_soft: jnp.ndarray, update_threshold: float = 0.5) -> jnp.ndarray:
    """Local-maximum filter over soft decisions along the time axis.

    Arguments:
        u_soft - (B, T, ...) soft decisions, time on axis 1.
    Returns:
        Filtered hard decisions (same shape), straight-through gradient.
    """
    zeros = jnp.zeros_like(u_soft[:, :1])
    prev = jnp.concatenate([zeros, u_soft[:, :-1]], axis=1)
    nxt = jnp.concatenate([u_soft[:, 1:], zeros], axis=1)
    condition = (u_soft > prev) & (u_soft > nxt) & (u_soft >= update_threshold)
    hard = (u_soft >= update_threshold).astype(u_soft.dtype)
    hard_ste = u_soft + jax.lax.stop_gradient(hard - u_soft)
    # clamp(max=0): forward is 0 for hard==1; gradient passes where input <= 0.
    clamped = jnp.where(hard_ste <= 0.0, hard_ste, 0.0)
    return jnp.where(condition, hard_ste, clamped)


def reorder_hidden_states(h: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """Label every frame with its segment's final hidden state.

    Arguments:
        h - (B, T, H) segment-level hidden states.
        u - (B, T) hard 0/1 end-of-segment flags (gradients are not taken
            through u, matching the reference's .detach()).
    Returns:
        (B, T, H): for each frame, the hidden state of the next end frame at
        or after it; frames after the last end frame keep their own state.
    """
    u = jax.lax.stop_gradient(u)
    t = h.shape[1]
    # Gather formulation (no sequential scan): each frame reads the nearest
    # end frame at or after it. idx[t] = min{s >= t : u[s] != 0}, computed as
    # a reverse cumulative min (log-depth on TPU); frames past the last end
    # frame fall back to themselves. The backward is then a scatter-add
    # instead of a second T-step scan.
    steps = jnp.arange(t, dtype=jnp.int32)
    candidates = jnp.where(u != 0, steps[None, :], t)      # (B, T)
    next_end = jax.lax.cummin(candidates, axis=1, reverse=True)
    idx = jnp.where(next_end < t, next_end, steps[None, :])
    return jnp.take_along_axis(h, idx[:, :, None], axis=1)


def make_periodic_embedding(x: jnp.ndarray, hidden_size: int) -> jnp.ndarray:
    """Sin/cos positional embedding of a (*, 1) tensor -> (*, hidden_size)."""
    assert hidden_size % 2 == 0, "hidden_size must be even."
    exponent = jnp.linspace(0.0, 1.0, hidden_size // 2, dtype=x.dtype)
    w = jnp.asarray(1e4, dtype=x.dtype) ** exponent
    sines = jnp.sin(x / w)
    cosines = jnp.cos(x / w)
    return jnp.concatenate([sines, cosines], axis=-1)


def assemble_time_tensor(steps_per_example: jnp.ndarray, max_num_steps: int,
                         ignore_division_by_num_steps: bool = False) -> jnp.ndarray:
    """Time features (max_num_steps, batch, 1) (reference models.py:935-952)."""
    x_time = jnp.arange(1, max_num_steps + 1, dtype=steps_per_example.dtype)[:, None]
    x_time = jnp.repeat(x_time, steps_per_example.shape[0], axis=1)
    if not ignore_division_by_num_steps:
        x_time = x_time / steps_per_example
    return x_time[..., None]


def assemble_segment_length_tensor(u_hard: jnp.ndarray, steps_per_example: jnp.ndarray,
                                   ignore_division_by_number_of_steps: bool = False) -> jnp.ndarray:
    """Per-frame relative segment length (B, T, E, 1) (reference models.py:954-981).

    At each end frame the value is the (normalised) length since the previous
    end frame; other frames are zero.
    """
    batch, num_steps, _ = u_hard.shape
    x_time = assemble_time_tensor(steps_per_example, num_steps,
                                  ignore_division_by_number_of_steps)  # (T, B, 1)
    x_time = jnp.transpose(x_time, (1, 0, 2))[..., 0]  # (B, T)

    u_te = jnp.moveaxis(u_hard, 1, 0)        # (T, B, E)
    t_te = jnp.moveaxis(x_time, 1, 0)[..., None]  # (T, B, 1)

    def step(acc, inp):
        u_t, x_t = inp
        rel = u_t * x_t
        rel = jnp.where(rel.astype(bool), rel - acc, rel)
        acc = acc + rel
        return acc, rel

    init = jnp.zeros((batch, u_hard.shape[-1]), dtype=u_hard.dtype)
    _, rel = jax.lax.scan(step, init, (u_te, t_te))
    rel = jnp.moveaxis(rel, 0, 1)  # (B, T, E)
    return rel[..., None]
