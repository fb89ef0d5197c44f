"""GRU cells and time-scanned (bi)directional GRU layers.

Gate math follows the torch GRU/GRUCell convention (gate order r, z, n;
``h' = (1 - z) * n + z * h``) so that reference checkpoints map 1:1 and
numerics are comparable. TPU-first structure: the input projection for the
whole sequence is hoisted out of the recurrence into one large (B*T, F) @
(F, 3H) matmul on the MXU; the `lax.scan` body only performs the (B, H) @
(H, 3H) recurrent matmul plus fused elementwise gates.

Reference behaviour being reproduced: nn.GRU / nn.GRUCell usage in
vhoi/models.py:267-320 and the per-entity frame-level BiRNNs at
vhoi/models.py:983-1002.
"""

from typing import Optional

import jax
import jax.numpy as jnp

from tggcn.nn.init import fan_in_uniform


def init_gru_cell(key, input_size: int, hidden_size: int, bias: bool = True) -> dict:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    params = {
        "w_ih": fan_in_uniform(k1, (input_size, 3 * hidden_size), hidden_size),
        "w_hh": fan_in_uniform(k2, (hidden_size, 3 * hidden_size), hidden_size),
    }
    if bias:
        params["b_ih"] = fan_in_uniform(k3, (3 * hidden_size,), hidden_size)
        params["b_hh"] = fan_in_uniform(k4, (3 * hidden_size,), hidden_size)
    return params


def gru_gates_input(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    """Input-side gate pre-activations (..., 3H). Hoist this out of scans."""
    gi = x @ params["w_ih"]
    if "b_ih" in params:
        gi = gi + params["b_ih"]
    return gi


def gru_step_from_gates(params: dict, gi: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
    """One GRU step given precomputed input gates gi (..., 3H) and state h (..., H)."""
    gh = h @ params["w_hh"]
    if "b_hh" in params:
        gh = gh + params["b_hh"]
    i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
    h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return (1.0 - z) * n + z * h


def apply_gru_cell(params: dict, x: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
    return gru_step_from_gates(params, gru_gates_input(params, x), h)


def run_gru(params: dict, xs: jnp.ndarray, reverse: bool = False,
            h0: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Run a unidirectional GRU over xs (B, T, F) -> (B, T, H)."""
    batch = xs.shape[0]
    hidden = params["w_hh"].shape[0]
    gi_all = gru_gates_input(params, xs)            # (B, T, 3H) one big matmul
    gi_all = jnp.swapaxes(gi_all, 0, 1)             # (T, B, 3H)
    if h0 is None:
        h0 = jnp.zeros((batch, hidden), dtype=xs.dtype)

    def step(h, gi):
        h_new = gru_step_from_gates(params, gi, h)
        return h_new, h_new

    _, hs = jax.lax.scan(step, h0, gi_all, reverse=reverse)
    return jnp.swapaxes(hs, 0, 1)


def init_bigru(key, input_size: int, hidden_size: int, bias: bool = True) -> dict:
    kf, kb = jax.random.split(key)
    return {
        "fwd": init_gru_cell(kf, input_size, hidden_size, bias=bias),
        "bwd": init_gru_cell(kb, input_size, hidden_size, bias=bias),
    }


def run_bigru(params: dict, xs: jnp.ndarray,
              h0_fwd: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Bidirectional GRU over xs (B, T, F) -> (B, T, 2H), torch output layout.

    h0_fwd optionally seeds the forward direction (streaming inference
    threads it across windows); the backward direction always starts at zero
    within the window.
    """
    h_fwd = run_gru(params["fwd"], xs, h0=h0_fwd)
    h_bwd = run_gru(params["bwd"], xs, reverse=True)
    return jnp.concatenate([h_fwd, h_bwd], axis=-1)
