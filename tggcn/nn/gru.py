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


def run_multi_bigru(params_list, xs_list, h0_fwd_list=None, unroll: int = 1):
    """Run several same-width BiGRU streams in ONE bidirectional scan.

    The TGGCN frame level runs three entity streams (human / object /
    geometry) through separate BiGRUs; scanning them independently costs six
    T-length scans of tiny matmuls. Here the streams stack on a leading axis
    (entity rows padded to the widest stream) and a single scan advances all
    forward directions at step t and all backward directions at step T-1-t:
    one batched (S, R, h) x (S, h, 3h) matmul pair per step instead of six
    scans.

    Arguments:
        params_list - per-stream bigru params ({'fwd','bwd'}), equal h.
        xs_list - per-stream inputs (B, T, E_i, h).
        h0_fwd_list - optional per-stream forward initial states (B, E_i, h).
    Returns:
        Per-stream outputs (B, T, E_i, 2h), identical to run_bigru per stream.
    """
    num_streams = len(params_list)
    hidden = params_list[0]["fwd"]["w_hh"].shape[0]
    b, t = xs_list[0].shape[0], xs_list[0].shape[1]
    rows = [x.shape[0] * x.shape[2] for x in xs_list]
    r_max = max(rows)

    def fold(x):
        b_, t_, e_, f_ = x.shape
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b_ * e_, t_, f_)
        if x.shape[0] < r_max:
            x = jnp.pad(x, ((0, r_max - x.shape[0]), (0, 0), (0, 0)))
        return x

    xs = jnp.stack([fold(x) for x in xs_list])              # (S, R, T, h)
    w_ih_f = jnp.stack([p["fwd"]["w_ih"] for p in params_list])
    w_hh_f = jnp.stack([p["fwd"]["w_hh"] for p in params_list])
    w_ih_b = jnp.stack([p["bwd"]["w_ih"] for p in params_list])
    w_hh_b = jnp.stack([p["bwd"]["w_hh"] for p in params_list])
    zeros3 = jnp.zeros((num_streams, 1, 1, 3 * hidden), dtype=xs.dtype)
    b_ih_f = (jnp.stack([p["fwd"]["b_ih"] for p in params_list])[:, None, None]
              if "b_ih" in params_list[0]["fwd"] else zeros3)
    b_hh_f = (jnp.stack([p["fwd"]["b_hh"] for p in params_list])[:, None]
              if "b_hh" in params_list[0]["fwd"] else zeros3[:, 0])
    b_ih_b = (jnp.stack([p["bwd"]["b_ih"] for p in params_list])[:, None, None]
              if "b_ih" in params_list[0]["bwd"] else zeros3)
    b_hh_b = (jnp.stack([p["bwd"]["b_hh"] for p in params_list])[:, None]
              if "b_hh" in params_list[0]["bwd"] else zeros3[:, 0])

    # Input-side projections hoisted out of the scan: two large batched matmuls.
    gi_f = jnp.einsum("srtf,sfg->srtg", xs, w_ih_f) + b_ih_f
    gi_b = jnp.einsum("srtf,sfg->srtg", xs, w_ih_b) + b_ih_b
    gi_f = jnp.moveaxis(gi_f, 2, 0)                          # (T, S, R, 3h)
    gi_b = jnp.moveaxis(gi_b, 2, 0)[::-1]

    if h0_fwd_list is not None:
        h0 = jnp.stack([fold(h0[:, None])[:, 0] for h0 in h0_fwd_list])
    else:
        h0 = jnp.zeros((num_streams, r_max, hidden), dtype=xs.dtype)
    init = (h0, jnp.zeros((num_streams, r_max, hidden), dtype=xs.dtype))

    def gates(gi, h, w_hh, b_hh):
        gh = jnp.einsum("srf,sfg->srg", h, w_hh) + b_hh
        i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(i_r + h_r)
        z = jax.nn.sigmoid(i_z + h_z)
        n = jnp.tanh(i_n + r * h_n)
        return (1.0 - z) * n + z * h

    def step(carry, inp):
        h_f, h_b = carry
        gi_f_i, gi_b_i = inp
        h_f = gates(gi_f_i, h_f, w_hh_f, b_hh_f)
        h_b = gates(gi_b_i, h_b, w_hh_b, b_hh_b)
        return (h_f, h_b), (h_f, h_b)

    _, (seq_f, seq_b) = jax.lax.scan(step, init, (gi_f, gi_b), unroll=unroll)
    seq_b = seq_b[::-1]
    out = jnp.concatenate([seq_f, seq_b], axis=-1)           # (T, S, R, 2h)
    results = []
    for i, x in enumerate(xs_list):
        b_, _, e_, _ = x.shape
        stream = out[:, i, : b_ * e_]                        # (T, B*E, 2h)
        stream = jnp.moveaxis(stream, 0, 1).reshape(b_, e_, t, 2 * hidden)
        results.append(jnp.swapaxes(stream, 1, 2))           # (B, T, E, 2h)
    return results


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
