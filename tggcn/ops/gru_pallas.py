"""Fused Pallas TPU kernel for GRU sequences: hidden state resident in VMEM.

The XLA `lax.scan` GRU (tggcn/nn/gru.py) round-trips the hidden state and
per-step gate tensors through HBM on every time step and pays per-iteration
scheduling overhead. This kernel keeps the hidden state (and the recurrent
weights) in VMEM across the WHOLE sequence: the grid iterates over time,
Pallas double-buffers the per-step input-gate block HBM->VMEM, and the only
per-step HBM traffic is the (S, R, 3h) gate block in and the (S, R, h) state
block out — the minimum possible for a GRU.

Layout (multi-stream, matching tggcn.nn.gru.run_multi_bigru's folding):
  gi    (T, S, R, 3h)  precomputed input-side gate pre-activations
                       (x @ w_ih + b_ih — one large MXU matmul, done outside)
  w_hh  (S, h, 3h)     recurrent weights per stream
  b_hh  (S, 3h)        recurrent bias per stream (zeros when bias=False)
  h0    (S, R, h)      initial states
  ->    (T, S, R, h)   full hidden-state sequence (torch GRU output layout)

`reverse=True` runs the backward direction (t = T-1 .. 0) purely via the
grid index maps — the kernel body is identical and the output is already in
natural time order.

Training: `gru_sequence` carries a custom VJP whose backward is ALSO a
Pallas kernel (reverse-time sweep with the dL/dh carry in VMEM, recomputing
the gates from gi and h_prev — one extra (R, h) x (h, 3h) matmul per step
instead of storing (T, S, R, 3h) gate residuals). The weight gradient is
reduced OUTSIDE the kernel as one large einsum over the kernel's dgh output,
keeping the kernel's VMEM footprint at one weight copy.

Reference behaviour: torch nn.GRU gate math (vhoi/models.py:267-320,
983-1002); numerics identical to tggcn.nn.gru.run_multi_bigru.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _vmem_budget(dtype) -> int:
    """Scoped-VMEM cap for the GRU kernels. The default 16 MB fits the bf16
    weight set ((2S, h, 3h) with direction fusion) plus its stack copy, but
    float32 at hidden 512 needs ~2x; v5e has 128 MB physical VMEM."""
    if jnp.dtype(dtype).itemsize >= 4:
        return 96 * 1024 * 1024
    return 48 * 1024 * 1024


def _fwd_kernel(gi_ref, w_ref, b_ref, h0_ref, out_ref, h_scr):
    """One time step: gh = h @ W + b; gates; h' = (1-z)*n + z*h.

    All gate math runs in float32 regardless of the IO dtype (Mosaic
    requires uniform element types, and the recurrent state deserves full
    precision even when activations stream as bfloat16); the state scratch
    is float32 for the same reason.
    """
    @pl.when(pl.program_id(0) == 0)
    def _():
        h_scr[:] = h0_ref[:].astype(jnp.float32)

    gi = gi_ref[0]                                  # (S, R, 3h)
    num_streams = gi.shape[0]
    h_dim = gi.shape[-1] // 3
    for s in range(num_streams):                    # static unroll over streams
        h = h_scr[s]                                # (R, h) float32
        gh = (jnp.dot(h, w_ref[s].astype(jnp.float32),
                      preferred_element_type=jnp.float32)
              + b_ref[s].astype(jnp.float32))
        gi_s = gi[s].astype(jnp.float32)
        r = jax.nn.sigmoid(gi_s[:, :h_dim] + gh[:, :h_dim])
        z = jax.nn.sigmoid(gi_s[:, h_dim:2 * h_dim] + gh[:, h_dim:2 * h_dim])
        n = jnp.tanh(gi_s[:, 2 * h_dim:] + r * gh[:, 2 * h_dim:])
        h_new = (1.0 - z) * n + z * h
        h_scr[s] = h_new
        out_ref[0, s] = h_new.astype(out_ref.dtype)


def _bwd_kernel(gi_ref, hprev_ref, g_ref, w_ref, b_ref,
                dgi_ref, dgh_ref, dh0_ref, dh_scr):
    """Reverse-time step: recompute gates, push dL/dh one step back.

    Emits per-step dgi (grad of the input gates) and dgh (grad of the
    recurrent pre-activations); dW/db reduce over dgh outside the kernel.
    """
    @pl.when(pl.program_id(0) == 0)
    def _():
        dh_scr[:] = jnp.zeros_like(dh_scr)

    gi = gi_ref[0]
    hp = hprev_ref[0]
    gt = g_ref[0]
    num_streams = gi.shape[0]
    h_dim = gi.shape[-1] // 3
    for s in range(num_streams):
        hp_s = hp[s].astype(jnp.float32)
        dh = dh_scr[s] + gt[s].astype(jnp.float32)  # (R, h) float32
        gh = (jnp.dot(hp_s, w_ref[s].astype(jnp.float32),
                      preferred_element_type=jnp.float32)
              + b_ref[s].astype(jnp.float32))
        gi_s = gi[s].astype(jnp.float32)
        h_n = gh[:, 2 * h_dim:]
        r = jax.nn.sigmoid(gi_s[:, :h_dim] + gh[:, :h_dim])
        z = jax.nn.sigmoid(gi_s[:, h_dim:2 * h_dim] + gh[:, h_dim:2 * h_dim])
        n = jnp.tanh(gi_s[:, 2 * h_dim:] + r * h_n)
        dn = dh * (1.0 - z)
        dz = dh * (hp_s - n)
        dtanh = dn * (1.0 - n * n)
        dr = dtanh * h_n
        d_ir = dr * r * (1.0 - r)
        d_iz = dz * z * (1.0 - z)
        dgi_s = jnp.concatenate([d_ir, d_iz, dtanh], axis=-1)
        dgh_s = jnp.concatenate([d_ir, d_iz, dtanh * r], axis=-1)
        # dh_prev = dh * z + dgh @ W^T (contract the 3h axis).
        dh_prev = dh * z + jax.lax.dot_general(
            dgh_s, w_ref[s].astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dgi_ref[0, s] = dgi_s.astype(dgi_ref.dtype)
        dgh_ref[0, s] = dgh_s.astype(dgh_ref.dtype)
        dh_scr[s] = dh_prev

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _():
        dh0_ref[:] = dh_scr[:].astype(dh0_ref.dtype)


def _time_specs(t, s, r, width, reverse):
    """BlockSpec over the time axis: one (S, R, width) block per grid step,
    in natural or reversed order."""
    if reverse:
        index_map = lambda i: (t - 1 - i, 0, 0, 0)
    else:
        index_map = lambda i: (i, 0, 0, 0)
    return pl.BlockSpec((1, s, r, width), index_map, memory_space=pltpu.VMEM)


def _full_spec():
    return pl.BlockSpec(memory_space=pltpu.VMEM)


@functools.partial(jax.jit, static_argnames=("reverse", "interpret"))
def _gru_seq_fwd_impl(gi, w_hh, b_hh, h0, reverse: bool, interpret: bool):
    t, s, r, g3 = gi.shape
    h_dim = g3 // 3
    return pl.pallas_call(
        _fwd_kernel,
        grid=(t,),
        in_specs=[_time_specs(t, s, r, g3, reverse),
                  _full_spec(), _full_spec(), _full_spec()],
        out_specs=_time_specs(t, s, r, h_dim, reverse),
        out_shape=jax.ShapeDtypeStruct((t, s, r, h_dim), gi.dtype),
        scratch_shapes=[pltpu.VMEM((s, r, h_dim), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_budget(gi.dtype)),
        interpret=interpret,
    )(gi, w_hh, b_hh, h0)


@functools.partial(jax.jit, static_argnames=("reverse", "interpret"))
def _gru_seq_bwd_impl(gi, hprev, g, w_hh, b_hh, reverse: bool, interpret: bool):
    t, s, r, g3 = gi.shape
    h_dim = g3 // 3
    # The backward sweep visits time in the OPPOSITE order of the forward.
    rev = not reverse
    dgi, dgh, dh0 = pl.pallas_call(
        _bwd_kernel,
        grid=(t,),
        in_specs=[_time_specs(t, s, r, g3, rev),
                  _time_specs(t, s, r, h_dim, rev),
                  _time_specs(t, s, r, h_dim, rev),
                  _full_spec(), _full_spec()],
        out_specs=(_time_specs(t, s, r, g3, rev),
                   _time_specs(t, s, r, g3, rev),
                   _full_spec()),
        out_shape=(jax.ShapeDtypeStruct((t, s, r, g3), gi.dtype),
                   jax.ShapeDtypeStruct((t, s, r, g3), gi.dtype),
                   jax.ShapeDtypeStruct((s, r, h_dim), gi.dtype)),
        scratch_shapes=[pltpu.VMEM((s, r, h_dim), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_budget(gi.dtype)),
        interpret=interpret,
    )(gi, hprev, g, w_hh, b_hh)
    return dgi, dgh, dh0


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def gru_sequence(gi, w_hh, b_hh, h0, reverse: bool = False,
                 interpret: bool = False):
    """VMEM-resident GRU over a whole sequence; differentiable.

    gi (T, S, R, 3h) precomputed input gates; w_hh (S, h, 3h); b_hh (S, 3h);
    h0 (S, R, h) -> h_seq (T, S, R, h) in natural time order (for
    reverse=True, h_seq[t] summarises the future t..T-1).
    """
    return _gru_seq_fwd_impl(gi, w_hh, b_hh, h0, reverse, interpret)


def _gru_sequence_fwd(gi, w_hh, b_hh, h0, reverse, interpret):
    h_seq = _gru_seq_fwd_impl(gi, w_hh, b_hh, h0, reverse, interpret)
    return h_seq, (gi, w_hh, b_hh, h0, h_seq)


def _gru_sequence_bwd(reverse, interpret, residuals, g):
    gi, w_hh, b_hh, h0, h_seq = residuals
    # h_prev per time step in NATURAL order: the state the step read.
    if reverse:
        hprev = jnp.concatenate([h_seq[1:], h0[None]], axis=0)
    else:
        hprev = jnp.concatenate([h0[None], h_seq[:-1]], axis=0)
    dgi, dgh, dh0 = _gru_seq_bwd_impl(gi, hprev, g, w_hh, b_hh,
                                      reverse, interpret)
    # Weight/bias grads as ONE large MXU reduction outside the kernel (keeps
    # the kernel's VMEM at a single weight copy instead of W + dW).
    dw = jnp.einsum("tsrh,tsrg->shg", hprev, dgh)
    db = jnp.sum(dgh, axis=(0, 2))
    return dgi, dw.astype(w_hh.dtype), db.astype(b_hh.dtype), dh0


gru_sequence.defvjp(_gru_sequence_fwd, _gru_sequence_bwd)


def run_multi_bigru_pallas(params_list, xs_list, h0_fwd_list=None,
                           interpret: bool = False,
                           fuse_directions: bool = True):
    """Drop-in replacement for tggcn.nn.gru.run_multi_bigru backed by the
    fused kernel: same stream folding, same output layout (B, T, E, 2h).

    The input-side projections stay outside as large batched MXU matmuls.
    With fuse_directions (default) BOTH directions run in ONE kernel launch:
    the backward direction's gate blocks are time-pre-flipped and stacked as
    extra streams, so one grid sweep advances all 2S recurrences and the
    per-grid-step overhead is paid once (fuse_directions=False restores the
    two-launch round-2 behaviour).
    """
    num_streams = len(params_list)
    hidden = params_list[0]["fwd"]["w_hh"].shape[0]
    t = xs_list[0].shape[1]
    rows = [x.shape[0] * x.shape[2] for x in xs_list]
    r_max = max(rows)

    def fold(x):
        b_, t_, e_, f_ = x.shape
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b_ * e_, t_, f_)
        if x.shape[0] < r_max:
            x = jnp.pad(x, ((0, r_max - x.shape[0]), (0, 0), (0, 0)))
        return x

    xs = jnp.stack([fold(x) for x in xs_list])              # (S, R, T, h)
    dtype = xs.dtype
    w_hh_f = jnp.stack([p["fwd"]["w_hh"] for p in params_list]).astype(dtype)
    w_hh_b = jnp.stack([p["bwd"]["w_hh"] for p in params_list]).astype(dtype)
    zeros_b = jnp.zeros((num_streams, 3 * hidden), dtype=dtype)
    has_bias = "b_hh" in params_list[0]["fwd"]
    b_hh_f = (jnp.stack([p["fwd"]["b_hh"] for p in params_list]).astype(dtype)
              if has_bias else zeros_b)
    b_hh_b = (jnp.stack([p["bwd"]["b_hh"] for p in params_list]).astype(dtype)
              if has_bias else zeros_b)

    def gi_for(direction):
        w_ih = jnp.stack([p[direction]["w_ih"] for p in params_list]).astype(dtype)
        gi = jnp.einsum("srtf,sfg->srtg", xs, w_ih)
        if has_bias:
            gi = gi + jnp.stack([p[direction]["b_ih"]
                                 for p in params_list]).astype(dtype)[:, None, None]
        return jnp.moveaxis(gi, 2, 0)                        # (T, S, R, 3h)

    if h0_fwd_list is not None:
        h0_f = jnp.stack([fold(h0[:, None])[:, 0] for h0 in h0_fwd_list])
    else:
        h0_f = jnp.zeros((num_streams, r_max, hidden), dtype=dtype)
    h0_b = jnp.zeros((num_streams, r_max, hidden), dtype=dtype)

    if fuse_directions:
        gi2 = jnp.concatenate([gi_for("fwd"), gi_for("bwd")[::-1]], axis=1)
        seq = gru_sequence(gi2,
                           jnp.concatenate([w_hh_f, w_hh_b]),
                           jnp.concatenate([b_hh_f, b_hh_b]),
                           jnp.concatenate([h0_f, h0_b]),
                           reverse=False, interpret=interpret)
        seq_f, seq_b = seq[:, :num_streams], seq[:, num_streams:][::-1]
    else:
        seq_f = gru_sequence(gi_for("fwd"), w_hh_f, b_hh_f, h0_f,
                             reverse=False, interpret=interpret)
        seq_b = gru_sequence(gi_for("bwd"), w_hh_b, b_hh_b, h0_b,
                             reverse=True, interpret=interpret)
    out = jnp.concatenate([seq_f, seq_b], axis=-1)           # (T, S, R, 2h)

    results = []
    for i, x in enumerate(xs_list):
        b_, _, e_, _ = x.shape
        stream = out[:, i, : b_ * e_]                        # (T, B*E, 2h)
        stream = jnp.moveaxis(stream, 0, 1).reshape(b_, e_, t, 2 * hidden)
        results.append(jnp.swapaxes(stream, 1, 2))           # (B, T, E, 2h)
    return results
