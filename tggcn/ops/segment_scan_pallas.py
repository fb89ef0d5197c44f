"""Fused Pallas TPU kernel for the segment-level gated message-passing scan.

The segment level is the model's hot sequential core: per time step it runs
4 message projections, 4 attention softmaxes, 2 message-gate matmuls and a
4-cell gated GRU update (tggcn/models/tggcn.py::_segment_scan_fast — itself
a batched rewrite of the reference's paired Python loop,
vhoi/models.py:785-880). Under XLA that is ~15 small HBM-roundtripping ops
per step x T steps x 2 directions. This kernel runs ONE direction's whole
step in VMEM: the recurrent states stay resident across all T grid steps,
every weight is loaded once, and per-step HBM traffic is just the
precomputed base-gate block in and the state block out.

Scope: non-relational generic messages on all four entity edges, with every
attention mode of the XLA fast path — dot-product (v2 / scaled v3, the
headline), concat-MLP (v1), bilinear (v4), and externally-streamed weights
for mean pooling and distance-based attention (state-independent, computed
outside for all T at once). Relational / 'specific' configurations keep the
XLA paths (see pallas_segment_mode).

Training: 'dot' mode has a HAND-WRITTEN Pallas backward (used for sub-f32
compute dtypes); every mode also has a custom VJP that recomputes through
the numerically identical XLA fast path, so the kernel accelerates the
forward scan (and inference/streaming end-to-end) while gradients remain
exactly the XLA path's.

Layout per direction (time-major):
  gi_h (T, B, H, 3h)  base input gates (x_hs @ w_ih[:base] + b, hoisted out)
  gi_o (T, B, O, 3h)
  u_h  (T, B, H)      commit decisions
  u_o  (T, B, O)
  w_from (4, h, h)    message projections [h2h, h2o, o2h, o2o]
  b_from (4, h)
  w_msg_h/o (2h, 3h)  message -> gate projections of the two cells
  w_hh_h/o (h, 3h), b_hh_h/o (3h)
  masks: mask_hh (H, H) = 1-eye, mask_obj (B, O), eye_oo (O, O) = 1-eye
  h0_h (B, H, h), h0_o (B, O, h)
  -> h_h_seq (T, B, H, h), h_o_seq (T, B, O, h), att_oh (T, B, H, O)
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(scale: float, mode: str = "dot", fuse_dirs: bool = False):
    """Forward step kernel. `mode` selects the attention scoring:
      * 'dot' — (scaled) dot product, v2/v3 (the headline configuration);
      * 'v1'  — single-layer concat MLP decomposed into receiver + sender
                projections (extra refs: w_att (4, 2h, 1), b_att (4, 1));
      * 'v4'  — bilinear 'general' form (extra refs: w_att (4, h, h),
                b_att (4, 1));
      * 'ext' — attention weights precomputed OUTSIDE the kernel and
                streamed per step (4 extra time-blocked refs, edge order
                hh, oh, ho, oo). Covers distance-based attention and mean
                pooling, whose weights do not depend on the recurrent state.

    `fuse_dirs`: BOTH scan directions run in this one kernel, stacked on the
    batch axis (rows [:B] forward, [B:] backward with time-PRE-FLIPPED
    inputs, so the fused scan is a single forward-order scan). Messages and
    attention use direction-SHARED weights and batch over 2B rows — an MXU
    matmul over 32 rows costs the same as over 16, so this nearly halves
    the sequential small-op cost; only the GRU cells carry per-direction
    weights (leading axis 2) and split the rows.
    """
    def kernel(*refs):
        (gi_h_ref, gi_o_ref, u_h_ref, u_o_ref), refs = refs[:4], refs[4:]
        a_refs = w_att_ref = b_att_ref = None
        if mode == "ext":
            a_refs, refs = refs[:4], refs[4:]
        elif mode in ("v1", "v4"):
            (w_att_ref, b_att_ref), refs = refs[:2], refs[2:]
        (w_from_ref, b_from_ref, w_msg_h_ref, w_msg_o_ref,
         w_hh_h_ref, w_hh_o_ref, b_hh_h_ref, b_hh_o_ref,
         mask_hh_ref, mask_obj_ref, eye_oo_ref,
         h0_h_ref, h0_o_ref,
         out_h_ref, out_o_ref, att_ref,
         scr_h, scr_o) = refs
        @pl.when(pl.program_id(0) == 0)
        def _():
            scr_h[:] = h0_h_ref[:].astype(jnp.float32)
            scr_o[:] = h0_o_ref[:].astype(jnp.float32)

        h_h = scr_h[:]                               # (B, H, h) float32
        h_o = scr_o[:]                               # (B, O, h)
        b, nh, hd = h_h.shape
        no = h_o.shape[1]
        f32 = jnp.float32

        wdt = w_from_ref.dtype

        def relu_proj(x, idx):
            rows = x.shape[0] * x.shape[1]
            y = jnp.dot(x.reshape(rows, hd).astype(wdt), w_from_ref[idx],
                        preferred_element_type=f32) + b_from_ref[idx].astype(f32)
            return jnp.maximum(y, 0.0).reshape(x.shape)

        # Messages from each sender's carried state (reference semantics:
        # every message reads the state committed through the previous step).
        m_hh = relu_proj(h_h, 0)
        m_ho = relu_proj(h_h, 1)
        m_oh = relu_proj(h_o, 2)
        m_oo = relu_proj(h_o, 3)

        def scores(recv, send):
            s = jax.lax.dot_general(
                recv, send, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=f32)
            return s * scale

        def msoftmax(s, mask):
            # Masked softmax matching tggcn masked_softmax: fully masked rows
            # produce all-zero weights (-inf scores -> NaN -> 0 upstream).
            mask = jnp.broadcast_to(mask, s.shape).astype(f32)
            s = jnp.where(mask > 0, s, -1e30)
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m) * mask
            d = jnp.sum(e, axis=-1, keepdims=True)
            return e / jnp.maximum(d, 1e-30)

        def scores_v1(recv, send, e):
            # relu(recv @ wq + (send @ wk)^T + b): the concat MLP's single
            # layer splits row-wise into receiver/sender projections.
            nr, ns = recv.shape[1], send.shape[1]
            wa = w_att_ref[e]                                    # (2h, 1)
            q = jnp.dot(recv.reshape(b * nr, hd).astype(wa.dtype), wa[:hd],
                        preferred_element_type=f32).reshape(b, nr, 1)
            k = jnp.dot(send.reshape(b * ns, hd).astype(wa.dtype), wa[hd:],
                        preferred_element_type=f32).reshape(b, 1, ns)
            return jnp.maximum(q + k + b_att_ref[e].astype(f32)[0], 0.0)

        def scores_v4(recv, send, e):
            # relu(recv @ W @ send^T + b), the bilinear 'general' form.
            nr = recv.shape[1]
            wa = w_att_ref[e]                                    # (h, h)
            tmp = jnp.dot(recv.reshape(b * nr, hd).astype(wa.dtype), wa,
                          preferred_element_type=f32).reshape(b, nr, hd)
            s = jax.lax.dot_general(
                tmp.astype(wa.dtype), send,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=f32)
            return jnp.maximum(s + b_att_ref[e].astype(f32)[0], 0.0)

        mask_obj = mask_obj_ref[:].astype(f32)[:, None, :]       # (B, 1, O)
        if mode == "ext":
            a_hh, a_oh, a_ho, a_oo = (a_refs[i][0].astype(f32)
                                      for i in range(4))
        else:
            if mode == "v1":
                sc = scores_v1
            elif mode == "v4":
                sc = scores_v4
            else:
                sc = lambda recv, send, e: scores(recv, send)
            a_hh = msoftmax(sc(h_h, h_h, 0), mask_hh_ref[:].astype(f32)[None])
            a_oh = msoftmax(sc(h_h, h_o, 1), mask_obj)
            a_ho = msoftmax(sc(h_o, h_h, 2), jnp.ones((1, 1, nh), f32))
            a_oo = msoftmax(sc(h_o, h_o, 3),
                            mask_obj * eye_oo_ref[:].astype(f32)[None])

        def mix(att, msg):
            return jax.lax.dot_general(
                att, msg, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=f32)

        msgs_h = jnp.concatenate([mix(a_hh, m_hh), mix(a_oh, m_oh)], axis=-1)
        msgs_o = jnp.concatenate([mix(a_ho, m_ho), mix(a_oo, m_oo)], axis=-1)

        def gru_update(gi, gh, h_prev, u_slice):
            r = jax.nn.sigmoid(gi[..., :hd] + gh[..., :hd])
            z = jax.nn.sigmoid(gi[..., hd:2 * hd] + gh[..., hd:2 * hd])
            n = jnp.tanh(gi[..., 2 * hd:] + r * gh[..., 2 * hd:])
            h_new = (1.0 - z) * n + z * h_prev
            uu = u_slice.astype(f32)[..., None]
            return uu * h_new + (1.0 - uu) * h_prev

        def cell(gi_base, msgs, u, h_prev, w_msg_ref, w_hh_ref, b_hh_ref):
            if not fuse_dirs:
                rows = h_prev.shape[0] * h_prev.shape[1]
                gi = (gi_base[0].astype(f32)
                      + jnp.dot(msgs.reshape(rows, 2 * hd).astype(wdt),
                                w_msg_ref[:],
                                preferred_element_type=f32)
                      .reshape(gi_base.shape[1:]))
                gh = (jnp.dot(h_prev.reshape(rows, hd).astype(wdt), w_hh_ref[:],
                              preferred_element_type=f32).reshape(gi.shape)
                      + b_hh_ref[:].astype(f32))
                return gru_update(gi, gh, h_prev, u[0])
            # Per-direction cell weights (leading axis 2) over row halves.
            bh = b // 2
            w_msg = w_msg_ref[:]
            w_hh = w_hh_ref[:]
            b_hh = b_hh_ref[:]
            halves = []
            for d in range(2):
                sl = slice(d * bh, (d + 1) * bh)
                hp = h_prev[sl]
                rows = hp.shape[0] * hp.shape[1]
                gi = (gi_base[0, sl].astype(f32)
                      + jnp.dot(msgs[sl].reshape(rows, 2 * hd).astype(wdt),
                                w_msg[d], preferred_element_type=f32)
                      .reshape(hp.shape[:2] + (3 * hd,)))
                gh = (jnp.dot(hp.reshape(rows, hd).astype(wdt), w_hh[d],
                              preferred_element_type=f32).reshape(gi.shape)
                      + b_hh[d].astype(f32))
                halves.append(gru_update(gi, gh, hp, u[0, sl]))
            return jnp.concatenate(halves, axis=0)

        h_h_out = cell(gi_h_ref[:], msgs_h, u_h_ref[:], h_h,
                       w_msg_h_ref, w_hh_h_ref, b_hh_h_ref)
        h_o_out = cell(gi_o_ref[:], msgs_o, u_o_ref[:], h_o,
                       w_msg_o_ref, w_hh_o_ref, b_hh_o_ref)

        scr_h[:] = h_h_out
        scr_o[:] = h_o_out
        out_h_ref[0] = h_h_out.astype(out_h_ref.dtype)
        out_o_ref[0] = h_o_out.astype(out_o_ref.dtype)
        att_ref[0] = a_oh.astype(att_ref.dtype)

    return kernel


def _tspec(t, shape, reverse):
    """Block over time: one (1, *shape) block per grid step, natural or
    reversed visit order (block-index convention)."""
    zeros = (0,) * len(shape)
    if reverse:
        index_map = lambda i: (t - 1 - i, *zeros)
    else:
        index_map = lambda i: (i, *zeros)
    return pl.BlockSpec((1, *shape), index_map, memory_space=pltpu.VMEM)


def _full():
    return pl.BlockSpec(memory_space=pltpu.VMEM)


def _vmem_budget(dtype) -> int:
    """Scoped-VMEM budget for the segment kernels. 64 MB fits the resident
    weight set (+ one stack copy per ref read) in bfloat16 at hidden 512;
    float32 doubles every resident byte, so grant it the rest of v5e's
    128 MB physical VMEM (minus pipeline headroom)."""
    if jnp.dtype(dtype).itemsize >= 4:
        return 110 * 1024 * 1024
    return 64 * 1024 * 1024


@functools.partial(jax.jit, static_argnames=("scale", "reverse", "interpret",
                                             "mode", "fuse_dirs"))
def _seg_dir_pallas(gi_h, gi_o, u_h, u_o, w_from, b_from, w_msg_h, w_msg_o,
                    w_hh_h, w_hh_o, b_hh_h, b_hh_o, mask_hh, mask_obj, eye_oo,
                    h0_h, h0_o, scale: float, reverse: bool, interpret: bool,
                    mode: str = "dot", att_ws=None, w_att=None, b_att=None,
                    fuse_dirs: bool = False):
    t, b, nh, g3 = gi_h.shape
    no = gi_o.shape[2]
    hd = g3 // 3
    dtype = gi_h.dtype
    extra_ops, extra_specs = [], []
    if mode == "ext":
        extra_ops = list(att_ws)                  # (T,B,R,S) per edge
        extra_specs = [_tspec(t, a.shape[1:], reverse) for a in att_ws]
    elif mode in ("v1", "v4"):
        extra_ops = [w_att, b_att]
        extra_specs = [_full(), _full()]
    out_h, out_o, att = pl.pallas_call(
        _make_kernel(scale, mode, fuse_dirs),
        grid=(t,),
        in_specs=[_tspec(t, (b, nh, g3), reverse), _tspec(t, (b, no, g3), reverse),
                  _tspec(t, (b, nh), reverse), _tspec(t, (b, no), reverse),
                  *extra_specs,
                  _full(), _full(), _full(), _full(), _full(), _full(),
                  _full(), _full(), _full(), _full(), _full(), _full(), _full()],
        out_specs=(_tspec(t, (b, nh, hd), reverse),
                   _tspec(t, (b, no, hd), reverse),
                   _tspec(t, (b, nh, no), reverse)),
        out_shape=(jax.ShapeDtypeStruct((t, b, nh, hd), dtype),
                   jax.ShapeDtypeStruct((t, b, no, hd), dtype),
                   jax.ShapeDtypeStruct((t, b, nh, no), dtype)),
        scratch_shapes=[pltpu.VMEM((b, nh, hd), jnp.float32),
                        pltpu.VMEM((b, no, hd), jnp.float32)],
        # The step touches every weight once -> the default 16 MB scoped-vmem
        # budget under-provisions the pipeline's buffers; v5e has headroom.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_budget(dtype)),
        interpret=interpret,
    )(gi_h, gi_o, u_h, u_o, *extra_ops, w_from, b_from, w_msg_h, w_msg_o,
      w_hh_h, w_hh_o, b_hh_h, b_hh_o, mask_hh, mask_obj, eye_oo, h0_h, h0_o)
    return out_h, out_o, att


def _make_bwd_kernel(scale: float, fuse_dirs: bool = False):
    """Reverse-time backward step: recompute messages/attention/gates from
    the streamed h_prev, push dL/dh one step back, emit the per-step grads
    whose weight reductions happen outside as large MXU einsums.

    Emitted per step: dgi (input-gate grads, also the x_hs/x_os path), dgh
    (recurrent pre-activation grads -> dW_hh), msgs (recomputed -> dW_msg),
    dpre (message pre-relu grads -> dW_from/db_from), du (commit-decision
    grads, the STE path).

    VMEM discipline: every weight is read from its ref exactly ONCE (each
    ref read materialises a stack copy — re-reading w_msg/w_hh at each use
    blew the 16 MB scoped-vmem budget), tensor intermediates live in the IO
    dtype (bfloat16 on TPU; the dot products still accumulate in float32),
    and only the dL/dh carry is kept float32.
    """
    def kernel(gi_h_ref, gi_o_ref, u_h_ref, u_o_ref,
               hprev_h_ref, hprev_o_ref, g_h_ref, g_o_ref, g_att_ref,
               w_from_ref, b_from_ref, w_msg_h_ref, w_msg_o_ref,
               w_hh_h_ref, w_hh_o_ref, b_hh_h_ref, b_hh_o_ref,
               mask_hh_ref, mask_obj_ref, eye_oo_ref,
               dgi_h_ref, dgi_o_ref, dgh_h_ref, dgh_o_ref,
               msgs_h_ref, msgs_o_ref, dpre_h_ref, dpre_o_ref,
               du_h_ref, du_o_ref, dh0_h_ref, dh0_o_ref,
               dh_h_scr, dh_o_scr):
        @pl.when(pl.program_id(0) == 0)
        def _():
            dh_h_scr[:] = jnp.zeros_like(dh_h_scr)
            dh_o_scr[:] = jnp.zeros_like(dh_o_scr)

        f32 = jnp.float32
        cdt = w_from_ref.dtype                       # compute dtype = IO dtype
        h_h = hprev_h_ref[0].astype(cdt)             # (B, H, h)
        h_o = hprev_o_ref[0].astype(cdt)             # (B, O, h)
        b, nh, hd = h_h.shape
        no = h_o.shape[1]

        # Single stack copy per weight; reused at every site below.
        wf = w_from_ref[:]
        wmh = w_msg_h_ref[:]
        wmo = w_msg_o_ref[:]
        whh_h = w_hh_h_ref[:]
        whh_o = w_hh_o_ref[:]

        def rows(x):
            return x.reshape(x.shape[0] * x.shape[1], x.shape[2])

        def unrows(x, e):
            return x.reshape(b, e, x.shape[-1])

        def dotT(x3, w):
            """rows(x3) @ w^T with per-direction weights when fused
            (row order is batch-major, so half slices stay contiguous)."""
            def one(xd, wd):
                return jax.lax.dot_general(
                    rows(xd), wd,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=f32)
            if not fuse_dirs:
                return one(x3, w)
            bh = b // 2
            return jnp.concatenate(
                [one(x3[d * bh:(d + 1) * bh], w[d]) for d in range(2)],
                axis=0)

        def relu_proj(x, idx):
            y = jnp.dot(rows(x), wf[idx], preferred_element_type=f32)
            y = y + b_from_ref[idx].astype(f32)
            return jnp.maximum(y, 0.0).astype(cdt).reshape(x.shape)

        # ---- Recompute the forward step's messages / attention / gates ----
        m_hh = relu_proj(h_h, 0)
        m_ho = relu_proj(h_h, 1)
        m_oh = relu_proj(h_o, 2)
        m_oo = relu_proj(h_o, 3)

        def scores(recv, send):
            return jax.lax.dot_general(
                recv, send, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=f32) * scale

        def msoftmax(s, mask):
            mask = jnp.broadcast_to(mask, s.shape).astype(f32)
            s = jnp.where(mask > 0, s, -1e30)
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m) * mask
            d = jnp.sum(e, axis=-1, keepdims=True)
            return (e / jnp.maximum(d, 1e-30)).astype(cdt)

        mask_obj = mask_obj_ref[:].astype(f32)[:, None, :]
        a_hh = msoftmax(scores(h_h, h_h), mask_hh_ref[:].astype(f32)[None])
        a_oh = msoftmax(scores(h_h, h_o), mask_obj)
        a_ho = msoftmax(scores(h_o, h_h), jnp.ones((1, 1, nh), f32))
        a_oo = msoftmax(scores(h_o, h_o),
                        mask_obj * eye_oo_ref[:].astype(f32)[None])

        def mix(att, msg):
            return jax.lax.dot_general(
                att, msg, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=f32).astype(cdt)

        msgs_h = jnp.concatenate([mix(a_hh, m_hh), mix(a_oh, m_oh)], axis=-1)
        msgs_o = jnp.concatenate([mix(a_ho, m_ho), mix(a_oo, m_oo)], axis=-1)
        msgs_h_ref[0] = msgs_h.astype(msgs_h_ref.dtype)
        msgs_o_ref[0] = msgs_o.astype(msgs_o_ref.dtype)

        def gates(gi_base, msgs, h_prev, w_msg, w_hh, b_hh_ref):
            def one(gi_b, msgs_d, hp, w_msg_d, w_hh_d, b_hh_d):
                gi = (gi_b.astype(f32)
                      + jnp.dot(rows(msgs_d), w_msg_d,
                                preferred_element_type=f32)
                      .reshape(gi_b.shape))
                gh = (jnp.dot(rows(hp), w_hh_d,
                              preferred_element_type=f32).reshape(gi.shape)
                      + b_hh_d.astype(f32))
                r = jax.nn.sigmoid(gi[..., :hd] + gh[..., :hd]).astype(cdt)
                z = jax.nn.sigmoid(gi[..., hd:2 * hd]
                                   + gh[..., hd:2 * hd]).astype(cdt)
                hn = gh[..., 2 * hd:].astype(cdt)
                n = jnp.tanh(gi[..., 2 * hd:].astype(cdt) + r * hn)
                return r, z, n, hn
            if not fuse_dirs:
                return one(gi_base[0], msgs, h_prev, w_msg, w_hh,
                           b_hh_ref[:])
            bh = b // 2
            b_hh = b_hh_ref[:]
            parts = [one(gi_base[0, d * bh:(d + 1) * bh],
                         msgs[d * bh:(d + 1) * bh],
                         h_prev[d * bh:(d + 1) * bh],
                         w_msg[d], w_hh[d], b_hh[d]) for d in range(2)]
            return tuple(jnp.concatenate([p[i] for p in parts], axis=0)
                         for i in range(4))

        r_h, z_h, n_h, hn_h = gates(gi_h_ref[:], msgs_h, h_h,
                                    wmh, whh_h, b_hh_h_ref)
        r_o, z_o, n_o, hn_o = gates(gi_o_ref[:], msgs_o, h_o,
                                    wmo, whh_o, b_hh_o_ref)

        # ---- Backward through the gated update + GRU cell -----------------
        def cell_bwd(g_ref, dh_scr_val, u_ref, r, z, n, hn, h_prev, w_hh,
                     dgi_ref, dgh_ref, du_ref):
            dH = dh_scr_val + g_ref[0].astype(f32)
            u = u_ref[0].astype(f32)[..., None]
            h_prev32 = h_prev.astype(f32)
            h_new = ((1.0 - z) * n).astype(f32) + z.astype(f32) * h_prev32
            du_ref[0] = jnp.sum(dH * (h_new - h_prev32),
                                axis=-1).astype(du_ref.dtype)
            dh_new = (dH * u).astype(cdt)
            dhprev = dH * (1.0 - u)
            dn = dh_new * (1.0 - z)
            dz = dh_new * (h_prev - n)
            dtanh = dn * (1.0 - n * n)
            dr = dtanh * hn
            d_ir = dr * r * (1.0 - r)
            d_iz = dz * z * (1.0 - z)
            odt = dgi_ref.dtype
            dgi_ref[0, :, :, :hd] = d_ir.astype(odt)
            dgi_ref[0, :, :, hd:2 * hd] = d_iz.astype(odt)
            dgi_ref[0, :, :, 2 * hd:] = dtanh.astype(odt)
            dgh_n = dtanh * r
            dgh_ref[0, :, :, :hd] = d_ir.astype(odt)
            dgh_ref[0, :, :, hd:2 * hd] = d_iz.astype(odt)
            dgh_ref[0, :, :, 2 * hd:] = dgh_n.astype(odt)
            dgi = jnp.concatenate([d_ir, d_iz, dtanh], axis=-1)
            dgh = jnp.concatenate([d_ir, d_iz, dgh_n], axis=-1)
            dhprev = dhprev + (dh_new * z).astype(f32) \
                + dotT(dgh, w_hh).reshape(h_prev.shape)
            return dgi, dhprev

        dgi_h, dhprev_h = cell_bwd(g_h_ref, dh_h_scr[:], u_h_ref,
                                   r_h, z_h, n_h, hn_h, h_h, whh_h,
                                   dgi_h_ref, dgh_h_ref, du_h_ref)
        dgi_o, dhprev_o = cell_bwd(g_o_ref, dh_o_scr[:], u_o_ref,
                                   r_o, z_o, n_o, hn_o, h_o, whh_o,
                                   dgi_o_ref, dgh_o_ref, du_o_ref)

        # ---- Backward through messages / attention ------------------------
        def dmsgs_of(dgi, w_msg, e):
            return unrows(dotT(dgi, w_msg).astype(cdt), e)

        dmsgs_h = dmsgs_of(dgi_h, wmh, nh)           # (B, H, 2h)
        dmsgs_o = dmsgs_of(dgi_o, wmo, no)

        def att_bwd(a, m, dmg, recv, send, datt_extra=None):
            da = jax.lax.dot_general(                     # (B, R, S)
                dmg, m, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=f32)
            if datt_extra is not None:
                da = da + datt_extra
            dm = jax.lax.dot_general(                     # (B, S, h)
                a, dmg, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                preferred_element_type=f32).astype(cdt)
            a32 = a.astype(f32)
            ds = (a32 * (da - jnp.sum(da * a32, axis=-1,
                                      keepdims=True))).astype(cdt)
            drecv = scale * jax.lax.dot_general(          # (B, R, h)
                ds, send, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=f32)
            dsend = scale * jax.lax.dot_general(          # (B, S, h)
                ds, recv, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                preferred_element_type=f32)
            return dm, drecv, dsend

        g_att = g_att_ref[0].astype(f32)
        dm_hh, dr_hh, dsnd_hh = att_bwd(a_hh, m_hh, dmsgs_h[..., :hd], h_h, h_h)
        dm_oh, dr_oh, dsnd_oh = att_bwd(a_oh, m_oh, dmsgs_h[..., hd:], h_h, h_o,
                                        datt_extra=g_att)
        dm_ho, dr_ho, dsnd_ho = att_bwd(a_ho, m_ho, dmsgs_o[..., :hd], h_o, h_h)
        dm_oo, dr_oo, dsnd_oo = att_bwd(a_oo, m_oo, dmsgs_o[..., hd:], h_o, h_o)

        def proj_bwd(dm, m, idx, dpre_ref, lo):
            # bf16 comparisons are unsupported on this target; mask in f32.
            dpre = dm * (m.astype(f32) > 0.0).astype(cdt)
            dpre_ref[0, :, :, lo:lo + hd] = dpre.astype(dpre_ref.dtype)
            return unrows(jax.lax.dot_general(
                rows(dpre), wf[idx],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=f32), dm.shape[1])

        dhs_hh = proj_bwd(dm_hh, m_hh, 0, dpre_h_ref, 0)
        dhs_ho = proj_bwd(dm_ho, m_ho, 1, dpre_h_ref, hd)
        dhs_oh = proj_bwd(dm_oh, m_oh, 2, dpre_o_ref, 0)
        dhs_oo = proj_bwd(dm_oo, m_oo, 3, dpre_o_ref, hd)

        dh_h_scr[:] = (dhprev_h + dr_hh + dsnd_hh + dr_oh + dsnd_ho
                       + dhs_hh + dhs_ho)
        dh_o_scr[:] = (dhprev_o + dsnd_oh + dr_ho + dr_oo + dsnd_oo
                       + dhs_oh + dhs_oo)

        @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
        def _():
            dh0_h_ref[:] = dh_h_scr[:].astype(dh0_h_ref.dtype)
            dh0_o_ref[:] = dh_o_scr[:].astype(dh0_o_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("scale", "reverse", "interpret",
                                             "fuse_dirs"))
def _seg_dir_bwd_pallas(gi_h, gi_o, u_h, u_o, hprev_h, hprev_o, g_h, g_o,
                        g_att, w_from, b_from, w_msg_h, w_msg_o,
                        w_hh_h, w_hh_o, b_hh_h, b_hh_o,
                        mask_hh, mask_obj, eye_oo,
                        scale: float, reverse: bool, interpret: bool,
                        fuse_dirs: bool = False):
    t, b, nh, g3 = gi_h.shape
    no = gi_o.shape[2]
    hd = g3 // 3
    dtype = gi_h.dtype
    # The backward sweep visits time opposite to the forward direction.
    rev = not reverse
    ts = lambda shape: _tspec(t, shape, rev)
    return pl.pallas_call(
        _make_bwd_kernel(scale, fuse_dirs),
        grid=(t,),
        in_specs=[ts((b, nh, g3)), ts((b, no, g3)),
                  ts((b, nh)), ts((b, no)),
                  ts((b, nh, hd)), ts((b, no, hd)),
                  ts((b, nh, hd)), ts((b, no, hd)), ts((b, nh, no)),
                  _full(), _full(), _full(), _full(), _full(), _full(),
                  _full(), _full(), _full(), _full(), _full()],
        out_specs=(ts((b, nh, g3)), ts((b, no, g3)),
                   ts((b, nh, g3)), ts((b, no, g3)),
                   ts((b, nh, 2 * hd)), ts((b, no, 2 * hd)),
                   ts((b, nh, 2 * hd)), ts((b, no, 2 * hd)),
                   ts((b, nh)), ts((b, no)),
                   _full(), _full()),
        out_shape=(jax.ShapeDtypeStruct((t, b, nh, g3), dtype),
                   jax.ShapeDtypeStruct((t, b, no, g3), dtype),
                   jax.ShapeDtypeStruct((t, b, nh, g3), dtype),
                   jax.ShapeDtypeStruct((t, b, no, g3), dtype),
                   jax.ShapeDtypeStruct((t, b, nh, 2 * hd), dtype),
                   jax.ShapeDtypeStruct((t, b, no, 2 * hd), dtype),
                   jax.ShapeDtypeStruct((t, b, nh, 2 * hd), dtype),
                   jax.ShapeDtypeStruct((t, b, no, 2 * hd), dtype),
                   jax.ShapeDtypeStruct((t, b, nh), dtype),
                   jax.ShapeDtypeStruct((t, b, no), dtype),
                   jax.ShapeDtypeStruct((b, nh, hd), dtype),
                   jax.ShapeDtypeStruct((b, no, hd), dtype)),
        scratch_shapes=[pltpu.VMEM((b, nh, hd), jnp.float32),
                        pltpu.VMEM((b, no, hd), jnp.float32)],
        # The step touches every weight once -> the default 16 MB scoped-vmem
        # budget under-provisions the pipeline's buffers; v5e has headroom.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_budget(dtype)),
        interpret=interpret,
    )(gi_h, gi_o, u_h, u_o, hprev_h, hprev_o, g_h, g_o, g_att,
      w_from, b_from, w_msg_h, w_msg_o, w_hh_h, w_hh_o, b_hh_h, b_hh_o,
      mask_hh, mask_obj, eye_oo)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _seg_dir(scale, reverse, interpret, fuse_dirs, gi_h, gi_o, u_h, u_o,
             w_from, b_from, w_msg_h, w_msg_o, w_hh_h, w_hh_o, b_hh_h,
             b_hh_o, mask_hh, mask_obj, eye_oo, h0_h, h0_o):
    """One direction of the segment scan (or BOTH, batch-stacked, when
    fuse_dirs) with a HAND-WRITTEN Pallas VJP: forward and backward both run
    as VMEM-resident kernels (no XLA recompute). The weight gradients reduce
    outside the kernel as large MXU einsums over the kernel's emitted
    per-step grads."""
    return _seg_dir_pallas(gi_h, gi_o, u_h, u_o, w_from, b_from, w_msg_h,
                           w_msg_o, w_hh_h, w_hh_o, b_hh_h, b_hh_o,
                           mask_hh, mask_obj, eye_oo, h0_h, h0_o,
                           scale=scale, reverse=reverse, interpret=interpret,
                           fuse_dirs=fuse_dirs)


def _seg_dir_fwd(scale, reverse, interpret, fuse_dirs, *args):
    out = _seg_dir_pallas(*args, scale=scale, reverse=reverse,
                          interpret=interpret, fuse_dirs=fuse_dirs)
    return out, (args, out[0], out[1])


def _seg_dir_bwd(scale, reverse, interpret, fuse_dirs, residuals, g):
    (gi_h, gi_o, u_h, u_o, w_from, b_from, w_msg_h, w_msg_o, w_hh_h, w_hh_o,
     b_hh_h, b_hh_o, mask_hh, mask_obj, eye_oo, h0_h, h0_o), h_h_seq, h_o_seq \
        = residuals
    g_h, g_o, g_att = g
    # The state each step READ, in natural time order.
    if reverse:
        hprev_h = jnp.concatenate([h_h_seq[1:], h0_h[None]], axis=0)
        hprev_o = jnp.concatenate([h_o_seq[1:], h0_o[None]], axis=0)
    else:
        hprev_h = jnp.concatenate([h0_h[None], h_h_seq[:-1]], axis=0)
        hprev_o = jnp.concatenate([h0_o[None], h_o_seq[:-1]], axis=0)
    (dgi_h, dgi_o, dgh_h, dgh_o, msgs_h, msgs_o, dpre_h, dpre_o,
     du_h, du_o, dh0_h, dh0_o) = _seg_dir_bwd_pallas(
        gi_h, gi_o, u_h, u_o, hprev_h, hprev_o, g_h, g_o, g_att,
        w_from, b_from, w_msg_h, w_msg_o, w_hh_h, w_hh_o, b_hh_h, b_hh_o,
        mask_hh, mask_obj, eye_oo,
        scale=scale, reverse=reverse, interpret=interpret,
        fuse_dirs=fuse_dirs)

    f32 = jnp.float32
    hd = w_hh_h.shape[-2]
    red = lambda a, b_: jnp.einsum("tbeh,tbeg->hg", a.astype(f32), b_.astype(f32))
    if fuse_dirs:
        # Per-direction cell-weight reductions over the batch halves.
        bh = gi_h.shape[1] // 2
        halves = lambda a: (a[:, :bh], a[:, bh:])
        red_d = lambda a, b_: jnp.stack([red(x, y) for x, y in
                                         zip(halves(a), halves(b_))])
        sum_d = lambda a: jnp.stack([jnp.sum(x.astype(f32), axis=(0, 1, 2))
                                     for x in halves(a)])
        dw_msg_h = red_d(msgs_h, dgi_h).astype(w_msg_h.dtype)
        dw_msg_o = red_d(msgs_o, dgi_o).astype(w_msg_o.dtype)
        dw_hh_h = red_d(hprev_h, dgh_h).astype(w_hh_h.dtype)
        dw_hh_o = red_d(hprev_o, dgh_o).astype(w_hh_o.dtype)
        db_hh_h = sum_d(dgh_h).astype(b_hh_h.dtype)
        db_hh_o = sum_d(dgh_o).astype(b_hh_o.dtype)
    else:
        dw_msg_h = red(msgs_h, dgi_h).astype(w_msg_h.dtype)
        dw_msg_o = red(msgs_o, dgi_o).astype(w_msg_o.dtype)
        dw_hh_h = red(hprev_h, dgh_h).astype(w_hh_h.dtype)
        dw_hh_o = red(hprev_o, dgh_o).astype(w_hh_o.dtype)
        db_hh_h = jnp.sum(dgh_h.astype(f32), axis=(0, 1, 2)).astype(b_hh_h.dtype)
        db_hh_o = jnp.sum(dgh_o.astype(f32), axis=(0, 1, 2)).astype(b_hh_o.dtype)
    dw_from = jnp.stack([
        red(hprev_h, dpre_h[..., :hd]), red(hprev_h, dpre_h[..., hd:]),
        red(hprev_o, dpre_o[..., :hd]), red(hprev_o, dpre_o[..., hd:]),
    ]).astype(w_from.dtype)
    db_from = jnp.stack([
        jnp.sum(dpre_h.astype(f32)[..., :hd], axis=(0, 1, 2)),
        jnp.sum(dpre_h.astype(f32)[..., hd:], axis=(0, 1, 2)),
        jnp.sum(dpre_o.astype(f32)[..., :hd], axis=(0, 1, 2)),
        jnp.sum(dpre_o.astype(f32)[..., hd:], axis=(0, 1, 2)),
    ]).astype(b_from.dtype)
    return (dgi_h, dgi_o, du_h, du_o, dw_from, db_from, dw_msg_h, dw_msg_o,
            dw_hh_h, dw_hh_o, db_hh_h, db_hh_o,
            jnp.zeros_like(mask_hh), jnp.zeros_like(mask_obj),
            jnp.zeros_like(eye_oo), dh0_h, dh0_o)


_seg_dir.defvjp(_seg_dir_fwd, _seg_dir_bwd)


def _collect(params, cfg, dtype):
    """Stack the segment-scan weights in kernel layout."""
    import math as _math

    h = cfg.hidden_size
    z3 = jnp.zeros((3 * h,), dtype)
    zh = jnp.zeros((h,), dtype)

    def msg_layer(edge):
        layer = params[edge]["segment"]["msg"]["layers"][0]
        return layer["w"], layer.get("b", zh)

    w_from = jnp.stack([msg_layer(e)[0] for e in ("h2h", "h2o", "o2h", "o2o")])
    b_from = jnp.stack([msg_layer(e)[1] for e in ("h2h", "h2o", "o2h", "o2o")])

    def cell(name, base_dim):
        p = params[name]
        return (p["w_ih"][base_dim:], p["w_hh"], p.get("b_hh", z3))

    scale = 1.0 / _math.sqrt(h) if cfg.attention_style in {
        "v3", "scaled_dot-product"} else 1.0
    return w_from, b_from, cell, scale


def pallas_segment_mode(cfg, dists3=(None, None, None)):
    """Kernel attention mode for this configuration, or None if the kernel
    does not apply (falls back to the XLA paths).

    'dot' (v2/v3) is the headline mode and the only one with the
    hand-written Pallas backward; 'v1'/'v4' compute their scores in-kernel;
    'ext' streams state-independent weights (mean pooling, distance-based
    attention with all three tensors present) computed outside.
    """
    from tggcn.models.tggcn import _fast_segment_scan_applicable

    use_dists = any(d is not None for d in dists3)
    if not _fast_segment_scan_applicable(cfg, use_dists):
        return None
    if cfg.message_aggregation in {"mp", "mean_pooling"}:
        return "ext"
    if use_dists:
        # Mixed computed/distance edges stay on the XLA fast path.
        return "ext" if all(d is not None for d in dists3) else None
    style = cfg.attention_style
    if style in {"v2", "dot-product", "v3", "scaled_dot-product"}:
        return "dot"
    if style in {"v1", "concat"}:
        return "v1"
    if style in {"v4", "general"}:
        return "v4"
    return None


def pallas_segment_scan_applicable(cfg, use_dists: bool) -> bool:
    """Back-compat boolean gate (no-dist configurations)."""
    return pallas_segment_mode(cfg, (None, None, None)) is not None \
        and not use_dists


def _collect_att(params, cfg, mode, dtype):
    """Stack the v1/v4 attention parameters in kernel layout."""
    h = cfg.hidden_size
    edges = ("h2h", "o2h", "h2o", "o2o")  # kernel edge order hh, oh, ho, oo
    if mode == "v1":
        ws, bs = [], []
        for e in edges:
            layer = params[e]["segment"]["att"]["layers"][0]
            ws.append(layer["w"])                          # (2h, 1)
            bs.append(layer.get("b", jnp.zeros(1, dtype)))
        return jnp.stack(ws), jnp.stack(bs)                # (4,2h,1), (4,1)
    if mode == "v4":
        ws, bs = [], []
        for e in edges:
            bil = params[e]["segment"]["att"]
            ws.append(bil["w"][0])                         # (h, h)
            bs.append(bil["b"][:1] if "b" in bil else jnp.zeros(1, dtype))
        return jnp.stack(ws), jnp.stack(bs)                # (4,h,h), (4,1)
    return None, None


def _external_att_weights(cfg, dists3, objects_mask, b, t, nh, no, dtype):
    """Time-major state-independent attention weights for 'ext' mode
    (mean pooling, or inverse-distance attention), edge order hh, oh, ho,
    oo. Differentiable w.r.t. the distance tensors."""
    from tggcn.nn.messages import (distance_based_attention_weights,
                                   masked_softmax)  # noqa: F401

    mask_hh = (1.0 - jnp.eye(nh, dtype=dtype))[None, None]        # (1,1,H,H)
    mask_oh = objects_mask.astype(dtype)[None, :, None, :]        # (1,B,1,O)
    mask_ho = jnp.ones((1, 1, 1, nh), dtype)
    mask_oo = mask_oh * (1.0 - jnp.eye(no, dtype=dtype))[None, None]
    if cfg.message_aggregation in {"mp", "mean_pooling"}:
        def uniform(mask, r, s):
            full = jnp.broadcast_to(mask, (1, b, r, s)).astype(dtype)
            w = full / jnp.clip(jnp.sum(full, axis=-1, keepdims=True), min=1.0)
            return jnp.broadcast_to(w, (t, b, r, s))
        return (uniform(mask_hh, nh, nh), uniform(mask_oh, nh, no),
                uniform(mask_ho, no, nh), uniform(mask_oo, no, no))
    hh_d, ho_d, oo_d = dists3
    tm = lambda d: jnp.moveaxis(d, 1, 0)                          # (T,B,R,S)
    def dist_w(d, mask):
        full = jnp.broadcast_to(mask, d.shape).astype(dtype)
        return distance_based_attention_weights(d, full)
    return (dist_w(tm(hh_d), mask_hh), dist_w(tm(ho_d), mask_oh),
            dist_w(jnp.swapaxes(tm(ho_d), -1, -2), mask_ho),
            dist_w(tm(oo_d), mask_oo))


def _base_gates(params, cell_name, x):
    w = params[cell_name]["w_ih"]
    gi = x @ w[: x.shape[-1]]
    if "b_ih" in params[cell_name]:
        gi = gi + params[cell_name]["b_ih"]
    return gi


def _seg_fast_pallas_impl(cfg, interpret, seg_params, x_hs, x_os, u_h, u_o,
                          objects_mask, seg_h0, seg_o0, kernel_vjp=False,
                          dists3=(None, None, None)):
    b, t, num_humans, base_h = x_hs.shape
    num_objects, base_o = x_os.shape[2], x_os.shape[-1]
    h = cfg.hidden_size
    dtype = x_hs.dtype
    w_from, b_from, cell, scale = _collect(seg_params, cfg, dtype)
    mode = pallas_segment_mode(cfg, dists3) or "dot"
    w_att, b_att = _collect_att(seg_params, cfg, mode, dtype)
    att_ws = None
    if mode == "ext":
        att_ws = _external_att_weights(cfg, dists3, objects_mask, b, t,
                                       num_humans, num_objects, dtype)

    tm = lambda a: jnp.moveaxis(a, 1, 0)
    u_h_t, u_o_t = tm(u_h), tm(u_o)

    mask_hh = 1.0 - jnp.eye(num_humans, dtype=dtype)
    eye_oo = 1.0 - jnp.eye(num_objects, dtype=dtype)

    if (mode == "dot" and getattr(cfg, "segment_fuse_directions", True)
            and jnp.dtype(dtype).itemsize < 4):
        # (f32 runs per-direction launches: direction fusion doubles the
        # resident cell weights, and at 4 bytes/elem the h=512 backward
        # would not fit even the raised VMEM budget. The A/B showed fusion
        # is launch-count sugar, not a throughput lever, so f32 loses
        # nothing.)
        # BOTH directions in one kernel launch, stacked on the batch axis
        # (rows [:B] forward, [B:] backward with time-pre-flipped inputs, so
        # the fused scan runs in natural order). Message/attention weights
        # are direction-shared; the MXU matmuls just get 2x the rows at
        # near-identical cost, and the per-grid-step overhead is paid once
        # for both directions instead of twice.
        def stack2(f, bwd):
            return jnp.concatenate([f, bwd[::-1]], axis=1)

        gi_h2 = stack2(tm(_base_gates(seg_params, "human_segment_rnn_fcell", x_hs)),
                       tm(_base_gates(seg_params, "human_segment_rnn_bcell", x_hs)))
        gi_o2 = stack2(tm(_base_gates(seg_params, "object_segment_rnn_fcell", x_os)),
                       tm(_base_gates(seg_params, "object_segment_rnn_bcell", x_os)))
        u_h2 = stack2(u_h_t, u_h_t)
        u_o2 = stack2(u_o_t, u_o_t)
        w_msg_h2, w_hh_h2, b_hh_h2 = [jnp.stack(ws) for ws in zip(
            cell("human_segment_rnn_fcell", base_h),
            cell("human_segment_rnn_bcell", base_h))]
        w_msg_o2, w_hh_o2, b_hh_o2 = [jnp.stack(ws) for ws in zip(
            cell("object_segment_rnn_fcell", base_o),
            cell("object_segment_rnn_bcell", base_o))]
        mask_obj2 = jnp.concatenate([objects_mask, objects_mask], 0).astype(dtype)
        h0_h2 = jnp.concatenate(
            [seg_h0.astype(dtype), jnp.zeros((b, num_humans, h), dtype)], 0)
        h0_o2 = jnp.concatenate(
            [seg_o0.astype(dtype), jnp.zeros((b, num_objects, h), dtype)], 0)
        args = (gi_h2, gi_o2, u_h2, u_o2, w_from, b_from,
                w_msg_h2, w_msg_o2, w_hh_h2, w_hh_o2, b_hh_h2, b_hh_o2,
                mask_hh, mask_obj2, eye_oo, h0_h2, h0_o2)
        if kernel_vjp:
            out_h, out_o, att = _seg_dir(float(scale), False, interpret,
                                         True, *args)
        else:
            out_h, out_o, att = _seg_dir_pallas(
                *args, scale=float(scale), reverse=False, interpret=interpret,
                fuse_dirs=True)
        hf_h, hb_h = out_h[:, :b], out_h[:, b:][::-1]
        hf_o, hb_o = out_o[:, :b], out_o[:, b:][::-1]
        att_f, att_b = att[:, :b], att[:, b:][::-1]

        def order(f, bwd):
            return jnp.concatenate([jnp.moveaxis(f, 0, 1),
                                    jnp.moveaxis(bwd, 0, 1)], axis=-1)

        return (order(hf_h, hb_h), order(hf_o, hb_o),
                jnp.moveaxis(att_f, 0, 1), jnp.moveaxis(att_b, 0, 1))

    def run_dir(direction):
        fcell = "human_segment_rnn_fcell" if direction == "fwd" else "human_segment_rnn_bcell"
        ocell = "object_segment_rnn_fcell" if direction == "fwd" else "object_segment_rnn_bcell"
        w_msg_h, w_hh_h, b_hh_h = cell(fcell, base_h)
        w_msg_o, w_hh_o, b_hh_o = cell(ocell, base_o)
        gi_h = tm(_base_gates(seg_params, fcell, x_hs))
        gi_o = tm(_base_gates(seg_params, ocell, x_os))
        reverse = direction == "bwd"
        if reverse:
            h0_h = jnp.zeros((b, num_humans, h), dtype)
            h0_o = jnp.zeros((b, num_objects, h), dtype)
        else:
            h0_h = seg_h0.astype(dtype)
            h0_o = seg_o0.astype(dtype)
        args = (gi_h, gi_o, u_h_t, u_o_t, w_from, b_from,
                w_msg_h, w_msg_o, w_hh_h, w_hh_o, b_hh_h, b_hh_o,
                mask_hh, objects_mask.astype(dtype), eye_oo, h0_h, h0_o)
        if kernel_vjp:
            assert mode == "dot", "hand-written VJP covers 'dot' mode only"
            return _seg_dir(float(scale), reverse, interpret, False, *args)
        return _seg_dir_pallas(*args, scale=float(scale), reverse=reverse,
                               interpret=interpret, mode=mode,
                               att_ws=att_ws, w_att=w_att, b_att=b_att)

    hf_h, hf_o, att_f = run_dir("fwd")
    hb_h, hb_o, att_b = run_dir("bwd")
    if cfg.message_aggregation in {"mp", "mean_pooling"}:
        # Mean pooling has no attention scores; the XLA paths (and the
        # reference) emit zeros for the attention outputs.
        att_f = jnp.zeros_like(att_f)
        att_b = jnp.zeros_like(att_b)

    def order(f, bwd):
        return jnp.concatenate([jnp.moveaxis(f, 0, 1), jnp.moveaxis(bwd, 0, 1)],
                               axis=-1)

    hx_hs = order(hf_h, hb_h)                          # (B, T, H, 2h)
    hx_os = order(hf_o, hb_o)
    return hx_hs, hx_os, jnp.moveaxis(att_f, 0, 1), jnp.moveaxis(att_b, 0, 1)


def _seg_fast_xla(cfg, seg_params, x_hs, x_os, u_h, u_o, objects_mask,
                  seg_h0, seg_o0, dists3=(None, None, None)):
    from tggcn.models.tggcn import _segment_scan_fast

    return _segment_scan_fast(seg_params, cfg, x_hs, x_os, u_h, u_o,
                              objects_mask, dists3[0], dists3[1], dists3[2],
                              seg_carry=(seg_h0, seg_o0))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def segment_scan_fast_pallas(cfg, interpret, seg_params, x_hs, x_os, u_h, u_o,
                             objects_mask, seg_h0, seg_o0,
                             dists3=(None, None, None)):
    """Differentiable fused segment scan: Pallas forward, XLA-fast-path VJP.

    Semantics identical to _segment_scan_fast (equivalence-tested); the
    backward recomputes through the XLA path, so training gradients are
    bit-for-bit the XLA fast path's while forward/inference runs the fused
    kernel. Covers every kernel mode (dot/v1/v4/ext), incl. gradients
    w.r.t. the distance tensors.
    """
    return _seg_fast_pallas_impl(cfg, interpret, seg_params, x_hs, x_os,
                                 u_h, u_o, objects_mask, seg_h0, seg_o0,
                                 dists3=dists3)


def _seg_fwd(cfg, interpret, seg_params, x_hs, x_os, u_h, u_o, objects_mask,
             seg_h0, seg_o0, dists3=(None, None, None)):
    out = _seg_fast_pallas_impl(cfg, interpret, seg_params, x_hs, x_os,
                                u_h, u_o, objects_mask, seg_h0, seg_o0,
                                dists3=dists3)
    return out, (seg_params, x_hs, x_os, u_h, u_o, objects_mask, seg_h0,
                 seg_o0, dists3)


def _seg_bwd(cfg, interpret, residuals, g):
    _, vjp = jax.vjp(lambda *a: _seg_fast_xla(cfg, *a), *residuals)
    return vjp(g)


segment_scan_fast_pallas.defvjp(_seg_fwd, _seg_bwd)


SEG_PARAM_KEYS = ("human_segment_rnn_fcell", "human_segment_rnn_bcell",
                  "object_segment_rnn_fcell", "object_segment_rnn_bcell",
                  "h2h", "h2o", "o2h", "o2o")


def run_segment_scan_pallas(params, cfg, x_hs, x_os, u_h, u_o, objects_mask,
                            seg_carry=(None, None), interpret: bool = False,
                            vjp_mode: str = "auto",
                            dists3=(None, None, None)):
    """apply_tggcn-facing wrapper: filters the segment-relevant parameters
    (so the custom VJP's cotangent covers exactly them) and materialises the
    zero carries.

    vjp_mode selects the backward implementation:
      * 'kernel' — the hand-written Pallas backward (_seg_dir): reverse-time
        sweep in VMEM, no XLA recompute. Only implemented for 'dot'
        attention (the headline configuration). bfloat16 runs both
        directions fused in one launch; float32 runs per-direction launches
        under a raised VMEM budget (_vmem_budget) so the resident weight
        set fits at hidden 512 (verified on v5e, BASELINE.md round 3).
      * 'xla' — custom VJP that recomputes through the XLA fast path.
      * 'auto' — 'kernel' in 'dot' mode (any dtype), 'xla' otherwise.
    """
    b = x_hs.shape[0]
    h = cfg.hidden_size
    dtype = x_hs.dtype
    seg_params = {k: params[k] for k in SEG_PARAM_KEYS}
    seg_h0, seg_o0 = seg_carry
    if seg_h0 is None:
        seg_h0 = jnp.zeros((b, x_hs.shape[2], h), dtype)
    if seg_o0 is None:
        seg_o0 = jnp.zeros((b, x_os.shape[2], h), dtype)
    mode = pallas_segment_mode(cfg, dists3) or "dot"
    if vjp_mode == "auto":
        vjp_mode = "kernel" if mode == "dot" else "xla"
    if vjp_mode == "kernel":
        return _seg_fast_pallas_impl(cfg, interpret, seg_params, x_hs, x_os,
                                     u_h, u_o, objects_mask, seg_h0, seg_o0,
                                     kernel_vjp=True, dists3=dists3)
    return segment_scan_fast_pallas(cfg, interpret, seg_params, x_hs, x_os,
                                    u_h, u_o, objects_mask, seg_h0, seg_o0,
                                    dists3)
