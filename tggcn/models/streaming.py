"""Sliding-window streaming inference for long untrimmed videos.

The reference handles long videos only by temporal downsampling + padding
every batch to the longest clip (SURVEY.md §5.7). This module processes an
unbounded stream in fixed windows with:

  * exact forward recurrence: the frame-level forward GRUs and the
    segment-level forward gated GRU carry their states across windows (the
    carries are sliced at the emit boundary, so lookahead frames never leak
    into the next window's state);
  * bounded lookahead for the backward direction: each window is processed
    with `lookahead` extra future frames, and only the first `window` frames
    are emitted — the backward GRUs and the reorder pass see `lookahead`
    frames of future context, approximating the offline bidirectional model
    with O(window + lookahead) latency and memory;
  * few static program shapes: all interior chunks share one
    (window + lookahead) shape; only the final shorter chunk compiles a
    second program (pad frames are avoided on purpose — they would corrupt
    the backward carry);
  * device-fused window batches: interior windows are processed in groups by
    ONE `lax.scan` over window start offsets inside a single jit call
    (`fuse_group` windows per dispatch), so the per-window host round trip —
    which dominates end-to-end latency on remote-TPU deployments — amortises
    across the group. The scan body dynamic-slices each chunk out of the
    device-resident stream, threads the carry, and emits only the first
    `window` frames; numerics are identical to the window-by-window path
    (explicit zero carries equal the fresh-start defaults, tggcn.py:956-958).

Use via `StreamingRunner.run(x_human, x_objects, objects_mask)` or step-wise
via `process_window`.
"""

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from tggcn.models.tggcn import TGGCNConfig, _work_dtype, apply_tggcn


class StreamingRunner:
    def __init__(self, params: dict, cfg: TGGCNConfig, window: int, lookahead: int,
                 rng: Optional[jax.Array] = None, fuse_group: int = 16,
                 fuse_directions: Optional[bool] = None,
                 allow_reference_geometry: bool = False):
        if (getattr(cfg, "geometry_flatten", "reference") != "per_frame"
                and not allow_reference_geometry):
            # The reference-parity geometry reshape raw-memory-mixes the
            # TIME axis into the feature axis (models/tggcn.py, reference
            # models.py:644-645), so a window's geometry features depend on
            # the chunk length — windowed inference then silently diverges
            # from the offline model wherever geometry feeds the graph
            # (measured ~5e-3 on segment-level heads, round 4). Train
            # streaming-destined models with geometry_flatten='per_frame'.
            raise ValueError(
                "StreamingRunner requires geometry_flatten='per_frame': the "
                "'reference' flatten couples geometry features to the clip "
                "length, which windowing changes. Pass "
                "allow_reference_geometry=True to accept the approximation.")
        if (cfg.discrete_optimization_strategy in {"gumbel-sigmoid", "gs"}
                and getattr(cfg, "gs_noise", "batched") != "frame_indexed"):
            # Batched gs noise is drawn over the whole window, so the same
            # absolute frame resamples different noise depending on where a
            # window starts — streamed outputs then diverge from offline.
            # frame-indexed noise (fold_in(key, absolute_frame)) removes the
            # window dependence; 'st' decisions avoid noise entirely.
            raise ValueError(
                "StreamingRunner with gs decisions requires "
                "gs_noise='frame_indexed' (window-independent noise). "
                "Rebuild the config with gs_noise='frame_indexed', or serve "
                "with discrete_optimization_strategy='st'.")
        self.params = params
        # Default to per-direction kernel launches for streaming: at B=1 the
        # direction fusion's outside-kernel concat/flip/slice traffic
        # outweighs the saved launches (measured 4898 vs 4591 frames/s
        # device-resident in a matched pair, BASELINE.md round 3). Training
        # keeps fusion on; numerics are identical either way
        # (equivalence-tested). Pass fuse_directions=True to re-A/B.
        fuse = bool(fuse_directions) if fuse_directions is not None else False
        changes = {}
        if (getattr(cfg, "segment_fuse_directions", True) != fuse
                or getattr(cfg, "gru_fuse_directions", True) != fuse):
            changes.update(segment_fuse_directions=fuse,
                           gru_fuse_directions=fuse)
        if (getattr(cfg, "use_pallas_segment_scan", False)
                and getattr(cfg, "segment_kernel_modes", "auto") == "auto"):
            # Serving is forward-only: 'auto' routing resolves to 'all'
            # (the kernel wins every attention mode without the training
            # path's recompute-VJP penalty — 1.11-1.39x at the B=1 T=128
            # serving shape, tools/artifacts/r5_queue/segmodes_fwd_b1.log).
            # Pin an explicit value (e.g. 'dot') to opt out.
            changes.update(segment_kernel_modes="all")
        if changes:
            import dataclasses
            cfg = dataclasses.replace(cfg, **changes)
        self.cfg = cfg
        self.window = window
        self.lookahead = lookahead
        # Interior windows fused per device dispatch (1 disables fusion).
        self.fuse_group = max(1, int(fuse_group))
        self.rng = rng if rng is not None else jax.random.PRNGKey(42)
        self._jitted = jax.jit(self._forward, static_argnames=("is_last",))
        self._jitted_fused = jax.jit(self._forward_fused,
                                     static_argnames=("num_windows", "with_seg"))

    def _forward(self, params, x_human, x_objects, objects_mask, steps, carry,
                 human_segmentation, frame_offset, is_last):
        outputs, aux = apply_tggcn(
            params, self.cfg, x_human, x_objects, objects_mask,
            human_segmentation=human_segmentation,
            steps_per_example=steps, train=False, rng=self.rng,
            carry=carry if carry else None, return_carry=True,
            force_last_step_commit=is_last, frame_offset=frame_offset)
        return outputs, aux["carry_seq"]

    def _zero_carry(self, b, num_humans, num_objects, dtype):
        h = self.cfg.hidden_size
        # The model emits carries in its compute dtype; the fused lax.scan
        # needs the initial carry to match it exactly.
        dtype = _work_dtype(self.cfg) or dtype
        z = lambda e: jnp.zeros((b, e, h), dtype=dtype)
        return {"frame_human": z(num_humans), "frame_object": z(num_objects),
                "frame_geometry": z(1), "seg_human": z(num_humans),
                "seg_object": z(num_objects)}

    def _forward_fused(self, params, x_human, x_objects, objects_mask, starts,
                       carry, human_segmentation, base_offset, num_windows,
                       with_seg):
        """Process `num_windows` interior chunks in ONE lax.scan over start
        offsets. Each step slices a (window + lookahead) chunk from the
        device-resident stream, runs the model with the threaded carry, and
        emits the first `window` frames. Interior chunks never contain the
        stream's final frame, so force_last_step_commit is statically False.
        """
        b = x_human.shape[0]
        chunk = self.window + self.lookahead
        steps = jnp.full((b,), float(chunk), dtype=x_human.dtype)

        def body(carry, start):
            sl = lambda a: jax.lax.dynamic_slice_in_dim(a, start, chunk, axis=1)
            seg = sl(human_segmentation) if with_seg else None
            outputs, aux = apply_tggcn(
                params, self.cfg, sl(x_human), sl(x_objects), objects_mask,
                human_segmentation=seg, steps_per_example=steps, train=False,
                rng=self.rng, carry=carry, return_carry=True,
                force_last_step_commit=False,
                frame_offset=base_offset + start)
            boundary = self.window - 1
            new_carry = {k: v[:, boundary] for k, v in aux["carry_seq"].items()}
            emitted = tuple(o[:, :, : self.window] if o.ndim == 4
                            else o[:, : self.window] for o in outputs)
            return new_carry, emitted

        assert starts.shape[0] == num_windows
        carry, emitted = jax.lax.scan(body, carry, starts)
        return emitted, carry

    def process_window(self, x_human, x_objects, objects_mask, carry=None,
                       human_segmentation=None, is_last: bool = False,
                       frame_offset: Optional[int] = None):
        """Process ONE chunk step-wise (online serving: frames arrive
        incrementally and the caller owns the loop).

        x_human (B, W+L, ...) should contain `window` frames to emit plus up
        to `lookahead` future frames of context (fewer only at stream end,
        with is_last=True, which also applies the forced final commit).
        Returns (outputs, carry): outputs over the FULL chunk — the caller
        keeps the first min(window, chunk) frames — and the device-resident
        carry to pass to the next call.

        The stream's absolute frame position is threaded through the
        returned carry automatically, so frame-indexed state (the
        gs_noise='frame_indexed' Gumbel draw) matches the offline pass
        without the caller counting frames; pass an explicit frame_offset
        only to override (e.g. when seeking within a stream).
        """
        b, chunk = x_human.shape[:2]
        carry = dict(carry) if carry else {}
        tracked_offset = carry.pop("frame_offset", 0)
        if frame_offset is None:
            frame_offset = int(tracked_offset)
        xh = jax.device_put(x_human)
        xo = jax.device_put(x_objects)
        seg = (jax.device_put(human_segmentation)
               if human_segmentation is not None else None)
        steps = np.full((b,), float(chunk), dtype=np.float32)
        outputs, carry_seq = self._jitted(self.params, xh, xo, objects_mask,
                                          steps, carry, seg,
                                          jnp.int32(frame_offset), is_last)
        boundary = min(self.window, chunk) - 1
        carry = {k: v[:, boundary] for k, v in carry_seq.items()}
        # Next call resumes right after the emitted frames.
        carry["frame_offset"] = frame_offset + boundary + 1
        return outputs, carry

    @staticmethod
    def _stitch_windows(stacked: np.ndarray) -> np.ndarray:
        """(K, B, C, w, E) -> (B, C, K*w, E) or (K, B, w, E) -> (B, K*w, E)."""
        if stacked.ndim == 5:
            k, b, c, w, e = stacked.shape
            return stacked.transpose(1, 2, 0, 3, 4).reshape(b, c, k * w, e)
        k, b, w, e = stacked.shape
        return stacked.transpose(1, 0, 2, 3).reshape(b, k * w, e)

    def run(self, x_human: np.ndarray, x_objects: np.ndarray, objects_mask: np.ndarray,
            human_segmentation: Optional[np.ndarray] = None):
        """Process a (1, T, ...) stream window-by-window; returns stitched outputs.

        Output list layout matches apply_tggcn, each stitched along time to
        the full T.
        """
        b, t = x_human.shape[:2]
        chunk_len = self.window + self.lookahead
        starts_all = list(range(0, t, self.window))
        # Interior windows (a full chunk that does NOT reach the stream end)
        # are eligible for fusion; the remainder goes through the per-window
        # path (it needs is_last / short-chunk handling).
        fused_starts = [s for s in starts_all if s + chunk_len < t]
        # All jit calls are dispatched back-to-back (each consumes only the
        # previous call's DEVICE carry); host fetches of the emitted outputs
        # happen once at the end, so the per-dispatch host round trip — the
        # dominant latency on remote-TPU deployments — pays only once.
        pending = []
        carry = {}

        tail_starts = starts_all
        if self.fuse_group > 1 and len(fused_starts) >= 2:
            num_humans, num_objects = x_human.shape[2], x_objects.shape[2]
            carry = self._zero_carry(b, num_humans, num_objects, x_human.dtype)
            # Fixed-size groups share one compiled program; a shorter final
            # group compiles at most one extra program per distinct size.
            # Ingest is CHUNKED PER GROUP and interleaved with dispatch:
            # while the device runs group g, the host pushes group g+1's
            # slice through the (slow, host-bound) transfer path, so stream
            # ingest overlaps compute instead of fully preceding it.
            for g0 in range(0, len(fused_starts), self.fuse_group):
                group = fused_starts[g0: g0 + self.fuse_group]
                lo, hi = group[0], group[-1] + chunk_len
                xh = jax.device_put(x_human[:, lo:hi])
                xo = jax.device_put(x_objects[:, lo:hi])
                seg = (jax.device_put(human_segmentation[:, lo:hi])
                       if human_segmentation is not None else None)
                starts = jnp.asarray([s - lo for s in group], dtype=jnp.int32)
                stacked, carry = self._jitted_fused(
                    self.params, xh, xo, objects_mask, starts, carry, seg,
                    jnp.int32(lo), num_windows=len(group),
                    with_seg=seg is not None)
                pending.append(("fused", stacked, None))
            tail_starts = starts_all[len(fused_starts):]

        for start in tail_starts:
            end = min(start + chunk_len, t)
            # The forced u=1 commit applies whenever the chunk contains the
            # true final frame (matching the offline forward's last step).
            is_last = end == t
            # Chunks are NOT padded: zero pad frames would corrupt the
            # backward GRU carry at the real frames. The final (shorter)
            # chunk costs at most one extra compilation.
            # Device-resident chunk inputs: passing host numpy into jit costs
            # a synchronous per-call transfer on remote-TPU deployments.
            xh = jax.device_put(x_human[:, start:end])
            xo = jax.device_put(x_objects[:, start:end])
            seg = None
            if human_segmentation is not None:
                seg = jax.device_put(human_segmentation[:, start:end])
            steps = np.full((b,), float(end - start), dtype=np.float32)
            outputs, carry_seq = self._jitted(self.params, xh, xo, objects_mask,
                                              steps, carry, seg,
                                              jnp.int32(start), is_last)
            emit = min(self.window, t - start)
            pending.append(("tail", outputs, emit))
            # Slice the forward carries at the emit boundary so lookahead
            # frames never contaminate the next window's state. Stays on
            # device — no host round trip between windows.
            boundary = emit - 1
            carry = {k: v[:, boundary] for k, v in carry_seq.items()}

        # Fetch + stitch everything after the last dispatch.
        emitted = None

        def append(keep):
            nonlocal emitted
            if emitted is None:
                emitted = list(keep)
            else:
                for i, o in enumerate(keep):
                    axis = 2 if o.ndim == 4 else 1
                    emitted[i] = np.concatenate([emitted[i], o], axis=axis)

        for kind, outputs, emit in pending:
            if kind == "fused":
                append([self._stitch_windows(np.asarray(o)) for o in outputs])
            else:
                # Class-dim outputs are (B, C, T, E): slice time on axis 2;
                # decision outputs are (B, T, E): slice time on axis 1.
                keep = []
                for o in outputs:
                    o = np.asarray(o)
                    keep.append(o[:, :, :emit] if o.ndim == 4 else o[:, :emit])
                append(keep)
        return emitted
