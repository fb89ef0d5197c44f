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
    the backward carry).

Use via `StreamingRunner.run(x_human, x_objects, objects_mask)` or step-wise
via `process_window`.
"""

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from tggcn.models.tggcn import TGGCNConfig, apply_tggcn


class StreamingRunner:
    def __init__(self, params: dict, cfg: TGGCNConfig, window: int, lookahead: int,
                 rng: Optional[jax.Array] = None):
        self.params = params
        self.cfg = cfg
        self.window = window
        self.lookahead = lookahead
        self.rng = rng if rng is not None else jax.random.PRNGKey(42)
        self._jitted = jax.jit(self._forward, static_argnames=("is_last",))

    def _forward(self, params, x_human, x_objects, objects_mask, steps, carry,
                 human_segmentation, is_last):
        outputs, aux = apply_tggcn(
            params, self.cfg, x_human, x_objects, objects_mask,
            human_segmentation=human_segmentation,
            steps_per_example=steps, train=False, rng=self.rng,
            carry=carry if carry else None, return_carry=True,
            force_last_step_commit=is_last)
        return outputs, aux["carry_seq"]

    def run(self, x_human: np.ndarray, x_objects: np.ndarray, objects_mask: np.ndarray,
            human_segmentation: Optional[np.ndarray] = None):
        """Process a (1, T, ...) stream window-by-window; returns stitched outputs.

        Output list layout matches apply_tggcn, each stitched along time to
        the full T.
        """
        b, t = x_human.shape[:2]
        chunk_len = self.window + self.lookahead
        carry = {}
        emitted = None
        for start in range(0, t, self.window):
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
                                              steps, carry, seg, is_last)
            emit = min(self.window, t - start)
            # Class-dim outputs are (B, C, T, E): slice time on axis 2;
            # decision outputs are (B, T, E): slice time on axis 1.
            keep = []
            for o in outputs:
                o = np.asarray(o)
                if o.ndim == 4:
                    keep.append(o[:, :, :emit])
                else:
                    keep.append(o[:, :emit])
            if emitted is None:
                emitted = keep
            else:
                for i, o in enumerate(keep):
                    axis = 2 if o.ndim == 4 else 1
                    emitted[i] = np.concatenate([emitted[i], o], axis=axis)
            # Slice the forward carries at the emit boundary so lookahead
            # frames never contaminate the next window's state. Stays on
            # device — no host round trip between windows.
            boundary = emit - 1
            carry = {k: v[:, boundary] for k, v in carry_seq.items()}
        return emitted
