"""Process-level numerics modes: reference parity vs full TPU speed.

On TPU the MXU executes float32 matmuls as bf16x3 passes by default; on
marginal inputs the accumulated rounding upstream of the hard segment
decision threshold (reference vhoi/models.py:1477-1533 semantics) can flip
a decision bit vs the CPU-run reference. Measured in round 4 (BASELINE.md):
2/12 golden fixtures flip at default precision and pass at
jax_default_matmul_precision=highest (7.3e-5 max-abs).

``resources.parity_mode`` in conf/config.yaml promotes the escape hatch into
the config surface:

- ``fast`` (default): TPU-default matmul precision — full MXU throughput.
  The supported training/serving mode; golden-tolerance parity everywhere,
  hard-decision bit parity on non-marginal inputs.
- ``exact``: f32 matmuls run at ``highest`` precision (more MXU passes);
  hard decisions are bit-exact with the CPU-run reference on all golden
  fixtures. Use for parity audits and when reproducing reference outputs
  matters more than step time. Irrelevant under bfloat16 compute
  (``parameters.compute_dtype=bfloat16`` already opts out of f32 parity).
"""

import contextlib

PARITY_MODES = ("fast", "exact")


def apply_parity_mode(mode: str) -> None:
    """Set the process-wide matmul precision for the given parity mode.

    Call once at CLI startup (train.py / predict.py), before any jit trace.
    """
    import jax

    if mode not in PARITY_MODES:
        raise ValueError(
            f"resources.parity_mode must be one of {PARITY_MODES}, got {mode!r}")
    if mode == "exact":
        jax.config.update("jax_default_matmul_precision", "highest")


@contextlib.contextmanager
def parity_mode_scope(mode: str):
    """Scoped variant for in-process mode switches (tools, tests).

    jax.jit caches key on the precision context, so traces made under this
    scope do not leak into 'fast'-mode callers.
    """
    import jax

    if mode not in PARITY_MODES:
        raise ValueError(
            f"parity_mode must be one of {PARITY_MODES}, got {mode!r}")
    if mode == "exact":
        with jax.default_matmul_precision("highest"):
            yield
    else:
        yield
