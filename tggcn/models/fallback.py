"""Graceful degradation when a Pallas kernel path fails to compile.

The Mosaic kernels are a performance feature, never a capability one: every
kernel route has a numerically equivalent XLA path (models/tggcn.py routes
statically on cfg.use_pallas_*). A kernel compile failure — a Mosaic
verification error, a VMEM overflow on an unusual shape, or a transient
remote-compile-helper crash (observed on the axon tunnel as
"tpu_compile_helper subprocess exit signal SIGABRT", round 3/4 bisects in
tools/minimize_mosaic_crash2.py) — should therefore degrade to the XLA path
with a loud warning, not crash the user's training run.

Entry points that jit a whole program with kernels enabled (train loop,
eval engine) guard their FIRST call with `call_with_kernel_fallback`: on a
backend/compile error they rebuild the model with kernels off and retry
once. Subsequent calls reuse the compiled program, so the guard costs
nothing after step one.
"""

import dataclasses
import warnings

from tggcn.models.registry import ModelDef

_KERNEL_FLAGS = ("use_pallas_geo_gcn", "use_pallas_gru",
                 "use_pallas_segment_scan")


def uses_pallas_kernels(model: ModelDef) -> bool:
    return any(getattr(model.config, flag, False) for flag in _KERNEL_FLAGS)


def without_pallas_kernels(model: ModelDef) -> ModelDef:
    """The same model with every Pallas kernel route disabled.

    Parameter pytrees are identical between the kernel and XLA paths, so
    existing params/optimizer state stay valid.
    """
    from tggcn.models.tggcn import apply_tggcn, init_tggcn

    if not uses_pallas_kernels(model):
        return model
    cfg = dataclasses.replace(model.config,
                              **{flag: False for flag in _KERNEL_FLAGS})
    return ModelDef(model.name, cfg,
                    init=lambda key: init_tggcn(key, cfg),
                    apply=lambda params, **kw: apply_tggcn(params, cfg, **kw))


def is_backend_or_compile_error(exc: BaseException) -> bool:
    """Errors that plausibly come from compiling/launching a device program.

    Covers Mosaic verification failures, XLA/TPU backend errors, and the
    axon remote-compile-helper SIGABRT. Python-level errors (TypeError,
    ValueError from shape checks, ...) are NOT eligible — those are bugs and
    must surface.
    """
    try:
        from jax.errors import JaxRuntimeError
    except ImportError:  # pragma: no cover - very old jax
        JaxRuntimeError = ()
    try:
        from jax._src.lib import xla_client

        XlaRuntimeError = xla_client.XlaRuntimeError
    except Exception:  # pragma: no cover - private-API drift
        XlaRuntimeError = ()
    if isinstance(exc, (JaxRuntimeError, XlaRuntimeError)):
        return True
    # pallas_call on a non-TPU backend ("Only interpret mode is supported on
    # CPU backend."): a platform-support gap, not a user bug — a kernels-on
    # config should still run (on the XLA path) when moved to a CPU host.
    if isinstance(exc, ValueError) and "interpret mode is supported" in str(exc):
        return True
    # Mosaic lowering errors surface as NotImplementedError/LoweringException
    # from pallas; match on module rather than importing private names.
    mod = type(exc).__module__ or ""
    return "pallas" in mod or "mosaic" in mod


def call_with_kernel_fallback(call, rebuild, model: ModelDef, context: str):
    """Run `call()`; on a backend/compile error with kernels on, rebuild
    without kernels via `rebuild(fallback_model)` and run `call()` again.

    Returns (result, model): `model` is the (possibly downgraded) ModelDef
    the caller should keep using. Raises the original error when kernels are
    off (nothing to fall back to) or when the retry also fails.
    """
    try:
        return call(), model
    except Exception as exc:  # noqa: BLE001 - filtered by predicate below
        if not (uses_pallas_kernels(model) and is_backend_or_compile_error(exc)):
            raise
        warnings.warn(
            f"{context}: compiling with Pallas kernels failed "
            f"({type(exc).__name__}: {str(exc)[:200]}); retrying on the XLA "
            f"path with use_pallas_* disabled. Performance may be lower; "
            f"numerics are equivalent.", RuntimeWarning, stacklevel=2)
        fallback = without_pallas_kernels(model)
        rebuild(fallback)
        try:
            return call(), fallback
        except Exception as retry_exc:
            raise retry_exc from exc
