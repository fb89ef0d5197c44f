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
eval engine) guard the first call AT EACH INPUT SHAPE with
`call_with_kernel_fallback` (jit retraces per shape, so a later call at a
new shape — e.g. the full-val eval batch — is a fresh compile with fresh
failure modes): on a backend/compile error they rebuild the model with
kernels off and retry once. Subsequent same-shape calls reuse the compiled
program, so the steady-state cost is one tree_leaves sweep per call.
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


def _copy_donatable(tree):
    """On-device copies of every fully-addressable array in the pytree.

    Used by FirstCallGuard to keep the caller's buffers alive through a
    guarded first call of a DONATING program: if the failure surfaces only
    at the output fetch (Mosaic launch errors do), the dispatched execution
    has already consumed its donated inputs — so the first attempt runs on
    copies and the retry gets the intact originals. Non-fully-addressable
    arrays (multi-process global arrays) pass through uncopied: copying
    them requires a collective, and a post-dispatch failure is equally
    fatal on every process anyway.
    """
    import jax
    import jax.numpy as jnp

    def cp(a):
        if isinstance(a, jax.Array) and a.is_fully_addressable:
            return jnp.array(a, copy=True)
        return a

    return jax.tree_util.tree_map(cp, tree)


class FirstCallGuard:
    """Guard the first invocation PER INPUT SHAPE of a compiled program with
    the kernel fallback.

    ``build(model)`` must return the compiled callable. The first call at
    each distinct input-shape signature runs under
    `call_with_kernel_fallback`: a backend/compile error with kernels on
    rebuilds via ``build(without_pallas_kernels(model))`` and retries once.
    Later calls at an already-succeeded shape dispatch straight to the
    compiled program (one cheap tree_leaves sweep per call).

    ``force_output(result)`` should fetch one output value so errors that
    surface only at fetch time are caught inside the guard (one extra sync,
    first call only).

    ``donate_argnums`` marks arguments the program donates; the guarded
    first attempt substitutes device copies for them (see _copy_donatable)
    and the retry uses the caller's originals.

    ``on_downgrade(fb_model)`` lets the caller downgrade sibling programs
    that embed the same kernels (e.g. the train guard downgrades the eval
    program with it).
    """

    def __init__(self, build, model: ModelDef, context: str,
                 force_output=None, donate_argnums=(), on_downgrade=None):
        self._build = build
        self.fn = build(model)
        self.model = model
        self._context = context
        self._force = force_output
        self._donate = tuple(donate_argnums)
        self._on_downgrade = on_downgrade
        # Input-shape signatures whose compile+run already succeeded. jit
        # retraces (and Mosaic recompiles) per distinct input shape, so a
        # LATER call at a fresh shape — e.g. the eval program's full-val
        # batch after epochs of fixed-shape train batches — can still hit a
        # shape-dependent kernel failure (VMEM overflow); every first call
        # per shape is guarded, not just the program's first call.
        self._seen_shapes = set()

    def downgrade(self, fb_model: ModelDef):
        """Swap in a kernels-off program without tripping the guard again."""
        self.fn = self._build(fb_model)
        self.model = fb_model

    @staticmethod
    def _shape_signature(args):
        import jax

        return tuple(
            (tuple(leaf.shape), str(leaf.dtype))
            if hasattr(leaf, "shape") and hasattr(leaf, "dtype")
            else (None, type(leaf).__name__)
            for leaf in jax.tree_util.tree_leaves(args))

    def __call__(self, *args):
        sig = self._shape_signature(args)
        if sig in self._seen_shapes:
            return self.fn(*args)
        first_args = list(args)
        for i in self._donate:
            first_args[i] = _copy_donatable(args[i])
        current = {"args": first_args}

        def rebuild(fb_model):
            self.fn = self._build(fb_model)
            # The first attempt may have consumed its (copied) donated
            # buffers; the retry runs on the caller's intact originals.
            current["args"] = args
            if self._on_downgrade is not None:
                self._on_downgrade(fb_model)

        def attempt():
            result = self.fn(*current["args"])
            if self._force is not None:
                self._force(result)
            return result

        result, self.model = call_with_kernel_fallback(
            attempt, rebuild, self.model, self._context)
        self._seen_shapes.add(sig)
        return result


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
