"""Graceful degradation when a Pallas kernel path fails to compile.

VERDICT round 3 flagged a user-reachable crash: a Mosaic compile failure
(observed as a transient axon compile-helper SIGABRT) with
use_pallas_segment_scan=True aborted the run with no fallback. The train
loop and eval engine now guard their first compiled call
(tggcn/models/fallback.py): on a backend/compile error they rebuild without
kernels and retry, so every use_pallas_* config trains/evals on the XLA
path instead of crashing. These tests inject a compile failure at the
kernel entry point and assert the downgrade happens, warns, and reproduces
the kernels-off trajectory exactly.
"""

import jax
import numpy as np
import pytest

import distributed_worker as dw
from tggcn.models import select_model
from tggcn.models.fallback import (
    is_backend_or_compile_error,
    uses_pallas_kernels,
    without_pallas_kernels,
)

MODEL_KW = dict(
    input_size=(2152, 2048), num_classes=(13, None), hidden_size=8,
    gcn_node=26, message_humans_to_human=True, message_segment=True,
    message_type="v2", message_granularity="v1", message_aggregation="att",
    attention_style="v3", discrete_optimization_strategy="st",
    object_segment_update_strategy="ind")


def _train_one_epoch(model):
    from tggcn.train.loop import train

    w = dw.build_workload()
    params = model.init(jax.random.PRNGKey(dw.SEED))
    return train(model, w["train_loader"], w["optimizer"], w["criterion"], 1,
                 w["loss_names"], clip_gradient_at=5.0,
                 fetch_model_data=w["fetcher"], feed_model_data=w["feeder"],
                 val_loader=w["val_loader"], num_main_losses=4, seed=42,
                 num_inputs=8, init_params=params)


def test_without_pallas_kernels_flips_flags_and_keeps_params():
    model = select_model("2G-GCN", use_pallas_segment_scan=True,
                         use_pallas_gru=True, **MODEL_KW)
    assert uses_pallas_kernels(model)
    fallback = without_pallas_kernels(model)
    assert not uses_pallas_kernels(fallback)
    # Same parameter pytree: existing params/opt state stay valid.
    p1 = model.init(jax.random.PRNGKey(0))
    p2 = fallback.init(jax.random.PRNGKey(0))
    assert jax.tree_util.tree_structure(p1) == jax.tree_util.tree_structure(p2)
    # Non-kernel models pass through untouched.
    plain = select_model("2G-GCN", **MODEL_KW)
    assert without_pallas_kernels(plain) is plain


def test_error_classification():
    assert is_backend_or_compile_error(jax.errors.JaxRuntimeError(
        "INTERNAL: remote_compile: tpu_compile_helper subprocess exit "
        "signal SIGABRT (6)"))
    assert not is_backend_or_compile_error(ValueError("bad shape"))
    assert not is_backend_or_compile_error(TypeError("bad arg"))
    # pallas_call on a non-TPU backend is a platform gap, not a user bug.
    assert is_backend_or_compile_error(ValueError(
        "Only interpret mode is supported on CPU backend."))


def test_train_loop_falls_back_to_xla_on_kernel_compile_failure(monkeypatch):
    import tggcn.ops.segment_scan_pallas as seg_mod

    def boom(*args, **kwargs):
        raise jax.errors.JaxRuntimeError(
            "INTERNAL: http://127.0.0.1:8083/remote_compile: HTTP 500: "
            "tpu_compile_helper subprocess exit signal SIGABRT (6)")

    monkeypatch.setattr(seg_mod, "run_segment_scan_pallas", boom)

    kernel_model = select_model("2G-GCN", use_pallas_segment_scan=True,
                                **MODEL_KW)
    with pytest.warns(RuntimeWarning, match="Pallas kernels failed"):
        ckpt_fallback = _train_one_epoch(kernel_model)

    # The downgraded run IS the kernels-off run: identical trajectory.
    plain_model = select_model("2G-GCN", **MODEL_KW)
    ckpt_plain = _train_one_epoch(plain_model)
    np.testing.assert_allclose(
        np.asarray(ckpt_fallback["train_losses"][0][1]),
        np.asarray(ckpt_plain["train_losses"][0][1]), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(ckpt_fallback["val_losses"][0][1]),
        np.asarray(ckpt_plain["val_losses"][0][1]), rtol=1e-6)


def test_first_call_guard_donation_safe_retry():
    """A failure surfacing at the output FETCH (after dispatch) must not
    retry with already-donated buffers: the guarded first attempt runs on
    copies, the retry on the caller's intact originals."""
    import jax.numpy as jnp

    from tggcn.models.fallback import FirstCallGuard

    model = select_model("2G-GCN", use_pallas_segment_scan=True, **MODEL_KW)
    seen, built = [], []

    def build(m):
        built.append(uses_pallas_kernels(m))
        donating = jax.jit(lambda x: x * 2.0, donate_argnums=(0,))

        def fn(x):
            seen.append(x)
            return donating(x)

        return fn

    fetches = {"n": 0}

    def force(result):
        fetches["n"] += 1
        if fetches["n"] == 1:  # simulate a Mosaic launch error at fetch
            raise jax.errors.JaxRuntimeError("INTERNAL: launch failed")
        np.asarray(result)

    guard = FirstCallGuard(build, model, "unit", force_output=force,
                           donate_argnums=(0,))
    x = jnp.arange(4.0)
    with pytest.warns(RuntimeWarning, match="Pallas kernels failed"):
        y = guard(x)
    np.testing.assert_allclose(np.asarray(y), 2.0 * np.arange(4))
    assert built == [True, False]
    # First attempt consumed a COPY; the retry got the original buffer.
    assert seen[0] is not x and seen[1] is x
    assert not uses_pallas_kernels(guard.model)
    # Later calls go straight through (no new build, no guard).
    guard(jnp.arange(4.0))
    assert built == [True, False]


def test_eval_guard_downgrades_independently():
    """An eval-program-only compile failure (the train and eval programs
    fuse differently) downgrades just that guard instead of crashing."""
    import jax.numpy as jnp

    from tggcn.models.fallback import FirstCallGuard

    model = select_model("2G-GCN", use_pallas_segment_scan=True, **MODEL_KW)

    def build_eval(m):
        if uses_pallas_kernels(m):
            def boom(*args):
                raise jax.errors.JaxRuntimeError(
                    "INTERNAL: tpu_compile_helper subprocess exit signal "
                    "SIGABRT (6)")
            return boom
        return lambda x: x + 1.0

    guard = FirstCallGuard(build_eval, model, "eval step")
    with pytest.warns(RuntimeWarning, match="Pallas kernels failed"):
        out = guard(jnp.float32(1.0))
    assert float(out) == 2.0
    assert not uses_pallas_kernels(guard.model)


def test_train_loop_surfaces_non_compile_errors(monkeypatch):
    import tggcn.ops.segment_scan_pallas as seg_mod

    def bug(*args, **kwargs):
        raise ValueError("a real bug, not a compile failure")

    monkeypatch.setattr(seg_mod, "run_segment_scan_pallas", bug)
    kernel_model = select_model("2G-GCN", use_pallas_segment_scan=True,
                                **MODEL_KW)
    with pytest.raises(ValueError, match="a real bug"):
        _train_one_epoch(kernel_model)


def test_guard_rearms_on_new_input_shape():
    """A later call at a FRESH input shape triggers a fresh trace/compile
    (e.g. the full-val eval batch after fixed-shape train batches); a
    shape-dependent kernel failure there must downgrade, not crash."""
    import jax.numpy as jnp

    from tggcn.models.fallback import FirstCallGuard, uses_pallas_kernels

    model = select_model("2G-GCN", use_pallas_segment_scan=True, **MODEL_KW)
    built = []

    def build(m):
        kernels = uses_pallas_kernels(m)
        built.append(kernels)

        def fn(x):
            # Simulate a kernel that only overflows VMEM at the big shape.
            if kernels and x.shape[0] > 4:
                raise jax.errors.JaxRuntimeError(
                    "RESOURCE_EXHAUSTED: scoped vmem limit exceeded")
            return x * 2.0

        return fn

    guard = FirstCallGuard(build, model, "unit")
    np.testing.assert_allclose(np.asarray(guard(jnp.arange(4.0))),
                               2.0 * np.arange(4))
    # Same shape again: straight through, no rebuild.
    guard(jnp.arange(4.0))
    assert built == [True]
    # New (bigger) shape: guarded, fails with kernels on, downgrades.
    with pytest.warns(RuntimeWarning, match="Pallas kernels failed"):
        y = guard(jnp.arange(8.0))
    np.testing.assert_allclose(np.asarray(y), 2.0 * np.arange(8))
    assert built == [True, False]
    assert not uses_pallas_kernels(guard.model)
