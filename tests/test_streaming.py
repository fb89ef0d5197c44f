"""Streaming sliding-window inference: exactness vs the offline forward.

With GT segmentation ('st'-deterministic decisions) and lookahead covering
the remaining sequence, the windowed streaming path must reproduce the
offline bidirectional forward exactly: the forward carries are sliced at the
emit boundary and the backward direction sees full future context.
"""

import jax
import numpy as np
import pytest

from tggcn.models.streaming import StreamingRunner
from tggcn.models.tggcn import TGGCNConfig, apply_tggcn, init_tggcn


@pytest.fixture(scope="module")
def small_model():
    # geometry_flatten='per_frame': the reference's scrambled geometry
    # reshape couples features to the clip length, which is incompatible
    # with exact windowing (documented in TGGCNConfig).
    cfg = TGGCNConfig(
        input_size=(2152, 2048), num_classes=(13, None), hidden_size=12,
        gcn_node=26, message_humans_to_human=True, message_segment=True,
        message_type="v2", message_granularity="v1", message_aggregation="att",
        attention_style="v3", discrete_optimization_strategy="st",
        object_segment_update_strategy="ind", geometry_flatten="per_frame")
    params = init_tggcn(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _inputs(t=12, b=1, num_humans=2, num_objects=2, seed=5):
    rng = np.random.default_rng(seed)
    x_human = rng.normal(size=(b, t, num_humans, 2152)).astype(np.float32)
    x_objects = rng.normal(size=(b, t, num_objects, 2048)).astype(np.float32)
    mask = np.ones((b, num_objects), dtype=np.float32)
    seg = (rng.uniform(size=(b, t, num_humans)) > 0.6).astype(np.float32)
    seg[:, -1] = 1.0
    return x_human, x_objects, mask, seg


def test_streaming_matches_offline_with_full_lookahead(small_model):
    cfg, params = small_model
    t = 12
    x_human, x_objects, mask, seg = _inputs(t=t)
    offline, _ = apply_tggcn(params, cfg, x_human, x_objects, mask,
                             human_segmentation=seg,
                             steps_per_example=np.full((1,), float(t), np.float32),
                             train=False, rng=jax.random.PRNGKey(42))
    runner = StreamingRunner(params, cfg, window=6, lookahead=6,
                             rng=jax.random.PRNGKey(42))
    streamed = runner.run(x_human, x_objects, mask, human_segmentation=seg)
    assert len(streamed) == len(offline)
    for i, (s, o) in enumerate(zip(streamed, offline)):
        np.testing.assert_allclose(s, np.asarray(o), rtol=2e-4, atol=2e-5,
                                   err_msg=f"output {i}")


def test_fused_window_groups_match_per_window_path(small_model):
    """The lax.scan-fused interior-window path (one jit dispatch per
    fuse_group windows) must be numerically identical to the per-window
    dispatch loop — same ops, same carry threading, same emit slicing."""
    cfg, params = small_model
    t = 30  # window 4, lookahead 2 -> 6 fused interior starts + tail
    x_human, x_objects, mask, seg = _inputs(t=t, seed=7)
    base = StreamingRunner(params, cfg, window=4, lookahead=2,
                           rng=jax.random.PRNGKey(42), fuse_group=1)
    fused = StreamingRunner(params, cfg, window=4, lookahead=2,
                            rng=jax.random.PRNGKey(42), fuse_group=4)
    out_base = base.run(x_human, x_objects, mask, human_segmentation=seg)
    out_fused = fused.run(x_human, x_objects, mask, human_segmentation=seg)
    assert len(out_base) == len(out_fused)
    for i, (a, b) in enumerate(zip(out_base, out_fused)):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6,
                                   err_msg=f"output {i}")


def test_fused_windows_without_gt_segmentation(small_model):
    """Fusion must also hold when the model makes its own ('st') decisions."""
    cfg, params = small_model
    t = 24
    x_human, x_objects, mask, _ = _inputs(t=t, seed=8)
    base = StreamingRunner(params, cfg, window=4, lookahead=2,
                           rng=jax.random.PRNGKey(42), fuse_group=1)
    fused = StreamingRunner(params, cfg, window=4, lookahead=2,
                            rng=jax.random.PRNGKey(42), fuse_group=8)
    out_base = base.run(x_human, x_objects, mask)
    out_fused = fused.run(x_human, x_objects, mask)
    for i, (a, b) in enumerate(zip(out_base, out_fused)):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6,
                                   err_msg=f"output {i}")


def test_streaming_bounded_lookahead_runs_and_shapes(small_model):
    cfg, params = small_model
    t = 20
    x_human, x_objects, mask, seg = _inputs(t=t, seed=6)
    runner = StreamingRunner(params, cfg, window=6, lookahead=3,
                             rng=jax.random.PRNGKey(42))
    streamed = runner.run(x_human, x_objects, mask, human_segmentation=seg)
    assert streamed[0].shape == (1, t, 2)          # decisions (B, T, H)
    assert streamed[-1].shape == (1, 13, t, 2)     # heads (B, C, T, H)
    for s in streamed:
        assert np.isfinite(s).all()


def test_full_lookahead_matches_offline_at_protocol_level(small_model):
    """Protocol-level equivalence (VERDICT r3 item 4): with full lookahead,
    streaming predictions must yield IDENTICAL argmaxed labels, micro/macro
    F1 and F1@k as the offline bidirectional path — not merely close raw
    outputs. Offline semantics: reference vhoi/models.py:785-899."""
    from tggcn.eval.reporting import evaluate_f1_at_k, evaluate_predictions

    cfg, params = small_model
    t = 16
    x_human, x_objects, mask, seg = _inputs(t=t, seed=12)
    offline, _ = apply_tggcn(params, cfg, x_human, x_objects, mask,
                             human_segmentation=seg,
                             steps_per_example=np.full((1,), float(t),
                                                       np.float32),
                             train=False, rng=jax.random.PRNGKey(42))
    runner = StreamingRunner(params, cfg, window=5, lookahead=t,
                             rng=jax.random.PRNGKey(42))
    streamed = runner.run(x_human, x_objects, mask, human_segmentation=seg)

    rng = np.random.default_rng(3)
    targets, preds_off, preds_str = {}, {}, {}
    for name, idx in (("sub-activity_recognition", -2),
                      ("sub-activity_prediction", -1)):
        off = np.argmax(np.asarray(offline[idx]), axis=1)
        stream = np.argmax(np.asarray(streamed[idx]), axis=1)
        np.testing.assert_array_equal(off, stream, err_msg=name)
        preds_off[name], preds_str[name] = off, stream
        targets[name] = rng.integers(0, 13, size=off.shape).astype(np.float64)

    frame_off = evaluate_predictions(targets, preds_off, print_report=False)
    frame_str = evaluate_predictions(targets, preds_str, print_report=False)
    assert frame_off == frame_str
    f1_off = evaluate_f1_at_k(targets, preds_off, 13, None, overlap=0.25)
    f1_str = evaluate_f1_at_k(targets, preds_str, 13, None, overlap=0.25)
    assert f1_off == f1_str


def test_process_window_stepwise_matches_run(small_model):
    """The caller-owned step-wise API (process_window) threads carries and
    emit boundaries identically to run()."""
    cfg, params = small_model
    t, w, la = 20, 6, 3
    x_human, x_objects, mask, seg = _inputs(t=t, seed=9)
    runner = StreamingRunner(params, cfg, window=w, lookahead=la,
                             rng=jax.random.PRNGKey(42), fuse_group=1)
    expected = runner.run(x_human, x_objects, mask, human_segmentation=seg)

    carry = None
    got = None
    for start in range(0, t, w):
        end = min(start + w + la, t)
        outputs, carry = runner.process_window(
            x_human[:, start:end], x_objects[:, start:end], mask, carry=carry,
            human_segmentation=seg[:, start:end], is_last=end == t)
        emit = min(w, t - start)
        keep = [np.asarray(o)[:, :, :emit] if np.asarray(o).ndim == 4
                else np.asarray(o)[:, :emit] for o in outputs]
        if got is None:
            got = keep
        else:
            got = [np.concatenate([g, k], axis=2 if k.ndim == 4 else 1)
                   for g, k in zip(got, keep)]
    for i, (a, b) in enumerate(zip(expected, got)):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6,
                                   err_msg=f"output {i}")


@pytest.fixture(scope="module")
def gs_model():
    """gs-decision model with window-independent (frame-indexed) noise."""
    cfg = TGGCNConfig(
        input_size=(2152, 2048), num_classes=(13, None), hidden_size=12,
        gcn_node=26, message_humans_to_human=True, message_segment=True,
        message_type="v2", message_granularity="v1", message_aggregation="att",
        attention_style="v3", discrete_optimization_strategy="gs",
        object_segment_update_strategy="ind", geometry_flatten="per_frame",
        gs_noise="frame_indexed")
    params = init_tggcn(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_gs_with_batched_noise_is_refused(small_model):
    """Window-resampled gs noise diverges from offline; the runner refuses."""
    import dataclasses

    cfg, params = small_model
    cfg_gs = dataclasses.replace(cfg, discrete_optimization_strategy="gs")
    with pytest.raises(ValueError, match="frame_indexed"):
        StreamingRunner(params, cfg_gs, window=6, lookahead=6)


def test_frame_indexed_gumbel_is_window_invariant():
    """Noise drawn for absolute frames [w0, w1) equals the offline slice."""
    from tggcn.nn.distributions import sample_from_gumbel_sigmoid

    key = jax.random.PRNGKey(7)
    probs = jax.random.uniform(jax.random.PRNGKey(8), (2, 12, 3, 1))
    full = sample_from_gumbel_sigmoid(key, probs,
                                      frame_indices=np.arange(12))
    for w0, w1 in [(0, 6), (6, 12), (3, 9)]:
        windowed = sample_from_gumbel_sigmoid(
            key, probs[:, w0:w1], frame_indices=np.arange(w0, w1))
        np.testing.assert_array_equal(np.asarray(windowed),
                                      np.asarray(full[:, w0:w1]))


def test_gs_process_window_auto_offset_matches_offline(gs_model):
    """The step-wise API threads the absolute frame offset through the carry
    by itself, so frame-indexed gs noise matches offline WITHOUT the caller
    passing frame_offset (a silent-divergence hazard otherwise: every window
    would resample frames [0, chunk) noise)."""
    cfg, params = gs_model
    t, w = 12, 5
    x_human, x_objects, mask, _seg = _inputs(t=t)
    offline, _ = apply_tggcn(params, cfg, x_human, x_objects, mask,
                             steps_per_example=np.full((1,), float(t), np.float32),
                             train=False, rng=jax.random.PRNGKey(42))
    runner = StreamingRunner(params, cfg, window=w, lookahead=t,
                             rng=jax.random.PRNGKey(42), fuse_group=1)
    carry, got = None, None
    for start in range(0, t, w):
        outputs, carry = runner.process_window(
            x_human[:, start:], x_objects[:, start:], mask, carry=carry,
            is_last=True)
        emit = min(w, t - start)
        keep = [np.asarray(o)[:, :, :emit] if np.asarray(o).ndim == 4
                else np.asarray(o)[:, :emit] for o in outputs]
        got = keep if got is None else [
            np.concatenate([g, k], axis=2 if k.ndim == 4 else 1)
            for g, k in zip(got, keep)]
    for i, (o, g) in enumerate(zip(offline, got)):
        np.testing.assert_allclose(np.asarray(o), g, rtol=2e-4, atol=2e-5,
                                   err_msg=f"output {i}")


def test_gs_streaming_matches_offline_with_full_lookahead(gs_model):
    """gs decisions sampled inside windows reproduce the offline run when
    the noise is frame-indexed (VERDICT r4 item 8)."""
    cfg, params = gs_model
    t = 12
    x_human, x_objects, mask, _seg = _inputs(t=t)
    offline, _ = apply_tggcn(params, cfg, x_human, x_objects, mask,
                             steps_per_example=np.full((1,), float(t), np.float32),
                             train=False, rng=jax.random.PRNGKey(42))
    runner = StreamingRunner(params, cfg, window=6, lookahead=6,
                             rng=jax.random.PRNGKey(42))
    streamed = runner.run(x_human, x_objects, mask)
    assert len(streamed) == len(offline)
    for i, (s, o) in enumerate(zip(streamed, offline)):
        np.testing.assert_allclose(s, np.asarray(o), rtol=2e-4, atol=2e-5,
                                   err_msg=f"output {i}")


def test_streaming_resolves_auto_kernel_routing_to_all(small_model):
    """Serving is forward-only, so 'auto' segment-kernel routing resolves to
    'all' at StreamingRunner construction (round-5 forward-only matrix:
    kernel faster in every mode without the recompute VJP). Explicit values
    are pinned; kernels-off configs are untouched."""
    import dataclasses

    cfg, params = small_model
    cfg_k = dataclasses.replace(cfg, use_pallas_segment_scan=True)
    runner = StreamingRunner(params, cfg_k, window=6, lookahead=6)
    assert runner.cfg.segment_kernel_modes == "all"

    cfg_pin = dataclasses.replace(cfg_k, segment_kernel_modes="dot")
    runner = StreamingRunner(params, cfg_pin, window=6, lookahead=6)
    assert runner.cfg.segment_kernel_modes == "dot"

    runner = StreamingRunner(params, cfg, window=6, lookahead=6)
    assert runner.cfg.segment_kernel_modes == "auto"  # kernels off: inert


def test_registry_forward_only_routing_resolver():
    """resolve_forward_only_kernel_routing rebuilds the ModelDef (closures
    re-closed over the new config) only when 'auto' + kernel are set."""
    import dataclasses

    from tggcn.models.registry import (
        resolve_forward_only_kernel_routing,
        select_model,
        with_config_changes,
    )

    model = select_model(
        "2G-GCN", input_size=(2152, 2048), num_classes=(13, None),
        hidden_size=12, gcn_node=26, message_humans_to_human=True,
        message_segment=True, message_type="v2", message_granularity="v1",
        message_aggregation="att", attention_style="v3",
        discrete_optimization_strategy="st",
        object_segment_update_strategy="ind")
    assert resolve_forward_only_kernel_routing(model) is model  # kernels off

    model_k = with_config_changes(model, use_pallas_segment_scan=True)
    resolved = resolve_forward_only_kernel_routing(model_k)
    assert resolved.config.segment_kernel_modes == "all"
    # The apply closure must capture the NEW config, not the old one: param
    # trees are routing-independent, so init stays compatible.
    import jax

    p_old = model.init(jax.random.PRNGKey(0))
    p_new = resolved.init(jax.random.PRNGKey(0))
    assert jax.tree_util.tree_structure(p_old) == jax.tree_util.tree_structure(p_new)

    pinned = with_config_changes(model_k, segment_kernel_modes="dot")
    assert resolve_forward_only_kernel_routing(pinned) is pinned
