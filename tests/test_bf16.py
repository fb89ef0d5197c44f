"""bfloat16 compute_dtype: deviation study vs the float32 path.

The knob (TGGCNConfig.compute_dtype='bfloat16') casts inputs + heavy-path
parameters at apply entry while master parameters, the GeoGCN BatchNorm
statistics, the classification heads, and all returned outputs stay float32.
These tests pin (a) the measured output deviation bounds, (b) hard-decision
agreement, and (c) that gradients flow back to float32 master parameters.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tggcn.models.tggcn import TGGCNConfig, apply_tggcn, init_tggcn

BASE_KW = dict(
    input_size=(2152, 2048), num_classes=(13, None), hidden_size=32,
    gcn_node=26, message_humans_to_human=True, message_objects_to_human=True,
    message_human_to_objects=True, message_objects_to_object=True,
    message_geometry_to_objects=True, message_segment=True,
    message_type="v2", message_granularity="v1", message_aggregation="att",
    attention_style="v3", discrete_optimization_strategy="st",
    object_segment_update_strategy="ind")


@pytest.fixture(scope="module")
def pair():
    cfg32 = TGGCNConfig(**BASE_KW)
    cfg16 = TGGCNConfig(compute_dtype="bfloat16", **BASE_KW)
    params = init_tggcn(jax.random.PRNGKey(0), cfg32)
    rng = np.random.default_rng(3)
    b, t, nh, no = 2, 16, 2, 3
    x_human = rng.normal(size=(b, t, nh, 2152)).astype(np.float32)
    x_objects = rng.normal(size=(b, t, no, 2048)).astype(np.float32)
    mask = np.ones((b, no), np.float32)
    steps = np.full((b,), float(t), np.float32)
    kw = dict(objects_mask=mask, steps_per_example=steps, train=False,
              rng=jax.random.PRNGKey(7))
    out32, _ = apply_tggcn(params, cfg32, x_human, x_objects, **kw)
    out16, _ = apply_tggcn(params, cfg16, x_human, x_objects, **kw)
    return cfg32, cfg16, params, (x_human, x_objects, mask, steps), out32, out16


def test_outputs_are_float32_and_bounded_deviation(pair):
    *_, out32, out16 = pair
    assert all(np.asarray(o).dtype == np.float32 for o in out16)
    # Log-probability heads: with num_classes=(13, None) the output layout is
    # [u_hard, u_soft, frame_rec, frame_pred, seg_rec, seg_pred] — heads are
    # indices 2..5. Bounds asserted with generous headroom over the measured
    # deviation on this fixture.
    for i in range(2, len(out32)):
        d = np.abs(np.asarray(out32[i]) - np.asarray(out16[i]))
        assert d.max() < 0.5, f"output {i}: max dev {d.max()}"
        assert d.mean() < 0.05, f"output {i}: mean dev {d.mean()}"


def test_hard_decisions_agree_away_from_threshold(pair):
    """bf16 may flip hard decisions whose soft score sits AT the 0.5
    threshold (inherent to any precision change); decisions with any margin
    must not flip. At random init soft scores cluster near 0.5, so this is
    the meaningful contract, not a raw flip rate."""
    *_, out32, out16 = pair
    hard32, hard16 = np.asarray(out32[0]), np.asarray(out16[0])
    soft32 = np.asarray(out32[1])
    margin = np.abs(soft32 - 0.5) > 0.05
    flips_with_margin = np.mean(hard32[margin] != hard16[margin])
    assert flips_with_margin < 0.01, f"margin-decision flip rate {flips_with_margin}"
    # And the soft scores themselves stay close.
    d = np.abs(soft32 - np.asarray(out16[1]))
    assert d.max() < 0.05, f"soft decision max dev {d.max()}"


def test_gradients_reach_float32_master_params(pair):
    cfg32, cfg16, params, (x_human, x_objects, mask, steps), *_ = pair

    def loss_fn(p, cfg):
        out, _ = apply_tggcn(p, cfg, x_human, x_objects, objects_mask=mask,
                             steps_per_example=steps, train=False,
                             rng=jax.random.PRNGKey(7))
        return -jnp.mean(out[2]) - jnp.mean(out[4])

    l16, g16 = jax.value_and_grad(loss_fn)(params, cfg16)
    l32 = loss_fn(params, cfg32)
    leaves = jax.tree_util.tree_leaves(g16)
    assert all(l.dtype == jnp.float32 for l in leaves)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # The loss itself is computed from float32 heads; bf16 activations bound
    # the drift.
    np.testing.assert_allclose(float(l16), float(l32), rtol=0.05)


def test_bf16_carry_streaming_path(pair):
    """The streaming carry round-trips through the bf16 path (carries are
    cast at apply entry; emitted outputs stay float32)."""
    cfg32, cfg16, params, (x_human, x_objects, mask, _), *_ = pair
    from tggcn.models.streaming import StreamingRunner

    cfg_stream = TGGCNConfig(compute_dtype="bfloat16",
                             geometry_flatten="per_frame", **BASE_KW)
    r16 = StreamingRunner(params, cfg_stream, window=6, lookahead=4,
                          rng=jax.random.PRNGKey(42), fuse_group=4)
    # Tile to t=32 so the fused window-group path runs under bf16 too.
    out = r16.run(np.tile(x_human, (1, 2, 1, 1)),
                  np.tile(x_objects, (1, 2, 1, 1)), mask)
    assert all(np.asarray(o).dtype == np.float32 for o in out)
    assert all(np.isfinite(np.asarray(o)).all() for o in out)
