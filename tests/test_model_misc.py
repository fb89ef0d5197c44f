"""Model odds and ends: attention inspection, bucketed loading, config parsing."""

import jax
import numpy as np

from tggcn.data.pipeline import BucketedDataLoader, bucket_by_length
from tggcn.models.tggcn import TGGCNConfig, apply_tggcn, init_tggcn


def test_inspect_model_attention_scores():
    cfg = TGGCNConfig(input_size=(2152, 2048), num_classes=(13, None), hidden_size=8,
                      gcn_node=26, message_humans_to_human=True, message_segment=True,
                      message_type="v2", message_granularity="v1",
                      message_aggregation="att", attention_style="v3",
                      discrete_optimization_strategy="st",
                      object_segment_update_strategy="ind")
    params = init_tggcn(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    b, t, num_humans, num_objects = 2, 5, 2, 3
    x_h = rng.normal(size=(b, t, num_humans, 2152)).astype(np.float32)
    x_o = rng.normal(size=(b, t, num_objects, 2048)).astype(np.float32)
    mask = np.ones((b, num_objects), np.float32)
    mask[0, -1] = 0.0
    _outputs, aux = apply_tggcn(params, cfg, x_h, x_o, mask,
                                steps_per_example=np.full((b,), float(t), np.float32),
                                rng=jax.random.PRNGKey(1), inspect_model=True)
    att_frame, att_f, att_b = aux["attention_scores"]
    # Reference stacking layout (B, H, T, O) (models.py:927-931).
    for att in (att_frame, att_f, att_b):
        att = np.asarray(att)
        assert att.shape == (b, num_humans, t, num_objects)
        # Masked object receives zero attention; real rows sum to 1.
        np.testing.assert_allclose(att[0, :, :, -1], 0.0, atol=1e-6)
        np.testing.assert_allclose(att.sum(-1), 1.0, rtol=1e-5)


def test_bucket_by_length_and_loader():
    data = [{"len": n} for n in [30, 5, 18, 9, 40, 2, 25, 11]]
    buckets = bucket_by_length(data, 2, length_fn=lambda d: d["len"])
    assert [d["len"] for d in buckets[0]] == [2, 5, 9, 11]
    assert [d["len"] for d in buckets[1]] == [18, 25, 30, 40]

    tensors_a = [np.arange(6).reshape(6, 1), np.arange(6)]
    tensors_b = [np.arange(4).reshape(4, 1) + 100, np.arange(4) + 100]
    loader = BucketedDataLoader([tensors_a, tensors_b], batch_size=2, shuffle=False)
    assert loader.num_examples == 10
    assert len(loader) == 5
    batches = list(loader)
    assert len(batches) == 5
    seen = np.concatenate([b[1] for b in batches])
    assert set(seen.tolist()) == set(range(6)) | set(range(100, 104))


def test_shared_level_mlps_single_parameter():
    """share_level_mlps must reuse ONE tensor for both levels (gradient
    accumulation semantics of the reference's module aliasing)."""
    import jax.numpy as jnp

    cfg = TGGCNConfig(input_size=(2152, 2048), num_classes=(13, None), hidden_size=8,
                      gcn_node=26, message_humans_to_human=True, message_segment=False,
                      message_type="v2", message_granularity="v1",
                      message_aggregation="att", attention_style="v3",
                      discrete_optimization_strategy="st",
                      object_segment_update_strategy="ind", share_level_mlps=True)
    params = init_tggcn(jax.random.PRNGKey(0), cfg)
    assert "human_frame_recognition_mlp" not in params  # no duplicate tensor

    rng = np.random.default_rng(1)
    b, t = 1, 4
    x_h = rng.normal(size=(b, t, 2, 2152)).astype(np.float32)
    x_o = rng.normal(size=(b, t, 2, 2048)).astype(np.float32)
    mask = np.ones((b, 2), np.float32)

    def loss(p):
        outputs, _ = apply_tggcn(p, cfg, x_h, x_o, mask,
                                 steps_per_example=np.full((b,), float(t), np.float32),
                                 rng=jax.random.PRNGKey(0))
        # Frame-level head output only (outputs[2] = y_hf_rec).
        return jnp.sum(outputs[2])

    grads = jax.grad(loss)(params)
    g = np.asarray(grads["human_recognition_mlp"]["layers"][0]["w"])
    assert np.abs(g).max() > 0  # frame-head gradient lands on the shared tensor


class TestFastSegmentScanEquivalence:
    """_segment_scan_fast must match _segment_scan for every covered config."""

    import pytest as _pytest

    @_pytest.mark.parametrize("style,with_dists,aggregation", [
        ("v1", False, "att"),
        ("v2", False, "att"),
        ("v3", False, "att"),
        ("v4", False, "att"),
        ("v3", True, "att"),   # distance-based attention
        ("v1", True, "att"),   # dists override the style entirely
        ("v2", False, "mp"),   # mean pooling
    ])
    def test_fast_matches_general(self, style, with_dists, aggregation):
        import jax.numpy as jnp

        from tggcn.models.tggcn import (
            _fast_segment_scan_applicable,
            _segment_scan,
            _segment_scan_fast,
        )

        cfg = TGGCNConfig(
            input_size=(2152, 2048), num_classes=(13, None), hidden_size=8,
            gcn_node=26, message_humans_to_human=True, message_human_to_objects=True,
            message_objects_to_human=True, message_objects_to_object=True,
            message_segment=True, message_type="v2", message_granularity="v1",
            message_aggregation=aggregation, attention_style=style,
            discrete_optimization_strategy="st",
            object_segment_update_strategy="ind", remat_segment_scan=False)
        assert _fast_segment_scan_applicable(cfg, with_dists)
        params = init_tggcn(jax.random.PRNGKey(3), cfg)

        rng = np.random.default_rng(5)
        b, t, nh, no, h = 2, 5, 2, 3, cfg.hidden_size
        f_h = params["human_segment_rnn_fcell"]["w_ih"].shape[0] - 2 * h
        f_o = params["object_segment_rnn_fcell"]["w_ih"].shape[0] - 2 * h
        x_hs = rng.normal(size=(b, t, nh, f_h)).astype(np.float32)
        x_os = rng.normal(size=(b, t, no, f_o)).astype(np.float32)
        u_h = (rng.uniform(size=(b, t, nh)) > 0.4).astype(np.float32)
        u_o = (rng.uniform(size=(b, t, no)) > 0.4).astype(np.float32)
        u_h[:, -1] = u_o[:, -1] = 1.0
        mask = np.ones((b, no), np.float32)
        mask[0, -1] = 0.0
        dists = None, None, None
        if with_dists:
            dists = tuple(
                rng.uniform(0.05, 2.0, size=(b, t, r, s)).astype(np.float32)
                for r, s in ((nh, nh), (nh, no), (no, no)))

        fast = _segment_scan_fast(params, cfg, jnp.asarray(x_hs), jnp.asarray(x_os),
                                  jnp.asarray(u_h), jnp.asarray(u_o),
                                  jnp.asarray(mask), *[
                                      jnp.asarray(d) if d is not None else None
                                      for d in dists])
        general = _segment_scan(params, cfg, jnp.asarray(x_hs), jnp.asarray(x_os),
                                jnp.asarray(u_h), jnp.asarray(u_o),
                                jnp.asarray(mask), *[
                                    jnp.asarray(d) if d is not None else None
                                    for d in dists])
        names = ["hx_hs", "hx_os", "att_fwd", "att_bwd"]
        for name, a, b_ in zip(names, fast, general):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=2e-5, atol=1e-6, err_msg=name)
