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
