"""Fused Pallas GRU-sequence kernel vs the XLA lax.scan implementation.

Runs in interpreter mode on the CPU test mesh; the same code path compiles
via Mosaic on TPU. Checks forward equivalence (both directions, stream
padding, carried h0) and full gradient equivalence through the custom VJP
(backward is also a Pallas kernel).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tggcn.nn.gru import init_bigru, run_multi_bigru
from tggcn.ops.gru_pallas import run_multi_bigru_pallas


@pytest.fixture(scope="module")
def setup():
    key = jax.random.PRNGKey(0)
    k1, k2, k3, kx = jax.random.split(key, 4)
    hidden = 6
    params = [init_bigru(k1, hidden, hidden), init_bigru(k2, hidden, hidden),
              init_bigru(k3, hidden, hidden)]
    b, t = 2, 7
    ents = (2, 3, 1)
    keys = jax.random.split(kx, 3)
    xs = [jax.random.normal(k, (b, t, e, hidden)) for k, e in zip(keys, ents)]
    return params, xs


def test_forward_matches_xla_scan(setup):
    params, xs = setup
    ref = run_multi_bigru(params, xs)
    out = run_multi_bigru_pallas(params, xs, interpret=True)
    for i, (a, b) in enumerate(zip(ref, out)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6,
                                   err_msg=f"stream {i}")


def test_forward_with_carried_h0(setup):
    params, xs = setup
    key = jax.random.PRNGKey(9)
    h0s = [jax.random.normal(jax.random.fold_in(key, i), x[:, 0, :, :6].shape)
           for i, x in enumerate(xs)]
    ref = run_multi_bigru(params, xs, h0_fwd_list=h0s)
    out = run_multi_bigru_pallas(params, xs, h0_fwd_list=h0s, interpret=True)
    for i, (a, b) in enumerate(zip(ref, out)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6,
                                   err_msg=f"stream {i}")


def test_gradients_match_xla_scan(setup):
    params, xs = setup
    cotangents = [jax.random.normal(jax.random.fold_in(jax.random.PRNGKey(3), i),
                                    (x.shape[0], x.shape[1], x.shape[2], 12))
                  for i, x in enumerate(xs)]

    def loss(fn, params, xs, **kw):
        outs = fn(params, xs, **kw)
        return sum(jnp.sum(o * c) for o, c in zip(outs, cotangents))

    ref_val, ref_grads = jax.value_and_grad(
        lambda p, x: loss(run_multi_bigru, p, x), argnums=(0, 1))(params, xs)
    ker_val, ker_grads = jax.value_and_grad(
        lambda p, x: loss(run_multi_bigru_pallas, p, x, interpret=True),
        argnums=(0, 1))(params, xs)

    np.testing.assert_allclose(float(ref_val), float(ker_val), rtol=1e-5)
    flat_ref, tree_ref = jax.tree_util.tree_flatten(ref_grads)
    flat_ker, tree_ker = jax.tree_util.tree_flatten(ker_grads)
    assert tree_ref == tree_ker
    for i, (a, b) in enumerate(zip(flat_ref, flat_ker)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5,
                                   err_msg=f"grad leaf {i}")


def test_model_flag_routes_through_kernel(monkeypatch, setup):
    """cfg.use_pallas_gru routes the frame BiGRUs through the kernel; on the
    CPU test backend we monkeypatch interpret mode on."""
    import tggcn.ops.gru_pallas as mod
    from tggcn.models.tggcn import TGGCNConfig, apply_tggcn, init_tggcn

    orig = mod.run_multi_bigru_pallas
    monkeypatch.setattr(mod, "run_multi_bigru_pallas",
                        lambda *a, **kw: orig(*a, **{**kw, "interpret": True}))
    kw = dict(input_size=(2152, 2048), num_classes=(13, None), hidden_size=8,
              gcn_node=26, message_segment=True, message_type="v2",
              message_granularity="v1", message_aggregation="att",
              attention_style="v3", discrete_optimization_strategy="st",
              object_segment_update_strategy="ind")
    cfg_ref = TGGCNConfig(**kw)
    cfg_ker = TGGCNConfig(use_pallas_gru=True, **kw)
    params = init_tggcn(jax.random.PRNGKey(0), cfg_ref)
    rng = np.random.default_rng(11)
    b, t = 1, 6
    x_human = rng.normal(size=(b, t, 2, 2152)).astype(np.float32)
    x_objects = rng.normal(size=(b, t, 3, 2048)).astype(np.float32)
    mask = np.ones((b, 3), np.float32)
    steps = np.full((b,), float(t), np.float32)
    out_ref, _ = apply_tggcn(params, cfg_ref, x_human, x_objects, mask,
                             steps_per_example=steps, rng=jax.random.PRNGKey(1))
    out_ker, _ = apply_tggcn(params, cfg_ker, x_human, x_objects, mask,
                             steps_per_example=steps, rng=jax.random.PRNGKey(1))
    for i, (a, b_) in enumerate(zip(out_ref, out_ker)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-5, err_msg=f"output {i}")
