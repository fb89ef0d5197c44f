"""Fused Pallas segment-scan kernel vs the XLA fast path.

Interpreter mode on CPU; same code path compiles via Mosaic on TPU. The
custom VJP's backward IS the XLA fast path's vjp, so gradient equality is
exact by construction — the tests pin the forward kernel math (messages,
masked attention softmax incl. fully-masked rows, gated 2-cell update,
carried states, both directions) and the model-level routing.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tggcn.models.tggcn import TGGCNConfig, _segment_scan_fast, init_tggcn
from tggcn.ops import segment_scan_pallas as ssp


def _cfg(num_humans=2, **kw):
    base = dict(input_size=(2152, 2048), num_classes=(13, None), hidden_size=8,
                gcn_node=26, message_humans_to_human=True,
                message_objects_to_human=True, message_human_to_objects=True,
                message_objects_to_object=True, message_geometry_to_objects=True,
                message_segment=True, message_type="v2", message_granularity="v1",
                message_aggregation="att", attention_style="v3",
                discrete_optimization_strategy="st",
                object_segment_update_strategy="ind")
    base.update(kw)
    return TGGCNConfig(**base)


def _seg_inputs(cfg, b=2, t=6, num_humans=2, num_objects=3, seed=0):
    from tggcn.models.tggcn import _human_segment_input_size, _object_segment_input_size

    rng = np.random.default_rng(seed)
    # The precomputed segment input excludes the two segment-message slots
    # (those rows of w_ih are applied to the in-step messages).
    base_h = _human_segment_input_size(cfg) - 2 * cfg.hidden_size
    base_o = _object_segment_input_size(cfg) - 2 * cfg.hidden_size
    x_hs = rng.normal(size=(b, t, num_humans, base_h)).astype(np.float32)
    x_os = rng.normal(size=(b, t, num_objects, base_o)).astype(np.float32)
    u_h = (rng.uniform(size=(b, t, num_humans)) > 0.5).astype(np.float32)
    u_o = (rng.uniform(size=(b, t, num_objects)) > 0.5).astype(np.float32)
    mask = np.ones((b, num_objects), np.float32)
    mask[0, -1] = 0.0  # partial object mask exercises the masked softmax
    return x_hs, x_os, u_h, u_o, mask


@pytest.mark.parametrize("num_humans,style", [(2, "v3"), (1, "v2"),
                                              (2, "v1"), (2, "v4")])
def test_forward_matches_xla_fast_path(num_humans, style):
    cfg = _cfg(num_humans=num_humans, attention_style=style)
    params = init_tggcn(jax.random.PRNGKey(0), cfg)
    x_hs, x_os, u_h, u_o, mask = _seg_inputs(cfg, num_humans=num_humans)
    ref = _segment_scan_fast(params, cfg, x_hs, x_os, u_h, u_o, mask,
                             None, None, None)
    out = ssp.run_segment_scan_pallas(params, cfg, x_hs, x_os, u_h, u_o, mask,
                                      interpret=True)
    for i, (a, b_) in enumerate(zip(ref, out)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-5, atol=1e-6, err_msg=f"output {i}")


@pytest.mark.parametrize("agg", ["att", "mp"])
def test_forward_ext_mode_matches_xla_fast_path(agg):
    """'ext' mode: distance-based attention (all three tensors) and mean
    pooling stream state-independent weights into the kernel."""
    cfg = _cfg(message_aggregation=agg)
    params = init_tggcn(jax.random.PRNGKey(3), cfg)
    x_hs, x_os, u_h, u_o, mask = _seg_inputs(cfg, seed=21)
    b, t, nh = u_h.shape
    no = u_o.shape[2]
    if agg == "att":
        rng = np.random.default_rng(31)
        dists3 = (rng.uniform(0.05, 2.0, (b, t, nh, nh)).astype(np.float32),
                  rng.uniform(0.05, 2.0, (b, t, nh, no)).astype(np.float32),
                  rng.uniform(0.05, 2.0, (b, t, no, no)).astype(np.float32))
    else:
        dists3 = (None, None, None)
    assert ssp.pallas_segment_mode(cfg, dists3) == "ext"
    ref = _segment_scan_fast(params, cfg, x_hs, x_os, u_h, u_o, mask,
                             *dists3)
    out = ssp.run_segment_scan_pallas(params, cfg, x_hs, x_os, u_h, u_o, mask,
                                      interpret=True, dists3=dists3)
    for i, (a, b_) in enumerate(zip(ref, out)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-5, atol=1e-6, err_msg=f"output {i}")


@pytest.mark.parametrize("style", ["v1", "v4"])
def test_gradients_v1_v4_match_xla(style):
    """Widened-mode custom VJP (XLA recompute): gradients through the
    in-kernel v1/v4 scores, incl. the attention parameters."""
    cfg = _cfg(attention_style=style)
    params = init_tggcn(jax.random.PRNGKey(6), cfg)
    x_hs, x_os, u_h, u_o, mask = _seg_inputs(cfg, seed=17)
    seg_params = {k: params[k] for k in ssp.SEG_PARAM_KEYS}
    h0_h = jnp.zeros((2, 2, cfg.hidden_size))
    h0_o = jnp.zeros((2, 3, cfg.hidden_size))

    def loss_pallas(sp, xh):
        out = ssp.segment_scan_fast_pallas(cfg, True, sp, xh, x_os, u_h, u_o,
                                           mask, h0_h, h0_o)
        return jnp.sum(out[0] ** 2) + jnp.sum(out[1] ** 2)

    def loss_xla(sp, xh):
        out = _segment_scan_fast(sp, cfg, xh, x_os, u_h, u_o, mask,
                                 None, None, None, seg_carry=(h0_h, h0_o))
        return jnp.sum(out[0] ** 2) + jnp.sum(out[1] ** 2)

    args = (seg_params, jnp.asarray(x_hs))
    vp, gp = jax.value_and_grad(loss_pallas, argnums=(0, 1))(*args)
    vx, gx = jax.value_and_grad(loss_xla, argnums=(0, 1))(*args)
    np.testing.assert_allclose(float(vp), float(vx), rtol=1e-5)
    for a, b_ in zip(jax.tree_util.tree_leaves(gp), jax.tree_util.tree_leaves(gx)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=1e-6)


def test_gradients_dist_mode_match_xla():
    """'ext' mode VJP covers the distance tensors too."""
    cfg = _cfg()
    params = init_tggcn(jax.random.PRNGKey(8), cfg)
    x_hs, x_os, u_h, u_o, mask = _seg_inputs(cfg, seed=23)
    b, t, nh = u_h.shape
    no = u_o.shape[2]
    rng = np.random.default_rng(41)
    dists3 = tuple(jnp.asarray(rng.uniform(0.05, 2.0, s).astype(np.float32))
                   for s in [(b, t, nh, nh), (b, t, nh, no), (b, t, no, no)])
    seg_params = {k: params[k] for k in ssp.SEG_PARAM_KEYS}
    h0_h = jnp.zeros((b, nh, cfg.hidden_size))
    h0_o = jnp.zeros((b, no, cfg.hidden_size))

    def loss_pallas(sp, d3):
        out = ssp.segment_scan_fast_pallas(cfg, True, sp, x_hs, x_os, u_h,
                                           u_o, mask, h0_h, h0_o, d3)
        return jnp.sum(out[0] ** 2) + jnp.sum(out[1] ** 2)

    def loss_xla(sp, d3):
        out = _segment_scan_fast(sp, cfg, x_hs, x_os, u_h, u_o, mask,
                                 *d3, seg_carry=(h0_h, h0_o))
        return jnp.sum(out[0] ** 2) + jnp.sum(out[1] ** 2)

    vp, gp = jax.value_and_grad(loss_pallas, argnums=(0, 1))(seg_params, dists3)
    vx, gx = jax.value_and_grad(loss_xla, argnums=(0, 1))(seg_params, dists3)
    np.testing.assert_allclose(float(vp), float(vx), rtol=1e-5)
    for a, b_ in zip(jax.tree_util.tree_leaves(gp), jax.tree_util.tree_leaves(gx)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=1e-6)


def test_forward_with_carried_states():
    cfg = _cfg()
    params = init_tggcn(jax.random.PRNGKey(1), cfg)
    x_hs, x_os, u_h, u_o, mask = _seg_inputs(cfg, seed=3)
    k = jax.random.PRNGKey(7)
    h0_h = jax.random.normal(k, (2, 2, cfg.hidden_size))
    h0_o = jax.random.normal(jax.random.fold_in(k, 1), (2, 3, cfg.hidden_size))
    ref = _segment_scan_fast(params, cfg, x_hs, x_os, u_h, u_o, mask,
                             None, None, None, seg_carry=(h0_h, h0_o))
    out = ssp.run_segment_scan_pallas(params, cfg, x_hs, x_os, u_h, u_o, mask,
                                      seg_carry=(h0_h, h0_o), interpret=True)
    for i, (a, b_) in enumerate(zip(ref, out)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-5, atol=1e-6, err_msg=f"output {i}")


def test_gradients_flow_through_custom_vjp():
    cfg = _cfg()
    params = init_tggcn(jax.random.PRNGKey(2), cfg)
    x_hs, x_os, u_h, u_o, mask = _seg_inputs(cfg, seed=5)
    seg_params = {k: params[k] for k in ssp.SEG_PARAM_KEYS}
    h0_h = jnp.zeros((2, 2, cfg.hidden_size))
    h0_o = jnp.zeros((2, 3, cfg.hidden_size))

    def loss_pallas(sp, xh, xo, uh, uo):
        out = ssp.segment_scan_fast_pallas(cfg, True, sp, xh, xo, uh, uo,
                                           mask, h0_h, h0_o)
        return jnp.sum(out[0] ** 2) + jnp.sum(out[1] ** 2)

    def loss_xla(sp, xh, xo, uh, uo):
        out = _segment_scan_fast(sp, cfg, xh, xo, uh, uo, mask,
                                 None, None, None, seg_carry=(h0_h, h0_o))
        return jnp.sum(out[0] ** 2) + jnp.sum(out[1] ** 2)

    args = (seg_params, jnp.asarray(x_hs), jnp.asarray(x_os),
            jnp.asarray(u_h), jnp.asarray(u_o))
    vp, gp = jax.value_and_grad(loss_pallas, argnums=(0, 1, 3))(*args)
    vx, gx = jax.value_and_grad(loss_xla, argnums=(0, 1, 3))(*args)
    np.testing.assert_allclose(float(vp), float(vx), rtol=1e-5)
    for a, b_ in zip(jax.tree_util.tree_leaves(gp), jax.tree_util.tree_leaves(gx)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=1e-6)


def test_model_flag_routes_through_kernel(monkeypatch):
    """cfg.use_pallas_segment_scan routes the segment level through the
    kernel; outputs must match the default path."""
    from tggcn.models.tggcn import apply_tggcn

    orig = ssp.run_segment_scan_pallas
    monkeypatch.setattr(ssp, "run_segment_scan_pallas",
                        lambda *a, **kw: orig(*a, **{**kw, "interpret": True}))
    cfg_ref = _cfg()
    cfg_ker = _cfg(use_pallas_segment_scan=True)
    params = init_tggcn(jax.random.PRNGKey(0), cfg_ref)
    rng = np.random.default_rng(11)
    b, t = 1, 6
    x_human = rng.normal(size=(b, t, 2, 2152)).astype(np.float32)
    x_objects = rng.normal(size=(b, t, 3, 2048)).astype(np.float32)
    mask = np.ones((b, 3), np.float32)
    steps = np.full((b,), float(t), np.float32)
    out_ref, aux_ref = apply_tggcn(params, cfg_ref, x_human, x_objects, mask,
                                   steps_per_example=steps,
                                   rng=jax.random.PRNGKey(1), inspect_model=True)
    out_ker, aux_ker = apply_tggcn(params, cfg_ker, x_human, x_objects, mask,
                                   steps_per_example=steps,
                                   rng=jax.random.PRNGKey(1), inspect_model=True)
    for i, (a, b_) in enumerate(zip(out_ref, out_ker)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-5, err_msg=f"output {i}")
    for i, (a, b_) in enumerate(zip(aux_ref["attention_scores"],
                                    aux_ker["attention_scores"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-5, err_msg=f"att {i}")


def test_kernel_vjp_gradients_match_xla():
    """The hand-written Pallas backward (vjp_mode='kernel': reverse-time
    sweep in VMEM, weight grads reduced outside) must reproduce the XLA fast
    path's gradients for every input: weights, x, u (the STE path), the
    object mask slot, and the carried states."""
    cfg = _cfg()
    params = init_tggcn(jax.random.PRNGKey(4), cfg)
    x_hs, x_os, u_h, u_o, mask = _seg_inputs(cfg, seed=9)
    k = jax.random.PRNGKey(13)
    h0_h = jax.random.normal(k, (2, 2, cfg.hidden_size))
    h0_o = jax.random.normal(jax.random.fold_in(k, 1), (2, 3, cfg.hidden_size))
    seg_params = {k_: params[k_] for k_ in ssp.SEG_PARAM_KEYS}
    cot = [jax.random.normal(jax.random.fold_in(k, i), s) for i, s in
           enumerate([(2, 6, 2, 16), (2, 6, 3, 16), (2, 6, 2, 3), (2, 6, 2, 3)])]

    def loss(fn_kwargs, sp, xh, xo, uh, uo, hh, ho):
        out = ssp.run_segment_scan_pallas(
            {**params, **sp}, cfg, xh, xo, uh, uo, mask,
            seg_carry=(hh, ho), interpret=True, **fn_kwargs)
        return sum(jnp.sum(o * c) for o, c in zip(out, cot))

    args = (seg_params, jnp.asarray(x_hs), jnp.asarray(x_os),
            jnp.asarray(u_h), jnp.asarray(u_o), h0_h, h0_o)
    vk, gk = jax.value_and_grad(
        lambda *a: loss({"vjp_mode": "kernel"}, *a),
        argnums=tuple(range(7)))(*args)
    vx, gx = jax.value_and_grad(
        lambda *a: loss({"vjp_mode": "xla"}, *a),
        argnums=tuple(range(7)))(*args)
    np.testing.assert_allclose(float(vk), float(vx), rtol=1e-5)
    leaves_k = jax.tree_util.tree_leaves(gk)
    leaves_x = jax.tree_util.tree_leaves(gx)
    assert len(leaves_k) == len(leaves_x)
    for i, (a, b_) in enumerate(zip(leaves_k, leaves_x)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=5e-4, atol=1e-5,
                                   err_msg=f"grad leaf {i}")


def test_kernel_vjp_single_human_and_masked_objects():
    """Kernel VJP with a fully-masked h2h attention row (H=1) and a masked
    object — the zero-weight rows must contribute exactly zero gradient."""
    cfg = _cfg(num_humans=1)
    params = init_tggcn(jax.random.PRNGKey(5), cfg)
    x_hs, x_os, u_h, u_o, mask = _seg_inputs(cfg, num_humans=1, seed=10)

    def loss(mode, xh):
        out = ssp.run_segment_scan_pallas(params, cfg, xh, x_os, u_h, u_o,
                                          mask, interpret=True, vjp_mode=mode)
        return jnp.sum(out[0] ** 2) + jnp.sum(out[1] ** 2)

    xh = jnp.asarray(x_hs)
    vk, gk = jax.value_and_grad(lambda a: loss("kernel", a))(xh)
    vx, gx = jax.value_and_grad(lambda a: loss("xla", a))(xh)
    np.testing.assert_allclose(float(vk), float(vx), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gx),
                               rtol=5e-4, atol=1e-5)
