"""Numerical parity tests for the JAX nn core against torch equivalents.

torch is only a test dependency: we build small torch modules, copy their
weights into our parameter pytrees, and require matching outputs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from tggcn.nn.batchnorm import apply_batchnorm, init_batchnorm
from tggcn.nn.distributions import discrete_estimator, straight_through_estimator
from tggcn.nn.gru import apply_gru_cell, init_bigru, init_gru_cell, run_bigru, run_gru
from tggcn.nn.mlp import apply_bilinear, apply_linear, apply_mlp, init_linear, init_mlp
from tggcn.nn.temporal import (
    filter_soft_decisions,
    make_periodic_embedding,
    reorder_hidden_states,
)

torch.manual_seed(0)


def t2j(t):
    return jnp.asarray(t.detach().numpy())


class TestLinearMlp:
    def test_linear_matches_torch(self):
        lin = torch.nn.Linear(6, 4)
        params = {"w": t2j(lin.weight).T, "b": t2j(lin.bias)}
        x = np.random.default_rng(0).normal(size=(3, 6)).astype(np.float32)
        expected = lin(torch.from_numpy(x)).detach().numpy()
        np.testing.assert_allclose(apply_linear(params, jnp.asarray(x)), expected, rtol=1e-5, atol=1e-6)

    def test_init_distribution_bounds(self):
        params = init_linear(jax.random.PRNGKey(0), 100, 50)
        bound = 1 / np.sqrt(100)
        assert np.abs(params["w"]).max() <= bound
        assert np.abs(params["b"]).max() <= bound

    def test_mlp_activations(self):
        mlp = init_mlp(jax.random.PRNGKey(1), [5, 4, 3])
        x = jnp.ones((2, 5))
        y = apply_mlp(mlp, x, activations=["relu", {"name": "logsoftmax", "dim": -1}])
        np.testing.assert_allclose(np.exp(y).sum(-1), 1.0, rtol=1e-5)

    def test_bilinear_matches_torch(self):
        bil = torch.nn.Bilinear(5, 5, 1)
        params = {"w": t2j(bil.weight), "b": t2j(bil.bias)}
        rng = np.random.default_rng(1)
        x1 = rng.normal(size=(4, 5)).astype(np.float32)
        x2 = rng.normal(size=(4, 5)).astype(np.float32)
        expected = bil(torch.from_numpy(x1), torch.from_numpy(x2)).detach().numpy()
        got = apply_bilinear(params, jnp.asarray(x1), jnp.asarray(x2))
        np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


def torch_gru_cell_params(cell):
    params = {
        "w_ih": t2j(cell.weight_ih).T,
        "w_hh": t2j(cell.weight_hh).T,
    }
    if cell.bias_ih is not None:
        params["b_ih"] = t2j(cell.bias_ih)
        params["b_hh"] = t2j(cell.bias_hh)
    return params


class TestGru:
    def test_cell_matches_torch(self):
        cell = torch.nn.GRUCell(6, 8)
        params = torch_gru_cell_params(cell)
        rng = np.random.default_rng(2)
        x = rng.normal(size=(3, 6)).astype(np.float32)
        h = rng.normal(size=(3, 8)).astype(np.float32)
        expected = cell(torch.from_numpy(x), torch.from_numpy(h)).detach().numpy()
        got = apply_gru_cell(params, jnp.asarray(x), jnp.asarray(h))
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)

    def test_bigru_matches_torch(self):
        gru = torch.nn.GRU(6, 8, num_layers=1, batch_first=True, bidirectional=True)
        params = {
            "fwd": {
                "w_ih": t2j(gru.weight_ih_l0).T, "w_hh": t2j(gru.weight_hh_l0).T,
                "b_ih": t2j(gru.bias_ih_l0), "b_hh": t2j(gru.bias_hh_l0),
            },
            "bwd": {
                "w_ih": t2j(gru.weight_ih_l0_reverse).T, "w_hh": t2j(gru.weight_hh_l0_reverse).T,
                "b_ih": t2j(gru.bias_ih_l0_reverse), "b_hh": t2j(gru.bias_hh_l0_reverse),
            },
        }
        x = np.random.default_rng(3).normal(size=(2, 11, 6)).astype(np.float32)
        expected, _ = gru(torch.from_numpy(x))
        got = run_bigru(params, jnp.asarray(x))
        np.testing.assert_allclose(got, expected.detach().numpy(), rtol=1e-4, atol=1e-5)

    def test_run_gru_reverse_consistency(self):
        params = init_gru_cell(jax.random.PRNGKey(0), 4, 5)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 7, 4))
        fwd_flipped = run_gru(params, x[:, ::-1])[:, ::-1]
        bwd = run_gru(params, x, reverse=True)
        np.testing.assert_allclose(fwd_flipped, bwd, rtol=1e-5, atol=1e-6)


class TestBatchNorm:
    def test_matches_torch_train_and_eval(self):
        v, c = 5, 4
        bn_t = torch.nn.BatchNorm1d(c * v)
        bn_t.weight.data.uniform_(0.5, 1.5)
        bn_t.bias.data.uniform_(-0.5, 0.5)
        bn = init_batchnorm((v, c))
        # torch channel index is c * V + v  ->  reshape (C, V) then transpose.
        bn["params"]["scale"] = t2j(bn_t.weight).reshape(c, v).T
        bn["params"]["bias"] = t2j(bn_t.bias).reshape(c, v).T

        rng = np.random.default_rng(4)
        x = rng.normal(size=(3, c, v, 9)).astype(np.float32)  # torch layout (B, C, V, T)
        x_t = torch.from_numpy(x).reshape(3, c * v, 9)
        bn_t.train()
        expected = bn_t(x_t).reshape(3, c, v, 9).detach().numpy()
        x_j = jnp.transpose(jnp.asarray(x), (0, 3, 2, 1))  # (B, T, V, C)
        got, state = apply_batchnorm(bn, x_j, reduce_axes=(0, 1), train=True)
        np.testing.assert_allclose(np.transpose(got, (0, 3, 2, 1)), expected, rtol=1e-4, atol=1e-5)
        # Running stats must match too.
        np.testing.assert_allclose(
            state["mean"], t2j(bn_t.running_mean).reshape(c, v).T, rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(
            state["var"], t2j(bn_t.running_var).reshape(c, v).T, rtol=1e-4, atol=1e-5)
        # Eval mode.
        bn["state"] = state
        bn_t.eval()
        expected_eval = bn_t(x_t).reshape(3, c, v, 9).detach().numpy()
        got_eval, _ = apply_batchnorm(bn, x_j, reduce_axes=(0, 1), train=False)
        np.testing.assert_allclose(np.transpose(got_eval, (0, 3, 2, 1)), expected_eval,
                                   rtol=1e-4, atol=1e-5)


class TestDistributions:
    def test_ste_forward_and_gradient(self):
        x = jnp.array([0.2, 0.6, 0.5])
        hard = straight_through_estimator(x, threshold=0.5)
        np.testing.assert_allclose(hard, [0.0, 1.0, 0.0])
        grad = jax.grad(lambda v: straight_through_estimator(v, 0.5).sum())(x)
        np.testing.assert_allclose(grad, [1.0, 1.0, 1.0])

    def test_discrete_estimator_st(self):
        x = jnp.array([[0.3], [0.9]])
        hard, soft = discrete_estimator(x, strategy="st", threshold=0.5)
        np.testing.assert_allclose(hard, [[0.0], [1.0]])
        np.testing.assert_allclose(soft, x)

    def test_gumbel_sigmoid_statistics(self):
        key = jax.random.PRNGKey(0)
        p = jnp.full((4000, 1), 0.7)
        hard, soft = discrete_estimator(p, strategy="gs", threshold=0.5, key=key)
        assert 0.6 < float(hard.mean()) < 0.8
        assert jnp.all((soft > 0) & (soft < 1))


class TestTemporal:
    def test_filter_soft_decisions_matches_loop(self):
        rng = np.random.default_rng(5)
        u = rng.uniform(size=(3, 9, 2)).astype(np.float32)
        got = filter_soft_decisions(jnp.asarray(u), update_threshold=0.5)
        # Loop-based oracle per reference semantics (vhoi/models.py:1637-1664).
        expected = np.zeros_like(u)
        for b in range(3):
            for e in range(2):
                seq = u[b, :, e]
                for t in range(9):
                    prev = seq[t - 1] if t else 0.0
                    nxt = seq[t + 1] if t + 1 < 9 else 0.0
                    cond = seq[t] > prev and seq[t] > nxt and seq[t] >= 0.5
                    hard = float(seq[t] >= 0.5)
                    expected[b, t, e] = hard if cond else min(hard, 0.0)
        np.testing.assert_allclose(got, expected)

    def test_reorder_hidden_states_matches_loop(self):
        rng = np.random.default_rng(6)
        h = rng.normal(size=(2, 8, 3)).astype(np.float32)
        u = (rng.uniform(size=(2, 8)) > 0.6).astype(np.float32)
        got = reorder_hidden_states(jnp.asarray(h), jnp.asarray(u))
        expected = h.copy()
        for m in range(2):
            end_frames = [-1] + list(np.nonzero(u[m])[0])
            for start, end in zip(end_frames[:-1], end_frames[1:]):
                for t in range(start + 1, end):
                    expected[m, t] = h[m, end]
        np.testing.assert_allclose(got, expected)

    def test_periodic_embedding_matches_torch_formula(self):
        x = jnp.asarray(np.random.default_rng(7).normal(size=(4, 1)).astype(np.float32))
        emb = make_periodic_embedding(x, 8)
        w = 1e4 ** np.linspace(0, 1, 4, dtype=np.float32)
        np.testing.assert_allclose(emb[:, :4], np.sin(np.asarray(x) / w), rtol=1e-5)
        np.testing.assert_allclose(emb[:, 4:], np.cos(np.asarray(x) / w), rtol=1e-5)
        assert emb.shape == (4, 8)
