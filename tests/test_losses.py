"""Loss primitives vs torch + bundle wiring + batch-padding invariance."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from tggcn.config import Config
from tggcn.train.losses import (
    binary_cross_entropy_loss,
    budget_loss,
    decide_num_main_losses,
    nll_loss,
    select_loss,
)
from tggcn.train.multi_task import apply_mtll, init_mtll, mtll_weights


class TestPrimitivesVsTorch:
    def test_nll_matches_torch(self):
        rng = np.random.default_rng(0)
        logits = rng.normal(size=(3, 5, 7, 2)).astype(np.float32)
        log_probs = np.log(np.exp(logits) / np.exp(logits).sum(1, keepdims=True))
        target = rng.integers(-1, 5, size=(3, 7, 2))
        expected = F.nll_loss(torch.from_numpy(log_probs), torch.from_numpy(target),
                              ignore_index=-1).item()
        got = float(nll_loss(jnp.asarray(log_probs), jnp.asarray(target)))
        assert abs(got - expected) < 1e-5

    def test_bce_matches_reference_formula(self):
        rng = np.random.default_rng(1)
        x = rng.uniform(0.01, 0.99, size=(2, 9)).astype(np.float32)
        t = rng.uniform(0, 1, size=(2, 9)).astype(np.float32)
        t[0, :3] = -1.0
        mask = (t != -1.0).astype(np.float32)
        expected = F.binary_cross_entropy(torch.from_numpy(x * mask),
                                          torch.from_numpy(t * mask)).item()
        expected *= x.size / mask.sum()
        got = float(binary_cross_entropy_loss(jnp.asarray(x), jnp.asarray(t)))
        assert abs(got - expected) < 1e-5

    def test_bce_all_masked_returns_zero(self):
        x = jnp.asarray(np.full((2, 4), 0.5, np.float32))
        t = jnp.asarray(np.full((2, 4), -1.0, np.float32))
        assert float(binary_cross_entropy_loss(x, t)) == 0.0

    def test_budget_loss(self):
        x = jnp.asarray(np.array([[0.5, 0.3, 0.2, 0.8]], np.float32))
        t = jnp.asarray(np.array([[1.0, 0.0, -1.0, -1.0]], np.float32))
        # mean(x * mask) * numel / nonmissing = (0.8/4) * 4/2 = 0.4
        assert abs(float(budget_loss(x, t)) - 0.4) < 1e-6

    def test_padding_invariance(self):
        """Loss values must not change when -1-padded rows are appended."""
        rng = np.random.default_rng(2)
        logits = rng.normal(size=(2, 5, 6, 1)).astype(np.float32)
        log_probs = np.log(np.exp(logits) / np.exp(logits).sum(1, keepdims=True))
        target = rng.integers(0, 5, size=(2, 6, 1))
        base_nll = float(nll_loss(jnp.asarray(log_probs), jnp.asarray(target)))
        pad_lp = np.concatenate([log_probs, np.zeros_like(log_probs[:1])], 0)
        pad_t = np.concatenate([target, np.full_like(target[:1], -1)], 0)
        assert abs(float(nll_loss(jnp.asarray(pad_lp), jnp.asarray(pad_t))) - base_nll) < 1e-6

        x = rng.uniform(0.05, 0.95, size=(2, 6)).astype(np.float32)
        t = rng.uniform(0, 1, size=(2, 6)).astype(np.float32)
        base_bce = float(binary_cross_entropy_loss(jnp.asarray(x), jnp.asarray(t)))
        pad_x = np.concatenate([x, np.zeros_like(x[:1])], 0)
        pad_tt = np.concatenate([t, np.full_like(t[:1], -1.0)], 0)
        assert abs(float(binary_cross_entropy_loss(jnp.asarray(pad_x), jnp.asarray(pad_tt)))
                   - base_bce) < 1e-5
        base_budget = float(budget_loss(jnp.asarray(x), jnp.asarray(t)))
        assert abs(float(budget_loss(jnp.asarray(pad_x), jnp.asarray(pad_tt)))
                   - base_budget) < 1e-5


class TestBundles:
    def _cfg(self, add_seg=False, pretrain=False, budget=False, fl=0.0):
        return Config({"misc": Config({
            "budget_loss": Config({"add": budget, "human_weight": 0.5, "object_weight": 0.25}),
            "segmentation_loss": Config({"add": add_seg, "pretrain": pretrain,
                                         "sigma": 4.0, "weight": 2.0}),
            "anticipation_loss_weight": 0.7,
            "first_level_loss_weight": fl,
        })})

    def test_cad120_stage1_weights(self):
        criterion, names = select_loss("2G-GCN", "multiple", "cad120", self._cfg())
        assert names == ["B_HS", "B_OS", "BCE_HS", "BCE_OS",
                         "NLL_SAR_F", "NLL_SAP_F", "NLL_OAR_F", "NLL_OAP_F",
                         "NLL_SAR", "NLL_SAP", "NLL_OAR", "NLL_OAP"]
        assert criterion.keywords["weight"] == [0.0, 0.0, 0.0, 0.0,
                                                0.0, 0.0, 0.0, 0.0,
                                                1.0, 0.7, 1.0, 0.7]

    def test_cad120_stage2_weights(self):
        criterion, _ = select_loss("2G-GCN", "multiple", "cad120",
                                   self._cfg(add_seg=True, budget=True, fl=0.3))
        assert criterion.keywords["weight"] == [0.5, 0.25, 2.0, 2.0,
                                                0.3, 0.3, 0.3, 0.3,
                                                1.0, 0.7, 1.0, 0.7]

    def test_mphoi_bundle(self):
        criterion, names = select_loss("2G-GCN", "multiple", "mphoi", self._cfg(add_seg=True))
        assert names == ["B_HS", "BCE_HS", "NLL_SAR_F", "NLL_SAP_F", "NLL_SAR", "NLL_SAP"]
        assert criterion.keywords["weight"] == [0.0, 2.0, 0.0, 0.0, 1.0, 0.7]

    def test_num_main_losses(self):
        assert decide_num_main_losses("2G-GCN", "cad120", {}) == 4
        assert decide_num_main_losses("2G-GCN", "mphoi", {}) == 2
        assert decide_num_main_losses(
            "2G-GCN", "cad120",
            {"segmentation_loss": {"add": True, "pretrain": True}}) == 10
        assert decide_num_main_losses(
            "2G-GCN", "mphoi",
            {"segmentation_loss": {"add": True, "pretrain": True}}) == 5
        assert decide_num_main_losses("cad120_baseline", "cad120", {}) is None


class TestMtll:
    def test_weighting_formulas(self):
        mtll = init_mtll(["softmax", "mse", "mae"], mask=[True, True, False])
        log_sds = jnp.asarray(np.array([0.5, -0.3, 0.1], np.float32))
        losses = [jnp.asarray(2.0), jnp.asarray(3.0), jnp.asarray(4.0)]
        out = apply_mtll(log_sds, mtll["loss_types"], mtll["mask"], losses)
        np.testing.assert_allclose(out[0], np.exp(-1.0) * 2.0 + 0.5, rtol=1e-6)
        np.testing.assert_allclose(out[1], 0.5 * np.exp(0.6) * 3.0 - 0.3, rtol=1e-6)
        np.testing.assert_allclose(out[2], 4.0)  # masked: untouched
        weights = mtll_weights(np.asarray(log_sds), mtll["loss_types"], mtll["mask"])
        assert weights[2] is None and abs(weights[0] - np.exp(-1.0)) < 1e-6
