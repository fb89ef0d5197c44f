"""Vectorised message passing vs per-sender/per-receiver loop oracles.

The oracles implement the reference's documented semantics
(vhoi/models.py:1667-1775) with explicit Python loops and tensor slicing;
the framework path must match for every configuration.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tggcn.nn.messages import (
    attention_weights,
    compute_message,
    distance_based_attention_weights,
    masked_softmax,
)
from tggcn.nn.mlp import apply_bilinear, apply_mlp, init_bilinear, init_mlp


def _oracle_attention(query, keys, keys_mask, style, params):
    """Loop oracle for compute_attention_weights (single receiver)."""
    scores = []
    for s in range(keys.shape[0]):
        key = keys[s]
        if style == "v1":
            scores.append(float(apply_mlp(params, jnp.concatenate([query, key]),
                                          activations=["relu"])[0]))
        elif style in {"v2", "v3"}:
            w = float(jnp.sum(query * key))
            if style == "v3":
                w /= math.sqrt(key.shape[-1])
            scores.append(w)
        else:
            scores.append(float(jax.nn.relu(apply_bilinear(params, query, key))[0]))
    scores = np.array(scores)
    scores = np.where(np.asarray(keys_mask).astype(bool), scores, -np.inf)
    exp = np.exp(scores - scores.max()) if np.isfinite(scores).any() else np.full_like(scores, np.nan)
    w = exp / exp.sum() if np.isfinite(scores).any() else exp
    return np.where(np.isnan(w), 0.0, w)


@pytest.mark.parametrize("style", ["v1", "v2", "v3", "v4"])
def test_attention_styles_match_oracle(style):
    rng = np.random.default_rng(0)
    f = 6
    r, s = 2, 4
    query = jnp.asarray(rng.normal(size=(1, r, f)).astype(np.float32))
    keys = jnp.asarray(rng.normal(size=(1, s, f)).astype(np.float32))
    mask = jnp.asarray(np.array([[1.0, 1.0, 0.0, 1.0]], dtype=np.float32))
    params = None
    if style == "v1":
        params = init_mlp(jax.random.PRNGKey(0), [2 * f, 1])
    elif style == "v4":
        params = init_bilinear(jax.random.PRNGKey(0), f, f, 1)
    got = attention_weights(query, keys, mask[:, None, :], style, params)
    for i in range(r):
        expected = _oracle_attention(query[0, i], keys[0], mask[0], style, params)
        np.testing.assert_allclose(got[0, i], expected, rtol=1e-5, atol=1e-6)


def test_masked_softmax_all_masked_row_is_zero():
    scores = jnp.asarray(np.random.default_rng(1).normal(size=(2, 3, 4)).astype(np.float32))
    mask = jnp.zeros((2, 3, 4)).at[0].set(1.0)
    w = masked_softmax(scores, mask)
    np.testing.assert_allclose(w[1], 0.0)
    np.testing.assert_allclose(w[0].sum(-1), 1.0, rtol=1e-6)


def test_distance_attention_matches_reference_semantics():
    dists = jnp.asarray(np.array([[[0.5, 0.0, 2.0, np.nan]]], dtype=np.float32))
    mask = jnp.asarray(np.array([[[1.0, 1.0, 1.0, 0.0]]], dtype=np.float32))
    w = np.asarray(distance_based_attention_weights(dists, mask))[0, 0]
    # Zero distance and masked sender excluded; NaN distance stays (matches
    # torch bool(nan)=True) but is masked by the sender mask here.
    assert w[1] == 0.0 and w[3] == 0.0
    inv = np.array([1 / (0.5 + 1e-7), 1 / (2.0 + 1e-7)])
    expected = np.exp(inv) / np.exp(inv).sum()
    np.testing.assert_allclose([w[0], w[2]], expected, rtol=1e-5)


def _loop_message(params, cfg, x_recv, h_recv, x_send, h_send, mask, exclude_self, dists):
    """Loop oracle reproducing the reference call structure for one (batch) row."""
    n, r = x_recv.shape[:2]
    out = np.zeros((n, r, params_out_dim(params, cfg)), dtype=np.float32)
    for b in range(n):
        for i in range(r):
            receiver = jnp.concatenate([x_recv[b, i], h_recv[b, i]])
            if exclude_self:
                idx = [j for j in range(x_send.shape[1]) if j != i]
            else:
                idx = list(range(x_send.shape[1]))
            senders = jnp.stack([jnp.concatenate([x_send[b, j], h_send[b, j]]) for j in idx])
            smask = np.asarray([mask[b, j] for j in idx], dtype=np.float32)
            if cfg["message_type"] == "v1":
                acc = 0.0
                for s_i in range(len(idx)):
                    pair = jnp.concatenate([receiver, senders[s_i]])
                    acc = acc + apply_mlp(params["g"], pair, activations=["relu"]) * smask[s_i]
                m = apply_mlp(params["f"], acc, activations=["relu"])
            else:
                msgs = []
                for s_i in range(len(idx)):
                    inp = senders[s_i] if cfg["message_granularity"] == "v1" else \
                        jnp.concatenate([receiver, senders[s_i]])
                    msgs.append(apply_mlp(params["msg"], inp, activations=["relu"]) * smask[s_i])
                msgs = jnp.stack(msgs)
                if cfg["message_aggregation"] == "mp":
                    m = msgs.sum(0) / max(smask.sum(), 1.0)
                else:
                    if dists is None:
                        w = _oracle_attention(receiver, senders, smask,
                                              cfg["attention_style"], params.get("att"))
                    else:
                        d = np.asarray([dists[b, i, j] for j in idx])
                        dm = d != 0
                        inv = 1.0 / (d + 1e-7)
                        inv = np.where(smask.astype(bool) & dm, inv, -np.inf)
                        e = np.exp(inv - np.nanmax(inv)) if np.isfinite(inv).any() else inv * np.nan
                        w = e / e.sum() if np.isfinite(inv).any() else np.full_like(inv, np.nan)
                        w = np.where(np.isnan(w), 0.0, w)
                    m = (jnp.asarray(w[:, None]) * msgs).sum(0)
            out[b, i] = np.asarray(m)
    return out


def params_out_dim(params, cfg):
    if cfg["message_type"] == "v1":
        return params["f"]["layers"][-1]["w"].shape[-1]
    return params["msg"]["layers"][-1]["w"].shape[-1]


@pytest.mark.parametrize("message_type,granularity,aggregation,style,exclude_self,use_dists", [
    ("v1", "v1", "att", "v3", False, False),
    ("v2", "v1", "mp", "v3", False, False),
    ("v2", "v1", "att", "v3", False, False),
    ("v2", "v2", "att", "v1", False, False),
    ("v2", "v1", "att", "v2", True, False),
    ("v2", "v2", "att", "v4", True, False),
    ("v2", "v1", "att", "v3", False, True),
])
def test_compute_message_matches_loop(message_type, granularity, aggregation, style,
                                      exclude_self, use_dists):
    rng = np.random.default_rng(2)
    n, r, s, h = 2, 3, 3, 5
    x_recv = jnp.asarray(rng.normal(size=(n, r, h)).astype(np.float32))
    h_recv = jnp.asarray(rng.normal(size=(n, r, h)).astype(np.float32))
    x_send = jnp.asarray(rng.normal(size=(n, s, h)).astype(np.float32))
    h_send = jnp.asarray(rng.normal(size=(n, s, h)).astype(np.float32))
    mask = jnp.asarray((rng.uniform(size=(n, s)) > 0.3).astype(np.float32))
    dists = None
    if use_dists:
        dists = jnp.asarray(rng.uniform(0.1, 2.0, size=(n, r, s)).astype(np.float32))

    keys = jax.random.split(jax.random.PRNGKey(3), 4)
    params = {}
    if message_type == "v1":
        params["g"] = init_mlp(keys[0], [4 * h, h])
        params["f"] = init_mlp(keys[1], [h, h])
    else:
        in_dim = 2 * h if granularity == "v1" else 4 * h
        params["msg"] = init_mlp(keys[0], [in_dim, h])
        if aggregation == "att":
            if style == "v1":
                params["att"] = init_mlp(keys[2], [4 * h, 1])
            elif style == "v4":
                params["att"] = init_bilinear(keys[2], 2 * h, 2 * h, 1)

    cfg = {"message_type": message_type, "message_granularity": granularity,
           "message_aggregation": aggregation, "attention_style": style}
    got, att = compute_message(
        params, x_recv, h_recv, x_send, h_send, mask,
        message_type=message_type, message_granularity=granularity,
        message_aggregation=aggregation, attention_style=style,
        exclude_self=exclude_self, distances=dists)
    expected = _loop_message(params, cfg, np.asarray(x_recv), np.asarray(h_recv),
                             np.asarray(x_send), np.asarray(h_send), np.asarray(mask),
                             exclude_self, np.asarray(dists) if dists is not None else None)
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)
    if aggregation == "att" and message_type != "v1":
        assert att is not None and att.shape == (n, r, s)
    else:
        # Relational and mean-pooling paths report no attention weights.
        assert att is None


def test_masked_softmax_fully_masked_row_is_deterministic_zero():
    """Regression: the old -inf + NaN-cleanup implementation produced
    nondeterministic garbage for fully masked rows under XLA fast-math
    (hit by h2h attention whenever there is a single human, i.e. CAD-120 /
    Bimanual shapes). The finite form must return exact zeros."""
    from tggcn.nn.messages import masked_softmax

    s = jnp.asarray(np.random.default_rng(0).normal(size=(4, 2, 3)).astype(np.float32))
    w = np.asarray(masked_softmax(s, jnp.zeros((4, 2, 3))))
    assert (w == 0.0).all()
    # Partially masked rows: plain softmax over the unmasked entries.
    mask = np.array([[[1.0, 0.0, 1.0]]] * 4, np.float32)[:, [0], :].repeat(2, 1)
    w = np.asarray(masked_softmax(s, jnp.asarray(mask)))
    ref = np.exp(np.asarray(s)[..., [0, 2]])
    ref = ref / ref.sum(-1, keepdims=True)
    np.testing.assert_allclose(w[..., [0, 2]], ref, rtol=1e-6)
    assert (w[..., 1] == 0.0).all()
