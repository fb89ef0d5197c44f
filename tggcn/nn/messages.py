"""Vectorised entity-to-entity message passing with attention.

This replaces the reference's per-sender / per-receiver Python loops
(vhoi/models.py:1667-1775 and the callers at :1004-1475) with batched einsums
over an explicit receiver x sender axis pair. All messages for all (batch,
time, receiver) triples are computed in a handful of MXU matmuls; receiver
self-exclusion (humans->human, objects->object) is an eye-mask on the
(R, S) plane instead of tensor slicing, which keeps shapes static for XLA.

Semantics preserved exactly:
  * relational ('v1'): f(sum_s g([receiver, sender]) * mask_s)
  * non-relational ('v2') with 'generic' (sender-only input) or 'specific'
    ([receiver, sender] input) granularity
  * aggregation by mean-pooling (masked, clamped denominator) or attention
    (styles v1 concat-MLP, v2 dot, v3 scaled dot, v4 bilinear+relu), with
    -inf masking, softmax over senders, and NaN->0 for fully-masked rows
  * distance-based attention: softmax over 1/(d + 1e-7) with both the
    sender mask and a zero-distance mask applied (vhoi/models.py:1757-1775)
"""

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from tggcn.nn.mlp import apply_bilinear, apply_mlp


def masked_softmax(scores: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Softmax over the last axis restricted to unmasked senders.

    Fully masked rows yield all-zero weights. Implemented with a finite
    big-negative fill, an explicit mask multiply and a clamped denominator
    rather than -inf + NaN cleanup: softmax over an all--inf row produces
    NaN via inf - inf, and XLA's fast-math exp lowering makes the "clean the
    NaN afterwards" pattern NONDETERMINISTIC on fully-masked rows (observed
    run-to-run garbage on CPU for single-human h2h attention). The finite
    form is exactly equal on partially-masked rows and deterministic-zero on
    empty rows (matching the reference's torch semantics either way).
    """
    maskf = jnp.broadcast_to(mask, scores.shape).astype(scores.dtype)
    scores = jnp.where(maskf > 0, scores, -1e30)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m) * maskf
    d = jnp.sum(e, axis=-1, keepdims=True)
    return e / jnp.maximum(d, 1e-30)


def attention_weights(query: jnp.ndarray, keys: jnp.ndarray, keys_mask: jnp.ndarray,
                      attention_style: str, attention_params: Optional[dict] = None) -> jnp.ndarray:
    """Attention weights (..., R, S) (reference compute_attention_weights, models.py:1721).

    query (..., R, F), keys (..., S, F), keys_mask broadcastable to (..., R, S).
    """
    if attention_style in {"v1", "concat"}:
        r, s = query.shape[-2], keys.shape[-2]
        q = jnp.broadcast_to(query[..., :, None, :], query.shape[:-2] + (r, s, query.shape[-1]))
        k = jnp.broadcast_to(keys[..., None, :, :], keys.shape[:-2] + (r, s, keys.shape[-1]))
        pairs = jnp.concatenate([q, k], axis=-1)
        scores = apply_mlp(attention_params, pairs, activations=["relu"])[..., 0]
    elif attention_style in {"v2", "dot-product", "v3", "scaled_dot-product"}:
        scores = jnp.einsum("...rf,...sf->...rs", query, keys)
        if attention_style in {"v3", "scaled_dot-product"}:
            scores = scores / math.sqrt(keys.shape[-1])
        else:
            # Unscaled dot ('v2'): the score einsum fusing straight into the
            # masked softmax SIGABRTs the TPU compiler (deterministic, every
            # v2 XLA-path program at golden-fixture shapes; v3 differs only
            # by the scalar division above and compiles clean — round-4
            # bisect, tools/minimize_mosaic_crash2.py). The barrier keeps
            # the einsum out of the softmax fusion; numerics are unchanged
            # and the barrier is identity under grad.
            scores = jax.lax.optimization_barrier(scores)
    else:  # v4 or general
        r, s = query.shape[-2], keys.shape[-2]
        q = jnp.broadcast_to(query[..., :, None, :], query.shape[:-2] + (r, s, query.shape[-1]))
        k = jnp.broadcast_to(keys[..., None, :, :], keys.shape[:-2] + (r, s, keys.shape[-1]))
        scores = jax.nn.relu(apply_bilinear(attention_params, q, k)[..., 0])
    return masked_softmax(scores, keys_mask)


def distance_based_attention_weights(distances: jnp.ndarray, senders_mask: jnp.ndarray) -> jnp.ndarray:
    """Inverse-distance attention (reference models.py:1757-1775).

    distances (..., R, S); zero distances and masked senders get -inf before
    the softmax; fully-masked rows yield zeros.
    """
    distance_mask = distances != 0  # NaN compares != 0 -> stays (matches torch .bool())
    inv = 1.0 / (distances + 1e-7)
    combined = senders_mask.astype(bool) & distance_mask
    return masked_softmax(inv, combined)


def _pairs(receivers: jnp.ndarray, senders: jnp.ndarray) -> jnp.ndarray:
    """Broadcasted [receiver, sender] concatenation -> (..., R, S, Fr+Fs)."""
    r, s = receivers.shape[-2], senders.shape[-2]
    q = jnp.broadcast_to(receivers[..., :, None, :],
                         receivers.shape[:-2] + (r, s, receivers.shape[-1]))
    k = jnp.broadcast_to(senders[..., None, :, :],
                         senders.shape[:-2] + (r, s, senders.shape[-1]))
    return jnp.concatenate([q, k], axis=-1)


def compute_message(
    params: dict,
    x_recv: jnp.ndarray, h_recv: jnp.ndarray,
    x_send: jnp.ndarray, h_send: jnp.ndarray,
    senders_mask: Optional[jnp.ndarray],
    *,
    message_type: str,
    message_granularity: str,
    message_aggregation: str,
    attention_style: str,
    exclude_self: bool = False,
    distances: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Frame-level messages: receiver/sender features are [x, h] concats.

    See compute_message_features for the core semantics.
    """
    receivers = jnp.concatenate([x_recv, h_recv], axis=-1)
    senders = jnp.concatenate([x_send, h_send], axis=-1)
    return compute_message_features(
        params, receivers, senders, senders_mask,
        message_type=message_type, message_granularity=message_granularity,
        message_aggregation=message_aggregation, attention_style=attention_style,
        exclude_self=exclude_self, distances=distances)


def compute_message_features(
    params: dict,
    receivers: jnp.ndarray,
    senders: jnp.ndarray,
    senders_mask: Optional[jnp.ndarray],
    *,
    message_type: str,
    message_granularity: str,
    message_aggregation: str,
    attention_style: str,
    exclude_self: bool = False,
    distances: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Compute messages from S senders to each of R receivers.

    Arguments:
        params - dict with keys depending on configuration: 'g'/'f' MLPs for
            relational messages, 'msg' MLP for non-relational, 'att' for
            attention (MLP for v1, bilinear for v4).
        receivers - (..., R, F) receiver features (frame level: [x, h] concat;
            segment level: the bare hidden state, reference models.py:1051-1097).
        senders - (..., S, F) sender features.
        senders_mask - (..., S) or (..., R, S) real/virtual mask, or None (all real).
        exclude_self - Mask out sender j for receiver j (requires R == S).
        distances - optional (..., R, S) distances for distance-based attention.
    Returns:
        (message (..., R, H_out), attention_weights (..., R, S) or None)
    """
    r, s = receivers.shape[-2], senders.shape[-2]
    if senders_mask is None:
        mask_rs = jnp.ones(receivers.shape[:-2] + (r, s), dtype=receivers.dtype)
    else:
        if senders_mask.ndim == receivers.ndim - 1:  # (..., S)
            senders_mask = senders_mask[..., None, :]
        mask_rs = jnp.broadcast_to(senders_mask, senders_mask.shape[:-2] + (r, s))
        mask_rs = mask_rs.astype(receivers.dtype)
    if exclude_self:
        if r != s:
            raise ValueError("exclude_self requires R == S")
        mask_rs = mask_rs * (1.0 - jnp.eye(r, dtype=mask_rs.dtype))

    if message_type in {"v1", "relational"}:
        pair_relations = apply_mlp(params["g"], _pairs(receivers, senders), activations=["relu"])
        pair_relations = pair_relations * mask_rs[..., None]
        message = apply_mlp(params["f"], jnp.sum(pair_relations, axis=-2), activations=["relu"])
        return message, None

    # Non-relational ('v2').
    if message_granularity in {"v1", "generic"}:
        msgs = apply_mlp(params["msg"], senders, activations=["relu"])       # (..., S, H)
        msgs = msgs[..., None, :, :] * mask_rs[..., None]                     # (..., R, S, H)
    else:  # 'v2' / specific
        msgs = apply_mlp(params["msg"], _pairs(receivers, senders), activations=["relu"])
        msgs = msgs * mask_rs[..., None]

    if message_aggregation in {"mp", "mean_pooling"}:
        num_real = jnp.clip(jnp.sum(mask_rs, axis=-1, keepdims=True), min=1.0)
        message = jnp.sum(msgs, axis=-2) / num_real
        return message, None

    # Attention aggregation.
    if distances is None:
        att = attention_weights(receivers, senders, mask_rs,
                                attention_style=attention_style,
                                attention_params=params.get("att"))
    else:
        att = distance_based_attention_weights(distances, mask_rs)
    message = jnp.sum(att[..., None] * msgs, axis=-2)
    return message, att
