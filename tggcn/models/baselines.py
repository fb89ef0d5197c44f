"""CAD120Baseline / BimanualBaseline — per-entity BiGRU + pooled messages.

Reference semantics: vhoi/models.py:15-175. Entity-shared BiGRUs run with the
entity axis folded into the batch axis (one scan, large matmuls); the
reference's per-entity RNN loop is not needed.
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from tggcn.nn.gru import init_bigru, run_bigru
from tggcn.nn.mlp import apply_mlp, init_mlp


@dataclass(frozen=True)
class BaselineConfig:
    input_size: tuple
    num_classes: tuple
    hidden_size: int = 128
    bidirectional: bool = True
    with_message_passing: bool = True
    bias: bool = True
    with_object_head: bool = False  # True for CAD120Baseline

    @classmethod
    def from_kwargs(cls, with_object_head=False, **kwargs):
        fields = cls.__dataclass_fields__
        clean = {k: v for k, v in kwargs.items() if k in fields}
        clean["input_size"] = tuple(clean["input_size"])
        clean["num_classes"] = tuple(clean["num_classes"])
        clean["with_object_head"] = with_object_head
        return cls(**clean)


def init_baseline(key, cfg: BaselineConfig) -> dict:
    human_in, object_in = cfg.input_size
    num_subactivities, num_affordances = cfg.num_classes
    h, bias = cfg.hidden_size, cfg.bias
    keys = iter(jax.random.split(key, 8))
    params = {
        "human_embedding_mlp": init_mlp(next(keys), [human_in, h], bias=bias),
        "object_embedding_mlp": init_mlp(next(keys), [object_in, h], bias=bias),
        "human_bd_rnn": init_bigru(next(keys), h, h, bias=bias),
        "object_bd_rnn": init_bigru(next(keys), h, h, bias=bias),
    }
    rec_in = h * (2 if cfg.with_message_passing else 1) * (2 if cfg.bidirectional else 1)
    params["human_recognition_mlp"] = init_mlp(next(keys), [rec_in, num_subactivities], bias=bias)
    if cfg.with_object_head:
        params["object_recognition_mlp"] = init_mlp(next(keys), [rec_in, num_affordances], bias=bias)
    return params


def _entity_bigru(params_rnn, x, bidirectional):
    b, t, e, f = x.shape
    x_f = jnp.transpose(x, (0, 2, 1, 3)).reshape(b * e, t, f)
    if bidirectional:
        h = run_bigru(params_rnn, x_f)
    else:
        from tggcn.nn.gru import run_gru
        h = run_gru(params_rnn["fwd"], x_f)
    return h.reshape(b, e, t, -1).transpose(0, 2, 1, 3)


def apply_baseline(params: dict, cfg: BaselineConfig,
                   x_human: jnp.ndarray, x_objects: jnp.ndarray, objects_mask: jnp.ndarray,
                   train: bool = False, rng=None):
    """Forward; returns the reference's output list ([y_human] or [y_human, y_object])."""
    x_h = apply_mlp(params["human_embedding_mlp"], x_human, activations=["relu"])
    x_o = apply_mlp(params["object_embedding_mlp"], x_objects, activations=["relu"])
    hx_hfr = _entity_bigru(params["human_bd_rnn"], x_h, cfg.bidirectional)
    hx_ofr = _entity_bigru(params["object_bd_rnn"], x_o, cfg.bidirectional)

    num_humans = x_human.shape[2]
    num_objects = x_objects.shape[2]
    if cfg.with_message_passing:
        mask = objects_mask[:, None, :, None]
        hx_ofm = jnp.sum(hx_ofr * mask, axis=2, keepdims=True)
        num_real = jnp.clip(jnp.sum(mask, axis=2, keepdims=True), min=1.0)
        hx_ofm = hx_ofm / num_real
        hx_h = jnp.concatenate([hx_hfr, jnp.broadcast_to(
            hx_ofm, hx_ofm.shape[:2] + (num_humans,) + hx_ofm.shape[3:])], axis=-1)
    else:
        hx_h = hx_hfr
    y_h = apply_mlp(params["human_recognition_mlp"], hx_h,
                    activations=[{"name": "logsoftmax", "dim": -1}])
    y_h = jnp.transpose(y_h, (0, 3, 1, 2))
    if not cfg.with_object_head:
        return [y_h]

    if cfg.with_message_passing:
        hx_hfm = jnp.sum(hx_hfr, axis=2, keepdims=True)
        hx_o = jnp.concatenate([hx_ofr, jnp.broadcast_to(
            hx_hfm, hx_hfm.shape[:2] + (num_objects,) + hx_hfm.shape[3:])], axis=-1)
    else:
        hx_o = hx_ofr
    y_o = apply_mlp(params["object_recognition_mlp"], hx_o,
                    activations=[{"name": "logsoftmax", "dim": -1}])
    y_o = jnp.transpose(y_o, (0, 3, 1, 2))
    return [y_h, y_o]
