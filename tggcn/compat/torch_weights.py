"""Reference-checkpoint migration: torch state_dict -> tggcn parameter pytrees.

Lets users of the reference load their trained 2G-GCN checkpoints
(``<run_dir>/<basename>.tar`` saved by reference train.py:60-62) into this
framework. The input is a flat ``{name: numpy array}`` dict using the
reference's module names (vhoi/models.py:178-580); the output is the pytree
produced by tggcn.models.init_tggcn / init_baseline.

Also the backbone of the golden-parity test suite: fixtures store reference
weights under torch names, and tests convert + compare forward outputs.
"""

from typing import Dict

import jax.numpy as jnp
import numpy as np

from tggcn.models.tggcn import TGGCNConfig


def _linear(sd, name):
    layer = {"w": jnp.asarray(np.asarray(sd[f"{name}.weight"]).T)}
    if f"{name}.bias" in sd:
        layer["b"] = jnp.asarray(np.asarray(sd[f"{name}.bias"]))
    return layer


def _mlp(sd, name):
    """Sequential of Linear+activation: Linear modules sit at even indices."""
    layers = []
    idx = 0
    while f"{name}.{idx}.weight" in sd:
        layers.append(_linear(sd, f"{name}.{idx}"))
        idx += 2
    if not layers:
        raise KeyError(f"No linear layers found for MLP {name}")
    return {"layers": layers}


def _gru_cell(sd, name):
    params = {
        "w_ih": jnp.asarray(np.asarray(sd[f"{name}.weight_ih"]).T),
        "w_hh": jnp.asarray(np.asarray(sd[f"{name}.weight_hh"]).T),
    }
    if f"{name}.bias_ih" in sd:
        params["b_ih"] = jnp.asarray(np.asarray(sd[f"{name}.bias_ih"]))
        params["b_hh"] = jnp.asarray(np.asarray(sd[f"{name}.bias_hh"]))
    return params


def _bigru(sd, name):
    def direction(suffix):
        params = {
            "w_ih": jnp.asarray(np.asarray(sd[f"{name}.weight_ih_l0{suffix}"]).T),
            "w_hh": jnp.asarray(np.asarray(sd[f"{name}.weight_hh_l0{suffix}"]).T),
        }
        if f"{name}.bias_ih_l0{suffix}" in sd:
            params["b_ih"] = jnp.asarray(np.asarray(sd[f"{name}.bias_ih_l0{suffix}"]))
            params["b_hh"] = jnp.asarray(np.asarray(sd[f"{name}.bias_hh_l0{suffix}"]))
        return params

    return {"fwd": direction(""), "bwd": direction("_reverse")}


def _bilinear(sd, name):
    params = {"w": jnp.asarray(np.asarray(sd[f"{name}.weight"]))}
    if f"{name}.bias" in sd:
        params["b"] = jnp.asarray(np.asarray(sd[f"{name}.bias"]))
    return params


def _conv1x1(sd, name):
    w = np.asarray(sd[f"{name}.weight"])[:, :, 0, 0]  # (out, in)
    layer = {"w": jnp.asarray(w.T)}
    if f"{name}.bias" in sd:
        layer["b"] = jnp.asarray(np.asarray(sd[f"{name}.bias"]))
    return layer


def _geo_gcn(sd, cfg: TGGCNConfig):
    v = cfg.gcn_node
    prefix = "geometry_embedding_gcn"
    bn_w = np.asarray(sd[f"{prefix}.joint_embed.cnn.0.bn.weight"]).reshape(4, v).T
    bn_b = np.asarray(sd[f"{prefix}.joint_embed.cnn.0.bn.bias"]).reshape(4, v).T
    bn_mean = np.asarray(sd[f"{prefix}.joint_embed.cnn.0.bn.running_mean"]).reshape(4, v).T
    bn_var = np.asarray(sd[f"{prefix}.joint_embed.cnn.0.bn.running_var"]).reshape(4, v).T
    return {
        "bn": {
            "params": {"scale": jnp.asarray(bn_w), "bias": jnp.asarray(bn_b)},
            "state": {"mean": jnp.asarray(bn_mean), "var": jnp.asarray(bn_var)},
        },
        "embed1": _conv1x1(sd, f"{prefix}.joint_embed.cnn.1.cnn"),
        "embed2": _conv1x1(sd, f"{prefix}.joint_embed.cnn.3.cnn"),
        "s1": _conv1x1(sd, f"{prefix}.get_s.s1.cnn"),
        "s2": _conv1x1(sd, f"{prefix}.get_s.s2.cnn"),
        "weight": jnp.asarray(np.asarray(sd[f"{prefix}.weight"])),
    }


# Reference message-module name stems per edge type. The frame/segment MLP
# naming in the reference is irregular (e.g. relational o2h modules are
# called human_object_*); this table is the single source of truth.
_EDGE_NAMES = {
    "h2h": {
        "rel": "human_human", "msg": "humans_to_human_message_mlp",
        "att": "humans_to_human_message_att_mlp",
        "seg_msg": "humans_to_human_segment_message_mlp",
        "seg_att": "humans_to_human_segment_message_att_mlp",
    },
    "h2o": {
        "rel": "object_human", "msg": "human_to_object_message_mlp",
        "att": "humans_to_object_message_att_mlp",
        "seg_msg": "human_to_object_segment_message_mlp",
        "seg_att": "humans_to_object_segment_message_att_mlp",
    },
    "o2h": {
        "rel": "human_object", "msg": "objects_to_human_message_mlp",
        "att": "objects_to_human_message_att_mlp",
        "seg_msg": "objects_to_human_segment_message_mlp",
        "seg_att": "objects_to_human_segment_message_att_mlp",
    },
    "o2o": {
        "rel": "object_object", "msg": "objects_to_object_message_mlp",
        "att": "objects_to_object_message_att_mlp",
        "seg_msg": "objects_to_object_segment_message_mlp",
        "seg_att": "objects_to_object_segment_message_att_mlp",
    },
    "s2h": {
        "rel": "human_geometry", "msg": "geometry_to_human_message_mlp",
        "att": "geometry_to_human_message_att_mlp",
        "seg_msg": "geometry_to_human_segment_message_mlp",
        "seg_att": "geometry_to_human_segment_message_att_mlp",
    },
    "s2o": {
        "rel": "object_geometry", "msg": "geometry_to_object_message_mlp",
        "att": "geometry_to_object_message_att_mlp",
        "seg_msg": "geometry_to_object_segment_message_mlp",
        "seg_att": "geometry_to_object_segment_message_att_mlp",
    },
}


def _edge_params(sd, cfg: TGGCNConfig, edge: str):
    names = _EDGE_NAMES[edge]
    out = {}
    if cfg.relational:
        frame = {
            "g": _mlp(sd, f"{names['rel']}_pairwise_relation_mlp"),
            "f": _mlp(sd, f"{names['rel']}_full_relation_mlp"),
        }
        out["frame"] = frame
        if cfg.message_segment and f"{names['rel']}_segment_pairwise_relation_mlp.0.weight" in sd:
            out["segment"] = {
                "g": _mlp(sd, f"{names['rel']}_segment_pairwise_relation_mlp"),
                "f": _mlp(sd, f"{names['rel']}_segment_full_relation_mlp"),
            }
        return out
    frame = {"msg": _mlp(sd, names["msg"])}
    if cfg.attention:
        if cfg.attention_style in {"v4", "general"}:
            frame["att"] = _bilinear(sd, names["att"])
        elif f"{names['att']}.0.weight" in sd:
            frame["att"] = _mlp(sd, names["att"])
    out["frame"] = frame
    if cfg.message_segment and f"{names['seg_msg']}.0.weight" in sd:
        segment = {"msg": _mlp(sd, names["seg_msg"])}
        if cfg.attention:
            if cfg.attention_style in {"v4", "general"}:
                segment["att"] = _bilinear(sd, names["seg_att"])
            elif f"{names['seg_att']}.0.weight" in sd:
                segment["att"] = _mlp(sd, names["seg_att"])
        out["segment"] = segment
    return out


def tggcn_params_from_torch_state_dict(sd: Dict[str, np.ndarray], cfg: TGGCNConfig) -> dict:
    """Convert a reference TGGCN state_dict into an init_tggcn-shaped pytree."""
    params = {
        "geometry_embedding_gcn": _geo_gcn(sd, cfg),
        "geometry_embedding_mlp": _mlp(sd, "geometry_embedding_mlp"),
        "geometry_bd_rnn": _bigru(sd, "geometry_bd_rnn"),
        "geometry_bd_embedding_mlp": _mlp(sd, "geometry_bd_embedding_mlp"),
        "human_embedding_mlp": _mlp(sd, "human_embedding_mlp"),
        "human_bd_rnn": _bigru(sd, "human_bd_rnn"),
        "human_bd_embedding_mlp": _mlp(sd, "human_bd_embedding_mlp"),
        "human_segment_rnn_fcell": _gru_cell(sd, "human_segment_rnn_fcell"),
        "human_segment_rnn_bcell": _gru_cell(sd, "human_segment_rnn_bcell"),
        "object_embedding_mlp": _mlp(sd, "object_embedding_mlp"),
        "object_bd_rnn": _bigru(sd, "object_bd_rnn"),
        "object_bd_embedding_mlp": _mlp(sd, "object_bd_embedding_mlp"),
        "object_segment_rnn_fcell": _gru_cell(sd, "object_segment_rnn_fcell"),
        "object_segment_rnn_bcell": _gru_cell(sd, "object_segment_rnn_bcell"),
        "update_human_segment_mlp": _mlp(sd, "update_human_segment_mlp"),
    }
    if "update_object_segment_mlp.0.weight" in sd:
        params["update_object_segment_mlp"] = _mlp(sd, "update_object_segment_mlp")
    for flag, edge in [
        (cfg.message_humans_to_human, "h2h"),
        (cfg.message_human_to_objects, "h2o"),
        (cfg.message_objects_to_human, "o2h"),
        (cfg.message_objects_to_object, "o2o"),
        (cfg.message_geometry_to_human, "s2h"),
        (cfg.message_geometry_to_objects, "s2o"),
    ]:
        if flag:
            params[edge] = _edge_params(sd, cfg, edge)
    for head in ["human_recognition_mlp", "human_prediction_mlp",
                 "object_recognition_mlp", "object_prediction_mlp",
                 "human_frame_recognition_mlp", "human_frame_prediction_mlp",
                 "object_frame_recognition_mlp", "object_frame_prediction_mlp",
                 "time_position_mlp", "segment_length_mlp"]:
        if f"{head}.0.weight" in sd:
            params[head] = _mlp(sd, head)
    if cfg.share_level_mlps and not cfg.cat_level_states:
        # Shared level heads carry no separate parameters (see init_tggcn);
        # drop any frame-head entries picked up from the state_dict aliases.
        for head in ["human_frame_recognition_mlp", "human_frame_prediction_mlp",
                     "object_frame_recognition_mlp", "object_frame_prediction_mlp"]:
            params.pop(head, None)
    return params


def baseline_params_from_torch_state_dict(sd: Dict[str, np.ndarray]) -> dict:
    """Convert a reference CAD120Baseline/BimanualBaseline state_dict."""
    params = {
        "human_embedding_mlp": _mlp(sd, "human_embedding_mlp"),
        "object_embedding_mlp": _mlp(sd, "object_embedding_mlp"),
        "human_bd_rnn": _bigru(sd, "human_bd_rnn"),
        "object_bd_rnn": _bigru(sd, "object_bd_rnn"),
        "human_recognition_mlp": _mlp(sd, "human_recognition_mlp"),
    }
    if "object_recognition_mlp.0.weight" in sd:
        params["object_recognition_mlp"] = _mlp(sd, "object_recognition_mlp")
    return params
