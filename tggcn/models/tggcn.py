"""TGGCN — the 2G-GCN two-level recurrent HOI model, TPU-native.

Functional re-design of the reference TGGCN (vhoi/models.py:178-1564) for
JAX/XLA:

  * The geometry stream (GeoGCN + embedding MLPs) and all frame-level
    message passing / attention / discrete update decisions are computed for
    ALL (batch, time, entity) triples at once as batched einsums — the
    reference's T x (H+O) Python frame loop (models.py:664-749) has no
    recurrent dependency, so it vectorises completely.
  * The frame-level BiGRUs and the segment-level gated bidirectional GRU are
    `lax.scan`s. The segment scan processes the forward (t) and backward
    (T-1-t) directions in lockstep — exactly the reference's paired loop
    (models.py:785-880) — with the cache-then-commit semantics expressed as
    "all messages read the carry; the carry updates at the end of the step".
  * reorder_hidden_states is a reverse-time scan (tggcn.nn.temporal).

Semantics preserved (see SURVEY.md §2.3): geometry split by human feature
width (2124/2168/2152), the raw-memory geometry reshape quirk
(models.py:644-645), message input orderings, sah/ind/coh object update
strategies, GT-segmentation overrides, forced u=1 at the final padded step,
local-maximum decision filtering, and the exact output list layout.
"""

import math
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from tggcn.nn.distributions import discrete_estimator
from tggcn.nn.geo_gcn import apply_geo_gcn, init_geo_gcn
from tggcn.nn.gru import (
    gru_step_from_gates,
    init_bigru,
    init_gru_cell,
    run_multi_bigru,
)
from tggcn.nn.messages import compute_message_features
from tggcn.nn.mlp import apply_mlp, init_bilinear, init_mlp
from tggcn.nn.temporal import (
    assemble_segment_length_tensor,
    assemble_time_tensor,
    filter_soft_decisions,
    make_periodic_embedding,
    reorder_hidden_states,
)


@dataclass(frozen=True)
class TGGCNConfig:
    input_size: tuple
    num_classes: tuple
    hidden_size: int = 128
    discrete_networks_num_layers: int = 1
    discrete_optimization_strategy: str = "gumbel-sigmoid"
    filter_discrete_updates: bool = False
    gcn_node: int = 26
    message_humans_to_human: bool = True
    message_human_to_objects: bool = True
    message_objects_to_human: bool = True
    message_objects_to_object: bool = True
    message_geometry_to_objects: bool = True
    message_geometry_to_human: bool = False
    message_segment: bool = False
    message_type: str = "relational"
    message_granularity: str = "specific"
    message_aggregation: str = "attention"
    attention_style: str = "concat"
    object_segment_update_strategy: str = "independent"
    update_segment_threshold: float = 0.5
    add_segment_length: bool = False
    add_time_position: bool = False
    time_position_strategy: str = "s"
    positional_encoding_style: str = "embedding"
    cat_level_states: bool = False
    share_level_mlps: bool = False
    bias: bool = True
    # 'reference' reproduces the upstream raw-memory reshape of the GeoGCN
    # output (models.py:644-645), which scrambles (channel, node, time) into
    # per-step blocks and couples features to the clip length. 'per_frame'
    # is the fixed semantics (each step sees its own frame's node features);
    # required for exact streaming, NOT weight-compatible with 'reference'.
    geometry_flatten: str = "reference"
    # Rematerialise the segment-scan body in the backward pass (recompute
    # instead of storing per-step residuals). Numerics-neutral; trades FLOPs
    # for HBM traffic on long sequences. Measured ~25% faster train steps on
    # v5e at the MPHOI headline shape, hence on by default (storing all
    # residuals re-measured 19% slower in round 2: 29.8 vs 25.0 ms/step).
    remat_segment_scan: bool = True
    # Residual policy under remat_segment_scan: 'full' recomputes everything;
    # 'dots' saves matmul/einsum outputs and recomputes only elementwise ops
    # (jax.checkpoint_policies.checkpoint_dots) — less backward recompute at
    # the cost of some residual HBM traffic.
    segment_remat_policy: str = "full"
    # lax.scan unroll factor for the recurrent scans (1 = no unrolling).
    # Amortises per-iteration overhead on latency-bound recurrences. Swept on
    # v5e (bf16 + Pallas GRU headline): unroll 2 -> 27.4 ms/step, 4 -> 25.0,
    # 8 -> 27.0; 4 is the sweet spot.
    scan_unroll: int = 4
    # Route the GeoGCN block through the fused Pallas TPU kernel
    # (tggcn/ops/geo_gcn_pallas.py). Differentiable (custom VJP backed by the
    # XLA reference backward), so valid for training and inference on TPU;
    # leave off on CPU (kernel requires Mosaic unless interpret mode).
    use_pallas_geo_gcn: bool = False
    # Route the frame-level multi-stream BiGRU through the fused Pallas
    # sequence kernel (tggcn/ops/gru_pallas.py): hidden state resident in
    # VMEM across the whole T loop, one kernel launch per direction instead
    # of a lax.scan of small ops. Differentiable (forward AND backward are
    # Pallas kernels). TPU-only (use the XLA scan on CPU); best when
    # hidden_size is a multiple of 128.
    use_pallas_gru: bool = False
    # Route the segment-level gated message-passing scan through the fused
    # Pallas kernel (tggcn/ops/segment_scan_pallas.py): one VMEM-resident
    # kernel step per direction instead of ~15 small XLA ops per scan step.
    # Applies to non-relational generic configs with any attention mode
    # (dot v2/v3, concat v1, bilinear v4, distance-based, mean pooling);
    # relational/'specific' configs keep the XLA paths. Differentiable
    # (hand-written Pallas VJP for bf16 dot mode; XLA-fast-path recompute
    # VJP otherwise). TPU-only.
    use_pallas_segment_scan: bool = False
    # Which attention modes actually route through the segment kernel when
    # use_pallas_segment_scan is on. 'auto' is context-resolved: in the
    # TRAINING step it engages only 'dot' (v2/v3), the mode whose backward
    # is also a Pallas kernel (1.16x; v1/v4/dist/mp pay kernel-forward +
    # XLA-recompute-backward, 0.89-1.01x). Forward-only entry points (the
    # eval engine and StreamingRunner) resolve 'auto' to 'all' — without
    # the recompute VJP the kernel wins every applicable mode (1.36-1.70x
    # at B=8 T=167, 1.11-1.39x at B=1 T=128; tools/bench_segment_modes.py
    # --forward_only, BASELINE.md round 5). 'all' forces every applicable
    # mode through the kernel; any other explicit value (e.g. 'dot') pins
    # dot-only routing in every context.
    segment_kernel_modes: str = "auto"
    # Run BOTH segment-scan directions in ONE Pallas kernel launch, stacked
    # on the batch axis ('dot' attention mode): the direction-shared
    # message/attention matmuls get 2x the rows at near-identical MXU cost
    # and the per-grid-step overhead is paid once. False = one launch per
    # direction (round-2 behaviour).
    segment_fuse_directions: bool = True
    # Same for the frame-level Pallas GRU: backward-direction gate blocks
    # time-pre-flipped and stacked as extra streams, one launch for both
    # directions.
    gru_fuse_directions: bool = True
    # Activation/compute precision of the heavy path (embedding MLPs, frame
    # BiGRUs, messages, segment scan). 'bfloat16' casts inputs and the
    # heavy-path parameters at apply entry — master parameters stay float32
    # (gradients flow back through the cast), so optimizer state and
    # checkpoints are unaffected. Kept float32 regardless: the GeoGCN block
    # (BatchNorm running statistics), the classification heads/log-softmax,
    # and all returned outputs. See tests/test_bf16.py for the measured
    # deviation study vs the float32 path.
    compute_dtype: str = "float32"
    # Gumbel-sigmoid noise derivation ('gs' strategy only). 'batched'
    # (reference-style) draws one noise tensor over the whole (B, T, E)
    # window, so a sliding-window (streaming) evaluation resamples different
    # noise at the same absolute frame and diverges from the offline run.
    # 'frame_indexed' derives the noise for frame t from fold_in(key, t):
    # identical draws at identical absolute frames regardless of windowing,
    # making gs streaming bit-consistent with offline (the StreamingRunner
    # requires it for gs models). Training statistics are unchanged (i.i.d.
    # Gumbel either way).
    gs_noise: str = "batched"
    # Matmul precision for the two discrete-decision MLPs
    # (update_{human,object}_segment_mlp) on the float32 path. The TPU
    # default f32 matmul is a bf16x3 emulation whose rounding can flip a
    # marginal hard segmentation decision vs CPU/reference execution
    # (observed on the hidden-128 golden fixture, BASELINE.md round 3);
    # scoping precision=highest to just these matmuls restores
    # decision-exactness without the ~2x cost of the global
    # jax_default_matmul_precision flag. Ignored under bfloat16 compute
    # (which never promises decision-exactness). None = backend default.
    decision_matmul_precision: Optional[str] = "highest"

    @classmethod
    def from_kwargs(cls, **kwargs):
        fields = cls.__dataclass_fields__
        clean = {}
        for k, v in kwargs.items():
            if k not in fields:
                continue
            if fields[k].type is bool or isinstance(cls.__dataclass_fields__[k].default, bool):
                v = bool(v)
            if k in ("input_size", "num_classes"):
                v = tuple(v)
            clean[k] = v
        return cls(**clean)

    # Derived flag helpers ------------------------------------------------
    @property
    def relational(self):
        return self.message_type in {"v1", "relational"}

    @property
    def attention(self):
        return self.message_aggregation in {"att", "attention"}

    @property
    def embedding_positional(self):
        return self.positional_encoding_style in {"e", "embedding"}

    def message_kwargs(self):
        return dict(message_type=self.message_type,
                    message_granularity=self.message_granularity,
                    message_aggregation=self.message_aggregation,
                    attention_style=self.attention_style)


# ---------------------------------------------------------------------------
# Parameter initialisation
# ---------------------------------------------------------------------------


def _init_message_params(key, cfg: TGGCNConfig, segment: bool) -> dict:
    """Message parameter bundle for one edge type (reference models.py:321-520)."""
    h, bias = cfg.hidden_size, cfg.bias
    kg, kf, km, ka = jax.random.split(key, 4)
    params = {}
    if cfg.relational:
        pair_in = (2 * h) if segment else (4 * h)
        params["g"] = init_mlp(kg, [pair_in, h], bias=bias)
        params["f"] = init_mlp(kf, [h, h], bias=bias)
        return params
    if cfg.message_granularity in {"v1", "generic"}:
        msg_in = h if segment else 2 * h
    else:
        msg_in = (2 * h) if segment else (4 * h)
    params["msg"] = init_mlp(km, [msg_in, h], bias=bias)
    if cfg.attention:
        if cfg.attention_style in {"v4", "general"}:
            att_in = h if segment else 2 * h
            params["att"] = init_bilinear(ka, att_in, att_in, 1, bias=bias)
        else:
            att_in = (2 * h) if segment else (4 * h)
            params["att"] = init_mlp(ka, [att_in, 1], bias=bias)
    return params


def _human_segment_input_size(cfg: TGGCNConfig) -> int:
    h = cfg.hidden_size
    size = h
    if cfg.message_humans_to_human:
        size += h
        if cfg.message_segment:
            size += h
    if cfg.message_geometry_to_human:
        size += h
    if cfg.message_objects_to_human:
        size += h
        if cfg.message_segment:
            size += h
    if cfg.add_time_position and cfg.time_position_strategy == "s":
        size += h
    if cfg.add_segment_length:
        size += h
    return size


def _object_segment_input_size(cfg: TGGCNConfig) -> int:
    h = cfg.hidden_size
    size = h
    if cfg.message_geometry_to_objects:
        size += h
    if cfg.message_human_to_objects:
        size += h
        if cfg.message_segment:
            size += h
    if cfg.message_objects_to_object:
        size += h
        if cfg.message_segment:
            size += h
    if cfg.add_time_position and cfg.time_position_strategy == "s":
        size += h
    if cfg.add_segment_length:
        size += h
    return size


def init_tggcn(key, cfg: TGGCNConfig) -> dict:
    h, bias = cfg.hidden_size, cfg.bias
    human_input_size, object_input_size = cfg.input_size
    num_subactivities, num_affordances = cfg.num_classes
    del human_input_size  # visual part is always 2048 (reference models.py:273)
    keys = iter(jax.random.split(key, 64))
    params = {}

    if cfg.add_time_position and cfg.embedding_positional:
        params["time_position_mlp"] = init_mlp(next(keys), [1, h], bias=bias)
    if cfg.add_segment_length and cfg.embedding_positional:
        params["segment_length_mlp"] = init_mlp(next(keys), [1, h], bias=bias)

    # Geometry stream (reference models.py:264-269).
    params["geometry_embedding_gcn"] = init_geo_gcn(next(keys), cfg.gcn_node, 4, 128)
    params["geometry_embedding_mlp"] = init_mlp(next(keys), [cfg.gcn_node * 128, 2048, h], bias=bias)
    params["geometry_bd_rnn"] = init_bigru(next(keys), h, h, bias=bias)
    params["geometry_bd_embedding_mlp"] = init_mlp(next(keys), [2 * h, h], bias=bias)

    # Human stream (reference models.py:272-295).
    params["human_embedding_mlp"] = init_mlp(next(keys), [2048, h], bias=bias)
    params["human_bd_rnn"] = init_bigru(next(keys), h, h, bias=bias)
    params["human_bd_embedding_mlp"] = init_mlp(next(keys), [2 * h, h], bias=bias)
    params["human_segment_rnn_fcell"] = init_gru_cell(next(keys), _human_segment_input_size(cfg), h, bias=bias)
    params["human_segment_rnn_bcell"] = init_gru_cell(next(keys), _human_segment_input_size(cfg), h, bias=bias)

    # Object stream (reference models.py:297-320).
    params["object_embedding_mlp"] = init_mlp(next(keys), [object_input_size, h], bias=bias)
    params["object_bd_rnn"] = init_bigru(next(keys), h, h, bias=bias)
    params["object_bd_embedding_mlp"] = init_mlp(next(keys), [2 * h, h], bias=bias)
    params["object_segment_rnn_fcell"] = init_gru_cell(next(keys), _object_segment_input_size(cfg), h, bias=bias)
    params["object_segment_rnn_bcell"] = init_gru_cell(next(keys), _object_segment_input_size(cfg), h, bias=bias)

    # Message parameter bundles per enabled edge type (reference models.py:321-520).
    for flag, name in [
        (cfg.message_humans_to_human, "h2h"),
        (cfg.message_human_to_objects, "h2o"),
        (cfg.message_objects_to_human, "o2h"),
        (cfg.message_objects_to_object, "o2o"),
        (cfg.message_geometry_to_human, "s2h"),
        (cfg.message_geometry_to_objects, "s2o"),
    ]:
        if not flag:
            continue
        params[name] = {"frame": _init_message_params(next(keys), cfg, segment=False)}
        if cfg.message_segment and name not in ("s2h", "s2o"):
            # Geometry edges have no segment-level message (reference :283-285, :305-306).
            params[name]["segment"] = _init_message_params(next(keys), cfg, segment=True)

    # Discrete update MLPs (reference models.py:522-548).
    num_hidden = cfg.discrete_networks_num_layers - 1
    upd_h_in = 2 * h
    if cfg.message_humans_to_human:
        upd_h_in += h
    if cfg.message_objects_to_human:
        upd_h_in += h
    if cfg.message_geometry_to_human:
        upd_h_in += h
    if cfg.add_time_position and cfg.time_position_strategy == "u":
        upd_h_in += h
    dims = [upd_h_in] + [h] * num_hidden + [1]
    params["update_human_segment_mlp"] = init_mlp(next(keys), dims, bias=bias)
    if cfg.object_segment_update_strategy not in {"same_as_human", "sah"}:
        upd_o_in = 2 * h
        if cfg.message_human_to_objects:
            upd_o_in += h
        if cfg.message_objects_to_object:
            upd_o_in += h
        if cfg.message_geometry_to_objects:
            upd_o_in += h
        if cfg.add_time_position and cfg.time_position_strategy == "u":
            upd_o_in += h
        dims = [upd_o_in] + [h] * num_hidden + [1]
        params["update_object_segment_mlp"] = init_mlp(next(keys), dims, bias=bias)

    # Recognition/prediction heads (reference models.py:552-580).
    label_in = 2 * h + (2 * h if cfg.cat_level_states else 0)
    params["human_recognition_mlp"] = init_mlp(next(keys), [label_in, num_subactivities], bias=bias)
    params["human_prediction_mlp"] = init_mlp(next(keys), [label_in, num_subactivities], bias=bias)
    if num_affordances is not None:
        params["object_recognition_mlp"] = init_mlp(next(keys), [label_in, num_affordances], bias=bias)
        params["object_prediction_mlp"] = init_mlp(next(keys), [label_in, num_affordances], bias=bias)
    if cfg.share_level_mlps and not cfg.cat_level_states:
        # Shared level MLPs: no separate frame-head parameters are created;
        # apply_tggcn resolves frame heads to the segment-level heads so
        # gradients from both levels accumulate into ONE tensor (matching the
        # reference's module aliasing, models.py:565-570). Creating aliased
        # pytree entries instead would silently split them into independent
        # parameters at the first optimizer update.
        pass
    else:
        params["human_frame_recognition_mlp"] = init_mlp(next(keys), [2 * h, num_subactivities], bias=bias)
        params["human_frame_prediction_mlp"] = init_mlp(next(keys), [2 * h, num_subactivities], bias=bias)
        if num_affordances is not None:
            params["object_frame_recognition_mlp"] = init_mlp(next(keys), [2 * h, num_affordances], bias=bias)
            params["object_frame_prediction_mlp"] = init_mlp(next(keys), [2 * h, num_affordances], bias=bias)
    return params


# ---------------------------------------------------------------------------
# Forward helpers
# ---------------------------------------------------------------------------


def _cat_valid(tensors, axis=-1):
    return jnp.concatenate([t for t in tensors if t is not None], axis=axis)


def _work_dtype(cfg: TGGCNConfig):
    """The compute dtype for the heavy path, or None for plain float32."""
    if cfg.compute_dtype in (None, "float32", "f32"):
        return None
    return jnp.dtype(cfg.compute_dtype)


def _cast_params_for_compute(params: dict, dtype) -> dict:
    """Cast heavy-path parameters to the compute dtype.

    Excluded (stay float32): the GeoGCN block — its BatchNorm running
    statistics must not round-trip through bfloat16 across training steps —
    and the classification head MLPs, whose log-softmax accuracy sets the
    loss precision.
    """
    def keep(name):
        return (name == "geometry_embedding_gcn"
                or name.endswith("_recognition_mlp")
                or name.endswith("_prediction_mlp"))

    def cast_leaf(a):
        return a.astype(dtype) if jnp.issubdtype(a.dtype, jnp.floating) else a

    return {k: (v if keep(k) else jax.tree_util.tree_map(cast_leaf, v))
            for k, v in params.items()}


def _split_geometry(x_human):
    """Dataset dispatch on human feature width (reference models.py:630-639)."""
    width = x_human.shape[3]
    if width == 2124:       # CAD-120
        split = 2048
        x_geo = x_human[:, :, 0, split:]
    elif width == 2168:     # Bimanual
        split = 2048
        x_geo = x_human[:, :, 0, split:]
    else:                   # MPHOI (2152)
        split = 2048
        x_geo = x_human[:, :, 0, split:]
    return x_human[..., :split], x_geo


# ---------------------------------------------------------------------------
# Forward pass
# ---------------------------------------------------------------------------


def apply_tggcn(params: dict, cfg: TGGCNConfig,
                x_human: jnp.ndarray, x_objects: jnp.ndarray, objects_mask: jnp.ndarray,
                human_segmentation: Optional[jnp.ndarray] = None,
                objects_segmentation: Optional[jnp.ndarray] = None,
                human_human_distances: Optional[jnp.ndarray] = None,
                human_object_distances: Optional[jnp.ndarray] = None,
                object_object_distances: Optional[jnp.ndarray] = None,
                steps_per_example: Optional[jnp.ndarray] = None,
                train: bool = False, rng: Optional[jax.Array] = None,
                inspect_model: bool = False,
                carry: Optional[dict] = None, return_carry: bool = False,
                force_last_step_commit: bool = True,
                frame_offset=0):
    """Forward pass. Returns (outputs list, aux dict).

    aux contains 'bn_state' (updated GeoGCN BatchNorm statistics when
    train=True) and, if inspect_model, 'attention_scores'
    [frame, segment-fwd, segment-bwd] each (B, H, T, O).

    Streaming support (sliding-window inference over long untrimmed video):
    `carry` threads the forward-direction recurrent states across windows
    (keys: frame_human/frame_object/frame_geometry (B, E, h) and
    seg_human/seg_object (B, E, h)); `return_carry=True` adds per-step
    forward state sequences to aux so the caller can slice the carry at any
    window boundary; `force_last_step_commit=False` disables the u=1 forcing
    at the final padded step (reference models.py:701-702), which is only
    correct at a true clip end.
    """
    b, t, num_humans = x_human.shape[0], x_human.shape[1], x_human.shape[2]
    num_objects = x_objects.shape[2]
    hidden = cfg.hidden_size
    if rng is None:
        rng = jax.random.PRNGKey(0)
    rng_h, rng_o = jax.random.split(rng)
    # Absolute frame ids for frame-indexed gs noise (cfg.gs_noise): noise at
    # frame `frame_offset + i` depends only on (key, absolute frame), so
    # windowed evaluation samples what the offline run samples.
    gs_frames = None
    if (cfg.gs_noise == "frame_indexed"
            and cfg.discrete_optimization_strategy in {"gumbel-sigmoid", "gs"}):
        gs_frames = frame_offset + jnp.arange(t, dtype=jnp.int32)

    # --- Mixed precision -------------------------------------------------
    work_dtype = _work_dtype(cfg)
    if work_dtype is not None:
        params = _cast_params_for_compute(params, work_dtype)
        x_objects = x_objects.astype(work_dtype)
        objects_mask = objects_mask.astype(work_dtype)
        cast_opt = lambda a: None if a is None else a.astype(work_dtype)
        human_human_distances = cast_opt(human_human_distances)
        human_object_distances = cast_opt(human_object_distances)
        object_object_distances = cast_opt(object_object_distances)
        steps_per_example = cast_opt(steps_per_example)

    # --- Geometry stream -------------------------------------------------
    x_vis, x_geometry = _split_geometry(x_human)
    if work_dtype is not None:
        x_vis = x_vis.astype(work_dtype)  # geometry stays f32 for the GCN+BN
    vw = x_geometry.shape[-1]
    if vw // 4 != cfg.gcn_node:
        raise ValueError(
            f"gcn_node={cfg.gcn_node} is inconsistent with the geometry feature "
            f"width {vw} (expected gcn_node={vw // 4}; use 19 for CAD-120, "
            f"30 for Bimanual, 26 for MPHOI).")
    x_geometry = x_geometry.reshape(b, t, vw // 4, 4)
    # named_scope blocks label the HLO ops (forward AND the generated
    # backward) so device traces (tools/profile_step.py) attribute time to
    # model blocks; numerics are unaffected.
    with jax.named_scope("geo_gcn"):
        geo_out, bn_state = apply_geo_gcn(params["geometry_embedding_gcn"],
                                          x_geometry, train=train,
                                          use_pallas=cfg.use_pallas_geo_gcn)
    if cfg.geometry_flatten == "per_frame":
        geo_flat = geo_out.reshape(b, t, 1, geo_out.shape[-1] * (vw // 4))
    else:
        # Reference quirk (models.py:644-645): the (B, 128, V, T) GCN output
        # is raw-memory reshaped to (B, T, 1, 128*V), which scrambles
        # (channel, node, time) into per-"frame" blocks. Reproduced
        # bit-for-bit for parity.
        geo_flat = jnp.transpose(geo_out, (0, 3, 2, 1)).reshape(
            b, t, 1, geo_out.shape[-1] * (vw // 4))
    if work_dtype is not None:
        geo_flat = geo_flat.astype(work_dtype)
    with jax.named_scope("embed"):
        x_geo_emb = apply_mlp(params["geometry_embedding_mlp"], geo_flat,
                              activations=["relu", "relu"])
        x_hum_emb = apply_mlp(params["human_embedding_mlp"], x_vis,
                              activations=["relu"])
        x_obj_emb = apply_mlp(params["object_embedding_mlp"], x_objects,
                              activations=["relu"])

    # --- Frame-level BiGRUs ----------------------------------------------
    # All three entity streams advance in ONE bidirectional scan
    # (run_multi_bigru): one batched recurrent matmul pair per step instead
    # of six independent T-length scans.
    carry = carry or {}
    if work_dtype is not None and carry:
        carry = {k: v.astype(work_dtype) for k, v in carry.items()}
    h0s = None
    if any(k in carry for k in ("frame_human", "frame_object", "frame_geometry")):
        h0s = [carry.get("frame_human",
                         jnp.zeros((b, num_humans, hidden), x_hum_emb.dtype)),
               carry.get("frame_object",
                         jnp.zeros((b, num_objects, hidden), x_obj_emb.dtype)),
               carry.get("frame_geometry", jnp.zeros((b, 1, hidden), x_geo_emb.dtype))]
    frame_rnns = [params["human_bd_rnn"], params["object_bd_rnn"],
                  params["geometry_bd_rnn"]]
    frame_xs = [x_hum_emb, x_obj_emb, x_geo_emb]
    with jax.named_scope("frame_gru"):
        if cfg.use_pallas_gru:
            from tggcn.ops.gru_pallas import run_multi_bigru_pallas

            h_hfr, h_ofr, _h_sfr = run_multi_bigru_pallas(
                frame_rnns, frame_xs, h0_fwd_list=h0s,
                fuse_directions=cfg.gru_fuse_directions)
        else:
            h_hfr, h_ofr, _h_sfr = run_multi_bigru(frame_rnns, frame_xs,
                                                   h0_fwd_list=h0s,
                                                   unroll=cfg.scan_unroll)
        h_hf = apply_mlp(params["human_bd_embedding_mlp"], h_hfr,
                         activations=["relu"])
        h_of = apply_mlp(params["object_bd_embedding_mlp"], h_ofr,
                         activations=["relu"])
        h_sf = apply_mlp(params["geometry_bd_embedding_mlp"], _h_sfr,
                         activations=["relu"])

    # --- Positional features ---------------------------------------------
    ignore_div = cfg.positional_encoding_style in {"p", "periodic"}
    x_time_emb = None
    if cfg.add_time_position:
        x_time = assemble_time_tensor(steps_per_example, t, ignore_div)  # (T, B, 1)
        if cfg.embedding_positional:
            x_time = apply_mlp(params["time_position_mlp"], x_time, activations=["relu"])
        else:
            x_time = make_periodic_embedding(x_time, hidden)
        x_time_emb = jnp.transpose(x_time, (1, 0, 2))  # (B, T, hidden)

    # --- Frame-level messages (vectorised over B, T) ----------------------
    mkw = cfg.message_kwargs()
    obj_mask_bt = objects_mask[:, None, :]  # (B, 1, O) broadcasts over T

    def frame_msg(name, receivers, senders, mask, exclude_self=False, dists=None):
        with jax.named_scope(f"frame_msg_{name}"):
            recv = jnp.concatenate(receivers, axis=-1)
            send = jnp.concatenate(senders, axis=-1)
            return compute_message_features(params[name]["frame"], recv, send,
                                            mask, exclude_self=exclude_self,
                                            distances=dists, **mkw)

    dist_based = human_object_distances is not None or human_human_distances is not None \
        or object_object_distances is not None

    m_hh = m_oh = m_sh = None
    att_frame = None
    if cfg.message_humans_to_human:
        hh_d = human_human_distances if dist_based and human_human_distances is not None else None
        m_hh, _ = frame_msg("h2h", [x_hum_emb, h_hf], [x_hum_emb, h_hf], None,
                            exclude_self=True, dists=hh_d)
    if cfg.message_objects_to_human:
        ho_d = human_object_distances if dist_based and human_object_distances is not None else None
        m_oh, att_frame = frame_msg("o2h", [x_hum_emb, h_hf], [x_obj_emb, h_of],
                                    obj_mask_bt[:, :, None, :], dists=ho_d)
    if cfg.message_geometry_to_human:
        m_sh, _ = frame_msg("s2h", [x_hum_emb, h_hf], [x_geo_emb, h_sf], None)

    m_ho = m_so = m_oo = None
    if cfg.message_human_to_objects:
        oh_d = None
        if dist_based and human_object_distances is not None:
            oh_d = jnp.swapaxes(human_object_distances, 2, 3)  # (B, T, O, H)
        m_ho, _ = frame_msg("h2o", [x_obj_emb, h_of], [x_hum_emb, h_hf], None, dists=oh_d)
        m_ho = m_ho * objects_mask[:, None, :, None]
    if cfg.message_geometry_to_objects:
        m_so, _ = frame_msg("s2o", [x_obj_emb, h_of], [x_geo_emb, h_sf], None)
        m_so = m_so * objects_mask[:, None, :, None]
    if cfg.message_objects_to_object:
        oo_d = object_object_distances if dist_based and object_object_distances is not None else None
        m_oo, _ = frame_msg("o2o", [x_obj_emb, h_of], [x_obj_emb, h_of],
                            obj_mask_bt[:, :, None, :], exclude_self=True, dists=oo_d)

    # --- Discrete update decisions (vectorised over B, T, E) --------------
    x_tt = None
    if cfg.add_time_position and cfg.time_position_strategy == "u":
        x_tt = x_time_emb[:, :, None, :]  # (B, T, 1, hidden)

    def broadcast_tt(num_entities):
        if x_tt is None:
            return None
        return jnp.broadcast_to(x_tt, (b, t, num_entities, hidden))

    # Decision MLPs: scoped high-precision matmuls on the f32 path so a
    # marginal sigmoid near the hard threshold rounds the same way as
    # CPU/reference execution (see decision_matmul_precision).
    dec_prec = cfg.decision_matmul_precision if work_dtype is None else None
    if human_segmentation is not None:
        u_h_hard = u_h_soft = human_segmentation.astype(x_hum_emb.dtype)
    else:
        with jax.named_scope("decision_human"):
            upd_in = _cat_valid([x_hum_emb, h_hf, m_hh, m_oh, m_sh,
                                 broadcast_tt(num_humans)])
            u_soft = apply_mlp(params["update_human_segment_mlp"], upd_in,
                               activations=["relu"] * (cfg.discrete_networks_num_layers - 1) + ["sigmoid"],
                               precision=dec_prec)
            u_h_hard, u_h_soft = discrete_estimator(
                u_soft, strategy=cfg.discrete_optimization_strategy,
                threshold=cfg.update_segment_threshold, key=rng_h,
                frame_indices=gs_frames)
        u_h_hard, u_h_soft = u_h_hard[..., 0], u_h_soft[..., 0]  # (B, T, H)
        if force_last_step_commit:
            # Forced commit at the final padded step (reference models.py:701-702).
            u_h_hard = u_h_hard.at[:, -1, :].set(1.0)

    if objects_segmentation is not None:
        u_o_hard = u_o_soft = objects_segmentation.astype(x_hum_emb.dtype)
    else:
        # The human decision conditions the object decision only in the
        # single-human case (reference models.py:741-742).
        u_hst = u_h_hard[..., 0:1] if num_humans == 1 else None
        u_hsts = u_h_soft[..., 0:1] if num_humans == 1 else None
        if cfg.object_segment_update_strategy in {"same_as_human", "sah"} and u_hst is not None:
            u_o_hard = jnp.broadcast_to(u_hst, (b, t, num_objects))
            u_o_soft = jnp.broadcast_to(u_hsts, (b, t, num_objects))
        else:
            with jax.named_scope("decision_object"):
                upd_in = _cat_valid([x_obj_emb, h_of, m_ho, m_oo, m_so,
                                     broadcast_tt(num_objects)])
                u_soft = apply_mlp(params["update_object_segment_mlp"], upd_in,
                                   activations=["relu"] * (cfg.discrete_networks_num_layers - 1) + ["sigmoid"],
                                   precision=dec_prec)
                u_o_hard, u_o_soft = discrete_estimator(
                    u_soft, strategy=cfg.discrete_optimization_strategy,
                    threshold=cfg.update_segment_threshold, key=rng_o,
                    frame_indices=gs_frames)
            u_o_hard, u_o_soft = u_o_hard[..., 0], u_o_soft[..., 0]
            if cfg.object_segment_update_strategy in {"conditional_on_human", "coh"} and u_hst is not None:
                u_o_hard = u_o_hard * u_hst
            if force_last_step_commit:
                u_o_hard = u_o_hard.at[:, -1, :].set(1.0)

    # --- Optional decision filtering (reference models.py:750-753) --------
    u_h_used, u_o_used = u_h_hard, u_o_hard
    if cfg.filter_discrete_updates:
        u_h_used = filter_soft_decisions(u_h_soft, cfg.update_segment_threshold)
        u_o_used = filter_soft_decisions(u_o_soft, cfg.update_segment_threshold)

    # --- Segment-level inputs ---------------------------------------------
    x_hs = _cat_valid([h_hf, m_hh, m_oh, m_sh])                       # (B, T, H, F)
    x_os = _cat_valid([h_of, m_ho, m_so, m_oo])                       # (B, T, O, F)
    if cfg.add_time_position and cfg.time_position_strategy == "s":
        x_hs = jnp.concatenate([x_hs, jnp.broadcast_to(x_time_emb[:, :, None, :],
                                                       (b, t, num_humans, hidden))], axis=-1)
        x_os = jnp.concatenate([x_os, jnp.broadcast_to(x_time_emb[:, :, None, :],
                                                       (b, t, num_objects, hidden))], axis=-1)
    if cfg.add_segment_length:
        def seg_len_features(u_used):
            x_sl = assemble_segment_length_tensor(u_used, steps_per_example, ignore_div)
            if cfg.embedding_positional:
                return apply_mlp(params["segment_length_mlp"], x_sl, activations=["relu"])
            return make_periodic_embedding(x_sl, hidden)
        x_hs = jnp.concatenate([x_hs, seg_len_features(u_h_used)], axis=-1)
        x_os = jnp.concatenate([x_os, seg_len_features(u_o_used)], axis=-1)

    # --- Segment-level gated bidirectional scan ----------------------------
    use_dists = any(d is not None for d in (human_human_distances,
                                            human_object_distances,
                                            object_object_distances))
    seg_carry = (carry.get("seg_human"), carry.get("seg_object"))
    dists3 = (human_human_distances, human_object_distances,
              object_object_distances)
    use_pallas_seg = False
    if cfg.use_pallas_segment_scan:
        from tggcn.ops.segment_scan_pallas import (
            pallas_segment_mode,
            run_segment_scan_pallas,
        )

        seg_mode = pallas_segment_mode(cfg, dists3)
        use_pallas_seg = seg_mode is not None and (
            getattr(cfg, "segment_kernel_modes", "auto") == "all"
            or seg_mode == "dot")
    with jax.named_scope("segment_scan"):
        if use_pallas_seg:
            seg = run_segment_scan_pallas(params, cfg, x_hs, x_os, u_h_used,
                                          u_o_used, objects_mask,
                                          seg_carry=seg_carry, dists3=dists3)
        elif _fast_segment_scan_applicable(cfg, use_dists):
            seg = _segment_scan_fast(params, cfg, x_hs, x_os, u_h_used,
                                     u_o_used, objects_mask,
                                     human_human_distances,
                                     human_object_distances,
                                     object_object_distances,
                                     seg_carry=seg_carry)
        else:
            seg = _segment_scan(params, cfg, x_hs, x_os, u_h_used, u_o_used,
                                objects_mask, human_human_distances,
                                human_object_distances,
                                object_object_distances, seg_carry=seg_carry)
    hx_hs, hx_os, att_seg_f, att_seg_b = seg
    # Forward-direction segment state sequences (pre-reorder) for streaming carries.
    hx_hs_fwd_seq = hx_hs[..., :hidden]
    hx_os_fwd_seq = hx_os[..., :hidden]

    # --- Reorder: every frame labelled with its segment's final state ------
    # Humans and objects fold into ONE scan (same 2h feature width).
    def reorder_entities(hx, u):
        # (B, T, E, F), (B, T, E) -> fold entities into batch for the scan.
        n_e = hx.shape[2]
        hx_f = jnp.transpose(hx, (0, 2, 1, 3)).reshape(b * n_e, t, hx.shape[-1])
        u_f = jnp.transpose(u, (0, 2, 1)).reshape(b * n_e, t)
        out = reorder_hidden_states(hx_f, u_f)
        return out.reshape(b, n_e, t, -1).transpose(0, 2, 1, 3)

    with jax.named_scope("reorder"):
        hx_all = reorder_entities(jnp.concatenate([hx_hs, hx_os], axis=2),
                                  jnp.concatenate([u_h_used, u_o_used], axis=2))
    hx_hs = hx_all[:, :, :num_humans]
    hx_os = hx_all[:, :, num_humans:]
    if cfg.cat_level_states:
        hx_hs = jnp.concatenate([hx_hs, h_hfr], axis=-1)
        hx_os = jnp.concatenate([hx_os, h_ofr], axis=-1)

    # --- Heads -------------------------------------------------------------
    shared = cfg.share_level_mlps and not cfg.cat_level_states

    def head(name, x):
        if shared and name.endswith("_frame_recognition_mlp"):
            name = name.replace("_frame_recognition_mlp", "_recognition_mlp")
        elif shared and name.endswith("_frame_prediction_mlp"):
            name = name.replace("_frame_prediction_mlp", "_prediction_mlp")
        with jax.named_scope(f"head_{name}"):
            if work_dtype is not None:
                x = x.astype(jnp.float32)  # heads + log-softmax stay full precision
            out = apply_mlp(params[name], x,
                            activations=[{"name": "logsoftmax", "dim": -1}])
            return jnp.transpose(out, (0, 3, 1, 2))  # (B, C, T, E)

    y_hs, y_os = u_h_used, u_o_used
    y_hss, y_oss = u_h_soft, u_o_soft
    y_hf_rec = head("human_frame_recognition_mlp", h_hfr)
    y_hf_pred = head("human_frame_prediction_mlp", h_hfr)
    y_h_rec = head("human_recognition_mlp", hx_hs)
    y_h_pred = head("human_prediction_mlp", hx_hs)
    if cfg.num_classes[1] is not None:
        y_of_rec = head("object_frame_recognition_mlp", h_ofr)
        y_of_pred = head("object_frame_prediction_mlp", h_ofr)
        y_o_rec = head("object_recognition_mlp", hx_os)
        y_o_pred = head("object_prediction_mlp", hx_os)
        output = [y_hs, y_os, y_hss, y_oss,
                  y_hf_rec, y_hf_pred, y_of_rec, y_of_pred,
                  y_h_rec, y_h_pred, y_o_rec, y_o_pred]
    else:
        output = [y_hs, y_hss, y_hf_rec, y_hf_pred, y_h_rec, y_h_pred]
    if work_dtype is not None:
        # Decision outputs come out of the bf16 path; losses and all consumers
        # (predict.py slicing, streaming stitching) see float32 regardless of
        # the compute dtype.
        output = [o.astype(jnp.float32) for o in output]

    aux = {"bn_state": bn_state}
    if return_carry:
        hidden_h = cfg.hidden_size
        # Per-step forward-direction states; slice [:, w-1] for a window carry.
        aux["carry_seq"] = {
            "frame_human": h_hfr[..., :hidden_h],
            "frame_object": h_ofr[..., :hidden_h],
            "frame_geometry": _h_sfr[..., :hidden_h],
            "seg_human": hx_hs_fwd_seq,
            "seg_object": hx_os_fwd_seq,
        }
    if inspect_model:
        # (B, T, H, O) -> (B, H, T, O), matching the reference stacking
        # (models.py:927-931).
        to_ref = lambda a: jnp.transpose(a, (0, 2, 1, 3)).astype(jnp.float32)
        aux["attention_scores"] = [to_ref(att_frame), to_ref(att_seg_f), to_ref(att_seg_b)]
    return output, aux


def _remat_step(step_fn, cfg: TGGCNConfig):
    """jax.checkpoint with the configured residual policy."""
    if cfg.segment_remat_policy == "dots":
        return jax.checkpoint(
            step_fn, policy=jax.checkpoint_policies.checkpoint_dots)
    return jax.checkpoint(step_fn)


def _fast_segment_scan_applicable(cfg: TGGCNConfig, use_dists: bool) -> bool:
    """The batched fast path covers non-relational generic messages on all
    four entity edges with any aggregation: attention styles v1 (concat-MLP,
    single layer by construction), v2/v3 (dot / scaled dot), v4 (bilinear),
    distance-based attention, and mean pooling. Relational messages and
    'specific' granularity take the general path."""
    return (cfg.message_segment
            and not cfg.relational
            and cfg.message_granularity in {"v1", "generic"}
            and (cfg.attention
                 or cfg.message_aggregation in {"mp", "mean_pooling"})
            and cfg.message_humans_to_human and cfg.message_objects_to_human
            and cfg.message_human_to_objects and cfg.message_objects_to_object)


def _segment_scan_fast(params, cfg: TGGCNConfig, x_hs, x_os, u_h, u_o, objects_mask,
                       hh_dists=None, ho_dists=None, oo_dists=None,
                       seg_carry=(None, None)):
    """Batched segment-level scan for non-relational generic configurations.

    Per scan step the general path issues ~30 small ops (8 message MLPs, 8
    attention computations, 4 GRU cells x 3 matmuls). Here both directions
    and both entity types batch together: 2 batched message matmuls (one per
    sender type, covering both edges and both directions), 4 batched
    attention einsums, and one batched 4-cell GRU update over entity-padded
    states. Covers attention styles v1-v4, distance-based attention and mean
    pooling. Semantics identical to _segment_scan (equivalence-tested).
    """
    b, t, num_humans, _ = x_hs.shape
    num_objects = x_os.shape[2]
    h = cfg.hidden_size
    dtype = x_hs.dtype
    scale = 1.0 / math.sqrt(h) if cfg.attention_style in {"v3", "scaled_dot-product"} else 1.0
    mean_pooling = cfg.message_aggregation in {"mp", "mean_pooling"}
    e_max = max(num_humans, num_objects)

    def base_gates(cell, x):
        w = params[cell]["w_ih"]
        gi = x @ w[: x.shape[-1]]
        if "b_ih" in params[cell]:
            gi = gi + params[cell]["b_ih"]
        return gi

    gi_hf = base_gates("human_segment_rnn_fcell", x_hs)
    gi_hb = base_gates("human_segment_rnn_bcell", x_hs)
    gi_of = base_gates("object_segment_rnn_fcell", x_os)
    gi_ob = base_gates("object_segment_rnn_bcell", x_os)

    def pad_e(a, target):
        if a.shape[2] == target:
            return a
        return jnp.pad(a, ((0, 0), (0, 0), (0, target - a.shape[2]), (0, 0)))

    # Stack the 4 cells (human-fwd, human-bwd, object-fwd, object-bwd) on a
    # leading axis with entity rows padded to e_max; time-major for the scan.
    gi4 = jnp.stack([pad_e(g, e_max) for g in (gi_hf, gi_hb, gi_of, gi_ob)])  # (4,B,T,E,3h)
    gi4 = jnp.moveaxis(gi4, 2, 0)                                             # (T,4,B,E,3h)
    # Backward cells read time T-1-i: flip their slices.
    gi4 = jnp.stack([gi4[:, 0], gi4[::-1, 1], gi4[:, 2], gi4[::-1, 3]], axis=1)

    def pad_u(u):
        if u.shape[2] == e_max:
            return u
        return jnp.pad(u, ((0, 0), (0, 0), (0, e_max - u.shape[2])))

    u4 = jnp.stack([pad_u(u_h), pad_u(u_h), pad_u(u_o), pad_u(u_o)])          # (4,B,T,E)
    u4 = jnp.moveaxis(u4, 2, 0)
    u4 = jnp.stack([u4[:, 0], u4[::-1, 1], u4[:, 2], u4[::-1, 3]], axis=1)    # (T,4,B,E)

    w_hh4 = jnp.stack([params[c]["w_hh"] for c in
                       ("human_segment_rnn_fcell", "human_segment_rnn_bcell",
                        "object_segment_rnn_fcell", "object_segment_rnn_bcell")])
    b_hh4 = jnp.stack([params[c].get("b_hh", jnp.zeros(3 * h, dtype))
                       for c in ("human_segment_rnn_fcell", "human_segment_rnn_bcell",
                                 "object_segment_rnn_fcell", "object_segment_rnn_bcell")])
    base_h, base_o = x_hs.shape[-1], x_os.shape[-1]
    w_msg_gates4 = jnp.stack([
        params["human_segment_rnn_fcell"]["w_ih"][base_h:],
        params["human_segment_rnn_bcell"]["w_ih"][base_h:],
        params["object_segment_rnn_fcell"]["w_ih"][base_o:],
        params["object_segment_rnn_bcell"]["w_ih"][base_o:],
    ])                                                                         # (4, 2h, 3h)

    def msg_layer(edge):
        layer = params[edge]["segment"]["msg"]["layers"][0]
        return layer["w"], layer.get("b", jnp.zeros(h, dtype))

    w_from_h = jnp.stack([msg_layer("h2h")[0], msg_layer("h2o")[0]])           # (2, h, h)
    b_from_h = jnp.stack([msg_layer("h2h")[1], msg_layer("h2o")[1]])[:, None, None, None]
    w_from_o = jnp.stack([msg_layer("o2h")[0], msg_layer("o2o")[0]])
    b_from_o = jnp.stack([msg_layer("o2h")[1], msg_layer("o2o")[1]])[:, None, None, None]

    eye_h = jnp.eye(num_humans, dtype=dtype)
    eye_o = jnp.eye(num_objects, dtype=dtype)
    obj_mask_r = objects_mask[None, :, None, :]                                # (1,B,1,O)

    # Finite masked softmax (tggcn.nn.messages): the -inf + NaN-cleanup
    # pattern is nondeterministic under XLA fast-math on fully masked rows
    # (e.g. h2h attention with a single human).
    from tggcn.nn.messages import masked_softmax

    def edge_attention(recv, send, mask, edge, dists):
        """Attention weights (dir, B, R, S) for one edge, any style.

        Mirrors tggcn.nn.messages semantics: mean pooling = masked uniform
        weights; distance-based = inverse-distance softmax; v1 decomposes the
        single-layer concat-MLP into receiver + sender projections; v4 is the
        bilinear form; v2/v3 dot (scaled)."""
        if mean_pooling:
            full = jnp.broadcast_to(mask, (2, b, recv.shape[2], send.shape[2]))
            full = full.astype(dtype)
            return full / jnp.clip(jnp.sum(full, axis=-1, keepdims=True), min=1.0)
        if dists is not None:
            from tggcn.nn.messages import distance_based_attention_weights

            full = jnp.broadcast_to(mask, dists.shape).astype(dtype)
            return distance_based_attention_weights(dists, full)
        if cfg.attention_style in {"v1", "concat"}:
            layer = params[edge]["segment"]["att"]["layers"][0]
            w = layer["w"]
            q = recv @ w[:h]                                    # (d,B,R,1)
            k = send @ w[h:]                                    # (d,B,S,1)
            scores = q + jnp.swapaxes(k, -1, -2)
            if "b" in layer:
                scores = scores + layer["b"][0]
            scores = jax.nn.relu(scores)
        elif cfg.attention_style in {"v2", "dot-product", "v3", "scaled_dot-product"}:
            scores = jnp.einsum("dbnh,dbmh->dbnm", recv, send) * scale
            if scale == 1.0:
                # Unscaled dot ('v2'): same TPU-compiler SIGABRT workaround
                # as tggcn.nn.messages.compute_attention_weights — the bare
                # einsum->masked-softmax fusion crashes the backend; v3's
                # scale multiply (not folded away) avoids it. Numerics
                # unchanged; identity under grad.
                scores = jax.lax.optimization_barrier(scores)
        else:  # v4 / general bilinear
            bil = params[edge]["segment"]["att"]
            scores = jnp.einsum("dbnh,hk,dbmk->dbnm", recv, bil["w"][0], send)
            if "b" in bil:
                scores = scores + bil["b"][0]
            scores = jax.nn.relu(scores)
        return masked_softmax(scores, mask)

    # Distance tensors (distance-based attention): time-major, fwd + flipped
    # bwd stacked on a direction axis; dummies threaded when absent (static
    # Python flags decide whether an edge reads them).
    def dist_stack(d):
        if d is None:
            return jnp.zeros((t, 2, 1, 1, 1), dtype)
        d_t = jnp.moveaxis(d, 1, 0)
        return jnp.stack([d_t, d_t[::-1]], axis=1)          # (T, 2, B, R, S)

    use_dists = not mean_pooling and any(
        d is not None for d in (hh_dists, ho_dists, oo_dists))
    d_hh, d_ho, d_oo = dist_stack(hh_dists), dist_stack(ho_dists), dist_stack(oo_dists)

    seg_h0, seg_o0 = seg_carry
    h_h0 = seg_h0 if seg_h0 is not None else jnp.zeros((b, num_humans, h), dtype)
    h_o0 = seg_o0 if seg_o0 is not None else jnp.zeros((b, num_objects, h), dtype)
    init = (jnp.stack([h_h0, jnp.zeros_like(h_h0)]),       # (2dir, B, H, h)
            jnp.stack([h_o0, jnp.zeros_like(h_o0)]))       # (2dir, B, O, h)

    def step(carry, inp):
        h_h2, h_o2 = carry                                  # (2,B,H,h), (2,B,O,h)
        gi4_i, u4_i, d_hh_i, d_ho_i, d_oo_i = inp           # (4,B,E,3h), (4,B,E), dists
        if not use_dists:
            d_hh_e = d_oh_e = d_ho_e = d_oo_e = None
        else:
            d_hh_e = d_hh_i if hh_dists is not None else None
            d_oh_e = d_ho_i if ho_dists is not None else None
            d_ho_e = (jnp.swapaxes(d_ho_i, -1, -2)
                      if ho_dists is not None else None)
            d_oo_e = d_oo_i if oo_dists is not None else None
        # Messages from each sender type: 2 edges x 2 directions in one matmul.
        m_h = jax.nn.relu(jnp.einsum("dbnh,ehk->edbnk", h_h2, w_from_h) + b_from_h)
        m_o = jax.nn.relu(jnp.einsum("dbnh,ehk->edbnk", h_o2, w_from_o) + b_from_o)
        # Attention per edge (style-dispatched), masked softmax over senders.
        a_hh = edge_attention(h_h2, h_h2, (1.0 - eye_h)[None, None], "h2h", d_hh_e)
        mg_hh = jnp.einsum("dbnm,dbmh->dbnh", a_hh, m_h[0])
        a_oh = edge_attention(h_h2, h_o2, obj_mask_r, "o2h", d_oh_e)
        mg_oh = jnp.einsum("dbnm,dbmh->dbnh", a_oh, m_o[0])
        a_ho = edge_attention(h_o2, h_h2,
                              jnp.ones((1, 1, num_objects, num_humans), dtype),
                              "h2o", d_ho_e)
        mg_ho = jnp.einsum("dbnm,dbmh->dbnh", a_ho, m_h[1])
        a_oo = edge_attention(h_o2, h_o2, obj_mask_r * (1.0 - eye_o)[None, None],
                              "o2o", d_oo_e)
        mg_oo = jnp.einsum("dbnm,dbmh->dbnh", a_oo, m_o[1])
        if mean_pooling:
            # The general path records no attention under mean pooling.
            a_oh = jnp.zeros((2, b, num_humans, num_objects), dtype)

        msgs_h = jnp.concatenate([mg_hh, mg_oh], axis=-1)    # (2,B,H,2h)
        msgs_o = jnp.concatenate([mg_ho, mg_oo], axis=-1)    # (2,B,O,2h)
        msgs4 = jnp.concatenate([pad_e(msgs_h, e_max), pad_e(msgs_o, e_max)], axis=0)

        states4 = jnp.concatenate([pad_e(h_h2, e_max), pad_e(h_o2, e_max)], axis=0)
        gi = gi4_i + jnp.einsum("sbnf,sfk->sbnk", msgs4, w_msg_gates4)
        gh = jnp.einsum("sbnh,shk->sbnk", states4, w_hh4) + b_hh4[:, None, None]
        i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(i_r + h_r)
        z = jax.nn.sigmoid(i_z + h_z)
        n = jnp.tanh(i_n + r * h_n)
        h_new = (1.0 - z) * n + z * states4
        u = u4_i[..., None]
        out4 = u * h_new + (1.0 - u) * states4
        h_h2_n = out4[:2, :, :num_humans]
        h_o2_n = out4[2:, :, :num_objects]
        return (h_h2_n, h_o2_n), (h_h2_n, h_o2_n, a_oh)

    body = _remat_step(step, cfg) if cfg.remat_segment_scan else step
    _, (h_h_seq, h_o_seq, att_seq) = jax.lax.scan(body, init,
                                                  (gi4, u4, d_hh, d_ho, d_oo),
                                                  unroll=cfg.scan_unroll)

    def order(seq, idx_f, idx_b):
        fwd = jnp.moveaxis(seq[:, idx_f], 0, 1)
        bwd = jnp.moveaxis(seq[::-1, idx_b], 0, 1)
        return jnp.concatenate([fwd, bwd], axis=-1)

    hx_hs = order(h_h_seq, 0, 1)
    hx_os = order(h_o_seq, 0, 1)
    att_seg_f = jnp.moveaxis(att_seq[:, 0], 0, 1)            # (B,T,H,O)
    att_seg_b = jnp.moveaxis(att_seq[::-1, 1], 0, 1)
    return hx_hs, hx_os, att_seg_f, att_seg_b


def _segment_scan(params, cfg: TGGCNConfig, x_hs, x_os, u_h, u_o, objects_mask,
                  hh_dists, ho_dists, oo_dists, seg_carry=(None, None)):
    """Gated bidirectional segment-level GRU over time.

    One lax.scan processes forward step tf=i and backward step tb=T-1-i in
    lockstep (the reference's paired loop, models.py:785-880). All segment
    messages read the carry (states committed through the previous step);
    the carry commits at the end of the scan body.

    Returns (hx_hs (B,T,H,2h), hx_os (B,T,O,2h), att_seg_fwd, att_seg_bwd).
    """
    b, t, num_humans, _ = x_hs.shape
    num_objects = x_os.shape[2]
    h = cfg.hidden_size
    mkw = cfg.message_kwargs()
    msg_seg = cfg.message_segment
    dtype = x_hs.dtype

    # Hoist the input-side GRU projections of the precomputed (non-message)
    # part out of the scan: one large (B*T*E, F) @ (F, 3h) MXU matmul each.
    def base_gates(cell, x):
        w = params[cell]["w_ih"]
        base_dim = x.shape[-1]
        gi = x @ w[:base_dim]
        if "b_ih" in params[cell]:
            gi = gi + params[cell]["b_ih"]
        return gi

    gi_hf = base_gates("human_segment_rnn_fcell", x_hs)   # (B, T, H, 3h)
    gi_hb = base_gates("human_segment_rnn_bcell", x_hs)
    gi_of = base_gates("object_segment_rnn_fcell", x_os)
    gi_ob = base_gates("object_segment_rnn_bcell", x_os)

    def msg_gates(cell, msgs, base_dim):
        w = params[cell]["w_ih"]
        return msgs @ w[base_dim:]

    # Time-major inputs for the scan.
    tm = lambda a: jnp.moveaxis(a, 1, 0) if a is not None else None
    gi_hf_t, gi_hb_t = tm(gi_hf), tm(gi_hb)
    gi_of_t, gi_ob_t = tm(gi_of), tm(gi_ob)
    u_h_t, u_o_t = tm(u_h), tm(u_o)
    hh_t, ho_t, oo_t = tm(hh_dists), tm(ho_dists), tm(oo_dists)

    base_h = x_hs.shape[-1]
    base_o = x_os.shape[-1]

    def seg_message(name, receiver_states, sender_states, mask, exclude_self=False, dists=None):
        return compute_message_features(params[name]["segment"], receiver_states, sender_states,
                                        mask, exclude_self=exclude_self, distances=dists, **mkw)

    def entity_step(cell, gi_base, msgs, u, h_prev):
        gi = gi_base
        if msgs is not None:
            gi = gi + msg_gates(cell, msgs, base_h if "human" in cell else base_o)
        h_new = gru_step_from_gates(params[cell], gi, h_prev)
        u = u[..., None]
        return u * h_new + (1.0 - u) * h_prev

    obj_mask_r = objects_mask[:, None, :]  # (B, 1, O) broadcast over receivers

    def step(carry, inp):
        h_hf_c, h_hb_c, h_of_c, h_ob_c = carry
        (gi_hf_i, gi_of_i, u_h_i, u_o_i,
         gi_hb_i, gi_ob_i, u_h_bi, u_o_bi,
         hh_f, ho_f, oo_f, hh_b, ho_b, oo_b) = inp

        att_f = att_b = jnp.zeros((b, num_humans, num_objects), dtype=dtype)

        def seg_msgs_for_humans(h_h_c, h_o_c, hh_d, ho_d):
            msgs, att = None, None
            if msg_seg:
                parts = []
                if cfg.message_humans_to_human:
                    mg_hh, _ = seg_message("h2h", h_h_c, h_h_c, None,
                                           exclude_self=True, dists=hh_d)
                    parts.append(mg_hh)
                if cfg.message_objects_to_human:
                    mg_oh, att = seg_message("o2h", h_h_c, h_o_c, obj_mask_r, dists=ho_d)
                    parts.append(mg_oh)
                if parts:
                    msgs = jnp.concatenate(parts, axis=-1)
            return msgs, att

        def seg_msgs_for_objects(h_o_c, h_h_c, oh_d, oo_d):
            msgs = None
            if msg_seg:
                parts = []
                if cfg.message_human_to_objects:
                    mg_ho, _ = seg_message("h2o", h_o_c, h_h_c, None, dists=oh_d)
                    parts.append(mg_ho)
                if cfg.message_objects_to_object:
                    mg_oo, _ = seg_message("o2o", h_o_c, h_o_c, obj_mask_r,
                                           exclude_self=True, dists=oo_d)
                    parts.append(mg_oo)
                if parts:
                    msgs = jnp.concatenate(parts, axis=-1)
            return msgs

        oh_f = jnp.swapaxes(ho_f, 1, 2) if ho_f is not None else None
        oh_b = jnp.swapaxes(ho_b, 1, 2) if ho_b is not None else None

        msgs_hf, a_f = seg_msgs_for_humans(h_hf_c, h_of_c, hh_f, ho_f)
        msgs_hb, a_b = seg_msgs_for_humans(h_hb_c, h_ob_c, hh_b, ho_b)
        msgs_of = seg_msgs_for_objects(h_of_c, h_hf_c, oh_f, oo_f)
        msgs_ob = seg_msgs_for_objects(h_ob_c, h_hb_c, oh_b, oo_b)
        if a_f is not None:
            att_f = a_f
        if a_b is not None:
            att_b = a_b

        h_hf_n = entity_step("human_segment_rnn_fcell", gi_hf_i, msgs_hf, u_h_i, h_hf_c)
        h_hb_n = entity_step("human_segment_rnn_bcell", gi_hb_i, msgs_hb, u_h_bi, h_hb_c)
        h_of_n = entity_step("object_segment_rnn_fcell", gi_of_i, msgs_of, u_o_i, h_of_c)
        h_ob_n = entity_step("object_segment_rnn_bcell", gi_ob_i, msgs_ob, u_o_bi, h_ob_c)

        return (h_hf_n, h_hb_n, h_of_n, h_ob_n), (h_hf_n, h_hb_n, h_of_n, h_ob_n, att_f, att_b)

    seg_h0, seg_o0 = seg_carry
    init = (seg_h0 if seg_h0 is not None else jnp.zeros((b, num_humans, h), dtype=dtype),
            jnp.zeros((b, num_humans, h), dtype=dtype),
            seg_o0 if seg_o0 is not None else jnp.zeros((b, num_objects, h), dtype=dtype),
            jnp.zeros((b, num_objects, h), dtype=dtype))

    def rev(a):
        return a[::-1]

    # Distance tensors may be None -> thread dummy (T,1,1,1) zeros through
    # the scan and use static Python flags to decide whether they are read.
    zero3 = jnp.zeros((t, 1, 1, 1), dtype=dtype)
    hh_t_f = hh_t if hh_t is not None else zero3
    ho_t_f = ho_t if ho_t is not None else zero3
    oo_t_f = oo_t if oo_t is not None else zero3
    hh_t_b, ho_t_b, oo_t_b = rev(hh_t_f), rev(ho_t_f), rev(oo_t_f)

    def maybe(d, flag):
        return d if flag else None

    # Build the scan with closures over which dists exist (static).
    def step_wrapper(carry, inp):
        (gi_hf_i, gi_of_i, u_h_i, u_o_i, gi_hb_i, gi_ob_i, u_h_bi, u_o_bi,
         hh_f, ho_f, oo_f, hh_b, ho_b, oo_b) = inp
        return step(carry, (gi_hf_i, gi_of_i, u_h_i, u_o_i,
                            gi_hb_i, gi_ob_i, u_h_bi, u_o_bi,
                            maybe(hh_f, hh_t is not None), maybe(ho_f, ho_t is not None),
                            maybe(oo_f, oo_t is not None), maybe(hh_b, hh_t is not None),
                            maybe(ho_b, ho_t is not None), maybe(oo_b, oo_t is not None)))

    xs = (gi_hf_t, gi_of_t, u_h_t, u_o_t,
          rev(gi_hb_t), rev(gi_ob_t), rev(u_h_t), rev(u_o_t),
          hh_t_f, ho_t_f, oo_t_f, hh_t_b, ho_t_b, oo_t_b)
    if cfg.remat_segment_scan:
        step_wrapper = _remat_step(step_wrapper, cfg)
    _, (h_hf_seq, h_hb_seq, h_of_seq, h_ob_seq, att_f_seq, att_b_seq) = \
        jax.lax.scan(step_wrapper, init, xs)

    # Forward outputs are time-ordered; backward outputs were produced at
    # tb = T-1-i and must be flipped back to time order.
    def order(fwd_seq, bwd_seq):
        fwd = jnp.moveaxis(fwd_seq, 0, 1)           # (B, T, E, h)
        bwd = jnp.moveaxis(bwd_seq[::-1], 0, 1)
        return jnp.concatenate([fwd, bwd], axis=-1)

    hx_hs = order(h_hf_seq, h_hb_seq)
    hx_os = order(h_of_seq, h_ob_seq)
    att_seg_f = jnp.moveaxis(att_f_seq, 0, 1)       # (B, T, H, O)
    att_seg_b = jnp.moveaxis(att_b_seq[::-1], 0, 1)
    return hx_hs, hx_os, att_seg_f, att_seg_b
