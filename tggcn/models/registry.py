"""Model registry: name -> (config builder, init, apply).

Mirrors the reference select_model (vhoi/models.py:1589-1595) with a
functional interface: each entry returns a ModelDef whose ``init(key)``
produces a parameter pytree and ``apply(params, **batch_kwargs)`` runs the
forward pass.
"""

from dataclasses import dataclass
from typing import Any, Callable

from tggcn.models.baselines import BaselineConfig, apply_baseline, init_baseline
from tggcn.models.tggcn import TGGCNConfig, apply_tggcn, init_tggcn


@dataclass(frozen=True)
class ModelDef:
    name: str
    config: Any
    init: Callable
    apply: Callable


def with_config_changes(model: ModelDef, **changes) -> ModelDef:
    """Rebuild a TGGCN ModelDef with dataclass-config fields replaced.

    The init/apply closures capture the config, so replacing
    ``model.config`` alone would not change behaviour — this re-closes them
    over the new config. Parameter pytrees are identical across all
    currently replaceable fields (kernel routing / precision knobs), so
    existing params stay valid.
    """
    import dataclasses

    from tggcn.models.tggcn import apply_tggcn, init_tggcn

    if model.name != "2G-GCN":
        raise ValueError(f"with_config_changes only supports 2G-GCN models, got {model.name}")
    cfg = dataclasses.replace(model.config, **changes)
    return ModelDef(model.name, cfg,
                    init=lambda key: init_tggcn(key, cfg),
                    apply=lambda params, **kw: apply_tggcn(params, cfg, **kw))


def resolve_forward_only_kernel_routing(model: ModelDef) -> ModelDef:
    """Resolve segment_kernel_modes='auto' for a forward-only context.

    'auto' is context-dependent: under training only 'dot' — the mode with
    the hand-written Pallas backward — is worth the kernel (the others pay
    kernel-forward + XLA-recompute-backward, measured 0.89-1.01x). Forward
    only, the recompute VJP never runs and the kernel wins EVERY applicable
    mode (measured 1.36-1.70x at B=8 T=167 and 1.11-1.39x at B=1 T=128,
    tools/artifacts/r5_queue/segmodes_fwd*.log), so eval/serving entry
    points call this to upgrade 'auto' -> 'all'. Explicit values ('all', or
    a pinned mode name like 'dot') are left untouched.
    """
    cfg = model.config
    if (getattr(cfg, "use_pallas_segment_scan", False)
            and getattr(cfg, "segment_kernel_modes", "auto") == "auto"):
        return with_config_changes(model, segment_kernel_modes="all")
    return model


def select_model(model_name: str, **model_kwargs) -> ModelDef:
    if model_name == "2G-GCN":
        cfg = TGGCNConfig.from_kwargs(**model_kwargs)
        return ModelDef(model_name, cfg,
                        init=lambda key: init_tggcn(key, cfg),
                        apply=lambda params, **kw: apply_tggcn(params, cfg, **kw))
    if model_name in {"cad120_baseline", "bimanual_baseline"}:
        cfg = BaselineConfig.from_kwargs(with_object_head=model_name == "cad120_baseline",
                                         **model_kwargs)

        def baseline_apply(params, train=False, rng=None, **kw):
            outputs = apply_baseline(params, cfg, kw["x_human"], kw["x_objects"],
                                     kw["objects_mask"], train=train, rng=rng)
            return outputs, {"bn_state": None}

        return ModelDef(model_name, cfg,
                        init=lambda key: init_baseline(key, cfg),
                        apply=baseline_apply)
    raise ValueError(f"Unknown model {model_name}")
