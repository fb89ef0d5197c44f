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
