"""Loss primitives and per-model loss-bundle selection.

Numerical parity with reference pyrutils/torch/losses.py:7-51 and the bundle
construction in vhoi/losses.py:8-112 (same functions, weights, ordering and
loss names — predict-time output slicing depends on this ordering).

All primitives are jit-safe: the reference's ``num_nonmissing == 0`` early
returns become ``where`` guards.
"""

from functools import partial
from typing import List

import jax.numpy as jnp


def nll_loss(log_probs: jnp.ndarray, target: jnp.ndarray, ignore_index: int = -1,
             reduction: str = "mean") -> jnp.ndarray:
    """NLL over log-probabilities, torch layout (B, C, d1, ...) vs (B, d1, ...)."""
    mask = (target != ignore_index)
    safe_target = jnp.where(mask, target, 0)
    gathered = jnp.take_along_axis(log_probs, safe_target[:, None].astype(jnp.int32),
                                   axis=1)[:, 0]
    losses = -gathered * mask
    if reduction == "sum":
        return jnp.sum(losses)
    count = jnp.sum(mask)
    return jnp.where(count > 0, jnp.sum(losses) / jnp.maximum(count, 1), 0.0)


def _bce_elementwise(x, t):
    # torch F.binary_cross_entropy clamps each log term at -100.
    log_x = jnp.clip(jnp.log(x), min=-100.0)
    log_1mx = jnp.clip(jnp.log(1.0 - x), min=-100.0)
    return -(t * log_x + (1.0 - t) * log_1mx)


def binary_cross_entropy_loss(input: jnp.ndarray, target: jnp.ndarray,
                              positive_class_weight: float = 1, ignore_value: float = -1,
                              reduction: str = "mean") -> jnp.ndarray:
    """Masked BCE with renormalisation by the non-missing fraction."""
    mask = (target != ignore_value).astype(input.dtype)
    num_nonmissing = jnp.sum(mask)
    if positive_class_weight > 1:
        input = jnp.where(target == 1.0, input ** positive_class_weight, input)
    criterion = jnp.mean(_bce_elementwise(input * mask, target * mask))
    criterion = criterion * input.size / jnp.maximum(num_nonmissing, 1.0)
    return jnp.where(num_nonmissing > 0, criterion, 0.0)


def budget_loss(input: jnp.ndarray, target: jnp.ndarray, ignore_value: float = -1,
                reduction: str = "mean") -> jnp.ndarray:
    """Regulariser toward zero soft decisions (mask from the target)."""
    mask = (target != ignore_value).astype(input.dtype)
    num_nonmissing = jnp.sum(mask)
    criterion = jnp.mean(input * mask) * input.size / jnp.maximum(num_nonmissing, 1.0)
    return jnp.where(num_nonmissing > 0, criterion, 0.0)


def multi_task_loss(input: list, target: list, loss_functions: list, weight: list = None,
                    ignore_value=-1, reduction: str = "mean") -> List[jnp.ndarray]:
    """Apply each loss function to its (output, target) pair with its weight."""
    if weight is None:
        weight = [1.0] * len(input)
    criteria = []
    for input_, target_, loss_function, w in zip(input, target, loss_functions, weight):
        if loss_function is nll_loss:
            criterion = w * loss_function(input_, target_, ignore_index=ignore_value,
                                          reduction=reduction)
        else:
            criterion = w * loss_function(input_, target_, ignore_value=ignore_value,
                                          reduction=reduction)
        criteria.append(criterion)
    return criteria


def select_loss(model_name: str, model_input_type: str, dataset_name: str, cfg):
    """Build (criterion, loss_names) for a model/dataset (reference vhoi/losses.py:8-70)."""
    if model_name == "2G-GCN":
        misc = cfg.get("misc", default_value={})
        hb_weight = ob_weight = 0.0
        if misc.get("budget_loss", {}).get("add", False):
            hb_weight = misc.get("budget_loss", {}).get("human_weight", 1.0)
            ob_weight = misc.get("budget_loss", {}).get("object_weight", 1.0)
        weight = [hb_weight, ob_weight] if dataset_name == "cad120" else [hb_weight]

        hs_weight = os_weight = 0.0
        s_weight = misc.get("segmentation_loss", {}).get("weight", 1.0)
        add_segmentation_loss = misc.get("segmentation_loss", {}).get("add", False)
        if add_segmentation_loss and not misc.get("input_human_segmentation", False):
            hs_weight = s_weight
        if add_segmentation_loss and not misc.get("input_object_segmentation", False):
            os_weight = s_weight
        if dataset_name == "cad120":
            weight += [hs_weight, os_weight]
        else:
            weight += [hs_weight]
        if add_segmentation_loss and misc.get("segmentation_loss", {}).get("pretrain", False):
            weight_val = 0.0
        else:
            weight_val = 1.0
        anticipation_loss_weight = misc.get("anticipation_loss_weight", 1.0)
        fl_loss_weight = misc.get("first_level_loss_weight", 0.0)
        if dataset_name == "cad120":
            weight += [fl_loss_weight] * 4
            weight += [weight_val, anticipation_loss_weight, weight_val, anticipation_loss_weight]
            criterion = partial(multi_task_loss,
                                loss_functions=(budget_loss, budget_loss,
                                                binary_cross_entropy_loss, binary_cross_entropy_loss,
                                                nll_loss, nll_loss, nll_loss, nll_loss,
                                                nll_loss, nll_loss, nll_loss, nll_loss),
                                weight=weight)
            loss_names = ["B_HS", "B_OS", "BCE_HS", "BCE_OS",
                          "NLL_SAR_F", "NLL_SAP_F", "NLL_OAR_F", "NLL_OAP_F",
                          "NLL_SAR", "NLL_SAP", "NLL_OAR", "NLL_OAP"]
        else:
            weight += [fl_loss_weight] * 2
            weight += [weight_val, anticipation_loss_weight]
            criterion = partial(multi_task_loss,
                                loss_functions=(budget_loss, binary_cross_entropy_loss,
                                                nll_loss, nll_loss, nll_loss, nll_loss),
                                weight=weight)
            loss_names = ["B_HS", "BCE_HS", "NLL_SAR_F", "NLL_SAP_F", "NLL_SAR", "NLL_SAP"]
    elif model_name == "bimanual_baseline":
        criterion = partial(multi_task_loss, loss_functions=(nll_loss,))
        loss_names = ["NLL_SAR"]
    elif model_name == "cad120_baseline":
        criterion = partial(multi_task_loss, loss_functions=(nll_loss, nll_loss))
        loss_names = ["NLL_SAR", "NLL_OAR"]
    else:
        raise ValueError(f"Unknown model {model_name}")
    return criterion, loss_names


def select_loss_types(model_name: str, dataset_name: str, cfg):
    if model_name != "2G-GCN":
        raise ValueError(f"Multi-task learning option not implemented for {model_name}")
    if dataset_name == "cad120":
        return ["budget"] * 2 + ["bce"] * 2 + ["softmax"] * 8
    return ["budget", "bce"] + ["softmax"] * 4


def select_loss_learning_mask(model_name: str, dataset_name: str, cfg):
    if model_name != "2G-GCN":
        raise ValueError(f"Multi-task learning option not implemented for {model_name}")
    if dataset_name == "cad120":
        return [False] * 4 + [True] * 8
    return [False] * 2 + [True] * 4


def decide_num_main_losses(model_name: str, dataset_name: str, misc_dict: dict):
    """Tail slice of the loss list used for model selection & eval (reference :103-112)."""
    if model_name != "2G-GCN":
        return None
    add = misc_dict.get("segmentation_loss", {}).get("add", False)
    pretrain = misc_dict.get("segmentation_loss", {}).get("pretrain", False)
    if add and pretrain:
        return 10 if dataset_name == "cad120" else 5
    return 4 if dataset_name == "cad120" else 2


def extract_value(cfg, group, key, default=False):
    try:
        value = cfg[group][key]
    except (KeyError, TypeError):
        value = default
    return value
