"""Multi-task loss weighting via learned uncertainty (Kendall et al. 2018).

Functional re-expression of the reference MultiTaskLossLearner
(pyrutils/torch/multi_task.py:10-75): a learnable log-sigma per loss; softmax
losses get weight exp(-2 log_sd), mse 0.5 exp(-2 log_sd), mae
sqrt(2) exp(-log_sd); a +log_sd regulariser is added; a static boolean mask
selects which losses are learnable.
"""

import math
from typing import List, Optional

import jax.numpy as jnp

_VALID = {"mae", "mean_absolute_error", "mse", "mean_squared_error", "softmax",
          "budget", "bce"}


def init_mtll(loss_types: List[str], mask: Optional[List[bool]] = None) -> dict:
    for loss_type in loss_types:
        if loss_type not in _VALID:
            raise ValueError("loss_type must be one of 'softmax', 'mae' or 'mse'.")
    return {
        "log_sds": jnp.zeros(len(loss_types), dtype=jnp.float32),
        "loss_types": tuple(loss_types),
        "mask": tuple(mask) if mask is not None else tuple([True] * len(loss_types)),
    }


def _loss_weight(loss_type: str, log_sd):
    if loss_type in {"mae", "mean_absolute_error"}:
        return math.sqrt(2.0) * jnp.exp(-log_sd)
    if loss_type in {"mse", "mean_squared_error"}:
        return 0.5 * jnp.exp(-2 * log_sd)
    # softmax-type (the reference treats 'budget'/'bce' entries as
    # non-learnable via the mask, so only 'softmax' weighting is exercised).
    return jnp.exp(-2 * log_sd)


def apply_mtll(log_sds: jnp.ndarray, loss_types, mask, losses: List[jnp.ndarray]):
    """Weight each learnable loss and add its log-sigma regulariser."""
    assert len(loss_types) == len(losses), \
        "Specified loss types must match the number of input losses."
    weighted = []
    for i, (loss_type, loss, learnable) in enumerate(zip(loss_types, losses, mask)):
        if learnable:
            weighted.append(_loss_weight(loss_type, log_sds[i]) * loss + log_sds[i])
        else:
            weighted.append(loss)
    return weighted


def mtll_weights(log_sds, loss_types, mask) -> List[Optional[float]]:
    """Current learned weights (None for non-learnable entries)."""
    out = []
    for i, (loss_type, learnable) in enumerate(zip(loss_types, mask)):
        out.append(float(_loss_weight(loss_type, log_sds[i])) if learnable else None)
    return out
