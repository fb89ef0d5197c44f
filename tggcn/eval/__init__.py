"""Evaluation / inference engine behind the predict.py CLI.

Split into:
  rundir    — trained-run-directory discovery (frozen config, checkpoint,
              scalers, class-name dictionaries, sibling CV folds)
  engine    — batched jit inference + label-space post-processing
  reporting — frame metrics, F1@k, cross-validation aggregation, dumps
"""

from tggcn.eval.engine import run_inference
from tggcn.eval.reporting import (
    evaluate_f1_at_k,
    evaluate_predictions,
    print_cross_validation_summary,
)
from tggcn.eval.rundir import RunDir

__all__ = [
    "RunDir",
    "run_inference",
    "evaluate_predictions",
    "evaluate_f1_at_k",
    "print_cross_validation_summary",
]
