"""Golden parity for CAD120Baseline / BimanualBaseline vs the reference."""

import glob
import os

import numpy as np
import pytest

from tggcn.compat import baseline_params_from_torch_state_dict
from tggcn.models.baselines import BaselineConfig, apply_baseline

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
FIXTURES = sorted(glob.glob(os.path.join(GOLDEN_DIR, "baseline_*.npz")))


@pytest.mark.skipif(not FIXTURES, reason="baseline golden fixtures not generated")
@pytest.mark.parametrize("path", FIXTURES, ids=[os.path.basename(p)[:-4] for p in FIXTURES])
def test_baseline_matches_reference(path):
    data = np.load(path)
    inputs = {k.split("::")[1]: data[k] for k in data.files if k.startswith("input::")}
    weights = {k.split("::")[1]: data[k] for k in data.files if k.startswith("weight::")}
    ref_outputs = [data[f"output::{i}"] for i in range(len(
        [k for k in data.files if k.startswith("output::")]))]
    with_object_head = "cad120" in os.path.basename(path)
    cfg = BaselineConfig(input_size=(2124, 2048),
                         num_classes=(10, 12) if with_object_head else (14, None),
                         hidden_size=16, with_object_head=with_object_head)
    params = baseline_params_from_torch_state_dict(weights)
    outputs = apply_baseline(params, cfg, inputs["x_human"], inputs["x_objects"],
                             inputs["objects_mask"])
    assert len(outputs) == len(ref_outputs)
    for i, (got, want) in enumerate(zip(outputs, ref_outputs)):
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5,
                                   err_msg=f"output {i}")
