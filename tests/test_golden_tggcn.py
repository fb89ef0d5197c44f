"""End-to-end numerical parity of the TGGCN forward against the reference.

Fixtures in tests/golden/ were produced by tools/make_golden.py running the
upstream PyTorch implementation on synthetic inputs. Each test converts the
stored torch weights via tggcn.compat and requires the JAX forward to
reproduce every output tensor.
"""

import glob
import json
import os

import jax
import numpy as np
import pytest

from tggcn.compat import tggcn_params_from_torch_state_dict
from tggcn.models.tggcn import TGGCNConfig, apply_tggcn

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
FIXTURES = sorted(p for p in glob.glob(os.path.join(GOLDEN_DIR, "*.npz"))
                  if not os.path.basename(p).startswith(("baseline_", "training_")))


def load_fixture(path):
    data = np.load(path)
    inputs, outputs, weights, attention = {}, {}, {}, {}
    model_kwargs, train_mode = None, False
    for key in data.files:
        kind, _, name = key.partition("::")
        if kind == "input":
            inputs[name] = data[key]
        elif kind == "output":
            outputs[int(name)] = data[key]
        elif kind == "weight":
            weights[name] = data[key]
        elif kind == "attention":
            attention[int(name)] = data[key]
        elif key == "meta::model_kwargs":
            model_kwargs = json.loads(bytes(data[key]).decode())
        elif key == "meta::train_mode":
            train_mode = bool(data[key][0])
    outputs = [outputs[i] for i in sorted(outputs)]
    attention = [attention[i] for i in sorted(attention)]
    return inputs, outputs, weights, model_kwargs, train_mode, attention


@pytest.mark.skipif(not FIXTURES, reason="golden fixtures not generated")
@pytest.mark.parametrize("path", FIXTURES, ids=[os.path.basename(p)[:-4] for p in FIXTURES])
def test_forward_matches_reference(path):
    (inputs, ref_outputs, weights, model_kwargs, train_mode,
     ref_attention) = load_fixture(path)
    cfg = TGGCNConfig.from_kwargs(**model_kwargs)
    params = tggcn_params_from_torch_state_dict(weights, cfg)
    outputs, aux = apply_tggcn(params, cfg, train=train_mode,
                               rng=jax.random.PRNGKey(0),
                               inspect_model=bool(ref_attention),
                               **{k: v for k, v in inputs.items()})
    assert len(outputs) == len(ref_outputs)
    for i, (got, want) in enumerate(zip(outputs, ref_outputs)):
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-4,
                                   err_msg=f"output {i} of {os.path.basename(path)}")
    if ref_attention:
        # inspect_model parity: stacked (frame, seg-fwd, seg-bwd)
        # human<-object attention scores (vhoi/models.py:927-932).
        got_att = aux["attention_scores"]
        assert len(got_att) == len(ref_attention)
        for i, (got, want) in enumerate(zip(got_att, ref_attention)):
            np.testing.assert_allclose(
                np.asarray(got), want, rtol=2e-3, atol=2e-4,
                err_msg=f"attention {i} of {os.path.basename(path)}")
