"""Training-trajectory parity against the reference optimizer loop.

Fixtures (tests/golden/training_*.npz, produced by tools/make_golden.py)
record the reference's per-step per-loss values and final weights after
several Adam steps (forward + full loss bundle + backward + optional global
clip, pyrutils/torch/train_utils.py:143-154). The JAX train step
(tggcn/train/loop.py make_train_step) must reproduce the loss trajectory and
the final parameters — pinning backward/STE/losses/clipping/Adam wiring, not
just the forward pass.
"""

import glob
import json
import os

import jax
import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
FIXTURES = sorted(glob.glob(os.path.join(GOLDEN_DIR, "training_*.npz")))


def load_fixture(path):
    data = np.load(path)
    inputs, targets, weights0, weightsN = {}, {}, {}, {}
    spec, extras = None, {}
    for key in data.files:
        kind, _, name = key.partition("::")
        if kind == "input":
            inputs[name] = data[key]
        elif kind == "target":
            targets[int(name)] = data[key]
        elif kind == "weight0":
            weights0[name] = data[key]
        elif kind == "weightN":
            weightsN[name] = data[key]
        elif key == "meta::spec":
            spec = json.loads(bytes(data[key]).decode())
        elif key == "mtll_log_sdsN":
            extras["mtll_log_sdsN"] = data[key]
    targets = [targets[i] for i in sorted(targets)]
    return inputs, targets, data["losses"], weights0, weightsN, spec, extras


@pytest.mark.skipif(not FIXTURES, reason="training fixtures not generated")
@pytest.mark.parametrize("path", FIXTURES,
                         ids=[os.path.basename(p)[:-4] for p in FIXTURES])
def test_training_trajectory_matches_reference(path):
    import optax

    from tggcn.compat import tggcn_params_from_torch_state_dict
    from tggcn.config import Config
    from tggcn.data.loading import (
        select_model_data_feeder,
        select_model_data_fetcher,
    )
    from tggcn.models import select_model
    from tggcn.models.tggcn import TGGCNConfig
    from tggcn.train.loop import make_train_step
    from tggcn.train.losses import select_loss

    inputs, targets, ref_losses, weights0, weightsN, spec, extras = \
        load_fixture(path)
    dataset = spec["dataset"]
    model_kwargs = dict(spec["model_kwargs"])
    model_kwargs["input_size"] = tuple(model_kwargs["input_size"])
    model_kwargs["num_classes"] = tuple(model_kwargs["num_classes"])

    model = select_model("2G-GCN", **model_kwargs)
    cfg = TGGCNConfig.from_kwargs(**model_kwargs)
    params = tggcn_params_from_torch_state_dict(weights0, cfg)

    criterion, _names = select_loss("2G-GCN", "multiple", dataset,
                                    cfg=Config({"misc": spec["misc"]}))
    feeder = select_model_data_feeder("2G-GCN", "multiple", dataset_name=dataset)
    fetcher = select_model_data_fetcher("2G-GCN", "multiple", dataset_name=dataset)
    # torch.optim.Adam defaults: betas (0.9, 0.999), eps 1e-8.
    optimizer = optax.adam(spec["lr"], b1=0.9, b2=0.999, eps=1e-8)
    mtll = None
    if spec.get("mtll"):
        # MTLL log-sigmas train alongside the model (reference train.py:42-46);
        # the recorded trajectory is the post-MTLL losses.
        from tggcn.train.losses import (select_loss_learning_mask,
                                        select_loss_types)
        from tggcn.train.multi_task import init_mtll

        mtll = init_mtll(select_loss_types("2G-GCN", dataset, None),
                         select_loss_learning_mask("2G-GCN", dataset, None))
    step = make_train_step(model, feeder, criterion, optimizer,
                           clip_gradient_at=spec["clip"], mtll=mtll)

    b, t = inputs["x_human"].shape[:2]
    num_humans = inputs["x_human"].shape[2]
    num_objects = inputs["x_objects"].shape[2]
    hseg = np.ones((b, t, num_humans), dtype=np.float32)
    placeholder = np.zeros((b, 1, 1, 1), dtype=np.float32)
    if dataset == "cad120":
        oseg = np.ones((b, t, num_objects), dtype=np.float32)
        batch = [inputs["x_human"], inputs["x_objects"], inputs["objects_mask"],
                 hseg, oseg, placeholder, placeholder,
                 inputs["steps_per_example"]]
    else:
        batch = [inputs["x_human"], inputs["x_objects"], inputs["objects_mask"],
                 hseg, placeholder, placeholder, placeholder,
                 inputs["steps_per_example"]]
    batch = batch + targets
    data, target_arrays = fetcher(batch)

    trainable = {"model": params}
    if mtll is not None:
        trainable["mtll"] = mtll["log_sds"]
    opt_state = optimizer.init(trainable)
    got_losses = []
    for _ in range(spec["steps"]):
        trainable, opt_state, losses, _raw = step(
            trainable, opt_state, jax.random.PRNGKey(0), data, target_arrays)
        got_losses.append(np.asarray(losses))
    got_losses = np.asarray(got_losses)

    # Per-step, per-loss trajectory (fp32 across frameworks). Divergence
    # compounds through the optimizer state: the long-horizon fixture (18
    # steps) showed per-step deviation growing roughly linearly, so the
    # tolerance widens per step from the 5e-3/5e-4 base that the 5-step
    # fixtures meet with slack.
    for s in range(got_losses.shape[0]):
        widen = 1.0 + 0.5 * s
        np.testing.assert_allclose(
            got_losses[s], ref_losses[s], rtol=5e-3 * widen, atol=5e-4 * widen,
            err_msg=f"loss trajectory step {s} of {os.path.basename(path)}")

    if mtll is not None:
        np.testing.assert_allclose(
            np.asarray(trainable["mtll"]), extras["mtll_log_sdsN"],
            rtol=0, atol=1e-3,
            err_msg=f"mtll log_sds of {os.path.basename(path)}")

    # Final weights after `steps` Adam updates.
    want = tggcn_params_from_torch_state_dict(weightsN, cfg)
    got_by_path = {jax.tree_util.keystr(k): v for k, v in
                   jax.tree_util.tree_flatten_with_path(trainable["model"])[0]}
    for key_path, want_leaf in jax.tree_util.tree_flatten_with_path(want)[0]:
        key = jax.tree_util.keystr(key_path)
        np.testing.assert_allclose(
            np.asarray(got_by_path[key]), np.asarray(want_leaf), rtol=0,
            atol=1e-3, err_msg=f"weight {key} of {os.path.basename(path)}")
