"""Generate golden-parity fixtures by running the REFERENCE implementation.

Runs the upstream PyTorch 2G-GCN (mounted read-only at /root/reference) on
small synthetic inputs and dumps (weights, inputs, outputs) npz fixtures into
tests/golden/. The test suite then loads each fixture, converts the weights
via tggcn.compat, runs the JAX forward, and asserts matching outputs — full
end-to-end numerical parity without copying any reference code.

Usage: python tools/make_golden.py [--reference /root/reference]
"""

import argparse
import json
import os
import sys

import numpy as np

# Repo root on sys.path: the training-fixture generator imports tggcn (for
# the Config shim) even though the trajectories come from the reference.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")


def make_inputs(rng, b, t, num_humans, num_objects, human_width, with_dists, seed_mask=True):
    x_human = rng.normal(size=(b, t, num_humans, human_width)).astype(np.float32)
    x_objects = rng.normal(size=(b, t, num_objects, 2048)).astype(np.float32)
    objects_mask = np.ones((b, num_objects), dtype=np.float32)
    if seed_mask and num_objects > 1:
        objects_mask[0, -1] = 0.0
    steps = np.full((b,), float(t), dtype=np.float32)
    steps[0] = max(t - 2, 1)
    out = {
        "x_human": x_human, "x_objects": x_objects, "objects_mask": objects_mask,
        "steps_per_example": steps,
    }
    if with_dists:
        out["human_human_distances"] = rng.uniform(
            0.05, 2.0, size=(b, t, num_humans, num_humans)).astype(np.float32)
        out["human_object_distances"] = rng.uniform(
            0.05, 2.0, size=(b, t, num_humans, num_objects)).astype(np.float32)
        out["object_object_distances"] = rng.uniform(
            0.05, 2.0, size=(b, t, num_objects, num_objects)).astype(np.float32)
    return out


SCENARIOS = {
    # name: (model kwargs, input shape info, forward extras)
    "cad120_st": (
        dict(hidden_size=24, gcn_node=19, message_humans_to_human=False,
             message_segment=True, message_type="v2", message_granularity="v1",
             message_aggregation="att", attention_style="v3",
             discrete_optimization_strategy="st",
             object_segment_update_strategy="ind", update_segment_threshold=0.5,
             num_classes=(10, 12)),
        dict(b=2, t=7, num_humans=1, num_objects=3, human_width=2124, with_dists=False),
        dict(),
    ),
    "cad120_gt_seg": (
        dict(hidden_size=24, gcn_node=19, message_humans_to_human=False,
             message_segment=True, message_type="v2", message_granularity="v1",
             message_aggregation="att", attention_style="v3",
             discrete_optimization_strategy="st",
             object_segment_update_strategy="ind", num_classes=(10, 12)),
        dict(b=2, t=7, num_humans=1, num_objects=3, human_width=2124, with_dists=False),
        dict(gt_segmentation=True),
    ),
    "cad120_filter": (
        dict(hidden_size=24, gcn_node=19, message_humans_to_human=False,
             message_segment=True, message_type="v2", message_granularity="v1",
             message_aggregation="att", attention_style="v3",
             discrete_optimization_strategy="st", filter_discrete_updates=True,
             object_segment_update_strategy="ind", update_segment_threshold=0.1,
             num_classes=(10, 12)),
        dict(b=2, t=7, num_humans=1, num_objects=3, human_width=2124, with_dists=False),
        dict(),
    ),
    "cad120_sah_relational_mp": (
        dict(hidden_size=24, gcn_node=19, message_humans_to_human=False,
             message_segment=True, message_type="v1", message_granularity="v2",
             message_aggregation="mp", attention_style="v1",
             discrete_optimization_strategy="st",
             object_segment_update_strategy="sah", num_classes=(10, 12)),
        dict(b=2, t=6, num_humans=1, num_objects=2, human_width=2124, with_dists=False),
        dict(),
    ),
    "mphoi_st": (
        dict(hidden_size=24, gcn_node=26, message_humans_to_human=True,
             message_segment=True, message_type="v2", message_granularity="v1",
             message_aggregation="att", attention_style="v3",
             discrete_optimization_strategy="st",
             object_segment_update_strategy="ind", num_classes=(13, None)),
        dict(b=2, t=6, num_humans=2, num_objects=4, human_width=2152, with_dists=False),
        # inspect_model: also record the stacked (frame, seg-fwd, seg-bwd)
        # human<-object attention tensors (vhoi/models.py:927-932).
        dict(inspect=True),
    ),
    "mphoi_dists": (
        dict(hidden_size=24, gcn_node=26, message_humans_to_human=True,
             message_segment=True, message_type="v2", message_granularity="v1",
             message_aggregation="att", attention_style="v3",
             discrete_optimization_strategy="st",
             object_segment_update_strategy="coh", num_classes=(13, None)),
        dict(b=2, t=6, num_humans=2, num_objects=4, human_width=2152, with_dists=True),
        dict(),
    ),
    "bimanual_extras": (
        dict(hidden_size=24, gcn_node=30, message_humans_to_human=True,
             message_segment=True, message_type="v2", message_granularity="v2",
             message_aggregation="att", attention_style="v1",
             discrete_optimization_strategy="st",
             object_segment_update_strategy="ind", num_classes=(14, None),
             cat_level_states=True, add_time_position=True,
             time_position_strategy="s", positional_encoding_style="e",
             add_segment_length=True),
        dict(b=2, t=6, num_humans=2, num_objects=3, human_width=2168, with_dists=False),
        dict(),
    ),
    "mphoi_dot_u_periodic_shared": (
        dict(hidden_size=24, gcn_node=26, message_humans_to_human=True,
             message_segment=True, message_type="v2", message_granularity="v1",
             message_aggregation="att", attention_style="v2",
             discrete_optimization_strategy="st",
             object_segment_update_strategy="ind", num_classes=(13, None),
             add_time_position=True, time_position_strategy="u",
             positional_encoding_style="p", share_level_mlps=True),
        dict(b=2, t=6, num_humans=2, num_objects=3, human_width=2152, with_dists=False),
        dict(),
    ),
    "cad120_specific_mp_geo2h": (
        dict(hidden_size=24, gcn_node=19, message_humans_to_human=False,
             message_segment=True, message_type="v2", message_granularity="v2",
             message_aggregation="mp", attention_style="v3",
             message_geometry_to_human=True,
             discrete_optimization_strategy="st",
             object_segment_update_strategy="coh", num_classes=(10, 12)),
        dict(b=2, t=6, num_humans=1, num_objects=2, human_width=2124, with_dists=False),
        dict(),
    ),
    "bimanual_v4_general": (
        dict(hidden_size=24, gcn_node=30, message_humans_to_human=True,
             message_segment=True, message_type="v2", message_granularity="v1",
             message_aggregation="att", attention_style="v4",
             discrete_optimization_strategy="st",
             object_segment_update_strategy="ind", num_classes=(14, None)),
        dict(b=2, t=6, num_humans=2, num_objects=3, human_width=2168, with_dists=False),
        dict(),
    ),
    # Real-scale hidden width: every other scenario pins parity at hidden 24;
    # this one catches precision/decision-flip divergence that only shows up
    # when the accumulation depth approaches the production configuration.
    "mphoi_hidden128": (
        dict(hidden_size=128, gcn_node=26, message_humans_to_human=True,
             message_segment=True, message_type="v2", message_granularity="v1",
             message_aggregation="att", attention_style="v3",
             discrete_optimization_strategy="st",
             object_segment_update_strategy="ind", num_classes=(13, None)),
        dict(b=1, t=6, num_humans=2, num_objects=4, human_width=2152, with_dists=False),
        dict(),
    ),
    "mphoi_train_bn": (
        dict(hidden_size=24, gcn_node=26, message_humans_to_human=True,
             message_segment=False, message_type="v2", message_granularity="v1",
             message_aggregation="att", attention_style="v3",
             discrete_optimization_strategy="st",
             object_segment_update_strategy="ind", num_classes=(13, None)),
        dict(b=2, t=6, num_humans=2, num_objects=4, human_width=2152, with_dists=False),
        dict(train_mode=True),
    ),
}




TRAIN_SCENARIOS = {
    # Training-trajectory parity: run the REFERENCE train step (Adam + clip +
    # full loss bundle, pyrutils/torch/train_utils.py:143-154) for several
    # steps and record per-step per-loss values + final weights.
    "train_mphoi_st": dict(
        dataset="mphoi",
        model_kwargs=dict(hidden_size=24, gcn_node=26, message_humans_to_human=True,
                          message_segment=True, message_type="v2",
                          message_granularity="v1", message_aggregation="att",
                          attention_style="v3", discrete_optimization_strategy="st",
                          object_segment_update_strategy="ind",
                          update_segment_threshold=0.5, num_classes=(13, None)),
        shape=dict(b=2, t=6, num_humans=2, num_objects=3, human_width=2152,
                   with_dists=False),
        misc={"budget_loss": {"add": True, "human_weight": 0.5},
              "segmentation_loss": {"add": True, "weight": 0.8},
              "first_level_loss_weight": 0.3,
              "anticipation_loss_weight": 0.7},
        lr=1e-3, clip=5.0, steps=5),
    "train_cad120_st": dict(
        dataset="cad120",
        model_kwargs=dict(hidden_size=16, gcn_node=19, message_humans_to_human=False,
                          message_segment=True, message_type="v2",
                          message_granularity="v1", message_aggregation="att",
                          attention_style="v3", discrete_optimization_strategy="st",
                          object_segment_update_strategy="ind",
                          update_segment_threshold=0.5, num_classes=(10, 12)),
        shape=dict(b=2, t=6, num_humans=1, num_objects=2, human_width=2124,
                   with_dists=False),
        misc={"budget_loss": {"add": True, "human_weight": 0.4,
                              "object_weight": 0.6},
              "segmentation_loss": {"add": True, "weight": 1.0},
              "first_level_loss_weight": 0.2,
              "anticipation_loss_weight": 1.0},
        lr=1e-3, clip=0.0, steps=5),
    # Stage-2 gradient path (conf/models/2G-GCN_stage2.yaml): the 3-point
    # local-maximum STE filter on the soft decisions
    # (vhoi/models.py:1637-1664 filter_soft_decisions), threshold 0.1, and
    # Gaussian-smoothed BCE segmentation supervision
    # (vhoi/data_loading.py:545-559). Strategy 'st' keeps the trajectory
    # deterministic (the stage-2 default 'gs' draws framework-specific
    # Gumbel noise, so cross-framework trajectories cannot be compared).
    "train_mphoi_stage2": dict(
        dataset="mphoi",
        model_kwargs=dict(hidden_size=24, gcn_node=26, message_humans_to_human=True,
                          message_segment=True, message_type="v2",
                          message_granularity="v1", message_aggregation="att",
                          attention_style="v3", discrete_optimization_strategy="st",
                          filter_discrete_updates=True,
                          object_segment_update_strategy="ind",
                          update_segment_threshold=0.1, num_classes=(13, None)),
        shape=dict(b=2, t=8, num_humans=2, num_objects=3, human_width=2152,
                   with_dists=False),
        misc={"segmentation_loss": {"add": True, "weight": 1.0},
              "anticipation_loss_weight": 1.0},
        smooth_sigma=4.0, lr=1e-3, clip=0.0, steps=5),
    "train_cad120_stage2": dict(
        dataset="cad120",
        model_kwargs=dict(hidden_size=16, gcn_node=19, message_humans_to_human=False,
                          message_segment=True, message_type="v2",
                          message_granularity="v1", message_aggregation="att",
                          attention_style="v3", discrete_optimization_strategy="st",
                          filter_discrete_updates=True,
                          object_segment_update_strategy="ind",
                          update_segment_threshold=0.1, num_classes=(10, 12)),
        shape=dict(b=2, t=8, num_humans=1, num_objects=2, human_width=2124,
                   with_dists=False),
        misc={"segmentation_loss": {"add": True, "weight": 1.0},
              "anticipation_loss_weight": 1.0},
        smooth_sigma=4.0, lr=1e-3, clip=0.0, steps=5),
    # MTLL in the optimizer (train.py:42-46 + pyrutils/torch/multi_task.py):
    # losses pass through the learnable-sigma weighting before the sum, and
    # Adam updates the log-sigmas alongside the model. The recorded
    # trajectory is the post-MTLL losses (what the reference train loop sums
    # and logs, pyrutils/torch/train_utils.py:148-151).
    "train_mphoi_mtll": dict(
        dataset="mphoi",
        model_kwargs=dict(hidden_size=24, gcn_node=26, message_humans_to_human=True,
                          message_segment=True, message_type="v2",
                          message_granularity="v1", message_aggregation="att",
                          attention_style="v3", discrete_optimization_strategy="st",
                          object_segment_update_strategy="ind",
                          update_segment_threshold=0.5, num_classes=(13, None)),
        shape=dict(b=2, t=6, num_humans=2, num_objects=3, human_width=2152,
                   with_dists=False),
        misc={"budget_loss": {"add": True, "human_weight": 0.5},
              "segmentation_loss": {"add": True, "weight": 0.8},
              "anticipation_loss_weight": 1.0,
              "multi_task_loss_learner": True},
        mtll=True, lr=1e-3, clip=5.0, steps=5),
    "train_cad120_mtll": dict(
        dataset="cad120",
        model_kwargs=dict(hidden_size=16, gcn_node=19, message_humans_to_human=False,
                          message_segment=True, message_type="v2",
                          message_granularity="v1", message_aggregation="att",
                          attention_style="v3", discrete_optimization_strategy="st",
                          object_segment_update_strategy="ind",
                          update_segment_threshold=0.5, num_classes=(10, 12)),
        shape=dict(b=2, t=6, num_humans=1, num_objects=2, human_width=2124,
                   with_dists=False),
        misc={"budget_loss": {"add": True, "human_weight": 0.4,
                              "object_weight": 0.6},
              "segmentation_loss": {"add": True, "weight": 1.0},
              "anticipation_loss_weight": 1.0,
              "multi_task_loss_learner": True},
        mtll=True, lr=1e-3, clip=0.0, steps=5),
    # Long-horizon robustness: 18 steps to observe cross-framework
    # divergence growth (slow gradient drift that 5 steps can hide).
    # test_golden_training.py applies a widening per-step tolerance.
    "train_mphoi_long18": dict(
        dataset="mphoi",
        model_kwargs=dict(hidden_size=24, gcn_node=26, message_humans_to_human=True,
                          message_segment=True, message_type="v2",
                          message_granularity="v1", message_aggregation="att",
                          attention_style="v3", discrete_optimization_strategy="st",
                          object_segment_update_strategy="ind",
                          update_segment_threshold=0.5, num_classes=(13, None)),
        shape=dict(b=2, t=6, num_humans=2, num_objects=3, human_width=2152,
                   with_dists=False),
        misc={"budget_loss": {"add": True, "human_weight": 0.5},
              "segmentation_loss": {"add": True, "weight": 0.8},
              "first_level_loss_weight": 0.3,
              "anticipation_loss_weight": 0.7},
        lr=1e-3, clip=5.0, steps=18),
}


def make_training_fixtures(reference_path="/root/reference"):
    """Golden training trajectories from the reference optimizer loop."""
    import torch

    sys.path.insert(0, reference_path)
    if "zarr" not in sys.modules:
        # vhoi.data_loading imports zarr at module level; gcn_forward (the
        # only symbol used here) never touches it.
        import types

        try:
            import zarr  # noqa: F401
        except ImportError:
            sys.modules["zarr"] = types.ModuleType("zarr")
    from vhoi.data_loading import gcn_forward
    from vhoi.losses import select_loss as ref_select_loss

    from tggcn.config import Config
    import pyrutils.torch.distributions as ref_distributions
    import vhoi.models as ref_models
    from vhoi.models import TGGCN

    class _STE(torch.autograd.Function):
        """The reference STE with a modern-torch-compatible backward.

        pyrutils/torch/distributions.py:39-53 returns one gradient for two
        forward inputs, which torch 1.5 tolerated but current torch rejects.
        Identical semantics: hard threshold forward, identity gradient to the
        input, no gradient to the threshold.
        """

        @staticmethod
        def forward(ctx, input, threshold: float = 0.5):
            return (input > threshold).float()

        @staticmethod
        def backward(ctx, output_gradient):
            return output_gradient, None

    ref_distributions.straight_through_estimator = _STE.apply
    ref_models.straight_through_estimator = _STE.apply

    os.makedirs(OUT_DIR, exist_ok=True)
    for name, spec in TRAIN_SCENARIOS.items():
        torch.manual_seed(4321)
        rng = np.random.default_rng(7)
        shape, dataset = spec["shape"], spec["dataset"]
        inputs = make_inputs(rng, **shape)
        model = TGGCN(input_size=(shape["human_width"], 2048),
                      **spec["model_kwargs"])
        model.train()

        # Batch tuple in loader order (SURVEY §2.4); seg/distance slots are
        # placeholders (not consumed: impose=0, no GT seg, no dist attention).
        b, t = shape["b"], shape["t"]
        hseg = np.ones((b, t, shape["num_humans"]), dtype=np.float32)
        placeholder = np.zeros((b, 1, 1, 1), dtype=np.float32)
        if dataset == "cad120":
            oseg = np.ones((b, t, shape["num_objects"]), dtype=np.float32)
            np_data = [inputs["x_human"], inputs["x_objects"],
                       inputs["objects_mask"], hseg, oseg, placeholder,
                       placeholder, inputs["steps_per_example"]]
        else:
            np_data = [inputs["x_human"], inputs["x_objects"],
                       inputs["objects_mask"], hseg, placeholder, placeholder,
                       placeholder, inputs["steps_per_example"]]
        torch_data = [torch.from_numpy(a) for a in np_data]

        # Probe output shapes to build matching targets (-1 beyond each
        # example's steps_per_example, as the loaders pad).
        with torch.no_grad():
            probe = gcn_forward(model, torch_data, dataset_name=dataset)
        num_float_heads = 4 if dataset == "cad120" else 2
        np_targets = []
        for i, out in enumerate(probe):
            if i < num_float_heads:
                assert out.dim() == 3, (i, out.shape)
                tgt = (rng.uniform(size=tuple(out.shape)) > 0.5).astype(np.float32)
            else:
                assert out.dim() == 4, (i, out.shape)
                num_classes = out.shape[1]
                tgt_shape = (out.shape[0],) + tuple(out.shape[2:])
                tgt = rng.integers(0, num_classes, size=tgt_shape).astype(np.int64)
            for bi, steps in enumerate(inputs["steps_per_example"]):
                tgt[bi, int(steps):] = -1
            np_targets.append(tgt)
        torch_targets = [torch.from_numpy(a) for a in np_targets]

        # Stage-2 supervision: Gaussian-smoothed segmentation targets
        # (vhoi/data_loading.py:545-559 smooth_segmentation), applied to the
        # float (segmentation/budget) target heads.
        if spec.get("smooth_sigma"):
            from scipy.ndimage import gaussian_filter1d

            sigma = spec["smooth_sigma"]
            for i, tgt in enumerate(np_targets):
                if tgt.dtype != np.float32:
                    continue
                missing = tgt == -1.0
                tgt[missing] = 0.0
                sm = np.clip(gaussian_filter1d(tgt, sigma=sigma, axis=1,
                                               mode="constant") * 2.5 * sigma,
                             0.0, 1.0).astype(np.float32)
                sm[missing] = -1.0
                np_targets[i] = sm
            torch_targets = [torch.from_numpy(a) for a in np_targets]

        criterion, loss_names = ref_select_loss(
            "2G-GCN", "multiple", dataset, Config({"misc": spec["misc"]}))
        optimizer = torch.optim.Adam(model.parameters(), lr=spec["lr"])
        mtll_model = None
        if spec.get("mtll"):
            from pyrutils.torch.multi_task import MultiTaskLossLearner
            from vhoi.losses import (select_loss_learning_mask,
                                     select_loss_types)

            loss_types = select_loss_types("2G-GCN", dataset, None)
            mask = select_loss_learning_mask("2G-GCN", dataset, None)
            mtll_model = MultiTaskLossLearner(loss_types=loss_types, mask=mask)
            mtll_model.train()
            optimizer.add_param_group({"params": mtll_model.parameters()})
        weights0 = {k: v.detach().clone().numpy()
                    for k, v in model.state_dict().items()}
        loss_trajectory = []
        for _step in range(spec["steps"]):
            optimizer.zero_grad()
            outputs = gcn_forward(model, torch_data, dataset_name=dataset)
            losses = criterion(outputs, torch_targets, reduction="mean")
            if mtll_model is not None:
                losses = mtll_model(losses)
            sum(losses).backward()
            if spec["clip"]:
                torch.nn.utils.clip_grad_norm_(model.parameters(),
                                               max_norm=spec["clip"])
            optimizer.step()
            loss_trajectory.append([float(l) for l in losses])

        payload = {f"input::{k}": v for k, v in inputs.items()}
        for i, tgt in enumerate(np_targets):
            payload[f"target::{i}"] = tgt
        payload["losses"] = np.asarray(loss_trajectory, dtype=np.float64)
        for k, v in weights0.items():
            payload[f"weight0::{k}"] = v
        for k, v in model.state_dict().items():
            payload[f"weightN::{k}"] = v.detach().numpy()
        if mtll_model is not None:
            payload["mtll_log_sdsN"] = mtll_model.log_sds.detach().numpy()
        payload["meta::spec"] = np.frombuffer(json.dumps({
            "dataset": dataset, "lr": spec["lr"], "clip": spec["clip"],
            "steps": spec["steps"], "misc": spec["misc"],
            "loss_names": loss_names, "mtll": bool(spec.get("mtll")),
            "model_kwargs": {**spec["model_kwargs"],
                             "input_size": (shape["human_width"], 2048)},
        }, default=str).encode(), dtype=np.uint8)
        np.savez_compressed(os.path.join(OUT_DIR, f"training_{name}.npz"), **payload)
        print(f"wrote training_{name}: {spec['steps']} steps, "
              f"losses {loss_names}")


def make_baseline_fixtures(reference_path="/root/reference"):
    """Golden fixtures for CAD120Baseline / BimanualBaseline."""
    import torch
    sys.path.insert(0, reference_path)
    from vhoi.models import BimanualBaseline, CAD120Baseline

    os.makedirs(OUT_DIR, exist_ok=True)
    for name, cls, num_classes, num_humans in [
        ("cad120_baseline", CAD120Baseline, (10, 12), 1),
        ("bimanual_baseline", BimanualBaseline, (14, None), 2),
    ]:
        torch.manual_seed(77)
        rng = np.random.default_rng(55)
        b, t, num_objects = 2, 9, 3
        model = cls(input_size=(2124, 2048), num_classes=num_classes, hidden_size=16)
        model.eval()
        x_human = rng.normal(size=(b, t, num_humans, 2124)).astype(np.float32)
        x_objects = rng.normal(size=(b, t, num_objects, 2048)).astype(np.float32)
        mask = np.ones((b, num_objects), dtype=np.float32)
        mask[0, -1] = 0.0
        with torch.no_grad():
            outputs = model(torch.from_numpy(x_human), torch.from_numpy(x_objects),
                            torch.from_numpy(mask))
        payload = {"input::x_human": x_human, "input::x_objects": x_objects,
                   "input::objects_mask": mask}
        for i, out in enumerate(outputs):
            payload[f"output::{i}"] = out.detach().numpy()
        for k, v in model.state_dict().items():
            payload[f"weight::{k}"] = v.detach().numpy()
        np.savez_compressed(os.path.join(OUT_DIR, f"baseline_{name}.npz"), **payload)
        print(f"wrote baseline_{name}: {len(outputs)} outputs")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--reference", default="/root/reference")
    args = parser.parse_args()
    sys.path.insert(0, args.reference)

    import torch
    from vhoi.models import TGGCN  # noqa: the reference model

    os.makedirs(OUT_DIR, exist_ok=True)
    for name, (model_kwargs, shape, extras) in SCENARIOS.items():
        torch.manual_seed(1234)
        rng = np.random.default_rng(99)
        inputs = make_inputs(rng, **shape)
        human_width = shape["human_width"]
        model = TGGCN(input_size=(human_width, 2048), **model_kwargs)
        if extras.get("train_mode"):
            model.train()
        else:
            model.eval()
        kwargs = {k: torch.from_numpy(v) for k, v in inputs.items()}
        if extras.get("gt_segmentation"):
            hs = (rng.uniform(size=(shape["b"], shape["t"], shape["num_humans"])) > 0.6)
            os_ = (rng.uniform(size=(shape["b"], shape["t"], shape["num_objects"])) > 0.6)
            hs = hs.astype(np.float32)
            os_ = os_.astype(np.float32)
            hs[:, -1] = 1.0
            os_[:, -1] = 1.0
            inputs["human_segmentation"] = hs
            kwargs["human_segmentation"] = torch.from_numpy(hs)
            if model_kwargs["num_classes"][1] is not None:
                inputs["objects_segmentation"] = os_
                kwargs["objects_segmentation"] = torch.from_numpy(os_)
        attention = None
        with torch.no_grad():
            if extras.get("inspect"):
                outputs, attention = model(**kwargs, inspect_model=True)
            else:
                outputs = model(**kwargs)
        payload = {}
        for k, v in inputs.items():
            payload[f"input::{k}"] = v
        for i, out in enumerate(outputs):
            payload[f"output::{i}"] = out.detach().numpy()
        if attention is not None:
            for i, att in enumerate(attention):
                payload[f"attention::{i}"] = att.detach().numpy()
        for k, v in model.state_dict().items():
            payload[f"weight::{k}"] = v.detach().numpy()
        payload["meta::model_kwargs"] = np.frombuffer(
            json.dumps({**model_kwargs, "input_size": (human_width, 2048)},
                       default=str).encode(), dtype=np.uint8)
        payload["meta::train_mode"] = np.array([int(bool(extras.get("train_mode")))])
        np.savez_compressed(os.path.join(OUT_DIR, f"{name}.npz"), **payload)
        print(f"wrote {name}: {len(outputs)} outputs, "
              f"{len(model.state_dict())} weights")
    make_baseline_fixtures(args.reference)
    make_training_fixtures(args.reference)


if __name__ == "__main__":
    main()
