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
        dict(),
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
        with torch.no_grad():
            outputs = model(**kwargs)
        payload = {}
        for k, v in inputs.items():
            payload[f"input::{k}"] = v
        for i, out in enumerate(outputs):
            payload[f"output::{i}"] = out.detach().numpy()
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


if __name__ == "__main__":
    main()
