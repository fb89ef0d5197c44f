"""Streaming bounded-lookahead accuracy study (protocol level).

StreamingRunner approximates the offline bidirectional model by giving the
backward direction only `lookahead` frames of future context
(tggcn/models/streaming.py:10-16). This tool quantifies that approximation
at the METRIC level: it trains a fold on synthetic MPHOI data with long
videos (so bounded lookahead actually binds), then evaluates the test split
through both the offline path and StreamingRunner at a sweep of lookaheads,
reporting per-head micro/macro F1, F1@k, and frame agreement vs offline.

The `full` variant gives every window the entire remaining stream as
lookahead, which must reproduce the offline path exactly — that equality is
asserted here and pinned at protocol level by
tests/test_streaming.py::test_full_lookahead_matches_offline_at_protocol_level.

Numbers land in BASELINE.md (round 4). The labels are synthetic, so the
absolute metric values are meaningless; the DELTAS between variants (same
model, same data) measure the cost of bounding the lookahead. Reference
semantics being approximated: offline bidirectional segment inference,
vhoi/models.py:785-899.

Usage:
    python tools/streaming_lookahead_study.py [--root /tmp/look_study]
        [--window 32] [--lookaheads 8,16,32,64,128] [--epochs 2] [--out J]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

OVERLAPS = (0.1, 0.25, 0.5)


def train_fold(root: str, epochs: int, strategy: str = "st") -> str:
    from tggcn.data.synthetic import generate_mphoi_dataset
    import train as train_cli

    # Long videos: T_model = len/downsampling(3) ~ 80-140, so window=32
    # leaves real future context beyond every bounded lookahead <= 64.
    paths = generate_mphoi_dataset(
        root + "/data", num_videos=18, min_len=240, max_len=420, seed=77,
        subject_pairs=("45", "25", "14", "23", "13", "12"))
    overrides = [
        "models=2G-GCN_stage1", "data=mphoi",
        f"data.path={paths['path']}",
        f"data.path_zarr={paths['path_zarr']}",
        f"data.path_obb_zarr={paths['path_obb_zarr']}",
        f"data.path_hbb_zarr={paths['path_hbb_zarr']}",
        f"data.path_hps_zarr={paths['path_hps_zarr']}",
        "data.cross_validation_test_subject=Subject45",
        "parameters.hidden_size=16", f"optimization.epochs={epochs}",
        "optimization.batch_size=2", "optimization.val_fraction=0.2",
        # Deterministic segment decisions: the default 'gs' estimator draws
        # gumbel noise at EVAL time too (matching the reference), and the
        # noise is shaped by the call's time length — offline (T) and
        # windowed (chunk) calls would resample different decisions, which
        # is stochastic variance, not lookahead error. 'st' isolates the
        # quantity under study.
        f"parameters.discrete_optimization_strategy={strategy}",
        # Streaming-compatible geometry: the default 'reference' flatten
        # raw-memory-couples geometry features to the clip length, so
        # windowed chunks compute different features than the offline pass
        # (StreamingRunner refuses it). 'per_frame' is the fixed variant.
        "parameters.geometry_flatten=per_frame",
        f"logging.root_log_dir={root}/outputs/mphoi/2G-GCN",
    ]
    train_cli.main(overrides)
    return os.path.join(root, "outputs", "mphoi", "2G-GCN",
                        f"hs16_e{epochs}_bs2_lr0.0001_0.5_Subject45")


def evaluate_variants(run_dir: str, window: int, lookaheads):
    from tggcn.data.loading import (
        determine_num_classes,
        load_testing_data,
        select_model_data_feeder,
        select_model_data_fetcher,
    )
    from tggcn.eval.engine import head_names, upsample_predictions
    from tggcn.eval.reporting import evaluate_f1_at_k, evaluate_predictions
    from tggcn.eval.rundir import RunDir
    from tggcn.models import select_model
    from tggcn.models.streaming import StreamingRunner
    from tggcn.models.tggcn import TGGCNConfig
    from tggcn.train.checkpoint import load_model_weights, merge_params
    from tggcn.train.losses import decide_num_main_losses

    run = RunDir(run_dir)
    test_loader, data_info, _segmentations, test_ids = load_testing_data(
        run.cfg.data, run.model_name, run.input_type, batch_size=1,
        scalers=run.load_scalers())
    num_classes = determine_num_classes(run.model_name, run.input_type,
                                        run.dataset_name)
    model = select_model(run.model_name, num_classes=num_classes,
                         **{**data_info, **run.cfg.parameters})
    params = model.init(jax.random.PRNGKey(42))
    compat_cfg = model.config if isinstance(model.config, TGGCNConfig) else None
    params = merge_params(params, load_model_weights(run.path, cfg=compat_cfg))
    cfg = model.config

    misc = run.misc
    fetch = select_model_data_fetcher(run.model_name, run.input_type,
                                      dataset_name=run.dataset_name,
                                      **{**misc, **run.cfg.parameters})
    feed = select_model_data_feeder(run.model_name, run.input_type,
                                    dataset_name=run.dataset_name, **misc)
    num_main = decide_num_main_losses(run.model_name, run.dataset_name,
                                      {**misc, **run.cfg.parameters})
    names = head_names(run.model_name, run.input_type, run.dataset_name)
    downsampling = run.cfg.data.get("downsampling", default_value=1)

    variants = ["offline"] + [f"look{la}" for la in lookaheads] + ["full"]
    preds = {v: {n: [] for n in names} for v in variants}
    tgts = {n: [] for n in names}
    full_equals_offline = True
    # One runner per bounded lookahead, shared across videos so interior
    # windows reuse one compiled program; 'full' needs lookahead = T and is
    # built per video.
    runners = {f"look{la}": StreamingRunner(params, cfg, window=window,
                                            lookahead=la)
               for la in lookaheads}

    for batch in test_loader:
        data, target = fetch(batch)
        kwargs = feed(data)
        t_model = kwargs["x_human"].shape[1]

        per_variant_outputs = {}
        outputs, _aux = model.apply(params, train=False,
                                    rng=jax.random.PRNGKey(42), **kwargs)
        per_variant_outputs["offline"] = [np.asarray(o) for o in outputs]
        for variant in variants[1:]:
            runner = runners.get(variant) or StreamingRunner(
                params, cfg, window=window, lookahead=t_model)
            outs = runner.run(np.asarray(kwargs["x_human"]),
                              np.asarray(kwargs["x_objects"]),
                              np.asarray(kwargs["objects_mask"]),
                              human_segmentation=kwargs.get("human_segmentation"))
            per_variant_outputs[variant] = [np.asarray(o) for o in outs]

        for a, b in zip(per_variant_outputs["offline"],
                        per_variant_outputs["full"]):
            if not np.allclose(a, b, atol=1e-5):
                full_equals_offline = False

        t_full = target[-1].shape[1] if num_main else target[0].shape[1]
        for variant, outs in per_variant_outputs.items():
            heads = outs[-num_main:] if num_main is not None else outs
            for name, out in zip(names, heads):
                up = upsample_predictions(out, downsampling, t_full)
                preds[variant][name].append(np.argmax(up, axis=1)[0])
        head_targets = target[-num_main:] if num_main is not None else target
        for name, tgt in zip(names, head_targets):
            tgts[name].append(np.asarray(tgt)[0])

    def stack(rows, fill):
        t_max = max(r.shape[0] for r in rows)
        padded = [np.pad(r.astype(np.float64),
                         [(0, t_max - r.shape[0])] + [(0, 0)] * (r.ndim - 1),
                         constant_values=fill) for r in rows]
        return np.stack(padded, axis=0)

    targets_arr = {n: stack(rows, -1) for n, rows in tgts.items()}
    num_sa = num_classes[0] if isinstance(num_classes, tuple) else num_classes
    report = {"window": window, "num_test_videos": len(test_ids),
              "full_equals_offline": bool(full_equals_offline), "variants": {}}
    offline_arr = {n: stack(rows, -1) for n, rows in preds["offline"].items()}
    for variant in variants:
        outputs_arr = {n: stack(rows, -1) for n, rows in preds[variant].items()}
        frame = evaluate_predictions(targets_arr, outputs_arr,
                                     print_report=False)
        f1k = {str(ov): evaluate_f1_at_k(targets_arr, outputs_arr,
                                         num_sa, None, overlap=ov)
               for ov in OVERLAPS}
        agree = {}
        for n in names:
            mask = targets_arr[n] != -1
            agree[n] = float(
                (outputs_arr[n][mask] == offline_arr[n][mask]).mean())
        report["variants"][variant] = {
            "frame": {k: {m: float(x) for m, x in v.items()}
                      for k, v in frame.items()},
            "f1_at_k": f1k,
            "agreement_vs_offline": agree,
        }
    return report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/look_study")
    ap.add_argument("--window", type=int, default=32)
    ap.add_argument("--lookaheads", default="8,16,32,64,128")
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--strategy", default="st",
                    help="discrete estimator; 'st' is deterministic (see "
                         "train_fold), 'gs' adds eval-time sampling noise")
    ap.add_argument("--run_dir", default=None,
                    help="skip training, evaluate this run dir")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    lookaheads = [int(x) for x in args.lookaheads.split(",")]
    run_dir = args.run_dir or train_fold(args.root, args.epochs, args.strategy)
    print(f"=== evaluating {run_dir} ===", flush=True)
    report = evaluate_variants(run_dir, args.window, lookaheads)
    report["run_dir"] = run_dir
    text = json.dumps(report, indent=1, default=float)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text)
        print(f"wrote {args.out}", flush=True)
    print(text, flush=True)
    print("STUDY-DONE", flush=True)


if __name__ == "__main__":
    main()
