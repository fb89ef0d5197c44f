"""Full 3-fold MPHOI cross-validation protocol on synthetic data.

Trains every MPHOI CV fold (Subject45 / Subject25 / Subject14) end-to-end
through train.py and aggregates with predict.py --cross_validate — the exact
protocol of the reference (predict.py:340, vhoi/data_loading.py:128-133) on
a synthetic stand-in dataset. Verifies the PROTOCOL MECHANICS (fold
training, group-exclusion filters, per-fold eval, F1@k aggregation); the
resulting numbers are not accuracy claims (random labels, tiny model).

--compute_dtype + --out make it a metric-level precision study: run once in
float32 and once in bfloat16 (same seeds/data) and diff the per-fold
micro/macro F1 and F1@k JSONs (recorded in BASELINE.md round 3).

Usage: python tools/protocol_synthetic_cv.py [--root DIR]
           [--compute_dtype float32|bfloat16] [--epochs N] [--out results.json]
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


def run_protocol(root, compute_dtype="float32", epochs=3, out_json=None):
    from tggcn.data.synthetic import generate_mphoi_dataset
    import predict as predict_cli
    import train as train_cli

    paths = generate_mphoi_dataset(root + "/data", num_videos=18,
                                   min_len=24, max_len=40, seed=77,
                                   subject_pairs=("45", "25", "14", "23",
                                                  "13", "12"))
    for subject in ("Subject45", "Subject25", "Subject14"):
        overrides = [
            "models=2G-GCN_stage1", "data=mphoi",
            f"data.path={paths['path']}",
            f"data.path_zarr={paths['path_zarr']}",
            f"data.path_obb_zarr={paths['path_obb_zarr']}",
            f"data.path_hbb_zarr={paths['path_hbb_zarr']}",
            f"data.path_hps_zarr={paths['path_hps_zarr']}",
            f"data.cross_validation_test_subject={subject}",
            "parameters.hidden_size=16", f"optimization.epochs={epochs}",
            "optimization.batch_size=2", "optimization.val_fraction=0.2",
            f"parameters.compute_dtype={compute_dtype}",
            f"logging.root_log_dir={root}/outputs/mphoi/2G-GCN",
        ]
        train_cli.main(overrides)
        print(f"=== fold {subject} trained ({compute_dtype}) ===", flush=True)

    run_dir = os.path.join(root, "outputs", "mphoi", "2G-GCN",
                           f"hs16_e{epochs}_bs2_lr0.0001_0.5_Subject45")
    args = argparse.Namespace(pretrained_model_dir=run_dir, cross_validate=True,
                              convert_frame_to_segment_level=False,
                              save_visualisations_dir=None, inspect_model=False)
    # Per-fold machine-readable metrics (the printed summary uses the same
    # evaluation calls, predict.py _evaluate_fold).
    from predict import RunDir, _evaluate_fold, class_names_in_id_order

    run = RunDir(run_dir)
    sa_dict, af_dict = run.class_dictionaries()
    sa_names = class_names_in_id_order(sa_dict)
    af_names = class_names_in_id_order(af_dict)
    results = {}
    for subject_id, fold_dir in run.sibling_fold_paths():
        outputs, targets, _ = predict_cli.predict(fold_dir)
        frame_results, f1_results = _evaluate_fold(outputs, targets,
                                                   sa_names, af_names)
        results[subject_id] = {
            "frame": {k: v for k, v in frame_results.items()},
            "f1_at_k": {str(k): v for k, v in f1_results.items()},
        }
    predict_cli.predict_all(args)
    if out_json:
        with open(out_json, "w") as f:
            json.dump({"compute_dtype": compute_dtype, "epochs": epochs,
                       "results": results}, f, indent=1, default=float)
        print(f"wrote {out_json}", flush=True)
    print("PROTOCOL-DONE", flush=True)
    return results


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/protocol")
    ap.add_argument("--compute_dtype", default="float32")
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--out", default=None)
    a = ap.parse_args()
    run_protocol(a.root, a.compute_dtype, a.epochs, a.out)
