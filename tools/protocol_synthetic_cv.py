"""Full 3-fold MPHOI cross-validation protocol on synthetic data.

Trains every MPHOI CV fold (Subject45 / Subject25 / Subject14) end-to-end
through train.py and aggregates with predict.py --cross_validate — the exact
protocol of the reference (predict.py:340, vhoi/data_loading.py:128-133) on
a synthetic stand-in dataset. Verifies the PROTOCOL MECHANICS (fold
training, group-exclusion filters, per-fold eval, F1@k aggregation); the
resulting numbers are not accuracy claims (random labels, tiny model).

Usage: python tools/protocol_synthetic_cv.py [workdir]
"""
import sys, os, argparse

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tggcn.data.synthetic import generate_mphoi_dataset
import train as train_cli
import predict as predict_cli

root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/protocol"
paths = generate_mphoi_dataset(root + "/data", num_videos=18,
                               min_len=24, max_len=40, seed=77,
                               subject_pairs=("45", "25", "14", "23", "13", "12"))
for subject in ("Subject45", "Subject25", "Subject14"):
    overrides = [
        "models=2G-GCN_stage1", "data=mphoi",
        f"data.path={paths['path']}",
        f"data.path_zarr={paths['path_zarr']}",
        f"data.path_obb_zarr={paths['path_obb_zarr']}",
        f"data.path_hbb_zarr={paths['path_hbb_zarr']}",
        f"data.path_hps_zarr={paths['path_hps_zarr']}",
        f"data.cross_validation_test_subject={subject}",
        "parameters.hidden_size=16", "optimization.epochs=3",
        "optimization.batch_size=2", "optimization.val_fraction=0.2",
        f"logging.root_log_dir={root}/outputs/mphoi/2G-GCN",
    ]
    train_cli.main(overrides)
    print(f"=== fold {subject} trained ===", flush=True)

run_dir = os.path.join(root, "outputs", "mphoi", "2G-GCN",
                       "hs16_e3_bs2_lr0.0001_0.5_Subject45")
args = argparse.Namespace(pretrained_model_dir=run_dir, cross_validate=True,
                          convert_frame_to_segment_level=False,
                          save_visualisations_dir=None, inspect_model=False)
predict_cli.predict_all(args)
print("PROTOCOL-DONE")
