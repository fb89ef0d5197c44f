"""End-to-end integration: train.py -> run dir -> predict.py on synthetic data."""

import os
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tggcn.data.synthetic import generate_cad120_dataset, generate_mphoi_dataset


def _mphoi_overrides(paths, tmp_path, subject="Subject45"):
    return [
        "models=2G-GCN_stage1", "data=mphoi",
        f"data.path={paths['path']}",
        f"data.path_zarr={paths['path_zarr']}",
        f"data.path_obb_zarr={paths['path_obb_zarr']}",
        f"data.path_hbb_zarr={paths['path_hbb_zarr']}",
        f"data.path_hps_zarr={paths['path_hps_zarr']}",
        f"data.cross_validation_test_subject={subject}",
        "parameters.hidden_size=16",
        "optimization.epochs=2",
        "optimization.batch_size=2",
        "optimization.val_fraction=0.25",
        f"logging.root_log_dir={tmp_path}/outputs/mphoi/2G-GCN",
    ]


@pytest.mark.slow
def test_train_and_predict_mphoi_stage1(tmp_path):
    import predict as predict_cli
    import train as train_cli

    paths = generate_mphoi_dataset(str(tmp_path / "data"), num_videos=8,
                                   min_len=24, max_len=42, seed=11)
    checkpoint = train_cli.main(_mphoi_overrides(paths, tmp_path))
    assert "model_state_dict" in checkpoint
    assert len(checkpoint["train_losses"]) == 2
    assert len(checkpoint["val_losses"]) == 2
    # Run-dir contract: frozen config + named checkpoint + fault-tolerance snapshot.
    run_dir = os.path.join(str(tmp_path), "outputs", "mphoi", "2G-GCN",
                           "hs16_e2_bs2_lr0.0001_0.5_Subject45")
    assert os.path.exists(os.path.join(run_dir, ".hydra", "config.yaml"))
    assert os.path.exists(os.path.join(run_dir, "hs16_e2_bs2_lr0.0001_0.5_Subject45.ckpt"))
    assert os.path.exists(os.path.join(run_dir, "last.ckpt"))

    outputs, targets, test_ids = predict_cli.predict(run_dir)
    assert set(outputs) == {"sub-activity_recognition", "sub-activity_prediction"}
    y = outputs["sub-activity_recognition"]
    t = targets["sub-activity_recognition"]
    assert y.shape == t.shape and y.shape[2] == 2  # (N, T_full, 2 humans)
    # Labels at full FPS; predictions upsampled to match.
    assert len(test_ids) == y.shape[0]
    # Metric plumbing runs.
    results = predict_cli.evaluate_predictions(targets, outputs, print_report=False)
    assert "sub-activity_recognition-micro" in results
    f1 = predict_cli.evaluate_f1_at_k(targets, outputs, 13, None, overlap=0.10)
    assert 0.0 <= f1["sub-activity_recognition"] <= 1.0


@pytest.mark.slow
def test_train_and_predict_cad120_baseline(tmp_path):
    import predict as predict_cli
    import train as train_cli

    paths = generate_cad120_dataset(str(tmp_path / "data"), num_videos=8,
                                    min_len=24, max_len=42, seed=12)
    overrides = [
        "models=cad120_baseline", "data=cad120",
        f"data.path={paths['path']}",
        f"data.path_zarr={paths['path_zarr']}",
        f"data.video_id_to_subject_id={paths['video_id_to_subject_id']}",
        "data.cross_validation_test_subject=Subject1",
        "parameters.hidden_size=8",
        "optimization.epochs=1",
        "optimization.batch_size=2",
        "optimization.val_fraction=0.25",
        f"logging.root_log_dir={tmp_path}/outputs/cad120/cad120_baseline",
    ]
    checkpoint = train_cli.main(overrides)
    assert "model_state_dict" in checkpoint
    run_dir = os.path.join(
        str(tmp_path), "outputs", "cad120", "cad120_baseline",
        "hs8_e1_bs2_lr0.001_bd-True_mp-True_sc-None_gc0.0_ds3_Subject1")
    assert os.path.isdir(run_dir), os.listdir(os.path.dirname(run_dir))
    outputs, targets, test_ids = predict_cli.predict(run_dir)
    assert set(outputs) == {"sub-activity_recognition", "affordance_recognition"}
    assert outputs["affordance_recognition"].shape == targets["affordance_recognition"].shape


@pytest.mark.slow
def test_stage2_warm_start_from_stage1(tmp_path):
    import train as train_cli

    paths = generate_mphoi_dataset(str(tmp_path / "data"), num_videos=8,
                                   min_len=24, max_len=36, seed=13)
    train_cli.main(_mphoi_overrides(paths, tmp_path))
    stage1_dir = os.path.join(str(tmp_path), "outputs", "mphoi", "2G-GCN",
                              "hs16_e2_bs2_lr0.0001_0.5_Subject45")
    overrides = _mphoi_overrides(paths, tmp_path)
    overrides[0] = "models=2G-GCN_stage2"
    overrides += [f"misc.pretrained_path={stage1_dir}", "optimization.epochs=1"]
    checkpoint = train_cli.main(overrides)
    assert "model_state_dict" in checkpoint
    # Stage 2 has the BCE segmentation loss active.
    assert len(checkpoint["train_losses"][0][1]) == 6


@pytest.mark.slow
def test_mtll_and_distance_attention_end_to_end(tmp_path):
    """Exercise multi_task_loss_learner=true and make_attention_distance_based=true."""
    import train as train_cli

    paths = generate_mphoi_dataset(str(tmp_path / "data"), num_videos=8,
                                   min_len=24, max_len=36, seed=14)
    overrides = _mphoi_overrides(paths, tmp_path) + [
        "misc.multi_task_loss_learner=true",
        "misc.make_attention_distance_based=true",
        "misc.segmentation_loss.add=true",
        "misc.segmentation_loss.sigma=2.0",
        "optimization.epochs=1",
    ]
    checkpoint = train_cli.main(overrides)
    assert "model_state_dict" in checkpoint
    # MTLL state saved alongside the model; raw-loss history recorded.
    assert "mtll_model_state_dict" in checkpoint
    assert len(checkpoint["train_raw_losses"]) == 1
    assert np.isfinite(checkpoint["train_raw_losses"][0][0])


@pytest.mark.slow
def test_predict_cross_validate_aggregation(tmp_path, capsys):
    """Train two MPHOI folds, then aggregate with predict.py --cross_validate."""
    import argparse

    import predict as predict_cli
    import train as train_cli

    paths = generate_mphoi_dataset(str(tmp_path / "data"), num_videos=10,
                                   min_len=24, max_len=34, seed=15)
    for subject in ("Subject45", "Subject12"):
        overrides = _mphoi_overrides(paths, tmp_path, subject=subject)
        overrides += ["optimization.epochs=1", "parameters.hidden_size=8"]
        train_cli.main(overrides)
    run_dir = os.path.join(str(tmp_path), "outputs", "mphoi", "2G-GCN",
                           "hs8_e1_bs2_lr0.0001_0.5_Subject45")
    args = argparse.Namespace(pretrained_model_dir=run_dir, cross_validate=True,
                              convert_frame_to_segment_level=False,
                              save_visualisations_dir=None, inspect_model=False)
    predict_cli.predict_all(args)
    out = capsys.readouterr().out
    # Subject45 evaluated; Subject12 is not a CV fold id, Subject25/14 runs
    # absent -> skipped via FileNotFoundError (reference behaviour).
    assert "Summary Performance for Cross-validation." in out
    assert "Summary F1@k results." in out
    assert "sub-activity_recognition" in out


@pytest.mark.slow
def test_train_bucketed_e2e(tmp_path):
    """train.py with length-bucketed batches (one program shape per bucket)."""
    import train as train_cli

    paths = generate_mphoi_dataset(str(tmp_path / "data"), num_videos=8,
                                   min_len=20, max_len=44, seed=21)
    overrides = _mphoi_overrides(paths, tmp_path)
    overrides += ["data.length_buckets=2", "optimization.epochs=1",
                  "parameters.hidden_size=8"]
    checkpoint = train_cli.main(overrides)
    assert "model_state_dict" in checkpoint
    total, per_loss = checkpoint["train_losses"][-1]
    assert np.isfinite(total) and np.isfinite(per_loss).all()


@pytest.mark.slow
def test_kill_and_resume_reproduces_run(tmp_path):
    """misc.resume=true after an interruption reproduces the full run."""
    import train as train_cli

    paths = generate_mphoi_dataset(str(tmp_path / "data"), num_videos=8,
                                   min_len=20, max_len=32, seed=22)

    def overrides(run_name, epochs):
        out = _mphoi_overrides(paths, tmp_path)
        out += [f"optimization.epochs={epochs}", "parameters.hidden_size=8",
                f"logging.root_log_dir={tmp_path}/{run_name}/outputs/mphoi/2G-GCN"]
        return out

    full = train_cli.main(overrides("full", 3))

    # "Kill" after epoch 2 (equivalent: a 2-epoch run leaves last.ckpt at
    # epoch 2), then resume to the 3-epoch total in the same run dir.
    train_cli.main(overrides("resumed", 2))
    resumed = train_cli.main(overrides("resumed", 3) + ["misc.resume=true"])

    assert len(resumed["train_losses"]) == len(full["train_losses"]) == 3
    np.testing.assert_allclose(resumed["train_losses"][-1][1],
                               full["train_losses"][-1][1], rtol=1e-5)
    np.testing.assert_allclose(resumed["val_losses"][-1][1],
                               full["val_losses"][-1][1], rtol=1e-5)
    assert resumed["epoch"] == full["epoch"]
    flat_full = jax.tree_util.tree_leaves(full["model_state_dict"])
    flat_resumed = jax.tree_util.tree_leaves(resumed["model_state_dict"])
    for a, b in zip(flat_full, flat_resumed):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-7)


def test_train_bf16_compute_dtype_e2e(tmp_path):
    """train.py with parameters.compute_dtype=bfloat16: the knob flows from
    the config override through select_model into the train step; master
    parameters and losses stay float32."""
    import train as train_cli

    paths = generate_mphoi_dataset(str(tmp_path / "data"), num_videos=8,
                                   min_len=20, max_len=32, seed=23)
    overrides = _mphoi_overrides(paths, tmp_path)
    overrides += ["optimization.epochs=1", "parameters.hidden_size=8",
                  "parameters.compute_dtype=bfloat16"]
    checkpoint = train_cli.main(overrides)
    total, per_loss = checkpoint["train_losses"][-1]
    assert np.isfinite(total) and np.isfinite(per_loss).all()
    leaves = jax.tree_util.tree_leaves(checkpoint["model_state_dict"])
    assert all(np.asarray(l).dtype in (np.float32, np.int64, np.int32)
               for l in leaves)


def test_train_orbax_backend_and_predict(tmp_path):
    """logging.checkpoint_backend=orbax stores the parameter pytree through
    orbax with a pickle sidecar for run metadata; predict.py loads the run
    dir transparently."""
    import predict as predict_cli
    import train as train_cli

    paths = generate_mphoi_dataset(str(tmp_path / "data"), num_videos=8,
                                   min_len=24, max_len=42, seed=31)
    overrides = _mphoi_overrides(paths, tmp_path)
    overrides += ["optimization.epochs=1", "parameters.hidden_size=8",
                  "logging.checkpoint_backend=orbax"]
    checkpoint = train_cli.main(overrides)
    assert "model_state_dict" in checkpoint
    run_dir = os.path.join(str(tmp_path), "outputs", "mphoi", "2G-GCN",
                           "hs8_e1_bs2_lr0.0001_0.5_Subject45")
    name = os.path.basename(run_dir)
    assert os.path.isdir(os.path.join(run_dir, name + ".orbax"))
    # The pickle sidecar must NOT contain the parameter pytree itself.
    import pickle
    with open(os.path.join(run_dir, name + ".ckpt"), "rb") as f:
        sidecar = pickle.load(f)
    assert "model_state_dict" not in sidecar
    assert sidecar["__orbax_model__"] == name + ".orbax"

    outputs, targets, test_ids = predict_cli.predict(run_dir)
    y = outputs["sub-activity_recognition"]
    assert y.shape == targets["sub-activity_recognition"].shape
    assert len(test_ids) == y.shape[0]
