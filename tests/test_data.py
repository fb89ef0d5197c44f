"""Data pipeline tests: vectorised assembly vs loop-based oracles + end-to-end loading."""

import numpy as np
import pytest

from tggcn.config import Config
from tggcn.data import assembly
from tggcn.data.loading import (
    determine_num_classes,
    load_testing_data,
    load_training_data,
    split_train_test,
)
from tggcn.data.synthetic import (
    generate_bimanual_dataset,
    generate_cad120_dataset,
    generate_mphoi_dataset,
)


class TestSegmentationFromOutputClass:
    def test_truth_table(self):
        y = np.array([[0, 0, 1, 1, 2, -1, -1]])
        x_in = assembly.segmentation_from_output_class(y, "input")
        # boundaries at label changes (incl. into padding), padding -> 1, last -> 1
        np.testing.assert_allclose(x_in, [[0, 1, 0, 1, 1, 1, 1]])
        x_out = assembly.segmentation_from_output_class(y, "output")
        np.testing.assert_allclose(x_out, [[0, 1, 0, 1, 1, -1, -1]])

    def test_single_segment(self):
        y = np.array([[3, 3, 3]])
        np.testing.assert_allclose(
            assembly.segmentation_from_output_class(y, "input"), [[0, 0, 1]])

    def test_entity_axis(self):
        y = np.array([[[0, 1], [0, 1], [1, 1], [-1, 1]]])  # (1, 4, 2)
        x = assembly.segmentation_from_output_class(y, "output")
        np.testing.assert_allclose(x[0, :, 0], [0, 1, 1, -1])
        np.testing.assert_allclose(x[0, :, 1], [0, 0, 0, 1])


class TestSmoothing:
    def test_ignore_last_step_end_flag(self):
        x = np.array([[0.0, 1.0, 0.0, 1.0], [0.0, 0.0, 0.0, 0.0]])
        out = assembly.ignore_last_step_end_flag(x.copy())
        np.testing.assert_allclose(out, [[0, 1, 0, 0], [0, 0, 0, 0]])

    def test_smooth_segmentation_formula(self):
        from scipy.ndimage import gaussian_filter1d
        x = np.zeros((1, 31), dtype=np.float32)
        x[0, 15] = 1.0
        x[0, :3] = -1.0
        sigma = 4.0
        expected_interior = np.clip(
            gaussian_filter1d(np.where(x == -1, 0.0, x), sigma=sigma, axis=1, mode="constant")
            * 2.5 * sigma, 0.0, 1.0)
        out = assembly.smooth_segmentation(x.copy(), sigma)
        np.testing.assert_allclose(out[0, :3], -1.0)
        np.testing.assert_allclose(out[0, 3:], expected_interior[0, 3:])
        assert out.max() <= 1.0 and 0 < out[0, 15] <= 1.0

    def test_sigma_zero_noop(self):
        x = np.array([[0.0, 1.0, -1.0]])
        np.testing.assert_allclose(assembly.smooth_segmentation(x.copy(), 0.0), x)


class TestVelocityAndContext:
    def test_velocity_matches_frame_loop(self):
        rng = np.random.default_rng(0)
        pose = rng.normal(size=(7, 9, 2)).astype(np.float32)
        obb = rng.normal(size=(7, 10, 2)).astype(np.float32)
        got = assembly.context_features([pose], obb)
        # Frame-loop oracle per reference vhoi/data_loading.py:596-620.
        rows = []
        for j in range(7):
            if j + 1 < 7:
                sk_velo = (pose[j + 1] - pose[j]) * 100
                obb_velo = (obb[j + 1] - obb[j]) * 100
            else:
                sk_velo = np.zeros((9, 2))
                obb_velo = np.zeros((10, 2))
            pv = np.hstack((pose[j], sk_velo)).reshape(-1)
            ov = np.hstack((obb[j], obb_velo)).reshape(-1)
            rows.append(np.concatenate([pv, ov]))
        expected = np.stack(rows).astype(np.float32)
        np.testing.assert_array_equal(got, expected)

    def test_anticipation_labels(self):
        labels = np.array([5, 5, 2, 2, 2, 7])
        got = assembly.anticipation_labels_from_rle(labels)
        assert got == [2, 2, 7, 7, 7]


class TestCad120Assembly:
    def test_shapes_and_contracts(self, tmp_path):
        paths = generate_cad120_dataset(str(tmp_path), num_videos=6, seed=1)
        cfg = Config({"name": "cad120", "path": paths["path"], "path_zarr": paths["path_zarr"],
                      "cross_validation_test_subject": "Subject1",
                      "video_id_to_subject_id": paths["video_id_to_subject_id"],
                      "scaling_strategy": None, "downsampling": 3})
        train_loader, val_loader, data_info, scalers = load_training_data(
            cfg, "2G-GCN", "multiple", batch_size=2, val_fraction=0.25, sigma=0.0)
        assert data_info["input_size"] == (2124, 2048)
        batch = next(iter(train_loader))
        assert len(batch) == 8 + 12  # xs (8) + ys (12), SURVEY.md §2.4
        x_human, x_objects, mask, x_hseg, x_oseg, ho, oo, steps = batch[:8]
        b, t = x_human.shape[:2]
        assert x_human.shape[2:] == (1, 2124)
        assert x_objects.shape[0] == b and x_objects.shape[-1] == 2048
        assert mask.shape == (b, x_objects.shape[2])
        assert x_hseg.shape == (b, t, 1)
        assert steps.shape == (b,)
        assert not np.isnan(x_human).any()  # nan_to_num applied
        # Targets: first 4 are float segmentations, rest are int labels.
        assert batch[8].dtype == np.float32 and batch[12].dtype == np.int64

    def test_test_labels_full_fps(self, tmp_path):
        paths = generate_cad120_dataset(str(tmp_path), num_videos=6, seed=2)
        cfg = Config({"name": "cad120", "path": paths["path"], "path_zarr": paths["path_zarr"],
                      "cross_validation_test_subject": "Subject1",
                      "video_id_to_subject_id": paths["video_id_to_subject_id"],
                      "scaling_strategy": None, "downsampling": 3})
        loader, info, segmentations, test_ids = load_testing_data(
            cfg, "2G-GCN", "multiple", batch_size=128)
        batch = next(iter(loader))
        x_human, y_rec = batch[0], batch[12]
        # Features downsampled, labels at full FPS -> labels cover ~3x frames.
        assert y_rec.shape[1] >= 3 * x_human.shape[1] - 3
        assert len(test_ids) == len(segmentations)


class TestMphoiBimanualAssembly:
    def test_mphoi_end_to_end(self, tmp_path):
        paths = generate_mphoi_dataset(str(tmp_path), num_videos=8, seed=3)
        cfg = Config({"name": "mphoi", "path": paths["path"], "path_zarr": paths["path_zarr"],
                      "path_obb_zarr": paths["path_obb_zarr"],
                      "path_hbb_zarr": paths["path_hbb_zarr"],
                      "path_hps_zarr": paths["path_hps_zarr"],
                      "cross_validation_test_subject": "Subject45",
                      "scaling_strategy": None, "downsampling": 3})
        train_loader, _, data_info, _ = load_training_data(
            cfg, "2G-GCN", "multiple", batch_size=2, val_fraction=0.25)
        assert data_info["input_size"] == (2152, 2048)
        batch = next(iter(train_loader))
        assert len(batch) == 8 + 6
        x_humans = batch[0]
        assert x_humans.shape[2] == 2  # two humans
        hh, ho, oo = batch[4], batch[5], batch[6]
        assert hh.shape[2:] == (2, 2)
        assert ho.shape[2] == 2
        # Group exclusion: no training video shares a subject with {4,5}.
        loader_test, *_ = load_testing_data(cfg, "2G-GCN", "multiple", batch_size=8)
        assert loader_test.num_examples > 0

    def test_mphoi_group_exclusion(self):
        from tggcn.data.loading import _mphoi_video_excluded
        assert _mphoi_video_excluded("Subject45", "Subject45")
        assert _mphoi_video_excluded("Subject15", "Subject45")  # shares subject 5
        assert _mphoi_video_excluded("Subject24", "Subject45")  # shares subject 4
        assert not _mphoi_video_excluded("Subject12", "Subject45")

    def test_bimanual_end_to_end_and_fps_doubling(self, tmp_path):
        paths = generate_bimanual_dataset(str(tmp_path), num_videos=8, seed=4)
        cfg = Config({"name": "bimanual", "path": paths["path"], "path_zarr": paths["path_zarr"],
                      "path_bb_zarr": paths["path_bb_zarr"],
                      "path_hp_zarr": paths["path_hp_zarr"],
                      "video_id_to_video_fps": paths["video_id_to_video_fps"],
                      "cross_validation_test_subject": 1,
                      "scaling_strategy": None, "downsampling": 3})
        train_loader, _, data_info, _ = load_training_data(
            cfg, "2G-GCN", "multiple", batch_size=2, val_fraction=0.25)
        assert data_info["input_size"] == (2168, 2048)
        batch = next(iter(train_loader))
        assert len(batch) == 8 + 6
        assert batch[0].shape[2] == 2  # two hands

    def test_bimanual_baseline_tuple(self, tmp_path):
        paths = generate_bimanual_dataset(str(tmp_path), num_videos=8, seed=5)
        cfg = Config({"name": "bimanual", "path": paths["path"], "path_zarr": paths["path_zarr"],
                      "path_bb_zarr": paths["path_bb_zarr"],
                      "path_hp_zarr": paths["path_hp_zarr"],
                      "video_id_to_video_fps": paths["video_id_to_video_fps"],
                      "cross_validation_test_subject": 1,
                      "scaling_strategy": None, "downsampling": 3})
        train_loader, _, _, _ = load_training_data(
            cfg, "bimanual_baseline", "multiple", batch_size=2, val_fraction=0.25)
        batch = next(iter(train_loader))
        assert len(batch) == 3 + 1  # xs (human, objects, mask) + y_rec


class TestSplits:
    def test_split_is_seeded(self):
        a = split_train_test(list(range(20)), test_fraction=0.2, seed=42)
        b = split_train_test(list(range(20)), test_fraction=0.2, seed=42)
        assert a == b
        assert len(a[1]) == 4

    def test_num_classes(self):
        assert determine_num_classes("2G-GCN", "multiple", "bimanual") == (14, None)
        assert determine_num_classes("2G-GCN", "multiple", "mphoi") == (13, None)
        assert determine_num_classes("2G-GCN", "multiple", "cad120") == (10, 12)


class TestScaling:
    def test_standard_scaling_roundtrip(self, tmp_path):
        paths = generate_cad120_dataset(str(tmp_path), num_videos=6, seed=6)
        cfg = Config({"name": "cad120", "path": paths["path"], "path_zarr": paths["path_zarr"],
                      "cross_validation_test_subject": "Subject1",
                      "video_id_to_subject_id": paths["video_id_to_subject_id"],
                      "scaling_strategy": "standard", "downsampling": 3})
        train_loader, _, _, scalers = load_training_data(
            cfg, "2G-GCN", "multiple", batch_size=4, val_fraction=0.25)
        assert "human_scaler" in scalers and "object_scaler" in scalers
        # Test loader reuses the scalers.
        loader, *_ = load_testing_data(cfg, "2G-GCN", "multiple", batch_size=8, scalers=scalers)
        assert loader.num_examples > 0

    def test_scaling_composes_with_bucketing(self, tmp_path):
        """Buckets share one scaler fit on the full pre-bucket train set."""
        paths = generate_cad120_dataset(str(tmp_path), num_videos=6, seed=6,
                                        min_len=20, max_len=44)
        base = {"name": "cad120", "path": paths["path"],
                "path_zarr": paths["path_zarr"],
                "cross_validation_test_subject": "Subject1",
                "video_id_to_subject_id": paths["video_id_to_subject_id"],
                "scaling_strategy": "standard", "downsampling": 3}
        flat_loader, _, _, flat_scalers = load_training_data(
            Config(dict(base)), "2G-GCN", "multiple", batch_size=4,
            val_fraction=0.25)
        bucketed_loader, _, _, bucket_scalers = load_training_data(
            Config({**base, "length_buckets": 2}), "2G-GCN", "multiple",
            batch_size=4, val_fraction=0.25)
        np.testing.assert_allclose(bucket_scalers["human_scaler"].mean_,
                                   flat_scalers["human_scaler"].mean_)
        np.testing.assert_allclose(bucket_scalers["object_scaler"].scale_,
                                   flat_scalers["object_scaler"].scale_)
        for batch in bucketed_loader:
            assert np.isfinite(batch[0]).all()
