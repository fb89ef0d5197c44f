"""Offline tooling: analysis CLI subcommands, cv2 drawing, CV-split builder."""

import argparse
import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


class TestAnalysisCli:
    def test_performance_diff(self, tmp_path, capsys):
        import analysis

        first = tmp_path / "a.txt"
        second = tmp_path / "b.txt"
        first.write_text("sub-activity_recognition_v1_0: 0.5000\n"
                         "sub-activity_recognition_v2_0: 0.2000\n")
        second.write_text("sub-activity_recognition_v1_0: 0.7500\n"
                          "sub-activity_recognition_v2_0: 0.1000\n"
                          "only_in_second_0: 0.9\n")
        args = argparse.Namespace(first_file=str(first), second_file=str(second),
                                  top_k=0, ascending=False)
        analysis.performance_diff(args)
        out = capsys.readouterr().out
        assert "0.5000 -> 0.7500 (+0.2500)" in out
        assert "only_in_second_0" in out

    def test_plot_curves(self, tmp_path):
        import analysis
        from tggcn.train.checkpoint import save_checkpoint

        run_dir = tmp_path / "run_Subject1"
        run_dir.mkdir()
        ckpt = {"epoch": 2, "model_state_dict": {},
                "train_losses": [[2.0, [2.0]], [1.5, [1.5]]],
                "val_losses": [[2.2, [2.2]], [1.8, [1.8]]]}
        save_checkpoint(str(run_dir), ckpt, checkpoint_name="run_Subject1")
        args = argparse.Namespace(model_dir=str(run_dir), save_file=None)
        analysis.plot_curves(args)
        assert os.path.exists(run_dir / "loss_curves.png")

    def test_plot_curves_reference_tar_run_dir(self, tmp_path):
        """plot_curves reads reference .tar (torch) run dirs too."""
        import torch

        import analysis

        run_dir = tmp_path / "ref_Subject3"
        run_dir.mkdir()
        ckpt = {"epoch": 2, "model_state_dict": {},
                "train_losses": [[2.0, [2.0]], [1.5, [1.5]]],
                "val_losses": [[2.2, [2.2]], [1.8, [1.8]]]}
        try:
            # Real reference tars carry sklearn scaler objects (reference
            # train.py:61) which torch>=2.6 weights_only loading rejects —
            # include one so the loader is exercised against the real format.
            from sklearn.preprocessing import StandardScaler

            ckpt["scalers"] = [StandardScaler()]
        except ImportError:
            pass
        torch.save(ckpt, str(run_dir / "ref_Subject3.tar"))
        args = argparse.Namespace(model_dir=str(run_dir), save_file=None)
        analysis.plot_curves(args)
        assert os.path.exists(run_dir / "loss_curves.png")

    def test_plot_comparison(self, tmp_path):
        import analysis

        gt = {"vid1": {"1": [0, 0, 1, 1], "2": [2, 2, 0, 0]}}
        pred = {"vid1": {"1": [0, 1, 1, 1], "2": [2, 0, 0, 0]}}
        gt_file, pred_file = tmp_path / "gt.json", tmp_path / "pred.json"
        gt_file.write_text(json.dumps(gt))
        pred_file.write_text(json.dumps(pred))
        save_dir = tmp_path / "plots"
        args = argparse.Namespace(ground_truth_file=str(gt_file),
                                  prediction_files=[str(pred_file)],
                                  save_dir=str(save_dir), class_dictionary=None)
        analysis.plot_comparison(args)
        assert sorted(os.listdir(save_dir)) == ["vid1_1.png", "vid1_2.png"]


class TestDrawing:
    def test_draw_keypoints_and_boxes(self):
        cv2 = pytest.importorskip("cv2")
        del cv2
        from tggcn.utils.drawing import draw_bounding_boxes, draw_keypoints

        image = np.zeros((40, 40, 3), dtype=np.uint8)
        kps = np.array([[10.0, 10.0], [30.0, 30.0], [np.nan, np.nan]])
        out = draw_keypoints(image, kps, connections=[(0, 1), (1, 2)], dotted=True)
        assert out.sum() > 0 and image.sum() == 0  # drawn on a copy
        out2 = draw_bounding_boxes(image, np.array([[5.0, 5.0, 20.0, 20.0],
                                                    [np.nan] * 4]))
        assert out2.sum() > 0


class TestCrossValidationBuilder:
    def test_build_and_write_map(self, tmp_path):
        from tggcn.data.cross_validation import (
            build_video_id_to_subject_map,
            write_video_id_to_subject_map,
        )

        root = tmp_path / "annotations"
        for subject, vids in [("Subject1", ["0001", "0002"]), ("Subject3", ["0003"])]:
            for task in ["arranging_objects"]:
                d = root / f"{subject}_annotations" / task
                d.mkdir(parents=True)
                for vid in vids:
                    (d / f"{vid}.txt").write_text("")
        mapping = build_video_id_to_subject_map(str(root))
        assert mapping == {"0001": "Subject1", "0002": "Subject1", "0003": "Subject3"}
        out = tmp_path / "dicts" / "video-id_to_subject.txt"
        write_video_id_to_subject_map(mapping, str(out))
        from tggcn.utils.io import read_dictionary
        assert read_dictionary(str(out)) == mapping


class TestRoiFeaturesCLI:
    """Smoke test of the extraction CLI with a stub backbone (no detectron2/
    torchvision weights in this environment; reference vhoi/roi_features.py)."""

    class _StubBackbone:
        def extract(self, image, boxes):
            # Deterministic: mean pixel + box area per ROI, tiled to 2048.
            feats = []
            for box in np.atleast_2d(boxes):
                area = float((box[2] - box[0]) * (box[3] - box[1]))
                feats.append(np.full(2048, image.mean() + area, np.float32))
            return np.stack(feats)

    def _make_inputs(self, tmp_path, num_frames=3, num_boxes=2):
        import cv2

        frames_dir = tmp_path / "frames"
        frames_dir.mkdir()
        rng = np.random.default_rng(0)
        for i in range(num_frames):
            cv2.imwrite(str(frames_dir / f"{i:04d}.png"),
                        rng.integers(0, 255, size=(32, 48, 3)).astype(np.uint8))
        boxes = rng.uniform(0, 16, size=(num_frames, num_boxes, 2))
        boxes = np.concatenate([boxes, boxes + 8], axis=-1).astype(np.float32)
        boxes_file = tmp_path / "boxes.npy"
        np.save(boxes_file, boxes)
        manifest = tmp_path / "manifest.json"
        manifest.write_text(json.dumps({
            "vid0": {"frames": str(frames_dir),
                     "streams": {"left_hand": str(boxes_file)}}}))
        return manifest

    def test_manifest_extraction_writes_zarr(self, tmp_path, monkeypatch):
        import argparse

        from tggcn.data import roi_features, zarr_lite

        manifest = self._make_inputs(tmp_path)
        monkeypatch.setattr(roi_features, "_load_backbone",
                            lambda device: self._StubBackbone())
        out = tmp_path / "features.zarr"
        args = argparse.Namespace(manifest=str(manifest), output=str(out),
                                  device="cpu")
        roi_features.extract_from_manifest(args)
        store = zarr_lite.open_readonly(str(out))
        feats = store["vid0"]["left_hand"][:]
        assert feats.shape == (3, 2, 2048)
        assert np.isfinite(feats).all() and feats.std() > 0

    def test_torchvision_fallback_warns(self, monkeypatch):
        from tggcn.data import roi_features

        class _FakeTV:
            def __init__(self, device):
                pass

        monkeypatch.setattr(roi_features, "_Detectron2Backbone",
                            lambda device: (_ for _ in ()).throw(ImportError()))
        monkeypatch.setattr(roi_features, "_TorchvisionBackbone", _FakeTV)
        with pytest.warns(RuntimeWarning, match="NOT numerically compatible"):
            roi_features._load_backbone("cpu")
