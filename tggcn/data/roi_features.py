"""Offline ROI visual-feature extraction CLI (reference vhoi/roi_features.py:18-347).

Extracts 2048-d ROI-pooled features for provided boxes from video frames and
writes the per-video feature stores the data pipeline consumes (CAD-120:
skeleton / objects / bounding boxes / 2d pose groups; Bimanual: left_hand /
right_hand / objects).

Backbone selection (the reference hard-requires Detectron2 R101-C4 with
Visual-Genome caffe weights):
  * detectron2, when installed, with the same R101-C4 ROI pooling;
  * otherwise a torchvision ResNet-101 + roi_align fallback (same 2048-d
    C4->C5 head structure, ImageNet weights) — features differ numerically
    from the VG weights but the pipeline contract is identical;
  * a clear error when neither is available.

Note: the reference's CAD-120 path is broken as shipped (it imports a
vhoi.cad120 module missing from the repo, roi_features.py:15); datasets are
distributed pre-extracted. This CLI therefore takes boxes from annotation
files passed explicitly.
"""

import argparse
import json
import os
from typing import Iterator, List, Tuple

import numpy as np


def _load_backbone(device: str = "cpu"):
    try:
        return _Detectron2Backbone(device)
    except ImportError:
        pass
    try:
        backbone = _TorchvisionBackbone(device)
    except ImportError as e:
        raise ImportError(
            "ROI feature extraction requires detectron2 or torchvision. "
            "Install one of them, or use the pre-extracted feature stores.") from e
    import warnings

    warnings.warn(
        "detectron2 is not installed; using the torchvision ResNet-101 "
        "fallback with ImageNet weights. These features are NOT numerically "
        "compatible with the Visual-Genome features the distributed "
        "datasets were extracted with (reference vhoi/roi_features.py uses "
        "R101-C4 VG caffe weights) — models trained on the distributed "
        "stores will not transfer to features extracted this way.",
        RuntimeWarning, stacklevel=2)
    return backbone


class _TorchvisionBackbone:
    """ResNet-101 C4 trunk + ROI-align + C5 head -> 2048-d pooled features."""

    def __init__(self, device: str = "cpu"):
        import torch
        import torchvision

        self.torch = torch
        self.ops = torchvision.ops
        resnet = torchvision.models.resnet101(weights="IMAGENET1K_V1")
        modules = list(resnet.children())
        self.trunk = torch.nn.Sequential(*modules[:-3]).to(device).eval()  # through C4
        self.head = modules[-3].to(device).eval()                           # C5
        self.device = device
        self.stride = 16.0

    def extract(self, image: np.ndarray, boxes: np.ndarray) -> np.ndarray:
        torch = self.torch
        with torch.no_grad():
            x = torch.from_numpy(image.astype(np.float32).transpose(2, 0, 1) / 255.0)
            mean = torch.tensor([0.485, 0.456, 0.406]).view(3, 1, 1)
            std = torch.tensor([0.229, 0.224, 0.225]).view(3, 1, 1)
            x = ((x - mean) / std)[None].to(self.device)
            c4 = self.trunk(x)
            rois = torch.from_numpy(boxes.astype(np.float32)).to(self.device)
            pooled = self.ops.roi_align(c4, [rois], output_size=(14, 14),
                                        spatial_scale=1.0 / self.stride,
                                        sampling_ratio=0)
            feats = self.head(pooled).mean(dim=(2, 3))  # (N, 2048)
            return feats.cpu().numpy()


class _Detectron2Backbone:
    """Detectron2 R101-C4 ROI features (the reference's configuration)."""

    def __init__(self, device: str = "cpu"):
        import torch  # noqa: F401
        from detectron2 import model_zoo
        from detectron2.config import get_cfg
        from detectron2.modeling import build_model
        from detectron2.checkpoint import DetectionCheckpointer

        cfg = get_cfg()
        cfg.merge_from_file(model_zoo.get_config_file(
            "COCO-Detection/faster_rcnn_R_101_C4_3x.yaml"))
        cfg.MODEL.DEVICE = device
        self.model = build_model(cfg)
        DetectionCheckpointer(self.model).load(model_zoo.get_checkpoint_url(
            "COCO-Detection/faster_rcnn_R_101_C4_3x.yaml"))
        self.model.eval()

    def extract(self, image: np.ndarray, boxes: np.ndarray) -> np.ndarray:
        import torch
        from detectron2.structures import Boxes

        with torch.no_grad():
            x = torch.as_tensor(image.astype(np.float32).transpose(2, 0, 1))
            inputs = [{"image": x, "height": image.shape[0], "width": image.shape[1]}]
            images = self.model.preprocess_image(inputs)
            features = self.model.backbone(images.tensor)
            rois = Boxes(torch.from_numpy(boxes.astype(np.float32)))
            box_features = self.model.roi_heads._shared_roi_transform(
                [features[f] for f in self.model.roi_heads.in_features], [rois])
            return box_features.mean(dim=[2, 3]).cpu().numpy()


def _frames(video_dir: str) -> Iterator[Tuple[int, np.ndarray]]:
    import cv2

    names = sorted(n for n in os.listdir(video_dir)
                   if n.lower().endswith((".png", ".jpg", ".jpeg")))
    for i, name in enumerate(names):
        image = cv2.imread(os.path.join(video_dir, name))
        if image is not None:
            yield i, image[:, :, ::-1]  # BGR -> RGB


def _open_output(path: str):
    """Writable store: a zarr-v2 DirectoryStore, or an .npz accumulator."""
    if path.endswith(".npz"):
        return None, {"__path__": path}
    try:
        import zarr

        return zarr.open(path, mode="a"), None
    except ImportError:
        from tggcn.data import zarr_lite

        return zarr_lite.create_group(path), None


def _store(zarr_root, npz_acc, key: str, array: np.ndarray):
    if npz_acc is not None:
        npz_acc[key] = array
    elif isinstance(zarr_root, str):  # zarr_lite group path
        from tggcn.data import zarr_lite

        zarr_lite.write_array(zarr_root, key, array)
    else:
        zarr_root[key] = array


def _flush(npz_acc):
    if npz_acc is not None:
        path = npz_acc.pop("__path__")
        np.savez_compressed(path, **npz_acc)
        print(f"wrote {path}")


def extract_video_features(backbone, video_dir: str, per_frame_boxes: List[np.ndarray]):
    """Per frame, extract ROI features for that frame's boxes."""
    features = []
    for i, image in _frames(video_dir):
        boxes = per_frame_boxes[i] if i < len(per_frame_boxes) else None
        if boxes is None or len(boxes) == 0:
            continue
        features.append(backbone.extract(image, np.asarray(boxes)))
    return np.stack(features) if features else np.zeros((0, 0, 2048), np.float32)


def extract_from_manifest(args):
    """Generic path: a JSON manifest maps video ids to frame dirs + box files.

    Manifest entry: {"video_id": {"frames": dir, "streams": {name: boxes.npy}}}
    where each boxes file holds (T, N, 4) x0,y0,x1,y1 boxes. One output group
    per stream, mirroring the reference store layout (e.g. left_hand /
    right_hand / objects for Bimanual; skeleton / objects for CAD-120).
    """
    backbone = _load_backbone(args.device)
    with open(args.manifest) as f:
        manifest = json.load(f)
    zarr_root, npz_acc = _open_output(args.output)
    for video_id, spec in manifest.items():
        for stream, boxes_file in spec["streams"].items():
            boxes = np.load(boxes_file)
            feats = []
            for i, image in _frames(spec["frames"]):
                if i >= len(boxes):
                    break
                frame_boxes = np.atleast_2d(boxes[i])
                feats.append(backbone.extract(image, frame_boxes))
            if feats:
                _store(zarr_root, npz_acc, f"{video_id}/{stream}",
                       np.stack(feats).astype(np.float32))
        print(f"extracted {video_id}")
    _flush(npz_acc)


def create_arg_parser():
    parser = argparse.ArgumentParser(description="ROI visual feature extraction.")
    subparsers = parser.add_subparsers(required=True)
    for name in ("cad-120", "bimanual", "mphoi", "manifest"):
        sub = subparsers.add_parser(name)
        sub.add_argument("--manifest", type=str, required=True,
                         help="JSON manifest: video_id -> {frames dir, streams -> boxes file}.")
        sub.add_argument("--output", type=str, required=True,
                         help="Output feature store (zarr dir or .npz).")
        sub.add_argument("--device", type=str, default="cpu")
        sub.set_defaults(func=extract_from_manifest)
    return parser


def main():
    args = create_arg_parser().parse_args()
    args.func(args)


if __name__ == "__main__":
    main()
