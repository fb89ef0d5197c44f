"""Dataset loading: CAD-120 / Bimanual Actions / MPHOI-72.

File-format and split parity with the reference (vhoi/data_loading.py:23-359):
the same zarr group layouts, JSON/pickle ground truth, leave-subject-out
filters (including MPHOI's group-exclusion product test and the Bimanual
15-FPS frame-doubling fixup), and the seed-42 train/val split.

The torch DataLoader/TensorDataset pair is replaced by a light numpy batch
iterator; device placement is handled by jit'ed train/eval steps (there is no
explicit host->device fetch boundary as in the reference's gcn_fetcher).
"""

import json
import os
import random
from functools import partial
from typing import Optional

import numpy as np

from tggcn.data import assembly
from tggcn.data.cad120classes import load_cad120_pickle
from tggcn.utils.io import read_dictionary

try:  # zarr is optional; pre-extracted stores can also be .npz bundles.
    import zarr  # type: ignore

    _HAS_ZARR = True
except ImportError:  # pragma: no cover - environment without zarr
    zarr = None
    _HAS_ZARR = False


class _NpzStore:
    """Read-only zarr-group-like view over an .npz bundle ('vid/stream' keys)."""

    def __init__(self, path: str):
        self._data = np.load(path, allow_pickle=False)

    def __getitem__(self, key: str):
        if key in self._data:
            return _NpzArray(self._data[key])
        return _NpzGroup(self._data, key)


class _NpzGroup:
    def __init__(self, data, prefix: str):
        self._data = data
        self._prefix = prefix

    def __getitem__(self, key: str):
        return _NpzArray(self._data[f"{self._prefix}/{key}"])


class _NpzArray:
    def __init__(self, array):
        self._array = array

    def __getitem__(self, item):
        return self._array[item]


def open_store(path: str):
    """Open a feature store: zarr DirectoryStore or an .npz bundle.

    zarr directories are read by the vendored zarr-v2 reader
    (tggcn/data/zarr_lite.py — raw/zlib chunks in Python, blosc-lz4 via the
    native decoder), or by the zarr package itself when it is installed.
    """
    if path.endswith(".npz"):
        return _NpzStore(path)
    if _HAS_ZARR:
        return zarr.open(path, mode="r")
    from tggcn.data import zarr_lite

    return zarr_lite.open_readonly(path)


def split_train_test(training_data: list, test_fraction: float = 0.2, seed: int = 42):
    """Seeded shuffle split (reference :353-359)."""
    random.seed(seed)
    random.shuffle(training_data)
    num_testing = round(len(training_data) * test_fraction)
    return training_data[num_testing:], training_data[:num_testing]


# --------------------------------------------------------------------------
# Batch iteration
# --------------------------------------------------------------------------


class ArrayDataLoader:
    """Minimal numpy replacement for DataLoader(TensorDataset(...)).

    ``dataset`` indexing mirrors TensorDataset (dataset[i] -> tuple over
    tensors for example i); iteration yields lists of per-tensor batches.
    """

    def __init__(self, tensors: list, batch_size: int, shuffle: bool, seed: int = 0):
        self.tensors = tensors
        self.batch_size = max(int(batch_size), 1)
        self.shuffle = shuffle
        self.seed = seed
        self._epoch = 0
        self.num_examples = len(tensors[0]) if tensors else 0

    def set_epoch(self, epoch: int) -> None:
        """Pin the shuffle order of the next iteration to (seed, epoch).

        Makes epoch order a pure function of the epoch number, so a resumed
        run sees exactly the batches the uninterrupted run would have seen.
        """
        self._epoch = int(epoch)

    class _Dataset:
        def __init__(self, tensors):
            self._tensors = tensors

        def __getitem__(self, i):
            return tuple(t[i] for t in self._tensors)

        def __len__(self):
            return len(self._tensors[0]) if self._tensors else 0

    @property
    def dataset(self):
        return self._Dataset(self.tensors)

    def __len__(self):
        return (self.num_examples + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        order = np.arange(self.num_examples)
        if self.shuffle:
            np.random.default_rng((self.seed, self._epoch)).shuffle(order)
            self._epoch += 1
        for start in range(0, self.num_examples, self.batch_size):
            idx = order[start:start + self.batch_size]
            yield [t[idx] for t in self.tensors]


# --------------------------------------------------------------------------
# Feature scaling
# --------------------------------------------------------------------------


# Model families whose human/object feature streams get standardised, and
# the checkpoint key each fitted scaler is stored under (key names are the
# checkpoint contract — eval recovers them via rundir.load_scalers()).
_SCALED_MODELS = frozenset({"2G-GCN", "bimanual_baseline", "cad120_baseline"})
_SCALED_STREAMS = (("human_scaler", 0), ("object_scaler", 1))


def fit_or_apply_scalers(x: list, model_name: str,
                         scaling_strategy: Optional[str] = None,
                         scalers: Optional[dict] = None):
    """Standardise the human/object feature tensors over the feature axis.

    Training call sites pass ``scaling_strategy`` with no ``scalers``: each
    stream gets an sklearn ``StandardScaler`` fit on its flattened
    ``(-1, features)`` view. Eval call sites pass the fitted ``scalers``
    recovered from the training checkpoint and reuse them as-is. Models
    outside the scaled families pass through untouched.

    Behavioural parity with reference vhoi/data_loading.py:404-433 (fit on
    train, reuse at test, scalers persisted in the checkpoint, train.py:61).
    """
    fitting = not scalers
    if fitting and scaling_strategy is None:
        return x, {}
    if model_name not in _SCALED_MODELS:
        return x, {} if fitting else scalers
    from sklearn.preprocessing import StandardScaler

    out, fitted = list(x), {}
    for key, idx in _SCALED_STREAMS:
        flat = out[idx].reshape(-1, out[idx].shape[-1])
        scaler = (scalers or {}).get(key)
        if isinstance(scaler, np.ndarray) and scaler.dtype == object:
            # Checkpoints written before the _to_numpy fix wrapped the
            # scaler objects in 0-d object arrays; unwrap transparently.
            scaler = scaler.item()
        if scaler is None:
            if scaling_strategy != "standard":
                raise ValueError(
                    f"unsupported scaling strategy {scaling_strategy!r}: only "
                    "'standard' (per-feature standardisation) is implemented")
            scaler = StandardScaler().fit(flat)
        fitted[key] = scaler
        out[idx] = scaler.transform(flat).reshape(out[idx].shape)
    return out, fitted


# --------------------------------------------------------------------------
# Data loader creation (assembly + scaling + nan_to_num)
# --------------------------------------------------------------------------


def _assemble_flat(data, model_name, dataset_name, sigma, downsampling, test_data,
                   scaling_strategy=None, scalers=None):
    if dataset_name.lower() == "cad120":
        x, y = assembly.assemble_cad120_tensors(data, model_name, sigma=sigma,
                                                downsampling=downsampling, test_data=test_data)
    elif dataset_name.lower() == "mphoi":
        x, y = assembly.assemble_mphoi_tensors(data, model_name, sigma=sigma,
                                               downsampling=downsampling, test_data=test_data)
    else:
        x, y = assembly.assemble_bimanual_tensors(data, model_name, sigma=sigma,
                                                  downsampling=downsampling, test_data=test_data)
    x, scalers = fit_or_apply_scalers(x, model_name, scaling_strategy=scaling_strategy,
                                      scalers=scalers)
    x = [np.nan_to_num(ix, copy=False, nan=0.0) for ix in x]
    return x + y, scalers


def create_data_loader(data, model_name: str, model_input_type: str, dataset_name: str,
                       batch_size: int, shuffle: bool, scaling_strategy: Optional[str] = None,
                       scalers: Optional[dict] = None, sigma: float = 0.0,
                       downsampling: int = 1, test_data: bool = False,
                       length_buckets: int = 0):
    segmentations = assemble_segmentations(data, model_name, dataset_name=dataset_name)
    if length_buckets and length_buckets > 1:
        # Length-bucketed batching: each bucket pads to its own max length
        # (bounds both padding waste and recompilation; tggcn/data/pipeline.py).
        from tggcn.data.pipeline import make_bucketed_loader

        bucket_scalers = dict(scalers) if scalers else {}
        if scaling_strategy is not None and not bucket_scalers:
            # Fit the scalers once on the full (pre-bucket, globally padded)
            # set — identical statistics to the unbucketed path — then apply
            # them per bucket below.
            _, bucket_scalers = _assemble_flat(data, model_name, dataset_name,
                                               sigma, downsampling, test_data,
                                               scaling_strategy, None)
        loader = make_bucketed_loader(
            data,
            lambda bucket: _assemble_flat(
                bucket, model_name, dataset_name, sigma, downsampling, test_data,
                scaling_strategy if bucket_scalers else None, bucket_scalers)[0],
            length_buckets, batch_size=batch_size, shuffle=shuffle,
            length_fn=lambda item: len(item[0]))
        return loader, bucket_scalers, segmentations
    tensors, scalers = _assemble_flat(data, model_name, dataset_name, sigma, downsampling,
                                      test_data, scaling_strategy, scalers)
    loader = ArrayDataLoader(tensors, batch_size=batch_size, shuffle=shuffle)
    return loader, scalers, segmentations


def assemble_segmentations(data, model_name: str, dataset_name: str):
    """GT segment intervals for frame->segment eval (reference :382-401)."""
    if model_name != "2G-GCN" or dataset_name.lower() != "cad120":
        return None
    segmentations = []
    for *_, video_data in data:
        segmentations.append([])
        for segment in video_data:
            if segment.start_frame is None or segment.end_frame is None:
                continue
            segmentations[-1].append((segment.start_frame - 1, segment.end_frame - 1))
    return segmentations


# --------------------------------------------------------------------------
# Per-dataset raw loading (train/test)
# --------------------------------------------------------------------------


def _load_cad120_raw(data_path, data_path_zarr, video_id_to_subject_id, test_subject_id,
                     keep_test: bool):
    root = open_store(data_path_zarr) if data_path_zarr is not None else None
    data = load_cad120_pickle(data_path)
    out, ids = [], []
    for video_id, video_data in data.items():
        # Video 0505003751 has features but no subject: always dropped (reference :33-37).
        subject_id = video_id_to_subject_id.get(video_id)
        if subject_id is None:
            continue
        is_test = subject_id == test_subject_id
        if is_test != keep_test:
            continue
        if root is not None:
            datum = [root[video_id + "/skeleton"][:], root[video_id + "/objects"][:],
                     root[video_id + "/skeleton_bounding_box"][:],
                     root[video_id + "/objects_bounding_box"][:],
                     root[video_id + "/skeleton_2d_pose"][:],
                     video_data]
        else:
            datum = video_data
        out.append(datum)
        ids.append(video_id)
    return out, ids


def _load_bimanual_raw(data_path, data_path_zarr, data_path_bbs_zarr, data_path_hps_zarr,
                       test_subject_id, video_id_to_video_fps, keep_test: bool):
    with open(data_path, mode="rb") as f:
        data = json.load(f)
    root = open_store(data_path_zarr)
    root_bbs = open_store(data_path_bbs_zarr)
    root_hps = open_store(data_path_hps_zarr)
    out, ids = [], []
    for video_id, hands_gt in data.items():
        subject, _task, _take = video_id.split(sep="-")
        subject_id = int(subject.split(sep="_")[1])
        if (subject_id == test_subject_id) != keep_test:
            continue
        arrays = [root[video_id]["left_hand"][:], root[video_id]["right_hand"][:],
                  root[video_id]["objects"][:]]
        bbs = [root_bbs[video_id]["left_hand"][:], root_bbs[video_id]["right_hand"][:],
               root_bbs[video_id]["objects"][:]]
        hps = [root_hps[video_id]["left_hand"][:], root_hps[video_id]["right_hand"][:]]
        gt = {k: np.asarray(v) for k, v in hands_gt.items()}
        if video_id_to_video_fps[video_id] == 15:
            # Some videos were mistakenly collected at 15 FPS: double frames
            # to normalise to 30 FPS (reference :89-99).
            arrays = [np.repeat(a, repeats=2, axis=0) for a in arrays]
            bbs = [np.repeat(a, repeats=2, axis=0) for a in bbs]
            hps = [np.repeat(a, repeats=2, axis=0) for a in hps]
            gt = {k: np.repeat(v, repeats=2, axis=0) for k, v in gt.items()}
        out.append([arrays[0], arrays[1], arrays[2], gt, bbs[0], bbs[1], bbs[2], hps[0], hps[1]])
        ids.append(video_id)
    return out, ids


def _mphoi_video_excluded(video_subject_id: str, test_subject_id: str) -> bool:
    """Group-exclusion test: a video is excluded from training when any of its
    two subjects matches any test subject (reference :130-133)."""
    first_sub, second_sub = int(video_subject_id[-2]), int(video_subject_id[-1])
    first_test, second_test = int(test_subject_id[-2]), int(test_subject_id[-1])
    return ((first_sub - first_test) * (second_sub - second_test) *
            (first_sub - second_test) * (second_sub - first_test)) == 0


def _load_mphoi_raw(data_path, data_path_zarr, data_path_obbs_zarr, data_path_hbbs_zarr,
                    data_path_hps_zarr, test_subject_id, keep_test: bool):
    with open(data_path, mode="rb") as f:
        data = json.load(f)
    root = open_store(data_path_zarr)
    root_obbs = open_store(data_path_obbs_zarr)
    root_hbbs = open_store(data_path_hbbs_zarr)
    root_hps = open_store(data_path_hps_zarr)
    out, ids = [], []
    for video_id, human_gt in data.items():
        subject_id, _task, _take = video_id.split(sep="-")
        if keep_test:
            if subject_id != test_subject_id:
                continue
        else:
            if _mphoi_video_excluded(subject_id, test_subject_id):
                continue
        gt = {k: np.asarray(v) for k, v in human_gt.items()}
        out.append([root[video_id]["Human1"][:], root[video_id]["Human2"][:],
                    root[video_id]["objects"][:], gt,
                    root_hbbs[video_id]["Human1"][:], root_hbbs[video_id]["Human2"][:],
                    root_obbs[video_id]["objects"][:],
                    root_hps[video_id]["Human1"][:], root_hps[video_id]["Human2"][:]])
        ids.append(video_id)
    return out, ids


# --------------------------------------------------------------------------
# Public API (same shape as the reference's load_training_data/load_testing_data)
# --------------------------------------------------------------------------


def _dataset_name_from_path(data_path: str) -> str:
    if "BimanualActions" in data_path:
        return "bimanual"
    if "MPHOI" in data_path:
        return "mphoi"
    return "cad120"


def load_training_data(data, model_name, model_input_type, batch_size: int = 8,
                       val_fraction: float = 0.2, seed: int = 42, debug: bool = False,
                       sigma: float = 0.0):
    """Load + assemble train/val loaders (reference :160-198)."""
    data_path = data.path
    dataset_name = _dataset_name_from_path(data_path)
    test_subject_id = data.cross_validation_test_subject
    scaling_strategy = data.get("scaling_strategy", default_value=None)
    downsampling = data.get("downsampling", default_value=1)
    length_buckets = data.get("length_buckets", default_value=0)

    if dataset_name == "bimanual":
        with open(data.video_id_to_video_fps, mode="r") as f:
            fps_map = json.load(f)
        raw, _ = _load_bimanual_raw(data_path, data.path_zarr, data.path_bb_zarr,
                                    data.path_hp_zarr, test_subject_id, fps_map,
                                    keep_test=False)
    elif dataset_name == "mphoi":
        raw, _ = _load_mphoi_raw(data_path, data.path_zarr, data.path_obb_zarr,
                                 data.path_hbb_zarr, data.path_hps_zarr, test_subject_id,
                                 keep_test=False)
    else:
        video_id_to_subject_id = read_dictionary(data.video_id_to_subject_id)
        raw, _ = _load_cad120_raw(data_path, data.get("path_zarr"), video_id_to_subject_id,
                                  test_subject_id, keep_test=False)

    train_raw, val_raw = split_train_test(raw, test_fraction=val_fraction, seed=seed)
    if debug:
        train_raw = train_raw[:4]
        val_raw = val_raw[:1]
    train_loader, scalers, _ = create_data_loader(
        train_raw, model_name, model_input_type, dataset_name, batch_size=batch_size,
        shuffle=True, scaling_strategy=scaling_strategy, sigma=sigma,
        downsampling=downsampling, test_data=False, length_buckets=length_buckets)
    val_loader, _, _ = create_data_loader(
        val_raw, model_name, model_input_type, dataset_name, batch_size=max(len(val_raw), 1),
        shuffle=False, scalers=scalers, sigma=sigma, downsampling=downsampling,
        test_data=False)
    input_size = input_size_from_data_loader(train_loader, model_name, model_input_type)
    data_info = {"input_size": input_size}
    return train_loader, val_loader, data_info, scalers


def load_testing_data(data, model_name: str, model_input_type: str, batch_size: int,
                      scalers: Optional[dict] = None):
    """Load + assemble the test loader (reference :312-350).

    Test labels stay at full FPS (test_data=True) so predictions are
    upsampled at eval time.
    """
    data_path = data.path
    dataset_name = _dataset_name_from_path(data_path)
    test_subject_id = data.cross_validation_test_subject
    downsampling = data.get("downsampling", default_value=1)

    if dataset_name == "bimanual":
        with open(data.video_id_to_video_fps, mode="r") as f:
            fps_map = json.load(f)
        bb_zarr = data.get("path_bb_zarr") or os.path.join(os.path.dirname(data.path_zarr),
                                                           "bounding_boxes.zarr")
        hp_zarr = data.get("path_hp_zarr") or os.path.join(os.path.dirname(data.path_zarr),
                                                           "hands_pose.zarr")
        raw, test_ids = _load_bimanual_raw(data_path, data.path_zarr, bb_zarr, hp_zarr,
                                           test_subject_id, fps_map, keep_test=True)
    elif dataset_name == "mphoi":
        base = os.path.dirname(data.path_zarr)
        obb = data.get("path_obb_zarr") or os.path.join(base, "object_bounding_boxes.zarr")
        hbb = data.get("path_hbb_zarr") or os.path.join(base, "human_bounding_boxes.zarr")
        hps = data.get("path_hps_zarr") or os.path.join(base, "human_pose.zarr")
        raw, test_ids = _load_mphoi_raw(data_path, data.path_zarr, obb, hbb, hps,
                                        test_subject_id, keep_test=True)
    else:
        video_id_to_subject_id = read_dictionary(data.video_id_to_subject_id)
        raw, test_ids = _load_cad120_raw(data_path, data.get("path_zarr"),
                                         video_id_to_subject_id, test_subject_id,
                                         keep_test=True)

    test_loader, _, segmentations = create_data_loader(
        raw, model_name, model_input_type, dataset_name, batch_size=batch_size,
        shuffle=False, scalers=scalers, downsampling=downsampling, test_data=True)
    input_size = input_size_from_data_loader(test_loader, model_name, model_input_type)
    data_info = {"input_size": input_size}
    return test_loader, data_info, segmentations, test_ids


def determine_num_classes(model_name: str, model_input_type: str, dataset_name: str):
    """Class counts per dataset (reference :1318-1329)."""
    if model_name in {"2G-GCN", "bimanual_baseline", "cad120_baseline"}:
        if dataset_name.lower() == "bimanual":
            return 14, None
        if dataset_name.lower() == "mphoi":
            return 13, None
        return 10, 12
    if model_input_type == "human":
        return 10
    return 12


def input_size_from_data_loader(data_loader, model_name: str, model_input_type: str):
    if model_name in {"2G-GCN", "bimanual_baseline", "cad120_baseline"}:
        human_input_size = data_loader.dataset[0][0].shape[-1]
        object_input_size = data_loader.dataset[0][1].shape[-1]
        return human_input_size, object_input_size
    raise ValueError(f"{model_name} is not an option for model name.")


# --------------------------------------------------------------------------
# Fetch / feed adapters (positional tuple -> model kwargs)
# --------------------------------------------------------------------------


def generic_fetcher(dataset, n: int):
    """First n tensors are inputs, the rest targets (reference fetchers.py:13)."""
    return list(dataset[:n]), list(dataset[n:])


def gcn_fetcher(dataset, **kwargs):
    """Split the 2G-GCN batch tuple into (data, targets) (reference :1282-1315).

    Device placement is implicit (arrays are consumed by jit'ed steps), so
    unlike the reference this does not copy tensors; it only slices.
    """
    dataset_name = kwargs.get("dataset_name", "cad120")
    if dataset_name == "cad120":
        data = list(dataset[:7]) + [dataset[7]]
        targets = list(dataset[8:])
    else:
        data = list(dataset[:8])
        targets = list(dataset[8:])
    return data, targets


def gcn_forward_kwargs(data, num_humans_shape=None, **kwargs):
    """Map the 2G-GCN data tuple onto model kwargs (reference gcn_forward, :1233-1279)."""
    import numpy as _np

    input_human_segmentation = kwargs.get("input_human_segmentation", False)
    impose_segmentation_pattern = kwargs.get("impose_segmentation_pattern", 0)
    if impose_segmentation_pattern:
        if impose_segmentation_pattern != 1:
            raise ValueError(
                f"Segmentation pattern can only be 1, not {impose_segmentation_pattern}")
        human_segmentation = _np.ones(data[0].shape[:-1], dtype=data[0].dtype)
    elif input_human_segmentation:
        human_segmentation = data[3]
    else:
        human_segmentation = None
    model_kwargs = {
        "x_human": data[0],
        "x_objects": data[1],
        "objects_mask": data[2],
        "human_segmentation": human_segmentation,
    }
    dataset_name = kwargs.get("dataset_name", "cad120")
    hh = ho = oo = None
    if dataset_name == "cad120":
        input_object_segmentation = kwargs.get("input_object_segmentation", False)
        if impose_segmentation_pattern:
            object_segmentation = _np.ones(data[1].shape[:-1], dtype=data[1].dtype)
        elif input_object_segmentation:
            object_segmentation = data[4]
        else:
            object_segmentation = None
        model_kwargs["objects_segmentation"] = object_segmentation
        if kwargs.get("make_attention_distance_based", False):
            ho, oo = data[5], data[6]
    else:
        if kwargs.get("make_attention_distance_based", False):
            hh, ho, oo = data[4], data[5], data[6]
    model_kwargs["human_human_distances"] = hh
    model_kwargs["human_object_distances"] = ho
    model_kwargs["object_object_distances"] = oo
    model_kwargs["steps_per_example"] = data[7]
    return model_kwargs


def select_model_data_fetcher(model_name: str, model_input_type: str, **kwargs):
    model_to_fetcher = {
        "bimanual_baseline": partial(generic_fetcher, n=3),
        "cad120_baseline": partial(generic_fetcher, n=3),
        "2G-GCN": partial(gcn_fetcher, **kwargs),
    }
    return model_to_fetcher[model_name]


def select_model_data_feeder(model_name: str, model_input_type: str, **kwargs):
    if model_name in {"bimanual_baseline", "cad120_baseline"}:
        def baseline_feeder(data, **_kw):
            return {"x_human": data[0], "x_objects": data[1], "objects_mask": data[2]}
        return baseline_feeder
    return partial(gcn_forward_kwargs, **kwargs)
