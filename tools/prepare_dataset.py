"""Real-data readiness kit: lay out / verify the dataset stores the loaders expect.

The official downloads (README.md "Datasets": MPHOI-72 via Durham
Collections/OneDrive, CAD-120 + Bimanual via the reference's Google Drive
folder) arrive as loose folders. The loaders (tggcn/data/loading.py, store
layout mirroring reference vhoi/data_loading.py:23-157) expect the exact
tree conf/data/*.yaml points at under ``./data``. This tool closes the gap:

  # What is missing / malformed under ./data for MPHOI?
  python tools/prepare_dataset.py --dataset mphoi --check

  # Wire a downloaded folder into the expected layout (symlinks by default)
  python tools/prepare_dataset.py --dataset mphoi --source ~/Downloads/MPHOI_72

  # Structural check + actually load the dataset through the real loaders
  python tools/prepare_dataset.py --dataset mphoi --check --smoke

On success it prints the exact train/predict command per cross-validation
fold, so F1@k parity against the reference protocol is a single command per
fold once the stores exist.
"""

import argparse
import dataclasses
import json
import os
import shutil
import sys
from typing import List, Optional

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

CV_FOLDS = {
    "cad120": ["Subject1", "Subject3", "Subject4", "Subject5"],
    "bimanual": ["1", "2", "3", "4", "5", "6"],
    "mphoi": ["Subject45", "Subject25", "Subject14"],
}


@dataclasses.dataclass(frozen=True)
class Entry:
    config_key: Optional[str]  # key in conf/data/<dataset>.yaml, None = aux
    relpath: str               # expected path relative to the data root
    kind: str                  # json | zarr | pickle | txt
    required: bool = True
    note: str = ""


# Mirrors conf/data/*.yaml exactly (tests/test_prepare_dataset.py pins the
# correspondence) and the reference's store tree (vhoi/data_loading.py).
MANIFESTS = {
    "mphoi": [
        Entry("path", "MPHOI/mphoi_ground_truth_labels.json", "json"),
        Entry("path_zarr",
              "MPHOI/mphoi_derived_features/faster_rcnn.zarr", "zarr"),
        Entry("path_obb_zarr",
              "MPHOI/mphoi_derived_features/object_bounding_boxes.zarr", "zarr"),
        Entry("path_hbb_zarr",
              "MPHOI/mphoi_derived_features/human_bounding_boxes.zarr", "zarr"),
        Entry("path_hps_zarr",
              "MPHOI/mphoi_derived_features/human_pose.zarr", "zarr"),
        Entry(None, "MPHOI/mphoi_action_id_to_action_name.json", "json",
              required=False, note="class names in predict.py reports"),
    ],
    "cad120": [
        Entry("path", "CAD-120/features/preprocessed/cad120data.pickle",
              "pickle"),
        Entry("path_zarr", "CAD-120/features/faster_rcnn/features.zarr",
              "zarr"),
        Entry("video_id_to_subject_id",
              "CAD-120/dictionaries/video-id_to_subject.txt", "txt"),
        Entry(None, "CAD-120/dictionaries/subactivity-id_to_subactivity-name.txt",
              "txt", required=False, note="class names in predict.py reports"),
        Entry(None, "CAD-120/dictionaries/affordance-id_to_affordance-name.txt",
              "txt", required=False, note="class names in predict.py reports"),
    ],
    "bimanual": [
        Entry("path", "BimanualActions/bimacs_ground_truth_labels.json",
              "json"),
        Entry("path_zarr",
              "BimanualActions/bimacs_derived_features/faster_rcnn.zarr",
              "zarr"),
        Entry("path_bb_zarr",
              "BimanualActions/bimacs_derived_features/bounding_boxes.zarr",
              "zarr"),
        Entry("path_hp_zarr",
              "BimanualActions/bimacs_derived_features/hands_pose.zarr",
              "zarr"),
        Entry("video_id_to_video_fps",
              "BimanualActions/bimacs_video_id_to_video_fps.json", "json"),
        Entry(None, "BimanualActions/bimacs_action_id_to_action_name.json",
              "json", required=False,
              note="class names in predict.py reports"),
    ],
}


def _validate(path: str, kind: str) -> Optional[str]:
    """None when the store looks loadable, else a human-readable reason."""
    if kind == "zarr":
        # The loaders also accept .npz stand-ins (tggcn/data/loading.py
        # open_store), used by the synthetic generators.
        if os.path.isfile(path) and path.endswith(".npz"):
            return None
        if not os.path.isdir(path):
            return "not a directory (zarr store expected)"
        has_meta = any(
            os.path.exists(os.path.join(root, m))
            for root, _dirs, _files in os.walk(path)
            for m in (".zgroup", ".zarray", "zarr.json"))
        return None if has_meta else \
            "no zarr metadata (.zgroup/.zarray) anywhere inside"
    if kind == "json":
        try:
            with open(path) as f:
                json.load(f)
        except Exception as exc:  # noqa: BLE001 - report any parse failure
            return f"invalid JSON ({exc})"
        return None
    if kind == "pickle":
        try:
            from tggcn.data.cad120classes import load_cad120_pickle

            load_cad120_pickle(path)
        except Exception as exc:  # noqa: BLE001
            return f"unpicklable ({type(exc).__name__}: {exc})"
        return None
    if kind == "txt":
        try:
            with open(path) as f:
                lines = [l for l in f.read().splitlines() if l.strip()]
        except Exception as exc:  # noqa: BLE001
            return f"unreadable ({exc})"
        if not lines:
            return "empty dictionary file"
        if any(len(line.split()) < 2 for line in lines):
            return "expected 'key value' lines"
        return None
    raise ValueError(f"unknown kind {kind}")


def check(dataset: str, data_root: str, deep: bool = True,
          quiet: bool = False) -> List[Entry]:
    """Report each manifest entry; returns the missing/invalid REQUIRED ones."""
    bad = []
    for entry in MANIFESTS[dataset]:
        path = os.path.join(data_root, entry.relpath)
        # A prepared layout may substitute an .npz stand-in for a zarr dir.
        if entry.kind == "zarr" and not os.path.exists(path):
            alt = os.path.splitext(path)[0] + ".npz"
            if os.path.exists(alt):
                path = alt
        if not os.path.exists(path):
            status, reason = "MISSING", ""
            if entry.required:
                bad.append(entry)
        else:
            reason = _validate(path, entry.kind) if deep else None
            status = "OK" if reason is None else "INVALID"
            if reason and entry.required:
                bad.append(entry)
        if not quiet:
            req = "required" if entry.required else "optional"
            extra = f" — {reason}" if reason else (
                f" ({entry.note})" if status != "OK" and entry.note else "")
            print(f"[{status:>7}] {entry.relpath}  [{req}]{extra}")
    return bad


def _index_source(source: str):
    """basename -> [paths] over files AND directories (zarr stores are dirs)."""
    found = {}
    for root, dirs, files in os.walk(source):
        for name in list(dirs):
            if name.endswith(".zarr"):
                found.setdefault(name, []).append(os.path.join(root, name))
                dirs.remove(name)  # do not descend into the store
        for name in files:
            found.setdefault(name, []).append(os.path.join(root, name))
    return found


# Tokens that identify a dataset's download tree (used to break basename
# ties: MPHOI and Bimanual both ship a 'faster_rcnn.zarr').
_DATASET_HINTS = {
    "mphoi": ("mphoi",),
    "cad120": ("cad",),
    "bimanual": ("bimanual", "bimacs"),
}


def _best_match(candidates: List[str], relpath: str,
                dataset: str) -> Optional[str]:
    """The candidate sharing the longest path-component tail, with the
    dataset's name tokens as tie-breaker. Returns None when the choice is
    AMBIGUOUS (several candidates tie without any dataset hint): silently
    wiring another dataset's identically-named store (a mixed download
    folder holding both MPHOI and Bimanual trees) would surface only as a
    confusing shape mismatch at load time."""
    want = relpath.split("/")
    hints = _DATASET_HINTS.get(dataset, ())

    def score(path):
        have = os.path.normpath(path).split(os.sep)
        n = 0
        while (n < min(len(want), len(have))
               and want[-1 - n] == have[-1 - n]):
            n += 1
        lower = path.lower()
        return (n, sum(1 for h in hints if h in lower))

    best = max(score(c) for c in candidates)
    ties = [c for c in candidates if score(c) == best]
    if len(ties) > 1:
        return None
    return ties[0]


def prepare(dataset: str, source: str, data_root: str, copy: bool = False,
            force: bool = False) -> List[Entry]:
    """Wire a downloaded folder into the expected tree; returns unresolved
    REQUIRED entries."""
    found = _index_source(source)
    unresolved = []
    for entry in MANIFESTS[dataset]:
        target = os.path.join(data_root, entry.relpath)
        if os.path.exists(target) and not force:
            print(f"[  KEEP ] {entry.relpath} (already present)")
            continue
        basename = os.path.basename(entry.relpath)
        candidates = found.get(basename, [])
        if entry.kind == "zarr" and not candidates:
            # Accept an .npz stand-in from a synthetic/preconverted source.
            candidates = found.get(os.path.splitext(basename)[0] + ".npz", [])
            if candidates:
                target = os.path.splitext(target)[0] + ".npz"
        if not candidates:
            print(f"[MISSING] {entry.relpath} — no '{basename}' in {source}")
            if entry.required:
                unresolved.append(entry)
            continue
        src = _best_match(candidates, entry.relpath, dataset)
        if src is None:
            print(f"[ AMBIG ] {entry.relpath} — multiple '{basename}' "
                  f"candidates and none is identifiable as {dataset}: "
                  + ", ".join(sorted(candidates))
                  + " — move the right one under a folder containing "
                  + "/".join(_DATASET_HINTS.get(dataset, (dataset,)))
                  + ", or pass a narrower --source")
            if entry.required:
                unresolved.append(entry)
            continue
        os.makedirs(os.path.dirname(target), exist_ok=True)
        if os.path.lexists(target):
            if os.path.isdir(target) and not os.path.islink(target):
                shutil.rmtree(target)
            else:
                os.remove(target)
        if copy:
            if os.path.isdir(src):
                shutil.copytree(src, target)
            else:
                shutil.copy2(src, target)
            print(f"[ COPIED] {entry.relpath} <- {src}")
        else:
            os.symlink(os.path.abspath(src), target)
            print(f"[ LINKED] {entry.relpath} -> {src}")
    return unresolved


def smoke_load(dataset: str, data_root: str) -> int:
    """Load the prepared stores through the REAL loaders; returns #videos."""
    from tggcn.config import Config
    from tggcn.data.loading import load_training_data

    def p(key):
        entry = next(e for e in MANIFESTS[dataset] if e.config_key == key)
        path = os.path.join(data_root, entry.relpath)
        if entry.kind == "zarr" and not os.path.exists(path):
            alt = os.path.splitext(path)[0] + ".npz"
            if os.path.exists(alt):
                return alt
        return path

    cfg = {"name": dataset, "cross_validation_test_subject":
           CV_FOLDS[dataset][0], "scaling_strategy": None, "downsampling": 3}
    for entry in MANIFESTS[dataset]:
        if entry.config_key:
            cfg[entry.config_key] = p(entry.config_key)
    model_name = {"mphoi": "2G-GCN", "cad120": "2G-GCN",
                  "bimanual": "2G-GCN"}[dataset]
    train_loader, val_loader, info, _scalers = load_training_data(
        Config(cfg), model_name, "multiple", batch_size=2, val_fraction=0.25)
    n = sum(len(b[0]) for b in train_loader) + sum(len(b[0]) for b in val_loader)
    print(f"smoke: loaded {n} training/val clips, input_size={info['input_size']}")
    return n


def print_fold_commands(dataset: str):
    print("\nPer-fold reference-protocol commands "
          "(conf/config.yaml:7-9 semantics):")
    for subject in CV_FOLDS[dataset]:
        print(f"  python train.py data={dataset} "
              f"data.cross_validation_test_subject={subject}")
    print(f"  python predict.py --cross_validate --pretrained_model_dir "
          f"outputs/{dataset}/2G-GCN/<run>_{CV_FOLDS[dataset][0]}")


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="Lay out / verify dataset stores for the tggcn loaders.")
    ap.add_argument("--dataset", required=True,
                    choices=sorted(MANIFESTS) + ["all"])
    ap.add_argument("--data-root", default=os.path.join(os.getcwd(), "data"))
    ap.add_argument("--source", default=None,
                    help="downloaded folder to wire into --data-root")
    ap.add_argument("--check", action="store_true",
                    help="only report what is present/missing/invalid")
    ap.add_argument("--smoke", action="store_true",
                    help="additionally load the stores through the loaders")
    ap.add_argument("--copy", action="store_true",
                    help="copy stores instead of symlinking")
    ap.add_argument("--force", action="store_true",
                    help="replace already-present targets")
    args = ap.parse_args(argv)

    datasets = sorted(MANIFESTS) if args.dataset == "all" else [args.dataset]
    rc = 0
    for dataset in datasets:
        print(f"== {dataset} (data root: {args.data_root})")
        if args.source and not args.check:
            unresolved = prepare(dataset, args.source, args.data_root,
                                 copy=args.copy, force=args.force)
            if unresolved:
                rc = 1
        bad = check(dataset, args.data_root, deep=True)
        if bad:
            rc = 1
            print(f"{dataset}: {len(bad)} required store(s) missing/invalid.")
        else:
            if args.smoke:
                smoke_load(dataset, args.data_root)
            print(f"{dataset}: all required stores present.")
            print_fold_commands(dataset)
    return rc


if __name__ == "__main__":
    sys.exit(main())
