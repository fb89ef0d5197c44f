"""Real-data readiness kit (tools/prepare_dataset.py).

A synthetic "official download" (real zarr-v2 stores, generator layout !=
canonical layout) must wire into the conf/data tree, pass --check, and load
through the REAL loaders — so when actual dataset downloads appear, F1@k
parity is one command per fold.
"""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import prepare_dataset  # noqa: E402

CONF_DIR = os.path.join(os.path.dirname(__file__), "..", "conf")


@pytest.mark.parametrize("dataset", sorted(prepare_dataset.MANIFESTS))
def test_manifest_matches_conf_layout(dataset):
    """Every required manifest path IS the conf/data/<dataset>.yaml path."""
    from tggcn.config import compose

    cfg = compose(CONF_DIR, overrides=[f"data={dataset}"])
    for entry in prepare_dataset.MANIFESTS[dataset]:
        if entry.config_key is None:
            continue
        conf_path = cfg.data[entry.config_key]
        assert conf_path.endswith(entry.relpath), (
            f"{dataset}.{entry.config_key}: conf says {conf_path}, "
            f"manifest says {entry.relpath}")


def test_cv_folds_match_rundir():
    from tggcn.eval.rundir import CV_FOLDS

    assert prepare_dataset.CV_FOLDS == CV_FOLDS


def test_check_reports_missing(tmp_path, capsys):
    bad = prepare_dataset.check("mphoi", str(tmp_path))
    assert [e.config_key for e in bad] == [
        "path", "path_zarr", "path_obb_zarr", "path_hbb_zarr", "path_hps_zarr"]
    out = capsys.readouterr().out
    assert out.count("MISSING") >= 5


def test_prepare_synthetic_download_then_check_and_load(tmp_path):
    from tggcn.data.synthetic import generate_mphoi_dataset

    # The generator's layout (MPHOI/faster_rcnn.zarr) differs from the
    # canonical tree (MPHOI/mphoi_derived_features/faster_rcnn.zarr), like a
    # real loose download would.
    source = tmp_path / "download"
    generate_mphoi_dataset(str(source), num_videos=8, store_format="zarr")

    data_root = tmp_path / "data"
    unresolved = prepare_dataset.prepare("mphoi", str(source), str(data_root))
    assert unresolved == []
    assert prepare_dataset.check("mphoi", str(data_root), quiet=True) == []

    # Symlinked stores load through the real loaders.
    n = prepare_dataset.smoke_load("mphoi", str(data_root))
    assert n > 0


def test_prepare_copy_mode_and_invalid_store(tmp_path, capsys):
    source = tmp_path / "download"
    os.makedirs(source / "nested")
    (source / "nested" / "mphoi_ground_truth_labels.json").write_text(
        "{not json")
    data_root = tmp_path / "data"
    unresolved = prepare_dataset.prepare("mphoi", str(source), str(data_root),
                                         copy=True)
    # Only the labels file was found (and copied); the zarr stores are absent.
    assert {e.config_key for e in unresolved} == {
        "path_zarr", "path_obb_zarr", "path_hbb_zarr", "path_hps_zarr"}
    assert not os.path.islink(data_root / "MPHOI" /
                              "mphoi_ground_truth_labels.json")
    bad = prepare_dataset.check("mphoi", str(data_root))
    out = capsys.readouterr().out
    assert "invalid JSON" in out
    assert any(e.config_key == "path" for e in bad)


def test_main_check_exit_codes(tmp_path):
    rc = prepare_dataset.main(["--dataset", "mphoi", "--check",
                               "--data-root", str(tmp_path)])
    assert rc == 1
    from tggcn.data.synthetic import generate_mphoi_dataset

    source = tmp_path / "dl"
    generate_mphoi_dataset(str(source), num_videos=8, store_format="zarr")
    rc = prepare_dataset.main(["--dataset", "mphoi", "--source", str(source),
                               "--data-root", str(tmp_path / "data")])
    assert rc == 0


def test_mixed_download_tree_hint_breaks_basename_tie(tmp_path):
    """MPHOI and Bimanual both ship a 'faster_rcnn.zarr'; a source holding
    BOTH downloads must wire the dataset-identifiable one, not whichever
    os.walk found first."""
    source = tmp_path / "dl"
    for folder in ("MPHOI_72", "bimacs"):
        store = source / folder / "faster_rcnn.zarr"
        os.makedirs(store)
        (store / ".zgroup").write_text('{"zarr_format": 2}')
    picked = prepare_dataset._best_match(
        [str(source / "MPHOI_72" / "faster_rcnn.zarr"),
         str(source / "bimacs" / "faster_rcnn.zarr")],
        "MPHOI/mphoi_derived_features/faster_rcnn.zarr", "mphoi")
    assert picked is not None and "MPHOI_72" in picked
    picked = prepare_dataset._best_match(
        [str(source / "MPHOI_72" / "faster_rcnn.zarr"),
         str(source / "bimacs" / "faster_rcnn.zarr")],
        "BimanualActions/bimacs_derived_features/faster_rcnn.zarr",
        "bimanual")
    assert picked is not None and "bimacs" in picked


def test_ambiguous_candidates_are_refused_not_guessed(tmp_path, capsys):
    """Two hint-less candidates with the same basename -> AMBIG + unresolved
    (wiring a guess would fail later as an inscrutable shape mismatch)."""
    source = tmp_path / "dl"
    for folder in ("a", "b"):
        store = source / folder / "faster_rcnn.zarr"
        os.makedirs(store)
        (store / ".zgroup").write_text('{"zarr_format": 2}')
    unresolved = prepare_dataset.prepare("mphoi", str(source),
                                         str(tmp_path / "data"))
    out = capsys.readouterr().out
    assert "AMBIG" in out
    assert any(e.config_key == "path_zarr" for e in unresolved)
    assert not os.path.lexists(tmp_path / "data" / "MPHOI" /
                               "mphoi_derived_features" / "faster_rcnn.zarr")


def test_prepare_cad120_pickle_and_dictionaries(tmp_path):
    from tggcn.data.synthetic import generate_cad120_dataset

    source = tmp_path / "download"
    generate_cad120_dataset(str(source), num_videos=8, store_format="zarr")
    data_root = tmp_path / "data"
    unresolved = prepare_dataset.prepare("cad120", str(source), str(data_root))
    assert unresolved == []
    assert prepare_dataset.check("cad120", str(data_root), quiet=True) == []
    assert prepare_dataset.smoke_load("cad120", str(data_root)) > 0
