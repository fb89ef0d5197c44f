"""Checkpoint machinery: reference .tar loading, merge_params, last.ckpt."""

import os

import jax
import numpy as np
import pytest
import torch

from tggcn.models.tggcn import TGGCNConfig, init_tggcn
from tggcn.train.checkpoint import (
    load_checkpoint,
    load_last,
    load_model_weights,
    merge_params,
    save_checkpoint,
    save_last,
)


def test_reference_tar_checkpoint_loads(tmp_path):
    """A torch-saved reference-style .tar run dir loads via tggcn.compat."""
    import glob

    golden = sorted(glob.glob(os.path.join(os.path.dirname(__file__),
                                           "golden", "mphoi_st.npz")))
    if not golden:
        pytest.skip("golden fixture not generated")
    data = np.load(golden[0])
    state_dict = {k.split("::")[1]: torch.from_numpy(data[k])
                  for k in data.files if k.startswith("weight::")}
    run_dir = tmp_path / "run_Subject45"
    run_dir.mkdir()
    ckpt = {"model_state_dict": state_dict}
    try:
        # Real reference tars also pickle sklearn scalers (reference
        # train.py:61); torch>=2.6 weights_only loading rejects them, so the
        # loader must opt out — keep the fixture format-faithful.
        from sklearn.preprocessing import StandardScaler

        ckpt["scalers"] = [StandardScaler()]
    except ImportError:
        pass
    torch.save(ckpt, run_dir / "run_Subject45.tar")

    cfg = TGGCNConfig(input_size=(2152, 2048), num_classes=(13, None), hidden_size=24,
                      gcn_node=26, message_humans_to_human=True, message_segment=True,
                      message_type="v2", message_granularity="v1",
                      message_aggregation="att", attention_style="v3",
                      discrete_optimization_strategy="st",
                      object_segment_update_strategy="ind")
    loaded = load_model_weights(str(run_dir), cfg=cfg)
    init = init_tggcn(jax.random.PRNGKey(0), cfg)
    merged = merge_params(init, loaded)
    # The converted weights must land on the init pytree structure.
    np.testing.assert_allclose(
        np.asarray(merged["human_embedding_mlp"]["layers"][0]["w"]),
        np.asarray(state_dict["human_embedding_mlp.0.weight"].numpy().T))


def test_merge_params_skips_mismatched_shapes():
    init = {"a": {"w": np.zeros((2, 3))}, "b": np.zeros(4)}
    loaded = {"a": {"w": np.ones((9, 9))}, "b": np.ones(4)}
    merged = merge_params(init, loaded)
    np.testing.assert_allclose(merged["a"]["w"], 0.0)  # shape mismatch -> keep init
    np.testing.assert_allclose(merged["b"], 1.0)


def test_save_and_load_roundtrip(tmp_path):
    ckpt = {"epoch": 3, "model_state_dict": {"w": np.arange(4.0)}}
    save_checkpoint(str(tmp_path), ckpt, checkpoint_name="run")
    loaded = load_checkpoint(os.path.join(str(tmp_path), "run.ckpt"))
    assert loaded["epoch"] == 3
    np.testing.assert_allclose(loaded["model_state_dict"]["w"], np.arange(4.0))


def test_last_snapshot_roundtrip(tmp_path):
    state = {"epoch": 5, "trainable": {"model": {"w": np.ones(3)}},
             "opt_state": None, "global_step": 40, "best_val_loss": 1.25}
    save_last(str(tmp_path), state)
    loaded = load_last(str(tmp_path))
    assert loaded["epoch"] == 5 and loaded["best_val_loss"] == 1.25
    assert load_last(str(tmp_path / "nope")) is None


def test_orbax_params_roundtrip(tmp_path):
    from tggcn.train.checkpoint import load_params_orbax, save_params_orbax

    params = {"layer": {"w": np.arange(12.0).reshape(3, 4), "b": np.ones(4)}}
    path = save_params_orbax(str(tmp_path / "params.orbax"), params)
    restored = load_params_orbax(path)
    np.testing.assert_allclose(restored["layer"]["w"], params["layer"]["w"])
    np.testing.assert_allclose(restored["layer"]["b"], params["layer"]["b"])


def test_checkpoint_preserves_scaler_objects(tmp_path):
    """Fitted sklearn scalers must survive the checkpoint round trip as
    OBJECTS (eval calls .transform on them; reference train.py:61)."""
    from sklearn.preprocessing import StandardScaler

    from tggcn.data.loading import fit_or_apply_scalers

    rng = np.random.default_rng(0)
    sc = StandardScaler().fit(rng.normal(size=(10, 3)))
    save_checkpoint(str(tmp_path), {"scalers": {"human_scaler": sc},
                                    "epoch": 1}, checkpoint_name="x")
    ck = load_checkpoint(os.path.join(tmp_path, "x.ckpt"))
    assert hasattr(ck["scalers"]["human_scaler"], "transform")

    # Legacy checkpoints (written when _to_numpy wrapped objects in 0-d
    # object arrays) unwrap transparently at use.
    legacy = {"human_scaler": np.asarray(sc), "object_scaler": np.asarray(sc)}
    x = [rng.normal(size=(2, 2, 3)).astype(np.float32),
         rng.normal(size=(2, 2, 3)).astype(np.float32)]
    out, fitted = fit_or_apply_scalers(x, "2G-GCN", scalers=legacy)
    assert hasattr(fitted["human_scaler"], "transform")
    np.testing.assert_allclose(
        out[0], sc.transform(x[0].reshape(-1, 3)).reshape(x[0].shape),
        rtol=1e-6)
