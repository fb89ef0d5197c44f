"""Distributed tests on the virtual 8-device CPU mesh (SURVEY.md §4).

Asserts that the data-parallel sharded training step produces identical
losses and parameter updates to the single-device step, and that the driver
multi-chip dry run executes.
"""

import os
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


@pytest.fixture(scope="module")
def tiny_setup():
    import optax

    from tggcn.config import Config
    from tggcn.data.loading import select_model_data_feeder, select_model_data_fetcher
    from tggcn.models import select_model
    from tggcn.train.losses import select_loss

    model = select_model(
        "2G-GCN", input_size=(2152, 2048), num_classes=(13, None), hidden_size=12,
        gcn_node=26, message_humans_to_human=True, message_segment=True,
        message_type="v2", message_granularity="v1", message_aggregation="att",
        attention_style="v3", discrete_optimization_strategy="st",
        object_segment_update_strategy="ind")
    params = model.init(jax.random.PRNGKey(0))
    optimizer = optax.adam(1e-3)
    cfg = Config({"misc": Config({})})
    criterion, _ = select_loss("2G-GCN", "multiple", "mphoi", cfg=cfg)
    feeder = select_model_data_feeder("2G-GCN", "multiple", dataset_name="mphoi",
                                      impose_segmentation_pattern=1)
    fetcher = select_model_data_fetcher("2G-GCN", "multiple", dataset_name="mphoi")

    rng = np.random.default_rng(3)
    b, t, num_humans, num_objects = 8, 6, 2, 2
    batch = [
        rng.normal(size=(b, t, num_humans, 2152)).astype(np.float32),
        rng.normal(size=(b, t, num_objects, 2048)).astype(np.float32),
        np.ones((b, num_objects), np.float32),
        np.ones((b, t, num_humans), np.float32),
        np.zeros((b, 1, 1, 1), np.float32),
        np.zeros((b, 1, 1, 1), np.float32),
        np.zeros((b, 1, 1, 1), np.float32),
        np.full((b,), float(t), np.float32),
        rng.integers(0, 2, size=(b, t, num_humans)).astype(np.float32),
        rng.integers(0, 2, size=(b, t, num_humans)).astype(np.float32),
        rng.integers(0, 13, size=(b, t, num_humans)).astype(np.int64),
        rng.integers(0, 13, size=(b, t, num_humans)).astype(np.int64),
        rng.integers(0, 13, size=(b, t, num_humans)).astype(np.int64),
        rng.integers(0, 13, size=(b, t, num_humans)).astype(np.int64),
    ]
    return model, params, optimizer, criterion, feeder, fetcher, batch


def test_sharded_step_matches_single_device(tiny_setup):
    import optax

    from tggcn.parallel.mesh import make_mesh, replicate, shard_batch
    from tggcn.train.loop import make_train_step

    model, params, optimizer, criterion, feeder, fetcher, batch = tiny_setup
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"

    def copy(tree):
        # The train step donates its inputs; each run needs its own buffers.
        return jax.tree_util.tree_map(lambda x: jax.numpy.array(np.asarray(x)), tree)

    key = jax.random.PRNGKey(7)
    # Single-device baseline.
    step1 = make_train_step(model, feeder, criterion, optimizer)
    data, targets = fetcher(batch)
    t1 = {"model": copy(params)}
    o1 = optimizer.init(t1)
    t1, o1, losses1, _ = step1(t1, o1, key, data, targets)

    # 8-device data-parallel.
    mesh = make_mesh(8)
    step8 = make_train_step(model, feeder, criterion, optimizer, mesh=mesh)
    t8 = replicate({"model": copy(params)}, mesh)
    o8 = replicate(optimizer.init(t8), mesh)
    data8, targets8 = fetcher(shard_batch(batch, mesh))
    t8, o8, losses8, _ = step8(t8, o8, key, data8, targets8)

    np.testing.assert_allclose(np.asarray(losses8), np.asarray(losses1),
                               rtol=1e-5, atol=1e-6)
    # Post-Adam parameters: the first-step update ~ sign(g), so the 8-way
    # gradient reduction order shifts near-zero entries by O(lr); compare
    # with an absolute tolerance of a fraction of the learning rate.
    flat1 = jax.tree_util.tree_leaves(t1["model"])
    flat8 = jax.tree_util.tree_leaves(t8["model"])
    for a, b_ in zip(flat1, flat8):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a), rtol=0, atol=2e-4)


def test_dryrun_multichip():
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)


def test_entry_compiles():
    from __graft_entry__ import entry

    forward, args = entry()
    outputs = jax.jit(forward)(*args)
    assert len(outputs) == 6
    assert np.isfinite(np.asarray(outputs[-1])).all()


def test_2d_dcn_data_mesh_matches_single_device(tiny_setup):
    """('dcn','data') 2x4 mesh: batch sharded over both axes, same losses."""
    from tggcn.parallel.mesh import make_mesh_2d, replicate, shard_batch
    from tggcn.train.loop import make_train_step

    model, params, optimizer, criterion, feeder, fetcher, batch = tiny_setup

    def copy(tree):
        return jax.tree_util.tree_map(lambda x: jax.numpy.array(np.asarray(x)), tree)

    key = jax.random.PRNGKey(7)
    step1 = make_train_step(model, feeder, criterion, optimizer)
    data, targets = fetcher(batch)
    t1 = {"model": copy(params)}
    o1 = optimizer.init(t1)
    _, _, losses1, _ = step1(t1, o1, key, data, targets)

    mesh = make_mesh_2d(2, 4)
    assert mesh.axis_names == ("dcn", "data") and mesh.devices.shape == (2, 4)
    step2d = make_train_step(model, feeder, criterion, optimizer, mesh=mesh)
    t2 = replicate({"model": copy(params)}, mesh)
    o2 = replicate(optimizer.init(t2), mesh)
    data2, targets2 = fetcher(shard_batch(batch, mesh))
    _, _, losses2, _ = step2d(t2, o2, key, data2, targets2)

    np.testing.assert_allclose(np.asarray(losses2), np.asarray(losses1),
                               rtol=1e-5, atol=1e-6)
