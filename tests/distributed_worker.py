"""Multi-process worker + shared workload for tests/test_distributed.py.

Run as a script, this is ONE of N local CPU processes forming a
``jax.distributed`` runtime (coordinator on localhost): it joins the global
runtime via the TGGCN_* env contract, builds the deterministic tiny
workload, trains over the full 8-device global mesh with per-process batch
feeding, and (process 0 only) writes the loss trajectory to
TGGCN_TEST_OUT. Imported as a module, it provides the same workload to the
in-process single-process baseline.

This is the executable proof of SURVEY.md §5.8's multi-host story:
jax.distributed.initialize + global mesh + per-host input feeding +
process-0-gated run-dir writes (tggcn/parallel/distributed.py).
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SEED = 11
NUM_EPOCHS = 2


def setup_jax(local_devices: int):
    """CPU platform with a virtual device count, before first jax use."""
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        flags = (
            flags + f" --xla_force_host_platform_device_count={local_devices}"
        ).strip()
    if "xla_cpu_collective_timeout_seconds" not in flags:
        # Gloo context init defaults to a 30 s peer-rendezvous deadline;
        # on this 1-core host the two workers can skew past it when one
        # pays a compile the other cache-hits (observed DEADLINE_EXCEEDED
        # on the resume leg under full-suite load).
        flags = (flags + " --xla_cpu_collective_timeout_seconds=600").strip()
    os.environ["XLA_FLAGS"] = flags
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    return jax


def build_workload():
    """Deterministic tiny 2G-GCN training workload (every process rebuilds
    the identical data/model from the fixed seed)."""
    import jax
    import numpy as np
    import optax

    from tggcn.config import Config
    from tggcn.data.loading import (ArrayDataLoader, select_model_data_feeder,
                                    select_model_data_fetcher)
    from tggcn.models import select_model
    from tggcn.train.losses import select_loss

    model = select_model(
        "2G-GCN", input_size=(2152, 2048), num_classes=(13, None),
        hidden_size=8, gcn_node=26, message_humans_to_human=True,
        message_segment=True, message_type="v2", message_granularity="v1",
        message_aggregation="att", attention_style="v3",
        discrete_optimization_strategy="st",
        object_segment_update_strategy="ind")
    params = model.init(jax.random.PRNGKey(SEED))
    optimizer = optax.adam(1e-3)
    cfg = Config({"misc": Config({})})
    criterion, loss_names = select_loss("2G-GCN", "multiple", "mphoi", cfg=cfg)
    feeder = select_model_data_feeder("2G-GCN", "multiple", dataset_name="mphoi",
                                      impose_segmentation_pattern=1)
    fetcher = select_model_data_fetcher("2G-GCN", "multiple", dataset_name="mphoi")

    rng = np.random.default_rng(SEED)
    n, t, num_humans, num_objects = 16, 4, 2, 2
    tensors = [
        rng.normal(size=(n, t, num_humans, 2152)).astype(np.float32),
        rng.normal(size=(n, t, num_objects, 2048)).astype(np.float32),
        np.ones((n, num_objects), np.float32),
        np.ones((n, t, num_humans), np.float32),
        np.zeros((n, 1, 1, 1), np.float32),
        np.zeros((n, 1, 1, 1), np.float32),
        np.zeros((n, 1, 1, 1), np.float32),
        np.full((n,), float(t), np.float32),
        rng.integers(0, 2, size=(n, t, num_humans)).astype(np.float32),
        rng.integers(0, 2, size=(n, t, num_humans)).astype(np.float32),
        rng.integers(0, 13, size=(n, t, num_humans)).astype(np.int64),
        rng.integers(0, 13, size=(n, t, num_humans)).astype(np.int64),
        rng.integers(0, 13, size=(n, t, num_humans)).astype(np.int64),
        rng.integers(0, 13, size=(n, t, num_humans)).astype(np.int64),
    ]
    train_loader = ArrayDataLoader([a[:8] for a in tensors], batch_size=8,
                                   shuffle=True, seed=SEED)
    val_loader = ArrayDataLoader([a[8:] for a in tensors], batch_size=8,
                                 shuffle=False)
    return dict(model=model, params=params, optimizer=optimizer,
                criterion=criterion, loss_names=loss_names, feeder=feeder,
                fetcher=fetcher, train_loader=train_loader,
                val_loader=val_loader)


def run_training(mesh, log_dir, epochs=NUM_EPOCHS, resume=False):
    """The shared trajectory: `epochs` total epochs of the full train() loop.

    With resume=True, restores last.ckpt from log_dir (train.py's
    misc.resume contract: every process reads the same snapshot) and runs
    only the remaining epochs up to the total.
    """
    from tggcn.train.loop import train

    w = build_workload()
    init_kw = dict(init_params=w["params"])
    num_epochs = epochs
    if resume:
        from tggcn.parallel.distributed import assert_same_across_processes
        from tggcn.train.checkpoint import load_last

        last = load_last(log_dir)
        assert last is not None, f"no last.ckpt under {log_dir}"
        assert_same_across_processes(last["epoch"], "resumed epoch")
        init_kw = dict(init_params=last["trainable"]["model"],
                       init_opt_state=last["opt_state"],
                       initial_epoch=last["epoch"] + 1,
                       initial_global_step=last.get("global_step", 0),
                       initial_best_val_loss=last.get("best_val_loss",
                                                      float("inf")),
                       initial_checkpoint=last.get("best_checkpoint"))
        num_epochs = epochs - last["epoch"]
    checkpoint = train(w["model"], w["train_loader"], w["optimizer"],
                       w["criterion"], num_epochs, w["loss_names"],
                       clip_gradient_at=5.0, fetch_model_data=w["fetcher"],
                       feed_model_data=w["feeder"], val_loader=w["val_loader"],
                       num_main_losses=4, seed=42, mesh=mesh, num_inputs=8,
                       checkpoint_name="distributed_test", log_dir=log_dir,
                       **init_kw)
    return checkpoint


def main():
    jax = setup_jax(int(os.environ["TGGCN_LOCAL_DEVICES"]))

    from tggcn.parallel.distributed import maybe_initialize
    from tggcn.parallel.mesh import make_mesh

    assert maybe_initialize(), "TGGCN_COORDINATOR env contract missing"
    assert jax.process_count() == int(os.environ["TGGCN_NUM_PROCESSES"])
    total = len(jax.devices())
    mesh = make_mesh(total)
    log_dir = os.environ["TGGCN_TEST_LOGDIR"]
    epochs = int(os.environ.get("TGGCN_TEST_EPOCHS", NUM_EPOCHS))
    resume = os.environ.get("TGGCN_TEST_RESUME") == "1"
    checkpoint = run_training(mesh, log_dir, epochs=epochs, resume=resume)
    if jax.process_index() == 0:
        with open(os.environ["TGGCN_TEST_OUT"], "w") as f:
            json.dump({"train_losses": checkpoint["train_losses"],
                       "val_losses": checkpoint["val_losses"],
                       "epoch": checkpoint["epoch"],
                       "num_devices": total}, f)


if __name__ == "__main__":
    main()
