"""Training CLI — config-driven, same interface as the reference train.py.

Usage (Hydra-style overrides):
    python train.py models=2G-GCN_stage1 data=mphoi
    python train.py models=2G-GCN_stage1 data=cad120 parameters.hidden_size=512 \
        data.cross_validation_test_subject=Subject1

Reference behaviour reproduced (reference train.py:13-66): data loading with
the seed-42 split, model construction from cfg.parameters verbatim, optional
stage-2 warm start from a pretrained run dir (non-strict weight merge), Adam,
the multi-task loss bundle + optional multi-task loss learner, best-val
checkpointing, and the run-dir contract (frozen config under .hydra/ +
<checkpoint_name>.ckpt).

TPU-native: jit-compiled train/eval steps; optional data-parallel mesh via
resources.num_devices.
"""

import os
import sys

import jax

# Honor an explicit JAX_PLATFORMS env var even when a sitecustomize has
# programmatically registered/pinned another backend (this container pins a
# remote-TPU backend; JAX_PLATFORMS=cpu must still force CPU runs).
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import optax

from tggcn.config import compose, save_config
from tggcn.data.loading import (
    determine_num_classes,
    load_training_data,
    select_model_data_feeder,
    select_model_data_fetcher,
)
from tggcn.models import select_model
from tggcn.models.tggcn import TGGCNConfig
from tggcn.parallel.mesh import make_mesh
from tggcn.train.checkpoint import load_model_weights, merge_params, save_checkpoint
from tggcn.train.loop import train
from tggcn.train.losses import (
    decide_num_main_losses,
    select_loss,
    select_loss_learning_mask,
    select_loss_types,
)
from tggcn.train.multi_task import init_mtll


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    conf_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "conf")
    cfg = compose(conf_dir, overrides=argv)
    seed = 42

    # Observability toggles (SURVEY.md §5.1-5.2): NaN debugging aborts on the
    # first non-finite value inside jit; the profiler traces the first epoch.
    resources = cfg.get("resources", default_value={})

    # Multi-host: join the global runtime BEFORE touching any device. The
    # launch contract comes from resources.distributed.* or the
    # TGGCN_COORDINATOR / TGGCN_NUM_PROCESSES / TGGCN_PROCESS_ID env vars
    # (no-op single-process otherwise). See tggcn/parallel/distributed.py.
    from tggcn.parallel.distributed import is_main_process, maybe_initialize

    dist_conf = resources.get("distributed", {})
    distributed = maybe_initialize(
        coordinator_address=dist_conf.get("coordinator_address"),
        num_processes=dist_conf.get("num_processes"),
        process_id=dist_conf.get("process_id"),
        auto=bool(dist_conf.get("auto", False)))
    if resources.get("debug_nans", False):
        jax.config.update("jax_debug_nans", True)
    # Reference-parity numerics: resources.parity_mode=exact runs f32
    # matmuls at highest precision so hard segment decisions bit-match the
    # CPU-run reference (see tggcn/runtime.py).
    from tggcn.runtime import apply_parity_mode

    apply_parity_mode(resources.get("parity_mode", "fast"))
    profiler_dir = resources.get("jax_profiler_dir")

    model_name, model_input_type = cfg.metadata.model_name, cfg.metadata.input_type
    batch_size, val_fraction = cfg.optimization.batch_size, cfg.optimization.val_fraction
    misc_dict = cfg.get("misc", default_value={})
    sigma = misc_dict.get("segmentation_loss", {}).get("sigma", 0.0)
    train_loader, val_loader, data_info, scalers = load_training_data(
        cfg.data, model_name, model_input_type, batch_size=batch_size,
        val_fraction=val_fraction, seed=seed, debug=bool(misc_dict.get("debug", False)),
        sigma=sigma)

    dataset_name = cfg.data.name
    num_classes = determine_num_classes(model_name, model_input_type, dataset_name)
    model = select_model(model_name, num_classes=num_classes,
                         **{**data_info, **cfg.parameters})
    params = model.init(jax.random.PRNGKey(seed))
    if misc_dict.get("pretrained", False) and misc_dict.get("pretrained_path") is not None:
        compat_cfg = model.config if isinstance(model.config, TGGCNConfig) else None
        loaded = load_model_weights(misc_dict["pretrained_path"], cfg=compat_cfg)
        params = merge_params(params, loaded)
        print(f"Warm-started from {misc_dict['pretrained_path']}")

    optimizer = optax.adam(cfg.optimization.learning_rate)
    criterion, loss_names = select_loss(model_name, model_input_type, dataset_name, cfg=cfg)
    mtll = None
    if misc_dict.get("multi_task_loss_learner", False):
        loss_types = select_loss_types(model_name, dataset_name, cfg=cfg)
        mask = select_loss_learning_mask(model_name, dataset_name, cfg=cfg)
        mtll = init_mtll(loss_types=loss_types, mask=mask)

    mesh = None
    num_devices = resources.get("num_devices", 1)
    if distributed:
        # Multi-process runs always span the full global device set
        # (jax.devices() is global once distributed.initialize has run).
        num_devices = num_devices if num_devices and num_devices > 1 \
            else len(jax.devices())
    if num_devices and num_devices > 1:
        mesh = make_mesh(num_devices)
        if batch_size % num_devices != 0:
            raise ValueError(
                f"batch_size {batch_size} must be a multiple of num_devices "
                f"{num_devices} (the batch is sharded over the data mesh)")

    fetch_model_data = select_model_data_fetcher(
        model_name, model_input_type, dataset_name=dataset_name,
        **{**misc_dict, **cfg.parameters})
    feed_model_data = select_model_data_feeder(
        model_name, model_input_type, dataset_name=dataset_name, **misc_dict)
    num_main_losses = decide_num_main_losses(model_name, dataset_name,
                                             {**misc_dict, **cfg.parameters})
    num_inputs = 8 if model_name == "2G-GCN" else 3

    log_dir = cfg.logging.get("log_dir")
    checkpoint_name = cfg.logging.get("checkpoint_name")
    if log_dir is not None and is_main_process():
        os.makedirs(log_dir, exist_ok=True)
        # Frozen config: predict.py re-loads this copy (reference predict.py:22-23).
        save_config(cfg, os.path.join(log_dir, ".hydra", "config.yaml"))

    # Resume from a fault-tolerance snapshot (last.ckpt) when requested. The
    # snapshot restores params, optimizer state, global step (per-batch RNG),
    # best-val state and loss histories, so the resumed trajectory is the one
    # the uninterrupted run would have produced.
    initial_epoch, init_opt_state, initial_global_step = 1, None, 0
    initial_best_val_loss, initial_checkpoint = float("inf"), None
    if misc_dict.get("resume", False) and log_dir is not None:
        from tggcn.train.checkpoint import load_last

        last = load_last(log_dir)
        if last is not None:
            params = last["trainable"]["model"]
            if mtll is not None and "mtll" in last["trainable"]:
                mtll["log_sds"] = last["trainable"]["mtll"]
            init_opt_state = last["opt_state"]
            initial_epoch = last["epoch"] + 1
            initial_global_step = last.get("global_step", 0)
            initial_best_val_loss = last.get("best_val_loss", float("inf"))
            initial_checkpoint = last.get("best_checkpoint")
            print(f"Resumed from epoch {last['epoch']} ({log_dir}/last.ckpt)")
        if distributed:
            # Every process must restore the SAME snapshot (the run dir has
            # to live on storage visible to all hosts); a host that misses
            # last.ckpt would silently restart from scratch and diverge.
            from tggcn.parallel.distributed import assert_same_across_processes

            assert_same_across_processes(initial_epoch,
                                         "misc.resume=true restored epoch")

    # Run only the remaining epochs up to the configured total.
    num_epochs = max(cfg.optimization.epochs - (initial_epoch - 1), 0)
    if num_epochs == 0:
        # Resuming a completed run: never clobber the existing checkpoint.
        print(f"Run already completed ({cfg.optimization.epochs} epochs); nothing to do.")
        return {}

    if profiler_dir:
        jax.profiler.start_trace(profiler_dir)
    checkpoint = train(model, train_loader, optimizer, criterion,
                       num_epochs, loss_names,
                       clip_gradient_at=cfg.optimization.clip_gradient_at,
                       fetch_model_data=fetch_model_data, feed_model_data=feed_model_data,
                       val_loader=val_loader, mtll=mtll, num_main_losses=num_main_losses,
                       seed=seed, mesh=mesh, num_inputs=num_inputs,
                       checkpoint_name=checkpoint_name,
                       tensorboard_log_dir=cfg.logging.get("root_log_dir"),
                       log_dir=log_dir, init_params=params,
                       init_opt_state=init_opt_state, initial_epoch=initial_epoch,
                       initial_global_step=initial_global_step,
                       initial_best_val_loss=initial_best_val_loss,
                       initial_checkpoint=initial_checkpoint)
    if profiler_dir:
        jax.profiler.stop_trace()
    if log_dir is not None and is_main_process():
        # Process 0 owns the run-dir writes; its replicated copy IS the
        # global state (tggcn/parallel/distributed.py).
        checkpoint["scalers"] = scalers
        save_checkpoint(log_dir, checkpoint, checkpoint_name=checkpoint_name,
                        include_timestamp=False,
                        backend=cfg.logging.get("checkpoint_backend", "pickle"))
    return checkpoint


if __name__ == "__main__":
    main()
