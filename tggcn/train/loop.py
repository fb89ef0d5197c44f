"""Training / evaluation loops with jit-compiled steps.

Mirrors the reference loop semantics (pyrutils/torch/train_utils.py:12-232):
per-epoch training, full train-set + val-set loss re-evaluation, best-val
parameter tracking, per-loss scalar logging, optional multi-task loss
learner, gradient clipping over model parameters only.

TPU-first differences:
  * One jit-compiled train step (forward + losses + grads + Adam update) with
    donated state; the final partial batch is padded to the full batch size
    (targets -> -1, masked out of every loss) so exactly one program shape
    compiles per loader.
  * Optional data-parallel execution over a `jax.sharding.Mesh`: the batch
    axis is sharded, parameters replicated; XLA inserts the gradient psum.
  * Fault tolerance beyond the reference: per-epoch last.ckpt snapshots with
    optimizer state + RNG, and resume support (SURVEY.md §5.3).
"""

import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tggcn.parallel.mesh import batch_sharding, replicate
from tggcn.train.checkpoint import save_last
from tggcn.train.logging import ScalarWriter
from tggcn.train.multi_task import apply_mtll, mtll_weights


def _set_bn_state(params: dict, bn_state) -> dict:
    out = dict(params)
    gcn = dict(out["geometry_embedding_gcn"])
    bn = dict(gcn["bn"])
    bn["state"] = bn_state
    gcn["bn"] = bn
    out["geometry_embedding_gcn"] = gcn
    return out


def pad_batch(batch: list, batch_size: int, num_inputs: int) -> list:
    """Pad a partial batch to batch_size so one program shape serves all batches.

    Inputs are padded with zeros (1-D float tensors such as steps_per_example
    with ones, to keep divisions safe); targets with -1, which every loss
    masks out.
    """
    current = len(batch[0])
    if current == batch_size:
        return batch
    out = []
    for i, arr in enumerate(batch):
        pad_rows = batch_size - current
        if i < num_inputs:
            fill = 1.0 if (arr.ndim == 1 and np.issubdtype(arr.dtype, np.floating)) else 0
            pad = np.full((pad_rows,) + arr.shape[1:], fill, dtype=arr.dtype)
        else:
            pad = np.full((pad_rows,) + arr.shape[1:], -1, dtype=arr.dtype)
        out.append(np.concatenate([arr, pad], axis=0))
    return out


def _clip_model_grads(grads_model, max_norm: float):
    """Global-norm clipping over the model subtree only (reference :152-153)."""
    leaves = jax.tree_util.tree_leaves(grads_model)
    total_norm = jnp.sqrt(sum(jnp.sum(jnp.square(g)) for g in leaves))
    clip_coef = jnp.minimum(max_norm / (total_norm + 1e-6), 1.0)
    return jax.tree_util.tree_map(lambda g: g * clip_coef, grads_model)


def device_batch_iterator(loader, batch_size: int, num_inputs: int, mesh=None):
    """Yield device-resident padded batches with one-batch-ahead prefetch.

    jax.device_put is asynchronous: the next batch's host->device transfer
    overlaps with the consumer's compute on the current batch. (Passing raw
    numpy arrays into a jit'ed step instead costs a synchronous per-call
    transfer, which dominated wall-clock on the remote-TPU path.)

    On a multi-process mesh each process feeds only the batch rows its own
    devices hold (per-host input pipeline sharding, SURVEY.md §5.8): the
    deterministic loader reproduces the same global batch on every host and
    make_global_batch assembles the global jax.Array from local rows.
    """
    from tggcn.parallel.distributed import is_multiprocess, make_global_batch
    from tggcn.parallel.mesh import shard_batch

    multiprocess = is_multiprocess(mesh)

    def put(batch):
        batch = pad_batch(batch, batch_size, num_inputs)
        if multiprocess:
            return make_global_batch(batch, mesh)
        if mesh is not None:
            return shard_batch(batch, mesh)
        return jax.device_put(batch)

    iterator = iter(loader)
    try:
        prefetched = put(next(iterator))
    except StopIteration:
        return
    for batch in iterator:
        current, prefetched = prefetched, put(batch)
        yield current
    yield prefetched


def _build_step_fn(model, feeder: Callable, criterion: Callable, optimizer,
                   clip_gradient_at: float = 0.0, mtll: Optional[dict] = None):
    """The raw (unjitted) train step over trainable = {'model': ..., ['mtll': ...]}."""
    mtll_static = None
    if mtll is not None:
        mtll_static = (mtll["loss_types"], mtll["mask"])

    def step(trainable, opt_state, rng, data, targets):
        def loss_fn(trainable_):
            outputs, aux = model.apply(trainable_["model"], train=True, rng=rng,
                                       **feeder(data))
            with jax.named_scope("losses"):
                raw_losses = criterion(outputs, targets, reduction="mean")
                if mtll_static is not None:
                    losses = apply_mtll(trainable_["mtll"], mtll_static[0],
                                        mtll_static[1], raw_losses)
                else:
                    losses = raw_losses
                total = sum(losses)
            return total, (jnp.stack(losses), jnp.stack(raw_losses), aux)

        grads, (losses, raw_losses, aux) = jax.grad(loss_fn, has_aux=True)(trainable)
        if clip_gradient_at:
            grads = dict(grads, model=_clip_model_grads(grads["model"], clip_gradient_at))
        # Scope the optimizer so device traces separate Adam (HBM-roofline,
        # BASELINE.md) from the backward tail.
        with jax.named_scope("adam"):
            updates, opt_state = optimizer.update(grads, opt_state, trainable)
            trainable = optax.apply_updates(trainable, updates)
        if aux.get("bn_state") is not None:
            trainable = dict(trainable,
                             model=_set_bn_state(trainable["model"], aux["bn_state"]))
        return trainable, opt_state, losses, raw_losses

    return step


def make_train_step(model, feeder: Callable, criterion: Callable,
                    optimizer, clip_gradient_at: float = 0.0,
                    mtll: Optional[dict] = None, mesh=None):
    """Jitted single train step; batch sharded over the mesh when given."""
    step = _build_step_fn(model, feeder, criterion, optimizer, clip_gradient_at, mtll)
    donate = (0, 1)
    if mesh is None:
        return jax.jit(step, donate_argnums=donate)
    data_sh = batch_sharding(mesh)
    rep = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    return jax.jit(step, donate_argnums=donate,
                   in_shardings=(rep, rep, rep, data_sh, data_sh),
                   out_shardings=(rep, rep, rep, rep))


def make_fused_train_steps(model, feeder: Callable, criterion: Callable,
                           optimizer, clip_gradient_at: float = 0.0,
                           mtll: Optional[dict] = None):
    """K training steps fused into ONE jit via lax.scan over microbatches.

    Device-bound inner loop: data/targets carry a leading steps axis (stacked
    microbatches resident in HBM); per-step host dispatch disappears, which
    matters on remote/pod deployments where each jit call pays host latency.
    Returns step(trainable, opt_state, rng, data_stack, target_stack) ->
    (trainable, opt_state, losses (K, L), raw_losses (K, L)).
    """
    single = _build_step_fn(model, feeder, criterion, optimizer,
                            clip_gradient_at, mtll)

    def fused(trainable, opt_state, rng, data_stack, target_stack):
        num_steps = jax.tree_util.tree_leaves(data_stack)[0].shape[0]
        keys = jax.random.split(rng, num_steps)

        def body(carry, inp):
            trainable_, opt_state_ = carry
            key, data, targets = inp
            trainable_, opt_state_, losses, raw = single(trainable_, opt_state_,
                                                         key, data, targets)
            return (trainable_, opt_state_), (losses, raw)

        (trainable, opt_state), (losses, raw) = jax.lax.scan(
            body, (trainable, opt_state), (keys, data_stack, target_stack))
        return trainable, opt_state, losses, raw

    return jax.jit(fused, donate_argnums=(0, 1))


def make_eval_step(model, feeder: Callable, criterion: Callable,
                   mtll: Optional[dict] = None, mesh=None):
    mtll_static = None
    if mtll is not None:
        mtll_static = (mtll["loss_types"], mtll["mask"])

    def eval_step(trainable, rng, data, targets):
        outputs, _aux = model.apply(trainable["model"], train=False, rng=rng,
                                    **feeder(data))
        raw_losses = criterion(outputs, targets, reduction="mean")
        if mtll_static is not None:
            losses = apply_mtll(trainable["mtll"], mtll_static[0], mtll_static[1],
                                raw_losses)
        else:
            losses = raw_losses
        return jnp.stack(losses), jnp.stack(raw_losses)

    if mesh is None:
        return jax.jit(eval_step)
    data_sh = batch_sharding(mesh)
    rep = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    return jax.jit(eval_step, in_shardings=(rep, rep, data_sh, data_sh),
                   out_shardings=(rep, rep))


def evaluate(eval_step, trainable, loader, fetcher, rng, batch_size: int,
             num_inputs: int, mesh=None):
    """Mean losses over a loader (reference test(), train_utils.py:168-224)."""
    total = None
    total_raw = None
    num_batches = 0
    for batch in device_batch_iterator(loader, batch_size, num_inputs, mesh):
        data, targets = fetcher(batch)
        losses, raw = eval_step(trainable, rng, data, targets)
        losses, raw = np.asarray(losses), np.asarray(raw)
        total = losses if total is None else total + losses
        total_raw = raw if total_raw is None else total_raw + raw
        num_batches += 1
    if num_batches == 0:
        return None, None
    return total / num_batches, total_raw / num_batches


def train(model, train_loader, optimizer, criterion, epochs, loss_names,
          clip_gradient_at: float = 0.0, fetch_model_data=None, feed_model_data=None,
          val_loader=None, initial_epoch: int = 1, mtll: Optional[dict] = None,
          print_raw_losses: bool = False, num_main_losses: Optional[int] = None,
          seed: int = 42, mesh=None, num_inputs: int = 8,
          checkpoint_name: Optional[str] = None, tensorboard_log_dir: Optional[str] = None,
          log_dir: Optional[str] = None, init_params=None, init_opt_state=None,
          log_interval: int = 25, initial_global_step: int = 0,
          initial_best_val_loss: float = float("inf"),
          initial_checkpoint: Optional[dict] = None, **kwargs):
    """Full training run; returns the checkpoint dict (reference train())."""
    from tggcn.parallel.distributed import is_main_process, is_multiprocess, \
        replicate_global

    # Multi-process: every process trains lockstep on the replicated state;
    # only process 0 writes scalars / checkpoints / progress lines (its copy
    # IS the global state).
    multiprocess = is_multiprocess(mesh)
    main_proc = is_main_process()
    if multiprocess and not main_proc:
        tensorboard_log_dir = log_dir = None
    writer = ScalarWriter(tensorboard_log_dir if main_proc else None,
                          checkpoint_name)
    log = print if main_proc else (lambda *a, **k: None)
    trainable = {"model": init_params}
    if mtll is not None:
        trainable["mtll"] = mtll["log_sds"]
    opt_state = init_opt_state if init_opt_state is not None else optimizer.init(trainable)
    if multiprocess:
        trainable = replicate_global(trainable, mesh)
        opt_state = replicate_global(opt_state, mesh)
    elif mesh is not None:
        trainable = replicate(trainable, mesh)
        opt_state = replicate(opt_state, mesh)

    # Both compiled programs guard their first call: a kernel compile (or
    # launch) failure downgrades the run to the XLA path instead of crashing
    # (models/fallback.py). The train step donates its state buffers, so its
    # guard runs the first attempt on copies; the train and eval programs
    # fuse differently, so the eval program gets its own guard (a
    # train-side downgrade takes the eval program with it, but an eval-only
    # compile failure must not crash the run after a full training epoch).
    from tggcn.models.fallback import FirstCallGuard

    def build_train(m):
        return make_train_step(m, feed_model_data, criterion, optimizer,
                               clip_gradient_at=clip_gradient_at, mtll=mtll,
                               mesh=mesh)

    def build_eval(m):
        return make_eval_step(m, feed_model_data, criterion, mtll=mtll,
                              mesh=mesh)

    eval_step = FirstCallGuard(
        build_eval, model, "eval step",
        force_output=lambda r: np.asarray(r[0]))
    train_step = FirstCallGuard(
        build_train, model, "train step",
        # Force one output: compile errors raise at dispatch, Mosaic launch
        # errors only on fetch. One sync, first step only.
        force_output=lambda r: np.asarray(r[2]),
        donate_argnums=(0, 1),
        on_downgrade=eval_step.downgrade)

    batch_size = train_loader.batch_size
    root_rng = jax.random.PRNGKey(seed)
    # Resume state: the best checkpoint so far, its val loss, and the global
    # step (the per-batch RNG folds it in) carry over from last.ckpt so a
    # resumed run replays the uninterrupted trajectory exactly.
    checkpoint = dict(initial_checkpoint) if initial_checkpoint else {}
    train_losses = list(checkpoint.pop("train_losses", []))
    val_losses = list(checkpoint.pop("val_losses", []))
    train_raw_losses = list(checkpoint.pop("train_raw_losses", []))
    val_raw_losses = list(checkpoint.pop("val_raw_losses", []))
    best_val_loss = initial_best_val_loss
    global_step = initial_global_step
    num_examples = train_loader.num_examples

    for epoch in range(initial_epoch, epochs + initial_epoch):
        log(f"\nEpoch: [{epoch:4d}/{epochs + initial_epoch - 1:4d}]")
        epoch_start = time.time()
        num_batches = len(train_loader)
        if hasattr(train_loader, "set_epoch"):
            # Shuffle order becomes a pure function of the epoch number.
            train_loader.set_epoch(epoch)
        batches = device_batch_iterator(train_loader, batch_size, num_inputs, mesh)
        for batch_idx, batch in enumerate(batches):
            data, targets = fetch_model_data(batch)
            rng = jax.random.fold_in(root_rng, global_step)
            trainable, opt_state, losses, raw_losses = train_step(
                trainable, opt_state, rng, data, targets)
            global_step += 1
            if (batch_idx % log_interval) == 0 or batch_idx == num_batches - 1:
                losses_np = np.asarray(losses)
                n_main = num_main_losses if num_main_losses is not None else len(losses_np)
                loss = float(losses_np[-n_main:].sum())
                batch_end = min((batch_idx + 1) * batch_size, num_examples)
                progress = 100 * (batch_idx + 1) / num_batches
                log(f"(Train) Batch [{batch_end:6d}/{num_examples:6d} ({progress:3.0f}%)] ",
                      f"Loss: {loss: 8.4f}", end="")
                for loss_name, single in zip(loss_names, losses_np):
                    log(f"  {loss_name}: {single: 6.4f}", end="")
                log()

        # Per-epoch evaluation on the full train set, then the val set.
        eval_rng = jax.random.fold_in(root_rng, 10_000_000 + epoch)
        cur_train, cur_train_raw = evaluate(eval_step, trainable, train_loader,
                                            fetch_model_data, eval_rng, batch_size,
                                            num_inputs, mesh=mesh)
        n_main = num_main_losses if num_main_losses is not None else len(cur_train)
        total_train = float(cur_train[-n_main:].sum())
        _print_eval("Train", total_train, loss_names, cur_train, printer=log)
        train_losses.append([total_train, cur_train.tolist()])
        if mtll is not None:
            train_raw_losses.append([float(cur_train_raw[-n_main:].sum()),
                                     cur_train_raw.tolist()])
        base = "Loss/train_mtll/" if mtll is not None else "Loss/train/"
        for loss_name, value in zip(loss_names, cur_train):
            writer.add_scalar(base + loss_name, value, epoch)
        writer.add_scalar(base + "total", total_train, epoch)
        if mtll is not None:
            weights = mtll_weights(np.asarray(trainable["mtll"]), mtll["loss_types"],
                                   mtll["mask"])
            for loss_name, raw, weight in zip(loss_names, cur_train_raw, weights):
                writer.add_scalar(f"Loss/train/{loss_name}", raw, epoch)
                if weight is not None:
                    writer.add_scalar(f"Loss/mtll_weight/{loss_name}", weight, epoch)
            writer.add_scalar("Loss/train/total", float(cur_train_raw[-n_main:].sum()), epoch)

        if val_loader is not None and val_loader.num_examples > 0:
            cur_val, cur_val_raw = evaluate(eval_step, trainable, val_loader,
                                            fetch_model_data, eval_rng,
                                            val_loader.batch_size, num_inputs, mesh=mesh)
            total_val = float(cur_val[-n_main:].sum())
            _print_eval("Validation", total_val, loss_names, cur_val, printer=log)
            val_losses.append([total_val, cur_val.tolist()])
            if mtll is not None:
                val_raw_losses.append([float(cur_val_raw[-n_main:].sum()),
                                       cur_val_raw.tolist()])
            base = "Loss/val_mtll/" if mtll is not None else "Loss/val/"
            for loss_name, value in zip(loss_names, cur_val):
                writer.add_scalar(base + loss_name, value, epoch)
            writer.add_scalar(base + "total", total_val, epoch)
            if total_val < best_val_loss:
                best_val_loss = total_val
                checkpoint["epoch"] = epoch
                checkpoint["model_state_dict"] = jax.tree_util.tree_map(
                    np.asarray, trainable["model"])
                if mtll is not None:
                    checkpoint["mtll_model_state_dict"] = np.asarray(trainable["mtll"])
        else:
            checkpoint["epoch"] = epoch
            checkpoint["model_state_dict"] = jax.tree_util.tree_map(
                np.asarray, trainable["model"])
            if mtll is not None:
                checkpoint["mtll_model_state_dict"] = np.asarray(trainable["mtll"])

        writer.add_scalar("perf/epoch_seconds", time.time() - epoch_start, epoch)
        if log_dir is not None:
            # Fault-tolerance snapshot: resume-able mid-run state, including
            # the best checkpoint so far (so best-val selection survives).
            save_last(log_dir, {"epoch": epoch, "trainable": trainable,
                                "opt_state": opt_state, "global_step": global_step,
                                "best_val_loss": best_val_loss,
                                "best_checkpoint": {
                                    **checkpoint,
                                    "train_losses": train_losses,
                                    "val_losses": val_losses,
                                    "train_raw_losses": train_raw_losses,
                                    "val_raw_losses": val_raw_losses}})

    log("Lowest val_loss is", best_val_loss)
    checkpoint["train_losses"] = train_losses
    checkpoint["val_losses"] = val_losses
    checkpoint["train_raw_losses"] = train_raw_losses
    checkpoint["val_raw_losses"] = val_raw_losses
    writer.close()
    return checkpoint


def _print_eval(name, total, loss_names, losses, printer=print):
    tag = f"({name})"
    printer(f"{tag:>12} Loss: {total: 7.4f}", end="")
    for loss_name, loss in zip(loss_names, losses):
        printer(f"   {loss_name}: {loss: 6.4f}", end="")
    printer()
