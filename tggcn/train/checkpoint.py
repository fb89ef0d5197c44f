"""Checkpointing and the run-directory contract.

Run-dir layout matches the reference so predict-time discovery works the same
way (SURVEY.md §5.4): ``outputs/<data.name>/<model>/<checkpoint_name>/``
contains ``.hydra/config.yaml`` (frozen config) and
``<checkpoint_name>.ckpt`` with {epoch, model_state, losses, scalers, ...}.

Beyond the reference (which writes once at the end and loses a crashed run,
reference pyrutils/torch/train_utils.py:97-107), ``save_last``/``load_last``
give periodic fault-tolerant snapshots including the optimizer state and RNG
so training can resume mid-run.

Reference .tar checkpoints (torch) are also loadable for warm starts via
tggcn.compat.
"""

import os
import pickle
from datetime import datetime
from typing import Optional

import jax
import numpy as np


def _to_numpy(tree):
    """Materialise device arrays as numpy; leave other leaves untouched.

    Non-array payloads ride along in checkpoints (notably the fitted sklearn
    scalers, reference train.py:61) — np.asarray would silently wrap those
    in 0-d object arrays and break their API at load time.
    """
    def conv(x):
        if isinstance(x, (jax.Array, np.ndarray, np.generic)):
            return np.asarray(x)
        return x

    return jax.tree_util.tree_map(conv, tree)


def save_checkpoint(log_dir: str, checkpoint: dict, checkpoint_name: Optional[str] = None,
                    include_timestamp: bool = False, backend: str = "pickle") -> str:
    """Save the final run checkpoint (reference save_checkpoint, train_utils.py:235-253).

    backend='orbax' stores the model parameter pytree through orbax (the
    idiomatic JAX array-checkpoint layout: async-capable, multi-host-safe)
    in a ``<name>.orbax`` directory next to the ``.ckpt``, which then holds
    the non-array run metadata (losses, scalers, epoch) plus a pointer.
    ``load_checkpoint`` reassembles either layout transparently, so
    predict.py and warm starts work identically with both backends.
    """
    file_save_name = checkpoint_name if checkpoint_name is not None else "checkpoint"
    if include_timestamp:
        file_save_name = datetime.utcnow().strftime("%Y_%m_%d_%H_%M_%S") + "_" + file_save_name
    os.makedirs(log_dir, exist_ok=True)
    path = os.path.join(log_dir, file_save_name + ".ckpt")
    checkpoint = _to_numpy(checkpoint)
    if backend == "orbax" and "model_state_dict" in checkpoint:
        orbax_name = file_save_name + ".orbax"
        save_params_orbax(os.path.join(log_dir, orbax_name),
                          checkpoint["model_state_dict"])
        checkpoint = dict(checkpoint)
        del checkpoint["model_state_dict"]
        checkpoint["__orbax_model__"] = orbax_name
    elif backend != "pickle":
        raise ValueError(f"Unknown checkpoint backend {backend!r} "
                         "(expected 'pickle' or 'orbax')")
    with open(path, "wb") as f:
        pickle.dump(checkpoint, f)
    print(f"log files written to {path}")
    return path


def load_checkpoint(path: str) -> dict:
    with open(path, "rb") as f:
        checkpoint = pickle.load(f)
    orbax_name = checkpoint.pop("__orbax_model__", None)
    if orbax_name is not None:
        checkpoint["model_state_dict"] = load_params_orbax(
            os.path.join(os.path.dirname(path), orbax_name))
    return checkpoint


def save_last(log_dir: str, state: dict) -> str:
    """Fault-tolerance snapshot (params + optimizer + epoch + rng)."""
    os.makedirs(log_dir, exist_ok=True)
    tmp = os.path.join(log_dir, "last.ckpt.tmp")
    path = os.path.join(log_dir, "last.ckpt")
    with open(tmp, "wb") as f:
        pickle.dump(_to_numpy(state), f)
    os.replace(tmp, path)  # atomic: a crash mid-write never corrupts last.ckpt
    return path


def load_last(log_dir: str) -> Optional[dict]:
    path = os.path.join(log_dir, "last.ckpt")
    if not os.path.exists(path):
        return None
    with open(path, "rb") as f:
        return pickle.load(f)


def save_params_orbax(path: str, params) -> str:
    """Save a parameter pytree via orbax (optional array-storage backend).

    The pickle run-dir contract stays the canonical format (it carries
    non-array metadata: scalers, loss histories); orbax covers the idiomatic
    JAX array-checkpoint use case (async-capable, multi-host-safe layout).
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as checkpointer:
        checkpointer.save(path, _to_numpy(params), force=True)
    return path


def load_params_orbax(path: str):
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as checkpointer:
        return checkpointer.restore(os.path.abspath(path))


def load_run_checkpoint(model_dir: str) -> dict:
    """Load a run dir's full checkpoint dict from either backend.

    Accepts this framework's ``<basename>.ckpt`` runs and reference
    ``<basename>.tar`` (torch) runs; both carry the same metadata keys
    (epoch, train_losses, val_losses, ...) so offline tooling such as
    ``analysis.py plot_curves`` (reference analysis.py:78-90) works on
    either. Weights in a .tar stay as torch tensors — use
    :func:`load_model_weights` when parameters are needed.
    """
    basename = os.path.basename(os.path.normpath(model_dir))
    ckpt_path = os.path.join(model_dir, basename + ".ckpt")
    if os.path.exists(ckpt_path):
        return load_checkpoint(ckpt_path)
    tar_path = os.path.join(model_dir, basename + ".tar")
    if os.path.exists(tar_path):
        import torch

        # Reference .tar checkpoints carry sklearn scaler objects
        # (reference train.py:61), which torch>=2.6's weights_only default
        # refuses to unpickle; run-dir tars are the user's own local files.
        return torch.load(tar_path, map_location="cpu", weights_only=False)
    raise FileNotFoundError(f"No checkpoint found in {model_dir} "
                            f"(looked for {basename}.ckpt and {basename}.tar)")


def load_model_weights(model_dir: str, cfg=None):
    """Load the model weights from a run dir (reference models.py:1630-1634).

    Accepts both this framework's .ckpt runs and reference .tar (torch) runs;
    the latter are converted via tggcn.compat (cfg must then be the model's
    TGGCNConfig or None for baselines).
    """
    basename = os.path.basename(os.path.normpath(model_dir))
    ckpt_path = os.path.join(model_dir, basename + ".ckpt")
    if os.path.exists(ckpt_path):
        return load_checkpoint(ckpt_path)["model_state_dict"]
    tar_path = os.path.join(model_dir, basename + ".tar")
    if os.path.exists(tar_path):
        import torch

        # weights_only=False: reference tars also hold sklearn scalers (see
        # load_run_checkpoint); these are the user's own local run files.
        checkpoint = torch.load(tar_path, map_location="cpu",
                                weights_only=False)
        sd = {k: v.numpy() for k, v in checkpoint["model_state_dict"].items()}
        from tggcn.compat import (
            baseline_params_from_torch_state_dict,
            tggcn_params_from_torch_state_dict,
        )

        if cfg is not None:
            return tggcn_params_from_torch_state_dict(sd, cfg)
        return baseline_params_from_torch_state_dict(sd)
    raise FileNotFoundError(f"No checkpoint found in {model_dir} "
                            f"(looked for {basename}.ckpt and {basename}.tar)")


def merge_params(init_params: dict, loaded: dict) -> dict:
    """Non-strict weight loading: overwrite matching leaves, keep the rest.

    Equivalent to the reference's load_state_dict(..., strict=False) used for
    stage-2 warm starts (train.py:35-37).
    """
    if not isinstance(init_params, dict) or not isinstance(loaded, dict):
        init_shape = getattr(init_params, "shape", None)
        loaded_shape = getattr(loaded, "shape", None)
        if init_shape == loaded_shape:
            return loaded
        return init_params
    out = dict(init_params)
    for k in init_params:
        if k in loaded:
            out[k] = merge_params(init_params[k], loaded[k])
    return out
