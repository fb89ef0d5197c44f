"""Multi-process data parallelism: 2 local CPU processes x 4 devices each.

The real test of SURVEY.md §5.8's multi-host half: two OS processes join a
``jax.distributed`` runtime over a localhost coordinator, form one global
8-device mesh, feed per-process batch shards
(jax.make_array_from_process_local_data), and train the full ``train()``
loop for 2 epochs. The resulting loss trajectory must match the
single-process 8-device run of the identical workload, and only process 0
may write run-dir artifacts.
"""

import json
import os
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

WORKER = os.path.join(os.path.dirname(__file__), "distributed_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_workers(out_path, logdir_for, extra_env=None):
    """Launch the 2-process worker pair and return process 0's result."""
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        # Fresh XLA/JAX view per worker: 4 local CPU devices, own process id.
        env.pop("XLA_FLAGS", None)
        env.update({
            "TGGCN_COORDINATOR": f"127.0.0.1:{port}",
            "TGGCN_NUM_PROCESSES": "2",
            "TGGCN_PROCESS_ID": str(pid),
            "TGGCN_LOCAL_DEVICES": "4",
            "TGGCN_TEST_LOGDIR": str(logdir_for(pid)),
            "TGGCN_TEST_OUT": str(out_path),
            "JAX_COMPILATION_CACHE_DIR": env.get("JAX_COMPILATION_CACHE_DIR",
                                                 "/tmp/jaxcache"),
        })
        env.update(extra_env or {})
        procs.append(subprocess.Popen(
            [sys.executable, WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outputs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outputs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
    with open(out_path) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def multiproc_result(tmp_path_factory):
    """Run the 2-process trajectory once; reuse across assertions."""
    tmp = tmp_path_factory.mktemp("distributed")
    result = _run_workers(tmp / "result.json",
                          lambda pid: tmp / f"rundir_p{pid}")
    return result, tmp


def test_two_process_trajectory_matches_single_process(multiproc_result):
    """Loss-for-loss equality with the single-process 8-device mesh run."""
    import distributed_worker as dw

    from tggcn.parallel.mesh import make_mesh

    result, _ = multiproc_result
    assert result["num_devices"] == 8

    assert len(jax.devices()) >= 8
    baseline = dw.run_training(make_mesh(8), log_dir=None)

    for key in ("train_losses", "val_losses"):
        got = result[key]
        want = baseline[key]
        assert len(got) == len(want) == dw.NUM_EPOCHS
        for (total_g, per_g), (total_w, per_w) in zip(got, want):
            np.testing.assert_allclose(total_g, total_w, rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(per_g, per_w, rtol=1e-5, atol=1e-6)


def test_process_zero_owns_rundir_writes(multiproc_result):
    """last.ckpt appears in process 0's run dir and ONLY there."""
    _, tmp = multiproc_result
    assert (tmp / "rundir_p0" / "last.ckpt").exists()
    assert not (tmp / "rundir_p1").exists() or \
        not (tmp / "rundir_p1" / "last.ckpt").exists()


def test_multiprocess_kill_and_resume(multiproc_result, tmp_path):
    """A 1-epoch 2-process run + a resumed second epoch reproduce the
    uninterrupted 2-epoch 2-process trajectory (last.ckpt on storage both
    processes read — train.py's misc.resume contract for multi-host)."""
    full, _ = multiproc_result
    shared = tmp_path / "shared_rundir"
    _run_workers(tmp_path / "leg1.json", lambda pid: shared,
                 extra_env={"TGGCN_TEST_EPOCHS": "1"})
    assert (shared / "last.ckpt").exists()
    resumed = _run_workers(tmp_path / "leg2.json", lambda pid: shared,
                           extra_env={"TGGCN_TEST_EPOCHS": "2",
                                      "TGGCN_TEST_RESUME": "1"})
    for key in ("train_losses", "val_losses"):
        got, want = resumed[key], full[key]
        assert len(got) == len(want)
        np.testing.assert_allclose(np.asarray(got[-1][1]),
                                   np.asarray(want[-1][1]),
                                   rtol=1e-5, atol=1e-6)


def test_incomplete_launch_contract_raises_clearly():
    """coordinator_address without num_processes/process_id must fail fast
    with a clear message, not hang on the handshake auto-detect."""
    import pytest

    from tggcn.parallel.distributed import maybe_initialize

    with pytest.raises(ValueError, match="launch contract"):
        maybe_initialize(coordinator_address="127.0.0.1:9999")
    with pytest.raises(ValueError, match="launch contract"):
        maybe_initialize(coordinator_address="127.0.0.1:9999",
                         num_processes=2)
