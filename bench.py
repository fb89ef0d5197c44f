"""Benchmark: 2G-GCN MPHOI-shaped training-step throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload (matching the reference's headline MPHOI configuration,
conf/models/2G-GCN_stage1.yaml + conf/data/mphoi.yaml): hidden 512, batch 8,
T = 167 downsampled frames (~500 raw @ downsampling 3), 2 humans, 4 objects,
full stage-1 training step (forward + backward + Adam) on synthetic data.

vs_baseline compares against the reference PyTorch implementation running
the same step on this host's CPU (measured by tools/bench_reference.py and
recorded in BASELINE.md).

Tunnel robustness (round-4 postmortem: BENCH_r04 ended as an unparseable
rc=1 traceback when the remote-TPU tunnel was down): the default entry is a
supervisor that never initialises the JAX backend itself. It first probes
backend liveness in a time-bounded subprocess (with bounded retry/backoff —
axon initialisation HANGS rather than erroring when the tunnel is down),
then runs the measurement in a watchdogged child (``bench.py --child``).
On outage or timeout it still prints one machine-readable JSON line with an
"error" field and exits 0, so the driver artifact stays parseable.
"""

import json
import os
import subprocess
import sys
import time

# Persistent compile cache: repeated bench runs skip the multi-minute remote
# compile of the full train step.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

METRIC = "mphoi_2ggcn_train_clips_per_sec"
UNIT = "clips/sec/chip"

# Backend-liveness probe: jax import is 30-60 s and a tiny remote compile
# 20-40 s on a healthy tunnel, so 240 s per attempt is ~2x headroom; when
# the tunnel is down the attempt hangs and the timeout is what ends it. The
# whole outage path (attempts + backoff) stays under ~9 min so the
# structured error line lands well before any external driver timeout.
# Env-overridable so tests can exercise the outage path in seconds.
PROBE_TIMEOUT_S = int(os.environ.get("TGGCN_BENCH_PROBE_TIMEOUT_S", 240))
PROBE_ATTEMPTS = int(os.environ.get("TGGCN_BENCH_PROBE_ATTEMPTS", 2))
PROBE_BACKOFF_S = (30, 90)
# Full measurement child: first remote compile of the train step is 3-10 min
# (high variance) + the cross-check model's compile; cached runs are ~2 min.
# 30 min covers two cold compiles; past that, a structured timeout record
# beats an externally-killed unparseable run.
CHILD_TIMEOUT_S = int(os.environ.get("TGGCN_BENCH_CHILD_TIMEOUT_S", 1800))

_PROBE_CODE = """
import os
import numpy as np
import jax
# The ambient sitecustomize pins the remote-TPU backend programmatically;
# honour an explicit CPU pin the same way tests/conftest.py does.
if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
x = jnp.ones((128, 128), jnp.float32)
assert float(np.asarray(x @ x)[0, 0]) == 128.0
print("probe-ok", jax.devices()[0].platform)
"""


def _emit(record):
    print(json.dumps(record), flush=True)


def _probe_backend():
    """True if a time-bounded subprocess can run one op on the backend."""
    for attempt in range(PROBE_ATTEMPTS):
        try:
            proc = subprocess.run(
                [sys.executable, "-c", _PROBE_CODE], timeout=PROBE_TIMEOUT_S,
                capture_output=True, text=True)
            if proc.returncode == 0 and "probe-ok" in proc.stdout:
                return True
            detail = (proc.stderr or proc.stdout).strip().splitlines()[-3:]
            print(f"[bench] probe attempt {attempt + 1} rc={proc.returncode}: "
                  f"{' | '.join(detail)}", file=sys.stderr, flush=True)
        except subprocess.TimeoutExpired:
            print(f"[bench] probe attempt {attempt + 1} timed out after "
                  f"{PROBE_TIMEOUT_S}s (tunnel hang)", file=sys.stderr, flush=True)
        if attempt < PROBE_ATTEMPTS - 1:
            time.sleep(PROBE_BACKOFF_S[min(attempt, len(PROBE_BACKOFF_S) - 1)])
    return False


def supervise():
    """Probe the backend, then run the measurement child under a watchdog.

    Always prints exactly one JSON line and exits 0: either the child's
    measurement line (relayed) or a structured error record.
    """
    base = {"metric": METRIC, "value": None, "unit": UNIT, "vs_baseline": None}
    if not _probe_backend():
        _emit({**base, "error": "backend_unavailable",
               "detail": f"{PROBE_ATTEMPTS} probe attempts "
                         f"({PROBE_TIMEOUT_S}s timeout each) failed; "
                         "remote-TPU tunnel down or unreachable"})
        return
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child"],
            timeout=CHILD_TIMEOUT_S, capture_output=True, text=True)
    except subprocess.TimeoutExpired as exc:
        tail = ((exc.stderr or b"").decode(errors="replace")
                if isinstance(exc.stderr, bytes) else (exc.stderr or ""))
        _emit({**base, "error": "measurement_timeout",
               "detail": f"child exceeded {CHILD_TIMEOUT_S}s; stderr tail: "
                         + " | ".join(tail.strip().splitlines()[-3:])})
        return
    sys.stderr.write(proc.stderr)
    for line in proc.stdout.splitlines():
        try:
            record = json.loads(line)
        except ValueError:
            print(line, file=sys.stderr)
            continue
        if isinstance(record, dict) and record.get("metric") == METRIC:
            _emit(record)
            return
    _emit({**base, "error": "measurement_failed",
           "detail": f"child rc={proc.returncode}, no JSON line; stderr tail: "
                     + " | ".join(proc.stderr.strip().splitlines()[-3:])})

# Reference PyTorch-CPU throughput on this host (tools/bench_reference.py).
# Measured: 0.2832 clips/s at T=40; at the headline T=167 a single reference
# train step did NOT complete within 595 s (=> < 0.0135 clips/s). The value
# below is the linear-in-T extrapolation 0.2832 * 40/167, which is
# FAVOURABLE to the reference (its measured scaling is super-linear).
# See BASELINE.md for the full measurement record.
REFERENCE_CPU_CLIPS_PER_SEC = 0.0678


def main():
    # Heavy imports live here, NOT at module scope: the supervisor path
    # (supervise/probe) must stay import-light — a module-level jax import
    # would cost the 30-60 s jax startup before the probe even runs, and
    # would touch the ambient backend in the supervisor process.
    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import jax.numpy as jnp
    import optax

    from tggcn.config import Config
    from tggcn.data.loading import select_model_data_feeder, select_model_data_fetcher
    from tggcn.models import select_model
    from tggcn.train.losses import select_loss

    b, t, num_humans, num_objects, hidden = 8, 167, 2, 4, 512
    num_steps = 20
    kernels = True
    # Tiny smoke mode (tests / CPU): small shapes, kernels off (Mosaic is
    # TPU-only), 2-step windows — exercises the full measurement path.
    if os.environ.get("TGGCN_BENCH_TINY") == "1":
        b, t, num_humans, num_objects, hidden = 2, 12, 2, 2, 16
        num_steps = 2
        kernels = False
    model = select_model(
        "2G-GCN", input_size=(2152, 2048), num_classes=(13, None),
        hidden_size=hidden, gcn_node=26,
        message_humans_to_human=True, message_human_to_objects=True,
        message_objects_to_human=True, message_objects_to_object=True,
        message_geometry_to_objects=True, message_segment=True,
        message_type="v2", message_granularity="v1", message_aggregation="att",
        attention_style="v3", discrete_optimization_strategy="gs",
        object_segment_update_strategy="ind",
        # TPU-idiomatic training mode: bf16 activations with float32 master
        # weights/heads/losses (deviation bounds pinned by tests/test_bf16.py),
        # the VMEM-resident Pallas GRU-sequence kernel (gradient-equivalence-
        # tested, tests/test_gru_pallas.py), and the fused Pallas segment-scan
        # kernel with its hand-written Pallas backward (gradient-equivalence-
        # tested, tests/test_segment_scan_pallas.py).
        # Full lever matrix (f32/bf16/kernels): BASELINE.md round-2 table.
        compute_dtype="bfloat16", use_pallas_gru=kernels,
        use_pallas_segment_scan=kernels)
    params = model.init(jax.random.PRNGKey(0))
    optimizer = optax.adam(1e-4)

    cfg = Config({"misc": Config({})})
    criterion, _ = select_loss("2G-GCN", "multiple", "mphoi", cfg=cfg)
    feeder = select_model_data_feeder("2G-GCN", "multiple", dataset_name="mphoi",
                                      impose_segmentation_pattern=1)
    fetcher = select_model_data_fetcher("2G-GCN", "multiple", dataset_name="mphoi")

    rng = np.random.default_rng(0)
    x_human = rng.normal(size=(b, t, num_humans, 2152)).astype(np.float32)
    x_objects = rng.normal(size=(b, t, num_objects, 2048)).astype(np.float32)
    mask = np.ones((b, num_objects), dtype=np.float32)
    steps = np.full((b,), float(t), dtype=np.float32)
    x_hseg = np.ones((b, t, num_humans), dtype=np.float32)
    dummy = np.zeros((b, 1, 1, 1), dtype=np.float32)
    y_seg = rng.integers(0, 2, size=(b, t, num_humans)).astype(np.float32)
    y_rec = rng.integers(0, 13, size=(b, t, num_humans)).astype(np.int64)
    batch = [x_human, x_objects, mask, x_hseg, dummy, dummy, dummy, steps,
             y_seg, y_seg, y_rec, y_rec, y_rec, y_rec]
    # Device-resident inputs (the train loop prefetches batches the same way).
    batch = jax.device_put(batch)
    data, targets = fetcher(batch)

    # Production inner loop: K steps fused into one jit via lax.scan over
    # HBM-resident stacked microbatches (no per-step host dispatch).
    from tggcn.train.loop import make_fused_train_steps

    stack = lambda a: jnp.broadcast_to(a[None], (num_steps,) + a.shape)
    data_stack = jax.tree_util.tree_map(stack, data)
    target_stack = jax.tree_util.tree_map(stack, targets)

    fused = make_fused_train_steps(model, feeder, criterion, optimizer, mtll=None)
    trainable = {"model": params}
    opt_state = optimizer.init(trainable)

    # The fused step donates its inputs; keep fresh buffers for the
    # cross-check below.
    crosscheck = os.environ.get("TGGCN_BENCH_CROSSCHECK", "1") != "0"
    params_check = (jax.tree_util.tree_map(jnp.array, params)
                    if crosscheck else None)

    # Warmup / compile. Sync by fetching the loss value: on the remote-TPU
    # backend block_until_ready does not reliably wait for execution.
    key = jax.random.PRNGKey(0)
    trainable, opt_state, losses, _ = fused(trainable, opt_state, key,
                                            data_stack, target_stack)
    first_losses = np.asarray(losses)[0]

    # Numerics cross-check (on unless TGGCN_BENCH_CROSSCHECK=0): the first
    # step's per-loss values through the kernel path must agree with the
    # plain-XLA path from the same initial state. Guards the headline number
    # against silently-wrong compiled kernels; tolerance covers bf16
    # recurrence noise (the kernels carry f32 VMEM state, XLA carries bf16 —
    # measured bounds in BASELINE.md round-3 verification).
    if crosscheck:
        model_xla = select_model(
            "2G-GCN", input_size=(2152, 2048), num_classes=(13, None),
            hidden_size=hidden, gcn_node=26,
            message_humans_to_human=True, message_human_to_objects=True,
            message_objects_to_human=True, message_objects_to_object=True,
            message_geometry_to_objects=True, message_segment=True,
            message_type="v2", message_granularity="v1",
            message_aggregation="att", attention_style="v3",
            discrete_optimization_strategy="gs",
            object_segment_update_strategy="ind",
            compute_dtype="bfloat16")
        from tggcn.train.loop import make_train_step

        step_xla = make_train_step(model_xla, feeder, criterion, optimizer)
        xla_trainable = {"model": params_check}
        # Same per-step RNG the fused scan's first microstep consumed (the
        # gs strategy draws Gumbel noise from it).
        k0 = jax.random.split(key, num_steps)[0]
        _, _, losses_xla, _ = step_xla(xla_trainable, optimizer.init(xla_trainable),
                                       k0, data, targets)
        losses_xla = np.asarray(losses_xla)
        dev = np.max(np.abs(first_losses - losses_xla)
                     / np.maximum(np.abs(losses_xla), 1e-3))
        assert dev < 0.05, (
            f"kernel-path first-step losses deviate {dev:.3%} from the XLA "
            f"path: {first_losses} vs {losses_xla}")

    # Best of 5 trials: remote-session jitter (tunnel load, host contention)
    # only ever slows a trial down, so the minimum is the cleanest estimate
    # of the device rate. Round-3 readings on this host ranged 407-437
    # clips/s under varying tunnel load with best-of-3; the extra trials
    # cost ~1 s and tighten the tail.
    #
    # Tunnel-independent device step time: time TWO chained fused windows
    # against one. The calls dispatch asynchronously and only the final
    # loss fetch synchronises, so the per-call fixed costs (remote-tunnel
    # round trip, host dispatch) are paid once in both measurements and
    # cancel in the difference — the marginal window is pure device time.
    # One- and two-window trials are INTERLEAVED and differenced pairwise so
    # both legs sample the same load regime (separately-run legs can take
    # their minima from different load regimes, biasing the marginal window).
    best_of = 5
    trials_one, trials_two = [], []
    for i in range(best_of):
        start = time.perf_counter()
        trainable, opt_state, losses, _ = fused(trainable, opt_state,
                                                jax.random.fold_in(key, i),
                                                data_stack, target_stack)
        np.asarray(losses)
        trials_one.append(time.perf_counter() - start)

        start = time.perf_counter()
        trainable, opt_state, _, _ = fused(trainable, opt_state,
                                           jax.random.fold_in(key, 100 + i),
                                           data_stack, target_stack)
        trainable, opt_state, losses, _ = fused(trainable, opt_state,
                                                jax.random.fold_in(key, 200 + i),
                                                data_stack, target_stack)
        np.asarray(losses)
        trials_two.append(time.perf_counter() - start)
    elapsed = min(trials_one)
    paired_diffs = sorted(two - one for one, two in zip(trials_one, trials_two))
    device_window = paired_diffs[len(paired_diffs) // 2]  # median pair
    # The difference is only meaningful when the marginal window is clearly
    # positive: a tunnel load spike during a one-window trial can make it
    # vanish (or go negative). Expected device share of a window on this
    # setup is >> 20%; below that, report null rather than a fabricated
    # device rate.
    window_valid = device_window > 0.2 * elapsed
    device_step_ms = (device_window / num_steps * 1e3) if window_valid else None

    clips_per_sec = num_steps * b / elapsed
    # The reference-CPU baseline was measured at the headline shape only;
    # tiny smoke mode must not report a ratio against it.
    vs_baseline = (clips_per_sec / REFERENCE_CPU_CLIPS_PER_SEC
                   if kernels and REFERENCE_CPU_CLIPS_PER_SEC else None)
    print(json.dumps({
        "metric": METRIC,
        "value": round(clips_per_sec, 3),
        "unit": UNIT,
        "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
        "device_step_ms": round(device_step_ms, 3) if window_valid else None,
        "device_clips_per_sec": (round(b / (device_window / num_steps), 1)
                                 if window_valid else None),
        "best_of": best_of,
        "trials_one_window_ms": [round(x * 1e3, 1) for x in trials_one],
        "trials_two_window_ms": [round(x * 1e3, 1) for x in trials_two],
    }))


if __name__ == "__main__":
    if "--child" in sys.argv:
        main()
    elif "--probe" in sys.argv:
        # Backend-liveness check only (shared by tools/run_tpu_queue.sh so
        # there is ONE probe contract): rc 0 = tunnel up, 1 = down.
        sys.exit(0 if _probe_backend() else 1)
    else:
        supervise()
