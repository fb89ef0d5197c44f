"""Device-trace one headline train step and rank the top HLO ops.

VERDICT r3 item 6: the ~19 ms headline step splits ~5.4 ms forward+loss /
~13 ms backward+optimizer (tools/bench_breakdown.py ablations), but the
backward tail was never attributed op-by-op. This captures a
jax.profiler device trace of the bench.py workload (B=8 T=167 h512 bf16 +
kernels, single unfused steps so forward/backward boundaries stay visible)
and converts the xplane via tensorboard_plugin_profile into an HLO-op time
ranking.

Usage: python tools/profile_step.py [--steps 3] [--out /tmp/profile_step.json]
       [--logdir /tmp/jaxprof]

If the remote-TPU backend does not support device tracing, the tool says so
explicitly (host-only trace => no TPU op table) instead of fabricating
numbers.
"""

import argparse
import glob
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_step(b=8, t=167, hidden=512, use_pallas=True):
    """The bench.py workload as a single (unfused) jitted train step."""
    import jax
    import optax

    from tggcn.config import Config
    from tggcn.data.loading import (select_model_data_feeder,
                                    select_model_data_fetcher)
    from tggcn.models import select_model
    from tggcn.train.loop import make_train_step
    from tggcn.train.losses import select_loss

    num_humans, num_objects = 2, 4
    model = select_model(
        "2G-GCN", input_size=(2152, 2048), num_classes=(13, None),
        hidden_size=hidden, gcn_node=26,
        message_humans_to_human=True, message_human_to_objects=True,
        message_objects_to_human=True, message_objects_to_object=True,
        message_geometry_to_objects=True, message_segment=True,
        message_type="v2", message_granularity="v1", message_aggregation="att",
        attention_style="v3", discrete_optimization_strategy="gs",
        object_segment_update_strategy="ind",
        compute_dtype="bfloat16", use_pallas_gru=use_pallas,
        use_pallas_segment_scan=use_pallas)
    params = model.init(jax.random.PRNGKey(0))
    optimizer = optax.adam(1e-4)
    cfg = Config({"misc": Config({})})
    criterion, _ = select_loss("2G-GCN", "multiple", "mphoi", cfg=cfg)
    feeder = select_model_data_feeder("2G-GCN", "multiple",
                                      dataset_name="mphoi",
                                      impose_segmentation_pattern=1)
    fetcher = select_model_data_fetcher("2G-GCN", "multiple",
                                        dataset_name="mphoi")
    rng = np.random.default_rng(0)
    x_human = rng.normal(size=(b, t, num_humans, 2152)).astype(np.float32)
    x_objects = rng.normal(size=(b, t, num_objects, 2048)).astype(np.float32)
    mask = np.ones((b, num_objects), dtype=np.float32)
    steps = np.full((b,), float(t), dtype=np.float32)
    x_hseg = np.ones((b, t, num_humans), dtype=np.float32)
    dummy = np.zeros((b, 1, 1, 1), dtype=np.float32)
    y_seg = rng.integers(0, 2, size=(b, t, num_humans)).astype(np.float32)
    y_rec = rng.integers(0, 13, size=(b, t, num_humans)).astype(np.int64)
    batch = jax.device_put([x_human, x_objects, mask, x_hseg, dummy, dummy,
                            dummy, steps, y_seg, y_seg, y_rec, y_rec, y_rec,
                            y_rec])
    data, targets = fetcher(batch)
    step = make_train_step(model, feeder, criterion, optimizer)
    trainable = {"model": params}
    opt_state = optimizer.init(trainable)
    return step, trainable, opt_state, data, targets


def summarize_xspace(logdir: str, allow_host_xla: bool = False):
    """HLO-op time table from the captured xplane (None if no device data).

    Parses the raw xplane proto directly (tensorflow.tsl.profiler.protobuf)
    because this environment's tensorboard_plugin_profile converter is
    broken (protobuf/pywrap version mismatch). Aggregates device-plane
    XEvent durations per op name; the result always includes the full
    plane/line inventory so one run is enough to adapt if the backend's
    trace layout differs.
    """
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xplanes = sorted(glob.glob(os.path.join(
        logdir, "plugins", "profile", "*", "*.xplane.pb")))
    if not xplanes:
        return None, "no xplane.pb captured"
    xs = xplane_pb2.XSpace()
    with open(xplanes[-1], "rb") as f:
        xs.ParseFromString(f.read())

    inventory = [{"plane": p.name,
                  "lines": [{"line": l.name, "events": len(l.events)}
                            for l in p.lines]}
                 for p in xs.planes]

    def is_device_plane(p):
        n = p.name.lower()
        return ("tpu" in n or "/device:" in n) and "host" not in n

    # Preferred: 'XLA Ops' lines on device planes (per-HLO-op events).
    # Fallback: the busiest line on any device plane.
    candidates = []
    for p in xs.planes:
        if not is_device_plane(p):
            continue
        for line in p.lines:
            score = (1 if "xla ops" in line.name.lower() else 0, len(line.events))
            candidates.append((score, p, line))
    if not candidates and allow_host_xla:
        # CPU-smoke fallback: the host plane's xla-cpu-codegen line carries
        # per-HLO-op events (wall time, not device time) — good enough to
        # validate the scope attribution against a real trace.
        for p in xs.planes:
            for line in p.lines:
                if "xla" in line.name.lower() and "codegen" in line.name.lower():
                    candidates.append(((0, len(line.events)), p, line))
    if not candidates:
        return {"inventory": inventory}, "no device plane in trace"
    candidates.sort(key=lambda c: c[0], reverse=True)
    _, plane, line = candidates[0]
    if not line.events:
        return {"inventory": inventory}, "device plane has no events"

    meta = plane.event_metadata
    stat_meta = plane.stat_metadata

    def event_strings(ev, md):
        """Every string attached to the event: op name, display name, and
        string-valued stats (the 'tf_op' stat carries the jax named_scope
        path, e.g. 'jit(step)/.../frame_msg_o2h/dot_general')."""
        out = [md.name, md.display_name]
        for stat in list(ev.stats) + list(md.stats):
            if stat.str_value:
                out.append(stat.str_value)
            elif stat.ref_value and stat.ref_value in stat_meta:
                out.append(stat_meta[stat.ref_value].name)
        return [s for s in out if s]

    # Model-block attribution via the jax.named_scope labels embedded in op
    # paths (models/tggcn.py, train/loop.py). Order matters: first match wins.
    scope_buckets = [("frame_msg_", "frame_messages"), ("head_", "heads"),
                     ("geo_gcn", "geo_gcn"), ("embed", "embed"),
                     ("frame_gru", "frame_gru"),
                     ("decision_human", "decisions"),
                     ("decision_object", "decisions"),
                     ("segment_scan", "segment_scan"), ("reorder", "reorder"),
                     ("losses", "losses"), ("adam", "adam")]

    agg = {}
    by_scope = {}
    t0, t1 = None, None
    for ev in line.events:
        md = meta[ev.metadata_id] if ev.metadata_id in meta else None
        name = md.name if md is not None else "?"
        d = agg.setdefault(name, {"total_ps": 0, "count": 0})
        d["total_ps"] += ev.duration_ps
        d["count"] += 1
        strings = event_strings(ev, md) if md is not None else []
        blob = " | ".join(strings)
        bucket = next((label for token, label in scope_buckets
                       if token in blob), "unattributed")
        # Backward ops carry a transpose(...) wrapper in the path (plain
        # jvp(...) appears in FORWARD paths under jax.grad too).
        if bucket != "unattributed" and "transpose(" in blob:
            bucket += "_bwd"
        s = by_scope.setdefault(bucket, {"total_ps": 0, "count": 0})
        s["total_ps"] += ev.duration_ps
        s["count"] += 1
        start = line.timestamp_ns * 1000 + ev.offset_ps
        end = start + ev.duration_ps
        t0 = start if t0 is None else min(t0, start)
        t1 = end if t1 is None else max(t1, end)
    total_ps = sum(d["total_ps"] for d in agg.values())
    ops = sorted(({"op": k, "total_us": v["total_ps"] / 1e6,
                   "count": v["count"],
                   "pct": 100.0 * v["total_ps"] / max(total_ps, 1)}
                  for k, v in agg.items()),
                 key=lambda r: -r["total_us"])
    scopes = sorted(({"scope": k, "total_us": v["total_ps"] / 1e6,
                      "count": v["count"],
                      "pct": 100.0 * v["total_ps"] / max(total_ps, 1)}
                     for k, v in by_scope.items()),
                    key=lambda r: -r["total_us"])
    return {"plane": plane.name, "line": line.name,
            "busy_us": total_ps / 1e6,
            "span_us": (t1 - t0) / 1e6 if t0 is not None else None,
            "ops": ops, "by_scope": scopes, "inventory": inventory}, None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--logdir", default="/tmp/jaxprof")
    ap.add_argument("--out", default="/tmp/profile_step.json")
    ap.add_argument("--top", type=int, default=25)
    # Tiny-shape overrides for smoke-testing the capture->parse pipeline on
    # hosts where the headline shape is infeasible (1-core CPU).
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--t", type=int, default=167)
    ap.add_argument("--hidden", type=int, default=512)
    ap.add_argument("--platform", default=None, choices=["cpu"],
                    help="Force the CPU backend (the ambient env registers a "
                         "remote-TPU backend programmatically, so the env "
                         "var alone is not enough).")
    args = ap.parse_args()

    if args.platform == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    print(f"# devices: {jax.devices()}", flush=True)
    step, trainable, opt_state, data, targets = build_step(
        b=args.batch, t=args.t, hidden=args.hidden,
        use_pallas=args.platform != "cpu")
    key = jax.random.PRNGKey(0)
    # Warmup (compile) outside the trace.
    trainable, opt_state, losses, _ = step(trainable, opt_state, key, data,
                                           targets)
    np.asarray(losses)
    print("# warmup done, tracing", flush=True)
    jax.profiler.start_trace(args.logdir)
    for i in range(args.steps):
        trainable, opt_state, losses, _ = step(
            trainable, opt_state, jax.random.fold_in(key, i), data, targets)
    np.asarray(losses)
    jax.profiler.stop_trace()
    print("# trace stopped, converting", flush=True)

    table, err = summarize_xspace(args.logdir,
                                  allow_host_xla=args.platform == "cpu")
    result = {"steps": args.steps, "error": err}
    if table is not None:
        result.update({k: v for k, v in table.items() if k != "ops"})
        if "ops" in table:
            result["top_ops"] = table["ops"][:args.top]
            per_step = table["busy_us"] / args.steps / 1e3
            print(f"# device busy: {table['busy_us']/1e3:.2f} ms over "
                  f"{args.steps} steps = {per_step:.2f} ms/step")
            for r in table.get("by_scope", []):
                print(f"  scope {r['pct']:5.1f}%  "
                      f"{r['total_us']/args.steps:9.1f} us/step  "
                      f"x{r['count']:<5d} {r['scope']}")
            for r in result["top_ops"]:
                print(f"  {r['pct']:5.1f}%  {r['total_us']/args.steps:9.1f} "
                      f"us/step  x{r['count']:<5d} {r['op'][:110]}")
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"# wrote {args.out}")
    print("PROFILE-DONE" if err is None else f"PROFILE-NODATA: {err}",
          flush=True)


if __name__ == "__main__":
    main()
