"""Honest step-time breakdown + MFU for the headline MPHOI train step.

bench.py reports the device-only fused-scan number (a kernel throughput).
This tool separates the three levels a user actually experiences:

  1. fused_device_only   - K steps in ONE jit (lax.scan over HBM-resident
                           microbatches); pure device throughput.
  2. per_step_dispatch   - one jit call per step, data already on device;
                           adds host dispatch latency (large on remote-TPU
                           tunnels, small on directly-attached chips).
  3. e2e_with_pipeline   - the train.py path: host batch -> fetch -> prefetch
                           (device_put) -> per-step jit; adds the input
                           pipeline.

Plus an MFU estimate from XLA's compiled cost analysis: the model is
recurrence-dominated (thousands of small (B*E, h) x (h, 3h) matmuls), so low
MFU is expected and the number documents how far the workload sits from the
MXU roofline rather than a defect.

Usage: python tools/bench_breakdown.py [--steps 20] [--t 167]
         [--compute_dtype float32|bfloat16] [--json]
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Peak MXU throughput used for the MFU denominator. TPU v5e: 197 TFLOP/s
# (bf16); XLA runs f32 matmuls on the same MXU via multi-pass passthrough,
# so the bf16 peak is the consistent roofline for both dtypes.
PEAK_FLOPS = 197e12


def build(args):
    import jax
    import optax

    from tggcn.config import Config
    from tggcn.data.loading import select_model_data_feeder, select_model_data_fetcher
    from tggcn.models import select_model
    from tggcn.train.losses import select_loss

    b, t, num_humans, num_objects = args.batch, args.t, 2, 4
    frame_msgs = args.ablate != "no_frame_messages"
    model = select_model(
        "2G-GCN", input_size=(2152, 2048), num_classes=(13, None),
        hidden_size=args.hidden, gcn_node=26,
        message_humans_to_human=frame_msgs, message_human_to_objects=frame_msgs,
        message_objects_to_human=frame_msgs, message_objects_to_object=frame_msgs,
        message_geometry_to_objects=frame_msgs,
        message_segment=args.ablate != "no_segment_messages",
        message_type="v2", message_granularity="v1", message_aggregation="att",
        attention_style="v3", discrete_optimization_strategy="gs",
        object_segment_update_strategy="ind", compute_dtype=args.compute_dtype,
        use_pallas_gru=args.use_pallas_gru, scan_unroll=args.scan_unroll,
        use_pallas_segment_scan=args.use_pallas_segment_scan,
        use_pallas_geo_gcn=args.use_pallas_geo_gcn,
        remat_segment_scan=not args.no_remat,
        segment_remat_policy=args.remat_policy,
        segment_fuse_directions=not args.no_fuse_directions,
        gru_fuse_directions=not args.no_fuse_directions)
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
    host_batch = [x_human, x_objects, mask, x_hseg, dummy, dummy, dummy, steps,
                  y_seg, y_seg, y_rec, y_rec, y_rec, y_rec]
    return model, params, optimizer, criterion, feeder, fetcher, host_batch


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=20)
    parser.add_argument("--t", type=int, default=167)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--hidden", type=int, default=512)
    parser.add_argument("--compute_dtype", default="float32")
    parser.add_argument("--use_pallas_gru", action="store_true")
    parser.add_argument("--scan_unroll", type=int, default=4)
    parser.add_argument("--use_pallas_segment_scan", action="store_true")
    parser.add_argument("--remat_policy", default="full", choices=["full", "dots"])
    parser.add_argument("--use_pallas_geo_gcn", action="store_true")
    parser.add_argument("--no_fuse_directions", action="store_true",
                        help="Per-direction segment-kernel launches "
                             "(round-2 behaviour).")
    parser.add_argument("--no_remat", action="store_true",
                        help="Store segment-scan residuals instead of remat.")
    parser.add_argument("--ablate", default="none",
                        choices=["none", "no_segment_messages",
                                 "no_frame_messages", "forward_only",
                                 "grad_only"],
                        help="Timing ablations: drop segment messages, drop "
                             "all five frame-level messages (the step-time "
                             "delta vs 'none' bounds the frame-message "
                             "block's fwd+bwd cost — slightly over, since "
                             "the decision/segment-input MLPs also narrow; "
                             "trace-independent attribution complementing "
                             "tools/profile_step.py), time forward+loss "
                             "only (no grad/Adam), or forward+backward "
                             "without the optimizer update (isolates "
                             "Adam's share of the step).")
    parser.add_argument("--json", action="store_true")
    parser.add_argument("--platform", default=None, choices=["cpu"],
                        help="Force the CPU backend for tiny-shape smokes "
                             "(the ambient env registers a remote-TPU "
                             "backend programmatically; numbers on CPU are "
                             "NOT performance data).")
    args = parser.parse_args()

    if args.platform == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    import jax.numpy as jnp

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from tggcn.train.loop import make_fused_train_steps, make_train_step

    model, params, optimizer, criterion, feeder, fetcher, host_batch = build(args)
    k = args.steps
    b = args.batch
    key = jax.random.PRNGKey(0)

    def sync(x):
        return np.asarray(jax.tree_util.tree_leaves(x)[0])

    results = {}

    # ---- 1. fused device-only -------------------------------------------
    dev_batch = jax.device_put(host_batch)
    data, targets = fetcher(dev_batch)
    stack = lambda a: jnp.broadcast_to(a[None], (k,) + a.shape)
    data_stack = jax.tree_util.tree_map(stack, data)
    target_stack = jax.tree_util.tree_map(stack, targets)
    if args.ablate == "forward_only":
        import jax

        def fwd_loss(params_, rng_, data_, targets_):
            def one(carry, inp):
                key, d, tg = inp
                outputs, _aux = model.apply(params_, train=True, rng=key,
                                            **feeder(d))
                losses = criterion(outputs, tg, reduction="mean")
                return carry, sum(losses)

            _, losses = jax.lax.scan(one, 0.0, (jax.random.split(rng_, k),
                                                data_, targets_))
            return losses

        fwd_jit = jax.jit(fwd_loss)
        losses = fwd_jit(params, key, data_stack, target_stack)
        sync(losses)
        best = float("inf")
        for i in range(3):
            start = time.perf_counter()
            losses = fwd_jit(params, jax.random.fold_in(key, i),
                             data_stack, target_stack)
            sync(losses)
            best = min(best, time.perf_counter() - start)
        print(json.dumps({"forward_only_step_ms": best / k * 1000,
                          "forward_only_clips_per_sec": k * b / best,
                          "config": vars(args)}))
        return

    if args.ablate == "grad_only":
        def grad_steps(params_, rng_, data_, targets_):
            def loss_of(p, key_, d, tg):
                outputs, _aux = model.apply(p, train=True, rng=key_,
                                            **feeder(d))
                return sum(criterion(outputs, tg, reduction="mean"))

            def one(carry, inp):
                key_, d, tg = inp
                l, grads = jax.value_and_grad(loss_of)(params_, key_, d, tg)
                # Fold every grad leaf into the carried scalar so the
                # backward cannot be dead-coded, while the params (and
                # therefore the compiled program) stay step-invariant.
                gsum = sum(jnp.sum(g_.astype(jnp.float32))
                           for g_ in jax.tree_util.tree_leaves(grads))
                return carry + gsum, l

            return jax.lax.scan(one, jnp.float32(0.0),
                                (jax.random.split(rng_, k), data_, targets_))

        grad_jit = jax.jit(grad_steps)
        acc, losses = grad_jit(params, key, data_stack, target_stack)
        sync(losses)
        best = float("inf")
        for i in range(3):
            start = time.perf_counter()
            acc, losses = grad_jit(params, jax.random.fold_in(key, i),
                                   data_stack, target_stack)
            sync(losses)
            best = min(best, time.perf_counter() - start)
        print(json.dumps({"grad_only_step_ms": best / k * 1000,
                          "grad_only_clips_per_sec": k * b / best,
                          "config": vars(args)}))
        return

    fused = make_fused_train_steps(model, feeder, criterion, optimizer, mtll=None)
    trainable = {"model": params}
    opt_state = optimizer.init(trainable)
    trainable, opt_state, losses, _ = fused(trainable, opt_state, key,
                                            data_stack, target_stack)
    sync(losses)
    best = float("inf")
    for i in range(3):
        start = time.perf_counter()
        trainable, opt_state, losses, _ = fused(trainable, opt_state,
                                                jax.random.fold_in(key, i),
                                                data_stack, target_stack)
        sync(losses)
        best = min(best, time.perf_counter() - start)
    results["fused_device_only_clips_per_sec"] = k * b / best
    results["fused_device_only_step_ms"] = best / k * 1000

    # ---- 2. per-step dispatch, device-resident data ----------------------
    step_fn = make_train_step(model, feeder, criterion, optimizer)
    trainable = {"model": model.init(jax.random.PRNGKey(0))}
    opt_state = optimizer.init(trainable)
    trainable, opt_state, losses, _ = step_fn(trainable, opt_state, key,
                                              data, targets)
    sync(losses)
    start = time.perf_counter()
    for i in range(k):
        trainable, opt_state, losses, _ = step_fn(
            trainable, opt_state, jax.random.fold_in(key, i), data, targets)
    sync(losses)  # one sync at the end: dispatch pipelines like train.py
    elapsed = time.perf_counter() - start
    results["per_step_dispatch_clips_per_sec"] = k * b / elapsed
    results["per_step_dispatch_step_ms"] = elapsed / k * 1000

    # ---- 3. end-to-end with the input pipeline ---------------------------
    from tggcn.train.loop import device_batch_iterator

    loader = [list(host_batch) for _ in range(k)]
    trainable = {"model": model.init(jax.random.PRNGKey(0))}
    opt_state = optimizer.init(trainable)
    start = time.perf_counter()
    i = 0
    for dev in device_batch_iterator(loader, batch_size=b, num_inputs=8):
        d, tg = fetcher(dev)
        trainable, opt_state, losses, _ = step_fn(
            trainable, opt_state, jax.random.fold_in(key, i), d, tg)
        i += 1
    sync(losses)
    elapsed = time.perf_counter() - start
    results["e2e_with_pipeline_clips_per_sec"] = k * b / elapsed
    results["e2e_with_pipeline_step_ms"] = elapsed / k * 1000

    # ---- MFU from XLA cost analysis ---------------------------------------
    try:
        compiled = step_fn.lower(trainable, opt_state, key, data, targets).compile()
        cost = compiled.cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        flops = float(cost.get("flops", 0.0))
        results["step_flops"] = flops
        results["mfu_pct_fused"] = (
            flops / (results["fused_device_only_step_ms"] / 1000) / PEAK_FLOPS * 100)
    except Exception as e:  # cost analysis is backend-dependent
        results["step_flops"] = None
        results["mfu_note"] = f"cost_analysis unavailable: {e}"

    results["config"] = {"steps": k, "batch": b, "t": args.t,
                         "compute_dtype": args.compute_dtype,
                         "use_pallas_gru": args.use_pallas_gru,
                         "use_pallas_segment_scan": args.use_pallas_segment_scan,
                         "ablate": args.ablate, "no_remat": args.no_remat,
                         "device": str(jax.devices()[0])}
    if args.json:
        print(json.dumps(results))
    else:
        for key_, val in results.items():
            print(f"{key_}: {val}")


if __name__ == "__main__":
    main()
