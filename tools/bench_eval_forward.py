"""Full-model forward-only (eval) throughput at the evaluation batch shape.

The reference evaluates at batch_size=128 (reference predict.py:34); this
times the FULL 2G-GCN forward pass at that shape and A/Bs the round-5
forward-only kernel routing: segment_kernel_modes='auto' as the training
step resolves it (dot-only in-kernel) vs 'all' (every applicable attention
mode in-kernel — the resolution the eval engine and StreamingRunner apply,
tggcn/models/registry.py resolve_forward_only_kernel_routing). For dot
attention both legs compile the same program; pass a non-dot
--attention_style (v1/v4) to measure the routing delta the new default
actually buys at eval shape.

Each leg runs in-process (the programs are independent; a compile failure
surfaces as the script's error, matching eval-engine behaviour where
FirstCallGuard would downgrade). Timing follows bench.py's convention:
chain N async dispatches, fetch the last output to sync, best-of-k.

Usage: python tools/bench_eval_forward.py [--batch 128] [--t 167]
           [--attention_style v1] [--modes auto,all]
"""
import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--t", type=int, default=167)
    ap.add_argument("--hidden", type=int, default=512)
    ap.add_argument("--attention_style", default="v1",
                    help="v1/v4 isolate the routing delta; v3 (dot) legs "
                         "compile identical programs")
    ap.add_argument("--compute_dtype", default="bfloat16")
    ap.add_argument("--modes", default="auto,all",
                    help="comma list of segment_kernel_modes legs to time")
    ap.add_argument("--chain", type=int, default=10)
    ap.add_argument("--trials", type=int, default=5)
    args = ap.parse_args()

    import jax

    from tggcn.models.tggcn import TGGCNConfig, apply_tggcn, init_tggcn

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}", file=sys.stderr)

    rng = np.random.default_rng(0)
    b, t = args.batch, args.t
    num_humans, num_objects = 2, 4
    x_human = rng.normal(size=(b, t, num_humans, 2152)).astype(np.float32)
    x_objects = rng.normal(size=(b, t, num_objects, 2048)).astype(np.float32)
    mask = np.ones((b, num_objects), np.float32)
    steps = np.full((b,), float(t), np.float32)

    results = {}
    for modes in args.modes.split(","):
        cfg = TGGCNConfig(
            input_size=(2152, 2048), num_classes=(13, None),
            hidden_size=args.hidden, gcn_node=26,
            message_humans_to_human=True, message_human_to_objects=True,
            message_objects_to_human=True, message_objects_to_object=True,
            message_geometry_to_objects=True, message_segment=True,
            message_type="v2", message_granularity="v1",
            message_aggregation="att", attention_style=args.attention_style,
            discrete_optimization_strategy="st",
            object_segment_update_strategy="ind",
            geometry_flatten="per_frame", compute_dtype=args.compute_dtype,
            use_pallas_gru=True, use_pallas_segment_scan=True,
            segment_kernel_modes=modes)
        params = init_tggcn(jax.random.PRNGKey(0), cfg)

        @jax.jit
        def fwd(params, x_human, x_objects, mask, steps):
            outputs, _ = apply_tggcn(params, cfg, x_human, x_objects, mask,
                                     steps_per_example=steps, train=False,
                                     rng=jax.random.PRNGKey(42))
            return outputs[0]

        d_args = jax.device_put((params, x_human, x_objects, mask, steps))
        t0 = time.perf_counter()
        np.asarray(fwd(*d_args))  # compile + run
        compile_s = time.perf_counter() - t0

        best = float("inf")
        for _ in range(args.trials):
            t0 = time.perf_counter()
            out = None
            for _ in range(args.chain):
                out = fwd(*d_args)
            np.asarray(out)  # one fetch syncs the chained executions
            ms = (time.perf_counter() - t0) * 1000 / args.chain
            best = min(best, ms)
        results[modes] = {"forward_ms": round(best, 3),
                          "clips_per_sec": round(b / (best / 1000), 1),
                          "compile_s": round(compile_s, 1)}
        print(json.dumps({modes: results[modes]}), flush=True)

    legs = list(results)
    if len(legs) == 2:
        a, b_ = legs
        results["speedup"] = round(results[a]["forward_ms"]
                                   / results[b_]["forward_ms"], 3)
    print(json.dumps({"eval_forward": results,
                      "config": {"batch": args.batch, "t": args.t,
                                 "hidden": args.hidden,
                                 "attention_style": args.attention_style,
                                 "compute_dtype": args.compute_dtype,
                                 "device": str(dev)}}))


if __name__ == "__main__":
    main()
