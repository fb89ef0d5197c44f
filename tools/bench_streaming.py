"""Streaming-inference benchmark (BASELINE.json config #5).

Long untrimmed video processed by the sliding-window streaming path
(tggcn/models/streaming.py) on one TPU chip; reports frames/sec of
end-to-end labelled output.

Usage: python tools/bench_streaming.py [--frames 2048] [--window 128] [--lookahead 32]
"""

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--frames", type=int, default=2048)
    parser.add_argument("--window", type=int, default=128)
    parser.add_argument("--lookahead", type=int, default=32)
    parser.add_argument("--hidden", type=int, default=512)
    parser.add_argument("--fuse_group", type=int, default=16,
                        help="Interior windows fused per device dispatch "
                             "(1 = the per-window path).")
    parser.add_argument("--compute_dtype", default="float32")
    parser.add_argument("--use_pallas_gru", action="store_true")
    parser.add_argument("--use_pallas_segment_scan", action="store_true")
    parser.add_argument("--attention_style", default="v3",
                        choices=["v1", "v2", "v3", "v4"])
    parser.add_argument("--segment_kernel_modes", default="auto",
                        choices=["auto", "all"],
                        help="Which attention modes route through the "
                             "segment kernel ('auto' = training-justified "
                             "dot only; 'all' for the serving A/B once the "
                             "forward-only mode matrix lands).")
    parser.add_argument("--fuse_directions", action="store_true",
                        help="Force direction-FUSED kernel launches (the "
                             "runner defaults to per-direction at B=1 — "
                             "measured faster; this flag re-A/Bs).")
    args = parser.parse_args()

    import jax

    from tggcn.models.streaming import StreamingRunner
    from tggcn.models.tggcn import TGGCNConfig, init_tggcn

    cfg = TGGCNConfig(
        input_size=(2152, 2048), num_classes=(13, None), hidden_size=args.hidden,
        gcn_node=26, message_humans_to_human=True, message_human_to_objects=True,
        message_objects_to_human=True, message_objects_to_object=True,
        message_geometry_to_objects=True, message_segment=True,
        message_type="v2", message_granularity="v1", message_aggregation="att",
        attention_style=args.attention_style,
        discrete_optimization_strategy="st",
        object_segment_update_strategy="ind", geometry_flatten="per_frame",
        compute_dtype=args.compute_dtype, use_pallas_gru=args.use_pallas_gru,
        use_pallas_segment_scan=args.use_pallas_segment_scan,
        segment_kernel_modes=args.segment_kernel_modes)
    params = init_tggcn(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    t, num_humans, num_objects = args.frames, 2, 4
    x_human = rng.normal(size=(1, t, num_humans, 2152)).astype(np.float32)
    x_objects = rng.normal(size=(1, t, num_objects, 2048)).astype(np.float32)
    mask = np.ones((1, num_objects), np.float32)

    runner = StreamingRunner(params, cfg, window=args.window,
                             lookahead=args.lookahead, fuse_group=args.fuse_group,
                             fuse_directions=args.fuse_directions or None)
    # Warm up on the FULL stream (compiles the fused window-group program(s)
    # and the final-chunk program; a short warmup would miss the fused path).
    runner.run(x_human, x_objects, mask)

    def best_of(fn, trials=3):
        best = float("inf")
        for _ in range(trials):
            start = time.perf_counter()
            outputs = fn()
            _ = np.asarray(outputs[-1])
            best = min(best, time.perf_counter() - start)
        return best

    # End-to-end: includes the host->device ingest of the raw stream (~50 KB
    # per frame), which dominates on this remote-TPU tunnel (~15-35 MB/s).
    e2e = best_of(lambda: runner.run(x_human, x_objects, mask))
    # Steady-state: the stream already device-resident (the realistic serving
    # regime — frames arrive incrementally, ingest overlaps compute).
    xh_d = jax.device_put(x_human)
    xo_d = jax.device_put(x_objects)
    _ = np.asarray(xh_d[0, 0, 0, :8])  # sync the transfer
    steady = best_of(lambda: runner.run(xh_d, xo_d, mask))
    print(f"streaming: {t} frames; e2e (incl. ingest) {e2e:.2f}s -> "
          f"{t / e2e:.1f} frames/s; device-resident {steady:.2f}s -> "
          f"{t / steady:.1f} frames/s (window {args.window}, lookahead "
          f"{args.lookahead}, fuse_group {args.fuse_group}, latency/window "
          f"{steady / (t / args.window) * 1000:.1f} ms)")


if __name__ == "__main__":
    main()
