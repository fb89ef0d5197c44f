"""Per-attention-mode segment-scan step times: Pallas kernel vs XLA fast path.

Times ONE segment-scan training step (forward + backward via each path's
VJP) at the headline shape (B=8, T=167, hidden 512, bf16) for every kernel
attention mode: dot (v3, hand-written Pallas VJP), v1 (concat), v4
(bilinear), dist (external inverse-distance weights), mp (mean pooling).
Records the speedup each configuration's users get from
use_pallas_segment_scan (VERDICT r2 item 6).

--forward_only times the inference path instead (no VJP): the serving
regime where the widened modes' recompute backward never runs (VERDICT r3
item 3). Combine with --batch 1 --t 128 for the streaming window shape.

Usage: python tools/bench_segment_modes.py [--hidden 512] [--t 167]
       python tools/bench_segment_modes.py --forward_only [--batch 1 --t 128]
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
    ap.add_argument("--hidden", type=int, default=512)
    ap.add_argument("--t", type=int, default=167)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--modes", default="dot,v1,v4,dist,mp")
    ap.add_argument("--forward_only", action="store_true",
                    help="time inference (no grad) instead of a train step")
    ap.add_argument("--chain", type=int, default=20,
                    help="forward-only: dispatches per timed window (async "
                         "executions queue in order on the device, so the "
                         "remote-tunnel round trip amortises over the chain "
                         "and one fetch of the last result syncs them all)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tggcn.models.tggcn import (TGGCNConfig, _human_segment_input_size,
                                    _object_segment_input_size,
                                    _segment_scan_fast, init_tggcn)
    from tggcn.ops import segment_scan_pallas as ssp

    b, t, h = args.batch, args.t, args.hidden
    nh, no = 2, 4
    dtype = jnp.dtype(args.dtype)

    def cfg_for(mode):
        style = {"dot": "v3", "v1": "v1", "v4": "v4",
                 "dist": "v3", "mp": "v3"}[mode]
        agg = "mp" if mode == "mp" else "att"
        return TGGCNConfig(
            input_size=(2152, 2048), num_classes=(13, None), hidden_size=h,
            gcn_node=26, message_humans_to_human=True,
            message_human_to_objects=True, message_objects_to_human=True,
            message_objects_to_object=True, message_geometry_to_objects=True,
            message_segment=True, message_type="v2", message_granularity="v1",
            message_aggregation=agg, attention_style=style,
            discrete_optimization_strategy="st",
            object_segment_update_strategy="ind", compute_dtype=args.dtype)

    rng = np.random.default_rng(0)
    results = {}
    for mode in args.modes.split(","):
        cfg = cfg_for(mode)
        params = init_tggcn(jax.random.PRNGKey(0), cfg)
        seg_params = {k: params[k] for k in ssp.SEG_PARAM_KEYS}
        seg_params = jax.tree_util.tree_map(lambda a: a.astype(dtype), seg_params)
        base_h = _human_segment_input_size(cfg) - 2 * h
        base_o = _object_segment_input_size(cfg) - 2 * h
        x_hs = jnp.asarray(rng.normal(size=(b, t, nh, base_h)) * 0.3, dtype)
        x_os = jnp.asarray(rng.normal(size=(b, t, no, base_o)) * 0.3, dtype)
        u_h = jnp.asarray(rng.uniform(size=(b, t, nh)) > 0.5, dtype)
        u_o = jnp.asarray(rng.uniform(size=(b, t, no)) > 0.5, dtype)
        mask = jnp.asarray(np.ones((b, no), np.float32), dtype)
        if mode == "dist":
            dists3 = tuple(jnp.asarray(rng.uniform(0.05, 2.0, s), dtype) for s in
                           [(b, t, nh, nh), (b, t, nh, no), (b, t, no, no)])
        else:
            dists3 = (None, None, None)
        assert ssp.pallas_segment_mode(cfg, dists3) is not None, mode

        def loss_kernel(sp):
            out = ssp.run_segment_scan_pallas({**params, **sp}, cfg, x_hs,
                                              x_os, u_h, u_o, mask,
                                              dists3=dists3)
            return sum(jnp.sum(o.astype(jnp.float32) ** 2) for o in out[:2])

        def loss_xla(sp):
            out = _segment_scan_fast({**params, **sp}, cfg, x_hs, x_os,
                                     u_h, u_o, mask, *dists3)
            return sum(jnp.sum(o.astype(jnp.float32) ** 2) for o in out[:2])

        row = {"forward_only": bool(args.forward_only)}
        for name, fn in [("kernel", loss_kernel), ("xla", loss_xla)]:
            if args.forward_only:
                g = jax.jit(fn)
                fetch = lambda r: np.asarray(r)
            else:
                g = jax.jit(jax.value_and_grad(fn))
                fetch = lambda r: np.asarray(r[0])
            chain = max(args.chain, 1) if args.forward_only else 1
            fetch(g(seg_params))          # compile + warm
            best = float("inf")
            for _ in range(5):
                t0 = time.perf_counter()
                last = None
                for _k in range(chain):
                    last = g(seg_params)
                fetch(last)
                best = min(best, (time.perf_counter() - t0) / chain)
            row[name] = round(best * 1000, 3)
        row["speedup"] = round(row["xla"] / row["kernel"], 3)
        results[mode] = row
        print(json.dumps({mode: row}), flush=True)
    print(json.dumps({"all": results}), flush=True)


if __name__ == "__main__":
    main()
