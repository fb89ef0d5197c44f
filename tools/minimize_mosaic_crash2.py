"""Phase 2 of the Mosaic SIGABRT minimization: full-model bisect.

Phase 1 (tools/minimize_mosaic_crash.py) showed the segment kernel compiles
clean IN ISOLATION at the crash fixture's exact shapes (O=3, scale=1.0, both
directions, fwd+grad). So the crash lives in the full-model composition.
This tool compiles the full TGGCN forward (random init, fixture shapes,
jit, fetch one output) across kernel-toggle and config ablations, one
factor at a time, recording ok/fail per case.

Usage: python tools/minimize_mosaic_crash2.py [--cases a,b,c]
"""

import argparse
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "minimize_mosaic_crash2_out.json")

CRASH_KW = dict(
    input_size=(2152, 2048), hidden_size=24, gcn_node=26,
    message_humans_to_human=True, message_segment=True, message_type="v2",
    message_granularity="v1", message_aggregation="att", attention_style="v2",
    discrete_optimization_strategy="st", object_segment_update_strategy="ind",
    num_classes=(13, None), add_time_position=True, time_position_strategy="u",
    positional_encoding_style="p", share_level_mlps=True)

ALL3 = dict(use_pallas_geo_gcn=True, use_pallas_gru=True,
            use_pallas_segment_scan=True)


def run_case(name, cfg_over, kernels, no=3):
    import jax
    import jax.numpy as jnp

    from tggcn.models.tggcn import TGGCNConfig, apply_tggcn, init_tggcn

    kw = dict(CRASH_KW)
    kw.update(cfg_over)
    kw.update(kernels)
    cfg = TGGCNConfig.from_kwargs(**kw)
    b, t, nh = 2, 6, 2
    rng = np.random.default_rng(0)
    inputs = dict(
        x_human=jnp.asarray(rng.normal(size=(b, t, nh, kw["input_size"][0])),
                            jnp.float32),
        x_objects=jnp.asarray(rng.normal(size=(b, t, no, kw["input_size"][1])),
                              jnp.float32),
        objects_mask=jnp.asarray(
            np.concatenate([np.ones((b, no - 1)), [[0.0], [1.0]]], axis=1),
            jnp.float32),
        steps_per_example=jnp.asarray([t - 2, t], jnp.float32),
    )
    try:
        params = init_tggcn(jax.random.PRNGKey(0), cfg)
        fn = jax.jit(lambda p: apply_tggcn(p, cfg, train=False,
                                           rng=jax.random.PRNGKey(0),
                                           **inputs)[0])
        out = fn(params)
        val = float(np.asarray(out[-1], np.float64).sum())
        return {"case": name, "status": "ok", "val": val}
    except Exception as e:  # noqa: BLE001 — record and continue
        return {"case": name, "status": f"{type(e).__name__}: {str(e)[:200]}"}


CASES = {
    "repro_all3": ({}, ALL3, 3),
    "seg_only": ({}, dict(use_pallas_segment_scan=True), 3),
    "gru_only": ({}, dict(use_pallas_gru=True), 3),
    "geo_only": ({}, dict(use_pallas_geo_gcn=True), 3),
    "no_kernels": ({}, {}, 3),
    "all3_no_share": (dict(share_level_mlps=False), ALL3, 3),
    "all3_no_timepos": (dict(add_time_position=False), ALL3, 3),
    "all3_style_e": (dict(positional_encoding_style="e"), ALL3, 3),
    "all3_strategy_s": (dict(time_position_strategy="s"), ALL3, 3),
    "all3_o4": ({}, ALL3, 4),
    "all3_v3": (dict(attention_style="v3"), ALL3, 3),
    # Round-4 finding: the KERNEL path compiles clean (repro_all3 ok on
    # fresh caches) while the PURE-XLA program SIGABRTs the compile helper
    # deterministically — the crash lives in XLA, not Mosaic. These ablate
    # the crash config's features with kernels OFF to find the XLA trigger.
    "nok_no_share": (dict(share_level_mlps=False), {}, 3),
    "nok_no_timepos": (dict(add_time_position=False), {}, 3),
    "nok_style_e": (dict(positional_encoding_style="e"), {}, 3),
    "nok_strategy_s": (dict(time_position_strategy="s"), {}, 3),
    "nok_v3": (dict(attention_style="v3"), {}, 3),
    "nok_st_only": (dict(add_time_position=False, share_level_mlps=False), {}, 3),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", default=None)
    ap.add_argument("--one", default=None, help="run ONE case in-process")
    ap.add_argument("--repeat", type=int, default=1,
                    help="run each case N times (determinism probe)")
    ap.add_argument("--fresh-cache", action="store_true",
                    help="unique JAX_COMPILATION_CACHE_DIR per subprocess so "
                         "every run does a real remote compile (an 'ok' from "
                         "a shared cache may be a cache hit, not a compile)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if args.one:
        import jax
        print(f"# platform={jax.devices()[0].platform}", flush=True)
        print(json.dumps(run_case(args.one, *CASES[args.one])), flush=True)
        return
    # One SUBPROCESS per case: a Mosaic compile SIGABRT kills the remote TPU
    # backend for the whole process (observed: every later jnp op fails with
    # FAILED_PRECONDITION), so cases must not share a process.
    import subprocess

    names = args.cases.split(",") if args.cases else list(CASES)
    rows = []
    out_path = args.out or OUT
    for rep in range(args.repeat):
        for name in names:
            env = dict(os.environ)
            if args.fresh_cache:
                env["JAX_COMPILATION_CACHE_DIR"] = (
                    f"/tmp/jaxcache_probe_{name}_{rep}")
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--one", name],
                capture_output=True, text=True, timeout=3000, env=env)
            row = None
            for line in proc.stdout.splitlines():
                if line.startswith("{"):
                    row = json.loads(line)
            if row is None:
                row = {"case": name,
                       "status": f"subprocess rc={proc.returncode}: "
                                 f"{proc.stderr[-300:]}"}
            row["rep"] = rep
            row["fresh_cache"] = bool(args.fresh_cache)
            rows.append(row)
            print(json.dumps(row), flush=True)
            with open(out_path, "w") as f:
                json.dump(rows, f, indent=1)
    print(f"# wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
