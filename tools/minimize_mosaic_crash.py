"""Minimize the Mosaic SIGABRT seen on the mphoi_dot_u_periodic_shared fixture.

Round-3 record (tools/verify_tpu_parity_out.json part_a): the fixture's full
forward crashes the remote Mosaic compile (tpu_compile_helper SIGABRT) with
the kernels on, deterministically (3 retries). The fixture is the only one
that routes the DOT segment kernel with num_objects=3 and attention_style=v2
(scale=1.0); every passing kernel fixture is v3 (scaled) with num_objects=4.

This tool compiles the segment kernel DIRECTLY at a matrix of tiny variants
(one factor changed at a time) to isolate the trigger. The remote compile
failure raises a catchable JaxRuntimeError, so all cases run in one process.

Usage: python tools/minimize_mosaic_crash.py [--cases name1,name2]
"""

import argparse
import json
import math
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "minimize_mosaic_crash_out.json")


def run_case(name, *, t=6, b=2, nh=2, no=3, hd=24, scale=1.0, reverse=False,
             dtype="float32", grad=False):
    import jax
    import jax.numpy as jnp

    from tggcn.ops import segment_scan_pallas as ssp

    dt = jnp.dtype(dtype)
    rng = np.random.default_rng(0)
    g3 = 3 * hd
    mk = lambda *s: jnp.asarray(rng.normal(size=s) * 0.3, dt)
    gi_h, gi_o = mk(t, b, nh, g3), mk(t, b, no, g3)
    u_h = jnp.asarray(rng.uniform(size=(t, b, nh)) > 0.5, dt)
    u_o = jnp.asarray(rng.uniform(size=(t, b, no)) > 0.5, dt)
    w_from, b_from = mk(4, hd, hd), mk(4, hd)
    w_msg_h, w_msg_o = mk(2 * hd, g3), mk(2 * hd, g3)
    w_hh_h, w_hh_o = mk(hd, g3), mk(hd, g3)
    b_hh_h, b_hh_o = mk(g3), mk(g3)
    mask_hh = 1.0 - jnp.eye(nh, dtype=dt)
    mask_obj = jnp.ones((b, no), dt)
    eye_oo = 1.0 - jnp.eye(no, dtype=dt)
    h0_h, h0_o = mk(b, nh, hd), mk(b, no, hd)
    args = (gi_h, gi_o, u_h, u_o, w_from, b_from, w_msg_h, w_msg_o,
            w_hh_h, w_hh_o, b_hh_h, b_hh_o, mask_hh, mask_obj, eye_oo,
            h0_h, h0_o)
    try:
        if grad:
            def loss(*a):
                o = ssp._seg_dir(float(scale), reverse, False, False, *a)
                return sum(jnp.sum(x.astype(jnp.float32)) for x in o)
            val, _ = jax.jit(jax.value_and_grad(loss, argnums=(0, 4)))(*args)
            val = float(val)
        else:
            out = ssp._seg_dir_pallas(*args, scale=float(scale),
                                      reverse=reverse, interpret=False)
            val = float(jnp.sum(out[0].astype(jnp.float32)))
        return {"case": name, "status": "ok", "val": val}
    except Exception as e:  # noqa: BLE001 — record and continue
        return {"case": name, "status": f"{type(e).__name__}: {str(e)[:200]}"}


CASES = {
    # exact crash-fixture kernel shapes (f32 runs per-direction, fwd+bwd)
    "repro_o3_s1_fwd": dict(no=3, scale=1.0, reverse=False),
    "repro_o3_s1_bwd": dict(no=3, scale=1.0, reverse=True),
    # one factor at a time
    "o3_scaled_fwd": dict(no=3, scale=1.0 / math.sqrt(24), reverse=False),
    "o3_scaled_bwd": dict(no=3, scale=1.0 / math.sqrt(24), reverse=True),
    "o4_s1_fwd": dict(no=4, scale=1.0, reverse=False),
    "o4_s1_bwd": dict(no=4, scale=1.0, reverse=True),
    # known-good control (mphoi_st shapes)
    "o4_scaled_fwd": dict(no=4, scale=1.0 / math.sqrt(24), reverse=False),
    # does the hand-written backward kernel crash too?
    "repro_o3_s1_grad": dict(no=3, scale=1.0, grad=True),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", default=None)
    args = ap.parse_args()
    import jax
    print(f"# platform={jax.devices()[0].platform}", flush=True)
    names = args.cases.split(",") if args.cases else list(CASES)
    rows = []
    for name in names:
        row = run_case(name, **CASES[name])
        rows.append(row)
        print(json.dumps(row), flush=True)
    with open(OUT, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"# wrote {OUT}", flush=True)


if __name__ == "__main__":
    main()
