"""Verify the Mosaic-COMPILED Pallas kernels on the real TPU.

Every kernel equivalence test in tests/ runs in interpret mode on CPU;
interpret mode does not model Mosaic compilation (fast-math, layouts, dtype
promotion). This tool closes that gap on actual hardware:

Part A (``--part a``): every golden forward fixture (tests/golden/*.npz,
  produced from the *running* reference implementation) is evaluated through
  the compiled kernel path (use_pallas_geo_gcn + use_pallas_gru +
  use_pallas_segment_scan, interpret=False) and through the plain XLA path,
  both on the TPU. The kernel path must reproduce (1) the stored reference
  outputs at the golden tolerance (rtol 2e-3 / atol 2e-4 — the same contract
  tests/test_golden_tggcn.py enforces on CPU) and (2) the XLA path.

Part B (``--part b``): gradient equivalence of the hand-written Pallas
  backwards at the headline bench shape (B=8, T=167, hidden 512, bfloat16,
  matching bench.py): segment-scan kernel VJP vs the XLA fast path's VJP,
  and the Pallas GRU-sequence backward vs the XLA scan, compiled on TPU.

Results print as a table and are written to ``tools/verify_tpu_parity_out.json``
for transcription into BASELINE.md.

Reference parity surface: the fixtures pin vhoi/models.py (TGGCN forward);
this tool lifts the kernels' equivalence claims from interpret to Mosaic.
"""

import argparse
import glob
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import numpy as np

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")
OUT_PATH = os.path.join(os.path.dirname(__file__), "verify_tpu_parity_out.json")


def _dev(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    ad = np.abs(a - b)
    max_abs = float(ad.max()) if ad.size else 0.0
    denom = np.abs(b)
    rel = ad / np.maximum(denom, 1e-6)
    return max_abs, float(rel.max()) if rel.size else 0.0


def _merge(devs):
    return (max((d[0] for d in devs), default=0.0),
            max((d[1] for d in devs), default=0.0))


def part_a(fixture_filter=None):
    import jax
    from test_golden_tggcn import load_fixture  # noqa: E402 (tests/ on path)

    from tggcn.compat import tggcn_params_from_torch_state_dict
    from tggcn.models.tggcn import TGGCNConfig, apply_tggcn
    from tggcn.ops.segment_scan_pallas import pallas_segment_scan_applicable

    fixtures = sorted(p for p in glob.glob(os.path.join(GOLDEN_DIR, "*.npz"))
                      if not os.path.basename(p).startswith(("baseline_",
                                                             "training_")))
    if fixture_filter:
        fixtures = [p for p in fixtures if fixture_filter in os.path.basename(p)]
    rows = []
    for path in fixtures:
        name = os.path.basename(path)[:-4]
        inputs, ref_outputs, weights, model_kwargs, train_mode, *_ = \
            load_fixture(path)
        cfg_x = TGGCNConfig.from_kwargs(**model_kwargs)
        cfg_k = TGGCNConfig.from_kwargs(**model_kwargs, use_pallas_geo_gcn=True,
                                        use_pallas_gru=True,
                                        use_pallas_segment_scan=True)
        use_dists = any(k.endswith("distances") for k in inputs)
        seg_on = pallas_segment_scan_applicable(cfg_k, use_dists)
        params = tggcn_params_from_torch_state_dict(weights, cfg_x)
        row = {"fixture": name, "seg_kernel": bool(seg_on), "status": "ok"}
        # jit both paths: eager dispatch would round-trip the remote TPU
        # tunnel once per op. Retry on remote_compile errors: the axon
        # compile-helper SIGABRTs transiently (observed: the same fixture
        # crashing and then compiling clean moments later).
        err = None
        for attempt in range(3):
            try:
                fx = jax.jit(lambda p, c=cfg_x: apply_tggcn(
                    p, c, train=train_mode, rng=jax.random.PRNGKey(0),
                    **inputs)[0])
                fk = jax.jit(lambda p, c=cfg_k: apply_tggcn(
                    p, c, train=train_mode, rng=jax.random.PRNGKey(0),
                    **inputs)[0])
                out_x = [np.asarray(o) for o in fx(params)]
                out_k = [np.asarray(o) for o in fk(params)]
                err = None
                break
            except Exception as e:  # noqa: BLE001 — record, keep going
                err = e
                if "remote_compile" not in str(e):
                    break
        if err is not None:
            row["status"] = f"FAIL: {type(err).__name__}: {str(err)[:300]}"
            rows.append(row)
            print(json.dumps(row), flush=True)
            continue
        row["dev_vs_golden"] = _merge([_dev(g, w) for g, w in
                                       zip(out_k, ref_outputs)])
        row["dev_vs_xla"] = _merge([_dev(g, w) for g, w in zip(out_k, out_x)])
        # The golden contract (tests/test_golden_tggcn.py tolerances).
        ok = all(np.allclose(g, w, rtol=2e-3, atol=2e-4)
                 for g, w in zip(out_k, ref_outputs))
        row["golden_contract"] = "PASS" if ok else "FAIL"
        # Shipped contract: fixtures whose hard decisions flip at TPU-default
        # matmul precision (bf16x3 rounding on marginal inputs) must pass
        # under the config-reachable escape hatch, resources.parity_mode=
        # exact (tggcn/runtime.py). Record which mode satisfied the contract.
        if ok:
            row["contract_mode"] = "fast"
        else:
            from tggcn.runtime import parity_mode_scope

            with parity_mode_scope("exact"):
                fk_e = jax.jit(lambda p, c=cfg_k: apply_tggcn(
                    p, c, train=train_mode, rng=jax.random.PRNGKey(0),
                    **inputs)[0])
                out_e = [np.asarray(o) for o in fk_e(params)]
            row["dev_vs_golden_exact"] = _merge([_dev(g, w) for g, w in
                                                 zip(out_e, ref_outputs)])
            ok_e = all(np.allclose(g, w, rtol=2e-3, atol=2e-4)
                       for g, w in zip(out_e, ref_outputs))
            row["golden_contract_exact"] = "PASS" if ok_e else "FAIL"
            row["contract_mode"] = "exact" if ok_e else "NONE"
        rows.append(row)
        print(json.dumps(row), flush=True)
    return rows


def _bench_cfg(hidden, compute_dtype, **kw):
    from tggcn.models.tggcn import TGGCNConfig

    base = dict(input_size=(2152, 2048), num_classes=(13, None),
                hidden_size=hidden, gcn_node=26,
                message_humans_to_human=True, message_human_to_objects=True,
                message_objects_to_human=True, message_objects_to_object=True,
                message_geometry_to_objects=True, message_segment=True,
                message_type="v2", message_granularity="v1",
                message_aggregation="att", attention_style="v3",
                discrete_optimization_strategy="gs",
                object_segment_update_strategy="ind",
                compute_dtype=compute_dtype)
    base.update(kw)
    return TGGCNConfig(**base)


def part_b(hidden=512, b=8, t=167, dtype_name="bfloat16"):
    import jax
    import jax.numpy as jnp

    from tggcn.models.tggcn import (_human_segment_input_size,
                                    _object_segment_input_size,
                                    _segment_scan_fast, init_tggcn)
    from tggcn.ops import segment_scan_pallas as ssp

    cfg = _bench_cfg(hidden, dtype_name)
    dtype = jnp.dtype(dtype_name)
    num_humans, num_objects = 2, 4
    params = init_tggcn(jax.random.PRNGKey(0), cfg)
    seg_params = {k: params[k] for k in ssp.SEG_PARAM_KEYS}
    seg_params = jax.tree_util.tree_map(lambda a: a.astype(dtype), seg_params)

    rng = np.random.default_rng(0)
    base_h = _human_segment_input_size(cfg) - 2 * cfg.hidden_size
    base_o = _object_segment_input_size(cfg) - 2 * cfg.hidden_size
    x_hs = jnp.asarray(rng.normal(size=(b, t, num_humans, base_h)) * 0.3, dtype)
    x_os = jnp.asarray(rng.normal(size=(b, t, num_objects, base_o)) * 0.3, dtype)
    u_h = jnp.asarray((rng.uniform(size=(b, t, num_humans)) > 0.5), dtype)
    u_o = jnp.asarray((rng.uniform(size=(b, t, num_objects)) > 0.5), dtype)
    mask = np.ones((b, num_objects), np.float32)
    mask[0, -1] = 0.0
    mask = jnp.asarray(mask, dtype)
    h0_h = jnp.zeros((b, num_humans, hidden), dtype)
    h0_o = jnp.zeros((b, num_objects, hidden), dtype)
    key = jax.random.PRNGKey(42)
    cot = [jax.random.normal(jax.random.fold_in(key, i), s, jnp.float32)
           for i, s in enumerate([(b, t, num_humans, 2 * hidden),
                                  (b, t, num_objects, 2 * hidden),
                                  (b, t, num_humans, num_objects),
                                  (b, t, num_humans, num_objects)])]

    rows = []

    # --- Segment scan: compiled-kernel forward vs XLA fast path ------------
    fwd_k = jax.jit(lambda sp: ssp.run_segment_scan_pallas(
        {**params, **sp}, cfg, x_hs, x_os, u_h, u_o, mask,
        seg_carry=(h0_h, h0_o)))
    fwd_x = jax.jit(lambda sp: _segment_scan_fast(
        {**params, **sp}, cfg, x_hs, x_os, u_h, u_o, mask,
        None, None, None, seg_carry=(h0_h, h0_o)))
    ok = fwd_k(seg_params)
    ox = fwd_x(seg_params)
    devs = [_dev(np.asarray(a, np.float32), np.asarray(bb, np.float32))
            for a, bb in zip(ok, ox)]
    rows.append({"check": f"segment_fwd_{dtype_name}_h{hidden}",
                 "dev": _merge(devs)})
    print(json.dumps(rows[-1]), flush=True)

    # --- Segment scan: kernel VJP vs XLA VJP (compiled) --------------------
    def loss(mode, sp, xh, xo, uh, uo):
        out = ssp.run_segment_scan_pallas(
            {**params, **sp}, cfg, xh, xo, uh, uo, mask,
            seg_carry=(h0_h, h0_o), vjp_mode=mode)
        return sum(jnp.sum(o.astype(jnp.float32) * c)
                   for o, c in zip(out, cot))

    args = (seg_params, x_hs, x_os, u_h, u_o)
    gk_fn = jax.jit(jax.value_and_grad(lambda *a: loss("kernel", *a),
                                       argnums=(0, 1, 2, 3, 4)))
    gx_fn = jax.jit(jax.value_and_grad(lambda *a: loss("xla", *a),
                                       argnums=(0, 1, 2, 3, 4)))
    vk, gk = gk_fn(*args)
    vx, gx = gx_fn(*args)
    lk, lx = jax.tree_util.tree_leaves(gk), jax.tree_util.tree_leaves(gx)
    devs = [_dev(np.asarray(a, np.float32), np.asarray(bb, np.float32))
            for a, bb in zip(lk, lx)]
    # Relative-to-norm deviation too: bf16 grads have tiny denominators.
    rel_norm = max(
        float(np.linalg.norm(np.asarray(a, np.float64) - np.asarray(bb, np.float64))
              / max(np.linalg.norm(np.asarray(bb, np.float64)), 1e-12))
        for a, bb in zip(lk, lx))
    rows.append({"check": f"segment_grad_{dtype_name}_h{hidden}",
                 "loss_kernel": float(vk), "loss_xla": float(vx),
                 "dev": _merge(devs), "max_rel_norm": rel_norm,
                 "n_leaves": len(lk)})
    print(json.dumps(rows[-1]), flush=True)

    # --- GRU sequence kernel: compiled forward+backward vs XLA scan --------
    from tggcn.nn.gru import run_multi_bigru
    from tggcn.ops.gru_pallas import run_multi_bigru_pallas

    gp = {k: params[k] for k in ("human_bd_rnn", "object_bd_rnn",
                                 "geometry_bd_rnn")}
    gp = jax.tree_util.tree_map(lambda a: a.astype(dtype), gp)
    xs = [jnp.asarray(rng.normal(size=(b, t, num_humans, hidden)) * 0.3, dtype),
          jnp.asarray(rng.normal(size=(b, t, num_objects, hidden)) * 0.3, dtype),
          jnp.asarray(rng.normal(size=(b, t, 1, hidden)) * 0.3, dtype)]
    cot_g = [jax.random.normal(jax.random.fold_in(key, 10 + i), x.shape[:3] + (2 * hidden,),
                               jnp.float32) for i, x in enumerate(xs)]

    def gloss(fn, p, x0, x1, x2):
        outs = fn([p["human_bd_rnn"], p["object_bd_rnn"], p["geometry_bd_rnn"]],
                  [x0, x1, x2])
        return sum(jnp.sum(o.astype(jnp.float32) * c)
                   for o, c in zip(outs, cot_g))

    gk_fn = jax.jit(jax.value_and_grad(
        lambda p, a0, a1, a2: gloss(run_multi_bigru_pallas, p, a0, a1, a2),
        argnums=(0, 1, 2, 3)))
    gx_fn = jax.jit(jax.value_and_grad(
        lambda p, a0, a1, a2: gloss(run_multi_bigru, p, a0, a1, a2),
        argnums=(0, 1, 2, 3)))
    vk, gk = gk_fn(gp, *xs)
    vx, gx = gx_fn(gp, *xs)
    lk, lx = jax.tree_util.tree_leaves(gk), jax.tree_util.tree_leaves(gx)
    devs = [_dev(np.asarray(a, np.float32), np.asarray(bb, np.float32))
            for a, bb in zip(lk, lx)]
    rel_norm = max(
        float(np.linalg.norm(np.asarray(a, np.float64) - np.asarray(bb, np.float64))
              / max(np.linalg.norm(np.asarray(bb, np.float64)), 1e-12))
        for a, bb in zip(lk, lx))
    rows.append({"check": f"gru_grad_{dtype_name}_h{hidden}",
                 "loss_kernel": float(vk), "loss_xla": float(vx),
                 "dev": _merge(devs), "max_rel_norm": rel_norm})
    print(json.dumps(rows[-1]), flush=True)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--part", choices=["a", "b", "all"], default="all")
    ap.add_argument("--fixtures", default=None,
                    help="substring filter for part A fixtures")
    ap.add_argument("--hidden", type=int, default=512)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--out", default=OUT_PATH)
    ap.add_argument("--precision", default=None,
                    choices=[None, "default", "high", "highest"],
                    help="jax_default_matmul_precision; TPU default (bf16x3 "
                         "passes for f32) can flip marginal hard decisions "
                         "vs the CPU-generated goldens")
    args = ap.parse_args()

    import jax

    if args.precision and args.precision != "default":
        jax.config.update("jax_default_matmul_precision", args.precision)
    plat = jax.devices()[0].platform
    print(f"# devices: {jax.devices()} (platform={plat})", flush=True)
    if plat not in ("tpu",):
        print("WARNING: not running on TPU — results do not verify Mosaic "
              "compilation.", flush=True)

    out = {"platform": plat}
    if args.part in ("a", "all"):
        out["part_a"] = part_a(args.fixtures)
    if args.part in ("b", "all"):
        out["part_b"] = part_b(hidden=args.hidden, dtype_name=args.dtype)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"# wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
