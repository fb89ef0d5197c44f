"""End-to-end CLI drill on the real TPU chip (VERDICT r3 item 6/7).

Runs the ACTUAL train.py -> predict.py composition (reference train.py:13-66
/ predict.py:317-436 semantics) on synthetic MPHOI data, on the TPU, with
the production bf16 + Pallas-kernel configuration — the composition that
bench.py and tools/verify_tpu_parity.py (model-level) never exercise. Then
repeats the identical run on CPU and compares the per-epoch loss
trajectories, closing the "full CLI stack has never run on the TPU" gap.

bf16 recurrences accumulate rounding differently across backends (and the
CPU leg runs the XLA paths — the kernel config falls back via
models/fallback.py), so the comparison bound is documented, not bitwise:
per-loss relative deviation at epoch 1 must stay within --tol (default 5%,
matching bench.py's kernel-vs-XLA cross-check bound).

Usage:
    python tools/cli_tpu_drill.py            # both legs + compare (writes OUT)
    python tools/cli_tpu_drill.py --leg tpu  # one leg (runs in-process)
"""

import argparse
import json
import os
import subprocess
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "cli_tpu_drill_out.json")

HIDDEN, EPOCHS = 64, 2


def run_leg(platform: str, root: str) -> dict:
    os.environ["JAX_PLATFORMS"] = platform
    import jax

    jax.config.update("jax_platforms", platform)
    os.chdir(REPO)
    from tggcn.data.synthetic import generate_mphoi_dataset
    from tggcn.train.checkpoint import load_checkpoint
    import train as train_cli

    paths = generate_mphoi_dataset(root + "/data", num_videos=10, min_len=48,
                                   max_len=96, seed=21)
    log_root = f"{root}/outputs-{platform}/mphoi/2G-GCN"
    overrides = [
        "models=2G-GCN_stage1", "data=mphoi",
        f"data.path={paths['path']}",
        f"data.path_zarr={paths['path_zarr']}",
        f"data.path_obb_zarr={paths['path_obb_zarr']}",
        f"data.path_hbb_zarr={paths['path_hbb_zarr']}",
        f"data.path_hps_zarr={paths['path_hps_zarr']}",
        "data.cross_validation_test_subject=Subject45",
        f"parameters.hidden_size={HIDDEN}", f"optimization.epochs={EPOCHS}",
        "optimization.batch_size=2", "optimization.val_fraction=0.25",
        # Production TPU mode; the CPU leg downgrades the kernels to the
        # XLA path through the fallback guard (numerics equivalent).
        "parameters.compute_dtype=bfloat16",
        "parameters.use_pallas_gru=true",
        "parameters.use_pallas_segment_scan=true",
        f"logging.root_log_dir={log_root}",
    ]
    t0 = time.perf_counter()
    train_cli.main(overrides)
    train_s = time.perf_counter() - t0
    run_dir = os.path.join(
        log_root, f"hs{HIDDEN}_e{EPOCHS}_bs2_lr0.0001_0.5_Subject45")
    ckpt = load_checkpoint(os.path.join(
        run_dir, f"hs{HIDDEN}_e{EPOCHS}_bs2_lr0.0001_0.5_Subject45.ckpt"))

    import predict as predict_cli

    t0 = time.perf_counter()
    args = argparse.Namespace(pretrained_model_dir=run_dir,
                              cross_validate=False,
                              convert_frame_to_segment_level=False,
                              save_visualisations_dir=None,
                              inspect_model=False)
    predict_cli.predict_all(args)
    predict_s = time.perf_counter() - t0
    return {"platform": platform,
            "train_wall_s": round(train_s, 1),
            "predict_wall_s": round(predict_s, 1),
            "train_losses": ckpt["train_losses"],
            "val_losses": ckpt["val_losses"]}


def _parse_leg_log(path: str) -> dict:
    with open(path) as f:
        for line in f:
            if line.startswith("LEG-RESULT "):
                return json.loads(line[len("LEG-RESULT "):])
    raise SystemExit(f"no LEG-RESULT line in {path}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--leg", choices=["tpu", "cpu"], default=None)
    ap.add_argument("--combine", nargs=2, metavar=("TPU_LOG", "CPU_LOG"),
                    help="skip running: compare two already-captured "
                         "LEG-RESULT logs (tunnel outages make the legs "
                         "land hours apart)")
    ap.add_argument("--root", default="/tmp/cli_drill")
    ap.add_argument("--tol", type=float, default=0.05)
    ap.add_argument("--out", default=OUT)
    args = ap.parse_args()
    if args.leg:
        platform = "axon" if args.leg == "tpu" else "cpu"
        result = run_leg(platform, args.root)
        print("LEG-RESULT " + json.dumps(result))
        return

    legs = {}
    if args.combine:
        legs = {"tpu": _parse_leg_log(args.combine[0]),
                "cpu": _parse_leg_log(args.combine[1])}
    for leg in () if args.combine else ("tpu", "cpu"):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--leg", leg,
             "--root", args.root],
            capture_output=True, text=True, timeout=5400,
            env={**os.environ,
                 "JAX_PLATFORMS": "axon" if leg == "tpu" else "cpu"})
        for line in proc.stdout.splitlines():
            if line.startswith("LEG-RESULT "):
                legs[leg] = json.loads(line[len("LEG-RESULT "):])
        if leg not in legs:
            print(proc.stdout[-2000:])
            print(proc.stderr[-3000:])
            raise SystemExit(f"{leg} leg failed (rc={proc.returncode})")
        print(f"=== {leg} leg done: train {legs[leg]['train_wall_s']}s, "
              f"predict {legs[leg]['predict_wall_s']}s ===", flush=True)

    import numpy as np

    epoch1_tpu = np.asarray(legs["tpu"]["train_losses"][0][1])
    epoch1_cpu = np.asarray(legs["cpu"]["train_losses"][0][1])
    rel = np.abs(epoch1_tpu - epoch1_cpu) / np.maximum(np.abs(epoch1_cpu), 1e-3)
    verdict = {
        "epoch1_train_losses_tpu": epoch1_tpu.tolist(),
        "epoch1_train_losses_cpu": epoch1_cpu.tolist(),
        "epoch1_max_rel_dev": float(rel.max()),
        "tol": args.tol,
        "pass": bool(rel.max() < args.tol),
        "legs": legs,
    }
    with open(args.out, "w") as f:
        json.dump(verdict, f, indent=1)
    print(json.dumps({k: v for k, v in verdict.items() if k != "legs"}))
    print(f"wrote {args.out}")
    print("DRILL-" + ("PASS" if verdict["pass"] else "FAIL"))


if __name__ == "__main__":
    main()
