#!/bin/bash
# Round-5 TPU measurement queue — run the moment the remote-TPU tunnel is up.
#
# Executes the evidence items that were tunnel-blocked in round 4
# (VERDICT.md "Next round" items 2/3/7) STRICTLY one at a time (this host
# has 1 CPU core; overlapping jobs corrupt each other's timings), each in
# its own subprocess (a TPU-compile SIGABRT poisons the crashing process'
# backend, never the queue) with its own timeout, logging to
# tools/artifacts/r5_queue/. A JSON summary lands at
# tools/artifacts/r5_queue/summary.json.
#
# Usage: bash tools/run_tpu_queue.sh [item ...]   (default: all, in order)
set -u
cd "$(dirname "$0")/.."
ART=tools/artifacts/r5_queue
mkdir -p "$ART"
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
SUMMARY="$ART/summary.json"
echo "{" > "$SUMMARY.tmp"
FIRST=1

probe() {
  # One probe contract for the whole repo: bench.py owns the bounded
  # retry/backoff liveness check (a downed tunnel HANGS backend init).
  TGGCN_BENCH_PROBE_ATTEMPTS=1 python bench.py --probe > /dev/null 2>&1
}

run_item() {
  local name="$1" tmo="$2"; shift 2
  local log="$ART/$name.log" t0 t1 rc
  echo "=== [$name] $(date -u +%H:%M:%S) timeout=${tmo}s: $*" | tee -a "$ART/queue.log"
  t0=$(date +%s)
  timeout "$tmo" "$@" > "$log" 2>&1
  rc=$?
  t1=$(date +%s)
  echo "=== [$name] rc=$rc in $((t1 - t0))s" | tee -a "$ART/queue.log"
  [ $FIRST -eq 0 ] && echo "," >> "$SUMMARY.tmp"
  FIRST=0
  printf '  "%s": {"rc": %d, "seconds": %d}' "$name" "$rc" "$((t1 - t0))" >> "$SUMMARY.tmp"
}

ITEMS="${*:-bench profile ablate_base ablate_frame_msgs segmodes_fwd segmodes_fwd_b1 drill_tpu parity_a streaming_auto streaming_all}"

if ! probe; then
  echo "tunnel DOWN at $(date -u +%H:%M:%S) — aborting queue" | tee -a "$ART/queue.log"
  echo '{"tunnel": "down"}' > "$SUMMARY"
  exit 1
fi
echo "tunnel UP at $(date -u +%H:%M:%S) — starting queue: $ITEMS" | tee -a "$ART/queue.log"

for item in $ITEMS; do
  case "$item" in
    bench)           # validates the device_step_ms field (VERDICT item 2)
      run_item bench 2400 python bench.py ;;
    profile)         # backward-tail scope-attributed trace (VERDICT item 3)
      run_item profile 2400 python tools/profile_step.py \
        --out "$ART/profile_step.json" ;;
    ablate_base)     # paired with ablate_frame_msgs: frame-message cost
      run_item ablate_base 2400 python tools/bench_breakdown.py \
        --compute_dtype bfloat16 --use_pallas_gru --use_pallas_segment_scan \
        --json ;;
    ablate_frame_msgs)
      run_item ablate_frame_msgs 2400 python tools/bench_breakdown.py \
        --compute_dtype bfloat16 --use_pallas_gru --use_pallas_segment_scan \
        --ablate no_frame_messages --json ;;
    segmodes_fwd)    # forward-only kernel-mode matrix, training shape
      run_item segmodes_fwd 2400 python tools/bench_segment_modes.py \
        --forward_only ;;
    segmodes_fwd_b1) # forward-only matrix at the streaming shape
      run_item segmodes_fwd_b1 2400 python tools/bench_segment_modes.py \
        --forward_only --batch 1 --t 128 ;;
    drill_tpu)       # real train.py -> predict.py composition on-chip
      run_item drill_tpu 3600 python tools/cli_tpu_drill.py --leg tpu \
        --out "$ART/drill_tpu.json"
      # Compare against the committed CPU leg (legs land hours apart when
      # the tunnel flaps; --combine exists exactly for that).
      run_item drill_combine 600 python tools/cli_tpu_drill.py \
        --combine "$ART/drill_tpu.log" tools/artifacts/drill_cpu_leg.log \
        --out "$ART/drill_combined.json" ;;
    parity_a)        # 12/12 golden contract with parity_mode recorded
      run_item parity_a 3600 python tools/verify_tpu_parity.py --part a \
        --out "$ART/verify_tpu_parity_a.json" ;;
    streaming_auto)  # serving benchmark, current routing
      run_item streaming_auto 1800 python tools/bench_streaming.py \
        --compute_dtype bfloat16 --use_pallas_gru --use_pallas_segment_scan ;;
    streaming_all)   # serving benchmark, kernel-everything routing (A/B)
      run_item streaming_all 1800 python tools/bench_streaming.py \
        --compute_dtype bfloat16 --use_pallas_gru --use_pallas_segment_scan \
        --segment_kernel_modes all ;;
    *) echo "unknown item: $item" | tee -a "$ART/queue.log" ;;
  esac
done

echo "" >> "$SUMMARY.tmp"
echo "}" >> "$SUMMARY.tmp"
mv "$SUMMARY.tmp" "$SUMMARY"
echo "queue done $(date -u +%H:%M:%S); summary: $SUMMARY" | tee -a "$ART/queue.log"
