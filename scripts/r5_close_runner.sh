#!/bin/bash
# Round-5 closing runner: after the full pytest sweep finishes, wait
# for a clean host window (recalibrated warm probe >= 0.9), run ONE
# full bench (headline + latency + scaling) so BENCH/result.json
# reflects the final round-5 code in a gated window, then hand over to
# scaling-only banking runs until TTL. Everything is TTL-bounded so a
# dead session cannot leave a bench contending with the driver's
# round-end measurement (the r4 "headline in a degraded window"
# defect was partly exactly that).
cd /root/repo || exit 1
TTL_SEC="${TTL_SEC:-10800}"            # hard stop 3h from launch
POLL_SEC="${POLL_SEC:-180}"
LOG="${LOG:-scripts/bench_r5_evidence/r5_close_runner.log}"
T0=$(date +%s)
say() { echo "$(date -u +%H:%M:%S) $1" >> "$LOG"; }

expired() { [ $(( $(date +%s) - T0 )) -ge "$TTL_SEC" ]; }

# phase 1: wait for any running pytest to drain (don't probe into it)
while pgrep -f "pytest tests/" > /dev/null; do
  say "pytest still running — waiting"
  expired && { say "TTL expired in phase 1"; exit 0; }
  sleep 60
done

full_done=0
while ! expired; do
  p=$(timeout 180 python scripts/host_probe.py 2>/dev/null |
    python -c 'import json,sys; print(json.load(sys.stdin)["probe_eff"])' 2>/dev/null)
  say "probe ${p:-fail}"
  ok=$(python -c "print(1 if float('${p:-0}' or 0) >= 0.9 else 0)" 2>/dev/null)
  if [ "$ok" = "1" ]; then
    left=$(( TTL_SEC - ( $(date +%s) - T0 ) ))
    if [ "$full_done" = "0" ]; then
      say "window clean — launching FULL bench (headline+latency+scaling)"
      BENCH_MAX_REPS=3 BENCH_PROBE_TRIES=2 \
        BENCH_SCALING_WALL_BUDGET_SEC=$(( left > 2400 ? 2400 : left )) \
        timeout $(( left > 3600 ? 3600 : left )) python bench.py >> "$LOG" 2>&1
      say "full bench finished rc=$?"
      full_done=1
    else
      say "window clean — launching scaling-only banking run"
      BENCH_SKIP_QUERIES=1 BENCH_SKIP_LATENCY=1 BENCH_MAX_REPS=4 \
        BENCH_PROBE_TRIES=2 \
        BENCH_SCALING_WALL_BUDGET_SEC=$(( left > 2400 ? 2400 : left )) \
        timeout $(( left > 3000 ? 3000 : left )) python bench.py >> "$LOG" 2>&1
      say "scaling run finished rc=$?"
    fi
  fi
  sleep "$POLL_SEC"
done
say "TTL expired — runner exiting"
