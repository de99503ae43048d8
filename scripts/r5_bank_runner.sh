#!/bin/bash
# Round-5 scaling-pair banking watcher: wait for pytest to drain, then
# run scaling-only bench invocations whenever the warm host probe says
# the window is clean (>=0.9), appending dual-gated pairs to
# BENCH/clean_pairs.jsonl. TTL-bounded so it cannot contend with the
# driver's round-end measurement. Goal: ledger clean-pair n >= 25
# (r4 VERDICT task #6) with every raw pair published.
cd /root/repo || exit 1
TTL_SEC="${TTL_SEC:-9000}"             # hard stop 2.5h from launch
POLL_SEC="${POLL_SEC:-180}"
LOG="${LOG:-scripts/bench_r5_evidence/r5_bank_runner.log}"
T0=$(date +%s)
say() { echo "$(date -u +%H:%M:%S) $1" >> "$LOG"; }

expired() { [ $(( $(date +%s) - T0 )) -ge "$TTL_SEC" ]; }

while pgrep -f "pytest tests/" > /dev/null; do
  say "pytest still running — waiting"
  expired && { say "TTL expired waiting for pytest"; exit 0; }
  sleep 60
done

while ! expired; do
  p=$(timeout 180 python scripts/host_probe.py 2>/dev/null |
    python -c 'import json,sys; print(json.load(sys.stdin)["probe_eff"])' 2>/dev/null)
  say "probe ${p:-fail}"
  ok=$(python -c "print(1 if float('${p:-0}' or 0) >= 0.9 else 0)" 2>/dev/null)
  if [ "$ok" = "1" ]; then
    left=$(( TTL_SEC - ( $(date +%s) - T0 ) ))
    say "window clean — launching scaling-only banking run"
    BENCH_SKIP_QUERIES=1 BENCH_SKIP_LATENCY=1 BENCH_MAX_REPS=3 \
      BENCH_PROBE_TRIES=2 \
      BENCH_SCALING_WALL_BUDGET_SEC=$(( left > 2000 ? 2000 : left )) \
      timeout $(( left > 2400 ? 2400 : left )) python bench.py >> "$LOG" 2>&1
    say "scaling run finished rc=$?"
  fi
  sleep "$POLL_SEC"
done
say "TTL expired — runner exiting"
