#!/bin/bash
# Clean-window watcher for the scaling ledger (r5): poll the cheap
# Spark-free host probe every POLL_SEC; when the host delivers >=0.9
# N->4N scaling on the probe, launch one gated bench scaling run
# (which re-probes per pair and banks clean pairs to
# BENCH/clean_pairs.jsonl crash-durably). A ~15 s probe every 4 min is
# ~6% duty cycle — far less measurement noise than leaving bench.py
# in its own 150 s probe-wait loop during a multi-hour degraded phase.
cd /root/repo || exit 1
POLL_SEC="${POLL_SEC:-240}"
LOG="${LOG:-scripts/bench_r5_evidence/scaling_run_e.log}"
while true; do
  p=$(timeout 120 python scripts/host_probe.py 2>/dev/null |
    python -c 'import json,sys; print(json.load(sys.stdin)["probe_eff"])' 2>/dev/null)
  echo "$(date -u +%H:%M:%S) watcher probe ${p:-fail}" >> "$LOG"
  ok=$(python -c "print(1 if float('${p:-0}' or 0) >= 0.9 else 0)" 2>/dev/null)
  if [ "$ok" = "1" ]; then
    echo "$(date -u +%H:%M:%S) window clean — launching gated scaling run" >> "$LOG"
    BENCH_SKIP_QUERIES=1 BENCH_SKIP_LATENCY=1 BENCH_MAX_REPS=6 \
      BENCH_PROBE_TRIES=3 BENCH_SCALING_WALL_BUDGET_SEC=3600 \
      python bench.py >> "$LOG" 2>&1
    echo "$(date -u +%H:%M:%S) gated run finished" >> "$LOG"
  fi
  sleep "$POLL_SEC"
done
