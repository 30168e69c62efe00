#!/bin/bash
# Patient TPU measurement supervisor: loop the round-3 tools whenever a
# usable tunnel window opens.  Each tool probes first and aborts fast on
# a dead/trickle tunnel; fresh interpreter per attempt because the axon
# client can wedge an interpreter permanently.
#
#   TPU_SUP_BUDGET_S  total budget (default 10h)
#   order: exec bisect (the 766 ms executor question) > window bench
#          (plan/p10/pallas A-B) > batch sweep (B=8192 regression)

cd "$(dirname "$0")/.."
# Stale "done" lines from a previous run would satisfy the exit checks
# below immediately; rotate the logs at start.
for f in /tmp/tpu_exec_bisect.jsonl /tmp/tpu_bsweep.jsonl /tmp/tpu_window_bench.jsonl; do
  [ -f "$f" ] && mv "$f" "$f.$(date +%H%M%S).old"
done
BUDGET=${TPU_SUP_BUDGET_S:-36000}
END=$(( $(date +%s) + BUDGET ))
while [ "$(date +%s)" -lt "$END" ]; do
  # Windows can be short (the 8/17 good window lasted ~25 min): grab the
  # headline A/B numbers first, then the stage bisect, then the sweep.
  # TPU_PROBE_BUDGET_S=1 -> the bench's internal supervisor makes
  # exactly one attempt
  TPU_PROBE_BUDGET_S=1 timeout 2400 python tools/tpu_window_bench.py >> /tmp/tpu_sup.out 2>&1
  if tail -20 /tmp/tpu_window_bench.jsonl 2>/dev/null | grep -q '"phase": "done"'; then
    timeout 2400 python tools/tpu_exec_bisect.py >> /tmp/tpu_sup.out 2>&1
    timeout 3000 python tools/tpu_bsweep.py >> /tmp/tpu_sup.out 2>&1
    # Refresh the committed last-known-good headline while the window
    # holds (bench.py rewrites docs/LAST_GOOD_BENCH.json on a full run).
    timeout 1800 python bench.py > /tmp/bench_tpu_window.json 2>> /tmp/tpu_sup.out
    if tail -5 /tmp/tpu_bsweep.jsonl 2>/dev/null | grep -q '"phase": "done"'; then
      echo "{\"supervisor\": \"all_done\"}" >> /tmp/tpu_sup.out
      exit 0
    fi
  fi
  sleep 240
done
