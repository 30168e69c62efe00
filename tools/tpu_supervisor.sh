#!/bin/bash
# Patient TPU measurement supervisor (round-5 queue): loop the remaining
# measurements whenever a usable tunnel window opens.  Each tool probes
# first and aborts fast on a dead/trickle tunnel; fresh interpreter per
# attempt because the axon client can wedge an interpreter permanently.
#
#   TPU_SUP_BUDGET_S  total budget (default 10h)
#   order: executor stage bisect on the BLOCK-ROW build
#          (tools/tpu_exec_bisect.py — refresh the stage split now that
#          the leaves fetch is barrels; the rotation while_loop ~6 ms is
#          the next target, so its share needs a current number)
#          > bench.py TWICE (warm the persistent jit cache, then measure
#          and refresh docs/LAST_GOOD_BENCH.json).
#
# Round-4 tail (2026-08-20 window, COMPLETE): barrelbench -> block-row
# leaves fetch landed as default; window bench -> p10 6.23 ms / plan
# 23.39 ms / e2e 353.4; LKG refreshed at 466.5 e2e on the blockrow
# build.

cd "$(dirname "$0")/.."
# Rotate any stale bisect log from a previous round so its "done" marker
# cannot gate-skip the refresh we are here to run (ADVICE r4).
if [ -f /tmp/tpu_exec_bisect.jsonl ]; then
  mv /tmp/tpu_exec_bisect.jsonl "/tmp/tpu_exec_bisect.$(date +%Y%m%d%H%M%S).jsonl"
fi
BUDGET=${TPU_SUP_BUDGET_S:-36000}
END=$(( $(date +%s) + BUDGET ))
while [ "$(date +%s)" -lt "$END" ]; do
  if ! grep -q '"phase": "done"' /tmp/tpu_exec_bisect.jsonl 2>/dev/null; then
    timeout 2400 python tools/tpu_exec_bisect.py >> /tmp/tpu_sup.out 2>&1
  fi
  if grep -q '"phase": "done"' /tmp/tpu_exec_bisect.jsonl 2>/dev/null; then
    timeout 900 python bench.py > /tmp/bench_tpu_warmup.json 2>> /tmp/tpu_sup.out
    timeout 900 python bench.py > /tmp/bench_tpu_window.json 2>> /tmp/tpu_sup.out
    if grep -q '"transport_probe": "dead"' /tmp/bench_tpu_window.json 2>/dev/null; then
      sleep 180
      continue   # fallback emitted, not a fresh measurement — keep looping
    fi
    echo "{\"supervisor\": \"all_done\"}" >> /tmp/tpu_sup.out
    exit 0
  fi
  sleep 180
done
