#!/bin/bash
# Patient TPU measurement supervisor (round-4 tail ordering): loop the
# remaining measurements whenever a usable tunnel window opens.  Each
# tool probes first and aborts fast on a dead/trickle tunnel; fresh
# interpreter per attempt because the axon client can wedge an
# interpreter permanently.
#
#   TPU_SUP_BUDGET_S  total budget (default 10h)
#   order: B-cliff causal experiment (VERDICT r3 weak #9, the one
#          unexplained perf datum) > bench.py TWICE (first run fills
#          the persistent jit cache, second measures warm and rewrites
#          docs/LAST_GOOD_BENCH.json with the Pallas-default numbers).

cd "$(dirname "$0")/.."
BUDGET=${TPU_SUP_BUDGET_S:-36000}
END=$(( $(date +%s) + BUDGET ))
[ -f /tmp/tpu_cliff.jsonl ] && mv /tmp/tpu_cliff.jsonl "/tmp/tpu_cliff.jsonl.$(date +%H%M%S).old"
while [ "$(date +%s)" -lt "$END" ]; do
  timeout 3000 python tools/tpu_cliff.py >> /tmp/tpu_sup.out 2>&1
  if tail -3 /tmp/tpu_cliff.jsonl 2>/dev/null | grep -q '"phase": "done"'; then
    timeout 900 python bench.py > /tmp/bench_tpu_warmup.json 2>> /tmp/tpu_sup.out
    timeout 900 python bench.py > /tmp/bench_tpu_window.json 2>> /tmp/tpu_sup.out
    echo "{\"supervisor\": \"all_done\"}" >> /tmp/tpu_sup.out
    exit 0
  fi
  sleep 180
done
