#!/bin/bash
# Patient TPU measurement supervisor (round-4 tail ordering): loop the
# remaining measurements whenever a usable tunnel window opens.  Each
# tool probes first and aborts fast on a dead/trickle tunnel; fresh
# interpreter per attempt because the axon client can wedge an
# interpreter permanently.
#
#   TPU_SUP_BUDGET_S  total budget (default 10h)
#   order: leaves-stage barrel microbench (tools/tpu_barrelbench.py —
#          decides whether the executor's 8 ms leaf fetch becomes a
#          block-row take + row-uniform barrel) > headline window bench
#          (tools/tpu_window_bench.py — measures the rot-skip conds and
#          the size-class A/B, plan vs plan_fullcap vs p10, Pallas pf,
#          e2e) > bench.py TWICE (warm the persistent jit cache, then
#          measure and refresh docs/LAST_GOOD_BENCH.json).

cd "$(dirname "$0")/.."
BUDGET=${TPU_SUP_BUDGET_S:-36000}
END=$(( $(date +%s) + BUDGET ))
while [ "$(date +%s)" -lt "$END" ]; do
  if ! grep -q '"phase": "done"' /tmp/tpu_barrelbench.jsonl 2>/dev/null; then
    timeout 2400 python tools/tpu_barrelbench.py >> /tmp/tpu_sup.out 2>&1
  fi
  if grep -q '"phase": "done"' /tmp/tpu_barrelbench.jsonl 2>/dev/null \
     && ! grep -q '"phase": "done"' /tmp/tpu_window_bench.jsonl 2>/dev/null; then
    TPU_PROBE_CHILD=1 timeout 5400 python tools/tpu_window_bench.py >> /tmp/tpu_sup.out 2>&1
  fi
  if grep -q '"phase": "done"' /tmp/tpu_window_bench.jsonl 2>/dev/null; then
    timeout 900 python bench.py > /tmp/bench_tpu_warmup.json 2>> /tmp/tpu_sup.out
    timeout 900 python bench.py > /tmp/bench_tpu_window.json 2>> /tmp/tpu_sup.out
    echo "{\"supervisor\": \"all_done\"}" >> /tmp/tpu_sup.out
    exit 0
  fi
  sleep 180
done
