#!/bin/bash
# Patient TPU measurement supervisor (round-5 tail queue): loop the
# remaining measurements whenever a usable tunnel window opens.  Each
# tool probes first and aborts fast on a dead/trickle tunnel; fresh
# interpreter per attempt because the axon client can wedge an
# interpreter permanently.
#
#   TPU_SUP_BUDGET_S  total budget (default 10h)
#   order: rotation A/B (tools/tpu_rotbench.py — validate + time the
#          fused Pallas rotation pass vs the XLA ladder on the wire-v4
#          build; decides whether pallas stays the TPU default)
#          > PLC lossy-step cost (tools/tpu_plcbench.py — measure the
#          with_plc step at 1/5/20% loss, VERDICT r4 item 7)
#          > bench.py TWICE (warm the persistent jit cache, then measure
#          and refresh docs/LAST_GOOD_BENCH.json with the v4 upload,
#          ~920 B/stream vs round-4's 1.2 KB).
#
# Round-5 morning window (2026-08-20 12:27, COMPLETE): exec bisect on
# the blockrow build — stage split leaves 2.81 / posmap 1.75 / iy 2.11 /
# norm 1.62 / noise 1.65 / rot 4.92 / bands 6.61 ms at B=1024; bench ran
# CPU-contended (a concurrent test suite) and predates wire v4, so the
# LKG refresh below supersedes it.

cd "$(dirname "$0")/.."
# Rotate stale logs from previous runs so their "done" markers cannot
# gate-skip the refreshes we are here to run (ADVICE r4).
for f in /tmp/tpu_rotbench.jsonl /tmp/tpu_plcbench.jsonl /tmp/tpu_encbench.jsonl; do
  if [ -f "$f" ]; then mv "$f" "$f.$(date +%Y%m%d%H%M%S)"; fi
done
BUDGET=${TPU_SUP_BUDGET_S:-36000}
END=$(( $(date +%s) + BUDGET ))
while [ "$(date +%s)" -lt "$END" ]; do
  if ! grep -q '"phase": "done"' /tmp/tpu_rotbench.jsonl 2>/dev/null; then
    timeout 2400 python tools/tpu_rotbench.py >> /tmp/tpu_sup.out 2>&1
  fi
  if grep -q '"phase": "done"' /tmp/tpu_rotbench.jsonl 2>/dev/null; then
    if [ -f tools/tpu_plcbench.py ] \
       && ! grep -q '"phase": "done"' /tmp/tpu_plcbench.jsonl 2>/dev/null; then
      timeout 2400 python tools/tpu_plcbench.py >> /tmp/tpu_sup.out 2>&1
      continue
    fi
    if [ -f tools/tpu_encbench.py ] \
       && ! grep -q '"phase": "done"' /tmp/tpu_encbench.jsonl 2>/dev/null; then
      timeout 2400 python tools/tpu_encbench.py >> /tmp/tpu_sup.out 2>&1
      continue
    fi
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
