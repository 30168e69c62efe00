"""On-TPU PLC step cost by loss rate (VERDICT r4 item 7).

The serving loop's lossy step adds the pitch-regime conceal kernel
(opus_tpu/dsp/plc_exec.py: pitch-search xcorrs + a 1080-step order-24
IIR scan) — never measured on device through round 4 (tunnel down).
This times the FULL plan serve at 0/1/5/20% random loss on CELT 96 kbps
stereo at B=1024 (1% and 5% ride the compact-K=128 conceal, 20% the
full-batch variant) and logs audio-s/s + ms/step deltas vs the 0% row.
Appends JSON lines to /tmp/tpu_plcbench.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOG = "/tmp/tpu_plcbench.jsonl"


def log(obj):
    with open(LOG, "a") as f:
        f.write(json.dumps(obj) + "\n")
    print(obj, flush=True)


def main():
    import numpy as np
    import jax.numpy as jnp
    from opus_tpu import oracle
    from opus_tpu.batch.pipeline import BatchedCeltDecoder

    B, F, STEPS = 1024, 960, 8
    t0 = time.time()
    x = jnp.ones((256, 256))
    np.asarray((x @ x)[0, 0])
    rt = time.time() - t0
    log({"phase": "probe", "rt_s": round(rt, 2)})
    if rt > 8.0:
        log({"phase": "abort", "reason": "tunnel too slow"})
        return

    rng = np.random.default_rng(3)
    t = np.arange(F * STEPS) / 48000.0
    sig = (np.sin(2 * np.pi * 220 * t) * 0.4
           + np.sin(2 * np.pi * 523 * t) * 0.2
           + rng.standard_normal(F * STEPS) * 0.05)
    enc = oracle.Encoder(48000, 2)
    enc.ctl(oracle.SET_BITRATE, 96000)
    enc.ctl(oracle.SET_FORCE_MODE, oracle.MODE_CELT_ONLY)
    pcm = np.stack([sig, np.roll(sig, 13)], -1).astype(np.float32)
    pks = [enc.encode_float(pcm[i * F : (i + 1) * F].ravel(), F)
           for i in range(STEPS)]
    batches = [[pks[s]] * B for s in range(STEPS)]

    front = BatchedCeltDecoder(B, 2, use_native=True, transfer="plan")
    base_ms = None
    for pct in (0.0, 0.01, 0.05, 0.20):
        lrng = np.random.default_rng(7)
        lossy = [[None if lrng.random() < pct else pk for pk in b]
                 for b in batches]
        n_lost = sum(p is None for b in lossy for p in b)
        front.serve(lossy[:2], F)  # warm this loss profile's variants
        best = float("inf")
        for _ in range(3):
            t1 = time.perf_counter()
            front.serve(lossy, F)
            best = min(best, time.perf_counter() - t1)
        ms = best / STEPS * 1e3
        rate = STEPS * B * 0.02 / best
        row = {"phase": f"loss_{int(pct * 100)}pct", "ms_per_step": round(ms, 2),
               "audio_s_per_s": round(rate, 1), "lost_packets": n_lost}
        if base_ms is None:
            base_ms = ms
        else:
            row["delta_ms_vs_0pct"] = round(ms - base_ms, 2)
            row["penalty_pct"] = round(100.0 * (ms - base_ms) / base_ms, 1)
        log(row)

    log({"phase": "done"})


if __name__ == "__main__":
    main()
