"""Diagnose the B=4096->8192 serving-step cliff on real TPU.

Round-3 bsweep found p10 step throughput monotone to a 4096-stream
optimum, then ~2x WORSE at 8192 (2x batch -> 3.9x step time); the
working hypothesis was "HBM working-set class" but no causal model or
counter-experiment existed (VERDICT r3 weak #9).  This tool separates
the candidate causes:

  * threshold vs gradual: fine B sweep 4096..8192 in 1024 steps.  A
    layout/tiling threshold shows a step function; progressive cache or
    bandwidth pressure shows a smooth slope.
  * postfilter vs core: each B also runs with the postfilter compiled
    out (pf_active=False).  The postfilter is the only stage doing
    large history gathers ([B, C, DECODE_BUFFER+OVERLAP] operands);
    everything else is matmuls + elementwise over [B, 2, N] planes.
  * split-batch mitigation: two B/2 steps chained back-to-back on
    device vs one B step — same audio work, same HBM residency,
    half-size operands per execute.  If 2 x 4096 recovers the 4096
    rate, the cliff is per-execute shape cost (XLA layout/fusion or
    gather implementation switch), NOT aggregate working set, and
    split-batch stepping is a valid serving mitigation at B=8192.

Appends JSON lines to /tmp/tpu_cliff.jsonl.  Run inside a usable
window (probe rt < 5 s).  Uses the p10 packed step (the cliff was
measured there; the plan step shows the same shape per bsweep).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOG = "/tmp/tpu_cliff.jsonl"


def log(obj):
    with open(LOG, "a") as f:
        f.write(json.dumps(obj) + "\n")
    print(obj, flush=True)


def guarded(fn, budget):
    pid = os.fork()
    if pid == 0:
        time.sleep(budget)
        try:
            os.kill(os.getppid(), 9)
        except OSError:
            pass
        os._exit(0)
    try:
        return fn()
    finally:
        try:
            os.kill(pid, 9)
            os.waitpid(pid, 0)
        except OSError:
            pass


def main():
    import numpy as np
    import jax.numpy as jnp

    from opus_tpu import oracle, parse_packet
    from opus_tpu.dsp.synthesis import (
        init_state, make_serving_step, packed_offsets, pf_chunk_for,
    )
    from opus_tpu.native.frontend import NativeBatchFrontEnd

    FRAME, NSRC, B0 = 960, 16, 1024
    enc = oracle.Encoder(48000, 2)
    enc.ctl(oracle.SET_FORCE_MODE, oracle.MODE_CELT_ONLY)
    enc.ctl(oracle.SET_BITRATE, 96000)
    rng = np.random.default_rng(1)
    t = np.arange(FRAME * NSRC) / 48000.0
    sig = 0.4 * np.sin(2 * np.pi * 440 * t) + 0.1 * rng.standard_normal(t.size)
    pcm = np.stack([sig, 0.8 * np.roll(sig, 7)], -1).astype(np.float32)
    pays = []
    for f in range(NSRC):
        p = enc.encode_float(pcm[f * FRAME : (f + 1) * FRAME].ravel(), FRAME)
        pays.append(p[parse_packet(p).payload_offset :])

    def probe():
        x = jnp.ones((256, 256))
        t0 = time.time()
        np.asarray((x @ x)[0, 0])
        return time.time() - t0

    rt = guarded(probe, 240)
    log({"phase": "probe", "rt_s": round(rt, 2)})
    if rt > 5.0:
        log({"phase": "abort", "reason": "tunnel too slow"})
        return

    # One B0-stream packed slot, tiled up to any B (content repeats; the
    # step cost is content-independent to first order).
    hfront = NativeBatchFrontEnd(B0, 2, 1)
    slots = hfront.alloc_packed_slots(1, "p10")
    hfront.decode_batch_q15_into([pays[i % NSRC] for i in range(B0)], FRAME, slots[0])
    lm = int(slots[0]["meta"][0, 2])
    pf_chunk, pf_active = pf_chunk_for(slots[0]["meta"][:, 6:9], slots[0]["gains"])
    off1 = packed_offsets(B0, "p10")
    b1 = slots[0]["buf"]

    def tiled_buf(Bx):
        reps = Bx // B0
        offx = packed_offsets(Bx, "p10")
        bufx = np.empty(offx["end"], np.int32)
        for reg, nxt in (("xq", "ble"), ("ble", "meta"), ("meta", "gains"),
                         ("gains", "end")):
            w = off1[nxt] - off1[reg]
            bufx[offx[reg] : offx[reg] + reps * w] = np.tile(b1[off1[reg] : off1[nxt]], reps)
        return jnp.asarray(bufx)

    def time_step(Bx, active, iters=10):
        step = make_serving_step(lm, Bx, 2, 1, pf_chunk=pf_chunk,
                                 pf_active=active, transfer="p10")
        buf = tiled_buf(Bx)
        st = init_state(Bx, 2)
        ring = jnp.zeros((Bx, FRAME, 2), jnp.float32)
        st, ring, dg = step(st, ring, buf)
        _ = np.asarray(dg)
        best = 1e9
        for _ in range(3):
            t1 = time.perf_counter()
            for _ in range(iters):
                st, ring, dg = step(st, ring, buf)
            _ = np.asarray(dg)
            best = min(best, time.perf_counter() - t1)
        return best / iters

    # Fine sweep: threshold vs gradual, with and without the postfilter.
    for Bx in (4096, 5120, 6144, 7168, 8192):
        for active, label in ((pf_active, "p10"), (False, "p10_nopf")):
            try:
                s = guarded(lambda: time_step(Bx, active), 900)
                log({"phase": label, "B": Bx, "ms": round(s * 1e3, 2),
                     "audio_s_per_s": round(Bx * 0.02 / s, 1)})
            except Exception as e:
                log({"phase": label, "B": Bx, "error": str(e)[:200]})

    # Split-batch: two 4096 steps chained on device vs one 8192 step.
    def split_pair(iters=10):
        step = make_serving_step(lm, 4096, 2, 1, pf_chunk=pf_chunk,
                                 pf_active=pf_active, transfer="p10")
        buf = tiled_buf(4096)
        sts = [init_state(4096, 2) for _ in range(2)]
        rings = [jnp.zeros((4096, FRAME, 2), jnp.float32) for _ in range(2)]
        dg = None
        for h in range(2):
            sts[h], rings[h], dg = step(sts[h], rings[h], buf)
        _ = np.asarray(dg)
        best = 1e9
        for _ in range(3):
            t1 = time.perf_counter()
            for _ in range(iters):
                for h in range(2):
                    sts[h], rings[h], dg = step(sts[h], rings[h], buf)
            _ = np.asarray(dg)
            best = min(best, time.perf_counter() - t1)
        return best / iters  # time for 8192 streams' worth of audio

    try:
        s = guarded(split_pair, 900)
        log({"phase": "split_2x4096", "ms": round(s * 1e3, 2),
             "audio_s_per_s": round(8192 * 0.02 / s, 1)})
    except Exception as e:
        log({"phase": "split_2x4096", "error": str(e)[:200]})

    log({"phase": "done"})


if __name__ == "__main__":
    main()
