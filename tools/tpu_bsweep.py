"""Batch-size sweep of the serving step on real TPU: diagnose the
B=8192 regression (VERDICT r2 weak #3: 740 audio-s/s at 8192 vs 1400 at
1024 — throughput should be monotone in B).

For each B in the sweep, measures true-synced chained step time (digest
fetch, not block_until_ready) for:
  * plan serving step (the serving default),
  * plan step with the postfilter compiled out (pf_active=False),
  * p10 packed step (round-2 bench comparable).

Appends JSON lines to /tmp/tpu_bsweep.jsonl.  Run only inside a usable
tunnel window (tools/tpu_window_bench.py probe says rt < 5 s).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOG = "/tmp/tpu_bsweep.jsonl"


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
    from opus_tpu.batch.pipeline import BatchedCeltDecoder
    from opus_tpu.dsp.synthesis import init_state, pf_chunk_for

    FRAME, NSRC = 960, 16
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

    sweep = [int(x) for x in os.environ.get("BSWEEP", "1024,2048,4096,8192").split(",")]
    for B in sweep:
        step_pk = [pays[i % NSRC] for i in range(B)]
        front = BatchedCeltDecoder(B, 2, use_native=True, transfer="plan")

        slots = front.native.alloc_plan_slots(1)
        slot = front.native.decode_batch_plan_into(step_pk, FRAME, slots[0])
        meta = slot["meta"]
        pf_chunk, pf_active = pf_chunk_for(meta[:, 6:9], slot["gains"])
        arena_used = slot["used_words"] - slot["fixed_words"]
        per = -(-arena_used // B)
        bucket = next(bw for bw in front.PLAN_BUCKETS if bw >= per)
        plan_buf = jnp.asarray(slot["buf"][: slot["fixed_words"] + B * bucket])

        # p10 slots need a p10-mode front: _serving_step specialises its
        # unpack on the front's transfer mode.
        fp10 = BatchedCeltDecoder(B, 2, use_native=True, transfer="p10")
        p10 = fp10.native.alloc_packed_slots(1, "p10")
        fp10.native.decode_batch_q15_into(step_pk, FRAME, p10[0])
        p10_buf = jnp.asarray(p10[0]["buf"])

        def run(sstep, buf, label, iters=20):
            st = init_state(B, 2)
            ring = jnp.zeros((B, FRAME, 2), jnp.float32)
            st, ring, dg = sstep(st, ring, buf)
            _ = np.asarray(dg)
            best = 1e9
            for _ in range(3):
                t1 = time.perf_counter()
                for _ in range(iters):
                    st, ring, dg = sstep(st, ring, buf)
                _ = np.asarray(dg)
                best = min(best, time.perf_counter() - t1)
            ms = best / iters * 1e3
            log({"phase": label, "B": B, "ms": round(ms, 2),
                 "audio_s_per_s": round(B * 0.02 / (ms / 1e3), 1)})

        for label, mk in (
            ("plan", lambda: front._plan_serving_step(3, pf_chunk, pf_active, bucket)),
            ("plan_nopf", lambda: front._plan_serving_step(3, pf_chunk, False, bucket)),
            ("p10", lambda: fp10._serving_step(3, pf_chunk, pf_active)),
        ):
            try:
                guarded(lambda: run(mk(), plan_buf if label.startswith("plan") else p10_buf,
                                    label), 900)
            except Exception as e:
                log({"phase": label, "B": B, "error": str(e)[:200]})
        del front, fp10, plan_buf, p10_buf, slots, p10

    log({"phase": "done"})


if __name__ == "__main__":
    main()
