"""On-TPU A/B: plan executor with gather vs block-row leaves fetch.

Times the leaves stage digest (stop_after="leaves") and the FULL executor
at B=1024 for the headline size class (112, 8, 128) and full capacity,
on real plan slots built from libopus-encoded 96 kbps stereo music.
Appends JSON lines to /tmp/tpu_leaves_ab.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOG = "/tmp/tpu_leaves_ab.jsonl"


def log(obj):
    with open(LOG, "a") as f:
        f.write(json.dumps(obj) + "\n")
    print(obj, flush=True)


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from opus_tpu import oracle
    from opus_tpu.packet import parse_packet
    from opus_tpu.native.frontend import NativeBatchFrontEnd
    from opus_tpu.dsp.plan_exec import make_plan_executor, plan_executor_args

    B, F = 1024, 960
    t0 = time.time()
    x = jnp.ones((256, 256))
    np.asarray((x @ x)[0, 0])
    log({"phase": "probe", "rt_s": round(time.time() - t0, 2)})

    rng = np.random.default_rng(3)
    t = np.arange(F * 2) / 48000.0
    sig = (np.sin(2 * np.pi * 220 * t) * 0.4
           + np.sin(2 * np.pi * 3000 * t) * 0.2
           + rng.standard_normal(F * 2) * 0.05)
    enc = oracle.Encoder(48000, 2)
    enc.ctl(oracle.SET_BITRATE, 96000)
    enc.ctl(oracle.SET_FORCE_MODE, oracle.MODE_CELT_ONLY)
    pcm = np.stack([sig, np.roll(sig, 13)], -1).astype(np.float32)
    pks = [enc.encode_float(pcm[i * F : (i + 1) * F].ravel(), F) for i in range(2)]
    payload = pks[1][parse_packet(pks[1]).payload_offset :]

    fe = NativeBatchFrontEnd(B, 2, 1)
    slot = fe.alloc_plan_slots(1)[0]
    slot = fe.decode_batch_plan_into([payload] * B, F, slot)
    args = tuple(map(jnp.asarray, plan_executor_args(slot)))

    def timeit(fn, iters=20):
        out = fn(*args)
        jax.tree_util.tree_map(lambda a: np.asarray(a), out)
        best = 1e9
        for _ in range(3):
            t1 = time.perf_counter()
            for _ in range(iters):
                out = fn(*args)
            jax.tree_util.tree_map(lambda a: np.asarray(a), out)
            best = min(best, time.perf_counter() - t1)
        return best / iters * 1e3

    # Class-fit guard (ADVICE r4): the sub-capacity class A/B is only
    # meaningful if the stream actually fits (112, 8, 128) — past the
    # caps BOTH modes produce truncated-table garbage and the bitexact
    # line proves nothing.  Mirror the unit test's fits_small check.
    counts = slot["header"][:, 1]
    fits_small = (int((counts & 0x1FF).max()) <= 112
                  and int(((counts >> 9) & 0x1FF).max()) <= 8
                  and int(slot["iy_spans"].max()) <= 127)
    classes = [("cls112", dict(p_max=112, f_max=8, iyw=128)),
               ("full", dict())]
    if not fits_small:
        log({"phase": "cls112_class_overflow",
             "n_pvq_max": int((counts & 0x1FF).max()),
             "n_fill_max": int(((counts >> 9) & 0x1FF).max()),
             "iy_span_max": int(slot["iy_spans"].max())})
        classes = classes[1:]
    for cname, kw in classes:
        outs = {}
        for mode in ("gather", "blockrow"):
            ex_l = jax.jit(make_plan_executor(3, B, leaves_fetch=mode,
                                              stop_after="leaves", **kw))
            ex_f = jax.jit(make_plan_executor(3, B, leaves_fetch=mode, **kw))
            ms_l = timeit(ex_l)
            ms_f = timeit(ex_f)
            outs[mode] = np.asarray(ex_f(*args))
            log({"phase": f"{cname}_{mode}", "leaves_ms": round(ms_l, 3),
                 "full_ms": round(ms_f, 3)})
        same = bool((outs["gather"] == outs["blockrow"]).all())
        log({"phase": f"{cname}_bitexact", "ok": same})

    log({"phase": "done"})


if __name__ == "__main__":
    main()
