"""On-TPU A/B: plan executor rotation stage, XLA ladder vs Pallas kernel.

The rotation stage (two _rot_pass invocations under lax.cond) was ~6 ms
of the 22.7 ms B=1024 plan step as ~32 unfused XLA memory passes
(KNOWN_GAPS.md round-4 diagnosis).  dsp/pallas_rot.py fuses each pass
into one VMEM-resident kernel.  This tool times stop_after="rot" and the
FULL executor in both modes on real 96 kbps stereo plans at B=1024 and
checks output equality.  Appends JSON lines to /tmp/tpu_rotbench.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOG = "/tmp/tpu_rotbench.jsonl"


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
    rt = time.time() - t0
    log({"phase": "probe", "rt_s": round(rt, 2)})
    if rt > 8.0:
        log({"phase": "abort", "reason": "tunnel too slow"})
        return

    rng = np.random.default_rng(3)
    t = np.arange(F * 2) / 48000.0
    # spread-active content (moderate rate -> 2K < N leaves rotate)
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

    outs = {}
    for mode, env in (("xla", "0"), ("pallas", "1")):
        # the gate is read inside make_plan_executor's closure at build
        os.environ["OPUS_TPU_PALLAS_ROT"] = env
        for cname, kw in (("cls112", dict(p_max=112, f_max=8, iyw=128)),
                          ("full", dict())):
            ex_r = jax.jit(make_plan_executor(3, B, stop_after="rot", **kw))
            ex_f = jax.jit(make_plan_executor(3, B, **kw))
            ms_r = timeit(ex_r)
            ms_f = timeit(ex_f)
            if cname == "cls112":
                outs[mode] = np.asarray(ex_f(*args))
            log({"phase": f"rot_{cname}_{mode}", "rot_ms": round(ms_r, 3),
                 "full_ms": round(ms_f, 3)})
    os.environ.pop("OPUS_TPU_PALLAS_ROT", None)
    d = np.abs(outs["xla"] - outs["pallas"])
    log({"phase": "equality", "bitexact": bool((d == 0).all()),
         "max_abs": float(d.max())})
    # guard against silent no-op: the content must actually rotate
    log({"phase": "done", "note": "rot stage includes everything up to rotation"})


if __name__ == "__main__":
    main()
