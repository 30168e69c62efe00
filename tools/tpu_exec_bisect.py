"""On-TPU bisect of the plan executor: which stage eats the 766 ms?

The 2026-08-17 tunnel window showed the plan serving step at 781 ms vs
15 ms for the p10 step with the SAME on-device buffer — the executor
itself is ~50x too slow on TPU, and CPU profiles don't reproduce it
(XLA:TPU lowers scatter/gather very differently).  This tool times

  * the executor compiled to stop after each stage (plan_exec.py
    make_plan_executor stop_after), so stage cost = successive diffs;
  * the suspect primitives in isolation at serving shapes (scatter-add,
    take_along_axis, flat-arena gather, associative_scan, cumsum, and
    the candidate compare-reduce / one-hot-matmul replacements),

and appends JSON lines to /tmp/tpu_exec_bisect.jsonl.  Run inside a
usable tunnel window (probe rt < 5 s — tools/tpu_window_bench.py).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOG = "/tmp/tpu_exec_bisect.jsonl"


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
    import jax
    import jax.numpy as jnp

    from opus_tpu import oracle, parse_packet
    from opus_tpu.native.frontend import NativeBatchFrontEnd
    from opus_tpu.dsp.plan_exec import make_plan_executor, plan_executor_args

    B, FRAME, NSRC = 1024, 960, 16

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
    step_pk = [pays[i % NSRC] for i in range(B)]

    fe = NativeBatchFrontEnd(B, 2)
    slots = fe.alloc_plan_slots(1)
    slot = fe.decode_batch_plan_into(step_pk, FRAME, slots[0])
    header, bands, meta, arena = (jnp.asarray(a) for a in plan_executor_args(slot))

    def timeit(fn, args, iters=10):
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

    # --- headline first: the full executor (one compile) ---
    try:
        fn = jax.jit(make_plan_executor(3, B))
        ms = guarded(lambda: timeit(fn, (header, bands, meta, arena)), 600)
        log({"phase": "executor_full", "ms": round(ms, 2)})
    except Exception as e:  # noqa: BLE001
        log({"phase": "executor_full", "error": str(e)[:200]})

    # --- primitive microbenches at serving shapes ---
    n2, P, F = 1920, 192, 12
    rng = np.random.default_rng(0)
    flatd = jnp.asarray(np.sort(rng.integers(0, n2, (B, P)), axis=1).astype(np.int32))
    lnj = jnp.asarray(rng.integers(1, 12, (B, P)).astype(np.int32))
    fields = jnp.asarray(rng.standard_normal((B, P, F)).astype(np.float32))
    lidc = jnp.asarray(rng.integers(0, P, (B, n2)).astype(np.int32))
    tbl = jnp.asarray(rng.standard_normal((B, P)).astype(np.float32))
    aw = arena.shape[0]
    fidx = jnp.asarray(rng.integers(0, aw, (B, n2)).astype(np.int32))
    xplane = jnp.asarray(rng.standard_normal((B, n2)).astype(np.float32))

    bidx = jnp.arange(B)[:, None]

    def _hillis(a, b):
        A, Bv = a, b
        span = 1
        while span < 256:
            Ash = jnp.pad(A, ((0, 0), (span, 0)), constant_values=1.0)[:, :-span]
            Bsh = jnp.pad(Bv, ((0, 0), (span, 0)))[:, :-span]
            A, Bv = A * Ash, A * Bsh + Bv
            span *= 2
        return Bv

    def _bperm(xsrc, idx):
        # worst-case banded permute: delta spread across the full band
        pos = jnp.arange(n2)[None, :]
        delta = ((idx * 7919) % 351) - 175
        dmax = jnp.max(jnp.abs(delta))
        xp_ = jnp.pad(xsrc, ((0, 0), (176, 176)))
        out = jnp.where(delta == 0, xsrc, 0.0)

        def body(c):
            d, acc = c
            sp = jax.lax.dynamic_slice(xp_, (0, 176 + d), (B, n2))
            sm = jax.lax.dynamic_slice(xp_, (0, 176 - d), (B, n2))
            return d + 1, (acc + jnp.where(delta == d, sp, 0.0)
                           + jnp.where(delta == -d, sm, 0.0))

        _, out = jax.lax.while_loop(lambda c: c[0] <= dmax, body,
                                    (jnp.int32(1), out))
        return out + pos * 0.0

    prims = {
        # the position_map scatter as written today
        "scatter_add": jax.jit(lambda d: jnp.zeros((B, n2 + 1), jnp.int32)
                               .at[bidx, d].add(1)[:, :n2].sum()),
        # candidate replacement: compare-reduce marks
        "marks_cmpreduce": jax.jit(lambda d: (
            (d[:, None, :] == jnp.arange(n2)[None, :, None]).sum(-1).sum())),
        # leaf-field -> position gather as written today
        "taa_B_n2_from_P": jax.jit(lambda t, i: jnp.take_along_axis(t, i, axis=1).sum()),
        # candidate replacement: interval one-hot matmul (bf16 mask on MXU)
        "interval_einsum": jax.jit(lambda d, l, f: jnp.einsum(
            "bnp,bpf->bnf",
            ((d[:, None, :] <= jnp.arange(n2)[None, :, None])
             & (jnp.arange(n2)[None, :, None] < d[:, None, :] + l[:, None, :])
             ).astype(jnp.bfloat16),
            f.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32).sum()),
        # the executor's actual field einsum (f32 masks)
        "interval_einsum_f32": jax.jit(lambda d, l, f: jnp.einsum(
            "bnp,bpf->bnf",
            ((d[:, None, :] <= jnp.arange(n2)[None, :, None])
             & (jnp.arange(n2)[None, :, None] < d[:, None, :] + l[:, None, :])
             ).astype(jnp.float32),
            f, preferred_element_type=jnp.float32).sum()),
        # same-shape batched permutation gather (rotation chain permute)
        "taa_same_shape": jax.jit(lambda x, i: jnp.take_along_axis(
            x, (i * 7919) % n2, axis=1).sum()),
        # flat-arena gather (iy word fetch shape)
        "flat_gather_2M": jax.jit(lambda i: jnp.take(arena, i).astype(jnp.float32).sum()),
        # first-order segmented scan (rotation passes)
        "assoc_scan_pair": jax.jit(lambda x: jax.lax.associative_scan(
            lambda a, b: (b[0] * a[0], b[0] * a[1] + b[1]), (x, x), axis=-1)[1].sum()),
        "cumsum_int": jax.jit(lambda i: jnp.cumsum(i * i, axis=1).sum()),
        # the executor's current formulations (2026-08-18 rewrites)
        "hillis_scan8": jax.jit(lambda x: _hillis(x, x).sum()),
        "banded_permute_wl": jax.jit(lambda x, i: _bperm(x, i).sum()),
        "row_take_384": jax.jit(lambda o: jnp.take(
            arena, jnp.clip(o[:, None] + jnp.arange(384)[None, :], 0, aw - 1)
        ).astype(jnp.float32).sum()),
    }
    argmap = {
        "scatter_add": (flatd,),
        "marks_cmpreduce": (flatd,),
        "taa_B_n2_from_P": (tbl, lidc),
        "interval_einsum": (flatd, lnj, fields),
        "interval_einsum_f32": (flatd, lnj, fields),
        "taa_same_shape": (xplane, lidc),
        "flat_gather_2M": (fidx,),
        "assoc_scan_pair": (xplane,),
        "cumsum_int": (lidc,),
        "hillis_scan8": (xplane,),
        "banded_permute_wl": (xplane, lidc),
        "row_take_384": (jnp.asarray(rng.integers(0, aw - 400, B).astype(np.int32)),),
    }
    for name, fn in prims.items():
        try:
            ms = guarded(lambda: timeit(fn, argmap[name]), 600)
            log({"phase": f"prim_{name}", "ms": round(ms, 3)})
        except Exception as e:  # noqa: BLE001
            log({"phase": f"prim_{name}", "error": str(e)[:200]})

    # --- stage bisect last (eight slow compiles; a short window still
    # yields the headline + primitive numbers above) ---
    prev = 0.0
    for s in ["leaves", "posmap", "iy", "norm", "noise", "rot", "bands"]:
        try:
            fn = jax.jit(make_plan_executor(3, B, stop_after=s))
            ms = guarded(lambda: timeit(fn, (header, bands, meta, arena)), 600)
            log({"phase": f"stage_{s}", "ms": round(ms, 2),
                 "delta_ms": round(ms - prev, 2)})
            prev = ms
        except Exception as e:  # noqa: BLE001
            log({"phase": f"stage_{s}", "error": str(e)[:200]})

    log({"phase": "done"})


if __name__ == "__main__":
    main()
