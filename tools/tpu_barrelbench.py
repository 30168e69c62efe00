"""On-TPU A/B for the plan executor's leaves stage (merged window fetch).

2026-08-19 bisect: leaves = 8.0 ms at B=1024 — one [B, ~460-word]
element gather from the packed plan arena (per-element gathers price
~18 ms/M on this chip).  Every per-stream window start is a SCALAR
offset, so the fetch has row-uniform shift structure and can become:

  block-row take: arena reshaped [nblk, 256]; each stream takes 4
     contiguous 256-word rows (a slice-gather XLA lowers to row DMAs,
     not element fetches) covering [hdr_off & ~255, +1024)
  + an 8-stage row-UNIFORM barrel (roll + per-row select) aligning the
     residue hdr_off & 255.  Row-uniform shifts compose exactly (the
     select bit is constant along each row), unlike per-position
     shifts, which is why this pattern applies to the leaves fetch but
     NOT to the iy word fetch or the rotation's banded permutes.

Also times the static-layout ceiling (row-aligned upload, zero device
work) to bound what a C++ re-layout of the arena would buy.

Appends JSON lines to /tmp/tpu_barrelbench.jsonl.  Run inside a usable
tunnel window (probe rt < 5 s).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOG = "/tmp/tpu_barrelbench.jsonl"


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

    B = 1024
    # size-class widths measured for 96 kbps stereo music (DEVICE_PROFILE)
    P, F, A, IYW = 112, 8, 42, 128
    W = 2 * P + 3 * F + 2 * A + IYW  # merged leaves window, words (=460)

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

    rng = np.random.default_rng(0)
    AW = B * 300
    arena = jnp.asarray(rng.integers(0, 2**31, AW).astype(np.int32))
    hdr_np = np.sort(rng.integers(0, AW - 2 * W, B)).astype(np.int32)
    hdr = jnp.asarray(hdr_np)

    def timeit(fn, args, iters=20):
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

    # ---- current: one merged element gather [B, W] -------------------------
    def leaves_gather(off):
        idx = off[:, None] + jnp.arange(W)[None, :]
        return jnp.take(arena, jnp.clip(idx, 0, AW - 1)).astype(jnp.float32).sum()

    # ---- current at FULL (non-size-classed) width for reference ------------
    WFULL = 2 * 192 + 3 * 64 + 2 * 42 + 192
    def leaves_gather_full(off):
        idx = off[:, None] + jnp.arange(WFULL)[None, :]
        return jnp.take(arena, jnp.clip(idx, 0, AW - 1)).astype(jnp.float32).sum()

    # ---- block-row take + row-uniform barrel --------------------------------
    NBLK = AW // 256 + 4
    pad_a = jnp.pad(arena, (0, NBLK * 256 - AW))

    def leaves_blockrow(off):
        a2 = pad_a.reshape(NBLK, 256)
        blk0 = off >> 8
        rows = jnp.take(a2, blk0[:, None] + jnp.arange(4)[None, :], axis=0)
        x = rows.reshape(B, 1024)
        s = off & 255
        for k in range(8):
            bit = ((s >> k) & 1).astype(bool)
            x = jnp.where(bit[:, None], jnp.roll(x, -(1 << k), axis=1), x)
        return x[:, :W].astype(jnp.float32).sum()

    # variant: 512-word blocks (2 rows + 1 overflow)
    NBLK5 = AW // 512 + 4
    pad_a5 = jnp.pad(arena, (0, NBLK5 * 512 - AW))

    def leaves_blockrow512(off):
        a2 = pad_a5.reshape(NBLK5, 512)
        blk0 = off >> 9
        rows = jnp.take(a2, blk0[:, None] + jnp.arange(2)[None, :], axis=0)
        x = rows.reshape(B, 1024)
        s = off & 511
        for k in range(9):
            bit = ((s >> k) & 1).astype(bool)
            x = jnp.where(bit[:, None], jnp.roll(x, -(1 << k), axis=1), x)
        return x[:, :W].astype(jnp.float32).sum()

    # ---- dynamic_slice scan over streams (XLA fori, DMA-like) --------------
    def leaves_dynslice(off):
        def body(i, acc):
            w = jax.lax.dynamic_slice(pad_a, (off[i],), (W,))
            return acc.at[i].set(w)
        out = jax.lax.fori_loop(0, B, body, jnp.zeros((B, W), jnp.int32))
        return out.astype(jnp.float32).sum()

    # ---- ceiling: row-aligned upload, zero device work ----------------------
    rows_static = jnp.asarray(rng.integers(0, 2**31, (B, 512)).astype(np.int32))

    def leaves_static(x):
        return x[:, :W].astype(jnp.float32).sum()

    # correctness cross-check of the blockrow barrel vs the gather (numpy)
    idx = hdr_np[:, None] + np.arange(W)[None, :]
    ref = np.asarray(arena)[np.clip(idx, 0, AW - 1)]
    a2n = np.asarray(pad_a).reshape(NBLK, 256)
    got = a2n[(hdr_np >> 8)[:, None] + np.arange(4)[None, :]].reshape(B, 1024)
    s = hdr_np & 255
    for k in range(8):
        bit = ((s >> k) & 1).astype(bool)
        got = np.where(bit[:, None], np.roll(got, -(1 << k), axis=1), got)
    assert (got[:, :W] == ref).all(), "blockrow barrel mismatch"
    log({"phase": "leaves_check", "ok": True})

    for name, fn, args in [
        ("leaves_gather_460", leaves_gather, (hdr,)),
        ("leaves_gather_full_852", leaves_gather_full, (hdr,)),
        ("leaves_blockrow_256", leaves_blockrow, (hdr,)),
        ("leaves_blockrow_512", leaves_blockrow512, (hdr,)),
        ("leaves_dynslice_scan", leaves_dynslice, (hdr,)),
        ("leaves_static_ceiling", leaves_static, (rows_static,)),
    ]:
        try:
            ms = guarded(lambda: timeit(jax.jit(fn), args), 300)
            log({"phase": name, "ms": round(ms, 3)})
        except Exception as e:  # noqa: BLE001
            log({"phase": name, "error": str(e)[:200]})

    log({"phase": "done"})


if __name__ == "__main__":
    main()
