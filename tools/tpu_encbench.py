"""On-TPU batched encode-plane throughput (VERDICT r4 item 5 'done' row).

Times the two device dispatches of the plan encoder (analyze: preemph +
MDCT matmul + energies + cell stats; search: dense greedy PVQ) at
B in {256, 1024}, device-plane (inputs resident, digest-synced), plus
the full host+device pipeline rate at B=256.  Appends JSON lines to
/tmp/tpu_encbench.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOG = "/tmp/tpu_encbench.jsonl"


def log(obj):
    with open(LOG, "a") as f:
        f.write(json.dumps(obj) + "\n")
    print(obj, flush=True)


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from opus_tpu.batch.encode_pipeline import BatchedPlanEncoder

    t0 = time.time()
    xp = jnp.ones((256, 256))
    np.asarray((xp @ xp)[0, 0])
    rt = time.time() - t0
    log({"phase": "probe", "rt_s": round(rt, 2)})
    if rt > 8.0:
        log({"phase": "abort", "reason": "tunnel too slow"})
        return

    F = 960
    rng = np.random.default_rng(3)
    t = np.arange(F) / 48000.0
    sig = (np.sin(2 * np.pi * 220 * t) * 0.4
           + np.sin(2 * np.pi * 3000 * t) * 0.2
           + rng.standard_normal(F) * 0.05)
    pcm1 = np.stack([sig, np.roll(sig, 13)], -1).astype(np.float32)

    for B in (256, 1024):
        enc = BatchedPlanEncoder(B, 2, 96000)
        pcm = np.broadcast_to(pcm1, (B, F, 2)) * (
            0.5 + 0.5 * np.arange(B)[:, None, None] / B)
        pcm = np.ascontiguousarray(pcm, np.float32)
        pj = jnp.asarray(pcm)
        im, pm = enc._in_mem, enc._pm

        # device-plane: analyze + search timed with resident inputs
        x, band_e, cells, dots, im2, pm2 = enc._ana(pj, im, pm)
        be = np.asarray(band_e)
        ce = np.asarray(cells)
        do = np.asarray(dots)
        lv = np.zeros((B, enc.P_MAX, 4), np.int32)
        bo = np.zeros((B, 21, 4), np.float32)
        leaves, bops = enc.hosts[0].plan_frame(be[0], ce[0], do[0],
                                               enc.frame_bytes(), 3)
        lv[:, : len(leaves)] = leaves[None]
        bo[:] = bops[None]
        lvj, boj = jnp.asarray(lv), jnp.asarray(bo)

        def dev_step():
            xa, be_, ce_, do_, i2, p2 = enc._ana(pj, im, pm)
            iy, left = enc._srch(xa, boj, lvj)
            jax.block_until_ready((iy, left, be_, ce_, do_))

        dev_step()
        best = 1e9
        iters = 10
        for _ in range(3):
            t1 = time.perf_counter()
            for _ in range(iters):
                dev_step()
            best = min(best, (time.perf_counter() - t1) / iters)
        log({"phase": f"device_plane_B{B}", "ms_per_step": round(best * 1e3, 2),
             "audio_s_encoded_per_s": round(B * 0.02 / best, 1)})

    # full pipeline (host plan/emit + device) at B=256
    B = 256
    enc = BatchedPlanEncoder(B, 2, 96000)
    pcm = np.ascontiguousarray(
        np.broadcast_to(pcm1, (B, F, 2))
        * (0.5 + 0.5 * np.arange(B)[:, None, None] / B), np.float32)
    enc.encode_step(pcm)  # warm
    best = 1e9
    for _ in range(3):
        t1 = time.perf_counter()
        enc.encode_step(pcm)
        best = min(best, time.perf_counter() - t1)
    log({"phase": "e2e_B256", "ms_per_step": round(best * 1e3, 2),
         "audio_s_encoded_per_s": round(B * 0.02 / best, 1)})
    log({"phase": "done"})


if __name__ == "__main__":
    main()
