"""Benchmark: batched CELT decode throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Metric: end-to-end audio-seconds decoded per wall second per chip at 1024
concurrent 48 kHz stereo streams (BASELINE.json north star = 5000x):
plane A (native C++ entropy front end, this host's cores) feeding plane B
(batched TPU synthesis).  Per-plane rates are reported in the extras.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def main() -> None:
    from opus_tpu import oracle, parse_packet
    from opus_tpu.batch.pipeline import BatchedCeltDecoder
    from opus_tpu.dsp.synthesis import init_state, make_synthesis_step

    BATCH = 1024
    FRAME = 960  # 20 ms @ 48 kHz
    SEED_STREAMS = 8

    # --- real libopus packets to feed the pipeline -------------------------
    enc = oracle.Encoder(48000, 2)
    enc.ctl(oracle.SET_FORCE_MODE, oracle.MODE_CELT_ONLY)
    enc.ctl(oracle.SET_BITRATE, 96000)
    rng = np.random.default_rng(1)
    t = np.arange(FRAME * 4) / 48000.0
    sig = 0.4 * np.sin(2 * np.pi * 440 * t) + 0.1 * rng.standard_normal(t.size)
    pcm = np.stack([sig, 0.8 * np.roll(sig, 7)], -1).astype(np.float32)
    pkts = [enc.encode_float(pcm[f * FRAME : (f + 1) * FRAME].ravel(), FRAME) for f in range(4)]
    payloads = [p[parse_packet(p).payload_offset :] for p in pkts]

    # --- Plane A: native C++ entropy front end, full batch -----------------
    front = BatchedCeltDecoder(BATCH, 2, use_native=True)
    batch_payloads = [payloads[i % len(payloads)] for i in range(BATCH)]
    stacked, lm0, _short = front.extract_stacked(batch_payloads, FRAME)  # warm
    # Best-of-7: the sandbox shares its single host core, so mean timings
    # absorb scheduler noise; the minimum is the achievable rate.
    host_elapsed = float("inf")
    for _ in range(7):
        t0 = time.perf_counter()
        stacked, lm0, _short = front.extract_stacked(batch_payloads, FRAME)
        host_elapsed = min(host_elapsed, time.perf_counter() - t0)
    host_rate = BATCH * 0.02 / host_elapsed  # audio-sec/sec on this host

    # Python reference plane A rate (small sample; ~200x slower).
    pyfront = BatchedCeltDecoder(SEED_STREAMS, 2, use_native=False)
    t0 = time.perf_counter()
    pyfront.extract(payloads[:1] * SEED_STREAMS, FRAME)
    py_host_rate = SEED_STREAMS * 0.02 / (time.perf_counter() - t0)

    # --- Plane B: batched synthesis at BATCH streams ------------------------
    import jax.numpy as jnp

    lm = lm0
    step = make_synthesis_step(lm=lm, short_blocks=False, channels=2, downsample=1)
    arrays = [jnp.asarray(a) for a in stacked]
    state = init_state(BATCH, 2)
    state, out = step(state, *arrays)  # compile
    out.block_until_ready()

    iters = 50
    times = []
    for _ in range(iters):
        t1 = time.perf_counter()
        state, out = step(state, *arrays)
        out.block_until_ready()
        times.append(time.perf_counter() - t1)
    p50 = float(np.median(times))
    audio_sec_per_step = BATCH * (FRAME / 48000.0)
    device_rate = audio_sec_per_step / p50

    # --- End-to-end: serial sum of the two planes on THIS testbed (the
    # sandbox exposes one host core; plane A is OpenMP-parallel and scales
    # linearly with host cores on a real v5e host).
    cores = os.cpu_count() or 1
    e2e_rate = audio_sec_per_step / (host_elapsed + p50)
    projected_16core = audio_sec_per_step / (host_elapsed * min(cores, 16) / 16 + p50)

    # --- Device-plane scaling (extras): one chip is latency-bound below
    # ~4k streams; measure the throughput-bound regime too.
    device_rate_8k = 0.0
    try:
        B8 = 8192
        reps = B8 // BATCH
        arrays8 = [jnp.asarray(np.concatenate([np.asarray(a)] * reps, axis=0)) for a in stacked]
        state8 = init_state(B8, 2)
        state8, out8 = step(state8, *arrays8)
        out8.block_until_ready()
        best = float("inf")
        for _ in range(5):
            t1 = time.perf_counter()
            state8, out8 = step(state8, *arrays8)
            out8.block_until_ready()
            best = min(best, time.perf_counter() - t1)
        device_rate_8k = B8 * (FRAME / 48000.0) / best
    except Exception:
        pass

    # --- SILK voice path (extras): native host engine + TPU device plane ---
    silk_host_rate = silk_device_rate = 0.0
    try:
        from opus_tpu.native.frontend import NativeSilkBatch, available as _nat_ok

        senc = oracle.Encoder(16000, 1)
        senc.ctl(oracle.SET_FORCE_MODE, oracle.MODE_SILK_ONLY)
        senc.ctl(oracle.SET_BITRATE, 24000)
        st = np.arange(320 * 4) / 16000.0
        sphase = np.cumsum(2 * np.pi * (120 + 30 * np.sin(2 * np.pi * 3 * st)) / 16000)
        ssig = (0.35 * np.sign(np.sin(sphase)) + 0.02 * rng.standard_normal(st.size)).astype(np.float32)
        spkts = [senc.encode_float(ssig[f * 320 : (f + 1) * 320], 320) for f in range(4)]
        spays = [p[parse_packet(p).payload_offset :] for p in spkts]
        if _nat_ok():
            SB = 256
            nb = NativeSilkBatch(SB, 16)
            batch = [spays[i % 4] for i in range(SB)]
            nb.decode_batch(batch)  # warm
            best = float("inf")
            for _ in range(7):
                t0 = time.perf_counter()
                nb.decode_batch(batch)
                best = min(best, time.perf_counter() - t0)
            silk_host_rate = SB * 0.02 / best
            # Device plane: batched float synthesis over native-extracted
            # parameter planes (gains*exc, LPC, LTP taps, rewhitened head).
            from opus_tpu.dsp.silk_synthesis import silk_synthesis_step
            from opus_tpu.native.frontend import NativeSilkFrontEnd

            nf = NativeSilkFrontEnd(16)
            planes = [nf.decode(p, want_planes=True)[1] for p in spays]
            SD = 1024

            def stack(key):
                return jnp.asarray(np.stack([planes[i % 4][key] for i in range(SD)]))

            args = (stack("gexc"), stack("a1"), stack("a2"),
                    jnp.asarray(np.array([planes[i % 4]["voiced"] for i in range(SD)])),
                    stack("lags"), stack("b"), stack("head"),
                    jnp.zeros((SD, 16), jnp.float32))
            xq, _h = silk_synthesis_step(*args, subfr_len=80, nb_subfr=4, chunk=20)
            xq.block_until_ready()
            best = float("inf")
            for _ in range(10):
                t0 = time.perf_counter()
                xq, _h = silk_synthesis_step(*args, subfr_len=80, nb_subfr=4, chunk=20)
                xq.block_until_ready()
                best = min(best, time.perf_counter() - t0)
            silk_device_rate = SD * 0.02 / best
    except Exception:
        pass

    result = {
        "metric": "audio_sec_decoded_per_sec_per_chip",
        "value": round(e2e_rate, 1),
        "unit": "audio-sec/s end-to-end (48kHz stereo, 1024 streams, native C++ plane A + TPU plane B)",
        "vs_baseline": round(e2e_rate / 5000.0, 3),
        "device_plane_audio_sec_per_sec": round(device_rate, 1),
        "device_plane_8192_streams_audio_sec_per_sec": round(device_rate_8k, 1),
        "p50_step_ms": round(p50 * 1e3, 3),
        "host_plane_native_audio_sec_per_sec_per_core": round(host_rate, 1),
        "host_plane_python_audio_sec_per_sec_per_core": round(py_host_rate, 2),
        "host_cores": cores,
        "e2e_projected_16_host_cores": round(projected_16core, 1),
        "silk_host_native_audio_sec_per_sec_per_core": round(silk_host_rate, 1),
        "silk_device_plane_audio_sec_per_sec": round(silk_device_rate, 1),
        "realtime_factor_per_chip": round(e2e_rate, 1),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
