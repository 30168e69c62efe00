"""Benchmark: batched CELT decode throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Metric: audio-seconds decoded per wall second per chip on the device
synthesis plane at 1024 concurrent 48 kHz stereo streams (BASELINE.json).
The sequential entropy plane (host Python for now; C++ engine is a later
milestone) is measured separately and reported in the extras.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax

    from opus_tpu import oracle, query_packet_channel_count
    from opus_tpu.batch.pipeline import BatchedCeltDecoder
    from opus_tpu.dsp.synthesis import init_state, make_synthesis_step

    BATCH = 1024
    FRAME = 960  # 20 ms @ 48 kHz
    SEED_STREAMS = 8

    # --- Plane A sample: real libopus packets through the entropy plane ---
    enc = oracle.Encoder(48000, 2)
    enc.ctl(oracle.SET_FORCE_MODE, oracle.MODE_CELT_ONLY)
    enc.ctl(oracle.SET_BITRATE, 96000)
    rng = np.random.default_rng(1)
    t = np.arange(FRAME * 4) / 48000.0
    sig = 0.4 * np.sin(2 * np.pi * 440 * t) + 0.1 * rng.standard_normal(t.size)
    pcm = np.stack([sig, 0.8 * np.roll(sig, 7)], -1).astype(np.float32)
    pkts = [enc.encode_float(pcm[f * FRAME : (f + 1) * FRAME].ravel(), FRAME) for f in range(4)]

    front = BatchedCeltDecoder(SEED_STREAMS, 2)
    t0 = time.perf_counter()
    n_front_frames = 0
    planes = None
    for pkt in pkts:
        for fr in front.fronts:
            fr.stream_channels = int(query_packet_channel_count(pkt))
        planes = front.extract([pkt[1:]] * SEED_STREAMS, FRAME)
        n_front_frames += SEED_STREAMS
    host_elapsed = time.perf_counter() - t0
    host_rate = n_front_frames * 0.02 / host_elapsed  # audio-sec/sec, 1 core

    # --- Plane B: batched synthesis at BATCH streams ----------------------
    lm = planes[0]["lm"]
    step = make_synthesis_step(lm=lm, short_blocks=planes[0]["short_blocks"], channels=2, downsample=1)
    arrays = front._stack(planes, list(range(SEED_STREAMS)), lm)
    reps = BATCH // SEED_STREAMS
    import jax.numpy as jnp

    tiled = [jnp.asarray(np.concatenate([a] * reps, axis=0)) for a in arrays]
    state = init_state(BATCH, 2)

    # Warm up / compile.
    state, out = step(state, *tiled)
    out.block_until_ready()

    iters = 50
    times = []
    for _ in range(iters):
        t1 = time.perf_counter()
        state, out = step(state, *tiled)
        out.block_until_ready()
        times.append(time.perf_counter() - t1)
    times = np.array(times)
    p50 = float(np.median(times))
    audio_sec_per_step = BATCH * (FRAME / 48000.0)
    device_rate = audio_sec_per_step / p50

    result = {
        "metric": "audio_sec_decoded_per_sec_per_chip",
        "value": round(device_rate, 1),
        "unit": "audio-sec/s (48kHz stereo, 1024 streams, device synthesis plane)",
        "vs_baseline": round(device_rate / 5000.0, 3),
        "p50_step_ms": round(p50 * 1e3, 3),
        "host_entropy_plane_audio_sec_per_sec_1core_python": round(host_rate, 2),
        "realtime_factor_per_chip": round(device_rate, 1),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
