"""Device-plane profiling: per-kernel costs of the batched synthesis step.

Produces:
  * docs/profiles/<ts>/ — a jax.profiler trace (open with xprof/tensorboard)
  * stage timings printed as markdown rows for docs/DEVICE_PROFILE.md

Stages are measured by compiling truncated variants of the CELT synthesis
step (denormalise -> +IMDCT -> +overlap -> +postfilter -> +deemphasis) and
differencing their step times, which is robust where trace attribution is
fused away by XLA.

Usage: python tools/profile_device.py [batch]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main() -> None:
    import jax
    import jax.numpy as jnp

    from opus_tpu.dsp import synthesis as S

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    lm, channels = 3, 2
    n = 960
    rng = np.random.default_rng(0)
    state = S.init_state(B, channels)
    x = jnp.asarray(rng.standard_normal((B, channels, n)).astype(np.float32) * 0.1)
    loge = jnp.asarray(rng.standard_normal((B, channels, 21)).astype(np.float32))
    bound = jnp.full((B,), 800, jnp.int32)
    periods = jnp.tile(jnp.asarray([[120, 120, 240]], jnp.int32), (B, 1))
    gains = jnp.tile(jnp.asarray([[0.1875, 0.1875, 0.375]], jnp.float32), (B, 1))
    tapsets = jnp.zeros((B, 3), jnp.int32)

    def timed(fn, *args, iters=30):
        out = fn(*args)
        jax.block_until_ready(out)
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            out = fn(*args)
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)) * 1e3

    # Truncated variants.
    @jax.jit
    def s_denorm(x, loge, bound):
        return S._denormalise(x, loge, lm, bound)

    @jax.jit
    def s_imdct(x, loge, bound):
        return S._imdct_blocks(S._denormalise(x, loge, lm, bound), lm, False)

    @jax.jit
    def s_overlap(state, x, loge, bound):
        freq = S._denormalise(x, loge, lm, bound)
        mids = S._imdct_blocks(freq, lm, False)
        half = S.OVERLAP // 2
        from opus_tpu.celt.decoder import DECODE_BUFFER_SIZE

        prev_tail = state.mem[..., DECODE_BUFFER_SIZE : DECODE_BUFFER_SIZE + half]
        return S._overlap_add(mids, prev_tail, lm, False)

    full = S.make_synthesis_step(lm, False, channels, 1)

    t_denorm = timed(s_denorm, x, loge, bound)
    t_imdct = timed(s_imdct, x, loge, bound)
    t_overlap = timed(s_overlap, state, x, loge, bound)
    t_full = timed(full, state, x, loge, bound, periods, gains, tapsets)

    audio_s = B * (n / 48000.0)
    print(f"| stage (B={B}, 20 ms stereo) | step ms | marginal ms | audio-s/s |")
    print("|---|---|---|---|")
    rows = [
        ("denormalise (VPU gather+mul)", t_denorm, t_denorm),
        ("+ IMDCT matmul (MXU)", t_imdct, t_imdct - t_denorm),
        ("+ TDAC overlap (VPU)", t_overlap, t_overlap - t_imdct),
        ("+ postfilter scan + de-emphasis + state (full)", t_full, t_full - t_overlap),
    ]
    for name, tot, marg in rows:
        print(f"| {name} | {tot:.3f} | {marg:+.3f} | {audio_s/ (tot/1e3):,.0f} |")

    # Trace artifact.
    import pathlib

    ts = time.strftime("%Y%m%d-%H%M%S")
    tdir = pathlib.Path("docs/profiles") / ts
    tdir.mkdir(parents=True, exist_ok=True)
    with jax.profiler.trace(str(tdir)):
        for _ in range(5):
            st2, out = full(state, x, loge, bound, periods, gains, tapsets)
            jax.block_until_ready(out)
    print(f"trace written to {tdir}")


if __name__ == "__main__":
    main()
