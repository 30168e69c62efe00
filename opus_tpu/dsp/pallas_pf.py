"""Pallas VMEM-resident CELT pitch post-filter (barrel-roll formulation).

The XLA serving postfilter (opus_tpu/dsp/synthesis.py _postfilter) is
gather-latency bound: ~13 sequential take_along_axis calls per step cost
~1 ms each on TPU regardless of size (DEVICE_PROFILE.md), i.e. ~12.7 ms
of a 37.4 ms B=1024 plan step.  This kernel removes every gather:

* The per-row lagged window fetch z[r, j] = y[r, j - T_r] is an 11-stage
  BARREL ROLL: for bit k, conditionally shift by 2^k where (T_r >> k)&1.
  `pltpu.roll` with a static shift + per-row select lowers cleanly on
  Mosaic (the probe that motivated this measured the full 80-chunk
  workload at ~0.33 ms for 256 rows; the tpu.dynamic_gather the previous
  kernel used crashes the backend compiler outright).

* The 5-tap comb and the alignment COMMUTE (per-row tap gains are
  constant over the frame), so each iteration combines taps first with
  four static rolls shared by all three filters, then aligns the
  combined signal once per filter.

* The two crossfade segments of the reference recurrence
  (/root/reference/src/celt/comb_filter rewrite of libopus
  comb_filter(): filter0 -> filter1 over the first 120 samples,
  filter1 -> filter2 over the next 120, filter2 alone after) become
  three precomputed per-sample weight envelopes wf[3, W], so the chunk
  loop body is position-independent and runs under lax.fori_loop —
  compile time stays flat in the chunk count (the fully unrolled variant
  took 29 minutes to compile; this compiles in seconds).

The chunked recurrence itself is unchanged: chunk <= every active lag
minus 2 (pf_chunk_for), so chunk ci only reads samples finalized before
its start.  Semantics are identical to _postfilter.

TPU-DEFAULT since the 2026-08-19 true-synced A/B at B=1024 stereo
(W=2048, chained steps, digest-synced) measured it faster at every
lag class and bit-exact (max rel err 0.0) vs the XLA postfilter:

  pf chunk (samples)   pallas   xla    speedup
  12 (worst-case lags) 22.7 ms  40.5   1.8x
  60                    5.7 ms  24.3   4.3x
  120 (typical voice)   3.5 ms  12.0   3.5x
  240                   2.4 ms  11.3   4.8x

The XLA path remains the CPU/default-backend implementation and the
force-off escape hatch (OPUS_TPU_PALLAS_PF=0); equivalence is gated in
interpreter mode on CPU (tests/test_pallas_pf.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..celt import modes
from ..celt.comb_filter import GAINS

OVERLAP = modes.OVERLAP
_BS = 128  # streams per grid block

#: COMBFILTER_MINPERIOD / MAXPERIOD (RFC 6716 / celt.h) bound the barrel
#: stage count: lags live in [15, 1024] -> 11 shift bits.
_MIN_PERIOD, _MAX_PERIOD = 15, 1024
_BITS = 11


@functools.lru_cache(maxsize=None)
def _envelopes(n: int, lm: int, hist: int, w: int) -> np.ndarray:
    """Per-filter per-sample crossfade weights wf[4, W] (row 3 is pad).

    Mirrors _postfilter's segment structure: the first SHORT_MDCT_SIZE
    samples crossfade filter 0 -> 1 under WINDOW^2, the remainder
    crossfades 1 -> 2 over OVERLAP samples then runs filter 2 alone.
    Zero outside [hist, hist+n) — the frame mask rides the envelope.
    """
    w2 = (modes.WINDOW.astype(np.float64) ** 2).astype(np.float32)
    s = modes.SHORT_MDCT_SIZE
    wf = np.zeros((4, w), np.float32)
    wf[0, hist : hist + s] = 1.0 - w2
    wf[1, hist : hist + s] = w2
    if lm != 0:
        wf[1, hist + s : hist + 2 * s] = 1.0 - w2
        wf[2, hist + s : hist + 2 * s] = w2
        wf[2, hist + 2 * s : hist + n] = 1.0
    return wf


def _pf_kernel(y_ref, lag_ref, tg_ref, wf_ref, out_ref, *, n, hist, chunk,
               nf, roll):
    """One row block: chunked comb recurrence, gather-free.

    y_ref   [R, W] f32 — history+frame rows (R = streams*channels).
    lag_ref [R, 8] i32 — clipped lags, filter f at column f.
    tg_ref  [R, 16] f32 — tap gains, filter f taps at columns 3f..3f+2.
    wf_ref  [4, W] f32 — per-filter crossfade envelopes.
    out_ref [R, W] f32 — aliased with y_ref's buffer (in/out alias 0).
    """
    w = y_ref.shape[1]
    lags = lag_ref[...]
    tg = tg_ref[...]
    wf = wf_ref[...]
    nc = -(-n // chunk)
    pos = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)

    def body(ci, y):
        i0 = hist + ci * chunk
        # Shared 5-tap neighbourhoods (static circular rolls; wraparound
        # can't reach the frame region: j - T - 2 >= hist - 1026 >= 0).
        s1 = roll(y, 1, 1) + roll(y, w - 1, 1)
        s2 = roll(y, 2, 1) + roll(y, w - 2, 1)
        contrib = jnp.zeros_like(y)
        for f in range(nf):
            cf = (tg[:, 3 * f][:, None] * y
                  + tg[:, 3 * f + 1][:, None] * s1
                  + tg[:, 3 * f + 2][:, None] * s2)
            t = lags[:, f][:, None]
            # Barrel roll: z[r, j] = cf[r, j - T_r].
            z = cf
            for k in range(_BITS):
                zr = roll(z, 1 << k, 1)
                z = jnp.where((t >> k) & 1 == 1, zr, z)
            contrib = contrib + wf[f][None, :] * z
        upd = jnp.where((pos >= i0) & (pos < i0 + chunk), contrib, 0.0)
        return y + upd

    out_ref[...] = jax.lax.fori_loop(0, nc, body, y_ref[...])


def pallas_postfilter(y, hist, n, lm, pf_periods, pf_gains, pf_tapsets,
                      chunk: int = 12, interpret: bool = False):
    """Drop-in for synthesis._postfilter via a Pallas kernel.

    y [B, C, hist+n] f32; per-stream periods/gains/tapsets as in the XLA
    path; `chunk` must satisfy chunk + 2 <= every active lag
    (pf_chunk_for picks it).  B*C must be a multiple of the row block."""
    from jax.experimental import pallas as pl

    roll = jnp.roll
    if not interpret:
        from jax.experimental.pallas import tpu as pltpu

        roll = pltpu.roll

    B, C, W = y.shape
    R = B * C
    # 128-row blocks: at 256 rows the 3-filter body keeps enough live
    # [rows, W] f32 planes (2 MB each) that Mosaic's scoped-VMEM stack
    # overflows its 16 MB default (measured 17.48 MB).  128 rows plus a
    # raised vmem_limit_bytes compiles and is bit-exact at production
    # scale (TPU-verified 2026-08-19).  Odd batch sizes get the largest
    # power-of-two row block that tiles R (the caller falls back to the
    # XLA postfilter when none does — see make_synthesis_step).
    bs = next(c for c in (_BS, 64, 32, 16, 8, R) if R % c == 0)
    rep = lambda a: jnp.repeat(a, C, axis=0)
    lags = jnp.clip(rep(pf_periods).astype(jnp.int32), _MIN_PERIOD, _MAX_PERIOD)
    lags = jnp.pad(lags, ((0, 0), (0, 8 - lags.shape[1])))
    # Tap gains: GAINS[tapset] * gain, resolved outside the kernel.
    gt = jnp.asarray(np.array(GAINS, np.float32))  # [3 tapsets, 3 taps]
    tg = gt[rep(pf_tapsets)] * rep(pf_gains)[..., None]  # [R, 3, 3]
    tg = jnp.pad(tg.reshape(R, 9), ((0, 0), (0, 7)))
    wf = jnp.asarray(_envelopes(n, lm, hist, W))

    kernel = functools.partial(
        _pf_kernel, n=n, hist=hist, chunk=chunk,
        nf=2 if lm == 0 else 3, roll=roll,
    )
    if interpret:
        mem = {}
        extra = {}
    else:
        from jax.experimental.pallas import tpu as pltpu

        mem = {"memory_space": pltpu.VMEM}
        extra = {"compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024)}
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, W), y.dtype),
        grid=(R // bs,),
        **extra,
        in_specs=[
            pl.BlockSpec((bs, W), lambda i: (i, 0), **mem),
            pl.BlockSpec((bs, 8), lambda i: (i, 0), **mem),
            pl.BlockSpec((bs, 16), lambda i: (i, 0), **mem),
            pl.BlockSpec((4, W), lambda i: (0, 0), **mem),
        ],
        out_specs=pl.BlockSpec((bs, W), lambda i: (i, 0), **mem),
        input_output_aliases={0: 0},
        interpret=interpret,
    )(y.reshape(R, W), lags, tg, wf)
    return out.reshape(B, C, W)
