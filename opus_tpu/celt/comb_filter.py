"""CELT pitch post-filter (comb filter).

Capability parity with /root/reference/src/celt/comb_filter/ (portable +
SIMD variants).  The 5-tap symmetric IIR at pitch lag T is in-place: when
T < N it reads its own output, a genuine recurrence.  Here the recurrence
is blocked into lag-sized chunks so numpy vectorises each chunk (the lane
parallelism the reference gets from SSE/AVX/NEON); the batched TPU variant
in opus_tpu.dsp does the same chunking across streams.
"""

from __future__ import annotations

import numpy as np

MIN_PERIOD = 15

#: Filter taps per tapset (reference comb_filter/mod.rs:45-55).
GAINS = (
    (0.3066406250, 0.2170410156, 0.1296386719),
    (0.4638671875, 0.2680664062, 0.0),
    (0.7998046875, 0.1000976562, 0.0),
)


def comb_filter_const_inplace(x: np.ndarray, offset: int, t: int, n: int, g0: float, g1: float, g2: float) -> None:
    """y[i] = x[i] + g0*y[i-T] + g1*(y[i-T+1]+y[i-T-1]) + g2*(y[i-T+2]+y[i-T-2])
    over x[offset:offset+n], in place."""
    if n <= 0:
        return
    # Safe chunk: outputs i..i+L-1 only read indices < i when L <= t-2.
    step = max(1, t - 2)
    i = 0
    while i < n:
        m = min(step, n - i)
        base = offset + i
        lag = base - t
        seg = (
            x[base : base + m]
            + g0 * x[lag : lag + m]
            + g1 * (x[lag + 1 : lag + 1 + m] + x[lag - 1 : lag - 1 + m])
            + g2 * (x[lag + 2 : lag + 2 + m] + x[lag - 2 : lag - 2 + m])
        )
        x[base : base + m] = seg
        i += m


def comb_filter(
    x: np.ndarray, offset: int, t0: int, t1: int, n: int,
    g0: float, g1: float, tapset0: int, tapset1: int,
    window: np.ndarray, overlap: int,
) -> None:
    """Apply the post-filter in place on x[offset:offset+n], cross-fading
    from (g0,t0,tapset0) to (g1,t1,tapset1) over ``overlap`` samples with
    the squared MDCT window (libopus comb_filter)."""
    if g0 == 0.0 and g1 == 0.0:
        return
    t0 = max(t0, MIN_PERIOD)
    t1 = max(t1, MIN_PERIOD)
    g00 = g0 * GAINS[tapset0][0]
    g01 = g0 * GAINS[tapset0][1]
    g02 = g0 * GAINS[tapset0][2]
    g10 = g1 * GAINS[tapset1][0]
    g11 = g1 * GAINS[tapset1][1]
    g12 = g1 * GAINS[tapset1][2]

    if g0 == g1 and t0 == t1 and tapset0 == tapset1:
        ov = 0
    else:
        ov = min(overlap, n)

    # Cross-fade region: sequential because the new-filter taps read the
    # in-place history at lag t1 (a rolling 5-tap delay line).
    x1 = x[offset - t1 + 1]
    x2 = x[offset - t1]
    x3 = x[offset - t1 - 1]
    x4 = x[offset - t1 - 2]
    for i in range(ov):
        x0 = x[offset + i - t1 + 2]
        f = float(window[i]) * float(window[i])
        x[offset + i] = (
            x[offset + i]
            + (1.0 - f) * g00 * x[offset + i - t0]
            + (1.0 - f) * g01 * (x[offset + i - t0 + 1] + x[offset + i - t0 - 1])
            + (1.0 - f) * g02 * (x[offset + i - t0 + 2] + x[offset + i - t0 - 2])
            + f * g10 * x2
            + f * g11 * (x1 + x3)
            + f * g12 * (x0 + x4)
        )
        x4 = x3
        x3 = x2
        x2 = x1
        x1 = x0
    if g1 == 0.0:
        return
    comb_filter_const_inplace(x, offset + ov, t1, n - ov, g10, g11, g12)


def comb_filter_into(
    y: np.ndarray, y_off: int, x: np.ndarray, x_off: int, t0: int, t1: int, n: int,
    g0: float, g1: float, tapset0: int, tapset1: int,
    window: np.ndarray, overlap: int,
) -> None:
    """Out-of-place comb: y[i] = x[i] + taps, reading only the (fixed)
    input x — the encoder-side prefilter form, where libopus passes
    separate in/out buffers so there is no feedback (celt_encoder.c
    run_prefilter -> comb_filter(in+..., pre[c]+MAXPERIOD, ...)).
    Gains may be negative (the prefilter subtracts the pitch prediction).
    """
    if g0 == 0.0 and g1 == 0.0:
        y[y_off : y_off + n] = x[x_off : x_off + n]
        return
    t0 = max(t0, MIN_PERIOD)
    t1 = max(t1, MIN_PERIOD)
    g00, g01, g02 = (g0 * GAINS[tapset0][k] for k in range(3))
    g10, g11, g12 = (g1 * GAINS[tapset1][k] for k in range(3))
    ov = 0 if (g0 == g1 and t0 == t1 and tapset0 == tapset1) else min(overlap, n)

    def taps(t, ga, gb, gc, i0, m):
        lag = x_off + i0 - t
        return (
            ga * x[lag : lag + m]
            + gb * (x[lag + 1 : lag + 1 + m] + x[lag - 1 : lag - 1 + m])
            + gc * (x[lag + 2 : lag + 2 + m] + x[lag - 2 : lag - 2 + m])
        )

    if ov > 0:
        f = (window[:ov].astype(np.float64)) ** 2
        y[y_off : y_off + ov] = (
            x[x_off : x_off + ov]
            + (1.0 - f) * taps(t0, g00, g01, g02, 0, ov)
            + f * taps(t1, g10, g11, g12, 0, ov)
        )
    m = n - ov
    if m > 0:
        y[y_off + ov : y_off + n] = x[x_off + ov : x_off + n] + taps(t1, g10, g11, g12, ov, m)
