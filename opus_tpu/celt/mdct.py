"""CELT MDCT filterbank (host/reference implementation).

Capability parity with /root/reference/src/celt/mdct.rs + kiss_fft.rs, but
built from the transform's definition rather than the butterfly network:

    analysis  : y[k] = (2/N2) * sum_n  x_w[n] cos(2*pi/N (n+1/2+N/4)(k+1/2))
    synthesis : u[t] =          sum_k  X[k]  cos(2*pi/N (t+1/2+N/4)(k+1/2))

with N = 2*N2 and the low-overlap window w_full (zero outside a
N2+overlap support, Vorbis-window edges, flat middle).  Synthesis writes
u[N2/2 + j] into out[ov/2 + j] and folds the leading ``overlap`` samples
against the previous block's tail using u's antisymmetry about
t = N2/2 - 1/2 (TDAC) — the exact layout libopus' clt_mdct_backward uses,
so decode memories line up sample-for-sample with the oracle.

The batched TPU formulation (DCT-IV as an MXU matmul over thousands of
streams) lives in opus_tpu.dsp.mdct and is pinned against this module.
"""

from __future__ import annotations

import numpy as np

from .modes import OVERLAP, WINDOW

_TWIST_CACHE: dict[int, tuple[np.ndarray, np.ndarray, np.ndarray]] = {}


def _twists(n2: int):
    """Phase twist vectors for the FFT-based evaluation."""
    if n2 not in _TWIST_CACHE:
        n = 2 * n2
        t0 = 0.5 + n / 4.0
        k = np.arange(n2, dtype=np.float64)
        spec_twist = np.exp(2j * np.pi * k * t0 / n)
        t = np.arange(n, dtype=np.float64)
        time_twist = np.exp(1j * np.pi * (t + t0) / n)
        fwd_twist = np.exp(-2j * np.pi * t0 * (k + 0.5) / n)
        _TWIST_CACHE[n2] = (spec_twist, time_twist, fwd_twist)
    return _TWIST_CACHE[n2]


def imdct_full(spec: np.ndarray) -> np.ndarray:
    """Plain (unwindowed) synthesis: N2 lines -> N=2*N2 time samples."""
    n2 = spec.shape[0]
    n = 2 * n2
    spec_twist, time_twist, _ = _twists(n2)
    y = np.zeros(n, dtype=np.complex128)
    y[:n2] = spec.astype(np.float64) * spec_twist
    g = np.fft.ifft(y) * n
    return (time_twist * g).real


def mdct_backward(spec: np.ndarray, out: np.ndarray, window: np.ndarray = WINDOW, overlap: int = OVERLAP) -> None:
    """Inverse MDCT of one block with TDAC into ``out`` (in place).

    out[0:overlap] must hold the previous block's unwound tail; on return
    out[0:N2+overlap] holds the block's contribution at libopus layout.
    """
    n2 = spec.shape[0]
    half_ov = overlap >> 1
    u = imdct_full(spec)
    # Middle of the low-overlap support: u[N2/2 + j].
    out[half_ov : half_ov + n2] = u[n2 // 2 : n2 // 2 + n2]
    # TDAC fold of the leading overlap against the previous tail, using
    # u's antisymmetry (u at support pos i == -u at pos ov-1-i).
    w_lo = window[:half_ov].astype(np.float64)
    w_hi = window[overlap - 1 : half_ov - 1 : -1].astype(np.float64)  # w[ov-1-i]
    prev = out[:half_ov].copy()
    new_mirror = out[overlap - 1 : half_ov - 1 : -1].copy()
    out[:half_ov] = w_hi * prev - w_lo * new_mirror
    out[overlap - 1 : half_ov - 1 : -1] = w_hi * new_mirror + w_lo * prev


def _window_full(n2: int, window: np.ndarray, overlap: int) -> np.ndarray:
    n = 2 * n2
    pad = (n2 - overlap) // 2
    w = np.zeros(n, dtype=np.float64)
    w[pad : pad + overlap] = window.astype(np.float64)
    w[pad + overlap : pad + n2] = 1.0
    w[pad + n2 : pad + n2 + overlap] = window[::-1].astype(np.float64)
    return w


def mdct_forward(x: np.ndarray, window: np.ndarray = WINDOW, overlap: int = OVERLAP) -> np.ndarray:
    """Forward MDCT: N2+overlap time samples -> N2 lines (scale 2/N2, the
    inverse of :func:`mdct_backward` under TDAC overlap-add)."""
    n2 = x.shape[0] - overlap
    n = 2 * n2
    pad = (n2 - overlap) // 2
    _, _, fwd_twist = _twists(n2)
    xw = np.zeros(n, dtype=np.float64)
    wf = _window_full(n2, window, overlap)
    xw[pad : pad + n2 + overlap] = x.astype(np.float64)
    xw *= wf
    t = np.arange(n, dtype=np.float64)
    z = np.fft.fft(xw * np.exp(-1j * np.pi * t / n))
    return (2.0 / n2) * (fwd_twist * z[:n2]).real
