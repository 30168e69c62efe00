"""Pallas barrel-roll postfilter vs the XLA serving postfilter.

Interpreter-mode equivalence on CPU (the kernel is opt-in until the TPU
A/B lands; see opus_tpu/dsp/pallas_pf.py).  The chunked comb recurrence
has a unique solution for any chunk <= min active lag - 2, so the two
paths must agree to fp reassociation noise across frame sizes, chunk
classes, zero-gain streams, same-filter fast paths, and garbage lags.
"""

import numpy as np
import pytest


def _run(lm, chunk, rng, garbage_lags=False):
    import jax.numpy as jnp

    from opus_tpu.celt.decoder import DECODE_BUFFER_SIZE
    from opus_tpu.dsp.pallas_pf import pallas_postfilter
    from opus_tpu.dsp.synthesis import _postfilter

    B, C = 128, 2
    n = 120 << lm
    hist = DECODE_BUFFER_SIZE - n
    W = DECODE_BUFFER_SIZE
    y = rng.standard_normal((B, C, W)).astype(np.float32) * 1000.0
    lo = max(15, chunk + 2)
    periods = rng.integers(lo, 1025, (B, 3)).astype(np.int32)
    gains = (rng.integers(0, 5, (B, 3)) * 0.09375).astype(np.float32)
    gains[:8] = 0.0  # inactive streams
    if garbage_lags:
        periods[:8] = rng.integers(-5, 5000, (8, 3))  # zero-gain garbage
    periods[8:16, 1] = periods[8:16, 0]  # same-filter fast path
    gains[8:16, 1] = gains[8:16, 0]
    tapsets = rng.integers(0, 3, (B, 3)).astype(np.int32)

    ref = np.asarray(_postfilter(jnp.asarray(y), hist, n, lm,
                                 jnp.asarray(periods), jnp.asarray(gains),
                                 jnp.asarray(tapsets), chunk))
    got = np.asarray(pallas_postfilter(jnp.asarray(y), hist, n, lm,
                                       jnp.asarray(periods), jnp.asarray(gains),
                                       jnp.asarray(tapsets), chunk,
                                       interpret=True))
    scale = np.abs(ref).max()
    assert np.abs(got - ref).max() / scale < 1e-6


@pytest.mark.parametrize("lm,chunk", [(3, 12), (3, 120), (3, 240),
                                      (2, 60), (1, 12), (0, 12), (0, 240)])
def test_pallas_postfilter_matches_xla(lm, chunk):
    _run(lm, chunk, np.random.default_rng(3 + lm * 10 + chunk))


def test_pallas_postfilter_garbage_lags_zero_gain():
    """Zero-gain streams may carry garbage lags; both paths must ignore
    them (XLA clamps the gather window, the kernel clips the barrel)."""
    _run(3, 12, np.random.default_rng(77), garbage_lags=True)
