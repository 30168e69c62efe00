"""Pallas VMEM-resident postfilter vs the XLA serving postfilter.

Interpreter-mode equivalence on CPU (the kernel is opt-in until profiled
on real TPU hardware; see opus_tpu/dsp/pallas_pf.py)."""

import numpy as np


def test_pallas_postfilter_matches_xla():
    import jax.numpy as jnp

    from opus_tpu.dsp.pallas_pf import pallas_postfilter
    from opus_tpu.dsp.synthesis import _postfilter
    from opus_tpu.celt.decoder import DECODE_BUFFER_SIZE

    rng = np.random.default_rng(3)
    B, C, lm = 128, 2, 3
    n = 120 << lm
    hist = DECODE_BUFFER_SIZE - n
    W = DECODE_BUFFER_SIZE
    y = rng.standard_normal((B, C, W)).astype(np.float32) * 1000.0
    periods = rng.integers(15, 1024, (B, 3)).astype(np.int32)
    gains = (rng.integers(0, 5, (B, 3)) * 0.09375).astype(np.float32)
    gains[:8] = 0.0  # inactive streams
    periods[8:16, 1] = periods[8:16, 0]  # same-filter fast path
    gains[8:16, 1] = gains[8:16, 0]
    tapsets = rng.integers(0, 3, (B, 3)).astype(np.int32)

    ref = np.asarray(_postfilter(jnp.asarray(y), hist, n, lm,
                                 jnp.asarray(periods), jnp.asarray(gains),
                                 jnp.asarray(tapsets), 12))
    got = np.asarray(pallas_postfilter(jnp.asarray(y), hist, n, lm,
                                       jnp.asarray(periods), jnp.asarray(gains),
                                       jnp.asarray(tapsets), interpret=True))
    scale = np.abs(ref).max()
    assert np.abs(got - ref).max() / scale < 1e-6
