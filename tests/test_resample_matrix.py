"""Device resampler bank (dsp/resample.py) vs the normative fixed-point
SILK resampler: the dense-matmul form must track the bit-exact host path
to fixed-point rounding noise, including state carry across frames and
the zero-tail (stream start / rate switch) case."""

import numpy as np
import pytest

from opus_tpu.dsp.resample import TAIL, resample_matrices, resample_matrix
from opus_tpu.silk.resampler import Resampler


@pytest.mark.parametrize("fs_khz,frame_ms", [(8, 20), (12, 20), (16, 20), (16, 10), (8, 10)])
def test_matrix_matches_fixed_point(fs_khz, frame_ms):
    n_in = fs_khz * frame_ms
    n_out = n_in * 48 // fs_khz
    m = resample_matrix(fs_khz, n_in)
    rng = np.random.default_rng(fs_khz * 100 + frame_ms)
    # Voice-like band-limited signal at int16 scale.
    t = np.arange(n_in * 6) / (fs_khz * 1000.0)
    sig = (
        5000 * np.sin(2 * np.pi * 220 * t)
        + 2000 * np.sin(2 * np.pi * 1333 * t + 0.7)
        + 400 * rng.standard_normal(t.size)
    )
    sig = np.clip(sig, -32768, 32767).astype(np.int64)

    ref = Resampler(fs_khz * 1000, 48000)
    prev_tail = np.zeros(TAIL, np.float64)
    worst = 0.0
    for f in range(6):
        frame = sig[f * n_in : (f + 1) * n_in]
        want = np.asarray(ref.process(list(frame)), np.float64)
        assert want.shape == (n_out,)
        got = np.concatenate([prev_tail, frame]).astype(np.float32) @ m
        # the fixed-point path saturates at int16; the linear device path
        # doesn't (the final PCM mix clamps instead) — compare clamped.
        got = np.clip(got, -32768, 32767)
        err = np.abs(got - want).max() / 32768.0
        worst = max(worst, float(err))
        prev_tail = frame[-TAIL:].astype(np.float64)
    # fixed-point rounding noise class: ~1 LSB per tap chain
    assert worst < 2e-4, worst


def test_zero_tail_equals_fresh_state():
    """A zero history tail must reproduce a freshly initialised
    resampler (the rate-switch / first-frame semantics)."""
    fs, n_in = 16, 320
    m = resample_matrix(fs, n_in)
    rng = np.random.default_rng(3)
    # band-limited, with headroom: full-scale white noise overdrives the
    # 2x upsampler into its INTERIOR sat16 (which the linear device path,
    # like libopus's float build, does not model)
    frame = rng.integers(-8000, 8000, n_in).astype(np.int64)
    ref = Resampler(fs * 1000, 48000)
    want = np.asarray(ref.process(list(frame)), np.float64)
    got = np.concatenate([np.zeros(TAIL), frame]).astype(np.float32) @ m
    got = np.clip(got, -32768, 32767)  # sat16 mirror (see above)
    assert np.abs(got - want).max() / 32768.0 < 2e-4


def test_stacked_bank_layout():
    mats, offs = resample_matrices(960)
    assert mats.shape == (3, TAIL + 320, 960)
    assert list(offs) == [160, 240, 320]
    # NB/MB banks must ignore the zero-padded input suffix entirely.
    assert np.abs(mats[0, TAIL + 160 :]).max() == 0.0
    assert np.abs(mats[1, TAIL + 240 :]).max() == 0.0
