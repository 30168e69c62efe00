"""Native hybrid encoder (silk_encoder.inc hybrid driver): SILK WB +
CELT 17..19 behind one shared range coder.  Gates: libopus decodes the
packets with final_range parity against our scalar decoder AND against
the encoder's own range state; voice quality floor (delay-compensated
SNR); CBR is exact; batch == scalar bytes."""

import numpy as np
import pytest

from opus_tpu import Decoder, DecoderConfiguration, oracle
from opus_tpu.native.frontend import (
    NativeHybridEncoder, NativeHybridEncoderBatch, available,
)
from opus_tpu.types import Channels, SamplingRate

pytestmark = pytest.mark.skipif(not available(), reason="native engine not built")

TOC = bytes([13 << 3])  # hybrid SWB 20 ms mono
F = 960


def _speech(n, seed=7):
    t = np.arange(n) / 48000.0
    rng = np.random.default_rng(seed)
    ph = np.cumsum(2 * np.pi * (120 + 30 * np.sin(2 * np.pi * 3 * t)) / 48000.0)
    s = 0.35 * np.sign(np.sin(ph)) * np.exp(-3 * (t % 0.01) * 100) + 0.02 * rng.standard_normal(n)
    return s.astype(np.float32)


def test_hybrid_native_roundtrip_quality():
    nf = 10
    sig = _speech(F * nf)
    enc = NativeHybridEncoder()
    lo = oracle.Decoder(48000, 1)
    mine = Decoder(DecoderConfiguration(SamplingRate.HZ_48000, Channels.MONO))
    recs = []
    for f in range(nf):
        payload = enc.encode(sig[f * F : (f + 1) * F], 160)  # 64 kbps CBR
        assert len(payload) == 160
        pkt = TOC + payload
        m = np.asarray(mine.decode_float(pkt, F)).reshape(-1)
        r = np.asarray(lo.decode_float(pkt, F)).reshape(-1)
        assert mine.final_range == lo.final_range == enc.final_range, f
        assert float(np.abs(m - r).max()) < 2e-4
        recs.append(r)
    rec = np.concatenate(recs)
    # delay-compensated SNR (hybrid path delay ~ SILK 66@48k + decode 39)
    best = -99.0
    for d in range(0, 200):
        r = rec[F + d :]
        o = sig[F : F + len(r)].astype(np.float64)
        e = o - r[: len(o)]
        best = max(best, 10 * np.log10(float(np.dot(o, o)) /
                                       max(float(np.dot(e, e)), 1e-12)))
    assert best > 8.0, best


def test_hybrid_native_batch_matches_scalar():
    nf = 5
    sig = _speech(F * nf, seed=9)
    scalar = NativeHybridEncoder()
    B = 3
    batch = NativeHybridEncoderBatch(B)
    for f in range(nf):
        x = sig[f * F : (f + 1) * F]
        want = scalar.encode(x, 120)
        out, sizes = batch.encode_batch(np.stack([x] * B), 120)
        for b in range(B):
            assert bytes(out[b, : sizes[b]]) == want, (f, b)


def test_hybrid_native_10ms_and_budgets():
    sig = _speech(F * 6, seed=4)
    lo = oracle.Decoder(48000, 1)
    toc10 = bytes([12 << 3])
    enc = NativeHybridEncoder()
    for f in range(6):
        payload = enc.encode(sig[f * 480 : (f + 1) * 480], 80)
        out = np.asarray(lo.decode_float(toc10 + payload, 480))
        assert np.isfinite(out).all()
    for budget in (45, 60, 250):
        enc2 = NativeHybridEncoder()
        payload = enc2.encode(sig[:F], budget)
        assert len(payload) == budget
        lo2 = oracle.Decoder(48000, 1)
        out = np.asarray(lo2.decode_float(TOC + payload, F))
        assert np.isfinite(out).all()
