"""Native SILK encoder (silk_encoder.inc): conformance of the emitted
bitstream.  Gates: (a) libopus decodes the payloads and reconstructs the
voice signal (SNR gate); (b) our scalar decoder agrees with libopus
sample-exactly INCLUDING final_range on every frame (so the native
encoder's stream drives both decoders identically); (c) CBR budgets are
respected; (d) batch API == scalar API byte-for-byte."""

import numpy as np
import pytest

from opus_tpu import Decoder, oracle
from opus_tpu.native.frontend import NativeSilkEncoder, NativeSilkEncoderBatch, available

pytestmark = pytest.mark.skipif(not available(), reason="native engine not built")

TOC_20MS = {8: 1, 12: 5, 16: 9}  # opus_tpu/encoder.py _SILK_20MS_CONFIG


def _voice(fs_khz: int, nf: int, frame: int, seed=7):
    # the suite's voiced pulse-train speech (tests/test_silk_encoder.py
    # _speech), at int16 internal-rate scale
    rate = fs_khz * 1000
    n = frame * nf
    t = np.arange(n) / rate
    rng = np.random.default_rng(seed)
    ph = np.cumsum(2 * np.pi * (120 + 30 * np.sin(2 * np.pi * 3 * t)) / rate)
    s = 0.35 * np.sign(np.sin(ph)) * np.exp(-3 * (t % 0.01) * 100) + 0.02 * rng.standard_normal(n)
    return np.clip(s * 32768.0, -32768, 32767).astype(np.int16)


@pytest.mark.parametrize("fs_khz", [8, 12, 16])
def test_libopus_decodes_native_silk(fs_khz):
    frame = 20 * fs_khz
    nf = 10
    sig = _voice(fs_khz, nf, frame)
    enc = NativeSilkEncoder(fs_khz)
    lo = oracle.Decoder(fs_khz * 1000, 1)
    from opus_tpu import DecoderConfiguration
    from opus_tpu.types import Channels, SamplingRate

    mine = Decoder(DecoderConfiguration(SamplingRate(fs_khz * 1000), Channels.MONO))
    toc = bytes([TOC_20MS[fs_khz] << 3])
    recon = []
    orig = []
    for f in range(nf):
        x = sig[f * frame : (f + 1) * frame]
        payload = enc.encode(x, 60)
        assert 1 <= len(payload) <= 62
        pkt = toc + payload
        ours = np.asarray(mine.decode_float(pkt, frame)).reshape(-1)
        ref = np.asarray(lo.decode_float(pkt, frame)).reshape(-1)
        # both decoders agree bit-level on the native encoder's stream
        assert mine.final_range == lo.final_range, f
        assert float(np.abs(ours - ref).max()) < 2e-5
        recon.append(ref)
        orig.append(x.astype(np.float64) / 32768.0)
    # decoder delay compensation (tests/test_silk_encoder.py gate)
    d = {16: 13, 12: 10, 8: 5}[fs_khz]
    recon = np.concatenate(recon)[frame + d :]  # skip the cold-start frame
    orig = np.concatenate(orig)[frame : frame + len(recon)]
    snr = 10 * np.log10(float(np.dot(orig, orig)) /
                        max(float(np.dot(orig - recon, orig - recon)), 1e-12))
    assert snr > 6.0, snr  # intelligible voice reconstruction at ~24 kbps


def test_native_silk_encoder_matches_batch():
    fs = 16
    frame = 320
    nf = 6
    sig = _voice(fs, nf, frame, seed=9)
    scalar = NativeSilkEncoder(fs)
    B = 4
    batch = NativeSilkEncoderBatch(B, fs)
    for f in range(nf):
        x = sig[f * frame : (f + 1) * frame]
        want = scalar.encode(x, 60)
        out, sizes = batch.encode_batch(np.stack([x] * B), 60)
        for b in range(B):
            assert bytes(out[b, : sizes[b]]) == want, (f, b)


def test_native_silk_encoder_cbr_budgets():
    fs = 16
    frame = 320
    sig = _voice(fs, 8, frame, seed=5)
    from opus_tpu import DecoderConfiguration
    from opus_tpu.types import Channels, SamplingRate

    for budget in (20, 35, 60, 90):
        enc = NativeSilkEncoder(fs)
        dec = Decoder(DecoderConfiguration(SamplingRate.HZ_16000, Channels.MONO))
        lo = oracle.Decoder(16000, 1)
        toc = bytes([TOC_20MS[fs] << 3])
        for f in range(8):
            payload = enc.encode(sig[f * frame : (f + 1) * frame], budget)
            assert len(payload) <= budget + 2, (budget, f, len(payload))
            pkt = toc + payload
            dec.decode_float(pkt, frame)
            lo.decode_float(pkt, frame)
            assert dec.final_range == lo.final_range


def test_native_silk_encoder_10ms():
    fs = 16
    frame = 160  # 10 ms
    sig = _voice(fs, 8, frame, seed=7)
    enc = NativeSilkEncoder(fs)
    lo = oracle.Decoder(16000, 1)
    toc = bytes([(TOC_20MS[fs] - 1) << 3])
    for f in range(8):
        payload = enc.encode(sig[f * frame : (f + 1) * frame], 40)
        pkt = toc + payload
        out = np.asarray(lo.decode_float(pkt, frame))
        assert np.isfinite(out).all()
