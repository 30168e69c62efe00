"""SILK decoder tests: bit-exact parity with libopus (SURVEY item 13).

Every case drives the public Decoder (or the silk core) on packets
produced by the system libopus encoder and requires final_range equality
plus sample-exact PCM.
"""

import numpy as np
import pytest

from opus_tpu import oracle
from opus_tpu.decoder import Decoder, DecoderConfiguration
from opus_tpu.types import Channels, SamplingRate

pytestmark = pytest.mark.skipif(not oracle.available(), reason="libopus not present")


def _speechy(rate, n, ch, seed=1):
    t = np.arange(n) / rate
    rng = np.random.default_rng(seed)
    f0 = 120 + 30 * np.sin(2 * np.pi * 3 * t)
    phase = np.cumsum(2 * np.pi * f0 / rate)
    s = 0.35 * np.sign(np.sin(phase)) * np.exp(-3 * (t % 0.01) * 100) + 0.02 * rng.standard_normal(n)
    out = np.stack([s, np.roll(s, 17) * 0.8], -1) if ch == 2 else s[:, None]
    return out.astype(np.float32)


def _noisy(rate, n, ch, seed=9):
    t = np.arange(n) / rate
    rng = np.random.default_rng(seed)
    s = 0.3 * np.sin(2 * np.pi * 210 * t) + 0.04 * rng.standard_normal(n)
    out = np.stack([s, np.roll(s, 5) * 0.7], -1) if ch == 2 else s[:, None]
    return out.astype(np.float32)


def _drive(enc_rate, api_rate, channels, frame_ms, kbps, gen, nframes=6, force=oracle.MODE_SILK_ONLY):
    enc = oracle.Encoder(enc_rate, channels)
    enc.ctl(oracle.SET_FORCE_MODE, force)
    enc.ctl(oracle.SET_BITRATE, kbps * 1000)
    ref = oracle.Decoder(api_rate, channels)
    mine = Decoder(DecoderConfiguration(SamplingRate(api_rate), Channels(channels)))
    frame = enc_rate * frame_ms // 1000
    out_frame = api_rate * frame_ms // 1000
    pcm = gen(enc_rate, frame * nframes, channels)
    for f in range(nframes):
        pkt = enc.encode_float(pcm[f * frame : (f + 1) * frame].ravel(), frame)
        r = np.asarray(ref.decode_float(pkt, out_frame)).reshape(-1)[: out_frame * channels]
        m = mine.decode_float(pkt, out_frame).reshape(-1)
        assert ref.final_range == mine.final_range, f"frame {f}: range mismatch"
        err = float(np.abs(m - r).max())
        assert err < 1e-7, f"frame {f}: pcm err {err}"


# Matched-rate decode across all SILK bandwidths / frame sizes / channels.
@pytest.mark.parametrize(
    "enc_rate,frame_ms,channels,kbps",
    [
        (8000, 20, 1, 16),
        (12000, 20, 1, 20),
        (16000, 20, 1, 24),
        (16000, 10, 1, 24),
        (16000, 40, 1, 24),
        (16000, 60, 1, 24),
        (16000, 20, 2, 32),
        (8000, 40, 2, 20),
        (8000, 60, 1, 8),
    ],
)
def test_silk_matched_rate(enc_rate, frame_ms, channels, kbps):
    _drive(enc_rate, enc_rate, channels, frame_ms, kbps, _noisy)


# Resampler paths: copy / up2HQ / IIR-FIR up / down-FIR 1:2, 2:3, 3:4.
@pytest.mark.parametrize(
    "enc_rate,api_rate",
    [
        (8000, 16000),
        (12000, 24000),
        (16000, 48000),
        (16000, 24000),
        (8000, 48000),
        (12000, 48000),
        (8000, 12000),
        (12000, 16000),
        (16000, 8000),
        (12000, 8000),
        (16000, 12000),
    ],
)
def test_silk_resampled(enc_rate, api_rate):
    _drive(enc_rate, api_rate, 1, 20, 24, _noisy)


def test_silk_voiced_ltp():
    _drive(16000, 16000, 1, 20, 24, _speechy, nframes=10)
    _drive(8000, 8000, 1, 20, 16, _speechy, nframes=10)


def test_silk_stereo_48k():
    _drive(16000, 48000, 2, 20, 32, _speechy, nframes=8)


def test_hybrid_modes():
    for channels, frame_ms, kbps in [(1, 20, 32), (1, 10, 40), (2, 20, 64)]:
        enc = oracle.Encoder(48000, channels)
        enc.ctl(oracle.SET_FORCE_MODE, oracle.MODE_HYBRID)
        enc.ctl(oracle.SET_BITRATE, kbps * 1000)
        ref = oracle.Decoder(48000, channels)
        mine = Decoder(DecoderConfiguration(SamplingRate.HZ_48000, Channels(channels)))
        frame = 48000 * frame_ms // 1000
        pcm = _speechy(48000, frame * 6, channels)
        t = np.arange(frame * 6) / 48000
        pcm[:, 0] += (0.05 * np.sin(2 * np.pi * 9000 * t)).astype(np.float32)
        for f in range(6):
            pkt = enc.encode_float(pcm[f * frame : (f + 1) * frame].ravel(), frame)
            r = np.asarray(ref.decode_float(pkt, frame)).reshape(-1)[: frame * channels]
            m = mine.decode_float(pkt, frame).reshape(-1)
            assert ref.final_range == mine.final_range
            assert float(np.abs(m - r).max()) < 2e-5


def test_mode_transitions():
    """SILK<->HYBRID<->CELT switching: symbols must stay exact; PCM within
    a small transition tolerance for the crossfade frames."""
    channels = 1
    enc = oracle.Encoder(48000, channels)
    ref = oracle.Decoder(48000, channels)
    mine = Decoder(DecoderConfiguration(SamplingRate.HZ_48000, Channels.MONO))
    frame, nframes = 960, 60
    rng = np.random.default_rng(5)
    t = np.arange(frame * nframes) / 48000
    phase = np.cumsum(2 * np.pi * (130 + 40 * np.sin(2 * np.pi * 2.5 * t)) / 48000)
    speech = 0.3 * np.sign(np.sin(phase)) * np.exp(-2 * (t % 0.012) * 80)
    music = 0.25 * np.sin(2 * np.pi * 440 * t) + 0.1 * rng.standard_normal(frame * nframes)
    pcm = np.where((t % 1.2) < 0.6, speech, music)[:, None].astype(np.float32)
    n_loose = 0
    for f in range(nframes):
        enc.ctl(oracle.SET_BITRATE, [12, 48, 96][(f // 10) % 3] * 1000)
        pkt = enc.encode_float(pcm[f * frame : (f + 1) * frame].ravel(), frame)
        r = np.asarray(ref.decode_float(pkt, frame)).reshape(-1)
        m = mine.decode_float(pkt, frame).reshape(-1)
        assert ref.final_range == mine.final_range, f"frame {f}"
        err = float(np.abs(m - r).max())
        if err >= 2e-5:
            n_loose += 1
            # Was 5e-3 before the mode-switch noise-seed fix (CeltDecoder
            # .reset now zeroes rng like libopus DECODER_RESET_START, so
            # folded bands in the first post-switch frame draw identical
            # noise); remaining slack covers PLC-based transition fades.
            assert err < 1e-3, f"frame {f}: transition err {err}"
    assert n_loose <= 6  # only the frames at mode switches may deviate


def test_silk_fec_decode():
    enc = oracle.Encoder(16000, 1)
    enc.ctl(oracle.SET_FORCE_MODE, oracle.MODE_SILK_ONLY)
    enc.ctl(oracle.SET_BITRATE, 24000)
    enc.ctl(oracle.SET_INBAND_FEC, 1)
    enc.ctl(oracle.SET_PACKET_LOSS_PERC, 20)
    frame = 320
    pcm = _speechy(16000, frame * 6, 1, seed=2)
    pkts = [enc.encode_float(pcm[f * frame : (f + 1) * frame].ravel(), frame) for f in range(6)]
    ref = oracle.Decoder(16000, 1)
    mine = Decoder(DecoderConfiguration(SamplingRate.HZ_16000, Channels.MONO))
    for f in (0, 1):
        ref.decode_float(pkts[f], frame)
        mine.decode_float(pkts[f], frame)
    r = np.asarray(ref.decode_float(pkts[3], frame, fec=True)).reshape(-1)
    m = mine.decode_float(pkts[3], frame, decode_fec=True)[:, 0]
    assert ref.final_range == mine.final_range
    assert float(np.abs(m - r).max()) < 1e-7


@pytest.mark.parametrize(
    "lost,rate,frame_ms,ch,kbps",
    [
        ((4, 5), 16000, 20, 1, 24),
        ((6, 7, 8, 9, 10), 16000, 20, 1, 24),
        ((4,), 8000, 60, 1, 12),
        ((5, 6), 16000, 20, 2, 32),
    ],
)
def test_silk_plc_bit_exact(lost, rate, frame_ms, ch, kbps):
    """Loss concealment (PLC + CNG + glue) is bit-exact vs libopus."""
    enc = oracle.Encoder(rate, ch)
    enc.ctl(oracle.SET_FORCE_MODE, oracle.MODE_SILK_ONLY)
    enc.ctl(oracle.SET_BITRATE, kbps * 1000)
    frame = rate * frame_ms // 1000
    pcm = _speechy(rate, frame * 14, ch, seed=3)
    pkts = [enc.encode_float(pcm[f * frame : (f + 1) * frame].ravel(), frame) for f in range(14)]
    mine = Decoder(DecoderConfiguration(SamplingRate(rate), Channels(ch)))
    ref = oracle.Decoder(rate, ch)
    for f in range(14):
        pkt = None if f in lost else pkts[f]
        r = np.asarray(ref.decode_float(pkt, frame)).reshape(-1)[: frame * ch]
        m = mine.decode_float(pkt, frame).reshape(-1)
        assert float(np.abs(m - r).max()) < 1e-7, f"frame {f}"


def test_hybrid_stereo_fec_plc_mixed():
    """BASELINE config 3: hybrid SWB/FB stereo with PLC/FEC vs libopus."""
    enc = oracle.Encoder(48000, 2)
    enc.ctl(oracle.SET_FORCE_MODE, oracle.MODE_HYBRID)
    enc.ctl(oracle.SET_BITRATE, 64000)
    enc.ctl(oracle.SET_INBAND_FEC, 1)
    enc.ctl(oracle.SET_PACKET_LOSS_PERC, 20)
    frame, nf = 960, 16
    t = np.arange(frame * nf) / 48000
    rng = np.random.default_rng(11)
    phase = np.cumsum(2 * np.pi * (130 + 40 * np.sin(2 * np.pi * 2.5 * t)) / 48000)
    s = (0.3 * np.sign(np.sin(phase)) * np.exp(-2 * (t % 0.012) * 80)
         + 0.05 * np.sin(2 * np.pi * 9000 * t) + 0.02 * rng.standard_normal(frame * nf))
    pcm = np.stack([s, np.roll(s, 23) * 0.8], -1).astype(np.float32)
    pkts = [enc.encode_float(pcm[f * frame : (f + 1) * frame].ravel(), frame) for f in range(nf)]
    ref = oracle.Decoder(48000, 2)
    mine = Decoder(DecoderConfiguration(SamplingRate.HZ_48000, Channels.STEREO))
    for f in range(nf):
        if f == 6:
            r = np.asarray(ref.decode_float(pkts[f + 1], frame, fec=True)).reshape(frame, 2)
            m = mine.decode_float(pkts[f + 1], frame, decode_fec=True)
        elif f == 10:
            r = np.asarray(ref.decode_float(None, frame)).reshape(frame, 2)
            m = mine.decode_float(None, frame)
        else:
            r = np.asarray(ref.decode_float(pkts[f], frame)).reshape(frame, 2)
            m = mine.decode_float(pkts[f], frame)
            assert mine.final_range == ref.final_range, f
        assert float(np.abs(m - r).max()) < 2e-4, f
