"""CELT decoder conformance vs the system libopus.

Two oracles:
* final_range equality per frame — proves the entire entropy-decode path
  (energy model, tf, spread, dynalloc, allocation, theta, PVQ) is
  bit-exact (the decoder.rs:116-123 contract).
* PCM max error < 2e-5 vs libopus float output — proves synthesis
  (denormalise, IMDCT/TDAC, anti-collapse, post-filter, de-emphasis,
  downsampling) matches to float32 rounding.

Plus a random-frame fuzz (decoders must agree on arbitrary bytes) and a
re-encode replay self-check.
"""

import numpy as np
import pytest

from opus_tpu import Bandwidth, query_packet_bandwidth, query_packet_channel_count
from opus_tpu import oracle
from opus_tpu.celt.decoder import CeltDecoder
from opus_tpu.rc.trace import TracingRangeDecoder, replay

pytestmark = pytest.mark.skipif(not oracle.available(), reason="libopus not present")

#: ToC bandwidth -> CELT end band (libopus opus_decoder mapping).
END_BAND = {
    Bandwidth.NARROWBAND: 13,
    Bandwidth.MEDIUMBAND: 17,
    Bandwidth.WIDEBAND: 17,
    Bandwidth.SUPERWIDEBAND: 19,
    Bandwidth.FULLBAND: 21,
}


def _signal(kind, n, rng):
    t = np.arange(n) / 48000
    if kind == "music":
        return 0.4 * np.sin(2 * np.pi * 440 * t) + 0.2 * np.sin(2 * np.pi * 3000 * t) + 0.1 * rng.standard_normal(n)
    if kind == "transient":
        sig = 0.05 * rng.standard_normal(n)
        for c in range(0, n, 900):
            sig[c : c + 40] += 0.8 * np.hanning(40)
        return sig
    return 0.5 * rng.standard_normal(n)


def _run(channels, frame, bitrate, rate_out=48000, nframes=8, signal="music", cbr=False, cx=10):
    enc = oracle.Encoder(48000, channels)
    enc.ctl(oracle.SET_FORCE_MODE, oracle.MODE_CELT_ONLY)
    enc.ctl(oracle.SET_BITRATE, bitrate)
    enc.ctl(oracle.SET_COMPLEXITY, cx)
    if cbr:
        enc.ctl(oracle.SET_VBR, 0)
    dec_ref = oracle.Decoder(rate_out, channels)
    dec_mine = CeltDecoder(channels, downsample=48000 // rate_out)
    rng = np.random.default_rng(42)
    sig = _signal(signal, frame * nframes, rng)
    pcm = (np.stack([sig, np.roll(sig, 7) * 0.8], -1) if channels == 2 else sig[:, None]).astype(np.float32)
    fo = frame * rate_out // 48000
    for f in range(nframes):
        pkt = enc.encode_float(pcm[f * frame : (f + 1) * frame].ravel(), frame)
        ref = dec_ref.decode_float(pkt, fo)
        dec_mine.stream_channels = int(query_packet_channel_count(pkt))
        dec_mine.end_band = END_BAND[query_packet_bandwidth(pkt)]
        mine = dec_mine.decode(pkt[1:], fo)
        assert dec_ref.final_range == dec_mine.final_range, (f, "entropy desync")
        assert float(np.abs(ref - mine).max()) < 2e-5, (f, "PCM mismatch")


CASES = {
    "mono_20ms_64k": (1, 960, 64000, {}),
    "stereo_20ms_64k": (2, 960, 64000, {}),
    "stereo_20ms_96k": (2, 960, 96000, {}),
    "mono_2p5ms": (1, 120, 48000, {}),
    "mono_5ms": (1, 240, 48000, {}),
    "stereo_10ms_128k": (2, 480, 128000, {}),
    "mono_6k_narrowband": (1, 960, 6000, {}),
    "stereo_320k": (2, 960, 320000, {}),
    "mono_transient": (1, 960, 64000, dict(signal="transient")),
    "stereo_transient_128k": (2, 960, 128000, dict(signal="transient")),
    "mono_cbr_noise": (1, 960, 32000, dict(signal="noise", cbr=True)),
    "mono_out16k": (1, 960, 64000, dict(rate_out=16000)),
    "stereo_out24k": (2, 960, 96000, dict(rate_out=24000)),
    "mono_out8k": (1, 960, 48000, dict(rate_out=8000)),
    "stereo_5ms_24k_lowcx": (2, 240, 24000, dict(cx=4)),
    "stereo_5ms_noise": (2, 240, 48000, dict(signal="noise")),
}


@pytest.mark.parametrize("name", CASES.keys())
def test_celt_decode_conformance(name):
    ch, frame, rate, kw = CASES[name]
    _run(ch, frame, rate, **kw)


def test_random_frame_fuzz_agrees_with_libopus():
    """On arbitrary (non-encoder) bytes, our decoder must track libopus'
    symbol decisions exactly — final_range equality per frame."""
    rng = np.random.default_rng(7)
    for trial in range(120):
        chans = 2 if trial % 2 else 1
        frame, cfg = [(120, 28), (240, 29), (480, 30), (960, 31)][trial % 4]
        ln = int(rng.integers(2, 40))
        body = bytes(rng.integers(0, 256, ln, dtype=np.uint8))
        toc = (cfg << 3) | (0x4 if chans == 2 else 0)
        pkt = bytes([toc]) + body
        ref = oracle.Decoder(48000, chans)
        mine = CeltDecoder(chans)
        ref.decode_float(pkt, frame)
        mine.decode(body, frame)
        assert ref.final_range == mine.final_range, (trial, body.hex())


def test_replay_reencodes_real_frames():
    """Re-encoding every decoded symbol must reproduce the original packet
    bytes (up to the final disambiguation byte) — a strong structural
    self-check of the bitstream front-end."""
    enc = oracle.Encoder(48000, 1)
    enc.ctl(oracle.SET_FORCE_MODE, oracle.MODE_CELT_ONLY)
    enc.ctl(oracle.SET_BITRATE, 64000)
    rng = np.random.default_rng(3)
    dec = CeltDecoder(1)
    sig = _signal("music", 960 * 6, rng).astype(np.float32)
    for f in range(6):
        pkt = enc.encode_float(sig[f * 960 : (f + 1) * 960], 960)
        body = pkt[1:]
        tr = TracingRangeDecoder(body)
        dec.stream_channels = int(query_packet_channel_count(pkt))
        dec.decode(body, 960, dec=tr)
        out = replay(tr.ops, len(body))
        # Raw-bit tail and final range byte may legitimately differ in the
        # last byte only.
        assert out[:-1] == body[:-1], f


def test_celt_plc_deep_loss_matches_libopus():
    """CELT concealment through a 10-frame loss burst: the pitch-LPC
    regime (losses 1-5) and the deep-loss noise regime (>= 100 ms,
    energies decaying to the backgroundLogE floor) must both track
    libopus 1.3.1 sample-accurately, including recovery frames.
    Regression for two round-2 fixes: loss accounting in 2.5 ms units
    and backgroundLogE initialised to 0 (cleared memory), not -28."""
    import opus_tpu
    from opus_tpu import Channels, DecoderConfiguration, SamplingRate

    frame, nf = 960, 24
    t = np.arange(frame * nf) / 48000
    sig = (0.5 * np.sin(2 * np.pi * 440 * t) + 0.2 * np.sin(2 * np.pi * 880 * t)).astype(np.float32)
    enc = oracle.Encoder(48000, 1)
    enc.ctl(oracle.SET_FORCE_MODE, oracle.MODE_CELT_ONLY)
    enc.ctl(oracle.SET_BITRATE, 64000)
    ref = oracle.Decoder(48000, 1)
    mine = opus_tpu.Decoder(DecoderConfiguration(SamplingRate.HZ_48000, Channels.MONO))
    lose = set(range(8, 18))
    for f in range(nf):
        pkt = enc.encode_float(sig[f * frame : (f + 1) * frame], frame)
        args = (None, frame) if f in lose else (pkt, frame)
        r = np.asarray(ref.decode_float(*args)).reshape(-1)
        m = mine.decode_float(*args).reshape(-1)
        assert float(np.abs(m - r).max()) < 2e-4, f"frame {f} (lost={f in lose})"
