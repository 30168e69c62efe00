"""CELT encoder tests: libopus is the conformance decoder.

The key oracle (SURVEY.md §7 step 7): libopus must decode our bitstream,
and its final_range must equal both our encoder's and our decoder's —
three independent range-coder states agreeing per frame proves the stream
is exactly what we think it is."""

import numpy as np
import pytest

from opus_tpu import oracle
from opus_tpu.decoder import Decoder, DecoderConfiguration
from opus_tpu.encoder import Encoder, EncoderConfiguration
from opus_tpu.types import Channels, SamplingRate

pytestmark = pytest.mark.skipif(not oracle.available(), reason="libopus not present")


def _sig(n, channels, seed=3):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 48000
    s = 0.4 * np.sin(2 * np.pi * 440 * t) + 0.15 * np.sin(2 * np.pi * 1870 * t) + 0.05 * rng.standard_normal(n)
    if channels == 2:
        return np.stack([s, 0.8 * np.roll(s, 5)], -1).astype(np.float32)
    return s[:, None].astype(np.float32)


@pytest.mark.parametrize(
    "channels,frame,kbps",
    [(1, 960, 64), (2, 960, 96), (1, 480, 64), (2, 240, 128), (1, 120, 96), (2, 960, 48), (1, 960, 510)],
)
def test_encoder_three_way_final_range(channels, frame, kbps):
    enc = Encoder(EncoderConfiguration(SamplingRate.HZ_48000, Channels(channels), kbps * 1000))
    dec_lib = oracle.Decoder(48000, channels)
    dec_mine = Decoder(DecoderConfiguration(SamplingRate.HZ_48000, Channels(channels)))
    pcm = _sig(frame * 8, channels)
    for f in range(8):
        pkt = enc.encode(pcm[f * frame : (f + 1) * frame])
        r = dec_lib.decode_float(pkt, frame)
        m = dec_mine.decode_float(pkt, frame)
        assert dec_lib.final_range == enc.final_range, f
        assert dec_mine.final_range == enc.final_range, f
        assert float(np.abs(r - m).max()) < 2e-5, f


def test_encoder_quality_against_libopus():
    """Delay-compensated SNR must be within a few dB of libopus CBR."""
    frame, nf = 960, 25
    sig = _sig(frame * nf, 1)[:, 0]
    enc = Encoder(EncoderConfiguration(SamplingRate.HZ_48000, Channels.MONO, 96000))
    dec = oracle.Decoder(48000, 1)
    out = np.concatenate(
        [dec.decode_float(enc.encode(sig[f * frame : (f + 1) * frame][:, None]), frame)[:, 0] for f in range(nf)]
    )
    d = 120  # our analysis delay: one MDCT overlap
    a = out[d:].astype(np.float64)
    b = sig[: len(a)].astype(np.float64)
    err = a - b
    snr = 10 * np.log10(np.sum(b[4800:] ** 2) / np.sum(err[4800:] ** 2))
    assert snr > 18.0, snr


def test_encoder_decoder_roundtrip_without_libopus():
    """Self round trip (our encoder -> our decoder) reconstructs audio."""
    frame = 960
    enc = Encoder(EncoderConfiguration(SamplingRate.HZ_48000, Channels.STEREO, 128000))
    dec = Decoder(DecoderConfiguration(SamplingRate.HZ_48000, Channels.STEREO))
    pcm = _sig(frame * 10, 2)
    outs = []
    for f in range(10):
        pkt = enc.encode(pcm[f * frame : (f + 1) * frame])
        outs.append(dec.decode_float(pkt, frame))
    out = np.concatenate(outs)[120:]
    ref = pcm[: out.shape[0]].astype(np.float64)
    err = out - ref
    snr = 10 * np.log10(np.sum(ref[4800:] ** 2) / max(np.sum(err[4800:] ** 2), 1e-30))
    # Untuned analysis (no dynalloc/trim/tf decisions yet) gives ~17 dB on
    # this noisy stereo signal at 128k; libopus' tuned encoder gives ~20.
    assert snr > 15.0, snr


def test_transient_frames_roundtrip():
    """Click train triggers short-block frames; packets stay range-exact."""
    import opus_tpu.celt.encoder as CE
    from opus_tpu.encoder import Encoder, EncoderConfiguration

    frame, nf = 960, 8
    sig = np.zeros((frame * nf, 1), np.float32)
    for i in range(1500, frame * nf - 200, 2300):
        sig[i : i + 60, 0] = 0.8 * np.exp(-np.arange(60) / 10)
    count = {"n": 0}
    orig = CE.CeltEncoder._transient_decision

    def counting(self, pre, m):
        r = orig(self, pre, m)
        count["n"] += bool(r)
        return r

    CE.CeltEncoder._transient_decision = counting
    try:
        enc = Encoder(EncoderConfiguration(SamplingRate.HZ_48000, Channels.MONO, 96000))
        enc._native_enc = None  # white-box test of the Python CELT plane
        ref = oracle.Decoder(48000, 1)
        mine = Decoder(DecoderConfiguration(SamplingRate.HZ_48000, Channels.MONO))
        for f in range(nf):
            pkt = enc.encode(sig[f * frame : (f + 1) * frame])
            m = mine.decode_float(pkt, frame)[:, 0]
            r = np.asarray(ref.decode_float(pkt, frame)).reshape(-1)
            assert mine.final_range == ref.final_range
            assert float(np.abs(m - r).max()) < 2e-5
    finally:
        CE.CeltEncoder._transient_decision = orig
    assert count["n"] >= 2, "transient analysis never fired on a click train"


def test_celt_vbr_rate_control():
    """VBR: packet sizes follow content (transient boost, quiet cut) while
    the reservoir holds the long-term average at the configured bitrate."""
    frame, nf = 960, 40
    t = np.arange(frame * nf) / 48000
    rng = np.random.default_rng(2)
    sig = 0.25 * np.sin(2 * np.pi * 440 * t) + 0.05 * rng.standard_normal(frame * nf)
    sig[::9600] += 0.7
    sig = np.where((t % 0.5) > 0.35, sig * 0.02, sig).astype(np.float32)
    enc = Encoder(EncoderConfiguration(SamplingRate.HZ_48000, Channels.MONO, 64000,
                                       application="music", vbr=True))
    mine = Decoder(DecoderConfiguration(SamplingRate.HZ_48000, Channels.MONO))
    ref = oracle.Decoder(48000, 1)
    sizes = []
    for f in range(nf):
        pkt = enc.encode(sig[f * frame : (f + 1) * frame, None])
        sizes.append(len(pkt))
        r = np.asarray(ref.decode_float(pkt, frame)).reshape(-1)
        m = mine.decode_float(pkt, frame)[:, 0]
        assert ref.final_range == mine.final_range
        assert float(np.abs(m - r).max()) < 1e-5
    kbps = sum(sizes) * 8 / (nf * 0.02) / 1000
    assert max(sizes) - min(sizes) > 20, "sizes never varied"
    assert abs(kbps - 64) < 64 * 0.15, f"long-term rate {kbps:.1f} kbps"


@pytest.mark.parametrize("bw,cfg,endband", [("NB", 19, 13), ("WB", 23, 17), ("SWB", 27, 19)])
def test_celt_bandwidth_limited(bw, cfg, endband):
    """CELT-only NB/WB/SWB encode (ToC config blocks 16/20/24; coded band
    limit 13/17/19 — RFC 6716 table 2)."""
    rng = np.random.default_rng(6)
    frame, nf = 960, 6
    t = np.arange(frame * nf) / 48000
    sig = (0.3 * np.sin(2 * np.pi * 440 * t) + 0.1 * np.sin(2 * np.pi * 3000 * t)
           + 0.03 * rng.standard_normal(frame * nf)).astype(np.float32)
    pcm = np.stack([sig, np.roll(sig, 7) * 0.9], -1)
    enc = Encoder(EncoderConfiguration(SamplingRate.HZ_48000, Channels.STEREO, 64000,
                                       application="music", bandwidth=bw))
    ref = oracle.Decoder(48000, 2)
    mine = Decoder(DecoderConfiguration(SamplingRate.HZ_48000, Channels.STEREO))
    for f in range(nf):
        pkt = enc.encode(pcm[f * frame : (f + 1) * frame])
        assert (pkt[0] >> 3) == cfg
        r = np.asarray(ref.decode_float(pkt, frame)).reshape(frame, 2)
        m = mine.decode_float(pkt, frame)
        assert ref.final_range == mine.final_range, f
        assert float(np.abs(m - r).max()) < 1e-5


def test_celt_silence_flag():
    """Digitally-silent frames code the CELT silence flag; VBR shrinks
    them to 3 bytes; energy memory resets match the decoder."""
    frame = 960
    t = np.arange(frame * 12) / 48000
    sig = (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    sig[frame * 4 : frame * 8] = 0.0
    enc = Encoder(EncoderConfiguration(SamplingRate.HZ_48000, Channels.MONO, 64000,
                                       application="music", vbr=True))
    ref = oracle.Decoder(48000, 1)
    mine = Decoder(DecoderConfiguration(SamplingRate.HZ_48000, Channels.MONO))
    sizes = []
    for f in range(12):
        pkt = enc.encode(sig[f * frame : (f + 1) * frame, None])
        sizes.append(len(pkt))
        r = np.asarray(ref.decode_float(pkt, frame)).reshape(-1)
        m = mine.decode_float(pkt, frame)[:, 0]
        assert ref.final_range == mine.final_range, f
        assert float(np.abs(m - r).max()) < 1e-5
    assert all(s == 3 for s in sizes[4:8]), sizes


def test_spread_decision_tonal_vs_noise():
    """Tonal frames choose LIGHT/NONE spreading; noise stays NORMAL."""
    import opus_tpu.celt.encoder as CE

    frame = 960
    t = np.arange(frame * 8) / 48000
    rng = np.random.default_rng(11)
    decs = {}
    orig = CE.CeltEncoder._spread_decision
    for name, sig in [("tone", (0.5 * np.sin(2 * np.pi * 1000 * t)).astype(np.float32)),
                      ("noise", (0.2 * rng.standard_normal(frame * 8)).astype(np.float32))]:
        got = []
        CE.CeltEncoder._spread_decision = lambda self, *a: got.append(orig(self, *a)) or got[-1]
        enc = Encoder(EncoderConfiguration(SamplingRate.HZ_48000, Channels.MONO, 64000,
                                           application="music"))
        enc._native_enc = None  # white-box test of the Python CELT plane
        ref = oracle.Decoder(48000, 1)
        for f in range(8):
            ref.decode_float(enc.encode(sig[f * frame : (f + 1) * frame, None]), frame)
        decs[name] = got
        CE.CeltEncoder._spread_decision = orig
    assert any(v < 2 for v in decs["tone"]), decs["tone"]
    assert all(v == 2 for v in decs["noise"]), decs["noise"]


def test_encoder_ctl_surface():
    """Runtime controls: bitrate/bandwidth/complexity/vbr mid-stream, with
    every produced packet decoded by live libopus."""
    import opus_tpu
    from opus_tpu.encoder import Encoder, EncoderConfiguration

    if not oracle.available():
        pytest.skip("libopus not present")
    enc = Encoder(EncoderConfiguration(bitrate=64000, application="music"))
    ref = oracle.Decoder(48000, 2)
    ours = opus_tpu.Decoder()
    t = np.arange(960 * 8) / 48000.0
    sig = (0.4 * np.sin(2 * np.pi * 440 * t) + 0.1 * np.sin(2 * np.pi * 3000 * t)).astype(np.float32)
    pcm = np.stack([sig, np.roll(sig, 5)], -1)
    sizes = []
    for f in range(8):
        if f == 2:
            enc.ctl("bitrate", 128000)
        if f == 4:
            enc.set_bandwidth("WB")
        if f == 5:
            enc.set_complexity(0)
        if f == 6:
            enc.set_vbr(True)
        pkt = enc.encode(pcm[f * 960 : (f + 1) * 960])
        sizes.append(len(pkt))
        r = ref.decode_float(pkt, 960)
        o = ours.decode_float(pkt, 960)
        assert enc.final_range == ref.final_range == ours.final_range
        assert np.abs(np.asarray(o).reshape(-1) - np.asarray(r).reshape(-1)).max() < 2e-5
    assert sizes[2] > sizes[1] * 1.5  # bitrate jump took effect

    # FEC toggling on a voice stream.
    venc = Encoder(EncoderConfiguration(bitrate=24000, application="voice",
                                        channels=opus_tpu.Channels.MONO, bandwidth="WB",
                                        sampling_rate=opus_tpu.SamplingRate.HZ_16000))
    venc.set_inband_fec(True)
    venc.set_packet_loss_perc(20)
    vref = oracle.Decoder(48000, 1)
    v = np.sin(2 * np.pi * 220 * np.arange(320 * 4) / 16000).astype(np.float32) * 0.5
    for f in range(4):
        pkt = venc.encode(v[f * 320 : (f + 1) * 320][:, None])
        vref.decode_float(pkt, 960)
        assert venc.final_range == vref.final_range
    venc.set_packet_loss_perc(0)  # disables LBRR
    pkt = venc.encode(v[:320][:, None])
    vref.decode_float(pkt, 960)
    assert venc.final_range == vref.final_range


def test_celt_prefilter_pitched_content():
    """The pitch prefilter fires on voiced/harmonic content, every stream
    stays libopus-decodable, and quality does not regress vs prefilter-off
    (the round-1 failure mode; validated with aligned SNR, not raw SNR)."""
    import opus_tpu
    from opus_tpu.encoder import Encoder, EncoderConfiguration

    if not oracle.available():
        pytest.skip("libopus not present")
    rng = np.random.default_rng(8)
    frame, NF = 960, 16
    t = np.arange(frame * NF) / 48000.0
    ph = np.cumsum(2 * np.pi * (160 + 20 * np.sin(2 * np.pi * 1.1 * t)) / 48000.0)
    sig = (0.35 * np.sin(ph) + 0.22 * np.sin(2 * ph) + 0.12 * np.sin(3 * ph)
           + 0.02 * rng.standard_normal(t.size)).astype(np.float32)
    pcm = np.stack([sig, np.roll(sig, 7) * 0.9], -1)

    def run(complexity):
        enc = Encoder(EncoderConfiguration(bitrate=48000, application="music"))
        enc._native_enc = None  # white-box test of the Python CELT plane
        enc.set_complexity(complexity)
        ref = oracle.Decoder(48000, 2)
        ours = opus_tpu.Decoder()
        out, fired = [], 0
        for f in range(NF):
            pkt = enc.encode(pcm[f * frame : (f + 1) * frame])
            fired += enc.celt.prefilter_gain > 0
            r = np.asarray(ref.decode_float(pkt, frame)).reshape(frame, 2)
            o = np.asarray(ours.decode_float(pkt, frame)).reshape(frame, 2)
            assert enc.final_range == ref.final_range == ours.final_range
            assert np.abs(o - r).max() < 2e-5
            out.append(r)
        dec = np.concatenate(out)
        a = pcm[frame * 2 : frame * (NF - 1)]
        b = dec[frame * 2 + 120 : frame * (NF - 1) + 120]  # CELT overlap delay
        d = a - b
        return fired, 10 * np.log10(float((a**2).sum()) / float((d**2).sum()))

    fired_on, snr_on = run(10)
    fired_off, snr_off = run(4)  # complexity < 5 disables the prefilter
    assert fired_off == 0
    assert fired_on >= NF * 3 // 4, fired_on
    assert snr_on >= snr_off - 0.25, (snr_on, snr_off)


@pytest.mark.parametrize("channels,frame,kbps,vbr", [
    (2, 1920, 96, False), (1, 2880, 64, False), (2, 2880, 128, True),
])
def test_encoder_music_40_60ms_code3(channels, frame, kbps, vbr):
    """40/60 ms music packets: CELT caps at 20 ms, so the encoder packs
    2-3 independent 20 ms frames as one code-3 packet (ref lib.rs:250-263
    frame-count framing; envelope lib.rs:20-28).  Conformance gates: the
    ToC/framing parses to the right frame count and duration, libopus
    decodes the packet, and all three range-coder states agree
    (final_range = the LAST frame's, per the decoder's multi-frame
    loop)."""
    from opus_tpu import (
        parse_packet, query_packet_frame_count, query_packet_sample_count,
    )

    enc = Encoder(EncoderConfiguration(
        SamplingRate.HZ_48000, Channels(channels), kbps * 1000, vbr=vbr))
    dec_lib = oracle.Decoder(48000, channels)
    dec_mine = Decoder(DecoderConfiguration(
        SamplingRate.HZ_48000, Channels(channels)))
    pcm = _sig(frame * 4, channels)
    m = frame // 960
    for f in range(4):
        pkt = enc.encode(pcm[f * frame : (f + 1) * frame])
        # 2 equal frames may compact to code 1; 3 frames / VBR use code 3
        assert pkt[0] & 0x3 == (1 if (m == 2 and not vbr) else 3), hex(pkt[0])
        assert query_packet_frame_count(pkt) == m
        assert query_packet_sample_count(pkt, SamplingRate.HZ_48000) == frame
        parsed = parse_packet(pkt)
        assert len(parsed.frame_sizes) == m
        r = dec_lib.decode_float(pkt, frame)
        mm = dec_mine.decode_float(pkt, frame)
        assert dec_lib.final_range == enc.final_range, f
        assert dec_mine.final_range == enc.final_range, f
        assert np.asarray(r).size == frame * channels
        assert float(np.abs(np.asarray(r) - np.asarray(mm)).max()) < 2e-5, f


def test_encoder_music_40ms_dtx_silence():
    """DTX during a 40 ms music stream emits 2-byte code-3 packets of
    zero-length frames — the silence packet keeps the 40 ms cadence."""
    from opus_tpu import query_packet_sample_count

    enc = Encoder(EncoderConfiguration(
        SamplingRate.HZ_48000, Channels.MONO, 64000, dtx=True))
    dec_lib = oracle.Decoder(48000, 1)
    pcm = _sig(1920 * 6, 1)
    pcm[1920 * 2 :] = 0.0  # silence from frame 2 on
    sizes = []
    for f in range(6):
        pkt = enc.encode(pcm[f * 1920 : (f + 1) * 1920])
        sizes.append(len(pkt))
        assert query_packet_sample_count(pkt, SamplingRate.HZ_48000) == 1920
        out = dec_lib.decode_float(pkt, 1920)  # libopus accepts every packet
        assert np.asarray(out).size == 1920
    assert min(sizes[3:]) <= 2  # ToC+count silence packets after hangover
