"""Repacketizer, multistream and Ogg container tests (SURVEY items 24/25)."""

import glob
import io

import numpy as np
import pytest

from opus_tpu import oracle, parse_packet
from opus_tpu.decoder import Decoder, DecoderConfiguration
from opus_tpu.encoder import Encoder, EncoderConfiguration
from opus_tpu.multistream import MultistreamDecoder, MultistreamEncoder
from opus_tpu.ogg import OggOpusReader, OggOpusWriter, OpusHead
from opus_tpu.repacketizer import Repacketizer
from opus_tpu.types import Channels, SamplingRate

pytestmark = pytest.mark.skipif(not oracle.available(), reason="libopus not present")


def _packets(nf=6, channels=1, frame=960, kbps=64):
    enc = oracle.Encoder(48000, channels)
    enc.ctl(oracle.SET_FORCE_MODE, oracle.MODE_CELT_ONLY)
    enc.ctl(oracle.SET_BITRATE, kbps * 1000)
    rng = np.random.default_rng(4)
    t = np.arange(frame * nf) / 48000
    sig = 0.4 * np.sin(2 * np.pi * 440 * t) + 0.05 * rng.standard_normal(frame * nf)
    pcm = (np.stack([sig, 0.8 * sig], -1) if channels == 2 else sig[:, None]).astype(np.float32)
    return [enc.encode_float(pcm[f * frame : (f + 1) * frame].ravel(), frame) for f in range(nf)]


def test_repacketizer_merge_and_split():
    pkts = _packets(4)
    rp = Repacketizer()
    for p in pkts[:3]:
        rp.cat(p)
    merged = rp.out()
    parsed = parse_packet(merged)
    assert parsed.frame_count == 3
    assert parsed.frames(merged) == [parse_packet(p).frames(p)[0] for p in pkts[:3]]
    # libopus must decode the merged packet to the same audio as the parts.
    d1 = oracle.Decoder(48000, 1)
    d2 = oracle.Decoder(48000, 1)
    a = np.concatenate([d1.decode_float(p, 960) for p in pkts[:3]])
    b = d2.decode_float(merged, 2880)
    np.testing.assert_array_equal(a, b)
    # split back out
    for i in range(3):
        sub = rp.out_range(i, i + 1)
        assert parse_packet(sub).frames(sub)[0] == parse_packet(pkts[i]).frames(pkts[i])[0]


def test_repacketizer_padding():
    pkts = _packets(2)
    rp = Repacketizer()
    rp.cat(pkts[0])
    padded = rp.out_range(0, 1, pad_to=400)
    assert len(padded) == 400
    parsed = parse_packet(padded)
    assert parsed.frames(padded)[0] == parse_packet(pkts[0]).frames(pkts[0])[0]
    d1 = oracle.Decoder(48000, 1)
    d2 = oracle.Decoder(48000, 1)
    np.testing.assert_array_equal(d1.decode_float(pkts[0], 960), d2.decode_float(padded, 960))


def test_multistream_roundtrip_8ch():
    streams, coupled = 6, 2
    mapping = list(range(8))
    rng = np.random.default_rng(5)
    frame, nf = 960, 4
    t = np.arange(frame * nf) / 48000
    pcm = np.stack(
        [0.3 * np.sin(2 * np.pi * (200 + 80 * k) * t) + 0.02 * rng.standard_normal(frame * nf) for k in range(8)], -1
    ).astype(np.float32)
    enc = oracle.MultistreamEncoder(48000, 8, streams, coupled, mapping)
    enc.ctl(oracle.SET_BITRATE, 512000)
    enc.ctl(oracle.SET_FORCE_MODE, oracle.MODE_CELT_ONLY)
    dref = oracle.MultistreamDecoder(48000, 8, streams, coupled, mapping)
    dmine = MultistreamDecoder(SamplingRate.HZ_48000, 8, streams, coupled, mapping)
    for f in range(nf):
        pkt = enc.encode_float(pcm[f * frame : (f + 1) * frame].ravel(), frame)
        r = dref.decode_float(pkt, frame)
        m = dmine.decode(pkt, frame)
        assert dref.final_range == dmine.final_range, f
        assert float(np.abs(r - m).max()) < 2e-5


def test_multistream_encoder_accepted_by_libopus():
    streams, coupled = 3, 1
    mapping = [0, 1, 2, 3]
    rng = np.random.default_rng(6)
    frame = 960
    t = np.arange(frame * 3) / 48000
    pcm = np.stack([0.3 * np.sin(2 * np.pi * (300 + 50 * k) * t) for k in range(4)], -1).astype(np.float32)
    menc = MultistreamEncoder(SamplingRate.HZ_48000, 4, streams, coupled, mapping, 96000)
    dref = oracle.MultistreamDecoder(48000, 4, streams, coupled, mapping)
    dmine = MultistreamDecoder(SamplingRate.HZ_48000, 4, streams, coupled, mapping)
    for f in range(3):
        pkt = menc.encode(pcm[f * frame : (f + 1) * frame])
        r = dref.decode_float(pkt, frame)
        m = dmine.decode(pkt, frame)
        assert dref.final_range == dmine.final_range == menc.final_range
        assert float(np.abs(r - m).max()) < 2e-5


def _libopusfile():
    try:
        import ctypes

        ctypes.CDLL(glob.glob("/opt/venv/lib/python3.12/site-packages/pygame.libs/libogg-*.so*")[0], mode=ctypes.RTLD_GLOBAL)
        ctypes.CDLL(glob.glob("/opt/venv/lib/python3.12/site-packages/pygame.libs/libopus-*.so*")[0], mode=ctypes.RTLD_GLOBAL)
        return ctypes.CDLL(glob.glob("/opt/venv/lib/python3.12/site-packages/pygame.libs/libopusfile-*.so*")[0])
    except Exception:
        return None


def test_ogg_roundtrip_and_libopusfile():
    import ctypes

    enc = Encoder(EncoderConfiguration(SamplingRate.HZ_48000, Channels.STEREO, 96000))
    rng = np.random.default_rng(2)
    nf, frame = 6, 960
    t = np.arange(frame * nf) / 48000
    sig = (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    pcm = np.stack([sig, 0.7 * sig], -1)
    buf = io.BytesIO()
    w = OggOpusWriter(buf, OpusHead(channels=2, pre_skip=120))
    for f in range(nf):
        w.write_packet(enc.encode(pcm[f * frame : (f + 1) * frame]), frame, end_of_stream=(f == nf - 1))
    data = buf.getvalue()

    r = OggOpusReader(data)
    assert r.head.channels == 2 and r.head.pre_skip == 120
    assert len(r.audio_packets) == nf

    of = _libopusfile()
    if of is None:
        pytest.skip("libopusfile not present")
    of.op_open_memory.restype = ctypes.c_void_p
    err = ctypes.c_int()
    h = of.op_open_memory(data, len(data), ctypes.byref(err))
    assert err.value == 0 and h
    out = np.zeros(8192 * 2, np.float32)
    got = []
    while True:
        n = of.op_read_float(ctypes.c_void_p(h), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), 8192, None)
        if n <= 0:
            break
        got.append(out[: n * 2].reshape(n, 2).copy())
    decoded = np.concatenate(got)
    dec = Decoder(DecoderConfiguration(SamplingRate.HZ_48000, Channels.STEREO))
    ours = np.concatenate([dec.decode_float(p, 960) for p in r.audio_packets])[120:]
    nmin = min(len(ours), len(decoded))
    assert float(np.abs(decoded[:nmin] - ours[:nmin]).max()) < 2e-5


def test_surround_ogg_roundtrip():
    """5.1-layout multistream inside Ogg (mapping family 1): header fields
    survive the container and every packet decodes identically in our
    MultistreamDecoder and libopus."""
    import io

    import numpy as np

    from opus_tpu import oracle
    from opus_tpu.multistream import MultistreamDecoder, MultistreamEncoder
    from opus_tpu.ogg import OggOpusReader, OggOpusWriter, OpusHead
    from opus_tpu.types import SamplingRate

    if not oracle.available():
        import pytest

        pytest.skip("libopus not present")
    ch, streams, coupled = 6, 4, 2
    mapping = [0, 4, 1, 2, 3, 5]
    enc = MultistreamEncoder(SamplingRate.HZ_48000, ch, streams, coupled, mapping,
                             bitrate_per_stream=96000)
    t = np.arange(960 * 6) / 48000
    rng = np.random.default_rng(5)
    pcm = np.stack([0.25 * np.sin(2 * np.pi * (180 + 70 * k) * t)
                    + 0.02 * rng.standard_normal(len(t)) for k in range(ch)], -1).astype(np.float32)
    head = OpusHead(channels=ch, pre_skip=0, mapping_family=1, streams=streams,
                    coupled=coupled, mapping=tuple(mapping))
    buf = io.BytesIO()
    w = OggOpusWriter(buf, head)
    for f in range(6):
        w.write_packet(enc.encode(pcm[f * 960 : (f + 1) * 960]), 960, end_of_stream=f == 5)
    w.close()
    r = OggOpusReader(buf.getvalue())
    h = r.head
    assert (h.channels, h.mapping_family, h.streams, h.coupled, tuple(h.mapping)) == (
        ch, 1, streams, coupled, tuple(mapping))
    dec = MultistreamDecoder(SamplingRate.HZ_48000, ch, h.streams, h.coupled, list(h.mapping))
    ref = oracle.MultistreamDecoder(48000, ch, streams, coupled, mapping)
    for pkt in r.packets[2:]:
        m = dec.decode(pkt, 960)
        rr = np.asarray(ref.decode_float(pkt, 960)).reshape(960, ch)
        assert dec.final_range == ref.final_range
        assert float(np.abs(m - rr).max()) < 1e-5
