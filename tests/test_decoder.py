"""Top-level Decoder conformance vs libopus (CELT-only streams)."""

import numpy as np
import pytest

from opus_tpu import oracle
from opus_tpu.decoder import Decoder, DecoderConfiguration
from opus_tpu.errors import BadArguments, BufferTooSmall
from opus_tpu.types import Channels, SamplingRate

pytestmark = pytest.mark.skipif(not oracle.available(), reason="libopus not present")


def _stream(channels, frame, nframes, bitrate, duration_ms=None):
    enc = oracle.Encoder(48000, channels)
    enc.ctl(oracle.SET_FORCE_MODE, oracle.MODE_CELT_ONLY)
    enc.ctl(oracle.SET_BITRATE, bitrate)
    if duration_ms:
        enc.ctl(oracle.SET_EXPERT_FRAME_DURATION, duration_ms)
    rng = np.random.default_rng(11)
    n = frame * nframes
    t = np.arange(n) / 48000
    sig = 0.4 * np.sin(2 * np.pi * 440 * t) + 0.1 * rng.standard_normal(n)
    pcm = (np.stack([sig, np.roll(sig, 3) * 0.8], -1) if channels == 2 else sig[:, None]).astype(np.float32)
    return [enc.encode_float(pcm[f * frame : (f + 1) * frame].ravel(), frame) for f in range(nframes)]


@pytest.mark.parametrize(
    "channels,frame,rate_out,bitrate,duration",
    [
        (2, 960, 48000, 64000, None),
        (1, 960, 16000, 64000, None),
        (2, 960, 48000, 96000, None),
        (1, 1920, 48000, 64000, oracle.FRAMESIZE_40_MS),
        (1, 2880, 48000, 48000, oracle.FRAMESIZE_60_MS),
        (2, 480, 24000, 128000, None),
    ],
)
def test_decoder_matches_libopus(channels, frame, rate_out, bitrate, duration):
    pkts = _stream(channels, frame, 10, bitrate, duration)
    ref = oracle.Decoder(rate_out, channels)
    mine = Decoder(DecoderConfiguration(SamplingRate(rate_out), Channels(channels)))
    fo = frame * rate_out // 48000
    for f, pkt in enumerate(pkts):
        r = ref.decode_float(pkt, fo)
        m = mine.decode_float(pkt, fo)
        assert m.shape == r.shape
        assert ref.final_range == mine.final_range, f
        assert float(np.abs(r - m).max()) < 2e-5, f


def test_decoder_gain():
    pkts = _stream(2, 960, 6, 96000)
    ref = oracle.Decoder(48000, 2)
    ref.ctl(oracle.SET_GAIN, 1536)  # +6 dB in Q8
    mine = Decoder(DecoderConfiguration(SamplingRate.HZ_48000, Channels.STEREO, gain=1536))
    for pkt in pkts:
        r = ref.decode_float(pkt, 960)
        m = mine.decode_float(pkt, 960)
        assert float(np.abs(r - m).max()) < 2e-5


def test_decoder_int16_soft_clip_path():
    pkts = _stream(1, 960, 4, 64000)
    ref = oracle.Decoder(48000, 1)
    mine = Decoder(DecoderConfiguration(SamplingRate.HZ_48000, Channels.MONO))
    for pkt in pkts:
        r = ref.decode_int16(pkt, 960)
        m = mine.decode(pkt, 960, dtype=np.int16)
        assert m.dtype == np.int16
        assert int(np.abs(r.astype(np.int32) - m.astype(np.int32)).max()) <= 1


def test_decoder_errors_and_plc_shape():
    mine = Decoder(DecoderConfiguration(SamplingRate.HZ_48000, Channels.STEREO))
    with pytest.raises(BadArguments):
        mine.decode_float(b"\xfc\x00", 961)  # not a 2.5 ms multiple
    pkts = _stream(2, 960, 2, 64000)
    mine.decode_float(pkts[0], 960)
    out = mine.decode_float(None, 960)  # loss
    assert out.shape == (960, 2)
    assert mine.final_range == 0
    with pytest.raises(BufferTooSmall):
        mine.decode_float(pkts[1], 480)  # packet longer than buffer
