"""Decoder robustness: malformed input must decode or raise OpusError —
never crash with an internal exception (reference error.rs surface)."""

import numpy as np
import pytest

from opus_tpu import oracle
from opus_tpu.decoder import Decoder, DecoderConfiguration
from opus_tpu.errors import OpusError
from opus_tpu.types import Channels, SamplingRate


def test_random_packets_never_crash():
    rng = np.random.default_rng(0)
    dec = Decoder(DecoderConfiguration(SamplingRate.HZ_48000, Channels.STEREO))
    for _ in range(150):
        n = int(rng.integers(1, 200))
        pkt = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        try:
            out = dec.decode_float(pkt, 5760)  # 120 ms buffer fits any packet
            assert 0 < out.shape[0] <= 5760 and out.shape[1] == 2
            assert np.isfinite(out).all()
        except OpusError:
            pass


def test_corrupt_real_packets_never_crash():
    if not oracle.available():
        pytest.skip("libopus not present")
    enc = oracle.Encoder(48000, 2)
    enc.ctl(oracle.SET_BITRATE, 96000)
    t = np.arange(960) / 48000
    pcm = (0.3 * np.stack([np.sin(2 * np.pi * 440 * t)] * 2, -1)).astype(np.float32)
    real = enc.encode_float(pcm.ravel(), 960)
    rng = np.random.default_rng(1)
    dec = Decoder(DecoderConfiguration(SamplingRate.HZ_48000, Channels.STEREO))
    for cut in range(1, len(real), 7):  # truncations
        try:
            dec.decode_float(real[:cut], 960)
        except OpusError:
            pass
    for _ in range(100):  # bit flips
        b = bytearray(real)
        for _ in range(int(rng.integers(1, 6))):
            b[int(rng.integers(0, len(b)))] ^= 1 << int(rng.integers(0, 8))
        try:
            out = dec.decode_float(bytes(b), 960)
            assert np.isfinite(out).all()
        except OpusError:
            pass


def test_buffer_too_small_matches_libopus():
    """frame_size smaller than the packet duration -> BufferTooSmall
    (libopus OPUS_BUFFER_TOO_SMALL semantics, decoder.rs:148-193 scope)."""
    from opus_tpu.errors import BufferTooSmall

    if not oracle.available():
        pytest.skip("libopus not present")
    enc = oracle.Encoder(16000, 1)
    enc.ctl(oracle.SET_FORCE_MODE, oracle.MODE_SILK_ONLY)
    pkt = enc.encode_float(np.zeros(960, np.float32), 960)  # 60 ms
    dec = Decoder(DecoderConfiguration(SamplingRate.HZ_16000, Channels.MONO))
    with pytest.raises(BufferTooSmall):
        dec.decode_float(pkt, 320)
