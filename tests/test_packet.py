"""Packet-layer tests.

Golden values mirror the reference test suite
(/root/reference/src/lib.rs:641-890) and are cross-checked against the
system libopus (opus_packet_parse / opus_decoder_get_nb_samples) where
available.
"""

import ctypes

import numpy as np
import pytest

from opus_tpu import (
    Bandwidth,
    Channels,
    CodecMode,
    InvalidPacket,
    SamplingRate,
    parse_packet,
    pcm_soft_clip,
    query_packet_bandwidth,
    query_packet_channel_count,
    query_packet_codec_mode,
    query_packet_frame_count,
    query_packet_sample_count,
    query_packet_samples_per_frame,
)
from opus_tpu import oracle

TEST_PACKET_SINGLE = bytes(
    [0x80, 0xDA, 0x84, 0xE8, 0x87, 0x77, 0x83, 0xD6, 0x48, 0xB3, 0x6B, 0x45]
)
TEST_PACKET_CBR = bytes([0x81, 0xDA, 0x84, 0xE8, 0x87, 0x77, 0x83, 0xD6, 0x48, 0xB3, 0x6B])
TEST_PACKET_VBR = bytes(
    [0x82, 0x4, 0xDA, 0x84, 0xE8, 0x87, 0x77, 0x83, 0xD6, 0x48, 0xB3, 0x6B]
)
TEST_PACKET_INVALID = bytes([0x81, 0xDA])


def test_query_packet_bandwidth():
    # Golden table: reference lib.rs:652-695.
    expected = (
        [Bandwidth.NARROWBAND] * 4
        + [Bandwidth.MEDIUMBAND] * 4
        + [Bandwidth.WIDEBAND] * 4
        + [Bandwidth.SUPERWIDEBAND] * 2
        + [Bandwidth.FULLBAND] * 2
        + [Bandwidth.NARROWBAND] * 4
        + [Bandwidth.WIDEBAND] * 4
        + [Bandwidth.SUPERWIDEBAND] * 4
        + [Bandwidth.FULLBAND] * 4
    )
    for config in range(32):
        assert query_packet_bandwidth(bytes([config << 3])) == expected[config]


def test_query_packet_channel_count():
    assert query_packet_channel_count(bytes([0])) == Channels.MONO
    assert query_packet_channel_count(bytes([0x4])) == Channels.STEREO


def test_query_packet_frame_count():
    assert query_packet_frame_count(bytes([0])) == 1
    assert query_packet_frame_count(bytes([1])) == 2
    assert query_packet_frame_count(bytes([2])) == 2
    with pytest.raises(InvalidPacket):
        query_packet_frame_count(bytes([3]))
    assert query_packet_frame_count(bytes([3, 5])) == 5


def test_query_packet_samples_per_frame():
    # Golden table: reference lib.rs:713-755.
    expected = [
        480, 960, 1920, 2880, 480, 960, 1920, 2880, 480, 960, 1920, 2880,
        480, 960, 480, 960, 120, 240, 480, 960, 120, 240, 480, 960,
        120, 240, 480, 960, 120, 240, 480, 960,
    ]
    for config in range(32):
        got = query_packet_samples_per_frame(bytes([config << 3]), SamplingRate.HZ_48000)
        assert got == expected[config], config


def test_query_packet_sample_count():
    assert query_packet_sample_count(bytes([70]), SamplingRate.HZ_48000) == 960
    with pytest.raises(InvalidPacket):
        query_packet_sample_count(bytes([3]), SamplingRate.HZ_48000)
    assert query_packet_sample_count(bytes([255, 5]), SamplingRate.HZ_48000) == 4800


def test_query_packet_codec_mode():
    assert query_packet_codec_mode(bytes([0x80])) == CodecMode.CELT_ONLY
    assert query_packet_codec_mode(bytes([0x60])) == CodecMode.HYBRID
    assert query_packet_codec_mode(bytes([0x00])) == CodecMode.SILK_ONLY


def test_parse_packet_single_frame():
    p = parse_packet(TEST_PACKET_SINGLE)
    assert p.frame_count == 1
    assert p.frame_offsets == (1,)
    assert p.frame_sizes == (11,)
    assert p.payload_offset == 1
    assert p.packet_offset == 12


def test_parse_packet_two_cbr_frames():
    p = parse_packet(TEST_PACKET_CBR)
    assert p.frame_count == 2
    assert p.frame_offsets == (1, 6)
    assert p.frame_sizes == (5, 5)
    assert p.payload_offset == 1
    assert p.packet_offset == 11


def test_parse_packet_two_vbr_frames():
    p = parse_packet(TEST_PACKET_VBR)
    assert p.frame_count == 2
    assert p.frame_offsets == (2, 6)
    assert p.frame_sizes == (4, 6)
    assert p.payload_offset == 2
    assert p.packet_offset == 12


def test_parse_packet_invalid():
    with pytest.raises(InvalidPacket):
        parse_packet(TEST_PACKET_INVALID)


@pytest.mark.skipif(not oracle.available(), reason="libopus not present")
def test_parse_packet_matches_libopus_fuzz():
    """Random packets must parse identically to opus_packet_parse."""
    lib = oracle.load()
    rng = np.random.default_rng(1234)
    agreements = 0
    for _ in range(4000):
        n = int(rng.integers(1, 64))
        pkt = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        buf = ctypes.create_string_buffer(pkt, n)
        frames = (ctypes.c_void_p * 48)()
        sizes = (ctypes.c_int16 * 48)()
        payload_offset = ctypes.c_int()
        rc = lib.opus_packet_parse(
            buf, n, None, frames, sizes, ctypes.byref(payload_offset)
        )
        try:
            parsed = parse_packet(pkt)
        except InvalidPacket:
            parsed = None
        if rc < 0:
            assert parsed is None, f"libopus rejected, we accepted: {pkt.hex()}"
        else:
            assert parsed is not None, f"libopus accepted, we rejected: {pkt.hex()}"
            assert parsed.frame_count == rc
            assert list(parsed.frame_sizes) == [sizes[i] for i in range(rc)]
            base = ctypes.addressof(buf)
            got_offsets = [frames[i] - base for i in range(rc)]
            assert list(parsed.frame_offsets) == got_offsets
            agreements += 1
    assert agreements > 100  # make sure the fuzz actually exercised valid packets


@pytest.mark.skipif(not oracle.available(), reason="libopus not present")
def test_sample_count_matches_libopus():
    lib = oracle.load()
    rng = np.random.default_rng(99)
    for _ in range(2000):
        n = int(rng.integers(1, 8))
        pkt = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        for rate in (8000, 12000, 16000, 24000, 48000):
            got_rc = lib.opus_packet_get_nb_samples(pkt, n, rate)
            try:
                ours = query_packet_sample_count(pkt, rate)
            except InvalidPacket:
                ours = -1
            if got_rc < 0:
                assert ours == -1
            else:
                assert ours == got_rc


def test_pcm_soft_clip_bounds():
    # Reference lib.rs:863-890 sweep: all offsets, 1-8 channels.
    x = np.zeros(1024, dtype=np.float32)
    s = np.zeros(8, dtype=np.float32)
    for i in range(0, 1024, 16):  # stride the offsets to keep runtime sane
        x[:] = (np.arange(1024) & 255).astype(np.float32) / 32.0 - 4.0
        pcm_soft_clip(x[i:], 1, s)
        assert np.all(x[i:] <= 1.0) and np.all(x[i:] >= -1.0)
    for ch in range(1, 9):
        x[:] = (np.arange(1024) & 255).astype(np.float32) / 32.0 - 4.0
        pcm_soft_clip(x, ch, s)
        usable = (1024 // ch) * ch
        assert np.all(x[:usable] <= 1.0) and np.all(x[:usable] >= -1.0)


@pytest.mark.skipif(not oracle.available(), reason="libopus not present")
def test_pcm_soft_clip_matches_libopus():
    lib = oracle.load()
    rng = np.random.default_rng(7)
    for ch in (1, 2):
        ours = (rng.standard_normal(480 * ch) * 1.5).astype(np.float32)
        theirs = ours.copy()
        mem_ours = np.zeros(ch, dtype=np.float32)
        mem_theirs = np.zeros(ch, dtype=np.float32)
        for _ in range(4):  # several frames to exercise carried state
            pcm_soft_clip(ours, ch, mem_ours)
            lib.opus_pcm_soft_clip(
                theirs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                theirs.size // ch,
                ch,
                mem_theirs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            )
            np.testing.assert_array_equal(ours, theirs)
            new = (rng.standard_normal(480 * ch) * 1.5).astype(np.float32)
            ours = new.copy()
            theirs = new.copy()
