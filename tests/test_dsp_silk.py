"""Batched TPU SILK synthesis plane vs the normative host decoder."""

import math

import numpy as np
import pytest

from opus_tpu import oracle, parse_packet

pytestmark = pytest.mark.skipif(not oracle.available(), reason="libopus not present")


def test_silk_device_plane_parity():
    from opus_tpu.batch.silk_pipeline import BatchedSilkDecoder
    from opus_tpu.decoder import Decoder, DecoderConfiguration
    from opus_tpu.types import Channels, SamplingRate

    B, fs, frame, nf = 4, 16000, 320, 8
    encs = []
    for b in range(B):
        e = oracle.Encoder(fs, 1)
        e.ctl(oracle.SET_FORCE_MODE, oracle.MODE_SILK_ONLY)
        e.ctl(oracle.SET_BITRATE, [16, 24, 32, 40][b] * 1000)
        encs.append(e)
    t = np.arange(frame * nf) / fs
    streams = []
    for b in range(B):
        rng = np.random.default_rng(b)
        phase = np.cumsum(2 * np.pi * (100 + 20 * b + 30 * np.sin(2 * np.pi * 3 * t)) / fs)
        s = 0.35 * np.sign(np.sin(phase)) * np.exp(-3 * (t % 0.01) * 100) + 0.02 * rng.standard_normal(frame * nf)
        streams.append(s.astype(np.float32))

    bd = BatchedSilkDecoder(B, 16)
    hosts = [Decoder(DecoderConfiguration(SamplingRate.HZ_16000, Channels.MONO)) for _ in range(B)]
    for f in range(nf):
        payloads, host_out = [], []
        for b in range(B):
            pkt = encs[b].encode_float(streams[b][f * frame : (f + 1) * frame], frame)
            payloads.append(pkt[parse_packet(pkt).payload_offset :])
            host_out.append(hosts[b].decode_float(pkt, frame)[:, 0] * 32768.0)
        xq = bd.decode_frames(payloads)
        for b in range(B):
            a = host_out[b][13:]  # host path has the 13-sample API delay
            c = xq[b][: len(a)]
            num = float(np.dot(a, a))
            den = float(np.dot(a - c, a - c)) + 1e-9
            if num > 1e3:
                snr = 10 * math.log10(num / den)
                assert snr > 35.0, f"frame {f} stream {b}: device/host SNR {snr:.1f}"
