"""Packet-loss concealment in the mixed-mode batched pipeline (plane A).

The native layer conceals lost packets from the per-stream decoder state:
an exact silk/PLC.c + CNG.c port (opus_tpu/native/silk_frontend.cpp,
mirroring opus_tpu/silk/plc.py) plus noise-regime CELT concealment for
the hybrid high bands — which is the full semantics there, because CELT
PLC is always noise-based when start_band != 0
(opus_tpu/celt/plc.py:201, celt_decoder.c).  The oracle is the scalar
opus_tpu.Decoder, itself loss-tested sample-exactly against libopus
(tests/test_silk.py, tests/test_decoder.py).

Reference surface: the PLC state machine the reference stubs out,
/root/reference/src/decoder.rs:427-513.
"""

from __future__ import annotations

import numpy as np
import pytest

from opus_tpu import Decoder, oracle

jax = pytest.importorskip("jax")

F = 960


def _content(nf: int, stereo: bool):
    rng = np.random.default_rng(3)
    t = np.arange(F * nf) / 48000
    ph = np.cumsum(2 * np.pi * (130 + 25 * np.sin(2 * np.pi * 2.5 * t)) / 48000.0)
    v = (0.35 * np.sign(np.sin(ph)) + 0.02 * rng.standard_normal(t.size)).astype(np.float32)
    if stereo:
        return np.stack([v, np.roll(v, 13) * 0.7], -1).astype(np.float32)
    return v


def _roundtrip(enc_ch, mode, bitrate, max_bw, lost, nf=16, tol=1e-6):
    from opus_tpu.batch.opus_pipeline import BatchedOpusDecoder

    pcm = _content(nf, enc_ch == 2)
    enc = oracle.Encoder(48000, enc_ch)
    enc.ctl(oracle.SET_FORCE_MODE, mode)
    enc.ctl(oracle.SET_BITRATE, bitrate)
    if max_bw:
        enc.ctl(oracle.SET_MAX_BANDWIDTH, max_bw)
    pkts = [
        enc.encode_float(np.ascontiguousarray(pcm[f * F : (f + 1) * F]).ravel(), F)
        for f in range(nf)
    ]
    steps = [None if f in lost else pkts[f] for f in range(nf)]

    d = Decoder()
    ref = np.stack([np.asarray(d.decode_float(s, F)).reshape(F, 2) for s in steps])
    dec = BatchedOpusDecoder(2, 2)
    got = np.stack([dec.decode_frames([s] * 2)[0] for s in steps])
    err = float(np.abs(got - ref).max())
    assert err < tol, err


#: Loss runs, isolated losses, and a voiced->unvoiced recovery window.
LOSSES = {3, 4, 8, 12}


def test_silk_wb_mono_loss_concealment_exact():
    _roundtrip(1, oracle.MODE_SILK_ONLY, 24000, 1103, LOSSES)


def test_silk_nb_mono_loss_concealment_exact():
    _roundtrip(1, oracle.MODE_SILK_ONLY, 12000, 1101, LOSSES)


def test_silk_wb_stereo_loss_concealment_exact():
    _roundtrip(2, oracle.MODE_SILK_ONLY, 32000, 1103, LOSSES)


def test_hybrid_stereo_loss_concealment():
    _roundtrip(2, oracle.MODE_HYBRID, 64000, None, LOSSES)


def test_single_loss_voiced_transition_exact():
    # The first good frame after a single loss exercises the voiced-PLC ->
    # normal-decoding transition smoother (silk_decode_core lossCnt path).
    _roundtrip(1, oracle.MODE_SILK_ONLY, 24000, 1103, {8})


def test_all_streams_lost_step():
    """A step where EVERY stream is lost reuses the previous step's frame
    size; losing the very first step raises instead of guessing."""
    from opus_tpu.batch.opus_pipeline import BatchedOpusDecoder

    pcm = _content(4, False)
    enc = oracle.Encoder(48000, 1)
    enc.ctl(oracle.SET_FORCE_MODE, oracle.MODE_SILK_ONLY)
    enc.ctl(oracle.SET_BITRATE, 24000)
    enc.ctl(oracle.SET_MAX_BANDWIDTH, 1103)
    pkts = [enc.encode_float(pcm[f * F : (f + 1) * F], F) for f in range(4)]
    steps = [pkts[0], None, None, pkts[3]]

    d = Decoder()
    ref = np.stack([np.asarray(d.decode_float(s, F)).reshape(F, 2) for s in steps])
    dec = BatchedOpusDecoder(2, 2)
    with pytest.raises(ValueError):
        BatchedOpusDecoder(2, 2).decode_frames([None, None])
    got = np.stack([dec.decode_frames([s] * 2)[0] for s in steps])
    assert float(np.abs(got - ref).max()) < 1e-6


def test_mixed_serve_with_losses():
    """The packed single-upload serve loop conceals lost packets too;
    silk PCM ships exactly (int16), CELT spectra at the packed mantissa
    precision."""
    from opus_tpu.batch.opus_pipeline import BatchedOpusDecoder

    nf = 10
    pcm2 = _content(nf, True)
    encs = {
        "silk": oracle.Encoder(48000, 1),
        "hybrid": oracle.Encoder(48000, 2),
    }
    encs["silk"].ctl(oracle.SET_FORCE_MODE, oracle.MODE_SILK_ONLY)
    encs["silk"].ctl(oracle.SET_BITRATE, 24000)
    encs["silk"].ctl(oracle.SET_MAX_BANDWIDTH, 1103)
    encs["hybrid"].ctl(oracle.SET_FORCE_MODE, oracle.MODE_HYBRID)
    encs["hybrid"].ctl(oracle.SET_BITRATE, 64000)
    mono = pcm2[:, 0].copy()
    silk_pkts = [encs["silk"].encode_float(mono[f * F : (f + 1) * F], F) for f in range(nf)]
    hyb_pkts = [
        encs["hybrid"].encode_float(np.ascontiguousarray(pcm2[f * F : (f + 1) * F]).ravel(), F)
        for f in range(nf)
    ]
    lost = {2, 3, 7}
    B = 4
    steps = []
    for f in range(nf):
        row = []
        for b in range(B):
            pk = silk_pkts[f] if b % 2 == 0 else hyb_pkts[f]
            row.append(None if (f in lost and b % 2 == (f % 2)) else pk)
        steps.append(row)

    refs = []
    for b in range(B):
        d = Decoder()
        refs.append(np.stack([np.asarray(d.decode_float(steps[f][b], F)).reshape(F, 2)
                              for f in range(nf)]))

    dec = BatchedOpusDecoder(B, 2)
    dec.serve(steps)
    got_last = np.asarray(dec._serve_ring)
    for b in range(B):
        err = float(np.abs(got_last[b] - refs[b][-1]).max())
        assert err < 2e-3, (b, err)
