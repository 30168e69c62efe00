"""Batched mixed-mode Opus pipeline vs libopus (SILK + hybrid + CELT)."""

import numpy as np
import pytest

from opus_tpu import oracle

pytestmark = pytest.mark.skipif(not oracle.available(), reason="libopus not present")


def _enc(mode, bitrate, ch, max_bw=None):
    e = oracle.Encoder(48000, ch)
    e.ctl(oracle.SET_FORCE_MODE, mode)
    e.ctl(oracle.SET_BITRATE, bitrate)
    if max_bw is not None:
        e.ctl(oracle.SET_MAX_BANDWIDTH, max_bw)
    return e


def _signals(nsamp, seed=9):
    rng = np.random.default_rng(seed)
    t = np.arange(nsamp) / 48000.0
    ph = np.cumsum(2 * np.pi * (130 + 25 * np.sin(2 * np.pi * 2.5 * t)) / 48000.0)
    voice = (0.35 * np.sign(np.sin(ph)) + 0.02 * rng.standard_normal(nsamp)).astype(np.float32)
    music = (0.4 * np.sin(2 * np.pi * 440 * t) + 0.2 * np.sin(2 * np.pi * 2930 * t)
             + 0.05 * rng.standard_normal(nsamp)).astype(np.float32)
    return voice, music


def test_mixed_mode_batch_vs_libopus():
    """CELT + SILK (mono/stereo/NB/WB) + hybrid streams in ONE device batch."""
    from opus_tpu.batch.opus_pipeline import BatchedOpusDecoder

    FRAME, NF = 960, 5
    voice, music = _signals(FRAME * NF)
    voice2 = np.stack([voice, np.roll(voice, 13) * 0.7], -1)
    music2 = np.stack([music, np.roll(music, 7) * 0.8], -1)

    cases = [
        ("celt stereo", _enc(oracle.MODE_CELT_ONLY, 96000, 2), music2),
        ("silk wb mono", _enc(oracle.MODE_SILK_ONLY, 24000, 1, 1103), voice[:, None]),
        ("silk wb stereo", _enc(oracle.MODE_SILK_ONLY, 40000, 2, 1103), voice2),
        ("silk nb mono", _enc(oracle.MODE_SILK_ONLY, 12000, 1, 1101), voice[:, None]),
        ("hybrid stereo", _enc(oracle.MODE_HYBRID, 64000, 2), voice2),
        ("hybrid mono", _enc(oracle.MODE_HYBRID, 40000, 1), voice[:, None]),
        ("celt mono", _enc(oracle.MODE_CELT_ONLY, 64000, 1), music[:, None]),
        ("silk mb mono", _enc(oracle.MODE_SILK_ONLY, 16000, 1, 1102), voice[:, None]),
    ]
    B = len(cases)
    dec = BatchedOpusDecoder(B, 2)
    refs = [oracle.Decoder(48000, 2) for _ in range(B)]
    for f in range(NF):
        pkts = []
        for (_, enc, sig) in cases:
            frame = sig[f * FRAME : (f + 1) * FRAME]
            pkts.append(enc.encode_float(np.ascontiguousarray(frame).ravel(), FRAME))
        out = dec.decode_frames(pkts)
        frs = dec.final_ranges()
        for b, (name, _, _) in enumerate(cases):
            r = np.asarray(refs[b].decode_float(pkts[b], FRAME)).reshape(FRAME, 2)
            assert frs[b] == refs[b].final_range, (name, f)
            err = float(np.abs(out[b] - r).max())
            mode = name.split()[0]
            tol = 1e-6 if mode == "silk" else 2e-5
            assert err < tol, (name, f, err)


def test_silk_only_long_frames_batch():
    """40/60 ms SILK-only packets skip the CELT device step entirely."""
    from opus_tpu.batch.opus_pipeline import BatchedOpusDecoder

    FRAME, NF = 2880, 3  # 60 ms
    voice, _ = _signals(FRAME * NF)
    encs = [_enc(oracle.MODE_SILK_ONLY, 20000, 1, 1103) for _ in range(4)]
    dec = BatchedOpusDecoder(4, 2)
    refs = [oracle.Decoder(48000, 2) for _ in range(4)]
    for f in range(NF):
        pkts = [e.encode_float(voice[f * FRAME : (f + 1) * FRAME], FRAME) for e in encs]
        out = dec.decode_frames(pkts)
        for b in range(4):
            r = np.asarray(refs[b].decode_float(pkts[b], FRAME)).reshape(FRAME, 2)
            assert dec.final_ranges()[b] == refs[b].final_range
            assert float(np.abs(out[b] - r).max()) < 1e-6, (b, f)


def test_pipelined_mixed_runs():
    """run_pipelined sequences steps with state carried across frames."""
    from opus_tpu.batch.opus_pipeline import BatchedOpusDecoder

    FRAME, NF = 960, 4
    voice, music = _signals(FRAME * NF)
    encs = [_enc(oracle.MODE_CELT_ONLY, 96000, 1), _enc(oracle.MODE_SILK_ONLY, 24000, 1, 1103)]
    sigs = [music, voice]
    dec = BatchedOpusDecoder(2, 2)
    batches = []
    all_pkts = []
    for f in range(NF):
        pkts = [e.encode_float(s[f * FRAME : (f + 1) * FRAME], FRAME) for e, s in zip(encs, sigs)]
        batches.append(pkts)
        all_pkts.append(pkts)
    last = np.asarray(dec.run_pipelined(batches))
    refs = [oracle.Decoder(48000, 2) for _ in range(2)]
    for f in range(NF):
        r = [np.asarray(refs[b].decode_float(all_pkts[f][b], FRAME)).reshape(FRAME, 2) for b in range(2)]
    for b in range(2):
        assert float(np.abs(last[b] - r[b]).max()) < 2e-5, b


def test_mixed_serve_matches_run_pipelined():
    """Packed single-upload mixed serve() == run_pipelined (p10 precision
    class), including SILK-only / hybrid / CELT rows, state carry across
    steps, final_range parity, and the RFC 8251 quality gate."""
    from opus_tpu.batch.opus_pipeline import BatchedOpusDecoder
    from opus_tpu.conformance import PASS_QUALITY, compare

    FRAME, NF = 960, 5
    voice, music = _signals(FRAME * NF)
    voice2 = np.stack([voice, np.roll(voice, 13) * 0.7], -1)
    music2 = np.stack([music, np.roll(music, 7) * 0.8], -1)
    cases = [
        ("celt stereo", _enc(oracle.MODE_CELT_ONLY, 96000, 2), music2),
        ("silk wb mono", _enc(oracle.MODE_SILK_ONLY, 24000, 1, 1103), voice[:, None]),
        ("hybrid stereo", _enc(oracle.MODE_HYBRID, 64000, 2), voice2),
        ("silk wb stereo", _enc(oracle.MODE_SILK_ONLY, 40000, 2, 1103), voice2),
    ]
    B = len(cases)
    batches = []
    for f in range(NF):
        batches.append([
            enc.encode_float(
                np.ascontiguousarray(sig[f * FRAME : (f + 1) * FRAME]).ravel(), FRAME
            )
            for (_, enc, sig) in cases
        ])
    ref = BatchedOpusDecoder(B, 2)
    outs = [np.asarray(ref.run_pipelined([b])) for b in batches]
    srv = BatchedOpusDecoder(B, 2)
    srv.serve(batches)
    got = np.asarray(srv._serve_ring)
    assert srv.final_ranges() == ref.final_ranges()
    assert float(np.abs(got - outs[-1]).max()) < 2e-3
    for b in range(B):
        assert compare(outs[-1][b], got[b]) >= PASS_QUALITY, b
