"""Internal-rate SILK transfer (silk_transfer="internal"): the mixed
serving loop ships SILK PCM at 8/12/16 kHz planar int16 (3-6x fewer
host->device bytes) and resamples ON DEVICE via the dense per-rate banks
(dsp/resample.py; silk_frontend.cpp raw_internal_out).

Gates: (a) vs a pcm48-transfer twin, the ONLY difference is the device
resampler's precision class (~2e-4 of full scale); (b) vs the scalar
opus_tpu.Decoder at the mixed-serving tolerance, losses included; (c)
the upload region actually shrinks 3x.
Reference anchor: /root/reference/src/decoder.rs:552-624 (the SILK
sub-decode the serving path previously resampled on host).
"""

from __future__ import annotations

import numpy as np
import pytest

from opus_tpu import Decoder, oracle

jax = pytest.importorskip("jax")

F = 960

BW = {"nb": 1101, "mb": 1102, "wb": 1103}


def _make_encoder(kind: str):
    if kind == "celt":
        e = oracle.Encoder(48000, 2)
        e.ctl(oracle.SET_FORCE_MODE, oracle.MODE_CELT_ONLY)
        e.ctl(oracle.SET_BITRATE, 96000)
    elif kind == "hybrid":
        e = oracle.Encoder(48000, 2)
        e.ctl(oracle.SET_FORCE_MODE, oracle.MODE_HYBRID)
        e.ctl(oracle.SET_BITRATE, 64000)
    elif kind == "silk2":  # stereo SILK (nci=2)
        e = oracle.Encoder(48000, 2)
        e.ctl(oracle.SET_FORCE_MODE, oracle.MODE_SILK_ONLY)
        e.ctl(oracle.SET_BITRATE, 40000)
        e.ctl(oracle.SET_MAX_BANDWIDTH, BW["wb"])
    else:  # silk_nb / silk_mb / silk_wb: mono voice at each internal rate
        e = oracle.Encoder(48000, 1)
        e.ctl(oracle.SET_FORCE_MODE, oracle.MODE_SILK_ONLY)
        e.ctl(oracle.SET_BITRATE, 24000)
        e.ctl(oracle.SET_MAX_BANDWIDTH, BW[kind.split("_")[1]])
    return e


def _traffic(kinds, nf, frame=F, lost=frozenset()):
    rng = np.random.default_rng(11)
    t = np.arange(frame * nf) / 48000.0
    ph = np.cumsum(2 * np.pi * (130 + 25 * np.sin(2 * np.pi * 2.5 * t)) / 48000.0)
    voice = (0.35 * np.sign(np.sin(ph)) + 0.02 * rng.standard_normal(t.size)).astype(np.float32)
    music = (0.4 * np.sin(2 * np.pi * 440 * t) + 0.2 * np.sin(2 * np.pi * 1763 * t)
             + 0.05 * rng.standard_normal(t.size)).astype(np.float32)
    v2 = np.stack([voice, np.roll(voice, 13) * 0.7], -1).astype(np.float32)
    m2 = np.stack([music, np.roll(music, 7) * 0.8], -1).astype(np.float32)
    encs = [_make_encoder(k) for k in kinds]
    steps = []
    for f in range(nf):
        row = []
        for b, k in enumerate(kinds):
            if (f, b) in lost:
                row.append(None)
                continue
            if k == "celt":
                pcm = np.ascontiguousarray(m2[f * frame : (f + 1) * frame]).ravel()
            elif k in ("hybrid", "silk2"):
                pcm = np.ascontiguousarray(v2[f * frame : (f + 1) * frame]).ravel()
            else:
                pcm = voice[f * frame : (f + 1) * frame]
            row.append(encs[b].encode_float(pcm, frame))
        steps.append(row)
    return steps


KINDS = ["celt", "silk_wb", "hybrid", "silk_nb", "silk_mb", "silk2"]


@pytest.mark.parametrize("transfer", ["plan", "p10"])
def test_internal_matches_pcm48_twin(transfer):
    """Same traffic through internal and pcm48 twins: the difference is
    the device resampler's precision alone."""
    from opus_tpu.batch.opus_pipeline import BatchedOpusDecoder

    nf = 6
    steps = _traffic(KINDS, nf)
    B = len(KINDS)
    ref = BatchedOpusDecoder(B, 2, transfer=transfer, silk_transfer="pcm48")
    new = BatchedOpusDecoder(B, 2, transfer=transfer, silk_transfer="internal")
    for f in range(nf):
        ref.serve([steps[f]])
        new.serve([steps[f]])
        a = np.asarray(ref._serve_ring)
        b = np.asarray(new._serve_ring)
        err = float(np.abs(a - b).max())
        assert err < 6e-4, (f, err)
        assert ref.final_ranges() == new.final_ranges()


def test_internal_scalar_parity_with_losses():
    """Internal transfer vs the scalar decoder under SILK/hybrid losses
    (plane-A PLC stays exact; only transfer precision differs)."""
    from opus_tpu.batch.opus_pipeline import BatchedOpusDecoder

    kinds = ["silk_wb", "hybrid", "silk_nb", "silk2"]
    nf = 8
    lost = {(2, 0), (3, 0), (5, 1), (6, 3)}
    steps = _traffic(kinds, nf, lost=lost)
    refs = []
    for b in range(len(kinds)):
        d = Decoder()
        refs.append(np.stack([
            np.asarray(d.decode_float(steps[f][b], F)).reshape(F, 2)
            for f in range(nf)
        ]))
    dec = BatchedOpusDecoder(len(kinds), 2, transfer="plan",
                             silk_transfer="internal")
    for f in range(nf):
        dec.serve([steps[f]])
        got = np.asarray(dec._serve_ring)
        for b in range(len(kinds)):
            err = float(np.abs(got[b] - refs[b][f]).max())
            assert err < 1.2e-3, (f, b, kinds[b], err)


def test_internal_fec_recovery():
    """("fec", next_packet) entries recover via LBRR in internal mode."""
    from opus_tpu.batch.opus_pipeline import BatchedOpusDecoder

    kinds = ["silk_wb", "silk_wb"]
    nf = 6
    steps = _traffic(kinds, nf)
    # stream 0 loses frame 3 and recovers it from frame 4's LBRR
    fec_steps = [list(r) for r in steps]
    fec_steps[3][0] = ("fec", steps[4][0])
    d = Decoder()
    refs = [np.stack([
        np.asarray(
            d.decode_float(steps[4][0], F, decode_fec=True) if f == 3
            else d.decode_float(steps[f][0], F)
        ).reshape(F, 2)
        for f in range(nf)
    ])]
    dec = BatchedOpusDecoder(2, 2, transfer="plan", silk_transfer="internal")
    for f in range(nf):
        dec.serve([fec_steps[f]])
        got = np.asarray(dec._serve_ring)
        err = float(np.abs(got[0] - refs[0][f]).max())
        assert err < 1.2e-3, (f, err)


def test_internal_bandwidth_switch_resets_history():
    """A NB->WB mid-stream switch re-inits the resampler in libopus; the
    internal path mirrors it with the desc reset bit (device history
    zeroed) — it must track the pcm48 twin exactly through the switch.

    With the exact transition crossfades (dsp/transitions.py: shadow-
    decoded redundant blocks + window fades on the device ring), EVERY
    frame through the switch now holds scalar parity at the transfer
    precision — the redundancy frames included."""
    from opus_tpu.batch.opus_pipeline import BatchedOpusDecoder

    nf = 8
    rng = np.random.default_rng(4)
    t = np.arange(F * nf) / 48000.0
    ph = np.cumsum(2 * np.pi * (130 + 25 * np.sin(2 * np.pi * 2.5 * t)) / 48000.0)
    voice = (0.35 * np.sign(np.sin(ph)) + 0.02 * rng.standard_normal(t.size)).astype(np.float32)
    enc = oracle.Encoder(48000, 1)
    enc.ctl(oracle.SET_FORCE_MODE, oracle.MODE_SILK_ONLY)
    enc.ctl(oracle.SET_BITRATE, 24000)
    enc.ctl(oracle.SET_MAX_BANDWIDTH, BW["nb"])
    steps = []
    for f in range(nf):
        if f == 4:
            enc.ctl(oracle.SET_MAX_BANDWIDTH, BW["wb"])
        steps.append([enc.encode_float(voice[f * F : (f + 1) * F], F)])
    d = Decoder()
    ref = np.stack([np.asarray(d.decode_float(steps[f][0], F)).reshape(F, 2)
                    for f in range(nf)])
    twin = BatchedOpusDecoder(1, 2, transfer="plan", silk_transfer="pcm48")
    dec = BatchedOpusDecoder(1, 2, transfer="plan", silk_transfer="internal")
    for f in range(nf):
        twin.serve([steps[f]])
        dec.serve([steps[f]])
        got = np.asarray(dec._serve_ring)[0]
        tw = np.asarray(twin._serve_ring)[0]
        # a stale (un-reset) history would blow past the resampler
        # precision class right at the switch frame
        assert float(np.abs(got - tw).max()) < 6e-4, f
        err = float(np.abs(got - ref[f]).max())
        assert err < 1.2e-3, (f, err)


def test_internal_upload_region_shrinks_3x():
    from opus_tpu.batch.opus_pipeline import BatchedOpusDecoder

    a = BatchedOpusDecoder(4, 2, silk_transfer="pcm48")
    b = BatchedOpusDecoder(4, 2, silk_transfer="internal")
    assert a._silk_samps(960) == 3 * b._silk_samps(960)
    assert a._silk_samps(480) == 3 * b._silk_samps(480)
    with pytest.raises(ValueError):
        b.decode_frames([b"\x00"] * 4)
