"""Plan-mode mixed serving (BatchedOpusDecoder transfer="plan").

The CELT contribution of CELT/hybrid streams ships as a plan (pulse
vectors + band plan) and the device executor rebuilds the spectra —
now start/end aware: hybrid streams run start=17 with e[17]-relative
fold offsets and the special band-18 folding duplication
(bands.py:605), and narrow/wide-band CELT streams (end < 21) emit
plans too.  SILK PCM ships exactly (int16); losses are concealed in
plane A (exact SILK PLC + CELT noise leaves IN the plan), so the plan
step needs no device-side PLC variant.

Oracle: the scalar opus_tpu.Decoder (loss-tested sample-exactly vs
libopus).  Reference anchor for the mode mux contract:
/root/reference/src/decoder.rs:603-729.
"""

from __future__ import annotations

import numpy as np
import pytest

from opus_tpu import Decoder, oracle

jax = pytest.importorskip("jax")

F = 960


def _content(nf: int):
    rng = np.random.default_rng(5)
    t = np.arange(F * nf) / 48000
    ph = np.cumsum(2 * np.pi * (130 + 25 * np.sin(2 * np.pi * 2.5 * t)) / 48000.0)
    voice = (0.35 * np.sign(np.sin(ph)) + 0.02 * rng.standard_normal(t.size)).astype(np.float32)
    music = (0.4 * np.sin(2 * np.pi * 440 * t) + 0.2 * np.sin(2 * np.pi * 1763 * t)
             + 0.05 * rng.standard_normal(t.size)).astype(np.float32)
    return voice, music


def _encoders(celt_kbps=96, hybrid_kbps=64, celt_bw=None):
    e = {}
    e["celt"] = oracle.Encoder(48000, 2)
    e["celt"].ctl(oracle.SET_FORCE_MODE, oracle.MODE_CELT_ONLY)
    e["celt"].ctl(oracle.SET_BITRATE, celt_kbps * 1000)
    if celt_bw:
        e["celt"].ctl(oracle.SET_MAX_BANDWIDTH, celt_bw)
    e["silk"] = oracle.Encoder(48000, 1)
    e["silk"].ctl(oracle.SET_FORCE_MODE, oracle.MODE_SILK_ONLY)
    e["silk"].ctl(oracle.SET_BITRATE, 24000)
    e["silk"].ctl(oracle.SET_MAX_BANDWIDTH, 1103)
    e["hybrid"] = oracle.Encoder(48000, 2)
    e["hybrid"].ctl(oracle.SET_FORCE_MODE, oracle.MODE_HYBRID)
    e["hybrid"].ctl(oracle.SET_BITRATE, hybrid_kbps * 1000)
    return e


def _run(kinds, lost=frozenset(), nf=8, tol=1e-3, **enc_kw):
    from opus_tpu.batch.opus_pipeline import BatchedOpusDecoder

    voice, music = _content(nf)
    v2 = np.stack([voice, np.roll(voice, 13) * 0.7], -1).astype(np.float32)
    m2 = np.stack([music, np.roll(music, 7) * 0.8], -1).astype(np.float32)
    encs = _encoders(**enc_kw)
    pks = {"celt": [], "silk": [], "hybrid": []}
    for f in range(nf):
        pks["celt"].append(encs["celt"].encode_float(
            np.ascontiguousarray(m2[f * F : (f + 1) * F]).ravel(), F))
        pks["silk"].append(encs["silk"].encode_float(voice[f * F : (f + 1) * F], F))
        pks["hybrid"].append(encs["hybrid"].encode_float(
            np.ascontiguousarray(v2[f * F : (f + 1) * F]).ravel(), F))
    B = len(kinds)
    steps = [[None if (f, b) in lost else pks[kinds[b]][f] for b in range(B)]
             for f in range(nf)]

    refs = []
    for b in range(B):
        d = Decoder()
        refs.append(np.stack([np.asarray(d.decode_float(steps[f][b], F)).reshape(F, 2)
                              for f in range(nf)]))

    dec = BatchedOpusDecoder(B, 2, transfer="plan")
    for f in range(nf):  # per-step serve: every frame's PCM is compared
        dec.serve([steps[f]])
        got = np.asarray(dec._serve_ring)
        for b in range(B):
            err = float(np.abs(got[b] - refs[b][f]).max())
            assert err < tol, (f, b, kinds[b], err)
    return dec


def test_mixed_plan_serve_with_losses():
    # Parity losses hit SILK and hybrid streams, where plane-A
    # concealment matches the scalar decoder exactly; CELT-only losses
    # in a MIXED batch use noise-regime concealment while the scalar
    # path may run the pitch regime (docs/KNOWN_GAPS.md), so they get a
    # recovery test instead (below).
    _run(["celt", "silk", "hybrid"] * 2,
         lost={(2, 1), (3, 1), (5, 4), (6, 2)})


def test_mixed_plan_celt_loss_tracks_scalar():
    """A lost CELT packet in the mixed batch runs the same regime
    dispatch as the scalar decoder (pitch-LPC on first losses, on
    device) on BOTH serving transfers — plan AND the packed fallback
    (celt_fe_decode_lost_dispatch): the scalar path is the oracle."""
    from opus_tpu.batch.opus_pipeline import BatchedOpusDecoder
    from opus_tpu.conformance import PASS_QUALITY, compare

    nf = 8
    voice, music = _content(nf)
    m2 = np.stack([music, np.roll(music, 7) * 0.8], -1).astype(np.float32)
    encs = _encoders()
    pkts = [encs["celt"].encode_float(
        np.ascontiguousarray(m2[f * F : (f + 1) * F]).ravel(), F) for f in range(nf)]
    steps = [[None if (f, b) == (3, 0) else pkts[f] for b in range(2)] for f in range(nf)]

    d = Decoder()
    ref0 = np.concatenate([np.asarray(d.decode_float(steps[f][0], F)).reshape(F, 2)
                           for f in range(nf)])

    pk_dec = BatchedOpusDecoder(2, 2, transfer="p10")
    plan_dec = BatchedOpusDecoder(2, 2, transfer="plan")
    pk_outs, plan_outs = [], []
    for f in range(nf):
        pk_dec.serve([steps[f]])
        plan_dec.serve([steps[f]])
        pk_outs.append(np.asarray(pk_dec._serve_ring)[0].copy())
        plan_outs.append(np.asarray(plan_dec._serve_ring)[0].copy())
    plan0 = np.concatenate(plan_outs)
    pk0 = np.concatenate(pk_outs)
    assert compare(ref0, plan0) >= PASS_QUALITY  # pitch regime on device
    assert compare(ref0, pk0) >= PASS_QUALITY   # packed path: same regime


def test_mixed_plan_low_rate_hybrid_folding():
    # 32 kbps hybrid folds heavily in the high bands: drives the
    # e[17]-relative eff offsets and the special band-18 folding copy.
    _run(["hybrid"] * 4, hybrid_kbps=32, tol=2e-3)


def test_mixed_plan_narrowband_celt():
    # CELT streams below fullband (end < 21) now emit plans too.
    _run(["celt", "celt", "silk"], celt_kbps=48, celt_bw=1103, tol=2e-3)


def test_mixed_plan_overflow_falls_back_per_step():
    from opus_tpu.batch.opus_pipeline import BatchedOpusDecoder

    nf = 6
    kinds = ["celt", "silk", "hybrid"]
    voice, music = _content(nf)
    v2 = np.stack([voice, np.roll(voice, 13) * 0.7], -1).astype(np.float32)
    m2 = np.stack([music, np.roll(music, 7) * 0.8], -1).astype(np.float32)
    encs = _encoders()
    steps = []
    for f in range(nf):
        steps.append([
            encs["celt"].encode_float(np.ascontiguousarray(m2[f * F : (f + 1) * F]).ravel(), F),
            encs["silk"].encode_float(voice[f * F : (f + 1) * F], F),
            encs["hybrid"].encode_float(np.ascontiguousarray(v2[f * F : (f + 1) * F]).ravel(), F),
        ])
    refs = []
    for b in range(3):
        d = Decoder()
        refs.append(np.stack([np.asarray(d.decode_float(steps[f][b], F)).reshape(F, 2)
                              for f in range(nf)]))

    dec = BatchedOpusDecoder(3, 2, transfer="plan")
    orig = dec._plane_a_plan
    calls = {"n": 0}

    def patched(packets, slot):
        calls["n"] += 1
        if calls["n"] == 3:
            raise OverflowError("synthetic plan overflow")
        return orig(packets, slot)

    dec._plane_a_plan = patched
    dec.serve(steps)
    assert calls["n"] == nf
    got = np.asarray(dec._serve_ring)
    for b in range(3):
        err = float(np.abs(got[b] - refs[b][-1]).max())
        assert err < 2e-3, (b, err)


def test_mixed_plan_silk_compaction():
    """CELT-only streams in a mixed batch ship zero silk bytes: the
    compacted-row upload (smap + pack_plan_silk) reproduces the full
    PCM mix for all-CELT (0 rows), minority-SILK, and majority-SILK
    batches across the row-bucket variants."""
    _run(["celt"] * 6)                           # 0 silk rows
    dec = _run(["celt"] * 6 + ["silk", "hybrid"])  # 2 of 8 -> small bucket
    # byte accounting: the last-served plan slot compacted 2 rows and
    # its upload prefix carries only the bucketed rows, not B rows
    slot = next(s for s in dec._plan_slots if "silk_rows" in s)
    assert all(len(s.get("silk_rows", [])) <= 2 for s in dec._plan_slots)
    from opus_tpu.native.frontend import pack_plan_silk

    B, sw = 8, slot["silk_words"]
    rb = next(rb for rb in dec._silk_row_buckets() if rb >= len(slot["silk_rows"]))
    prefix = pack_plan_silk(slot, 64, rb)
    assert prefix == slot["fixed_words"] + B * 64 + rb * sw
    assert rb < B  # the compacted upload is genuinely smaller than B rows


def test_mixed_plan_real_overflow_transactional():
    """Genuine plan-capacity overflow in the MIXED loop (320 kbps CELT
    members) must restore native state (CELT + SILK) before the packed
    re-decode of the same step."""
    # tol: overflow steps re-decode as q14 spectra, whose quantisation
    # error scales with the dense 320 kbps content (~1.1e-3 on frame 0,
    # before any state is even carried).
    _run(["celt", "silk", "hybrid", "celt"], nf=6, celt_kbps=320, tol=3e-3)


def test_mixed_serve_survives_mode_switches():
    """Real traffic switches modes (voice<->music).  The batched paths
    now apply the scalar decoder's EXACT transition machinery at the
    PCM level: redundant 5 ms CELT blocks are shadow-decoded on host
    and window-faded into the device ring, and SILK->CELT switches fade
    plane A's transition PLC row (dsp/transitions.py).  Every frame is
    at transfer precision EXCEPT the first <=5 ms of a CELT-entering
    switch whose transition PLC depends on the device-resident CELT
    decode memory (docs/KNOWN_GAPS.md) — bounded there, exact after."""
    from opus_tpu.batch.opus_pipeline import BatchedOpusDecoder

    nf = 16
    rng = np.random.default_rng(4)
    t = np.arange(F * nf) / 48000.0
    ph = np.cumsum(2 * np.pi * (130 + 25 * np.sin(2 * np.pi * 2.5 * t)) / 48000.0)
    voice = (0.3 * np.sign(np.sin(ph)) + 0.02 * rng.standard_normal(t.size))
    music = 0.4 * np.sin(2 * np.pi * 440 * t) + 0.2 * np.sin(2 * np.pi * 1763 * t)
    mix = np.where((np.arange(t.size) // (F * 4)) % 2 == 0, music, voice)
    pcm2 = np.stack([mix, 0.8 * np.roll(mix, 9)], -1).astype(np.float32)

    enc = oracle.Encoder(48000, 2)
    enc.ctl(oracle.SET_BITRATE, 64000)
    seq = ([oracle.MODE_CELT_ONLY] * 4 + [oracle.MODE_SILK_ONLY] * 4
           + [oracle.MODE_HYBRID] * 4 + [oracle.MODE_CELT_ONLY] * 4)
    pkts = []
    for f in range(nf):
        enc.ctl(oracle.SET_FORCE_MODE, seq[f])
        pkts.append(enc.encode_float(
            np.ascontiguousarray(pcm2[f * F : (f + 1) * F]).ravel(), F))

    d = Decoder()
    refs = [np.asarray(d.decode_float(p, F)).reshape(F, 2) for p in pkts]
    switch_adjacent = {f for f in range(nf)
                       for s in (4, 8, 12) if s <= f < s + 2}

    for mode in ("p10", "plan"):
        dec = BatchedOpusDecoder(2, 2, transfer=mode)
        for f in range(nf):
            dec.serve([[pkts[f]] * 2])  # must not raise at any switch
            got = np.asarray(dec._serve_ring)[0]
            err = float(np.abs(got - refs[f]).max())
            # the only remaining approximation: the first <=5 ms of a
            # frame ENTERING from CELT decode history (device-resident
            # memory); everything past 5 ms and all other frames are at
            # transfer precision
            tail_err = float(np.abs(got[240:] - refs[f][240:]).max())
            assert tail_err < 2e-3, (mode, f, tail_err)
            if f not in switch_adjacent:
                assert err < 2e-3, (mode, f, err)
            else:
                assert err < 0.5, (mode, f, err)  # bounded 5 ms head


def test_mixed_serve_fec_recovery():
    """("fec", next_packet) entries recover a lost frame from the next
    packet's SILK LBRR in the batched loop — sample-exact against the
    scalar decoder's decode_fec for SILK streams; hybrid recovers the
    SILK layer exactly with noise-regime CELT concealment on top."""
    from opus_tpu.batch.opus_pipeline import BatchedOpusDecoder

    nf, LOST = 10, 4
    rng = np.random.default_rng(6)
    t = np.arange(F * nf) / 48000.0
    ph = np.cumsum(2 * np.pi * (130 + 25 * np.sin(2 * np.pi * 2.5 * t)) / 48000.0)
    voice = (0.35 * np.sign(np.sin(ph))
             + 0.02 * rng.standard_normal(t.size)).astype(np.float32)
    v2 = np.stack([voice, np.roll(voice, 13) * 0.7], -1).astype(np.float32)

    encs = {}
    for name, ch, mode, kbps in (("silk", 1, oracle.MODE_SILK_ONLY, 32),
                                 ("silk2", 2, oracle.MODE_SILK_ONLY, 40),
                                 ("hybrid", 2, oracle.MODE_HYBRID, 64)):
        e = oracle.Encoder(48000, ch)
        e.ctl(oracle.SET_FORCE_MODE, mode)
        e.ctl(oracle.SET_BITRATE, kbps * 1000)
        if mode == oracle.MODE_SILK_ONLY:
            e.ctl(oracle.SET_MAX_BANDWIDTH, 1103)
        e.ctl(oracle.SET_INBAND_FEC, 1)
        e.ctl(oracle.SET_PACKET_LOSS_PERC, 20)
        encs[name] = e
    pks = {
        "silk": [encs["silk"].encode_float(voice[f * F : (f + 1) * F], F)
                 for f in range(nf)],
        "silk2": [encs["silk2"].encode_float(
            np.ascontiguousarray(v2[f * F : (f + 1) * F]).ravel(), F)
            for f in range(nf)],
        "hybrid": [encs["hybrid"].encode_float(
            np.ascontiguousarray(v2[f * F : (f + 1) * F]).ravel(), F)
            for f in range(nf)],
    }
    kinds = ["silk", "silk2", "hybrid"]
    refs = {k: [] for k in kinds}
    for k in kinds:
        d = Decoder()
        for f in range(nf):
            if f == LOST:
                refs[k].append(np.asarray(
                    d.decode_float(pks[k][f + 1], F, decode_fec=True)).reshape(F, 2))
            else:
                refs[k].append(np.asarray(d.decode_float(pks[k][f], F)).reshape(F, 2))

    dec = BatchedOpusDecoder(3, 2, transfer="plan")
    for f in range(nf):
        row = [("fec", pks[k][f + 1]) if f == LOST else pks[k][f] for k in kinds]
        dec.serve([row])
        got = np.asarray(dec._serve_ring)
        for b, k in enumerate(kinds):
            err = float(np.abs(got[b] - refs[k][f]).max())
            if k == "hybrid" and f == LOST:
                # SILK layer exact; the CELT band is concealed noise on
                # both sides but from different rng trajectories.
                assert err < 0.1, (k, f, err)
            else:
                tol = 2e-3 if k == "hybrid" else 1e-4
                assert err < tol, (k, f, err)


def test_mixed_plan_pitch_plc_for_celt_streams():
    """CELT-only members of a MIXED batch now get pitch-regime device
    PLC on first losses (celt_fe_plan_lost_dispatch emits the empty
    plan + meta flags; the step's with_plc variant conceals from the
    device decode memory), while SILK/hybrid members keep plane-A
    concealment.  Gate: conformance vs the scalar decoder under the
    same losses (f32 vs f64 pitch-candidate ties are both legal)."""
    from opus_tpu.batch.opus_pipeline import BatchedOpusDecoder
    from opus_tpu.conformance import PASS_QUALITY, compare

    nf = 12
    rng = np.random.default_rng(5)
    t = np.arange(F * nf) / 48000.0
    ph = np.cumsum(2 * np.pi * (160 + 8 * np.sin(2 * np.pi * 1.5 * t)) / 48000.0)
    tone = (0.5 * np.sin(ph) + 0.25 * np.sin(2 * ph)
            + 0.01 * rng.standard_normal(t.size))
    m2 = np.stack([tone, np.roll(tone, 11) * 0.9], -1).astype(np.float32)
    phv = np.cumsum(2 * np.pi * (130 + 25 * np.sin(2 * np.pi * 2.5 * t)) / 48000.0)
    voice = (0.35 * np.sign(np.sin(phv))).astype(np.float32)

    encs = _encoders()
    pks = {"celt": [], "silk": [], "hybrid": []}
    for f in range(nf):
        pks["celt"].append(encs["celt"].encode_float(
            np.ascontiguousarray(m2[f * F : (f + 1) * F]).ravel(), F))
        pks["silk"].append(encs["silk"].encode_float(voice[f * F : (f + 1) * F], F))
        pks["hybrid"].append(encs["hybrid"].encode_float(
            np.ascontiguousarray(m2[f * F : (f + 1) * F]).ravel(), F))
    kinds = ["celt", "silk", "hybrid"]
    lose = {3, 7}  # isolated losses -> pitch regime for the CELT member

    refs = {}
    for k in kinds:
        d = Decoder()
        refs[k] = np.concatenate(
            [np.asarray(d.decode_float(
                None if (f in lose and k == "celt") else pks[k][f], F)
                ).reshape(F, 2) for f in range(nf)])

    dec = BatchedOpusDecoder(3, 2, transfer="plan")
    outs = []
    for f in range(nf):
        dec.serve([[None if (f in lose and k == "celt") else pks[k][f]
                    for k in kinds]])
        outs.append(np.asarray(dec._serve_ring).copy())
    ours = np.stack(outs, 1).reshape(3, nf * F, 2)
    for b, k in enumerate(kinds):
        q = compare(refs[k], ours[b])
        assert q >= PASS_QUALITY, (k, q)
    # SILK member stays sample-exact (plane-A PLC untouched by the new
    # step variant)
    assert float(np.abs(ours[1] - refs["silk"]).max()) < 1e-4


def test_serve_absorbs_corrupt_streams():
    """A corrupt or undecodable packet on ONE stream conceals that
    stream's frame (state restored, loss path) instead of killing the
    whole serving batch; clean neighbours stay exact."""
    from opus_tpu.batch.opus_pipeline import BatchedOpusDecoder

    nf = 8
    voice, music = _content(nf)
    m2 = np.stack([music, np.roll(music, 7) * 0.8], -1).astype(np.float32)
    encs = _encoders()
    pkts = [encs["celt"].encode_float(
        np.ascontiguousarray(m2[f * F : (f + 1) * F]).ravel(), F) for f in range(nf)]
    d = Decoder()
    refs = [np.asarray(d.decode_float(p, F)).reshape(F, 2) for p in pkts]

    for mode in ("plan", "p10"):
        dec = BatchedOpusDecoder(2, 2, transfer=mode)
        for f in range(nf):
            row = [pkts[f], pkts[f]]
            if f == 3:
                row[1] = pkts[f][:1]  # ToC only after split -> len 0 payload? no: 1-byte packet = DTX-ish; use garbage instead
                row[1] = pkts[f][:1] + bytes([0xFF] * 4) + pkts[f][5:]
            if f == 5:
                row[1] = pkts[f][:2]  # truncated: undecodable celt frame
            dec.serve([row])
            err0 = float(np.abs(np.asarray(dec._serve_ring)[0] - refs[f]).max())
            assert err0 < 5e-3, (mode, f, err0)


def test_packed_fallback_pitch_plc_tracks_scalar():
    """The PACKED (non-plan) mixed path conceals CELT losses in the pitch
    regime ON DEVICE too (celt_fe_decode_lost_dispatch + the with_plc
    packed step): a plan-overflow step under loss no longer degrades to
    noise-only concealment.  Oracle: the scalar decoder under identical
    losses, at conformance quality (f32 device vs f64 scalar concealment
    may pick near-tie pitch candidates differently)."""
    from opus_tpu import oracle as _oracle, parse_packet
    from opus_tpu.batch.opus_pipeline import BatchedOpusDecoder
    from opus_tpu.celt.decoder import CeltDecoder
    from opus_tpu.conformance import PASS_QUALITY, compare

    F_, NF, B = 960, 16, 2
    rng = np.random.default_rng(5)
    t = np.arange(F_ * NF) / 48000.0
    ph = np.cumsum(2 * np.pi * (160 + 8 * np.sin(2 * np.pi * 1.5 * t)) / 48000.0)
    sig = (0.5 * np.sin(ph) + 0.25 * np.sin(2 * ph) + 0.1 * np.sin(3 * ph)
           + 0.01 * rng.standard_normal(t.size))
    pcm = np.stack([sig, np.roll(sig, 11) * 0.9], -1).astype(np.float32)
    enc = _oracle.Encoder(48000, 2)
    enc.ctl(_oracle.SET_BITRATE, 96000)
    enc.ctl(_oracle.SET_FORCE_MODE, _oracle.MODE_CELT_ONLY)
    pkts = [enc.encode_float(pcm[i * F_ : (i + 1) * F_].ravel(), F_) for i in range(NF)]
    # isolated, double, and a 6-frame burst (regime switch at 100 ms)
    lose = {3, 6, 7} | set(range(9, 15))
    scal = CeltDecoder(2, 1)
    pays = [p[parse_packet(p).payload_offset :] for p in pkts]
    ref = np.concatenate(
        [scal.decode(None if i in lose else pays[i], F_) for i in range(NF)]
    )
    dec = BatchedOpusDecoder(B, 2, transfer="p10")
    outs = []
    for i in range(NF):
        dec.serve([[None if i in lose else pkts[i]] * B])
        outs.append(np.asarray(dec._serve_ring))
    ours = np.stack(outs, 1).reshape(B, NF * F_, 2)
    for b in range(B):
        assert compare(ref, ours[b]) >= PASS_QUALITY


def test_bandwidth_switch_redundancy_bit_exact():
    """SILK bandwidth switches (NB->WB mid-stream) ship redundant CELT
    blocks; with the shadow-decode + device-fade machinery the batched
    paths now match the scalar decoder to f32 rounding (one ULP: the
    device applies the window fade in f32 vs the scalar's f64) through
    the switch — this exact scenario previously diverged 0.25-0.5
    max-abs for two frames."""
    from opus_tpu.batch.opus_pipeline import BatchedOpusDecoder

    nf = 8
    rng = np.random.default_rng(4)
    t = np.arange(F * nf) / 48000.0
    ph = np.cumsum(2 * np.pi * (130 + 25 * np.sin(2 * np.pi * 2.5 * t)) / 48000.0)
    voice = (0.35 * np.sign(np.sin(ph))
             + 0.02 * rng.standard_normal(t.size)).astype(np.float32)
    enc = oracle.Encoder(48000, 1)
    enc.ctl(oracle.SET_FORCE_MODE, oracle.MODE_SILK_ONLY)
    enc.ctl(oracle.SET_BITRATE, 24000)
    enc.ctl(oracle.SET_MAX_BANDWIDTH, 1101)
    steps = []
    for f in range(nf):
        if f == 4:
            enc.ctl(oracle.SET_MAX_BANDWIDTH, 1103)
        steps.append([enc.encode_float(voice[f * F : (f + 1) * F], F)])
    d = Decoder()
    ref = [np.asarray(d.decode_float(steps[f][0], F)).reshape(F, 2)
           for f in range(nf)]
    for mode in ("plan", "p10"):
        dec = BatchedOpusDecoder(1, 2, transfer=mode)
        for f in range(nf):
            dec.serve([steps[f]])
            err = float(np.abs(np.asarray(dec._serve_ring)[0] - ref[f]).max())
            # f32-exact: one device-fade ULP at +-1 scale
            assert err < 1e-6, (mode, f, err)
