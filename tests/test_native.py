"""Native C++ plane-A engine: exact parity with the Python front end."""

import numpy as np
import pytest

from opus_tpu import oracle, parse_packet

pytestmark = pytest.mark.skipif(not oracle.available(), reason="libopus not present")


def _payloads(channels, frame, kbps, nframes=8, seed=4):
    enc = oracle.Encoder(48000, channels)
    enc.ctl(oracle.SET_FORCE_MODE, oracle.MODE_CELT_ONLY)
    enc.ctl(oracle.SET_BITRATE, kbps * 1000)
    rng = np.random.default_rng(seed)
    t = np.arange(frame * nframes) / 48000
    sig = 0.4 * np.sin(2 * np.pi * 440 * t) + 0.1 * np.sin(2 * np.pi * 5000 * t) + 0.05 * rng.standard_normal(t.size)
    pcm = (np.stack([sig, 0.8 * np.roll(sig, 11)], -1) if channels == 2 else sig[:, None]).astype(np.float32)
    out = []
    for f in range(nframes):
        pkt = enc.encode_float(pcm[f * frame : (f + 1) * frame].ravel(), frame)
        out.append(pkt[parse_packet(pkt).payload_offset :])
    return out


@pytest.mark.parametrize(
    "channels,frame,kbps",
    [(1, 960, 64), (2, 960, 128), (1, 480, 48), (2, 240, 64), (1, 120, 48), (2, 960, 6), (2, 960, 510)],
)
def test_native_plane_parity(channels, frame, kbps):
    from opus_tpu.celt.decoder import CeltDecoder
    from opus_tpu.native.frontend import NativeCeltFrontEnd, available

    if not available():
        pytest.skip("native engine not built")
    py = CeltDecoder(channels)
    py.synthesize_host = False
    nat = NativeCeltFrontEnd(channels)
    for payload in _payloads(channels, frame, kbps):
        py.decode(payload, frame)
        pp = py.last_planes
        pn = nat.decode_planes(payload, frame)
        assert py.rng == nat.final_range
        for k in pp:
            if isinstance(pp[k], np.ndarray):
                # Native band plane computes in float32 (libopus float-build
                # semantics, FMA allowed) vs the float64 Python reference:
                # integer symbol streams stay bit-identical (final_range
                # above), float planes agree to f32 round-off.
                tol = 1e-12 if pp[k].dtype.kind in "iu" else 2e-4
                assert float(np.abs(pp[k] - pn[k]).max()) < tol, k
            elif isinstance(pp[k], float):
                assert abs(pp[k] - pn[k]) < 1e-12, k
            else:
                assert pp[k] == pn[k], k


def test_native_batch_pipeline_matches_python():
    from opus_tpu.batch.pipeline import BatchedCeltDecoder

    payloads = _payloads(2, 960, 96, nframes=4)
    B = 8
    nat = BatchedCeltDecoder(B, 2, use_native=True)
    pyd = BatchedCeltDecoder(B, 2, use_native=False)
    if not nat.use_native:
        pytest.skip("native engine not built")
    for f in range(4):
        bp = [payloads[f]] * B
        out_n = nat.decode_frames(bp, 960)
        out_p = pyd.decode_frames(bp, 960)
        # f32 native plane vs f64 Python plane: PCM-level agreement; the
        # symbol decode itself is proven identical by final_range equality.
        assert float(np.abs(out_n - out_p).max()) < 2e-5
        assert nat.final_ranges() == pyd.final_ranges()


def test_batched_multistream_vs_libopus():
    from opus_tpu.batch.multistream_pipeline import BatchedMultistreamDecoder

    B, streams, coupled, ch = 3, 6, 2, 8
    mapping = list(range(8))
    encs, refs = [], []
    for b in range(B):
        e = oracle.MultistreamEncoder(48000, ch, streams, coupled, mapping)
        e.ctl(oracle.SET_BITRATE, 384000)
        e.ctl(oracle.SET_FORCE_MODE, oracle.MODE_CELT_ONLY)
        encs.append(e)
        refs.append(oracle.MultistreamDecoder(48000, ch, streams, coupled, mapping))
    frame, nf = 960, 3
    t = np.arange(frame * nf) / 48000
    rng = np.random.default_rng(5)
    bmd = BatchedMultistreamDecoder(B, ch, streams, coupled, mapping)
    all_steps, all_refs = [], []
    for f in range(nf):
        pkts = []
        for b in range(B):
            pcm = np.stack(
                [0.3 * np.sin(2 * np.pi * (200 + 60 * k + 15 * b) * t[f * frame : (f + 1) * frame])
                 + 0.02 * rng.standard_normal(frame) for k in range(ch)], -1).astype(np.float32)
            pkts.append(encs[b].encode_float(pcm.ravel(), frame))
        out = bmd.decode_frames(pkts, frame)
        frs = bmd.final_ranges()
        for b in range(B):
            r = np.asarray(refs[b].decode_float(pkts[b], frame)).reshape(frame, ch)
            assert frs[b] == refs[b].final_range
            assert float(np.abs(out[b] - r).max()) < 1e-5
        all_steps.append(pkts)
        all_refs.append(out)
    # Packed single-upload multistream serve(): parity with decode_frames
    # at the serving transfer precision over the same step sequence.
    bmd2 = BatchedMultistreamDecoder(B, ch, streams, coupled, mapping)
    bmd2.core.transfer = "p10"
    got = bmd2.serve(all_steps, frame)
    assert bmd2.final_ranges() == frs
    assert float(np.abs(got - all_refs[-1]).max()) < 2e-3


def test_native_silk_bit_exact():
    """Native C++ SILK decode is sample-exact vs libopus."""
    from opus_tpu.native.frontend import NativeSilkBatch, NativeSilkFrontEnd, available

    if not available():
        pytest.skip("native engine not built")
    enc = oracle.Encoder(16000, 1)
    enc.ctl(oracle.SET_FORCE_MODE, oracle.MODE_SILK_ONLY)
    enc.ctl(oracle.SET_BITRATE, 24000)
    ref = oracle.Decoder(16000, 1)
    frame = 320
    t = np.arange(frame * 10) / 16000
    rng = np.random.default_rng(7)
    phase = np.cumsum(2 * np.pi * (120 + 30 * np.sin(2 * np.pi * 3 * t)) / 16000)
    sig = (0.35 * np.sign(np.sin(phase)) * np.exp(-3 * (t % 0.01) * 100)
           + 0.02 * rng.standard_normal(frame * 10)).astype(np.float32)
    nat = NativeSilkFrontEnd(16)
    prev_tail = np.zeros(13, int)
    for f in range(10):
        pkt = enc.encode_float(sig[f * frame : (f + 1) * frame], frame)
        payload = pkt[parse_packet(pkt).payload_offset :]
        xq, planes = nat.decode(payload, want_planes=True)
        r = (np.asarray(ref.decode_float(pkt, frame)).reshape(-1) * 32768).round().astype(int)
        expect = np.concatenate([prev_tail, xq.astype(int)])[:320]
        assert int(np.abs(expect - r).max()) == 0, f"frame {f}"
        prev_tail = xq.astype(int)[-13:].copy()
    # batch API smoke: same payload across a batch, identical rows
    nb = NativeSilkBatch(4, 16)
    pkt = enc.encode_float(sig[:frame], frame)
    payload = pkt[parse_packet(pkt).payload_offset :]
    xq, rngs = nb.decode_batch([payload] * 4)
    assert (xq[0] == xq[1]).all() and (rngs[0] == rngs[3])


def test_q14_transfer_mode_conformance():
    """Serving-mode Q14 int16 band-shape transfer: half the host->device
    bytes; precision class of libopus's fixed-point build and still
    RFC 8251-conformant (quality ~100 vs the float reference)."""
    from opus_tpu.batch.pipeline import BatchedCeltDecoder
    from opus_tpu.conformance import PASS_QUALITY, compare

    payloads = _payloads(2, 960, 96, nframes=6)
    q = BatchedCeltDecoder(4, 2, use_native=True, transfer="q14")
    f = BatchedCeltDecoder(4, 2, use_native=True, transfer="f32")
    if not q.use_native:
        pytest.skip("native engine not built")
    oq, of = [], []
    for fr in range(6):
        oq.append(q.decode_frames([payloads[fr]] * 4, 960)[0])
        of.append(f.decode_frames([payloads[fr]] * 4, 960)[0])
    a, b = np.concatenate(of), np.concatenate(oq)
    assert float(np.abs(a - b).max()) < 2e-4
    assert compare(a, b) >= PASS_QUALITY


@pytest.mark.parametrize("mode,tol", [("p12", 2e-3), ("p10", 4e-3), ("p8", 2e-2)])
def test_packed_transfer_mode_conformance(mode, tol):
    """Bit-packed serving transfers (12/10/8-bit mantissa + per-band
    exponent folded into the energy plane): each width must clear the
    RFC 8251 conformance metric vs the float reference path through the
    full serve() loop (state carry, postfilter, transients included)."""
    from opus_tpu.batch.pipeline import BatchedCeltDecoder
    from opus_tpu.conformance import PASS_QUALITY, compare

    B, FRAME, NF = 4, 960, 6
    payloads = _payloads(2, 960, 96, nframes=NF)
    f = BatchedCeltDecoder(B, 2, use_native=True, transfer="f32")
    if not f.use_native:
        pytest.skip("native engine not built")
    refs, ours = [], []
    p = BatchedCeltDecoder(B, 2, use_native=True, transfer=mode)
    for fr in range(NF):
        refs.append(f.decode_frames([payloads[fr]] * B, FRAME)[0])
        p.serve([[payloads[fr]] * B], FRAME)
        ours.append(np.asarray(p._serve_ring)[0])
    a, b = np.concatenate(refs), np.concatenate(ours)
    assert float(np.abs(a - b).max()) < tol
    assert compare(a, b) >= PASS_QUALITY


def test_serving_path_matches_decode_frames():
    """Packed single-upload serve() == the per-array decode_frames path.

    Exercises transient frames (castanet-like clicks force short blocks),
    state carry across steps, and the in-step long/short variant select.
    """
    from opus_tpu.batch.pipeline import BatchedCeltDecoder

    B, FRAME, NF = 8, 960, 6
    enc = oracle.Encoder(48000, 2)
    enc.ctl(oracle.SET_FORCE_MODE, oracle.MODE_CELT_ONLY)
    enc.ctl(oracle.SET_BITRATE, 96000)
    rng = np.random.default_rng(3)
    t = np.arange(FRAME * NF) / 48000.0
    sig = 0.4 * np.sin(2 * np.pi * 440 * t) + 0.05 * rng.standard_normal(t.size)
    # Periodic clicks -> some frames code short blocks, others long.
    sig[::4801] += 0.9
    pcm = np.stack([sig, 0.8 * np.roll(sig, 7)], -1).astype(np.float32)
    pkts = [enc.encode_float(pcm[f * FRAME : (f + 1) * FRAME].ravel(), FRAME) for f in range(NF)]
    payloads = [p[parse_packet(p).payload_offset :] for p in pkts]
    batches = [[payloads[(i + s) % NF] for i in range(B)] for s in range(NF)]

    ref = BatchedCeltDecoder(B, 2, use_native=True, transfer="q14")
    if not ref.use_native:
        pytest.skip("native engine not built")
    outs = [ref.decode_frames(b, FRAME) for b in batches]

    srv = BatchedCeltDecoder(B, 2, use_native=True, transfer="q14")
    srv.serve(batches, FRAME)
    got = np.asarray(srv._serve_ring)
    assert float(np.abs(got - outs[-1]).max()) < 1e-6
    # serve() resumes: device state persists across calls
    ref2 = [ref.decode_frames(b, FRAME) for b in batches[:2]]
    srv.serve(batches[:2], FRAME)
    assert float(np.abs(np.asarray(srv._serve_ring) - ref2[-1]).max()) < 1e-6


def test_serving_path_loss_concealment():
    """Lost packets (None) in the packed serve loop conceal with the
    noise-regime CELT PLC (celt_frontend.cpp decode_lost_noise): decayed
    band energies + renormalised LCG shapes synthesised by the normal
    device step.  Oracle: the scalar decoder with skip_plc forced (the
    same regime libopus uses for hybrid streams and >=100 ms bursts);
    the LCG evolution must match bit-exactly through the burst."""
    import opus_tpu
    from opus_tpu import Channels, DecoderConfiguration, SamplingRate
    from opus_tpu.batch.pipeline import BatchedCeltDecoder

    B, FRAME, NF = 4, 960, 10
    enc = oracle.Encoder(48000, 2)
    enc.ctl(oracle.SET_FORCE_MODE, oracle.MODE_CELT_ONLY)
    enc.ctl(oracle.SET_BITRATE, 96000)
    rng = np.random.default_rng(3)
    t = np.arange(FRAME * NF) / 48000
    sig = 0.4 * np.sin(2 * np.pi * 440 * t) + 0.1 * rng.standard_normal(t.size)
    pcm = np.stack([sig, 0.8 * np.roll(sig, 7)], -1).astype(np.float32)
    pkts = [enc.encode_float(pcm[f * FRAME : (f + 1) * FRAME].ravel(), FRAME) for f in range(NF)]
    pls = [p[parse_packet(p).payload_offset :] for p in pkts]
    lose = {3, 4, 5, 6}

    mine = opus_tpu.Decoder(DecoderConfiguration(SamplingRate.HZ_48000, Channels.STEREO))
    outs = []
    for f in range(NF):
        if f in lose:
            mine.celt.skip_plc = True  # force the serving policy's regime
            outs.append(mine.decode_float(None, FRAME))
        else:
            outs.append(mine.decode_float(pkts[f], FRAME))

    srv = BatchedCeltDecoder(B, 2, use_native=True, transfer="p10")
    if not srv.use_native:
        pytest.skip("native engine not built")
    for f in range(NF):
        srv.serve([[None] * B if f in lose else [pls[f]] * B], FRAME)
        got = np.asarray(srv._serve_ring)[0]
        assert float(np.abs(got - outs[f]).max()) < 4e-3, f
    assert srv.final_ranges()[0] == mine.celt.rng  # bit-exact LCG evolution


def test_native_batch_fuzz_robustness():
    """Random-byte payloads through the native batch decode and the
    packed serve loop (with interleaved losses) must either decode (the
    range coder saturates on corrupt data, like libopus) or raise
    ValueError with the stream index — never crash or hang."""
    from opus_tpu.batch.pipeline import BatchedCeltDecoder

    rng = np.random.default_rng(0)
    B = 4
    d = BatchedCeltDecoder(B, 2, use_native=True, transfer="p10")
    if not d.use_native:
        pytest.skip("native engine not built")
    for _ in range(40):
        n = int(rng.integers(2, 200))
        payloads = [bytes(rng.integers(0, 256, n, dtype=np.uint8)) for _ in range(B)]
        try:
            d.decode_frames(payloads, 960)
        except ValueError:
            pass
    for _ in range(8):
        n = int(rng.integers(2, 100))
        payloads = [None if rng.random() < 0.3
                    else bytes(rng.integers(0, 256, n, dtype=np.uint8)) for _ in range(B)]
        try:
            d.serve([payloads], 960)
        except ValueError:
            pass


def test_plan_executor_matches_reference_spectra():
    """Plan emission + both executors reproduce the native f32 spectra.

    Exercises PVQ leaves, spreading rotation, folds, transients
    (haar/interleave undo + anti-collapse), stereo merge, and PLC noise
    leaves across bitrates."""
    from opus_tpu.native.frontend import NativeBatchFrontEnd
    from opus_tpu.dsp.plan_exec import (execute_plan_numpy, make_plan_executor,
                                        plan_executor_args)
    import jax
    import jax.numpy as jnp

    B, F, NF = 3, 960, 6
    rng = np.random.default_rng(11)
    t = np.arange(F * NF) / 48000.0
    sig = np.sin(2 * np.pi * 220 * t) * 0.4 + np.sin(2 * np.pi * 3000 * t) * 0.2
    sig[F * 2 : F * 2 + 500] += rng.standard_normal(500) * 0.8  # transient
    sig[: F // 2] = 0
    streams = []
    for kbps in (48, 96, 160):
        enc = oracle.Encoder(48000, 2)
        enc.ctl(oracle.SET_BITRATE, kbps * 1000)
        enc.ctl(oracle.SET_FORCE_MODE, oracle.MODE_CELT_ONLY)
        pcm = np.stack([sig, np.roll(sig, 13)], -1).astype(np.float32)
        pk = [enc.encode_float(pcm[i * F : (i + 1) * F].ravel(), F) for i in range(NF)]
        streams.append([p[parse_packet(p).payload_offset :] for p in pk])
    fe = NativeBatchFrontEnd(B, 2, 1)
    slots = fe.alloc_plan_slots(1)
    exj = jax.jit(make_plan_executor(3, B))
    for fr in range(NF):
        pkts = [streams[b][fr] for b in range(B)]
        if fr == 4:
            pkts[1] = None  # PLC noise-leaf path
        slot = fe.decode_batch_plan_into(pkts, F, slots[0], want_xdbg=True)
        xn = execute_plan_numpy(slot, 3)
        xj = np.asarray(exj(*map(jnp.asarray, plan_executor_args(slot))))
        for b in range(B):
            c_ = int(slot["meta"][b, 3])
            ref = slot["xdbg"][b, : c_ * 960].reshape(c_, 960)
            assert np.abs(ref - xn[b, :c_]).max() < 1e-3  # f16 leaf gains
            assert np.abs(ref - xj[b, :c_]).max() < 1e-3


def test_plan_executor_size_classes_match_full():
    """The small/medium size-class executors (batch/pipeline.py
    PLAN_CLASSES) are pure gather-window/einsum-width reductions: when a
    step's maxima fit a class, its output must equal the full-capacity
    executor's bit for bit."""
    from opus_tpu.native.frontend import NativeBatchFrontEnd
    from opus_tpu.dsp.plan_exec import make_plan_executor, plan_executor_args
    from opus_tpu.batch.pipeline import BatchedCeltDecoder
    import jax
    import jax.numpy as jnp

    B, F, NF = 2, 960, 4
    t = np.arange(F * NF) / 48000.0
    sig = np.sin(2 * np.pi * 220 * t) * 0.4 + np.sin(2 * np.pi * 3000 * t) * 0.2
    enc = oracle.Encoder(48000, 2)
    enc.ctl(oracle.SET_BITRATE, 96000)
    enc.ctl(oracle.SET_FORCE_MODE, oracle.MODE_CELT_ONLY)
    pcm = np.stack([sig, np.roll(sig, 13)], -1).astype(np.float32)
    pk = [enc.encode_float(pcm[i * F : (i + 1) * F].ravel(), F) for i in range(NF)]
    payloads = [p[parse_packet(p).payload_offset :] for p in pk]

    fe = NativeBatchFrontEnd(B, 2, 1)
    slots = fe.alloc_plan_slots(1)
    ex_full = jax.jit(make_plan_executor(3, B))
    ex_by_cls = {
        cls: jax.jit(make_plan_executor(3, B, p_max=cls[0], f_max=cls[1],
                                        iyw=cls[2]))
        for cls in BatchedCeltDecoder.PLAN_CLASSES[:-1]
    }
    picker = BatchedCeltDecoder.__new__(BatchedCeltDecoder)
    picked_small = 0
    for fr in range(NF):
        slot = fe.decode_batch_plan_into([payloads[fr]] * B, F, slots[0])
        args = tuple(map(jnp.asarray, plan_executor_args(slot)))
        ref = np.asarray(ex_full(*args))
        cls = BatchedCeltDecoder._plan_size_class(picker, slot)
        c = slot["header"][:, 1]
        for test_cls, exj in ex_by_cls.items():
            fits = (int((c & 0x1FF).max()) <= test_cls[0]
                    and int(((c >> 9) & 0x1FF).max()) <= test_cls[1]
                    and int(slot["iy_spans"].max()) + 1 <= test_cls[2])
            if not fits:
                continue
            got = np.asarray(exj(*args))
            np.testing.assert_array_equal(got, ref)
            picked_small += 1
        assert cls in BatchedCeltDecoder.PLAN_CLASSES
    # 96 kbps stereo music must actually hit a sub-capacity class,
    # otherwise the feature is dead weight.
    assert picked_small > 0


def test_plan_transfer_mode_conformance():
    """transfer="plan" through the full serve() loop clears the RFC 8251
    conformance gate vs the float reference path (state carry, postfilter,
    transients, silence tail included)."""
    from opus_tpu.batch.pipeline import BatchedCeltDecoder
    from opus_tpu.conformance import PASS_QUALITY, compare

    B, FRAME, NF = 4, 960, 6
    payloads = _payloads(2, 960, 96, nframes=NF)
    f = BatchedCeltDecoder(B, 2, use_native=True, transfer="f32")
    if not f.use_native:
        pytest.skip("native engine not built")
    refs, ours = [], []
    p = BatchedCeltDecoder(B, 2, use_native=True, transfer="plan")
    for fr in range(NF):
        refs.append(f.decode_frames([payloads[fr]] * B, FRAME)[0])
        p.serve([[payloads[fr]] * B], FRAME)
        ours.append(np.asarray(p._serve_ring)[0])
    a, b = np.concatenate(refs), np.concatenate(ours)
    assert float(np.abs(a - b).max()) < 4e-3
    assert compare(a, b) >= PASS_QUALITY


def test_multistream_multiframe_and_silk_sessions():
    """Generalized multistream fast path: multi-frame CELT packets (code 3)
    and SILK/hybrid elementary streams (mode="opus"), both legal RFC 7845
    family-1 traffic, verified against libopus's multistream decoder."""
    from opus_tpu.batch.multistream_pipeline import BatchedMultistreamDecoder

    rng = np.random.default_rng(9)

    # --- multi-frame CELT: 40 ms packets = 2x20 ms frames per stream ----
    B, streams, coupled, ch = 2, 3, 1, 4
    mapping = [0, 1, 2, 3]
    encs = [oracle.MultistreamEncoder(48000, ch, streams, coupled, mapping)
            for _ in range(B)]
    refs = [oracle.MultistreamDecoder(48000, ch, streams, coupled, mapping)
            for _ in range(B)]
    for e in encs:
        e.ctl(oracle.SET_BITRATE, 256000)
        e.ctl(oracle.SET_FORCE_MODE, oracle.MODE_CELT_ONLY)
    bmd = BatchedMultistreamDecoder(B, ch, streams, coupled, mapping)
    frame, dur = 960, 1920  # 40 ms packets
    t = np.arange(dur * 2) / 48000
    for f in range(2):
        pkts = []
        for b in range(B):
            pcm = np.stack(
                [0.3 * np.sin(2 * np.pi * (180 + 70 * k + 11 * b) * t[f * dur : (f + 1) * dur])
                 + 0.02 * rng.standard_normal(dur) for k in range(ch)], -1).astype(np.float32)
            pkts.append(encs[b].encode_float(pcm.ravel(), dur))
        out = bmd.decode_frames(pkts, frame)
        assert out.shape == (B, dur, ch)
        for b in range(B):
            r = np.asarray(refs[b].decode_float(pkts[b], dur)).reshape(dur, ch)
            assert bmd.final_ranges()[b] == refs[b].final_range
            assert float(np.abs(out[b] - r).max()) < 1e-5

    # --- SILK elementary streams through the mixed-mode core ------------
    B2, streams2, coupled2, ch2 = 2, 2, 1, 3
    mapping2 = [0, 1, 2]
    encs2 = [oracle.MultistreamEncoder(48000, ch2, streams2, coupled2, mapping2,
                                       application=oracle.APPLICATION_VOIP)
             for _ in range(B2)]
    refs2 = [oracle.MultistreamDecoder(48000, ch2, streams2, coupled2, mapping2)
             for _ in range(B2)]
    for e in encs2:
        e.ctl(oracle.SET_BITRATE, 48000)
        e.ctl(oracle.SET_FORCE_MODE, oracle.MODE_SILK_ONLY)
        e.ctl(oracle.SET_MAX_BANDWIDTH, 1103)
    bms = BatchedMultistreamDecoder(B2, ch2, streams2, coupled2, mapping2, mode="opus")
    ph = np.cumsum(2 * np.pi * (130 + 25 * np.sin(2 * np.pi * 2.5 * t)) / 48000.0)
    voice = (0.35 * np.sign(np.sin(ph)) + 0.02 * rng.standard_normal(t.size)).astype(np.float32)
    for f in range(3):
        pkts = []
        for b in range(B2):
            pcm = np.stack([np.roll(voice, 17 * k + 5 * b)[f * frame : (f + 1) * frame]
                            for k in range(ch2)], -1).astype(np.float32)
            pkts.append(encs2[b].encode_float(pcm.ravel(), frame))
        out = bms.decode_frames(pkts, frame)
        for b in range(B2):
            r = np.asarray(refs2[b].decode_float(pkts[b], frame)).reshape(frame, ch2)
            assert bms.final_ranges()[b] == refs2[b].final_range
            assert float(np.abs(out[b] - r).max()) < 1e-4, (f, b)


def test_plan_serving_pitch_plc_in_packed_loop():
    """Pitch-regime CELT loss concealment runs ON DEVICE in the plan
    serving loop (opus_tpu/dsp/plc_exec.py): lost frames never leave the
    packed loop, including bursts that cross into the noise regime.
    Gate: conformance quality vs the scalar decoder under identical
    losses (the device conceals in f32 vs the scalar's f64, so near-tie
    pitch candidates may differ — both are legal concealments)."""
    from opus_tpu.batch.pipeline import BatchedCeltDecoder
    from opus_tpu.celt.decoder import CeltDecoder
    from opus_tpu.conformance import PASS_QUALITY, compare

    F, NF, B = 960, 16, 3
    rng = np.random.default_rng(5)
    t = np.arange(F * NF) / 48000.0
    ph = np.cumsum(2 * np.pi * (160 + 8 * np.sin(2 * np.pi * 1.5 * t)) / 48000.0)
    sig = (0.5 * np.sin(ph) + 0.25 * np.sin(2 * ph) + 0.1 * np.sin(3 * ph)
           + 0.01 * rng.standard_normal(t.size))
    pcm = np.stack([sig, np.roll(sig, 11) * 0.9], -1).astype(np.float32)
    enc = oracle.Encoder(48000, 2)
    enc.ctl(oracle.SET_BITRATE, 96000)
    enc.ctl(oracle.SET_FORCE_MODE, oracle.MODE_CELT_ONLY)
    pays = []
    for i in range(NF):
        p = enc.encode_float(pcm[i * F : (i + 1) * F].ravel(), F)
        pays.append(p[parse_packet(p).payload_offset :])

    # isolated loss, double loss, and a 6-frame burst (120 ms: frames 5+
    # of the burst cross into the noise regime -> regime switch inside
    # the packed loop).
    lose = {3, 6, 7} | set(range(9, 15))
    scal = CeltDecoder(2, 1)
    ref = np.concatenate(
        [scal.decode(None if i in lose else pays[i], F) for i in range(NF)]
    )
    front = BatchedCeltDecoder(B, 2, transfer="plan")
    if not front.use_native:
        pytest.skip("native engine not built")
    outs = []
    for i in range(NF):
        pk = None if i in lose else pays[i]
        front.serve([[pk] * B], F)
        outs.append(np.asarray(front._serve_ring))
    ours = np.stack(outs, 1).reshape(B, NF * F, 2)
    for b in range(B):
        assert compare(ref, ours[b]) >= PASS_QUALITY


def test_plan_executor_dual_stereo_and_intensity():
    """Decorrelated stereo at low rates drives the dual-stereo and
    intensity-switch band paths through the plan executor."""
    from opus_tpu.native.frontend import NativeBatchFrontEnd
    from opus_tpu.dsp.plan_exec import (execute_plan_numpy, make_plan_executor,
                                        plan_executor_args)
    import jax
    import jax.numpy as jnp

    F, NF = 960, 5
    rng = np.random.default_rng(13)
    t = np.arange(F * NF) / 48000.0
    L = 0.4 * np.sin(2 * np.pi * 317 * t) + 0.2 * rng.standard_normal(t.size)
    R = 0.4 * np.sin(2 * np.pi * 523 * t) + 0.2 * rng.standard_normal(t.size)
    pcm = np.stack([L, R], -1).astype(np.float32)
    cases = []
    for kbps in (32, 64):
        enc = oracle.Encoder(48000, 2)
        enc.ctl(oracle.SET_BITRATE, kbps * 1000)
        enc.ctl(oracle.SET_FORCE_MODE, oracle.MODE_CELT_ONLY)
        pk = [enc.encode_float(pcm[i * F : (i + 1) * F].ravel(), F) for i in range(NF)]
        cases.append([p[parse_packet(p).payload_offset :] for p in pk])
    B = len(cases)
    fe = NativeBatchFrontEnd(B, 2, 1)
    slots = fe.alloc_plan_slots(1)
    exj = jax.jit(make_plan_executor(3, B))
    saw_dual = 0
    for fr in range(NF):
        slot = fe.decode_batch_plan_into([cases[b][fr] for b in range(B)], F,
                                         slots[0], want_xdbg=True)
        saw_dual += int(((slot["bands"][:, :, 0].astype(np.uint32) >> 5) & 1).sum())
        xn = execute_plan_numpy(slot, 3)
        xj = np.asarray(exj(*map(jnp.asarray, plan_executor_args(slot))))
        for b in range(B):
            c_ = int(slot["meta"][b, 3])
            ref = slot["xdbg"][b, : c_ * 960].reshape(c_, 960)
            assert np.abs(ref - xn[b, :c_]).max() < 1e-3
            assert np.abs(ref - xj[b, :c_]).max() < 1e-3
    assert saw_dual > 0  # the content must actually drive the path


def test_plan_serve_overflow_falls_back_per_step():
    """A step whose plan overflows the arena ships as a q14 spectrum for
    just that step (SynthState is shared between step kinds), instead of
    killing the serving session."""
    from opus_tpu.batch.pipeline import BatchedCeltDecoder

    F, B, NF = 960, 4, 6
    payloads = _payloads(2, 960, 96, nframes=NF)
    ref = BatchedCeltDecoder(B, 2, transfer="plan")
    if not ref.use_native:
        pytest.skip("native engine not built")
    ref.serve([[payloads[i]] * B for i in range(NF)], F)
    want = np.asarray(ref._serve_ring)

    front = BatchedCeltDecoder(B, 2, transfer="plan")
    orig = front.native.decode_batch_plan_into
    calls = {"n": 0}

    def patched(packets, frame_size, slot, stream_channels=None, want_xdbg=False):
        calls["n"] += 1
        if calls["n"] == 3:
            raise OverflowError("synthetic arena overflow")
        return orig(packets, frame_size, slot, stream_channels, want_xdbg)

    front.native.decode_batch_plan_into = patched
    front.serve([[payloads[i]] * B for i in range(NF)], F)
    got = np.asarray(front._serve_ring)
    assert calls["n"] == NF  # every step attempted the plan path
    assert float(np.abs(got - want).max()) < 5e-4


def test_plan_iy_span_guard():
    """check_plan_iy_span matches a per-leaf Python recount and trips
    (-> per-step spectral fallback) when the executor's PLAN_IYW fetch
    window would be exceeded."""
    from opus_tpu.native.frontend import (
        NativeBatchFrontEnd, available, check_plan_iy_span,
    )
    import opus_tpu.dsp.plan_exec as pe

    if not available():
        pytest.skip("native engine not built")
    B, FRAME = 8, 960
    payloads = _payloads(2, FRAME, 128, nframes=8)
    fe = NativeBatchFrontEnd(B, 2)
    slot = fe.decode_batch_plan_into(payloads[:B], FRAME, fe.alloc_plan_slots(1)[0])
    spans = check_plan_iy_span(slot)
    hdr = slot["header"]
    au32 = slot["arena"].view(np.uint32)
    for b in range(B):
        off, counts = int(hdr[b, 0]), int(hdr[b, 1])
        bits = 0
        for p in range(counts & 0x1FF):
            # v4: one u32 word per record, n-1 at bits [0:8], w at [8:12]
            v = int(au32[off + p])
            bits += ((v & 0xFF) + 1) * ((v >> 8) & 0xF)
        assert int(spans[b]) == (bits + 31) // 32
    assert 0 < int(spans.max()) <= pe.PLAN_IYW - 1  # 128 kbps fits the window
    old = pe.PLAN_IYW
    try:
        pe.PLAN_IYW = int(spans.max())  # force "one word short"
        with pytest.raises(OverflowError):
            check_plan_iy_span(slot)
    finally:
        pe.PLAN_IYW = old


def test_plan_serve_real_overflow_transactional():
    """Content that genuinely overflows plan capacities (320 kbps stereo:
    iy spans and arena both blow the caps) must fall back per step
    WITHOUT corrupting decoder state: the failed plan attempt restores
    the native state before the spectral re-decode (a round-3 bug made
    every post-overflow frame diverge by ~0.26 max-abs)."""
    from opus_tpu.batch.pipeline import BatchedCeltDecoder

    B, FRAME, NF = 4, 960, 6
    payloads = _payloads(2, FRAME, 320, nframes=NF)
    ref = BatchedCeltDecoder(B, 2, use_native=True, transfer="f32")
    if not ref.use_native:
        pytest.skip("native engine not built")
    plan = BatchedCeltDecoder(B, 2, use_native=True, transfer="plan")
    worst = 0.0
    for f in range(NF):
        want = ref.decode_frames([payloads[f]] * B, FRAME)[0]
        plan.serve([[payloads[f]] * B], FRAME)
        got = np.asarray(plan._serve_ring)[0]
        worst = max(worst, float(np.abs(got - want).max()))
    assert worst < 4e-3, worst

    # 2.5 ms frames (n<=2 bands, plan mode unsupported) route to the
    # packed loop up front instead of overflow-falling-back every step.
    pay240 = _payloads(2, 240, 64, nframes=4)
    ref2 = BatchedCeltDecoder(B, 2, use_native=True, transfer="f32")
    plan2 = BatchedCeltDecoder(B, 2, use_native=True, transfer="plan")
    for f in range(4):
        want = ref2.decode_frames([pay240[f]] * B, 240)[0]
        plan2.serve([[pay240[f]] * B], 240)
        got = np.asarray(plan2._serve_ring)[0]
        assert float(np.abs(got - want).max()) < 4e-3


def test_batched_multistream_plan_transfer():
    """Multistream sessions serve on the plan transfer too (mono + coupled
    elementary streams through the plan executor's stream_channels path),
    pinned against libopus."""
    from opus_tpu.batch.multistream_pipeline import BatchedMultistreamDecoder
    from opus_tpu.native.frontend import available

    if not available():
        pytest.skip("native engine not built")
    B, streams, coupled, ch, FRAME = 3, 5, 3, 8, 960
    mapping = list(range(ch))
    enc = oracle.MultistreamEncoder(48000, ch, streams, coupled, mapping)
    enc.ctl(oracle.SET_BITRATE, 256000)
    enc.ctl(oracle.SET_FORCE_MODE, oracle.MODE_CELT_ONLY)
    rng = np.random.default_rng(1)
    t = np.arange(FRAME * 4) / 48000.0
    steps = []
    for f in range(4):
        pcm = np.stack(
            [0.3 * np.sin(2 * np.pi * (200 + 60 * k) * t[f * FRAME : (f + 1) * FRAME])
             + 0.02 * rng.standard_normal(FRAME) for k in range(ch)], -1
        ).astype(np.float32)
        steps.append([enc.encode_float(pcm.ravel(), FRAME)] * B)
    ref = oracle.MultistreamDecoder(48000, ch, streams, coupled, mapping)
    refs = [np.asarray(ref.decode_float(steps[f][0], FRAME)).reshape(FRAME, ch)
            for f in range(4)]
    bmd = BatchedMultistreamDecoder(B, ch, streams, coupled, mapping)
    bmd.core.transfer = "plan"
    out = bmd.serve(steps, FRAME)
    assert float(np.abs(out[0] - refs[-1]).max()) < 4e-3


def test_plan_executor_blockrow_fetch_matches_gather():
    """The block-row + row-uniform-barrel arena fetch is a pure
    reformulation of the merged element gather: identical output bit for
    bit, at full capacity and at a sub-capacity size class, including a
    PLC (noise-leaf) stream whose header region is empty."""
    from opus_tpu.native.frontend import NativeBatchFrontEnd
    from opus_tpu.dsp.plan_exec import make_plan_executor, plan_executor_args
    import jax
    import jax.numpy as jnp

    B, F, NF = 3, 960, 4
    rng = np.random.default_rng(7)
    t = np.arange(F * NF) / 48000.0
    sig = np.sin(2 * np.pi * 220 * t) * 0.4 + np.sin(2 * np.pi * 3000 * t) * 0.2
    sig[F : F + 400] += rng.standard_normal(400) * 0.8
    streams = []
    for kbps in (48, 96, 160):
        enc = oracle.Encoder(48000, 2)
        enc.ctl(oracle.SET_BITRATE, kbps * 1000)
        enc.ctl(oracle.SET_FORCE_MODE, oracle.MODE_CELT_ONLY)
        pcm = np.stack([sig, np.roll(sig, 13)], -1).astype(np.float32)
        pk = [enc.encode_float(pcm[i * F : (i + 1) * F].ravel(), F) for i in range(NF)]
        streams.append([p[parse_packet(p).payload_offset :] for p in pk])
    fe = NativeBatchFrontEnd(B, 2, 1)
    slots = fe.alloc_plan_slots(1)
    variants = [
        (dict(), dict()),                                   # full capacity
        (dict(p_max=112, f_max=8, iyw=128),) * 2,           # sub-capacity class
    ]
    built = [
        (jax.jit(make_plan_executor(3, B, leaves_fetch="gather", **kwg)),
         jax.jit(make_plan_executor(3, B, leaves_fetch="blockrow", **kwb)))
        for kwg, kwb in variants
    ]
    for fr in range(NF):
        pkts = [streams[b][fr] for b in range(B)]
        if fr == 2:
            pkts[0] = None  # PLC noise leaves
        slot = fe.decode_batch_plan_into(pkts, F, slots[0])
        args = tuple(map(jnp.asarray, plan_executor_args(slot)))
        c = slot["header"][:, 1]
        fits_small = (int((c & 0x1FF).max()) <= 112
                      and int(((c >> 9) & 0x1FF).max()) <= 8
                      and int(slot["iy_spans"].max()) + 1 <= 128)
        for vi, (exg, exb) in enumerate(built):
            if vi == 1 and not fits_small:
                continue
            ref = np.asarray(exg(*args))
            got = np.asarray(exb(*args))
            np.testing.assert_array_equal(got, ref)
