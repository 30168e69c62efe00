"""RFC 8251-style conformance gate: full decoder matrix vs live libopus.

Every mode x bandwidth x frame size x channel layout (plus mode
transitions and loss concealment) is decoded by both opus_tpu and the
system libopus from the same bitstream; the opus_compare-style quality
metric (opus_tpu.conformance) must clear the RFC's 90-point threshold,
and final_range must match exactly on clean frames.  This replaces
per-sample tolerances as the end-to-end oracle (SURVEY.md §4).
"""

import numpy as np
import pytest

import opus_tpu
from opus_tpu import oracle
from opus_tpu.conformance import PASS_QUALITY, compare

pytestmark = pytest.mark.skipif(not oracle.available(), reason="libopus not present")


def _signal(n, kind, seed=11):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 48000.0
    if kind == "voice":
        ph = np.cumsum(2 * np.pi * (130 + 25 * np.sin(2 * np.pi * 2.5 * t)) / 48000.0)
        return (0.35 * np.sign(np.sin(ph)) + 0.02 * rng.standard_normal(n)).astype(np.float32)
    if kind == "transient":
        # Periodic clicks over quiet tone: exercises short blocks,
        # tf switches and anti-collapse.
        sig = 0.1 * np.sin(2 * np.pi * 330 * t)
        step = 48000 // 3
        for off in range(step // 2, n - 300, step):
            sig[off : off + 300] += rng.standard_normal(300) * 0.7
        return sig.astype(np.float32)
    if kind == "onset":
        # Silence -> hard attack -> decaying harmonics: exercises the
        # silence flag, intra energy and post-onset energy tracking.
        sig = np.zeros(n)
        start = n // 4
        env = np.exp(-3.0 * (t[: n - start]))
        sig[start:] = env * (0.6 * np.sin(2 * np.pi * 523 * t[: n - start])
                             + 0.3 * np.sin(2 * np.pi * 1046.5 * t[: n - start]))
        return sig.astype(np.float32)
    if kind == "noiseburst":
        # Alternating noise bursts and near-silence: spectral folding and
        # spread decisions on noise-like frames.
        sig = 0.02 * rng.standard_normal(n)
        step = 9600
        for off in range(0, n - step, 2 * step):
            sig[off : off + step] = rng.standard_normal(step) * 0.5
        return sig.astype(np.float32)
    if kind == "sweep":
        # Moving-envelope chirp: every band's energy moves every frame
        # (coarse-energy predictor + dynalloc under motion).
        f0 = 100 * np.exp(np.log(12000 / 100) * t / t[-1])
        ph = np.cumsum(2 * np.pi * f0 / 48000.0)
        return ((0.5 + 0.45 * np.sin(2 * np.pi * 3.1 * t)) * np.sin(ph)).astype(np.float32)
    return (0.4 * np.sin(2 * np.pi * 440 * t) + 0.2 * np.sin(2 * np.pi * 2930 * t)
            + 0.05 * rng.standard_normal(n)).astype(np.float32)


def _roundtrip(enc, sig2, frame, lose=()):
    """Returns (ours, ref, clean_ranges_equal) over len(sig2)//frame frames."""
    ours = opus_tpu.Decoder()
    ref = oracle.Decoder(48000, 2)
    o_out, r_out = [], []
    ranges_ok = True
    for f in range(sig2.shape[0] // frame):
        pkt = enc.encode_float(np.ascontiguousarray(sig2[f * frame : (f + 1) * frame]).ravel(), frame)
        if f in lose:
            o_out.append(np.asarray(ours.decode_float(None, frame)).reshape(frame, 2))
            r_out.append(np.asarray(ref.decode_float(None, frame)).reshape(frame, 2))
        else:
            o_out.append(np.asarray(ours.decode_float(pkt, frame)).reshape(frame, 2))
            r_out.append(np.asarray(ref.decode_float(pkt, frame)).reshape(frame, 2))
            ranges_ok &= ours.final_range == ref.final_range
    return np.concatenate(o_out), np.concatenate(r_out), ranges_ok


def _enc(mode, kbps, ch, max_bw=None, cbr=False):
    e = oracle.Encoder(48000, ch)
    e.ctl(oracle.SET_FORCE_MODE, mode)
    e.ctl(oracle.SET_BITRATE, kbps * 1000)
    if max_bw is not None:
        e.ctl(oracle.SET_MAX_BANDWIDTH, max_bw)
    return e


MATRIX = [
    # (name, mode, kbps, channels, max_bw, frame, signal kind)
    ("celt fb stereo 20ms", oracle.MODE_CELT_ONLY, 96, 2, None, 960, "music"),
    ("celt fb mono 10ms", oracle.MODE_CELT_ONLY, 64, 1, None, 480, "music"),
    ("celt nb mono 20ms", oracle.MODE_CELT_ONLY, 24, 1, 1101, 960, "voice"),
    ("celt fb stereo 5ms", oracle.MODE_CELT_ONLY, 128, 2, None, 240, "music"),
    ("celt fb mono 2.5ms", oracle.MODE_CELT_ONLY, 128, 1, None, 120, "music"),
    ("celt swb mono 20ms", oracle.MODE_CELT_ONLY, 48, 1, 1104, 960, "music"),
    ("silk wb mono 20ms", oracle.MODE_SILK_ONLY, 24, 1, 1103, 960, "voice"),
    ("silk wb stereo 20ms", oracle.MODE_SILK_ONLY, 40, 2, 1103, 960, "voice"),
    ("silk nb mono 40ms", oracle.MODE_SILK_ONLY, 12, 1, 1101, 1920, "voice"),
    ("silk mb mono 60ms", oracle.MODE_SILK_ONLY, 16, 1, 1102, 2880, "voice"),
    ("silk wb mono 10ms", oracle.MODE_SILK_ONLY, 24, 1, 1103, 480, "voice"),
    ("hybrid swb stereo 20ms", oracle.MODE_HYBRID, 64, 2, 1104, 960, "voice"),
    ("hybrid fb mono 10ms", oracle.MODE_HYBRID, 48, 1, None, 480, "voice"),
    ("hybrid fb stereo 20ms", oracle.MODE_HYBRID, 96, 2, None, 960, "music"),
    # Signal-family rows: transients/onsets/noise/motion exercise the
    # anti-collapse, short-block, silence-flag and energy-tracking paths
    # the two steady signals never hit.
    ("celt transient stereo", oracle.MODE_CELT_ONLY, 96, 2, None, 960, "transient"),
    ("celt transient mono 10ms", oracle.MODE_CELT_ONLY, 64, 1, None, 480, "transient"),
    ("celt onset stereo", oracle.MODE_CELT_ONLY, 96, 2, None, 960, "onset"),
    ("celt noiseburst mono", oracle.MODE_CELT_ONLY, 48, 1, None, 960, "noiseburst"),
    ("celt sweep stereo", oracle.MODE_CELT_ONLY, 96, 2, None, 960, "sweep"),
    ("silk onset mono", oracle.MODE_SILK_ONLY, 24, 1, 1103, 960, "onset"),
    ("silk noiseburst mono", oracle.MODE_SILK_ONLY, 24, 1, 1103, 960, "noiseburst"),
    ("hybrid transient stereo", oracle.MODE_HYBRID, 96, 2, None, 960, "transient"),
    ("hybrid sweep mono", oracle.MODE_HYBRID, 64, 1, None, 960, "sweep"),
]


@pytest.mark.parametrize("name,mode,kbps,ch,max_bw,frame,kind", MATRIX)
def test_matrix_quality(name, mode, kbps, ch, max_bw, frame, kind):
    n = frame * max(6, 9600 // frame)
    sig = _signal(n, kind)
    sig2 = (np.stack([sig, np.roll(sig, 9) * 0.8], -1) if ch == 2 else
            np.stack([sig, sig], -1) * np.float32([1, 0]))[:, :ch]
    if ch == 1:
        sig2 = sig[:, None]
    ours, ref, ranges_ok = _roundtrip(_enc(mode, kbps, ch, max_bw), sig2, frame)
    q = compare(ref, ours)
    assert ranges_ok, name
    assert q >= PASS_QUALITY, (name, q)


def test_transitions_quality():
    """SILK -> CELT -> hybrid -> SILK transitions through one decoder."""
    frame = 960
    voice = _signal(frame * 12, "voice")
    enc = oracle.Encoder(48000, 1)
    enc.ctl(oracle.SET_BITRATE, 48000)
    plan = ([oracle.MODE_SILK_ONLY] * 3 + [oracle.MODE_CELT_ONLY] * 3
            + [oracle.MODE_HYBRID] * 3 + [oracle.MODE_SILK_ONLY] * 3)
    ours = opus_tpu.Decoder()
    ref = oracle.Decoder(48000, 2)
    o_out, r_out = [], []
    for f, m in enumerate(plan):
        enc.ctl(oracle.SET_FORCE_MODE, m)
        pkt = enc.encode_float(voice[f * frame : (f + 1) * frame], frame)
        o_out.append(np.asarray(ours.decode_float(pkt, frame)).reshape(frame, 2))
        r_out.append(np.asarray(ref.decode_float(pkt, frame)).reshape(frame, 2))
    q = compare(np.concatenate(r_out), np.concatenate(o_out))
    assert q >= PASS_QUALITY, q


def test_silk_plc_quality():
    """SILK with a loss burst: concealment must match libopus's (ours is
    sample-exact, so the score is ~100)."""
    frame = 960
    voice = _signal(frame * 10, "voice")
    ours, ref, _ = _roundtrip(_enc(oracle.MODE_SILK_ONLY, 24, 1, 1103), voice[:, None],
                              frame, lose={4, 5})
    q = compare(ref, ours)
    assert q >= PASS_QUALITY, q


def test_celt_plc_quality():
    """CELT pitch-regime concealment (bursts <= 5) is sample-accurate vs
    libopus (pitch-LPC extrapolation incl. the interpolation tie-break)."""
    frame = 960
    music = _signal(frame * 12, "music")
    sig2 = np.stack([music, np.roll(music, 9) * 0.8], -1)
    for lose in ({5}, {4, 5, 6}, set(range(7, 12))):
        ours, ref, _ = _roundtrip(_enc(oracle.MODE_CELT_ONLY, 96, 2), sig2, frame, lose=lose)
        q = compare(ref, ours)
        assert q >= PASS_QUALITY, (sorted(lose), q)
        assert float(np.abs(ours - ref).max()) < 5e-4, sorted(lose)


def test_celt_plc_long_burst_quality():
    """Deep-loss noise regime (>5 frames): band-accurate vs libopus on
    broadband content; tonal content has a known ~-30 dB low-frequency
    residual (docs/KNOWN_GAPS.md), so the gate here uses broadband."""
    frame = 960
    rng = np.random.default_rng(4)
    n = frame * 16
    w = np.fft.rfft(rng.standard_normal(n))
    w /= (1 + np.arange(len(w))) ** 0.3
    sig = np.fft.irfft(w, n)
    sig = (0.5 * sig / np.abs(sig).max()).astype(np.float32)
    sig2 = np.stack([sig, np.roll(sig, 9)], -1)
    ours, ref, _ = _roundtrip(_enc(oracle.MODE_CELT_ONLY, 96, 2), sig2, frame,
                              lose=set(range(5, 13)))
    q = compare(ref, ours)
    assert q >= PASS_QUALITY, q
