"""Encoder quality corpus: ours vs libopus, delay-compensated SNR.

The standing measurement for encoder tuning (reference analog: the
quality work behind /root/reference/src/encoder.rs's planned analysis
stack).  Every tuning change must be gated on the CORPUS MEAN moving
up, not on one signal — round-4 history: an alloc-trim rework that
looked principled cost 1.5 dB on the bell signal while barely moving
the trims themselves.

Usage:
  python tools/qualbench.py                # full table (music rows)
  python tools/qualbench.py --voice        # add SILK/hybrid voice rows
  python tools/qualbench.py --signals bell,castanet --rates 64
  python tools/qualbench.py --json         # one JSON line (CI-friendly)

SNR here is waveform SNR after best-lag alignment, skipping the first
100 ms; codecs do not optimise waveform SNR at low rates, so treat the
GAP (ours - libopus on the same signal/rate) as the metric, not the
absolute number.
"""

from __future__ import annotations

import argparse
import json
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from opus_tpu import oracle

FS = 48000
FRAME = 960
NF = 32  # 640 ms per signal


def _env(t: np.ndarray, period_s: float, decay: float) -> np.ndarray:
    return np.exp(-((t / period_s) % 1.0) * decay)


def make_corpus() -> dict[str, np.ndarray]:
    """~640 ms mono test signals covering the encoder's decision surface:
    tonal sparsity (bell), dense harmonics (saw_chord), transients
    (castanet), noise floors, spectral tilt (pink/sweep), AM tracking."""
    n = FRAME * NF
    t = np.arange(n) / FS
    rng = np.random.default_rng(7)
    sig: dict[str, np.ndarray] = {}

    sig["tones"] = (
        0.4 * np.sin(2 * np.pi * 440 * t)
        + 0.15 * np.sin(2 * np.pi * 1870 * t)
        + 0.05 * rng.standard_normal(n)
    )

    # sparse decaying partials, re-struck 3x/s (the round-4 bell)
    sig["bell"] = sum(
        a * np.sin(2 * np.pi * f * t) * _env(t, 1 / 3.0, 6.0)
        for a, f in ((0.5, 1046.5), (0.3, 2637.0), (0.2, 4186.0), (0.15, 7040.0))
    )

    # dense harmonic chord with vibrato (music-like steady state)
    vib = 1.0 + 0.004 * np.sin(2 * np.pi * 5.5 * t)
    chord = np.zeros(n)
    for f0 in (196.0, 246.9, 293.7):
        for h in range(1, 25):
            chord += (0.25 / h) * np.sin(2 * np.pi * f0 * h * vib * t + 0.7 * h)
    sig["saw_chord"] = 0.35 * chord / np.abs(chord).max()

    # clicks over a quiet tone: transient/short-block stressor
    cast = 0.05 * np.sin(2 * np.pi * 330 * t)
    for i in range(900, n - 600, 3100):
        cast[i : i + 90] += 0.75 * np.exp(-np.arange(90) / 12.0) * np.sign(
            np.sin(np.arange(90) * 1.1)
        )
    sig["castanet"] = cast

    sig["noise_white"] = 0.25 * rng.standard_normal(n)

    # pink-ish noise: -3 dB/oct via cumulative filtering
    w = rng.standard_normal(n)
    b = [0.049922035, -0.095993537, 0.050612699, -0.004408786]
    a = [1.0, -2.494956002, 2.017265875, -0.522189400]
    pink = np.zeros(n)
    zx = np.zeros(3)
    for i in range(n):  # direct-form II transposed biquad-ish order 3
        y = b[0] * w[i] + zx[0]
        zx[0] = b[1] * w[i] - a[1] * y + zx[1]
        zx[1] = b[2] * w[i] - a[2] * y + zx[2]
        zx[2] = b[3] * w[i] - a[3] * y
        pink[i] = y
    sig["noise_pink"] = 0.8 * pink / np.abs(pink).max()

    # log sweep 100 Hz -> 18 kHz
    f0, f1 = 100.0, 18000.0
    k = np.log(f1 / f0)
    phase = 2 * np.pi * f0 * (t[-1] / k) * (np.exp(k * t / t[-1]) - 1.0)
    sig["sweep"] = 0.4 * np.sin(phase)

    # AM tone pair: dynalloc/energy-tracking stressor
    am = 0.5 * (1 + np.sin(2 * np.pi * 4 * t))
    sig["am_tones"] = am * (0.4 * np.sin(2 * np.pi * 950 * t) + 0.2 * np.sin(2 * np.pi * 3800 * t))

    # speech-like: glottal pulse train through moving formants + bursts
    fo = 118.0 * (1.0 + 0.05 * np.sin(2 * np.pi * 2.3 * t))
    ph = np.cumsum(fo) / FS
    glott = np.maximum(0.0, np.sin(2 * np.pi * ph)) ** 3
    fmt = np.zeros(n)
    for cf, bwq, g in ((600, 10, 1.0), (1400, 12, 0.6), (2600, 14, 0.35)):
        cfm = cf * (1.0 + 0.25 * np.sin(2 * np.pi * 0.9 * t + cf))
        fmt += g * glott * np.sin(2 * np.pi * np.cumsum(cfm) / FS)
    burst = rng.standard_normal(n) * (np.sin(2 * np.pi * 1.7 * t) > 0.93) * 0.3
    sp = fmt + burst
    sig["speech_like"] = 0.5 * sp / np.abs(sp).max()

    sig.update(_real_corpus(n))
    for k2 in sig:
        sig[k2] = np.clip(sig[k2], -0.95, 0.95).astype(np.float32)
    return sig


def _real_corpus(n: int) -> dict[str, np.ndarray]:
    """Recorded (NON-synthetic) content so the corpus isn't purely
    generated signals: pygame's sample recordings shipped in this image
    (8-bit 11025 Hz WAVs — low-fi, but real spectra, real envelopes,
    real noise floors), upsampled 11025->48000 (640/147 polyphase).
    real_music = the house_lo music loop; real_perc = recorded
    percussive hits tiled to length.  Skipped when unavailable."""
    try:
        import importlib.util
        import os
        import warnings

        from scipy.io import wavfile
        from scipy.signal import resample_poly

        spec = importlib.util.find_spec("pygame")
        if spec is None or not spec.submodule_search_locations:
            return {}
        base = os.path.join(list(spec.submodule_search_locations)[0],
                            "examples", "data")

        def load(fn: str) -> np.ndarray:
            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                r, d = wavfile.read(os.path.join(base, fn))
            assert r == 11025 and d.dtype == np.uint8, (fn, r, d.dtype)
            x = (d.astype(np.float32) - 128.0) / 128.0
            return resample_poly(x, 640, 147).astype(np.float32)

        music = load("house_lo.wav")
        perc = np.concatenate([load("car_door.wav"), load("boom.wav"),
                               load("punch.wav")])
        out = {}
        for name, x in (("real_music", music), ("real_perc", perc)):
            x = np.tile(x, -(-n // len(x)))[:n]
            out[name] = 0.7 * x / max(float(np.abs(x).max()), 1e-9)
        return out
    except Exception:
        return {}


def stereoize(mono: np.ndarray) -> np.ndarray:
    return np.stack([mono, 0.8 * np.roll(mono, 13)], -1).astype(np.float32)


def best_snr(ref: np.ndarray, got: np.ndarray, maxlag: int = 400, skip: int = 4800) -> float:
    """Best waveform SNR over decoder lags 0..maxlag, skipping warmup."""
    best = -1e9
    ref = ref.astype(np.float64)
    got = got.astype(np.float64)
    for lag in range(maxlag):
        g = got[lag:]
        nn = min(len(ref), len(g))
        r, g = ref[skip:nn], g[skip:nn]
        if len(r) < FRAME:
            break
        e = r - g
        best = max(best, 10 * np.log10((r**2).sum() / max((e**2).sum(), 1e-12)))
    return best


def run_ours(stereo: np.ndarray, kbps: int, application: str = "music",
             channels: int = 2) -> np.ndarray:
    from opus_tpu.encoder import Encoder, EncoderConfiguration
    from opus_tpu.types import Channels, SamplingRate

    cfg = EncoderConfiguration(
        SamplingRate.HZ_48000, Channels(channels), kbps * 1000, application=application
    )
    enc = Encoder(cfg)
    dec = oracle.Decoder(FS, channels)
    pcm = stereo if channels == 2 else stereo[:, :1]
    out = [
        dec.decode_float(enc.encode(pcm[f * FRAME : (f + 1) * FRAME]), FRAME)
        for f in range(NF)
    ]
    return np.concatenate(out)


def run_libopus(stereo: np.ndarray, kbps: int, application: str = "music",
                channels: int = 2) -> np.ndarray:
    app = oracle.APPLICATION_AUDIO if application == "music" else oracle.APPLICATION_VOIP
    enc = oracle.Encoder(FS, channels, app)
    enc.ctl(oracle.SET_BITRATE, kbps * 1000)
    enc.ctl(oracle.SET_VBR, 0)  # CBR, like ours
    dec = oracle.Decoder(FS, channels)
    pcm = stereo if channels == 2 else stereo[:, :1]
    out = [
        dec.decode_float(enc.encode_float(pcm[f * FRAME : (f + 1) * FRAME], FRAME), FRAME)
        for f in range(NF)
    ]
    return np.concatenate(out)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--signals", default="")
    ap.add_argument("--rates", default="32,64,96")
    ap.add_argument("--mono", action="store_true", help="mono rows instead of stereo")
    ap.add_argument("--voice", action="store_true", help="add SILK voice rows (mono 16/24k)")
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    if not oracle.available():
        print(json.dumps({"error": "libopus oracle unavailable"}))
        return

    corpus = make_corpus()
    names = [s for s in args.signals.split(",") if s] or list(corpus)
    rates = [int(r) for r in args.rates.split(",") if r]
    channels = 1 if args.mono else 2

    rows = []
    for name in names:
        mono = corpus[name]
        stereo = stereoize(mono)
        ref = stereo[:, :channels].astype(np.float64).mean(-1) if channels == 2 else mono.astype(np.float64)
        for kbps in rates:
            ours = run_ours(stereo, kbps, "music", channels)
            lib = run_libopus(stereo, kbps, "music", channels)
            ours_m = ours.mean(-1) if channels == 2 else ours[:, 0]
            lib_m = lib.mean(-1) if channels == 2 else lib[:, 0]
            refm = stereo.astype(np.float64).mean(-1) if channels == 2 else ref
            so = best_snr(refm, ours_m)
            sl = best_snr(refm, lib_m)
            rows.append({"signal": name, "kbps": kbps, "mode": "music",
                         "ours_db": round(so, 2), "libopus_db": round(sl, 2),
                         "gap_db": round(so - sl, 2)})
            if not args.json:
                print(f"{name:12s} {kbps:3d}k music  ours {so:6.2f}  libopus {sl:6.2f}  gap {so - sl:+6.2f}")

    # TPU-plane (plan) encoder rows: the batched device encoder's v1
    # static scope (spread/tf/prefilter/transients off) costs quality on
    # some content — keep the gap measured next to the host rows.
    if not args.signals or "plan" in args.signals:
        try:
            from opus_tpu.batch.encode_pipeline import BatchedPlanEncoder

            for name in ("tones", "castanet", "real_music"):
                if name not in corpus:
                    continue
                stereo = stereoize(corpus[name])
                refm = stereo.astype(np.float64).mean(-1)
                for kbps in (64, 96):
                    enc = BatchedPlanEncoder(1, 2, kbps * 1000)
                    dec = oracle.Decoder(FS, 2)
                    out = [
                        dec.decode_float(
                            enc.encode_step(stereo[None, f * FRAME : (f + 1) * FRAME])[0],
                            FRAME)
                        for f in range(NF)
                    ]
                    got = np.concatenate(out).mean(-1)
                    lib = run_libopus(stereo, kbps).mean(-1)
                    so = best_snr(refm, got)
                    sl = best_snr(refm, lib)
                    rows.append({"signal": name, "kbps": kbps,
                                 "mode": "music_tpu_plan",
                                 "ours_db": round(so, 2),
                                 "libopus_db": round(sl, 2),
                                 "gap_db": round(so - sl, 2)})
                    if not args.json:
                        print(f"{name:12s} {kbps:3d}k plan   ours {so:6.2f}  "
                              f"libopus {sl:6.2f}  gap {so - sl:+6.2f}")
        except Exception as e:
            if not args.json:
                print(f"plan rows skipped: {e}")

    if args.voice:
        for name in ("speech_like", "tones"):
            mono = corpus[name]
            stereo = stereoize(mono)
            for kbps in (16, 24):
                ours = run_ours(stereo, kbps, "voice", 1)
                lib = run_libopus(stereo, kbps, "voice", 1)
                so = best_snr(mono.astype(np.float64), ours[:, 0])
                sl = best_snr(mono.astype(np.float64), lib[:, 0])
                rows.append({"signal": name, "kbps": kbps, "mode": "voice",
                             "ours_db": round(so, 2), "libopus_db": round(sl, 2),
                             "gap_db": round(so - sl, 2)})
                if not args.json:
                    print(f"{name:12s} {kbps:3d}k voice  ours {so:6.2f}  libopus {sl:6.2f}  gap {so - sl:+6.2f}")

    gaps = [r["gap_db"] for r in rows if r["mode"] == "music"]
    summary = {"mean_gap_db": round(float(np.mean(gaps)), 2),
               "min_gap_db": round(float(np.min(gaps)), 2),
               "rows": len(rows)}
    plan_gaps = [r["gap_db"] for r in rows if r["mode"] == "music_tpu_plan"]
    if plan_gaps:
        # the TPU-plane (v1 static scope) rows get their own summary so
        # the host-encoder headline stays comparable across rounds
        summary["tpu_plan_mean_gap_db"] = round(float(np.mean(plan_gaps)), 2)
        summary["tpu_plan_min_gap_db"] = round(float(np.min(plan_gaps)), 2)
    if args.json:
        print(json.dumps({"summary": summary, "rows": rows}))
    else:
        print(f"\nmean gap {summary['mean_gap_db']:+.2f} dB   "
              f"worst {summary['min_gap_db']:+.2f} dB   ({len(rows)} rows)")


if __name__ == "__main__":
    main()
