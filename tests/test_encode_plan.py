"""Batched TPU encode plane (music): conformance + quality gates.

The three-way final_range gate (our encoder rng == libopus decoder
final_range == our decoder final_range) proves every packet is exactly
the bitstream we think it is; the SNR gate bounds the v1 static-scope
quality cost (spread/tf/prefilter/transients off — all legal choices)
against libopus CBR at the same rate.  Ref surface: encoder.rs:1-10;
design: SURVEY.md §7 step 7.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from opus_tpu import Decoder, oracle  # noqa: E402

pytestmark = pytest.mark.skipif(not oracle.available(), reason="libopus not present")

F = 960


def _sig(nf, seed=3):
    rng = np.random.default_rng(seed)
    t = np.arange(F * nf) / 48000
    s = (0.4 * np.sin(2 * np.pi * 440 * t)
         + 0.15 * np.sin(2 * np.pi * 1870 * t)
         + 0.05 * rng.standard_normal(F * nf))
    return np.stack([s, 0.8 * np.roll(s, 5)], -1).astype(np.float32)


@pytest.mark.parametrize("channels,kbps", [(2, 96), (1, 64), (2, 64)])
def test_plan_encode_three_way_final_range(channels, kbps):
    from opus_tpu.batch.encode_pipeline import BatchedPlanEncoder

    B, NF = 8, 4
    pcm = _sig(NF)[:, :channels]
    enc = BatchedPlanEncoder(B, channels, kbps * 1000)
    dec_lib = [oracle.Decoder(48000, channels) for _ in range(B)]
    dec_mine = [Decoder() for _ in range(B)]
    for f in range(NF):
        batch = np.stack([pcm[f * F : (f + 1) * F]] * B)
        # make streams differ (amplitude scaling) so the batch isn't trivial
        batch *= (0.5 + 0.5 * np.arange(B) / B)[:, None, None]
        pkts = enc.encode_step(batch)
        rngs = enc.final_ranges()
        for b in range(B):
            out = dec_lib[b].decode_float(pkts[b], F)
            assert np.asarray(out).size == F * channels
            if channels == 2:
                mine = dec_mine[b].decode_float(pkts[b], F)
                assert dec_mine[b].final_range == rngs[b], (f, b)
                del mine
            assert dec_lib[b].final_range == rngs[b], (f, b)


def test_plan_encode_quality_vs_libopus():
    """Delay-compensated SNR within 3 dB of libopus CBR at 96 kbps on
    tonal content (v1 static scope costs ~1.3 dB here)."""
    from opus_tpu.batch.encode_pipeline import BatchedPlanEncoder

    NF = 8
    pcm = _sig(NF)
    enc = BatchedPlanEncoder(1, 2, 96000)
    dl = oracle.Decoder(48000, 2)
    ours = np.concatenate([
        np.asarray(dl.decode_float(enc.encode_step(pcm[None, f * F : (f + 1) * F])[0],
                                   F)).reshape(F, 2)
        for f in range(NF)
    ]).mean(-1)
    el = oracle.Encoder(48000, 2)
    el.ctl(oracle.SET_BITRATE, 96000)
    el.ctl(oracle.SET_VBR, 0)
    d2 = oracle.Decoder(48000, 2)
    lib = np.concatenate([
        np.asarray(d2.decode_float(
            el.encode_float(pcm[f * F : (f + 1) * F].ravel(), F), F)).reshape(F, 2)
        for f in range(NF)
    ]).mean(-1)
    ref = pcm.astype(np.float64).mean(-1)

    def best_snr(got):
        best = -1e9
        for lag in range(400):
            g = got[lag:]
            nn = min(len(ref), len(g))
            r, g2 = ref[4800:nn], g[4800 : nn - lag + 4800] if False else g[4800:nn]
            e = r - g2[: len(r)]
            best = max(best, 10 * np.log10((r ** 2).sum() / max((e ** 2).sum(), 1e-12)))
        return best

    so, sl = best_snr(ours), best_snr(lib)
    assert so > sl - 3.0, (so, sl)


def test_plan_encode_silence_dtx_shape():
    """Digitally-silent frames code as the one-symbol silence frame."""
    from opus_tpu.batch.encode_pipeline import BatchedPlanEncoder

    enc = BatchedPlanEncoder(2, 2, 64000)
    pcm = np.zeros((2, F, 2), np.float32)
    pkts = enc.encode_step(pcm)
    dl = oracle.Decoder(48000, 2)
    for p in pkts:
        out = dl.decode_float(p, F)
        assert float(np.abs(np.asarray(out)).max()) < 1e-4
