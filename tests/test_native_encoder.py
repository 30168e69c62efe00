"""Native CELT encoder: conformance against libopus + our decoder.

The native encoder (opus_tpu/native/celt_encoder.inc) is a C++ port of
the validated Python CeltEncoder; bitstreams are not byte-identical (the
analysis floats round differently — every decision is still a legal
bitstream choice) so the gates are the strong ones: libopus must decode
our packets bit-identically to our own decoder (final_range equality
per frame) and quality must match the Python encoder's.
"""

import numpy as np
import pytest

from opus_tpu import oracle

pytestmark = pytest.mark.skipif(not oracle.available(), reason="libopus not present")


def _signal(frames, frame, seed=3, transient=True):
    rng = np.random.default_rng(seed)
    t = np.arange(frame * frames) / 48000.0
    sig = (np.sin(2 * np.pi * 220 * t) * 0.4 + np.sin(2 * np.pi * 1870 * t) * 0.2
           + 0.05 * rng.standard_normal(t.size)) * (0.6 + 0.4 * np.sin(2 * np.pi * 1.1 * t))
    if transient:
        sig[frame * 3 : frame * 3 + 400] += rng.standard_normal(400) * 0.6
    return sig


@pytest.mark.parametrize("channels,nb_bytes", [(2, 240), (1, 160), (2, 60), (2, 510)])
def test_native_encoder_libopus_decodes_identically(channels, nb_bytes):
    from opus_tpu.celt.decoder import CeltDecoder
    from opus_tpu.native.frontend import NativeCeltEncoder, available

    if not available():
        pytest.skip("native engine not built")
    F, NF = 960, 10
    sig = _signal(NF, F)
    pcm = (np.stack([sig, np.roll(sig, 9) * 0.8], -1) if channels == 2
           else sig[:, None]).astype(np.float32)
    enc = NativeCeltEncoder(channels)
    toc = bytes([(31 << 3) | (0x4 if channels == 2 else 0)])  # CELT FB 20 ms
    dl = oracle.Decoder(48000, channels)
    dours = CeltDecoder(channels, 1)
    for f in range(NF):
        payload = enc.encode(pcm[f * F : (f + 1) * F], nb_bytes)
        a = np.asarray(dl.decode_float(toc + payload, F)).reshape(F, channels)
        b = dours.decode(payload, F)
        assert dl.final_range == dours.rng, f"final_range mismatch at frame {f}"
        assert float(np.abs(a - b).max()) < 2e-5


def test_native_encoder_quality_parity_with_python():
    """Aligned SNR of native-encoded audio within 1 dB of the Python
    encoder on the same content (both decoded by libopus)."""
    from opus_tpu.celt.encoder import CeltEncoder
    from opus_tpu.native.frontend import NativeCeltEncoder, available

    if not available():
        pytest.skip("native engine not built")
    F, NF, NB = 960, 12, 240
    sig = _signal(NF, F, transient=False)
    pcm = np.stack([sig, np.roll(sig, 9) * 0.8], -1).astype(np.float32)
    toc = bytes([(31 << 3) | 0x4])

    def decode_all(payloads):
        d = oracle.Decoder(48000, 2)
        return np.concatenate(
            [np.asarray(d.decode_float(toc + p, F)).reshape(F, 2) for p in payloads]
        )

    ne = NativeCeltEncoder(2)
    pe = CeltEncoder(2)
    nat = decode_all([ne.encode(pcm[f * F : (f + 1) * F], NB) for f in range(NF)])
    py = decode_all([bytes(pe.encode(pcm[f * F : (f + 1) * F].astype(np.float64), NB))
                     for f in range(NF)])

    # Align for codec delay by maximising cross-correlation against input.
    ref = pcm.astype(np.float64)

    def aligned_snr(out):
        best = -1e9
        for d in range(0, 400):
            a = ref[: ref.shape[0] - d, 0]
            b = out[d:, 0]
            e = a - b
            s = 10 * np.log10(np.dot(a, a) / max(np.dot(e, e), 1e-12))
            best = max(best, s)
        return best

    s_nat, s_py = aligned_snr(nat), aligned_snr(py)
    assert s_nat > s_py - 1.0, (s_nat, s_py)


def test_native_encoder_batch_matches_single():
    from opus_tpu.native.frontend import (NativeCeltEncoder, NativeCeltEncoderBatch,
                                          available)

    if not available():
        pytest.skip("native engine not built")
    F, NF, NB, B = 960, 4, 120, 6
    sig = _signal(NF, F)
    pcm = np.stack([sig, np.roll(sig, 5)], -1).astype(np.float32)
    single = NativeCeltEncoder(2)
    batch = NativeCeltEncoderBatch(B, 2)
    for f in range(NF):
        fr = pcm[f * F : (f + 1) * F]
        want = single.encode(fr, NB)
        got = batch.encode_batch(np.broadcast_to(fr, (B, F, 2)), NB)
        for b in range(B):
            assert bytes(got[b]) == want
