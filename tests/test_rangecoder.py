"""Range coder tests.

Mirrors the reference suite (/root/reference/src/range_coder/mod.rs:119-571):
golden tell/tell_frac values, the libopus ec_test corpus (analytic entropy
5,777,073.34 bits / 497,192 range bytes), encoder/decoder tell_frac
agreement, cross-primitive compatibility, patch_initial_bits, shrink, and
Laplace round trips.
"""

import math

import numpy as np

from opus_tpu.rc import RangeDecoder, RangeEncoder, Tell
from opus_tpu.rc.laplace import decode_laplace, encode_laplace


class _Tell(Tell):
    def __init__(self, bits_total, rng):
        self.bits_total = bits_total
        self.rng = rng


def test_tell_golden():
    # Golden values: reference mod.rs:153-165.
    cases = [
        (0x100, 0x2C934200, 0xE2),
        (0xA2, 0x26B3D280, 0x84),
        (0x6A3, 0x2B79000, 0x689),
        (0x20E, 0x347D1700, 0x1F0),
        (0x39A, 0x896DA00, 0x37E),
        (0x512, 0x1E08800, 0x4F9),
        (0x136, 0x473B3F00, 0x117),
        (0x4CB, 0x1EDAD600, 0x4AE),
        (0x679, 0x11653800, 0x65C),
    ]
    for bits_total, rng, expected in cases:
        assert _Tell(bits_total, rng).tell() == expected


def test_tell_frac_golden():
    # Golden values: reference mod.rs:167-179.
    cases = [
        (0x100, 0x2C934200, 0x70D),
        (0xA2, 0x26B3D280, 0x41E),
        (0x6A3, 0x2B79000, 0x3445),
        (0x20E, 0x347D1700, 0xF7B),
        (0x39A, 0x896DA00, 0x1BF0),
        (0x512, 0x1E08800, 0x27C1),
        (0x136, 0x473B3F00, 0x8B7),
        (0x4CB, 0x1EDAD600, 0x2569),
        (0x679, 0x11653800, 0x32E0),
    ]
    for bits_total, rng, expected in cases:
        assert _Tell(bits_total, rng).tell_frac() == expected


def test_tell_limits():
    # u32 wraparound edges: reference mod.rs:181-188.
    u32max = 0xFFFFFFFF
    assert _Tell(0x18, 0x800000).tell() == 0x0
    assert _Tell(u32max, 0x800000).tell() == 0xFFFFFFE7
    assert _Tell(0x20, u32max).tell() == 0x0
    assert _Tell(u32max, u32max).tell() == 0xFFFFFFDF


def test_simple_uint_bits_corpus():
    """The libopus ec_test corpus (reference mod.rs:191-263): all uints for
    ft in 2..1024 plus all raw-bit patterns up to 15 bits, with analytic
    entropy accounting and byte-count goldens."""
    entropy = 0.0
    buf = bytearray(10 * 1024 * 1024)
    enc = RangeEncoder(buf)

    for ft in range(2, 1024):
        for i in range(ft):
            entropy += math.log(ft) * math.log2(math.e)
            enc.encode_uint(i, ft)

    for ftb in range(1, 16):
        for i in range(1 << ftb):
            entropy += ftb
            nbits = enc.tell()
            enc.encode_bits(i, ftb)
            assert enc.tell() - nbits == ftb

    nbits_frac = enc.tell_frac()
    enc.done()

    assert abs(entropy - 5777073.343410888) < 1e-9 * entropy
    assert nbits_frac / 8.0 == 5778365.00
    assert enc.range_bytes() == 497192

    dec = RangeDecoder(bytes(buf))
    for ft in range(2, 1024):
        for i in range(ft):
            assert dec.decode_uint(ft) == i
    for ftb in range(1, 16):
        for i in range(1 << ftb):
            assert dec.decode_bits(ftb) == i
    assert dec.tell_frac() == nbits_frac


def test_encoder_prefers_range_coder_data():
    # Golden: reference mod.rs:270-298 — on overflow the raw bits lose.
    buf = bytearray(2)
    enc = RangeEncoder(buf)
    enc.encode_bits(0x55, 7)
    enc.encode_uint(1, 2)
    enc.encode_uint(1, 3)
    enc.encode_uint(1, 4)
    enc.encode_uint(1, 5)
    enc.encode_uint(2, 6)
    enc.encode_uint(6, 7)
    enc.done()

    dec = RangeDecoder(bytes(buf))
    assert dec.decode_bits(7) == 0x05
    assert dec.decode_uint(2) == 1
    assert dec.decode_uint(3) == 1
    assert dec.decode_uint(4) == 1
    assert dec.decode_uint(5) == 1
    assert dec.decode_uint(6) == 2
    assert dec.decode_uint(7) == 6


def test_random_uint_roundtrip_with_tell_agreement():
    # Property law from reference mod.rs:300-377 (numpy RNG instead of WyRand).
    rng = np.random.default_rng(42)
    buf = bytearray(10000)
    for _ in range(128):
        ft = int(rng.integers(2, 1024))
        sz = int(rng.integers(128, 512))
        zeros = int(rng.integers(0, 14)) == 0
        data = np.zeros(sz, np.int64) if zeros else rng.integers(0, ft, sz)
        enc = RangeEncoder(buf)
        tells = [enc.tell_frac()]
        for v in data:
            enc.encode_uint(int(v), ft)
            tells.append(enc.tell_frac())
        if int(rng.integers(0, 2)) == 0:
            while enc.tell() % 8 != 0:
                enc.encode_uint(int(rng.integers(0, 2)), 2)
        tell_bits = enc.tell()
        enc.done()
        assert tell_bits == enc.tell()
        assert (tell_bits + 7) // 8 >= enc.range_bytes()

        dec = RangeDecoder(bytes(buf))
        assert dec.tell_frac() == tells[0]
        for j, v in enumerate(data):
            assert dec.decode_uint(ft) == int(v)
            assert dec.tell_frac() == tells[j + 1]


def test_cross_primitive_compatibility():
    """Any of the 4 binary encode primitives must be decodable by any of the
    4 decode primitives with identical tell_frac (reference mod.rs:379-495)."""
    rng = np.random.default_rng(42)
    buf = bytearray(10000)
    for _ in range(128):
        sz = int(rng.integers(128, 512))
        data = rng.integers(0, 2, sz)
        logp1 = rng.integers(1, 17, sz)
        enc_method = rng.integers(0, 4, sz)
        enc = RangeEncoder(buf)
        tells = [enc.tell_frac()]
        for j in range(sz):
            d, lp, m = int(data[j]), int(logp1[j]), int(enc_method[j])
            if m == 0:
                x = (1 << lp) - 1 if d else 0
                y = 0 if d else 1
                enc.encode(x, (1 << lp) - y, 1 << lp)
            elif m == 1:
                x = (1 << lp) - 1 if d else 0
                y = 0 if d else 1
                enc.encode_bin(x, (1 << lp) - y, lp)
            elif m == 2:
                enc.encode_bit_logp(d, lp)
            else:
                enc.encode_icdf(d, [1, 0], lp)
            tells.append(enc.tell_frac())
        enc.done()
        assert (enc.tell() + 7) // 8 >= enc.range_bytes()

        dec = RangeDecoder(bytes(buf))
        assert dec.tell_frac() == tells[0]
        for j in range(sz):
            d, lp = int(data[j]), int(logp1[j])
            m = int(rng.integers(0, 4))
            if m == 0:
                fs = dec.decode(1 << lp)
                s = fs >= (1 << lp) - 1
                x = (1 << lp) - 1 if s else 0
                y = 0 if s else 1
                sym = 1 if s else 0
                dec.update(x, (1 << lp) - y, 1 << lp)
            elif m == 1:
                fs = dec.decode_bin(lp)
                s = fs >= (1 << lp) - 1
                x = (1 << lp) - 1 if s else 0
                y = 0 if s else 1
                sym = 1 if s else 0
                dec.update(x, (1 << lp) - y, 1 << lp)
            elif m == 2:
                sym = 1 if dec.decode_bit_logp(lp) else 0
            else:
                sym = dec.decode_icdf([1, 0], lp)
            assert sym == d, (j, m)
            assert dec.tell_frac() == tells[j + 1]


def test_patch_initial_bits():
    # Golden: reference mod.rs:497-516 — first byte must become 63.
    buf = bytearray(10000)
    enc = RangeEncoder(buf)
    enc.encode_bit_logp(0, 1)
    enc.encode_bit_logp(0, 1)
    enc.encode_bit_logp(1, 6)
    enc.encode_bit_logp(0, 2)
    enc.patch_initial_bits(0, 2)
    enc.done()
    assert enc.range_bytes() == 2
    assert buf[0] == 63


def test_shrink():
    buf = bytearray(10000)
    enc = RangeEncoder(buf)
    for v in (1, 2, 3, 4):
        enc.encode_uint(v, 255)
    enc.done()
    enc.shrink(5)
    # Shrunk stream must still decode.
    dec = RangeDecoder(enc.data())
    for v in (1, 2, 3, 4):
        assert dec.decode_uint(255) == v


def _start_freq(decay: int) -> int:
    ft = 32768 - 33
    return (ft * (16384 - decay)) // (16384 + decay) + 1


def test_laplace_roundtrip():
    # Reference mod.rs:536-570: 10k seeded values incl. fixed leading cases.
    rng = np.random.default_rng(42)
    n = 10000
    vals = (rng.integers(0, 16, n) - 7).astype(np.int64)
    decays = rng.integers(5000, 16000, n).astype(np.int64)
    vals[0], vals[1], vals[2] = 3, 0, -1
    decays[0], decays[1], decays[2] = 6000, 5800, 5600

    buf = bytearray(40000)
    enc = RangeEncoder(buf)
    coded = []
    for i in range(n):
        coded.append(encode_laplace(enc, int(vals[i]), _start_freq(int(decays[i])), int(decays[i])))
    enc.done()

    dec = RangeDecoder(bytes(buf))
    for i in range(n):
        got = decode_laplace(dec, _start_freq(int(decays[i])), int(decays[i]))
        assert got == coded[i], i


def test_final_range_matches_between_encoder_and_decoder():
    """Encoder and decoder must agree on the final range state — the
    final_range contract used as a cross-implementation checksum
    (reference decoder.rs:116-123)."""
    rng = np.random.default_rng(7)
    buf = bytearray(1000)
    for _ in range(64):
        enc = RangeEncoder(buf)
        syms = rng.integers(0, 100, int(rng.integers(10, 100)))
        for v in syms:
            enc.encode_uint(int(v), 100)
        rng_before_done = enc.range()
        enc.done()
        dec = RangeDecoder(bytes(buf))
        for v in syms:
            assert dec.decode_uint(100) == int(v)
        assert dec.range() == rng_before_done
