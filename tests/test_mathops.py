"""Math kernel tests mirroring /root/reference/src/math.rs:160-318, including
the platform-qualification sweeps (div/sqrt/log2/exp2 precision) and the
bit-exact XOR checksums that gate allocator compatibility."""

import numpy as np

from opus_tpu.mathops import (
    bitexact_cos,
    bitexact_log2tan,
    fast_atan2,
    fast_exp2,
    fast_log2,
    ilog,
)


def test_ilog():
    assert ilog(0) == 0
    assert ilog(1) == 1
    assert ilog(2) == 2
    assert ilog(0xFFFFFFFF) == 32


def test_div_precision():
    # Platform qualification (reference math.rs:172-186), vectorised.
    i = np.arange(1, 327671, dtype=np.float32)
    prod = (np.float32(1.0) / i) * i
    assert np.max(np.abs(prod - 1.0)) <= 0.00025


def test_sqrt_precision():
    vals = []
    i = 1
    while i < 1000000000:
        vals.append(i)
        i += 1 + (i >> 10)
    k = np.array(vals, dtype=np.float32)
    val = np.sqrt(k)
    exact = np.sqrt(k.astype(np.float64))
    assert np.max(np.abs(val / exact - 1.0)) <= 0.0005
    assert np.max(np.abs(val - exact)) <= 2.0


def test_log2_precision():
    x = 0.001
    while x < 1677700.0:
        x32 = np.float32(x)
        err = abs(float(np.log2(np.float64(x32))) - float(fast_log2(x32)))
        assert err <= 0.0009, x
        x += x / 8.0


def test_exp2_log2_roundtrip():
    for x in np.arange(-11.0, 24.0, 0.007, dtype=np.float32):
        e = fast_exp2(x)
        assert abs(float(x) - float(np.log2(np.float64(e)))) <= 0.0002, x
        assert abs(float(x) - float(fast_log2(e))) <= 0.001, x


def test_bitexact_cos_checksum():
    # Golden checksums: reference math.rs:237-264 — XOR-chk 89408644.
    chk = 0
    max_d = 0
    min_d = 32767
    last = 32767
    for i in range(64, 16321):
        q = bitexact_cos(i)
        chk ^= q * i
        d = last - q
        max_d = max(max_d, d)
        min_d = min(min_d, d)
        last = q
    assert bitexact_cos(64) == 32767
    assert bitexact_cos(16320) == 200
    assert bitexact_cos(8192) == 23171
    assert chk == 89408644
    assert max_d == 5
    assert min_d == 0


def test_bitexact_log2tan_checksum():
    # Golden checksums: reference math.rs:266-298 — XOR-chk 15821257.
    chk = 0
    max_d = 0
    min_d = 15059
    last = 15059
    for i in range(64, 8193):
        mid = bitexact_cos(i)
        side = bitexact_cos(16384 - i)
        q = bitexact_log2tan(mid, side)
        assert q == -bitexact_log2tan(side, mid)
        chk ^= q * i
        d = last - q
        max_d = max(max_d, d)
        min_d = min(min_d, d)
        last = q
    assert chk == 15821257
    assert max_d == 61
    assert min_d == -2
    assert bitexact_log2tan(32767, 200) == 15059
    assert bitexact_log2tan(30274, 12540) == 2611
    assert bitexact_log2tan(23171, 23171) == 0


def test_fast_atan2_golden():
    cases = [
        (0.0, 0.0, 0.0),
        (0.3551356, 0.2844108, 0.8955373),
        (0.7484663, 0.6631728, 0.8457406),
        (0.1315983, 0.7368063, 0.1767448),
        (0.6271196, 0.2156832, 1.2395358),
        (0.9759809, 0.2178561, 1.3511757),
        (0.0372807, 0.9752686, 0.0382075),
        (0.1181177, 0.1830559, 0.5730263),
        (-0.0888729, 0.0723961, -0.887214),
        (-0.0022723, 0.1452635, -0.0156412),
        (0.0612437, -0.0035089, 1.6280283),
        (-0.0003115, -0.0028101, -3.0311935),
        (-0.0342708, 0.0005294, -1.5553488),
        (0.0031906, -0.0004747, 1.7184927),
        (0.0253257, 0.0034328, 1.436072),
    ]
    for y, x, expected in cases:
        got = float(fast_atan2(np.float32(y), np.float32(x)))
        tol = 0.0001 if (y, x) == (0.0, 0.0) else 0.00001
        assert abs(got - expected) < tol, (y, x, got)
