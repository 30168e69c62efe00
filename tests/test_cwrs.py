"""CWRS/PVQ and mode-table tests.

Mirrors /root/reference/src/celt/pvc.rs:430-504 (V(N,K) spot values,
strided index<->vector round trips) and pins the regenerated pulse cache
and MDCT window against the reference's static mode tables (mode.rs)."""

import numpy as np

from opus_tpu.celt import modes
from opus_tpu.celt.cwrs import cwrsi, get_pulses, icwrs, pvq_u, pvq_v
from opus_tpu.celt.rate import compute_pulse_cache


def test_pvq_v_golden():
    # Golden spot values: reference pvc.rs:438-451.
    assert pvq_v(2, 1) == 4
    assert pvq_v(2, 2) == 8
    assert pvq_v(2, 3) == 12
    assert pvq_v(2, 4) == 16
    assert pvq_v(2, 10) == 40
    assert pvq_v(2, 15) == 60
    assert pvq_v(4, 24) == 36992
    assert pvq_v(4, 120) == 4608640
    assert pvq_v(6, 10) == 58728
    assert pvq_v(176, 3) == 7269152
    assert pvq_v(176, 4) == 639716352


def test_pvq_u_symmetry():
    for n in (2, 3, 7, 15):
        for k in (1, 2, 9, 31):
            assert pvq_u(n, k) == pvq_u(k, n)


def test_cwrs_roundtrip_all_band_sizes():
    # Strided enumeration over every CELT band size (reference pvc.rs:459-504,
    # with a coarser stride to keep pure-Python runtime sane).
    pn = [2, 3, 4, 6, 8, 9, 11, 12, 16, 18, 22, 24, 32, 36, 44, 48, 64, 72, 88, 96, 144, 176]
    pk_max = [128, 128, 128, 88, 36, 26, 18, 16, 12, 11, 9, 9, 7, 7, 6, 6, 5, 5, 5, 5, 4, 4]
    for n, kmax in zip(pn, pk_max):
        for pseudo in range(1, 41):
            k = get_pulses(pseudo)
            if k > kmax:
                break
            nc = pvq_v(n, k)
            inc = max(nc // 500, 1)
            for i in range(0, nc, inc):
                y = cwrsi(n, k, i)
                assert int(np.sum(np.abs(y))) == k, (n, k, i)
                assert icwrs(y) == i, (n, k, i)
            # Edges matter most: check the last index too.
            y = cwrsi(n, k, nc - 1)
            assert icwrs(y) == nc - 1


def test_pulse_cache_regeneration_matches_reference_tables():
    """compute_pulse_cache from first principles must reproduce the static
    libopus-derived tables bit-for-bit (mode.rs:70-99) — this pins V(N,K),
    log2_frac rounding, fits_in32 and the dedup walk all at once."""
    index, bits = compute_pulse_cache()
    np.testing.assert_array_equal(index, modes.CACHE_INDEX)
    np.testing.assert_array_equal(bits, modes.CACHE_BITS)


def test_window_matches_reference_literal():
    # Reference mode.rs:43-68 literal, spot values across the table.
    golden = {
        0: 6.7286966e-05,
        1: 0.00060551348,
        10: 0.029483315,
        30: 0.23513243,
        60: 0.71433873,
        100: 0.99499004,
        118: 0.99999982,
        119: 1.0000000,
    }
    for i, v in golden.items():
        assert abs(float(modes.WINDOW[i]) - v) <= 2e-7, i
    assert modes.WINDOW.dtype == np.float32
    assert np.all(np.diff(modes.WINDOW.astype(np.float64)) >= 0)


def test_band_bins():
    assert modes.band_bins(0)[-1] == 100
    assert modes.band_bins(3)[-1] == 800
    assert modes.E_BANDS.shape == (22,)
    assert modes.ALLOC_VECTORS.shape == (11, 21)
