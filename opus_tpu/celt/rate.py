"""Bit-allocation support: the PVQ pulse cache (libopus rate.c analog).

The static cache lives in modes.py (CACHE_INDEX/CACHE_BITS/CACHE_CAPS);
:func:`compute_pulse_cache` regenerates index+bits from first principles
(CWRS codeword counts) and is pinned against the static tables in tests —
proving our V(N,K)/log2_frac implementations agree with libopus' allocator
to the bit.  compute_allocation/interp_bits2pulses follow in this module.
"""

from __future__ import annotations

import numpy as np

from .cwrs import MAX_PSEUDO, fits_in32, get_pulses, log2_frac, pvq_v
from . import modes

BITRES = 3


def get_required_bits(n: int, maxk: int, frac: int = BITRES) -> list[int]:
    """Bits (in 1/2**frac units) needed to code k pulses in n dims, for
    k = 0..maxk."""
    assert maxk > 0
    if n == 1:
        return [0] + [1 << frac] * maxk
    return [0] + [log2_frac(pvq_v(n, k), frac) for k in range(1, maxk + 1)]


def compute_pulse_cache(lm: int = modes.MAX_LM, nb_bands: int = modes.NB_E_BANDS):
    """Build (index[lm+2][nb_bands], bits[]) for every distinct half-band
    size N = width<<i>>1, deduplicating identical sizes."""
    e_bands = modes.E_BANDS
    index = np.full((lm + 2, nb_bands), -1, dtype=np.int32)
    bits: list[int] = []
    for i in range(lm + 2):
        for j in range(nb_bands):
            n = (int(e_bands[j + 1] - e_bands[j]) << i) >> 1
            # Reuse the entry of any earlier band with the same size.
            found = False
            for k in range(i + 1):
                limit = j if k == i else nb_bands
                for m in range(limit):
                    if n == (int(e_bands[m + 1] - e_bands[m]) << k) >> 1:
                        index[i][j] = index[k][m]
                        found = True
                        break
                if found:
                    break
            if not found and n != 0:
                # New size: store max pseudo-pulse count, then bit costs.
                max_pseudo = 0
                while max_pseudo < MAX_PSEUDO and fits_in32(n, get_pulses(max_pseudo + 1)):
                    max_pseudo += 1
                costs = get_required_bits(n, get_pulses(max_pseudo))
                index[i][j] = len(bits)
                bits.append(max_pseudo)
                bits.extend(costs[get_pulses(q)] - 1 for q in range(1, max_pseudo + 1))
    return index, np.array(bits, dtype=np.int32)
