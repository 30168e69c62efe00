"""PVQ band-shape (un)quantisation: spreading rotation, normalisation
(RFC 6716 sec. 4.3.4; fills the reference stub celt/decoder.rs via libopus
vq.c semantics).

Float build: all gains/rotations in float32-compatible math.  Decode-side
float values never influence the bitstream, so numpy float64 intermediates
are safe; outputs are float32.
"""

from __future__ import annotations

import math

import numpy as np

from .cwrs import decode_pulses, encode_pulses

SPREAD_NONE = 0
SPREAD_LIGHT = 1
SPREAD_NORMAL = 2
SPREAD_AGGRESSIVE = 3

_SPREAD_FACTOR = (15, 10, 5)
EPSILON = 1e-15


def _exp_rotation1(x: np.ndarray, length: int, stride: int, c: float, s: float) -> None:
    """One pass of the Givens-rotation network used for spreading."""
    ms = -s
    for i in range(length - stride):
        x1 = x[i]
        x2 = x[i + stride]
        x[i + stride] = c * x2 + s * x1
        x[i] = c * x1 + ms * x2
    for i in range(length - 2 * stride - 1, -1, -1):
        x1 = x[i]
        x2 = x[i + stride]
        x[i + stride] = c * x2 + s * x1
        x[i] = c * x1 + ms * x2


def exp_rotation(x: np.ndarray, length: int, direction: int, stride: int, k: int, spread: int) -> None:
    """Spreading rotation (direction=-1 decodes/undoes, +1 encodes)."""
    if 2 * k >= length or spread == SPREAD_NONE:
        return
    factor = _SPREAD_FACTOR[spread - 1]
    gain = length / (length + factor * k)
    theta = 0.5 * gain * gain
    c = math.cos(0.5 * math.pi * theta)
    s = math.cos(0.5 * math.pi * (1.0 - theta))  # == sin(pi/2 * theta)

    stride2 = 0
    if length >= 8 * stride:
        # sqrt(len/stride) with rounding, computed incrementally.
        stride2 = 1
        while (stride2 * stride2 + stride2) * stride + (stride >> 2) < length:
            stride2 += 1

    length //= stride
    for i in range(stride):
        seg = x[i * length : (i + 1) * length]
        if direction < 0:
            if stride2:
                _exp_rotation1(seg, length, stride2, s, c)
            _exp_rotation1(seg, length, 1, c, s)
        else:
            _exp_rotation1(seg, length, 1, c, -s)
            if stride2:
                _exp_rotation1(seg, length, stride2, s, -c)


def extract_collapse_mask(iy: np.ndarray, n: int, b: int) -> int:
    """Which of the B interleaved short blocks received any pulse."""
    if b <= 1:
        return 1
    n0 = n // b
    mask = 0
    for i in range(b):
        if np.any(iy[i * n0 : (i + 1) * n0]):
            mask |= 1 << i
    return mask


def normalise_residual(iy: np.ndarray, x: np.ndarray, n: int, ryy: int, gain: float) -> None:
    g = gain / math.sqrt(ryy)
    x[:n] = (g * iy[:n]).astype(x.dtype)


def renormalise_vector(x: np.ndarray, n: int, gain: float) -> None:
    e = EPSILON + float(np.sum(x[:n].astype(np.float64) ** 2))
    g = gain / math.sqrt(e)
    x[:n] = (g * x[:n]).astype(x.dtype)


def alg_unquant(x: np.ndarray, n: int, k: int, spread: int, b: int, dec, gain: float) -> int:
    """Decode one PVQ shape into x[:n]; returns the collapse mask."""
    assert k > 0 and n > 1
    iy, ryy = decode_pulses(dec, n, k)
    normalise_residual(iy, x, n, ryy, gain)
    exp_rotation(x, n, -1, b, k, spread)
    return extract_collapse_mask(iy, n, b)


def op_pvq_search(x: np.ndarray, n: int, k: int) -> tuple[np.ndarray, float]:
    """Greedy-projection PVQ search (libopus op_pvq_search_c): find the
    pulse vector iy maximising correlation with x."""
    # Negative handling: search on |x|, restore signs at the end.
    signs = np.sign(x[:n])
    signs[signs == 0] = 1
    ax = np.abs(x[:n]).astype(np.float64)
    iy = np.zeros(n, dtype=np.int64)
    # Projection prefill when K is large.
    pulses_left = k
    if k > (n >> 1):
        sum_ = float(np.sum(ax))
        if not (sum_ > EPSILON and sum_ < 64):
            ax[0] = 1.0
            ax[1:] = 0.0
            sum_ = 1.0
        rcp = (k + 0.8) / sum_
        iy = np.floor(rcp * ax).astype(np.int64)
        pulses_left = k - int(np.sum(iy))
    xy = float(np.dot(ax, iy))
    yy = float(np.dot(iy, iy))
    # Greedy: add one pulse at a time where it helps the most.
    for _ in range(pulses_left):
        yy += 1.0
        num = (xy + ax) ** 2
        den = yy + 2.0 * iy
        best = int(np.argmax(num / den))
        xy += ax[best]
        yy += 2.0 * iy[best]
        iy[best] += 1
    return (signs * iy).astype(np.int32), yy


def alg_quant(x: np.ndarray, n: int, k: int, spread: int, b: int, enc, gain: float, resynth: bool) -> int:
    """Encode one PVQ shape from x[:n] (normalised); optionally resynthesise."""
    assert k > 0 and n > 1
    exp_rotation(x, n, 1, b, k, spread)
    iy, yy = op_pvq_search(x, n, k)
    encode_pulses(enc, iy)
    if resynth:
        normalise_residual(iy, x, n, int(np.sum(iy.astype(np.int64) ** 2)), gain)
        exp_rotation(x, n, -1, b, k, spread)
    return extract_collapse_mask(iy, n, b)
