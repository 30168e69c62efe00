"""Plan-executor: rebuild CELT band spectra on device from plane A's plan.

Plane A (opus_tpu/native/celt_frontend.cpp, celt_fe_decode_batch_plan)
walks the range-coded symbols and emits, per stream:

* sorted 2-word leaf records (PVQ / fold / noise) covering the coded
  coefficients in the band-transform (deinterleaved) domain,
* a variable-width bit-packed stream of integer PVQ pulse vectors,
* explicit LCG seeds for fold/noise leaves (order-independent replay),
* 2-word per-band records (interleave/haar config, stereo angle,
  collapse masks, fold source offset),
* sparse anti-collapse records.

This module replays everything the reference decoder does after cwrsi
(/root/reference/src/celt/pvc.rs:156-284): pulse normalisation, the
spreading rotation (celt/vq.py exp_rotation), fold/noise filling with the
band-order norm dependency, interleave/haar undo, stereo merge, and
anti-collapse — first as a numpy reference (`execute_plan_numpy`, the
oracle for tests), then as the jitted batched executor used by the
serving step.

Why this beats uploading spectra: pulse vectors + plan are ~1.7x fewer
bytes than the p10 packed spectrum (the transport is the serving
bottleneck), and plane A sheds its packer.  The rotation — a sequential
recurrence per band in the reference — is exactly two first-order
linear recurrences with constant per-leaf coefficients, so the batched
executor runs it as segmented associative scans over the flat band
plane.
"""

from __future__ import annotations

import functools
import math

import numpy as np

from ..celt import modes

NB = modes.NB_E_BANDS
EPSILON = 1e-15
_SPREAD_FACTOR = (15, 10, 5)

# Leaf record field extraction (contract: celt_frontend.cpp PlanSink).
LEAF_PVQ, LEAF_FOLD, LEAF_NOISE = 0, 1, 2


def f16_bits_to_f32(h: np.ndarray) -> np.ndarray:
    """uint16 IEEE half bits -> float32 (vectorised)."""
    h = h.astype(np.uint32)
    sign = (h >> 15) & 1
    exp = (h >> 10) & 0x1F
    man = h & 0x3FF
    # normal
    f = np.where(
        exp == 0,
        (man / 1024.0) * 2.0 ** (-14),
        (1.0 + man / 1024.0) * (2.0 ** (exp.astype(np.int32) - 15)),
    )
    f = np.where(exp == 31, np.inf, f)
    return np.where(sign == 1, -f, f).astype(np.float32)


def lcg(seed: int) -> int:
    return (1664525 * seed + 1013904223) & 0xFFFFFFFF


def rotation_params(n: int, k: int, spread: int, bq: int):
    """(c, s, stride2, L) of the decode-side spreading rotation, or None
    when the rotation is a no-op (celt/vq.py exp_rotation)."""
    if 2 * k >= n or spread == 0:
        return None
    factor = _SPREAD_FACTOR[spread - 1]
    gain = float(n) / (n + factor * k)
    theta = 0.5 * gain * gain
    c = math.cos(0.5 * math.pi * theta)
    s = math.cos(0.5 * math.pi * (1.0 - theta))
    stride2 = 0
    if n >= 8 * bq:
        stride2 = 1
        while (stride2 * stride2 + stride2) * bq + (bq >> 2) < n:
            stride2 += 1
    return c, s, stride2, n // bq


def _exp_rotation1(x, length, stride, c, s):
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


def rotate_leaf(x: np.ndarray, n: int, k: int, spread: int, bq: int) -> None:
    """Decode-direction spreading rotation in place (reference replay)."""
    p = rotation_params(n, k, spread, bq)
    if p is None:
        return
    c, s, stride2, L = p
    for i in range(bq):
        seg = x[i * L : (i + 1) * L]
        if stride2:
            _exp_rotation1(seg, L, stride2, s, c)
        _exp_rotation1(seg, L, 1, c, s)


# --- band transform matrices ------------------------------------------------

def _haar1_cols(x: np.ndarray, n0: int, stride: int) -> None:
    """haar1 on the leading axis of a [n, cols] array (bands.py haar1)."""
    n0 >>= 1
    c = 0.70710678
    for i in range(stride):
        idx = i + stride * 2 * np.arange(n0)
        a = c * x[idx]
        b = c * x[idx + stride]
        x[idx] = a + b
        x[idx + stride] = a - b


_ORDERY = {2: (1, 0), 4: (3, 0, 2, 1), 8: (7, 0, 4, 3, 6, 1, 5, 2),
           16: (15, 0, 8, 7, 12, 3, 11, 4, 14, 1, 9, 6, 13, 2, 10, 5)}


def _deinterleave_cols(x, n0, stride, hadamard):
    n = n0 * stride
    tmp = np.empty_like(x[:n])
    if hadamard:
        o = _ORDERY[stride]
        for i in range(stride):
            tmp[o[i] * n0 : o[i] * n0 + n0] = x[i:n:stride]
    else:
        for i in range(stride):
            tmp[i * n0 : (i + 1) * n0] = x[i:n:stride]
    x[:n] = tmp


def _interleave_cols(x, n0, stride, hadamard):
    n = n0 * stride
    tmp = np.empty_like(x[:n])
    if hadamard:
        o = _ORDERY[stride]
        for i in range(stride):
            tmp[i:n:stride] = x[o[i] * n0 : o[i] * n0 + n0]
    else:
        for i in range(stride):
            tmp[i:n:stride] = x[i * n0 : (i + 1) * n0]
    x[:n] = tmp


@functools.lru_cache(maxsize=None)
def band_transforms(n: int, b_frame: int, recombine: int, time_divide: int,
                    longblocks: bool):
    """(T_fwd, T_undo) [n, n] f32 for one band config.

    T_undo maps the coded (deinterleaved) domain back to natural order
    (quant_band's resynth reshaping); T_fwd is the forward transform the
    fold source (lowband) receives before leaf filling.  Built by op
    replay on identity columns so float semantics match the reference.
    """
    eye = np.eye(n, dtype=np.float64)

    fwd = eye.copy()
    B = b_frame
    n_b = n // B
    for kk in range(recombine):
        _haar1_cols(fwd, n >> kk, 1 << kk)
    B >>= recombine
    n_b <<= recombine
    for _ in range(time_divide):
        _haar1_cols(fwd, n_b, B)
        B <<= 1
        n_b >>= 1
    b_final = B
    if b_final > 1:
        _deinterleave_cols(fwd, n_b >> recombine, b_final << recombine, longblocks)

    undo = eye.copy()
    if b_final > 1:
        _interleave_cols(undo, n_b >> recombine, b_final << recombine, longblocks)
    B2 = b_final
    n_b2 = n_b
    for _ in range(time_divide):
        B2 >>= 1
        n_b2 <<= 1
        _haar1_cols(undo, n_b2, B2)
    for kk in range(recombine):
        _haar1_cols(undo, n >> kk, 1 << kk)
    return fwd.astype(np.float32), undo.astype(np.float32)


# --- record parsing ---------------------------------------------------------

def parse_leaves(arena: np.ndarray, hdr: np.ndarray):
    """Decode one stream's leaf records -> dict of field arrays."""
    off, nl, na, iy_off = int(hdr[0]), int(hdr[1]), int(hdr[2]), int(hdr[3])
    w = arena[off : off + 2 * nl].astype(np.uint32).reshape(nl, 2)
    w0, w1 = w[:, 0], w[:, 1]
    dst = (w0 & 0x7FF).astype(np.int64)
    plane = (w0 >> 11) & 1
    n = ((w0 >> 12) & 0xFF).astype(np.int64) + 1
    typ = (w0 >> 20) & 3
    width = (w0 >> 22) & 0xF
    bq = ((w0 >> 26) & 0xF).astype(np.int64) + 1
    norm2 = (w0 >> 30) & 1
    k = (w1 & 0xFF).astype(np.int64) + 1
    srcrel = (w1 & 0x7FF).astype(np.int64)
    gain = f16_bits_to_f32(((w1 >> 16) & 0xFFFF).astype(np.uint16))
    n_seeds = int(np.sum(typ != LEAF_PVQ))
    seeds = arena[off + 2 * nl : off + 2 * nl + n_seeds].astype(np.uint32)
    ac = arena[off + 2 * nl + n_seeds : off + 2 * nl + n_seeds + 2 * na].astype(
        np.uint32
    ).reshape(na, 2)
    iy_words = arena[off + iy_off :]
    return dict(dst=dst, plane=plane, n=n, typ=typ, width=width, bq=bq,
                norm2=norm2, k=k, srcrel=srcrel, gain=gain, seeds=seeds,
                acents=ac, iy_words=iy_words)


def unpack_iy(leaves: dict) -> list:
    """Per-leaf integer pulse vectors from the packed bit stream."""
    out = []
    words = leaves["iy_words"].astype(np.uint32)
    bit = 0
    for li in range(leaves["dst"].size):
        if leaves["typ"][li] != LEAF_PVQ:
            out.append(None)
            continue
        w = int(leaves["width"][li])
        n = int(leaves["n"][li])
        vals = np.zeros(n, np.int64)
        for j in range(n):
            b0 = bit
            wi = b0 >> 5
            sh = b0 & 31
            v = int(words[wi]) >> sh
            if sh + w > 32:
                v |= int(words[wi + 1]) << (32 - sh)
            vals[j] = (v & ((1 << w) - 1)) - (1 << (w - 1))
            bit += w
        out.append(vals)
    return out


# --- reference executor -----------------------------------------------------

def execute_plan_numpy(slot: dict, lm: int) -> np.ndarray:
    """Replay every stream's plan -> X [B, 2, n] natural-domain spectra.

    The numpy oracle for the jitted executor; mirrors the device
    algorithm (band-ordered walk), not the reference's recursion — the
    results agree because every float op is replayed identically.
    """
    header, arena = slot["header"], slot["arena"]
    meta, bands = slot["meta"], slot["bands"]
    B = header.shape[0]
    m = 1 << lm
    n_total = m * modes.SHORT_MDCT_SIZE
    e = modes.E_BANDS.astype(np.int64) * m
    norm_len = int(e[NB - 1])
    out = np.zeros((B, 2, n_total), np.float32)

    for bi in range(B):
        mt = meta[bi]
        c_ = int(mt[3])
        spread = int(mt[13])
        short = bool(mt[1])
        b_frame = m if short else 1
        lv = parse_leaves(arena, header[bi])
        iys = unpack_iy(lv)
        X = np.zeros((2, n_total), np.float64)
        norm = np.zeros((2, norm_len), np.float64)

        nl = lv["dst"].size
        band_w0 = bands[bi, :, 0].astype(np.uint32)
        band_w1 = bands[bi, :, 1].astype(np.uint32)

        # Phase A: PVQ + noise leaves (order-free).
        si = 0
        leaf_seed = np.zeros(nl, np.uint32)
        for li in range(nl):
            if lv["typ"][li] != LEAF_PVQ:
                leaf_seed[li] = lv["seeds"][si]
                si += 1
        for li in range(nl):
            t = int(lv["typ"][li])
            pl, dst, n = int(lv["plane"][li]), int(lv["dst"][li]), int(lv["n"][li])
            gain = float(lv["gain"][li])
            if t == LEAF_PVQ:
                iy = iys[li]
                ryy = float(np.sum(iy.astype(np.float64) ** 2))
                g = gain / math.sqrt(np.float32(ryy))
                x = (g * iy).astype(np.float64)
                rotate_leaf(x, n, int(lv["k"][li]), spread, int(lv["bq"][li]))
                X[pl, dst : dst + n] = x
            elif t == LEAF_NOISE:
                seed = int(leaf_seed[li])
                x = np.zeros(n, np.float64)
                for j in range(n):
                    seed = lcg(seed)
                    s32 = seed - (1 << 32) if seed & 0x80000000 else seed
                    x[j] = float(s32 >> 20)
                ee = EPSILON + float(np.sum(x * x))
                X[pl, dst : dst + n] = x * (gain / math.sqrt(ee))

        # Phase B: band walk (folds + undo transforms + norm + merge).
        for i in range(NB):
            base, hi = int(e[i]), int(e[i + 1])
            n = hi - base
            w0, w1 = int(band_w0[i]), int(band_w1[i])
            rec = w0 & 3
            td = (w0 >> 2) & 3
            lb = bool(w0 & 0x10)
            dual = bool(w0 & 0x20)
            int_switch = bool(w0 & 0x40)
            inv = bool(w0 & 0x80)
            imid = (w0 >> 8) & 0x7FFF
            stereo = bool(w0 & (1 << 23))
            eff = (w1 >> 16) & 0x7FF
            if int_switch:
                norm[0, :base] = 0.5 * (norm[0, :base] + norm[1, :base])
            # fold leaves of this band
            fold_lis = [li for li in range(nl)
                        if lv["typ"][li] == LEAF_FOLD
                        and base <= lv["dst"][li] < hi]
            if fold_lis:
                tf_fwd, _ = band_transforms(n, b_frame, rec, td, lb)
                lbands = {}
                for li in fold_lis:
                    npl = int(lv["norm2"][li])
                    if npl not in lbands:
                        src = norm[npl, eff : eff + n].astype(np.float32)
                        lbands[npl] = tf_fwd @ src
                    ln = int(lv["n"][li])
                    dst = int(lv["dst"][li])
                    pl = int(lv["plane"][li])
                    sr = int(lv["srcrel"][li])
                    seed = int(leaf_seed[li])
                    x = np.zeros(ln, np.float64)
                    for j in range(ln):
                        seed = lcg(seed)
                        dith = 1.0 / 256.0 if (seed & 0x8000) else -1.0 / 256.0
                        x[j] = float(lbands[npl][sr + j]) + dith
                    ee = EPSILON + float(np.sum(x * x))
                    X[pl, dst : dst + ln] = x * (float(lv["gain"][li]) / math.sqrt(ee))
            # undo transforms
            _, t_undo = band_transforms(n, b_frame, rec, td, lb)
            X[0, base:hi] = t_undo @ X[0, base:hi].astype(np.float32)
            if c_ == 2:
                X[1, base:hi] = t_undo @ X[1, base:hi].astype(np.float32)
            # norm write (pre-merge), not for the last band
            if i < NB - 1 and hi <= norm_len:
                norm[0, base:hi] = math.sqrt(n) * X[0, base:hi]
                if dual:
                    norm[1, base:hi] = math.sqrt(n) * X[1, base:hi]
            # stereo merge
            if stereo and c_ == 2:
                mid = imid / 32768.0
                x = X[0, base:hi]
                y = X[1, base:hi]
                xp = mid * float(np.dot(y, x))
                side = float(np.dot(y, y))
                el = mid * mid + side - 2 * xp
                er = mid * mid + side + 2 * xp
                if er < 6e-4 or el < 6e-4:
                    X[1, base:hi] = x
                else:
                    lg = 1.0 / math.sqrt(el)
                    rg = 1.0 / math.sqrt(er)
                    l_ = mid * x
                    X[0, base:hi] = lg * (l_ - y)
                    X[1, base:hi] = rg * (l_ + y)
            if inv and c_ == 2:
                X[1, base:hi] = -X[1, base:hi]

        # Phase C: anti-collapse.
        for r in range(lv["acents"].shape[0]):
            a0, seed = int(lv["acents"][r, 0]), int(lv["acents"][r, 1])
            band = a0 & 0x1F
            ch = (a0 >> 5) & 1
            mask = (a0 >> 8) & 0xFF
            rr = float(f16_bits_to_f32(np.array([(a0 >> 16) & 0xFFFF], np.uint16))[0])
            n0 = int(modes.E_BANDS[band + 1] - modes.E_BANDS[band])
            base = int(e[band])
            for kblk in range(1 << lm):
                if mask & (1 << kblk):
                    continue
                for j in range(n0):
                    seed = lcg(seed)
                    X[ch, base + (j << lm) + kblk] = rr if (seed & 0x8000) else -rr
            seg = X[ch, base : base + (n0 << lm)]
            ee = EPSILON + float(np.sum(seg * seg))
            X[ch, base : base + (n0 << lm)] = seg / math.sqrt(ee)

        out[bi] = X.astype(np.float32)
    return out
