"""Plan-executor: rebuild CELT band spectra on device from plane A's plan.

Plane A (opus_tpu/native/celt_frontend.cpp, celt_fe_decode_batch_plan)
walks the range-coded symbols and emits, per stream:

* one-word PVQ leaf records (v4: no dst/plane — derived from the tiling
  invariant — and no K — derived as sum(|iy|)) + a variable-width
  bit-packed stream of integer PVQ pulse vectors, sorted by position in
  the band-transform (deinterleaved) domain,
* 3-word fill (fold/noise) leaf records with explicit LCG seeds
  (order-independent replay),
* per-band records (interleave/haar config, stereo angle, fold source
  offset) packed as 21 config words + a 21x11-bit eff-field stream,
* sparse anti-collapse records.

This module replays everything the reference decoder does after cwrsi
(/root/reference/src/celt/pvc.rs:156-284): pulse normalisation, the
spreading rotation (celt/vq.py exp_rotation), fold/noise filling with the
band-order norm dependency, interleave/haar undo, stereo merge, and
anti-collapse — first as a numpy reference (`execute_plan_numpy`, the
oracle for tests), then as the jitted batched executor used by the
serving step.

Why this beats uploading spectra: pulse vectors + plan are ~2.3x fewer
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
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..celt import modes

NB = modes.NB_E_BANDS
EPSILON = 1e-15

#: iy bit-stream fetch window, in u32 words per stream.  Real content
#: peaks ~141 words at 128 kbps stereo (see docs/DEVICE_PROFILE.md);
#: plane A rejects plans whose iy span exceeds PLAN_IYW - 1 (the
#: executor may touch one word past the last started one) and the serve
#: loops fall back to a spectral step for that frame.
PLAN_IYW = 192
_SPREAD_FACTOR = (15, 10, 5)

#: Arena window fetch strategy: "blockrow" (block-row take + row-uniform
#: barrels; 3-5x faster on TPU, tools/tpu_barrelbench.py 2026-08-20) or
#: "gather" (one merged element gather; kept for A/B and as the reference
#: formulation).  Read once at import; set OPUS_TPU_LEAVES_FETCH to
#: override.
_LEAVES_FETCH = os.environ.get("OPUS_TPU_LEAVES_FETCH", "blockrow").strip().lower()
if _LEAVES_FETCH not in ("gather", "blockrow"):
    raise ValueError(
        f"OPUS_TPU_LEAVES_FETCH={_LEAVES_FETCH!r}: must be 'gather' or 'blockrow'"
    )

# Merged-view leaf types (oracle; the wire format splits the tables).
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


# --- record parsing (numpy oracle side) -------------------------------------

def parse_leaves(arena: np.ndarray, hdr: np.ndarray, n_total: int,
                 e_s: int, e_e: int):
    """Decode one stream's leaf tables -> merged dict of field arrays.

    hdr is the 4-word staging header {off, n_pvq|n_fill<<9|n_ac<<18,
    n_ac, iy_rel}.  The merged view (pvq leaves first, then fills)
    carries per-leaf seeds explicitly.  v4: pvq records are one u32
    word and carry neither dst/plane (derived from the tiling
    invariant, which needs the frame geometry: n_total = bins per
    plane, e_s/e_e = coded span bounds in bins) nor K (derived as
    sum(|iy|) after the pulse unpack)."""
    off, counts, iy_off = int(hdr[0]), int(hdr[1]), int(hdr[3])
    np_, nf = counts & 0x1FF, (counts >> 9) & 0x1FF
    na = counts >> 18
    words = arena[off:].astype(np.uint32)
    nl = np_ + nf
    dst = np.zeros(nl, np.int64)
    plane = np.zeros(nl, np.int64)
    n = np.zeros(nl, np.int64)
    typ = np.zeros(nl, np.int64)
    width = np.zeros(nl, np.int64)
    bq = np.ones(nl, np.int64)
    norm2 = np.zeros(nl, np.int64)
    srcrel = np.zeros(nl, np.int64)
    gain = np.zeros(nl, np.float32)
    seeds = np.zeros(nl, np.uint32)
    pb = np.zeros(nf, np.int64)
    for i in range(np_):
        v = int(words[i])
        n[i] = (v & 0xFF) + 1
        width[i] = (v >> 8) & 0xF  # 0 = zero partition
        bq[i] = ((v >> 12) & 0xF) + 1
        gain[i] = f16_bits_to_f32(np.array([(v >> 16) & 0xFFFF], np.uint16))[0]
        typ[i] = LEAF_PVQ
    pvq_words = np_
    for j in range(nf):
        w0 = int(words[pvq_words + 3 * j])
        w1 = int(words[pvq_words + 3 * j + 1])
        i = np_ + j
        dst[i] = w0 & 0x7FF
        plane[i] = (w0 >> 11) & 1
        n[i] = ((w0 >> 12) & 0xFF) + 1
        typ[i] = LEAF_NOISE if (w0 >> 20) & 1 else LEAF_FOLD
        norm2[i] = (w0 >> 21) & 1
        pb[j] = (w0 >> 22) & 0x1FF
        srcrel[i] = w1 & 0x7FF
        gain[i] = f16_bits_to_f32(np.array([(w1 >> 16) & 0xFFFF], np.uint16))[0]
        seeds[i] = np.uint32(words[pvq_words + 3 * j + 2])
    # Derive pvq dst/plane: exclusive length prefix + fills sorted before
    # (pvq_before), mapped through the two-segment coded-span layout.
    if np_:
        fl = n[np_:nl]
        excl = np.cumsum(n[:np_]) - n[:np_]
        fb = ((pb[None, :] <= np.arange(np_)[:, None]) * fl[None, :]).sum(axis=1)
        r = excl + fb
        L0 = e_e - e_s
        flat = np.where(r < L0, e_s + r, n_total + e_s + (r - L0))
        plane[:np_] = flat >= n_total
        dst[:np_] = flat - plane[:np_] * n_total
    ac = words[pvq_words + 3 * nf : pvq_words + 3 * nf + 2 * na].reshape(na, 2)
    iy_words = words[iy_off:]
    return dict(dst=dst, plane=plane, n=n, typ=typ, width=width, bq=bq,
                norm2=norm2, srcrel=srcrel, gain=gain, seeds=seeds,
                acents=ac, iy_words=iy_words, n_pvq=np_)


def unpack_iy(leaves: dict) -> list:
    """Per-leaf integer pulse vectors from the packed bit stream."""
    out = []
    words = leaves["iy_words"].astype(np.uint32)
    bit = 0
    for li in range(leaves["dst"].size):
        if leaves["typ"][li] != LEAF_PVQ or leaves["width"][li] == 0:
            out.append(None)  # fill leaf or zero partition: no iy bits
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
    Reads the STAGING header/meta/bands (full-precision host arrays)."""
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
        hyb = int(mt[4]) == 17  # hybrid: eff offsets are e[17]-relative
        e_s = int(e[17]) if hyb else 0
        e_e = int(e[min(max(int(mt[5]), 0), NB)])
        lv = parse_leaves(arena, header[bi], n_total, e_s, e_e)
        iys = unpack_iy(lv)
        X = np.zeros((2, n_total), np.float64)
        norm = np.zeros((2, norm_len), np.float64)

        nl = lv["dst"].size
        band_w0 = bands[bi, :, 0].astype(np.uint32)
        band_w1 = bands[bi, :, 1].astype(np.uint32)

        # Phase A: PVQ + noise leaves (order-free).
        leaf_seed = lv["seeds"]
        for li in range(nl):
            t = int(lv["typ"][li])
            pl, dst, n = int(lv["plane"][li]), int(lv["dst"][li]), int(lv["n"][li])
            gain = float(lv["gain"][li])
            if t == LEAF_PVQ:
                if int(lv["width"][li]) == 0:
                    continue  # zero partition: X stays 0
                iy = iys[li]
                ryy = float(np.sum(iy.astype(np.float64) ** 2))
                g = gain / math.sqrt(np.float32(ryy))
                x = (g * iy).astype(np.float64)
                # v4: K is not on the wire — derive it from the pulses.
                rotate_leaf(x, n, int(np.abs(iy).sum()), spread,
                            int(lv["bq"][li]))
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
            if hyb:
                if eff != 0x7FF:
                    eff += int(e[17])
                if i == 18:
                    # special_hybrid_folding (bands.py:605), absolute form
                    n1h = int(e[18] - e[17])
                    n2h = int(e[19] - e[18])
                    a0 = int(e[17]) + 2 * n1h - n2h
                    b0, b1 = int(e[17]) + n1h, int(e[17]) + n2h
                    norm[0, b0:b1] = norm[0, a0 : a0 + (b1 - b0)]
                    if bool(int(band_w0[17]) & 0x20):  # dual at band 17
                        norm[1, b0:b1] = norm[1, a0 : a0 + (b1 - b0)]
            if int_switch:
                norm[0, :base] = 0.5 * (norm[0, :base] + norm[1, :base])
            # fold leaves of this band
            fold_lis = [li for li in range(nl)
                        if lv["typ"][li] == LEAF_FOLD
                        and base <= lv["dst"][li] < hi]
            b_frame = 1 if lb else m
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


# --- jitted batched executor ------------------------------------------------
#
# The device algorithm mirrors execute_plan_numpy, vectorised over the
# batch with static shapes:
#
# * pvq/fill/acent records gather from the flat arena with per-stream
#   offsets (one XLA gather each);
# * per-position parameter planes come from ONE scatter of leaf starts +
#   a cumsum per table (leaves arrive position-sorted from plane A),
#   then take_along_axis by leaf id;
# * the spreading rotation's four sequential passes run as segmented
#   first-order associative scans over the flat [B, 2N] plane — the
#   stride2 pass through a closed-form chain permutation gather;
# * the band walk (fold sources, interleave/haar undo, stereo merge,
#   norm emission) is a 21-iteration trace-time loop of masked ops, with
#   the per-band orthogonal transform selected among the reachable
#   (recombine, time_divide, longblocks) configs by masked matmuls;
# * anti-collapse is one vectorised pass (double-and-add LCG jumps) plus
#   band-one-hot broadcast/renormalisation matmuls;
# * NO scatters and no table gathers anywhere: XLA:TPU lowers scatters
#   to serial while-loops and gathers to slow per-element fetches, so
#   position maps and record accumulation are compare-reduces and the
#   LCG jump tables are replaced by eleven fused u32 multiplies.

#: Bound on LCG jump distances appearing in any leaf/anti-collapse replay.
_LCG_MAX = 1600


@functools.lru_cache(maxsize=None)
def _lcg_pow2() -> tuple[tuple[int, ...], tuple[int, ...]]:
    """(a_k, c_k) of the 2^k-step LCG jump, k = 0..10 (covers _LCG_MAX)."""
    a, c = 1664525, 1013904223
    aa, cc = [], []
    for _ in range(11):
        aa.append(a)
        cc.append(c)
        c = ((a + 1) * c) & 0xFFFFFFFF
        a = (a * a) & 0xFFFFFFFF
    return tuple(aa), tuple(cc)


def _lcg_jump_j(t):
    """seed-after-t-steps coefficients (A, C) as uint32 arrays: the jump
    seed = A*seed0 + C (mod 2^32), computed by double-and-add instead of
    a table gather — TPU gathers serialize, eleven fused u32 multiplies
    do not.  t int32 in [0, 2048)."""
    aa, cc = _lcg_pow2()
    A = jnp.full(t.shape, 1, jnp.uint32)
    C = jnp.zeros(t.shape, jnp.uint32)
    for k in range(11):
        bit = ((t >> k) & 1) == 1
        A = jnp.where(bit, jnp.uint32(aa[k]) * A, A)
        C = jnp.where(bit, jnp.uint32(aa[k]) * C + jnp.uint32(cc[k]), C)
    return A, C


#: Reachable (recombine, time_divide) pairs by longblocks, per lm, from
#: TF_SELECT_TABLE (celt_tables.h): long frames only shrink (td>0), short
#: frames recombine (rec>0) or shrink once.
_TF_CFGS = {
    0: {True: [(0, 0), (0, 1)], False: []},
    1: {True: [(0, 0), (0, 1), (0, 2)], False: [(0, 0), (1, 0), (0, 1)]},
    2: {True: [(0, 0), (0, 2), (0, 3)], False: [(0, 0), (1, 0), (2, 0), (0, 1)]},
    3: {True: [(0, 0), (0, 2), (0, 3)], False: [(0, 0), (1, 0), (3, 0), (0, 1)]},
}


def _valid_cfg(n: int, b_frame: int, rec: int, td: int) -> bool:
    if b_frame >> rec < 1:
        return False
    n_b = (n // b_frame) << rec
    for _ in range(td):
        if n_b & 1:
            return False
        n_b >>= 1
    return True


def make_plan_executor(lm: int, batch: int, p_max: int = 224, f_max: int = 64,
                       a_max: int = 42, stop_after: str | None = None,
                       iyw: int = PLAN_IYW, leaves_fetch: str | None = None):
    """Build the jitted plan executor for one frame shape.

    Returns f(header[B,2] i32, bands[B,24] i32, meta[B,16] i32,
    arena[AW] i32) -> X [B, 2, N] f32 natural-domain band spectra.
    header = {arena off, n_pvq|n_fill<<9|n_ac<<18} (iy_rel is derived
    from the counts, v4.1); bands = 16 words of 21x24-bit config
    fields + 8 words of 21x11-bit eff fields (frontend.py
    pack_plan_fixed).

    stop_after (profiling only, tools/tpu_exec_bisect.py): one of
    "leaves", "posmap", "iy", "norm", "noise", "rot", "bands" — the
    executor returns a digest scalar right after that stage, with every
    prior intermediate summed in so nothing is dead-code-eliminated.

    p_max / f_max / iyw are the SIZE CLASS: every leaf-table gather,
    interval-mask build, and field einsum scales linearly with them, so
    the serve loop compiles a small-class variant and picks per step
    from the slot's actual maxima (batch/pipeline.py PLAN_CLASSES) —
    worst-case capacity (224/64/192) costs ~2x the gathered elements
    and einsum FLOPs of what 96 kbps content needs (105/3/114 measured).
    iyw must be a multiple of 16 (the chunked one-hot fetch works in
    16-word windows)."""
    assert iyw % 16 == 0 and iyw <= PLAN_IYW
    if leaves_fetch is None:
        leaves_fetch = _LEAVES_FETCH
    assert leaves_fetch in ("gather", "blockrow"), leaves_fetch
    m = 1 << lm
    n = m * modes.SHORT_MDCT_SIZE
    e = (modes.E_BANDS.astype(np.int64) * m).astype(np.int32)
    norm_len = int(e[NB - 1])
    n2 = 2 * n

    # Transform matrices for every reachable config, per band.
    cfgs = []  # (rec, td, lb) global list; identity (0,0,True) excluded
    for lb in (True, False):
        for rec, td in _TF_CFGS[lm][lb]:
            if (rec, td, lb) != (0, 0, True):
                cfgs.append((rec, td, lb))
    t_und = {}  # (band, cfgidx) -> [n_i, n_i]
    t_fwd = {}
    for bi in range(NB):
        nb_ = int(e[bi + 1] - e[bi])
        for ci, (rec, td, lb) in enumerate(cfgs):
            bf = 1 if lb else m
            if not _valid_cfg(nb_, bf, rec, td):
                continue
            fw, un = band_transforms(nb_, bf, rec, td, lb)
            t_fwd[(bi, ci)] = jnp.asarray(fw)
            t_und[(bi, ci)] = jnp.asarray(un)

    band_onehot = np.zeros((NB, n), np.float32)
    for bi in range(NB):
        band_onehot[bi, int(e[bi]) : int(e[bi + 1])] = 1.0
    band_onehot_j = jnp.asarray(band_onehot)

    def _seg_scan(a, b):
        # Inclusive scan of v[t] = a[t]*v[t-1] + b[t] as Hillis-Steele
        # over the linear-function monoid.  Chains never exceed the
        # widest band (176 samples at any LM) and a==0 at every chain
        # head, so 8 doubling levels (span 256) suffice — vs the ~22
        # strided passes lax.associative_scan emits for the full axis.
        A, Bv = a, b
        span = 1
        while span < 256:
            Ash = jnp.pad(A, ((0, 0), (span, 0)), constant_values=1.0)[:, :-span]
            Bsh = jnp.pad(Bv, ((0, 0), (span, 0)))[:, :-span]
            A, Bv = A * Ash, A * Bsh + Bv
            span *= 2
        return Bv

    # Fused Pallas rotation pass (dsp/pallas_rot.py): one VMEM-resident
    # kernel instead of ~32 XLA memory passes per _rot_pass.  MEASURED
    # NOT-FASTER on TPU (tools/tpu_rotbench.py 2026-08-20: bit-exact,
    # max_abs 0.0, but full executor 33.7 -> 51.8 ms at cls112 /
    # 29.1 -> 35.9 ms at full cap under a contended window) — XLA's
    # fused elementwise ladders already amortize the HBM passes here,
    # and the kernel pays 32 sequential tiny grid steps.  Default OFF;
    # OPUS_TPU_PALLAS_ROT=1 opts in for future A/Bs.
    use_pallas_rot = os.environ.get("OPUS_TPU_PALLAS_ROT", "") == "1"

    def _rot_pass(x, cc, ss, k_pos, m_pos):
        """One exp_rotation1 pass over contiguous chains in x [B, n2].

        cc/ss: per-position pass coefficients; k_pos: index within chain;
        m_pos: chain length (1 = identity)."""
        if use_pallas_rot:
            from .pallas_rot import pallas_rot_pass

            return pallas_rot_pass(x, cc, ss, k_pos, m_pos)
        first = k_pos == 0
        last = k_pos == m_pos - 1
        a = jnp.where(first, 0.0, ss)
        b = jnp.where(first, x, cc * x)
        v = _seg_scan(a, b)
        x_next = jnp.roll(x, -1, axis=-1)
        y = jnp.where(last, v, cc * v - ss * x_next)
        # backward pass (only chains of length >= 3)
        yr = jnp.flip(y, axis=-1)
        kr = jnp.flip(m_pos - 1 - k_pos, axis=-1)  # chain pos in reversed orient.
        mr = jnp.flip(m_pos, axis=-1)
        ccr = jnp.flip(cc, axis=-1)
        ssr = jnp.flip(ss, axis=-1)
        # reversed-orientation chain position r: r==0 is natural k==m-1.
        ar = jnp.where((kr == 0) | (kr == 1), 0.0, -ssr)
        br = jnp.where(kr == 0, yr, jnp.where(kr == 1, yr, ccr * yr))
        zr = _seg_scan(ar, br)
        z = jnp.flip(zr, axis=-1)
        y_prev = jnp.roll(y, 1, axis=-1)
        f = jnp.where(
            k_pos == 0, z,
            jnp.where(k_pos == m_pos - 1, y, cc * z + ss * y_prev),
        )
        return jnp.where(m_pos < 3, y, f)

    def executor(header, bands, meta, arena_i32):
        B = batch
        arena = jax.lax.bitcast_convert_type(arena_i32, jnp.uint32)
        hdr_off = header[:, 0]
        counts = header[:, 1]
        # v4.1: iy_rel is not on the wire — the arena layout is
        # [pvq 1w][fill 3w][ac 2w][iy], all counts-derived.
        n_pvq = counts & 0x1FF
        n_fill = (counts >> 9) & 0x1FF
        n_acents = counts >> 18
        iy_rel = n_pvq + 3 * n_fill + 2 * n_acents
        spread = meta[:, 13]
        c2 = meta[:, 3] == 2  # frame coded stereo
        pos = jnp.arange(n2)[None, :]
        amax = arena.shape[0] - 1

        # ---- merged arena window fetch (all four leaf tables) ----
        # The four per-stream window reads (pvq records, fill records,
        # anti-collapse records, iy words) each paid a flat ~1 ms of TPU
        # gather-call latency on top of their element cost.  Every start
        # offset is header-affine, so ONE fetch covers all four windows
        # at once; the tables are then static column slices.
        # Rows read past a stream's records into neighbours' data; every
        # downstream use is masked by `valid` / flatdst>=n2, and the f16
        # gain is zeroed explicitly (garbage halfwords can decode to NaN).
        pvq_words = n_pvq  # one u32 per record (v4)
        fill_off = hdr_off + pvq_words
        ac_off = fill_off + 3 * n_fill
        s0 = p_max
        s1 = s0 + 3 * f_max
        s2 = s1 + 2 * a_max
        W = s2 + iyw
        if leaves_fetch == "gather":
            # element gather: ~18 ms/M elements flat on TPU (kept for A/B)
            iy_w0 = hdr_off + iy_rel
            idx = jnp.concatenate(
                [st[:, None] + jnp.arange(w)[None, :]
                 for st, w in ((hdr_off, s0), (fill_off, 3 * f_max),
                               (ac_off, 2 * a_max), (iy_w0, iyw))],
                axis=1,
            )
            merged = jnp.take(arena, jnp.clip(idx, 0, amax))
        else:
            # block-row take + row-UNIFORM barrels (tools/tpu_barrelbench:
            # 1.4 ms vs 4.6-7.6 ms for the element gather at B=1024).
            # Every per-stream start is a scalar, so each window fetch has
            # row-uniform shift structure: take NROWS contiguous 256-word
            # arena rows covering [hdr_off & ~255, hdr_off + W), then
            # align each table with a barrel of rolls whose select bit is
            # constant along the row (the composition is exact; per-
            # POSITION shifts would not compose this way).  Columns past
            # a stream's content wrap block-start garbage — masked
            # downstream exactly like the gather's neighbour reads.
            nrows = (255 + W + 255) // 256
            nblk = (arena.shape[0] + 255) // 256
            pad_a = jnp.pad(arena, (0, nblk * 256 - arena.shape[0]))
            a2 = pad_a.reshape(nblk, 256)
            blk0 = jnp.clip(hdr_off >> 8, 0, nblk - 1)
            rows4 = jnp.take(
                a2, jnp.clip(blk0[:, None] + jnp.arange(nrows)[None, :],
                             0, nblk - 1), axis=0)
            xw = rows4.reshape(B, nrows * 256)

            def _barrel(x, s, smax):
                for k in range(max(int(smax).bit_length(), 1)):
                    bit = ((s >> k) & 1) == 1
                    x = jnp.where(bit[:, None], jnp.roll(x, -(1 << k), axis=1), x)
                return x

            # PRECONDITION (barrel == gather equivalence): each shift must
            # fit its declared max — pvq_words <= s0, 3*n_fill <=
            # 3*f_max, iy_rel <= s2 — or high shift bits are silently
            # dropped and the modes produce DIFFERENTLY-wrong tables.
            # Guaranteed today by the native capacity guard + the serve
            # loop's class-fit pick (_plan_size_class); a sub-capacity
            # executor built without that check is out of contract.
            base = _barrel(xw, hdr_off & 255, 255)
            fill_x = _barrel(base, pvq_words, s0)
            ac_x = _barrel(fill_x, 3 * n_fill, 3 * f_max)
            iy_x = _barrel(base, iy_rel, s2)
            merged = jnp.concatenate(
                [base[:, :s0], fill_x[:, :3 * f_max],
                 ac_x[:, :2 * a_max], iy_x[:, :iyw]], axis=1)

        # ---- pvq leaf table [B, P] (one-word records, v4) ----
        # dst/plane are NOT on the wire (derived below from the tiling
        # invariant) and neither is K (derived as sum(|iy|) after the
        # pulse unpack — see the rotation-parameter block there).
        p = jnp.arange(p_max)[None, :]
        valid = p < n_pvq[:, None]
        vcat = merged[:, :s0]  # [B, p_max] u32, one record per word
        ln = (vcat & 0xFF).astype(jnp.int32) + 1
        wid = ((vcat >> 8) & 0xF).astype(jnp.int32)  # 0 = zero partition
        bq = ((vcat >> 12) & 0xF).astype(jnp.int32) + 1
        gain = jnp.where(valid, _f16_to_f32_j((vcat >> 16) & 0xFFFF), 0.0)

        iyb = jnp.where(valid, ln * wid, 0)
        iybase = jnp.cumsum(iyb, axis=1) - iyb

        # ---- fill leaf table [B, F] (3-word records) ----
        f = jnp.arange(f_max)[None, :]
        fvalid = f < n_fill[:, None]
        frec = merged[:, s0:s1].reshape(B, f_max, 3)
        fw0 = frec[:, :, 0]
        fw1 = frec[:, :, 1]
        fseed = jnp.where(fvalid, frec[:, :, 2], jnp.uint32(0))
        fdst = (fw0 & 0x7FF).astype(jnp.int32)
        fplane = ((fw0 >> 11) & 1).astype(jnp.int32)
        fln = ((fw0 >> 12) & 0xFF).astype(jnp.int32) + 1
        fnoise = ((fw0 >> 20) & 1).astype(jnp.int32)
        fnorm2 = ((fw0 >> 21) & 1).astype(jnp.int32)
        fpb = ((fw0 >> 22) & 0x1FF).astype(jnp.int32)
        fsrc = (fw1 & 0x7FF).astype(jnp.int32)
        fgain = jnp.where(fvalid, _f16_to_f32_j((fw1 >> 16) & 0xFFFF), 0.0)

        # ---- derive pvq flatdst from the tiling invariant ----
        # pvq + zero + fill leaves jointly tile each coded plane
        # contiguously from e[start] (plane A emits w==0 zero-partition
        # leaves so the !fill memset path leaves no holes), so a pvq
        # leaf's coded rank is its exclusive length prefix plus the
        # lengths of the fills sorted before it (the fills' pvq_before
        # field); rank -> flat position is a two-segment affine map.
        ln_z = jnp.where(valid, ln, 0)
        excl = jnp.cumsum(ln_z, axis=1) - ln_z
        fln_z = jnp.where(fvalid, fln, 0)
        pb_mask = (jnp.arange(p_max)[None, :, None] >= fpb[:, None, :]).astype(
            jnp.float32
        )
        fb_ = jnp.einsum("bpf,bf->bp", pb_mask, fln_z.astype(jnp.float32),
                         preferred_element_type=jnp.float32,
                         precision="highest").astype(jnp.int32)
        r_rank = excl + fb_
        e_s = jnp.where(meta[:, 4] == 17, jnp.int32(int(e[17])), 0)[:, None]
        e_e = jnp.take(jnp.asarray(e), jnp.clip(meta[:, 5], 0, NB))[:, None]
        L0 = e_e - e_s
        flatdst = jnp.where(
            valid,
            jnp.where(r_rank < L0, e_s + r_rank, n + e_s + (r_rank - L0)),
            n2,
        )

        if stop_after == "leaves":
            return (jnp.sum(gain) + jnp.sum(fgain)
                    + jnp.sum((flatdst + ln + wid + bq + iybase
                               ).astype(jnp.float32))
                    + jnp.sum((fdst + fplane + fln + fnoise + fnorm2 + fsrc
                               ).astype(jnp.float32))
                    + jnp.sum(fseed.astype(jnp.float32)))

        # ---- per-position field planes via interval one-hot matmuls ----
        # Leaves tile each plane without overlap, so hitting the in-leaf
        # membership mask with the field table on the MXU
        # (Σ_p mask[b,pos,p]·field[b,p,f]) reproduces every per-position
        # field in one batched matmul — replacing ~20 take_along_axis
        # gathers (slow per-element fetches on TPU) AND the scatter-based
        # position->leaf map.  Zero-adds are exact in f32, every integer
        # field is < 2^24, and u32 seeds ride as two 16-bit halves.
        # (the k-dependent rotation fields — active/cos/sin — are derived
        # AFTER the iy unpack, since v4 ships no K; see the rotation-
        # parameter block past the normalise stage)
        sp_f = spread[:, None].astype(jnp.int32)
        L_l = ln // bq
        st2 = jnp.ones_like(ln)
        for t in range(1, 15):
            st2 = st2 + (((t * t + t) * bq + (bq >> 2)) < ln).astype(jnp.int32)
        st2 = jnp.where(ln >= 8 * bq, st2, 0)

        f32 = lambda t: t.astype(jnp.float32)  # noqa: E731
        pos3 = jnp.arange(n2)[None, :, None]
        startP = flatdst[:, None, :]
        inP = ((startP <= pos3) & (pos3 < startP + ln[:, None, :])).astype(
            jnp.float32
        )
        fieldsP = jnp.stack(
            [f32(flatdst), f32(ln), f32(wid), f32(iybase), gain,
             f32(L_l), f32(st2), f32(bq),
             jnp.ones_like(gain)],
            axis=-1,
        )
        valsP = jnp.einsum("bnp,bpf->bnf", inP, fieldsP,
                           preferred_element_type=jnp.float32,
                   precision="highest")
        i32v = lambda k: valsP[:, :, k].astype(jnp.int32)  # noqa: E731
        fd_p = i32v(0)
        ln_p = i32v(1)
        wid_p = i32v(2)
        iyb_p = i32v(3)
        gain_p = valsP[:, :, 4]
        L_p = jnp.maximum(i32v(5), 1)
        st2_p = i32v(6)
        bq_p = jnp.maximum(i32v(7), 1)
        cov = valsP[:, :, 8] > 0.5
        rel = pos - fd_p

        fflat = jnp.where(fvalid, fplane * n + fdst, n2)
        startF = fflat[:, None, :]
        inF = ((startF <= pos3) & (pos3 < startF + fln[:, None, :])).astype(
            jnp.float32
        )
        fieldsF = jnp.stack(
            [f32(fflat), f32(fln), f32(fsrc), f32(fnorm2), fgain,
             (fseed & jnp.uint32(0xFFFF)).astype(jnp.float32),
             (fseed >> 16).astype(jnp.float32),
             f32(fnoise), jnp.ones_like(fgain)],
            axis=-1,
        )
        valsF = jnp.einsum("bnp,bpf->bnf", inF, fieldsF,
                           preferred_element_type=jnp.float32,
                   precision="highest")
        fi32 = lambda k: valsF[:, :, k].astype(jnp.int32)  # noqa: E731
        ffd_p = fi32(0)
        fln_p = fi32(1)
        fsrc_p = fi32(2)
        fnorm2_p = fi32(3)
        fgain_p = valsF[:, :, 4]
        seed_p = (valsF[:, :, 5].astype(jnp.uint32)
                  | (valsF[:, :, 6].astype(jnp.uint32) << 16))
        fnoise_p = fi32(7)
        fcov = valsF[:, :, 8] > 0.5
        frel = pos - ffd_p

        if stop_after == "posmap":
            return (jnp.sum((fd_p + ln_p + wid_p + ffd_p + fln_p
                             ).astype(jnp.float32))
                    + jnp.sum(gain_p) + jnp.sum(cov) + jnp.sum(fcov))

        # ---- iy unpack ----
        # One ragged row copy per stream (the iy bit-stream is contiguous
        # in the arena), then a chunked one-hot einsum fetches each
        # position's word pair: two flat 2M-element gathers (~17 ms each
        # on TPU) become one 0.2M gather plus MXU work.  Words are full
        # u32, so they ride the matmul as two exact 16-bit halves.
        # The iyw size class bounds the fetch window; plane A guarantees
        # PLAN_IYW (decode_batch_plan_into raises OverflowError past it,
        # the serve loops fall back to a spectral step for that frame)
        # and the serve loop only picks a smaller class when every
        # stream's span fits it (slot["iy_spans"]).
        IYW = iyw
        QCH = IYW // 16
        rows = merged[:, s2:]  # [B, IYW] u32 (merged window fetch above)
        rows_pad = jnp.pad(rows, ((0, 0), (0, 32)))
        rows_w = jnp.stack(
            [rows_pad[:, 16 * q : 16 * q + 17] for q in range(QCH)], axis=1
        )
        rw_lh = jnp.stack(
            [(rows_w & jnp.uint32(0xFFFF)).astype(jnp.float32),
             (rows_w >> 16).astype(jnp.float32)],
            axis=-1,
        )  # [B, QCH, 17, 2]
        bit = iyb_p + rel * wid_p
        wloc = jnp.clip(bit >> 5, 0, IYW - 1)
        OHW = (jnp.arange(QCH)[None, None, :]
               == (wloc >> 4)[:, :, None]).astype(jnp.float32)
        wpair = jnp.einsum("bnq,bqxh->bnxh", OHW, rw_lh,
                           preferred_element_type=jnp.float32,
                           precision="highest")
        rsel = wloc & 15
        OHr16 = (jnp.arange(16)[None, None, :] == rsel[:, :, None]).astype(
            jnp.float32
        )
        w0f = jnp.einsum("bnr,bnrh->bnh", OHr16, wpair[:, :, 0:16, :],
                         preferred_element_type=jnp.float32,
                         precision="highest")
        w1f = jnp.einsum("bnr,bnrh->bnh", OHr16, wpair[:, :, 1:17, :],
                         preferred_element_type=jnp.float32,
                         precision="highest")
        wordv = (w0f[..., 0].astype(jnp.uint32)
                 | (w0f[..., 1].astype(jnp.uint32) << 16))
        word1v = (w1f[..., 0].astype(jnp.uint32)
                  | (w1f[..., 1].astype(jnp.uint32) << 16))
        sh = (bit & 31).astype(jnp.uint32)
        lo = wordv >> sh
        hi = jnp.where(
            sh == 0,
            jnp.uint32(0),
            word1v << (32 - jnp.maximum(sh, 1)),
        )
        wp_c = jnp.maximum(wid_p, 1)  # avoid negative shifts off-leaf
        msk = (jnp.uint32(1) << wp_c.astype(jnp.uint32)) - 1
        iy = ((lo | hi) & msk).astype(jnp.int32) - (1 << (wp_c - 1))
        iy = jnp.where(cov, iy, 0)

        if stop_after == "iy":
            return (jnp.sum(iy.astype(jnp.float32)) + jnp.sum(gain_p)
                    + jnp.sum(fcov) + jnp.sum(fln_p.astype(jnp.float32)))

        # ---- pvq normalise (+ per-leaf K recovery) ----
        # Per-leaf Ryy via the interval masks: sums of integer squares
        # (<= K^2 = 16384 per leaf) are EXACT in a true-f32 matmul (every
        # partial sum < 2^24) — no cumsum, no gathers.  The same einsum
        # recovers K = sum(|iy|) (exact: K <= 256 < 2^24), which v4 no
        # longer ships on the wire; K feeds the rotation parameters.
        iyf = iy.astype(jnp.float32)
        aiy = jnp.abs(iyf)
        rk = jnp.einsum("bfn,bnp->bfp",
                        jnp.stack([iyf * iyf, aiy], axis=1), inP,
                        preferred_element_type=jnp.float32,
                        precision="highest")
        ryy = rk[:, 0]
        kk = rk[:, 1].astype(jnp.int32)
        gl = gain / jnp.sqrt(jnp.maximum(ryy, 1e-30))
        x = iyf * jnp.einsum("bnp,bp->bn", inP, gl,
                             preferred_element_type=jnp.float32,
                   precision="highest")

        # ---- rotation parameters (k-dependent leaf fields -> planes) ----
        # active = 2K < N with spreading on; gain_r = N/(N + factor*K);
        # cos/sin from celt/vq.py exp_rotation.  A second small position
        # einsum broadcasts the three k-dependent fields (the rest of the
        # leaf fields rode the main fieldsP einsum above).
        factor = jnp.take(
            jnp.asarray(np.array([15, 15, 10, 5], np.int32)), jnp.clip(sp_f, 0, 3)
        )
        active = (2 * kk < ln) & (sp_f > 0) & valid
        gr = ln.astype(jnp.float32) / (ln + factor * kk).astype(jnp.float32)
        th = 0.5 * gr * gr
        c_l = jnp.cos(0.5 * jnp.pi * th)
        s_l = jnp.cos(0.5 * jnp.pi * (1.0 - th))
        rotP = jnp.einsum("bnp,bpf->bnf", inP,
                          jnp.stack([f32(active), c_l, s_l], axis=-1),
                          preferred_element_type=jnp.float32,
                          precision="highest")
        act_p = rotP[:, :, 0] > 0.5
        c_p = rotP[:, :, 1]
        s_p = rotP[:, :, 2]

        if stop_after == "norm":
            return jnp.sum(x) + jnp.sum(fcov) + jnp.sum(fln_p.astype(jnp.float32))

        # ---- noise leaves ----
        t1 = jnp.clip(frel + 1, 0, _LCG_MAX - 1)
        A1, C1 = _lcg_jump_j(t1)
        sv = A1 * seed_p + C1
        noise = (
            jax.lax.shift_right_arithmetic(
                jax.lax.bitcast_convert_type(sv, jnp.int32), 20
            )
        ).astype(jnp.float32)
        is_noise = fcov & (fnoise_p == 1)
        # Noise values are integers (seed >> 20); the plane-wide cumsum may
        # wrap int32, but two's-complement differences stay exact modulo
        # 2^32 and every true per-leaf sum fits in 31 bits (176 * 2048^2),
        # so reinterpreting the difference as uint32 recovers it exactly —
        # a float32 cumsum would lose ~1e-3 to cancellation instead.
        nzi = jnp.where(
            is_noise,
            jax.lax.shift_right_arithmetic(
                jax.lax.bitcast_convert_type(sv, jnp.int32), 20
            ),
            0,
        )
        nz = jnp.where(is_noise, noise, 0.0)
        ncsum = jnp.cumsum(nzi * nzi, axis=1)
        fend_i = jnp.clip(fflat + fln - 1, 0, n2 - 1)
        fstart_i = fflat - 1
        nat_end = jnp.take_along_axis(ncsum, jnp.clip(fend_i, 0, n2 - 1), axis=1)
        nat_start = jnp.where(
            fstart_i < 0, 0,
            jnp.take_along_axis(ncsum, jnp.clip(fstart_i, 0, n2 - 1), axis=1),
        )
        nsum = jax.lax.bitcast_convert_type(
            nat_end - nat_start, jnp.uint32
        ).astype(jnp.float32)
        nscale = fgain / jnp.sqrt(EPSILON + nsum)
        x = jnp.where(
            is_noise,
            nz * jnp.einsum("bnp,bp->bn", inF, nscale,
                            preferred_element_type=jnp.float32,
                   precision="highest"),
            x,
        )

        if stop_after == "noise":
            return jnp.sum(x)

        # ---- rotation ----
        # (leaf-level rotation parameters were computed before the field
        # einsums and arrived here as *_p per-position planes)
        act_pp = act_p & cov
        seg = jnp.minimum(rel // L_p, jnp.maximum(bq_p - 1, 0))
        rel2 = rel - seg * L_p
        in_rot = act_pp & (rel < bq_p * L_p)
        segbase = fd_p + seg * L_p

        # Banded permutation transport: both chain-permute steps move
        # values strictly within their leaf (|idx - pos| < 176), so a
        # shift-select replaces the two ~23 ms take_along_axis gathers
        # with VPU passes.  A while_loop bounded by the LARGEST shift
        # actually present keeps the HLO tiny (a 351-way unroll costs
        # ~90 s of XLA:CPU compile) and exits after one pass on frames
        # with no stride2 rotation (long blocks / high-rate bands).
        BAND_D = int(e[NB] - e[NB - 1])  # widest band = max leaf length

        def banded_permute(xsrc, idx, active_m):
            delta = jnp.where(active_m, idx - pos, 0)
            dmax = jnp.max(jnp.abs(delta))
            xp_ = jnp.pad(xsrc, ((0, 0), (BAND_D, BAND_D)))
            out = jnp.where(delta == 0, xsrc, 0.0)

            def body(carry):
                d, acc = carry
                sp = jax.lax.dynamic_slice(xp_, (0, BAND_D + d), (B, n2))
                sm = jax.lax.dynamic_slice(xp_, (0, BAND_D - d), (B, n2))
                acc = (acc + jnp.where(delta == d, sp, 0.0)
                       + jnp.where(delta == -d, sm, 0.0))
                return d + 1, acc

            _, out = jax.lax.while_loop(
                lambda c: c[0] <= dmax, body, (jnp.int32(1), out)
            )
            return out

        # pass A (stride2): chain-permute gather, scan, inverse gather.
        # When no position in the step has a stride-2 rotation (st2 < 2
        # everywhere — long blocks / high-rate bands, i.e. typical music
        # at LM=3), the whole pass is exactly identity: stA==1 makes both
        # banded permutes delta==0 and forces mA==1 chains through
        # _rot_pass (first==last -> y==x).  A scalar lax.cond skips the
        # two permute transports and the two _seg_scan ladders in that
        # case; the executor is never vmapped (synthesis.py calls it on
        # the full batch), so this lowers to a real XLA conditional.
        has_st2 = jnp.any(in_rot & (st2_p >= 2))

        def _pass_a(xin):
            stA = jnp.where(in_rot & (st2_p >= 2), st2_p, 1)
            q_ = L_p // stA
            r0 = L_p - q_ * stA  # L % stA
            # forward map: chain-order slot t -> natural offset
            t_ = rel2
            big = t_ < r0 * (q_ + 1)
            row = jnp.where(big, t_ // jnp.maximum(q_ + 1, 1), r0 + (t_ - r0 * (q_ + 1)) // jnp.maximum(q_, 1))
            col = jnp.where(big, t_ % jnp.maximum(q_ + 1, 1), (t_ - r0 * (q_ + 1)) % jnp.maximum(q_, 1))
            nat = col * stA + row
            xa = banded_permute(xin, segbase + nat, in_rot)
            mA = jnp.where(in_rot, jnp.where(big, q_ + 1, q_), 1)
            kA = jnp.where(in_rot, col, 0)
            # pass A coefficients are swapped: exp_rotation1(seg, L, st2, s, c)
            ccA = jnp.where(in_rot & (st2_p >= 2), s_p, 1.0)
            ssA = jnp.where(in_rot & (st2_p >= 2), c_p, 0.0)
            mA = jnp.where(st2_p >= 2, mA, 1)
            kA = jnp.where(st2_p >= 2, kA, 0)
            xa = _rot_pass(xa, ccA, ssA, kA, mA)
            # inverse map: natural offset p -> chain slot
            p_ = rel2
            rowI = p_ % jnp.maximum(stA, 1)
            colI = p_ // jnp.maximum(stA, 1)
            tI = rowI * q_ + jnp.minimum(rowI, r0) + colI
            return banded_permute(xa, segbase + tI, in_rot)

        x = jax.lax.cond(has_st2, _pass_a, lambda xin: xin, x)

        # pass B (stride 1): contiguous chains of length L.  Same skip
        # logic: with no active rotation anywhere (spread==0 frames or
        # all-high-rate leaves) the masked coefficients make _rot_pass
        # exactly identity, so skip its two scan ladders.
        def _pass_b(xin):
            ccB = jnp.where(in_rot, c_p, 1.0)
            ssB = jnp.where(in_rot, s_p, 0.0)
            mB = jnp.where(in_rot, L_p, 1)
            kB = jnp.where(in_rot, rel2, 0)
            return _rot_pass(xin, ccB, ssB, kB, mB)

        x = jax.lax.cond(jnp.any(in_rot), _pass_b, lambda xin: xin, x)

        if stop_after == "rot":
            return jnp.sum(x)

        # ---- band walk ----
        X = x.reshape(B, 2, n)
        # v4.1: band w0 ships as a 21x24-bit little-endian stream in 16
        # words (fields use bits [0:24]: rec|td|lb|dual|isw|inv|imid|
        # stereo@23); unpack like the 11-bit eff fields below.
        bw0p = jax.lax.bitcast_convert_type(bands[:, :16], jnp.uint32)
        bw0_cols = []
        for _i in range(NB):
            _bp = 24 * _i
            _w, _s = _bp >> 5, _bp & 31
            _v = bw0p[:, _w] >> _s
            if _s + 24 > 32:
                _v = _v | (bw0p[:, _w + 1] << (32 - _s))
            bw0_cols.append(_v & 0xFFFFFF)
        bw0 = jnp.stack(bw0_cols, axis=1)
        beff = jax.lax.bitcast_convert_type(bands[:, 16 : 16 + 8], jnp.uint32)
        rec_b = (bw0 & 3).astype(jnp.int32)
        td_b = ((bw0 >> 2) & 3).astype(jnp.int32)
        lb_b = ((bw0 >> 4) & 1).astype(jnp.int32)
        dual_b = (bw0 >> 5) & 1
        isw_b = (bw0 >> 6) & 1
        inv_b = (bw0 >> 7) & 1
        imid_b = ((bw0 >> 8) & 0x7FFF).astype(jnp.float32) / 32768.0
        ster_b = (bw0 >> 23) & 1

        def eff_field(i):
            bitpos = 11 * i
            w, s = bitpos >> 5, bitpos & 31
            v = beff[:, w] >> s
            if s + 11 > 32:
                v = v | (beff[:, w + 1] << (32 - s))
            return (v & 0x7FF).astype(jnp.int32)

        # per-position fold fields on the [B, 2, n] view
        ftyp_v = (fcov & (fnoise_p == 0)).reshape(B, 2, n)  # fold coverage
        src_v = fsrc_p.reshape(B, 2, n)
        n2_v = fnorm2_p.reshape(B, 2, n)
        gain_v = fgain_p.reshape(B, 2, n)
        rel_v = frel.reshape(B, 2, n)
        fln_v = fln_p.reshape(B, 2, n)
        # Fold dither reuses the noise section's jumped LCG draws (same
        # t=frel+1 seeds); garbage outside fold leaves is masked by fm.
        dith_v = jnp.where(
            (sv & 0x8000) != 0, jnp.float32(1.0 / 256.0), jnp.float32(-1.0 / 256.0)
        ).reshape(B, 2, n)

        norm = jnp.zeros((B, 2, norm_len), jnp.float32)

        # Hybrid streams (start band 17): plane A emits eff fold offsets
        # relative to ITS norm buffer (which starts at e[17]); the
        # executor's norm is absolute, so hybrid streams shift eff by
        # e[17].  Bands below 17 carry no records and stay zero, which
        # also makes the absolute-prefix intensity averaging equivalent.
        hyb = meta[:, 4] == 17
        e17m = int(e[17])

        for i in range(NB):
            lo_, hi_ = int(e[i]), int(e[i + 1])
            nb_ = hi_ - lo_
            if i == 18:
                # special_hybrid_folding (bands.py:605): duplicate band
                # 17's folding data so band 18 can fold; plane 1 only
                # while dual stereo was still on at band 17.
                n1h = int(e[18] - e[17])
                n2h = int(e[19] - e[18])
                a0 = e17m + 2 * n1h - n2h
                b0, b1 = e17m + n1h, e17m + n2h
                hmask = jnp.stack(
                    [hyb, hyb & (dual_b[:, 17] == 1)], axis=1
                )[:, :, None]
                norm = norm.at[:, :, b0:b1].set(
                    jnp.where(hmask, norm[:, :, a0 : a0 + (b1 - b0)],
                              norm[:, :, b0:b1])
                )
            cfg_masks = []
            for ci, (rec, td, lb) in enumerate(cfgs):
                if (i, ci) not in t_und:
                    cfg_masks.append(None)
                    continue
                mk = (rec_b[:, i] == rec) & (td_b[:, i] == td) & (lb_b[:, i] == (1 if lb else 0))
                cfg_masks.append(mk)
            ident = (rec_b[:, i] == 0) & (td_b[:, i] == 0) & (lb_b[:, i] == 1)

            # intensity switch: average norm planes below this band
            if lo_ > 0:
                swm = (isw_b[:, i] == 1)[:, None]
                pref = 0.5 * (norm[:, 0, :lo_] + norm[:, 1, :lo_])
                norm = norm.at[:, 0, :lo_].set(
                    jnp.where(swm, pref, norm[:, 0, :lo_])
                )

            # Fold sources, gather-free (take_along_axis costs ~1 ms FLAT
            # per call on TPU; these one-hot matmuls ride the MXU):
            #   * the norm window at eff via a two-level chunked one-hot
            #     (chunk-of-16 select, then intra-chunk shift select),
            #   * the per-cfg forward/undo transforms collapsed into ONE
            #     per-stream selected matrix (masks are one-hot per
            #     stream, so the sum IS the selected transform),
            #   * the in-band fold copy as an in-band one-hot matmul over
            #     both source planes at once,
            #   * the per-leaf renorm from the fill-leaf interval masks
            #     instead of cumsum + three gathers.
            has_fold = ftyp_v[:, :, lo_:hi_]
            effv = jnp.clip(
                eff_field(i) + jnp.where(hyb, e17m, 0), 0, max(norm_len - nb_, 0)
            )
            qc = effv >> 4
            rc_ = effv & 15
            K = nb_ // 16 + 2
            nl16 = -(-norm_len // 16) * 16
            nch = nl16 // 16
            NC = jnp.pad(norm, ((0, 0), (0, 0), (0, nl16 - norm_len + K * 16))
                         ).reshape(B, 2, nch + K, 16)
            NCk = jnp.stack([NC[:, :, k : k + nch] for k in range(K)], axis=3)
            OHq = (jnp.arange(nch)[None, :] == qc[:, None]).astype(jnp.float32)
            W = jnp.einsum("bq,bcqkx->bckx", OHq, NCk,
                           preferred_element_type=jnp.float32,
                   precision="highest")
            win = W.reshape(B, 2, K * 16)
            wins = jnp.stack([win[:, :, s : s + nb_] for s in range(16)], axis=-1)
            OHr = (jnp.arange(16)[None, :] == rc_[:, None]).astype(jnp.float32)
            lbnd2 = jnp.einsum("bs,bcjs->bcj", OHr, wins,
                               preferred_element_type=jnp.float32,
                   precision="highest")
            eye = jnp.eye(nb_, dtype=jnp.float32)[None]
            tsel = ident[:, None, None].astype(jnp.float32) * eye
            usel = ident[:, None, None].astype(jnp.float32) * eye
            for ci in range(len(cfgs)):
                if cfg_masks[ci] is None:
                    continue
                mkf = cfg_masks[ci][:, None, None].astype(jnp.float32)
                tsel = tsel + mkf * t_fwd[(i, ci)][None]
                usel = usel + mkf * t_und[(i, ci)][None]
            ld2 = jnp.einsum("bcw,bjw->bcj", lbnd2, tsel,
                             preferred_element_type=jnp.float32,
                   precision="highest")
            # fold fill: value = ld2[srcplane][srcrel + rel] + dither
            sr = jnp.clip(src_v[:, :, lo_:hi_] + rel_v[:, :, lo_:hi_], 0, nb_ - 1)
            srcw = jnp.clip(n2_v[:, :, lo_:hi_], 0, 1) * nb_ + sr
            OHs = (jnp.arange(2 * nb_)[None, None, None, :]
                   == srcw[..., None]).astype(jnp.float32)
            lval = jnp.einsum("bcjw,bw->bcj", OHs, ld2.reshape(B, 2 * nb_),
                              preferred_element_type=jnp.float32,
                   precision="highest")
            fill = jnp.where(has_fold, lval + dith_v[:, :, lo_:hi_], 0.0)
            # per-leaf renorm via the fill-leaf interval masks (noise
            # leaves contribute zero fill, so their sums are inert)
            inFb = jnp.stack(
                [inF[:, lo_:hi_, :], inF[:, n + lo_ : n + hi_, :]], axis=1
            )
            leafsum = jnp.einsum("bcj,bcjp->bcp", fill * fill, inFb,
                                 preferred_element_type=jnp.float32,
                   precision="highest")
            scale_leaf = fgain[:, None, :] / jnp.sqrt(EPSILON + leafsum)
            scale = jnp.einsum("bcp,bcjp->bcj", scale_leaf, inFb,
                               preferred_element_type=jnp.float32,
                   precision="highest")
            X = X.at[:, :, lo_:hi_].set(
                jnp.where(has_fold, fill * scale, X[:, :, lo_:hi_])
            )

            # undo transform via the per-stream selected matrix
            xb = X[:, :, lo_:hi_]
            xn = jnp.einsum("bcw,bjw->bcj", xb, usel,
                            preferred_element_type=jnp.float32,
                   precision="highest")
            # norm write (pre-merge)
            if i < NB - 1 and hi_ <= norm_len:
                sc = np.float32(math.sqrt(nb_))
                norm = norm.at[:, 0, lo_:hi_].set(sc * xn[:, 0])
                dm = (dual_b[:, i] == 1)[:, None]
                norm = norm.at[:, 1, lo_:hi_].set(
                    jnp.where(dm, sc * xn[:, 1], norm[:, 1, lo_:hi_])
                )
            # stereo merge
            do_m = (ster_b[:, i] == 1) & c2
            mid = imid_b[:, i][:, None]
            x0 = xn[:, 0]
            y0 = xn[:, 1]
            xp = mid * jnp.sum(y0 * x0, axis=1, keepdims=True)
            sdd = jnp.sum(y0 * y0, axis=1, keepdims=True)
            el = mid * mid + sdd - 2 * xp
            er = mid * mid + sdd + 2 * xp
            degen = (er < 6e-4) | (el < 6e-4)
            lg = 1.0 / jnp.sqrt(jnp.maximum(el, 1e-30))
            rg = 1.0 / jnp.sqrt(jnp.maximum(er, 1e-30))
            l_ = mid * x0
            mx = jnp.where(degen, x0, lg * (l_ - y0))
            my = jnp.where(degen, x0, rg * (l_ + y0))
            dmask = do_m[:, None]
            xn = jnp.stack(
                [jnp.where(dmask, mx, xn[:, 0]), jnp.where(dmask, my, xn[:, 1])],
                axis=1,
            )
            iv = ((inv_b[:, i] == 1) & c2)[:, None]
            xn = jnp.stack(
                [xn[:, 0], jnp.where(iv, -xn[:, 1], xn[:, 1])], axis=1
            )
            X = X.at[:, :, lo_:hi_].set(xn)

        if stop_after == "bands":
            return jnp.sum(X)

        # ---- anti-collapse ----
        ap = jnp.arange(a_max)[None, :]
        avalid = ap < n_acents[:, None]
        arec = merged[:, s1:s2].reshape(B, a_max, 2)
        a0 = jnp.where(avalid, arec[:, :, 0], jnp.uint32(0))
        a1 = jnp.where(avalid, arec[:, :, 1], jnp.uint32(0))
        ab = (a0 & 0x1F).astype(jnp.int32)
        ach = ((a0 >> 5) & 1).astype(jnp.int32)
        amask = ((a0 >> 8) & 0xFF).astype(jnp.int32)
        ar = _f16_to_f32_j((a0 >> 16) & 0xFFFF)
        # Accumulate records into [B, NB, 2] by compare-reduce over the
        # record axis (at most one record per (band, ch); scatters would
        # serialize on TPU).  Seeds are u32: sum the masked values with a
        # wrapping u32 reduce, exact because at most one term is nonzero.
        eb = jnp.arange(NB)[None, :, None, None]
        cb = jnp.arange(2)[None, None, :, None]
        m4 = (avalid[:, None, None, :] & (ab[:, None, None, :] == eb)
              & (ach[:, None, None, :] == cb))  # [B, NB, 2, A]
        r_bc = jnp.sum(jnp.where(m4, ar[:, None, None, :], 0.0), axis=-1)
        s_bc = jnp.sum(jnp.where(m4, a1[:, None, None, :], jnp.uint32(0)), axis=-1)
        m_bc = jnp.sum(jnp.where(m4, amask[:, None, None, :], 0), axis=-1)
        has_bc = jnp.any(m4, axis=-1)

        posn = jnp.arange(n)[None, :]
        bb = jnp.asarray(_plan_band_of_bin(lm))[None, :]
        base_b = jnp.take(jnp.asarray(e[:NB]), bb)
        off_in = posn - base_b
        kblk = off_in & (m - 1)
        jj = off_in >> lm
        n0_b = jnp.take(jnp.asarray((modes.E_BANDS[1:] - modes.E_BANDS[:-1]).astype(np.int32)), bb)
        oh = band_onehot_j[:, :n]  # [NB, n]

        # Both channels ride every op at once ([B, 2, ...]); highest
        # precision everywhere a 16-bit seed half or an energy rides the
        # matmul (the default bf16 passes round ints above 256).
        def bcast2(tbl_f32):  # [B, NB, 2] -> [B, 2, n]
            return jnp.einsum("bec,en->bcn", tbl_f32, oh, precision="highest")

        msk = bcast2(m_bc.astype(jnp.float32)).astype(jnp.int32)
        has = bcast2(has_bc.astype(jnp.float32)) > 0.5
        rr = bcast2(r_bc)
        sd_lo = bcast2((s_bc & jnp.uint32(0xFFFF)).astype(jnp.float32))
        sd_hi = bcast2((s_bc >> 16).astype(jnp.float32))
        sd = sd_lo.astype(jnp.uint32) | (sd_hi.astype(jnp.uint32) << 16)
        kblk2 = kblk[:, None, :]
        cleared = ((msk >> kblk2) & 1) == 0
        # rank of cleared block k = cleared bits below k
        rank = jnp.zeros_like(msk)
        for kb in range(m):
            rank = rank + jnp.where(
                (kb < kblk2) & (((msk >> kb) & 1) == 0), 1, 0
            )
        t_ = jnp.clip(rank * n0_b[:, None, :] + jj[:, None, :] + 1, 0, _LCG_MAX - 1)
        At, Ct = _lcg_jump_j(t_)
        sv_ = At * sd + Ct
        val = jnp.where((sv_ & 0x8000) != 0, rr, -rr)
        newx = jnp.where(has & cleared, val, X)
        # renorm bands with any record
        s2 = jnp.einsum("bcn,en->bec", newx * newx, oh, precision="highest")
        scl = jnp.where(has_bc, 1.0 / jnp.sqrt(EPSILON + s2), 1.0)
        sclb = jnp.einsum("bec,en->bcn", scl, oh, precision="highest")
        return newx * sclb

    return executor


def plan_executor_args(slot: dict):
    """Assemble the jit executor's inputs from a decoded plan slot
    (numpy; mirrors the device-side unpack in dsp/synthesis.py).
    Returns (header [B,2], bands [B,24], meta [B,16], arena)."""
    bands = np.concatenate([slot["bw0_p"], slot["beff_p"]], axis=1)
    return slot["hdr_p"], bands, slot["meta"], slot["arena"]  # [B,2],[B,24]


@functools.lru_cache(maxsize=None)
def _plan_band_of_bin(lm: int) -> np.ndarray:
    m = 1 << lm
    n = m * modes.SHORT_MDCT_SIZE
    widths = (modes.E_BANDS[1:] - modes.E_BANDS[:-1]).astype(np.int64) * m
    idx = np.repeat(np.arange(NB, dtype=np.int32), widths)
    # Bins above the top band never carry anti-collapse content; map them
    # to band 20 (they are masked by `has` anyway).
    return np.concatenate([idx, np.full(n - idx.size, NB - 1, np.int32)])


def _f16_to_f32_j(h):
    """uint32-holding-f16-bits -> f32 (jnp, vectorised)."""
    sign = (h >> 15) & 1
    exp = ((h >> 10) & 0x1F).astype(jnp.int32)
    man = (h & 0x3FF).astype(jnp.float32)
    f = jnp.where(
        exp == 0,
        (man / 1024.0) * jnp.float32(2.0 ** -14),
        (1.0 + man / 1024.0) * jnp.exp2((exp - 15).astype(jnp.float32)),
    )
    return jnp.where(sign == 1, -f, f)


