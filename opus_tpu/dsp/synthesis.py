"""Batched CELT synthesis for TPU.

The host plane (opus_tpu.celt.decoder front end) emits per-frame symbol
planes; this module turns them into PCM for a whole batch of streams in
one jitted step.  Mapping to the hardware:

* IMDCT: expressed as a dense [B*C*blocks, N2] x [N2, N2] matmul against a
  precomputed synthesis basis — MXU work, the FLOPs bulk.  (The reference
  uses a radix FFT network, kiss_fft.rs/mdct.rs; at batch >= hundreds the
  matmul formulation wins on TPU and needs no data-dependent control flow.)
* TDAC overlap, window fades: fused elementwise VPU ops.
* Pitch post-filter: lag-chunked recurrence — each chunk of MIN_PERIOD-2
  samples is data-parallel across streams, chunks run sequentially
  (the reference's comb_filter_inplace recurrence, comb_filter/mod.rs).
* De-emphasis IIR: first-order recurrence via log-depth associative scan.

State (decode memory, preemph) lives on device as a pytree; the step is a
pure function (state, planes) -> (state, pcm), shardable with jax.sharding
over the stream axis.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..celt import modes
from ..celt.comb_filter import GAINS
from ..celt.decoder import DECODE_BUFFER_SIZE
from ..celt.energy import E_MEANS

OVERLAP = modes.OVERLAP
# Post-filter recurrence chunk: must be <= MIN_PERIOD-2 (lag safety) and
# divide every segment length (all multiples of SHORT_MDCT_SIZE=120).
_CHUNK = 12


def _maybe_checkify(fn, donate=()):
    """Opt-in device-kernel sanitizer (SURVEY.md §5 'race detection /
    sanitizers' row): with OPUS_TPU_CHECKIFY=1, every jitted step is
    wrapped in jax.experimental.checkify float checks, so a NaN/Inf
    produced anywhere inside the synthesis kernels raises at the call
    site instead of flowing into PCM.  Off by default — the checks add
    device work and disable buffer donation."""
    import os

    if os.environ.get("OPUS_TPU_CHECKIFY", "0") != "1":
        return jax.jit(fn, donate_argnums=donate)
    from jax.experimental import checkify

    checked = jax.jit(checkify.checkify(fn, errors=checkify.float_checks))

    def wrapper(*args):
        err, out = checked(*args)
        checkify.check_error(err)
        return out

    return wrapper


class SynthState(NamedTuple):
    """Per-stream synthesis state (a pytree; leading axes [B, C])."""

    mem: jax.Array  # [B, C, DECODE_BUFFER_SIZE + OVERLAP]
    preemph: jax.Array  # [B, C]
    #: internal-rate SILK input tail for the device resampler (mixed
    #: serving with silk_internal transfer): [B, C, resample.TAIL].
    #: None for pipelines that don't resample on device (pytrees with and
    #: without the leaf are separate jit signatures; each pipeline is
    #: internally consistent).
    silk_hist: jax.Array | None = None


def init_state(batch: int, channels: int = 2, silk_hist: bool = False) -> SynthState:
    hist = None
    if silk_hist:
        from .resample import TAIL

        hist = jnp.zeros((batch, channels, TAIL), jnp.float32)
    return SynthState(
        mem=jnp.zeros((batch, channels, DECODE_BUFFER_SIZE + OVERLAP), jnp.float32),
        preemph=jnp.zeros((batch, channels), jnp.float32),
        silk_hist=hist,
    )


@functools.lru_cache(maxsize=None)
def _synthesis_basis(n2: int) -> np.ndarray:
    """[N2, N2] matrix mapping spectra to the IMDCT mid-region
    u[N2/2 + j] (see opus_tpu.celt.mdct for the derivation)."""
    n = 2 * n2
    j = np.arange(n2)[:, None] + n2 / 2.0
    k = np.arange(n2)[None, :]
    return np.cos(2.0 * np.pi / n * (j + 0.5 + n / 4.0) * (k + 0.5)).astype(np.float32).T


@functools.lru_cache(maxsize=None)
def _band_of_bin(lm: int) -> np.ndarray:
    """[N] band index of every MDCT bin."""
    m = 1 << lm
    n = m * modes.SHORT_MDCT_SIZE
    widths = (modes.E_BANDS[1:] - modes.E_BANDS[:-1]).astype(np.int64) * m
    idx = np.repeat(np.arange(modes.NB_E_BANDS, dtype=np.int32), widths)
    # Bins above the top band (always masked by `bound`) map to band 20.
    return np.concatenate([idx, np.full(n - idx.size, modes.NB_E_BANDS - 1, np.int32)])


@functools.lru_cache(maxsize=None)
def _band_onehot(lm: int) -> np.ndarray:
    """[21, N] one-hot band->bin expansion matrix (MXU-friendly gather)."""
    bob = _band_of_bin(lm)
    oh = np.zeros((modes.NB_E_BANDS, bob.size), np.float32)
    oh[bob, np.arange(bob.size)] = 1.0
    return oh


def _denormalise(x, band_log_e, lm, bound):
    """freq = x * exp2(logE + eMeans), masked above `bound` bins.

    The per-bin band-gain lookup runs as a one-hot [21, N] matmul on the
    MXU (exact: one unit term per output) — a per-element gather of the
    same values is ~20x slower on the VPU at serving batch sizes.
    """
    n = (1 << lm) * modes.SHORT_MDCT_SIZE
    lg = band_log_e + jnp.asarray(E_MEANS[: modes.NB_E_BANDS], jnp.float32)
    g = jnp.exp2(jnp.minimum(32.0, lg))  # [B, C, 21]
    gain_bins = jnp.einsum(
        "bce,en->bcn",
        g,
        jnp.asarray(_band_onehot(lm)),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    bins = jnp.arange(n)[None, None, :]
    mask = bins < bound[:, None, None]
    return jnp.where(mask, x * gain_bins, 0.0)


def _imdct_blocks(freq, lm: int, short_blocks: bool):
    """freq [B, C, N] -> mids [B, C, nb_blocks, NB] via the MXU."""
    n = (1 << lm) * modes.SHORT_MDCT_SIZE
    if short_blocks:
        nb_blocks = 1 << lm
        nb = modes.SHORT_MDCT_SIZE
    else:
        nb_blocks = 1
        nb = n
    basis = jnp.asarray(_synthesis_basis(nb))
    b_, c_ = freq.shape[0], freq.shape[1]
    # De-interleave short blocks: spec_b[k] = freq[b + k*nb_blocks].
    spec = freq.reshape(b_, c_, nb, nb_blocks).transpose(0, 1, 3, 2)
    # HIGHEST precision: full f32 accumulation on the MXU — audio
    # synthesis cannot tolerate the default bf16 multiply passes.
    return jnp.einsum(
        "bcsk,kj->bcsj",
        spec,
        basis,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _overlap_add(mids, prev_tail, lm: int, short_blocks: bool):
    """Chain TDAC across blocks; returns out [B,C,N] + new tail [B,C,ov/2]."""
    half = OVERLAP // 2
    w_lo = jnp.asarray(modes.WINDOW[:half], jnp.float32)
    w_hi = jnp.asarray(modes.WINDOW[OVERLAP - 1 : half - 1 : -1], jnp.float32)
    nb_blocks = mids.shape[2]
    nb = mids.shape[3]
    tail = prev_tail  # [B, C, half]
    outs = []
    carry_head = None
    for blk in range(nb_blocks):
        mid = mids[:, :, blk, :]  # [B, C, nb]
        new_mirror = mid[..., half - 1 :: -1]  # mid[ov/2-1-j]
        first = w_hi * tail - w_lo * new_mirror  # out[0:ov/2]
        second = w_hi[::-1] * mid[..., :half] + w_lo[::-1] * tail[..., ::-1]  # out[ov/2:ov]
        body = mid[..., half : nb - half] if nb > OVERLAP else mid[..., half:half]
        # This block's contribution: first ov samples + flat body; its last
        # half-overlap of `mid` becomes the next block's previous tail.
        outs.append(jnp.concatenate([first, second, body], axis=-1))
        tail = mid[..., nb - half :]
    out = jnp.concatenate(outs, axis=-1)  # [B, C, N]
    return out, tail


# --- pitch post-filter (shared by all step variants) --------------------
#
# The recurrence y[i] += taps_0*y[i-T] + taps_1*(y[i-T±1]) + taps_2*(y[i-T±2])
# runs in lag-safe chunks of _CHUNK (<= MIN_PERIOD-2) samples.  Per chunk
# each filter needs ONE contiguous (_CHUNK+4)-sample window of y starting
# at i0-T-2 — a single take_along_axis per filter; the five taps are then
# static slices of that window.  After the first OVERLAP samples of a
# segment the crossfade envelope is identically 1, so only filter B is
# evaluated there (halves the sequential gather count again).

#: Allowed compile-time chunk sizes.  `chunk` is safe iff every ACTIVE
#: (nonzero-gain) filter lag in the batch is >= chunk+2; the host picks
#: the largest safe variant per step (pf_chunk_for), falling back to 12
#: (always safe: MIN_PERIOD=15).  Each must divide 120 or be a multiple
#: of 120 dividing every tail length (n-240 for n in 480/960).
PF_CHUNKS = (12, 60, 120, 240)


def _pf_window(y, i0, t, chunk):
    """One gather: y[i0-t-2 : i0-t+chunk+2] per stream.  [B, C, chunk+4]."""
    w = chunk + 4
    start = jnp.clip(i0 - 2 - t[:, None, None], 0, y.shape[-1] - w)
    idx = start + jnp.arange(w)[None, None, :]
    return jnp.take_along_axis(y, idx, axis=-1)


def _pf_tap5(win, taps, chunk):
    """5-tap symmetric comb from a gathered window (static slices)."""
    s = win[..., 2 : 2 + chunk]
    s1 = win[..., 1 : 1 + chunk] + win[..., 3 : 3 + chunk]
    s2 = win[..., 0:chunk] + win[..., 4 : 4 + chunk]
    return (
        taps[:, 0][:, None, None] * s
        + taps[:, 1][:, None, None] * s1
        + taps[:, 2][:, None, None] * s2
    )


def pf_chunk_for(periods: np.ndarray, gains: np.ndarray):
    """Largest safe postfilter chunk for a step (host-side, numpy).

    periods [B, 3] int, gains [B, 3] float.  Zero-gain filters never
    contribute (their taps are zero), so only lags of active filters
    constrain the chunk.  Returns (chunk, any_active).

    Silent frames are NOT special: a silent CELT frame still carries the
    previous frames' nonzero comb gains (the native front end emits
    postfilter_gain_old/gain unchanged) and the device step filters every
    stream, so silent streams' active lags must constrain the chunk and
    keep pf_active true like any other stream's.
    """
    active = gains != 0.0
    if not active.any():
        return PF_CHUNKS[0], False
    min_lag = int(np.maximum(periods, 15)[active].min())
    chunk = PF_CHUNKS[0]
    for c in PF_CHUNKS:
        if c + 2 <= min_lag:
            chunk = c
    return chunk, True


def _postfilter(y, hist, n, lm, pf_periods, pf_gains, pf_tapsets, chunk=_CHUNK):
    """Apply the CELT pitch post-filter in place over y[..., hist:hist+n].

    Two segments like libopus' comb_filter calls (decoder side): the first
    SHORT_MDCT_SIZE samples crossfade filter 0 -> 1, the remainder
    crossfades 1 -> 2 over OVERLAP samples then runs filter 2 alone.
    `chunk` must satisfy chunk+2 <= every active lag (see pf_chunk_for).
    """
    w2 = jnp.asarray((modes.WINDOW.astype(np.float64) ** 2).astype(np.float32))
    gains_tbl = jnp.asarray(np.array(GAINS, np.float32))
    chunk_cf = min(chunk, OVERLAP)

    def seg(y, off, ln, p_a, g_a, t_a, p_b, g_b, t_b):
        ga = gains_tbl[t_a] * g_a[..., None]
        gb = gains_tbl[t_b] * g_b[..., None]
        same = (g_a == g_b) & (p_a == p_b) & (t_a == t_b)
        zero = (g_a == 0.0) & (g_b == 0.0)
        zero_b = g_b == 0.0
        # Lags clamped to >= MIN_PERIOD like libopus (zero-gain filters
        # still evaluate); keeps the gathers in range for garbage lags.
        pa = jnp.maximum(p_a, 15)
        pb = jnp.maximum(p_b, 15)

        ncf = min(ln, OVERLAP) // chunk_cf

        def body_cf(ci, y):
            i0 = off + ci * chunk_cf
            wh = jax.lax.dynamic_slice(w2, (ci * chunk_cf,), (chunk_cf,))[None, None, :]
            wh = jnp.where(same[:, None, None], 1.0, wh)
            wa = _pf_window(y, i0, pa, chunk_cf)
            wb = _pf_window(y, i0, pb, chunk_cf)
            contrib = (1.0 - wh) * _pf_tap5(wa, ga, chunk_cf) + wh * _pf_tap5(wb, gb, chunk_cf)
            contrib = jnp.where(zero[:, None, None], 0.0, contrib)
            cur = jax.lax.dynamic_slice_in_dim(y, i0, chunk_cf, axis=-1)
            return jax.lax.dynamic_update_slice_in_dim(y, cur + contrib, i0, axis=-1)

        y = jax.lax.fori_loop(0, ncf, body_cf, y)

        ntail = (ln - ncf * chunk_cf) // chunk
        if ntail:

            def body_b(ci, y):
                i0 = off + ncf * chunk_cf + ci * chunk
                contrib = _pf_tap5(_pf_window(y, i0, pb, chunk), gb, chunk)
                contrib = jnp.where(zero_b[:, None, None], 0.0, contrib)
                cur = jax.lax.dynamic_slice_in_dim(y, i0, chunk, axis=-1)
                return jax.lax.dynamic_update_slice_in_dim(y, cur + contrib, i0, axis=-1)

            y = jax.lax.fori_loop(0, ntail, body_b, y)
        return y

    p0, p1, p2 = pf_periods[:, 0], pf_periods[:, 1], pf_periods[:, 2]
    g0, g1, g2 = pf_gains[:, 0], pf_gains[:, 1], pf_gains[:, 2]
    t0, t1, t2 = pf_tapsets[:, 0], pf_tapsets[:, 1], pf_tapsets[:, 2]
    y = seg(y, hist, modes.SHORT_MDCT_SIZE, p0, g0, t0, p1, g1, t1)
    if lm != 0:
        y = seg(y, hist + modes.SHORT_MDCT_SIZE, n - modes.SHORT_MDCT_SIZE, p1, g1, t1, p2, g2, t2)
    return y


# --- de-emphasis IIR (shared by all step variants) ----------------------
#
# y[t] = x[t] + PREEMPH*y[t-1] over the frame, expressed exactly as 120-
# sample blocks: inside a block y_local = x @ T (T lower-triangular
# Toeplitz of PREEMPH^k — one MXU matmul for the whole batch), and an
# 8-long scalar carry chain stitches blocks.  Replaces a log-depth
# associative scan whose ~10 full passes over [B, C, N] were the
# second-largest device cost of the step.

_DEEMPH_BLK = modes.SHORT_MDCT_SIZE


@functools.lru_cache(maxsize=None)
def _deemph_toeplitz() -> np.ndarray:
    k = np.arange(_DEEMPH_BLK)
    d = k[None, :] - k[:, None]  # output j, input k -> j - k
    T = np.where(d >= 0, np.float64(modes.PREEMPH) ** np.maximum(d, 0), 0.0)
    return T.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _deemph_powers() -> np.ndarray:
    return (np.float64(modes.PREEMPH) ** np.arange(_DEEMPH_BLK)).astype(np.float32)


def _deemphasis(out_f, preemph):
    """De-emphasis IIR over the frame; returns (y [B,C,N], new_preemph)."""
    coef = jnp.float32(modes.PREEMPH)
    xin = out_f + 1e-30
    b_, c_, n = xin.shape
    g = n // _DEEMPH_BLK
    xb = xin.reshape(b_, c_, g, _DEEMPH_BLK)
    y_local = jnp.einsum(
        "bcgk,kj->bcgj",
        xb,
        jnp.asarray(_deemph_toeplitz()),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    pow_vec = jnp.asarray(_deemph_powers())
    # Carry chain: a_{g+1} = coef * y_last[g], y_last[g] = y_local_last[g]
    # + coef^(BLK-1) * a_g.  g is tiny (<= 8) — unrolled scalar-vector ops.
    last_pow = pow_vec[-1]
    a = preemph  # [B, C]; equals coef * y[-1] of the previous frame
    carries = []
    for gi in range(g):
        carries.append(a)
        a = coef * (y_local[..., gi, -1] + last_pow * a)
    carry = jnp.stack(carries, axis=-1)  # [B, C, g]
    ys = y_local + pow_vec[None, None, None, :] * carry[..., None]
    return ys.reshape(b_, c_, n), a


def make_synthesis_step(lm: int, short_blocks: bool, channels: int = 2, downsample: int = 1):
    """Build the jitted batched synthesis step for one frame shape.

    Returns step(state, planes) -> (state, pcm[B, frame, C]).
    planes: dict of arrays — x [B,C,N], band_log_e [B,C,21], bound [B],
    pf_periods [B,3] (old/current/new), pf_gains [B,3], pf_tapsets [B,3].
    """
    n = (1 << lm) * modes.SHORT_MDCT_SIZE
    half = OVERLAP // 2

    def step(state: SynthState, x, band_log_e, bound, pf_periods, pf_gains, pf_tapsets):
        freq = _denormalise(x, band_log_e, lm, bound)
        mids = _imdct_blocks(freq, lm, short_blocks)
        prev_tail = state.mem[..., DECODE_BUFFER_SIZE : DECODE_BUFFER_SIZE + half]
        out, tail = _overlap_add(mids, prev_tail, lm, short_blocks)

        # --- post-filter + de-emphasis (shared tail) -----------------------
        hist = DECODE_BUFFER_SIZE - n  # history available before out
        y = jnp.concatenate([state.mem[..., n:DECODE_BUFFER_SIZE], out], axis=-1)
        y = _postfilter(y, hist, n, lm, pf_periods, pf_gains, pf_tapsets)
        out_f = y[..., hist:]

        ys, new_preemph = _deemphasis(out_f, state.preemph)
        pcm = ys[..., ::downsample] * (1.0 / 32768.0)

        new_mem = jnp.concatenate(
            [
                state.mem[..., n:DECODE_BUFFER_SIZE],
                out_f,
                tail,
                jnp.zeros_like(state.mem[..., : OVERLAP - half]),
            ],
            axis=-1,
        )
        new_state = SynthState(mem=new_mem, preemph=new_preemph)
        return new_state, jnp.transpose(pcm, (0, 2, 1)).astype(jnp.float32)

    # No buffer donation: a mixed transient/long batch runs two variants
    # against the same input state.
    return _maybe_checkify(step)


def make_pipeline_step(lm: int, short_blocks: bool, channels: int = 2, downsample: int = 1,
                       quantized: bool = False):
    """Serving-path variant of make_synthesis_step taking RAW plane-A output.

    The native front end emits x as a flat [B, 2*960] float32 buffer (first
    stream_channels*N entries valid) and band log-energies as [B, 2, 21];
    mono-frame broadcast, slicing, and reshape all happen here inside the
    jit instead of as host-side numpy copies (which at B=1024 cost more
    than the whole native symbol decode).

    step(state, xraw, mono, band_log_e2, bound, pf_periods, pf_gains,
    pf_tapsets) -> (state, pcm).
    """
    n = (1 << lm) * modes.SHORT_MDCT_SIZE
    inner = make_synthesis_step(lm, short_blocks, channels, downsample)

    def step(state, xraw, mono, band_log_e2, bound, pf_periods, pf_gains, pf_tapsets):
        if quantized:
            # Serving mode: band shapes arrive as Q14 int16 (half the
            # transfer; libopus-fixed precision class).
            xraw = xraw.astype(jnp.float32) * jnp.float32(1.0 / 16384.0)
        if channels == 2:
            x = xraw[:, : 2 * n].reshape(-1, 2, n)
            x = jnp.where(mono[:, None, None], x[:, :1], x)
            le = jnp.where(mono[:, None, None], band_log_e2[:, :1], band_log_e2)
        else:
            x = xraw[:, :n].reshape(-1, 1, n)
            le = band_log_e2[:, :1]
        return inner(state, x, le, bound, pf_periods, pf_gains, pf_tapsets)

    return _maybe_checkify(step)


# --- packed serving step -----------------------------------------------
#
# The serving transport (a high-latency tunnel between the host and the
# chip) charges ~10 ms per RPC round-trip and ~50-100 MB/s effective for
# host->device bytes that interleave with executes.  The packed step is
# designed for that cost model:
#
# * ONE upload per step: plane A writes its entire output (Q14 int16 band
#   shapes + log-energies + meta + prefilter gains) straight into a single
#   contiguous int32 buffer (no host-side packing copy), which is the only
#   per-step transfer.
# * ONE execute per step: transient and long-block variants are both
#   computed inside the same program and selected per stream by the
#   short-block flag from the meta plane, so a mixed batch never needs a
#   second dispatch.  The postfilter + de-emphasis (the sequential tail)
#   run once on the selected signal.
# * Donated state AND PCM ring: no per-step device allocation churn, no
#   deletion RPCs.
# * A [2]-float digest output gives the host a cheap true-sync handle
#   (block_until_ready on this transport is advisory only — it returns
#   before the work is actually done; fetching the digest is the only
#   honest completion barrier).

#: int32 words of band-shape data per stream for each transfer mode:
#: "q14" = 1920 Q14 int16 (two per word); "pW" (W = 12/10/8) = W-bit
#: offset-binary mantissas in a little-endian bit stream, with the
#: per-band exponent folded into the uploaded band log-energies by the
#: native packer — every coefficient keeps >= W significant bits
#: relative to its band's peak.  Each width is gated by the RFC 8251
#: conformance metric (tests/test_native.py).
PACK_BITS = {"p12": 12, "p10": 10, "p8": 8}
XQ_WORDS = {"q14": 960, "p12": 720, "p10": 600, "p8": 480}


def packed_words(batch: int, mode: str = "q14", silk_words: int = 0) -> int:
    """int32 words in one packed plane-A slot (layout below)."""
    return batch * (XQ_WORDS[mode] + silk_words + 42 + 16 + 3)


def packed_offsets(batch: int, mode: str = "q14", silk_words: int = 0) -> dict:
    """Word offsets of each region in a packed slot.

    Layout (all regions contiguous, per-region stream-major):
      xq    [B, XQ_WORDS] i32 — band shapes (mode-dependent packing)
      silk  [B, silk_words] i32 — SILK PCM, int16 pairs at 48 kHz
                                  (mixed-mode slots only; 0 words otherwise)
      ble   [B, 2, 21] f32   — band log-energies
      meta  [B, 16]   int32  — silence/short/lm/ch/start/end/pf periods+tapsets
      gains [B, 3]    f32    — prefilter gains
    """
    o0 = 0
    os_ = o0 + batch * XQ_WORDS[mode]
    o1 = os_ + batch * silk_words
    o2 = o1 + batch * 42
    o3 = o2 + batch * 16
    return {"xq": o0, "silk": os_, "ble": o1, "meta": o2, "gains": o3,
            "end": o3 + batch * 3}


def _unpack_pw(words_u32, batch: int, n: int, w_bits: int):
    """[B, 2, 30*W] uint32 -> [B, 2, n] f32 mantissas/16384 (see XQ_WORDS).

    Static per-coefficient (word, shift) patterns: two takes with
    constant index vectors + vector shifts — pure VPU work.
    """
    nw = 30 * w_bits
    bit = w_bits * np.arange(960)
    widx = (bit >> 5).astype(np.int32)
    sh = (bit & 31).astype(np.uint32)
    w = jnp.take(words_u32, jnp.asarray(widx), axis=-1)  # [B, 2, 960]
    wn = jnp.take(words_u32, jnp.asarray(np.minimum(widx + 1, nw - 1)), axis=-1)
    sh_a = jnp.asarray(sh)[None, None, :]
    lo = w >> sh_a
    hi = jnp.where(sh_a == 0, jnp.uint32(0), wn << (32 - jnp.maximum(sh_a, 1)))
    m = ((lo | hi) & ((1 << w_bits) - 1)).astype(jnp.int32) - (1 << (w_bits - 1))
    return m[..., :n].astype(jnp.float32) * jnp.float32(1.0 / 16384.0)


def _silk_resample(y16, desc, hist, lm: int, channels: int):
    """Device-side SILK resampler: internal-rate planar rows -> 48 kHz.

    y16 [B, channels*Lmax] f32 (int16 scale, Lmax = frame48/3): channel-
    planar internal-rate PCM as written by the native raw_internal_out
    (silk_frontend.cpp).  desc [B] i32 = khz | (nrows-1)<<5 | reset<<6
    (0 = stream has no SILK this frame).  hist [B, C, TAIL] is the
    carried input tail (SynthState.silk_hist).

    The whole batch resamples as one dense [B*C, TAIL+Lmax] x
    [TAIL+Lmax, frame48] matmul per rate (three rates, one-hot selected)
    — MXU work instead of silk/resampler.c's per-sample IIR+FIR loops;
    the banks reproduce the normative filter cascade to fixed-point
    rounding noise (dsp/resample.py, tests/test_resample_matrix.py).

    Returns (silk48 [B, frame48, C] int16-scale f32, new_hist).
    """
    from .resample import TAIL, resample_matrices

    frame48 = (1 << lm) * modes.SHORT_MDCT_SIZE
    lmax = frame48 // 3
    mats_np, offs = resample_matrices(frame48)
    mats = jnp.asarray(mats_np)  # [3, TAIL+lmax, frame48]
    khz = desc & 0x1F
    sel = jnp.stack([khz == 8, khz == 12, khz == 16], axis=1).astype(jnp.float32)
    reset = ((desc >> 6) & 1) == 1
    y = y16.reshape(-1, channels, lmax)
    if channels == 2:
        # nrows==1: one internal row (mono SILK in a stereo API stream);
        # broadcast row 0 into both output channels.
        two_rows = ((desc >> 5) & 1) == 1
        y = jnp.where(two_rows[:, None, None], y,
                      jnp.concatenate([y[:, :1], y[:, :1]], axis=1))
    hist = jnp.where(reset[:, None, None], 0.0, hist)
    xext = jnp.concatenate([hist, y], axis=-1)  # [B, C, TAIL+lmax]
    out = jnp.einsum(
        "bct,rtf,br->bcf", xext, mats, sel,
        preferred_element_type=jnp.float32,
    )
    # Next step's tail: the last TAIL input samples at this stream's rate
    # (slice offsets are static per rate; selected like the banks).  A
    # stream with no SILK (sel all-zero) zeroes its tail, matching the
    # resampler reset libopus performs when SILK restarts after CELT.
    tails = jnp.stack(
        [xext[:, :, int(o) : int(o) + TAIL] for o in offs], axis=1
    )  # [B, 3, C, TAIL]
    new_hist = jnp.einsum("brct,br->bct", tails, sel)
    return jnp.swapaxes(out, 1, 2), new_hist


def _make_serving_core(lm: int, batch: int, channels: int, downsample: int,
                       pf_chunk: int, pf_active: bool, silk_mix: bool):
    """Shared serving-step body: (state, xs, ble, meta, gains, silk) ->
    (state, pcm_out, digest).  xs is the unit-norm band-shape plane
    [B, 2, N]; used by both the packed-spectrum and plan-executor steps."""
    n = (1 << lm) * modes.SHORT_MDCT_SIZE
    half = OVERLAP // 2
    e_bands = jnp.asarray(modes.E_BANDS, jnp.int32)

    import os

    # Pallas VMEM-resident postfilter (dsp/pallas_pf.py): the TPU default.
    # True-synced TPU A/B at B=1024 stereo (2026-08-19) measured it
    # faster at EVERY lag class and bit-exact vs the XLA postfilter:
    #   chunk 12 (worst-case lags): 22.7 vs 40.5 ms
    #   chunk 60: 5.7 vs 24.3 | chunk 120: 3.5 vs 12.0 | chunk 240: 2.4 vs 11.3
    # CPU/other backends keep the XLA lag-adaptive postfilter (the Pallas
    # kernel's pltpu.roll path is TPU-only; interpret mode is test-only).
    # OPUS_TPU_PALLAS_PF=1/0 force-overrides either way.
    _pf_env = os.environ.get("OPUS_TPU_PALLAS_PF", "")
    if _pf_env in ("0", "1"):
        use_pallas_pf = _pf_env == "1"
    else:
        import jax

        use_pallas_pf = jax.default_backend() == "tpu"

    def core(state: SynthState, xs, ble, meta, gains, silk, plc=None):
        silence = meta[:, 0] != 0
        short = meta[:, 1] != 0
        mono = meta[:, 3] == 1
        eff_end = meta[:, 5]
        periods = meta[:, 6:9]
        tapsets = meta[:, 9:12]

        if channels == 2:
            x = jnp.where(mono[:, None, None], xs[:, :1], xs)
            le = jnp.where(mono[:, None, None], ble[:, :1], ble)
        else:
            x = xs[:, :1]
            le = ble[:, :1]

        m = 1 << lm
        bound = m * jnp.take(e_bands, eff_end)
        if downsample != 1:
            bound = jnp.minimum(bound, n // downsample)
        bound = jnp.where(silence, 0, bound).astype(jnp.int32)

        freq = _denormalise(x, le, lm, bound)
        prev_tail = state.mem[..., DECODE_BUFFER_SIZE : DECODE_BUFFER_SIZE + half]
        mids_l = _imdct_blocks(freq, lm, False)
        out, tail = _overlap_add(mids_l, prev_tail, lm, False)
        if lm != 0:
            mids_s = _imdct_blocks(freq, lm, True)
            out_s, tail_s = _overlap_add(mids_s, prev_tail, lm, True)
            sel = short[:, None, None]
            out = jnp.where(sel, out_s, out)
            tail = jnp.where(sel, tail_s, tail)

        hist = DECODE_BUFFER_SIZE - n
        y = jnp.concatenate([state.mem[..., n:DECODE_BUFFER_SIZE], out], axis=-1)
        if pf_active:
            # Row count must tile into Mosaic-friendly blocks; odd batch
            # shapes keep the XLA path rather than risk a whole-array
            # VMEM block.
            if use_pallas_pf and (y.shape[0] * y.shape[1]) % 8 == 0:
                from .pallas_pf import pallas_postfilter

                y = pallas_postfilter(y, hist, n, lm, periods, gains, tapsets,
                                      pf_chunk)
            else:
                y = _postfilter(y, hist, n, lm, periods, gains, tapsets, pf_chunk)
        out_f = y[..., hist:]

        if plc is not None:
            # Device-resident pitch-regime loss concealment: replace lost
            # streams' frame (pre-de-emphasis) and decode memory with the
            # concealment's (opus_tpu/dsp/plc_exec.py).
            plc_mask, out_f_c, mem_c = plc
            out_f = jnp.where(plc_mask[:, None, None], out_f_c, out_f)

        ys, new_preemph = _deemphasis(out_f, state.preemph)
        pcm = ys[..., ::downsample] * (1.0 / 32768.0)

        new_mem = jnp.concatenate(
            [
                state.mem[..., n:DECODE_BUFFER_SIZE],
                out_f,
                tail,
                jnp.zeros_like(state.mem[..., : OVERLAP - half]),
            ],
            axis=-1,
        )
        if plc is not None:
            new_mem = jnp.where(plc_mask[:, None, None], mem_c, new_mem)
        pcm_out = jnp.transpose(pcm, (0, 2, 1)).astype(jnp.float32)
        if silk_mix:
            # decoder.rs:722-729: out = celt + silk/32768 in the time domain.
            pcm_out = pcm_out + silk.astype(jnp.float32) * jnp.float32(1.0 / 32768.0)
        digest = jnp.stack([pcm_out[0, 0, 0], pcm_out[-1, -1, -1]])
        return SynthState(mem=new_mem, preemph=new_preemph), pcm_out, digest

    return core


def make_serving_step(lm: int, batch: int, channels: int = 2, downsample: int = 1,
                      pf_chunk: int = _CHUNK, pf_active: bool = True,
                      transfer: str = "q14", silk_mix: bool = False,
                      silk_internal: bool = False,
                      with_plc: bool | int = False):
    """Single-dispatch serving step over one packed plane-A buffer.

    step(state, ring, buf) -> (state, ring, digest[2]); jitted with
    state+ring donated.  `ring` is the PCM output buffer
    [B, frame, C]; reusing it via donation avoids allocating (and later
    remotely deleting) ~8 MB per step.

    pf_chunk/pf_active specialise the postfilter (the sequential device
    tail, >80% of step time at chunk 12): the host picks them per step
    from the batch's actual lags/gains via pf_chunk_for().
    """
    n = (1 << lm) * modes.SHORT_MDCT_SIZE
    assert not (silk_mix and downsample != 1), "mixed serving mixes at 48 kHz"
    silk_samps = ((n // 3) if silk_internal else n) * channels
    silk_words = (silk_samps + 1) // 2 if silk_mix else 0
    off = packed_offsets(batch, transfer, silk_words)

    def unpack(buf):
        xq_w = buf[off["xq"] : off["silk"]]
        if transfer in PACK_BITS:
            w_bits = PACK_BITS[transfer]
            xs = _unpack_pw(
                jax.lax.bitcast_convert_type(xq_w, jnp.uint32).reshape(
                    batch, 2, 30 * w_bits
                ),
                batch, n, w_bits,
            )
        else:
            xq = jax.lax.bitcast_convert_type(
                xq_w.reshape(batch, 960), jnp.int16
            ).reshape(batch, 1920)
            xs = (xq[:, : 2 * n].astype(jnp.float32) * jnp.float32(1.0 / 16384.0)).reshape(
                batch, 2, n
            )
        ble = jax.lax.bitcast_convert_type(
            buf[off["ble"] : off["meta"]], jnp.float32
        ).reshape(batch, 2, 21)
        meta = buf[off["meta"] : off["gains"]].reshape(batch, 16)
        gains = jax.lax.bitcast_convert_type(
            buf[off["gains"] : off["end"]], jnp.float32
        ).reshape(batch, 3)
        silk = None
        if silk_mix:
            silk = jax.lax.bitcast_convert_type(
                buf[off["silk"] : off["ble"]].reshape(batch, silk_words), jnp.int16
            ).reshape(batch, 2 * silk_words)[:, :silk_samps]
            if not silk_internal:
                silk = silk.reshape(batch, n, channels)
        return xs, ble, meta, gains, silk

    core = _make_serving_core(lm, batch, channels, downsample, pf_chunk,
                              pf_active, silk_mix)

    def prep(state, meta, silk):
        if not silk_internal:
            return None, silk
        silk, new_hist = _silk_resample(
            silk.astype(jnp.float32), meta[:, 12] & 0xFF,
            state.silk_hist, lm, channels,
        )
        return new_hist, silk

    if not with_plc:
        def step(state: SynthState, ring, buf):
            xs, ble, meta, gains, silk = unpack(buf)
            new_hist, silk = prep(state, meta, silk)
            new_state, pcm_out, digest = core(state, xs, ble, meta, gains, silk)
            if silk_internal:
                new_state = new_state._replace(silk_hist=new_hist)
            return new_state, pcm_out, digest

        return _maybe_checkify(step, donate=(0, 1))

    # with_plc: device pitch-regime loss concealment compiled into the
    # packed step — the plan path's contract (see make_plan_serving_step)
    # for the mixed pipeline's spectral fallback: lost streams flagged in
    # meta[14] conceal from the device decode memory.
    from .plan_exec import _f16_to_f32_j as _f16j
    from .plc_exec import make_plc_conceal, make_plc_conceal_compact

    # with_plc=True: full-batch conceal; int k: compact capacity (see
    # make_plan_serving_step — same contract, same serve-loop pick).
    if with_plc is True:
        conceal = make_plc_conceal(lm, batch, channels)
    else:
        conceal = make_plc_conceal_compact(lm, batch, int(with_plc), channels)

    def step_plc(state: SynthState, ring, buf, plc_lpc, plc_pitch):
        xs, ble, meta, gains, silk = unpack(buf)
        new_hist, silk = prep(state, meta, silk)
        plc_mask = (meta[:, 14] & 1) == 1
        first = ((meta[:, 14] >> 1) & 1) == 1
        m15 = jax.lax.bitcast_convert_type(meta[:, 15], jnp.uint32)
        u_period = (m15 & 0x7FF).astype(jnp.int32)
        u_tapset = ((m15 >> 11) & 3).astype(jnp.int32)
        u_gain = _f16j((m15 >> 16) & 0xFFFF)
        if with_plc is True:
            mem_c, new_lpc, new_pitch, out_f_c = conceal(
                state.mem, plc_lpc, plc_pitch, first, u_period, u_gain,
                u_tapset
            )
        else:
            mem_c, new_lpc, new_pitch, out_f_c = conceal(
                state.mem, plc_lpc, plc_pitch, plc_mask, first, u_period,
                u_gain, u_tapset
            )
        new_state, pcm_out, digest = core(
            state, xs, ble, meta, gains, silk,
            plc=(plc_mask, out_f_c, mem_c),
        )
        if silk_internal:
            new_state = new_state._replace(silk_hist=new_hist)
        new_lpc = jnp.where(plc_mask[:, None, None], new_lpc, plc_lpc)
        new_pitch = jnp.where(plc_mask, new_pitch, plc_pitch)
        return new_state, pcm_out, digest, new_lpc, new_pitch

    return _maybe_checkify(step_plc, donate=(0, 1, 3, 4))


def make_plan_serving_step(lm: int, batch: int, channels: int = 2,
                           downsample: int = 1, pf_chunk: int = _CHUNK,
                           pf_active: bool = True, arena_words: int = 0,
                           with_plc: bool | int = False, silk_mix: bool = False,
                           silk_rows: int = 0, silk_internal: bool = False,
                           size_class: tuple = (224, 64, 192)):
    """Serving step over a plan-executor slot (opus_tpu/dsp/plan_exec.py).

    Same contract as make_serving_step, but the uploaded buffer holds
    plane A's pulse-vector plan (header/ble/meta/gains/bands + a
    variable-fill arena whose used prefix is bucketed by the caller)
    instead of a packed spectrum; the band spectra are rebuilt on device
    by the plan executor before the shared synthesis core runs.

    silk_mix=True adds the mixed pipeline's SILK PCM: an smap [B] word in
    the fixed regions maps each stream to a row of the COMPACTED int16
    PCM block that rides after the arena bucket (silk_rows rows, a
    static bucket; frontend.compact_plan_silk / pack_plan_silk).  The
    device expands rows with a one-hot matmul — an out-of-range smap
    (CELT-only streams) selects the zero row — and the core mixes the
    result after synthesis (decoder.rs:722-729).  Mixed losses need no
    device PLC: plane A conceals SILK exactly and emits the CELT
    concealment as plan noise leaves.

    with_plc=True compiles the device pitch-regime loss concealment
    (opus_tpu/dsp/plc_exec.py) into the step: lost streams flagged in
    meta[14] are concealed from the device-resident decode memory, with
    LPC/pitch carried as extra donated device state —
    step(state, ring, buf, plc_lpc, plc_pitch) ->
    (state, ring, digest, plc_lpc, plc_pitch).  The host picks this
    variant only for steps that actually contain pitch-regime losses.
    """
    from .plan_exec import make_plan_executor, _f16_to_f32_j

    B = batch
    NBv = modes.NB_E_BANDS
    # Plan-v4.1 packed fixed regions (frontend.py pack_plan_fixed
    # contract): header [B,2] (iy_rel derived on device), ble Q9 pairs
    # [B,21], dmeta [B,5], bands w0 24-bit stream [B,16], bands eff
    # bit-stream [B,8], then the arena tail.
    n_ = (1 << lm) * modes.SHORT_MDCT_SIZE
    assert not (silk_mix and downsample != 1), "mixed serving mixes at 48 kHz"
    silk_samps = ((n_ // 3) if silk_internal else n_) * channels
    silk_words = (silk_samps + 1) // 2 if silk_mix else 0
    o_hdr = 0
    o_ble = o_hdr + B * 2
    o_dmeta = o_ble + B * NBv
    o_bw0 = o_dmeta + B * 5
    o_beff = o_bw0 + B * 16
    o_smap = o_beff + B * 8
    o_arena = o_smap + (B if silk_mix else 0)
    # compacted silk rows land right after this step's arena bucket
    o_srows = o_arena + B * arena_words
    # size_class = (p_max, f_max, iyw): the executor's gather windows and
    # interval-einsum widths, picked per step by the serve loop from the
    # slot's actual maxima (batch/pipeline.py PLAN_CLASSES).
    p_max, f_max, iyw = size_class
    executor = make_plan_executor(lm, batch, p_max=p_max, f_max=f_max,
                                  iyw=iyw)
    core = _make_serving_core(lm, batch, channels, downsample, pf_chunk,
                              pf_active, silk_mix)

    def unpack(buf):
        header = buf[o_hdr:o_ble].reshape(B, 2)
        blew = buf[o_ble:o_dmeta].reshape(B, NBv)
        # Q9 int16 pairs -> f32 log-energies (int32 >> is arithmetic, so
        # the << 16 >> 16 round-trip sign-extends the low half).
        ble = jnp.stack(
            [
                ((blew << 16) >> 16).astype(jnp.float32),
                (blew >> 16).astype(jnp.float32),
            ],
            axis=1,
        ) * jnp.float32(1.0 / 512.0)
        d = buf[o_dmeta:o_bw0].reshape(B, 5)
        d0, d1 = d[:, 0], d[:, 1]
        d2u = jax.lax.bitcast_convert_type(d[:, 2], jnp.uint32)
        d3u = jax.lax.bitcast_convert_type(d[:, 3], jnp.uint32)
        # meta[12]: the SILK internal-rate descriptor (khz/rows/reset),
        # packed into d3's free upper half by pack_plan_fixed.
        z = ((d3u >> 16) & 0xFF).astype(jnp.int32)
        meta = jnp.stack(
            [
                d0 & 1,                                  # 0 silence
                (d0 >> 1) & 1,                           # 1 short blocks
                jnp.full((B,), lm, jnp.int32),           # 2 lm
                jnp.where(((d0 >> 2) & 1) == 1, 1, 2),   # 3 coded channels
                jnp.where(((d0 >> 3) & 1) == 1, 17, 0),  # 4 start band
                (d0 >> 8) & 0x1F,                        # 5 eff_end
                d1 & 0x7FF,                              # 6 pf period0
                (d1 >> 11) & 0x7FF,                      # 7 pf period1
                (d0 >> 19) & 0x7FF,                      # 8 pf period2
                (d0 >> 13) & 3,                          # 9 pf tapset0
                (d0 >> 15) & 3,                          # 10 pf tapset1
                (d0 >> 17) & 3,                          # 11 pf tapset2
                z,                                       # 12 silk desc
                (d0 >> 6) & 3,                           # 13 spread
                (d0 >> 4) & 3,                           # 14 plc flags
                d[:, 4],                                 # 15 plc params
            ],
            axis=1,
        )
        gains = jnp.stack(
            [
                _f16_to_f32_j(d2u & 0xFFFF),
                _f16_to_f32_j((d2u >> 16) & 0xFFFF),
                _f16_to_f32_j(d3u & 0xFFFF),
            ],
            axis=1,
        )
        bands = jnp.concatenate(
            [buf[o_bw0:o_beff].reshape(B, 16), buf[o_beff:o_smap].reshape(B, 8)],
            axis=1,
        )
        silk = None
        if silk_mix and silk_rows > 0:
            # Expand the compacted rows: smap one-hot rides the MXU
            # (int16 magnitudes < 2^24 are exact in f32 accumulation);
            # out-of-range smap (CELT-only streams) selects no row.
            srows = jax.lax.bitcast_convert_type(
                buf[o_srows : o_srows + silk_rows * silk_words
                    ].reshape(silk_rows, silk_words), jnp.int16
            ).reshape(silk_rows, 2 * silk_words)[:, :silk_samps]
            smap = buf[o_smap:o_arena]
            oh = (smap[:, None] == jnp.arange(silk_rows)[None, :]).astype(
                jnp.float32
            )
            silk = jnp.einsum(
                "br,rk->bk", oh, srows.astype(jnp.float32),
                preferred_element_type=jnp.float32, precision="highest",
            )
            if not silk_internal:
                silk = silk.reshape(B, n_, channels)
        elif silk_mix:
            silk = (jnp.zeros((B, silk_samps), jnp.float32) if silk_internal
                    else jnp.zeros((B, n_, channels), jnp.float32))
        arena = buf[o_arena : o_arena + B * arena_words] if silk_mix else buf[o_arena:]
        return header, ble, meta, gains, bands, silk, arena

    def resample_if_internal(state, meta, silk):
        if not silk_internal:
            return state, silk
        silk, new_hist = _silk_resample(
            silk, meta[:, 12] & 0xFF, state.silk_hist, lm, channels
        )
        return state._replace(silk_hist=new_hist), silk

    if not with_plc:
        def step(state: SynthState, ring, buf):
            header, ble, meta, gains, bands, silk, arena = unpack(buf)
            xs = executor(header, bands, meta, arena)
            hstate, silk = resample_if_internal(state, meta, silk)
            new_state, pcm_out, digest = core(state, xs, ble, meta, gains, silk)
            if silk_internal:
                new_state = new_state._replace(silk_hist=hstate.silk_hist)
            return new_state, pcm_out, digest

        return _maybe_checkify(step, donate=(0, 1))

    from .plc_exec import make_plc_conceal, make_plc_conceal_compact

    # with_plc compiles the device pitch-regime conceal into the step; in
    # the mixed (silk_mix) loop it serves steps whose CELT-only members
    # hit a first loss (SILK/hybrid losses are still concealed in plane A
    # — a pitch-regime CELT stream ships an empty plan + meta flags).
    # with_plc=True conceals the FULL batch (~120 ms at B=1024 on TPU);
    # with_plc=<int k> is the COMPACT variant — the conceal runs on a
    # k-capacity sub-batch of the flagged streams (the serve loop picks
    # it when the step's loss count fits, i.e. almost always: at 5% loss
    # and B=1024 the count is ~51 +- 7).
    if with_plc is True:
        conceal = make_plc_conceal(lm, batch, channels)
    else:
        conceal = make_plc_conceal_compact(lm, batch, int(with_plc), channels)

    def step_plc(state: SynthState, ring, buf, plc_lpc, plc_pitch):
        header, ble, meta, gains, bands, silk, arena = unpack(buf)
        xs = executor(header, bands, meta, arena)
        hstate, silk = resample_if_internal(state, meta, silk)
        plc_mask = (meta[:, 14] & 1) == 1
        first = ((meta[:, 14] >> 1) & 1) == 1
        m15 = jax.lax.bitcast_convert_type(meta[:, 15], jnp.uint32)
        u_period = (m15 & 0x7FF).astype(jnp.int32)
        u_tapset = ((m15 >> 11) & 3).astype(jnp.int32)
        u_gain = _f16_to_f32_j((m15 >> 16) & 0xFFFF)
        if with_plc is True:
            mem_c, new_lpc, new_pitch, out_f_c = conceal(
                state.mem, plc_lpc, plc_pitch, first, u_period, u_gain,
                u_tapset
            )
        else:
            mem_c, new_lpc, new_pitch, out_f_c = conceal(
                state.mem, plc_lpc, plc_pitch, plc_mask, first, u_period,
                u_gain, u_tapset
            )
        new_state, pcm_out, digest = core(
            state, xs, ble, meta, gains, silk,
            plc=(plc_mask, out_f_c, mem_c),
        )
        if silk_internal:
            new_state = new_state._replace(silk_hist=hstate.silk_hist)
        new_lpc = jnp.where(plc_mask[:, None, None], new_lpc, plc_lpc)
        new_pitch = jnp.where(plc_mask, new_pitch, plc_pitch)
        return new_state, pcm_out, digest, new_lpc, new_pitch

    return _maybe_checkify(step_plc, donate=(0, 1, 3, 4))


def make_opus_step(lm: int, short_blocks: bool, channels: int = 2, downsample: int = 1):
    """Mode-mux serving step: CELT synthesis + SILK mix (decoder.rs:722-729).

    Like make_pipeline_step plus a silk48 plane: interleaved int16 PCM at
    the output rate from the native SILK driver (zeros for CELT-only
    streams; the whole signal for SILK-only streams, whose CELT spectra
    are bound-masked to silence).  out = celt + silk/32768.
    """
    n = (1 << lm) * modes.SHORT_MDCT_SIZE
    inner = make_pipeline_step(lm, short_blocks, channels, downsample)

    def step(state, xraw, mono, band_log_e2, bound, pf_periods, pf_gains, pf_tapsets, silk48):
        state, pcm = inner(state, xraw, mono, band_log_e2, bound, pf_periods, pf_gains, pf_tapsets)
        silk = silk48[:, : (n // downsample) * channels].reshape(-1, n // downsample, channels)
        return state, pcm + silk.astype(jnp.float32) * jnp.float32(1.0 / 32768.0)

    return _maybe_checkify(step)
