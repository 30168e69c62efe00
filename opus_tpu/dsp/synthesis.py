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


class SynthState(NamedTuple):
    """Per-stream synthesis state (a pytree; leading axes [B, C])."""

    mem: jax.Array  # [B, C, DECODE_BUFFER_SIZE + OVERLAP]
    preemph: jax.Array  # [B, C]


def init_state(batch: int, channels: int = 2) -> SynthState:
    return SynthState(
        mem=jnp.zeros((batch, channels, DECODE_BUFFER_SIZE + OVERLAP), jnp.float32),
        preemph=jnp.zeros((batch, channels), jnp.float32),
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


def _denormalise(x, band_log_e, lm, bound):
    """freq = x * exp2(logE + eMeans), masked above `bound` bins."""
    n = (1 << lm) * modes.SHORT_MDCT_SIZE
    lg = band_log_e + jnp.asarray(E_MEANS[: modes.NB_E_BANDS], jnp.float32)
    g = jnp.exp2(jnp.minimum(32.0, lg))  # [B, C, 21]
    gain_bins = jnp.take(g, jnp.asarray(_band_of_bin(lm)), axis=-1)  # [B, C, N]
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

        # --- post-filter (two segments like libopus comb_filter calls) ----
        hist = DECODE_BUFFER_SIZE - n  # history available before out
        y = jnp.concatenate([state.mem[..., n:DECODE_BUFFER_SIZE], out], axis=-1)
        w2 = jnp.asarray((modes.WINDOW.astype(np.float64) ** 2).astype(np.float32))
        gains_tbl = jnp.asarray(np.array(GAINS, np.float32))

        # Crossfade envelope: w^2 over the first OVERLAP samples, then 1
        # (pure new filter). Extended with ones so any chunk can index it.
        w_ext = jnp.concatenate([w2, jnp.ones(n, jnp.float32)])

        def seg(y, off, ln, p_a, g_a, t_a, p_b, g_b, t_b):
            """In-place 5-tap comb over y[off:off+ln], crossfading filter A
            (lag p_a, gains from tapset t_a) into filter B.  Sequential in
            lag-safe chunks via fori_loop; each chunk is batch-parallel."""
            assert ln % _CHUNK == 0
            ga = gains_tbl[t_a] * g_a[..., None]
            gb = gains_tbl[t_b] * g_b[..., None]
            same = (g_a == g_b) & (p_a == p_b) & (t_a == t_b)
            zero = (g_a == 0.0) & (g_b == 0.0)

            def tap5(yy, pos, t, taps):
                # Lags are clamped to >= MIN_PERIOD like libopus comb_filter
                # (zero-gain filters still evaluate); the clip keeps the
                # +-2-tap gathers in range even for a lag-0 feed — XLA CPU
                # clamps out-of-bounds gathers but TPU returns garbage.
                t = jnp.maximum(t, 15)
                base = jnp.clip(pos - t[:, None, None], 2, yy.shape[-1] - 3)
                s = jnp.take_along_axis(yy, base, axis=-1)
                s1 = jnp.take_along_axis(yy, base + 1, axis=-1) + jnp.take_along_axis(yy, base - 1, axis=-1)
                s2 = jnp.take_along_axis(yy, base + 2, axis=-1) + jnp.take_along_axis(yy, base - 2, axis=-1)
                return (
                    taps[:, 0][:, None, None] * s
                    + taps[:, 1][:, None, None] * s1
                    + taps[:, 2][:, None, None] * s2
                )

            def body(ci, y):
                i0 = off + ci * _CHUNK
                pos = i0 + jnp.arange(_CHUNK)[None, None, :]
                rel = ci * _CHUNK + jnp.arange(_CHUNK)
                w_here = jnp.take(w_ext, jnp.minimum(rel, w_ext.shape[0] - 1))[None, None, :]
                w_here = jnp.where(same[:, None, None], 1.0, w_here)
                contrib = (1.0 - w_here) * tap5(y, pos, p_a, ga) + w_here * tap5(y, pos, p_b, gb)
                contrib = jnp.where(zero[:, None, None], 0.0, contrib)
                cur = jax.lax.dynamic_slice_in_dim(y, i0, _CHUNK, axis=-1)
                return jax.lax.dynamic_update_slice_in_dim(y, cur + contrib, i0, axis=-1)

            return jax.lax.fori_loop(0, ln // _CHUNK, body, y)

        p0, p1, p2 = pf_periods[:, 0], pf_periods[:, 1], pf_periods[:, 2]
        g0, g1, g2 = pf_gains[:, 0], pf_gains[:, 1], pf_gains[:, 2]
        t0, t1, t2 = pf_tapsets[:, 0], pf_tapsets[:, 1], pf_tapsets[:, 2]
        y = seg(y, hist, modes.SHORT_MDCT_SIZE, p0, g0, t0, p1, g1, t1)
        if lm != 0:
            y = seg(y, hist + modes.SHORT_MDCT_SIZE, n - modes.SHORT_MDCT_SIZE, p1, g1, t1, p2, g2, t2)
        out_f = y[..., hist:]

        # --- de-emphasis IIR via associative scan --------------------------
        xin = out_f + 1e-30
        coef = jnp.float32(modes.PREEMPH)

        def combine(a, b):
            # (m1, s1) o (m2, s2): y = s2 + m2*s1 composition of y=m*yprev+s
            return (a[0] * b[0], b[1] + b[0] * a[1])

        m_arr = jnp.full_like(xin, coef)
        # y[t] = x[t] + coef*y[t-1]; incorporate carried preemph state.
        x0 = xin.at[..., 0].add(state.preemph)
        _, ys = jax.lax.associative_scan(combine, (m_arr, x0), axis=-1)
        scratch = ys
        new_preemph = coef * scratch[..., -1]
        pcm = scratch[..., ::downsample] * (1.0 / 32768.0)

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
    return jax.jit(step)


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

    return jax.jit(step)


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

def packed_words(batch: int) -> int:
    """int32 words in one packed plane-A slot (layout below)."""
    return batch * (960 + 42 + 16 + 3)


def packed_offsets(batch: int) -> dict:
    """Word offsets of each region in a packed slot.

    Layout (all regions contiguous, per-region stream-major):
      xq    [B, 1920] int16  — Q14 band shapes, 2 ch x 960 bins
      ble   [B, 2, 21] f32   — band log-energies
      meta  [B, 16]   int32  — silence/short/lm/ch/start/end/pf periods+tapsets
      gains [B, 3]    f32    — prefilter gains
    """
    o0 = 0
    o1 = o0 + batch * 960
    o2 = o1 + batch * 42
    o3 = o2 + batch * 16
    return {"xq": o0, "ble": o1, "meta": o2, "gains": o3, "end": o3 + batch * 3}


def make_serving_step(lm: int, batch: int, channels: int = 2, downsample: int = 1):
    """Single-dispatch serving step over one packed plane-A buffer.

    step(state, ring, buf) -> (state, ring, digest[2]); jitted with
    state+ring donated.  `ring` is the PCM output buffer
    [B, frame, C]; reusing it via donation avoids allocating (and later
    remotely deleting) ~8 MB per step.
    """
    n = (1 << lm) * modes.SHORT_MDCT_SIZE
    half = OVERLAP // 2
    off = packed_offsets(batch)
    e_bands = jnp.asarray(modes.E_BANDS, jnp.int32)

    def unpack(buf):
        xq_w = buf[off["xq"] : off["ble"]].reshape(batch, 960)
        xq = jax.lax.bitcast_convert_type(xq_w, jnp.int16).reshape(batch, 1920)
        ble = jax.lax.bitcast_convert_type(
            buf[off["ble"] : off["meta"]], jnp.float32
        ).reshape(batch, 2, 21)
        meta = buf[off["meta"] : off["gains"]].reshape(batch, 16)
        gains = jax.lax.bitcast_convert_type(
            buf[off["gains"] : off["end"]], jnp.float32
        ).reshape(batch, 3)
        return xq, ble, meta, gains

    def step(state: SynthState, ring, buf):
        xq, ble, meta, gains = unpack(buf)
        silence = meta[:, 0] != 0
        short = meta[:, 1] != 0
        mono = meta[:, 3] == 1
        eff_end = meta[:, 5]
        periods = meta[:, 6:9]
        tapsets = meta[:, 9:12]

        x2 = xq[:, : 2 * n].astype(jnp.float32) * jnp.float32(1.0 / 16384.0)
        if channels == 2:
            x = x2.reshape(batch, 2, n)
            x = jnp.where(mono[:, None, None], x[:, :1], x)
            le = jnp.where(mono[:, None, None], ble[:, :1], ble)
        else:
            x = x2[:, :n].reshape(batch, 1, n)
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

        # --- postfilter + de-emphasis: same tail as make_synthesis_step ---
        hist = DECODE_BUFFER_SIZE - n
        y = jnp.concatenate([state.mem[..., n:DECODE_BUFFER_SIZE], out], axis=-1)
        w2 = jnp.asarray((modes.WINDOW.astype(np.float64) ** 2).astype(np.float32))
        gains_tbl = jnp.asarray(np.array(GAINS, np.float32))
        w_ext = jnp.concatenate([w2, jnp.ones(n, jnp.float32)])

        def seg(y, off_, ln, p_a, g_a, t_a, p_b, g_b, t_b):
            assert ln % _CHUNK == 0
            ga = gains_tbl[t_a] * g_a[..., None]
            gb = gains_tbl[t_b] * g_b[..., None]
            same = (g_a == g_b) & (p_a == p_b) & (t_a == t_b)
            zero = (g_a == 0.0) & (g_b == 0.0)

            def tap5(yy, pos, t, taps):
                t = jnp.maximum(t, 15)
                base = jnp.clip(pos - t[:, None, None], 2, yy.shape[-1] - 3)
                s = jnp.take_along_axis(yy, base, axis=-1)
                s1 = jnp.take_along_axis(yy, base + 1, axis=-1) + jnp.take_along_axis(yy, base - 1, axis=-1)
                s2 = jnp.take_along_axis(yy, base + 2, axis=-1) + jnp.take_along_axis(yy, base - 2, axis=-1)
                return (
                    taps[:, 0][:, None, None] * s
                    + taps[:, 1][:, None, None] * s1
                    + taps[:, 2][:, None, None] * s2
                )

            def body(ci, y):
                i0 = off_ + ci * _CHUNK
                pos = i0 + jnp.arange(_CHUNK)[None, None, :]
                rel = ci * _CHUNK + jnp.arange(_CHUNK)
                w_here = jnp.take(w_ext, jnp.minimum(rel, w_ext.shape[0] - 1))[None, None, :]
                w_here = jnp.where(same[:, None, None], 1.0, w_here)
                contrib = (1.0 - w_here) * tap5(y, pos, p_a, ga) + w_here * tap5(y, pos, p_b, gb)
                contrib = jnp.where(zero[:, None, None], 0.0, contrib)
                cur = jax.lax.dynamic_slice_in_dim(y, i0, _CHUNK, axis=-1)
                return jax.lax.dynamic_update_slice_in_dim(y, cur + contrib, i0, axis=-1)

            return jax.lax.fori_loop(0, ln // _CHUNK, body, y)

        p0, p1, p2 = periods[:, 0], periods[:, 1], periods[:, 2]
        g0, g1, g2 = gains[:, 0], gains[:, 1], gains[:, 2]
        t0, t1, t2 = tapsets[:, 0], tapsets[:, 1], tapsets[:, 2]
        y = seg(y, hist, modes.SHORT_MDCT_SIZE, p0, g0, t0, p1, g1, t1)
        if lm != 0:
            y = seg(y, hist + modes.SHORT_MDCT_SIZE, n - modes.SHORT_MDCT_SIZE, p1, g1, t1, p2, g2, t2)
        out_f = y[..., hist:]

        xin = out_f + 1e-30
        coef = jnp.float32(modes.PREEMPH)

        def combine(a, b):
            return (a[0] * b[0], b[1] + b[0] * a[1])

        m_arr = jnp.full_like(xin, coef)
        x0 = xin.at[..., 0].add(state.preemph)
        _, ys = jax.lax.associative_scan(combine, (m_arr, x0), axis=-1)
        new_preemph = coef * ys[..., -1]
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
        pcm_out = jnp.transpose(pcm, (0, 2, 1)).astype(jnp.float32)
        digest = jnp.stack([pcm_out[0, 0, 0], pcm_out[-1, -1, -1]])
        return SynthState(mem=new_mem, preemph=new_preemph), pcm_out, digest

    return jax.jit(step, donate_argnums=(0, 1))


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

    return jax.jit(step)
