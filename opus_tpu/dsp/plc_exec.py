"""Batched pitch-regime CELT loss concealment on device.

The scalar concealment (opus_tpu/celt/plc.py decode_lost, pitch branch —
reference PLC state machine decoder.rs:427-513) needs the decode memory,
which in the serving pipeline lives on device (SynthState.mem).  This
module reimplements the whole pitch regime as a jitted batched step so
lost frames never leave the packed loop:

* pitch search: 2x downsample + whitening, coarse 4x + fine 2x
  cross-correlations as batched matmuls, the two-best tracking as a
  lax.scan (the clamped running energy is a max-affine scan);
* LPC: windowed autocorrelation (matmul), lag window, order-24
  Levinson-Durbin as a masked fori (the early-exit freezes per stream);
* excitation FIR, periodic extrapolation (closed-form wrap counts and
  decay powers), order-24 LPC synthesis as a lax.scan over samples;
* explosion check, fade blend, post-filter undo and TDAC simulation on
  the tail — all masked elementwise.

Float32 on device vs the scalar path's float64 means near-tie pitch
candidates can resolve differently; both are legal concealments, so the
gates are pitch-index equality on realistic content plus a conformance
quality score against the scalar concealment (tests/test_plc_exec.py).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from ..celt import modes
from ..celt.comb_filter import GAINS
from ..celt.decoder import DECODE_BUFFER_SIZE

MAX_PERIOD = 1024
LPC_ORDER = 24
LAG_MAX = 720
LAG_MIN = 100
OVERLAP = modes.OVERLAP


def _xcorr(x, y, n_lags):
    """xcorr[b, i] = dot(x[b], y[b, i:i+len(x)]) for i in [0, n_lags)."""
    lx = x.shape[-1]
    # One matmul per batch row via gather-free sliding windows: frame y
    # into [B, n_lags, lx] with a strided gather, then einsum.
    idx = jnp.arange(n_lags)[:, None] + jnp.arange(lx)[None, :]
    yw = y[:, idx]  # [B, n_lags, lx]
    return jnp.einsum("bl,bil->bi", x, yw, precision=jax.lax.Precision.HIGHEST)


def _find_best_pitch(xcorr, y, length, n_lags):
    """Batched two-best tracking (plc.py _find_best_pitch semantics)."""
    B = xcorr.shape[0]
    y2 = y * y
    syy0 = 1.0 + jnp.sum(y2[:, :length], axis=-1)
    # syy_i = max(1, syy_{i-1} + y2[i+length-1+1... (delta at step i uses
    # y[i+length]^2 - y[i]^2 AFTER processing lag i) -> track in the scan.
    deltas = y2[:, length : length + n_lags] - y2[:, :n_lags]  # [B, n_lags]

    def step(state, inp):
        bn0, bd0, bp0, bn1, bd1, bp1, syy, i = state
        xc, dl = inp
        pos = xc > 0
        x16 = xc * 1e-12
        num = x16 * x16
        better1 = pos & (num * bd1 > bn1 * syy)
        # the second-best check only runs when the first passed (plc.py)
        better0 = better1 & (num * bd0 > bn0 * syy)
        nbn1 = jnp.where(better0, bn0, jnp.where(better1, num, bn1))
        nbd1 = jnp.where(better0, bd0, jnp.where(better1, syy, bd1))
        nbp1 = jnp.where(better0, bp0, jnp.where(better1, i, bp1))
        nbn0 = jnp.where(better0, num, bn0)
        nbd0 = jnp.where(better0, syy, bd0)
        nbp0 = jnp.where(better0, i, bp0)
        nsyy = jnp.maximum(1.0, syy + dl)
        return (nbn0, nbd0, nbp0, nbn1, nbd1, nbp1, nsyy, i + 1), None

    init = (
        jnp.full((B,), -1.0), jnp.zeros(B), jnp.zeros(B, jnp.int32),
        jnp.full((B,), -1.0), jnp.zeros(B), jnp.ones(B, jnp.int32),
        syy0, jnp.zeros((), jnp.int32),
    )
    (bn0, bd0, bp0, bn1, bd1, bp1, _, _), _ = jax.lax.scan(
        step, init, (xcorr.T, deltas.T)
    )
    return bp0, bp1


def _levinson(ac, order):
    """Batched Levinson-Durbin (plc.py celt_lpc): ac [B, order+1] -> lpc.

    The reference's paired half-loop update equals the full symmetric
    form new[p] = old[p] + r*old[i-1-p] for every p < i (the odd-i middle
    coefficient resolves identically), which vectorises cleanly; the
    early break freezes per stream via a dead mask."""
    B = ac.shape[0]
    lpc = jnp.zeros((B, order))
    error = ac[:, 0]
    p = jnp.arange(order)

    def body(i, carry):
        lpc, error, dead = carry
        # rr = sum_{j<i} lpc[j] * ac[i-j] + ac[i+1]
        acg = jnp.take_along_axis(
            ac, jnp.clip(i - p, 0, order)[None, :].repeat(B, 0), axis=1
        )
        rr = jnp.sum(jnp.where((p < i)[None, :], lpc * acg, 0.0), axis=1)
        rr = rr + jnp.take_along_axis(ac, jnp.full((B, 1), 0) + i + 1, axis=1)[:, 0]
        r = -rr / jnp.where(error == 0, 1.0, error)
        old_rev = jnp.take_along_axis(
            lpc, jnp.clip(i - 1 - p, 0, order - 1)[None, :].repeat(B, 0), axis=1
        )
        upd = jnp.where((p < i)[None, :], lpc + r[:, None] * old_rev, lpc)
        upd = jnp.where((p == i)[None, :], r[:, None], upd)
        err_new = error - r * r * error
        new_dead = dead | (err_new < 0.001 * ac[:, 0])
        lpc_out = jnp.where(dead[:, None], lpc, upd)
        err_out = jnp.where(dead, error, err_new)
        return lpc_out, err_out, new_dead

    lpc, _, _ = jax.lax.fori_loop(0, order, body, (lpc, error, ac[:, 0] == 0.0))
    return lpc


def make_pitch_search(batch: int):
    """Batched plc_pitch_search: mem [B, C, >=2048] -> pitch index [B]."""

    def search(mem, channels_mask=None):
        B = batch
        x = mem[:, :, :2048].astype(jnp.float32)
        cc = x.shape[1]
        half = 1024
        # pitch_downsample: sum over channels of the 3-tap smoother.
        xs = jnp.sum(x, axis=1) if cc > 1 else x[:, 0]
        lp = jnp.zeros((B, half))
        i = jnp.arange(1, half)
        lp = lp.at[:, 1:].set(
            0.25 * (xs[:, 2 * i - 1] + xs[:, 2 * i + 1]) + 0.5 * xs[:, 2 * i]
        )
        lp = lp.at[:, 0].set(0.25 * xs[:, 1] + 0.5 * xs[:, 0])
        # autocorr(4) + bias + lag window
        ac = jnp.stack(
            [jnp.sum(lp[:, lag:] * lp[:, : half - lag], axis=1) for lag in range(5)],
            axis=1,
        )
        ac = ac.at[:, 0].multiply(1.0001)
        lagw = jnp.asarray([1.0] + [1.0 - (0.008 * k) ** 2 for k in range(1, 5)])
        ac = ac * lagw[None, :]
        lpc4 = _levinson(ac, 4)
        damp = jnp.asarray([0.9, 0.81, 0.729, 0.6561])
        lpc4 = lpc4 * damp[None, :]
        c1 = 0.8
        lpc5 = jnp.stack(
            [lpc4[:, 0] + c1, lpc4[:, 1] + c1 * lpc4[:, 0], lpc4[:, 2] + c1 * lpc4[:, 1],
             lpc4[:, 3] + c1 * lpc4[:, 2], c1 * lpc4[:, 3]],
            axis=1,
        )
        y = lp
        for j in range(5):
            y = y.at[:, j + 1 :].add(lpc5[:, j : j + 1] * lp[:, : half - 1 - j])

        # plc_pitch_search: x_lp = y[360:], length=1328, max_pitch=620
        length = 2048 - LAG_MAX
        max_pitch = LAG_MAX - LAG_MIN
        x_lp = y[:, LAG_MAX // 2 :]
        h = length >> 1
        # coarse 4x
        n4 = h >> 1
        x4 = x_lp[:, : 2 * n4 : 2]
        ymax4 = (length + max_pitch) >> 2
        y4 = y[:, : 2 * ymax4 : 2]
        mp4 = max_pitch >> 2
        xc4 = _xcorr(x4, y4, mp4)
        b0, b1 = _find_best_pitch(xc4, y4, length >> 2, mp4)
        # fine 2x
        mp2 = max_pitch >> 1
        xc2_all = _xcorr(x_lp[:, :h], y, mp2)
        lag_i = jnp.arange(mp2)[None, :]
        near = (jnp.abs(lag_i - 2 * b0[:, None]) <= 2) | (jnp.abs(lag_i - 2 * b1[:, None]) <= 2)
        xc2 = jnp.where(near, jnp.maximum(-1.0, xc2_all), 0.0)
        c0, _ = _find_best_pitch(xc2, y, length >> 1, mp2)
        # pseudo-interpolation
        bp = c0
        a = jnp.take_along_axis(xc2, jnp.clip(bp - 1, 0, mp2 - 1)[:, None], axis=1)[:, 0]
        b = jnp.take_along_axis(xc2, bp[:, None], axis=1)[:, 0]
        c = jnp.take_along_axis(xc2, jnp.clip(bp + 1, 0, mp2 - 1)[:, None], axis=1)[:, 0]
        interior = (bp > 0) & (bp < mp2 - 1)
        off = jnp.where(
            (c - a) > 0.7 * (b - a), 1, jnp.where((a - c) > 0.7 * (b - c), -1, 0)
        )
        off = jnp.where(interior, off, 0)
        raw = 2 * bp - off
        return (LAG_MAX - raw).astype(jnp.int32)

    return search


def make_plc_conceal(lm: int, batch: int, channels: int = 2):
    """Batched pitch-regime concealment of one frame.

    conceal(mem, lpc_state, pitch_state, first, pf_period, pf_gain,
    pf_tapset) -> (new_mem, new_lpc, new_pitch, out_f)

    mem [B, C, DBS+OV] is the serving decode memory; out_f [B, C, n] is
    the concealed frame BEFORE de-emphasis (the serving step's
    out_f-equivalent).  Everything is computed for every stream; the
    caller mask-merges against the coded-path results.
    """
    n = (1 << lm) * modes.SHORT_MDCT_SIZE
    ov = OVERLAP
    B, C = batch, channels
    search = make_pitch_search(batch)
    window = jnp.asarray(modes.WINDOW.astype(np.float64), jnp.float32)
    gains_tbl = jnp.asarray(np.array(GAINS, np.float32))

    def conceal(mem, lpc_state, pitch_state, first, pf_period, pf_gain, pf_tapset):
        pitch = jnp.where(first, search(mem[:, :, :2048]), pitch_state)
        pitch = jnp.clip(pitch, LAG_MIN, LAG_MAX)
        fade = jnp.where(first, 1.0, 0.8)

        full_exc = mem[:, :, DECODE_BUFFER_SIZE - MAX_PERIOD - LPC_ORDER : DECODE_BUFFER_SIZE]
        exc = full_exc[:, :, LPC_ORDER:]  # [B, C, 1024]

        # --- LPC on first loss (windowed autocorr + lag window) ----------
        w_full = jnp.concatenate(
            [window, jnp.ones(MAX_PERIOD - 2 * ov), window[::-1]]
        )
        excw = exc * w_full[None, None, :]
        lags = LPC_ORDER + 1
        ac = jnp.stack(
            [jnp.sum(excw[:, :, k:] * excw[:, :, : MAX_PERIOD - k], axis=-1)
             for k in range(lags)], axis=-1)  # [B, C, 25]
        ac = ac.at[..., 0].multiply(1.0001)
        lagw = jnp.asarray([1.0 - (0.008 * k) ** 2 for k in range(lags)]).at[0].set(1.0)
        ac = ac * lagw
        lpc_new = _levinson(ac.reshape(B * C, lags), LPC_ORDER).reshape(B, C, LPC_ORDER)
        lpc = jnp.where(first[:, None, None], lpc_new, lpc_state)

        # --- excitation FIR over the last exc_length samples -------------
        exc_length = jnp.minimum(2 * pitch, MAX_PERIOD)  # [B]
        # fir[i] = exc[i] + sum_j lpc[j] * exc_ext[i-1-j]
        fir = exc
        for j in range(LPC_ORDER):
            src = full_exc[:, :, LPC_ORDER - 1 - j : LPC_ORDER - 1 - j + MAX_PERIOD]
            fir = fir + lpc[:, :, j : j + 1] * src
        pos = jnp.arange(MAX_PERIOD)[None, None, :]
        in_fir = pos >= (MAX_PERIOD - exc_length)[:, None, None]
        exc_f = jnp.where(in_fir, fir, exc)

        # --- decay from the last two half-periods -------------------------
        half_len = (exc_length >> 1)[:, None, None]
        m1 = pos >= MAX_PERIOD - half_len
        m2 = (pos >= MAX_PERIOD - 2 * half_len) & (pos < MAX_PERIOD - half_len)
        e1 = 1.0 + jnp.sum(jnp.where(m1, exc_f * exc_f, 0.0), axis=-1)
        e2 = 1.0 + jnp.sum(jnp.where(m2, exc_f * exc_f, 0.0), axis=-1)
        e1 = jnp.minimum(e1, e2)
        decay = jnp.sqrt(e1 / e2)  # [B, C]

        # --- shift memory by one frame ------------------------------------
        shifted = jnp.concatenate(
            [mem[:, :, n:DECODE_BUFFER_SIZE],
             jnp.zeros((B, C, n), mem.dtype),
             mem[:, :, DECODE_BUFFER_SIZE:]], axis=-1)

        # --- periodic extrapolation of the excitation ---------------------
        el = n + ov
        i_ = jnp.arange(el)[None, :]
        pit = pitch[:, None]
        j_ = jnp.mod(i_, pit)                       # [B, el]
        wraps = i_ // pit
        att = (fade[:, None, None]
               * decay[..., None]
               * jnp.exp(jnp.log(jnp.maximum(decay[..., None], 1e-30))
                         * wraps[:, None, :].astype(jnp.float32)))
        extrap_off = (MAX_PERIOD - pitch)[:, None]  # [B, 1]
        src_idx = jnp.clip(extrap_off + j_, 0, MAX_PERIOD - 1)[:, None, :].repeat(C, 1)
        ext = att * jnp.take_along_axis(exc_f, src_idx, axis=-1)  # [B, C, el]
        # s1: energy of the same region one MAX_PERIOD earlier (post shift)
        s1_idx = jnp.clip(
            DECODE_BUFFER_SIZE - MAX_PERIOD - n + extrap_off + j_, 0,
            shifted.shape[-1] - 1,
        )[:, None, :].repeat(C, 1)
        s1v = jnp.take_along_axis(shifted, s1_idx, axis=-1)
        s1 = jnp.sum(s1v * s1v, axis=-1) / 1024.0  # [B, C]

        # --- LPC synthesis (order-24 IIR) as a scan over samples ----------
        k_ = jnp.arange(LPC_ORDER)
        hist0 = shifted[:, :, DECODE_BUFFER_SIZE - n - 1 - LPC_ORDER + 1 : DECODE_BUFFER_SIZE - n][..., ::-1]
        # hist0[j] = shifted[DBS-n-1-j]

        def iir_step(hist, x_t):
            acc = x_t - jnp.sum(lpc * hist, axis=-1)
            new_hist = jnp.concatenate([acc[..., None], hist[..., :-1]], axis=-1)
            return new_hist, acc

        _, synth = jax.lax.scan(iir_step, hist0, jnp.moveaxis(ext, -1, 0))
        synth = jnp.moveaxis(synth, 0, -1)  # [B, C, el]

        # --- explosion check + fade blend ---------------------------------
        s2 = jnp.sum(synth * synth, axis=-1) / 1024.0
        dead = ~(s1 > 0.2 * s2)
        ratio = jnp.sqrt((s1 + 1.0) / (s2 + 1.0))
        gwin = 1.0 - window[None, None, :] * (1.0 - ratio[..., None])
        blend = jnp.concatenate(
            [synth[:, :, :ov] * gwin, synth[:, :, ov:] * ratio[..., None]], axis=-1)
        synth = jnp.where(dead[..., None], 0.0,
                          jnp.where((s1 < s2)[..., None], blend, synth))

        buf = jax.lax.dynamic_update_slice_in_dim(
            shifted, synth, DECODE_BUFFER_SIZE - n, axis=-1)

        # --- undo the post-filter on the TDAC tail ------------------------
        t_ = jnp.maximum(pf_period, 15)[:, None]
        taps = gains_tbl[pf_tapset] * pf_gain[:, None]  # [B, 3]
        iov = jnp.arange(ov)[None, :]
        base = DECODE_BUFFER_SIZE + iov

        def tap_at(off):
            idx = jnp.clip(base - t_ + off, 0, buf.shape[-1] - 1)[:, None, :].repeat(C, 1)
            return jnp.take_along_axis(buf, idx, axis=-1)

        tail = buf[:, :, DECODE_BUFFER_SIZE : DECODE_BUFFER_SIZE + ov]
        etmp = tail - (
            taps[:, 0][:, None, None] * tap_at(0)
            + taps[:, 1][:, None, None] * (tap_at(1) + tap_at(-1))
            + taps[:, 2][:, None, None] * (tap_at(2) + tap_at(-2))
        )
        half = ov // 2
        tdac = (window[None, None, :half] * etmp[:, :, ov - 1 : half - 1 : -1]
                + window[None, None, ov - 1 : half - 1 : -1] * etmp[:, :, :half])
        new_tail = jnp.concatenate([tdac, etmp[:, :, half:]], axis=-1)
        buf = jax.lax.dynamic_update_slice_in_dim(
            buf, new_tail, DECODE_BUFFER_SIZE, axis=-1)

        out_f = buf[:, :, DECODE_BUFFER_SIZE - n : DECODE_BUFFER_SIZE]
        return buf, lpc, pitch, out_f

    return conceal


def make_plc_conceal_compact(lm: int, batch: int, k: int, channels: int = 2):
    """Fixed-capacity concealment: conceal only the flagged streams.

    The full-batch conceal costs ~120 ms at B=1024 on TPU (pitch-search
    xcorrs + the order-24 IIR scan over every stream) while a 5%-loss
    step conceals ~51.  This wrapper compacts the <=k flagged streams
    into a [k, ...] sub-batch (k a compile-time capacity; the serve loop
    picks this variant only when the step's loss count fits), runs the
    same conceal at batch=k, and expands the results back:

    * the lost indices come from top_k over the mask ON DEVICE (stable:
      ties break toward lower index), so no extra upload is needed;
    * compact AND expand of the [B, C, W] planes are one-hot f32
      matmuls on the MXU — exact (each output sums exactly one value
      multiplied by 1.0) and free of the scatter lowering that
      serializes on TPU; per-stream scalars ride tiny takes.

    conceal(mem, lpc_state, pitch_state, plc_mask, first, pf_period,
    pf_gain, pf_tapset) -> (mem_c, lpc_c, pitch_c, out_f) with the same
    shapes/merge contract as make_plc_conceal; rows outside plc_mask
    are ZERO (the caller's where(plc_mask, ...) merge never reads them).
    """
    inner = make_plc_conceal(lm, k, channels)
    B = batch
    hp = jax.lax.Precision.HIGHEST

    def conceal(mem, lpc_state, pitch_state, plc_mask, first, pf_period,
                pf_gain, pf_tapset):
        vals, idx = jax.lax.top_k(plc_mask.astype(jnp.float32), k)
        validk = vals > 0.5  # [k] — padding rows (count < k) are inert
        oh = (idx[:, None] == jnp.arange(B)[None, :]) & validk[:, None]
        ohf = oh.astype(jnp.float32)  # [k, B]
        memk = jnp.einsum("kb,bcw->kcw", ohf, mem, precision=hp)
        # Padding rows would feed an all-zero memory into Levinson
        # (0/0 -> NaN, which 0-weight matmul rows still poison: 0*NaN is
        # NaN) — give them an impulse instead and zero their outputs.
        imp = (jnp.arange(memk.shape[-1]) == DECODE_BUFFER_SIZE - 1)
        memk = jnp.where(validk[:, None, None], memk,
                         imp[None, None, :].astype(memk.dtype))
        lpck = jnp.einsum("kb,bco->kco", ohf, lpc_state, precision=hp)
        ci = jnp.clip(idx, 0, B - 1)
        pitchk = jnp.where(validk, pitch_state[ci], LAG_MIN)
        firstk = first[ci] & validk
        periodk = jnp.where(validk, pf_period[ci], 15)
        gaink = jnp.where(validk, pf_gain[ci], 0.0)
        tapsetk = jnp.where(validk, pf_tapset[ci], 0)
        mem_ck, lpck2, pitchk2, out_fk = inner(
            memk, lpck, pitchk, firstk, periodk, gaink, tapsetk)
        zk = lambda a: jnp.where(
            validk.reshape((k,) + (1,) * (a.ndim - 1)), a,
            jnp.zeros((), a.dtype))
        mem_c = jnp.einsum("kb,kcw->bcw", ohf, zk(mem_ck), precision=hp)
        out_f = jnp.einsum("kb,kcn->bcn", ohf, zk(out_fk), precision=hp)
        lpc_c = jnp.einsum("kb,kco->bco", ohf, zk(lpck2), precision=hp)
        pitch_c = jnp.sum(jnp.where(oh, pitchk2[:, None], 0), axis=0)
        return mem_c, lpc_c, pitch_c, out_f

    return conceal
