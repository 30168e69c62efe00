"""Batched SILK synthesis on the TPU (plane B for voice streams).

Design (SURVEY §7): the host plane walks the range-coded symbols and
dequantises parameters exactly (opus_tpu/silk); the device plane runs the
dense recurrences for the whole stream batch at once, in float32 in the
OUTPUT domain — a linear change of variables that absorbs every gain and
Q-format rescale of the fixed-point reference:

    P[t] = g_k * exc_n[t] + sum_j b_j * P[t - lag + 2 - j]   (voiced LTP)
    x[t] = P[t] + sum_j a_j * x[t - 1 - j]                   (LPC)

* LTP: minimum pitch lag is 2 ms, so the 5-tap feedback vectorises as a
  chunked scan — within a chunk of (min_lag - 2) samples all taps read
  already-final samples (same trick as the CELT comb-filter kernel).
* LPC: lax.scan over time; per step a [B, order] dot — B-way parallel.

The normative path is the host's bit-exact fixed point; device parity
tolerance is ~1e-3 output LSB, pinned by tests.  The resampler to the
API rate stays on the host for now (cheap per-stream FIR).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

LTP_ORDER = 5
MAX_LPC_ORDER = 16


def _ltp_chunked(gexc, b_taps, lag, head, chunk):
    """Voiced LTP over one subframe in the output domain.

    gexc: [B, S] gain-scaled excitation; b_taps: [B, 5]; lag: [B] >= chunk+2;
    head: [B, H] P-history (index H == first sample of this subframe).
    Returns (pres [B, S], buf [B, H+S'] with S' = S rounded up to chunk).
    """
    B, S = gexc.shape
    H = head.shape[1]
    n_chunks = (S + chunk - 1) // chunk
    pad = n_chunks * chunk - S
    gexc_p = jnp.pad(gexc, ((0, 0), (0, pad)))
    buf0 = jnp.concatenate([head, jnp.zeros((B, n_chunks * chunk), jnp.float32)], axis=1)

    def body(buf, ci):
        t0 = ci * chunk
        idx = t0 + jnp.arange(chunk)
        base = H + idx[None, :] - lag[:, None] + 2
        pred = jnp.zeros((B, chunk), jnp.float32)
        for j in range(LTP_ORDER):
            vals = jnp.take_along_axis(buf, jnp.clip(base - j, 0, buf.shape[1] - 1), axis=1)
            pred = pred + b_taps[:, j : j + 1] * vals
        pres = jax.lax.dynamic_slice_in_dim(gexc_p, t0, chunk, axis=1) + pred
        buf = jax.lax.dynamic_update_slice_in_dim(buf, pres, H + t0, axis=1)
        return buf, pres

    buf, chunks = jax.lax.scan(body, buf0, jnp.arange(n_chunks))
    pres = jnp.swapaxes(chunks, 0, 1).reshape(B, n_chunks * chunk)[:, :S]
    return pres, buf[:, : H + S]


def _lpc_scan(pres, a, hist):
    """x[t] = pres[t] + sum_j a[j] * x[t-1-j]; hist[:, -1] = x[-1]."""

    def step(h, p):
        pred = jnp.einsum("bo,bo->b", h[:, ::-1], a)
        x = p + pred
        h = jnp.concatenate([h[:, 1:], x[:, None]], axis=1)
        return h, x

    hist, xs = jax.lax.scan(step, hist, jnp.swapaxes(pres, 0, 1))
    return jnp.swapaxes(xs, 0, 1), hist


@functools.partial(jax.jit, static_argnames=("subfr_len", "nb_subfr", "chunk"))
def silk_synthesis_step(
    gexc,       # [B, L] float32: exc_q14/2^14 * subframe gain (output scale)
    a1,         # [B, order] first-half LPC coefs (a_q12 / 4096)
    a2,         # [B, order] second-half LPC coefs
    voiced,     # [B] bool
    lags,       # [B, nb_subfr] int32 pitch lags
    b_taps,     # [B, nb_subfr, 5] float32 (ltp_coef_q14 / 2^14)
    head,       # [B, H] float32 output-domain LTP history (rewhitened)
    lpc_hist,   # [B, order] float32 output-domain LPC history
    subfr_len: int,
    nb_subfr: int,
    chunk: int,
):
    """One SILK frame for B streams -> (xq [B, L], new lpc_hist)."""
    outs = []
    buf = head
    for k in range(nb_subfr):
        ex = jax.lax.dynamic_slice_in_dim(gexc, k * subfr_len, subfr_len, axis=1)
        pres_v, buf = _ltp_chunked(ex, b_taps[:, k, :], lags[:, k], buf, chunk)
        pres = jnp.where(voiced[:, None], pres_v, ex)
        a = a1 if k < (nb_subfr + 1) // 2 else a2
        x, lpc_hist = _lpc_scan(pres, a, lpc_hist)
        outs.append(x)
    return jnp.concatenate(outs, axis=1), lpc_hist
