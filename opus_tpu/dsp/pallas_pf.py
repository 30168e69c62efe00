"""Pallas VMEM-resident CELT pitch post-filter (opt-in).

The XLA serving postfilter (opus_tpu/dsp/synthesis.py _postfilter) is
gather-latency bound: every lag-safe chunk issues one HBM
take_along_axis over the whole [B, C, W] plane (~1.3 ms per iteration at
B=1024 on the shared chip), so worst-case lags cost 80 iterations
(DEVICE_PROFILE.md).  This kernel keeps each 128-stream block's delay
line resident in VMEM across the whole chunk loop, so the per-iteration
gathers hit on-chip memory instead of HBM.

Semantics are identical to _postfilter (two crossfade segments, 5-tap
combs, per-stream lags/gains/tapsets); the fixed chunk is 12 (always
lag-safe) because VMEM-resident iterations are cheap enough not to need
the lag-adaptive variants.

Opt-in (OPUS_TPU_PALLAS_PF=1): the kernel is validated in interpreter
mode on CPU (tests/test_pallas_pf.py) but NOT yet profiled on real TPU
hardware — the XLA postfilter stays the serving default until it is.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..celt import modes
from ..celt.comb_filter import GAINS

OVERLAP = modes.OVERLAP
_CHUNK = 12
_BS = 128  # streams per grid block


def _pf_kernel(y_ref, par_ref, w2_ref, gt_ref, out_ref, *, n, lm, hist, channels, interpret):
    """One 128-stream block: chunked comb recurrence on VMEM-resident y.

    y_ref: [BS, C, hist+n] the history+frame plane (block slice).
    par_ref: [BS, 16] f32 params: periods p0..p2 (as float), gains g0..g2,
             tapsets t0..t2 (as float), window flags.
    out_ref: [BS, C, hist+n] updated plane.

    Mosaic constraints shape the whole kernel (jax pallas/mosaic
    lowering.py _gather_lowering_rule): the ONLY supported gather is 2D,
    same-shape, batched along one dim — so the plane is flattened to
    [BS*C, W] rows, the per-row lagged window is fetched as a full-width
    same-shape row gather (VMEM-resident, bandwidth is free), the tiny
    tapset table is resolved by 3-way select instead of indexing, and
    every loop is unrolled at trace time (chunk counts are static) so
    all slices are static.
    """
    import jax.numpy as jnp

    w2 = w2_ref[...]
    gains_tbl = gt_ref[...]

    chunk = _CHUNK
    bs = y_ref.shape[0]
    W = y_ref.shape[2]
    R = bs * channels
    # Mosaic TC kernels implement neither scatter nor value-level
    # dynamic_update_slice: the running plane lives in out_ref and every
    # chunk update is a static-slice REF store (the loop re-reads the
    # full plane from VMEM each iteration — bandwidth there is free).
    out_ref[...] = y_ref[...]
    par = par_ref[...]
    rep = lambda v: jnp.repeat(v, channels, axis=0)  # [BS,k] -> [R,k]
    p = rep(par[:, 0:3]).astype(jnp.int32)
    g = rep(par[:, 3:6])
    ts = rep(par[:, 6:9]).astype(jnp.int32)

    def taps_of(t):  # [R] tapset -> [R, 3] taps, gather-free
        out = jnp.zeros((R, 3), jnp.float32)
        for k in range(3):
            out = out + jnp.where((t == k)[:, None], gains_tbl[k][None, :], 0.0)
        return out

    def seg(off, ln, pa_, ga_, ta_, pb_, gb_, tb_):
        ga = taps_of(ta_) * ga_[:, None]
        gb = taps_of(tb_) * gb_[:, None]
        same = (ga_ == gb_) & (pa_ == pb_) & (ta_ == tb_)
        zero = (ga_ == 0.0) & (gb_ == 0.0)
        zero_b = gb_ == 0.0
        pa = jnp.maximum(pa_, 15)
        pb = jnp.maximum(pb_, 15)
        wlen = chunk + 4

        def window(yv, i0, t):
            # same-shape batched row gather -> tpu.dynamic_gather
            start = jnp.clip(i0 - 2 - t[:, None], 0, W - wlen)
            idx = jnp.minimum(start + jnp.arange(W)[None, :], W - 1)
            return jnp.take_along_axis(yv, idx, axis=-1)[:, :wlen]

        def tap5(win, taps):
            s = win[:, 2 : 2 + chunk]
            s1 = win[:, 1 : 1 + chunk] + win[:, 3 : 3 + chunk]
            s2 = win[:, 0:chunk] + win[:, 4 : 4 + chunk]
            return (taps[:, 0][:, None] * s
                    + taps[:, 1][:, None] * s1
                    + taps[:, 2][:, None] * s2)

        ncf = min(ln, OVERLAP) // chunk
        for ci in range(ncf):  # static unroll: all slices static
            i0 = off + ci * chunk
            y = out_ref[...].reshape(R, W)
            wh = w2[ci * chunk : (ci + 1) * chunk][None, :]
            wh = jnp.where(same[:, None], 1.0, wh)
            contrib = (1.0 - wh) * tap5(window(y, i0, pa), ga) + wh * tap5(
                window(y, i0, pb), gb
            )
            contrib = jnp.where(zero[:, None], 0.0, contrib)
            upd = (y[:, i0 : i0 + chunk] + contrib).reshape(bs, channels, chunk)
            out_ref[:, :, i0 : i0 + chunk] = upd
        ntail = (ln - ncf * chunk) // chunk
        for ci in range(ntail):
            i0 = off + ncf * chunk + ci * chunk
            y = out_ref[...].reshape(R, W)
            contrib = tap5(window(y, i0, pb), gb)
            contrib = jnp.where(zero_b[:, None], 0.0, contrib)
            upd = (y[:, i0 : i0 + chunk] + contrib).reshape(bs, channels, chunk)
            out_ref[:, :, i0 : i0 + chunk] = upd

    seg(hist, modes.SHORT_MDCT_SIZE,
        p[:, 0], g[:, 0], ts[:, 0], p[:, 1], g[:, 1], ts[:, 1])
    if lm != 0:
        seg(hist + modes.SHORT_MDCT_SIZE, n - modes.SHORT_MDCT_SIZE,
            p[:, 1], g[:, 1], ts[:, 1], p[:, 2], g[:, 2], ts[:, 2])


def pallas_postfilter(y, hist, n, lm, pf_periods, pf_gains, pf_tapsets,
                      interpret: bool = False):
    """Drop-in for synthesis._postfilter via a Pallas kernel.

    y [B, C, hist+n] f32; per-stream periods/gains/tapsets as in the XLA
    path.  B must be a multiple of 128 (serving batches are)."""
    from jax.experimental import pallas as pl
    try:
        from jax.experimental.pallas import tpu as pltpu
        vmem = pltpu.VMEM
    except Exception:  # pragma: no cover - cpu-only environments
        vmem = None

    B, C, W = y.shape
    bs = min(_BS, B)
    assert B % bs == 0
    par = jnp.concatenate(
        [pf_periods.astype(jnp.float32), pf_gains.astype(jnp.float32),
         pf_tapsets.astype(jnp.float32), jnp.zeros((B, 7), jnp.float32)],
        axis=1,
    )
    kernel = functools.partial(
        _pf_kernel, n=n, lm=lm, hist=hist, channels=C, interpret=interpret
    )
    kwargs = {}
    w2 = jnp.asarray((modes.WINDOW.astype(np.float64) ** 2).astype(np.float32))
    gt = jnp.asarray(np.array(GAINS, np.float32))
    if vmem is not None and not interpret:
        kwargs = dict(
            in_specs=[
                pl.BlockSpec((bs, C, W), lambda i: (i, 0, 0), memory_space=vmem),
                pl.BlockSpec((bs, 16), lambda i: (i, 0), memory_space=vmem),
                pl.BlockSpec((OVERLAP,), lambda i: (0,), memory_space=vmem),
                pl.BlockSpec((3, 3), lambda i: (0, 0), memory_space=vmem),
            ],
            out_specs=pl.BlockSpec((bs, C, W), lambda i: (i, 0, 0), memory_space=vmem),
        )
    else:
        kwargs = dict(
            in_specs=[
                pl.BlockSpec((bs, C, W), lambda i: (i, 0, 0)),
                pl.BlockSpec((bs, 16), lambda i: (i, 0)),
                pl.BlockSpec((OVERLAP,), lambda i: (0,)),
                pl.BlockSpec((3, 3), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((bs, C, W), lambda i: (i, 0, 0)),
        )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(y.shape, y.dtype),
        grid=(B // bs,),
        interpret=interpret,
        **kwargs,
    )(y, par, w2, gt)
