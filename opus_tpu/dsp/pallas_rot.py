"""Pallas VMEM-resident exp_rotation pass (fused Hillis-Steele ladders).

The plan executor's rotation stage (opus_tpu/dsp/plan_exec.py _rot_pass)
replays the reference's spreading rotation — two sequential
first-order recurrences per chain (/root/reference/src/celt/comb-filter
discipline; rotation itself from celt/vq.py exp_rotation) — as
segmented Hillis-Steele scans over the flat [B, n2] band plane.  In
XLA that is ~32 separate padded-shift passes (2 scans x 8 doubling
levels x {A, B} updates) plus the select/roll epilogues: every pass
re-reads and re-writes [B, n2] from HBM, and the stage costs ~6 ms of
the 22.7 ms B=1024 plan step (KNOWN_GAPS.md round-4 diagnosis).

This kernel fuses the WHOLE pass — both scan ladders and their
epilogues — into one VMEM-resident Pallas body: one load of the five
input planes, all 16 ladder levels in registers/VMEM with static
`pltpu.roll` shifts (1..128; the plane edge is masked to the monoid
identity exactly like the XLA path's pads), one store.  HBM traffic
drops from ~32 round trips to one.

The math is operation-for-operation the XLA _rot_pass (same pairings,
same order, f32 throughout), so results are BIT-IDENTICAL; the
backward scan runs right-to-left directly (left-rolls) instead of
flip+scan+flip, which composes the same products elementwise.
Equivalence is gated in interpreter mode on CPU
(tests/test_pallas_rot.py).

MEASURED RESULT (tools/tpu_rotbench.py, 2026-08-20 window, contended):
bit-exact on real TPU (max_abs 0.0) but NOT faster — full executor
33.7 -> 51.8 ms (cls112) / 29.1 -> 35.9 ms (full capacity).  XLA:TPU
already fuses the ladder's elementwise passes well, and this kernel
pays ~32 sequential small grid steps.  The XLA ladder stays the
default everywhere; OPUS_TPU_PALLAS_ROT=1 opts in (kept for future
A/Bs with bigger row blocks / fewer live planes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_BS = 32  # stream rows per grid block (n2=3840 f32 row = 15 KB)


def _rot_kernel(x_ref, cc_ref, ss_ref, k_ref, m_ref, o_ref, *, roll):
    x = x_ref[...]
    cc = cc_ref[...]
    ss = ss_ref[...]
    k = k_ref[...]
    m = m_ref[...]
    n = x.shape[-1]
    pos = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    first = k == 0
    last = k == m - 1

    # forward scan: v[t] = a[t] v[t-1] + b[t], chain heads reset (a=0)
    a = jnp.where(first, 0.0, ss)
    b = jnp.where(first, x, cc * x)
    span = 1
    while span < 256:
        ash = jnp.where(pos < span, 1.0, roll(a, span, 1))
        bsh = jnp.where(pos < span, 0.0, roll(b, span, 1))
        a, b = a * ash, a * bsh + b
        span *= 2
    v = b
    x_next = roll(x, n - 1, 1)  # roll left 1 (wraps, masked by `last`)
    y = jnp.where(last, v, cc * v - ss * x_next)

    # backward scan, right-to-left in natural orientation: the XLA path
    # flips, scans, flips back; composing with left-rolls is the same
    # elementwise product sequence.  Natural-orientation coefficients:
    # reversed chain position kr = m-1-k, so kr<=1  <=>  k >= m-2.
    tail2 = k >= m - 2
    ar = jnp.where(tail2, 0.0, -ss)
    br = jnp.where(tail2, y, cc * y)
    span = 1
    while span < 256:
        ash = jnp.where(pos >= n - span, 1.0, roll(ar, n - span, 1))
        bsh = jnp.where(pos >= n - span, 0.0, roll(br, n - span, 1))
        ar, br = ar * ash, ar * bsh + br
        span *= 2
    z = br
    y_prev = roll(y, 1, 1)  # roll right 1 (wraps, masked by k==0)
    f = jnp.where(first, z, jnp.where(last, y, cc * z + ss * y_prev))
    o_ref[...] = jnp.where(m < 3, y, f)


def pallas_rot_pass(x, cc, ss, k_pos, m_pos, interpret: bool = False):
    """Drop-in for plan_exec._rot_pass via a fused Pallas kernel.

    x/cc/ss f32 [B, N]; k_pos/m_pos i32 [B, N] (position within chain /
    chain length, 1 = identity)."""
    from jax.experimental import pallas as pl

    roll = jnp.roll
    if not interpret:
        from jax.experimental.pallas import tpu as pltpu

        roll = pltpu.roll

    B, N = x.shape
    bs = next(c for c in (_BS, 16, 8, 4, 2, 1) if B % c == 0)
    kernel = functools.partial(_rot_kernel, roll=roll)
    if interpret:
        mem = {}
        extra = {}
    else:
        from jax.experimental.pallas import tpu as pltpu

        mem = {"memory_space": pltpu.VMEM}
        extra = {"compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024)}
    spec = pl.BlockSpec((bs, N), lambda i: (i, 0), **mem)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, N), x.dtype),
        grid=(B // bs,),
        in_specs=[spec] * 5,
        out_specs=spec,
        input_output_aliases={0: 0},
        interpret=interpret,
        **extra,
    )(x, cc.astype(jnp.float32), ss.astype(jnp.float32),
      k_pos.astype(jnp.int32), m_pos.astype(jnp.int32))
