"""Device-side transition/redundancy crossfades for the mixed serving
ring (the scalar decoder's _smooth_fade semantics, decoder.py:50-56 /
reference decoder.rs:833-865).

Plane A reports per-stream transition events (redundant 5 ms CELT
blocks, SILK->CELT mode switches) and the host supplies the exact 5 ms
correction PCM (shadow-decoded redundant block or plane A's SILK PLC
row); this module applies the windowed fades to the device-resident PCM
ring after the serving step — the host never downloads the ring.

kind 0 (head): ring[:120] = corr[:120];
               ring[120:240] = w2*ring + (1-w2)*corr[120:240]
kind 1 (tail): ring[-120:] = w2*corr[120:240] + (1-w2)*ring[-120:]
with w2 = WINDOW^2 at 48 kHz (f2_5 = 120 samples).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..celt import modes

F2_5 = 120  # 2.5 ms at 48 kHz


@functools.lru_cache(maxsize=None)
def make_apply_corrections(frame48: int, batch: int, channels: int, k: int):
    """Jitted (ring, rows [k,240,C], idx [k], kinds [k]) -> ring.

    Unused slots pass idx == batch (dropped by the scatter).  k is a
    static bucket; transition steps are rare, so only a handful of
    variants ever compile.
    """
    w2 = jnp.asarray(
        (modes.WINDOW[:F2_5].astype(np.float64) ** 2).astype(np.float32)
    )[None, :, None]

    def apply(ring, rows, idx, kinds):
        cur = jnp.take(ring, jnp.clip(idx, 0, batch - 1), axis=0)
        head = jnp.concatenate(
            [rows[:, :F2_5],
             w2 * cur[:, F2_5 : 2 * F2_5] + (1.0 - w2) * rows[:, F2_5:]],
            axis=1,
        )
        tail = w2 * rows[:, F2_5:] + (1.0 - w2) * cur[:, frame48 - F2_5 :]
        idx_head = jnp.where(kinds == 0, idx, batch)
        idx_tail = jnp.where(kinds == 1, idx, batch)
        ring = ring.at[idx_head, : 2 * F2_5].set(head, mode="drop")
        ring = ring.at[idx_tail, frame48 - F2_5 :].set(tail, mode="drop")
        return ring

    return jax.jit(apply, donate_argnums=(0,))


def apply_corrections(ring, corrs, frame48: int, batch: int, channels: int):
    """Host helper: bucket the correction list and run the jitted fade.

    corrs: [(stream, kind, pcm [240, C] f32)]; returns the new ring.
    """
    if not corrs:
        return ring
    for k in (4, 16, 64, batch):
        if len(corrs) <= k:
            break
    rows = np.zeros((k, 240, channels), np.float32)
    idx = np.full(k, batch, np.int32)
    kinds = np.zeros(k, np.int32)
    for j, (i, kind, pcm) in enumerate(corrs[:k]):
        rows[j] = pcm[:240, :channels]
        idx[j] = i
        kinds[j] = kind
    fn = make_apply_corrections(frame48, batch, channels, k)
    return fn(ring, jnp.asarray(rows), jnp.asarray(idx), jnp.asarray(kinds))
