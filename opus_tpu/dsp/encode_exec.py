"""Batched TPU encode plane (music/CELT): analyze + PVQ search steps.

SURVEY.md §7 step 7's encode design (surface defined at
/root/reference/src/encoder.rs:1-10), split like the decode plan —
plane A (host, sequential int: decisions + range coding) stays in
opus_tpu/celt/plan_encoder.py; this module is plane B (dense, batched,
device):

* `make_encode_analyze`: pre-emphasis -> forward MDCT (ONE [B*C, N+OV]
  x [N+OV, N2] matmul on the MXU — the transform is linear, so the
  windowed-fold FFT formulation of celt/mdct.py mdct_forward collapses
  into a constant basis matrix) -> per-band energies -> unit band
  normalization -> dyadic CELL STATS.  The cells are the finest spans
  quant_partition's halving recursion can visit (depth <= lm+1); every
  itheta the host band walk needs is a Q14 atan2 of sums of cell
  energies (stereo mid/side = Ex+Ey+-2Exy), so the host decides the
  whole split tree WITHOUT downloading spectra.
* `make_encode_search`: given the host's leaf table (from the plan
  pass), gather each leaf into a dense [B, P, NMAX] tensor, apply the
  per-band stereo ops the host chose (mid/side split, intensity mix
  with signed weights), and run the greedy-projection PVQ search
  (celt/vq.py op_pvq_search, libopus op_pvq_search_c) as a batched
  fori_loop: projection prefill for K > N/2, then one argmax-placed
  pulse per iteration across EVERY leaf in parallel.  Scores are
  scale-invariant, so leaves need no renormalization chain.

v1 static scope (all LEGAL encoder choices, quality measured in
tools/qualbench.py): long blocks only (no transient short MDCTs), tf
off, spread coded SPREAD_NONE (rotation = identity both sides),
prefilter off.  The search itself matches the scalar op_pvq_search up
to reduction-order rounding (legal bitstream choices either way).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..celt import modes

OV = modes.OVERLAP
NB = modes.NB_E_BANDS
PREEMPH = float(modes.PREEMPH)
EPSILON = 1e-15


@functools.lru_cache(maxsize=None)
def forward_mdct_basis(n2: int) -> np.ndarray:
    """[N2+OV, N2] matrix equal to celt/mdct.py mdct_forward (f64 math,
    stored f32): out = in @ M."""
    n = 2 * n2
    pad = (n2 - OV) // 2
    w = np.zeros(n)
    win = modes.WINDOW.astype(np.float64)
    w[pad : pad + OV] = win
    w[pad + OV : pad + n2] = 1.0
    w[pad + n2 : pad + n2 + OV] = win[::-1]
    t = np.arange(n)
    k = np.arange(n2)
    # mdct_forward: z = FFT(xw * e^{-i pi t / n}); out = (2/n2) Re(tw_k z_k)
    # with tw_k = e^{-i 2 pi (k + 1/8 + n2/4 ... )}: recover tw from the
    # mdct module's twist table for exactness.
    from ..celt.mdct import _twists

    _, _, fwd_twist = _twists(n2)
    ph = np.exp(-2j * np.pi * np.outer(k, t) / n) * np.exp(-1j * np.pi * t / n)[None, :]
    M = (2.0 / n2) * np.real(fwd_twist[:, None] * ph) * w[None, :]
    # columns outside [pad, pad+n2+OV) multiply zeros — slice them off
    return np.ascontiguousarray(M[:, pad : pad + n2 + OV].T.astype(np.float32))


@functools.lru_cache(maxsize=None)
def cell_table(lm: int):
    """Static dyadic cell spans per band, mirroring quant_partition's
    halving recursion (n >>= 1, depth bounded by lm -> -1).  Returns
    (starts, lens, band_of_cell, cells_per_band_offsets)."""
    m = 1 << lm
    e = (modes.E_BANDS.astype(np.int64) * m).astype(np.int64)
    starts, lens, bands, offs = [], [], [], [0]

    def rec(off, n, l):
        if l < 0 or n <= 2:
            starts.append(off)
            lens.append(n)
            return
        h = n >> 1
        rec(off, h, l - 1)
        rec(off + h, h, l - 1)
        if off + 2 * h < off + n:  # odd n: the dropped tail sample(s)
            starts.append(off + 2 * h)
            lens.append(n - 2 * h)

    for i in range(NB):
        rec(int(e[i]), int(e[i + 1] - e[i]), lm)
        while len(starts) > len(bands):
            bands.append(i)
        offs.append(len(starts))
    return (np.asarray(starts, np.int32), np.asarray(lens, np.int32),
            np.asarray(bands, np.int32), np.asarray(offs, np.int32))


def make_encode_analyze(lm: int, batch: int, channels: int):
    """Jitted analyze step.

    (pcm [B, N, C] f32 +-1, in_mem [B, C, OV], preemph_mem [B, C]) ->
    (x [B, C, N2] unit-normalized bands — STAYS ON DEVICE for the
    search step —, band_e [B, C, NB], cells [B, NC, 3], dots [B, 3],
    new_in_mem, new_preemph_mem)."""
    n = (1 << lm) * modes.SHORT_MDCT_SIZE
    m = 1 << lm
    e = (modes.E_BANDS.astype(np.int64) * m).astype(np.int32)
    M = jnp.asarray(forward_mdct_basis(n))
    starts, lens, _bands, _offs = cell_table(lm)
    nc = len(starts)
    pos = np.arange(n)[None, :]
    cell_mask = ((pos >= starts[:, None]) & (pos < (starts + lens)[:, None])
                 ).astype(np.float32)  # [NC, N2]
    band_mask = np.zeros((NB, n), np.float32)
    for i in range(NB):
        band_mask[i, int(e[i]) : int(e[i + 1])] = 1.0
    cm = jnp.asarray(cell_mask)
    bm = jnp.asarray(band_mask)

    def analyze(pcm, in_mem, preemph_mem):
        B = batch
        C = channels
        x48 = pcm.astype(jnp.float32).transpose(0, 2, 1) * 32768.0  # [B,C,N]
        prev = jnp.concatenate([preemph_mem[..., None], x48[..., :-1]], axis=-1)
        pre = x48 - PREEMPH * prev
        new_pre = PREEMPH * x48[..., -1]
        bi = jnp.concatenate([in_mem, pre], axis=-1)  # [B, C, OV+N]
        new_in = bi[..., n : n + OV]
        freq = jnp.einsum("bct,tk->bck", bi, M,
                          preferred_element_type=jnp.float32,
                          precision="highest")  # [B, C, N2]
        be2 = jnp.einsum("bck,ik->bci", freq * freq, bm,
                         preferred_element_type=jnp.float32,
                         precision="highest")
        band_e = jnp.sqrt(1e-27 + be2)
        gain = 1.0 / (1e-27 + band_e)  # [B, C, NB]
        gpos = jnp.einsum("bci,ik->bck", gain, bm,
                          preferred_element_type=jnp.float32,
                          precision="highest")
        x = freq * gpos  # unit-normalized bands
        # cell stats on the normalized spectra
        x0 = x[:, 0]
        x1 = x[:, C - 1]
        stats = jnp.stack([x0 * x0, x1 * x1, x0 * x1], axis=1)  # [B,3,N2]
        cells = jnp.einsum("bsk,ck->bcs", stats, cm,
                           preferred_element_type=jnp.float32,
                           precision="highest")  # [B, NC, 3]
        # time-domain dots for the dual-stereo decision
        a = pre[:, 0]
        b_ = pre[:, C - 1]
        dots = jnp.stack([jnp.sum(a * a, -1), jnp.sum(b_ * b_, -1),
                          jnp.sum(a * b_, -1)], axis=-1)
        return x, band_e, cells, dots, new_in, new_pre

    return jax.jit(analyze)


def make_encode_search(lm: int, batch: int, channels: int,
                       p_max: int = 160, n_max: int = 176, t_max: int = 128):
    """Jitted leaf PVQ search.

    Inputs: x [B, C, N2] from analyze; band_ops [B, NB, 4] f32
    (op, a1, a2, _) with op 0=per-channel, 2=mid/side split,
    3=intensity mix (a2 carries the inv sign); leaf table [B, P, 4]
    i32 (plane, flat_off, n, k) with n==0 marking unused rows.
    Output: iy [B, P, NMAX] int32 (pulse vectors in leaf-local order).

    The greedy scores are scale-invariant so leaves are searched on the
    raw (post-stereo-op) spans."""
    n = (1 << lm) * modes.SHORT_MDCT_SIZE
    m = 1 << lm
    e = (modes.E_BANDS.astype(np.int64) * m).astype(np.int32)
    band_mask = np.zeros((NB, n), np.float32)
    for i in range(NB):
        band_mask[i, int(e[i]) : int(e[i + 1])] = 1.0
    bm = jnp.asarray(band_mask)
    rt2 = np.float32(np.sqrt(0.5))

    def search(x, band_ops, leaves):
        op = jnp.einsum("bi,ik->bk", band_ops[:, :, 0], bm,
                        preferred_element_type=jnp.float32,
                        precision="highest")  # per-position op
        a1 = jnp.einsum("bi,ik->bk", band_ops[:, :, 1], bm,
                        preferred_element_type=jnp.float32,
                        precision="highest")
        a2 = jnp.einsum("bi,ik->bk", band_ops[:, :, 2], bm,
                        preferred_element_type=jnp.float32,
                        precision="highest")
        x0 = x[:, 0]
        x1 = x[:, channels - 1]
        # bands.py stereo_split: mid = .7071(l+r), side = .7071(r-l)
        mid = jnp.where(op == 2, (x0 + x1) * rt2,
                        jnp.where(op == 3, a1 * x0 + a2 * x1, x0))
        side = jnp.where(op == 2, (x1 - x0) * rt2, x1)
        planes = jnp.stack([mid, side], axis=1)  # [B, 2, N2]

        pl = leaves[:, :, 0]
        off = leaves[:, :, 1]
        ln = leaves[:, :, 2]
        kk = leaves[:, :, 3]
        valid = ln > 0
        # dense per-leaf gather: [B, P, NMAX]
        j = jnp.arange(n_max)[None, None, :]
        idx = (jnp.clip(pl[:, :, None], 0, 1) * n
               + jnp.clip(off[:, :, None] + j, 0, n - 1))
        flat = planes.reshape(batch, 2 * n)
        src = jnp.take_along_axis(
            flat, idx.reshape(batch, p_max * n_max), axis=1
        ).reshape(batch, p_max, n_max)
        inn = (j < ln[:, :, None]) & valid[:, :, None]
        ax = jnp.where(inn, jnp.abs(src), 0.0)
        sg = jnp.where(src < 0, -1, 1)

        k_f = kk.astype(jnp.float32)
        # projection prefill for K > N/2 (celt/vq.py op_pvq_search);
        # degenerate sums (zero/huge) collapse ax to e1 for the WHOLE
        # search, exactly like the scalar path (only reachable when the
        # prefill branch is taken).
        prel = kk > (ln >> 1)  # per-leaf prefill flag
        sum_ax = jnp.sum(ax, axis=-1)
        degen = prel & ~((sum_ax > EPSILON) & (sum_ax < 64.0))
        e1 = (j == 0).astype(jnp.float32) * inn
        ax = jnp.where(degen[:, :, None], e1, ax)
        sum_ax = jnp.where(degen, 1.0, sum_ax)
        rcp = (k_f + 0.8) / jnp.maximum(sum_ax, EPSILON)
        iy = jnp.where(prel[:, :, None] & inn,
                       jnp.floor(rcp[:, :, None] * ax), 0.0)
        pulses_left = jnp.where(valid, kk - jnp.sum(iy, axis=-1).astype(jnp.int32), 0)
        xy = jnp.sum(ax * iy, axis=-1)
        yy = jnp.sum(iy * iy, axis=-1)

        def body(carry):
            t, iy, xy, yy, left = carry
            act = left > 0
            yy_ = jnp.where(act, yy + 1.0, yy)
            num = (xy[:, :, None] + ax) ** 2
            den = yy_[:, :, None] + 2.0 * iy
            sc = jnp.where(inn, num / jnp.maximum(den, EPSILON), -1.0)
            best = jnp.argmax(sc, axis=-1)  # first max, like the scalar loop
            oh = (jnp.arange(n_max)[None, None, :] == best[:, :, None])
            ohf = (oh & inn).astype(jnp.float32) * act[:, :, None]
            xy = xy + jnp.sum(ohf * ax, -1)
            yy = yy_ + 2.0 * jnp.sum(ohf * iy, -1)
            iy = iy + ohf
            left = jnp.maximum(left - 1, 0)
            return t + 1, iy, xy, yy, left

        # while_loop with early exit: the trip count tracks the BATCH'S
        # actual max pulses_left (typ. ~30-40 at 96 kbps), not the
        # static t_max=128 worst case — the loop body sweeps the whole
        # padded [B, P, NMAX] leaf area every iteration, so trips are
        # the dominant device cost (measured 527 ms at B=1024 with the
        # fixed-trip fori_loop, tools/tpu_encbench.py 2026-08-20).
        def cond(carry):
            t, _iy, _xy, _yy, left = carry
            return (t < t_max) & jnp.any(left > 0)

        _t, iy, xy, yy, left = jax.lax.while_loop(
            cond, body, (jnp.int32(0), iy, xy, yy, pulses_left))
        out = (sg * iy).astype(jnp.int32)
        return jnp.where(inn, out, 0), left

    return jax.jit(search)
