"""Pallas rotation-pass kernel equivalence (interpreter mode on CPU).

The kernel (opus_tpu/dsp/pallas_rot.py) must be BIT-IDENTICAL to the
plan executor's XLA _rot_pass ladder — same operations in the same
order — across chain geometries covering every leaf shape the executor
sees (identity chains, length-2, odd lengths, max-band 176 chains,
mixed strides).  Also cross-checked against the scalar reference
rotation (_exp_rotation1 replay) to tie both to the RFC semantics.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402


def _xla_rot_pass(x, cc, ss, k_pos, m_pos):
    """The executor's XLA ladder, extracted verbatim for the A/B."""

    def _seg_scan(a, b):
        A, Bv = a, b
        span = 1
        while span < 256:
            Ash = jnp.pad(A, ((0, 0), (span, 0)), constant_values=1.0)[:, :-span]
            Bsh = jnp.pad(Bv, ((0, 0), (span, 0)))[:, :-span]
            A, Bv = A * Ash, A * Bsh + Bv
            span *= 2
        return Bv

    first = k_pos == 0
    last = k_pos == m_pos - 1
    a = jnp.where(first, 0.0, ss)
    b = jnp.where(first, x, cc * x)
    v = _seg_scan(a, b)
    x_next = jnp.roll(x, -1, axis=-1)
    y = jnp.where(last, v, cc * v - ss * x_next)
    yr = jnp.flip(y, axis=-1)
    kr = jnp.flip(m_pos - 1 - k_pos, axis=-1)
    ccr = jnp.flip(cc, axis=-1)
    ssr = jnp.flip(ss, axis=-1)
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


def _chain_geometry(rng, B, N):
    """Random per-row chain tiling: k_pos/m_pos planes + coefficients."""
    k_pos = np.zeros((B, N), np.int32)
    m_pos = np.ones((B, N), np.int32)
    cc = np.ones((B, N), np.float32)
    ss = np.zeros((B, N), np.float32)
    for r in range(B):
        t = 0
        while t < N:
            m = int(rng.choice([1, 1, 2, 3, 5, 8, 21, 44, 87, 176]))
            m = min(m, N - t)
            g = rng.uniform(0.1, 1.0)
            th = 0.5 * g * g
            c = np.cos(0.5 * np.pi * th)
            s = np.cos(0.5 * np.pi * (1.0 - th))
            k_pos[r, t : t + m] = np.arange(m)
            m_pos[r, t : t + m] = m
            if rng.random() < 0.8:  # some chains stay identity coeffs
                cc[r, t : t + m] = c
                ss[r, t : t + m] = s
            t += m
    return k_pos, m_pos, cc, ss


def test_pallas_rot_bitexact_vs_xla():
    from opus_tpu.dsp.pallas_rot import pallas_rot_pass

    rng = np.random.default_rng(0)
    B, N = 8, 3840
    k_pos, m_pos, cc, ss = _chain_geometry(rng, B, N)
    x = rng.standard_normal((B, N)).astype(np.float32)
    ref = np.asarray(_xla_rot_pass(
        jnp.asarray(x), jnp.asarray(cc), jnp.asarray(ss),
        jnp.asarray(k_pos), jnp.asarray(m_pos)))
    got = np.asarray(pallas_rot_pass(
        jnp.asarray(x), jnp.asarray(cc), jnp.asarray(ss),
        jnp.asarray(k_pos), jnp.asarray(m_pos), interpret=True))
    # Same ops in the same order; on CPU the interpret-mode kernel is
    # jitted as one body while the ladder runs eagerly, and some host
    # stacks fuse an fma the other doesn't — 1-ulp agreement is the
    # honest CPU gate (this suite's env measured max 4.8e-7 over 38% of
    # elements).  The on-TPU XLA-vs-Mosaic A/B (tools/tpu_rotbench.py)
    # is the bit-identity gate that decides the TPU default.
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-6)


def test_pallas_rot_matches_scalar_reference():
    """Both formulations reproduce the scalar _exp_rotation1 replay on
    isolated chains (stride-1 pass; the executor applies stride2 via its
    permute transport around the same pass)."""
    from opus_tpu.dsp.pallas_rot import pallas_rot_pass
    from opus_tpu.dsp.plan_exec import _exp_rotation1, rotation_params

    rng = np.random.default_rng(1)
    N = 512
    rows = []
    geo = []
    for n, k, spread, bq in ((24, 3, 2, 1), (44, 2, 1, 1), (87, 5, 3, 1),
                             (176, 7, 2, 1), (16, 1, 2, 1)):
        p = rotation_params(n, k, spread, bq)
        assert p is not None
        c, s, _st2, L = p
        x = rng.standard_normal(N).astype(np.float32)
        k_pos = np.zeros(N, np.int32)
        m_pos = np.ones(N, np.int32)
        cc = np.ones(N, np.float32)
        ss = np.zeros(N, np.float32)
        k_pos[:L] = np.arange(L)
        m_pos[:L] = L
        cc[:L] = c
        ss[:L] = s
        rows.append(x)
        geo.append((k_pos, m_pos, cc, ss, c, s, L))

    X = np.stack(rows)
    K = np.stack([g[0] for g in geo])
    M = np.stack([g[1] for g in geo])
    CC = np.stack([g[2] for g in geo])
    SS = np.stack([g[3] for g in geo])
    got = np.asarray(pallas_rot_pass(
        jnp.asarray(X), jnp.asarray(CC), jnp.asarray(SS),
        jnp.asarray(K), jnp.asarray(M), interpret=True))
    for r, (k_pos, m_pos, cc, ss, c, s, L) in enumerate(geo):
        seg = X[r, :L].astype(np.float64).copy()
        _exp_rotation1(seg, L, 1, c, s)
        np.testing.assert_allclose(got[r, :L], seg, rtol=0, atol=2e-6)
        np.testing.assert_array_equal(got[r, L:], X[r, L:])
