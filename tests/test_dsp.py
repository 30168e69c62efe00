"""Device synthesis plane tests: batched JAX kernel vs the scalar host
reference, plus the sharded-mesh dry run on virtual CPU devices."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from opus_tpu.celt import modes
from opus_tpu.celt.bands import denormalise_bands
from opus_tpu.celt.comb_filter import comb_filter
from opus_tpu.celt.decoder import DECODE_BUFFER_SIZE
from opus_tpu.celt.mdct import mdct_backward
from opus_tpu.dsp import synthesis as S

DBS = DECODE_BUFFER_SIZE
OV = modes.OVERLAP
LM = 1  # 5 ms frames keep kernel compiles quick in CI
N = (1 << LM) * modes.SHORT_MDCT_SIZE


def host_synth(mem, preemph, x, loge, short, pf):
    """Scalar reference synthesis identical to CeltDecoder's DSP half."""
    c_count = mem.shape[0]
    m = 1 << LM
    b_count = m if short else 1
    nb = modes.SHORT_MDCT_SIZE if short else N
    pcm = np.zeros((N, c_count), np.float32)
    for c in range(c_count):
        dm = mem[c]
        dm[: DBS - N + OV // 2] = dm[N : DBS + OV // 2]
        freq = np.empty(N)
        denormalise_bands(x[c], freq, loge[c], 0, 21, m, 1, False)
        for b in range(b_count):
            mdct_backward(freq[b::b_count].copy(), dm[DBS - N + nb * b :])
    p0, p1, p2, g0, g1, g2, t0, t1, t2 = pf
    for c in range(c_count):
        comb_filter(mem[c], DBS - N, p0, p1, modes.SHORT_MDCT_SIZE, g0, g1, t0, t1, modes.WINDOW, OV)
        comb_filter(mem[c], DBS - N + modes.SHORT_MDCT_SIZE, p1, p2, N - modes.SHORT_MDCT_SIZE, g1, g2, t1, t2, modes.WINDOW, OV)
    for c in range(c_count):
        acc = preemph[c]
        scratch = np.empty(N)
        xs = mem[c][DBS - N : DBS]
        for j in range(N):
            tmp = xs[j] + 1e-30 + acc
            acc = 0.8500061 * tmp
            scratch[j] = tmp
        preemph[c] = acc
        pcm[:, c] = scratch / 32768.0
    return pcm, mem, preemph


@pytest.mark.parametrize("short", [False, True])
@pytest.mark.parametrize(
    "pf",
    [
        (15, 15, 0, 0.0, 0.0, 0.0, 0, 0, 0),
        (15, 60, 200, 0.375, 0.1875, 0.28125, 1, 2, 0),
    ],
)
def test_synthesis_kernel_matches_host(short, pf):
    rng = np.random.default_rng(0)
    c_count = 2
    mem = (rng.standard_normal((c_count, DBS + OV)) * 100).astype(np.float32).astype(np.float64)
    pre = (rng.standard_normal(c_count) * 10).astype(np.float32).astype(np.float64)
    x = (rng.standard_normal((c_count, N)) * 0.2).astype(np.float32).astype(np.float64)
    loge = (rng.standard_normal((c_count, 21)) * 2).astype(np.float32)
    state = S.SynthState(
        jnp.asarray(mem[None].astype(np.float32)), jnp.asarray(pre[None].astype(np.float32))
    )
    step = S.make_synthesis_step(LM, short, c_count, 1)
    st2, pcm_d = step(
        state,
        jnp.asarray(x[None].astype(np.float32)),
        jnp.asarray(loge[None]),
        jnp.asarray([(1 << LM) * 100], jnp.int32),
        jnp.asarray([[pf[0], pf[1], pf[2]]], jnp.int32),
        jnp.asarray([[pf[3], pf[4], pf[5]]], jnp.float32),
        jnp.asarray([[pf[6], pf[7], pf[8]]], jnp.int32),
    )
    pcm_h, mem_h, _ = host_synth(mem.copy(), pre.copy(), x, loge, short, pf)
    scale = max(float(np.abs(pcm_h).max()), 1e-6)
    assert float(np.abs(np.asarray(pcm_d)[0] - pcm_h).max()) < 2e-5 * max(1.0, scale * 32768 / 100)
    # State memory parity in celt_sig units (relative to its scale).
    dm = float(np.abs(np.asarray(st2.mem)[0][:, :DBS] - mem_h[:, :DBS]).max())
    assert dm < 0.05


def test_dryrun_multichip_cpu_mesh():
    from __graft_entry__ import dryrun_multichip

    if len(jax.devices("cpu")) < 2:
        pytest.skip("needs >= 2 virtual CPU devices (xla_force_host_platform_device_count)")
    dryrun_multichip(2)


@pytest.mark.skipif("OPUS_TPU_CHECKIFY_TEST" not in __import__("os").environ,
                    reason="checkify-transforming the full step compiles ~6 min; "
                           "set OPUS_TPU_CHECKIFY_TEST=1 to run")
def test_checkify_sanitizer_catches_nan(monkeypatch):
    """OPUS_TPU_CHECKIFY=1 wraps the jitted steps in checkify float
    checks: a NaN injected into the device kernels raises instead of
    flowing into PCM (SURVEY.md §5 sanitizer row).  Verified in CI tier
    2 / manually (passes in ~6.5 min; the transform plumbs error state
    through every fori_loop iteration, which is the compile cost)."""
    monkeypatch.setenv("OPUS_TPU_CHECKIFY", "1")
    step = S.make_synthesis_step(0, False, 1, 1)
    state = S.init_state(1, 1)
    x = jnp.full((1, 1, 120), jnp.nan, jnp.float32)
    loge = jnp.zeros((1, 1, 21), jnp.float32)
    with pytest.raises(Exception):
        step(
            state, x, loge, jnp.asarray([100], jnp.int32),
            jnp.asarray([[15, 15, 15]], jnp.int32),
            jnp.zeros((1, 3), jnp.float32), jnp.zeros((1, 3), jnp.int32),
        )
    # clean inputs pass through the checked path
    step(
        state, jnp.zeros((1, 1, 120), jnp.float32), loge,
        jnp.asarray([100], jnp.int32), jnp.asarray([[15, 15, 15]], jnp.int32),
        jnp.zeros((1, 3), jnp.float32), jnp.zeros((1, 3), jnp.int32),
    )


def test_checkify_wrapper_mechanics(monkeypatch):
    """The _maybe_checkify gate itself: off -> plain jit (donation
    honoured); on -> float checks raise on NaN for a small kernel."""
    monkeypatch.setenv("OPUS_TPU_CHECKIFY", "1")
    f = S._maybe_checkify(lambda x: jnp.log(x) * 2.0)
    with pytest.raises(Exception):
        f(jnp.asarray([-1.0], jnp.float32))  # log(-1) = NaN -> raises
    assert float(f(jnp.asarray([1.0], jnp.float32))[0]) == 0.0
    monkeypatch.setenv("OPUS_TPU_CHECKIFY", "0")
    g = S._maybe_checkify(lambda x: x + 1.0)
    assert float(g(jnp.asarray([1.0], jnp.float32))[0]) == 2.0


def test_plc_compact_matches_full():
    """The fixed-capacity compact conceal (plc_exec
    make_plc_conceal_compact — the serving default whenever a step's
    loss count fits the capacity) is BIT-EXACT vs the full-batch conceal
    on the flagged rows, including non-first (continued-loss) streams
    and a capacity larger than the loss count (padding rows inert)."""
    import jax

    from opus_tpu.celt.decoder import DECODE_BUFFER_SIZE
    from opus_tpu.dsp.plc_exec import (
        LPC_ORDER, make_plc_conceal, make_plc_conceal_compact,
    )

    B, C, k, lm = 16, 2, 8, 3
    W = DECODE_BUFFER_SIZE + S.OVERLAP
    rng = np.random.default_rng(0)
    mem = jnp.asarray((rng.standard_normal((B, C, W)) * 0.1).astype(np.float32))
    lpc = jnp.asarray((rng.standard_normal((B, C, LPC_ORDER)) * 0.01).astype(np.float32))
    pitch = jnp.asarray(rng.integers(100, 720, B).astype(np.int32))
    mask = jnp.asarray(np.isin(np.arange(B), [3, 7, 8, 12, 15]))
    first = mask & jnp.asarray(np.isin(np.arange(B), [3, 8, 15]))  # 7, 12 continue
    period = jnp.asarray(rng.integers(15, 1024, B).astype(np.int32))
    gain = jnp.asarray((rng.integers(0, 4, B) * 0.09375).astype(np.float32))
    tapset = jnp.asarray(rng.integers(0, 3, B).astype(np.int32))

    full = jax.jit(make_plc_conceal(lm, B, C))
    comp = jax.jit(make_plc_conceal_compact(lm, B, k, C))
    mf, lf, pf, of = full(mem, lpc, pitch, first, period, gain, tapset)
    mc, lc, pc, oc = comp(mem, lpc, pitch, mask, first, period, gain, tapset)
    m = np.asarray(mask)
    for a, b in ((mf, mc), (lf, lc), (of, oc)):
        a, b = np.asarray(a), np.asarray(b)
        assert not np.isnan(b).any()
        np.testing.assert_array_equal(a[m], b[m])
    np.testing.assert_array_equal(np.asarray(pf)[m], np.asarray(pc)[m])
    # un-flagged rows are zero in the compact outputs (merge never reads
    # them, but NaN there would poison the expansion matmul)
    assert float(np.abs(np.asarray(oc)[~m]).max()) == 0.0
