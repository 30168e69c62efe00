"""Sharded serving correctness: real bitstreams under a CPU device mesh.

SURVEY.md §5 'distributed communication backend': stream sharding of the
serving path over jax.sharding.  conftest forces an 8-device CPU host
platform; these tests decode REAL libopus-encoded packets through the
dp-sharded batched serving step and assert PCM equality with both the
single-device step (sharding is pure layout) and libopus itself.
"""

import numpy as np
import pytest

from opus_tpu import oracle, parse_packet

pytestmark = pytest.mark.skipif(not oracle.available(), reason="libopus not present")


def _mesh(jax, n=8):
    from jax.sharding import Mesh

    devices = jax.devices("cpu")
    if len(devices) < n:
        pytest.skip(f"need {n} cpu devices, have {len(devices)}")
    return Mesh(np.array(devices[:n]).reshape(n), ("dp",))


def test_sharded_serving_step_matches_libopus():
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from opus_tpu.batch.pipeline import BatchedCeltDecoder
    from opus_tpu.dsp.synthesis import SynthState, init_state

    mesh = _mesh(jax)
    B, FRAME, NF = 16, 960, 4
    enc = oracle.Encoder(48000, 2)
    enc.ctl(oracle.SET_FORCE_MODE, oracle.MODE_CELT_ONLY)
    enc.ctl(oracle.SET_BITRATE, 96000)
    rng = np.random.default_rng(5)
    t = np.arange(FRAME * NF) / 48000.0
    sig = 0.4 * np.sin(2 * np.pi * 440 * t) + 0.1 * rng.standard_normal(t.size)
    pcm_in = np.stack([sig, 0.8 * np.roll(sig, 7)], -1).astype(np.float32)
    pkts, payloads, refs = [], [], []
    for f in range(NF):
        p = enc.encode_float(pcm_in[f * FRAME : (f + 1) * FRAME].ravel(), FRAME)
        pkts.append(p)
        payloads.append(p[parse_packet(p).payload_offset :])
    dref = oracle.Decoder(48000, 2)
    ref = np.concatenate(
        [np.asarray(dref.decode_float(p, FRAME)).reshape(FRAME, 2) for p in pkts]
    )

    front = BatchedCeltDecoder(B, 2, transfer="q14")
    if not front.use_native:
        pytest.skip("native engine not built")

    def shard_rows(a):
        a = jnp.asarray(a)
        return jax.device_put(
            a, NamedSharding(mesh, P(*("dp",) + (None,) * (a.ndim - 1)))
        )

    st = init_state(B, 2)
    st_sh = SynthState(shard_rows(st.mem), shard_rows(st.preemph))
    st_1d = st
    outs_sh, outs_1d = [], []
    for f in range(NF):
        lm, short_mask, args = front._raw_args(FRAME, [payloads[f]] * B)
        step = front._pipe_step_fn(lm, bool(short_mask[0]))
        jargs = [jnp.asarray(a) for a in args]
        st_1d, p1 = step(st_1d, *jargs)
        with mesh:
            st_sh, p2 = step(st_sh, *[shard_rows(a) for a in args])
        outs_1d.append(np.asarray(p1))
        outs_sh.append(np.asarray(p2))

    ours_sh = np.concatenate(outs_sh, axis=1)
    ours_1d = np.concatenate(outs_1d, axis=1)
    # Sharding must be pure layout: same program, same math.
    np.testing.assert_allclose(ours_sh, ours_1d, rtol=0, atol=1e-5)
    # And the sharded result must be a correct Opus decode (q14 transfer).
    for b in range(B):
        assert np.abs(ours_sh[b] - ref).max() < 2e-3


def test_sharded_mixed_plan_serve_matches_unsharded():
    """The FULL mixed serve (plans + SILK rows + a lost stream + a mode
    switch) under the dp mesh: seed the serve loop's device state
    (_serve_state/_serve_ring/PLC carries) with dp-sharded arrays and
    let GSPMD propagate the layout through the jitted mixed plan step.
    Asserts (a) exact parity with an identical unsharded run, (b)
    correctness vs the scalar decoder, (c) the ring stays dp-sharded
    (the step didn't silently replicate the batch axis)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from opus_tpu import Decoder
    from opus_tpu.batch.opus_pipeline import BatchedOpusDecoder
    from opus_tpu.dsp.plc_exec import LPC_ORDER
    from opus_tpu.dsp.synthesis import init_state

    mesh = _mesh(jax)
    B, F, NF = 8, 960, 4
    rng = np.random.default_rng(11)
    t = np.arange(F * NF) / 48000.0
    ph = np.cumsum(2 * np.pi * (130 + 25 * np.sin(2 * np.pi * 2.5 * t)) / 48000.0)
    voice = (0.35 * np.sign(np.sin(ph))
             + 0.02 * rng.standard_normal(t.size)).astype(np.float32)
    music = (0.4 * np.sin(2 * np.pi * 440 * t)
             + 0.2 * np.sin(2 * np.pi * 1763 * t)).astype(np.float32)
    v2 = np.stack([voice, np.roll(voice, 13) * 0.7], -1).astype(np.float32)
    m2 = np.stack([music, np.roll(music, 7) * 0.8], -1).astype(np.float32)

    encs = {}
    encs["celt"] = oracle.Encoder(48000, 2)
    encs["celt"].ctl(oracle.SET_FORCE_MODE, oracle.MODE_CELT_ONLY)
    encs["celt"].ctl(oracle.SET_BITRATE, 96000)
    encs["silk"] = oracle.Encoder(48000, 2)
    encs["silk"].ctl(oracle.SET_FORCE_MODE, oracle.MODE_SILK_ONLY)
    encs["silk"].ctl(oracle.SET_BITRATE, 24000)
    encs["hybrid"] = oracle.Encoder(48000, 2)
    encs["hybrid"].ctl(oracle.SET_FORCE_MODE, oracle.MODE_HYBRID)
    encs["hybrid"].ctl(oracle.SET_BITRATE, 64000)
    # the switching stream: CELT for 2 frames, then SILK (a mode switch
    # with its redundancy/transition machinery)
    encs["switch"] = oracle.Encoder(48000, 2)
    encs["switch"].ctl(oracle.SET_BITRATE, 64000)

    kinds = ["celt", "silk", "hybrid", "celt", "silk", "hybrid", "celt", "switch"]
    sw_seq = [oracle.MODE_CELT_ONLY, oracle.MODE_CELT_ONLY,
              oracle.MODE_SILK_ONLY, oracle.MODE_SILK_ONLY]
    pks: dict = {k: [] for k in kinds}
    for f in range(NF):
        sl = slice(f * F, (f + 1) * F)
        pks["celt"].append(encs["celt"].encode_float(
            np.ascontiguousarray(m2[sl]).ravel(), F))
        pks["silk"].append(encs["silk"].encode_float(
            np.ascontiguousarray(v2[sl]).ravel(), F))
        pks["hybrid"].append(encs["hybrid"].encode_float(
            np.ascontiguousarray(v2[sl]).ravel(), F))
        encs["switch"].ctl(oracle.SET_FORCE_MODE, sw_seq[f])
        src = m2 if sw_seq[f] == oracle.MODE_CELT_ONLY else v2
        pks["switch"].append(encs["switch"].encode_float(
            np.ascontiguousarray(src[sl]).ravel(), F))
    lost = {(2, 1)}  # stream 1 loses frame 2 -> SILK PLC in plane A
    steps = [[None if (f, b) in lost else pks[kinds[b]][f] for b in range(B)]
             for f in range(NF)]

    refs = []
    for b in range(B):
        d = Decoder()
        refs.append(np.stack(
            [np.asarray(d.decode_float(steps[f][b], F)).reshape(F, 2)
             for f in range(NF)]))

    def run(sharded: bool):
        dec = BatchedOpusDecoder(B, 2, transfer="plan")
        if sharded:
            def shard_rows(a):
                if a is None:
                    return None
                a = jnp.asarray(a)
                return jax.device_put(
                    a, NamedSharding(mesh, P(*("dp",) + (None,) * (a.ndim - 1)))
                )

            st = init_state(B, 2, silk_hist=dec.silk_internal)
            dec._serve_state = jax.tree.map(shard_rows, st)
            dec._serve_ring = shard_rows(jnp.zeros((B, F, 2), jnp.float32))
            dec._serve_plc_lpc = shard_rows(
                jnp.zeros((B, 2, LPC_ORDER), jnp.float32))
            dec._serve_plc_pitch = shard_rows(jnp.full((B,), 15, jnp.int32))
        outs = []
        for f in range(NF):
            dec.serve([steps[f]])
            outs.append(np.asarray(dec._serve_ring))
        return outs, dec._serve_ring

    outs_1d, _ = run(sharded=False)
    outs_sh, last_ring = run(sharded=True)

    # (c) layout survived the serve loop: still sharded over dp.
    assert not last_ring.sharding.is_fully_replicated, last_ring.sharding

    sw_adjacent = {2, 3}  # frames at/after the switch (stream 7 only)
    for f in range(NF):
        # (a) sharding is pure layout.
        np.testing.assert_allclose(outs_sh[f], outs_1d[f], rtol=0, atol=1e-5)
        # (b) correct decode vs the scalar oracle.
        for b in range(B):
            err = float(np.abs(outs_sh[f][b] - refs[b][f]).max())
            tail = float(np.abs(outs_sh[f][b][240:] - refs[b][f][240:]).max())
            if b == 7 and f in sw_adjacent:
                assert tail < 2e-3 and err < 0.5, (f, b, err, tail)
            else:
                assert err < 2e-3, (f, b, err)


def test_dryrun_multichip_entry():
    """The driver's dryrun (including its real-bitstream phase) runs clean
    on the forced CPU device mesh."""
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
