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


def test_dryrun_multichip_entry():
    """The driver's dryrun (including its real-bitstream phase) runs clean
    on the forced CPU device mesh."""
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
