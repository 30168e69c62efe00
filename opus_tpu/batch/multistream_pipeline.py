"""Batched multistream decode: many multistream sessions on one device.

BASELINE.json config 5: "8-ch ambisonics multistream decode +
repacketizer, 1024 batched streams sharded over ICI".  A multistream
packet carries S self-delimited elementary streams (RFC 7845 family 1
mapping); decoding B sessions therefore batches B*S elementary CELT
decodes.  Plane A (native C++) splits + entropy-decodes every elementary
stream; plane B synthesises the whole (B*S)-stream batch in one jitted
step; the channel un-mapping is a vectorised gather.

Sharding: the batch axis is `dp` in the device mesh — see
__graft_entry__.dryrun_multichip for the multi-device layout; this
module keeps the single-chip fast path.
"""

from __future__ import annotations

import numpy as np

from .. import parse_packet
from .pipeline import BatchedCeltDecoder


def split_multistream_packet(packet: bytes, streams: int) -> list[bytes]:
    """Split one multistream packet into its elementary CELT payloads
    (self-delimited framing for all but the last stream)."""
    out = []
    offset = 0
    for s in range(streams):
        self_delimited = s < streams - 1
        parsed = parse_packet(packet[offset:], self_delimited)
        frames = parsed.frames(packet[offset:])
        assert parsed.frame_count == 1, "one frame per stream in the fast path"
        out.append(frames[0])
        offset += parsed.packet_offset
    return out


class BatchedMultistreamDecoder:
    """Decode a batch of identical-layout multistream sessions.

    Each session: `streams` elementary streams, the first `coupled` of
    them stereo, mapped to `channels` output channels via `mapping`
    (value 255 = silent channel).
    """

    def __init__(self, batch: int, channels: int, streams: int, coupled: int,
                 mapping: list[int], use_native: bool | None = None):
        self.batch = batch
        self.channels = channels
        self.streams = streams
        self.coupled = coupled
        self.mapping = list(mapping)
        # One elementary decoder slot per (session, stream); all run as a
        # single plane-B batch.  Elementary decoders are stereo-shaped;
        # mono streams broadcast (pipeline handles stream_channels=1).
        self.core = BatchedCeltDecoder(batch * streams, 2, use_native=use_native)
        # Precomputed gather: output channel -> (stream index, left/right).
        idx_stream = np.zeros(channels, np.int32)
        idx_lr = np.zeros(channels, np.int32)
        self.silent = np.zeros(channels, bool)
        for ch, m in enumerate(self.mapping):
            if m == 255:
                self.silent[ch] = True
            elif m < 2 * coupled:
                idx_stream[ch] = m >> 1
                idx_lr[ch] = m & 1
            else:
                idx_stream[ch] = coupled + (m - 2 * coupled)
                idx_lr[ch] = 0
        self.idx_stream = idx_stream
        self.idx_lr = idx_lr

    def decode_frames(self, packets: list[bytes], frame_size: int) -> np.ndarray:
        """packets: one multistream packet per session.
        Returns pcm [batch, frame_size, channels]."""
        payloads = []
        schs = []
        for pkt in packets:
            subs = split_multistream_packet(pkt, self.streams)
            for s, sub in enumerate(subs):
                payloads.append(sub)
                schs.append(2 if s < self.coupled else 1)
        # The native batch front end takes per-stream channel counts.
        if self.core.use_native:
            sch = np.array(schs, dtype=np.int32)
            self.core.native_sch = sch
        pcm = self._decode_elementary(payloads, schs, frame_size)
        # Un-map: [B*S, n, 2] -> [B, channels, n]
        B, S = self.batch, self.streams
        pcm = pcm.reshape(B, S, frame_size, 2)
        out = pcm[:, self.idx_stream, :, :]                      # [B, ch, n, 2]
        out = np.take_along_axis(
            out, self.idx_lr[None, :, None, None].repeat(B, 0).repeat(frame_size, 2), axis=3
        )[..., 0]
        out = np.where(self.silent[None, :, None], 0.0, out)
        return np.swapaxes(out, 1, 2).copy()

    def _decode_elementary(self, payloads, schs, frame_size):
        core = self.core
        if core.use_native:
            # Per-stream channel counts: drive the native batch directly.
            import ctypes

            import jax.numpy as jnp

            nat = core.native
            B = nat.batch
            blob = b"".join(payloads)
            lens = np.array([len(p) for p in payloads], dtype=np.int32)
            sch = np.array(schs, dtype=np.int32)
            n48 = frame_size * core.downsample
            x = np.zeros((B, 2 * 960), dtype=np.float32)
            ble = np.zeros((B, 2, 21), dtype=np.float32)
            meta = np.zeros((B, 16), dtype=np.int32)
            gains = np.zeros((B, 3), dtype=np.float32)
            rc = nat.lib.celt_fe_decode_batch_f32(
                nat.handles, blob,
                lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), B, n48,
                sch.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), x.shape[1],
                ble.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                meta.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                gains.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            )
            if rc != B:
                raise ValueError(f"multistream batch decode failed at {-rc-1}")
            arrays_np, lm, short_mask = self._stack_from_native(x, ble, meta, gains)
            arrays = [jnp.asarray(a) for a in arrays_np]
            if not short_mask.any() or short_mask.all():
                step = core._step_fn(lm, bool(short_mask[0]))
                core.state, pcm = step(core.state, *arrays)
                return np.asarray(pcm)
            from ..dsp.synthesis import SynthState

            state_long, pcm_long = core._step_fn(lm, False)(core.state, *arrays)
            state_short, pcm_short = core._step_fn(lm, True)(core.state, *arrays)
            m = jnp.asarray(short_mask)
            core.state = SynthState(
                jnp.where(m[:, None, None], state_short.mem, state_long.mem),
                jnp.where(m[:, None], state_short.preemph, state_long.preemph),
            )
            return np.asarray(jnp.where(m[:, None, None], pcm_short, pcm_long))
        # Python plane fallback.
        for front, sch in zip(core.fronts, schs):
            front.stream_channels = sch
        return core.synthesize(core.extract(payloads, frame_size), frame_size)

    def _stack_from_native(self, x, ble, meta, gains):
        from ..celt import modes

        lm = int(meta[0, 2])
        n = (1 << lm) * 120
        B = self.batch * self.streams
        xs = x[:, : 2 * n].reshape(B, 2, n)
        mono = (meta[:, 3] == 1)[:, None, None]
        xq = np.where(mono, np.broadcast_to(xs[:, :1, :], (B, 2, n)), xs)
        loge = ble
        m = 1 << lm
        bound = m * modes.E_BANDS[meta[:, 5]]
        bound = np.where(meta[:, 0] != 0, 0, bound).astype(np.int32)
        periods = meta[:, 6:9].copy()
        periods[:, 2] = np.maximum(periods[:, 2], 0)
        return (
            (np.ascontiguousarray(xq), loge, bound,
             periods.astype(np.int32), gains,
             meta[:, 9:12].astype(np.int32)),
            lm,
            meta[:, 1] != 0,
        )

    def final_ranges(self) -> list[int]:
        """Per-session XOR of elementary final ranges (opus multistream)."""
        elem = self.core.final_ranges()
        S = self.streams
        return [int(np.bitwise_xor.reduce(elem[i * S : (i + 1) * S])) for i in range(self.batch)]
