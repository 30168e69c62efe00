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

    def serve(self, batches: list[list[bytes]], frame_size: int) -> np.ndarray:
        """Packed single-upload serving loop over multistream sessions:
        each step splits every session's packet into its elementary
        payloads and runs the (B*S)-stream batch through the CELT
        serve() loop (one transfer + one execute).  Returns the final
        step's un-mapped pcm [batch, frame_size, channels]."""
        schs = None
        elem_steps = []
        for packets in batches:
            payloads = []
            sch = []
            for pkt in packets:
                subs = split_multistream_packet(pkt, self.streams)
                for s, sub in enumerate(subs):
                    payloads.append(sub)
                    sch.append(2 if s < self.coupled else 1)
            elem_steps.append(payloads)
            if schs is None:
                schs = np.array(sch, np.int32)
        self.core.serve(elem_steps, frame_size, stream_channels=schs)
        pcm = np.asarray(self.core._serve_ring)  # [B*S, n, 2]
        B, S = self.batch, self.streams
        pcm = pcm.reshape(B, S, frame_size, 2)
        out = pcm[:, self.idx_stream, :, :]
        out = np.take_along_axis(
            out, self.idx_lr[None, :, None, None].repeat(B, 0).repeat(frame_size, 2), axis=3
        )[..., 0]
        out = np.where(self.silent[None, :, None], 0.0, out)
        return np.swapaxes(out, 1, 2).copy()

    def _decode_elementary(self, payloads, schs, frame_size):
        core = self.core
        if core.use_native:
            # Per-stream channel counts drive the shared raw pipeline path.
            return core.decode_frames(payloads, frame_size,
                                      stream_channels=np.array(schs, np.int32))
        # Python plane fallback.
        for front, sch in zip(core.fronts, schs):
            front.stream_channels = sch
        return core.synthesize(core.extract(payloads, frame_size), frame_size)

    def final_ranges(self) -> list[int]:
        """Per-session XOR of elementary final ranges (opus multistream)."""
        elem = self.core.final_ranges()
        S = self.streams
        return [int(np.bitwise_xor.reduce(elem[i * S : (i + 1) * S])) for i in range(self.batch)]
