"""Batched multistream decode: many multistream sessions on one device.

BASELINE.json config 5: "8-ch ambisonics multistream decode +
repacketizer, 1024 batched streams sharded over ICI".  A multistream
packet carries S self-delimited elementary streams (RFC 7845 family 1
mapping); decoding B sessions therefore batches B*S elementary decodes.
Plane A (native C++) splits + entropy-decodes every elementary stream;
plane B synthesises the whole (B*S)-stream batch in one jitted step; the
channel un-mapping is a vectorised gather.

Two cores:
* mode="celt" (default): CELT-only elementary streams through the
  BatchedCeltDecoder fast path (incl. the packed single-upload serve()).
* mode="opus": SILK / hybrid / mixed elementary streams through the
  mixed-mode BatchedOpusDecoder — legal family-1 ambisonics traffic
  (reference anchor: the multistream contract decoder.rs:305-314,
  packet_offset for multiple streams).

Multi-frame elementary packets (codes 1-3) are decoded as successive
batch steps: the splitter rebuilds per-frame code-0 packets, which is
decode-equivalent (the framing code never enters decoder state).

Sharding: the batch axis is `dp` in the device mesh — see
__graft_entry__.dryrun_multichip for the multi-device layout; this
module keeps the single-chip fast path.
"""

from __future__ import annotations

import numpy as np

from .. import parse_packet
from .pipeline import BatchedCeltDecoder


def split_multistream_packet(packet: bytes, streams: int) -> list[tuple[int, list[bytes]]]:
    """Split one multistream packet -> per stream (toc_byte, [frames...]).

    Self-delimited framing for all but the last stream; every framing
    code (0-3, CBR/VBR, padding) is accepted — multi-frame packets come
    back as per-frame lists."""
    out = []
    offset = 0
    for s in range(streams):
        self_delimited = s < streams - 1
        parsed = parse_packet(packet[offset:], self_delimited)
        frames = parsed.frames(packet[offset:])
        out.append((packet[offset], list(frames)))
        offset += parsed.packet_offset
    return out


class BatchedMultistreamDecoder:
    """Decode a batch of identical-layout multistream sessions.

    Each session: `streams` elementary streams, the first `coupled` of
    them stereo, mapped to `channels` output channels via `mapping`
    (value 255 = silent channel).
    """

    def __init__(self, batch: int, channels: int, streams: int, coupled: int,
                 mapping: list[int], use_native: bool | None = None,
                 mode: str = "celt"):
        assert mode in ("celt", "opus")
        self.batch = batch
        self.channels = channels
        self.streams = streams
        self.coupled = coupled
        self.mapping = list(mapping)
        self.mode = mode
        # One elementary decoder slot per (session, stream); all run as a
        # single plane-B batch.  Elementary decoders are stereo-shaped;
        # mono streams broadcast (pipeline handles stream_channels=1).
        if mode == "celt":
            self.core = BatchedCeltDecoder(batch * streams, 2, use_native=use_native)
        else:
            from .opus_pipeline import BatchedOpusDecoder

            self.core = BatchedOpusDecoder(batch * streams, 2)
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

    def _split_batch(self, packets: list[bytes]):
        """-> (n_frames, per_session split) with a uniform frame count."""
        per_session = [split_multistream_packet(p, self.streams) for p in packets]
        nf = len(per_session[0][0][1])
        for sess in per_session:
            for _, frames in sess:
                if len(frames) != nf:
                    raise ValueError("elementary streams disagree on frame count")
        return nf, per_session

    def _unmap(self, pcm: np.ndarray, frame_size: int) -> np.ndarray:
        """[B*S, n, 2] -> [B, n, channels] via the mapping gather."""
        B, S = self.batch, self.streams
        pcm = pcm.reshape(B, S, frame_size, 2)
        out = pcm[:, self.idx_stream, :, :]  # [B, ch, n, 2]
        out = np.take_along_axis(
            out, self.idx_lr[None, :, None, None].repeat(B, 0).repeat(frame_size, 2),
            axis=3,
        )[..., 0]
        out = np.where(self.silent[None, :, None], 0.0, out)
        return np.swapaxes(out, 1, 2).copy()

    def _step_payloads(self, per_session, f: int):
        """Elementary inputs for frame f of every (session, stream)."""
        payloads, schs, fulls = [], [], []
        for sess in per_session:
            for s, (toc, frames) in enumerate(sess):
                if self.mode == "opus":
                    # Rebuild a standard code-0 packet: the framing code is
                    # transport-only, so per-frame code-0 packets decode
                    # identically to the original multi-frame packet.
                    fulls.append(bytes([toc & 0xFC]) + frames[f])
                else:
                    payloads.append(frames[f])
                    schs.append(2 if s < self.coupled else 1)
        return payloads, schs, fulls

    def decode_frames(self, packets: list[bytes], frame_size: int) -> np.ndarray:
        """packets: one multistream packet per session; frame_size = samples
        per FRAME (multi-frame packets return nf*frame_size samples).
        Returns pcm [batch, nf*frame_size, channels]."""
        nf, per_session = self._split_batch(packets)
        outs = []
        for f in range(nf):
            payloads, schs, fulls = self._step_payloads(per_session, f)
            if self.mode == "opus":
                pcm = np.asarray(self.core.decode_frames(fulls))
                fsz = pcm.shape[1]
            else:
                pcm = self._decode_elementary(payloads, schs, frame_size)
                fsz = frame_size
            outs.append(self._unmap(pcm, fsz))
        return np.concatenate(outs, axis=1) if nf > 1 else outs[0]

    def serve(self, batches: list[list[bytes]], frame_size: int) -> np.ndarray:
        """Packed single-upload serving loop over multistream sessions:
        each step splits every session's packet into its elementary
        payloads and runs the (B*S)-stream batch through the packed
        serve() loop (one transfer + one execute per frame).  Multi-frame
        packets become successive serving steps.  Returns the final
        step's un-mapped pcm [batch, frame_size, channels]."""
        schs = None
        elem_steps = []
        full_steps = []
        for packets in batches:
            nf, per_session = self._split_batch(packets)
            for f in range(nf):
                payloads, sch, fulls = self._step_payloads(per_session, f)
                if self.mode == "opus":
                    full_steps.append(fulls)
                else:
                    elem_steps.append(payloads)
                    if schs is None:
                        schs = np.array(sch, np.int32)
        if self.mode == "opus":
            self.core.serve(full_steps)
        else:
            self.core.serve(elem_steps, frame_size, stream_channels=schs)
        pcm = np.asarray(self.core._serve_ring)  # [B*S, n, 2]
        return self._unmap(pcm, pcm.shape[1])

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
