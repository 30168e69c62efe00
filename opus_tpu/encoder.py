"""Top-level Opus encoder (CELT mode).

Fills the reference's interface sketch (/root/reference/src/encoder.rs):
``Encoder`` packetises CELT frames with the RFC 6716 ToC.  CELT-only
full-band CBR at 48 kHz for this milestone; SILK/hybrid modes and VBR land
with the SILK milestone.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .celt.encoder import CeltEncoder
from .errors import BadArguments
from .types import Channels, SamplingRate

#: frame samples (48 kHz) -> CELT fullband ToC config number.
_CELT_FB_CONFIG = {120: 28, 240: 29, 480: 30, 960: 31}


@dataclasses.dataclass(frozen=True)
class EncoderConfiguration:
    sampling_rate: SamplingRate = SamplingRate.HZ_48000
    channels: Channels = Channels.STEREO
    bitrate: int = 96000  # bits/sec, CBR


class Encoder:
    """Stateful Opus encoder for one elementary stream."""

    def __init__(self, configuration: EncoderConfiguration | None = None):
        self.config = configuration or EncoderConfiguration()
        if int(self.config.sampling_rate) != 48000:
            raise BadArguments("encoder supports 48 kHz input for now")
        self.channels = int(self.config.channels)
        self.celt = CeltEncoder(self.channels)
        self.bitrate = int(self.config.bitrate)

    def reset(self) -> None:
        self.celt.reset()

    @property
    def final_range(self) -> int:
        return self.celt.rng

    def max_encoded_size(self, frame_size: int) -> int:
        return 1 + min(1275, self.frame_bytes(frame_size))

    def frame_bytes(self, frame_size: int) -> int:
        return max(2, min(1275, (self.bitrate * frame_size) // (48000 * 8)))

    def encode(self, pcm: np.ndarray) -> bytes:
        """Encode one frame of float PCM [N, channels] in ±1; N in
        {120, 240, 480, 960}.  Returns a complete Opus packet."""
        pcm = np.asarray(pcm, dtype=np.float32)
        if pcm.ndim == 1:
            pcm = pcm[:, None]
        n = pcm.shape[0]
        if n not in _CELT_FB_CONFIG:
            raise BadArguments("frame must be 2.5/5/10/20 ms at 48 kHz")
        if pcm.shape[1] != self.channels:
            raise BadArguments("channel count mismatch")
        toc = (_CELT_FB_CONFIG[n] << 3) | (0x4 if self.channels == 2 else 0)
        payload = self.celt.encode(pcm, self.frame_bytes(n))
        return bytes([toc]) + payload
