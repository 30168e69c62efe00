"""opus_tpu — a TPU-native Opus (RFC 6716/7845/8251) codec framework.

Built from scratch for TPUs in JAX/XLA/Pallas with capability parity with
the reference Rust crate `hasenbanck/opus-native` (see SURVEY.md):

* Host plane (sequential, integer): packet framing, the Opus range coder,
  bitstream symbol extraction — tight scalar/native loops that emit dense
  per-frame *symbol planes* for batches of streams.
* TPU plane (dense, float, batched): CELT IMDCT/MDCT filterbanks as MXU
  matmuls, band denormalisation, PVQ shapes, anti-collapse, pitch
  post-filter, SILK LPC/LTP synthesis as scans, resamplers — all batched
  over thousands of concurrent streams and shardable over a device mesh.
"""

from .errors import (
    BadArguments,
    BufferTooSmall,
    FrameSizeTooSmall,
    InternalError,
    InvalidPacket,
    OpusError,
    UnsupportedMode,
)
from .packet import (
    MAX_FRAME_BYTES,
    MAX_FRAMES_PER_PACKET,
    ParsedPacket,
    parse_packet,
    query_packet_bandwidth,
    query_packet_channel_count,
    query_packet_codec_mode,
    query_packet_frame_count,
    query_packet_sample_count,
    query_packet_samples_per_frame,
)
from .decoder import Decoder, DecoderConfiguration
from .softclip import pcm_soft_clip
from .types import Bandwidth, Channels, CodecMode, SamplingRate, convert_samples

__all__ = [
    "BadArguments",
    "BufferTooSmall",
    "FrameSizeTooSmall",
    "InternalError",
    "InvalidPacket",
    "OpusError",
    "UnsupportedMode",
    "MAX_FRAME_BYTES",
    "MAX_FRAMES_PER_PACKET",
    "ParsedPacket",
    "parse_packet",
    "query_packet_bandwidth",
    "query_packet_channel_count",
    "query_packet_codec_mode",
    "query_packet_frame_count",
    "query_packet_sample_count",
    "query_packet_samples_per_frame",
    "Decoder",
    "DecoderConfiguration",
    "pcm_soft_clip",
    "Bandwidth",
    "Channels",
    "CodecMode",
    "SamplingRate",
    "convert_samples",
]

__version__ = "0.1.0"
