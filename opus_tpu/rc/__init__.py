"""The Opus range coder (RFC 6716 sec. 4.1) — the sequential entropy core.

Capability parity with /root/reference/src/range_coder/ (mod.rs, decoder.rs,
encoder.rs).  Every symbol depends on all previous symbols, so this plane is
irreducibly sequential per stream; in the TPU architecture it runs host-side
(this pure-Python form for the reference path, a C++ batch engine in
opus_tpu/native for throughput) and emits dense symbol planes consumed by
the batched device DSP.
"""

from .common import BITRES, Tell, ilog
from .decoder import RangeDecoder
from .encoder import RangeEncoder

__all__ = ["BITRES", "Tell", "ilog", "RangeDecoder", "RangeEncoder"]
