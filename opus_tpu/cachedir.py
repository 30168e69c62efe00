"""Machine-keyed persistent-compilation-cache location.

The JAX persistent cache stores AOT-compiled CPU code keyed by HLO —
NOT by the host's CPU feature set.  A cache written on one machine and
replayed on another (shared /tmp images, CI artifact reuse, the driver
host vs the measurement host) can hand XLA:CPU object code compiled for
ISA extensions this host lacks ("could lead to execution errors such as
SIGILL", the warning MULTICHIP_r04 recorded).  Keying the directory by
a digest of the host's CPU flags makes every machine class get its own
cache.

stdlib-only ON PURPOSE: tests/conftest.py must call this BEFORE jax is
imported, so it loads this file by path (importing the opus_tpu package
would pull jax in).
"""

from __future__ import annotations

import hashlib
import platform


def machine_sig() -> str:
    """Short digest of this host's CPU class (ISA feature flags)."""
    src = platform.machine() + ";" + platform.processor()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                # x86 "flags"/arm64 "Features": the ISA extension list —
                # exactly what compiled code can depend on.
                if line.startswith(("flags", "Features")):
                    src += ";" + line.strip()
                    break
    except OSError:
        pass
    return hashlib.sha1(src.encode()).hexdigest()[:10]


def jax_cache_dir() -> str:
    return f"/tmp/opus_tpu_jax_cache_{machine_sig()}"
