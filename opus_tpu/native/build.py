"""Build the native plane-A engine: g++ -> libceltfe.so (ctypes-loaded).

The band-shape plane computes in float32 (libopus float-build semantics)
with FMA contraction and the host's native SIMD enabled; correctness is
gated at PCM level against libopus (tests/test_celt_decoder.py) and at
~1e-4 plane level against the float64 Python reference (tests/test_native.py),
not at bit level — reassociation-free ordering is still preserved
(-fno-fast-math), only contraction is allowed.

Build modes:
  * default           — -O3 -march=native, OpenMP if available
  * OPUS_TPU_SANITIZE — comma list for -fsanitize (e.g. "address,undefined");
    CI's memory-safety gate for the hand-written C++ plane, the analog of
    the reference's `#![deny(unsafe_code)]` (/root/reference/src/lib.rs:3).
    Sanitized builds drop -march=native and OpenMP so reports are clean.

Portability: -march=native and -fopenmp are probed, not assumed — Apple
clang has neither by default; `#pragma omp` degrades to single-thread.
"""

import os
import pathlib
import subprocess
import sys
import tempfile

HERE = pathlib.Path(__file__).parent


def _flag_works(cxx: str, flag: str) -> bool:
    with tempfile.TemporaryDirectory() as td:
        src = pathlib.Path(td) / "probe.cpp"
        src.write_text("int main(){return 0;}\n")
        r = subprocess.run(
            [cxx, flag, "-o", str(pathlib.Path(td) / "probe"), str(src)],
            capture_output=True,
        )
        return r.returncode == 0


def build(verbose: bool = True) -> pathlib.Path:
    cxx = os.environ.get("CXX", "g++")
    sanitize = os.environ.get("OPUS_TPU_SANITIZE", "").strip()
    srcs = [HERE / "celt_frontend.cpp", HERE / "silk_frontend.cpp", HERE / "opus_frontend.cpp"]
    out = HERE / ("libceltfe_san.so" if sanitize else "libceltfe.so")
    cmd = [
        # c++20: signed left-shift is defined (two's complement, P0907) —
        # the fixed-point planes shift negative Q-values everywhere, same
        # assumption libopus makes; c++17 made that UB (UBSAN-verified).
        cxx, "-std=c++20", "-shared", "-fPIC",
        "-ffp-contract=fast", "-fno-fast-math",
        # errno-free libm calls: keeps IEEE semantics (ordering/rounding
        # unchanged, unlike -ffast-math) but lets gcc vectorise lrintf in
        # the bit-packers (measured 27% of plane A without it).
        "-fno-math-errno",
    ]
    if sanitize:
        cmd += ["-O1", "-g", "-fno-omit-frame-pointer",
                f"-fsanitize={sanitize}"]
    else:
        cmd += ["-O3", "-funroll-loops"]
        for flag in ("-march=native", "-fopenmp"):
            if _flag_works(cxx, flag):
                cmd.append(flag)
    cmd += ["-o", str(out), *map(str, srcs)]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return out


if __name__ == "__main__":
    build()
    sys.exit(0)
