"""Build the native plane-A engine: g++ -> libceltfe.so (ctypes-loaded).

The band-shape plane computes in float32 (libopus float-build semantics)
with FMA contraction and the host's native SIMD enabled; correctness is
gated at PCM level against libopus (tests/test_celt_decoder.py) and at
~1e-4 plane level against the float64 Python reference (tests/test_native.py),
not at bit level — reassociation-free ordering is still preserved
(-fno-fast-math), only contraction is allowed.
"""

import pathlib
import subprocess
import sys

HERE = pathlib.Path(__file__).parent


def build(verbose: bool = True) -> pathlib.Path:
    srcs = [HERE / "celt_frontend.cpp", HERE / "silk_frontend.cpp", HERE / "opus_frontend.cpp"]
    out = HERE / "libceltfe.so"
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC",
        "-march=native", "-ffp-contract=fast", "-fno-fast-math", "-fopenmp",
        "-funroll-loops",
        # errno-free libm calls: keeps IEEE semantics (ordering/rounding
        # unchanged, unlike -ffast-math) but lets gcc vectorise lrintf in
        # the bit-packers (measured 27% of plane A without it).
        "-fno-math-errno",
        "-o", str(out), *map(str, srcs),
    ]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return out


if __name__ == "__main__":
    build()
    sys.exit(0)
