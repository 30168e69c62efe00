"""Build the native plane-A engine: g++ -> libceltfe.so (ctypes-loaded).

-ffp-contract=off forbids FMA contraction so float arithmetic matches the
Python reference op-for-op (same IEEE operations in the same order).
"""

import pathlib
import subprocess
import sys

HERE = pathlib.Path(__file__).parent


def build(verbose: bool = True) -> pathlib.Path:
    srcs = [HERE / "celt_frontend.cpp", HERE / "silk_frontend.cpp"]
    out = HERE / "libceltfe.so"
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC",
        "-ffp-contract=off", "-fno-fast-math", "-fopenmp",
        "-o", str(out), *map(str, srcs),
    ]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return out


if __name__ == "__main__":
    build()
    sys.exit(0)
