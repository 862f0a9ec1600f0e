"""Build the native host runtime: ``python -m dove_tpu.native.build``.

Plain g++ -O3 -shared; no external dependencies.
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path


def build(verbose: bool = True) -> Path:
    src = Path(__file__).parent / "dove_host.cc"
    out = Path(__file__).parent / "libdove_host.so"
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        "-pthread", str(src), "-o", str(out),
    ]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return out


if __name__ == "__main__":
    path = build()
    sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
    from dove_tpu import native

    assert native.available(), "library built but failed to load"
    print(f"built {path}")
