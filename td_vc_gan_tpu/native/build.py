"""Build the native library: ``python -m td_vc_gan_tpu.native.build``."""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path


def main():
    root = Path(__file__).parent
    build = root / "build"
    subprocess.check_call(["cmake", "-S", str(root), "-B", str(build)])
    subprocess.check_call(["cmake", "--build", str(build), "-j"])
    lib = root / "lib" / "libtdvc_audio.so"
    print(f"built {lib}" if lib.exists() else "BUILD FAILED", file=sys.stderr)
    return 0 if lib.exists() else 1


if __name__ == "__main__":
    raise SystemExit(main())
