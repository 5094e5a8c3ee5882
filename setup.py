"""Build hook: compile the C++ IO library into the package.

The native data-loader (native/whisper_io.cpp + flac_decoder.cpp) is a plain
shared library consumed via ctypes — not a CPython extension — so the build
invokes the C++ compiler directly and ships the .so as package data
(whisper_tpu/_native/). Every native entry point has a pure-Python fallback
(io/wav.py, tests assert bit-identical outputs), so a missing/failed
toolchain degrades gracefully: the build warns and continues.
"""

import os
import shutil
import subprocess
import sys

from setuptools import setup
from setuptools.command.build_py import build_py

SOURCES = ["native/whisper_io.cpp", "native/flac_decoder.cpp"]
OUT_REL = os.path.join("whisper_tpu", "_native", "libwhisper_io.so")


def _compile_native(out_path: str) -> bool:
    cxx = os.environ.get("CXX") or shutil.which("g++") or shutil.which("clang++")
    if cxx is None:
        return False
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    cmd = [cxx, "-O3", "-Wall", "-fPIC", "-std=c++17", "-shared",
           "-o", out_path, *SOURCES]
    try:
        subprocess.run(cmd, check=True)
        return True
    except (OSError, subprocess.CalledProcessError) as e:
        print(f"warning: native IO library build failed ({e}); "
              "the pure-Python WAV/FLAC path will be used", file=sys.stderr)
        return False


class BuildPyWithNative(build_py):
    def run(self):
        super().run()
        if os.path.exists(SOURCES[0]):  # sdist/tree builds only
            _compile_native(os.path.join(self.build_lib, OUT_REL))


setup(cmdclass={"build_py": BuildPyWithNative})
