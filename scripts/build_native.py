#!/usr/bin/env python
"""Build the native C++ extensions in-place.

    python scripts/build_native.py

Produces ``siss_tpu/_siss_batcher*.so``; all call sites degrade to numpy
when the extension is absent.
"""

import os
import shutil
import sys
import sysconfig
import subprocess
import tempfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    import argparse

    argparse.ArgumentParser(description=__doc__).parse_args()
    src = os.path.join(ROOT, "csrc", "batcher.cpp")
    include = sysconfig.get_paths()["include"]
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    out = os.path.join(ROOT, "siss_tpu", f"_siss_batcher{suffix}")
    cmd = [
        os.environ.get("CXX", "g++"), "-O3", "-march=native", "-shared", "-fPIC",
        "-std=c++17", f"-I{include}", src, "-o", out, "-pthread",
    ]
    print(" ".join(cmd))
    subprocess.check_call(cmd)
    print(f"built {out}")


if __name__ == "__main__":
    main()
