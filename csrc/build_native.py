"""Build the native slamio extension into orb_slam2_comment_tpu/_native/.

Usage: python csrc/build_native.py
Invoked automatically (once) by orb_slam2_comment_tpu._native on first
import if the extension is missing.
"""

import os
import subprocess
import sys
import sysconfig


def build(verbose: bool = True) -> str:
    here = os.path.dirname(os.path.abspath(__file__))
    repo = os.path.dirname(here)
    out_dir = os.path.join(repo, "orb_slam2_comment_tpu", "_native")
    os.makedirs(out_dir, exist_ok=True)
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    out = os.path.join(out_dir, "slamio" + suffix)

    import numpy as np

    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
        os.path.join(here, "slamio.cc"),
        "-I", sysconfig.get_paths()["include"],
        "-I", np.get_include(),
        "-lpng", "-lz",
        "-o", out,
    ]
    if verbose:
        print("+", " ".join(cmd), file=sys.stderr)
    subprocess.run(cmd, check=True)
    return out


if __name__ == "__main__":
    build()
