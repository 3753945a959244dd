"""Native runtime (C++): PNG codec, prefetching dataset loader, ORB
vocabulary parser (csrc/slamio.cc).

Self-building: if the compiled extension is missing, the first import
compiles it with the system toolchain (g++ + libpng/zlib, all baked into
the image). Falls back to ``slamio = None`` so pure-Python paths keep
working when no toolchain is available.
"""

from __future__ import annotations

import importlib

slamio = None


def _load():
    return importlib.import_module("orb_slam2_comment_tpu._native.slamio")


try:  # pre-built extension
    slamio = _load()
except ImportError:
    try:
        import os
        import sys

        _csrc = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), "csrc")
        sys.path.insert(0, _csrc)
        try:
            import build_native

            build_native.build(verbose=False)
        finally:
            sys.path.remove(_csrc)
        slamio = _load()
    except Exception:  # toolchain missing / build failed -> pure Python
        slamio = None
