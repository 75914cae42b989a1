"""ctypes bindings for the native similarity kernels (optional fast path).

The C sources (payor_mdm_spark/native/jwkernels.c) implement the same
published algorithms with the same arithmetic as the pure-Python kernels;
for ASCII inputs the results are bit-identical (pinned by
tests/test_native_kernels.py property tests). Non-ASCII input and
over-long strings route to the Python fallback — C indexes bytes, Python
indexes codepoints.

Build: `gcc -O3 -shared -fPIC` at first use, cached next to the source
(atomic rename, safe under concurrent workers). No third-party packages:
ctypes is stdlib, gcc is a system compiler. If no compiler is present the
engine silently stays on the pure-Python kernels.
"""

from __future__ import annotations

import ctypes
import os
import shutil
import subprocess
import tempfile

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_SRC = os.path.join(_NATIVE_DIR, "jwkernels.c")
_SO = os.path.join(_NATIVE_DIR, "_jwkernels.so")

_lib = None
_tried = False


def _build() -> str | None:
    gcc = shutil.which("gcc") or shutil.which("cc")
    if gcc is None or not os.path.exists(_SRC):
        return None
    tmp = tempfile.mktemp(suffix=".so", dir=_NATIVE_DIR)
    try:
        subprocess.run(
            [gcc, "-O3", "-shared", "-fPIC", "-o", tmp, _SRC, "-lm"],
            check=True, capture_output=True, timeout=120,
        )
        os.replace(tmp, _SO)  # atomic: concurrent builders all win
        return _SO
    except Exception:  # noqa: BLE001 — any build problem means "no fast path"
        if os.path.exists(tmp):
            os.unlink(tmp)
        return None


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    path = _SO if os.path.exists(_SO) else _build()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    lib.jaro_winkler_c.restype = ctypes.c_double
    lib.jaro_winkler_c.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_char_p, ctypes.c_int,
    ]
    lib.trigram_cosine_c.restype = ctypes.c_double
    lib.trigram_cosine_c.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_char_p, ctypes.c_int,
    ]
    _lib = lib
    return _lib


def native_jaro_winkler(a: str, b: str) -> float | None:
    """Bit-identical fast path for ASCII inputs; None -> use Python."""
    lib = get_lib()
    if lib is None or not (a.isascii() and b.isascii()):
        return None
    ab, bb = a.encode(), b.encode()
    r = lib.jaro_winkler_c(ab, len(ab), bb, len(bb))
    return None if r < 0.0 else r  # -1.0 = over-long sentinel


def native_trigram_cosine(a: str, b: str) -> float | None:
    lib = get_lib()
    if lib is None or not (a.isascii() and b.isascii()):
        return None
    ab, bb = a.encode(), b.encode()
    r = lib.trigram_cosine_c(ab, len(ab), bb, len(bb))
    return None if r < 0.0 else r
