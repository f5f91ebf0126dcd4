"""Build + load the native text-preprocessing library.

Compiles ``anr_text.cpp`` into a shared object next to the sources on
first use (g++, -O2) and exposes it through ctypes. Build failures (no
compiler, read-only FS) degrade silently to the pure-Python path — the
native library is a host-side performance optimization, never a
correctness dependency.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import sys
import threading
from typing import List, Optional

logger = logging.getLogger(__name__)

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "anr_text.cpp")
_LIB = os.path.join(_DIR, f"_anr_text_{sys.implementation.cache_tag}.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_failed = False


def regenerate_tables() -> None:
    """Regenerate the C++ token tables from the Python source of truth."""
    from a_nice_rag_tpu.text.lemma_calibration import CALIBRATED_LEMMAS
    from a_nice_rag_tpu.text.preprocess import (
        _CONTRACTION_SPLITS,
        _IRREGULAR,
        _NO_LEMMA,
    )
    from a_nice_rag_tpu.text.stopwords_en import STOPWORDS_EN

    path = os.path.join(_DIR, "anr_text_tables.h")
    with open(path, "w", encoding="utf-8") as f:
        f.write("// Generated from a_nice_rag_tpu.text — do not edit by hand.\n")
        f.write("// Regenerate with: python -m a_nice_rag_tpu.native.build --tables\n")
        f.write("#pragma once\n#include <unordered_set>\n")
        f.write("#include <unordered_map>\n#include <string>\n\n")
        words = ",\n  ".join(f'"{w}"' for w in sorted(STOPWORDS_EN))
        f.write(
            "static const std::unordered_set<std::string> kStopwords = {\n"
            f"  {words}\n}};\n\n"
        )
        nl = ",\n  ".join(f'"{w}"' for w in sorted(_NO_LEMMA))
        f.write(
            "static const std::unordered_set<std::string> kNoLemma = {\n"
            f"  {nl}\n}};\n\n"
        )
        irr = ",\n  ".join(
            f'{{"{k}", "{v}"}}' for k, v in sorted(_IRREGULAR.items())
        )
        f.write(
            "static const std::unordered_map<std::string, std::string> "
            f"kIrregular = {{\n  {irr}\n}};\n\n"
        )
        cal = ",\n  ".join(
            f'{{"{k}", "{v}"}}' for k, v in sorted(CALIBRATED_LEMMAS.items())
        )
        f.write(
            "static const std::unordered_map<std::string, std::string> "
            f"kCalibrated = {{\n  {cal}\n}};\n\n"
        )
        spl = ",\n  ".join(
            f'{{"{k}", {{"{a}", "{b}"}}}}'
            for k, (a, b) in sorted(_CONTRACTION_SPLITS.items())
        )
        f.write(
            "static const std::unordered_map<std::string, "
            "std::pair<std::string, std::string>> "
            f"kContractionSplits = {{\n  {spl}\n}};\n"
        )


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except (OSError, subprocess.SubprocessError) as e:
        logger.info("native text lib build failed (%s); using Python path", e)
        return False


def load_text_lib() -> Optional[ctypes.CDLL]:
    """The compiled library, building it if needed; None if unavailable."""
    global _lib, _failed
    if _lib is not None or _failed:
        return _lib
    with _lock:
        if _lib is not None or _failed:
            return _lib
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                _failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
            lib.anr_preprocess.argtypes = [
                ctypes.c_char_p,
                ctypes.c_int,
                ctypes.c_char_p,
                ctypes.c_int,
            ]
            lib.anr_preprocess.restype = ctypes.c_int
            _lib = lib
        except OSError as e:
            logger.info("native text lib load failed: %s", e)
            _failed = True
    return _lib


_SERVE_SRC = os.path.join(_DIR, "anr_serve.cpp")
_SERVE_LIB = os.path.join(
    _DIR, f"_anr_serve_{sys.implementation.cache_tag}.so"
)
_serve_lock = threading.Lock()
_serve_lib: Optional[ctypes.CDLL] = None
_serve_failed = False


def _build_serve() -> bool:
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-pthread",
             _SERVE_SRC, "-o", _SERVE_LIB],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except (OSError, subprocess.SubprocessError) as e:
        logger.info("native serve lib build failed (%s)", e)
        return False


def load_serve_lib() -> Optional[ctypes.CDLL]:
    """The native binary serving front (anr_serve.cpp), building it on
    first use; None when no toolchain is available (callers fall back
    to the Python HTTP front)."""
    global _serve_lib, _serve_failed
    if _serve_lib is not None or _serve_failed:
        return _serve_lib
    with _serve_lock:
        if _serve_lib is not None or _serve_failed:
            return _serve_lib
        if (not os.path.exists(_SERVE_LIB)
                or os.path.getmtime(_SERVE_LIB) < os.path.getmtime(_SERVE_SRC)):
            if not _build_serve():
                _serve_failed = True
                return None
        try:
            lib = ctypes.CDLL(_SERVE_LIB)
            lib.anr_serve_start.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ]
            lib.anr_serve_start.restype = ctypes.c_void_p
            lib.anr_serve_port.argtypes = [ctypes.c_void_p]
            lib.anr_serve_port.restype = ctypes.c_int
            lib.anr_serve_poll.argtypes = [
                ctypes.c_void_p, ctypes.c_int, ctypes.c_double,
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_uint64),
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
                ctypes.c_double,
            ]
            lib.anr_serve_poll.restype = ctypes.c_int
            lib.anr_serve_queued_rows.argtypes = [ctypes.c_void_p]
            lib.anr_serve_queued_rows.restype = ctypes.c_int
            lib.anr_serve_reply.argtypes = [
                ctypes.c_void_p, ctypes.c_uint64, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
            ]
            lib.anr_serve_reply.restype = ctypes.c_int
            lib.anr_serve_reply_error.argtypes = [
                ctypes.c_void_p, ctypes.c_uint64, ctypes.c_char_p,
            ]
            lib.anr_serve_reply_error.restype = ctypes.c_int
            lib.anr_serve_stats.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint64),
                ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_uint64),
            ]
            lib.anr_serve_stats.restype = None
            lib.anr_serve_stop.argtypes = [ctypes.c_void_p]
            lib.anr_serve_stop.restype = None
            lib.anr_serve_free.argtypes = [ctypes.c_void_p]
            lib.anr_serve_free.restype = None
            _serve_lib = lib
        except OSError as e:
            logger.info("native serve lib load failed: %s", e)
            _serve_failed = True
    return _serve_lib


def native_preprocess(text: str, use_lemmatization: bool) -> Optional[List[str]]:
    """Tokenize via the native library; None when unavailable or when the
    output buffer would overflow (callers fall back to Python)."""
    lib = load_text_lib()
    if lib is None:
        return None
    raw = text.encode("utf-8", errors="ignore")
    cap = max(4096, 2 * len(raw) + 64)
    buf = ctypes.create_string_buffer(cap)
    n = lib.anr_preprocess(raw, int(use_lemmatization), buf, cap)
    if n < 0:
        return None
    if n == 0:
        return []
    return buf.raw[:n].decode("utf-8").rstrip("\n").split("\n")


if __name__ == "__main__":
    if "--tables" in sys.argv:
        regenerate_tables()
        print("tables regenerated")
    lib = load_text_lib()
    print("native lib:", "OK" if lib else "unavailable")
