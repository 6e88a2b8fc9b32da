"""Native (C++) runtime components with on-demand build + ctypes bridge.

The reference implements its host runtime (allocator, scheduler plumbing,
penalty math) in C++; this package provides the TPU build's equivalents
(csrc/native.cpp). The shared library is compiled with g++ on first import
and cached next to this file; everything degrades to the pure-Python
implementations when a toolchain isn't available.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Dict, List, Optional, Tuple

logger = logging.getLogger(__name__)

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "..", "..", "csrc", "native.cpp")
_LIB_PATH = os.path.join(_HERE, "_native.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    src = os.path.abspath(_SRC)
    if not os.path.exists(src):
        return False
    cmd = [
        "g++", "-O2", "-shared", "-fPIC", "-std=c++17",
        "-o", _LIB_PATH, src,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:  # pragma: no cover
        logger.warning("native build failed: %s", e)
        return False


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("ZT_NO_NATIVE") == "1":
            return None
        if not os.path.exists(_LIB_PATH) or (
            os.path.exists(_SRC) and os.path.getmtime(_SRC) > os.path.getmtime(_LIB_PATH)
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError as e:  # pragma: no cover
            logger.warning("native load failed: %s", e)
            return None
        i32, f32, vp = ctypes.c_int32, ctypes.c_float, ctypes.c_void_p
        pi32, pf32 = ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float)
        lib.pa_create.restype = vp
        lib.pa_create.argtypes = [i32, i32, i32]
        lib.pa_destroy.argtypes = [vp]
        lib.pa_alloc.restype = i32
        lib.pa_alloc.argtypes = [vp]
        lib.pa_ref.argtypes = [vp, i32]
        lib.pa_free_page.restype = i32
        lib.pa_free_page.argtypes = [vp, i32]
        lib.pa_num_free.restype = i32
        lib.pa_num_free.argtypes = [vp]
        lib.pa_match_prefix.restype = i32
        lib.pa_match_prefix.argtypes = [vp, pi32, i32, pi32, i32]
        lib.pa_register_prefix.argtypes = [vp, pi32, i32, pi32, i32]
        lib.pa_ref_count.restype = i32
        lib.pa_ref_count.argtypes = [vp, i32]
        lib.pa_num_cached.restype = i32
        lib.pa_num_cached.argtypes = [vp]
        lib.ngram_penalty.restype = i32
        lib.ngram_penalty.argtypes = [pi32, i32, f32, f32, pi32, pf32, i32]
        _lib = lib
        return _lib


class NativePageAllocator:
    """ctypes wrapper matching kvcache.allocator.PageAllocator's surface."""

    def __init__(self, num_pages: int, page_size: int, enable_prefix_cache: bool = False):
        lib = load()
        assert lib is not None, "native library unavailable"
        self._lib = lib
        self._h = lib.pa_create(num_pages, page_size, 1 if enable_prefix_cache else 0)
        self.num_pages = num_pages
        self.page_size = page_size
        self.enable_prefix_cache = enable_prefix_cache

    def __del__(self):
        try:
            self._lib.pa_destroy(self._h)
        except Exception:
            pass

    @property
    def num_free(self) -> int:
        return int(self._lib.pa_num_free(self._h))

    def free_token_capacity(self) -> int:
        return self.num_free * self.page_size

    def alloc_page(self) -> Optional[int]:
        p = int(self._lib.pa_alloc(self._h))
        return None if p < 0 else p

    def ref_page(self, page: int) -> None:
        self._lib.pa_ref(self._h, page)

    def free_page(self, page: int) -> None:
        rc = self._lib.pa_free_page(self._h, page)
        assert rc == 0, f"double free of page {page}"

    def free_pages(self, pages) -> None:
        for p in pages:
            self.free_page(p)

    def ref_count(self, page: int) -> int:
        return int(self._lib.pa_ref_count(self._h, page))

    @property
    def num_cached(self) -> int:
        return int(self._lib.pa_num_cached(self._h))

    def match_prefix(self, tokens) -> Tuple[List[int], int]:
        import numpy as np

        arr = np.asarray(list(tokens), dtype=np.int32)
        cap = max(len(arr) // self.page_size + 1, 1)
        out = np.zeros(cap, dtype=np.int32)
        n = self._lib.pa_match_prefix(
            self._h,
            arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(arr),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            cap,
        )
        return out[:n].tolist(), int(n) * self.page_size

    def register_prefix(self, tokens, pages) -> None:
        import numpy as np

        arr = np.asarray(list(tokens), dtype=np.int32)
        pg = np.asarray(list(pages), dtype=np.int32)
        self._lib.pa_register_prefix(
            self._h,
            arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(arr),
            pg.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(pg),
        )


def native_ngram_penalty_map(all_tokens, ngram_penalty: float, repetition_penalty: float) -> Optional[Dict[int, float]]:
    """C++ calc_repetition_ngram over the reversed sequence; None if the
    native library is unavailable."""
    lib = load()
    if lib is None:
        return None
    import numpy as np

    rev = np.asarray(list(all_tokens)[::-1], dtype=np.int32)
    cap = len(rev) + 1
    out_t = np.zeros(cap, dtype=np.int32)
    out_v = np.zeros(cap, dtype=np.float32)
    n = lib.ngram_penalty(
        rev.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        len(rev),
        ctypes.c_float(ngram_penalty),
        ctypes.c_float(repetition_penalty),
        out_t.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out_v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        cap,
    )
    return {int(t): float(v) for t, v in zip(out_t[:n], out_v[:n])}
