"""Native (C++) components, bound via ctypes.

``NativeBPEEncoder`` wraps native/bpe_encoder.cpp — the greedy
longest-match-first tokenize core with UTF-8 codepoint matching and a
word->ids memo. Built on first use with g++ (cached .so next to the source);
callers fall back to the Python path when no compiler is available.
"""

import ctypes
import os
import subprocess
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "bpe_encoder.cpp")
_SO = os.path.join(_HERE, "_bpe_encoder.so")
_LOCK = threading.Lock()
_LIB = None
_BUILD_FAILED = False


def _build():
    subprocess.run(
        ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO],
        check=True, capture_output=True)


def load_library():
    """Build (if needed) and load the shared library; None if unavailable."""
    global _LIB, _BUILD_FAILED
    with _LOCK:
        if _LIB is not None or _BUILD_FAILED:
            return _LIB
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                _build()
            lib = ctypes.CDLL(_SO)
            lib.bpe_create.restype = ctypes.c_void_p
            lib.bpe_create.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32,
                ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p,
                ctypes.c_char_p]
            lib.bpe_encode_words.restype = ctypes.c_int32
            lib.bpe_encode_words.argtypes = [
                ctypes.c_void_p, ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int32]
            lib.bpe_clear_cache.argtypes = [ctypes.c_void_p]
            lib.bpe_destroy.argtypes = [ctypes.c_void_p]
            _LIB = lib
        except Exception:
            _BUILD_FAILED = True
            _LIB = None
        return _LIB


class NativeBPEEncoder:
    """ctypes handle for one vocab. Matching semantics are identical to
    BPETokenizer.tokenize's greedy loop (verified in tests/test_native.py)."""

    def __init__(self, vocab, unk, add_pre=None, add_mid=None, add_post="</w>"):
        lib = load_library()
        if lib is None:
            raise RuntimeError("native bpe encoder unavailable (no g++?)")
        self._lib = lib
        arr = (ctypes.c_char_p * len(vocab))(
            *[v.encode("utf-8") for v in vocab])
        self._handle = lib.bpe_create(
            arr, len(vocab), unk.encode("utf-8"),
            (add_pre or "").encode("utf-8"), (add_mid or "").encode("utf-8"),
            (add_post or "").encode("utf-8"))
        self._buf_len = 1 << 16
        self._buf = (ctypes.c_int32 * self._buf_len)()

    def encode_words(self, words):
        """list of pre-split words -> flat id list."""
        joined = " ".join(words).encode("utf-8")
        n = self._lib.bpe_encode_words(self._handle, joined, self._buf,
                                       self._buf_len)
        while n == self._buf_len:  # grow on truncation
            self._buf_len *= 2
            self._buf = (ctypes.c_int32 * self._buf_len)()
            n = self._lib.bpe_encode_words(self._handle, joined, self._buf,
                                           self._buf_len)
        return list(self._buf[:n])

    def __del__(self):
        try:
            self._lib.bpe_destroy(self._handle)
        except Exception:
            pass
