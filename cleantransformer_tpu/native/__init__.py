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
        ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
         _SRC, "-o", _SO],
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
            lib.bpe_encode_batch.restype = ctypes.c_int32
            lib.bpe_encode_batch.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p),
                ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
                ctypes.c_int32, ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32)]
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

    def encode_batch(self, texts_words, max_length=None, pad_to_max=False,
                     pad_id=0, n_threads=None):
        """Multi-threaded batch encode + pack (bpe_encode_batch).

        ``texts_words``: list of per-text pre-split word lists. Returns
        {'input_ids', 'attention_mask'} int32 numpy arrays — padded to
        max_length (pad_to_max) or to the longest row, with rows truncated
        at max_length when given. One C call; rows fan out over a thread
        pool with per-thread memo caches."""
        import numpy as np
        n = len(texts_words)
        if n_threads is None:
            n_threads = min(8, os.cpu_count() or 1)
        joined = [" ".join(w).encode("utf-8") for w in texts_words]
        arr = (ctypes.c_char_p * n)(*joined)
        if max_length:
            cap = max_length
        else:
            # tight upper bound, single pass: a word of c codepoints emits
            # at most c + 1 ids (each element one token, worst case), and
            # codepoints <= utf-8 bytes
            cap = max((len(j) + len(w) + 1
                       for j, w in zip(joined, texts_words)), default=1)
        ids = np.empty((n, cap), np.int32)
        mask = np.empty((n, cap), np.int32)
        lens = np.empty((n,), np.int32)
        p = ctypes.POINTER(ctypes.c_int32)
        mx = self._lib.bpe_encode_batch(
            self._handle, arr, n, cap, pad_id, n_threads,
            ids.ctypes.data_as(p), mask.ctypes.data_as(p),
            lens.ctypes.data_as(p))
        # the codepoints+1-per-word bound above must hold — silent
        # truncation behind a valid-looking mask would corrupt training
        # data (not an assert: python -O would strip it)
        if not max_length and mx > cap:
            raise RuntimeError(
                f"bpe_encode_batch cap bound violated: {mx} > {cap}")
        if max_length:
            width = max_length if pad_to_max else min(
                int(lens.max(initial=0)), max_length)
        else:
            width = int(lens.max(initial=0))
        return {"input_ids": np.ascontiguousarray(ids[:, :width]),
                "attention_mask": np.ascontiguousarray(mask[:, :width])}

    def __del__(self):
        try:
            self._lib.bpe_destroy(self._handle)
        except Exception:
            pass
