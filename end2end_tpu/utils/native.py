"""Loader for the native C++ host runtime (csrc/e2e_native.cpp).

Builds the shared library on first use with g++ (cached next to the source),
and exposes ctypes wrappers.  Every entry point has a pure-Python/JAX
fallback elsewhere in the package, so the library degrades gracefully when no
compiler is available — `available()` reports which path is active.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc", "e2e_native.cpp")
_OUT = os.path.join(os.path.dirname(__file__), "..", "..", "csrc", "build", "libe2e_native.so")


def _build() -> str | None:
    src = os.path.abspath(_SRC)
    out = os.path.abspath(_OUT)
    if not os.path.exists(src):
        return None
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    os.makedirs(os.path.dirname(out), exist_ok=True)
    cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
           "-pthread", src, "-o", out]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
    except subprocess.CalledProcessError as e:
        # Surface the compiler error: silently losing the native path would
        # also silently lose its independent-oracle role in the tests.
        import warnings

        stderr = (e.stderr or b"").decode(errors="replace").strip()
        warnings.warn(f"native build failed; using Python fallback:\n{stderr}")
        return None
    except (subprocess.SubprocessError, FileNotFoundError):
        return None
    return out


def _load():
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        path = _build()
        if path is None:
            return None
        lib = ctypes.CDLL(path)
        c_i32p = ctypes.POINTER(ctypes.c_int32)
        c_f32p = ctypes.POINTER(ctypes.c_float)
        lib.e2e_beam_search.argtypes = [
            c_f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, c_i32p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            c_i32p, c_i32p, c_f32p, ctypes.c_int,
        ]
        lib.e2e_beam_search_lm.argtypes = [
            c_f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, c_i32p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            c_f32p, c_f32p, ctypes.c_float, ctypes.c_float,
            c_i32p, c_i32p, c_f32p, ctypes.c_int,
        ]
        lib.e2e_greedy_decode.argtypes = [
            c_f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, c_i32p,
            ctypes.c_int, c_i32p, c_i32p,
        ]
        lib.e2e_parse_arpa.restype = ctypes.c_long
        lib.e2e_parse_arpa.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int,
            c_f32p, c_f32p, c_f32p, c_f32p,
        ]
        lib.e2e_arpa_scan.restype = ctypes.c_int
        lib.e2e_arpa_scan.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_long), c_f32p,
        ]
        lib.e2e_arpa_dump.restype = ctypes.c_long
        lib.e2e_arpa_dump.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            c_i32p, c_f32p, c_f32p, ctypes.c_long,
        ]
        _LIB = lib
        return _LIB


def available() -> bool:
    return _load() is not None


def _f32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _i32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def beam_search_cpu(log_probs, input_lengths, beam_width=8, prune_k=None,
                    blank=0, max_symbols=None, n_threads=0,
                    lm_table=None, lm_eos=None, lm_alpha=0.0, lm_beta=0.0):
    """Threaded native prefix beam search on the host.

    log_probs: (T, N, V) float (torch layout, like the JAX API).  Returns
    (tokens (N, W, s_cap), lengths (N, W), scores (N, W)).  Raises if the
    native library is unavailable.

    Optional dense-bigram shallow fusion — the reference's KenLM-in-C++
    behavior: lm_table (V+1, V) log p(next|prev) with row V the start
    context (NGramLM._table layout), lm_eos (V,) end scores.  Semantics
    identical to the device decoders (independent LM-fusion oracle).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable (g++ build failed?)")
    lp = np.ascontiguousarray(np.moveaxis(np.asarray(log_probs, np.float32), 1, 0))
    n, t_max, v = lp.shape
    il = np.ascontiguousarray(np.asarray(input_lengths, np.int32))
    k = min(prune_k or v, v)
    s_cap = max_symbols or min(t_max, 512)
    tokens = np.empty((n, beam_width, s_cap), np.int32)
    lens = np.empty((n, beam_width), np.int32)
    scores = np.empty((n, beam_width), np.float32)
    if lm_table is None:
        lib.e2e_beam_search(_f32p(lp), n, t_max, v, _i32p(il), beam_width, k,
                            blank, s_cap, _i32p(tokens), _i32p(lens),
                            _f32p(scores), n_threads)
    else:
        lm_t = np.ascontiguousarray(np.asarray(lm_table, np.float32))
        if lm_t.shape != (v + 1, v):
            raise ValueError(f"lm_table must be (V+1, V)=({v + 1}, {v}), "
                             f"got {lm_t.shape}")
        lm_e = np.ascontiguousarray(
            np.asarray(lm_eos, np.float32) if lm_eos is not None
            else np.zeros((v,), np.float32)
        )
        if lm_e.shape != (v,):
            raise ValueError(f"lm_eos must be (V,)=({v},), got {lm_e.shape}")
        lib.e2e_beam_search_lm(
            _f32p(lp), n, t_max, v, _i32p(il), beam_width, k, blank, s_cap,
            _f32p(lm_t), _f32p(lm_e), ctypes.c_float(lm_alpha),
            ctypes.c_float(lm_beta), _i32p(tokens), _i32p(lens),
            _f32p(scores), n_threads,
        )
    return tokens, lens, scores


def greedy_decode_cpu(log_probs, input_lengths, blank=0):
    """Native greedy decode; returns (tokens (N, T), lengths (N,))."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable (g++ build failed?)")
    lp = np.ascontiguousarray(np.moveaxis(np.asarray(log_probs, np.float32), 1, 0))
    n, t_max, v = lp.shape
    il = np.ascontiguousarray(np.asarray(input_lengths, np.int32))
    tokens = np.empty((n, t_max), np.int32)
    lens = np.empty((n,), np.int32)
    lib.e2e_greedy_decode(_f32p(lp), n, t_max, v, _i32p(il), blank,
                          _i32p(tokens), _i32p(lens))
    return tokens, lens


def parse_arpa_native(path: str, vocab: list[str]):
    """Parse an ARPA file into dense tables via the native parser.

    Returns (unigram (V,), bigram (V, V), start (V,), eos (V,)) natural-log
    float32 arrays, or None if the native library is unavailable.
    """
    lib = _load()
    if lib is None:
        return None
    v = len(vocab)
    blob = b"\0".join(w.encode() for w in vocab) + b"\0"
    unigram = np.empty((v,), np.float32)
    bigram = np.empty((v, v), np.float32)
    start = np.empty((v,), np.float32)
    eos = np.empty((v,), np.float32)
    n = lib.e2e_parse_arpa(path.encode(), blob, v, _f32p(unigram),
                           _f32p(bigram), _f32p(start), _f32p(eos))
    if n < 0:
        raise FileNotFoundError(path)
    return unigram, bigram, start, eos


def parse_arpa_order_native(path: str, vocab: list[str]):
    """Generic-order ARPA parse via the native parser; same contract as
    utils.arpa.parse_arpa_order.  Returns None if the library is missing."""
    lib = _load()
    if lib is None:
        return None
    v = len(vocab)
    blob = b"\0".join(w.encode() for w in vocab) + b"\0"
    counts = (ctypes.c_long * 9)()
    unk = np.array([np.nan], np.float32)
    order = lib.e2e_arpa_scan(path.encode(), blob, v, counts, _f32p(unk))
    if order == -2:
        return None  # order > 8: beyond the C parser; use the Python one
    if order < 0:
        raise FileNotFoundError(path)
    ngrams: dict = {"unk": None if np.isnan(unk[0]) else float(unk[0])}
    for k in range(1, order + 1):
        cap = max(int(counts[k]), 1)
        ids = np.empty((cap, k), np.int32)
        lp = np.empty((cap,), np.float32)
        bo = np.empty((cap,), np.float32)
        n = lib.e2e_arpa_dump(path.encode(), blob, v, k, _i32p(ids),
                              _f32p(lp), _f32p(bo), cap)
        ngrams[k] = [
            (tuple(int(x) for x in ids[i]), float(lp[i]), float(bo[i]))
            for i in range(n)
        ]
    return order, ngrams
