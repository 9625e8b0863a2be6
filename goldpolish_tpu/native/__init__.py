"""Native host library loader (ctypes bindings to gp_native.cpp).

Compiled on first use with g++ (cached next to the source by content hash).
Falls back gracefully: callers should catch NativeUnavailable and use the
NumPy paths in ops/.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "gp_native.cpp")
_LOCK = threading.Lock()
_LIB = None


class NativeUnavailable(RuntimeError):
    pass


def _build() -> str:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    so_path = os.path.join(_DIR, f"gp_native_{digest}.so")
    if os.path.exists(so_path):
        return so_path
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-march=native",
        _SRC, "-o", so_path + ".tmp",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
    except (subprocess.CalledProcessError, FileNotFoundError, subprocess.TimeoutExpired) as e:
        err = getattr(e, "stderr", b"")
        raise NativeUnavailable(f"native build failed: {err!r}") from e
    os.replace(so_path + ".tmp", so_path)
    return so_path


def lib():
    """Load (building if needed) the native library; raises NativeUnavailable."""
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        so = _build()
        L = ctypes.CDLL(so)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        L.gp_nthash_all.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_uint32, ctypes.c_uint32,
            ctypes.POINTER(ctypes.c_uint64),
        ]
        L.gp_fill_bfs.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_uint32,
            ctypes.POINTER(ctypes.c_uint32), ctypes.c_uint32, ctypes.c_uint32,
            ctypes.POINTER(u8p), ctypes.c_uint64,
            ctypes.POINTER(u8p), ctypes.c_uint64,
        ]
        L.gp_fill_bfs.restype = ctypes.c_int
        L.gp_bf_contains.argtypes = [
            u8p, ctypes.c_uint64, ctypes.c_uint32,
            ctypes.POINTER(ctypes.c_uint64), ctypes.c_int64, u8p,
        ]
        L.gp_seqindex_build.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
        L.gp_seqindex_build.restype = ctypes.c_int
        _LIB = L
        return L


def _u8ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def nthash_all(seq_codes: np.ndarray, k: int, hash_num: int) -> np.ndarray:
    """Canonical multi-hash of every k-window (native rolling loop)."""
    L = lib()
    n = len(seq_codes)
    nw = max(0, n - k + 1)
    out = np.zeros((nw, hash_num), dtype=np.uint64)
    if nw:
        seq_codes = np.ascontiguousarray(seq_codes, dtype=np.uint8)
        L.gp_nthash_all(
            _u8ptr(seq_codes), n, k, hash_num,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        )
    return out


def fill_bfs(seq_codes: np.ndarray, hash_num: int, k_values, kmer_threshold: int,
             cbfs, bfs) -> None:
    """Native equivalent of ops.bloom.fill_bfs (same object interfaces)."""
    L = lib()
    seq_codes = np.ascontiguousarray(seq_codes, dtype=np.uint8)
    nk = len(k_values)
    ks = (ctypes.c_uint32 * nk)(*k_values)
    cbf_ptrs = (ctypes.POINTER(ctypes.c_uint8) * nk)(
        *[_u8ptr(c.counters) for c in cbfs]
    )
    bf_ptrs = (ctypes.POINTER(ctypes.c_uint8) * nk)(
        *[_u8ptr(b.array) for b in bfs]
    )
    rc = L.gp_fill_bfs(
        _u8ptr(seq_codes), len(seq_codes), hash_num, ks, nk, kmer_threshold,
        cbf_ptrs, cbfs[0].bytes, bf_ptrs, bfs[0].bytes,
    )
    if rc != 0:
        raise ValueError(f"gp_fill_bfs failed rc={rc}")


def bf_contains(bf, hashes: np.ndarray) -> np.ndarray:
    L = lib()
    hashes = np.ascontiguousarray(hashes, dtype=np.uint64)
    n = hashes.shape[0]
    out = np.zeros(n, dtype=np.uint8)
    L.gp_bf_contains(
        _u8ptr(bf.array), bf.bytes, hashes.shape[-1],
        hashes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)), n, _u8ptr(out),
    )
    return out.astype(bool)


def seqindex_build(seqs_path: str, out_tsv: str) -> None:
    L = lib()
    rc = L.gp_seqindex_build(seqs_path.encode(), out_tsv.encode())
    if rc != 0:
        raise OSError(f"gp_seqindex_build failed rc={rc} for {seqs_path}")
