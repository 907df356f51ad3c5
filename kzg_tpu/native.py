"""ctypes bindings for the native codec library (csrc/kzg_native.cpp).

Builds lazily with `make` on first import if the shared object is missing;
every entry point has a pure-python fallback in protocol.serial, so the
library degrades gracefully when no toolchain is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.join(os.path.dirname(__file__), "..", "csrc")
_SO = os.path.join(_DIR, "libkzg_native.so")


def _build():
    subprocess.run(["make", "-C", _DIR, "-s"], check=True,
                   capture_output=True)


class _Lib:
    def __init__(self, so):
        self._c = ctypes.CDLL(so)
        c = self._c
        u8p = ctypes.POINTER(ctypes.c_uint8)
        u32p = ctypes.POINTER(ctypes.c_uint32)
        c.kzg_hex_decode.restype = ctypes.c_int
        c.kzg_hex_decode.argtypes = [ctypes.c_char_p, ctypes.c_int64, u8p]
        c.kzg_hex_encode.restype = None
        c.kzg_hex_encode.argtypes = [u8p, ctypes.c_int64, ctypes.c_char_p]
        c.kzg_pack_chunks_limbs.restype = None
        c.kzg_pack_chunks_limbs.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32, u32p]
        c.kzg_be_to_limbs.restype = None
        c.kzg_be_to_limbs.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32, u32p]
        c.kzg_limbs_to_be.restype = None
        c.kzg_limbs_to_be.argtypes = [
            u32p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32, u8p]
        c.kzg_poly_encode.restype = ctypes.c_int64
        c.kzg_poly_encode.argtypes = [u8p, ctypes.c_int64, ctypes.c_int32, u8p]
        c.kzg_poly_decode.restype = ctypes.c_int64
        c.kzg_poly_decode.argtypes = [u8p, ctypes.c_int64, ctypes.c_int32, u8p]

    @staticmethod
    def _u8(arr):
        return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))

    @staticmethod
    def _u32(arr):
        return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32))

    def hex_decode(self, s: str) -> bytes:
        n = len(s) // 2
        out = np.empty(n, dtype=np.uint8)
        rc = self._c.kzg_hex_decode(s.encode(), len(s) - len(s) % 2,
                                    self._u8(out))
        if rc != 0:
            raise ValueError("invalid hex")
        return out.tobytes()

    def hex_encode(self, b: bytes) -> str:
        arr = np.frombuffer(bytes(b), dtype=np.uint8)
        out = ctypes.create_string_buffer(2 * len(arr))
        self._c.kzg_hex_encode(self._u8(arr), len(arr), out)
        return out.raw.decode()

    def pack_chunks(self, data: bytes, chunk_length: int,
                    chunk_size: int) -> list:
        """Returns python ints (fallback-compatible signature)."""
        arr = np.frombuffer(bytes(data), dtype=np.uint8)
        need = chunk_length * chunk_size
        if len(arr) < need:
            raise ValueError("buffer shorter than requested range")
        n_limbs = (chunk_size + 1) // 2
        out = np.zeros((n_limbs, chunk_length), dtype=np.uint32)
        self._c.kzg_pack_chunks_limbs(self._u8(arr), chunk_length,
                                      chunk_size, n_limbs, self._u32(out))
        vals = out.astype(object)
        res = [0] * chunk_length
        for l in range(n_limbs):
            sh = 16 * l
            row = vals[l]
            for i in range(chunk_length):
                res[i] |= int(row[i]) << sh
        return res

    def pack_chunks_limbs(self, data: bytes, chunk_length: int,
                          chunk_size: int, n_limbs: int) -> np.ndarray:
        """Limb-major (n_limbs, chunk_length) uint32 matrix — zero-copy path
        for device upload."""
        arr = np.frombuffer(bytes(data), dtype=np.uint8)
        out = np.zeros((n_limbs, chunk_length), dtype=np.uint32)
        self._c.kzg_pack_chunks_limbs(self._u8(arr), chunk_length,
                                      chunk_size, n_limbs, self._u32(out))
        return out

    def be_to_limbs(self, recs: bytes, n: int, width: int,
                    n_limbs: int) -> np.ndarray:
        arr = np.frombuffer(bytes(recs), dtype=np.uint8)
        out = np.zeros((n_limbs, n), dtype=np.uint32)
        self._c.kzg_be_to_limbs(self._u8(arr), n, width, n_limbs,
                                self._u32(out))
        return out

    def limbs_to_be(self, limbs: np.ndarray, width: int) -> bytes:
        limbs = np.ascontiguousarray(limbs, dtype=np.uint32)
        n_limbs, n = limbs.shape
        out = np.zeros(n * width, dtype=np.uint8)
        self._c.kzg_limbs_to_be(self._u32(limbs), n, n_limbs, width,
                                self._u8(out))
        return out.tobytes()

    def poly_encode(self, rows_le: np.ndarray) -> bytes:
        rows_le = np.ascontiguousarray(rows_le, dtype=np.uint8)
        n, width = rows_le.shape
        sz = self._c.kzg_poly_encode(self._u8(rows_le), n, width, None)
        out = np.zeros(int(sz), dtype=np.uint8)
        self._c.kzg_poly_encode(self._u8(rows_le), n, width, self._u8(out))
        return out.tobytes()

    def poly_decode(self, data: bytes, width: int) -> np.ndarray:
        arr = np.frombuffer(bytes(data), dtype=np.uint8)
        n = self._c.kzg_poly_decode(self._u8(arr), len(arr), width, None)
        if n < 0:
            raise ValueError("malformed polynomial stream")
        out = np.zeros((int(n), width), dtype=np.uint8)
        self._c.kzg_poly_decode(self._u8(arr), len(arr), width,
                                self._u8(out))
        return out


lib = None
try:
    if not os.path.exists(_SO):
        _build()
    lib = _Lib(_SO)
except Exception:                                          # pragma: no cover
    lib = None
