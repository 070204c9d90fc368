"""Native (C) runtime for seqoia_tpu.

Builds `libsqoa_native.so` from sqoa_native.c on first import (cached next to
the source) and exposes numpy-friendly wrappers. This is the host fast path,
the parity oracle used by the test-suite, and the sequential fallback for
decode-side features the parallel TPU kernels route around (OP_REF streams).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "sqoa_native.c")
_LIB = os.path.join(_HERE, "libsqoa_native.so")

_lock = threading.Lock()
_lib = None


def _build() -> None:
    cc = os.environ.get("CC", "cc")
    cmd = [
        cc, "-O3", "-std=c11", "-shared", "-fPIC", "-Wall", "-Wextra",
        "-o", _LIB, _SRC,
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def _load() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if (not os.path.exists(_LIB)) or (
            os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
        ):
            _build()
        lib = ctypes.CDLL(_LIB)

        u8p = ctypes.POINTER(ctypes.c_uint8)
        u32p = ctypes.POINTER(ctypes.c_uint32)
        i64p = ctypes.POINTER(ctypes.c_int64)

        lib.sqn_encode.restype = ctypes.c_int64
        lib.sqn_encode.argtypes = [
            u8p, ctypes.c_uint32, ctypes.c_uint32, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, u8p,
        ]
        lib.sqn_decode.restype = ctypes.c_int64
        lib.sqn_decode.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_int, u8p, u32p,
        ]
        lib.sqn_peek_header.restype = ctypes.c_int
        lib.sqn_peek_header.argtypes = [u8p, ctypes.c_int64, u32p]
        lib.sqn_encode_batch.restype = ctypes.c_int64
        lib.sqn_encode_batch.argtypes = [
            u8p, ctypes.c_uint32, ctypes.c_uint32, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int64, u8p,
            ctypes.c_int64, i64p,
        ]
        lib.sqn_decode_batch.restype = ctypes.c_int64
        lib.sqn_decode_batch.argtypes = [
            u8p, i64p, i64p, ctypes.c_int64, ctypes.c_int, u8p,
            ctypes.c_int64, i64p,
        ]
        lib.sqn_scan_chunks.restype = ctypes.c_int64
        lib.sqn_scan_chunks.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_int, i64p,
        ]
        lib.sqn_compat_probe.restype = ctypes.c_int64
        lib.sqn_compat_probe.argtypes = [u8p, ctypes.c_int64, i64p]
        _lib = lib
        return lib


def _u8ptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


_scratch = threading.local()


def _scratch_buf(cap: int) -> np.ndarray:
    """Per-thread reusable output buffer (grow-only). A fresh np.empty per
    call costs a page-fault sweep on first write for multi-MB caps; reuse
    keeps the pages warm across images."""
    buf = getattr(_scratch, "buf", None)
    if buf is None or buf.size < cap:
        buf = np.empty(max(cap, 1 << 20), dtype=np.uint8)
        _scratch.buf = buf
    return buf


def encode(
    pixels: np.ndarray,
    width: int,
    height: int,
    channels: int,
    colorspace: int = 0,
    qoi_compat: int = 0,
) -> bytes | None:
    """Encode a flat uint8 pixel buffer; returns the stream or None."""
    lib = _load()
    pixels = np.ascontiguousarray(pixels, dtype=np.uint8).ravel()
    has_alpha = (channels & 1) == 0
    colch = 1 if channels < 3 else 3
    # +1 over the reference's own worst-case formula (seqoia.h:487-489): the
    # reference omits the SQOA start byte from its budget, which makes its
    # formula 1 byte short when every pixel emits norm_channels+1 bytes.
    cap = width * height * (colch + has_alpha + 1) + 23
    out = _scratch_buf(cap)
    n = lib.sqn_encode(
        _u8ptr(pixels), width, height, channels, colorspace, qoi_compat,
        _u8ptr(out),
    )
    if n < 0:
        return None
    return out[:n].tobytes()


def peek_header(data: bytes):
    """Return (width, height, channels, colorspace, qoi_compat) or None."""
    lib = _load()
    buf = np.frombuffer(data, dtype=np.uint8)
    desc = np.zeros(5, dtype=np.uint32)
    rc = lib.sqn_peek_header(
        _u8ptr(buf), len(data), desc.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32))
    )
    if rc != 0:
        return None
    return tuple(int(x) for x in desc)


def decode(data: bytes, channels: int = 0):
    """Decode a stream. Returns (pixels, desc_tuple) or (None, None).

    pixels is a flat uint8 array of width*height*out_channels bytes;
    desc_tuple is (width, height, channels, colorspace, qoi_compat).
    """
    lib = _load()
    hdr = peek_header(data)
    if hdr is None or channels > 4 or channels < 0:
        return None, None
    width, height, hdr_channels, _colorspace, _compat = hdr
    colch = 1 if hdr_channels < 3 else 3
    out_ch = channels if channels else colch + (1 - (hdr_channels & 1))
    buf = np.frombuffer(data, dtype=np.uint8)
    out = np.empty(width * height * out_ch, dtype=np.uint8)
    desc = np.zeros(5, dtype=np.uint32)
    n = lib.sqn_decode(
        _u8ptr(buf), len(data), channels, _u8ptr(out),
        desc.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
    )
    if n < 0:
        return None, None
    return out, tuple(int(x) for x in desc)


def compat_probe(data: bytes):
    """Optimistic INDEX-chain depth of a color .qoi stream — the dispatch
    predictor for the TPU fixpoint decoder (codec/decode_compat.py).

    Returns (max_depth, n_ops, n_index, n_px, strict_max_depth) or None
    for non-compat / mono / malformed streams. max_depth is the collapsed
    predictor (same-value re-inserts keep the minimum slot depth; slot-0
    reads stay strict — see sqn_compat_probe); a stream whose max_depth
    is below the fixpoint's iteration cap is expected to converge on
    device. The prediction is advisory: the fixpoint's converged flags
    stay authoritative and parallel/batch.py re-decodes unconverged rows
    on the host."""
    lib = _load()
    buf = np.frombuffer(data, dtype=np.uint8)
    stats = np.zeros(4, dtype=np.int64)
    d = lib.sqn_compat_probe(
        _u8ptr(buf), len(data),
        stats.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if d < 0:
        return None
    return (int(d), int(stats[0]), int(stats[1]), int(stats[2]),
            int(stats[3]))


def scan_chunks(data: bytes, n_chunks: int):
    """Op-aligned shard boundaries for a non-compat stream (token hop, no
    value decoding). Returns an (n_chunks, 4) int64 array of {byte_pos,
    px_start, first color-anchor pixel (abs, -1 if none), first alpha-anchor
    pixel (abs, -1 if none)} per chunk, or None for streams the hop rejects
    (compat, REF ops, malformed)."""
    lib = _load()
    buf = np.frombuffer(data, dtype=np.uint8)
    out = np.zeros((n_chunks, 4), dtype=np.int64)
    rc = lib.sqn_scan_chunks(
        _u8ptr(buf), len(data), n_chunks,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if rc != 0:
        return None
    return out
