#!/usr/bin/env python
"""End-to-end parity verification of the public API vs the upstream
reference codec (the /verify recipe).

Builds nothing itself — expects the refprobe shim at /tmp/librefprobe.so:

    cc -O3 -std=c11 -shared -fPIC -w -o /tmp/librefprobe.so \
       -DSQOA_REFERENCE_HEADER='"/root/reference/seqoia.h"' \
       tools/refprobe.c

Then:  PYTHONPATH=. python tools/verify_parity.py [--platform cpu|axon]

Drives seqoia_tpu.encode/decode/read/write across pixel kinds (noise,
long runs, LUMA chains, palettes), all channel modes 1-6, qoi_compat
on/off, and channel forcing 0/3/4, comparing byte-for-byte against the
genuine reference header compiled from its read-only mount.
"""

import argparse
import ctypes
import sys
import tempfile

import numpy as np


def _load_probe():
    lib = ctypes.CDLL("/tmp/librefprobe.so")
    u8p = ctypes.POINTER(ctypes.c_uint8)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    lib.ref_encode.restype = ctypes.c_int64
    lib.ref_encode.argtypes = [u8p, ctypes.c_uint32, ctypes.c_uint32,
                               ctypes.c_int, ctypes.c_int, ctypes.c_int,
                               u8p, ctypes.c_int64]
    lib.ref_decode.restype = ctypes.c_int64
    lib.ref_decode.argtypes = [u8p, ctypes.c_int64, ctypes.c_int, u8p,
                               ctypes.c_int64, u32p]
    return lib, u8p, u32p


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default="cpu")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", args.platform)
    import seqoia_tpu as sq

    lib, u8p, u32p = _load_probe()

    def ref_encode(pix, w, h, ch, cs=0, compat=0):
        colch = 1 if ch < 3 else 3
        cap = w * h * (colch + (1 - (ch & 1)) + 1) + 64
        out = np.empty(cap, np.uint8)
        pix = np.ascontiguousarray(pix, np.uint8).ravel()
        n = lib.ref_encode(pix.ctypes.data_as(u8p), w, h, ch, cs, compat,
                           out.ctypes.data_as(u8p), cap)
        return out[:n].tobytes() if n >= 0 else None

    def ref_decode(data, channels=0):
        buf = np.frombuffer(bytearray(data), np.uint8)
        out = np.empty(16_000_000, np.uint8)
        desc = np.zeros(5, np.uint32)
        n = lib.ref_decode(buf.ctypes.data_as(u8p), len(data), channels,
                           out.ctypes.data_as(u8p), 16_000_000,
                           desc.ctypes.data_as(u32p))
        return (out[:n].copy(), tuple(map(int, desc))) if n >= 0 else (None, None)

    rng = np.random.default_rng(42)

    def gen(kind, n, stride):
        if kind == "noise":
            return rng.integers(0, 256, n * stride, dtype=np.uint8)
        if kind == "runs":
            vals = rng.integers(0, 4, (max(1, n // 300) + 1, stride),
                                dtype=np.uint8)
            reps = rng.integers(1, 700, len(vals))
            pix = np.repeat(vals, reps, axis=0)[:n].ravel()
            if len(pix) < n * stride:
                pix = np.pad(pix, (0, n * stride - len(pix)))
            return pix.astype(np.uint8)
        if kind == "luma":
            base = rng.integers(0, 256, stride, dtype=np.int32)
            d = rng.integers(-8, 8, (n, stride))
            return ((base + np.cumsum(d, 0)) % 256).astype(np.uint8).ravel()
        if kind == "palette":
            pal = rng.integers(0, 256, (5, stride), dtype=np.uint8)
            return pal[rng.integers(0, 5, n)].ravel()
        raise ValueError(kind)

    fails = checks = 0
    for kind in ("noise", "runs", "luma", "palette"):
        for ch in (1, 2, 3, 4, 5, 6):
            for compat in (0, 1):
                if compat and ch < 3:
                    continue
                w, h = 37, 29
                stride = ch if ch < 5 else ch - 2
                pix = gen(kind, w * h, stride)[: w * h * stride]
                d = sq.SqoaDesc(w, h, ch, 0, compat)
                got = sq.encode(pix, d, backend="tpu")
                want = ref_encode(pix, w, h, ch, 0, compat)
                checks += 1
                if got != want:
                    print("ENC MISMATCH", kind, ch, compat)
                    fails += 1
                    continue
                for fch in (0, 3, 4):
                    pg, _ = sq.decode(got, fch, backend="tpu")
                    pr, _ = ref_decode(want, fch)
                    checks += 1
                    if (pg is None) != (pr is None) or (
                        pg is not None and not np.array_equal(pg, pr)
                    ):
                        print("DEC MISMATCH", kind, ch, compat, fch)
                        fails += 1
    with tempfile.TemporaryDirectory() as td:
        pix = gen("luma", 64 * 48, 3)
        n = sq.write(td + "/x.sqoa", pix, sq.SqoaDesc(64, 48, 3, 0, 0))
        assert n > 0
        back, _ = sq.read(td + "/x.sqoa")
        checks += 1
        if not np.array_equal(back, pix):
            print("FILE ROUNDTRIP FAIL")
            fails += 1
    print(f"verify: {checks} checks, {fails} failures")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
