#!/usr/bin/env python
"""Probe: half-tile-packed map scan for the 4-state matrix automaton.

The 4x4 boolean transition matrices are 16-bit, so the tile's two halves
(rows 0..R/2-1 and R/2..R-1 in flat order) can ride the low/high 16 bits
of one (R/2, L) word array. The packed scan runs 14 stages at half the
vreg width instead of 15 at full width — the leg-2 stage measurements
say roll data movement dominates scan cost, so this should approach 2x.
Afterwards the high half is corrected by composing the low half's total
on the left (one half-width combine) and the result unpacked by slicing
(no lane interleave — the halves are contiguous row blocks).

Methodology: chain REPS applications over TILES grid steps, fence with
one scalar fetch, subtract a trivial-program floor.
"""
import sys
import os
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from seqoia_tpu.ops import ktools

_L = 128
_R = 256
REPS = 8
TILES = 2048

_IDENT4M = sum(1 << (4 * r + r) for r in range(4))
_COL4 = 0x1111
_COL4P = 0x11111111
_ROW4P = 0x000F000F


def iota2(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim)


def compose_mat4(left, right):
    out = left * 0
    for m in range(4):
        out = out | (((left >> m) & _COL4) * ((right >> (4 * m)) & 15))
    return out


def compose_mat4_packed(left, right):
    """Compose two independent 16-bit matrices per word (low/high half)."""
    out = left * 0
    for m in range(4):
        mask = (left >> m) & _COL4P
        rlo = (right >> (4 * m)) & 15
        rhi = (right >> (16 + 4 * m)) & 15
        out = out | (mask & 0xFFFF) * rlo
        out = out | (mask & -65536) * rhi  # 0x11110000 sign-safe via mask
    return out


def map_scan_full(maps):
    return ktools.lane_row_scan(maps, compose_mat4, _IDENT4M)


def map_scan_packed(maps):
    h = _R // 2
    lo = maps[0:h]
    hi = maps[h:_R]
    packed = lo | (hi << 16)
    ident2 = int(np.int32(np.uint32(_IDENT4M | (_IDENT4M << 16))))
    s = ktools.lane_row_scan(packed, compose_mat4_packed, ident2)
    lo_s = s & 0xFFFF
    hi_s = (s >> 16) & 0xFFFF
    # left-compose the low half's total onto the high half
    lo_tot = ktools.extract(lo_s, h - 1, _L - 1)
    hi_fix = compose_mat4(jnp.full((h, _L), lo_tot, jnp.int32), hi_s)
    return jnp.concatenate([lo_s, hi_fix], axis=0)


def run_case(name, body):
    def kern(x_ref, o_ref):
        x = x_ref[...]
        for _ in range(REPS):
            x = body(x) & 0xFFFF | _IDENT4M  # keep values matrix-like
        o_ref[...] = x

    spec_in = pl.BlockSpec((_R, _L), lambda t: (0, 0), memory_space=pltpu.VMEM)
    fn = pl.pallas_call(
        kern, grid=(TILES,), in_specs=[spec_in], out_specs=spec_in,
        out_shape=jax.ShapeDtypeStruct((_R, _L), jnp.int32),
    )
    rng = np.random.default_rng(5)
    # random length-automaton maps: _BASE4M | 1 << (len-1), len in {1,2,4}
    base = sum(1 << (4 * r + (r - 1)) for r in range(1, 4))
    lens = rng.choice([1, 2, 4], (_R, _L))
    x = jnp.asarray(base | (1 << (lens - 1)), jnp.int32)
    try:
        fenced = jax.jit(lambda a: fn(a).reshape(-1)[:1].astype(jnp.float32).sum())
        float(fenced(x))
    except Exception as e:
        print(f"{name:28s}: FAILED ({type(e).__name__}: {str(e)[:120]})", flush=True)
        return None
    triv = jax.jit(lambda a: a.reshape(-1)[:1].astype(jnp.float32).sum())
    float(triv(x))
    best = floor = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        float(fenced(x))
        best = min(best, time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(triv(x))
        floor = min(floor, time.perf_counter() - t0)
    per = (best - floor) / (TILES * REPS) * 1e6
    print(f"{name:28s}: {per:7.3f} us/app", flush=True)
    return per


def main():
    # correctness
    def once(body, x):
        spec_in = pl.BlockSpec((_R, _L), lambda: (0, 0), memory_space=pltpu.VMEM)
        def kern(x_ref, o_ref):
            o_ref[...] = body(x_ref[...])
        return np.asarray(pl.pallas_call(
            kern, in_specs=[spec_in], out_specs=spec_in,
            out_shape=jax.ShapeDtypeStruct((_R, _L), jnp.int32))(x))

    rng = np.random.default_rng(9)
    base = sum(1 << (4 * r + (r - 1)) for r in range(1, 4))
    lens = rng.choice([1, 2, 4], (_R, _L))
    x = jnp.asarray(base | (1 << (lens - 1)), jnp.int32)
    a = once(map_scan_full, x)
    b = once(map_scan_packed, x)
    assert np.array_equal(a, b), (
        f"mismatch: {np.argwhere(a != b)[:4]}")
    print("correctness: ok", flush=True)

    run_case("map4 scan full-width", map_scan_full)
    run_case("map4 scan half-packed", map_scan_packed)


if __name__ == "__main__":
    main()
