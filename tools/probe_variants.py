#!/usr/bin/env python
"""Microbenchmark: butterfly hole-encoding variants + 16-bit scan probe.

Variants probed on the real chip (vbench_scan methodology: chain REPS
applications inside one kernel over TILES grid steps, fence with one
scalar fetch, subtract a trivial-program floor):

  * butterfly_compact / butterfly_expand, 1 payload, 15 stages:
    legacy -1 hole marker (>=0 guards on take and keep) vs the HOLE
    (INT_MIN) encoding where a single sign test after a shift serves as
    both guards.
  * map4 automaton scan and plus scan at int32 vs int16 element type —
    if Mosaic lowers i16 rolls/ALU packed, the scans halve their vreg
    traffic.
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


def iota2(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim)


# --- legacy butterflies (pre-HOLE), for the A/B ---

def butterfly_compact_legacy(d, pays, nbits):
    for k in range(nbits):
        s = 1 << k
        d_s = ktools.flat_shift_left(d, s, -1)
        take = (d_s >= 0) & (((d_s >> k) & 1) == 1)
        keep = (d >= 0) & (((d >> k) & 1) == 0)
        pays = [jnp.where(take, ktools.flat_roll_left(p, s), p) for p in pays]
        d = jnp.where(take, d_s, jnp.where(keep, d, -1))
    return d, pays


def butterfly_expand_legacy(d, pays, nbits):
    for k in reversed(range(nbits)):
        s = 1 << k
        d_s = ktools.flat_shift_right(d, s, -1)
        take = (d_s >= 0) & (((d_s >> k) & 1) == 1)
        keep = (d >= 0) & (((d >> k) & 1) == 0)
        pays = [jnp.where(take, ktools.flat_roll_right(p, s), p) for p in pays]
        d = jnp.where(take, d_s, jnp.where(keep, d, -1))
    return d, pays


def run_case(name, body, dtype=jnp.int32, seed=0, hi=63):
    def kern(x_ref, o_ref):
        x = x_ref[...]
        for _ in range(REPS):
            x = body(x)
        o_ref[...] = x

    spec_in = pl.BlockSpec((_R, _L), lambda t: (0, 0), memory_space=pltpu.VMEM)
    fn = pl.pallas_call(
        kern,
        grid=(TILES,),
        in_specs=[spec_in],
        out_specs=spec_in,
        out_shape=jax.ShapeDtypeStruct((_R, _L), dtype),
    )
    x = jnp.asarray(
        np.random.default_rng(seed).integers(0, hi, (_R, _L)), dtype
    )
    try:
        fenced = jax.jit(
            lambda a: fn(a).reshape(-1)[:1].astype(jnp.float32).sum()
        )
        float(fenced(x))  # compile
    except Exception as e:
        print(f"{name:34s}: FAILED ({type(e).__name__}: {str(e)[:90]})",
              flush=True)
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
    print(f"{name:34s}: {per:7.3f} us/app  (total {best*1e3:.2f} ms, "
          f"floor {floor*1e3:.2f} ms)", flush=True)
    return per


def main():
    def mk_compact(impl, hole):
        def body(x):
            flat = iota2((_R, _L), 0) * _L + iota2((_R, _L), 1)
            v = (x & 3) == 0  # ~25% entries
            incl = ktools.lane_row_scan(v.astype(jnp.int32), lambda a, c: a + c, 0)
            d = jnp.where(v, flat - (incl - 1), hole)
            d, (p,) = impl(d, [x], 15)
            return jnp.where(d >= 0, p, 0) + d
        return body

    def mk_expand(impl, hole):
        def body(x):
            flat = iota2((_R, _L), 0) * _L + iota2((_R, _L), 1)
            # dense entries at j < m with strictly increasing targets 4j
            m = _R * _L // 4
            d = jnp.where(flat < m, 3 * flat, hole)
            d, (p,) = impl(d, [x], 15)
            return jnp.where(d >= 0, p, 0) + d
        return body

    # correctness: legacy vs HOLE must agree
    def once(body, x):
        spec_in = pl.BlockSpec((_R, _L), lambda: (0, 0),
                               memory_space=pltpu.VMEM)
        def kern(x_ref, o_ref):
            o_ref[...] = body(x_ref[...])
        return np.asarray(pl.pallas_call(
            kern, in_specs=[spec_in], out_specs=spec_in,
            out_shape=jax.ShapeDtypeStruct((_R, _L), jnp.int32))(x))

    x = jnp.asarray(np.random.default_rng(7).integers(1, 2**20, (_R, _L)),
                    jnp.int32)
    a = once(mk_compact(butterfly_compact_legacy, -1), x)
    b = once(mk_compact(ktools.butterfly_compact, ktools.HOLE), x)
    # hole slots differ (-1 vs INT_MIN); compare entry slots only
    assert np.array_equal(a[a >= 0], b[b >= 0]) and np.array_equal(
        a >= 0, b >= 0), "compact mismatch"
    a = once(mk_expand(butterfly_expand_legacy, -1), x)
    b = once(mk_expand(ktools.butterfly_expand, ktools.HOLE), x)
    assert np.array_equal(a[a >= 0], b[b >= 0]) and np.array_equal(
        a >= 0, b >= 0), "expand mismatch"
    print("correctness(compact, expand): ok", flush=True)

    run_case("compact legacy (-1)",
             mk_compact(butterfly_compact_legacy, -1), seed=1, hi=2**20)
    run_case("compact HOLE",
             mk_compact(ktools.butterfly_compact, ktools.HOLE),
             seed=1, hi=2**20)
    run_case("expand legacy (-1)",
             mk_expand(butterfly_expand_legacy, -1), seed=1, hi=2**20)
    run_case("expand HOLE",
             mk_expand(ktools.butterfly_expand, ktools.HOLE),
             seed=1, hi=2**20)

    # --- int16 scan probe ---
    _IDENT4M = sum(1 << (4 * r + r) for r in range(4))
    _COL4 = sum(1 << (4 * r) for r in range(4))

    def comp4(left, right):
        out = left * 0
        for m in range(4):
            out = out | (((left >> m) & _COL4) * ((right >> (4 * m)) & 15))
        return out

    add = lambda a, c: a + c
    run_case("map4 scan i32",
             lambda v: ktools.lane_row_scan(v, comp4, _IDENT4M),
             seed=2, hi=2**15)
    run_case("map4 scan i16",
             lambda v: ktools.lane_row_scan(v, comp4, jnp.int16(np.int16(_IDENT4M))),
             dtype=jnp.int16, seed=2, hi=2**14)
    run_case("plus scan i32",
             lambda v: ktools.lane_row_scan(v, add, 0), seed=3)
    run_case("plus scan i16",
             lambda v: ktools.lane_row_scan(v, add, jnp.int16(0)),
             dtype=jnp.int16, seed=3)


if __name__ == "__main__":
    main()
