#!/usr/bin/env python
"""Microbenchmark: 256-row vs 512-row front tiles.

The fused fronts pay per-tile fixed costs (append rotate+merge+DMA,
carry extracts, halo handling) that halve with 512-row tiles, while the
in-tile scans pay one extra row stage (9 vs 8) and the butterfly one
extra stage (16 vs 15). This probes the variable part: per-32768-element
cost of the three scan families and the compaction butterfly at both
tile heights (normalized per 32768 elements, so lower = better at equal
work). Methodology per probe_colscan (chain REPS applications in one
kernel, fence with one scalar fetch, subtract a trivial floor).
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

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)

_L = 128
REPS = 8
WORK = 2048 * 256 * _L  # total elements per timed pass, fixed across heights


def iota2(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim)


def run_case(name, rows, body, seed=0, hi=63):
    tiles = WORK // (rows * _L)

    def kern(x_ref, o_ref):
        x = x_ref[...]
        for _ in range(REPS):
            x = body(x)
        o_ref[...] = x

    spec_in = pl.BlockSpec((rows, _L), lambda t: (0, 0),
                           memory_space=pltpu.VMEM)
    fn = pl.pallas_call(
        kern,
        grid=(tiles,),
        in_specs=[spec_in],
        out_specs=spec_in,
        out_shape=jax.ShapeDtypeStruct((rows, _L), jnp.int32),
    )
    x = jnp.asarray(
        np.random.default_rng(seed).integers(0, hi, (rows, _L)), jnp.int32
    )
    try:
        fenced = jax.jit(
            lambda a: fn(a).reshape(-1)[:1].astype(jnp.float32).sum()
        )
        float(fenced(x))
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
    per = (best - floor) / (WORK // 32768 * REPS) * 1e6
    print(f"{name:34s}: {per:7.3f} us/32k-app  (total {best*1e3:.2f} ms, "
          f"floor {floor*1e3:.2f} ms)", flush=True)
    return per


_IDENT4M = sum(1 << (4 * r + r) for r in range(4))
_COL4 = sum(1 << (4 * r) for r in range(4))


def comp4(left, right):
    out = left * 0
    for m in range(4):
        out = out | (((left >> m) & _COL4) * ((right >> (4 * m)) & 15))
    return out


_SWAR_LO = 0x7F7F7F7F
_SWAR_HI = -0x7F7F7F80


def _swar_add(a, b):
    return ((a & _SWAR_LO) + (b & _SWAR_LO)) ^ ((a ^ b) & _SWAR_HI)


def _chan_combine(ls, rs):
    lv, lf = ls
    rv, rf = rs
    s = _swar_add(lv, rv)
    m = (rf & 1) * 0x00FFFFFF | ((rf >> 1) & 1) * (-16777216)
    return [(rv & m) | (s & ~m), ((lf | rf) & 3) | ((lf & ~3) + (rf & ~3))]


def main():
    for rows in (256, 512):
        tag = f"r{rows}"
        nbits = max((rows * _L - 1).bit_length(), 1)
        run_case(f"plus scan {tag}", rows,
                 lambda x: ktools.lane_row_scan(x & 7, lambda a, c: a + c, 0))
        run_case(f"map4 scan {tag}", rows,
                 lambda x: ktools.lane_row_scan(
                     (x & 0x7FFF) | _IDENT4M, comp4, _IDENT4M))
        run_case(f"swar multi scan {tag}", rows,
                 lambda x: ktools.lane_row_scan_multi(
                     [x, (x >> 3) & 3], _chan_combine, [0, 0])[0]
                 ^ ktools.lane_row_scan_multi(
                     [x, (x >> 3) & 3], _chan_combine, [0, 0])[1])

        def bfly(x, rows=rows, nbits=nbits):
            n = rows * _L
            flat = iota2((rows, _L), 0) * _L + iota2((rows, _L), 1)
            v = (x & 1)
            incl = ktools.lane_row_scan(v, lambda a, c: a + c, 0)
            d = jnp.where(v != 0, flat - (incl - v), ktools.HOLE)
            d, (p,) = ktools.butterfly_compact(d, [x], nbits)
            return jnp.where(d >= 0, p, 0) ^ d

        run_case(f"count+bfly compact {tag}", rows, bfly)


if __name__ == "__main__":
    main()
