#!/usr/bin/env python
"""Microbenchmark: scan row phase at full width vs on a (rows, 1) column.

lane_row_scan's row phase runs log2(rows) Hillis-Steele stages over the
full (rows, 128) tile even though the data is constant along lanes (it is
a broadcast of the per-row aggregate column). The round-3 leg-2 attempt
collapsed the column into one (8,128) vreg with MXU selection matmuls and
LOST (layout moves dominate). This probes the simple version that was
never tried: slice the aggregate column as (rows, 1), run the row stages
there (32 vregs instead of 256 per stage), broadcast back once, combine.

Variants, each probed with the plus combine, the map4 automaton combine,
and the 2-payload SWAR channel combine (the three scans in the decode
front):

  full   — current ktools.lane_row_scan
  col    — row phase on the (rows, 1) slice, lane-broadcast at the end
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


def lane_row_scan_col(vals, combine, identity):
    """lane_row_scan with the row phase on the (rows, 1) aggregate column."""
    rows = vals.shape[0]
    lane = iota2(vals.shape, 1)
    x = vals
    k = 1
    while k < _L:
        sh = jnp.where(lane >= k, pltpu.roll(x, k, 1), identity)
        x = combine(sh, x)
        k *= 2
    col = x[:, _L - 1 : _L]                       # (rows, 1) aggregates
    rowc = iota2(col.shape, 0)
    ex = jnp.where(rowc >= 1, pltpu.roll(col, 1, 0), identity)
    k = 1
    while k < rows:
        sh = jnp.where(rowc >= k, pltpu.roll(ex, k, 0), identity)
        ex = combine(sh, ex)
        k *= 2
    return combine(jnp.broadcast_to(ex, vals.shape), x)


def lane_row_scan_multi_col(vals, combine, identities):
    rows = vals[0].shape[0]
    lane = iota2(vals[0].shape, 1)
    xs = list(vals)
    k = 1
    while k < _L:
        sh = [
            jnp.where(lane >= k, pltpu.roll(x, k, 1), ident)
            for x, ident in zip(xs, identities)
        ]
        xs = combine(sh, xs)
        k *= 2
    cols = [x[:, _L - 1 : _L] for x in xs]
    rowc = iota2(cols[0].shape, 0)
    ex = [
        jnp.where(rowc >= 1, pltpu.roll(c, 1, 0), ident)
        for c, ident in zip(cols, identities)
    ]
    k = 1
    while k < rows:
        sh = [
            jnp.where(rowc >= k, pltpu.roll(x, k, 0), ident)
            for x, ident in zip(ex, identities)
        ]
        ex = combine(sh, ex)
        k *= 2
    return combine([jnp.broadcast_to(e, vals[0].shape) for e in ex], xs)


def run_case(name, body, seed=0, hi=63):
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
        out_shape=jax.ShapeDtypeStruct((_R, _L), jnp.int32),
    )
    x = jnp.asarray(
        np.random.default_rng(seed).integers(0, hi, (_R, _L)), jnp.int32
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


_IDENT4M = sum(1 << (4 * r + r) for r in range(4))
_COL4 = sum(1 << (4 * r) for r in range(4))


def comp4(left, right):
    out = left * 0
    for m in range(4):
        out = out | (((left >> m) & _COL4) * ((right >> (4 * m)) & 15))
    return out


_SWAR_LO = 0x7F7F7F7F
_SWAR_HI = -0x7F7F7F80
_M_RGB = 0x00FFFFFF
_M_A = -16777216


def _swar_add(a, b):
    return ((a & _SWAR_LO) + (b & _SWAR_LO)) ^ ((a ^ b) & _SWAR_HI)


def chan_combine(ls, rs):
    lv, lf = ls
    rv, rf = rs
    s = _swar_add(lv, rv)
    m = (rf & 1) * _M_RGB | ((rf >> 1) & 1) * _M_A
    return [(rv & m) | (s & ~m), ((lf | rf) & 3) | ((lf & ~3) + (rf & ~3))]


def main():
    # correctness first (single application, vs numpy / full variant)
    def once(body, x):
        spec_in = pl.BlockSpec((_R, _L), lambda: (0, 0),
                               memory_space=pltpu.VMEM)
        def kern(x_ref, o_ref):
            o_ref[...] = body(x_ref[...])
        return np.asarray(pl.pallas_call(
            kern, in_specs=[spec_in], out_specs=spec_in,
            out_shape=jax.ShapeDtypeStruct((_R, _L), jnp.int32))(x))

    add = lambda a, c: a + c
    x = jnp.asarray(np.random.default_rng(7).integers(0, 63, (_R, _L)),
                    jnp.int32)
    a = once(lambda v: ktools.lane_row_scan(v, add, 0), x)
    b = once(lambda v: lane_row_scan_col(v, add, 0), x)
    assert np.array_equal(a, b), "col plus scan mismatch"
    exp = np.cumsum(np.asarray(x).ravel()).reshape(_R, _L)
    assert np.array_equal(b, exp), "col plus scan wrong"
    a = once(lambda v: ktools.lane_row_scan(v, comp4, _IDENT4M), x)
    b = once(lambda v: lane_row_scan_col(v, comp4, _IDENT4M), x)
    assert np.array_equal(a, b), "col map4 scan mismatch"

    def chan_body_full(v):
        flg = (v & 3) | ((v >> 2) & 4)
        r = ktools.lane_row_scan_multi([v, flg], chan_combine, [0, 0])
        return r[0] + r[1]

    def chan_body_col(v):
        flg = (v & 3) | ((v >> 2) & 4)
        r = lane_row_scan_multi_col([v, flg], chan_combine, [0, 0])
        return r[0] + r[1]

    a = once(chan_body_full, x)
    b = once(chan_body_col, x)
    assert np.array_equal(a, b), "col chan scan mismatch"
    print("correctness: ok", flush=True)

    run_case("plus scan full", lambda v: ktools.lane_row_scan(v, add, 0),
             seed=3)
    run_case("plus scan col", lambda v: lane_row_scan_col(v, add, 0),
             seed=3)
    run_case("map4 scan full",
             lambda v: ktools.lane_row_scan(v, comp4, _IDENT4M),
             seed=2, hi=2**15)
    run_case("map4 scan col",
             lambda v: lane_row_scan_col(v, comp4, _IDENT4M),
             seed=2, hi=2**15)
    run_case("chan multi full", chan_body_full, seed=4, hi=2**20)
    run_case("chan multi col", chan_body_col, seed=4, hi=2**20)


if __name__ == "__main__":
    main()
