#!/usr/bin/env python
"""Microbenchmark: full-width vs narrow-column row phase for in-tile scans.

Every ktools scan runs two phases: a lane log-scan (7 stages, full width)
and a row log-scan of per-row aggregates (8 stages). The row phase's data
is constant along lanes, so the full-width variant moves 8x more vregs
than needed. This probes a (rows, 1) column row phase (slice + sublane
rolls + one broadcast at the end) against the current full-width one,
plus the fill_scan_multi and map-scan variants.

Timing method per NOTES_ROUND3 leg 2: enqueue all reps asynchronously,
fetch ONE scalar (block_until_ready does not fence under axon), subtract
a trivial-program dispatch floor. Reps chain x -> scan(x) to defeat CSE.
"""
import functools
import os
import sys
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
REPS = 16
TILES = 2048


def iota2(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim)


def lane_row_scan_narrow(vals, combine, identity):
    rows = vals.shape[0]
    lane = iota2(vals.shape, 1)
    x = vals
    k = 1
    while k < _L:
        sh = jnp.where(lane >= k, pltpu.roll(x, k, 1), identity)
        x = combine(sh, x)
        k *= 2
    agg = x[:, _L - 1 : _L]  # (rows, 1)
    rowc = iota2((rows, 1), 0)
    ex = jnp.where(rowc >= 1, pltpu.roll(agg, 1, 0), identity)
    k = 1
    while k < rows:
        sh = jnp.where(rowc >= k, pltpu.roll(ex, k, 0), identity)
        ex = combine(sh, ex)
        k *= 2
    return combine(jnp.broadcast_to(ex, vals.shape), x)


def fill_scan_multi_narrow(vals_list, flags):
    rows = flags.shape[0]
    lane = iota2(flags.shape, 1)
    vs, f = list(vals_list), flags
    k = 1
    while k < _L:
        fs = jnp.where(lane >= k, pltpu.roll(f, k, 1), 0)
        vs = [
            jnp.where(f != 0, v, jnp.where(lane >= k, pltpu.roll(v, k, 1), 0))
            for v in vs
        ]
        f = f | fs
        k *= 2
    fa = f[:, _L - 1 : _L]
    vas = [v[:, _L - 1 : _L] for v in vs]
    rowc = iota2((rows, 1), 0)
    fp = jnp.where(rowc >= 1, pltpu.roll(fa, 1, 0), 0)
    vps = [jnp.where(rowc >= 1, pltpu.roll(va, 1, 0), 0) for va in vas]
    k = 1
    while k < rows:
        fs = jnp.where(rowc >= k, pltpu.roll(fp, k, 0), 0)
        vps = [
            jnp.where(fp != 0, vp, jnp.where(rowc >= k, pltpu.roll(vp, k, 0), 0))
            for vp in vps
        ]
        fp = fp | fs
        k *= 2
    vpb = [jnp.broadcast_to(vp, flags.shape) for vp in vps]
    fpb = jnp.broadcast_to(fp, flags.shape)
    out = [jnp.where(f != 0, v, vp) for v, vp in zip(vs, vpb)]
    return out, f | fpb


# --- kernels: chain REPS applications over one VMEM tile ---

def _mk_kernel(body):
    def kern(x_ref, o_ref):
        x = x_ref[...]
        for _ in range(REPS):
            x = body(x)
        o_ref[...] = x
    return kern


def run_case(name, body):
    kern = _mk_kernel(body)
    spec_in = pl.BlockSpec((_R, _L), lambda t: (0, 0), memory_space=pltpu.VMEM)
    fn = pl.pallas_call(
        kern,
        grid=(TILES,),
        in_specs=[spec_in],
        out_specs=spec_in,
        out_shape=jax.ShapeDtypeStruct((_R, _L), jnp.int32),
    )
    x = jnp.asarray(
        np.random.default_rng(0).integers(0, 63, (_R, _L)), jnp.int32
    )
    fenced = jax.jit(
        lambda a: fn(a).reshape(-1)[:1].astype(jnp.float32).sum()
    )
    float(fenced(x))  # compile
    triv = jax.jit(lambda a: a.reshape(-1)[:1].astype(jnp.float32).sum())
    float(triv(x))
    best = 1e9
    floor = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        out = fenced(x)
        float(out)
        best = min(best, time.perf_counter() - t0)
        t0 = time.perf_counter()
        out = triv(x)
        float(out)
        floor = min(floor, time.perf_counter() - t0)
    per = (best - floor) / (TILES * REPS) * 1e6
    print(f"{name:34s}: {per:7.3f} us/scan  (total {best*1e3:.2f} ms, "
          f"floor {floor*1e3:.2f} ms)", flush=True)
    return per


def main():
    add = lambda a, c: a + c

    _IDENT5M = sum(1 << (5 * r + r) for r in range(5))
    _COL5 = sum(1 << (5 * r) for r in range(5))

    def comp5(left, right):
        out = left * 0
        for m in range(5):
            out = out | (((left >> m) & _COL5) * ((right >> (5 * m)) & 31))
        return out

    def swar_combine(ls, rs):
        lv, lf = ls
        rv, rf = rs
        s = ((lv & 0x7F7F7F7F) + (rv & 0x7F7F7F7F)) ^ ((lv ^ rv) & -0x7F7F7F80)
        m = (rf & 1) * 0x00FFFFFF | ((rf >> 1) & 1) * (-16777216)
        return [(rv & m) | (s & ~m), lf | rf]

    # correctness checks run each body once inside a pallas_call (roll is
    # kernel-only)
    def once(body, x):
        spec_in = pl.BlockSpec((_R, _L), lambda: (0, 0),
                               memory_space=pltpu.VMEM)
        def kern(x_ref, o_ref):
            o_ref[...] = body(x_ref[...])
        return np.asarray(pl.pallas_call(
            kern, in_specs=[spec_in], out_specs=spec_in,
            out_shape=jax.ShapeDtypeStruct((_R, _L), jnp.int32))(x))

    x = jnp.asarray(np.random.default_rng(1).integers(0, 9, (_R, _L)), jnp.int32)
    m = jnp.asarray(
        np.random.default_rng(2).integers(0, 2**25, (_R, _L)), jnp.int32)
    assert np.array_equal(
        once(lambda v: ktools.lane_row_scan(v, add, 0), x),
        once(lambda v: lane_row_scan_narrow(v, add, 0), x)), "+ mismatch"
    assert np.array_equal(
        once(lambda v: ktools.lane_row_scan(v, comp5, _IDENT5M), m),
        once(lambda v: lane_row_scan_narrow(v, comp5, _IDENT5M), m)), "map"

    def fill_pair(fill_fn):
        def body(v):
            outs, f = fill_fn([v, v ^ 123], ((v & 7) == 0).astype(jnp.int32))
            return outs[0] + outs[1] * 7 + f
        return body
    assert np.array_equal(
        once(fill_pair(ktools.fill_scan_multi), x),
        once(fill_pair(fill_scan_multi_narrow), x)), "fill mismatch"
    print("correctness(+,map,fill): ok", flush=True)

    run_case("plus full", lambda x: ktools.lane_row_scan(x, add, 0))
    run_case("plus narrow", lambda x: lane_row_scan_narrow(x, add, 0))
    run_case("map5 full", lambda x: ktools.lane_row_scan(x, comp5, _IDENT5M))
    run_case("map5 narrow", lambda x: lane_row_scan_narrow(x, comp5, _IDENT5M))

    def fill_full(x):
        outs, f = ktools.fill_scan_multi([x, x ^ 123], ((x & 7) == 0).astype(jnp.int32))
        return outs[0] + outs[1] + f

    def fill_narrow(x):
        outs, f = fill_scan_multi_narrow([x, x ^ 123], ((x & 7) == 0).astype(jnp.int32))
        return outs[0] + outs[1] + f

    run_case("fill2 full", fill_full)
    run_case("fill2 narrow", fill_narrow)

    def swar_full(x):
        o = ktools.lane_row_scan_multi([x, x & 3], swar_combine, [0, 0])
        return o[0] + o[1]

    def swar_narrow(x):
        # multi variant with narrow row phase, inline for the probe
        vals = [x, x & 3]
        rows = x.shape[0]
        lane = iota2(x.shape, 1)
        xs = list(vals)
        k = 1
        while k < _L:
            sh = [jnp.where(lane >= k, pltpu.roll(v, k, 1), ident)
                  for v, ident in zip(xs, [0, 0])]
            xs = swar_combine(sh, xs)
            k *= 2
        aggs = [v[:, _L - 1 : _L] for v in xs]
        rowc = iota2((rows, 1), 0)
        ex = [jnp.where(rowc >= 1, pltpu.roll(a_, 1, 0), ident)
              for a_, ident in zip(aggs, [0, 0])]
        k = 1
        while k < rows:
            sh = [jnp.where(rowc >= k, pltpu.roll(v, k, 0), ident)
                  for v, ident in zip(ex, [0, 0])]
            ex = swar_combine(sh, ex)
            k *= 2
        exb = [jnp.broadcast_to(e, x.shape) for e in ex]
        o = swar_combine(exb, xs)
        return o[0] + o[1]

    assert np.array_equal(once(swar_full, x), once(swar_narrow, x)), "swar"
    run_case("swar2 full", swar_full)
    run_case("swar2 narrow", swar_narrow)


if __name__ == "__main__":
    main()
