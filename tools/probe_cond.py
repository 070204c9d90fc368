#!/usr/bin/env python
"""Probe: data-dependent stage skipping inside Pallas TPU kernels.

Q1: does jax.lax.cond with VECTOR carries lower under Mosaic at all?
Q2: if yes, does skipping butterfly stages by a traced scalar bound
    (max move distance) actually save time, or does the branch overhead
    (and Mosaic's possible both-sides execution) eat the win?

Methodology per NOTES_ROUND3 leg 2: chain REPS applications in one
kernel over TILES grid steps, fence with one scalar fetch, subtract a
trivial-program floor.
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
HOLE = ktools.HOLE


def iota2(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim)


def butterfly_compact_skip(d, pays, nbits, dmax):
    """LSB-first compact; stage k is an identity when dmax < 2^k, guarded
    by lax.cond on the traced scalar."""
    def mk_stage(k):
        s = 1 << k
        def stage(args):
            d, pays = args
            d_s = ktools.flat_shift_left(d, s, HOLE)
            take = (d_s << (31 - k)) < 0
            stay = (d << (31 - k)) >= 0
            pays = [jnp.where(take, ktools.flat_roll_left(p, s), p)
                    for p in pays]
            d = jnp.where(take, d_s, jnp.where(stay, d, HOLE))
            return d, pays
        return stage

    for k in range(nbits):
        d, pays = jax.lax.cond(
            dmax >= (1 << k), mk_stage(k), lambda a: a, (d, pays)
        )
    return d, pays


def run_case(name, body, density):
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
    # entry mask with the given density
    rng = np.random.default_rng(3)
    x = jnp.asarray(
        (rng.random((_R, _L)) < density).astype(np.int32)
        * rng.integers(1, 2**20, (_R, _L)),
        jnp.int32,
    )
    try:
        fenced = jax.jit(lambda a: fn(a).reshape(-1)[:1].astype(jnp.float32).sum())
        float(fenced(x))
    except Exception as e:
        print(f"{name:40s}: FAILED ({type(e).__name__}: {str(e)[:120]})",
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
    print(f"{name:40s}: {per:7.3f} us/app", flush=True)
    return per


def mk_compact(density, skip):
    def body(x):
        flat = iota2((_R, _L), 0) * _L + iota2((_R, _L), 1)
        v = x != 0
        incl = ktools.lane_row_scan(v.astype(jnp.int32), lambda a, c: a + c, 0)
        d = jnp.where(v, flat - (incl - 1), HOLE)
        if skip:
            n_here = ktools.extract(incl, _R - 1, _L - 1)
            # max distance over entries = holes before last entry
            # <= tile_size - n_here (conservative, O(1))
            dmax = _R * _L - n_here
            d, (p,) = butterfly_compact_skip(d, [x], 15, dmax)
        else:
            d, (p,) = ktools.butterfly_compact(d, [x], 15)
        return jnp.where(d >= 0, p, 0) + jnp.where(d >= 0, d, 0)
    return body


def main():
    # correctness first: dense tile, skip vs plain
    def once(body, x):
        spec_in = pl.BlockSpec((_R, _L), lambda: (0, 0),
                               memory_space=pltpu.VMEM)
        def kern(x_ref, o_ref):
            o_ref[...] = body(x_ref[...])
        return np.asarray(pl.pallas_call(
            kern, in_specs=[spec_in], out_specs=spec_in,
            out_shape=jax.ShapeDtypeStruct((_R, _L), jnp.int32))(x))

    rng = np.random.default_rng(11)
    for dens in (0.95, 0.5, 0.1):
        x = jnp.asarray(
            (rng.random((_R, _L)) < dens).astype(np.int32)
            * rng.integers(1, 2**20, (_R, _L)), jnp.int32)
        try:
            a = once(mk_compact(dens, False), x)
            b = once(mk_compact(dens, True), x)
        except Exception as e:
            print(f"correctness probe FAILED at density {dens}: "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)
            return
        assert np.array_equal(a, b), f"mismatch at density {dens}"
    print("correctness (skip vs plain, 3 densities): ok", flush=True)

    for dens in (0.97, 0.9, 0.5):
        run_case(f"compact plain   dens={dens}", mk_compact(dens, False), dens)
        run_case(f"compact condskip dens={dens}", mk_compact(dens, True), dens)


if __name__ == "__main__":
    main()
