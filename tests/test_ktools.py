"""Brute-force unit tests of the in-kernel primitives (ktools) via the
Pallas interpreter.

The codec kernels exercise these end-to-end on every parity test, but a
direct check pins each primitive's contract — in particular the HOLE
(INT_MIN) butterfly hole encoding, payload bits riding d's high bits,
and fill_scan_multi's max_gap stage bounding."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from seqoia_tpu.ops import ktools

_L = 128


def _run(body, arrays, rows):
    """Run body(list of (rows, L) int32 arrays) -> list of arrays through
    a single-invocation interpreted Pallas kernel."""
    n_in = len(arrays)

    def kern(*refs):
        ins, outs = refs[:n_in], refs[n_in:]
        res = body([r[...] for r in ins])
        for o, x in zip(outs, res):
            o[...] = x

    spec = pl.BlockSpec((rows, _L), lambda: (0, 0), memory_space=pltpu.VMEM)
    probe = jax.eval_shape(
        body, [jax.ShapeDtypeStruct((rows, _L), jnp.int32)] * n_in
    )
    out = pl.pallas_call(
        kern,
        in_specs=[spec] * n_in,
        out_specs=[spec] * len(probe),
        out_shape=[jax.ShapeDtypeStruct((rows, _L), jnp.int32)] * len(probe),
        interpret=True,
    )(*[jnp.asarray(a, jnp.int32) for a in arrays])
    return [np.asarray(o) for o in out]


def test_flat_rolls_and_shifts():
    rows = 4
    n = rows * _L
    rng = np.random.default_rng(0)
    x = rng.integers(-1000, 1000, (rows, _L), dtype=np.int32)
    flat = x.ravel()
    for s in (1, 5, 127, 128, 256):
        rl, rr, sl, sr = _run(
            lambda a, s=s: [
                ktools.flat_roll_left(a[0], s),
                ktools.flat_roll_right(a[0], s),
                ktools.flat_shift_left(a[0], s, -7),
                ktools.flat_shift_right(a[0], s, -7),
            ],
            [x],
            rows,
        )
        assert np.array_equal(rl.ravel(), np.roll(flat, -s)), s
        assert np.array_equal(rr.ravel(), np.roll(flat, s)), s
        exp_sl = np.concatenate([flat[s:], np.full(s, -7, np.int32)])
        exp_sr = np.concatenate([np.full(s, -7, np.int32), flat[:-s]])
        assert np.array_equal(sl.ravel(), exp_sl), s
        assert np.array_equal(sr.ravel(), exp_sr), s


def test_flat_roll_dyn():
    rows = 3
    rng = np.random.default_rng(1)
    x = rng.integers(0, 100, (rows, _L), dtype=np.int32)
    for s in (0, 1, 63, 127):
        sarr = np.full((rows, _L), s, np.int32)
        rl, rr = _run(
            lambda a: [
                ktools.flat_roll_left_dyn(a[0], ktools.extract(a[1], 0, 0)),
                ktools.flat_roll_right_dyn(a[0], ktools.extract(a[1], 0, 0)),
            ],
            [x, sarr],
            rows,
        )
        assert np.array_equal(rl.ravel(), np.roll(x.ravel(), -s)), s
        assert np.array_equal(rr.ravel(), np.roll(x.ravel(), s)), s


def test_lane_row_scan_sum_max():
    rows = 8
    rng = np.random.default_rng(2)
    x = rng.integers(0, 50, (rows, _L), dtype=np.int32)
    (got_sum,) = _run(
        lambda a: [ktools.lane_row_scan(a[0], lambda l, r: l + r, 0)],
        [x],
        rows,
    )
    assert np.array_equal(got_sum.ravel(), np.cumsum(x.ravel(), dtype=np.int64).astype(np.int32))
    (got_max,) = _run(
        lambda a: [ktools.lane_row_scan(a[0], jnp.maximum, -(2**31))],
        [x],
        rows,
    )
    assert np.array_equal(got_max.ravel(), np.maximum.accumulate(x.ravel()))


def test_lane_row_scan_multi_joint():
    rows = 4
    rng = np.random.default_rng(3)
    a = rng.integers(0, 50, (rows, _L), dtype=np.int32)
    b = rng.integers(0, 2, (rows, _L), dtype=np.int32)

    def comb(ls, rs):
        return [ls[0] + rs[0], ls[1] | rs[1]]

    ga, gb = _run(
        lambda arrs: ktools.lane_row_scan_multi(arrs, comb, [0, 0]),
        [a, b],
        rows,
    )
    assert np.array_equal(ga.ravel(), np.cumsum(a.ravel(), dtype=np.int64).astype(np.int32))
    assert np.array_equal(gb.ravel(), np.bitwise_or.accumulate(b.ravel()))


def _fill_ref(vals, flags):
    out = np.zeros_like(vals)
    fout = np.zeros_like(flags)
    cur, have = 0, 0
    for i in range(vals.size):
        if flags.ravel()[i]:
            cur, have = vals.ravel()[i], 1
        out.ravel()[i] = cur if have else 0
        fout.ravel()[i] = have
    return out, fout


@pytest.mark.parametrize("max_gap", [None, 7, 300])
def test_fill_scan_multi(max_gap):
    rows = 8
    rng = np.random.default_rng(4)
    vals = rng.integers(1, 1000, (rows, _L), dtype=np.int32)
    if max_gap is None:
        flags = (rng.random((rows, _L)) < 0.05).astype(np.int32)
    else:
        # flags spaced so no live gap exceeds max_gap
        flags = np.zeros((rows, _L), np.int32)
        flat = flags.ravel()
        i = rng.integers(0, max_gap)
        while i < flat.size:
            flat[i] = 1
            i += rng.integers(1, max_gap + 1)
    got, gf = _run(
        lambda a: (lambda r: r[0] + [r[1]])(
            list(ktools.fill_scan_multi([a[0]], a[1], max_gap=max_gap))
        ),
        [vals, flags],
        rows,
    )
    exp, expf = _fill_ref(vals, flags)
    # positions before the first flag are unspecified-but-zero-flagged
    live = expf != 0
    if max_gap is None:
        assert np.array_equal(gf != 0, live)
        assert np.array_equal(got[live], exp[live])
    else:
        # within the gap bound the fill is exact
        assert np.array_equal(got[gf != 0], exp[gf != 0])
        assert np.all((gf != 0) >= (flags != 0))


def test_butterfly_compact_with_payload_bits():
    rows = 8
    n = rows * _L
    rng = np.random.default_rng(5)
    for dens in (0.9, 0.4, 0.05):
        v = (rng.random((rows, _L)) < dens).astype(np.int32)
        pay = rng.integers(1, 2**31 - 1, (rows, _L), dtype=np.int32)
        hi = rng.integers(0, 512, (rows, _L), dtype=np.int32)  # rides d>>16

        def body(arrs):
            v, pay, hi = arrs
            incl = ktools.lane_row_scan(v, lambda l, r: l + r, 0)
            flat = ktools.iota2((rows, _L), 0) * _L + ktools.iota2(
                (rows, _L), 1
            )
            d = jnp.where(
                v != 0, (flat - (incl - v)) | (hi << 16), ktools.HOLE
            )
            d, (p,) = ktools.butterfly_compact(d, [pay], 10)
            return [d, p]

        d, p = _run(body, [v, pay, hi], rows)
        nent = int(v.sum())
        mask = v.ravel() != 0
        # entries land dense at the front, in order, payload+hi intact
        assert np.all(d.ravel()[:nent] >= 0)
        assert np.all(d.ravel()[nent:] < 0)
        assert np.array_equal(p.ravel()[:nent], pay.ravel()[mask])
        assert np.array_equal(
            (d.ravel()[:nent] >> 16), hi.ravel()[mask]
        )


def test_butterfly_expand():
    rows = 8
    n = rows * _L
    rng = np.random.default_rng(6)
    for m in (n, n // 3, 17):
        # strictly increasing targets tau_j >= j
        tau = np.sort(rng.choice(n, size=m, replace=False))
        tau = np.maximum(tau, np.arange(m))  # keep tau_j >= j
        tau = np.maximum.accumulate(tau)  # re-sort after clamp
        # ensure strict increase
        for j in range(1, m):
            tau[j] = max(tau[j], tau[j - 1] + 1)
        if tau[-1] >= n:
            tau = np.arange(m)  # degenerate fallback: identity placement
        dmat = np.full((rows, _L), 0, np.int32)
        dmat.ravel()[:m] = tau - np.arange(m)
        sel = np.zeros((rows, _L), np.int32)
        sel.ravel()[:m] = 1
        pay = rng.integers(1, 10**6, (rows, _L), dtype=np.int32)

        def body(arrs):
            dm, sl, pay = arrs
            d = jnp.where(sl != 0, dm, ktools.HOLE)
            d, (p,) = ktools.butterfly_expand(d, [pay], 10)
            return [d, p]

        d, p = _run(body, [dmat, sel, pay], rows)
        occ = d.ravel() >= 0
        exp_occ = np.zeros(n, bool)
        exp_occ[tau] = True
        assert np.array_equal(occ, exp_occ), m
        assert np.array_equal(p.ravel()[tau], pay.ravel()[:m]), m


def test_extract():
    rows = 4
    rng = np.random.default_rng(7)
    x = rng.integers(-100, 100, (rows, _L), dtype=np.int32)
    (got,) = _run(
        lambda a: [
            jnp.full((rows, _L), ktools.extract(a[0], 2, 77), jnp.int32)
        ],
        [x],
        rows,
    )
    assert np.all(got == x[2, 77])
    pos = 3 * _L + 5
    (got,) = _run(
        lambda a: [
            jnp.full((rows, _L), ktools.extract_flat(a[0], pos), jnp.int32)
        ],
        [x],
        rows,
    )
    assert np.all(got == x.ravel()[pos])
