"""Pallas tile-scan engine: single-HBM-pass associative scans.

The XLA log-shift scans in scan_ops.py touch HBM ~2*log2(M) times. This
kernel streams each batch row tile-by-tile through VMEM instead: the grid
walks tiles sequentially on the (single) TensorCore, an SMEM carry threads
the running state between tiles, and the in-tile scan runs entirely on-chip
(masked lane rolls + sublane combine). Net HBM traffic: one read + one
write of the array.

Works for any associative combine over tuples of int32 arrays (max,
segmented modular sums, 5-state map composition, forward fill). Tile shape
is (R, 128) in row-major flattened order.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

# CPU-testing hook: run these kernels through the Pallas interpreter so the
# (otherwise TPU-only) code paths are exercised by the CPU test-suite.
_INTERPRET = os.environ.get("SEQOIA_PALLAS_INTERPRET", "") == "1"

_LANES = 128


def _shift_down_lanes(x, k, identity):
    """(r, l) <- (r, l-k) with identity fill (within each row)."""
    rolled = pltpu.roll(x, k, 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane >= k, rolled, identity)


def _shift_down_rows(x, k, identity):
    """(r, l) <- (r-k, l) with identity fill."""
    rolled = pltpu.roll(x, k, 0)
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    return jnp.where(row >= k, rolled, identity)


def _tile_scan_kernel(combine, identities, n_arrays, rows, *refs):
    in_refs = refs[:n_arrays]
    out_refs = refs[n_arrays : 2 * n_arrays]
    carry_refs = refs[2 * n_arrays :]

    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        for c, ident in zip(carry_refs, identities):
            c[0] = ident

    xs = tuple(r[0, 0] for r in in_refs)  # (R, 128) each

    # 1) inclusive scan along lanes within each row
    k = 1
    while k < _LANES:
        shifted = tuple(
            _shift_down_lanes(x, k, ident) for x, ident in zip(xs, identities)
        )
        xs = combine(shifted, xs)
        k *= 2

    # 2) row aggregates = lane 127 of each row; exclusive scan down rows
    aggs = tuple(x[:, _LANES - 1 : _LANES] for x in xs)  # (R, 1)
    ex = tuple(
        _shift_down_rows(a, 1, ident) for a, ident in zip(aggs, identities)
    )
    k = 1
    while k < rows:
        shifted = tuple(
            _shift_down_rows(a, k, ident) for a, ident in zip(ex, identities)
        )
        ex = combine(shifted, ex)
        k *= 2

    # 3) fold in the cross-tile carry, apply row prefixes to lane scans
    carry = tuple(
        jnp.full((1, 1), c[0], jnp.int32) for c in carry_refs
    )
    row_pref = combine(carry, ex)  # (R, 1) broadcast-combined with carry
    xs = combine(row_pref, xs)

    for o, x in zip(out_refs, xs):
        o[0, 0] = x

    # 4) update carry with this tile's total (last row's inclusive value)
    tile_tot = tuple(x[rows - 1, _LANES - 1] for x in xs)
    for c, v in zip(carry_refs, tile_tot):
        c[0] = v


@functools.partial(
    jax.jit, static_argnames=("combine", "identities", "rows")
)
def _tile_scan_call(xs, combine, identities, rows):
    n_arrays = len(xs)
    b, t, r, l = xs[0].shape
    kern = functools.partial(
        _tile_scan_kernel, combine, identities, n_arrays, rows
    )
    spec = pl.BlockSpec(
        (1, 1, r, l), lambda bi, ti: (bi, ti, 0, 0), memory_space=pltpu.VMEM
    )
    outs = pl.pallas_call(
        kern,
        grid=(b, t),
        in_specs=[spec] * n_arrays,
        out_specs=[spec] * n_arrays,
        out_shape=[jax.ShapeDtypeStruct((b, t, r, l), jnp.int32)] * n_arrays,
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)] * n_arrays,
        interpret=_INTERPRET,
    )(*xs)
    return outs


def tile_scan(arrays, combine, identities, rows: int = 256):
    """Inclusive associative scan along the last axis of each (B, M) array.

    arrays: tuple of int32 (B, M) arrays scanned jointly (combine sees
    tuples). identities: per-array identity ints (hashable, static).
    Requires M % (rows*128) == 0; wrap with padding if needed.
    """
    arrays = tuple(arrays)
    squeeze = arrays[0].ndim == 1
    if squeeze:
        arrays = tuple(x[None, :] for x in arrays)
    b, m = arrays[0].shape
    tile = rows * _LANES
    assert m % tile == 0, (m, tile)
    t = m // tile
    xs = tuple(x.reshape(b, t, rows, _LANES) for x in arrays)
    outs = _tile_scan_call(xs, combine, tuple(identities), rows)
    outs = tuple(o.reshape(b, m) for o in outs)
    if squeeze:
        outs = tuple(o[0] for o in outs)
    return outs


# ---------------------------------------------------------------------------
# Scan-type instantiations mirroring scan_ops (same combine semantics)
# ---------------------------------------------------------------------------

def _comb_max(left, right):
    return (jnp.maximum(left[0], right[0]),)


def _comb_sum(left, right):
    return (left[0] + right[0],)


def _comb_fill(left, right):
    v = jnp.where(right[1] != 0, right[0], left[0])
    f = left[1] | right[1]
    return (v, f)


_M2 = 0x00FF00FF
_F2 = 0x01000100


def _comb_segmod(left, right):
    l, r = left[0], right[0]
    sum_ = ((l & _M2) + (r & _M2)) & _M2
    rf0 = (r >> 8) & 1
    rf1 = (r >> 24) & 1
    ch0 = jnp.where(rf0 != 0, r & 0x000000FF, sum_ & 0x000000FF)
    ch1 = jnp.where(rf1 != 0, r & 0x00FF0000, sum_ & 0x00FF0000)
    return (ch0 | ch1 | (l & _F2) | (r & _F2),)


def _comb_maps(left, right):
    l, r = left[0], right[0]
    out = jnp.zeros_like(l)
    for e in range(5):
        fe = (l >> (3 * e)) & 7
        he = (r >> (3 * fe)) & 7
        out = out | (he << (3 * e))
    return (out,)


_IDENTITY_MAP = 0 | (1 << 3) | (2 << 6) | (3 << 9) | (4 << 12)
_INT_MIN = -(2**31)


def cummax(x, rows=256):
    return tile_scan((x,), _comb_max, (_INT_MIN,), rows)[0]


def cumsum(x, rows=256):
    return tile_scan((x,), _comb_sum, (0,), rows)[0]


def fill_forward(values, valid, init, rows=256):
    v, f = tile_scan(
        (values, valid.astype(jnp.int32)), _comb_fill, (0, 0), rows
    )
    return jnp.where(f != 0, v, init)


def segmented_modsum(packed, rows=256):
    return tile_scan((packed,), _comb_segmod, (0,), rows)[0]


def compose_state_maps(maps, rows=256):
    return tile_scan((maps,), _comb_maps, (_IDENTITY_MAP,), rows)[0]
