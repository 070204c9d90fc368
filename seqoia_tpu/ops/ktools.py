"""In-kernel building blocks shared by the Pallas codec kernels.

All functions here operate on traced register values of shape (rows, 128)
inside a Pallas TPU kernel, treating them as flat row-major vectors of
rows*128 elements. They encode the Mosaic lowering rules probe-validated on
v5e: only `pltpu.roll` (non-negative shifts) for data movement, iota masks
for boundary fills, and log-step shift networks instead of gathers.

The butterfly compact/expand networks replace sequential packing loops:

* ``butterfly_compact``: entries at flat positions p (holes marked d = -1,
  entries d = p - rank(p) >= 0) move LEFT by bit k of d at stage k,
  LSB-first. Distances are monotone non-decreasing over entries (rank is a
  prefix count), which makes every stage collision-free: two entries at
  positions j < j' satisfy d' - d <= j' - j, so their partial positions
  j - (d mod 2^{k+1}) stay distinct (proved + fuzzed in round 2 notes).

* ``butterfly_expand``: dense entries j < m with strictly increasing
  targets tau_j >= j move RIGHT by bit k of d = tau - j, MSB-first — the
  exact inverse network of compaction, so it inherits collision-freedom.

Both replace the reference codec's sequential emission/placement loops
(seqoia.h:530-646, 722-806) with O(log n) vectorized stages.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

_L = 128
_INT_MIN = -(2**31)
HOLE = _INT_MIN  # butterfly hole marker: bits 0..30 all zero


def iota2(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim)


def extract(x, r, l):
    """Scalar at fixed (r, l) of a vector value via positional reduction."""
    row = iota2(x.shape, 0)
    lane = iota2(x.shape, 1)
    return jnp.max(jnp.where((row == r) & (lane == l), x, _INT_MIN))


def extract_flat(x, pos):
    """Scalar at dynamic flat position `pos` (row-major)."""
    rows = x.shape[0]
    flat = iota2(x.shape, 0) * _L + iota2(x.shape, 1)
    return jnp.max(jnp.where(flat == pos, x, _INT_MIN))


def flat_roll_left(x, s):
    """out[p] = x[(p + s) mod n] over flat row-major (rows, L); s in [1, n)."""
    rows = x.shape[0]
    if s % _L == 0:
        q = s // _L
        return pltpu.roll(x, rows - q, 0)
    assert s < _L
    a = pltpu.roll(x, _L - s, 1)
    b = pltpu.roll(a, rows - 1, 0)
    lane = iota2(x.shape, 1)
    return jnp.where(lane < _L - s, a, b)


def flat_roll_right(x, s):
    """out[p] = x[(p - s) mod n] over flat row-major (rows, L); s in [1, n)."""
    rows = x.shape[0]
    if s % _L == 0:
        return pltpu.roll(x, s // _L, 0)
    assert s < _L
    a = pltpu.roll(x, s, 1)
    b = pltpu.roll(a, 1, 0)
    lane = iota2(x.shape, 1)
    return jnp.where(lane >= s, a, b)


def flat_shift_left(x, s, fill):
    """out[p] = x[p + s], `fill` in the last s positions."""
    rows = x.shape[0]
    n = rows * _L
    flat = iota2(x.shape, 0) * _L + iota2(x.shape, 1)
    return jnp.where(flat < n - s, flat_roll_left(x, s), fill)


def flat_roll_right_dyn(x, s):
    """out[p] = x[(p - s) mod n]; s is a traced scalar in [0, 128)."""
    a = pltpu.roll(x, s, 1)
    b = pltpu.roll(a, 1, 0)
    lane = iota2(x.shape, 1)
    return jnp.where(lane >= s, a, b)


def flat_roll_left_dyn(x, s):
    """out[p] = x[(p + s) mod n]; s is a traced scalar in [0, 128)."""
    a = pltpu.roll(x, (_L - s) % _L, 1)
    rows = x.shape[0]
    b = pltpu.roll(a, rows - 1, 0)
    lane = iota2(x.shape, 1)
    return jnp.where(lane < _L - s, a, b)


def flat_shift_right(x, s, fill):
    """out[p] = x[p - s], `fill` in the first s positions."""
    flat = iota2(x.shape, 0) * _L + iota2(x.shape, 1)
    return jnp.where(flat >= s, flat_roll_right(x, s), fill)


# ---------------------------------------------------------------------------
# In-tile scans (lane log-scan, then row log-scan of row aggregates)
# ---------------------------------------------------------------------------

# NOTE (round 3, measured): an MXU-based row phase — moving the per-row
# aggregate column into one (8,128) vreg with selection matmuls
# (Precision.HIGHEST, 16-bit split for 32-bit payloads), scanning there,
# and moving back — was implemented and benchmarked against the classic
# full-tile row phase on v5e. It LOST uniformly (map scan 3.41 -> 3.80
# us/tile, + scan 1.55 -> 2.40, SWAR channel scan 2.65 -> 3.20): the
# dot lowering's layout moves and f32 round trips cost more than the
# full-width row stages they replace, which Mosaic already lowers well
# for lane-broadcast data. Rejected; see /tmp-style vbench in
# NOTES_ROUND4.md for the methodology.


def lane_row_scan_multi(vals, combine, identities):
    """Joint inclusive flat scan of several arrays sharing one combine
    (combine maps two lists of arrays to one list)."""
    rows = vals[0].shape[0]
    lane = iota2(vals[0].shape, 1)
    row = iota2(vals[0].shape, 0)
    xs = list(vals)
    k = 1
    while k < _L:
        sh = [
            jnp.where(lane >= k, pltpu.roll(x, k, 1), ident)
            for x, ident in zip(xs, identities)
        ]
        xs = combine(sh, xs)
        k *= 2
    aggs = [jnp.broadcast_to(x[:, _L - 1 : _L], x.shape) for x in xs]
    ex = [
        jnp.where(row >= 1, pltpu.roll(a, 1, 0), ident)
        for a, ident in zip(aggs, identities)
    ]
    k = 1
    while k < rows:
        sh = [
            jnp.where(row >= k, pltpu.roll(x, k, 0), ident)
            for x, ident in zip(ex, identities)
        ]
        ex = combine(sh, ex)
        k *= 2
    return combine(ex, xs)


def lane_row_scan(vals, combine, identity):
    """Inclusive scan over flat row-major (rows, L) with an associative
    combine(left, right) and its identity."""
    rows = vals.shape[0]
    lane = iota2(vals.shape, 1)
    row = iota2(vals.shape, 0)
    x = vals
    k = 1
    while k < _L:
        sh = jnp.where(lane >= k, pltpu.roll(x, k, 1), identity)
        x = combine(sh, x)
        k *= 2
    agg = jnp.broadcast_to(x[:, _L - 1 : _L], vals.shape)
    ex = jnp.where(row >= 1, pltpu.roll(agg, 1, 0), identity)
    k = 1
    while k < rows:
        sh = jnp.where(row >= k, pltpu.roll(ex, k, 0), identity)
        ex = combine(sh, ex)
        k *= 2
    return combine(ex, x)


def fill_scan_multi(vals_list, flags, max_gap=None):
    """Joint inclusive forward-fill of several payloads sharing one flag
    array over flat row-major (rows, L). Returns (filled_list, flags_out).

    max_gap (static) bounds the distance from any position to its
    governing flag WITHIN the live region (positions whose governing flag
    is farther, or absent, get flags_out == 0 — callers must treat those
    as "before first flag", which is exact when they are masked anyway).
    The stage count drops from log2(rows * L) to log2(max_gap): the codec
    knows its gaps (decode: a run covers at most SQOA_MAXRUN pixels;
    encode: an emitting pixel writes at most 14 bytes)."""
    rows = flags.shape[0]
    lane = iota2(flags.shape, 1)
    row = iota2(flags.shape, 0)
    if max_gap is None:
        lane_lim, row_lim = _L, rows
    else:
        npow2 = lambda x: 1 << max(x - 1, 0).bit_length()  # next pow2 >= x
        lane_lim = min(_L, npow2(max_gap + 1))  # lane reach lane_lim-1
        row_lim = min(rows, npow2(-(-max_gap // _L)))  # row reach row_lim
    vs, f = list(vals_list), flags
    k = 1
    while k < lane_lim:
        fs = jnp.where(lane >= k, pltpu.roll(f, k, 1), 0)
        vs = [
            jnp.where(f != 0, v, jnp.where(lane >= k, pltpu.roll(v, k, 1), 0))
            for v in vs
        ]
        f = f | fs
        k *= 2
    fa = jnp.broadcast_to(f[:, _L - 1 : _L], flags.shape)
    vas = [jnp.broadcast_to(v[:, _L - 1 : _L], flags.shape) for v in vs]
    fp = jnp.where(row >= 1, pltpu.roll(fa, 1, 0), 0)
    vps = [jnp.where(row >= 1, pltpu.roll(va, 1, 0), 0) for va in vas]
    k = 1
    while k < row_lim:
        fs = jnp.where(row >= k, pltpu.roll(fp, k, 0), 0)
        vps = [
            jnp.where(fp != 0, vp, jnp.where(row >= k, pltpu.roll(vp, k, 0), 0))
            for vp in vps
        ]
        fp = fp | fs
        k *= 2
    out = [jnp.where(f != 0, v, vp) for v, vp in zip(vs, vps)]
    return out, f | fp


def fill_scan(vals, flags, rows):
    """Inclusive forward-fill: (value at last flagged position <= p, any
    flagged <= p) over flat row-major (rows, L)."""
    lane = iota2(vals.shape, 1)
    row = iota2(vals.shape, 0)
    v, f = vals, flags
    k = 1
    while k < _L:
        vs = jnp.where(lane >= k, pltpu.roll(v, k, 1), 0)
        fs = jnp.where(lane >= k, pltpu.roll(f, k, 1), 0)
        v = jnp.where(f != 0, v, vs)
        f = f | fs
        k *= 2
    va = jnp.broadcast_to(v[:, _L - 1 : _L], vals.shape)
    fa = jnp.broadcast_to(f[:, _L - 1 : _L], vals.shape)
    vp = jnp.where(row >= 1, pltpu.roll(va, 1, 0), 0)
    fp = jnp.where(row >= 1, pltpu.roll(fa, 1, 0), 0)
    k = 1
    while k < rows:
        vs = jnp.where(row >= k, pltpu.roll(vp, k, 0), 0)
        fs = jnp.where(row >= k, pltpu.roll(fp, k, 0), 0)
        vp = jnp.where(fp != 0, vp, vs)
        fp = fp | fs
        k *= 2
    return jnp.where(f != 0, v, vp), f | fp


# ---------------------------------------------------------------------------
# Butterfly networks
# ---------------------------------------------------------------------------

def butterfly_compact(d, pays, nbits):
    """Move entries (d >= 0) left by their distance d; holes are d == HOLE
    (INT_MIN — bits 0..30 are all zero, so a single bit-k sign test serves
    as both the "is an entry" and "moves this stage" check, saving the
    separate >= 0 guards on take and keep that a -1 hole marker needs).

    d must be monotone non-decreasing over entries and equal to
    position - target (target = output rank); bits 15..30 may carry extra
    per-entry payload through the network. Payload values at hole
    positions after the network are stale garbage — consumers must mask by
    entry count. Returns (d_out, pays_out); entry slots have d_out >= 0.
    """
    for k in range(nbits):
        s = 1 << k
        d_s = flat_shift_left(d, s, HOLE)
        take = (d_s << (31 - k)) < 0       # bit k set and not a hole
        stay = (d << (31 - k)) >= 0        # bit k clear (holes stay holes)
        pays = [
            jnp.where(take, flat_roll_left(p, s), p) for p in pays
        ]
        d = jnp.where(take, d_s, jnp.where(stay, d, HOLE))
    return d, pays


def butterfly_expand(d, pays, nbits):
    """Move entries (d >= 0) right by d, MSB-first (inverse network of
    butterfly_compact; holes are d == HOLE, same encoding trick). Requires
    entries dense at positions j with strictly increasing targets
    tau_j = j + d_j. Returns (occupancy >= 0 map, pays)."""
    for k in reversed(range(nbits)):
        s = 1 << k
        d_s = flat_shift_right(d, s, HOLE)
        take = (d_s << (31 - k)) < 0
        stay = (d << (31 - k)) >= 0
        pays = [
            jnp.where(take, flat_roll_right(p, s), p) for p in pays
        ]
        d = jnp.where(take, d_s, jnp.where(stay, d, HOLE))
    return d, pays
