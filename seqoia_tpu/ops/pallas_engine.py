"""Butterfly compaction + placement engine (v2 data-movement kernels).

Replaces the round-1 ``pallas_compact`` engine. The old kernels walked each
tile with a 256-iteration ``fori_loop`` (per-row MXU one-hot packing /
scalar placement) — on TPU the Pallas grid itself is sequential on the one
TensorCore, so those inner loops dominated the codec's runtime. Both
kernels here are loop-free: O(log n) butterfly stages of full-width lane
and sublane rolls (ops/ktools.py), keeping every step an 8x128-vectorized
VPU op.

* ``compact``: drop invalid entries from (B, M) int32 streams, order
  preserved. Per 32768-entry tile: exclusive prefix count -> per-entry
  left-move distance d = pos - rank (monotone, hence the butterfly network
  is collision-free) -> 15 roll stages -> the packed tile is appended to
  the global stream at an *exact* (unaligned) cursor by dynamically
  rotating into a staging buffer whose partial last row carries over to
  the next tile. Unlike round 1 there is NO duplicate padding: totals are
  exact and keys stay strictly increasing — which is also the fix for the
  window-overflow parity bug the padded scheme had when many source tiles'
  padding landed in one placement window.

* ``place_fill``: inverse movement. Each output tile of p_out slots DMAs
  the (contiguous, exactly-located) window of entries targeting it,
  dynamically rotates it flush to position 0, moves each entry right by
  d = target - index with the inverse butterfly (strictly increasing
  targets -> collision-free), then forward-fills by a log-shift scan with
  a cross-tile carry.

Cross-tile state (cursor, carries, staging row) lives in SMEM/VMEM
scratch, which persists across the sequentially-walked grid.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import ktools

# CPU-testing hook: run these kernels through the Pallas interpreter so the
# (otherwise TPU-only) code paths are exercised by the CPU test-suite.
_INTERPRET = os.environ.get("SEQOIA_PALLAS_INTERPRET", "") == "1"

_L = 128
_ROWS = 256              # entries per compaction tile
_TILE = _ROWS * _L       # 32768
_OBUF_ROWS = _ROWS + 8   # staging: full tile + wrap row, 8-row DMA aligned


# ---------------------------------------------------------------------------
# compact
# ---------------------------------------------------------------------------

def _compact_kernel(n_pay, *refs):
    valid_ref = refs[0]
    key_ref = refs[1]
    pay_refs = refs[2 : 2 + n_pay]
    kout_ref = refs[2 + n_pay]
    pout_refs = refs[3 + n_pay : 3 + 2 * n_pay]
    total_ref = refs[3 + 2 * n_pay]
    obufs = refs[4 + 2 * n_pay : 5 + 3 * n_pay]     # (1+n_pay) staging bufs
    crow = refs[5 + 3 * n_pay]                      # (1+n_pay, L) carry row
    cursor = refs[6 + 3 * n_pay]                    # SMEM (1,)
    sem = refs[7 + 3 * n_pay]

    bi = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        cursor[0] = 0

    v = valid_ref[0]  # (ROWS, L) int32 0/1
    srcs = [key_ref[0]] + [pr[0] for pr in pay_refs]

    # rank = exclusive prefix count of valid; d = flat_pos - rank
    incl = ktools.lane_row_scan(v, lambda a, c: a + c, 0)
    n_here = ktools.extract(incl, _ROWS - 1, _L - 1)
    flat = ktools.iota2((_ROWS, _L), 0) * _L + ktools.iota2((_ROWS, _L), 1)
    d = jnp.where(v != 0, flat - (incl - v), ktools.HOLE)
    d, srcs = ktools.butterfly_compact(d, srcs, 15)

    # rotate to the global cursor and merge with the carried partial row
    sh = cursor[0] % _L
    row = ktools.iota2((_ROWS, _L), 0)
    lane = ktools.iota2((_ROWS, _L), 1)
    for i, (s, ob) in enumerate(zip(srcs, obufs)):
        rolled = ktools.flat_roll_right_dyn(s, sh)
        merged = jnp.where((row == 0) & (lane < sh), crow[i : i + 1, :], rolled)
        ob[0:_ROWS, :] = merged
        ob[_ROWS : _ROWS + 1, :] = rolled[0:1, :]  # wrap row (sh + n > TILE)

    # append: one fixed-size DMA per stream at the 128-aligned cursor row;
    # rows past the new partial row hold garbage and are overwritten by the
    # next tile (or masked by totals after the last one)
    cur_row = cursor[0] // _L
    outs = [kout_ref] + list(pout_refs)
    cps = []
    for i, (ob, out) in enumerate(zip(obufs, outs)):
        cp = pltpu.make_async_copy(
            ob.at[pl.ds(0, _OBUF_ROWS), :],
            out.at[bi, pl.ds(cur_row, _OBUF_ROWS), :],
            sem.at[i],
        )
        cp.start()
        cps.append(cp)

    # new carry row = the (possibly partial) last row of the appended data
    end = cursor[0] + n_here
    last_row_local = end // _L - cur_row  # 0..ROWS
    for i, ob in enumerate(obufs):
        crow[i : i + 1, :] = ob[pl.ds(last_row_local, 1), :]
    for cp in cps:
        cp.wait()
    cursor[0] = end

    @pl.when(t == pl.num_programs(1) - 1)
    def _():
        total_ref[0] = jnp.full((8, _L), cursor[0], jnp.int32)


@functools.partial(jax.jit, static_argnames=("n_pay",))
def _compact_call(valid, key, payloads, n_pay):
    b, m = valid.shape
    t = m // _TILE
    rows_out = m // _L + _OBUF_ROWS
    kern = functools.partial(_compact_kernel, n_pay)
    in_spec = pl.BlockSpec(
        (1, _ROWS, _L), lambda bi, ti: (bi, ti, 0), memory_space=pltpu.VMEM
    )
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    tot_spec = pl.BlockSpec(
        (1, 8, _L), lambda bi, ti: (bi, 0, 0), memory_space=pltpu.VMEM
    )
    shaped = lambda s: jax.ShapeDtypeStruct(s, jnp.int32)
    outs = pl.pallas_call(
        kern,
        grid=(b, t),
        in_specs=[in_spec] * (2 + n_pay),
        out_specs=[any_spec] * (1 + n_pay) + [tot_spec],
        out_shape=[shaped((b, rows_out, _L))] * (1 + n_pay)
        + [shaped((b, 8, _L))],
        scratch_shapes=(
            [pltpu.VMEM((_OBUF_ROWS, _L), jnp.int32)] * (1 + n_pay)
            + [
                pltpu.VMEM((1 + n_pay, _L), jnp.int32),
                pltpu.SMEM((1,), jnp.int32),
                pltpu.SemaphoreType.DMA((1 + n_pay,)),
            ]
        ),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=_INTERPRET,
    )(
        valid.astype(jnp.int32).reshape(b, t * _ROWS, _L),
        key.reshape(b, t * _ROWS, _L),
        *[p.reshape(b, t * _ROWS, _L) for p in payloads],
    )
    keyc = outs[0].reshape(b, rows_out * _L)
    pays = [o.reshape(b, rows_out * _L) for o in outs[1 : 1 + n_pay]]
    totals = outs[1 + n_pay][:, 0, 0]
    return keyc, pays, totals


def compact(valid, key, payloads):
    """Order-preserving removal of invalid entries.

    valid: (B, M) bool/int32, M % 32768 == 0. key: (B, M) int32, strictly
    increasing over valid entries per row. payloads: list of (B, M) int32.
    Returns (keys (B, M + slack), payloads list, totals (B,)). Exactly
    totals[b] entries per row, in order, no duplicates; slots past totals
    hold garbage.
    """
    return _compact_call(valid, key, tuple(payloads), len(payloads))


# ---------------------------------------------------------------------------
# place_fill (+ fused in-kernel emit epilogue)
# ---------------------------------------------------------------------------

def _place_emit_kernel(n_pay, p_out, win_rows, nbits, inits, epilogue,
                       out_rows, out_dtype, fill_keys, max_gap, *refs):
    rows = p_out // _L
    n_fill = n_pay + (1 if fill_keys else 0)
    lo_ref = refs[0]
    hi_ref = refs[1]
    total_ref = refs[2]
    scal_ref = refs[3]
    keys_ref = refs[4]
    pay_refs = refs[5 : 5 + n_pay]
    out_ref = refs[5 + n_pay]
    wbufs = refs[6 + n_pay : 7 + 2 * n_pay]
    carry = refs[7 + 2 * n_pay]
    pf = refs[8 + 2 * n_pay]
    sem = refs[9 + 2 * n_pay]

    bi = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when((t == 0) & (bi == 0))
    def _():
        # window-DMA prefetch chain crosses images: init once
        pf[0] = -1
        pf[1] = 0

    @pl.when(t == 0)
    def _():
        for j, ini in enumerate(inits):
            carry[j] = ini

    t_out = pl.num_programs(1)
    s_id = bi * t_out + t
    lo = lo_ref[s_id]
    total = total_ref[bi]
    base = t * p_out
    n_scal = scal_ref.shape[0] // total_ref.shape[0]
    scal = [scal_ref[bi * n_scal + s] for s in range(n_scal)]

    # --- double-buffered window DMAs: every step waits for its own
    # windows (started by the previous step) and prefetches the next
    # step's, hiding the load behind this tile's compute
    srcs = [keys_ref] + list(pay_refs)

    def _win_dma(i, step_bi, step_lo, slot):
        return pltpu.make_async_copy(
            srcs[i].at[step_bi, pl.ds(step_lo // _L, win_rows), :],
            wbufs[i].at[slot], sem.at[slot, i],
        )

    mine = pf[1]

    @pl.when(pf[0] != s_id)  # first step (or chain restart)
    def _():
        for i in range(1 + n_pay):
            _win_dma(i, bi, lo, mine).start()

    s_next = s_id + 1
    other = 1 - mine

    @pl.when(s_next < pl.num_programs(0) * t_out)
    def _():
        bn = s_next // t_out
        lo_n = lo_ref[s_next]
        for i in range(1 + n_pay):
            _win_dma(i, bn, lo_n, other).start()

    pf[0] = s_next
    pf[1] = other

    for i in range(1 + n_pay):
        _win_dma(i, bi, lo, mine).wait()

    # fast path: no entries target this tile — output is the carried fill
    # value everywhere (sparse byte/pixel space, e.g. long runs or caps
    # larger than the actual stream)
    @pl.when(hi_ref[s_id] == lo)
    def _():
        outs = [jnp.full((rows, _L), 0, jnp.int32) + carry[i]
                for i in range(n_fill)]
        out_ref[0, 0] = epilogue(outs, base, scal).astype(out_dtype)

    @pl.when(hi_ref[s_id] != lo)
    def _():
        sh = lo % _L

        keys = ktools.flat_roll_left_dyn(wbufs[0][mine], sh)
        pays = [ktools.flat_roll_left_dyn(wb[mine], sh) for wb in wbufs[1:]]

        j = ktools.iota2((win_rows, _L), 0) * _L \
            + ktools.iota2((win_rows, _L), 1)
        tau = keys - base
        ok = (lo + j < total) & (tau >= 0) & (tau < p_out) \
            & (j < win_rows * _L - _L)
        d = jnp.where(ok, tau - j, ktools.HOLE)
        d, pays = ktools.butterfly_expand(d, pays, nbits)

        f = (d >= 0).astype(jnp.int32)
        vals = [jnp.where(f != 0, p, 0) for p in pays]
        if fill_keys:
            # the key of an entry sitting at expanded slot tau is
            # base + tau by construction: synthesize it instead of
            # moving a duplicate keys payload through the butterfly
            vals.append(jnp.where(f != 0, base + j, 0))
        filled, ff = ktools.fill_scan_multi(vals, f, max_gap)
        outs = []
        for i in range(n_fill):
            out_v = jnp.where(ff != 0, filled[i], carry[i])
            outs.append(out_v[0:rows, :])
            carry[i] = ktools.extract(out_v, rows - 1, _L - 1)

        out_ref[0, 0] = epilogue(outs, base, scal).astype(out_dtype)


@functools.partial(
    jax.jit, static_argnames=("n_pay", "n_out", "p_out", "win_rows", "nbits",
                              "inits", "epilogue", "out_rows", "out_dtype",
                              "fill_keys", "max_gap")
)
def _place_emit_call(lo, hi, totals, scal, keys, pays, n_pay, n_out, p_out,
                     win_rows, nbits, inits, epilogue, out_rows, out_dtype,
                     fill_keys, max_gap):
    b = keys.shape[0]
    t_out = n_out // p_out
    kern = functools.partial(
        _place_emit_kernel, n_pay, p_out, win_rows, nbits, inits, epilogue,
        out_rows, out_dtype, fill_keys, max_gap,
    )
    sca = pl.BlockSpec(memory_space=pltpu.SMEM)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    out_spec = pl.BlockSpec(
        (1, 1, out_rows, _L), lambda bi, ti: (bi, ti, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out = pl.pallas_call(
        kern,
        grid=(b, t_out),
        in_specs=[sca, sca, sca, sca, any_spec] + [any_spec] * n_pay,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, t_out, out_rows, _L), out_dtype),
        scratch_shapes=(
            [pltpu.VMEM((2, win_rows, _L), jnp.int32)] * (1 + n_pay)
            + [
                pltpu.SMEM((n_pay + (1 if fill_keys else 0),), jnp.int32),
                pltpu.SMEM((2,), jnp.int32),
                pltpu.SemaphoreType.DMA((2, 1 + n_pay)),
            ]
        ),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=_INTERPRET,
    )(
        lo.reshape(-1), hi.reshape(-1), totals.reshape(-1), scal.reshape(-1),
        keys.reshape(b, -1, _L),
        *[p.reshape(b, -1, _L) for p in pays],
    )
    return out.reshape(b, t_out * out_rows * _L)


def place_emit(keys, payloads, totals, scalars, n_out, inits, epilogue,
               p_out=4096, out_rows=None, out_dtype=jnp.uint8,
               fill_keys=False, max_gap=None, entry_limit=None):
    """place_fill fused with an emission epilogue.

    Same placement/fill semantics as ``place_fill``, but instead of
    materializing the filled int32 streams, each output tile runs
    ``epilogue(filled_list, tile_base, per_image_scalars)`` in-kernel and
    one (B, t_out * out_rows * 128) ``out_dtype`` array is written
    (out_rows defaults to the p_out//128 placement rows; a different value
    lets the epilogue change the per-tile output geometry, e.g. the
    RGB-interleave emitting 3 output bytes per pixel). ``epilogue`` must
    be a hashable static callable; ``scalars`` is (B, S) int32.

    fill_keys=True appends a forward-filled copy of the governing entry's
    KEY to the epilogue's filled list (inits must carry its init as the
    extra last element) — synthesized in-kernel from each entry's
    expanded slot, so no duplicate keys payload rides the butterfly.

    entry_limit (optional): static upper bound on the number of VALID
    entries. The window DMA reads win_rows*128 entries from each tile's
    first-entry index, so the arrays need that much slack past any valid
    entry; the 256-row fronts provide exactly one max-size window of
    slack, but reduced-tile fronts (small images) provide only
    (rows+8)*128 — callers with less slack than one window MUST pass
    their entry_limit so the arrays pad out. (Clamping the window start
    instead is NOT sound: the expand butterfly's move distances are
    tau - j, which requires j to count from the tile's true first entry.)
    """
    payloads = list(payloads)
    b, mc = keys.shape
    assert n_out % p_out == 0
    if out_rows is None:
        out_rows = p_out // _L
    win_rows = -(-(p_out + 2 * _L) // _L) // 8 * 8 + 8
    if entry_limit is not None and mc < entry_limit + win_rows * _L:
        need = -(-(entry_limit + win_rows * _L) // _L) * _L
        pad = need - mc
        keys = jnp.pad(keys, ((0, 0), (0, pad)), constant_values=2**30)
        payloads = [jnp.pad(p, ((0, 0), (0, pad))) for p in payloads]
        mc = need
    nbits = max((p_out - 1).bit_length(), 1)
    t_out = n_out // p_out
    idx = jnp.arange(mc, dtype=jnp.int32)
    masked = jnp.where(
        idx[None, :] < totals[:, None], keys, jnp.int32(2**30)
    )
    bounds = jnp.arange(t_out + 1, dtype=jnp.int32) * p_out
    lo_all = jax.vmap(
        lambda r: jnp.searchsorted(r, bounds, side="left").astype(jnp.int32)
    )(masked)
    lo = jnp.minimum(lo_all[:, :-1], mc - win_rows * _L)
    # hi only signals tile emptiness in the kernel (hi == lo -> fill-only
    # fast path): encode it against the CLAMPED lo, not clamped itself —
    # clamping both made a full window at the array end read as empty
    empty = lo_all[:, :-1] == lo_all[:, 1:]
    hi = jnp.where(empty, lo, lo + 1)
    return _place_emit_call(
        lo, hi, totals, scalars, masked, tuple(payloads),
        len(payloads), n_out, p_out, win_rows, nbits, tuple(inits), epilogue,
        out_rows, out_dtype, fill_keys, max_gap,
    )

def _place_kernel(n_pay, p_out, win_rows, nbits, inits, max_gap, *refs):
    rows = p_out // _L
    lo_ref = refs[0]
    total_ref = refs[1]
    keys_ref = refs[2]
    pay_refs = refs[3 : 3 + n_pay]
    out_refs = refs[3 + n_pay : 3 + 2 * n_pay]
    wbufs = refs[3 + 2 * n_pay : 4 + 3 * n_pay]   # (1+n_pay) window bufs
    carry = refs[4 + 3 * n_pay]                   # SMEM (n_pay,)
    sem = refs[5 + 3 * n_pay]

    bi = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        for j, ini in enumerate(inits):
            carry[j] = ini

    lo = lo_ref[bi * pl.num_programs(1) + t]
    total = total_ref[bi]
    lo_row = lo // _L
    sh = lo % _L

    cps = []
    for i, src in enumerate([keys_ref] + list(pay_refs)):
        cp = pltpu.make_async_copy(
            src.at[bi, pl.ds(lo_row, win_rows), :], wbufs[i], sem.at[i]
        )
        cp.start()
        cps.append(cp)
    for cp in cps:
        cp.wait()

    base = t * p_out
    keys = ktools.flat_roll_left_dyn(wbufs[0][...], sh)  # entry lo at flat 0
    pays = [ktools.flat_roll_left_dyn(wb[...], sh) for wb in wbufs[1:]]

    j = ktools.iota2((win_rows, _L), 0) * _L + ktools.iota2((win_rows, _L), 1)
    tau = keys - base
    # entries for this tile form a contiguous index range starting at lo
    # (keys strictly increasing, no duplicates)
    ok = (lo + j < total) & (tau >= 0) & (tau < p_out) & (j < win_rows * _L - _L)
    d = jnp.where(ok, tau - j, ktools.HOLE)
    d, pays = ktools.butterfly_expand(d, pays, nbits)

    f = (d >= 0).astype(jnp.int32)
    vals = [jnp.where(f != 0, p, 0) for p in pays]
    filled, ff = ktools.fill_scan_multi(vals, f, max_gap)
    for i in range(n_pay):
        cv = carry[i]
        out_v = jnp.where(ff != 0, filled[i], cv)
        out_refs[i][0, 0] = out_v[0:rows, :]
        carry[i] = ktools.extract(out_v, rows - 1, _L - 1)


@functools.partial(
    jax.jit, static_argnames=("n_pay", "n_out", "p_out", "win_rows", "nbits",
                              "inits", "max_gap")
)
def _place_fill_call(lo, totals, keys, pays, n_pay, n_out, p_out, win_rows,
                     nbits, inits, max_gap):
    b = keys.shape[0]
    t_out = n_out // p_out
    rows = p_out // _L
    kern = functools.partial(
        _place_kernel, n_pay, p_out, win_rows, nbits, inits, max_gap
    )
    sca = pl.BlockSpec(memory_space=pltpu.SMEM)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    out_spec = pl.BlockSpec(
        (1, 1, rows, _L), lambda bi, ti: (bi, ti, 0, 0),
        memory_space=pltpu.VMEM,
    )
    outs = pl.pallas_call(
        kern,
        grid=(b, t_out),
        in_specs=[sca, sca, any_spec] + [any_spec] * n_pay,
        out_specs=[out_spec] * n_pay,
        out_shape=[
            jax.ShapeDtypeStruct((b, t_out, rows, _L), jnp.int32)
        ] * n_pay,
        scratch_shapes=(
            [pltpu.VMEM((win_rows, _L), jnp.int32)] * (1 + n_pay)
            + [
                pltpu.SMEM((n_pay,), jnp.int32),
                pltpu.SemaphoreType.DMA((1 + n_pay,)),
            ]
        ),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=_INTERPRET,
    )(
        lo.reshape(-1), totals.reshape(-1),
        keys.reshape(b, -1, _L),
        *[p.reshape(b, -1, _L) for p in pays],
    )
    return [o.reshape(b, n_out) for o in outs]


def place_fill(keys, payloads, totals, n_out, inits, p_out=4096,
               max_gap=None):
    """Dense forward-filled placement of compacted monotone streams.

    keys: (B, Mc) int32 — strictly increasing valid prefix (totals[b]
    entries); Mc must have >= p_out + 256 entries of slack beyond any valid
    index (compact()'s output provides it). Returns [(B, n_out) int32] with
    slot t = payload at the last key <= t, inits before the first key.
    """
    payloads = list(payloads)
    b, mc = keys.shape
    assert n_out % p_out == 0
    # window: at most p_out in-range entries (strictly increasing keys) plus
    # head/tail row alignment; rounded to 8 rows for the DMA
    win_rows = -(-(p_out + 2 * _L) // _L) // 8 * 8 + 8
    if mc < win_rows * _L:
        # pad small fronts to one window (see place_emit)
        pad = win_rows * _L - mc
        keys = jnp.pad(keys, ((0, 0), (0, pad)), constant_values=2**30)
        payloads = [jnp.pad(p, ((0, 0), (0, pad))) for p in payloads]
        mc = win_rows * _L
    nbits = max((p_out - 1).bit_length(), 1)
    t_out = n_out // p_out
    idx = jnp.arange(mc, dtype=jnp.int32)
    masked = jnp.where(
        idx[None, :] < totals[:, None], keys, jnp.int32(2**30)
    )
    bounds = jnp.arange(t_out, dtype=jnp.int32) * p_out
    lo = jax.vmap(
        lambda r: jnp.searchsorted(r, bounds, side="left").astype(jnp.int32)
    )(masked)
    # clamp so the fixed-size window DMA stays in bounds
    lo = jnp.minimum(lo, mc - win_rows * _L)
    return _place_fill_call(
        lo, totals, masked, tuple(payloads),
        len(payloads), n_out, p_out, win_rows, nbits, tuple(inits), max_gap,
    )
