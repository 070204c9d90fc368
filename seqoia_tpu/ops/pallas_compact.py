"""Stream compaction and monotone place-and-fill for TPU.

These two Pallas kernels replace XLA scatters (measured ~8 ns per *input*
element on v5e — they serialize) in the codec's data-movement steps. Every
construct here was probe-validated against Mosaic's lowering rules: scalar
loads come from SMEM (VMEM scalar access doesn't lower), sparse updates are
(1,128) read-modify-write stores at dynamic sublane offsets, and ragged
output is stitched with row-aligned overlapping DMAs issued by a
sequentially-walked grid.

* ``compact``: drop invalid entries from (B, M) int32 arrays, order
  preserved. Per 128-block, survivors are packed and shifted to their
  in-tile position by one fp32 one-hot matmul on the MXU (targets =
  exclusive lane rank + running offset, spanning two output rows; 32-bit
  payloads ride as two exact 16-bit halves). Tiles append to the global
  stream at 128-aligned cursors; the ragged tail of each tile is padded
  with duplicates of its last entry (idempotent for place_fill: same key,
  same payload), extracted with vectorized max reductions.

* ``place_fill``: given compacted (key=target position, payloads) streams
  with non-decreasing valid keys, produce dense (B, n_out) arrays where
  slot t holds the payloads of the last key <= t (forward fill), carrying
  state across output tiles. An output tile of P slots receives at most P
  distinct keys plus bounded duplicate padding, so a static window of
  P + 512 entries at a searchsorted-derived offset suffices.
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

_L = 128
_ROWS = 256              # 128-blocks per compaction tile
_TILE = _ROWS * _L       # 32768 entries
_PAD_SLACK = 512         # window slack for duplicate padding in place_fill
_INT_MIN = -(2**31)


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
    rank_ref = refs[4 + 2 * n_pay]
    cnt_vmem = refs[5 + 2 * n_pay]
    cnt_smem = refs[6 + 2 * n_pay]
    bufs = refs[7 + 2 * n_pay : 8 + 3 * n_pay]  # key buf + payload bufs
    cursor = refs[8 + 3 * n_pay]
    last = refs[9 + 3 * n_pay]  # SMEM: last key + last payloads
    sem = refs[10 + 3 * n_pay]

    bi = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        cursor[0] = 0
        last[0] = -1
        for i in range(n_pay):
            last[1 + i] = 0

    v = valid_ref[0]  # (ROWS, L) int32 0/1
    lane = jax.lax.broadcasted_iota(jnp.int32, (_ROWS, _L), 1)
    x = v
    k = 1
    while k < _L:
        x = x + jnp.where(lane >= k, pltpu.roll(x, k, 1), 0)
        k *= 2
    rank_ref[...] = x - v
    cnt_vmem[...] = x[:, _L - 1].reshape(1, _ROWS)
    cp = pltpu.make_async_copy(cnt_vmem, cnt_smem, sem)
    cp.start()
    cp.wait()

    iota_c = jax.lax.broadcasted_iota(jnp.int32, (_L, 2 * _L), 1)
    n_srcs = 1 + n_pay

    # Current output row accumulates in registers; each buffer row is
    # stored exactly once when the cursor advances past it (conditional
    # dynamic-row stores across loop iterations must never read back).
    def body(r, state):
        local, *curs = state
        sh = local % _L
        row0 = local // _L
        rr = rank_ref[r, :].reshape(_L, 1)
        vv = valid_ref[0, r, :].reshape(_L, 1)
        onehot = (rr + sh == iota_c) & (vv == 1)
        srcs = [key_ref[0, r, :]] + [pr[0, r, :] for pr in pay_refs]
        # 8-bit pieces stay exact through a single-pass bf16 MXU dot (the
        # one-hot guarantees exactly one term per output column; integers
        # <= 255 are exact in bf16 — 16-bit halves are NOT, because the env
        # flag --xla_allow_excess_precision drops f32 dots to bf16).
        mats = []
        for srow in srcs:
            for piece in range(4):
                mats.append(
                    ((srow >> (8 * piece)) & 0xFF)
                    .astype(jnp.bfloat16)
                    .reshape(1, _L)
                )
        mats.append(jnp.ones((1, _L), jnp.bfloat16))  # occupancy row
        mat = jnp.concatenate(mats, axis=0)  # (4*n_srcs + 1, L)
        res = jax.lax.dot_general(
            mat, onehot.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)  # (4*n_srcs + 1, 2L)
        occ = res[4 * n_srcs : 4 * n_srcs + 1, :]  # (1, 2L)

        new_local = local + cnt_smem[0, r]
        advance = (new_local // _L) > row0
        merged = []
        for i in range(n_srcs):
            word = (
                res[4 * i : 4 * i + 1, :]
                | (res[4 * i + 1 : 4 * i + 2, :] << 8)
                | (res[4 * i + 2 : 4 * i + 3, :] << 16)
                | (res[4 * i + 3 : 4 * i + 4, :] << 24)
            )
            m0 = jnp.where(occ[:, :_L] > 0, word[:, :_L], curs[i])
            merged.append((m0, word[:, _L:], occ[:, _L:]))

        @pl.when(advance)
        def _():
            for i, buf in enumerate(bufs):
                buf[pl.ds(row0, 1), :] = merged[i][0]

        next_curs = [
            jnp.where(
                advance, jnp.where(o1 > 0, w1, 0), m0
            )
            for (m0, w1, o1) in merged
        ]
        return (new_local, *next_curs)

    zero_row = jnp.zeros((1, _L), jnp.int32)
    state = jax.lax.fori_loop(
        0, _ROWS, body, (0, *([zero_row] * n_srcs))
    )
    local = state[0]
    curs = state[1:]

    # last valid entry of this tile (for idempotent duplicate padding)
    keys_tile = key_ref[0]
    vmask = v == 1
    tile_max_key = jnp.max(jnp.where(vmask, keys_tile, _INT_MIN))

    @pl.when(local > 0)
    def _():
        last[0] = tile_max_key
        for i in range(n_pay):
            pv = jnp.max(
                jnp.where(
                    vmask & (keys_tile == tile_max_key),
                    pay_refs[i][0],
                    _INT_MIN,
                )
            )
            last[1 + i] = pv

    # flush the final (possibly partial) row, padding its tail lanes with
    # duplicates of the last entry (idempotent for downstream placement)
    sh = local % _L
    row_last = local // _L
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, _L), 1)
    for i, buf in enumerate(bufs):
        final = jnp.where((sh > 0) & (lane1 >= sh), last[i], curs[i])
        buf[pl.ds(row_last, 1), :] = final

    padded = local + jnp.where(sh > 0, _L - sh, 0)

    # append to the global stream (row-aligned cursor; trailing rows are
    # overwritten by the next tile's DMA — the sequential grid keeps order)
    cur_row = cursor[0] // _L
    outs = [kout_ref] + list(pout_refs)
    for buf, out in zip(bufs, outs):
        cp = pltpu.make_async_copy(
            buf.at[pl.ds(0, _ROWS + 8), :],
            out.at[bi, pl.ds(cur_row, _ROWS + 8), :],
            sem,
        )
        cp.start()
        cp.wait()
    cursor[0] = cursor[0] + padded

    @pl.when(t == pl.num_programs(1) - 1)
    def _():
        total_ref[0] = jnp.full((8, _L), cursor[0], jnp.int32)


@functools.partial(jax.jit, static_argnames=("n_pay",))
def _compact_call(valid, key, payloads, n_pay):
    b, m = valid.shape
    t = m // _TILE
    rows_out = (m + _TILE) // _L + 8  # slack for the final tile's full DMA
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
            [pltpu.VMEM((_ROWS, _L), jnp.int32)]
            + [pltpu.VMEM((1, _ROWS), jnp.int32)]
            + [pltpu.SMEM((1, _ROWS), jnp.int32)]
            + [pltpu.VMEM((_ROWS + 8, _L), jnp.int32)] * (1 + n_pay)
            + [
                pltpu.SMEM((1,), jnp.int32),
                pltpu.SMEM((1 + n_pay,), jnp.int32),
                pltpu.SemaphoreType.DMA,
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
    Returns (keys (B, M+32768), payloads list, totals (B,)). The compacted
    prefix (totals entries) holds every valid entry in order plus bounded
    runs of duplicated entries (same key+payload, < 128 per source tile) —
    consumers must tolerate idempotent duplicates.
    """
    return _compact_call(valid, key, tuple(payloads), len(payloads))


# ---------------------------------------------------------------------------
# place_fill
# ---------------------------------------------------------------------------

def _place_kernel(n_pay, p_out, win, inits, *refs):
    rows = p_out // _L
    lo_ref = refs[0]
    hi_ref = refs[1]
    total_ref = refs[2]
    keys_ref = refs[3]
    pay_refs = refs[4 : 4 + n_pay]
    out_refs = refs[4 + n_pay : 4 + 2 * n_pay]
    kbuf = refs[4 + 2 * n_pay]                       # SMEM (win/L, L)
    pbufs = refs[5 + 2 * n_pay : 5 + 3 * n_pay]      # SMEM (win/L, L)
    kvv = refs[5 + 3 * n_pay]                        # VMEM window copies
    pvvs = refs[6 + 3 * n_pay : 6 + 4 * n_pay]
    vbufs = refs[6 + 4 * n_pay : 6 + 5 * n_pay]      # VMEM (rows, L)
    fbuf = refs[6 + 5 * n_pay]
    carry = refs[7 + 5 * n_pay]
    sem = refs[8 + 5 * n_pay]

    bi = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        for j, ini in enumerate(inits):
            carry[j] = ini

    lo = lo_ref[bi, t]
    hi = hi_ref[bi, t]
    total = total_ref[bi, 0]
    # DMA windows are row (128-entry) aligned; entries before `lo` in the
    # window have keys below this tile's base and are skipped by the tau
    # range guard.
    lo_row = lo // _L
    jmax = jnp.minimum(hi - lo_row * _L, win)

    # all window DMAs are independent: issue together, then drain (one
    # semaphore slot per copy)
    copies = []
    for dst in (kbuf, kvv):
        copies.append(
            pltpu.make_async_copy(
                keys_ref.at[bi, pl.ds(lo_row, win // _L), :], dst,
                sem.at[len(copies)],
            )
        )
    for pr, pb, pv in zip(pay_refs, pbufs, pvvs):
        for dst in (pb, pv):
            copies.append(
                pltpu.make_async_copy(
                    pr.at[bi, pl.ds(lo_row, win // _L), :], dst,
                    sem.at[len(copies)],
                )
            )
    for cp in copies:
        cp.start()
    for cp in copies:
        cp.wait()

    base = t * p_out
    for vb in vbufs:
        vb[...] = jnp.zeros((rows, _L), jnp.int32)
    fbuf[...] = jnp.zeros((rows, _L), jnp.int32)

    lane_1l = jax.lax.broadcasted_iota(jnp.int32, (1, _L), 1)
    zero_row = jnp.zeros((1, _L), jnp.int32)

    # Valid taus are non-decreasing, so the target row only moves forward;
    # the current row accumulates in registers and each buffer row is
    # stored exactly once. Two paths per 128-entry window row:
    #   fast: the row holds 128 consecutive real keys (pixel-per-token
    #   stretches — LUMA chains, RGB regions) -> one dynamic roll places
    #   all 128 lanes across (at most) two output rows;
    #   slow: scalar per-entry loop (runs 0 iterations when fast applies).
    def row_body(jr, state):
        row_off = jr * _L
        n_here = jnp.clip(jmax - row_off, 0, _L)
        first = kbuf[jr, 0]
        tau0 = first - base
        kv = kvv[pl.ds(jr, 1), :]
        consec = jnp.all(kv == first + lane_1l)
        all_real = (lo_row * _L + row_off + _L - 1) < total
        u = (
            (n_here == _L) & all_real & consec
            & (tau0 >= 0) & (tau0 + _L - 1 < p_out)
        )

        # slow path: per-entry loop (skipped entirely when u)
        def body(jj, st):
            cur_row, curf, *curv = st
            j = row_off + jj
            key = kbuf[j // _L, j % _L]
            tau = key - base
            ok = (lo_row * _L + j < total) & (tau >= 0) & (tau < p_out)
            r = jnp.where(ok, tau // _L, cur_row)
            l = tau % _L
            advance = ok & (r > cur_row)

            @pl.when(advance)
            def _():
                fbuf[pl.ds(cur_row, 1), :] = curf
                for vb, cv in zip(vbufs, curv):
                    vb[pl.ds(cur_row, 1), :] = cv

            base_f = jnp.where(advance, zero_row, curf)
            base_v = [jnp.where(advance, zero_row, cv) for cv in curv]
            hit = ok & (lane_1l == l)
            newf = jnp.where(hit, 1, base_f)
            newv = [
                jnp.where(hit, pb[j // _L, j % _L], bv)
                for pb, bv in zip(pbufs, base_v)
            ]
            return (jnp.where(ok, r, cur_row), newf, *newv)

        state = jax.lax.fori_loop(
            0, jnp.where(u, 0, n_here), body, state
        )
        cur_row, curf, *curv = state

        # fast path: place [tau0, tau0+128) via roll, spanning rows r0/r0+1
        r0 = tau0 // _L
        sh = tau0 % _L
        rolled = [pltpu.roll(pv[pl.ds(jr, 1), :], sh, 1) for pv in pvvs]
        p0f = jnp.where(lane_1l >= sh, 1, 0)
        p1f = jnp.where(lane_1l < sh, 1, 0)

        flush_old = u & (r0 > cur_row)

        @pl.when(flush_old)
        def _():
            fbuf[pl.ds(cur_row, 1), :] = curf
            for vb, cv in zip(vbufs, curv):
                vb[pl.ds(cur_row, 1), :] = cv

        bf = jnp.where(flush_old, zero_row, curf)
        bv = [jnp.where(flush_old, zero_row, cv) for cv in curv]
        m0f = jnp.where(p0f != 0, 1, bf)
        m0v = [jnp.where(p0f != 0, rv, b) for rv, b in zip(rolled, bv)]
        has_p1 = u & (sh > 0)

        @pl.when(has_p1)
        def _():
            fbuf[pl.ds(r0, 1), :] = m0f
            for vb, mv in zip(vbufs, m0v):
                vb[pl.ds(r0, 1), :] = mv

        new_row = jnp.where(u, jnp.where(sh > 0, r0 + 1, r0), cur_row)
        new_f = jnp.where(u, jnp.where(sh > 0, p1f, m0f), curf)
        new_v = [
            jnp.where(u, jnp.where(sh > 0, jnp.where(p1f != 0, rv, 0), mv), cv)
            for rv, mv, cv in zip(rolled, m0v, curv)
        ]
        return (new_row, new_f, *new_v)

    state = jax.lax.fori_loop(
        0, (jmax + _L - 1) // _L, row_body,
        (0, zero_row, *([zero_row] * n_pay)),
    )
    fin_row, fin_f, *fin_v = state
    fbuf[pl.ds(fin_row, 1), :] = fin_f
    for vb, cv in zip(vbufs, fin_v):
        vb[pl.ds(fin_row, 1), :] = cv

    # in-tile forward fill: lane scan, then row-prefix scan, then combine
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, _L), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (rows, _L), 0)
    f = fbuf[...]
    vs = [vb[...] for vb in vbufs]
    k = 1
    while k < _L:
        fs = jnp.where(lane >= k, pltpu.roll(f, k, 1), 0)
        vs = [
            jnp.where(f != 0, v, jnp.where(lane >= k, pltpu.roll(v, k, 1), 0))
            for v in vs
        ]
        f = f | fs
        k *= 2
    fa = jnp.broadcast_to(f[:, _L - 1 : _L], (rows, _L))
    vas = [jnp.broadcast_to(v[:, _L - 1 : _L], (rows, _L)) for v in vs]
    fp = jnp.where(row >= 1, pltpu.roll(fa, 1, 0), 0)
    vps = [jnp.where(row >= 1, pltpu.roll(va, 1, 0), 0) for va in vas]
    k = 1
    while k < rows:
        fs = jnp.where(row >= k, pltpu.roll(fp, k, 0), 0)
        vps = [
            jnp.where(fp != 0, vp, jnp.where(row >= k, pltpu.roll(vp, k, 0), 0))
            for vp in vps
        ]
        fp = fp | fs
        k *= 2
    for i in range(n_pay):
        cv = carry[i]
        vp_full = jnp.where(fp != 0, vps[i], cv)
        out_v = jnp.where(f != 0, vs[i], vp_full)
        out_refs[i][0, 0] = out_v
        carry[i] = jnp.max(
            jnp.where((row == rows - 1) & (lane == _L - 1), out_v, _INT_MIN)
        )


@functools.partial(
    jax.jit, static_argnames=("n_pay", "n_out", "p_out", "win", "inits")
)
def _place_fill_call(lo, hi, totals, keys, pays, n_pay, n_out, p_out, win,
                     inits):
    b = keys.shape[0]
    t_out = n_out // p_out
    rows = p_out // _L
    kern = functools.partial(_place_kernel, n_pay, p_out, win, inits)
    sca = pl.BlockSpec(memory_space=pltpu.SMEM)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    out_spec = pl.BlockSpec(
        (1, 1, rows, _L), lambda bi, ti: (bi, ti, 0, 0),
        memory_space=pltpu.VMEM,
    )
    outs = pl.pallas_call(
        kern,
        grid=(b, t_out),
        in_specs=[sca, sca, sca, any_spec] + [any_spec] * n_pay,
        out_specs=[out_spec] * n_pay,
        out_shape=[
            jax.ShapeDtypeStruct((b, t_out, rows, _L), jnp.int32)
        ] * n_pay,
        scratch_shapes=(
            [pltpu.SMEM((win // _L, _L), jnp.int32)] * (1 + n_pay)
            + [pltpu.VMEM((win // _L, _L), jnp.int32)] * (1 + n_pay)
            + [pltpu.VMEM((rows, _L), jnp.int32)] * (n_pay + 1)
            + [
                pltpu.SMEM((n_pay,), jnp.int32),
                pltpu.SemaphoreType.DMA((2 * (1 + n_pay),)),
            ]
        ),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=_INTERPRET,
    )(
        lo, hi, totals,
        keys.reshape(keys.shape[0], -1, _L),
        *[p.reshape(p.shape[0], -1, _L) for p in pays],
    )
    return [o.reshape(b, n_out) for o in outs]


def place_fill(keys, payloads, totals, n_out, inits, p_out=2048):
    """Dense forward-filled placement of compacted monotone streams.

    keys: (B, Mc) int32 — non-decreasing valid prefix (totals[b] entries;
    duplicates must carry identical payloads); Mc needs >= p_out+512 slack
    beyond any valid index (compact()'s output provides it).
    Returns [(B, n_out) int32] with slot t = payload at last key <= t,
    inits before the first key.
    """
    payloads = list(payloads)
    b, mc = keys.shape
    assert n_out % p_out == 0
    # window: p_out distinct keys + duplicate padding + row-alignment slack,
    # rounded to 8 rows (DMA sublane counts must be multiples of 8)
    win = -(-(p_out + _PAD_SLACK + _L) // 1024) * 1024
    t_out = n_out // p_out
    idx = jnp.arange(mc, dtype=jnp.int32)
    masked = jnp.where(
        idx[None, :] < totals[:, None], keys, jnp.int32(2**30)
    )
    bounds = jnp.arange(t_out + 1, dtype=jnp.int32) * p_out
    lo_all = jax.vmap(
        lambda r: jnp.searchsorted(r, bounds, side="left").astype(jnp.int32)
    )(masked)
    lo = jnp.minimum(lo_all[:, :-1], mc - win)
    hi = jnp.minimum(lo_all[:, 1:], lo + win - _L)
    return _place_fill_call(
        lo, hi, totals[:, None], masked, tuple(payloads),
        len(payloads), n_out, p_out, win, tuple(inits),
    )
