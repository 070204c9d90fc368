"""Fused SQOA decode front-end: one Pallas pass from bytes to tokens.

The unfused front-end (decode_v2 stages 1-4) runs ~6 separate scans plus
~70 elementwise passes over the byte arrays — every one a round trip
through HBM. This kernel streams each byte tile through VMEM once and
computes everything on-chip:

  token automaton (5-state map composition) → alpha modifier/run
  alternation (segmented counts) → pixel counts + offsets (prefix sum) →
  channel elements → segmented modular channel sums → packed RGBA + token
  validity,

with scalar carries in SMEM threading the cross-tile state. Shifted
operand views come from a one-row halo so every shift stays on-chip.

``decode_front_compact`` additionally runs the butterfly compaction
*inside the kernel* (mirroring pallas_encode's fused encode front) and
appends the surviving ops to a dense output stream at an exact cursor —
the round-2 pipeline's (valid, pixoff, packed) HBM round trip and its
separate compact dispatch disappear. The byte stream is ingested as uint8
directly (in-kernel convert) instead of staging a 4x int32 copy in HBM.

Covers the hot mode (color, non-compat); other modes use the unfused path.
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

from .. import spec
from . import ktools

_L = 128
_R = 256                 # output rows per tile
_RH = _R + 1             # +1 halo row for shifted operand views
_TILE = _R * _L
_OBUF_ROWS = _R + 8      # compact staging: full tile + wrap row, DMA aligned

_IDENT_MAP = 0 | (1 << 3) | (2 << 6) | (3 << 9) | (4 << 12)
_INT_MIN = -(2**31)

# carry slots
(_C_MAP, _C_ACNT, _C_BRK, _C_SEEN, _C_NPIX, _C_RG, _C_BA, _C_REF,
 _C_CUR) = range(9)


def _extract(x, r, l):
    """Scalar at fixed (r, l) of a vector value via positional reduction."""
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.max(jnp.where((row == r) & (lane == l), x, _INT_MIN))


def _shift_flat_left(x, k):
    """out[r,l] = x[flat r*128+l+k] over a (rows, L) buffer (k in 1..5).

    pltpu.roll requires non-negative shifts; roll(x, s)[i] = x[i-s], so a
    left shift by k is s = size - k."""
    rows = x.shape[0]
    a = pltpu.roll(x, _L - k, 1)
    b = pltpu.roll(a, rows - 1, 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane < _L - k, a, b)


def _lane_row_scan(vals, combine, identity, rows):
    """Inclusive in-tile scan over row-major (rows, L) values."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, _L), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (rows, _L), 0)
    x = vals
    k = 1
    while k < _L:
        sh = jnp.where(lane >= k, pltpu.roll(x, k, 1), identity)
        x = combine(sh, x)
        k *= 2
    agg = jnp.broadcast_to(x[:, _L - 1 : _L], (rows, _L))
    ex = jnp.where(row >= 1, pltpu.roll(agg, 1, 0), identity)
    k = 1
    while k < rows:
        sh = jnp.where(row >= k, pltpu.roll(ex, k, 0), identity)
        ex = combine(sh, ex)
        k *= 2
    return combine(ex, x)


def _compose_maps(left, right):
    out = jnp.zeros_like(left)
    for e in range(5):
        fe = (left >> (3 * e)) & 7
        he = (right >> (3 * fe)) & 7
        out = out | (he << (3 * e))
    return out


def _compose_scalar(left, right):
    out = 0
    for e in range(5):
        fe = (left >> (3 * e)) & 7
        he = (right >> (3 * fe)) & 7
        out = out | (he << (3 * e))
    return out


_M2 = 0x00FF00FF
_F2 = 0x01000100


def _seg_combine(l, r):
    sum_ = ((l & _M2) + (r & _M2)) & _M2
    rf0 = (r >> 8) & 1
    rf1 = (r >> 24) & 1
    ch0 = jnp.where(rf0 != 0, r & 0x000000FF, sum_ & 0x000000FF)
    ch1 = jnp.where(rf1 != 0, r & 0x00FF0000, sum_ & 0x00FF0000)
    return ch0 | ch1 | (l & _F2) | (r & _F2)


def _front_body(n_max, no_alpha, b, pos, clen, carry):
    """Shared front-end compute over one byte tile.

    b: (RH, L) int32 byte values (halo row included); pos: global byte
    positions; carry: SMEM scalar carries (updated in place). Returns
    (valid, pixoff, packed) over the full (RH, L) tile — callers slice
    the real _R rows."""
    row = jax.lax.broadcasted_iota(jnp.int32, (_RH, _L), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (_RH, _L), 1)

    b1 = _shift_flat_left(b, 1)
    b2 = _shift_flat_left(b, 2)
    b3 = _shift_flat_left(b, 3)
    b4 = _shift_flat_left(b, 4)

    is_luma = (b & spec.MASK_2) == spec.OP_LUMA
    is_rgb = b == spec.OP_RGB
    is_rgba = b == spec.OP_RGBA
    lens = (
        1 + jnp.where(is_luma, 1, 0)
        + jnp.where(is_rgb, 3, 0)
        + jnp.where(is_rgba, 4, 0)
    )

    # --- token automaton ----------------------------------------------------
    base_map = (0 << 3) | (1 << 6) | (2 << 9) | (3 << 12)
    eff_lens = jnp.where(pos >= spec.HEADER_SIZE + 1, lens, 1)
    maps = (eff_lens - 1) + base_map
    incl = _lane_row_scan(maps, _compose_maps, _IDENT_MAP, _RH)
    excl = jnp.where(
        lane >= 1, pltpu.roll(incl, 1, 1),
        jnp.where(row >= 1, pltpu.roll(pltpu.roll(incl, 1, 1), 1, 0),
                  _IDENT_MAP),
    )
    # excl[i] = composition of maps[0..i-1] within the tile: roll by one in
    # flat order (lane 0 takes previous row's lane 127)
    e0 = carry[_C_MAP] & 7
    state = (excl >> (3 * e0)) & 7
    token = (state == 0) & (pos >= spec.HEADER_SIZE + 1) & (pos < clen)

    tile_map = _extract(incl, _R - 1, _L - 1)  # composition over real tile
    carry[_C_MAP] = _compose_scalar(carry[_C_MAP], tile_map)

    if no_alpha:
        # fast front for alpha-less sources (header channels==3): the
        # encoder never emits ALPHA modifiers for them (va==0 always,
        # seqoia.h:616-618), so any alpha-range token means a foreign/
        # corrupt stream — flag it for the host fallback, like REF
        carry[_C_REF] = carry[_C_REF] | jnp.max(
            jnp.where(token & (b < spec.OP_LUMA) & (row < _R), 1, 0)
        )
        is_mod = jnp.zeros_like(token)
        is_op = token
    else:
        carry[_C_REF] = carry[_C_REF] | jnp.max(
            jnp.where(
                token & (b < spec.OP_ALPHA) & (row < _R), 1, 0
            )
        )

        # --- alpha modifier / run alternation --------------------------------
        alpha_tok = token & (b >= spec.OP_ALPHA) & (b < spec.OP_LUMA)
        op_tok = token & ~alpha_tok
        acnt_loc = _lane_row_scan(
            alpha_tok.astype(jnp.int32), lambda a, c: a + c, 0, _RH
        )
        acnt = acnt_loc + carry[_C_ACNT]
        # fill acnt at op positions (value scan with flags)
        fv, ff = acnt, op_tok.astype(jnp.int32)

        def fill2(vals, flags):
            v, f = vals, flags
            k = 1
            while k < _L:
                vs = jnp.where(lane >= k, pltpu.roll(v, k, 1), 0)
                fs = jnp.where(lane >= k, pltpu.roll(f, k, 1), 0)
                v = jnp.where(f != 0, v, vs)
                f = f | fs
                k *= 2
            va = jnp.broadcast_to(v[:, _L - 1 : _L], (_RH, _L))
            fa = jnp.broadcast_to(f[:, _L - 1 : _L], (_RH, _L))
            vp = jnp.where(row >= 1, pltpu.roll(va, 1, 0), 0)
            fp = jnp.where(row >= 1, pltpu.roll(fa, 1, 0), 0)
            k = 1
            while k < _RH:
                vs = jnp.where(row >= k, pltpu.roll(vp, k, 0), 0)
                fs = jnp.where(row >= k, pltpu.roll(fp, k, 0), 0)
                vp = jnp.where(fp != 0, vp, vs)
                fp = fp | fs
                k *= 2
            v_out = jnp.where(f != 0, v, vp)
            f_out = f | fp
            return v_out, f_out

        brk_loc, brk_f = fill2(fv, ff)
        brk = jnp.where(brk_f != 0, brk_loc, carry[_C_BRK])
        seen = (brk_f != 0) | (carry[_C_SEEN] != 0)
        alpha_idx = acnt - brk
        want = jnp.where(seen, 1, 0)
        is_mod = alpha_tok & ((alpha_idx & 1) == want)
        is_op = token & ~is_mod

        carry[_C_ACNT] = _extract(acnt, _R - 1, _L - 1)
        brk_end = _extract(
            jnp.where(brk_f != 0, brk_loc, _INT_MIN), _R - 1, _L - 1
        )
        seen_any = jnp.max(jnp.where(row < _R, brk_f, 0))
        carry[_C_BRK] = jnp.where(brk_end != _INT_MIN, brk_end, carry[_C_BRK])
        carry[_C_SEEN] = jnp.where(seen_any != 0, 1, carry[_C_SEEN])

    # --- pixel counts + offsets ----------------------------------------------
    run_px = (b & 0x3F) + 1
    npix = run_px
    npix = jnp.where(is_luma | is_rgb | is_rgba, 1, npix)
    npix = jnp.where(b == spec.OP_BIGRUN, spec.SQOA_MAXRUN, npix)
    npix = jnp.where(b < spec.OP_ALPHA, 1, npix)
    npix = jnp.where(is_op, npix, 0)
    pix_incl = _lane_row_scan(npix, lambda a, c: a + c, 0, _RH)
    pixoff = pix_incl - npix + carry[_C_NPIX]
    carry[_C_NPIX] = carry[_C_NPIX] + _extract(pix_incl, _R - 1, _L - 1)

    # --- channel elements -----------------------------------------------------
    vg = (b & 0x3F) - 32
    anchor_rgb = is_op & (is_rgb | is_rgba)
    anchor_a = is_op & is_rgba
    luma_op = is_op & is_luma
    r_el = jnp.where(anchor_rgb, b1, jnp.where(luma_op, vg - 8 + ((b1 >> 4) & 15), 0))
    g_el = jnp.where(anchor_rgb, b2, jnp.where(luma_op, vg, 0))
    b_el = jnp.where(anchor_rgb, b3, jnp.where(luma_op, vg - 8 + (b1 & 15), 0))
    a_el = jnp.where(anchor_a, b4, 0)
    if not no_alpha:
        mod_delta = jnp.where(is_mod, (b & 0x1F) - 16, 0)
        attached = jnp.zeros_like(b)
        for L in (1, 2, 4, 5):
            attached = attached + jnp.where(
                lens == L, _shift_flat_left(mod_delta, L), 0
            )
        a_el = a_el + jnp.where(is_op, attached, 0)

    def pack_pair(v0, f0, v1, f1):
        return (
            (v0 & 255) | (jnp.where(f0, 1, 0) << 8)
            | ((v1 & 255) << 16) | (jnp.where(f1, 1, 0) << 24)
        )

    rg = _lane_row_scan(
        pack_pair(r_el, anchor_rgb, g_el, anchor_rgb), _seg_combine, 0, _RH
    )
    ba = _lane_row_scan(
        pack_pair(b_el, anchor_rgb, a_el, anchor_a), _seg_combine, 0, _RH
    )
    rg = _seg_combine(jnp.full((_RH, _L), carry[_C_RG], jnp.int32), rg)
    ba = _seg_combine(jnp.full((_RH, _L), carry[_C_BA], jnp.int32), ba)
    carry[_C_RG] = _extract(rg, _R - 1, _L - 1)
    carry[_C_BA] = _extract(ba, _R - 1, _L - 1)

    r_v, g_v = rg & 255, (rg >> 16) & 255
    b_v, a_v = ba & 255, (ba >> 16) & 255
    a_flag = (ba >> 24) & 1
    a_v = jnp.where(a_flag == 1, a_v, (a_v + 255) & 255)
    packed = r_v | (g_v << 8) | (b_v << 16) | (a_v << 24)

    valid = is_op & (npix > 0) & (pixoff < n_max)
    return valid, pixoff, packed


def _load_tile(data_ref, dbuf, sem, bi, t):
    """DMA the tile's uint8 rows (+halo) and convert on-chip."""
    cp = pltpu.make_async_copy(
        data_ref.at[bi, pl.ds(t * _R, _RH + 7), :], dbuf, sem
    )
    cp.start()
    cp.wait()
    return dbuf[0:_RH, :].astype(jnp.int32)


def _front_compact_kernel(n_max, no_alpha, *refs):
    (data_ref, clen_ref, kout, pout, scal_ref,
     dbuf, ob0, ob1, crow, carry, sem, osem) = refs
    obufs = (ob0, ob1)

    bi = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        carry[_C_MAP] = _IDENT_MAP
        carry[_C_ACNT] = 0
        carry[_C_BRK] = 0
        carry[_C_SEEN] = 0
        carry[_C_NPIX] = 0
        carry[_C_RG] = 0
        carry[_C_BA] = 0
        carry[_C_REF] = 0
        carry[_C_CUR] = 0

    clen = clen_ref[bi]

    # tiles wholly past the stream carry no tokens: skip the DMA + compute
    # entirely (small images pad their byte buffers to the 32768 tile —
    # without the skip the padding dominates icon-class buckets)
    @pl.when(t * _TILE < clen)
    def _():
        b = _load_tile(data_ref, dbuf, sem, bi, t)
        row_h = jax.lax.broadcasted_iota(jnp.int32, (_RH, _L), 0)
        lane_h = jax.lax.broadcasted_iota(jnp.int32, (_RH, _L), 1)
        pos = (t * _R + row_h) * _L + lane_h

        valid, pixoff, packed = _front_body(
            n_max, no_alpha, b, pos, clen, carry
        )

        # --- in-kernel compaction + append (mirrors pallas_encode) ----------
        v = valid[0:_R].astype(jnp.int32)
        keys = pixoff[0:_R]
        pays = packed[0:_R]
        incl = ktools.lane_row_scan(v, lambda a, c: a + c, 0)
        n_here = ktools.extract(incl, _R - 1, _L - 1)
        flat = ktools.iota2((_R, _L), 0) * _L + ktools.iota2((_R, _L), 1)
        d = jnp.where(v != 0, flat - (incl - v), -1)
        d, srcs = ktools.butterfly_compact(d, [keys, pays], 15)

        sh = carry[_C_CUR] % _L
        row = ktools.iota2((_R, _L), 0)
        lane = ktools.iota2((_R, _L), 1)
        for i, (s, ob) in enumerate(zip(srcs, obufs)):
            rolled = ktools.flat_roll_right_dyn(s, sh)
            merged = jnp.where((row == 0) & (lane < sh), crow[i : i + 1, :],
                               rolled)
            ob[0:_R, :] = merged
            ob[_R : _R + 1, :] = rolled[0:1, :]  # wrap row

        cur_row = carry[_C_CUR] // _L
        cps = []
        for i, (ob, out) in enumerate(zip(obufs, (kout, pout))):
            cp = pltpu.make_async_copy(
                ob.at[pl.ds(0, _OBUF_ROWS), :],
                out.at[bi, pl.ds(cur_row, _OBUF_ROWS), :],
                osem.at[i],
            )
            cp.start()
            cps.append(cp)

        end = carry[_C_CUR] + n_here
        last_row_local = end // _L - cur_row
        for i, ob in enumerate(obufs):
            crow[i : i + 1, :] = ob[pl.ds(last_row_local, 1), :]
        for cp in cps:
            cp.wait()
        carry[_C_CUR] = end

    @pl.when(t == pl.num_programs(1) - 1)
    def _():
        lane8 = ktools.iota2((8, _L), 1)
        row8 = ktools.iota2((8, _L), 0)
        scal_ref[0] = jnp.where(
            (row8 == 0) & (lane8 == 0), carry[_C_CUR],
            jnp.where((row8 == 0) & (lane8 == 1), carry[_C_REF], 0),
        )


@functools.partial(jax.jit, static_argnames=("n_max", "no_alpha"))
def decode_front_compact(data, chunks_len, n_max, no_alpha=False):
    """Front-end fused with op-stream compaction (color non-compat).

    data: (B, M) uint8, M % 32768 == 0. Returns (keys (B, M+slack) int32 =
    compacted pixel offsets, [packed] compacted payload list, totals (B,),
    has_ref (B,)) — drop-in for pallas_engine.compact(frontend(...))."""
    b, m = data.shape
    t = m // _TILE
    rows_out = m // _L + _OBUF_ROWS
    d8 = data.reshape(b, m // _L, _L)
    d8 = jnp.pad(d8, ((0, 0), (0, _RH + 7), (0, 0)))

    kern = functools.partial(_front_compact_kernel, n_max, no_alpha)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    scal_spec = pl.BlockSpec(
        (1, 8, _L), lambda bi, ti: (bi, 0, 0), memory_space=pltpu.VMEM
    )
    shaped = lambda s: jax.ShapeDtypeStruct(s, jnp.int32)
    kout, pout, scal = pl.pallas_call(
        kern,
        grid=(b, t),
        in_specs=[any_spec, smem_spec],
        out_specs=[any_spec, any_spec, scal_spec],
        out_shape=[
            shaped((b, rows_out, _L)), shaped((b, rows_out, _L)),
            shaped((b, 8, _L)),
        ],
        scratch_shapes=[
            pltpu.VMEM((_RH + 7, _L), jnp.uint8),
            pltpu.VMEM((_OBUF_ROWS, _L), jnp.int32),
            pltpu.VMEM((_OBUF_ROWS, _L), jnp.int32),
            pltpu.VMEM((2, _L), jnp.int32),
            pltpu.SMEM((9,), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=_INTERPRET,
    )(d8, chunks_len)
    return (
        kout.reshape(b, rows_out * _L),
        [pout.reshape(b, rows_out * _L)],
        scal[:, 0, 0],
        scal[:, 0, 1],
    )
