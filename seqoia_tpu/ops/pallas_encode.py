"""Fused SQOA encode front-end: one Pallas pass from pixels to the
compacted emission stream.

The XLA front half of the encoder (change detection, run bookkeeping, op
classification, byte-offset prefix sum — encode_v2.py) runs as separate
scan/elementwise passes over pixel space, then a second kernel compacts
the emitting pixels. This kernel streams each 32768-pixel tile through
VMEM once and does all of it on-chip:

  prev-pixel shift (carry) → change/run segmentation (cummax of change
  positions + closed-form 61/512 chunking, seqoia.h:544-561) → delta
  classification (LUMA window / RGB fallback, seqoia.h:593-634) → byte
  offsets (prefix sum) → butterfly compaction of the emitting pixels →
  unpadded append to the global (offsets, cur, meta) stream.

The meta word packs the op class AND its wrapped deltas
(vg/vg_r/vg_b/va + alpha-changed — encode_v2._pack_meta), so the
predecessor pixel never leaves the kernel: one fewer stream through the
butterfly, the staging buffers, HBM, and the placement kernel.

Cross-tile state (prev pixel, last change index, byte cursor, append
cursor + partial row) lives in SMEM/VMEM scratch across the sequential
grid. Non-compat only (the compat hash-index resolution stays on the XLA
sort path); colch is static (3 = color, 1 = mono).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import spec
from . import ktools

_INTERPRET = os.environ.get("SEQOIA_PALLAS_INTERPRET", "") == "1"

_L = 128
_ROWS = 256
_TILE = _ROWS * _L
_OBUF_ROWS = _ROWS + 8

_INIT_PACKED = int(np.int32(np.uint32(255 << 24)))
_INT_MIN = -(2**31)

# op classes (3 bits in the meta word) — must match encode_v2
_CL_LUMA = 0
_CL_RGB = 1
_CL_MONO_GA = 2
_CL_NONE = 7

# carry slots (OSLOT/OPEND thread the deferred append DMA: OSLOT = the
# staging slot this step writes, OPEND = slot with a DMA in flight or -1)
_C_PREV, _C_LASTC, _C_OFF, _C_CURSOR, _C_OSLOT, _C_OPEND = range(6)


def _w8(x):
    return ((x + 128) & 255) - 128


def _front_kernel(colch, rows, *refs):
    _TILE = rows * _L
    _OBUF_ROWS = rows + 8
    (px_ref, nv_ref, ip_ref, lc0_ref, kout, p0out, p1out, scal_ref,
     ob0, ob1, ob2, crow, carry, sem) = refs
    obufs = (ob0, ob1, ob2)

    bi = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when((t == 0) & (bi == 0))
    def _():
        # the append staging slots cross images: init once
        carry[_C_OSLOT] = 0
        carry[_C_OPEND] = -1

    @pl.when(t == 0)
    def _():
        # init carries from the per-row boundary state: init_prev is the
        # pixel preceding this stream; lc0 = -(run_in+1) places a virtual
        # change anchor so a carried-in run's phase/pending arithmetic
        # (seg_len = gidx - 1 - anchor) comes out globally correct
        carry[_C_PREV] = ip_ref[bi]
        carry[_C_LASTC] = lc0_ref[bi]
        carry[_C_OFF] = 0
        carry[_C_CURSOR] = 0

    nv = nv_ref[bi]

    # tiles wholly past the image emit nothing: skip them (images pad their
    # pixel buffers to the 32768 tile; the padding otherwise costs full
    # front-end work on small images)
    @pl.when(t * _TILE < nv)
    def _():
        _front_tile_body(colch, refs, bi, t, nv, rows)

    @pl.when(t == pl.num_programs(1) - 1)
    def _():
        lane8 = ktools.iota2((8, _L), 1)
        row8 = ktools.iota2((8, _L), 0)
        v = jnp.where(
            (row8 == 0) & (lane8 == 0), carry[_C_CURSOR],
            jnp.where(
                (row8 == 0) & (lane8 == 1), carry[_C_OFF],
                jnp.where((row8 == 0) & (lane8 == 2), carry[_C_LASTC], 0),
            ),
        )
        scal_ref[0] = v

        # drain the in-flight append DMA at the end of the whole grid
        @pl.when((bi == pl.num_programs(0) - 1) & (carry[_C_OPEND] >= 0))
        def _():
            prev = carry[_C_OPEND]
            for i, (ob, out) in enumerate(
                    zip(obufs, (kout, p0out, p1out))):
                pltpu.make_async_copy(
                    ob.at[prev],
                    out.at[bi, pl.ds(0, _OBUF_ROWS), :],  # shape-only
                    sem.at[prev, i],
                ).wait()
            carry[_C_OPEND] = -1


def _front_tile_body(colch, refs, bi, t, nv, rows=_ROWS):
    (px_ref, nv_ref, ip_ref, lc0_ref, kout, p0out, p1out, scal_ref,
     ob0, ob1, ob2, crow, carry, sem) = refs
    obufs = (ob0, ob1, ob2)
    _ROWS = rows                 # shadow the module defaults: tile-relative
    _TILE = rows * _L
    _OBUF_ROWS = rows + 8
    nbits = max((_TILE - 1).bit_length(), 1)

    px = px_ref[0]  # (ROWS, L) int32 packed pixels
    flat = ktools.iota2((_ROWS, _L), 0) * _L + ktools.iota2((_ROWS, _L), 1)
    gidx = t * _TILE + flat
    valid = gidx < nv

    prev = ktools.flat_shift_right(px, 1, 0)
    prev = jnp.where(flat == 0, carry[_C_PREV], prev)

    same = (px == prev) & valid
    change = (~same) & valid

    # run segmentation: global cummax of change positions (carry folds in)
    lc = ktools.lane_row_scan(
        jnp.where(change, gidx, _INT_MIN), jnp.maximum, _INT_MIN
    )
    last_change = jnp.maximum(lc, carry[_C_LASTC])
    prev_change = ktools.flat_shift_right(last_change, 1, 0)
    prev_change = jnp.where(flat == 0, carry[_C_LASTC], prev_change)

    seg_len = gidx - 1 - prev_change
    pending = jnp.where(change, seg_len & (spec.SQOA_MAXRUN - 1), 0)
    # (pending-1)//61 via multiply-shift (exact for 0..511; integer division
    # by a non-power-of-2 is slow in-kernel): x//61 == (x*538)>>15
    flush_n = jnp.where(pending > 0, (((pending - 1) * 538) >> 15) + 1, 0)
    seg_pos = gidx - last_change
    bigrun = same & ((seg_pos & (spec.SQOA_MAXRUN - 1)) == 0)

    # delta classification (reference: seqoia.h:593-634)
    cr, cg = px & 255, (px >> 8) & 255
    cb, ca = (px >> 16) & 255, (px >> 24) & 255
    pr, pg = prev & 255, (prev >> 8) & 255
    pb, pa = (prev >> 16) & 255, (prev >> 24) & 255
    vg = _w8(cg - pg)
    va = _w8(ca - pa)
    if colch == 3:
        vg_r = _w8(_w8(cr - pr) - vg)
        vg_b = _w8(_w8(cb - pb) - vg)
        luma_ok = (
            (vg_r >= -8) & (vg_r <= 7) & (vg >= -32) & (vg <= 31)
            & (vg_b >= -8) & (vg_b <= 7) & (va >= -16) & (va <= 15)
        )
        cls = jnp.where(luma_ok, _CL_LUMA, _CL_RGB)
        op_len = jnp.where(luma_ok, 2, 4) + (va != 0).astype(jnp.int32)
    else:
        # mono keeps r=b=0, so the reference's shared LUMA guard
        # (seqoia.h:606-611) evaluates vg_r = vg_b = -vg: the effective
        # mono window is vg in [-7, 8], NOT the full +-32 vg range
        luma_ok = (vg >= -7) & (vg <= 8) & (va >= -16) & (va <= 15)
        alpha_changed = va != 0
        cls = jnp.where(
            alpha_changed, _CL_MONO_GA, jnp.where(luma_ok, _CL_LUMA, _CL_RGB)
        )
        op_len = jnp.where(
            alpha_changed, 3, jnp.where(luma_ok, 1, 2)
        )
        vg_r = vg_b = jnp.zeros_like(vg)

    total_len = jnp.where(change, flush_n + op_len, jnp.where(bigrun, 1, 0))
    cls = jnp.where(change, cls, _CL_NONE)
    meta = (
        pending | (cls << 9)
        | (((vg + 32) & 63) << 12) | (((vg_r + 8) & 15) << 18)
        | (((vg_b + 8) & 15) << 22) | (((va + 16) & 31) << 26)
        | ((va != 0).astype(jnp.int32) << 31)
    )

    # --- compact the emitting pixels + append at the exact cursor ----------
    # d's bits 0..14 are the move distance; bits 16..19 carry the entry's
    # emitted byte count (total_len <= 9 run bytes + 5 op bytes = 14)
    # THROUGH the butterfly. Byte offsets (the keys) come from one
    # post-network prefix sum over the compacted lengths — one fewer
    # payload riding all 15 stages, and no pixel-space offset scan.
    emit = (total_len > 0).astype(jnp.int32)
    incl = ktools.lane_row_scan(emit, lambda a, c: a + c, 0)
    n_here = ktools.extract(incl, _ROWS - 1, _L - 1)
    d = jnp.where(
        emit != 0, (flat - (incl - emit)) | (total_len << 16), ktools.HOLE
    )
    d, (px_c, meta_c) = ktools.butterfly_compact(d, [px, meta], nbits)
    tl_c = jnp.where(d >= 0, d >> 16, 0)
    off_incl = ktools.lane_row_scan(tl_c, lambda a, c: a + c, 0)
    offsets_c = off_incl - tl_c + carry[_C_OFF]
    srcs = [offsets_c, px_c, meta_c]

    # deferred append (same scheme as pallas_frontend): stage into this
    # step's slot, wait for the PREVIOUS step's append DMA (it ran behind
    # a full tile of compute), then launch this one and leave it in
    # flight — consecutive appends overlap in HBM on the partial row, so
    # the wait both hides the latency and orders the writes
    sh = carry[_C_CURSOR] % _L
    row = ktools.iota2((_ROWS, _L), 0)
    lane = ktools.iota2((_ROWS, _L), 1)
    oslot = carry[_C_OSLOT]
    end = carry[_C_CURSOR] + n_here
    cur_row = carry[_C_CURSOR] // _L
    last_row_local = end // _L - cur_row
    for i, (s, ob) in enumerate(zip(srcs, obufs)):
        rolled = ktools.flat_roll_right_dyn(s, sh)
        merged = jnp.where((row == 0) & (lane < sh), crow[i : i + 1, :], rolled)
        ob[oslot, 0:_ROWS, :] = merged
        ob[oslot, _ROWS : _ROWS + 1, :] = rolled[0:1, :]
        crow[i : i + 1, :] = ob[oslot, pl.ds(last_row_local, 1), :]

    @pl.when(carry[_C_OPEND] >= 0)
    def _():
        prev = carry[_C_OPEND]
        for i, (ob, out) in enumerate(zip(obufs, (kout, p0out, p1out))):
            pltpu.make_async_copy(
                ob.at[prev],
                out.at[bi, pl.ds(0, _OBUF_ROWS), :],  # shape-only
                sem.at[prev, i],
            ).wait()

    for i, (ob, out) in enumerate(zip(obufs, (kout, p0out, p1out))):
        pltpu.make_async_copy(
            ob.at[oslot],
            out.at[bi, pl.ds(cur_row, _OBUF_ROWS), :],
            sem.at[oslot, i],
        ).start()
    carry[_C_OPEND] = oslot
    carry[_C_OSLOT] = 1 - oslot
    carry[_C_CURSOR] = end
    carry[_C_OFF] = carry[_C_OFF] + ktools.extract(off_incl, _ROWS - 1, _L - 1)

    # prev-pixel / last-change carries for the next tile
    last_local = jnp.clip(nv - 1 - t * _TILE, 0, _TILE - 1)
    newprev = ktools.extract_flat(px, last_local)
    carry[_C_PREV] = jnp.where(nv - 1 < t * _TILE, carry[_C_PREV], newprev)
    carry[_C_LASTC] = ktools.extract(last_change, _ROWS - 1, _L - 1)


@functools.partial(jax.jit, static_argnames=("colch", "rows"))
def encode_front_compact(packed, n_valid, colch=3, init_prev=None, lc0=None,
                         rows=_ROWS):
    """Fused encode front-end + compaction for non-compat streams.

    packed: (B, N) int32 normalized pixels, N % (rows*128) == 0 (rows
    defaults to the full 256-row tile; small pow2 buffers pass a reduced
    tile height, mirroring pallas_frontend.decode_front_compact). The optional
    per-row boundary state makes each row a SHARD of a larger image:
    ``init_prev`` is the packed pixel preceding the row (default: the
    codec's initial state) and ``lc0 = -(run_in+1)`` encodes a carried-in
    run of run_in pixels as a virtual change anchor (default -1 = none).

    Returns (keys=byte offsets, [cur, meta] compacted streams (meta packs
    cls + wrapped deltas, encode_v2._pack_meta layout), entry_totals (B,),
    chunk_totals (B,), last_change (B,)).
    """
    b, n = packed.shape
    _TILE = rows * _L
    _OBUF_ROWS = rows + 8
    if init_prev is None:
        init_prev = jnp.full((b,), _INIT_PACKED, jnp.int32)
    if lc0 is None:
        lc0 = jnp.full((b,), -1, jnp.int32)
    t = n // _TILE
    # +16 rows of slack beyond the staging buffer: keeps place_emit's
    # entry_limit pad a NO-OP (see pallas_frontend.decode_front_compact —
    # the pad otherwise copies the whole keys+payload arrays every call)
    rows_out = n // _L + _OBUF_ROWS + 16
    kern = functools.partial(_front_kernel, colch, rows)
    in_spec = pl.BlockSpec(
        (1, rows, _L), lambda bi, ti: (bi, ti, 0), memory_space=pltpu.VMEM
    )
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    scal_spec = pl.BlockSpec(
        (1, 8, _L), lambda bi, ti: (bi, 0, 0), memory_space=pltpu.VMEM
    )
    shaped = lambda s: jax.ShapeDtypeStruct(s, jnp.int32)
    outs = pl.pallas_call(
        kern,
        grid=(b, t),
        in_specs=[in_spec, smem, smem, smem],
        out_specs=[any_spec] * 3 + [scal_spec],
        out_shape=[shaped((b, rows_out, _L))] * 3 + [shaped((b, 8, _L))],
        scratch_shapes=(
            [pltpu.VMEM((2, _OBUF_ROWS, _L), jnp.int32)] * 3
            + [
                pltpu.VMEM((3, _L), jnp.int32),
                pltpu.SMEM((6,), jnp.int32),
                pltpu.SemaphoreType.DMA((2, 3)),
            ]
        ),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=_INTERPRET,
    )(packed.reshape(b, t * rows, _L), n_valid, init_prev, lc0)
    keys = outs[0].reshape(b, rows_out * _L)
    pays = [o.reshape(b, rows_out * _L) for o in outs[1:3]]
    scal = outs[3]
    return (
        keys, pays, scal[:, 0, 0], scal[:, 0, 1], scal[:, 0, 2]
    )
