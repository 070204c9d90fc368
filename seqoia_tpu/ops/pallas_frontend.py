"""Fused SQOA decode front-end: one Pallas pass from bytes to tokens.

The unfused front-end (decode_v2 stages 1-4) runs ~6 separate scans plus
~70 elementwise passes over the byte arrays — every one a round trip
through HBM. This kernel streams each byte tile through VMEM once and
computes everything on-chip:

  token automaton (map composition; in alpha-capable mode each op's
  length absorbs a following alpha-modifier byte, so the round-2
  alternation scans disappear) → pixel counts + offsets (prefix sum) →
  channel elements → one segmented SWAR modular sum over all four
  channels → packed RGBA + token validity,

with scalar carries in SMEM threading the cross-tile state. Shifted
operand views come from a one-row halo so every shift stays on-chip.

``decode_front_compact`` additionally runs the butterfly compaction
*inside the kernel* (mirroring pallas_encode's fused encode front) and
appends the surviving ops to a dense output stream at an exact cursor.
The byte stream is ingested as uint8 directly (in-kernel convert).

Covers the non-compat modes — ``mode`` selects the stream class:
``"alpha"`` (color source with alpha), ``"noalpha"`` (color, header
channels==3), ``"mono"`` (1/2-channel gray: LUMA is 1 byte, RGB 2,
RGBA 3, and there is NO alpha peek — the reference gates it on
``col_channels == 3``, seqoia.h:777-783). Compat streams use the
fixpoint/unfused paths. Reference semantics: seqoia.h:722-806 — note
the dispatch's final ``else {run = b1 & 0x3f}`` makes *any* unmatched
byte (including alpha-range bytes fetched as ops) a run, and the alpha
peek consumes exactly one modifier byte after every op.
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
_R = 256                 # default output rows per tile (see `rows` param)

_INT_MIN = -(2**31)

# token automata: 4 states (skip 0-3) without modifier absorption, 6 states
# (skip 0-5) when op lengths absorb a trailing alpha-modifier byte.
#
# The alpha-less automaton uses a bit-packed 4x4 boolean transition matrix
# (bit 4r+c = state r maps to c): composition is four multiply-spread
# steps (column mask * row bits — disjoint 4-bit groups), cheaper per scan
# stage than the base-8 digit walk. Four states suffice because a
# 3-channel SQOA stream never contains OP_RGBA (the encoder emits RGBA
# only when alpha changes, seqoia.h:616-634, and alpha-less sources have
# va == 0 everywhere): token lengths are {1, 2, 4}, and any RGBA byte that
# does parse as a token start flags the stream foreign (host fallback),
# same as alpha-range tokens. 6 states need 36 matrix bits, so the
# alpha-capable automaton keeps the 3-bit-digit encoding.
_IDENT6 = sum(e << (3 * e) for e in range(6))
_BASE6 = sum((e - 1) << (3 * e) for e in range(1, 6))
_IDENT4M = sum(1 << (4 * r + r) for r in range(4))
_BASE4M = sum(1 << (4 * r + (r - 1)) for r in range(1, 4))
_COL4 = sum(1 << (4 * r) for r in range(4))  # 0x1111

# SWAR byte-lane arithmetic over packed r|g<<8|b<<16|a<<24
_SWAR_LO = 0x7F7F7F7F
_SWAR_HI = -0x7F7F7F80   # int32 bit pattern 0x80808080
_M_RGB = 0x00FFFFFF
_M_A = -16777216         # int32 bit pattern 0xFF000000

# carry slots (PF/SLOT thread the double-buffered input DMA: PF = global
# step index whose tile is already in flight, SLOT = its buffer slot)
(_C_MAP, _C_NPIX, _C_VAL, _C_FLG, _C_REF, _C_CUR, _C_PF, _C_SLOT,
 _C_OSLOT, _C_OPEND) = range(10)


def _extract(x, r, l):
    return ktools.extract(x, r, l)


def _shift_flat_left(x, k):
    """out[r,l] = x[flat r*128+l+k] over a (rows, L) buffer (k in 1..5).

    pltpu.roll requires non-negative shifts; roll(x, s)[i] = x[i-s], so a
    left shift by k is s = size - k."""
    rows = x.shape[0]
    a = pltpu.roll(x, _L - k, 1)
    b = pltpu.roll(a, rows - 1, 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane < _L - k, a, b)


def _compose_maps(left, right, ns):
    out = jnp.zeros_like(left)
    for e in range(ns):
        fe = (left >> (3 * e)) & 7
        he = (right >> (3 * fe)) & 7
        out = out | (he << (3 * e))
    return out


def _compose_scalar(left, right, ns):
    out = 0
    for e in range(ns):
        fe = (left >> (3 * e)) & 7
        he = (right >> (3 * fe)) & 7
        out = out | (he << (3 * e))
    return out


def _compose_mat4(left, right):
    """Boolean 4x4 matrix product C[r,c] = OR_m L[r,m] & R[m,c].

    Each map is a function, so column masks have one bit per row group;
    (column-m bits at positions 4r) * (row m of R, 4 bits) spreads R's
    row into disjoint 4-bit groups — no carries, OR accumulates."""
    out = left * 0
    for m in range(4):
        out = out | (((left >> m) & _COL4) * ((right >> (4 * m)) & 15))
    return out


def _swar_add(a, b):
    """Per-byte mod-256 add of packed 4x8-bit lanes (no cross-lane carry)."""
    return ((a & _SWAR_LO) + (b & _SWAR_LO)) ^ ((a ^ b) & _SWAR_HI)


def _chan_combine(ls, rs):
    """Segmented per-byte modular sum over (value, flags) pairs.

    flags bit 0: rgb bytes are absolute (RGB/RGBA anchor resets r,g,b);
    flags bit 1: a byte is absolute (RGBA anchor resets a). Bits 2+ carry
    an ordinary prefix COUNT (seeded with the op mask), so the compaction
    rank rides this scan instead of running its own — the adds can't carry
    into the flag bits because both low bits are masked off first."""
    lv, lf = ls
    rv, rf = rs
    s = _swar_add(lv, rv)
    m = (rf & 1) * _M_RGB | ((rf >> 1) & 1) * _M_A
    return [(rv & m) | (s & ~m), ((lf | rf) & 3) | ((lf & ~3) + (rf & ~3))]


def _front_body(mode, b, pos, clen, carry, rows=_R, seg=None, seg_px=None,
                clen_map=None):
    """Shared front-end compute over one byte tile.

    mode: "alpha" | "noalpha" | "mono" (see module docstring).
    b: (rows+1, L) int32 byte values (halo row included); pos: global byte
    positions over (rows, L); carry: SMEM scalar carries (updated in
    place). Shifted views are built on the halo'd tile, then everything is
    sliced to the real (rows, L) rows BEFORE the scans (the halo row would
    force an extra full-width row-phase stage in every scan). Returns
    (is_op, npix, packed, op_rank_incl) as (rows, L) arrays.
    Pixel offsets are NOT computed here:
    the fused kernel routes npix through the compaction butterfly (packed
    into d's high bits) and prefix-sums the compacted npix instead, which
    drops both a full pixel-space scan and a butterfly payload.

    Segment-packed mode (``seg``/``seg_px``/``clen_map`` set): each row
    carries many small images, one per ``seg``-byte segment, each decoding
    to exactly ``seg_px`` pixels — the per-image fixed cost (one grid
    step per image each in front and placement) amortizes over
    TILE/seg images per step, which is what lifts icon-class decode off
    its per-image floor. Every scan restarts at segment boundaries: the
    token automaton composes a reset map (all states -> 0) at each
    segment's first byte, the channel scan takes an injected absolute
    anchor (r=g=b=0, a=255 — the reference's initial state,
    seqoia.h:520-525,716-719) there, and pixel offsets come from a
    segmented in-tile prefix sum. Returns (valid, npix, packed,
    valid_rank_incl, keys) — keys are GLOBAL pixel offsets
    (segment_index * seg_px + in-segment offset), and ops whose offset
    would spill past seg_px are invalid (a per-segment suffix: the
    reference decoder never fetches ops past its pixel count either,
    seqoia.h:722-726)."""
    mono = mode == "mono"
    no_alpha = mode == "noalpha"
    use_mat = mode != "alpha"
    _R = rows  # shadow the module default: slices below are tile-relative
    row = jax.lax.broadcasted_iota(jnp.int32, (_R, _L), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (_R, _L), 1)
    pos_seg = pos & (seg - 1) if seg is not None else pos

    b1 = _shift_flat_left(b, 1)
    b2 = _shift_flat_left(b, 2)
    if not mono:
        b3 = _shift_flat_left(b, 3)
        if not no_alpha:
            b4 = _shift_flat_left(b, 4)

    is_luma = (b & spec.MASK_2) == spec.OP_LUMA
    is_rgb = b == spec.OP_RGB
    is_rgba = b == spec.OP_RGBA

    # --- token automaton ----------------------------------------------------
    # Alpha-capable mode: fold the reference's one-byte alpha peek
    # (seqoia.h:777-783) into the token length — an op whose following byte
    # is alpha-range absorbs it, so alpha modifiers are exactly the
    # alpha-range bytes that are NOT token starts. This replaces round 2's
    # alternation machinery (alpha-count scan + segmented fill).
    if mono:
        # mono grammar (col_channels == 1, seqoia.h:740-775): LUMA is the
        # 1-byte `g += vg` form, RGB carries one gray byte, RGBA gray +
        # alpha; there is no alpha peek (gated on col_channels == 3,
        # seqoia.h:777-779), and alpha-range bytes fetched as ops are runs
        # like any other unmatched byte. Lengths {1, 2, 3} fit the 4-state
        # matrix automaton.
        lens2 = 1 + jnp.where(is_rgb, 1, 0) + jnp.where(is_rgba, 2, 0)
    elif no_alpha:
        # RGBA is foreign here (see automaton comment): treat it as len 1
        # so lengths stay in {1, 2, 4} and the matrix needs only 4 states.
        # The stream's output is discarded anyway (host fallback) — only
        # the foreign DETECTION must be sound, and the automaton parses
        # correctly up to and including the first RGBA token.
        lens2 = 1 + jnp.where(is_luma, 1, 0) + jnp.where(is_rgb, 3, 0)
    else:
        lens = (
            1 + jnp.where(is_luma, 1, 0)
            + jnp.where(is_rgb, 3, 0)
            + jnp.where(is_rgba, 4, 0)
        )
        isalpha = (b >= spec.OP_ALPHA) & (b < spec.OP_LUMA)
        # one shift chain serves both the length extension (bit 0) and the
        # absorbed modifier's delta (bits 8-12, biased +16)
        combo = jnp.where(isalpha, 1 | ((b & 0x1F) << 8), 0)
        ext = jnp.zeros_like(b)
        att = jnp.zeros_like(b)
        for k in (1, 2, 4, 5):
            ck = jnp.where(lens == k, _shift_flat_left(combo, k), 0)
            ext = ext + (ck & 1)
            att = att + (ck & 1) * (((ck >> 8) & 31) - 16)
        lens2 = lens + ext
    eff_lens = jnp.where(pos_seg >= spec.HEADER_SIZE + 1, lens2[0:_R], 1)
    if use_mat:
        maps = _BASE4M | (1 << (eff_lens - 1))
        comp, ident = _compose_mat4, _IDENT4M
        if seg is not None:  # segment start: reset map, all states -> 0
            maps = jnp.where(pos_seg == 0, _COL4, maps)
    else:
        maps = (eff_lens - 1) + _BASE6
        comp = functools.partial(_compose_maps, ns=6)
        ident = _IDENT6
        if seg is not None:  # reset map: every 3-bit digit = 0
            maps = jnp.where(pos_seg == 0, 0, maps)
    incl = ktools.lane_row_scan(maps, comp, ident)
    # excl[i] = composition of maps[0..i-1] within the tile: roll by one in
    # flat order (lane 0 takes previous row's lane 127)
    excl = jnp.where(
        lane >= 1, pltpu.roll(incl, 1, 1),
        jnp.where(row >= 1, pltpu.roll(pltpu.roll(incl, 1, 1), 1, 0),
                  ident),
    )
    cm = carry[_C_MAP]
    if use_mat:
        # entry state = the set bit's index in the carried matrix's row 0
        row0 = cm & 15
        e0 = (
            ((row0 >> 1) & 1) + ((row0 >> 2) & 1) * 2
            + ((row0 >> 3) & 1) * 3
        )
        token = ((excl >> (4 * e0)) & 1) == 1
    else:
        e0 = cm & 7
        token = ((excl >> (3 * e0)) & 7) == 0
    if seg is not None:
        token = token & (pos_seg >= spec.HEADER_SIZE + 1) & (
            pos_seg < clen_map)
    else:
        token = token & (pos >= spec.HEADER_SIZE + 1) & (pos < clen)

    tile_map = _extract(incl, _R - 1, _L - 1)  # composition over real tile
    if use_mat:
        carry[_C_MAP] = _compose_mat4(cm, tile_map)
    else:
        carry[_C_MAP] = _compose_scalar(cm, tile_map, 6)

    # foreign-stream flag: REF range always; in alpha-less sources (header
    # channels==3) the encoder never emits ALPHA modifiers (va==0 always,
    # seqoia.h:616-618) nor RGBA ops, so any alpha-range or RGBA token
    # flags too (the 4-state automaton mis-lengths RGBA past this point).
    # Mono: only REF is foreign (alpha-range ops are legal runs, RGBA is a
    # legal 3-byte op).
    if no_alpha:
        foreign = (b < spec.OP_LUMA) | is_rgba
    else:
        foreign = b < spec.OP_ALPHA
    carry[_C_REF] = carry[_C_REF] | jnp.max(
        jnp.where(token & foreign[0:_R], 1, 0)
    )
    is_op = token

    # --- pixel counts (offsets are prefix-summed post-compaction) -----------
    # any unmatched byte is a run of (b&0x3f)+1 (the dispatch's final else,
    # seqoia.h:773-775) — including alpha-range bytes fetched as ops
    npix = (b & 0x3F) + 1
    npix = jnp.where(is_luma | is_rgb | is_rgba, 1, npix)
    npix = jnp.where(b == spec.OP_BIGRUN, spec.SQOA_MAXRUN, npix)
    npix = jnp.where(b < spec.OP_ALPHA, 1, npix)[0:_R]  # REF: falls back

    keys = None
    if seg is not None:
        # segmented in-tile pixel offsets: one prefix sum of npix that
        # restarts at each segment's first byte (flag bit 23 marks the
        # restart; per-segment sums stay < 2^23, so the flag can't be
        # carried into). Ops spilling past seg_px form a per-segment
        # suffix (offsets are monotone) and drop from the compaction.
        M23 = (1 << 23) - 1
        npix_op = jnp.where(is_op, npix, 0)
        elem = npix_op | jnp.where(pos_seg == 0, 1 << 23, 0)

        def _seg_sum(a, c):
            s = ((a & M23) + (c & M23)) | (a & ~M23)
            return jnp.where((c >> 23) != 0, c, s)

        incl_n = ktools.lane_row_scan(elem, _seg_sum, 0)
        excl = (incl_n & M23) - npix_op
        valid = is_op & (excl < seg_px)
        log2seg = (seg - 1).bit_length()
        keys = (pos >> log2seg) * seg_px + excl
        is_op = valid  # the rank/count below must cover valid ops only

    # --- channel elements -----------------------------------------------------
    vg = (b & 0x3F)[0:_R] - 32
    anchor_rgb = is_op & (is_rgb | is_rgba)[0:_R]
    if no_alpha:
        anchor_a = jnp.zeros_like(anchor_rgb)
    else:
        anchor_a = is_op & is_rgba[0:_R]
    luma_op = is_op & is_luma[0:_R]
    if mono:
        # the gray channel rides SWAR byte lane 0 (reset by flag bit 0,
        # same as color r); alpha rides lane 3. Operands: RGB = (tag, g),
        # RGBA = (tag, g, a), LUMA applies vg to gray (seqoia.h:740-769).
        b1, b2 = b1[0:_R], b2[0:_R]
        r_el = jnp.where(anchor_rgb, b1, jnp.where(luma_op, vg, 0))
        g_el = jnp.zeros_like(r_el)
        b_el = g_el
        a_el = jnp.where(anchor_a, b2, 0)
    else:
        b1, b2, b3 = b1[0:_R], b2[0:_R], b3[0:_R]
        r_el = jnp.where(
            anchor_rgb, b1, jnp.where(luma_op, vg - 8 + ((b1 >> 4) & 15), 0)
        )
        g_el = jnp.where(anchor_rgb, b2, jnp.where(luma_op, vg, 0))
        b_el = jnp.where(
            anchor_rgb, b3, jnp.where(luma_op, vg - 8 + (b1 & 15), 0)
        )
        if no_alpha:
            # alpha-less sources never anchor alpha: an RGBA token is
            # foreign (host fallback, output discarded), so the b4 shift
            # chain and the alpha anchor lane drop entirely — alpha stays
            # at its 255 initial state (seqoia.h:716-719)
            a_el = jnp.zeros_like(r_el)
        else:
            a_el = jnp.where(anchor_a, b4[0:_R], 0)
    if mode == "alpha":
        # each op's absorbed modifier sits lens bytes after the op start:
        # `att` (from the combo shift chain above) carries its delta
        a_el = a_el + jnp.where(is_op, att[0:_R], 0)

    # one segmented SWAR scan over all four channels (round 2 ran two
    # 16-bit-packed pair scans); the flag word's bits 2+ double as the
    # op-rank prefix count for the compaction butterfly
    val = (
        (r_el & 255) | ((g_el & 255) << 8)
        | ((b_el & 255) << 16) | ((a_el & 255) << 24)
    )
    flg = (
        anchor_rgb.astype(jnp.int32) | (anchor_a.astype(jnp.int32) << 1)
        | (is_op.astype(jnp.int32) << 2)
    )
    if seg is not None:
        # injected absolute anchor at each segment's first byte: r=g=b=0,
        # a=255 with both reset flags — the decoder's initial state
        # (seqoia.h:520-525,716-719); count bits stay 0 (not an op)
        val = jnp.where(pos_seg == 0, _M_A, val)
        flg = jnp.where(pos_seg == 0, 3, flg)
    sv, sf = ktools.lane_row_scan_multi([val, flg], _chan_combine, [0, 0])
    cv = jnp.full((_R, _L), carry[_C_VAL], jnp.int32)
    cf = jnp.full((_R, _L), carry[_C_FLG], jnp.int32)
    sv, sf = _chan_combine([cv, cf], [sv, sf])
    carry[_C_VAL] = _extract(sv, _R - 1, _L - 1)
    carry[_C_FLG] = _extract(sf, _R - 1, _L - 1) & 3

    a_v = (sv >> 24) & 255
    # alpha starts at 255 until the first RGBA anchor (seqoia.h:716-719)
    a_v = jnp.where(((sf >> 1) & 1) == 1, a_v, (a_v + 255) & 255)
    packed = (sv & _M_RGB) | (a_v << 24)

    return is_op, npix, packed, sf >> 2, keys


def _tile_dma(data_ref, dbuf, sem, bi, t, slot, rows):
    return pltpu.make_async_copy(
        data_ref.at[bi, pl.ds(t * rows, rows + 8), :], dbuf.at[slot],
        sem.at[slot],
    )


def _load_tile(data_ref, clen_ref, dbuf, sem, bi, t, carry, rows,
               packed_rows=False):
    """Double-buffered tile load: wait for this tile's in-flight DMA
    (started by the previous real grid step), start the next real tile's
    DMA into the other slot, then hand back this tile's bytes as int32.

    The prefetch chain follows *real* tiles only (tiles wholly past a
    stream are skipped): the next real tile after (bi, t) is (bi, t+1)
    while that is inside the stream, else (bi+1, 0) — tile 0 of every
    stream is real (headers guarantee clen > 0). Segment-packed rows
    (``packed_rows``) are dense with images, so every tile is real."""
    t_n = pl.num_programs(1)
    s = bi * t_n + t

    mine = carry[_C_SLOT]

    @pl.when(carry[_C_PF] != s)  # predecessor didn't prefetch (first tile)
    def _():
        _tile_dma(data_ref, dbuf, sem, bi, t, mine, rows).start()

    if packed_rows:
        nxt_same = t + 1 < t_n
    else:
        nxt_same = jnp.logical_and(
            t + 1 < t_n, (t + 1) * rows * _L < clen_ref[bi]
        )
    bn = jnp.where(nxt_same, bi, bi + 1)
    tn = jnp.where(nxt_same, t, -1) + 1
    other = 1 - mine

    @pl.when(bn < pl.num_programs(0))
    def _():
        _tile_dma(data_ref, dbuf, sem, bn, tn, other, rows).start()

    carry[_C_PF] = bn * t_n + tn
    carry[_C_SLOT] = other

    pltpu.make_async_copy(
        data_ref.at[bi, pl.ds(t * rows, rows + 8), :], dbuf.at[mine],
        sem.at[mine],
    ).wait()
    return dbuf[mine, 0 : rows + 1, :].astype(jnp.int32)


def _front_compact_kernel(n_max, mode, rows, seg, seg_px, *refs):
    (data_ref, clen_ref, kout, pout, scal_ref,
     dbuf, ob0, ob1, crow, carry, sem, osem) = refs
    obufs = (ob0, ob1)
    _R = rows                              # tile geometry (256 or 512)
    _TILE = rows * _L
    _OBUF_ROWS = rows + 8
    nbits = max((_TILE - 1).bit_length(), 1)

    bi = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when((t == 0) & (bi == 0))
    def _():
        # the input-DMA prefetch chain and the append staging slots cross
        # images: init once
        carry[_C_PF] = -1
        carry[_C_SLOT] = 0
        carry[_C_OSLOT] = 0
        carry[_C_OPEND] = -1

    @pl.when(t == 0)
    def _():
        carry[_C_MAP] = _IDENT6 if mode == "alpha" else _IDENT4M
        carry[_C_NPIX] = 0
        carry[_C_VAL] = 0
        carry[_C_FLG] = 0
        carry[_C_REF] = 0
        carry[_C_CUR] = 0

    if seg is None:
        clen = clen_ref[bi]
        clen_map = None
    else:
        # segment-packed row: every tile is dense with images; per-segment
        # stream lengths come from the (B, n_seg) clens array
        clen = jnp.int32(2**30)
        n_seg_tile = _TILE // seg
        seg_rows = seg // _L
        row_r0 = jax.lax.broadcasted_iota(jnp.int32, (_R, _L), 0)
        clen_map = jnp.zeros((_R, _L), jnp.int32)
        for s in range(n_seg_tile):
            c = clen_ref[bi, t * n_seg_tile + s]
            clen_map = jnp.where(
                (row_r0 >= s * seg_rows) & (row_r0 < (s + 1) * seg_rows),
                c, clen_map)

    # tiles wholly past the stream carry no tokens: skip the DMA + compute
    # entirely (small images pad their byte buffers to the 32768 tile —
    # without the skip the padding dominates icon-class buckets)
    @pl.when(t * _TILE < clen)
    def _():
        b = _load_tile(data_ref, clen_ref, dbuf, sem, bi, t, carry, rows,
                       packed_rows=seg is not None)
        row_r = jax.lax.broadcasted_iota(jnp.int32, (_R, _L), 0)
        lane_r = jax.lax.broadcasted_iota(jnp.int32, (_R, _L), 1)
        pos = (t * _R + row_r) * _L + lane_r

        is_op, npix, packed, opcnt, keys = _front_body(
            mode, b, pos, clen, carry, rows, seg=seg, seg_px=seg_px,
            clen_map=clen_map,
        )

        # --- in-kernel compaction + append (mirrors pallas_encode) ----------
        # d's low `nbits` bits are the move distance (<= 15 at 256-row
        # tiles, 16 at 512); bits 16..25 carry the op's
        # pixel count THROUGH the butterfly (npix <= SQOA_MAXRUN = 512).
        # Pixel offsets (the keys) are recomputed from the compacted npix
        # by one post-network prefix sum — one fewer payload riding all 15
        # stages, and no pixel-space offset scan at all. The rank comes
        # from the channel scan's count field (opcnt), not its own scan.
        # (Segment-packed mode: keys are already global — computed by the
        # segmented in-tile prefix — so they ride the butterfly as a
        # payload instead.)
        v = is_op.astype(jnp.int32)
        incl = opcnt
        flat = ktools.iota2((_R, _L), 0) * _L + ktools.iota2((_R, _L), 1)
        if seg is None:
            d = jnp.where(
                v != 0, (flat - (incl - v)) | (npix << 16), ktools.HOLE
            )
            d, (pays_c,) = ktools.butterfly_compact(d, [packed], nbits)
            npix_c = jnp.where(d >= 0, d >> 16, 0)
            pix_incl = ktools.lane_row_scan(npix_c, lambda a, c: a + c, 0)
            keys_c = pix_incl - npix_c + carry[_C_NPIX]
            carry[_C_NPIX] = carry[_C_NPIX] + ktools.extract(
                pix_incl, _R - 1, _L - 1
            )
            # ops whose pixels start past the cap form a suffix (offsets
            # are monotone): advance the cursor past the in-range prefix
            n_here = jnp.max(
                jnp.where((d >= 0) & (keys_c < n_max), flat + 1, 0)
            )
        else:
            d = jnp.where(v != 0, flat - (incl - v), ktools.HOLE)
            d, (keys_c, pays_c) = ktools.butterfly_compact(
                d, [keys, packed], nbits)
            n_here = jnp.max(jnp.where(d >= 0, flat + 1, 0))
        srcs = [keys_c, pays_c]

        # --- deferred append: stage into this step's slot, wait for the
        # PREVIOUS step's append DMA (usually long done — it ran behind a
        # full tile of compute), then launch this one and leave it in
        # flight. Consecutive appends overlap in HBM on the partial row,
        # so at most one append DMA is ever in flight (the wait orders
        # them); the double-buffered staging is what lets the wait move
        # behind the compute instead of stalling right after the start.
        sh = carry[_C_CUR] % _L
        row = ktools.iota2((_R, _L), 0)
        lane = ktools.iota2((_R, _L), 1)
        oslot = carry[_C_OSLOT]
        end = carry[_C_CUR] + n_here
        cur_row = carry[_C_CUR] // _L
        last_row_local = end // _L - cur_row
        for i, (s, ob) in enumerate(zip(srcs, obufs)):
            rolled = ktools.flat_roll_right_dyn(s, sh)
            merged = jnp.where((row == 0) & (lane < sh), crow[i : i + 1, :],
                               rolled)
            ob[oslot, 0:_R, :] = merged
            ob[oslot, _R : _R + 1, :] = rolled[0:1, :]  # wrap row
            crow[i : i + 1, :] = ob[oslot, pl.ds(last_row_local, 1), :]

        @pl.when(carry[_C_OPEND] >= 0)
        def _():
            prev = carry[_C_OPEND]
            for i, (ob, out) in enumerate(zip(obufs, (kout, pout))):
                pltpu.make_async_copy(
                    ob.at[prev],
                    out.at[bi, pl.ds(0, _OBUF_ROWS), :],  # shape-only
                    osem.at[prev, i],
                ).wait()

        for i, (ob, out) in enumerate(zip(obufs, (kout, pout))):
            pltpu.make_async_copy(
                ob.at[oslot],
                out.at[bi, pl.ds(cur_row, _OBUF_ROWS), :],
                osem.at[oslot, i],
            ).start()
        carry[_C_OPEND] = oslot
        carry[_C_OSLOT] = 1 - oslot
        carry[_C_CUR] = end

    @pl.when(t == pl.num_programs(1) - 1)
    def _():
        lane8 = ktools.iota2((8, _L), 1)
        row8 = ktools.iota2((8, _L), 0)
        scal_ref[0] = jnp.where(
            (row8 == 0) & (lane8 == 0), carry[_C_CUR],
            jnp.where((row8 == 0) & (lane8 == 1), carry[_C_REF], 0),
        )

        # drain the in-flight append DMA at the end of the whole grid
        @pl.when((bi == pl.num_programs(0) - 1) & (carry[_C_OPEND] >= 0))
        def _():
            prev = carry[_C_OPEND]
            for i, (ob, out) in enumerate(zip(obufs, (kout, pout))):
                pltpu.make_async_copy(
                    ob.at[prev],
                    out.at[bi, pl.ds(0, _OBUF_ROWS), :],  # shape-only
                    osem.at[prev, i],
                ).wait()
            carry[_C_OPEND] = -1


@functools.partial(
    jax.jit, static_argnames=("n_max", "mode", "rows", "seg", "seg_px")
)
def decode_front_compact(data, chunks_len, n_max, mode="alpha", rows=_R,
                         seg=None, seg_px=None):
    """Front-end fused with op-stream compaction (non-compat).

    mode: "alpha" | "noalpha" (color) | "mono" (1/2-channel gray; packed
    payload carries gray in byte 0 and alpha in byte 3).
    rows: byte-tile height (256 or 512): 512 halves the per-tile fixed
    costs (append staging + DMA, carries, halo) at one extra stage in
    each in-tile scan/butterfly — worth it for multi-tile streams.
    data: (B, M) uint8, M % (rows*128) == 0. Returns (keys (B, M+slack)
    int32 = compacted pixel offsets, [packed] compacted payload list,
    totals (B,), has_ref (B,)) — drop-in for
    pallas_engine.compact(frontend(...)).

    Segment-packed mode (``seg``, ``seg_px``): each row carries M/seg
    images, image j occupying bytes [j*seg, (j+1)*seg) (header included,
    zero-padded) and decoding to exactly seg_px pixels; keys come out
    GLOBAL (j*seg_px + offset), so the placement engine consumes the
    row as one n_max = (M/seg)*seg_px pixel stream. ``chunks_len`` is
    then (B, M/seg) SEGMENT-RELATIVE stream lengths (len - padding).
    ``has_ref`` stays per ROW — one foreign/REF image sends the whole
    packed row to the fallback."""
    assert mode in ("alpha", "noalpha", "mono"), mode
    b, m = data.shape
    _TILE = rows * _L
    _OBUF_ROWS = rows + 8
    t = m // _TILE
    # slack past the last possible entry covers one full placement window
    # (win_rows*128 = (rows+16)*128 at p_out = TILE): +16 rows beyond the
    # staging buffer keeps place_emit's entry_limit pad a NO-OP — the pad
    # otherwise copies the whole keys+payload arrays every call (~2 GB
    # per corpus decode pass, measured round 5)
    rows_out = m // _L + _OBUF_ROWS + 16
    if seg is not None:
        assert seg_px is not None and seg & (seg - 1) == 0
        assert _TILE % seg == 0 and seg % _L == 0, (seg, _TILE)
        assert chunks_len.shape == (b, m // seg), chunks_len.shape
        assert n_max == (m // seg) * seg_px, (n_max, m, seg, seg_px)
    d8 = data.reshape(b, m // _L, _L)
    d8 = jnp.pad(d8, ((0, 0), (0, rows + 8), (0, 0)))

    kern = functools.partial(_front_compact_kernel, n_max, mode, rows,
                             seg, seg_px)
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
            pltpu.VMEM((2, rows + 8, _L), jnp.uint8),
            pltpu.VMEM((2, _OBUF_ROWS, _L), jnp.int32),
            pltpu.VMEM((2, _OBUF_ROWS, _L), jnp.int32),
            pltpu.VMEM((2, _L), jnp.int32),
            pltpu.SMEM((10,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2, 2)),
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
