"""TPU-native SQOA/QOI encoder, scan formulation v2 (gather-free, batched).

Same byte-exact contract as the reference loop (seqoia.h:530-646),
re-architected for measured v5e behavior: no random gathers, prefix sums via
blocked MXU matmuls / log-shift scans (single-HBM-pass Pallas tile scans on
TPU), and stream compaction inverted into an output-driven form:

  * every *emitting* pixel contributes (offset, color, predecessor color,
    run/flush metadata) — compacted and spread across each pixel's byte
    range by the Pallas compact + place_fill engine (ops/pallas_engine.py;
    XLA monotone scatter + log-shift fill as the CPU fallback);
  * each output byte position then computes its own value closed-form from
    the filled fields and its intra-emission index k (flush chunk bytes,
    then op bytes; chunking rules per seqoia.h:544-561,640-646).

The QOI-compat hash-index resolution (last-writer-wins, seqoia.h:563-582)
uses two lax.sort passes (sort by (hash,pos), neighbor shift, sort back by
pos) — bitonic sorts vectorize on TPU where gathers do not.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import spec
from ..ops import scan_ops

# op classes (3 bits in the meta word)
_CL_LUMA = 0      # SQOA luma (color: 2B +1 if alpha; mono: 1B)
_CL_RGB = 1       # RGB fallback (color 4B +1 alpha; mono 2B +1)
_CL_MONO_GA = 2   # mono gray+alpha 3B (0xff g a)
_CL_INDEX = 3     # compat index 1B
_CL_RGBA5 = 4     # compat full rgba 5B
_CL_DIFF = 5      # compat diff 1B
_CL_RGB4 = 6      # compat rgb 4B
_CL_NONE = 7      # run-only pixel (BIGRUN byte or nothing)

_INIT_PACKED = int(np.int32(np.uint32(255 << 24)))


def _emit_inits(colch):
    """place_emit fill inits matching _emit_payloads' stream order."""
    return (_INIT_PACKED, _CL_NONE << 9, 0)


def _emit_payloads(pays_c, keys_c):
    """Payload list handed to place_emit for the fused encode path.

    The byte-offset stream is NOT duplicated as a payload: place_emit's
    fill_keys=True synthesizes the filled offsets from each entry's
    expanded slot (one fewer stream through the window DMAs and the
    expand butterfly); _emit_inits' last element is its fill init."""
    return list(pays_c)


def _pack_meta(pending, cls, vg, vg_r, vg_b, va):
    """Meta word: run/flush state + op class + the op's wrapped deltas.

    Packing the deltas (instead of carrying the predecessor pixel as its
    own stream) drops one int32 stream from the compaction butterfly, the
    staging DMAs, HBM, and the placement kernel. Layout:
      bits 0-8 pending, 9-11 cls, 12-17 vg+32, 18-21 vg_r+8, 22-25 vg_b+8,
      26-30 va+16, 31 alpha-changed. flush_n is recomputed from pending
    (seqoia.h:554-561). Delta fields are masked — only LUMA/DIFF classes
    read them; vr/vb reconstruct as wrap8(vg + vg_r/vg_b)."""
    return (
        pending | (cls << 9)
        | (((vg + 32) & 63) << 12) | (((vg_r + 8) & 15) << 18)
        | (((vg_b + 8) & 15) << 22) | (((va + 16) & 31) << 26)
        | ((va != 0).astype(jnp.int32) << 31)
    )


def _wrap8(x):
    return ((x + 128) & 255) - 128


def _use_slot_kernel(n: int) -> bool:
    import os

    if n % 32768 != 0:
        return False
    if os.environ.get("SEQOIA_PALLAS_INTERPRET", "") == "1":
        return True
    try:
        backend = jax.default_backend()
    except RuntimeError:
        return False
    return backend != "cpu"


def _compat_found(packed, change, hashes, n_valid=None):
    """Index-table hit per change pixel (insert-on-every-miss,
    seqoia.h:563-582; zeroed init table, seqoia.h:518).

    Slot content before pixel i is the color of the most recent change pixel
    j<i with the same hash. At tile-aligned sizes this is one pass of the
    slot last-writer kernel (ops/pallas_slots.py); smaller arrays use two
    bitonic sorts (sort by (hash,pos), neighbor shift, sort back — XLA's
    TPU sort does not scale past ~1 Mpx, NOTES_ROUND2.md, so multi-Mpx
    compat encodes depend on the kernel path)."""
    bsz, n = packed.shape
    if _use_slot_kernel(n):
        from ..ops import pallas_slots

        wr = jnp.where(change, hashes, -1)
        resolved = pallas_slots.slot_last_writer(
            wr, packed, wr, init=0, n_live=n_valid
        )
        return change & (resolved == packed)
    idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (bsz, n))
    keys = jnp.where(change, hashes, jnp.int32(spec.QOI_INDEX_SIZE))
    sk, si, sp = jax.lax.sort((keys, idx, packed), num_keys=2)
    left_same = jnp.concatenate(
        [jnp.zeros((bsz, 1), bool), sk[:, 1:] == sk[:, :-1]], axis=1
    )
    left_val = jnp.concatenate(
        [jnp.zeros((bsz, 1), jnp.int32), sp[:, :-1]], axis=1
    )
    found_sorted = jnp.where(left_same, left_val == sp, sp == 0)
    _, found = jax.lax.sort(
        (si, found_sorted.astype(jnp.int32)), num_keys=1
    )
    return change & (found == 1)


def _flush_byte(pending, k):
    """k-th byte of the run flush for `pending` pixels (seqoia.h:554-561).

    Division by 61 via multiply-shift (exact for 0..511): integer division
    by a non-power-of-2 is catastrophically slow inside Pallas kernels,
    where this also runs (the place_emit epilogue)."""
    n_full = (jnp.maximum(pending - 1, 0) * 538) >> 15
    rem = pending - 61 * n_full
    return jnp.where(k >= n_full, spec.OP_RUN | (rem - 1), spec.OP_RUN | 60)


_EPILOGUES = {}


def _emit_epilogue(colch: int):
    """In-kernel byte emission for place_emit (SQOA non-compat modes).

    Runs inside the placement kernel's epilogue: given the forward-filled
    (cur, prev, meta, off) streams for one output tile plus the global byte
    positions and per-image scalars (chunk_total, has_trail), computes the
    final output bytes — flush chunks, op bytes, trailing BIGRUN and end
    marker (reference: seqoia.h:544-646). Cached per mode so the callable
    hashes stably for jit."""
    if colch in _EPILOGUES:
        return _EPILOGUES[colch]

    def epilogue(filled, base, scal):
        cur_f, meta_f, off_f = filled
        chunk_total, trail_flag, emit_tail = scal[0], scal[1], scal[2]
        if jnp.ndim(base) == 0:  # in-kernel: rebuild global byte positions
            rows, L = cur_f.shape
            t = base + jax.lax.broadcasted_iota(
                jnp.int32, (rows, L), 0
            ) * L + jax.lax.broadcasted_iota(jnp.int32, (rows, L), 1)
        else:  # XLA fallback passes the positions directly
            t = base
        k = t - off_f
        pend_o = meta_f & 0x1FF
        cls_o = (meta_f >> 9) & 0x7
        flush_o = jnp.where(
            pend_o > 0, ((jnp.maximum(pend_o - 1, 0) * 538) >> 15) + 1, 0
        )

        ocr, ocg = cur_f & 255, (cur_f >> 8) & 255
        ocb, oca = (cur_f >> 16) & 255, (cur_f >> 24) & 255
        ovg = ((meta_f >> 12) & 63) - 32
        ovg_r = ((meta_f >> 18) & 15) - 8
        ovg_b = ((meta_f >> 22) & 15) - 8
        ova = ((meta_f >> 26) & 31) - 16
        oalpha = (meta_f >> 31) & 1

        j = k - flush_o
        if colch == 3:
            is_lu = cls_o == _CL_LUMA
            op_byte = jnp.where(
                is_lu,
                jnp.where(
                    j == 0, spec.OP_LUMA | (ovg + 32),
                    jnp.where(j == 1, ((ovg_r + 8) << 4) | (ovg_b + 8),
                              spec.OP_ALPHA | (ova + 16)),
                ),
                jnp.where(
                    j <= 1,
                    jnp.where(j == 0, spec.OP_RGB | oalpha, ocr),
                    jnp.where(j == 2, ocg, jnp.where(j == 3, ocb, oca)),
                ),
            )
        else:
            is_ga = cls_o == _CL_MONO_GA
            op_byte = jnp.where(
                is_ga,
                jnp.where(j == 0, spec.OP_RGBA,
                          jnp.where(j == 1, ocg, oca)),
                jnp.where(
                    cls_o == _CL_LUMA, spec.OP_LUMA | (ovg + 32),
                    jnp.where(j == 0, spec.OP_RGB | oalpha,
                              jnp.where(j == 1, ocg, oca)),
                ),
            )

        byte = jnp.where(k < flush_o, _flush_byte(pend_o, k), op_byte)
        byte = jnp.where(cls_o == _CL_NONE, spec.OP_BIGRUN, byte)

        # tail (trailing BIGRUN + end marker) only when this stream ends
        # the image (emit_tail=0 for non-final shards of a chunked encode)
        total = chunk_total + jnp.where(emit_tail != 0, 8 + trail_flag, 0)
        tail_pos = t - chunk_total
        in_tail = (tail_pos >= 0) & (t < total) & (emit_tail != 0)
        fd_at = jnp.where(trail_flag != 0, 0, -1)
        one_at = jnp.where(trail_flag != 0, 8, 7)
        tail_byte = jnp.where(
            tail_pos == fd_at, spec.OP_BIGRUN,
            jnp.where(tail_pos == one_at, 1, 0),
        )
        out = jnp.where(in_tail, tail_byte, byte)
        return jnp.where(t < total, out, 0)

    _EPILOGUES[colch] = epilogue
    return epilogue


def _use_pallas_spread(n: int, out_cap: int) -> bool:
    import os

    # small power-of-two pixel buffers run the front at a reduced tile
    # height (rows = n/128): icon-class buckets would otherwise pay a full
    # 256-row tile of front compute for a few thousand real pixels
    ok_n = n % 32768 == 0 or n in (4096, 8192, 16384)
    if os.environ.get("SEQOIA_PALLAS_INTERPRET", "") == "1":
        return ok_n and out_cap % 2048 == 0
    try:
        backend = jax.default_backend()
    except RuntimeError:
        return False
    return backend != "cpu" and ok_n and out_cap % 2048 == 0


@functools.partial(
    jax.jit,
    static_argnames=("colch", "has_alpha", "compat", "out_cap", "spread"),
)
def encode_stream_batched(packed, n_valid, *, colch, has_alpha, compat,
                          out_cap, spread="auto"):
    """Encode a batch of packed (B, N) int32 pixel arrays
    (r|g<<8|b<<16|a<<24, normalized per normalize_pixels_packed — 4 bytes
    per pixel on the wire instead of 16).

    Returns ((B, out_cap) uint8 chunk bytes + trailing BIGRUN + end marker,
    (B,) totals)."""
    bsz, n = packed.shape
    maxrun = spec.QOI_MAXRUN if compat else spec.SQOA_MAXRUN

    if not compat and spread != "xla" and _use_pallas_spread(n, out_cap):
        # fully-fused path: one kernel from pixels to the compacted
        # emission stream, one kernel from the stream to the final bytes
        from ..ops import pallas_encode, pallas_engine

        keys_c, pays_c, totals_c, chunk_totals, last_c = (
            pallas_encode.encode_front_compact(
                packed, n_valid, colch=colch,
                rows=256 if n % 32768 == 0 else n // 128,
            )
        )
        trail_pending = ((n_valid - 1) - last_c) % maxrun
        has_trail = (trail_pending > 0) & (n_valid > 0)
        total = chunk_totals + 8 + has_trail.astype(jnp.int32)
        scal = jnp.stack(
            [chunk_totals, has_trail.astype(jnp.int32),
             jnp.ones_like(chunk_totals)], axis=-1
        )
        out = pallas_engine.place_emit(
            keys_c, _emit_payloads(pays_c, keys_c), totals_c, scal, out_cap,
            _emit_inits(colch),
            _emit_epilogue(colch),
            max_gap=14,  # an emitting pixel writes <= 9 flush + 5 op bytes
            p_out=next(p for p in (32768, 16384, 8192, 4096, 2048) if out_cap % p == 0),
            fill_keys=True, entry_limit=n,
        )
        return out, total

    idx = jnp.arange(n, dtype=jnp.int32)[None, :]
    valid = idx < n_valid[:, None]

    cr, cg = packed & 255, (packed >> 8) & 255
    cb, ca = (packed >> 16) & 255, (packed >> 24) & 255
    init = jnp.int32(_INIT_PACKED)
    prev_packed = jnp.concatenate(
        [jnp.full((bsz, 1), init), packed[:, :-1]], axis=1
    )

    same = (packed == prev_packed) & valid
    change = (~same) & valid

    last_change = scan_ops.hillis_max(jnp.where(change, idx, -1))
    prev_change = jnp.concatenate(
        [jnp.full((bsz, 1), -1), last_change[:, :-1]], axis=1
    )

    seg_len = idx - 1 - prev_change
    pending = jnp.where(change, seg_len % maxrun, 0)
    flush_n = jnp.where(pending > 0, (pending - 1) // 61 + 1, 0)
    seg_pos = idx - last_change
    bigrun = same & (seg_pos % maxrun == 0)

    # --- op classification (closed-form from cur/prev) ----------------------
    pr, pg = prev_packed & 255, (prev_packed >> 8) & 255
    pb, pa = (prev_packed >> 16) & 255, (prev_packed >> 24) & 255
    vr = _wrap8(cr - pr)
    vg = _wrap8(cg - pg)
    vb = _wrap8(cb - pb)
    va = _wrap8(ca - pa)
    vg_r = _wrap8(vr - vg)
    vg_b = _wrap8(vb - vg)
    alpha_changed = va != 0
    luma_ok = (
        (vg_r >= -8) & (vg_r <= 7)
        & (vg >= -32) & (vg <= 31)
        & (vg_b >= -8) & (vg_b <= 7)
        & (va >= -16) & (va <= 15)
    )

    if compat:
        hashes = (cr * 3 + cg * 5 + cb * 7 + ca * 11) % spec.QOI_INDEX_SIZE
        found = _compat_found(packed, change, hashes, n_valid)
        diff_ok = (
            (vr >= -2) & (vr <= 1) & (vg >= -2) & (vg <= 1)
            & (vb >= -2) & (vb <= 1)
        )
        cls = jnp.select(
            [found, alpha_changed, diff_ok, luma_ok],
            [_CL_INDEX, _CL_RGBA5, _CL_DIFF, _CL_LUMA],
            _CL_RGB4,
        )
        op_len = jnp.select(
            [cls == _CL_INDEX, cls == _CL_RGBA5, cls == _CL_DIFF,
             cls == _CL_LUMA],
            [1, 5, 1, 2],
            4,
        )
    elif colch == 3:
        cls = jnp.where(luma_ok, _CL_LUMA, _CL_RGB)
        op_len = jnp.where(luma_ok, 2, 4) + alpha_changed.astype(jnp.int32)
    else:
        cls = jnp.select(
            [alpha_changed, luma_ok], [_CL_MONO_GA, _CL_LUMA], _CL_RGB
        )
        op_len = jnp.select([alpha_changed, luma_ok], [3, 1], 2)

    total_len = jnp.where(
        change, flush_n + op_len, jnp.where(bigrun, 1, 0)
    ).astype(jnp.int32)
    cls = jnp.where(change, cls, _CL_NONE)

    offsets = scan_ops.blocked_cumsum(total_len)
    chunk_total = offsets[:, -1]
    offsets = offsets - total_len  # exclusive

    # --- spread emission fields across each pixel's byte range -------------
    emit = total_len > 0
    meta = _pack_meta(pending, cls, vg, vg_r, vg_b, va)

    # trailing run + end marker scalars (branchless, batched)
    last_c = jnp.max(jnp.where(change, idx, -1), axis=-1)
    trail_pending = ((n_valid - 1) - last_c) % maxrun
    has_trail = (trail_pending > 0) & (n_valid > 0)
    total = chunk_total + 8 + has_trail.astype(jnp.int32)

    # (the legacy engine path keeps the full-tile requirement; small
    # power-of-two buffers are only supported by the fused front above)
    if spread != "xla" and n % 32768 == 0 and _use_pallas_spread(n, out_cap):
        from ..ops import pallas_engine

        keys_c, pays_c, totals_c = pallas_engine.compact(
            emit, offsets, [packed, meta]
        )
        if not compat:
            # fused placement + in-kernel byte emission (single uint8 out)
            scal = jnp.stack(
                [chunk_total, has_trail.astype(jnp.int32),
                 jnp.ones_like(chunk_total)], axis=-1
            )
            out = pallas_engine.place_emit(
                keys_c, _emit_payloads(pays_c, keys_c), totals_c, scal,
                out_cap, _emit_inits(colch),
                _emit_epilogue(colch),
                max_gap=14,  # an emitting pixel writes <= 9 flush + 5 op bytes
                p_out=next(p for p in (32768, 16384, 8192, 4096, 2048) if out_cap % p == 0),
                fill_keys=True,
            )
            return out, total
        cur_f, meta_f, off_f = pallas_engine.place_fill(
            keys_c, pays_c + [keys_c], totals_c, out_cap,
            _emit_inits(colch),
            p_out=next(p for p in (32768, 16384, 8192, 4096, 2048) if out_cap % p == 0),
        )
    else:
        rows = jnp.arange(bsz, dtype=jnp.int32)[:, None]
        tgt = jnp.where(emit, offsets, out_cap + idx)

        def scat(vals):
            return jnp.zeros((bsz, out_cap), jnp.int32).at[rows, tgt].set(
                vals, mode="drop", unique_indices=True
            )

        emit_f = scat(jnp.where(emit, 1, 0)).astype(bool)
        cur_f = scan_ops.fill_forward(scat(packed), emit_f, init)
        meta_f = scan_ops.fill_forward(scat(meta), emit_f, _CL_NONE << 9)
        off_f = scan_ops.fill_forward(scat(offsets), emit_f, 0)

    # --- per-output-byte computation ----------------------------------------
    t = jnp.arange(out_cap, dtype=jnp.int32)[None, :]
    k = t - off_f
    pend_o = meta_f & 0x1FF
    cls_o = (meta_f >> 9) & 0x7
    flush_o = jnp.where(
        pend_o > 0, ((jnp.maximum(pend_o - 1, 0) * 538) >> 15) + 1, 0
    )

    ocr, ocg = cur_f & 255, (cur_f >> 8) & 255
    ocb, oca = (cur_f >> 16) & 255, (cur_f >> 24) & 255
    ovg = ((meta_f >> 12) & 63) - 32
    ovg_r = ((meta_f >> 18) & 15) - 8
    ovg_b = ((meta_f >> 22) & 15) - 8
    ova = ((meta_f >> 26) & 31) - 16
    ovr = _wrap8(ovg + ovg_r)
    ovb = _wrap8(ovg + ovg_b)
    oalpha = (meta_f >> 31) & 1

    j = k - flush_o  # op-byte index
    if compat:
        ohash = (ocr * 3 + ocg * 5 + ocb * 7 + oca * 11) % spec.QOI_INDEX_SIZE
        op_byte = jnp.select(
            [
                cls_o == _CL_INDEX,
                cls_o == _CL_DIFF,
                (cls_o == _CL_LUMA) & (j == 0),
                cls_o == _CL_LUMA,
                (cls_o == _CL_RGBA5) & (j == 0),
                (cls_o == _CL_RGB4) & (j == 0),
                j == 1,
                j == 2,
                j == 3,
            ],
            [
                ohash,
                spec.QOI_OP_DIFF | ((ovr + 2) << 4) | ((ovg + 2) << 2) | (ovb + 2),
                spec.OP_LUMA | (ovg + 32),
                ((ovg_r + 8) << 4) | (ovg_b + 8),
                jnp.full_like(k, spec.OP_RGBA),
                jnp.full_like(k, spec.OP_RGB),
                ocr,
                ocg,
                ocb,
            ],
            oca,
        )
    elif colch == 3:
        op_byte = jnp.select(
            [
                (cls_o == _CL_LUMA) & (j == 0),
                (cls_o == _CL_LUMA) & (j == 1),
                cls_o == _CL_LUMA,
                j == 0,
                j == 1,
                j == 2,
                j == 3,
            ],
            [
                spec.OP_LUMA | (ovg + 32),
                ((ovg_r + 8) << 4) | (ovg_b + 8),
                spec.OP_ALPHA | (ova + 16),
                spec.OP_RGB | oalpha,
                ocr,
                ocg,
                ocb,
            ],
            oca,
        )
    else:
        op_byte = jnp.select(
            [
                (cls_o == _CL_MONO_GA) & (j == 0),
                (cls_o == _CL_MONO_GA) & (j == 1),
                cls_o == _CL_MONO_GA,
                cls_o == _CL_LUMA,
                j == 0,
                j == 1,
            ],
            [
                jnp.full_like(k, spec.OP_RGBA),
                ocg,
                oca,
                spec.OP_LUMA | (ovg + 32),
                spec.OP_RGB | oalpha,
                ocg,
            ],
            oca,
        )

    byte = jnp.where(k < flush_o, _flush_byte(pend_o, k), op_byte)
    byte = jnp.where(cls_o == _CL_NONE, spec.OP_BIGRUN, byte)

    # --- trailing run + end marker (branchless, batched) ---------------------
    tail_pos = t - chunk_total[:, None]  # 0..8 within the tail region
    in_tail = (tail_pos >= 0) & (t < total[:, None])
    fd_at = jnp.where(has_trail[:, None], 0, -1)
    one_at = jnp.where(has_trail[:, None], 8, 7)
    tail_byte = jnp.where(
        tail_pos == fd_at,
        spec.OP_BIGRUN,
        jnp.where(tail_pos == one_at, 1, 0),
    )
    out = jnp.where(in_tail, tail_byte, byte)
    out = jnp.where(t < total[:, None], out, 0).astype(jnp.uint8)
    return out, total


@functools.partial(
    jax.jit,
    static_argnames=("colch", "has_alpha", "out_cap", "spread"),
)
def encode_stream_flat(packed, n_valid, *, colch, has_alpha, out_cap,
                       spread="auto", init_prev=None, run_in=None,
                       emit_tail=None):
    """Single large-image SQOA encode with rank-1 internals.

    Same byte contract as the batched kernel, but every intermediate is a
    flat array — rank-2 (1, N) buffers pad their unit sublane dimension 8x
    on TPU, which blows HBM for the 100-400 Mpx single-image workload
    (seqoia.h:428-432, BASELINE config 5). Non-compat only (large compat
    encodes route to the host runtime).

    packed: (N,) int32, r|g<<8|b<<16|a<<24 normalized pixels (4 bytes/px
    on the wire instead of 16 — host->device transfer is the large-image
    path's bottleneck). Returns ((out_cap,) uint8, total).

    The optional carry args make this stream a SHARD of a larger image
    (parallel/tiled.py shard_map path): ``init_prev`` is the packed pixel
    preceding this shard (default: the codec's (0,0,0,255) initial state,
    seqoia.h:520-525), ``run_in`` the in-progress run length at entry
    (mod 512 — carries the BIGRUN phase and pending-flush count across
    the boundary, seqoia.h:544-561), and ``emit_tail`` whether this shard
    ends the image (trailing BIGRUN + end marker, seqoia.h:640-646).
    """
    n = packed.shape[0]
    maxrun = spec.SQOA_MAXRUN
    if init_prev is None:
        init_prev = jnp.int32(_INIT_PACKED)
    if run_in is None:
        run_in = jnp.int32(0)
    if emit_tail is None:
        emit_tail = jnp.int32(1)

    if spread != "xla" and _use_pallas_spread(n, out_cap):
        # fully-fused path (see encode_stream_batched); the boundary state
        # rides into the kernel as a virtual change anchor at -(run_in+1)
        from ..ops import pallas_encode, pallas_engine

        keys_c, pays_c, totals_c, chunk_totals, last_c = (
            pallas_encode.encode_front_compact(
                packed[None], jnp.asarray(n_valid, jnp.int32).reshape(1),
                colch=colch,
                init_prev=jnp.asarray(init_prev, jnp.int32).reshape(1),
                lc0=-(jnp.asarray(run_in, jnp.int32).reshape(1) + 1),
                rows=256 if n % 32768 == 0 else n // 128,
            )
        )
        chunk_total = chunk_totals[0]
        trail_pending = ((n_valid - 1) - last_c[0]) % maxrun
        has_trail = (trail_pending > 0) & (n_valid > 0) & (emit_tail != 0)
        total = chunk_total + jnp.where(
            emit_tail != 0, 8 + has_trail.astype(jnp.int32), 0
        )
        scal = jnp.stack(
            [chunk_total, has_trail.astype(jnp.int32),
             jnp.asarray(emit_tail, jnp.int32)]
        )[None, :]
        out = pallas_engine.place_emit(
            keys_c, _emit_payloads(pays_c, keys_c), totals_c, scal, out_cap,
            _emit_inits(colch),
            _emit_epilogue(colch),
            max_gap=14,  # an emitting pixel writes <= 9 flush + 5 op bytes
            p_out=next(p for p in (32768, 16384, 8192, 4096, 2048) if out_cap % p == 0),
            fill_keys=True, entry_limit=n,
        )[0]
        return out, total

    idx = jnp.arange(n, dtype=jnp.int32)
    valid = idx < n_valid

    cr, cg = packed & 255, (packed >> 8) & 255
    cb, ca = (packed >> 16) & 255, (packed >> 24) & 255
    init = jnp.int32(_INIT_PACKED)
    prev_packed = jnp.concatenate(
        [jnp.asarray(init_prev, jnp.int32).reshape(1), packed[:-1]]
    )

    same = (packed == prev_packed) & valid
    change = (~same) & valid

    last_change = scan_ops.hillis_max(jnp.where(change, idx, -1))
    prev_change = jnp.concatenate([jnp.full((1,), -1), last_change[:-1]])

    # head adjustments: positions before any local change belong to the
    # run carried in from the previous shard (run_in pixels long)
    seg_len = idx - 1 - prev_change + jnp.where(prev_change == -1, run_in, 0)
    pending = jnp.where(change, seg_len % maxrun, 0)
    flush_n = jnp.where(pending > 0, (pending - 1) // 61 + 1, 0)
    seg_pos = idx - last_change + jnp.where(last_change == -1, run_in, 0)
    bigrun = same & (seg_pos % maxrun == 0)

    pr, pg = prev_packed & 255, (prev_packed >> 8) & 255
    pb, pa = (prev_packed >> 16) & 255, (prev_packed >> 24) & 255
    vr = _wrap8(cr - pr)
    vg = _wrap8(cg - pg)
    vb = _wrap8(cb - pb)
    va = _wrap8(ca - pa)
    vg_r = _wrap8(vr - vg)
    vg_b = _wrap8(vb - vg)
    alpha_changed = va != 0
    luma_ok = (
        (vg_r >= -8) & (vg_r <= 7)
        & (vg >= -32) & (vg <= 31)
        & (vg_b >= -8) & (vg_b <= 7)
        & (va >= -16) & (va <= 15)
    )
    if colch == 3:
        cls = jnp.where(luma_ok, _CL_LUMA, _CL_RGB)
        op_len = jnp.where(luma_ok, 2, 4) + alpha_changed.astype(jnp.int32)
    else:
        cls = jnp.select(
            [alpha_changed, luma_ok], [_CL_MONO_GA, _CL_LUMA], _CL_RGB
        )
        op_len = jnp.select([alpha_changed, luma_ok], [3, 1], 2)

    total_len = jnp.where(
        change, flush_n + op_len, jnp.where(bigrun, 1, 0)
    ).astype(jnp.int32)
    cls = jnp.where(change, cls, _CL_NONE)

    offsets = scan_ops.blocked_cumsum(total_len)
    chunk_total = offsets[-1]
    offsets = offsets - total_len  # exclusive

    emit = total_len > 0
    meta = _pack_meta(pending, cls, vg, vg_r, vg_b, va)

    last_c = jnp.max(jnp.where(change, idx, -1))
    trail_raw = (n_valid - 1) - last_c + jnp.where(last_c == -1, run_in, 0)
    trail_pending = trail_raw % maxrun
    has_trail = (trail_pending > 0) & (n_valid > 0) & (emit_tail != 0)
    total = chunk_total + jnp.where(
        emit_tail != 0, 8 + has_trail.astype(jnp.int32), 0
    )

    if spread != "xla" and n % 32768 == 0 and _use_pallas_spread(n, out_cap):
        from ..ops import pallas_engine

        keys_c, pays_c, totals_c = pallas_engine.compact(
            emit[None], offsets[None], [packed[None], meta[None]]
        )
        scal = jnp.stack(
            [chunk_total, has_trail.astype(jnp.int32),
             jnp.asarray(emit_tail, jnp.int32)]
        )[None, :]
        out = pallas_engine.place_emit(
            keys_c, _emit_payloads(pays_c, keys_c), totals_c, scal, out_cap,
            _emit_inits(colch),
            _emit_epilogue(colch),
            max_gap=14,  # an emitting pixel writes <= 9 flush + 5 op bytes
            p_out=next(p for p in (32768, 16384, 8192, 4096, 2048) if out_cap % p == 0),
            fill_keys=True, entry_limit=n,
        )[0]
        return out, total
    else:
        tgt = jnp.where(emit, offsets, out_cap + idx)

        def scat(vals):
            return jnp.zeros((out_cap,), jnp.int32).at[tgt].set(
                vals, mode="drop", unique_indices=True
            )

        emit_f = scat(jnp.where(emit, 1, 0)).astype(bool)
        cur_f = scan_ops.fill_forward(scat(packed), emit_f, init)
        meta_f = scan_ops.fill_forward(scat(meta), emit_f, _CL_NONE << 9)
        off_f = scan_ops.fill_forward(scat(offsets), emit_f, 0)

    t = jnp.arange(out_cap, dtype=jnp.int32)
    out = _emit_epilogue(colch)(
        (cur_f, meta_f, off_f), t,
        (chunk_total, has_trail.astype(jnp.int32),
         jnp.asarray(emit_tail, jnp.int32)),
    ).astype(jnp.uint8)
    return out, total


@functools.partial(
    jax.jit,
    static_argnames=("colch", "has_alpha", "compat", "out_cap"),
)
def encode_stream(packed, n_valid, *, colch, has_alpha, compat, out_cap):
    """Single-image encode: packed (N,) int32 -> ((out_cap,) uint8, total).

    Thin wrapper over the batched kernel."""
    out, total = encode_stream_batched(
        packed[None], jnp.asarray(n_valid, jnp.int32)[None],
        colch=colch, has_alpha=has_alpha, compat=compat, out_cap=out_cap,
    )
    return out[0], total[0]
