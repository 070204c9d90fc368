"""TPU-native SQOA/QOI decode dispatch + the QOI-compat decoder.

The hot SQOA path lives in ``decode_v2`` (scan-automaton formulation,
re-exported here as ``decode_stream``). This module adds:

* ``decode_stream_compat`` — QOI-compat decode. The 64-entry color index
  (reference: seqoia.h:753-755,785-787) is genuine sequential state; the
  tokenization and pixel expansion are parallel, and the per-op state walk
  is a lax.scan designed to be vmapped over a batch.
* ``decode`` — full-file decode with header parsing, shape bucketing, and
  the sequential native fallback for SQOA_OP_REF streams (the reference
  encoder never emits REF, SURVEY.md §2.1 item 9).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from .. import spec


def _next_pow2(x: int) -> int:
    x = max(int(x), 1)
    return 1 << (x - 1).bit_length()


from .decode_v2 import decode_stream  # scan-automaton SQOA decoder (v2)


def _compat_scan_step(carry, op, colch):
    """One op of the QOI-compat decoder (sequential index-table state)."""
    px, table = carry  # px: (4,) int32; table: (index_size,) packed int32
    op_b, b1, b2, b3, b4, valid = op
    index_size = table.shape[0]

    is_rgb = op_b == spec.OP_RGB
    is_rgba = op_b == spec.OP_RGBA
    is_index = op_b < index_size
    is_diff = (op_b & spec.MASK_2) == spec.QOI_OP_DIFF
    is_luma = (op_b & spec.MASK_2) == spec.OP_LUMA
    vg = (op_b & 0x3F) - 32

    tv = table[jnp.clip(op_b, 0, index_size - 1)]
    indexed = jnp.stack(
        [tv & 255, (tv >> 8) & 255, (tv >> 16) & 255, (tv >> 24) & 255]
    )
    if colch == 3:
        rgb_new = jnp.stack([b1, b2, b3, jnp.where(is_rgba, b4, px[3])])
    else:
        rgb_new = jnp.stack([px[0], b1, px[2], jnp.where(is_rgba, b2, px[3])])
    diffed = jnp.stack(
        [
            (px[0] + ((op_b >> 4) & 3) - 2) & 255,
            (px[1] + ((op_b >> 2) & 3) - 2) & 255,
            (px[2] + (op_b & 3) - 2) & 255,
            px[3],
        ]
    )
    if colch == 3:
        lumaed = jnp.stack(
            [
                (px[0] + vg - 8 + ((b1 >> 4) & 0x0F)) & 255,
                (px[1] + vg) & 255,
                (px[2] + vg - 8 + (b1 & 0x0F)) & 255,
                px[3],
            ]
        )
    else:
        lumaed = jnp.stack([px[0], (px[1] + vg) & 255, px[2], px[3]])

    # Dispatch priority per reference seqoia.h:740-775.
    new_px = jnp.select(
        [is_rgb | is_rgba, is_index, is_diff, is_luma],
        [rgb_new, indexed, diffed, lumaed],
        px,
    )
    new_px = jnp.where(valid, new_px, px)

    h = (new_px[0] * 3 + new_px[1] * 5 + new_px[2] * 7 + new_px[3] * 11) % index_size
    packed = new_px[0] | (new_px[1] << 8) | (new_px[2] << 16) | (new_px[3] << 24)
    new_table = jnp.where(valid, table.at[h].set(packed), table)
    return (new_px, new_table), new_px


@functools.partial(
    jax.jit, static_argnames=("colch", "out_ch", "n_max", "max_ops")
)
def decode_stream_compat(data, chunks_len, n_pixels, *, colch, out_ch,
                         n_max, max_ops):
    """QOI-compat decode: tokenize with the scan automaton, compact op
    operands with one monotone scatter, then scan ops sequentially (the
    64-entry color index is genuine sequential state,
    reference: seqoia.h:753-755,785-787). Designed to be vmapped over a
    batch so the scan amortizes across images."""
    from . import decode_v2
    from ..ops import scan_ops

    b = data.astype(jnp.int32)
    token, _lens = decode_v2._tokenize(b, chunks_len, colch, True)
    tok_idx = scan_ops.blocked_cumsum(token.astype(jnp.int32)) - 1
    idx = jnp.arange(b.shape[-1], dtype=jnp.int32)
    tgt = jnp.where(token & (tok_idx < max_ops), tok_idx, max_ops + idx)

    def compact(vals, fill=0):
        return jnp.full((max_ops,), fill, jnp.int32).at[tgt].set(
            vals, mode="drop", unique_indices=True
        )

    op_b = compact(b)
    ops = (
        op_b,
        compact(decode_v2._shift_left(b, 1)),
        compact(decode_v2._shift_left(b, 2)),
        compact(decode_v2._shift_left(b, 3)),
        compact(decode_v2._shift_left(b, 4)),
        jnp.arange(max_ops, dtype=jnp.int32) < jnp.sum(token),
    )
    op_valid = ops[5]

    index_size = spec.QOI_INDEX_SIZE if colch == 3 else spec.QOI_INDEX_SIZE_MONO
    init = (
        jnp.array([0, 0, 0, 255], jnp.int32),
        jnp.zeros((index_size,), jnp.int32),
    )
    step = functools.partial(_compat_scan_step, colch=colch)
    _, vals = jax.lax.scan(step, init, ops)  # (max_ops, 4)

    # pixels per op, closed form (runs produce (b&63)+1; others 1)
    npix = jnp.where(op_b >= spec.OP_RUN, (op_b & 0x3F) + 1, 1)
    npix = jnp.where(
        (op_b == spec.OP_RGB) | (op_b == spec.OP_RGBA), 1, npix
    )
    npix = jnp.where(op_valid, npix, 0)
    pix_off = scan_ops.blocked_cumsum(npix) - npix  # exclusive

    # expansion: scatter per-op packed values at pixel offsets, forward-fill
    packed = (
        (vals[:, 0] & 255)
        | ((vals[:, 1] & 255) << 8)
        | ((vals[:, 2] & 255) << 16)
        | ((vals[:, 3] & 255) << 24)
    )
    oidx = jnp.arange(max_ops, dtype=jnp.int32)
    valid_op = op_valid & (npix > 0) & (pix_off < n_max)
    ptgt = jnp.where(valid_op, pix_off, n_max + oidx)
    grid = jnp.zeros((n_max,), jnp.int32).at[ptgt].set(
        packed, mode="drop", unique_indices=True
    )
    gridf = jnp.zeros((n_max,), jnp.int32).at[ptgt].set(
        jnp.where(valid_op, 1, 0), mode="drop", unique_indices=True
    )
    init_packed = jnp.int32(np.int32(np.uint32(255 << 24)))
    filled = scan_ops.fill_forward(grid, gridf.astype(bool), init_packed)

    return _format_pixels(
        filled, n_pixels, colch=colch, out_ch=out_ch, n_max=n_max
    )  # flat, matching the hot paths


def _format_pixels(filled, n_pixels, *, colch, out_ch, n_max):
    """Packed r|g<<8|b<<16|a<<24 per pixel -> flat uint8 in out_ch layout
    (mono replicates gray; alpha appended iff out_ch is even — mirrors the
    reference's requested-channel forcing, seqoia.h:790-805)."""
    r, g = filled & 255, (filled >> 8) & 255
    bb, a = (filled >> 16) & 255, (filled >> 24) & 255
    t = jnp.arange(n_max, dtype=jnp.int32)
    if out_ch >= 3 and colch == 3:
        cols = [r, g, bb]
    elif out_ch >= 3:
        cols = [g, g, g]
    else:
        cols = [g]
    if out_ch in (2, 4):
        cols.append(a)
    out = jnp.stack(cols[:out_ch], axis=1).astype(jnp.uint8)
    out = jnp.where((t < n_pixels)[:, None], out, 0)
    return out.reshape(n_max * out_ch)


@functools.partial(jax.jit, static_argnames=("colch", "out_ch", "n_max"))
def decode_stream_ref(data, chunks_len, n_pixels, *, colch, out_ch, n_max):
    """Device-native decoder for SQOA streams containing OP_REF.

    REF replays 2-4 opcode bytes from a 31-byte back-window and teleports
    the cursor when the window is exhausted (reference: seqoia.h:729-738
    and the SQOA_NEXT macro, seqoia.h:418) — the cursor is non-monotonic,
    which defeats the parallel tokenizer. This path reproduces the
    reference's cursor automaton exactly as a ``lax.scan`` over output
    pixels (the per-step byte fetches are gathers, so it is far slower
    than the hot kernels — but REF is decode-only and the reference
    encoder never emits it, SURVEY.md §2.1.9, so only foreign streams
    land here). Non-compat only (REF cannot occur in compat streams).

    Returns (flat uint8 pixels in out_ch layout, err) — err mirrors the
    reference's negative-start rejection (seqoia.h:733-736).
    """
    b = data.astype(jnp.int32)
    nbytes = b.shape[0]

    def fetch(pos):
        return b[jnp.clip(pos, 0, nbytes - 1)]

    def cur_next(pos, rend, res):
        """Replay-aware byte fetch: at the replay window's end the cursor
        jumps to resume+1 and reads there WITHOUT advancing (exact
        SQOA_NEXT semantics, seqoia.h:418)."""
        tele = pos == rend
        rp = jnp.where(tele, res + 1, pos)
        return fetch(rp), jnp.where(tele, rp, pos + 1)

    def step(carry, _):
        pos, rend, res, run, r, g, bl, a, err = carry
        active = (run == 0) & (pos < chunks_len)

        # --- op fetch (REF may redirect it) -----------------------------
        b1, pos_a = cur_next(pos, rend, res)
        is_ref = b1 < spec.OP_ALPHA
        res_n = jnp.where(is_ref, pos_a, res)
        rend_n = jnp.where(is_ref, pos_a - (b1 & 31), rend)
        pos_ref = rend_n - 2 - (b1 >> 5)
        bad = is_ref & (pos_ref < 0)
        # the REF replacement byte is a raw read (bytes[p++]), not replay-aware
        b1 = jnp.where(is_ref, fetch(pos_ref), b1)
        pos_a = jnp.where(is_ref, pos_ref + 1, pos_a)

        # --- operand chain (each fetch may hit the replay end) ----------
        o1, p1 = cur_next(pos_a, rend_n, res_n)
        o2, p2 = cur_next(p1, rend_n, res_n)
        if colch == 3:
            o3, p3 = cur_next(p2, rend_n, res_n)
            o4, p4 = cur_next(p3, rend_n, res_n)

        is_rgb = b1 == spec.OP_RGB
        is_rgba = b1 == spec.OP_RGBA
        is_luma = (b1 & spec.MASK_2) == spec.OP_LUMA
        is_bigrun = b1 == spec.OP_BIGRUN
        vg = (b1 & 0x3F) - 32
        anchor = is_rgb | is_rgba

        if colch == 3:
            nop = jnp.where(
                anchor, jnp.where(is_rgba, 4, 3), jnp.where(is_luma, 1, 0)
            )
            r_n = jnp.where(
                anchor, o1,
                jnp.where(is_luma, r + vg - 8 + ((o1 >> 4) & 15), r),
            )
            g_n = jnp.where(anchor, o2, jnp.where(is_luma, g + vg, g))
            b_n = jnp.where(
                anchor, o3, jnp.where(is_luma, bl + vg - 8 + (o1 & 15), bl)
            )
            a_n = jnp.where(is_rgba, o4, a)
            pos_c = jnp.select(
                [nop == 0, nop == 1, nop == 3], [pos_a, p1, p3], p4
            )
        else:
            nop = jnp.where(anchor, jnp.where(is_rgba, 2, 1), 0)
            r_n, b_n = r, bl
            g_n = jnp.where(anchor, o1, jnp.where(is_luma, g + vg, g))
            a_n = jnp.where(is_rgba, o2, a)
            pos_c = jnp.select([nop == 0, nop == 1], [pos_a, p1], p2)

        run_set = jnp.where(
            is_bigrun, spec.SQOA_MAXRUN - 1,
            jnp.where(anchor | is_luma, 0, b1 & 0x3F),
        )

        # --- alpha-delta peek (color mode only): the PEEK is a raw read
        # of bytes[pos] but the CONSUMPTION goes through the replay-aware
        # cursor — exactly as the reference does (seqoia.h:777-783)
        if colch == 3:
            peek = fetch(pos_c)
            modif = (peek >= spec.OP_ALPHA) & (peek < spec.OP_LUMA)
            b_mod, pos_d = cur_next(pos_c, rend_n, res_n)
            a_n = jnp.where(modif, a_n + (b_mod & 0x1F) - 16, a_n)
            pos_c = jnp.where(modif, pos_d, pos_c)

        # --- commit (only when an op was consumed this step) ------------
        sel = lambda n, o: jnp.where(active, n, o)
        r2 = sel(r_n, r) & 255
        g2 = sel(g_n, g) & 255
        b2_ = sel(b_n, bl) & 255
        a2 = sel(a_n, a) & 255
        carry = (
            sel(pos_c, pos), sel(rend_n, rend), sel(res_n, res),
            jnp.where(active, run_set, jnp.maximum(run - 1, 0)),
            r2, g2, b2_, a2, err | (active & bad),
        )
        return carry, r2 | (g2 << 8) | (b2_ << 16) | (a2 << 24)

    start = spec.HEADER_SIZE + 1  # non-compat: skip header + start byte
    init = (
        jnp.int32(start), jnp.int32(-1), jnp.int32(0), jnp.int32(0),
        jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.int32(255),
        jnp.bool_(False),
    )
    carry, packed = jax.lax.scan(step, init, None, length=n_max)
    out = _format_pixels(
        packed, n_pixels, colch=colch, out_ch=out_ch, n_max=n_max
    )
    return out, carry[8]


def decode(data: bytes, channels: int = 0):
    """Full-file decode through the TPU path, with native fallback for
    OP_REF streams. Returns (pixels flat uint8 array, SqoaDesc) or
    (None, None), mirroring sqoa_decode's contract (seqoia.h:652-713)."""
    from .. import native

    if channels < 0 or channels > 4:
        return None, None
    desc = spec.unpack_header(bytes(data[: spec.HEADER_SIZE + 1]) + b"\0" * 8
                              if len(data) >= spec.HEADER_SIZE + 1 else b"")
    if desc is None or len(data) < spec.HEADER_SIZE + spec.PADDING_SIZE:
        return None, None
    colch = desc.col_channels
    out_ch = channels if channels else colch + (1 if (desc.channels & 1) == 0 else 0)

    # Bucket every static shape to a power of two so distinct file/image
    # sizes reuse compilations (dynamic n_pixels/chunks_len do the masking).
    n_pix = desc.n_pixels
    chunks_len = len(data) - spec.PADDING_SIZE
    start = spec.HEADER_SIZE + (0 if desc.qoi_compat else 1)
    m_pad = _next_pow2(len(data))
    buf = np.zeros(m_pad, dtype=np.uint8)
    buf[: len(data)] = np.frombuffer(data, dtype=np.uint8)
    arr = jnp.asarray(buf)
    max_ops = _next_pow2(max(chunks_len - start, 1))
    n_max = _next_pow2(n_pix)

    if desc.qoi_compat:
        from . import decode_compat

        m_fix = max(m_pad, 32768)
        if decode_compat.fixpoint_ok(m_fix, colch):
            if m_fix > m_pad:
                buf = np.zeros(m_fix, dtype=np.uint8)
                buf[: len(data)] = np.frombuffer(data, dtype=np.uint8)
                arr = jnp.asarray(buf)
            out, converged = decode_compat.decode_stream_compat_batched(
                arr[None], jnp.asarray([chunks_len], jnp.int32),
                jnp.asarray([n_pix], jnp.int32),
                colch=colch, out_ch=out_ch, n_max=n_max,
            )
            if bool(converged[0]):
                return np.asarray(out[0]).reshape(-1)[: n_pix * out_ch], desc
            pixels, d = native.decode(bytes(data), channels)
            if pixels is None:
                return None, None
            return pixels, spec.SqoaDesc(*d)
        out = decode_stream_compat(
            arr, jnp.int32(chunks_len), jnp.int32(n_pix),
            colch=colch, out_ch=out_ch, n_max=n_max, max_ops=max_ops,
        )
        return np.asarray(out).reshape(-1)[: n_pix * out_ch], desc
    out, has_ref = decode_stream(
        arr, jnp.int32(chunks_len), jnp.int32(n_pix),
        colch=colch, compat=False, out_ch=out_ch, n_max=n_max,
        src_alpha=desc.has_alpha,
    )
    if bool(has_ref):
        # REF streams: device-resident lax.scan path (SEQOIA_REF_TPU=1) or
        # the native sequential runtime (default — faster on foreign
        # streams, which is all REF can appear in).
        if os.environ.get("SEQOIA_REF_TPU", "") == "1":
            out, err = decode_stream_ref(
                arr, jnp.int32(chunks_len), jnp.int32(n_pix),
                colch=colch, out_ch=out_ch, n_max=n_max,
            )
            if bool(err):
                return None, None
            return np.asarray(out).reshape(-1)[: n_pix * out_ch], desc
        pixels, d = native.decode(bytes(data), channels)
        if pixels is None:
            return None, None
        return pixels, spec.SqoaDesc(*d)
    return np.asarray(out).reshape(-1)[: n_pix * out_ch], desc
