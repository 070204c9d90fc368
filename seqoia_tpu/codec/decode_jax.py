"""TPU-native SQOA decoder: two-pass parallel reformulation of the
reference's sequential output-driven loop (reference: seqoia.h:722-806).

Pass 1 — tokenization. Ops are self-delimiting: the byte length of an op
(including a trailing SQOA_OP_ALPHA modifier, reference: seqoia.h:777-783)
is a pure function of its first byte and the channel mode. We build a
``next op start`` successor map over every byte position and extract the
op-start sequence with logarithmic pointer doubling (each op index's
position is the bit-decomposed composition of 2^k-step jump tables).

Pass 2 — reconstruction. Each channel value at op t is (value at the most
recent absolute anchor) + (modular prefix-sum of deltas since); anchors are
RGB/RGBA ops, deltas come from LUMA/ALPHA ops, and RUN/BIGRUN contribute
nothing. Pixel expansion assigns each output pixel its covering op with a
searchsorted over the pixel-count prefix sum.

SQOA_OP_REF back-references (reference: seqoia.h:729-738) make the byte
cursor non-monotonic; the reference encoder never emits them (SURVEY.md
§2.1 item 9), so streams containing one are detected here and routed to the
sequential native fallback by the caller.

QOI-compat streams thread a 64-entry color index through every op, which is
sequential state; ``decode_stream_compat`` handles those with a lax.scan
over ops (vmap-friendly across a batch) until a parallel resolution lands.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import spec


def _next_pow2(x: int) -> int:
    x = max(int(x), 1)
    return 1 << (x - 1).bit_length()


def _op_length_table(colch: int, compat: bool) -> np.ndarray:
    """len[b] = bytes consumed by an op whose first byte is b (excluding any
    trailing ALPHA modifier, which is handled as a +1 peek)."""
    lens = np.ones(256, dtype=np.int32)
    b = np.arange(256)
    if compat:
        index_size = spec.QOI_INDEX_SIZE if colch == 3 else spec.QOI_INDEX_SIZE_MONO
        luma = ((b & spec.MASK_2) == spec.OP_LUMA) & (b >= index_size)
        lens[luma] = 2 if colch == 3 else 1
    else:
        luma = (b & spec.MASK_2) == spec.OP_LUMA
        lens[luma] = 2 if colch == 3 else 1
    lens[spec.OP_RGB] = 4 if colch == 3 else 2
    lens[spec.OP_RGBA] = 5 if colch == 3 else 3
    return lens


def _pixel_count_table(compat: bool) -> np.ndarray:
    """pixels produced by an op with first byte b (run ops produce 1 + the
    stored countdown, reference: seqoia.h:722-726,770-775)."""
    b = np.arange(256)
    cnt = np.ones(256, dtype=np.int32)
    run = (b & spec.MASK_2) == spec.OP_RUN
    cnt[run] = (b[run] & 0x3F) + 1
    # Dispatch order: RGB/RGBA and (compat) INDEX/DIFF and LUMA take
    # precedence over RUN; the "else" run branch also captures ALPHA-range
    # bytes at op-start in SQOA mode (reference decoder quirk, seqoia.h:770-775).
    if not compat:
        alpha_range = (b >= spec.OP_ALPHA) & (b < spec.OP_LUMA)
        cnt[alpha_range] = (b[alpha_range] & 0x3F) + 1
        cnt[spec.OP_BIGRUN] = spec.SQOA_MAXRUN
    luma = (b & spec.MASK_2) == spec.OP_LUMA
    cnt[luma] = 1
    cnt[spec.OP_RGB] = 1
    cnt[spec.OP_RGBA] = 1
    if compat:
        cnt[b < spec.QOI_INDEX_SIZE] = 1  # INDEX
        cnt[(b & spec.MASK_2) == spec.QOI_OP_DIFF] = 1
    return cnt


def _tokenize(data, start, chunks_len, max_ops, colch, compat):
    """Return (op_pos, op_byte, valid_op) arrays of length max_ops."""
    m = data.shape[0]
    lens = jnp.asarray(_op_length_table(colch, compat))
    base = lens[data]
    if (not compat) and colch == 3:
        # +1 if the byte after the op is an ALPHA modifier.
        after = data[jnp.minimum(jnp.arange(m) + base, m - 1)]
        peek = ((after >= spec.OP_ALPHA) & (after < spec.OP_LUMA)).astype(jnp.int32)
        base = base + peek
    nxt = jnp.minimum(jnp.arange(m, dtype=jnp.int32) + base, m - 1)
    # Positions at/after chunks_len self-loop at sentinel m-1.
    nxt = jnp.where(jnp.arange(m) >= chunks_len, m - 1, nxt)

    # Pointer doubling: op_pos[j] = nxt^j(start).
    n_bits = max(1, int(np.ceil(np.log2(max(max_ops, 2)))))
    j = jnp.arange(max_ops, dtype=jnp.int32)
    pos = jnp.full((max_ops,), start, dtype=jnp.int32)
    jump = nxt
    for k in range(n_bits):
        pos = jnp.where((j >> k) & 1 == 1, jump[pos], pos)
        if k + 1 < n_bits:
            jump = jump[jump]
    valid = pos < chunks_len
    return pos, data[pos].astype(jnp.int32), valid


def _anchored_value(is_abs, abs_val, delta, init):
    """Per-op channel value: last absolute anchor + modular delta prefix-sum.

    All args are (num_ops,) int32; returns (num_ops,) int32 in [0,255].
    """
    n = is_abs.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    anchor = jax.lax.associative_scan(jnp.maximum, jnp.where(is_abs, idx, -1))
    cum = jnp.cumsum(delta, dtype=jnp.int32)
    a = jnp.maximum(anchor, 0)
    anchor_val = jnp.where(anchor >= 0, abs_val[a], init)
    anchor_cum = jnp.where(anchor >= 0, cum[a] - delta[a], 0)
    return (anchor_val + cum - anchor_cum) & 255


from .decode_v2 import decode_stream  # scan-automaton SQOA decoder (v2)


@functools.partial(
    jax.jit, static_argnames=("colch", "compat", "out_ch", "n_max", "max_ops")
)
def _decode_stream_v1(data, chunks_len, n_pixels, *, colch, compat, out_ch,
                      n_max, max_ops):
    """Gather-based decode (v1) — superseded by decode_v2 on TPU (random
    gathers serialize); kept as a differential reference implementation.

    Args:
      data: (M,) uint8 full file bytes (header included; padding present).
      chunks_len: scalar int32, file size - 8 (op fetch limit).
      n_pixels: scalar int32, true pixel count (<= n_max).
      colch/compat/out_ch: static channel mode.
      n_max: static output pixel capacity.
      max_ops: static op capacity (>= any possible op count).

    Returns:
      (pixels, has_ref): pixels is (n_max, out_ch) uint8 (rows >= n_pixels
      are zero); has_ref flags SQOA_OP_REF presence (caller must then use
      the sequential fallback — the parallel result is invalid).
    """
    start = spec.HEADER_SIZE + (0 if compat else 1)
    data = data.astype(jnp.int32)
    pos, op_b, op_valid = _tokenize(data, start, chunks_len, max_ops, colch, compat)

    has_ref = jnp.any(op_valid & (op_b < spec.OP_ALPHA)) if not compat else jnp.bool_(False)

    cnt_tab = jnp.asarray(_pixel_count_table(compat))
    npix = jnp.where(op_valid, cnt_tab[op_b], 0)
    pix_off = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(npix, dtype=jnp.int32)[:-1]]
    )

    m = data.shape[0]
    at = lambda off: data[jnp.minimum(pos + off, m - 1)]
    b1, b2, b3, b4 = at(1), at(2), at(3), at(4)

    is_rgb = op_b == spec.OP_RGB
    is_rgba = op_b == spec.OP_RGBA
    is_luma = ((op_b & spec.MASK_2) == spec.OP_LUMA) & ~is_rgb & ~is_rgba
    vg = (op_b & 0x3F) - 32

    if colch == 3:
        # ALPHA modifier attached to this op (non-compat only).
        lens = jnp.asarray(_op_length_table(colch, compat))
        if not compat:
            after = data[jnp.minimum(pos + lens[op_b], m - 1)]
            has_amod = (after >= spec.OP_ALPHA) & (after < spec.OP_LUMA) & op_valid
            amod = jnp.where(has_amod, (after & 0x1F) - 16, 0)
        else:
            amod = jnp.zeros_like(op_b)

        abs_rgb = (is_rgb | is_rgba) & op_valid
        luma_d = is_luma & op_valid
        # LUMA's dr-dg/db-dg nibbles are in the op's second byte (b1);
        # RGB/RGBA absolutes are at +1/+2/+3(+4).
        r = _anchored_value(
            abs_rgb, b1, jnp.where(luma_d, vg - 8 + ((b1 >> 4) & 0x0F), 0), 0
        )
        g = _anchored_value(abs_rgb, b2, jnp.where(luma_d, vg, 0), 0)
        bch = _anchored_value(
            abs_rgb, b3, jnp.where(luma_d, vg - 8 + (b1 & 0x0F), 0), 0
        )
        a = _anchored_value(is_rgba & op_valid, b4, amod, 255)
        vals = jnp.stack([r, g, bch, a], axis=1)  # (max_ops, 4)
    else:
        abs_g = (is_rgb | is_rgba) & op_valid
        g = _anchored_value(abs_g, b1, jnp.where(is_luma & op_valid, vg, 0), 0)
        a = _anchored_value(is_rgba & op_valid, b2, jnp.zeros_like(op_b), 255)
        vals = jnp.stack([g, g, g, a], axis=1)

    # --- expand ops to pixels -------------------------------------------------
    t = jnp.arange(n_max, dtype=jnp.int32)
    op_of_pixel = jnp.searchsorted(pix_off, t, side="right").astype(jnp.int32) - 1
    op_of_pixel = jnp.clip(op_of_pixel, 0, max_ops - 1)
    px = vals[op_of_pixel]  # (n_max, 4)

    # Pixels beyond the op stream keep the last decoded value — searchsorted
    # already lands them on the final op, matching the reference's behaviour
    # when the stream exhausts early (p >= chunks_len keeps px unchanged).

    if out_ch >= 3 and colch == 3:
        cols = [px[:, 0], px[:, 1], px[:, 2]]
    elif out_ch >= 3:
        cols = [px[:, 1], px[:, 1], px[:, 1]]
    else:
        cols = [px[:, 1]]
    if out_ch in (2, 4):
        cols.append(px[:, 3])
    out = jnp.stack(cols[:out_ch], axis=1).astype(jnp.uint8)
    out = jnp.where((t < n_pixels)[:, None], out, 0)
    return out, has_ref


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
    return out


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
        out = decode_stream_compat(
            arr, jnp.int32(chunks_len), jnp.int32(n_pix),
            colch=colch, out_ch=out_ch, n_max=n_max, max_ops=max_ops,
        )
        return np.asarray(out).reshape(-1)[: n_pix * out_ch], desc
    out, has_ref = decode_stream(
        arr, jnp.int32(chunks_len), jnp.int32(n_pix),
        colch=colch, compat=False, out_ch=out_ch, n_max=n_max,
    )
    if bool(has_ref):
        pixels, d = native.decode(bytes(data), channels)
        if pixels is None:
            return None, None
        return pixels, spec.SqoaDesc(*d)
    return np.asarray(out).reshape(-1)[: n_pix * out_ch], desc
