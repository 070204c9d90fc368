"""TPU-native SQOA decoder, scan-automaton formulation (v2).

Replaces the gather-heavy v1 pipeline: measured on v5e, random gathers
serialize (~11 ns/element) while log-shift scans are bandwidth-bound, so the
whole decode is reformulated as elementwise passes + scans + one scatter:

1. Token lengths are a closed-form function of each byte (an op's length,
   with any trailing SQOA_OP_ALPHA modifier treated as its own 1-byte token;
   reference grammar: seqoia.h:106-280).
2. Token boundaries come from a 5-state countdown automaton whose per-byte
   transition maps (packed 15-bit) compose associatively — one log-shift
   function-composition scan (ops/scan_ops.py), replacing pointer-doubling.
3. Alpha-range tokens alternate modifier/run within each maximal alpha
   train (the reference peeks exactly once after each op,
   seqoia.h:777-783); the alternation resolves with a segmented count.
4. Channel values are segmented modular sums: absolute anchors (RGB/RGBA,
   reference: seqoia.h:740-752) reset, LUMA/ALPHA deltas accumulate
   (seqoia.h:761-769). Operand bytes arrive by shifting the byte array, not
   gathering.
5. Pixel expansion: one monotone unique scatter of per-op values to their
   pixel offsets (prefix-summed pixel counts), then a log-shift forward fill.

SQOA_OP_REF streams (cursor teleportation, seqoia.h:729-738) are flagged and
routed to the sequential native fallback by the caller; the reference
encoder never emits REF (SURVEY.md §2.1 item 9).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import spec
from ..ops import scan_ops


def _shift_left(x, k, fill=0):
    """x[i+k] along the last axis."""
    pad = [(0, 0)] * (x.ndim - 1) + [(0, k)]
    return jnp.pad(x, pad, constant_values=fill)[..., k:]


def _token_lengths(b, colch: int, compat: bool):
    """Token byte-length per position, assuming a token starts there."""
    is_luma = (b & spec.MASK_2) == spec.OP_LUMA
    if colch == 3:
        lens = 1 + jnp.where(is_luma, 1, 0)
        lens = jnp.where(b == spec.OP_RGB, 4, lens)
        lens = jnp.where(b == spec.OP_RGBA, 5, lens)
    else:
        lens = jnp.where(b == spec.OP_RGB, 2, jnp.ones_like(b))
        lens = jnp.where(b == spec.OP_RGBA, 3, lens)
    if compat:
        index_size = spec.QOI_INDEX_SIZE if colch == 3 else spec.QOI_INDEX_SIZE_MONO
        lens = jnp.where(b < index_size, 1, lens)
    return lens


def _tokenize(b, chunks_len, colch: int, compat: bool):
    """Token-start mask over byte positions. chunks_len broadcasts against
    the byte axis (scalar, or (B, 1) for batched input)."""
    start = spec.HEADER_SIZE + (0 if compat else 1)
    lens = _token_lengths(b, colch, compat)
    state = scan_ops.tokenizer_states(lens, start)
    idx = jnp.arange(b.shape[-1], dtype=jnp.int32)
    token = (state == 0) & (idx >= start) & (idx < chunks_len)
    return token, lens


def _npix_table(b, token, is_mod, colch: int, compat: bool):
    """Pixels produced per token (reference: seqoia.h:722-726,770-775)."""
    run_px = (b & 0x3F) + 1
    if compat:
        npix = jnp.where(b >= spec.OP_RUN, run_px, 1)
        npix = jnp.where((b == spec.OP_RGB) | (b == spec.OP_RGBA), 1, npix)
    else:
        npix = run_px
        is_luma = (b & spec.MASK_2) == spec.OP_LUMA
        npix = jnp.where(is_luma, 1, npix)
        npix = jnp.where((b == spec.OP_RGB) | (b == spec.OP_RGBA), 1, npix)
        npix = jnp.where(b == spec.OP_BIGRUN, spec.SQOA_MAXRUN, npix)
        npix = jnp.where(b < spec.OP_ALPHA, 1, npix)  # REF: fallback anyway
    return jnp.where(token & ~is_mod, npix, 0)


def _modifier_mask(b, token, colch: int, compat: bool):
    """Which alpha-range tokens are alpha *modifiers* (vs run ops).

    Within each maximal train of consecutive alpha-range tokens, tokens
    alternate modifier/op starting with modifier — except a train at stream
    head (no op before it) starts with an op. Only SQOA color mode has
    modifiers (reference: seqoia.h:777-783)."""
    if compat or colch != 3:
        return jnp.zeros_like(token)
    alpha_tok = token & (b >= spec.OP_ALPHA) & (b < spec.OP_LUMA)
    op_tok = token & ~alpha_tok
    acnt = scan_ops.blocked_cumsum(alpha_tok.astype(jnp.int32))
    brk = scan_ops.fill_forward(acnt, op_tok, 0)
    alpha_idx = acnt - brk  # 1-based index within the train
    seen_op = scan_ops.fill_forward(
        jnp.ones_like(acnt), op_tok, 0
    ).astype(bool)
    want_parity = jnp.where(seen_op, 1, 0)
    return alpha_tok & ((alpha_idx & 1) == want_parity)


_DEC_EPILOGUES = {}


def _dec_epilogue(out_ch: int):
    """In-kernel pixel emission for place_emit (color decode).

    out_ch=4: mask past n_pixels — the packed int32 words ARE the
    interleaved RGBA bytes (little-endian bitcast at the caller).
    out_ch=3: additionally drop every 4th byte (the alpha lane) with a
    static butterfly compaction over the tile, so the int32 output words
    bitcast directly to the interleaved RGB stream. Cached per mode so the
    callable hashes stably for jit."""
    if out_ch in _DEC_EPILOGUES:
        return _DEC_EPILOGUES[out_ch]
    from ..ops import ktools

    if out_ch == 4:
        def epilogue(filled, base, scal):
            packed = filled[0]
            rows, L = packed.shape
            pix = base + ktools.iota2((rows, L), 0) * L \
                + ktools.iota2((rows, L), 1)
            return jnp.where(pix < scal[0], packed, 0)
    else:
        def epilogue(filled, base, scal):
            packed = filled[0]
            rows, L = packed.shape
            flat = ktools.iota2((rows, L), 0) * L + ktools.iota2((rows, L), 1)
            x = jnp.where(base + flat < scal[0], packed, 0)
            x1 = ktools.flat_shift_left(x, 1, 0)
            # drop words w === 3 (mod 4): a static monotone butterfly whose
            # routing has a CLOSED FORM — entry w0 (w0 % 4 != 3) moves left
            # by w0 >> 2, and after the k low stages the entries provably
            # fill exactly the low 3*2^k words of every 4*2^k block, with
            # the odd blocks being those whose remaining distance has bit k
            # set. So the per-stage take masks are iota arithmetic and the
            # distance word never rides the network (saves 2 rolls + 3
            # selects per stage vs butterfly_compact). After it, word w
            # holds pixel word 4w//3 (p0) and its successor (p1).
            nbits = max((rows * L // 4 - 1).bit_length(), 1)
            p0, p1 = x, x1
            for k in range(nbits):
                s = 1 << k
                src = flat + s
                take = (((src >> (k + 2)) & 1) == 1) & ((src & (4 * s - 1)) < 3 * s)
                p0 = jnp.where(take, ktools.flat_roll_left(p0, s), p0)
                p1 = jnp.where(take, ktools.flat_roll_left(p1, s), p1)
            wrows = rows * 3 // 4
            src0, src1 = p0[0:wrows, :], p1[0:wrows, :]
            wl = ktools.iota2((wrows, L), 0) * L + ktools.iota2((wrows, L), 1)
            # x//3 as (x*21846)>>16 (exact for x < 32768): non-power-of-2
            # integer division is very slow inside Pallas kernels
            div3 = lambda x: (x * 21846) >> 16
            m3 = wl - 3 * div3(wl)
            word = jnp.zeros((wrows, L), jnp.int32)
            for k in range(4):
                q = 4 * m3 + k
                nxt = (div3(q) - div3(4 * m3)) > 0
                s = m3 + k
                s8 = 8 * (s - 3 * div3(s))
                byte = (jnp.where(nxt, src1, src0) >> s8) & 255
                word = word | (byte << (8 * k))
            return word

    _DEC_EPILOGUES[out_ch] = epilogue
    return epilogue


def _dec_epilogue_mono(out_ch: int):
    """In-kernel pixel emission for mono sources (gray in packed byte 0,
    alpha in byte 3 — pallas_frontend mode="mono").

    out_ch=1: each int32 lane narrows to its gray byte; place_emit's
    uint8 output array IS the flat pixel stream, no data movement.
    out_ch=2: (gray, alpha) packs into a uint16 whose little-endian
    bytes are the interleaved 2-channel stream."""
    key = ("mono", out_ch)
    if key in _DEC_EPILOGUES:
        return _DEC_EPILOGUES[key]
    from ..ops import ktools

    if out_ch == 1:
        def epilogue(filled, base, scal):
            packed = filled[0]
            rows, L = packed.shape
            pix = base + ktools.iota2((rows, L), 0) * L \
                + ktools.iota2((rows, L), 1)
            return jnp.where(pix < scal[0], packed & 255, 0)
    else:
        def epilogue(filled, base, scal):
            packed = filled[0]
            rows, L = packed.shape
            pix = base + ktools.iota2((rows, L), 0) * L \
                + ktools.iota2((rows, L), 1)
            v = (packed & 255) | (((packed >> 24) & 255) << 8)
            return jnp.where(pix < scal[0], v, 0)

    _DEC_EPILOGUES[key] = epilogue
    return epilogue


def _use_pallas_expand(m: int, n_max: int) -> bool:
    # small power-of-two buffers below the 32768 tile run the front at a
    # reduced tile height (rows = m/128): icon-class buckets would
    # otherwise pay a full 256-row tile of front compute for a few KB of
    # real bytes (pallas_frontend._front_compact_kernel skips only tiles
    # wholly past the stream)
    ok_m = m % 32768 == 0 or m in (4096, 8192, 16384)
    import os

    if os.environ.get("SEQOIA_PALLAS_INTERPRET", "") == "1":
        return ok_m and n_max % 2048 == 0
    try:
        backend = jax.default_backend()
    except RuntimeError:
        return False
    return backend != "cpu" and ok_m and n_max % 2048 == 0


@functools.partial(
    jax.jit,
    static_argnames=("colch", "compat", "out_ch", "n_max", "expand", "emit",
                     "src_alpha"),
)
def decode_stream_batched(data, chunks_len, n_pixels, *, colch, compat,
                          out_ch, n_max, expand="auto", emit="u8",
                          src_alpha=True):
    """Decode a batch of SQOA (non-compat) streams. See module docstring.

    emit="words" returns the pixels as an array whose little-endian byte
    view is the interleaved pixel stream — int32 (B, n_max*out_ch//4) on
    the color paths, uint8/uint16 (B, n_max) on the fused mono paths —
    numpy's free ``.view(np.uint8)`` on the host replaces an on-device
    relayout (TPU tiled layouts differ per dtype, so a device bitcast is
    a real copy). Requires n_max*out_ch % 4 == 0.

    data: (B, M) uint8; chunks_len, n_pixels: (B,) int32.
    expand="xla" forces the scatter-based expansion (required when running
    under GSPMD sharding, which cannot partition the Pallas engine).
    Returns (pixels (B, n_max*out_ch) flat interleaved uint8, has_ref
    (B,) bool)."""
    assert not compat, "use decode_stream_compat for QOI streams"
    bsz0, m0 = data.shape
    if (
        expand != "xla"
        and (colch == 3 or out_ch in (1, 2))
        and _use_pallas_expand(m0, n_max)
    ):
        # fully-fused front-end + butterfly data-movement engine (hot path):
        # the front-end kernel ingests uint8 directly and compacts the op
        # stream in-kernel, so neither a 4x int32 staging copy nor the
        # per-position (valid, pixoff, packed) arrays ever touch HBM.
        from ..ops import pallas_engine, pallas_frontend

        # alpha-less color sources (header channels==3) take a front-end
        # variant that skips the alpha-train machinery entirely; foreign
        # streams containing alpha tokens get flagged for the host
        # fallback. Mono sources take the mono grammar (no alpha peek).
        mode = (
            "mono" if colch == 1 else ("alpha" if src_alpha else "noalpha")
        )
        rows = 256 if m0 % 32768 == 0 else m0 // 128
        keys_c, pays_c, totals, ref_flag = (
            pallas_frontend.decode_front_compact(
                data, chunks_len, n_max, mode=mode, rows=rows
            )
        )
        init = int(np.int32(np.uint32(255 << 24)))
        p_out = next(p for p in (32768, 16384, 8192, 4096, 2048) if n_max % p == 0)
        if colch == 1:
            # fused mono emission: uint8 (gray) or uint16 (gray|alpha<<8)
            # output — the array's LE byte view IS the pixel stream, so
            # neither dtype needs any in-kernel data movement
            out = pallas_engine.place_emit(
                keys_c, pays_c, totals, n_pixels[:, None], n_max, (init,),
                _dec_epilogue_mono(out_ch), p_out=p_out,
                out_dtype=jnp.uint8 if out_ch == 1 else jnp.uint16,
                max_gap=spec.SQOA_MAXRUN - 1, entry_limit=m0,
            )
            if emit == "words" or out_ch == 1:
                return out, ref_flag != 0
            out = jax.lax.bitcast_convert_type(out, jnp.uint8)
            return out.reshape(bsz0, n_max * 2), ref_flag != 0
        if out_ch in (3, 4):
            # in-kernel emission: packed int32 words bitcast straight to
            # the interleaved uint8 pixels (LE byte order; out_ch=3 drops
            # the alpha lane with a static butterfly inside the epilogue)
            rows = p_out // 128
            out_rows = rows if out_ch == 4 else rows * 3 // 4
            words = pallas_engine.place_emit(
                keys_c, pays_c, totals, n_pixels[:, None], n_max, (init,),
                _dec_epilogue(out_ch), p_out=p_out, out_rows=out_rows,
                out_dtype=jnp.int32, entry_limit=m0,
                max_gap=spec.SQOA_MAXRUN - 1,  # an op covers <= MAXRUN px
            )
            if emit == "words":
                return words, ref_flag != 0
            out = jax.lax.bitcast_convert_type(words, jnp.uint8)
            out = out.reshape(bsz0, n_max * out_ch)
            return out, ref_flag != 0
        filled = pallas_engine.place_fill(
            keys_c, pays_c, totals, n_max, (init,), p_out=p_out,
            max_gap=spec.SQOA_MAXRUN - 1,
        )[0]
        out = _emit_pixels(filled, n_pixels, colch, out_ch, n_max)
        return _maybe_words(out, emit), ref_flag != 0

    b = data.astype(jnp.int32)
    is_op, npix, pixoff, packed, has_ref = _reconstruct(
        b, chunks_len[:, None], colch, compat
    )

    # --- expansion: place op values at pixel offsets, forward-fill ---------
    valid_op = is_op & (npix > 0) & (pixoff < n_max)
    init_packed = jnp.int32(np.int32(np.uint32(255 << 24)))
    bsz, m = b.shape
    # (the legacy engine path keeps the full-tile requirement; small
    # power-of-two buffers are only supported by the fused front above)
    if expand != "xla" and m % 32768 == 0 and _use_pallas_expand(m, n_max):
        from ..ops import pallas_engine

        keys_c, pays_c, totals = pallas_engine.compact(
            valid_op, pixoff, [packed]
        )
        filled = pallas_engine.place_fill(
            keys_c, pays_c, totals, n_max,
            (int(np.int32(np.uint32(255 << 24))),),
            p_out=4096 if n_max % 4096 == 0 else 2048,
            max_gap=spec.SQOA_MAXRUN - 1,
        )[0]
    else:
        # XLA fallback: monotone unique scatter + log-shift forward fill;
        # invalid entries get unique OOB targets (dropped by mode=drop)
        idx_b = jnp.arange(m, dtype=jnp.int32)[None, :]
        rows = jnp.arange(bsz, dtype=jnp.int32)[:, None]
        tgt = jnp.where(valid_op, pixoff, n_max + idx_b)
        grid = jnp.zeros((bsz, n_max), jnp.int32).at[rows, tgt].set(
            packed, mode="drop", unique_indices=True
        )
        gridf = jnp.zeros((bsz, n_max), jnp.int32).at[rows, tgt].set(
            jnp.where(valid_op, 1, 0), mode="drop", unique_indices=True
        )
        filled = scan_ops.fill_forward(grid, gridf.astype(bool), init_packed)

    out = _emit_pixels(filled, n_pixels, colch, out_ch, n_max)
    return _maybe_words(out, emit), has_ref


@functools.partial(
    jax.jit,
    static_argnames=("colch", "out_ch", "seg", "seg_px", "src_alpha"),
)
def decode_stream_packed(data, seg_lens, *, colch, out_ch, seg, seg_px,
                         src_alpha=True):
    """Segment-packed decode for small same-size images (icon class).

    Each row of ``data`` carries M/seg images: image j occupies bytes
    [j*seg, (j+1)*seg) — its full stream, header included, zero-padded to
    the segment — and must decode to EXACTLY seg_px pixels. The fused
    front restarts its scans at segment boundaries and emits global
    pixel keys, so one front grid step processes TILE/seg images and one
    placement step up to 32768/seg_px of them — amortizing the
    per-image fixed cost that dominates 4 Kpx icons (one grid step per
    image each in front + placement on the per-image path).

    data: (B, M) uint8, M % 32768 == 0; seg_lens: (B, M/seg) int32 =
    per-image stream length minus padding (the per-image chunks_len).
    Returns (words, has_ref (B,) — per packed ROW: any foreign/REF
    image routes the whole row to the fallback). ``words`` is the
    emit="words" layout of decode_stream_batched over the concatenated
    n_out = (M/seg)*seg_px pixel space: int32 (B, n_out*out_ch//4) for
    color, uint8/uint16 (B, n_out) for mono — image j's pixels start at
    byte offset j*seg_px*out_ch, always word-aligned (seg_px % 4 == 0).
    """
    from ..ops import pallas_engine, pallas_frontend

    bsz0, m0 = data.shape
    k = m0 // seg
    n_out = k * seg_px
    assert seg_px % 4 == 0 and n_out % 2048 == 0
    mode = "mono" if colch == 1 else ("alpha" if src_alpha else "noalpha")
    keys_c, pays_c, totals, ref_flag = pallas_frontend.decode_front_compact(
        data, seg_lens, n_out, mode=mode, rows=256, seg=seg, seg_px=seg_px
    )
    init = int(np.int32(np.uint32(255 << 24)))
    p_out = next(p for p in (32768, 16384, 8192, 4096, 2048)
                 if n_out % p == 0)
    npx_total = jnp.full((bsz0, 1), n_out, jnp.int32)
    if colch == 1:
        out = pallas_engine.place_emit(
            keys_c, pays_c, totals, npx_total, n_out, (init,),
            _dec_epilogue_mono(out_ch), p_out=p_out,
            out_dtype=jnp.uint8 if out_ch == 1 else jnp.uint16,
            max_gap=spec.SQOA_MAXRUN - 1, entry_limit=m0,
        )
        return out, ref_flag != 0
    rows = p_out // 128
    out_rows = rows if out_ch == 4 else rows * 3 // 4
    words = pallas_engine.place_emit(
        keys_c, pays_c, totals, npx_total, n_out, (init,),
        _dec_epilogue(out_ch), p_out=p_out, out_rows=out_rows,
        out_dtype=jnp.int32, entry_limit=m0,
        max_gap=spec.SQOA_MAXRUN - 1,
    )
    return words, ref_flag != 0


def packed_backend_ok() -> bool:
    """Can decode_stream_packed run here? (Pallas: TPU, or the
    interpreter when SEQOIA_PALLAS_INTERPRET=1 — mirrors
    _use_pallas_expand's backend gate.)"""
    import os

    if os.environ.get("SEQOIA_PALLAS_INTERPRET", "") == "1":
        return True
    try:
        return jax.default_backend() != "cpu"
    except RuntimeError:
        return False


def _maybe_words(u8_flat, emit):
    """Flat uint8 pixels -> int32 words when emit="words" (fallback paths;
    the relayout only runs where the in-kernel emission didn't)."""
    if emit != "words":
        return u8_flat
    b, n = u8_flat.shape
    return jax.lax.bitcast_convert_type(
        u8_flat.reshape(b, n // 4, 4), jnp.int32
    )
    """Flat uint8 pixels -> int32 words when emit="words" (fallback paths;
    the relayout only runs where the in-kernel emission didn't)."""
    if emit != "words":
        return u8_flat
    b, n = u8_flat.shape
    return jax.lax.bitcast_convert_type(
        u8_flat.reshape(b, n // 4, 4), jnp.int32
    )


def _reconstruct(b, chunks_len_b, colch, compat):
    """Byte array -> per-position op decomposition. Shape-agnostic along
    the last axis: b is (..., M) int32, chunks_len_b broadcasts against it.
    Returns (is_op, npix, pixoff, packed, has_ref)."""
    token, lens = _tokenize(b, chunks_len_b, colch, compat)
    has_ref = jnp.any(token & (b < spec.OP_ALPHA), axis=-1)

    is_mod = _modifier_mask(b, token, colch, compat)
    is_op = token & ~is_mod
    npix = _npix_table(b, token, is_mod, colch, compat)
    pixoff = scan_ops.blocked_cumsum(npix) - npix  # exclusive

    b1 = _shift_left(b, 1)
    b2 = _shift_left(b, 2)
    is_luma = (b & spec.MASK_2) == spec.OP_LUMA
    is_rgb = b == spec.OP_RGB
    is_rgba = b == spec.OP_RGBA
    vg = (b & 0x3F) - 32

    if colch == 3:
        b3 = _shift_left(b, 3)
        b4 = _shift_left(b, 4)
        # alpha modifier deltas folded into their owning op (the modifier is
        # consumed before the op's pixels are written, so the op's pixels
        # carry the updated alpha)
        mod_delta = jnp.where(is_mod, (b & 0x1F) - 16, 0)
        attached = jnp.zeros_like(b)
        for L in (1, 2, 4, 5):
            attached = attached + jnp.where(
                lens == L, _shift_left(mod_delta, L), 0
            )
        anchor_rgb = is_op & (is_rgb | is_rgba)
        anchor_a = is_op & is_rgba
        luma_op = is_op & is_luma
        r_el = jnp.where(anchor_rgb, b1, jnp.where(luma_op, vg - 8 + ((b1 >> 4) & 15), 0))
        g_el = jnp.where(anchor_rgb, b2, jnp.where(luma_op, vg, 0))
        b_el = jnp.where(anchor_rgb, b3, jnp.where(luma_op, vg - 8 + (b1 & 15), 0))
        a_el = jnp.where(anchor_a, b4, 0) + jnp.where(is_op, attached, 0)
        rg = scan_ops.segmented_modsum(
            scan_ops.pack_pair(r_el, anchor_rgb, g_el, anchor_rgb)
        )
        ba = scan_ops.segmented_modsum(
            scan_ops.pack_pair(b_el, anchor_rgb, a_el, anchor_a)
        )
        r_v, g_v = rg & 255, (rg >> 16) & 255
        b_v, a_v = ba & 255, (ba >> 16) & 255
        a_flag = (ba >> 24) & 1
    else:
        anchor_g = is_op & (is_rgb | is_rgba)
        anchor_a = is_op & is_rgba
        g_el = jnp.where(anchor_g, b1, jnp.where(is_op & is_luma, vg, 0))
        a_el = jnp.where(anchor_a, b2, 0)
        ga = scan_ops.segmented_modsum(
            scan_ops.pack_pair(g_el, anchor_g, a_el, anchor_a)
        )
        g_v = ga & 255
        a_v = (ga >> 16) & 255
        a_flag = (ga >> 24) & 1
        r_v = b_v = g_v

    # alpha starts at 255 until the first RGBA anchor (initial state,
    # seqoia.h:716-719); r/g/b start at 0 which the scans give for free.
    a_v = jnp.where(a_flag == 1, a_v, (a_v + 255) & 255)

    packed = r_v | (g_v << 8) | (b_v << 16) | (a_v << 24)
    return is_op, npix, pixoff, packed, has_ref


@functools.partial(
    jax.jit, static_argnames=("colch", "out_ch", "n_max", "expand")
)
def decode_stream_flat(data, chunks_len, n_pixels, *, colch, out_ch, n_max,
                       expand="auto"):
    """Single large-image SQOA decode with rank-1 internals.

    Identical algorithm to the batched kernel, but every intermediate is a
    flat (M,) array: on TPU a rank-2 (1, M) buffer pads its unit sublane
    dimension 8x, which makes the 100-400 Mpx single-image workload
    (seqoia.h:428-432, BASELINE config 5) blow HBM; rank-1 (and the
    engine's internal rank-3) layouts are tight.

    data: (M,) uint8. Returns ((n_max*out_ch,) flat uint8, has_ref scalar).
    """
    b = data.astype(jnp.int32)
    is_op, npix, pixoff, packed, has_ref = _reconstruct(
        b, chunks_len, colch, False
    )

    valid_op = is_op & (npix > 0) & (pixoff < n_max)
    init_packed = jnp.int32(np.int32(np.uint32(255 << 24)))
    m = b.shape[0]
    if expand != "xla" and m % 32768 == 0 and _use_pallas_expand(m, n_max):
        from ..ops import pallas_engine

        keys_c, pays_c, totals = pallas_engine.compact(
            valid_op[None], pixoff[None], [packed[None]]
        )
        filled = pallas_engine.place_fill(
            keys_c, pays_c, totals, n_max,
            (int(np.int32(np.uint32(255 << 24))),),
            p_out=4096 if n_max % 4096 == 0 else 2048,
            max_gap=spec.SQOA_MAXRUN - 1,
        )[0][0]
    else:
        idx_b = jnp.arange(m, dtype=jnp.int32)
        tgt = jnp.where(valid_op, pixoff, n_max + idx_b)
        grid = jnp.zeros((n_max,), jnp.int32).at[tgt].set(
            packed, mode="drop", unique_indices=True
        )
        gridf = jnp.zeros((n_max,), jnp.int32).at[tgt].set(
            jnp.where(valid_op, 1, 0), mode="drop", unique_indices=True
        )
        filled = scan_ops.fill_forward(grid, gridf.astype(bool), init_packed)

    # flat emit ((n_max,) temps; flat interleaved output lays out tight)
    r = filled & 255
    g = (filled >> 8) & 255
    bb = (filled >> 16) & 255
    a = (filled >> 24) & 255
    if out_ch >= 3 and colch == 3:
        cols = [r, g, bb]
    elif out_ch >= 3:
        cols = [g, g, g]
    else:
        cols = [g]
    if out_ch in (2, 4):
        cols.append(a)
    out = jnp.stack(cols[:out_ch], axis=1).astype(jnp.uint8)
    t = jnp.arange(n_max, dtype=jnp.int32)
    out = jnp.where((t < n_pixels)[:, None], out, 0)
    return out.reshape(n_max * out_ch), has_ref


def _emit_pixels(filled, n_pixels, colch, out_ch, n_max):
    """Packed int32 pixel grid -> flat interleaved uint8 (B, n_max*out_ch).

    Flat output deliberately: a rank-3 (B, n_max, out_ch) uint8 array puts
    out_ch in the 128-lane minor dimension on TPU — a 32-43x padded layout
    that costs a giant relayout copy. Callers reshape on the host."""
    r = filled & 255
    g = (filled >> 8) & 255
    bb = (filled >> 16) & 255
    a = (filled >> 24) & 255

    t = jnp.arange(n_max, dtype=jnp.int32)[None, :]
    if out_ch >= 3 and colch == 3:
        cols = [r, g, bb]
    elif out_ch >= 3:
        cols = [g, g, g]
    else:
        cols = [g]
    if out_ch in (2, 4):
        cols.append(a)
    out = jnp.stack(cols[:out_ch], axis=2).astype(jnp.uint8)
    out = jnp.where((t < n_pixels[:, None])[:, :, None], out, 0)
    return out.reshape(out.shape[0], n_max * out_ch)


@functools.partial(
    jax.jit, static_argnames=("colch", "compat", "out_ch", "n_max",
                              "src_alpha")
)
def decode_stream(data, chunks_len, n_pixels, *, colch, compat, out_ch, n_max,
                  src_alpha=True):
    """Single-stream decode: (M,) uint8 -> ((n_max*out_ch,) flat uint8, has_ref).

    Thin wrapper over the batched kernel."""
    out, has_ref = decode_stream_batched(
        data[None, :],
        jnp.asarray(chunks_len, jnp.int32)[None],
        jnp.asarray(n_pixels, jnp.int32)[None],
        colch=colch, compat=compat, out_ch=out_ch, n_max=n_max,
        src_alpha=src_alpha,
    )
    return out[0], has_ref[0]
