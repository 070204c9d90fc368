"""TPU-native SQOA/QOI encoder: the reference's sequential per-pixel loop
(reference: seqoia.h:530-638) reformulated as a fully data-parallel pipeline.

Reformulation (SURVEY.md §5.7/§7.3):

* ``px_prev`` is a shift, not a scan: the previous-pixel state at step i is
  always the value of pixel i-1.
* Run segmentation: a pixel "continues" a run iff it equals its predecessor.
  The run length pending at a change pixel is closed-form from the distance
  to the previous change pixel (an inclusive cummax of change indices), and
  the reference's run chunking (61-blocks, BIGRUN at exact 512-multiples,
  trailing BIGRUN, reference: seqoia.h:544-561,640-642) is closed-form per
  segment.
* The QOI-compat 64-entry color index is an associative last-writer-wins
  state. Because the reference inserts on *every* miss (reference:
  seqoia.h:563-582), the table slot for hash h before pixel i always holds
  the color of the most recent earlier change pixel whose color hashes to h.
  We resolve that with one lexicographic sort by (hash, position) instead of
  scanning 64-slot states.
* Variable-length byte emission: each pixel's byte count is closed-form; an
  exclusive prefix sum assigns offsets and the stream is compacted with a
  searchsorted gather (gathers beat scatters on TPU).

Everything here is shape-static and jit-friendly; ``n_valid`` masking allows
bucketed batching without retracing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import spec

# Emission matrix width: worst case is a change pixel flushing a pending run
# of 511 px (8x RUN|60 + 1 final RUN byte) followed by a 5-byte RGBA op.
_MAXB = 14
_FLUSH_MAX = 9


def _wrap8(x):
    """int8 wraparound semantics on int32 values (C signed char deltas)."""
    return ((x + 128) & 255) - 128


def _pack(px):
    """(..., 4) channel values -> packed int32 for O(1) equality."""
    return px[..., 0] | (px[..., 1] << 8) | (px[..., 2] << 16) | (px[..., 3] << 24)


def _compat_index_found(packed, change, hashes, n):
    """For each change pixel, does the QOI color index hit?

    The index slot h before pixel i holds the color of the most recent change
    pixel j<i with hash(px[j])==h (zero if none). We find j per-pixel by
    sorting (key=hash-or-sentinel, position) and looking at the left sorted
    neighbour, then scattering back.
    """
    idx = jnp.arange(n, dtype=jnp.int32)
    keys = jnp.where(change, hashes, jnp.int32(spec.QOI_INDEX_SIZE))
    sorted_keys, sorted_idx = jax.lax.sort((keys, idx), num_keys=2)
    left_same = jnp.concatenate(
        [jnp.zeros((1,), bool), sorted_keys[1:] == sorted_keys[:-1]]
    )
    pred_sorted = jnp.where(
        left_same, jnp.concatenate([jnp.zeros((1,), jnp.int32), sorted_idx[:-1]]), -1
    )
    pred = jnp.zeros((n,), jnp.int32).at[sorted_idx].set(pred_sorted)
    table_val = jnp.where(pred >= 0, packed[jnp.maximum(pred, 0)], 0)
    return change & (table_val == packed), table_val


def _run_flush_bytes(r, k):
    """k-th byte of the run-flush sequence for a pending run of r pixels.

    Chunking per reference seqoia.h:554-561: full 61-px RUN|60 bytes followed
    by one RUN|(rem-1) byte.
    """
    n_full = jnp.maximum(r - 1, 0) // 61
    is_last = k == n_full
    rem = r - 61 * n_full
    return jnp.where(
        is_last, spec.OP_RUN | (rem - 1), spec.OP_RUN | 60
    ).astype(jnp.int32)


from .encode_v2 import encode_stream  # gather-free encoder (canonical)


@functools.partial(
    jax.jit,
    static_argnames=("colch", "has_alpha", "compat", "out_cap"),
)
def _encode_stream_v1(rgba, n_valid, *, colch, has_alpha, compat, out_cap):
    """Gather-based encoder (v1) — superseded by encode_v2 on TPU; kept as a
    differential reference implementation.

    Args:
      rgba: (N, 4) int32, channel values in [0,255]. Mono inputs must be
        normalized to r=b=0, gray in g; missing alpha to 255 (matching the
        reference's never-written union fields, seqoia.h:520-525,531-541).
      n_valid: scalar int32, number of real pixels (<= N); the rest is
        padding and emits nothing.
      colch: 1 or 3 (static). has_alpha/compat: bool (static).
      out_cap: static output buffer size in bytes (chunks only, no header).

    Returns:
      (out, total): out is (out_cap,) uint8 holding chunk bytes, the trailing
      BIGRUN (if any) and the 8-byte end marker; total is the number of
      meaningful bytes in out.
    """
    n = rgba.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    valid = idx < n_valid
    maxrun = spec.QOI_MAXRUN if compat else spec.SQOA_MAXRUN

    packed = _pack(rgba)
    init = jnp.int32(np.int32(np.uint32(255 << 24)))  # (0,0,0,255) packed
    prev_packed = jnp.concatenate([jnp.full((1,), init), packed[:-1]])
    prev = jnp.concatenate(
        [jnp.array([[0, 0, 0, 255]], jnp.int32), rgba[:-1]], axis=0
    )

    same = (packed == prev_packed) & valid
    change = (~same) & valid

    # Index of the most recent change pixel at or before i (-1 if none).
    last_change = jax.lax.associative_scan(
        jnp.maximum, jnp.where(change, idx, -1)
    )
    # For pixel i, the change strictly before it:
    prev_change = jnp.concatenate([jnp.full((1,), -1), last_change[:-1]])

    # --- run bookkeeping ---------------------------------------------------
    # A change pixel at i flushes the pending run of the preceding segment:
    # L = i-1 - prev_change[i] pixels accumulated, of which multiples of
    # maxrun were already emitted as BIGRUN bytes by the pixels that hit the
    # counter, leaving r = L % maxrun to flush now.
    seg_len = idx - 1 - prev_change
    pending = jnp.where(change, seg_len % maxrun, 0)
    flush_n = jnp.where(
        pending > 0, (pending - 1) // 61 + 1, 0
    )

    # A same pixel at i sits at 1-based position j in its segment and emits
    # one BIGRUN byte iff j is an exact multiple of maxrun
    # (reference: seqoia.h:544-549; in QOI mode the byte 0xfd is RUN|61).
    seg_pos = idx - last_change  # last_change here = segment's change anchor
    bigrun = same & (seg_pos % maxrun == 0)

    # --- per-change-pixel op classification ---------------------------------
    cr, cg, cb, ca = rgba[:, 0], rgba[:, 1], rgba[:, 2], rgba[:, 3]
    vr = _wrap8(cr - prev[:, 0])
    vg = _wrap8(cg - prev[:, 1])
    vb = _wrap8(cb - prev[:, 2])
    va = _wrap8(ca - prev[:, 3])
    vg_r = _wrap8(vr - vg)
    vg_b = _wrap8(vb - vg)
    alpha_changed = va != 0
    luma_ok = (
        (vg_r >= -8) & (vg_r <= 7)
        & (vg >= -32) & (vg <= 31)
        & (vg_b >= -8) & (vg_b <= 7)
        & (va >= -16) & (va <= 15)
    )

    ob = [jnp.zeros((n,), jnp.int32) for _ in range(5)]  # op byte columns
    if compat:
        hashes = (cr * 3 + cg * 5 + cb * 7 + ca * 11) % spec.QOI_INDEX_SIZE
        found, _ = _compat_index_found(packed, change, hashes, n)
        diff_ok = (
            (vr >= -2) & (vr <= 1) & (vg >= -2) & (vg <= 1) & (vb >= -2) & (vb <= 1)
        )
        # Priority: INDEX > (miss & alpha-change -> RGBA) > DIFF > LUMA > RGB
        # (reference: seqoia.h:563-634)
        use_index = found
        use_rgba = (~found) & alpha_changed
        use_diff = (~use_index) & (~use_rgba) & diff_ok
        use_luma = (~use_index) & (~use_rgba) & (~use_diff) & luma_ok
        use_rgb = (~use_index) & (~use_rgba) & (~use_diff) & (~use_luma)

        op_len = (
            use_index * 1 + use_rgba * 5 + use_diff * 1 + use_luma * 2 + use_rgb * 4
        )
        b0 = jnp.select(
            [use_index, use_rgba, use_diff, use_luma],
            [
                hashes,
                jnp.full((n,), spec.OP_RGBA),
                spec.QOI_OP_DIFF | ((vr + 2) << 4) | ((vg + 2) << 2) | (vb + 2),
                spec.OP_LUMA | (vg + 32),
            ],
            jnp.full((n,), spec.OP_RGB),
        )
        b1 = jnp.select(
            [use_rgba, use_luma],
            [cr, ((vg_r + 8) << 4) | (vg_b + 8)],
            cr,  # RGB
        )
        ob[0], ob[1], ob[2], ob[3], ob[4] = b0, b1, cg, cb, ca
    elif colch == 3:
        use_luma = luma_ok
        op_len = jnp.where(
            use_luma,
            2 + alpha_changed.astype(jnp.int32),
            4 + alpha_changed.astype(jnp.int32),
        )
        ob[0] = jnp.where(
            use_luma, spec.OP_LUMA | (vg + 32), spec.OP_RGB | alpha_changed
        )
        ob[1] = jnp.where(use_luma, ((vg_r + 8) << 4) | (vg_b + 8), cr)
        ob[2] = jnp.where(use_luma, spec.OP_ALPHA | (va + 16), cg)
        ob[3] = cb
        ob[4] = ca
    else:
        # Mono SQOA (reference: seqoia.h:601-634 with col_channels==1).
        use_ga = alpha_changed  # 0xff g a
        use_luma = (~alpha_changed) & luma_ok
        op_len = jnp.where(use_ga, 3, jnp.where(use_luma, 1, 2))
        ob[0] = jnp.select(
            [use_ga, use_luma],
            [jnp.full((n,), spec.OP_RGBA), spec.OP_LUMA | (vg + 32)],
            jnp.full((n,), spec.OP_RGB),
        )
        ob[1] = cg
        ob[2] = ca

    # --- per-pixel byte emission --------------------------------------------
    total_len = jnp.where(
        change, flush_n + op_len, jnp.where(bigrun, 1, 0)
    ).astype(jnp.int32)

    col = jnp.arange(_MAXB, dtype=jnp.int32)[None, :]  # (1, MAXB)
    flush_n2 = flush_n[:, None]
    in_flush = col < flush_n2
    op_col = col - flush_n2  # op byte index for this column
    flush_byte = _run_flush_bytes(pending[:, None], col)
    op_byte = jnp.select(
        [op_col == 0, op_col == 1, op_col == 2, op_col == 3],
        [ob[0][:, None], ob[1][:, None], ob[2][:, None], ob[3][:, None]],
        ob[4][:, None],
    )
    change_bytes = jnp.where(in_flush, flush_byte, op_byte)
    bytes_mat = jnp.where(
        change[:, None],
        change_bytes,
        jnp.full((n, _MAXB), spec.OP_BIGRUN, jnp.int32),
    ).astype(jnp.uint8)

    # --- compaction ----------------------------------------------------------
    offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(total_len, dtype=jnp.int32)]
    )
    chunk_total = offsets[-1]
    offsets = offsets[:-1]

    t = jnp.arange(out_cap, dtype=jnp.int32)
    src = jnp.searchsorted(offsets, t, side="right").astype(jnp.int32) - 1
    src = jnp.clip(src, 0, n - 1)
    k = t - offsets[src]
    out = bytes_mat[src, jnp.clip(k, 0, _MAXB - 1)]
    out = jnp.where(t < chunk_total, out, 0).astype(jnp.uint8)

    # --- trailing run + end marker -------------------------------------------
    # Any pending run at image end is emitted as a single BIGRUN regardless
    # of length (reference: seqoia.h:640-642).
    last_c = jnp.max(jnp.where(change, idx, -1))
    trail_pending = ((n_valid - 1) - last_c) % maxrun
    has_trail = (trail_pending > 0) & (n_valid > 0)
    pad = jnp.asarray(np.frombuffer(spec.PADDING, dtype=np.uint8))
    tail = jnp.where(
        has_trail,
        jnp.concatenate([jnp.array([spec.OP_BIGRUN], jnp.uint8), pad]),
        jnp.concatenate([pad, jnp.zeros((1,), jnp.uint8)]),
    )
    out = jax.lax.dynamic_update_slice(out, tail, (chunk_total,))
    total = chunk_total + 8 + has_trail.astype(jnp.int32)
    return out, total


def normalize_pixels(pixels: np.ndarray, desc: spec.SqoaDesc) -> np.ndarray:
    """Flat interleaved input buffer -> (N, 4) int32 RGBA with the encoder's
    initial-state conventions (mono: gray in g, r=b=0; no alpha: a=255)."""
    n = desc.n_pixels
    stride = desc.norm_channels
    arr = np.asarray(pixels, dtype=np.uint8).reshape(n, stride)
    out = np.zeros((n, 4), dtype=np.int32)
    out[:, 3] = 255
    if desc.col_channels == 3:
        out[:, 0] = arr[:, 0]
        out[:, 1] = arr[:, 1]
        out[:, 2] = arr[:, 2]
    else:
        out[:, 1] = arr[:, 0]
    if desc.has_alpha:
        out[:, 3] = arr[:, desc.col_channels]
    return out


def encode(pixels, desc: spec.SqoaDesc) -> bytes | None:
    """Full-file encode through the TPU path. Returns the file bytes or None
    on invalid arguments (mirrors sqoa_encode's contract, seqoia.h:465-480).
    """
    if pixels is None or not spec.validate_encode_desc(desc):
        return None
    rgba_np = normalize_pixels(pixels, desc)
    # Bucket the pixel count to a power of two so image sizes share traces;
    # n_valid masks the padding out of the emission.
    n = desc.n_pixels
    n_pad = 1 << max(n - 1, 1).bit_length()
    if n_pad > n:
        rgba_np = np.concatenate(
            [rgba_np, np.zeros((n_pad - n, 4), np.int32)], axis=0
        )
    cap = n_pad * (desc.norm_channels + 1) + spec.PADDING_SIZE + 1
    cap = -(-cap // 2048) * 2048  # pallas spread tile multiple
    out, total = encode_stream(
        jnp.asarray(rgba_np),
        jnp.int32(n),
        colch=desc.col_channels,
        has_alpha=desc.has_alpha,
        compat=bool(desc.qoi_compat),
        out_cap=int(cap),
    )
    total = int(total)
    return spec.pack_header(desc) + bytes(np.asarray(out[:total]))
