"""TPU-native QOI-compat decoder: optimistic fixpoint over the index table.

The compat color index (reference: seqoia.h:753-755,785-787) is genuinely
sequential state: every decoded pixel writes table[hash(px)] = px, and an
INDEX op reads a slot whose content depends on all earlier values — whose
values may themselves come from INDEX ops.

The parallel formulation used here exploits that the defining equations
form a strict recursion (each op's value depends only on strictly earlier
ops), so the fixpoint of

    px_i    = f_i(px_{i-1})                      for delta/absolute ops
    px_i    = px_{j*},  j* = max{j<i : hash(px_j) = k_i}   for INDEX ops

is *unique* — any converged solution equals the sequential decode. We
iterate optimistically: assume INDEX values (initially the zeroed table),
rebuild every value with segmented modular channel scans, resolve all
INDEX reads against the assumed values with one pass of the slot
last-writer kernel (ops/pallas_slots.py), and repeat until no assumption
changes. Each iteration extends the correct prefix past at least one more
wrong guess.

Convergence is content-dependent: when INDEX ops form deep dependency
chains (one INDEX feeding the colors that later INDEX ops look up —
palette-heavy icons are the worst case), the wavefront can advance only
one chain link per iteration, so the loop caps at ``_MAX_ITERS`` and
flags unconverged rows for the caller. That is a fundamental property of
the format, not of this kernel: the hash-table recursion is sequential
pointer-chasing, which has no profitable mapping onto a vector unit — the
reference itself decodes it strictly sequentially (seqoia.h:753-787).
The framework therefore dispatches hybrid: this TPU path serves streams
whose chains are shallow, and unconverged rows are decoded by the native
runtime on host cores, batch-parallel across images
(parallel/batch.py::BatchDecoder).

Covers color (colch=3) compat streams; mono compat (a decoder-only quirk,
unreachable from the encoder — seqoia.h:477-480) stays on the lax.scan
path in decode_jax.py.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from .. import spec
from ..ops import scan_ops
from . import decode_v2

# Iteration cap before flagging non-convergence. INDEX-dependency chains
# advance ~one link per iteration; measured on the qoi-bench-like corpus
# (NOTES_ROUND3.md), INDEX-light content converges in <= 3 iterations and
# palette-heavy icon content either converges early or runs to hundreds of
# links — iterating past ~12 buys nothing, the host fallback wins.
# Overridable for tuning experiments.
_MAX_ITERS = int(os.environ.get("SEQOIA_FIXPOINT_ITERS", "12"))
_INIT_PACKED = int(np.int32(np.uint32(255 << 24)))


def fixpoint_ok(m: int, colch: int) -> bool:
    """Whether the Pallas fixpoint path can run (color mode, tile-aligned
    stream buffer, non-CPU backend or interpret-mode testing)."""
    import os

    if colch != 3 or m % 32768 != 0:
        return False
    if os.environ.get("SEQOIA_PALLAS_INTERPRET", "") == "1":
        return True
    try:
        backend = jax.default_backend()
    except RuntimeError:
        return False
    return backend != "cpu"


def _op_values(ops, iv, valid):
    """Per-op packed RGBA given assumed INDEX values `iv` (packed)."""
    b0, b1, b2, b3, b4 = ops
    is_rgb = b0 == spec.OP_RGB
    is_rgba = b0 == spec.OP_RGBA
    is_index = (b0 < spec.QOI_INDEX_SIZE) & valid
    is_diff = (b0 & spec.MASK_2) == spec.QOI_OP_DIFF
    is_luma = ((b0 & spec.MASK_2) == spec.OP_LUMA) & ~is_rgb & ~is_rgba
    vg = (b0 & 0x3F) - 32

    r_reset = (is_rgb | is_rgba | is_index) & valid
    a_reset = (is_rgba | is_index) & valid
    r_el = jnp.select(
        [is_index, is_rgb | is_rgba, is_diff, is_luma],
        [iv & 255, b1, ((b0 >> 4) & 3) - 2, vg - 8 + ((b1 >> 4) & 15)],
        0,
    )
    g_el = jnp.select(
        [is_index, is_rgb | is_rgba, is_diff, is_luma],
        [(iv >> 8) & 255, b2, ((b0 >> 2) & 3) - 2, vg],
        0,
    )
    b_el = jnp.select(
        [is_index, is_rgb | is_rgba, is_diff, is_luma],
        [(iv >> 16) & 255, b3, (b0 & 3) - 2, vg - 8 + (b1 & 15)],
        0,
    )
    a_el = jnp.select([is_index, is_rgba], [(iv >> 24) & 255, b4], 0)
    r_el = jnp.where(valid, r_el, 0)
    g_el = jnp.where(valid, g_el, 0)
    b_el = jnp.where(valid, b_el, 0)
    a_el = jnp.where(valid, a_el, 0)

    rg = scan_ops.segmented_modsum(
        scan_ops.pack_pair(r_el, r_reset, g_el, r_reset)
    )
    ba = scan_ops.segmented_modsum(
        scan_ops.pack_pair(b_el, r_reset, a_el, a_reset)
    )
    r_v, g_v = rg & 255, (rg >> 16) & 255
    b_v, a_v = ba & 255, (ba >> 16) & 255
    # alpha starts at 255 until the first anchor (seqoia.h:716-719)
    a_v = jnp.where((ba >> 24) & 1 == 1, a_v, (a_v + 255) & 255)
    return r_v | (g_v << 8) | (b_v << 16) | (a_v << 24), is_index


@functools.partial(
    jax.jit, static_argnames=("colch", "out_ch", "n_max", "expand")
)
def decode_stream_compat_batched(data, chunks_len, n_pixels, *, colch,
                                 out_ch, n_max, expand="auto"):
    """Batched QOI-compat decode, color mode. data: (B, M) uint8 with
    M % 32768 == 0. Returns (pixels (B, n_max*out_ch) flat uint8, converged
    (B,) bool). Unconverged rows must be re-decoded by the caller on the
    host path."""
    assert colch == 3, "mono compat stays on the lax.scan path"
    from ..ops import pallas_engine, pallas_slots

    bsz, m = data.shape
    b = data.astype(jnp.int32)
    token, _lens = decode_v2._tokenize(b, chunks_len[:, None], colch, True)
    idx = jnp.arange(m, dtype=jnp.int32)[None, :]

    lo = b | (decode_v2._shift_left(b, 1) << 8) \
        | (decode_v2._shift_left(b, 2) << 16) \
        | (decode_v2._shift_left(b, 3) << 24)
    hi = decode_v2._shift_left(b, 4)
    keys_c, pays_c, totals = pallas_engine.compact(
        token, jnp.broadcast_to(idx, (bsz, m)), [lo, hi]
    )
    mo = m  # op count <= usable bytes <= m
    lo_c, hi_c = pays_c[0][:, :mo], pays_c[1][:, :mo]
    ops = (
        lo_c & 255, (lo_c >> 8) & 255, (lo_c >> 16) & 255,
        (lo_c >> 24) & 255, hi_c & 255,
    )
    oidx = jnp.arange(mo, dtype=jnp.int32)[None, :]
    valid = oidx < totals[:, None]
    b0 = ops[0]

    qslot = jnp.where((b0 < spec.QOI_INDEX_SIZE) & valid, b0, -1)

    def body(state):
        iv, _, it, _ = state
        px, is_index = _op_values(ops, iv, valid)
        hashes = jnp.where(
            valid,
            ((px & 255) * 3 + ((px >> 8) & 255) * 5
             + ((px >> 16) & 255) * 7 + ((px >> 24) & 255) * 11)
            % spec.QOI_INDEX_SIZE,
            -1,
        )
        resolved = pallas_slots.slot_last_writer(
            hashes, px, qslot, init=0, n_live=totals
        )
        new_iv = jnp.where(is_index, resolved, 0)
        stable = jnp.all(new_iv == iv, axis=-1)
        return new_iv, px, it + 1, stable

    def cond(state):
        _, _, it, stable = state
        return (it < _MAX_ITERS) & ~jnp.all(stable)

    iv0 = jnp.zeros((bsz, mo), jnp.int32)
    state = body((iv0, iv0, jnp.int32(0), jnp.zeros((bsz,), bool)))
    iv, px, _, stable = jax.lax.while_loop(cond, body, state)
    # one final value pass so px reflects the converged assumptions
    px, _ = _op_values(ops, iv, valid)

    # --- expansion: ops -> pixels -------------------------------------------
    run_px = (b0 & 0x3F) + 1
    npix = jnp.where(b0 >= spec.OP_RUN, run_px, 1)
    npix = jnp.where((b0 == spec.OP_RGB) | (b0 == spec.OP_RGBA), 1, npix)
    npix = jnp.where(valid, npix, 0)
    pixoff = scan_ops.blocked_cumsum(npix) - npix

    valid_op = valid & (pixoff < n_max)
    if expand != "xla" and mo % 32768 == 0 and decode_v2._use_pallas_expand(
            mo, n_max):
        pad = 8192
        keys_p = jnp.pad(jnp.where(valid_op, pixoff, 2**30), ((0, 0), (0, pad)))
        px_p = jnp.pad(px, ((0, 0), (0, pad)))
        n_ops = jnp.sum(valid_op, axis=-1)
        filled = pallas_engine.place_fill(
            keys_p, [px_p], n_ops, n_max, (_INIT_PACKED,),
            p_out=next(p for p in (32768, 16384, 8192, 4096, 2048)
                       if n_max % p == 0),
            max_gap=spec.QOI_MAXRUN - 1,  # a QOI op covers <= 62 px
        )[0]
    else:
        rows = jnp.arange(bsz, dtype=jnp.int32)[:, None]
        tgt = jnp.where(valid_op, pixoff, n_max + oidx)
        grid = jnp.zeros((bsz, n_max), jnp.int32).at[rows, tgt].set(
            px, mode="drop", unique_indices=True
        )
        gridf = jnp.zeros((bsz, n_max), jnp.int32).at[rows, tgt].set(
            jnp.where(valid_op, 1, 0), mode="drop", unique_indices=True
        )
        filled = scan_ops.fill_forward(
            grid, gridf.astype(bool), jnp.int32(_INIT_PACKED)
        )

    out = decode_v2._emit_pixels(filled, n_pixels, colch, out_ch, n_max)
    return out, stable
