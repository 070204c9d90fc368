"""Per-slot last-writer resolution kernel (QOI-compat index table).

The QOI-compat color index (reference: seqoia.h:753-755,785-787) is a
64-slot hash table where every decoded pixel writes its own hash slot.
An INDEX op reads the slot *before* its own position, i.e. the value of
the latest earlier op whose pixel hashed to the queried slot.

``slot_last_writer`` answers all queries in one pass: for each position i
with qslot[i] = k >= 0, return value[j] for the largest j < i with
hash[j] == k (or `init` if none). Positions with qslot = -1 return init.

The kernel walks 32768-entry tiles; per tile it runs one forward-fill per
slot over the tile's registers (the slot loop is a static 64-way unroll of
log-shift scans — fully vectorized, no fori_loop), resolves queries with
an exclusive one-position shift, and carries the 64-slot table across
tiles in SMEM. Slot counts beyond 64 are supported up to 128 (mono-compat
decoder quirk, seqoia.h:656,690-693).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import ktools

_INTERPRET = os.environ.get("SEQOIA_PALLAS_INTERPRET", "") == "1"

_L = 128
_ROWS = 256
_TILE = _ROWS * _L


def _slot_kernel(n_slots, init, *refs):
    n_ref, hash_ref, val_ref, q_ref, out_ref, table, written, sem = refs

    bi = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        for k in range(n_slots):
            table[k] = init
            written[k] = 0

    # skip tiles entirely past the row's live entries (op space is often
    # only a fraction of the padded buffer)
    @pl.when(t * _TILE < n_ref[bi])
    def _():
        h = hash_ref[0]
        v = val_ref[0]
        q = q_ref[0]

        # one forward-fill per slot; a fori_loop (not an unrolled Python
        # loop) keeps Mosaic's stack allocation at a single iteration's
        # register footprint
        def body(k, out):
            mask = (h == k).astype(jnp.int32)
            fv, ff = ktools.fill_scan(jnp.where(mask != 0, v, 0), mask, _ROWS)
            # exclusive: query at i sees writers strictly before i
            fv_ex = ktools.flat_shift_right(fv, 1, 0)
            ff_ex = ktools.flat_shift_right(ff, 1, 0)
            resolved = jnp.where(
                ff_ex != 0, fv_ex,
                jnp.where(written[k] != 0, table[k], init),
            )
            out = jnp.where(q == k, resolved, out)
            # carry: last writer of slot k in this tile (if any)
            tile_v = ktools.extract(fv, _ROWS - 1, _L - 1)
            tile_f = ktools.extract(ff, _ROWS - 1, _L - 1)
            table[k] = jnp.where(tile_f != 0, tile_v, table[k])
            written[k] = written[k] | tile_f
            return out

        out_ref[0] = jax.lax.fori_loop(
            0, n_slots, body, jnp.full((_ROWS, _L), init, jnp.int32)
        )

    @pl.when(t * _TILE >= n_ref[bi])
    def _():
        out_ref[0] = jnp.full((_ROWS, _L), init, jnp.int32)


@functools.partial(jax.jit, static_argnames=("n_slots", "init"))
def _slot_call(n_live, hashes, values, qslots, n_slots, init):
    b, m = hashes.shape
    t = m // _TILE
    kern = functools.partial(_slot_kernel, n_slots, init)
    spec = pl.BlockSpec(
        (1, _ROWS, _L), lambda bi, ti: (bi, ti, 0),
        memory_space=pltpu.VMEM,
    )
    out = pl.pallas_call(
        kern,
        grid=(b, t),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [spec] * 3,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, t * _ROWS, _L), jnp.int32),
        scratch_shapes=[
            pltpu.SMEM((n_slots,), jnp.int32),
            pltpu.SMEM((n_slots,), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=_INTERPRET,
    )(
        n_live,
        hashes.reshape(b, t * _ROWS, _L),
        values.reshape(b, t * _ROWS, _L),
        qslots.reshape(b, t * _ROWS, _L),
    )
    return out.reshape(b, m)


def slot_last_writer(hashes, values, qslots, n_slots=64, init=0, n_live=None):
    """For each position i with qslots[i] >= 0: values[j] of the largest
    j < i with hashes[j] == qslots[i], else `init`. hashes outside [0,
    n_slots) never match (use e.g. -1 to mark non-writers). Shapes (B, M)
    int32, M % 32768 == 0. ``n_live`` (B,) bounds the live prefix per row
    (tiles past it are skipped and return init)."""
    if n_live is None:
        n_live = jnp.full((hashes.shape[0],), hashes.shape[1], jnp.int32)
    return _slot_call(n_live, hashes, values, qslots, n_slots, init)
