"""Scan primitives tuned for TPU/XLA.

Why these exist (measured on v5e, see bench notes in git history):

* ``jnp.cumsum``/``lax.associative_scan`` along the minor axis lower to
  O(N*W) reduce-windows on TPU — 47 ms for a 1 MB row. Prefix sums here are
  either log-shift (Hillis-Steele: log2 N shifted elementwise passes, fully
  VPU-vectorized) or blocked via triangular matmuls on the MXU.
* Random gathers serialize on TPU (~11 ns/element); every algorithm in this
  package is formulated with shifts, scans, sorts and at most one scatter.

All functions operate along the last axis and accept arbitrary leading batch
dimensions.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _shift_right(x, k, fill):
    """x[..., i-k] with `fill` in the first k lanes (contiguous copy, cheap)."""
    pad = [(0, 0)] * (x.ndim - 1) + [(k, 0)]
    return jnp.pad(x, pad, constant_values=fill)[..., : x.shape[-1]]


_PALLAS_TILE = 256 * 128


def _pallas_ok(x) -> bool:
    """Route big aligned scans through the single-pass Pallas tile-scan on
    TPU backends; keep the XLA log-shift path on CPU (tests) and for small
    or misaligned shapes."""
    import os

    if os.environ.get("SEQOIA_PALLAS_INTERPRET", "") == "1":
        return x.shape[-1] % _PALLAS_TILE == 0
    try:
        backend = jax.default_backend()
    except RuntimeError:
        return False
    return (
        backend not in ("cpu",)
        and x.shape[-1] % _PALLAS_TILE == 0
    )


def hillis_max(x, fill=None):
    """Inclusive running maximum along the last axis (log-shift scan)."""
    if fill is None:
        fill = np.iinfo(np.int32).min
    if fill == np.iinfo(np.int32).min and _pallas_ok(x):
        from . import pallas_scan

        return pallas_scan.cummax(x)
    n = x.shape[-1]
    k = 1
    while k < n:
        x = jnp.maximum(x, _shift_right(x, k, fill))
        k *= 2
    return x


def hillis_sum(x):
    """Inclusive prefix sum via log-shift (use blocked_cumsum for large n)."""
    n = x.shape[-1]
    k = 1
    while k < n:
        x = x + _shift_right(x, k, 0)
        k *= 2
    return x


def blocked_cumsum(x, block: int = 512):
    """Exact int32 inclusive prefix sum along the last axis.

    In-block prefixes ride the MXU as fp32 triangular matmuls (exact while
    block sums stay < 2^24); the block-offset level accumulates in int32 via
    a log-shift scan, so totals up to int32 range are exact.
    """
    *lead, n = x.shape
    if n % block != 0 or n <= block:
        return hillis_sum(x)
    r = n // block
    xr = x.reshape(*lead, r, block).astype(jnp.float32)
    # inrow[..., c] = sum_{j<=c} xr[..., j]  (T[j, c] = 1 iff j <= c)
    ut = jnp.triu(jnp.ones((block, block), jnp.float32))
    inrow = jax.lax.dot_general(
        xr, ut,
        dimension_numbers=(((xr.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    totals = inrow[..., -1].astype(jnp.int32)  # (lead, r)
    offs = hillis_sum(totals) - totals  # exclusive block offsets, int32-exact
    return (inrow.astype(jnp.int32) + offs[..., None]).reshape(*lead, n)


def fill_forward(values, valid, init):
    """For each position, the `values` entry at the most recent position with
    ``valid`` true (or ``init`` before any). Log-shift segmented copy scan."""
    if _pallas_ok(values):
        from . import pallas_scan

        return pallas_scan.fill_forward(values, valid, init)
    n = values.shape[-1]
    k = 1
    v, f = values, valid
    while k < n:
        vs = _shift_right(v, k, 0)
        fs = _shift_right(f, k, False)
        v = jnp.where(f, v, vs)
        f = f | fs
        k *= 2
    return jnp.where(f, v, init)


# ---------------------------------------------------------------------------
# Small-automaton function-composition scan
# ---------------------------------------------------------------------------
# A 5-state transition function {0..4} -> {0..4} packs into one int32 as five
# 3-bit entries. Composition h = right∘left is five variable vector shifts.

_IDENTITY_MAP = 0 | (1 << 3) | (2 << 6) | (3 << 9) | (4 << 12)


def pack_state_map(next_for_zero):
    """Per-element map m with m[0]=next_for_zero and m[e]=e-1 for e>0.

    This is the tokenizer transition: at a token boundary the countdown
    becomes len-1; inside a token it decrements.
    """
    base = (0 << 3) | (1 << 6) | (2 << 9) | (3 << 12)
    return next_for_zero + base


def _compose(left, right):
    """(right ∘ left)[e] = right[left[e]] on packed 5-entry maps."""
    out = jnp.zeros_like(left)
    for e in range(5):
        fe = (left >> (3 * e)) & 7
        he = (right >> (3 * fe)) & 7
        out = out | (he << (3 * e))
    return out


def compose_state_maps(maps):
    """Inclusive composition scan: out[i] = m_i ∘ ... ∘ m_0 (packed maps)."""
    if _pallas_ok(maps):
        from . import pallas_scan

        return pallas_scan.compose_state_maps(maps)
    n = maps.shape[-1]
    k = 1
    while k < n:
        left = _shift_right(maps, k, _IDENTITY_MAP)
        maps = _compose(left, maps)
        k *= 2
    return maps


def tokenizer_states(lens, start: int):
    """Countdown state *before* each position given per-position token
    lengths; positions < start are treated as 1-byte tokens so the state at
    `start` is 0. Returns int32 states in 0..4."""
    idx_ok = jnp.arange(lens.shape[-1], dtype=jnp.int32) >= start
    eff_lens = jnp.where(idx_ok, lens, 1)
    maps = pack_state_map(eff_lens - 1)
    scanned = compose_state_maps(maps)
    applied = scanned & 7  # composed map applied to initial state 0
    return _shift_right(applied, 1, 0)


# ---------------------------------------------------------------------------
# Segmented modular sum over packed channel pairs
# ---------------------------------------------------------------------------
# Element = (value mod 256, reset flag). Combine: right-reset overrides,
# otherwise sum mod 256. Two channels pack into one int32:
#   bits 0-7 value0, bit 8 flag0, bits 16-23 value1, bit 24 flag1.

_M2 = 0x00FF00FF
_F2 = 0x01000100


def pack_pair(v0, f0, v1, f1):
    return (
        (v0 & 255)
        | (jnp.where(f0, 1, 0) << 8)
        | ((v1 & 255) << 16)
        | (jnp.where(f1, 1, 0) << 24)
    )


def _seg_combine(left, right):
    # Mask values before adding so flag bits never pollute the sums; each
    # lane's carry stops in its (masked-off) flag bit.
    sum_ = ((left & _M2) + (right & _M2)) & _M2
    # Per-channel resolution: a set reset flag on the right takes its value.
    rf0 = (right >> 8) & 1
    rf1 = (right >> 24) & 1
    ch0 = jnp.where(rf0 != 0, right & 0x000000FF, sum_ & 0x000000FF)
    ch1 = jnp.where(rf1 != 0, right & 0x00FF0000, sum_ & 0x00FF0000)
    flags = (left & _F2) | (right & _F2)
    return ch0 | ch1 | flags


def segmented_modsum(packed):
    """Inclusive segmented sum (mod 256) over packed channel pairs."""
    if _pallas_ok(packed):
        from . import pallas_scan

        return pallas_scan.segmented_modsum(packed)
    n = packed.shape[-1]
    k = 1
    while k < n:
        left = _shift_right(packed, k, 0)
        packed = _seg_combine(left, packed)
        k *= 2
    return packed
