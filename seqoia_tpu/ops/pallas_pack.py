"""Device-side pixel normalization: raw interleaved bytes -> packed pixels.

The encoder consumes (N,) int32 packed ``r | g<<8 | b<<16 | a<<24`` pixels
(the normalized form of seqoia.h:475-486,520-525). Producing that on the
host costs seconds at 100 Mpx (strided numpy passes over hundreds of MB)
and inflates the H2D transfer; this kernel instead ingests the *raw* image
bytes as int32 words (a free host-side ``.view``) and performs the
stride-3/2/1 -> 4 byte expansion on-chip.

The expansion is a static monotone mapping: output pixel f reads input
word (stride*f)>>2, i.e. input word i first lands at output position
f_first(i) = ceil(4i/stride) — strictly increasing, so the butterfly
expand network (ops/ktools.py) applies with a *compile-time* distance
pattern; duplicated reads resolve with one forward-fill. The remaining
byte extraction is lane-local shifts.

stride 4 (RGBA/BGRA) needs no kernel: the raw words are already the
packed pixels (no swizzle — BGR(A) is encoded identically, seqoia.h:482).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import ktools

_INTERPRET = os.environ.get("SEQOIA_PALLAS_INTERPRET", "") == "1"

_L = 128
_ROWS = 256              # output pixels per tile / 128
_TILE = _ROWS * _L       # 32768 px

_ALPHA_OPAQUE = int(np.int32(np.uint32(255 << 24)))


def _pack_kernel(stride, *refs):
    in_ref, out_ref = refs
    rows_in = _ROWS * stride // 4
    w = in_ref[0, 0]  # (rows_in, L) int32 raw words
    wp = jnp.concatenate(
        [w, jnp.zeros((_ROWS - rows_in, _L), jnp.int32)], axis=0
    )

    row = ktools.iota2((_ROWS, _L), 0)
    lane = ktools.iota2((_ROWS, _L), 1)
    i = row * _L + lane

    if stride == 3:
        # f_first(i) = ceil(4i/3) = 170*row + (2*row + 4*lane + 2)//3 with
        # the inner divide exact via multiply-shift (x*21846)>>16, x<32768
        inner = ((2 * row + 4 * lane + 2) * 21846) >> 16
        f_first = 170 * row + inner
        nbits = 14
    else:
        f_first = (4 // stride) * i
        nbits = 15 if stride == 1 else 14

    d = jnp.where(i < rows_in * _L, f_first - i, ktools.HOLE)
    docc, (s0,) = ktools.butterfly_expand(d, [wp], nbits)
    (s0,), _ = ktools.fill_scan_multi([s0], (docc >= 0).astype(jnp.int32))

    f = i
    if stride == 3:
        r = (3 * (f & 3)) & 3  # (3f) mod 4
        s0f1 = ktools.flat_shift_left(s0, 1, 0)
        sh = 8 * r
        hi = jnp.where(r >= 2, s0f1 << (32 - sh), 0)
        lomask = jnp.where(r > 0, (1 << ((32 - sh) & 31)) - 1, -1)
        v = ((s0 >> sh) & lomask) | hi
        out = (v & 0xFFFFFF) | jnp.int32(_ALPHA_OPAQUE)
    elif stride == 2:
        sh = 16 * (f & 1)
        ga = (s0 >> sh) & 0xFFFF
        out = ((ga & 255) << 8) | ((ga >> 8) << 24)
    else:  # stride 1: mono, no alpha
        sh = 8 * (f & 3)
        g = (s0 >> sh) & 255
        out = (g << 8) | jnp.int32(_ALPHA_OPAQUE)
    out_ref[0, 0] = out


@functools.partial(jax.jit, static_argnames=("stride",))
def pack_words(words, stride):
    """Raw-image int32 words -> (B, N) packed int32 pixels.

    words: (B, N*stride//4) int32 — the little-endian view of the raw
    interleaved bytes (host: ``raw_u8.view('<i4')``), N % 32768 == 0.
    stride = norm_channels of the image (1 mono, 2 gray+alpha, 3 RGB/BGR).
    """
    assert stride in (1, 2, 3)
    b, wlen = words.shape
    n = wlen * 4 // stride
    t = n // _TILE
    rows_in = _ROWS * stride // 4
    kern = functools.partial(_pack_kernel, stride)
    in_spec = pl.BlockSpec(
        (1, 1, rows_in, _L), lambda bi, ti: (bi, ti, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (1, 1, _ROWS, _L), lambda bi, ti: (bi, ti, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out = pl.pallas_call(
        kern,
        grid=(b, t),
        in_specs=[in_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, t, _ROWS, _L), jnp.int32),
        interpret=_INTERPRET,
    )(words.reshape(b, t, rows_in, _L))
    return out.reshape(b, n)


def normalize_pixels_device(pixels_u8, desc):
    """Flat raw uint8 pixel buffer (host or device) -> (n_pad,) packed
    int32 pixels on device, n_pad = next 32768 multiple of desc.n_pixels.

    The host side only pads + ``.view``s the bytes; all expansion happens
    on-chip. stride 4 inputs skip the kernel (words are the pixels)."""
    from .. import spec  # local import to keep ops/ dependency-light

    stride = desc.norm_channels
    n = desc.n_pixels
    n_pad = -(-n // _TILE) * _TILE
    raw = np.asarray(pixels_u8, np.uint8).reshape(-1)[: n * stride]
    nbytes_pad = n_pad * stride
    if nbytes_pad > raw.size:
        raw = np.concatenate([raw, np.zeros(nbytes_pad - raw.size, np.uint8)])
    words = jnp.asarray(raw.view("<i4"))
    if stride == 4:
        return words
    return pack_words(words[None], stride)[0]
