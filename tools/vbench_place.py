#!/usr/bin/env python
"""Variant microbenchmark for place_emit: where do the us/tile go?

Builds one photo-class workload (W x W, run/luma/rgb mix via the corpus
generator), runs the decode front once, then times place_emit with
epilogue variants to attribute cost:
  dec full3   — production out_ch=3 epilogue (alpha-drop butterfly)
  dec full4   — out_ch=4 epilogue (mask only)
  dec trivial — epilogue = filled[0] (expand + fill + write only)
Encode side mirrors it (full vs trivial epilogue, fill_keys on).

Timing per NOTES_ROUND3 leg 2: N queued launches per scalar fetch,
dispatch floor subtracted.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)

from seqoia_tpu import native, spec
from seqoia_tpu.codec import decode_v2, encode_v2, encode_jax
from seqoia_tpu.utils.corpus import _photo
from seqoia_tpu.ops import pallas_frontend, pallas_engine, pallas_encode

W = 4096  # 16.8 Mpx, 512 pixel tiles
LAUNCHES = 6


def fence(fn, args, n=5):
    fenced = jax.jit(lambda *a: jax.tree.leaves(fn(*a))[0]
                     .reshape(-1)[:1].astype(jnp.float32).sum())
    float(fenced(*args))
    triv = jax.jit(lambda *a: sum(x.reshape(-1)[0].astype(jnp.float32)
                                  for x in jax.tree.leaves(a)))
    float(triv(*args))
    best, floor = 1e9, 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(LAUNCHES):
            out = fenced(*args)
        float(out)
        best = min(best, time.perf_counter() - t0)
        t0 = time.perf_counter()
        for _ in range(LAUNCHES):
            out = triv(*args)
        float(out)
        floor = min(floor, time.perf_counter() - t0)
    return (best - floor) / LAUNCHES


def report(name, n_tiles, fn, args):
    t = fence(fn, args)
    print(f"{name:22s}: {t*1e6/n_tiles:7.2f} us/tile  ({t*1e3:.2f} ms, "
          f"{n_tiles} tiles)", flush=True)


def main():
    rng = np.random.default_rng(7)
    pix = _photo(rng, W, W, 3)
    stream = native.encode(pix, W, W, 3, 0, 0)
    n_max = W * W
    m_pad = -(-len(stream) // 32768) * 32768
    buf = np.zeros((1, m_pad), np.uint8)
    buf[0, : len(stream)] = np.frombuffer(stream, np.uint8)
    clen = jnp.asarray([len(stream) - spec.PADDING_SIZE], jnp.int32)
    data = jnp.asarray(buf)
    npx = jnp.asarray([n_max], jnp.int32)
    print(f"photo {W}x{W}: {len(stream)/n_max:.2f} B/px, "
          f"{m_pad//32768} byte tiles, {n_max//32768} px tiles", flush=True)

    keys_c, pays_c, totals, _ = pallas_frontend.decode_front_compact(
        data, clen, n_max, mode="noalpha")
    init = int(np.int32(np.uint32(255 << 24)))
    p_out = 32768
    rows = p_out // 128
    n_tiles = n_max // p_out

    def mk(out_rows, epi, dtype=jnp.int32, max_gap=spec.SQOA_MAXRUN - 1):
        return jax.jit(functools.partial(
            pallas_engine.place_emit, n_out=n_max, inits=(init,),
            epilogue=epi, p_out=p_out, out_rows=out_rows, out_dtype=dtype,
            max_gap=max_gap))

    args = (keys_c, pays_c, totals, npx[:, None])
    report("dec place full3", n_tiles,
           mk(rows * 3 // 4, decode_v2._dec_epilogue(3)), args)
    report("dec place full4", n_tiles, mk(rows, decode_v2._dec_epilogue(4)),
           args)
    triv = lambda filled, base, scal: filled[0]
    report("dec place trivial", n_tiles, mk(rows, triv), args)

    # front for scale: current decode front cost on the same stream
    ff = jax.jit(functools.partial(
        pallas_frontend.decode_front_compact, n_max=n_max, mode="noalpha"))
    bt = m_pad // 32768
    report("dec front (B tiles)", bt, ff, (data, clen))

    # ---- encode side -------------------------------------------------------
    desc_pixels = encode_jax.normalize_pixels_packed(
        pix, __import__("seqoia_tpu").SqoaDesc(W, W, 3, 0, 0))
    rgba = jnp.asarray(desc_pixels[None, :])
    nval = jnp.asarray([n_max], jnp.int32)
    ek, ep, et, ect, elc = pallas_encode.encode_front_compact(
        rgba, nval, colch=3)
    maxrun = spec.SQOA_MAXRUN
    trail_pending = ((nval - 1) - elc) % maxrun
    has_trail = (trail_pending > 0) & (nval > 0)
    scal = jnp.stack([ect, has_trail.astype(jnp.int32),
                      jnp.ones_like(ect)], axis=-1)
    cap = spec.cap_bucket(len(stream) * 5 // 4)
    ep_out = next(p for p in (32768, 16384, 8192, 4096, 2048) if cap % p == 0)
    e_tiles = cap // ep_out

    def mke(epi, fill_keys):
        return jax.jit(functools.partial(
            pallas_engine.place_emit, n_out=cap,
            inits=encode_v2._emit_inits(3), epilogue=epi, p_out=ep_out,
            fill_keys=fill_keys, max_gap=14))

    eargs = (ek, encode_v2._emit_payloads(ep, ek), et, scal)
    report("enc place full", e_tiles, mke(encode_v2._emit_epilogue(3), True),
           eargs)
    etriv = lambda filled, base, scal: filled[0] & 255
    report("enc place trivial", e_tiles, mke(etriv, True), eargs)
    report("enc place triv nokey", e_tiles,
           mke(lambda f, b, s: f[0] & 255, False),
           (ek, list(ep), et, scal))
    fe = jax.jit(functools.partial(
        pallas_encode.encode_front_compact, colch=3))
    report("enc front (px tiles)", n_max // 32768, fe, (rgba, nval))


if __name__ == "__main__":
    main()
