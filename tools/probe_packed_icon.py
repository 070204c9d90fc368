#!/usr/bin/env python
"""Attribute the segment-packed icon decode's time: front kernel vs
placement vs the XLA glue between them (entry-limit pad, totals mask,
window searchsorted). Run on the real chip with nothing else using it.

Usage: python tools/probe_packed_icon.py [n_icons] [seg]
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
from seqoia_tpu.codec import decode_v2
from seqoia_tpu.ops import pallas_engine, pallas_frontend

N_ICONS = int(sys.argv[1]) if len(sys.argv) > 1 else 512
SEG = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
SEG_PX = 4096
INNER = 8


def timed(fn, *args, n=5):
    fenced = jax.jit(lambda *a: jax.tree.reduce(
        lambda acc, x: acc + x.reshape(-1)[:2].astype(jnp.float32).sum(),
        fn(*a), jnp.float32(0)))
    float(fenced(*args))
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        for _ in range(INNER - 1):
            fenced(*args)
        float(fenced(*args))
        best = min(best, (time.perf_counter() - t0) / INNER)
    return best


rng = np.random.default_rng(3)
n = SEG_PX
icons = []
for t in range(N_ICONS):
    pal = rng.integers(0, 256, (5, 4), dtype=np.uint8)
    runs = rng.integers(3, 30, 900)
    idx = np.repeat(rng.integers(0, 5, 900), runs)[:n]
    idx = np.pad(idx, (0, n - len(idx)), mode="edge")
    icons.append(pal[idx].ravel())
streams = [native.encode(p, 64, 64, 4, 0, 0) for p in icons]
print("stream bytes: p50", int(np.median([len(s) for s in streams])),
      "max", max(len(s) for s in streams))
assert max(len(s) for s in streams) <= SEG

k = 32768 // SEG
b_rows = -(-N_ICONS // k)
data = np.zeros((b_rows, 32768), np.uint8)
slens = np.zeros((b_rows, k), np.int32)
for j, s in enumerate(streams):
    r, c = divmod(j, k)
    data[r, c * SEG : c * SEG + len(s)] = np.frombuffer(s, np.uint8)
    slens[r, c] = len(s) - spec.PADDING_SIZE
d_data = jnp.asarray(data)
d_slens = jnp.asarray(slens)
n_out = k * SEG_PX
mpx = N_ICONS * n / 1e6

# full packed decode
full = functools.partial(
    decode_v2.decode_stream_packed, colch=3, out_ch=4, seg=SEG,
    seg_px=SEG_PX, src_alpha=True)
t = timed(full, d_data, d_slens)
print(f"full packed decode: {t*1e3:8.3f} ms  {mpx/t:8.1f} Mpx/s")

# front alone
front = functools.partial(
    pallas_frontend.decode_front_compact, n_max=n_out, mode="alpha",
    rows=256, seg=SEG, seg_px=SEG_PX)
t_f = timed(front, d_data, d_slens)
print(f"front alone:        {t_f*1e3:8.3f} ms  {mpx/t_f:8.1f} Mpx/s")

# place alone (on materialized front outputs)
keys_c, pays_c, totals, _ = front(d_data, d_slens)
keys_c = jax.device_put(keys_c); pays_c = [jax.device_put(pays_c[0])]
totals = jax.device_put(totals)
npx_total = jnp.full((b_rows, 1), n_out, jnp.int32)
init = int(np.int32(np.uint32(255 << 24)))
p_out = next(p for p in (32768, 16384, 8192, 4096, 2048) if n_out % p == 0)


@jax.jit
def place(kc, pc, tot, sc):
    return pallas_engine.place_emit(
        kc, [pc], tot, sc, n_out, (init,),
        decode_v2._dec_epilogue(4), p_out=p_out, out_rows=p_out // 128,
        out_dtype=jnp.int32, entry_limit=32768,
        max_gap=spec.SQOA_MAXRUN - 1)


t_p = timed(place, keys_c, pays_c[0], totals, npx_total)
print(f"place alone:        {t_p*1e3:8.3f} ms  {mpx/t_p:8.1f} Mpx/s")
print(f"glue (full-f-p):    {(t-t_f-t_p)*1e3:8.3f} ms")

# per-image (non-packed) reference path
m_pad = SEG
buf = np.zeros((N_ICONS, m_pad), np.uint8)
clens = np.zeros(N_ICONS, np.int32)
npx = np.full(N_ICONS, n, np.int32)
for j, s in enumerate(streams):
    buf[j, : len(s)] = np.frombuffer(s, np.uint8)
    clens[j] = len(s) - spec.PADDING_SIZE
per_img = functools.partial(
    decode_v2.decode_stream_batched, colch=3, compat=False, out_ch=4,
    n_max=SEG_PX, emit="words", src_alpha=True)
t_u = timed(per_img, jnp.asarray(buf), jnp.asarray(clens), jnp.asarray(npx))
print(f"per-image path:     {t_u*1e3:8.3f} ms  {mpx/t_u:8.1f} Mpx/s")
