"""Diagnose the on-device decode-parity expectation (bench.py unified
staging): stage every bucket, report per-bucket ok counts, and for the
first failing row fetch the first mismatching word + its neighborhood.

Run exclusively (one TPU client)."""

import functools
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.getcwd(), ".jax_cache"))

import bench
import seqoia_tpu as sq
from seqoia_tpu import native, spec
from seqoia_tpu.codec import decode_v2, encode_jax
from seqoia_tpu.ops import pallas_pack
from collections import defaultdict

scale = float(os.environ.get("SEQOIA_BENCH_SCALE", "64.0"))
corpus, streams, qoi_streams = bench._corpus_assets(scale)

buckets = defaultdict(list)
for i, ((pix, w, h, ch, cat), stream) in enumerate(zip(corpus, streams)):
    desc = sq.SqoaDesc(w, h, ch, 0, 0)
    if len(stream) <= 16384:
        m_pad = max(4096, 1 << (len(stream) - 1).bit_length())
    else:
        m_pad = bench._bucket(len(stream))
    if w * h <= 16384:
        n_pad = max(4096, 1 << (w * h - 1).bit_length())
    else:
        n_pad = bench._bucket(w * h)
    buckets[(cat, desc.col_channels, desc.has_alpha, desc.norm_channels,
             m_pad, n_pad)].append(i)

for key, idxs in buckets.items():
    (cat, colch, has_alpha, out_ch, m_pad, n_pad) = key
    b = len(idxs)
    stride = colch + has_alpha
    buf = np.zeros((b, m_pad), np.uint8)
    clens = np.zeros(b, np.int32)
    npx = np.zeros(b, np.int32)
    raw = np.zeros((b, n_pad * stride), np.uint8)
    for j, i in enumerate(idxs):
        s = streams[i]
        pix, w, h, ch, _ = corpus[i]
        buf[j, : len(s)] = np.frombuffer(s, np.uint8)
        clens[j] = len(s) - spec.PADDING_SIZE
        npx[j] = w * h
        raw[j, : len(pix)] = pix
    if n_pad % 32768 == 0 and stride < 4:
        packed = pallas_pack.pack_words(jnp.asarray(raw.view("<i4")), stride)
    elif stride == 4:
        packed = jnp.asarray(raw.view("<i4"))
    else:
        rgba = np.zeros((b, n_pad), np.int32)
        for j, i in enumerate(idxs):
            pix, w, h, ch, _ = corpus[i]
            rgba[j, : w * h] = encode_jax.normalize_pixels_packed(
                pix, sq.SqoaDesc(w, h, ch, 0, 0))
        packed = jnp.asarray(rgba)
    dec_fn = functools.partial(
        decode_v2.decode_stream_batched,
        colch=colch, compat=False, out_ch=out_ch, n_max=n_pad,
        emit="words", src_alpha=(out_ch in (2, 4)),
    )
    args = (jnp.asarray(buf), jnp.asarray(clens), jnp.asarray(npx))
    plan = dict(cat=cat, colch=colch, out_ch=out_ch, dec_args=args,
                packed=packed)

    # inline the expectation check from bench
    @jax.jit
    def check(args, packed):
        out, _ = dec_fn(*args)
        ok = bench_dec_expected_ok(colch, out_ch, packed, args[2], out)
        return ok, out

    def bench_dec_expected_ok(colch, out_ch, packed, npx, out):
        bsz, n = packed.shape
        if colch == 1:
            gray = (packed >> 8) & 255
            if out_ch == 1:
                exp = gray.astype(jnp.uint8)
            else:
                exp = (gray | (((packed >> 24) & 255) << 8)).astype(
                    jnp.uint16)
            keep = jnp.arange(n, dtype=jnp.int32)[None, :] < npx[:, None]
            return jnp.all((out == exp) | ~keep, axis=1)
        if out_ch == 4:
            keep = jnp.arange(n, dtype=jnp.int32)[None, :] < npx[:, None]
            return jnp.all((out == packed) | ~keep, axis=1)
        p0 = packed[:, 0::4]
        p1 = packed[:, 1::4]
        p2 = packed[:, 2::4]
        p3 = packed[:, 3::4]
        w0 = (p0 & 0xFFFFFF) | ((p1 & 255) << 24)
        w1 = ((p1 >> 8) & 0xFFFF) | ((p2 & 0xFFFF) << 16)
        w2 = ((p2 >> 16) & 255) | (p3 << 8)
        q = n // 4
        t_idx = jnp.arange(q, dtype=jnp.int32)[None, :]
        oks = jnp.ones((bsz,), bool)
        for k, wk in enumerate((w0, w1, w2)):
            got = out[:, k::3]
            keep = (12 * t_idx + 4 * k) < (npx[:, None] * 3)
            nby = jnp.clip(npx[:, None] * 3 - (12 * t_idx + 4 * k), 0, 4)
            mask_bits = jnp.where(
                nby >= 4, -1, (1 << (8 * jnp.minimum(nby, 3))) - 1)
            oks = oks & jnp.all(
                (((got ^ wk) & mask_bits) == 0) | ~keep, axis=1)
        return oks

    ok, out = check(args, packed)
    ok = np.asarray(jax.device_get(ok))
    nbad = b - int(ok.sum())
    if nbad:
        print(f"BUCKET {key}: {nbad}/{b} FAIL")
        j = int(np.nonzero(~ok)[0][0])
        i = idxs[j]
        pix, w, h, ch, _ = corpus[i]
        # host-truth decode for the failing image
        exp_pix, _ = native.decode(streams[i], 0)
        outj = np.asarray(jax.device_get(out))[j]
        if out_ch == 3:
            got_bytes = outj.view(np.uint8)[: w * h * 3]
        elif out_ch == 4:
            got_bytes = outj.view(np.uint8)[: w * h * 4]
        else:
            got_bytes = outj.view(np.uint8)[: w * h * out_ch]
        d = np.nonzero(got_bytes != exp_pix[: len(got_bytes)])[0]
        print(f"  image {i} {w}x{h}x{ch}: decode-vs-native mismatches: "
              f"{len(d)} first@{d[:5] if len(d) else '-'}")
        pk = np.asarray(jax.device_get(packed))[j]
        exp_packed = encode_jax.normalize_pixels_packed(
            pix, sq.SqoaDesc(w, h, ch, 0, 0))
        dp = np.nonzero(pk[: w * h] != exp_packed)[0]
        print(f"  packed-vs-host-normalize mismatches: {len(dp)} "
              f"first@{dp[:5] if len(dp) else '-'}")
    else:
        print(f"bucket {cat} b={b} m={m_pad} n={n_pad} out_ch={out_ch} ok")
