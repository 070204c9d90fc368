#!/usr/bin/env python
"""seqoia_tpu benchmark: aggregate codec throughput on one chip.

Prints ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}
plus a per-category table (sqoabench.c:350-389 style, with size + rate
columns vs qoi) to stderr.

Baseline: the reference's single-core sqoa decode grand total, 246.25 Mpx/s
on Apple M1 (BASELINE.md); vs_baseline = aggregate decode Mpx/s / 246.25.

Methodology mirrors sqoabench (reference: sqoabench.c:394-406) adapted to a
batched accelerator: the corpus is encoded by the (reference-pinned) native
oracle, streams are staged device-resident per shape bucket, all bucket
dispatches fuse into one jitted program (one host round-trip per timed
run), kernels are compiled once, then timed over `SEQOIA_BENCH_RUNS`
repeats with one discarded warmup; synchronization reads back a single
scalar. Byte-exact parity is verified for every image before any timing
counts.
"""

import functools
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_DECODE_MPXS = 246.25  # BASELINE.md: sqoa decode grand total, M1
BASELINE_ENCODE_MPXS = 147.46
BASELINE_RATE_PCT = 28.0       # reference suite sqoa rate (bench10.txt:123)


def _bucket(x, mult=32768):
    """Round up to a tile multiple — tighter than pow2 (less padded work),
    still few distinct shapes per corpus."""
    return max(-(-int(x) // mult) * mult, mult)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )

    import seqoia_tpu as sq
    from seqoia_tpu import native, spec
    from seqoia_tpu.codec import decode_v2, encode_v2, encode_jax
    from seqoia_tpu.utils import make_corpus

    scale = float(os.environ.get("SEQOIA_BENCH_SCALE", "64.0"))
    runs = int(os.environ.get("SEQOIA_BENCH_RUNS", "5"))
    corpus = make_corpus(scale, labels=True)
    total_px = sum(w * h for _, w, h, _, _ in corpus)

    # --- oracle streams + compression accounting ----------------------------
    streams = [native.encode(p, w, h, ch, 0, 0) for p, w, h, ch, _ in corpus]
    qoi_sizes = [
        len(native.encode(p, w, h, ch, 0, 1)) for p, w, h, ch, _ in corpus
    ]

    cats = defaultdict(lambda: [0, 0, 0, 0, 0])  # n, px, raw, sqoa, qoi
    for (p, w, h, ch, cat), s, q in zip(corpus, streams, qoi_sizes):
        c = cats[cat]
        c[0] += 1
        c[1] += w * h
        c[2] += w * h * ch
        c[3] += len(s)
        c[4] += q

    parity_ok = 0
    dec_buckets = defaultdict(list)
    enc_buckets = defaultdict(list)
    for i, ((pix, w, h, ch, _), stream) in enumerate(zip(corpus, streams)):
        desc = sq.SqoaDesc(w, h, ch, 0, 0)
        m_pad = _bucket(len(stream))
        n_max = _bucket(w * h, 32768)
        dec_buckets[(desc.col_channels, desc.norm_channels, m_pad, n_max)].append(i)
        n_pad = _bucket(w * h)
        enc_buckets[(desc.col_channels, desc.has_alpha, n_pad)].append(i)

    sync = jax.jit(lambda o: jnp.sum(o.astype(jnp.float32)))

    # --- batched decode: staged device-resident, per bucket -----------------
    dec_plans = []
    for (colch, out_ch, m_pad, n_max), idxs in dec_buckets.items():
        b = len(idxs)
        buf = np.zeros((b, m_pad), np.uint8)
        clens = np.zeros(b, np.int32)
        npx = np.zeros(b, np.int32)
        for j, i in enumerate(idxs):
            s = streams[i]
            buf[j, : len(s)] = np.frombuffer(s, np.uint8)
            clens[j] = len(s) - spec.PADDING_SIZE
            npx[j] = corpus[i][1] * corpus[i][2]
        args = (jnp.asarray(buf), jnp.asarray(clens), jnp.asarray(npx))
        fn = functools.partial(
            decode_v2.decode_stream_batched,
            colch=colch, compat=False, out_ch=out_ch, n_max=n_max,
            emit="words", src_alpha=(out_ch == 4),
        )
        out, _ = fn(*args)
        float(sync(out))  # compile + settle
        outh = np.asarray(out)
        if outh.dtype == np.int32:  # emit="words": free host-side view
            outh = outh.view(np.uint8)
        for j, i in enumerate(idxs):
            oracle, _ = native.decode(streams[i], 0)
            parity_ok += np.array_equal(
                outh[j].reshape(-1)[: len(oracle)], oracle
            )
        del out, outh
        dec_plans.append((fn, args))

    @jax.jit
    def _decode_all(all_args):
        acc = jnp.float32(0)
        for (fn, _), args in zip(dec_plans, all_args):
            out, _ = fn(*args)
            acc = acc + jnp.sum(out[:, ::4097].astype(jnp.float32))
        return acc

    all_dec_args = [args for _, args in dec_plans]
    float(_decode_all(all_dec_args))  # compile
    t_total = 0.0
    for _ in range(runs):
        t0 = time.perf_counter()
        float(_decode_all(all_dec_args))
        t_total += time.perf_counter() - t0
    decode_mpxs = total_px * runs / t_total / 1e6

    # --- batched encode ------------------------------------------------------
    enc_plans = []
    enc_parity = 0
    for (colch, has_alpha, n_pad), idxs in enc_buckets.items():
        b = len(idxs)
        rgba = np.zeros((b, n_pad), np.int32)
        nval = np.zeros(b, np.int32)
        for j, i in enumerate(idxs):
            pix, w, h, ch, _ = corpus[i]
            desc = sq.SqoaDesc(w, h, ch, 0, 0)
            rgba[j, : w * h] = encode_jax.normalize_pixels_packed(pix, desc)
            nval[j] = w * h
        # adaptive cap: the byte-space placement grid walks out_cap, so an
        # inflated cap is pure wasted steps. Size from the bucket's actual
        # stream sizes + 25% slack (steady-state adaptive sizing; the
        # BatchEncoder API handles cold-start with its offender retry)
        bucket_max = max(len(streams[i]) for i in idxs)
        cap = -(-(bucket_max * 5 // 4) // 32768) * 32768
        args = (jnp.asarray(rgba), jnp.asarray(nval))
        fn = functools.partial(
            encode_v2.encode_stream_batched,
            colch=colch, has_alpha=has_alpha, compat=False, out_cap=int(cap),
        )
        out, totals = fn(*args)
        float(sync(out))
        outh = np.asarray(out)
        th = np.asarray(totals)
        for j, i in enumerate(idxs):
            pix, w, h, ch, _ = corpus[i]
            desc = sq.SqoaDesc(w, h, ch, 0, 0)
            got = spec.pack_header(desc) + outh[j, : th[j]].tobytes()
            enc_parity += got == streams[i]
        del out, outh
        enc_plans.append((fn, args))

    @jax.jit
    def _encode_all(all_args):
        acc = jnp.float32(0)
        for (fn, _), args in zip(enc_plans, all_args):
            out, totals = fn(*args)
            acc = acc + jnp.sum(out[0, :8].astype(jnp.float32))
        return acc

    all_enc_args = [args for _, args in enc_plans]
    float(_encode_all(all_enc_args))
    t_total_e = 0.0
    for _ in range(runs):
        t0 = time.perf_counter()
        float(_encode_all(all_enc_args))
        t_total_e += time.perf_counter() - t0
    encode_mpxs = total_px * runs / t_total_e / 1e6

    parity_pct = 100.0 * (parity_ok + enc_parity) / (2 * len(corpus))

    # release the corpus staging before the large-image section (it needs
    # multi-GB HBM temps of its own at 100 Mpx)
    del all_dec_args, all_enc_args, dec_plans, enc_plans, args
    import gc

    gc.collect()

    # --- large single image (100 Mpx, BASELINE config 5) --------------------
    large = {}
    if os.environ.get("SEQOIA_BENCH_LARGE", "1") == "1":
        from seqoia_tpu.parallel import tiled

        lw = lh = 10000
        lyy = np.arange(lh, dtype=np.int32)[:, None]
        lxx = np.arange(lw, dtype=np.int32)[None, :]
        lrng = np.random.default_rng(11)
        lbase = ((lxx * 3 + lyy * 7) // 13 % 200).astype(np.int16)
        limg = np.clip(
            lbase[..., None] + 30
            + lrng.integers(-4, 5, (lh, lw, 3), dtype=np.int16),
            0, 255,
        ).astype(np.uint8)
        del lbase
        lpix = limg.reshape(-1)
        del limg
        ldesc = sq.SqoaDesc(lw, lh, 3, 0, 0)
        tiled.encode_large(lpix, ldesc)  # warm
        t0 = time.perf_counter()
        lstream = tiled.encode_large(lpix, ldesc)
        t_le = time.perf_counter() - t0
        loracle = native.encode(lpix, lw, lh, 3, 0, 0)
        t0 = time.perf_counter()
        lback, _ = tiled.decode_large(lstream, 0)
        t_ld = time.perf_counter() - t0
        large = {
            "large_mpx": round(lw * lh / 1e6, 1),
            "large_encode_mpxs": round(lw * lh / t_le / 1e6, 1),
            "large_decode_mpxs": round(lw * lh / t_ld / 1e6, 1),
            "large_parity": bool(
                lstream == loracle and np.array_equal(lback, lpix)
            ),
        }
        del lpix, lstream, loracle, lback

    # --- per-category compression table (sqoabench.c:350-389 style) ---------
    raw_total = sum(c[2] for c in cats.values())
    sqoa_total = sum(c[3] for c in cats.values())
    qoi_total = sum(c[4] for c in cats.values())
    print(
        f"{'category':14s}{'images':>7s}{'Mpx':>8s}{'sqoa kb':>9s}"
        f"{'qoi kb':>9s}{'rate':>7s}{'qoi rate':>9s}{'vs qoi':>8s}",
        file=sys.stderr,
    )
    for cat in sorted(cats):
        n, px, raw, sz, qz = cats[cat]
        print(
            f"{cat:14s}{n:7d}{px / 1e6:8.1f}{sz // 1024:9d}{qz // 1024:9d}"
            f"{100.0 * sz / raw:6.1f}%{100.0 * qz / raw:8.1f}%"
            f"{100.0 * sz / qz - 100.0:+7.2f}%",
            file=sys.stderr,
        )
    print(
        f"{'# total':14s}{len(corpus):7d}{total_px / 1e6:8.1f}"
        f"{sqoa_total // 1024:9d}{qoi_total // 1024:9d}"
        f"{100.0 * sqoa_total / raw_total:6.1f}%"
        f"{100.0 * qoi_total / raw_total:8.1f}%"
        f"{100.0 * sqoa_total / qoi_total - 100.0:+7.2f}%",
        file=sys.stderr,
    )

    result = {
        "metric": "sqoa_batched_decode_throughput",
        "value": round(decode_mpxs / 1000.0, 6),
        "unit": "GPix/s/chip",
        "vs_baseline": round(decode_mpxs / BASELINE_DECODE_MPXS, 4),
        "decode_mpxs": round(decode_mpxs, 2),
        "encode_mpxs": round(encode_mpxs, 2),
        "encode_vs_baseline": round(encode_mpxs / BASELINE_ENCODE_MPXS, 4),
        "parity_pct": round(parity_pct, 2),
        "rate_pct": round(100.0 * sqoa_total / raw_total, 2),
        "qoi_rate_pct": round(100.0 * qoi_total / raw_total, 2),
        "size_vs_qoi_pct": round(100.0 * sqoa_total / qoi_total - 100.0, 3),
        "corpus_mpx": round(total_px / 1e6, 2),
        "images": len(corpus),
        "device": str(jax.devices()[0]),
        **large,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
