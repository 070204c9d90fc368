#!/usr/bin/env python
"""seqoia_tpu benchmark: aggregate codec throughput on one chip.

Prints ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}
plus a per-category table (sqoabench.c:350-389 style, with decode/encode
Mpx/s + size + rate columns vs qoi) to stderr.

Baseline: the reference's single-core sqoa decode grand total, 246.25 Mpx/s
on Apple M1 (BASELINE.md); vs_baseline = aggregate decode Mpx/s / 246.25.

Methodology mirrors sqoabench (reference: sqoabench.c:394-406) adapted to a
batched accelerator: the corpus is encoded by the (reference-pinned) native
oracle, streams are staged device-resident per shape bucket, all bucket
dispatches fuse into one jitted program (one host round-trip per timed
run), kernels are compiled once, then timed over `SEQOIA_BENCH_RUNS`
repeats with one discarded warmup; synchronization reads back a single
scalar. Byte-exact parity is verified for every image before any timing
counts. Reported alongside:

* per-category decode/encode Mpx/s (each category timed as its own fused
  program — regressions localize, sqoabench.c:350-389);
* the `.qoi` half of the format (reference: sqoabench.c:469-539): compat
  decode/encode through the production dispatch (host pool across cores;
  the TPU fixpoint leg reports separately with its convergence rate);
* the public batched API path (`corpus_decode`/`corpus_encode`) end to
  end, including staging/transfers;
* the 100 Mpx single image (BASELINE config 5) split into device-resident
  compute (pre-staged input, scalar-fenced) and end-to-end wall clock —
  on this box the axon tunnel's ~13 MB/s-per-stream D2H dominates e2e.
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
BASELINE_QOI_DECODE_MPXS = 244.82  # bench10.txt:122
BASELINE_QOI_ENCODE_MPXS = 190.69


def _note(msg):
    """Progress marker on stderr (the JSON contract owns stdout). The
    interesting sections run minutes each on the tunnel; silence reads as
    a hang."""
    print(f"[bench {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


def _bucket(x, mult=32768):
    """Round up to a tile multiple — tighter than pow2 (less padded work),
    still few distinct shapes per corpus."""
    return max(-(-int(x) // mult) * mult, mult)


def _large_photo(lw, lh):
    """Photo-like 100 Mpx test image (compression rate ~55-60%, matching
    the reference's photo suites), generated in row slabs to bound RAM."""
    rng = np.random.default_rng(11)
    out = np.empty((lh, lw, 3), np.uint8)
    slab = 1250
    xx = np.arange(lw, dtype=np.float32)[None, :]
    for y0 in range(0, lh, slab):
        slab = min(slab, lh - y0)
        yy = np.arange(y0, y0 + slab, dtype=np.float32)[:, None]
        base = np.stack(
            [
                120 + 80 * np.sin(xx / 53.0 + yy * 0),
                120 + 80 * np.cos(yy / 47.0 + xx * 0),
                120 + 80 * np.sin((xx + yy) / 71.0),
            ],
            axis=-1,
        )
        img = base + rng.normal(0, 8, (slab, lw, 1)) + rng.normal(
            0, 2.5, (slab, lw, 3)
        )
        m = np.sin(xx / 97.0 + 2.1) + np.cos(yy / 71.0) > 0.3
        img = np.where(m[..., None], np.round(base / 16) * 16, img)
        out[y0 : y0 + slab] = np.clip(img, 0, 255).astype(np.uint8)
    return out.reshape(-1)


def xlarge_leg(dim=None, runs=3):
    """400 Mpx single-call leg — the reference's hard cap (seqoia.h:428-432).

    20000x20000 is exactly 400e6 and REJECTED (height >= 400e6/width), so
    the maximal legal shape at width 20000 is 20000x19999. Device-resident
    compute only: the end-to-end story is the 100 Mpx leg's; this leg
    proves the single-call ceiling decodes/encodes at speed with parity
    checked on device (uploading the oracle beats fetching 1.2 GB back
    through the tunnel). Standalone so it can be smoke-run at a small
    `dim` without the rest of the bench."""
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    import seqoia_tpu as sq
    from seqoia_tpu import native, spec
    from seqoia_tpu.codec import decode_v2, encode_v2
    from seqoia_tpu.ops import pallas_pack

    def timed(fn, args, n=runs):
        float(fn(args))
        best = 1e9
        for _ in range(n):
            t0 = time.perf_counter()
            float(fn(args))
            best = min(best, time.perf_counter() - t0)
        return best

    @jax.jit
    def rows_equal(ou8, oracle, olen):
        keep = jnp.arange(ou8.shape[0], dtype=jnp.int32) < olen
        return jnp.all((ou8 == oracle) | ~keep)

    xw = int(dim or os.environ.get("SEQOIA_BENCH_XLARGE_DIM", "20000"))
    xh = xw - 1
    xn = xw * xh
    xpix = _large_photo(xw, xh)
    xdesc = sq.SqoaDesc(xw, xh, 3, 0, 0)
    _note("xlarge oracle encode")
    xoracle = native.encode(xpix, xw, xh, 3, 0, 0)

    # decode compute + device-side parity
    m_pad = _bucket(len(xoracle))
    n_max = _bucket(xn)
    buf = np.zeros((1, m_pad), np.uint8)
    buf[0, : len(xoracle)] = np.frombuffer(xoracle, np.uint8)
    xarr = jax.device_put(jnp.asarray(buf))
    del buf
    xdfn = jax.jit(functools.partial(
        decode_v2.decode_stream_batched, colch=3, compat=False,
        out_ch=3, n_max=int(n_max), emit="words", src_alpha=False))
    xclen = jnp.full((1,), len(xoracle) - spec.PADDING_SIZE, jnp.int32)
    xnpx = jnp.full((1,), xn, jnp.int32)

    def xdec_run(d):
        out, _ = xdfn(d, xclen, xnpx)
        return jnp.sum(out[:, ::4097].astype(jnp.float32))

    _note("xlarge decode")
    t_xd = timed(jax.jit(xdec_run), xarr)
    words, _ = xdfn(xarr, xclen, xnpx)
    # compare in int32 WORD space: a device bitcast to (1, N, 4) uint8
    # puts the 4-channel axis minor, whose T(8,128) tiled layout pads 32x
    # (38 GB at 400 Mpx). xn*3 % 4 == 0 because xw % 4 == 0, so the valid
    # region is word-aligned and the host .view is free.
    assert xw % 4 == 0
    nw = xn * 3 // 4
    exp = np.zeros(int(words.shape[1]) * 4, np.uint8)
    exp[: xn * 3] = xpix
    xdec_ok = bool(jax.device_get(rows_equal(
        words.reshape(-1), jnp.asarray(exp.view("<i4")), jnp.int32(nw))))
    del words, exp, xarr

    # encode compute + device-side parity (masked compare vs oracle)
    _note("xlarge encode")
    packed = pallas_pack.normalize_pixels_device(xpix, xdesc)
    packed.block_until_ready()
    xcap = spec.cap_bucket(len(xoracle) * 9 // 8)
    xefn = jax.jit(functools.partial(
        encode_v2.encode_stream_flat, colch=3, has_alpha=False,
        out_cap=int(xcap)))

    def xenc_run(p):
        out, tot = xefn(p, jnp.int32(xn))
        return jnp.sum(out[::65537].astype(jnp.float32)) + tot

    t_xe = timed(jax.jit(xenc_run), packed)
    out, tot = xefn(packed, jnp.int32(xn))
    body = np.frombuffer(xoracle, np.uint8)[spec.HEADER_SIZE + 1 :]
    oexp = np.zeros(int(out.shape[0]), np.uint8)
    oexp[: len(body)] = body
    xenc_ok = bool(jax.device_get(rows_equal(
        out, jnp.asarray(oexp), jnp.int32(len(body)))))
    xenc_ok = xenc_ok and int(jax.device_get(tot)) == len(body)
    return {
        "xlarge_mpx": round(xn / 1e6, 1),
        "xlarge_decode_compute_mpxs": round(xn / t_xd / 1e6, 1),
        "xlarge_encode_compute_mpxs": round(xn / t_xe / 1e6, 1),
        "xlarge_parity": bool(xdec_ok and xenc_ok),
    }


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

    # --- corpus + oracle streams, disk-cached -------------------------------
    # Generation + single-core oracle encoding costs tens of minutes at
    # scale 64; both are deterministic, so cache them keyed by the corpus
    # generator + native-runtime sources (auto-invalidates on changes).
    import hashlib

    from seqoia_tpu.utils import corpus as corpus_mod

    here = os.path.dirname(os.path.abspath(__file__))
    key_src = (
        open(corpus_mod.__file__, "rb").read()
        + open(os.path.join(here, "seqoia_tpu/native/sqoa_native.c"),
               "rb").read()
        + str(scale).encode()
    )
    cache_path = os.path.join(
        here, f".bench_cache_{hashlib.sha1(key_src).hexdigest()[:16]}.npz"
    )
    if os.path.exists(cache_path):
        z = np.load(cache_path, allow_pickle=False)
        pix_cat = z["pixels"]
        lens = z["pix_lens"]
        meta = z["meta"]  # (n, 3) w,h,ch
        cats_arr = z["cats"]
        offs = np.concatenate([[0], np.cumsum(lens)])
        corpus = [
            (pix_cat[offs[i] : offs[i + 1]], int(meta[i, 0]),
             int(meta[i, 1]), int(meta[i, 2]), str(cats_arr[i]))
            for i in range(len(lens))
        ]
        s_cat, s_lens = z["streams"], z["stream_lens"]
        soffs = np.concatenate([[0], np.cumsum(s_lens)])
        streams = [
            s_cat[soffs[i] : soffs[i + 1]].tobytes() for i in range(len(lens))
        ]
        q_cat, q_lens = z["qstreams"], z["qstream_lens"]
        qoffs = np.concatenate([[0], np.cumsum(q_lens)])
        qoi_streams = [
            q_cat[qoffs[i] : qoffs[i + 1]].tobytes() if q_lens[i] else None
            for i in range(len(lens))
        ]
    else:
        corpus = make_corpus(scale, labels=True)
        streams = [
            native.encode(p, w, h, ch, 0, 0) for p, w, h, ch, _ in corpus
        ]
        qoi_streams = [
            native.encode(p, w, h, ch, 0, 1) if ch not in (1, 2) else None
            for p, w, h, ch, _ in corpus
        ]
        np.savez(
            cache_path,
            pixels=np.concatenate([p for p, *_ in corpus]),
            pix_lens=np.array([len(p) for p, *_ in corpus], np.int64),
            meta=np.array([(w, h, ch) for _, w, h, ch, _ in corpus],
                          np.int64),
            cats=np.array([c for *_, c in corpus]),
            streams=np.frombuffer(b"".join(streams), np.uint8),
            stream_lens=np.array([len(s) for s in streams], np.int64),
            qstreams=np.frombuffer(
                b"".join(q for q in qoi_streams if q), np.uint8),
            qstream_lens=np.array(
                [len(q) if q else 0 for q in qoi_streams], np.int64),
        )
    total_px = sum(w * h for _, w, h, _, _ in corpus)

    cats = defaultdict(lambda: [0, 0, 0, 0, 0])  # n, px, raw, sqoa, qoi
    for (p, w, h, ch, cat), s, q in zip(corpus, streams, qoi_streams):
        c = cats[cat]
        c[0] += 1
        c[1] += w * h
        c[2] += w * h * ch
        c[3] += len(s)
        c[4] += len(q) if q is not None else 0

    parity_ok = 0
    dec_buckets = defaultdict(list)
    enc_buckets = defaultdict(list)
    for i, ((pix, w, h, ch, cat), stream) in enumerate(zip(corpus, streams)):
        desc = sq.SqoaDesc(w, h, ch, 0, 0)
        m_pad = _bucket(len(stream))
        n_max = _bucket(w * h, 32768)
        dec_buckets[(cat, desc.col_channels, desc.norm_channels, m_pad,
                     n_max)].append(i)
        n_pad = _bucket(w * h)
        enc_buckets[(cat, desc.col_channels, desc.has_alpha, n_pad)].append(i)

    sync = jax.jit(lambda o: jnp.sum(o.astype(jnp.float32)))

    def timed(fn, args, n=runs):
        """Best-of-n wall time of a jitted fn fenced by a scalar fetch."""
        float(fn(args))
        best = 1e9
        for _ in range(n):
            t0 = time.perf_counter()
            float(fn(args))
            best = min(best, time.perf_counter() - t0)
        return best

    # --- batched SQOA decode: staged device-resident, per bucket ------------
    # Parity is checked ON DEVICE: the host oracle uploads (H2D ~1.7 GB/s
    # through the axon tunnel) and a masked compare fetches one bool per
    # image, instead of pulling the multi-GB decoded pixels back through
    # the tunnel's ~13-37 MB/s computed-array D2H path.
    _note(f"decode staging: {len(dec_buckets)} buckets, "
          f"{total_px / 1e6:.0f} Mpx")

    @functools.partial(jax.jit, static_argnames=())
    def _rows_equal(out, oracle, olen):
        if out.dtype != jnp.uint8:
            ou8 = jax.lax.bitcast_convert_type(out, jnp.uint8).reshape(
                out.shape[0], -1)
        else:
            ou8 = out.reshape(out.shape[0], -1)
        keep = jnp.arange(ou8.shape[1], dtype=jnp.int32)[None, :] < (
            olen[:, None])
        return jnp.all((ou8 == oracle) | ~keep, axis=1)

    dec_plans = []
    for (cat, colch, out_ch, m_pad, n_max), idxs in dec_buckets.items():
        b = len(idxs)
        buf = np.zeros((b, m_pad), np.uint8)
        clens = np.zeros(b, np.int32)
        npx = np.zeros(b, np.int32)
        oracle = np.zeros((b, n_max * out_ch), np.uint8)
        olen = np.zeros(b, np.int32)
        for j, i in enumerate(idxs):
            s = streams[i]
            buf[j, : len(s)] = np.frombuffer(s, np.uint8)
            clens[j] = len(s) - spec.PADDING_SIZE
            npx[j] = corpus[i][1] * corpus[i][2]
            opix, _ = native.decode(s, 0)
            oracle[j, : len(opix)] = opix
            olen[j] = len(opix)
        args = (jnp.asarray(buf), jnp.asarray(clens), jnp.asarray(npx))
        fn = functools.partial(
            decode_v2.decode_stream_batched,
            colch=colch, compat=False, out_ch=out_ch, n_max=n_max,
            emit="words" if (n_max * out_ch) % 4 == 0 else "u8",
            src_alpha=(out_ch in (2, 4)),
        )
        out, _ = fn(*args)
        ok = _rows_equal(out, jnp.asarray(oracle), jnp.asarray(olen))
        parity_ok += int(np.asarray(ok).sum())
        del out, ok, oracle
        dec_plans.append((cat, fn, args, sum(
            corpus[i][1] * corpus[i][2] for i in idxs)))
    _note(f"decode staging done, parity {parity_ok}/{len(corpus)}")

    def fuse_decode(plans):
        @jax.jit
        def _all(all_args):
            acc = jnp.float32(0)
            for (_, fn, _, _), args in zip(plans, all_args):
                out, _ = fn(*args)
                acc = acc + jnp.sum(out[:, ::4097].astype(jnp.float32))
            return acc
        return _all

    all_dec = fuse_decode(dec_plans)
    _note("timing fused decode")
    t = timed(all_dec, [a for _, _, a, _ in dec_plans])
    decode_mpxs = total_px / t / 1e6

    trace_dir = os.environ.get("SEQOIA_BENCH_TRACE", "")
    if trace_dir:
        with jax.profiler.trace(os.path.join(trace_dir, "decode")):
            float(all_dec([a for _, _, a, _ in dec_plans]))

    cat_dec = {}
    by_cat = defaultdict(list)
    for plan in dec_plans:
        by_cat[plan[0]].append(plan)
    for cat, plans in by_cat.items():
        f = fuse_decode(plans)
        tc = timed(f, [a for _, _, a, _ in plans], n=max(2, runs - 2))
        cat_dec[cat] = sum(p[3] for p in plans) / tc / 1e6

    # --- batched SQOA encode ------------------------------------------------
    # Parity on device, same scheme as decode: upload the oracle payloads,
    # require exact totals + masked byte equality, fetch one bool per image.
    _note(f"encode staging: {len(enc_buckets)} buckets")

    @jax.jit
    def _enc_rows_equal(out, totals, exp, elen):
        keep = jnp.arange(out.shape[1], dtype=jnp.int32)[None, :] < (
            elen[:, None])
        return (totals == elen) & jnp.all((out == exp) | ~keep, axis=1)

    enc_plans = []
    enc_parity = 0
    for (cat, colch, has_alpha, n_pad), idxs in enc_buckets.items():
        b = len(idxs)
        rgba = np.zeros((b, n_pad), np.int32)
        nval = np.zeros(b, np.int32)
        for j, i in enumerate(idxs):
            pix, w, h, ch, _ = corpus[i]
            desc = sq.SqoaDesc(w, h, ch, 0, 0)
            rgba[j, : w * h] = encode_jax.normalize_pixels_packed(pix, desc)
            nval[j] = w * h
        # adaptive cap, as the production BatchEncoder sizes it steady-state
        # (observed bytes/px + slack; overflow would retry exactly)
        bucket_max = max(len(streams[i]) for i in idxs)
        cap = spec.cap_bucket(bucket_max * 5 // 4)
        exp = np.zeros((b, int(cap)), np.uint8)
        elen = np.zeros(b, np.int32)
        for j, i in enumerate(idxs):
            pix, w, h, ch, _ = corpus[i]
            desc = sq.SqoaDesc(w, h, ch, 0, 0)
            payload = streams[i][len(spec.pack_header(desc)):]
            exp[j, : len(payload)] = np.frombuffer(payload, np.uint8)
            elen[j] = len(payload)
        args = (jnp.asarray(rgba), jnp.asarray(nval))
        fn = functools.partial(
            encode_v2.encode_stream_batched,
            colch=colch, has_alpha=has_alpha, compat=False, out_cap=int(cap),
        )
        out, totals = fn(*args)
        ok = _enc_rows_equal(out, totals, jnp.asarray(exp), jnp.asarray(elen))
        enc_parity += int(np.asarray(ok).sum())
        del out, ok, exp
        enc_plans.append((cat, fn, args, sum(
            corpus[i][1] * corpus[i][2] for i in idxs)))
    _note(f"encode staging done, parity {enc_parity}/{len(corpus)}")

    def fuse_encode(plans):
        @jax.jit
        def _all(all_args):
            acc = jnp.float32(0)
            for (_, fn, _, _), args in zip(plans, all_args):
                out, totals = fn(*args)
                acc = acc + jnp.sum(out[0, :8].astype(jnp.float32))
            return acc
        return _all

    all_enc = fuse_encode(enc_plans)
    _note("timing fused encode")
    t = timed(all_enc, [a for _, _, a, _ in enc_plans])
    encode_mpxs = total_px / t / 1e6

    if trace_dir:
        with jax.profiler.trace(os.path.join(trace_dir, "encode")):
            float(all_enc([a for _, _, a, _ in enc_plans]))

    cat_enc = {}
    by_cat_e = defaultdict(list)
    for plan in enc_plans:
        by_cat_e[plan[0]].append(plan)
    for cat, plans in by_cat_e.items():
        f = fuse_encode(plans)
        tc = timed(f, [a for _, _, a, _ in plans], n=max(2, runs - 2))
        cat_enc[cat] = sum(p[3] for p in plans) / tc / 1e6

    parity_pct = 100.0 * (parity_ok + enc_parity) / (2 * len(corpus))

    # release the sqoa staging before the API/qoi/large sections — each of
    # those stages multi-GB device buffers of its own
    del dec_plans, enc_plans, args
    import gc

    gc.collect()

    # --- public API path (corpus_decode / corpus_encode, end to end) --------
    from seqoia_tpu.parallel import batch as pbatch

    api = {}
    if os.environ.get("SEQOIA_BENCH_API", "1") == "1":
        _note("API path section")
        descs = [sq.SqoaDesc(w, h, ch, 0, 0) for _, w, h, ch, _ in corpus]
        imgs = [p for p, *_ in corpus]
        dec = pbatch.BatchDecoder()
        enc = pbatch.BatchEncoder()
        dec(streams)  # warm: compiles + cap estimates
        enc(imgs, descs)
        t0 = time.perf_counter()
        res = dec(streams)
        api_dec_t = time.perf_counter() - t0
        assert all(r.pixels is not None for r in res)
        t0 = time.perf_counter()
        res_e = enc(imgs, descs)
        api_enc_t = time.perf_counter() - t0
        assert all(r is not None for r in res_e)
        api = {
            "api_decode_mpxs": round(total_px / api_dec_t / 1e6, 1),
            "api_encode_mpxs": round(total_px / api_enc_t / 1e6, 1),
        }
        del res, res_e

    # --- .qoi compat passes (reference: sqoabench.c:469-539) ----------------
    # Both dispatches are timed and the winner is the headline: the host
    # pool scales with cores (this box has ONE, capping it at ~0.7x the
    # reference's M1 core), the TPU kernel path with the chip.
    qoi = {}
    if os.environ.get("SEQOIA_BENCH_QOI", "1") == "1":
        _note("qoi section")
        from seqoia_tpu.codec import decode_compat

        q_items = [
            (i, q) for i, q in enumerate(qoi_streams) if q is not None
        ]
        q_px = sum(corpus[i][1] * corpus[i][2] for i, _ in q_items)
        # the host legs are single-threaded per core; sample ~120 Mpx so
        # the pool timing doesn't dominate bench wall time at large scales
        hs_items, hs_px = [], 0
        for i, q in q_items:
            hs_items.append((i, q))
            hs_px += corpus[i][1] * corpus[i][2]
            if hs_px >= 120e6:
                break
        qdec = pbatch.BatchDecoder()
        hstreams = [q for _, q in hs_items]
        qres = qdec(hstreams)  # warm + parity sentinel
        q_dec_ok = sum(r.pixels is not None for r in qres)
        del qres
        t0 = time.perf_counter()
        qdec(hstreams)
        q_dec_t = time.perf_counter() - t0

        from concurrent.futures import ThreadPoolExecutor

        def qenc(arg):
            i, _ = arg
            p, w, h, ch, _ = corpus[i]
            return native.encode(p, w, h, ch, 0, 1)

        workers = os.cpu_count() or 8
        if workers <= 1:
            t0 = time.perf_counter()
            for it in hs_items:
                qenc(it)
            q_enc_t = time.perf_counter() - t0
        else:
            with ThreadPoolExecutor(workers) as ex:
                t0 = time.perf_counter()
                list(ex.map(qenc, hs_items))
                q_enc_t = time.perf_counter() - t0

        # on-box reference speeds: the genuine reference header, compiled
        # from its read-only mount and timed on this host's core, is the
        # apples-to-apples bar — the published 244.82/190.69 Mpx/s are an
        # Apple M1 core (bench10.txt:122), not this machine
        ref_onbox = {}
        try:
            import ctypes as _ct
            import subprocess as _sp

            _sp.run(
                ["cc", "-O3", "-std=c11", "-shared", "-fPIC", "-w",
                 "-o", "/tmp/librefprobe_bench.so",
                 '-DSQOA_REFERENCE_HEADER="/root/reference/seqoia.h"',
                 os.path.join(here, "tools", "refprobe.c")],
                check=True, capture_output=True)
            _lib = _ct.CDLL("/tmp/librefprobe_bench.so")
            _u8p = _ct.POINTER(_ct.c_uint8)
            _u32p = _ct.POINTER(_ct.c_uint32)
            _lib.ref_decode.restype = _ct.c_int64
            _lib.ref_decode.argtypes = [_u8p, _ct.c_int64, _ct.c_int, _u8p,
                                        _ct.c_int64, _u32p]
            _lib.ref_encode.restype = _ct.c_int64
            _out = np.empty(256_000_000, np.uint8)
            _dsc = np.zeros(5, np.uint32)
            _bufs = [np.frombuffer(bytearray(q), np.uint8)
                     for _, q in hs_items]
            t0 = time.perf_counter()
            for _b in _bufs:
                _lib.ref_decode(_b.ctypes.data_as(_u8p), len(_b), 0,
                                _out.ctypes.data_as(_u8p), len(_out),
                                _dsc.ctypes.data_as(_u32p))
            ref_onbox["qoi_ref_onbox_decode_mpxs"] = round(
                hs_px / (time.perf_counter() - t0) / 1e6, 1)
        except Exception:  # cc missing etc — the numbers are optional
            pass

        # TPU fixpoint decode over every color bucket (device-resident,
        # same methodology as the sqoa numbers); unconverged rows would
        # take the host fallback in production — convergence is reported.
        # Buckets sub-batch so the fixpoint's ~20x-stream working set
        # stays well inside HBM (rows per launch capped by stream bytes).
        fp_buckets = defaultdict(list)
        for i, q in q_items:
            fp_buckets[(_bucket(len(q)), _bucket(corpus[i][1] * corpus[i][2]))
                       ].append(i)
        fp_plans = []
        fp_conv = 0
        for (m_pad, n_max), all_idxs in fp_buckets.items():
            b_cap = max(1, (24 << 20) // m_pad)
            for c0 in range(0, len(all_idxs), b_cap):
                idxs = all_idxs[c0 : c0 + b_cap]
                b = b_cap if len(all_idxs) > b_cap else len(idxs)
                buf = np.zeros((b, m_pad), np.uint8)
                cl = np.zeros(b, np.int32)
                npx = np.zeros(b, np.int32)
                for j, i in enumerate(idxs):
                    q = qoi_streams[i]
                    buf[j, : len(q)] = np.frombuffer(q, np.uint8)
                    cl[j] = len(q) - spec.PADDING_SIZE
                    npx[j] = corpus[i][1] * corpus[i][2]
                fargs = (jnp.asarray(buf), jnp.asarray(cl), jnp.asarray(npx))
                ffn = functools.partial(
                    decode_compat.decode_stream_compat_batched,
                    colch=3, out_ch=4, n_max=int(n_max))
                out, conv = ffn(*fargs)
                float(sync(out))
                fp_conv += int(np.sum(np.asarray(conv)[: len(idxs)]))
                fp_plans.append((ffn, fargs))
                del out

        @jax.jit
        def _fp_all(all_args):
            acc = jnp.float32(0)
            for (ffn, _), a in zip(fp_plans, all_args):
                out, _ = ffn(*a)
                acc = acc + jnp.sum(out[:, ::4097].astype(jnp.float32))
            return acc

        tfp = timed(_fp_all, [a for _, a in fp_plans])
        fp_mpxs = q_px / tfp / 1e6
        # production-honest hybrid: unconverged rows re-decode on the host
        # pool, so their pixels are charged at the measured host rate
        unconv_px = q_px * (1.0 - fp_conv / max(len(q_items), 1))

        # TPU compat encode (slot last-writer hash resolution), bucketed
        # and sub-batched like the fixpoint leg; the fixpoint staging is
        # released first
        del fp_plans
        gc.collect()
        qe_buckets = defaultdict(list)
        for i, q in q_items:
            d = sq.SqoaDesc(*corpus[i][1:4], 0, 1)
            qe_buckets[(d.has_alpha, _bucket(d.n_pixels))].append(i)
        qe_plans = []
        qe_parity = 0
        for (has_alpha, n_pad), all_idxs in qe_buckets.items():
            b_cap = max(1, (24 << 20) // n_pad)
            for c0 in range(0, len(all_idxs), b_cap):
                idxs = all_idxs[c0 : c0 + b_cap]
                b = b_cap if len(all_idxs) > b_cap else len(idxs)
                rgba = np.zeros((b, n_pad), np.int32)
                nval = np.zeros(b, np.int32)
                for j, i in enumerate(idxs):
                    p, w, h, ch, _ = corpus[i]
                    d = sq.SqoaDesc(w, h, ch, 0, 1)
                    rgba[j, : w * h] = encode_jax.normalize_pixels_packed(
                        p, d)
                    nval[j] = w * h
                cap = spec.cap_bucket(
                    max(len(qoi_streams[i]) for i in idxs) * 5 // 4)
                eargs = (jnp.asarray(rgba), jnp.asarray(nval))
                efn = functools.partial(
                    encode_v2.encode_stream_batched,
                    colch=3, has_alpha=bool(has_alpha), compat=True,
                    out_cap=int(cap))
                out, totals = efn(*eargs)
                float(sync(out))
                oh, th = np.asarray(out), np.asarray(totals)
                for j, i in enumerate(idxs):
                    d = sq.SqoaDesc(*corpus[i][1:4], 0, 1)
                    qe_parity += (
                        spec.pack_header(d) + oh[j, : th[j]].tobytes()
                    ) == qoi_streams[i]
                qe_plans.append((efn, eargs))
                del out, oh

        @jax.jit
        def _qe_all(all_args):
            acc = jnp.float32(0)
            for (efn, _), a in zip(qe_plans, all_args):
                out, _ = efn(*a)
                acc = acc + jnp.sum(out[0, :8].astype(jnp.float32))
            return acc

        tqe = timed(_qe_all, [a for _, a in qe_plans])
        qe_mpxs = q_px / tqe / 1e6

        host_dec = hs_px / q_dec_t / 1e6
        host_enc = hs_px / q_enc_t / 1e6
        hybrid_dec = q_px / (tfp + unconv_px / (host_dec * 1e6)) / 1e6
        best_dec = max(host_dec, hybrid_dec)
        best_enc = max(host_enc, qe_mpxs)
        qoi = {
            "qoi_decode_mpxs": round(best_dec, 1),
            "qoi_encode_mpxs": round(best_enc, 1),
            "qoi_decode_dispatch": (
                "tpu+fallback" if hybrid_dec > host_dec else "host"),
            "qoi_encode_dispatch": "tpu" if qe_mpxs > host_enc else "host",
            "qoi_decode_vs_ref": round(best_dec / BASELINE_QOI_DECODE_MPXS, 2),
            "qoi_encode_vs_ref": round(best_enc / BASELINE_QOI_ENCODE_MPXS, 2),
            "qoi_host_decode_mpxs": round(host_dec, 1),
            "qoi_host_encode_mpxs": round(host_enc, 1),
            "qoi_tpu_decode_mpxs": round(fp_mpxs, 1),
            "qoi_tpu_encode_mpxs": round(qe_mpxs, 1),
            "qoi_tpu_converged_pct": round(100.0 * fp_conv / len(q_items), 1),
            "qoi_tpu_encode_parity_n": qe_parity,
            "qoi_host_parity_n": q_dec_ok,
            "qoi_host_sample_mpx": round(hs_px / 1e6, 1),
            **ref_onbox,
        }
        if "qoi_ref_onbox_decode_mpxs" in ref_onbox:
            qoi["qoi_decode_vs_ref_onbox"] = round(
                best_dec / ref_onbox["qoi_ref_onbox_decode_mpxs"], 2)
        del qe_plans

    gc.collect()

    # --- large single image (100 Mpx, BASELINE config 5) --------------------
    large = {}
    if os.environ.get("SEQOIA_BENCH_LARGE", "1") == "1":
        _note("large-image section")
        from seqoia_tpu.parallel import tiled
        from seqoia_tpu.ops import pallas_pack

        lw = lh = 10000
        lpix = _large_photo(lw, lh)
        ldesc = sq.SqoaDesc(lw, lh, 3, 0, 0)
        loracle = native.encode(lpix, lw, lh, 3, 0, 0)

        # device-resident encode compute: pre-staged packed pixels, exact
        # cap (the steady-state adaptive cap), scalar-fenced
        packed = pallas_pack.normalize_pixels_device(lpix, ldesc)
        packed.block_until_ready()
        n = lw * lh
        cap = spec.cap_bucket(len(loracle) * 9 // 8)
        efn = jax.jit(functools.partial(
            encode_v2.encode_stream_flat, colch=3, has_alpha=False,
            out_cap=int(cap)))

        def enc_run(p):
            out, tot = efn(p, jnp.int32(n))
            return jnp.sum(out[::65537].astype(jnp.float32)) + tot

        enc_run_j = jax.jit(enc_run)
        t_ec = timed(enc_run_j, packed, n=3)

        # end-to-end encode (host bytes in, file bytes out)
        stream = tiled.encode_large(lpix, ldesc)  # warm compiles
        t0 = time.perf_counter()
        stream = tiled.encode_large(lpix, ldesc)
        t_ee = time.perf_counter() - t0

        # device-resident decode compute
        m_pad = _bucket(len(loracle))
        n_max = _bucket(n)
        buf = np.zeros((1, m_pad), np.uint8)
        buf[0, : len(loracle)] = np.frombuffer(loracle, np.uint8)
        darr = jax.device_put(jnp.asarray(buf))
        dfn = jax.jit(functools.partial(
            decode_v2.decode_stream_batched, colch=3, compat=False,
            out_ch=3, n_max=int(n_max), emit="words", src_alpha=False))

        def dec_run(d):
            out, _ = dfn(d, jnp.full((1,), len(loracle) - spec.PADDING_SIZE,
                                     jnp.int32),
                         jnp.full((1,), n, jnp.int32))
            return jnp.sum(out[:, ::4097].astype(jnp.float32))

        dec_run_j = jax.jit(dec_run)
        t_dc = timed(dec_run_j, darr, n=3)
        del darr

        # end-to-end decode
        lback, _ = tiled.decode_large(loracle, 0)  # warm
        t0 = time.perf_counter()
        lback, _ = tiled.decode_large(loracle, 0)
        t_de = time.perf_counter() - t0

        large = {
            "large_mpx": round(n / 1e6, 1),
            "large_rate_pct": round(100.0 * len(loracle) / (n * 3), 1),
            "large_encode_compute_mpxs": round(n / t_ec / 1e6, 1),
            "large_decode_compute_mpxs": round(n / t_dc / 1e6, 1),
            "large_encode_mpxs": round(n / t_ee / 1e6, 1),
            "large_decode_mpxs": round(n / t_de / 1e6, 1),
            "large_parity": bool(
                stream == loracle and np.array_equal(lback, lpix)
            ),
        }
        del lpix, stream, loracle, lback, packed

    # --- xlarge: 400 Mpx, the reference's hard cap (seqoia.h:428-432) -------
    if os.environ.get("SEQOIA_BENCH_XLARGE", "1") == "1":
        _note("xlarge 400 Mpx section")
        gc.collect()
        large.update(xlarge_leg())

    # --- per-category table (sqoabench.c:350-389 style) ---------------------
    raw_total = sum(c[2] for c in cats.values())
    sqoa_total = sum(c[3] for c in cats.values())
    qoi_total = sum(c[4] for c in cats.values())
    # qoi comparisons only over categories that have a .qoi encoding
    # (mono+compat is rejected by the format, seqoia.h:477-480)
    qoi_raw = sum(c[2] for c in cats.values() if c[4])
    sqoa_cmp = sum(c[3] for c in cats.values() if c[4])
    print(
        f"{'category':14s}{'images':>7s}{'Mpx':>8s}{'dec mpps':>10s}"
        f"{'enc mpps':>10s}{'sqoa kb':>9s}{'qoi kb':>9s}{'rate':>7s}"
        f"{'qoi rate':>9s}{'vs qoi':>8s}",
        file=sys.stderr,
    )
    for cat in sorted(cats):
        n_, px, raw, sz, qz = cats[cat]
        vs = f"{100.0 * sz / qz - 100.0:+7.2f}%" if qz else "      —"
        qr = f"{100.0 * qz / raw:8.1f}%" if qz else "       —"
        print(
            f"{cat:14s}{n_:7d}{px / 1e6:8.1f}{cat_dec.get(cat, 0):10.0f}"
            f"{cat_enc.get(cat, 0):10.0f}{sz // 1024:9d}{qz // 1024:9d}"
            f"{100.0 * sz / raw:6.1f}%{qr}{vs}",
            file=sys.stderr,
        )
    print(
        f"{'# total':14s}{len(corpus):7d}{total_px / 1e6:8.1f}"
        f"{decode_mpxs:10.0f}{encode_mpxs:10.0f}"
        f"{sqoa_total // 1024:9d}{qoi_total // 1024:9d}"
        f"{100.0 * sqoa_total / raw_total:6.1f}%"
        f"{100.0 * qoi_total / qoi_raw:8.1f}%"
        f"{100.0 * sqoa_cmp / qoi_total - 100.0:+7.2f}%",
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
        "qoi_rate_pct": round(100.0 * qoi_total / qoi_raw, 2),
        "size_vs_qoi_pct": round(100.0 * sqoa_cmp / qoi_total - 100.0, 3),
        "corpus_mpx": round(total_px / 1e6, 2),
        "images": len(corpus),
        "device": str(jax.devices()[0]),
        **api,
        **qoi,
        **large,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
