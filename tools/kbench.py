#!/usr/bin/env python
"""Per-kernel microbenchmark for the hot SQOA codec path.

Times, on the real chip with device-resident inputs (per shape bucket,
summed — the axon tunnel rejects very large fused compiles):
  * decode_front_compact alone
  * decode place_emit alone (on the front's outputs)
  * full decode_stream_batched
  * encode_front_compact alone
  * encode place_emit alone
  * full encode_stream_batched

Usage: python tools/kbench.py [scale] [section]   (section: dec|enc|all)
"""
import functools
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)

import seqoia_tpu as sq
from seqoia_tpu import native, spec
from seqoia_tpu.codec import decode_v2, encode_v2, encode_jax
from seqoia_tpu.utils import make_corpus


def _bucket(x, mult=32768):
    return max(-(-int(x) // mult) * mult, mult)


def timed_sum(fns_args, n=5):
    """Best-of-n wall time of a sequence of independently jitted programs.

    All dispatches are enqueued asynchronously; ONE scalar fetch at the end
    synchronizes (the device queue is FIFO, and under the axon remote
    platform block_until_ready returns at dispatch — only pulling a
    computed scalar to the host fences, and each fetch costs a tunnel
    round trip, so fetch exactly once per timed pass)."""
    fenceds = []
    for fn, args in fns_args:
        fenced = jax.jit(lambda *a, _f=fn: jax.tree.reduce(
            lambda acc, x: acc + x.reshape(-1)[:2].astype(jnp.float32).sum()
            + x.reshape(-1)[-2:].astype(jnp.float32).sum(),
            _f(*a), jnp.float32(0)))
        float(fenced(*args))  # warm/compile
        fenceds.append((fenced, args))
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        out = None
        for fenced, args in fenceds:
            out = fenced(*args)
        float(out)
        best = min(best, time.perf_counter() - t0)
    return best


def dispatch_floor(fns_args, n=5):
    """Wall time of the same launch sequence with trivial per-bucket
    programs — the tunnel's per-launch overhead, to subtract."""
    trivial = [
        (jax.jit(lambda *a: sum(jnp.float32(0) + x.reshape(-1)[0]
                                for x in jax.tree.leaves(a))), args)
        for _, args in fns_args
    ]
    return timed_sum(trivial, n=n)


def report(name, total_px, fns_args, n=5):
    t = timed_sum(fns_args, n=n)
    floor = dispatch_floor(fns_args, n=n)
    tk = max(t - floor, 1e-9)
    print(f"{name:22s}: {total_px/t/1e6:9.1f} Mpx/s  ({t*1e3:.1f} ms; "
          f"-dispatch {total_px/tk/1e6:9.1f} Mpx/s, floor {floor*1e3:.1f} ms)",
          flush=True)


def main():
    scale = float(sys.argv[1]) if len(sys.argv) > 1 else 4.0
    section = sys.argv[2] if len(sys.argv) > 2 else "all"
    corpus = make_corpus(scale, labels=True)
    corpus = [c for c in corpus if c[3] in (3, 4)]
    streams = [native.encode(p, w, h, ch, 0, 0) for p, w, h, ch, _ in corpus]
    total_px = sum(w * h for _, w, h, _, _ in corpus)
    print(f"corpus: {len(corpus)} color images, {total_px/1e6:.1f} Mpx",
          flush=True)

    from seqoia_tpu.ops import pallas_frontend, pallas_engine, pallas_encode

    if section in ("dec", "all"):
        dec_buckets = defaultdict(list)
        for i, ((pix, w, h, ch, cat), stream) in enumerate(
                zip(corpus, streams)):
            desc = sq.SqoaDesc(w, h, ch, 0, 0)
            dec_buckets[(desc.col_channels, desc.norm_channels,
                         _bucket(len(stream)), _bucket(w * h))].append(i)

        front_plans = []
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
            front_plans.append(
                ((jnp.asarray(buf), jnp.asarray(clens), jnp.asarray(npx)),
                 int(n_max), out_ch not in (2, 4), out_ch))

        if os.environ.get("KBENCH_PARITY", "1") == "1":
            @jax.jit
            def _rows_equal(out, oracle, olen):
                ou8 = jax.lax.bitcast_convert_type(out, jnp.uint8).reshape(
                    out.shape[0], -1)
                keep = jnp.arange(ou8.shape[1], dtype=jnp.int32)[None, :] < (
                    olen[:, None])
                return jnp.all((ou8 == oracle) | ~keep, axis=1)

            n_ok = 0
            for (args, n_max, no_alpha, out_ch), \
                    ((_, _, m_pad, _), idxs) in zip(front_plans,
                                                    dec_buckets.items()):
                oracle = np.zeros((len(idxs), n_max * out_ch), np.uint8)
                olen = np.zeros(len(idxs), np.int32)
                for j, i in enumerate(idxs):
                    opix, _ = native.decode(streams[i], 0)
                    oracle[j, : len(opix)] = opix
                    olen[j] = len(opix)
                out, _ = decode_v2.decode_stream_batched(
                    *args, colch=3, compat=False, out_ch=out_ch,
                    n_max=n_max, emit="words", src_alpha=not no_alpha)
                ok = _rows_equal(out, jnp.asarray(oracle),
                                 jnp.asarray(olen))
                n_ok += int(np.asarray(ok).sum())
            print(f"decode parity: {n_ok}/{len(corpus)}", flush=True)

        fa = [
            (jax.jit(functools.partial(
                pallas_frontend.decode_front_compact, n_max=n_max,
                mode="noalpha" if no_alpha else "alpha")),
             (args[0], args[1]))
            for args, n_max, no_alpha, _ in front_plans
        ]
        report("decode_front_compact", total_px, fa)

        init = int(np.int32(np.uint32(255 << 24)))
        place_plans = []
        for (args, n_max, no_alpha, out_ch) in front_plans:
            keys_c, pays_c, totals, _ = pallas_frontend.decode_front_compact(
                args[0], args[1], n_max,
                mode="noalpha" if no_alpha else "alpha")
            jax.block_until_ready(keys_c)
            p_out = next(p for p in (32768, 16384, 8192, 4096, 2048)
                         if n_max % p == 0)
            rows = p_out // 128
            out_rows = rows if out_ch == 4 else rows * 3 // 4
            fn = jax.jit(functools.partial(
                pallas_engine.place_emit, n_out=n_max, inits=(init,),
                epilogue=decode_v2._dec_epilogue(out_ch), p_out=p_out,
                out_rows=out_rows, out_dtype=jnp.int32))
            place_plans.append(
                (fn, (keys_c, pays_c, totals, args[2][:, None])))
        report("decode place_emit", total_px, place_plans)
        del place_plans

        da = [
            (jax.jit(functools.partial(
                decode_v2.decode_stream_batched, colch=3, compat=False,
                out_ch=out_ch, n_max=n_max, emit="words",
                src_alpha=not no_alpha)), args)
            for args, n_max, no_alpha, out_ch in front_plans
        ]
        report("decode full", total_px, da)
        del front_plans, da, fa

    if section in ("enc", "all"):
        enc_buckets = defaultdict(list)
        for i, (pix, w, h, ch, cat) in enumerate(corpus):
            desc = sq.SqoaDesc(w, h, ch, 0, 0)
            enc_buckets[(desc.col_channels, desc.has_alpha,
                         _bucket(w * h))].append(i)

        enc_plans = []
        for (colch, has_alpha, n_pad), idxs in enc_buckets.items():
            b = len(idxs)
            rgba = np.zeros((b, n_pad), np.int32)
            nval = np.zeros(b, np.int32)
            for j, i in enumerate(idxs):
                pix, w, h, ch, _ = corpus[i]
                desc = sq.SqoaDesc(w, h, ch, 0, 0)
                rgba[j, : w * h] = encode_jax.normalize_pixels_packed(
                    pix, desc)
                nval[j] = w * h
            cap = spec.cap_bucket(
                max(len(streams[i]) for i in idxs) * 5 // 4)
            enc_plans.append(
                ((jnp.asarray(rgba), jnp.asarray(nval)), bool(has_alpha),
                 int(cap)))

        ef = [
            (jax.jit(functools.partial(
                pallas_encode.encode_front_compact, colch=3)), args)
            for args, _, _ in enc_plans
        ]
        report("encode_front_compact", total_px, ef)

        maxrun = spec.SQOA_MAXRUN
        eplace = []
        for (args, has_alpha, cap) in enc_plans:
            keys_c, pays_c, totals_c, chunk_totals, last_c = (
                pallas_encode.encode_front_compact(args[0], args[1], colch=3))
            jax.block_until_ready(keys_c)
            trail_pending = ((args[1] - 1) - last_c) % maxrun
            has_trail = (trail_pending > 0) & (args[1] > 0)
            scal = jnp.stack(
                [chunk_totals, has_trail.astype(jnp.int32),
                 jnp.ones_like(chunk_totals)], axis=-1)
            scal.block_until_ready()
            fn = jax.jit(functools.partial(
                pallas_engine.place_emit, n_out=cap,
                inits=encode_v2._emit_inits(3),
                epilogue=encode_v2._emit_epilogue(3), fill_keys=True,
                p_out=next(p for p in (32768, 16384, 8192, 4096, 2048)
                           if cap % p == 0)))
            eplace.append(
                (fn, (keys_c, encode_v2._emit_payloads(pays_c, keys_c),
                      totals_c, scal)))
        report("encode place_emit", total_px, eplace)
        del eplace

        ea = [
            (jax.jit(functools.partial(
                encode_v2.encode_stream_batched, colch=3,
                has_alpha=has_alpha, compat=False, out_cap=cap)), args)
            for args, has_alpha, cap in enc_plans
        ]
        report("encode full", total_px, ea)


if __name__ == "__main__":
    main()
