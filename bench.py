#!/usr/bin/env python
"""seqoia_tpu benchmark: aggregate codec throughput on one chip.

Emits the result JSON line to stdout INCREMENTALLY: as soon as the core
sqoa decode number exists a complete record is printed, and every section
that completes afterwards re-prints a superset record (the driver parses
the last JSON line; a timeout truncates extras instead of erasing the
headline — the reference's harness likewise always prints its totals,
sqoabench.c:637-678). A wall budget (``SEQOIA_BENCH_BUDGET`` seconds,
default 1200) gates the optional sections so the run finishes inside the
driver's window; skipped sections are listed in the record.

Baseline: the reference's single-core sqoa decode grand total, 246.25 Mpx/s
on Apple M1 (BASELINE.md); vs_baseline = aggregate decode Mpx/s / 246.25.

Methodology mirrors sqoabench (reference: sqoabench.c:394-406) adapted to a
batched accelerator: the corpus is encoded by the (reference-pinned) native
oracle, streams are staged device-resident per shape bucket, all bucket
dispatches fuse into one jitted program, kernels are compiled once, then
timed over ``SEQOIA_BENCH_RUNS`` best-of samples with one discarded
warmup; each sample enqueues ``SEQOIA_BENCH_INNER`` (default 4) async
dispatches and fences once with a scalar fetch, dividing by the count —
the analogue of the reference harness timing a loop between clock reads
(sqoabench.c:394-406; a single scalar fetch costs ~24 ms of tunnel round
trip here, which would otherwise tax ~350 ms kernel runs by ~7%). Byte-exact parity is verified for every image before any timing
counts — ON DEVICE, inside the fused program's warmup run, with a masked
byte-exact compare reducing to one bool per image. The tunnel's H2D runs
~15-20 MB/s on this box (measured round 4; the byte count, not the
dispatch count, is the staging wall), so the staging uploads exactly two
things — the oracle streams and the raw pixel bytes — and derives
everything else on device: pixels pack to the encoder's int32 layout with
the Pallas pack kernel, the decode expectation comes from strided slices
of those packed words, and the encode expectation is a slice of the
already-uploaded stream bytes. No decoded-pixel or payload oracles cross
the wire, and no host decode passes run at all (the streams come from the
reference-pinned oracle encoder, so parity against the original pixels is
exactly the roundtrip contract — sqoabench.c:448-455 memcmp's the same
way).

Reported alongside (each section budget-gated, record re-emitted after):

* per-category decode/encode Mpx/s (each category timed as its own fused
  program — regressions localize, sqoabench.c:350-389) + ``vs_prev``
  against the last captured BENCH artifact;
* the `.qoi` half of the format (reference: sqoabench.c:469-539): compat
  decode/encode through the production dispatch (host pool across cores;
  the TPU fixpoint leg reports separately with its convergence rate);
* the 100 Mpx single image (BASELINE config 5) split into device-resident
  compute (pre-staged input, scalar-fenced) and end-to-end wall clock —
  on this box the axon tunnel's ~13 MB/s-per-stream D2H dominates e2e;
* the public batched API path (`corpus_decode`/`corpus_encode`) end to
  end with its staging/compute/fetch split;
* the 400 Mpx single-call ceiling (seqoia.h:428-432).
"""

import functools
import hashlib
import inspect
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

_HERE = os.path.dirname(os.path.abspath(__file__))


def _note(msg):
    """Progress marker on stderr (the JSON contract owns stdout). The
    interesting sections run minutes each on the tunnel; silence reads as
    a hang."""
    print(f"[bench {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


def _mem_note(tag):
    """Device-HBM usage marker (allocator stats where the backend
    exposes them) — the r5 OOM hunts live and die by these."""
    try:
        import jax

        s = jax.local_devices()[0].memory_stats() or {}
        _note(f"hbm[{tag}]: in_use={s.get('bytes_in_use', -1) >> 20} MB "
              f"peak={s.get('peak_bytes_in_use', -1) >> 20} MB "
              f"limit={s.get('bytes_limit', -1) >> 20} MB")
    except Exception as e:
        _note(f"hbm[{tag}]: unavailable ({e!r})")


def _bucket(x, mult=32768):
    """Round up to a tile multiple — tighter than pow2 (less padded work),
    still few distinct shapes per corpus."""
    return max(-(-int(x) // mult) * mult, mult)


def _shape_bucket(x, floor=4096):
    """Round up to the shape-canonicalization lattice: pow2 below 32768
    (the reduced-tile front sizes), {3, 4} * 2^k tile-multiples above —
    always 32768-aligned, so the 256-row fronts and the 32768-entry
    placement tiles apply everywhere.

    Every distinct (m_pad, n_pad) is a separate XLA subprogram, and each
    subprogram costs ~3-4 s of per-process executable load through the
    tunnel REGARDLESS of the compile cache (measured round 5: the old
    any-multiple-of-32768 buckets put several hundred seconds of fixed
    load cost into every run; 74 buckets -> 25 on this lattice). The
    ~1.3x steps pad only ~1.6% of corpus pixels (pure pow2: 19 buckets
    but 24% pixel padding — a measured ~7% decode-throughput tax)."""
    x = max(int(x), floor)
    if x <= 16384:
        return 1 << (x - 1).bit_length()
    u = -(-x // 32768)
    p = 1 << max((u - 1).bit_length(), 0)
    v = 3 * p // 4 if 3 * p // 4 >= u else p
    return 32768 * v


class _Budget:
    """Wall budget for the whole bench run. Optional sections ask
    ``ok(estimate)`` before starting; the reserve keeps the final record
    emission (and the section in flight) inside the window."""

    def __init__(self, total_s, reserve_s=45.0):
        self.t0 = time.monotonic()
        self.total = total_s
        self.reserve = reserve_s

    def elapsed(self):
        return time.monotonic() - self.t0

    def remaining(self):
        return self.total - self.elapsed()

    def ok(self, estimate_s):
        return self.remaining() - self.reserve > estimate_s


class _Emitter:
    """Accumulates the result record; every ``emit`` prints the full JSON
    on its own stdout line (flushed), so whatever line is last when the
    driver's window closes is a complete, parseable record."""

    def __init__(self):
        self.rec = {}
        self.skipped = []

    def update(self, **fields):
        self.rec.update(fields)

    def emit(self, budget, final=False):
        out = dict(self.rec)
        out["elapsed_s"] = round(budget.elapsed(), 1)
        if self.skipped:
            out["sections_skipped"] = list(self.skipped)
        out["partial"] = not final
        print(json.dumps(out), flush=True)


def _load_prev_record():
    """Newest driver-captured BENCH_r*.json with a parsed record — the
    fail-soft regression base for vs_prev (VERDICT r3 ask #7)."""
    import glob

    best_n, best = -1, None
    for p in glob.glob(os.path.join(_HERE, "BENCH_r*.json")):
        try:
            with open(p) as f:
                rec = json.load(f)
        except Exception:
            continue
        parsed = rec.get("parsed")
        n = rec.get("n", 0)
        if isinstance(parsed, dict) and "decode_mpxs" in parsed and n > best_n:
            best_n, best = n, parsed
    return best


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


def _native_src():
    return open(
        os.path.join(_HERE, "seqoia_tpu/native/sqoa_native.c"), "rb"
    ).read()


def _large_assets(lw, lh):
    """(pixels, oracle stream) for the single-large-image legs, disk-cached:
    the host oracle encodes ~78 Mpx/s on this box, so a 400 Mpx oracle costs
    ~5 min per run uncached. Keyed by the generator source + the native
    runtime source (auto-invalidates when either changes)."""
    from seqoia_tpu import native

    key = hashlib.sha1(
        inspect.getsource(_large_photo).encode()
        + _native_src() + f"{lw}x{lh}".encode()
    ).hexdigest()[:16]
    path = os.path.join(_HERE, f".bench_cache_L{key}.npz")
    if os.path.exists(path):
        z = np.load(path)
        return z["pixels"], z["stream"].tobytes()
    _note(f"large-asset cache miss: generating {lw}x{lh} + oracle encode")
    pix = _large_photo(lw, lh)
    stream = native.encode(pix, lw, lh, 3, 0, 0)
    np.savez(path, pixels=pix, stream=np.frombuffer(stream, np.uint8))
    return pix, stream


def _corpus_assets(scale):
    """(corpus, streams, qoi_streams) with split disk caches: pixels keyed
    by the corpus generator + scale, oracle streams keyed additionally by
    the native runtime source — a native change re-encodes streams (~10 s)
    without regenerating pixels (tens of minutes at scale 64)."""
    from seqoia_tpu import native
    from seqoia_tpu.utils import corpus as corpus_mod
    from seqoia_tpu.utils import make_corpus

    corpus_src = open(corpus_mod.__file__, "rb").read()
    pix_key = hashlib.sha1(
        corpus_src + str(scale).encode()
    ).hexdigest()[:16]
    pix_path = os.path.join(_HERE, f".bench_cache_P{pix_key}.npz")
    str_key = hashlib.sha1(
        (pix_key.encode()) + _native_src()
    ).hexdigest()[:16]
    str_path = os.path.join(_HERE, f".bench_cache_S{str_key}.npz")

    corpus = None
    if os.path.exists(pix_path):
        z = np.load(pix_path, allow_pickle=False)
        pix_cat, lens, meta, cats_arr = (
            z["pixels"], z["pix_lens"], z["meta"], z["cats"]
        )
        offs = np.concatenate([[0], np.cumsum(lens)])
        corpus = [
            (pix_cat[offs[i] : offs[i + 1]], int(meta[i, 0]),
             int(meta[i, 1]), int(meta[i, 2]), str(cats_arr[i]))
            for i in range(len(lens))
        ]
    else:
        # migration: the pre-round-4 combined cache (pixels + streams keyed
        # together) holds the same deterministic pixels — split it instead
        # of regenerating
        old_key = hashlib.sha1(
            corpus_src + _native_src() + str(scale).encode()
        ).hexdigest()[:16]
        old_path = os.path.join(_HERE, f".bench_cache_{old_key}.npz")
        if os.path.exists(old_path):
            _note("migrating combined bench cache to split caches")
            z = np.load(old_path, allow_pickle=False)
            np.savez(pix_path, pixels=z["pixels"], pix_lens=z["pix_lens"],
                     meta=z["meta"], cats=z["cats"])
            np.savez(str_path, streams=z["streams"],
                     stream_lens=z["stream_lens"], qstreams=z["qstreams"],
                     qstream_lens=z["qstream_lens"])
            return _corpus_assets(scale)
        _note(f"corpus cache miss: generating at scale {scale}")
        corpus = make_corpus(scale, labels=True)
        np.savez(
            pix_path,
            pixels=np.concatenate([p for p, *_ in corpus]),
            pix_lens=np.array([len(p) for p, *_ in corpus], np.int64),
            meta=np.array([(w, h, ch) for _, w, h, ch, _ in corpus],
                          np.int64),
            cats=np.array([c for *_, c in corpus]),
        )

    if os.path.exists(str_path):
        z = np.load(str_path, allow_pickle=False)
        s_cat, s_lens = z["streams"], z["stream_lens"]
        soffs = np.concatenate([[0], np.cumsum(s_lens)])
        streams = [
            s_cat[soffs[i] : soffs[i + 1]].tobytes()
            for i in range(len(s_lens))
        ]
        q_cat, q_lens = z["qstreams"], z["qstream_lens"]
        qoffs = np.concatenate([[0], np.cumsum(q_lens)])
        qoi_streams = [
            q_cat[qoffs[i] : qoffs[i + 1]].tobytes() if q_lens[i] else None
            for i in range(len(q_lens))
        ]
    else:
        _note("stream cache miss: oracle-encoding corpus")
        streams = [
            native.encode(p, w, h, ch, 0, 0) for p, w, h, ch, _ in corpus
        ]
        qoi_streams = [
            native.encode(p, w, h, ch, 0, 1) if ch not in (1, 2) else None
            for p, w, h, ch, _ in corpus
        ]
        np.savez(
            str_path,
            streams=np.frombuffer(b"".join(streams), np.uint8),
            stream_lens=np.array([len(s) for s in streams], np.int64),
            qstreams=np.frombuffer(
                b"".join(q for q in qoi_streams if q), np.uint8),
            qstream_lens=np.array(
                [len(q) if q else 0 for q in qoi_streams], np.int64),
        )
    return corpus, streams, qoi_streams


def xlarge_leg(dim=None, runs=3):
    """400 Mpx single-call leg — the reference's hard cap (seqoia.h:428-432).

    20000x20000 is exactly 400e6 and REJECTED (height >= 400e6/width), so
    the maximal legal shape at width 20000 is 20000x19999. Device-resident
    compute only: the end-to-end story is the 100 Mpx leg's; this leg
    proves the single-call ceiling decodes/encodes at speed.

    The only upload is the oracle STREAM (~0.7 GB): the encode input is
    derived ON DEVICE from the decode output (the decoded RGB words are
    exactly pack_words' stride-3 input), and the encode expectation is a
    slice of the already-uploaded stream. At the tunnel's ~15-20 MB/s
    that halves the leg's wall cost vs also uploading the 1.2 GB raw
    pixels, which is what lets this section fit the driver's window
    (VERDICT r4 #3). Parity is the roundtrip
    ``encode(pack(decode(stream))) == stream`` — byte-exact over every
    stream byte on device, which pins decode(stream) to the encoder's
    unique preimage — PLUS a direct sampled compare of the decoded words
    against the host pixels (32 chunks, ~8 MB) to break any
    compensating-bug tie between the two directions. The 100 Mpx section
    keeps the fully-direct both-sides parity against uploaded pixels.
    ``SEQOIA_BENCH_XLARGE_DIRECT=1`` restores the full direct compare
    here too (uploads the pixels). Standalone so it can be smoke-run at
    a small `dim` without the rest of the bench."""
    import jax
    import jax.numpy as jnp

    _platform_override()
    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(_HERE, ".jax_cache")
    )
    import seqoia_tpu as sq
    from seqoia_tpu import spec
    from seqoia_tpu.codec import decode_v2, encode_v2
    from seqoia_tpu.ops import pallas_pack

    inner = int(os.environ.get("SEQOIA_BENCH_INNER", "4"))

    def timed(fn, args, n=runs):
        # inner-loop amortization of the tunnel dispatch+fetch round trip
        # (see main's timed)
        float(fn(args))
        best = 1e9
        for _ in range(n):
            t0 = time.perf_counter()
            for _ in range(inner - 1):
                fn(args)
            float(fn(args))
            best = min(best, (time.perf_counter() - t0) / inner)
        return best

    @jax.jit
    def rows_equal(ou8, oracle, olen):
        keep = jnp.arange(ou8.shape[0], dtype=jnp.int32) < olen
        return jnp.all((ou8 == oracle) | ~keep)

    xw = int(dim or os.environ.get("SEQOIA_BENCH_XLARGE_DIM", "20000"))
    xh = xw - 1
    xn = xw * xh
    xpix, xoracle = _large_assets(xw, xh)
    xdesc = sq.SqoaDesc(xw, xh, 3, 0, 0)
    direct = os.environ.get("SEQOIA_BENCH_XLARGE_DIRECT", "") == "1"

    # decode compute (input: the uploaded oracle stream)
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
    # valid region is word-aligned: xn*3 % 4 == 0 because xw % 4 == 0, so
    # the host .view against the raw pixels is free. (Comparisons stay in
    # int32 WORD space: a device bitcast to (1, N, 4) uint8 puts the
    # 4-channel axis minor, whose T(8,128) tiled layout pads 32x — 38 GB
    # at 400 Mpx.)
    assert xw % 4 == 0
    nw = xn * 3 // 4
    if direct:
        exp = np.zeros(int(words.shape[1]) * 4, np.uint8)
        exp[: xn * 3] = xpix
        xdec_ok = bool(jax.device_get(rows_equal(
            words.reshape(-1), jnp.asarray(exp.view("<i4")), jnp.int32(nw))))
        del exp
    else:
        # direct sampled compare: 32 contiguous 64K-word chunks spread over
        # the valid region (~8 MB D2H)
        host_words = np.ascontiguousarray(xpix[: nw * 4]).view("<i4")
        wflat = words.reshape(-1)
        chunk = 65536
        xdec_ok = True
        for k in range(32):
            off = (k * (nw - chunk)) // 31
            got = np.asarray(wflat[off : off + chunk])
            if not np.array_equal(got, host_words[off : off + chunk]):
                xdec_ok = False
                break
        del host_words, wflat

    # encode compute: input pixels derived ON DEVICE — the decoded RGB
    # words are precisely the stride-3 raw words pack_words ingests
    _note("xlarge encode")
    if direct:
        packed = pallas_pack.normalize_pixels_device(xpix, xdesc)
        packed.block_until_ready()
    else:
        packed = pallas_pack.pack_words(words[:, : n_max * 3 // 4], 3)[0]
        packed.block_until_ready()
    del words
    xcap = spec.cap_bucket(len(xoracle) * 9 // 8)
    xefn = jax.jit(functools.partial(
        encode_v2.encode_stream_flat, colch=3, has_alpha=False,
        out_cap=int(xcap)))

    def xenc_run(p):
        out, tot = xefn(p, jnp.int32(xn))
        return jnp.sum(out[::65537].astype(jnp.float32)) + tot

    t_xe = timed(jax.jit(xenc_run), packed)

    @jax.jit
    def xenc_parity(p, stream_buf, elen):
        out, tot = xefn(p, jnp.int32(xn))
        L = min(out.shape[0], stream_buf.shape[1] - (spec.HEADER_SIZE + 1))
        exp = jax.lax.slice_in_dim(
            stream_buf, spec.HEADER_SIZE + 1, spec.HEADER_SIZE + 1 + L,
            axis=1)[0]
        keep = jnp.arange(L, dtype=jnp.int32) < elen
        return (tot == elen) & jnp.all((out[:L] == exp) | ~keep)

    elen = len(xoracle) - (spec.HEADER_SIZE + 1)
    xenc_ok = bool(jax.device_get(
        xenc_parity(packed, xarr, jnp.int32(elen))))
    return {
        "xlarge_mpx": round(xn / 1e6, 1),
        "xlarge_decode_compute_mpxs": round(xn / t_xd / 1e6, 1),
        "xlarge_encode_compute_mpxs": round(xn / t_xe / 1e6, 1),
        "xlarge_parity": bool(xdec_ok and xenc_ok),
        "xlarge_parity_mode": "direct" if direct else "roundtrip+sample",
    }


_REFPROBE = None


def _refprobe_lib():
    """ctypes handle over the GENUINE reference header (compiled from its
    read-only mount via tools/refprobe.c). Cached per process."""
    global _REFPROBE
    if _REFPROBE is not None:
        return _REFPROBE
    import ctypes as _ct
    import subprocess as _sp

    so = "/tmp/librefprobe_bench.so"
    _sp.run(
        ["cc", "-O3", "-std=c11", "-shared", "-fPIC", "-w", "-o", so,
         '-DSQOA_REFERENCE_HEADER="/root/reference/seqoia.h"',
         os.path.join(_HERE, "tools", "refprobe.c")],
        check=True, capture_output=True)
    lib = _ct.CDLL(so)
    u8p = _ct.POINTER(_ct.c_uint8)
    u32p = _ct.POINTER(_ct.c_uint32)
    lib.ref_decode.restype = _ct.c_int64
    lib.ref_decode.argtypes = [u8p, _ct.c_int64, _ct.c_int, u8p,
                               _ct.c_int64, u32p]
    lib.ref_encode.restype = _ct.c_int64
    lib.ref_encode.argtypes = [u8p, _ct.c_uint32, _ct.c_uint32, _ct.c_int,
                               _ct.c_int, _ct.c_int, u8p, _ct.c_int64]
    _REFPROBE = (lib, u8p, u32p)
    return _REFPROBE


def _ref_section(em, budget, corpus, streams, qoi_streams):
    """Reference-header parity leg (VERDICT r4 #5): encode a sample of
    corpus images through the GENUINE ``/root/reference/seqoia.h``
    (compiled from its read-only mount) and assert byte-identity against
    the sqn oracle streams every device parity in this bench is pinned
    to — closing the self-grading loop on the exact artifact being
    scored (match: sqoabench.c:448-455's memcmp verify). Decode side:
    the header's decoder re-decodes those oracle streams and must
    reproduce the original pixels; the ``.qoi`` encodings are checked
    the same way. The TPU paths tie in transitively: the core sections
    verify TPU encode == sqn stream and TPU decode == pixels byte-exact
    on device for every corpus image."""
    _note("reference-header parity leg")
    lib, u8p, u32p = _refprobe_lib()
    by_cat = defaultdict(list)
    for i, (_, w, h, _, cat) in enumerate(corpus):
        by_cat[cat].append(i)
    sample = []
    for cat in sorted(by_cat):
        idxs = sorted(by_cat[cat],
                      key=lambda i: corpus[i][1] * corpus[i][2])
        sample.extend(idxs[:2])  # 2 per category: coverage over wall time
    cap = max(
        max(corpus[i][1] * corpus[i][2] * (corpus[i][3] + 2) + 64
            for i in sample),
        max(corpus[i][1] * corpus[i][2] * 4 for i in sample),
    )
    out = np.empty(cap, np.uint8)
    desc_arr = np.zeros(5, np.uint32)
    n_ok = 0
    qoi_checked = 0
    for i in sample:
        p, w, h, ch, _ = corpus[i]
        pix = np.ascontiguousarray(p, dtype=np.uint8).ravel()
        n = lib.ref_encode(pix.ctypes.data_as(u8p), w, h, ch, 0, 0,
                           out.ctypes.data_as(u8p), cap)
        ok = n == len(streams[i]) and out[:n].tobytes() == streams[i]
        sbuf = np.frombuffer(bytearray(streams[i]), np.uint8)
        dn = lib.ref_decode(sbuf.ctypes.data_as(u8p), len(sbuf), 0,
                            out.ctypes.data_as(u8p), cap,
                            desc_arr.ctypes.data_as(u32p))
        # channels 1..4 are already normalized, so ref_decode(…, 0)
        # returns exactly the original interleaved bytes
        ok = ok and dn == len(pix) and np.array_equal(out[:dn], pix)
        if qoi_streams[i] is not None:
            qn = lib.ref_encode(pix.ctypes.data_as(u8p), w, h, ch, 0, 1,
                                out.ctypes.data_as(u8p), cap)
            ok = ok and qn == len(qoi_streams[i]) and (
                out[:qn].tobytes() == qoi_streams[i])
            qoi_checked += 1
        n_ok += ok
    em.update(
        ref_header_parity_n=n_ok,
        ref_header_sample_n=len(sample),
        ref_header_qoi_n=qoi_checked,
    )


def _platform_override():
    """Honor SEQOIA_BENCH_PLATFORM (e.g. cpu smoke tests): the axon
    sitecustomize re-pins JAX_PLATFORMS, so jax.config is the switch."""
    plat = os.environ.get("SEQOIA_BENCH_PLATFORM", "")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)


def main():
    # default wall budget: the driver's kill window is ~1500 s (BENCH_r03
    # died at rc=124 around there); 1320 + the 45 s reserve keeps the
    # final record emission safely inside it
    budget = _Budget(float(os.environ.get("SEQOIA_BENCH_BUDGET", "1320")))
    em = _Emitter()

    import jax
    import jax.numpy as jnp

    _platform_override()
    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(_HERE, ".jax_cache")
    )

    import seqoia_tpu as sq
    from seqoia_tpu import native, spec
    from seqoia_tpu.codec import decode_v2, encode_v2, encode_jax

    scale = float(os.environ.get("SEQOIA_BENCH_SCALE", "64.0"))
    runs = int(os.environ.get("SEQOIA_BENCH_RUNS", "5"))
    prev = _load_prev_record()

    corpus, streams, qoi_streams = _corpus_assets(scale)
    total_px = sum(w * h for _, w, h, _, _ in corpus)

    cats = defaultdict(lambda: [0, 0, 0, 0, 0])  # n, px, raw, sqoa, qoi
    for (p, w, h, ch, cat), s, q in zip(corpus, streams, qoi_streams):
        c = cats[cat]
        c[0] += 1
        c[1] += w * h
        c[2] += w * h * ch
        c[3] += len(s)
        c[4] += len(q) if q is not None else 0

    buckets = defaultdict(list)
    for i, ((pix, w, h, ch, cat), stream) in enumerate(zip(corpus, streams)):
        desc = sq.SqoaDesc(w, h, ch, 0, 0)
        # shape canonicalization (_shape_bucket): few distinct
        # subprograms, ~1.6% pixel padding. The padding is nearly free
        # compute-side: the decode front skips tiles past clen, the
        # encode front skips tiles past n_valid, and empty placement
        # tiles take the fill-only fast path.
        m_pad = _shape_bucket(len(stream))
        n_pad = _shape_bucket(w * h)
        buckets[(cat, desc.col_channels, desc.has_alpha, desc.norm_channels,
                 m_pad, n_pad)].append(i)

    inner_max = int(os.environ.get("SEQOIA_BENCH_INNER", "4"))

    def timed(fn, args, n=runs):
        """Best-of-n wall time of a jitted fn.

        Each sample enqueues up to ``SEQOIA_BENCH_INNER`` dispatches and
        fences once with a scalar fetch, dividing by the count — the
        analogue of the reference harness timing a loop between clock
        reads (sqoabench.c:394-406). On this box a single scalar fetch
        costs ~24 ms of tunnel round-trip (measured, NOTES_ROUND3), which
        at ~350 ms/run would otherwise tax the kernel numbers ~7%; JAX
        dispatch is asynchronous, so the queued runs execute back to back
        on the device either way. Runs long enough to amortize the fetch
        on their own (>= 2 s, e.g. the fixpoint leg) keep one dispatch
        per sample so slow sections don't multiply their wall time."""
        float(fn(args))  # warmup: compile / cache load
        t0 = time.perf_counter()
        float(fn(args))  # steady-state probe picks the inner count
        inner = 1 if time.perf_counter() - t0 >= 2.0 else inner_max
        best = 1e9
        for _ in range(n):
            t0 = time.perf_counter()
            for _ in range(inner - 1):
                fn(args)
            float(fn(args))
            best = min(best, (time.perf_counter() - t0) / inner)
        return best

    # --- unified staging: one upload serves both directions -----------------
    # The tunnel's H2D runs ~15-20 MB/s on this box (measured; the byte
    # count, not the dispatch count, is the staging wall), so only two
    # things upload: the oracle STREAMS (decode input + encode expectation)
    # and the RAW PIXEL BYTES (decode expectation + encode input). Pixels
    # pack to the encoder's int32 layout ON DEVICE (ops/pallas_pack), and
    # both parity expectations are derived on device with strided slices —
    # no decoded-pixel or payload oracles ever cross the wire. Parity is
    # still a masked byte-exact compare for every image (the roundtrip
    # contract, sqoabench.c:448-455), fetched as one bool per image inside
    # each fused warmup.
    _note(f"staging: {len(buckets)} buckets, {total_px / 1e6:.0f} Mpx")
    from seqoia_tpu.ops import pallas_pack

    plans = []  # (cat, dec_fn, dec_args, enc_fn, packed_ref, meta, mpx)
    pack_in = []  # (words or packed host arrays, stride) per bucket
    for (cat, colch, has_alpha, out_ch, m_pad, n_pad), idxs in (
        buckets.items()
    ):
        b = len(idxs)
        stride = colch + has_alpha
        # icon-class buckets take the segment-packed decode front
        # (decode_v2.decode_stream_packed): TILE/m_pad same-size images
        # per front grid step instead of one — the per-image fixed cost
        # is what keeps icon_64 an order of magnitude under the corpus
        # rate. Eligibility: every image decodes to exactly n_pad pixels.
        seg_pack = None
        if (b >= 2 and m_pad <= 8192 and n_pad <= 8192
                and all(corpus[i][1] * corpus[i][2] == n_pad
                        for i in idxs)):
            seg_pack = m_pad
            kseg = 32768 // seg_pack
            b_rows = -(-b // kseg)
            b2 = b_rows * kseg
        else:
            b2 = b
        clens = np.zeros(b, np.int32)
        npx = np.zeros(b2, np.int32)  # dummy packed segments stay 0
        raw = np.zeros((b2, n_pad * stride), np.uint8)
        elen = np.zeros(b, np.int32)
        if seg_pack:
            buf = np.zeros((b_rows, 32768), np.uint8)
            slens = np.zeros((b_rows, kseg), np.int32)
        else:
            buf = np.zeros((b, m_pad), np.uint8)
        for j, i in enumerate(idxs):
            s = streams[i]
            pix, w, h, ch, _ = corpus[i]
            if seg_pack:
                r, c = divmod(j, kseg)
                buf[r, c * seg_pack : c * seg_pack + len(s)] = (
                    np.frombuffer(s, np.uint8))
                slens[r, c] = len(s) - spec.PADDING_SIZE
            else:
                buf[j, : len(s)] = np.frombuffer(s, np.uint8)
            clens[j] = len(s) - spec.PADDING_SIZE
            npx[j] = w * h
            raw[j, : len(pix)] = pix  # ch in 1..4: normalized == raw
            elen[j] = len(s) - (spec.HEADER_SIZE + 1)
        if n_pad % 32768 == 0 and stride < 4:
            # raw words upload (stride bytes/px); device packing below
            pack_in.append((jnp.asarray(raw.view("<i4")), stride))
        elif stride == 4:
            pack_in.append((jnp.asarray(raw.view("<i4")), 4))
        else:
            # small bucket: host-packed (tiny: icons only)
            rgba = np.zeros((b2, n_pad), np.int32)
            for j, i in enumerate(idxs):
                pix, w, h, ch, _ = corpus[i]
                rgba[j, : w * h] = encode_jax.normalize_pixels_packed(
                    pix, sq.SqoaDesc(w, h, ch, 0, 0))
            pack_in.append((jnp.asarray(rgba), 0))
        del raw
        if seg_pack:
            base_fn = functools.partial(
                decode_v2.decode_stream_packed,
                colch=colch, out_ch=out_ch, seg=seg_pack, seg_px=n_pad,
                src_alpha=(out_ch in (2, 4)),
            )

            def dec_fn(data, sl, _npx, _base=base_fn, _k=kseg):
                out, ref = _base(data, sl)
                return out.reshape(out.shape[0] * _k, -1), ref

            dec_args = (jnp.asarray(buf), jnp.asarray(slens),
                        jnp.asarray(npx))
        else:
            dec_fn = functools.partial(
                decode_v2.decode_stream_batched,
                colch=colch, compat=False, out_ch=out_ch, n_max=n_pad,
                emit="words", src_alpha=(out_ch in (2, 4)),
            )
            dec_args = (jnp.asarray(buf), jnp.asarray(clens),
                        jnp.asarray(npx))
        # adaptive cap, as the production BatchEncoder sizes it steady-state
        # (observed bytes/px + slack; overflow would retry exactly)
        cap = spec.cap_bucket(max(len(streams[i]) for i in idxs) * 5 // 4)
        enc_fn = functools.partial(
            encode_v2.encode_stream_batched,
            colch=colch, has_alpha=has_alpha, compat=False, out_cap=int(cap),
        )
        plans.append(dict(
            cat=cat, colch=colch, out_ch=out_ch, dec_fn=dec_fn,
            dec_args=dec_args, enc_fn=enc_fn, cap=int(cap),
            elen=jnp.asarray(elen), idxs=idxs, seg_pack=seg_pack,
            enc_rows=(b if seg_pack else None),
            mpx=sum(corpus[i][1] * corpus[i][2] for i in idxs),
        ))

    # device packing: one fused program over every bucket (raw words ->
    # packed int32 pixels, pallas_pack butterfly expand; stride 4 and
    # host-packed buckets pass through)
    @jax.jit
    def pack_all(ins):
        outs = []
        for x, stride in zip(ins, [s for _, s in pack_in]):
            if stride in (0, 4):
                outs.append(x)
            else:
                outs.append(pallas_pack.pack_words(x, stride))
        return outs

    packed_all = pack_all([x for x, _ in pack_in])
    for p, pk in zip(plans, packed_all):
        p["packed"] = pk
    del pack_in, packed_all

    def _dec_expected_ok(plan, out):
        """Masked compare of the decode output against the packed pixels,
        derived entirely on device (strided slices keep every intermediate
        in a clean dense layout — no bitcasts to minor-dim byte axes)."""
        packed = plan["packed"]
        npx = plan["dec_args"][2]
        bsz, n = packed.shape
        out_ch = plan["out_ch"]
        if plan["colch"] == 1:
            # mono packing: 0 | gray<<8 | 0 | alpha<<24
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
        # out_ch == 3: words carry interleaved RGB; word class k (mod 3)
        # mixes pixels 4t+k..4t+k+1. Compare per class against packed
        # slices — 3 strided compares, no interleave materialization.
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
            # word 3t+k covers byte range [12t+4k, 12t+4k+4) of the
            # interleaved stream; valid while below npx*3
            keep = (12 * t_idx + 4 * k) < (npx[:, None] * 3)
            # partial trailing word: compare only its in-range bytes
            nby = jnp.clip(npx[:, None] * 3 - (12 * t_idx + 4 * k), 0, 4)
            mask_bits = jnp.where(
                nby >= 4, -1,
                (1 << (8 * jnp.minimum(nby, 3))) - 1,
            )
            oks = oks & jnp.all(
                (((got ^ wk) & mask_bits) == 0) | ~keep, axis=1)
        return oks

    @jax.jit
    def dec_parity_all(all_args, packs):
        oks = []
        for plan, args, pk in zip(plans, all_args, packs):
            out, _ = plan["dec_fn"](*args)
            oks.append(_dec_expected_ok(dict(plan, packed=pk,
                                             dec_args=args), out))
        return jnp.concatenate(oks)

    _note("decode parity (fused warmup)")
    parity_ok = int(np.asarray(jax.device_get(dec_parity_all(
        [p["dec_args"] for p in plans], [p["packed"] for p in plans]
    ))).sum())
    # dummy packed segments (npx 0) pass vacuously: don't count them
    parity_ok -= sum(
        p["dec_args"][2].shape[0] - len(p["idxs"]) for p in plans)
    _note(f"decode parity {parity_ok}/{len(corpus)}")
    dec_plans = [(p["cat"], p["dec_fn"], p["dec_args"], p["mpx"])
                 for p in plans]

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

    em.update(
        metric="sqoa_batched_decode_throughput",
        value=round(decode_mpxs / 1000.0, 6),
        unit="GPix/s/chip",
        vs_baseline=round(decode_mpxs / BASELINE_DECODE_MPXS, 4),
        decode_mpxs=round(decode_mpxs, 2),
        decode_parity_n=parity_ok,
        corpus_mpx=round(total_px / 1e6, 2),
        images=len(corpus),
        device=str(jax.devices()[0]),
    )
    if prev:
        em.update(vs_prev_decode=round(
            decode_mpxs / prev["decode_mpxs"], 4))
    em.emit(budget)

    trace_dir = os.environ.get("SEQOIA_BENCH_TRACE", "")
    if trace_dir:
        with jax.profiler.trace(os.path.join(trace_dir, "decode")):
            float(all_dec([a for _, _, a, _ in dec_plans]))

    # --- batched SQOA encode ------------------------------------------------
    # Input = the device-packed pixels from the unified staging; parity
    # compares the emitted bytes against the already-uploaded stream
    # buffers (payload = stream bytes from HEADER+1 on) — exact totals +
    # masked byte equality, one bool per image, nothing new uploaded.
    @jax.jit
    def enc_parity_all(packs, dec_args_all, elens):
        oks = []
        for plan, pk, dargs, elen in zip(plans, packs, dec_args_all, elens):
            eb = plan["enc_rows"]
            nv = dargs[2]
            if eb is not None:  # packed bucket: drop dummy segments
                pk, nv = pk[:eb], nv[:eb]
            out, totals = plan["enc_fn"](pk, nv)
            buf = dargs[0]
            if plan["seg_pack"]:
                # the packed row IS the per-image stream buffers laid
                # seg bytes apart: a reshape recovers the (b, seg) view
                buf = buf.reshape(-1, plan["seg_pack"])[:eb]
            L = min(out.shape[1], buf.shape[1] - (spec.HEADER_SIZE + 1))
            exp = jax.lax.slice_in_dim(
                buf, spec.HEADER_SIZE + 1, spec.HEADER_SIZE + 1 + L, axis=1)
            keep = jnp.arange(L, dtype=jnp.int32)[None, :] < elen[:, None]
            oks.append(
                (totals == elen)
                & jnp.all((out[:, :L] == exp) | ~keep, axis=1)
            )
        return jnp.concatenate(oks)

    _mem_note("pre-enc-parity")
    _note("encode parity (fused warmup)")
    enc_parity = int(np.asarray(jax.device_get(enc_parity_all(
        [p["packed"] for p in plans], [p["dec_args"] for p in plans],
        [p["elen"] for p in plans],
    ))).sum())
    _note(f"encode parity {enc_parity}/{len(corpus)}")

    # coarse per-category encode groups: concat the unified buckets'
    # packed pixels along the batch dim (same n_pad within a category) —
    # the encode kernels prefer wide batches, and the fused timed program
    # (and the qoi TPU-encode leg) then carries ~a dozen subprograms
    # instead of ~70. The fine-grained packed views free right after.
    coarse = defaultdict(list)
    for p in plans:
        coarse[(p["cat"], p["colch"], p["out_ch"],
                int(p["packed"].shape[1]))].append(p)
    enc_plans = []
    enc_groups = []  # kept for the qoi TPU-encode leg
    for (cat, colch, out_ch, n_pad), group in coarse.items():
        gidxs = [i for p in group for i in p["idxs"]]

        def _enc_view(p, col):  # drop packed buckets' dummy segments
            x = p["packed"] if col == 0 else p["dec_args"][2]
            return x[: p["enc_rows"]] if p["enc_rows"] is not None else x

        packed_cat = (
            _enc_view(group[0], 0) if len(group) == 1
            else jnp.concatenate([_enc_view(p, 0) for p in group], axis=0)
        )
        nval_cat = (
            _enc_view(group[0], 1) if len(group) == 1
            else jnp.concatenate([_enc_view(p, 1) for p in group])
        )
        cap = spec.cap_bucket(max(len(streams[i]) for i in gidxs) * 5 // 4)
        fn = functools.partial(
            encode_v2.encode_stream_batched,
            colch=colch, has_alpha=(out_ch - colch == 1), compat=False,
            out_cap=int(cap),
        )
        mpx = sum(corpus[i][1] * corpus[i][2] for i in gidxs)
        enc_plans.append((cat, fn, (packed_cat, nval_cat), mpx))
        enc_groups.append(dict(
            cat=cat, colch=colch, out_ch=out_ch, idxs=gidxs,
            packed=packed_cat, nval=nval_cat,
        ))
    for p in plans:
        p["packed"] = None  # fine views freed; coarse groups own the data

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

    parity_pct = 100.0 * (parity_ok + enc_parity) / (2 * len(corpus))

    raw_total = sum(c[2] for c in cats.values())
    sqoa_total = sum(c[3] for c in cats.values())
    qoi_total = sum(c[4] for c in cats.values())
    # qoi comparisons only over categories that have a .qoi encoding
    # (mono+compat is rejected by the format, seqoia.h:477-480)
    qoi_raw = sum(c[2] for c in cats.values() if c[4])
    sqoa_cmp = sum(c[3] for c in cats.values() if c[4])

    em.update(
        encode_mpxs=round(encode_mpxs, 2),
        encode_vs_baseline=round(encode_mpxs / BASELINE_ENCODE_MPXS, 4),
        parity_pct=round(parity_pct, 2),
        rate_pct=round(100.0 * sqoa_total / raw_total, 2),
        qoi_rate_pct=round(100.0 * qoi_total / qoi_raw, 2),
        size_vs_qoi_pct=round(100.0 * sqoa_cmp / qoi_total - 100.0, 3),
    )
    if prev and "encode_mpxs" in prev:
        em.update(vs_prev_encode=round(
            encode_mpxs / prev["encode_mpxs"], 4))
    em.emit(budget)

    # --- per-category throughput (sqoabench.c:350-389) ----------------------
    cat_dec, cat_enc = {}, {}
    if budget.ok(180):
        _note("per-category timings")
        by_cat = defaultdict(list)
        for plan in dec_plans:
            by_cat[plan[0]].append(plan)
        by_cat_e = defaultdict(list)
        for plan in enc_plans:
            by_cat_e[plan[0]].append(plan)
        for cat in sorted(by_cat):
            if not budget.ok(30):
                _note("budget: truncating per-category timings")
                break
            cplans = by_cat[cat]
            f = fuse_decode(cplans)
            tc = timed(f, [a for _, _, a, _ in cplans], n=max(2, runs - 2))
            cat_dec[cat] = sum(p[3] for p in cplans) / tc / 1e6
            plans_e = by_cat_e.get(cat, [])
            if plans_e:
                f = fuse_encode(plans_e)
                tc = timed(f, [a for _, _, a, _ in plans_e],
                           n=max(2, runs - 2))
                cat_enc[cat] = sum(p[3] for p in plans_e) / tc / 1e6
        em.update(
            cat_decode_mpxs={c: round(v, 1) for c, v in cat_dec.items()},
            cat_encode_mpxs={c: round(v, 1) for c, v in cat_enc.items()},
        )
        if prev and isinstance(prev.get("cat_decode_mpxs"), dict):
            ratios = [
                cat_dec[c] / pv
                for c, pv in prev["cat_decode_mpxs"].items()
                if c in cat_dec and pv
            ]
            if ratios:
                em.update(cat_vs_prev_min=round(min(ratios), 4))
        em.emit(budget)
    else:
        em.skipped.append("categories")

    # per-category table to stderr (sqoabench.c:350-389 style)
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

    # release the per-direction plan views and the stream buffers (decode
    # timing/cats are done; the qoi TPU-encode leg only needs the coarse
    # packed groups, which free_staging below releases the moment it's
    # done with them)
    del dec_plans, enc_plans
    for p in plans:
        p["dec_args"] = None
        p["elen"] = None
    del plans
    import gc

    gc.collect()

    def free_staging():
        """Drop the device-packed pixels (the last of the unified
        staging, ~4 B/px corpus-wide): called by the qoi section after
        its TPU-encode leg, and again here as a belt-and-braces."""
        for g in enc_groups:
            g["packed"] = None
            g["nval"] = None

    def run_section(name, fn, est, enabled=True):
        """Budget-gate + run one optional section. RESOURCE_EXHAUSTED
        settles the device (gc + a fenced no-op drains the async
        buffer-free queue) and retries ONCE — run 5 of the tuning showed
        one OOM cascading into every later section otherwise."""
        if not (enabled and budget.ok(est)):
            em.skipped.append(name)
            return
        try:
            fn()
        except Exception as e:
            oom = "RESOURCE_EXHAUSTED" in str(e)
            if oom and budget.ok(max(est // 2, 45)):
                _note(f"{name}: RESOURCE_EXHAUSTED — settling, one retry")
                gc.collect()
                try:
                    float(jnp.zeros(()) + 1)
                    time.sleep(3.0)
                    fn()
                    em.rec.pop(f"{name}_error", None)
                except Exception as e2:
                    _note(f"{name} retry failed: {e2!r}")
                    em.update(**{f"{name}_error": repr(e2)[:200]})
            else:
                _note(f"{name} section failed: {e!r}")
                em.update(**{f"{name}_error": repr(e)[:200]})
        em.emit(budget)

    _mem_note("post-cats")
    # --- reference-header parity (sqoabench.c:448-455) ----------------------
    # cheap + host-only: runs before the big optional sections so it
    # lands in the record even under a collapsing budget
    run_section(
        "ref_header",
        lambda: _ref_section(em, budget, corpus, streams, qoi_streams), 40)

    # --- .qoi compat passes (reference: sqoabench.c:469-539) ----------------
    # before the large/xlarge/api sections: its TPU-encode leg is the one
    # consumer of the still-resident packed staging, and the section
    # frees that staging once the leg completes
    run_section(
        "qoi",
        lambda: _qoi_section(em, budget, corpus, streams, qoi_streams,
                             timed, runs, enc_groups, free_staging),
        120, os.environ.get("SEQOIA_BENCH_QOI", "1") == "1")
    free_staging()
    del enc_groups
    gc.collect()
    _mem_note("post-qoi")

    # --- xlarge: 400 Mpx, the reference's hard cap (seqoia.h:428-432) -------
    # the remaining sections run in required-first order (xlarge and api
    # are round-5 done-criteria; the 100 Mpx section was captured in r4
    # and yields last): xlarge is all-or-nothing (~upload one 0.7 GB
    # stream + warm-compiled kernels), the api sample shrinks to fit,
    # large takes whatever remains
    def _xlarge():
        _note("xlarge 400 Mpx section")
        em.update(**xlarge_leg())

    run_section("xlarge", _xlarge, 100,
                os.environ.get("SEQOIA_BENCH_XLARGE", "1") == "1")
    gc.collect()

    # --- public API path (corpus_decode / corpus_encode, end to end) --------
    run_section("api", lambda: _api_section(em, budget, corpus, streams),
                60, os.environ.get("SEQOIA_BENCH_API", "1") == "1")
    gc.collect()

    # --- large single image (100 Mpx, BASELINE config 5) --------------------
    run_section("large", lambda: _large_section(em, budget), 130,
                os.environ.get("SEQOIA_BENCH_LARGE", "1") == "1")

    em.emit(budget, final=True)


def _qoi_section(em, budget, corpus, streams, qoi_streams, timed, runs,
                 enc_groups, free_staging):
    """`.qoi` decode/encode through the production dispatch. Both
    dispatches are timed and the winner is the headline: the host pool
    scales with cores (this box has ONE, capping it at ~0.7x the
    reference's M1 core), the TPU kernel path with the chip.

    Device-memory lifecycle (VERDICT r4 #1): the TPU-encode leg runs
    FIRST (it reuses the unified staging's packed pixels), its parity
    oracles upload one sub-batch at a time instead of all at once, and
    ``free_staging`` releases the ~4 B/px packed staging the moment that
    leg is done — before the fixpoint's ~20x-stream working set
    allocates. Each device leg retries once at a halved sub-batch on
    RESOURCE_EXHAUSTED before recording an error."""
    import gc

    import jax
    import jax.numpy as jnp

    import seqoia_tpu as sq
    from seqoia_tpu import native, spec
    from seqoia_tpu.codec import decode_compat, encode_v2, encode_jax
    from seqoia_tpu.parallel import batch as pbatch

    _note("qoi section")
    q_items = [(i, q) for i, q in enumerate(qoi_streams) if q is not None]
    q_px = sum(corpus[i][1] * corpus[i][2] for i, _ in q_items)

    def leg(label, run, *args):
        """Run one device leg; on RESOURCE_EXHAUSTED, settle the device
        (gc + fenced no-op drains the async free queue) and retry once
        at a halved sub-batch cap before recording a per-leg error."""
        try:
            return run(*args)
        except Exception as e:
            if "RESOURCE_EXHAUSTED" not in str(e):
                raise
            _note(f"{label}: RESOURCE_EXHAUSTED — settling, retrying at "
                  f"halved sub-batch")
            gc.collect()
            try:
                float(jnp.zeros(()) + 1)
                time.sleep(3.0)
                return run(*args, cap_bytes=12 << 20)
            except Exception as e2:
                _note(f"{label}: retry failed: {e2!r}")
                em.update(**{f"{label}_error": repr(e2)[:160]})
                return None

    def settle():
        """Drain the device's async buffer-free queue before a
        single-core host timing: the free RPCs otherwise steal most of
        the core from it through the tunnel client thread (measured
        2-4x swings on the host legs)."""
        import gc as _gc

        _gc.collect()
        try:
            float(jnp.zeros(()) + 1)
        except Exception:
            pass
        time.sleep(2.0)

    # INDEX-chain depth probe over the whole .qoi corpus: the dispatch
    # predictor (native.compat_probe) + its measured per-category depth
    # distribution (VERDICT r3 #4). Accuracy vs the real fixpoint is
    # scored further down once the convergence flags exist.
    t0 = time.perf_counter()
    depths = {i: native.compat_probe(q)[0] for i, q in q_items}
    t_probe = time.perf_counter() - t0
    fp_cap = decode_compat._MAX_ITERS
    cat_depth = defaultdict(list)
    for i, _ in q_items:
        cat_depth[corpus[i][4]].append(depths[i])
    for cat in sorted(cat_depth):
        d = np.array(cat_depth[cat])
        print(f"[qoi probe] {cat:14s} n={len(d):4d} depth p50={int(np.median(d)):4d} "
              f"p90={int(np.percentile(d, 90)):4d} max={int(d.max()):5d} "
              f"shallow={100.0 * (d < fp_cap).mean():5.1f}%",
              file=sys.stderr)
    shallow_px = sum(
        corpus[i][1] * corpus[i][2] for i, _ in q_items
        if depths[i] < fp_cap
    )

    # single-core host timings FIRST, behind a settled device: nothing
    # has queued buffer frees yet beyond the core sections' staging
    settle()
    # the host legs are single-threaded per core; sample a bounded slice so
    # the pool timing doesn't dominate bench wall time at large scales
    sample_mpx = 120e6 if budget.ok(420) else 60e6
    hs_items, hs_px = [], 0
    for i, q in q_items:
        hs_items.append((i, q))
        hs_px += corpus[i][1] * corpus[i][2]
        if hs_px >= sample_mpx:
            break
    _note("qoi host decode leg")
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
        if not budget.ok(60):
            raise TimeoutError("budget")
        _note("qoi on-box reference leg")
        _lib, _u8p, _u32p = _refprobe_lib()
        _out = np.empty(256_000_000, np.uint8)
        _dsc = np.zeros(5, np.uint32)
        _bufs = [np.frombuffer(bytearray(q), np.uint8) for _, q in hs_items]
        t0 = time.perf_counter()
        for _b in _bufs:
            _lib.ref_decode(_b.ctypes.data_as(_u8p), len(_b), 0,
                            _out.ctypes.data_as(_u8p), len(_out),
                            _dsc.ctypes.data_as(_u32p))
        ref_onbox["qoi_ref_onbox_decode_mpxs"] = round(
            hs_px / (time.perf_counter() - t0) / 1e6, 1)
        del _out, _bufs
    except Exception:  # cc missing etc — the numbers are optional
        pass

    _mem_note("pre-free-staging")
    # ---- TPU compat encode (slot last-writer hash resolution): the
    # one consumer of the unified staging's device-packed pixels — the
    # staging frees for good right after. One compat encode per color
    # bucket, sub-batched in stream-length order; parity and timing
    # share one fused program (per-process executable load costs
    # minutes per extra ~30-subprogram executable).
    run_qe = budget.ok(110)
    qe_mpxs = None
    qe_parity = 0

    def qe_leg(cap_bytes=24 << 20):
        _note("qoi tpu-encode leg")
        qe_plans = []
        for grp in enc_groups:
            if grp["colch"] != 3 or grp["packed"] is None:
                continue
            # chunk in stream-length order so each chunk's output cap
            # (and its parity-oracle upload below) tracks its members'
            # sizes instead of the whole category's max — the unsorted
            # chunking uploaded ~2x the actual .qoi payload bytes
            order = sorted(range(len(grp["idxs"])),
                           key=lambda j: len(qoi_streams[grp["idxs"][j]]))
            n_pad = int(grp["packed"].shape[1])
            # sub-batch rows: the compat encode path (slot last-writer
            # hash resolution + XLA spread) holds several per-position
            # arrays, so rows per launch are capped by pixel count
            b_cap = max(1, cap_bytes // n_pad)
            perm_dev = jnp.asarray(np.asarray(order, np.int32))
            for c0 in range(0, len(order), b_cap):
                sel = order[c0 : c0 + b_cap]
                sub = [grp["idxs"][j] for j in sel]
                cap = spec.cap_bucket(
                    max(len(qoi_streams[i]) for i in sub) * 5 // 4)
                efn = functools.partial(
                    encode_v2.encode_stream_batched,
                    colch=3, has_alpha=bool(grp["out_ch"] == 4),
                    compat=True, out_cap=int(cap))
                psel = perm_dev[c0 : c0 + b_cap]
                eargs = (grp["packed"][psel], grp["nval"][psel])
                qe_plans.append((efn, eargs, sub))

        # parity + timing share ONE fused program (every separate
        # ~30-subprogram executable costs minutes of per-process load):
        # each chunk's compat encode runs once per pass, compared against
        # its trimmed oracle; the parity compares read the outputs once
        # more (~3% of the encode work — the timed number is the
        # conservative side of the pure-encode rate)
        t_par0 = time.perf_counter()
        qe_oracle = []
        exp_bytes = 0
        for efn, eargs, sub in qe_plans:
            W = spec.cap_bucket(
                max(len(qoi_streams[i]) - spec.HEADER_SIZE for i in sub))
            W = min(W, efn.keywords["out_cap"])
            exp = np.zeros((len(sub), W), np.uint8)
            elen = np.zeros(len(sub), np.int32)
            for j, i in enumerate(sub):
                payload = qoi_streams[i][spec.HEADER_SIZE:]
                exp[j, : len(payload)] = np.frombuffer(payload, np.uint8)
                elen[j] = len(payload)
            exp_bytes += exp.nbytes
            qe_oracle.append((jnp.asarray(exp), jnp.asarray(elen)))
            del exp

        @jax.jit
        def _qe_all(all_args, oracles):
            oks = []
            acc = jnp.float32(0)
            for (efn, _, _), a, (exp, elen) in zip(qe_plans, all_args,
                                                   oracles):
                out, totals = efn(*a)
                W = exp.shape[1]
                keep = jnp.arange(W, dtype=jnp.int32)[None, :] < (
                    elen[:, None])
                oks.append((totals == elen) & jnp.all(
                    (out[:, :W] == exp) | ~keep, axis=1))
                acc = acc + jnp.sum(out[0, :8].astype(jnp.float32))
            return jnp.concatenate(oks), acc

        qe_args = [a for _, a, _ in qe_plans]
        ok_all = np.asarray(jax.device_get(
            _qe_all(qe_args, qe_oracle)[0]))
        par = 0
        off = 0
        for _, ea, sub in qe_plans:
            par += int(ok_all[off : off + len(sub)].sum())
            off += ea[0].shape[0]
        _note(f"qe parity {time.perf_counter() - t_par0:.1f}s over "
              f"{len(qe_plans)} chunks, {exp_bytes >> 20} MB oracles")

        t_t0 = time.perf_counter()
        tqe = timed(lambda a: _qe_all(a, qe_oracle)[1], qe_args,
                    n=max(2, runs - 2))
        _note(f"qe timing {time.perf_counter() - t_t0:.1f}s")
        del qe_oracle
        return q_px / tqe / 1e6, par

    _mem_note("pre-qe")
    if run_qe:
        got = leg("qoi_tpu_encode", qe_leg)
        if got:
            qe_mpxs, qe_parity = got
        run_qe = got is not None

    # the staging's job is done: release the packed pixels BEFORE the
    # fixpoint's working set allocates (and after the single-core host
    # timings above — the flood of async buffer-free RPCs would steal
    # the core from them through the tunnel client thread)
    free_staging()
    gc.collect()

    # TPU fixpoint decode over every color bucket (device-resident, same
    # methodology as the sqoa numbers); unconverged rows would take the
    # host fallback in production — convergence is reported, and the
    # probe's accuracy (VERDICT r3 #4 done-criterion) needs only the
    # convergence flags, so those run per-sub-batch (bounded working
    # set) even when the budget can't afford the timing pass.
    run_fp = budget.ok(110)
    fp_mpxs = None
    fp_conv = 0
    probe_hits = None
    tfp = None

    def fp_leg(cap_bytes=24 << 20):
        _note("qoi fixpoint leg")
        # shape canonicalization (_shape_bucket): 72 tile-multiple
        # buckets -> ~21, whose fused program's fixed per-process load
        # cost (~4 s/subprogram through the tunnel, measured) dominated
        # this leg at the old granularity. Sub-batch caps stay at 24 MB
        # of stream bytes: the fixpoint materializes ~50-60x that in
        # per-position int32 arrays per launch (a 64 MB cap OOM'd).
        fp_buckets = defaultdict(list)
        for i, q in q_items:
            fp_buckets[(_shape_bucket(len(q), 32768),
                        _shape_bucket(corpus[i][1] * corpus[i][2], 32768))
                       ].append(i)
        fp_plans = []
        for (m_pad, n_max), all_idxs in fp_buckets.items():
            b_cap = max(1, cap_bytes // m_pad)
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
                fargs = (jnp.asarray(buf), jnp.asarray(cl),
                         jnp.asarray(npx))
                ffn = functools.partial(
                    decode_compat.decode_stream_compat_batched,
                    colch=3, out_ch=4, n_max=int(n_max))
                fp_plans.append((ffn, fargs, list(idxs)))

        # convergence flags from ONE fused warmup over every sub-batch:
        # the staging freed above, so the fixpoint working set (~20x each
        # launch's stream bytes, XLA-sequenced between subprograms) is
        # the only major tenant; one program also reuses the compile
        # cache across rounds (the per-shape variant recompiled ~30
        # fixpoint programs through the tunnel — a ~30 min cold cost)
        @jax.jit
        def _fp_conv_all(all_args):
            # the chunks are independent, so XLA may schedule several
            # fixpoint working sets (~50x stream bytes each)
            # CONCURRENTLY — which is exactly what OOM'd this leg when
            # the canonicalized shapes changed the schedule. A
            # data-dependent token threaded through each chunk's input
            # forces sequential execution and workspace reuse (the
            # timing program gets this for free from its acc chain).
            convs = []
            tok = jnp.int32(0)
            for (ffn, _, _), a in zip(fp_plans, all_args):
                data, cl, npx = a
                out, conv = ffn(data, cl + tok, npx)
                # force out via a cheap dependency folded into conv's row
                c = conv & (jnp.sum(out[:, ::8191]) < jnp.inf)
                convs.append(c)
                tok = jnp.minimum(jnp.sum(c.astype(jnp.int32)), 0)
            return jnp.concatenate(convs)

        fp_args = [a for _, a, _ in fp_plans]
        conv_all = np.asarray(jax.device_get(_fp_conv_all(fp_args)))
        conv = 0
        hits = 0
        n_scored = 0
        off = 0
        for _, fa, idxs in fp_plans:
            for k, i in enumerate(idxs):
                c = bool(conv_all[off + k])
                conv += c
                hits += (depths[i] < fp_cap) == c
            n_scored += len(idxs)
            off += fa[0].shape[0]

        t = None
        if budget.ok(70):
            # time the SAME conv program (it IS a full fixpoint decode
            # of every stream; the per-chunk trivial reductions add <1%)
            # instead of building a second ~50-subprogram executable —
            # each such program costs minutes of per-process load
            t = timed(lambda a: _fp_conv_all(a)[0], fp_args,
                      n=max(2, runs - 3))
        del fp_plans
        return conv, hits, t, max(n_scored, 1)

    _mem_note("pre-fixpoint")
    n_scored = 1
    if run_fp:
        got = leg("qoi_fixpoint", fp_leg)
        if got:
            fp_conv, probe_hits, tfp, n_scored = got
            if tfp is not None:
                fp_mpxs = q_px / tfp / 1e6
                # production-honest hybrid: unconverged rows re-decode on
                # the host pool; their pixels are charged at the measured
                # host rate
                unconv_px = q_px * (1.0 - fp_conv / max(len(q_items), 1))
    gc.collect()

    # probe-dispatched auto mode over the same sample: shallow streams ride
    # the TPU fixpoint, deep ones the host pool, concurrently
    q_auto_t = q_auto_ok = None
    # the auto leg is demonstrational on this box (decoded pixels must
    # cross the tunnel, which plain host dispatch never pays): it yields
    # to the API section under a tight budget
    if budget.ok(480):
        _note("qoi auto-dispatch leg")
        saved_mode = os.environ.get("SEQOIA_COMPAT_TPU")
        os.environ["SEQOIA_COMPAT_TPU"] = "auto"
        try:
            qres = qdec(hstreams)  # warm (fixpoint compiles, these buckets)
            q_auto_ok = sum(r.pixels is not None for r in qres)
            del qres
            t0 = time.perf_counter()
            qdec(hstreams)
            q_auto_t = time.perf_counter() - t0
        finally:
            if saved_mode is None:
                os.environ.pop("SEQOIA_COMPAT_TPU", None)
            else:
                os.environ["SEQOIA_COMPAT_TPU"] = saved_mode

    host_dec = hs_px / q_dec_t / 1e6
    host_enc = hs_px / q_enc_t / 1e6
    auto_dec = hs_px / q_auto_t / 1e6 if q_auto_t else 0.0
    hybrid_dec = (
        q_px / (tfp + unconv_px / (host_dec * 1e6)) / 1e6
        if fp_mpxs is not None else 0.0
    )
    best_dec = max(host_dec, hybrid_dec, auto_dec)
    best_enc = max(host_enc, qe_mpxs or 0.0)
    qoi = {
        "qoi_decode_mpxs": round(best_dec, 1),
        "qoi_encode_mpxs": round(best_enc, 1),
        "qoi_decode_dispatch": (
            "auto" if auto_dec and best_dec == auto_dec else
            "tpu+fallback" if hybrid_dec > host_dec else "host"),
        "qoi_encode_dispatch": (
            "tpu" if qe_mpxs and qe_mpxs > host_enc else "host"),
        "qoi_decode_vs_ref": round(best_dec / BASELINE_QOI_DECODE_MPXS, 2),
        "qoi_encode_vs_ref": round(best_enc / BASELINE_QOI_ENCODE_MPXS, 2),
        "qoi_host_decode_mpxs": round(host_dec, 1),
        "qoi_host_encode_mpxs": round(host_enc, 1),
        "qoi_host_parity_n": q_dec_ok,
        "qoi_host_sample_mpx": round(hs_px / 1e6, 1),
        "qoi_probe_mpxs": round(q_px / t_probe / 1e6, 1),
        "qoi_probe_shallow_px_pct": round(100.0 * shallow_px / q_px, 1),
        **ref_onbox,
    }
    if probe_hits is not None:
        qoi["qoi_tpu_converged_pct"] = round(100.0 * fp_conv / n_scored, 1)
        qoi["qoi_probe_accuracy_pct"] = round(
            100.0 * probe_hits / n_scored, 1)
    if fp_mpxs is not None:
        qoi["qoi_tpu_decode_mpxs"] = round(fp_mpxs, 1)
    if qe_mpxs is not None:
        qoi["qoi_tpu_encode_mpxs"] = round(qe_mpxs, 1)
        qoi["qoi_tpu_encode_parity_n"] = qe_parity
    if q_auto_t:
        qoi["qoi_auto_decode_mpxs"] = round(auto_dec, 1)
        qoi["qoi_auto_parity_n"] = q_auto_ok
    if "qoi_ref_onbox_decode_mpxs" in ref_onbox:
        qoi["qoi_decode_vs_ref_onbox"] = round(
            best_dec / ref_onbox["qoi_ref_onbox_decode_mpxs"], 2)
    em.update(**qoi)


def _large_section(em, budget):
    """100 Mpx single image: device-resident compute + end-to-end."""
    import jax
    import jax.numpy as jnp

    import seqoia_tpu as sq
    from seqoia_tpu import spec
    from seqoia_tpu.codec import decode_v2, encode_v2
    from seqoia_tpu.ops import pallas_pack
    from seqoia_tpu.parallel import tiled

    _note("large-image section")
    lw = lh = 10000
    lpix, loracle = _large_assets(lw, lh)
    ldesc = sq.SqoaDesc(lw, lh, 3, 0, 0)

    inner = int(os.environ.get("SEQOIA_BENCH_INNER", "4"))

    def timed3(fn, args):
        # inner-loop amortization of the tunnel round trip (see main's timed)
        float(fn(args))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(inner - 1):
                fn(args)
            float(fn(args))
            best = min(best, (time.perf_counter() - t0) / inner)
        return best

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

    t_ec = timed3(jax.jit(enc_run), packed)

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

    t_dc = timed3(jax.jit(dec_run), darr)
    del darr

    # end-to-end decode
    lback, _ = tiled.decode_large(loracle, 0)  # warm
    t0 = time.perf_counter()
    lback, _ = tiled.decode_large(loracle, 0)
    t_de = time.perf_counter() - t0

    em.update(
        large_mpx=round(n / 1e6, 1),
        large_rate_pct=round(100.0 * len(loracle) / (n * 3), 1),
        large_encode_compute_mpxs=round(n / t_ec / 1e6, 1),
        large_decode_compute_mpxs=round(n / t_dc / 1e6, 1),
        large_encode_mpxs=round(n / t_ee / 1e6, 1),
        large_decode_mpxs=round(n / t_de / 1e6, 1),
        large_parity=bool(
            stream == loracle and np.array_equal(lback, lpix)
        ),
    )


def _api_section(em, budget, corpus, streams):
    """Public batched API end to end, with the staging/compute/fetch
    split from the pipelined BatchDecoder/BatchEncoder."""
    import seqoia_tpu as sq
    from seqoia_tpu.parallel import batch as pbatch

    _note("API path section")
    # budget-adaptive sample: the e2e path is tunnel-transfer-bound on
    # this box (~13-37 MB/s D2H), so a slice of the corpus demonstrates
    # the same pipeline behavior in a fraction of the wall time; the
    # section runs last, so it takes whatever budget remains
    remaining = budget.remaining() - budget.reserve
    step = 1 if remaining >= 420 else (
        2 if remaining >= 260 else (3 if remaining >= 160 else 6))
    if step > 1:
        corpus = corpus[::step]
        streams = streams[::step]
        _note(f"API sample: 1/{step} = {len(corpus)} images")
    total_px = sum(w * h for _, w, h, _, _ in corpus)
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
    dec_split = dict(getattr(dec, "last_timings", {}) or {})
    t0 = time.perf_counter()
    res_e = enc(imgs, descs)
    api_enc_t = time.perf_counter() - t0
    assert all(r is not None for r in res_e)
    enc_split = dict(getattr(enc, "last_timings", {}) or {})
    em.update(
        api_decode_mpxs=round(total_px / api_dec_t / 1e6, 1),
        api_encode_mpxs=round(total_px / api_enc_t / 1e6, 1),
        api_sample_mpx=round(total_px / 1e6, 1),
    )
    for k, v in dec_split.items():
        em.update(**{f"api_decode_{k}_s": round(v, 3)})
    for k, v in enc_split.items():
        em.update(**{f"api_encode_{k}_s": round(v, 3)})
    del res, res_e


if __name__ == "__main__":
    main()
