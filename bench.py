#!/usr/bin/env python
"""seqoia_tpu benchmark: aggregate codec throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Baseline: the reference's single-core sqoa decode grand total, 246.25 Mpx/s
on Apple M1 (BASELINE.md); vs_baseline = our aggregate decode Mpx/s / 246.25.

Workload mirrors sqoabench (reference: sqoabench.c:394-547): synthetic
corpus resembling the qoi-bench suite, one discarded warmup, then timed
repeats; byte-exact parity is verified against the native oracle before any
timing counts.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_DECODE_MPXS = 246.25  # BASELINE.md: sqoa decode grand total, M1
BASELINE_ENCODE_MPXS = 147.46


def main():
    import jax
    import jax.numpy as jnp

    import seqoia_tpu as sq
    from seqoia_tpu import native, spec
    from seqoia_tpu.parallel import batch as pbatch
    from seqoia_tpu.utils import make_corpus

    scale = float(os.environ.get("SEQOIA_BENCH_SCALE", "1.0"))
    runs = int(os.environ.get("SEQOIA_BENCH_RUNS", "5"))
    corpus = make_corpus(scale)
    total_px = sum(w * h for _, w, h, _ in corpus)

    # --- oracle encode + parity gate ---------------------------------------
    streams = []
    for pix, w, h, ch in corpus:
        streams.append(native.encode(pix, w, h, ch, 0, 0))

    descs = [sq.SqoaDesc(w, h, ch, 0, 0) for _, w, h, ch in corpus]
    enc_out = pbatch.corpus_encode([p for p, *_ in corpus], descs)
    parity = sum(a == b for a, b in zip(enc_out, streams))
    dec_out = pbatch.corpus_decode(streams)
    dec_parity = 0
    for i, res in enumerate(dec_out):
        oracle, _ = native.decode(streams[i], 0)
        dec_parity += res.error is None and np.array_equal(res.pixels, oracle)
    parity_pct = 100.0 * (parity + dec_parity) / (2 * len(corpus))

    # --- timed batched decode (device-resident streams) ---------------------
    dec = pbatch.BatchDecoder()
    # warmup (compiles)
    dec(streams)
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        dec(streams)
        times.append(time.perf_counter() - t0)
    decode_mpxs = total_px / min(times) / 1e6

    enc = pbatch.BatchEncoder()
    enc([p for p, *_ in corpus], descs)
    times_e = []
    for _ in range(runs):
        t0 = time.perf_counter()
        enc([p for p, *_ in corpus], descs)
        times_e.append(time.perf_counter() - t0)
    encode_mpxs = total_px / min(times_e) / 1e6

    result = {
        "metric": "sqoa_batched_decode_throughput",
        "value": round(decode_mpxs / 1000.0, 6),
        "unit": "GPix/s/chip",
        "vs_baseline": round(decode_mpxs / BASELINE_DECODE_MPXS, 4),
        "decode_mpxs": round(decode_mpxs, 2),
        "encode_mpxs": round(encode_mpxs, 2),
        "encode_vs_baseline": round(encode_mpxs / BASELINE_ENCODE_MPXS, 4),
        "parity_pct": round(parity_pct, 2),
        "corpus_mpx": round(total_px / 1e6, 2),
        "images": len(corpus),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
