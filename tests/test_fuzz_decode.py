"""Bounded differential decode fuzz through the JAX pipeline.

The framework analogue of sqoafuzz.c (reference: sqoafuzz.c:20-32) wired
into the default suite: mutated, truncated and garbage streams flow
through ``sq.decode(backend="tpu")`` (the decode_v2 scan pipeline and the
compat path on this platform) and are cross-checked against the native
runtime, which test_native.py pins to the upstream reference. A
regression in the JAX decoders' handling of malformed tokens therefore
cannot ship green.

Sizes are drawn from a small set of classes so shape buckets (and thus
XLA compilations) are shared across trials.
"""

import numpy as np
import pytest

import seqoia_tpu as sq
from seqoia_tpu import native, spec


def _check(data, fch):
    pn, dn = native.decode(data, fch)
    pt, dt = sq.decode(data, fch, backend="tpu")
    assert (pn is None) == (pt is None), (fch, len(data))
    if pn is not None:
        assert np.array_equal(pn, pt), (fch, len(data))
        assert (dt.width, dt.height, dt.channels) == (dn[0], dn[1], dn[2])


@pytest.mark.parametrize("compat", [0, 1])
def test_fuzz_mutated_streams(compat):
    """Valid streams with random byte mutations decode identically."""
    rng = np.random.default_rng(42 + compat)
    sizes = [(8, 8), (16, 12)]
    for trial in range(60):
        w, h = sizes[trial % len(sizes)]
        ch = 4 if (compat or trial % 3) else 3
        pix = rng.integers(0, 256, w * h * ch, dtype=np.uint8)
        if trial % 2:
            pix[: w * h * ch // 2] = pix[0]  # runs + truncation targets
        s = bytearray(native.encode(pix, w, h, ch, 0, compat))
        for _ in range(int(rng.integers(1, 5))):
            s[int(rng.integers(spec.HEADER_SIZE, len(s)))] = int(
                rng.integers(0, 256)
            )
        _check(bytes(s), 0)
        _check(bytes(s), 4)


def test_fuzz_truncated_and_garbage():
    """Truncated bodies and pure-garbage chunk data decode identically
    (truncation is NOT an error — the output-driven decoder fills the
    remaining pixels, seqoia.h:722-806)."""
    rng = np.random.default_rng(7)
    for trial in range(40):
        d = spec.SqoaDesc(12, 10, 3 + trial % 2, 0, trial % 2)
        body = bytes(
            rng.integers(0, 256, int(rng.integers(0, 96))).astype(np.uint8)
        )
        data = spec.pack_header(d) + body + spec.PADDING
        _check(data, 0)
        _check(data, 3)


def test_fuzz_header_garbage():
    """Arbitrary byte blobs never crash and agree on rejection."""
    rng = np.random.default_rng(9)
    for trial in range(30):
        data = bytes(
            rng.integers(0, 256, int(rng.integers(0, 64))).astype(np.uint8)
        )
        _check(data, 0)
