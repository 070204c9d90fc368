"""Native runtime vs upstream reference: differential and fuzz parity.

The native library doubles as the parity oracle for the TPU codec, so these
tests anchor the whole chain of trust to the genuine reference.
"""

import numpy as np
import pytest

from seqoia_tpu import native, spec

from conftest import KINDS, gen_pixels

MODES = [(3, 0), (4, 0), (1, 0), (2, 0), (5, 0), (6, 0), (3, 1), (4, 1)]


@pytest.mark.parametrize("ch,compat", MODES)
def test_encode_decode_parity_vs_reference(refprobe, ch, compat):
    rng = np.random.default_rng(ch * 10 + compat)
    colch = 1 if ch < 3 else 3
    stride = colch + (1 - (ch & 1))
    for kind in KINDS:
        for _ in range(3):
            w = int(rng.integers(1, 48))
            h = int(rng.integers(1, 48))
            pix = gen_pixels(rng, w * h, stride, kind)
            ours = native.encode(pix, w, h, ch, 0, compat)
            ref = refprobe.encode(pix, w, h, ch, 0, compat)
            assert ours == ref, f"{w}x{h} ch={ch} compat={compat} {kind}"
            for fch in (0, 1, 2, 3, 4):
                po, do = native.decode(ours, fch)
                pr, dr = refprobe.decode(ours, fch)
                assert (po is None) == (pr is None)
                if po is not None:
                    assert np.array_equal(po, pr)
                    assert do == dr


def test_decode_fuzz_parity_vs_reference(refprobe):
    """Mutated + random streams: REF replay, truncation, garbage headers."""
    rng = np.random.default_rng(42)
    checked = 0
    for trial in range(600):
        kind = trial % 3
        if kind == 0:
            w, h = int(rng.integers(1, 20)), int(rng.integers(1, 20))
            compat = int(rng.integers(0, 2))
            pix = gen_pixels(rng, w * h, 4, KINDS[int(rng.integers(0, 6))])
            s = bytearray(native.encode(pix, w, h, 4, 0, compat))
            for _ in range(int(rng.integers(1, 6))):
                s[int(rng.integers(14, len(s)))] = int(rng.integers(0, 256))
            data = bytes(s)
        elif kind == 1:
            d = spec.SqoaDesc(
                int(rng.integers(1, 12)), int(rng.integers(1, 12)),
                int(rng.integers(1, 7)), 0, int(rng.integers(0, 2)),
            )
            if d.channels < 3:
                d.qoi_compat = 0
            data = (
                spec.pack_header(d)
                + bytes(rng.integers(0, 256, int(rng.integers(0, 150))).astype(np.uint8))
                + spec.PADDING
            )
        else:
            data = bytes(rng.integers(0, 256, int(rng.integers(0, 100))).astype(np.uint8))
        for fch in (0, 3, 4):
            po, do = native.decode(data, fch)
            pr, dr = refprobe.decode(data, fch)
            assert (po is None) == (pr is None)
            if po is not None:
                assert np.array_equal(po, pr) and do == dr
                checked += 1
    assert checked > 100  # sanity: fuzz actually exercised decodes


def test_worst_case_sizing():
    """Adversarial image where ~every pixel costs channels+1 bytes must not
    overflow (the reference's own formula is 1 short; seqoia.h:487-489)."""
    rng = np.random.default_rng(3)
    w, h = 64, 64
    pix = rng.integers(0, 256, w * h * 4, dtype=np.uint8)
    out = native.encode(pix, w, h, 4, 0, 0)
    assert out is not None
    assert len(out) <= spec.worst_case_size(spec.SqoaDesc(w, h, 4, 0, 0))


def test_invalid_args():
    pix = np.zeros(12, np.uint8)
    assert native.encode(pix, 0, 2, 3, 0, 0) is None
    assert native.encode(pix, 2, 2, 7, 0, 0) is None
    assert native.encode(pix, 2, 2, 3, 2, 0) is None
    assert native.encode(pix, 2, 2, 1, 0, 1) is None  # mono + compat
    assert native.decode(b"", 0) == (None, None)
    assert native.decode(b"\x00" * 30, 0) == (None, None)
    stream = native.encode(np.zeros(4 * 3, np.uint8), 2, 2, 3, 0, 0)
    assert native.decode(stream, 5) == (None, None)  # channels > 4
