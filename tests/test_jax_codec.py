"""TPU (JAX) codec vs the native oracle: byte-exact bitstreams and pixels.

The oracle itself is pinned to the upstream reference by test_native.py, so
byte-equality here implies byte-equality with the reference.
"""

import numpy as np
import pytest

import seqoia_tpu as sq
from seqoia_tpu import native, spec

from conftest import KINDS, gen_pixels

MODES = [(3, 0), (4, 0), (1, 0), (2, 0), (5, 0), (6, 0), (3, 1), (4, 1)]


# Fixed shapes shared by every (mode, kind) parametrization so each mode
# compiles once per codec direction (the kernels bucket shapes internally;
# identical (w*h, stream-cap) buckets reuse the jit cache). One odd shape
# keeps non-pow2 masking honest; content diversity comes from `kind`.
_SHAPES = [(37, 29), (61, 13)]


@pytest.mark.parametrize("ch,compat", MODES)
def test_encode_parity(ch, compat):
    rng = np.random.default_rng(100 + ch * 10 + compat)
    colch = 1 if ch < 3 else 3
    stride = colch + (1 - (ch & 1))
    for i, kind in enumerate(KINDS):
        w, h = _SHAPES[i % len(_SHAPES)]
        pix = gen_pixels(rng, w * h, stride, kind)
        d = sq.SqoaDesc(w, h, ch, int(rng.integers(0, 2)), compat)
        ours = sq.encode(pix, d, backend="tpu")
        oracle = native.encode(pix, w, h, ch, d.colorspace, compat)
        assert ours == oracle, f"{w}x{h} ch={ch} compat={compat} {kind}"


@pytest.mark.parametrize("ch,compat", MODES)
def test_decode_parity(ch, compat):
    rng = np.random.default_rng(200 + ch * 10 + compat)
    colch = 1 if ch < 3 else 3
    stride = colch + (1 - (ch & 1))
    for i, kind in enumerate(KINDS):
        w, h = _SHAPES[i % len(_SHAPES)]
        pix = gen_pixels(rng, w * h, stride, kind)
        stream = native.encode(pix, w, h, ch, 0, compat)
        for fch in (0, 3, 4):
            ours, dours = sq.decode(stream, fch, backend="tpu")
            oracle, doracle = native.decode(stream, fch)
            assert ours is not None
            assert np.array_equal(ours, oracle), (
                f"{w}x{h} ch={ch} compat={compat} {kind} fch={fch}"
            )
            assert (dours.width, dours.height, dours.channels,
                    dours.colorspace, dours.qoi_compat) == doracle


def test_run_chunking_vectors():
    """Survey-verified vectors: a run of 1298 px -> fd fd fc fc fc fc dd
    (512+512+61*4+30, SURVEY.md §2.1 item 6)."""
    w = 1301
    pix = np.zeros((w, 3), np.uint8)
    pix[0] = (9, 9, 9)   # pixel 1 is a change to black; then a 1298-px run
    pix[-1] = (1, 2, 3)  # change pixel flushes the pending run
    d = sq.SqoaDesc(w, 1, 3, 0, 0)
    out = sq.encode(pix.ravel(), d)
    oracle = native.encode(pix.ravel(), w, 1, 3, 0, 0)
    assert out == oracle
    body = out[15:-8]
    assert body[4:11] == bytes([0xFD, 0xFD, 0xFC, 0xFC, 0xFC, 0xFC, 0xDD])


def test_trailing_run_single_bigrun():
    """Any pending run at image end emits one BIGRUN byte (seqoia.h:640-642)."""
    pix = np.zeros((4, 3), np.uint8)
    pix[0] = (9, 9, 9)
    d = sq.SqoaDesc(4, 1, 3, 0, 0)
    out = sq.encode(pix.ravel(), d)
    assert out[-9] == 0xFD  # trailing BIGRUN for run of 3
    assert out[-8:] == spec.PADDING


def test_luma_alpha_pairing():
    """Delta (2,3,1,-5) emits LUMA pair a3 76 then ALPHA 6b (SURVEY §2.1)."""
    pix = np.array([[10, 10, 10, 200], [12, 13, 11, 195]], np.uint8)
    d = sq.SqoaDesc(2, 1, 4, 0, 0)
    out = sq.encode(pix.ravel(), d)
    assert bytes([0xA3, 0x76, 0x6B]) in out


def test_exact_512_run_no_trailing():
    pix = np.zeros((513, 3), np.uint8)
    pix[0] = (9, 9, 9)
    d = sq.SqoaDesc(513, 1, 3, 0, 0)
    out = sq.encode(pix.ravel(), d)
    body = out[15:-8]
    assert body[4:] == bytes([0xFD])  # 512-run emitted at the counter, no flush


def test_all_pixels_initial_color():
    """Image entirely equal to the initial (0,0,0,255) state is one run."""
    pix = np.zeros((600, 3), np.uint8)
    d = sq.SqoaDesc(600, 1, 3, 0, 0)
    ours = sq.encode(pix.ravel(), d)
    oracle = native.encode(pix.ravel(), 600, 1, 3, 0, 0)
    assert ours == oracle
    back, _ = sq.decode(ours, 0)
    assert np.array_equal(back.reshape(-1, 3), pix)


def test_qoi_index_collision_last_writer_wins():
    """Two colors with the same QOI hash: table must hold the latest."""
    # (1,0,0,255) hash = 3+2805 = 2808%64 = 56 ; craft another color same slot
    a = (1, 0, 0)
    b = (1 + 64, 0, 0)  # 3*(1+64) = 195+2805 = 3000 ; 3000%64=56? 3000-46*64=56 yes
    assert spec.color_hash(*a, 255) == spec.color_hash(*b, 255)
    pix = np.array([a, b, (7, 7, 7), a, (7, 7, 7), b], np.uint8)
    d = sq.SqoaDesc(6, 1, 3, 0, 1)
    ours = sq.encode(pix.ravel(), d)
    oracle = native.encode(pix.ravel(), 6, 1, 3, 0, 1)
    assert ours == oracle


def test_decode_ref_op_falls_back():
    """Hand-crafted stream with a REF op decodes via the native fallback and
    matches the oracle."""
    hdr = spec.pack_header(spec.SqoaDesc(4, 1, 3, 0, 0))
    # RGB(1,2,3), LUMA pair, REF len=2 off=1 (replays the LUMA pair), pad
    chunks = bytes([0xFE, 1, 2, 3, 0xA3, 0x76, 0x00 | (0 << 5) | 1])
    data = hdr + chunks + spec.PADDING
    ours, _ = sq.decode(data, 0)
    oracle, _ = native.decode(data, 0)
    assert ours is not None and np.array_equal(ours, oracle)


def test_decode_ref_op_device_path(monkeypatch):
    """The lax.scan REF decoder (SEQOIA_REF_TPU=1) matches the native
    runtime on replaying, teleporting, erroring, and mono REF streams."""
    from seqoia_tpu.codec import decode_jax

    monkeypatch.setenv("SEQOIA_REF_TPU", "1")

    def both(data, fch):
        ours = decode_jax.decode(data, fch)
        theirs = native.decode(data, fch)
        assert (ours[0] is None) == (theirs[0] is None), (data.hex(), fch)
        if ours[0] is not None:
            assert np.array_equal(ours[0], theirs[0]), (data.hex(), fch)

    hdr = spec.pack_header(spec.SqoaDesc(4, 1, 3, 0, 0))
    # RGB(1,2,3), LUMA pair, REF len=2 off=1 (replays the LUMA pair)
    v1 = hdr + bytes([0xFE, 1, 2, 3, 0xA3, 0x76, (0 << 5) | 1]) + spec.PADDING
    # REF len=4 off=1: window starts inside the RGB operands and the
    # replay end lands mid-operand -> the cursor teleports while reading
    # an operand (SQOA_NEXT edge, seqoia.h:418)
    v2 = hdr + bytes([0xFE, 1, 2, 3, 0xA3, 0x76, (2 << 5) | 1]) + spec.PADDING
    # REF whose window starts before the stream -> negative start, error
    # (seqoia.h:733-736)
    v3 = hdr + bytes([0xFE, 1, 2, 3, (0 << 5) | 31]) + spec.PADDING
    # REF len=4 off=1 replaying two LUMA pairs, then the window exhausts
    # with pixels remaining -> the cursor TELEPORTS to resume+1 (skipping
    # the byte at resume, per SQOA_NEXT's exact semantics)
    h7 = spec.pack_header(spec.SqoaDesc(7, 1, 3, 0, 0))
    v5 = h7 + bytes(
        [0xFE, 1, 2, 3, 0xA1, 0x11, 0xA2, 0x22, (2 << 5) | 1, 0xFE, 7, 7, 7]
    ) + spec.PADDING
    for v in (v1, v2, v3, v5):
        for fch in (0, 3, 4):
            both(v, fch)

    # mono stream with a REF replaying a gray LUMA byte
    mh = spec.pack_header(spec.SqoaDesc(5, 1, 1, 0, 0))
    v4 = mh + bytes([0xFE, 9, 0x85, 0x9F, (0 << 5) | 1]) + spec.PADDING
    for fch in (0, 1, 2, 3, 4):
        both(v4, fch)

    # randomized: valid small streams with REF-range bytes injected
    rng = np.random.default_rng(7)
    for trial in range(40):
        ch = (3, 4, 1, 2)[trial % 4]
        colch = 1 if ch < 3 else 3
        stride = colch + (1 - (ch & 1))
        w, h = 5, 3
        pix = gen_pixels(rng, w * h, stride, KINDS[trial % len(KINDS)])
        s = bytearray(native.encode(pix, w, h, ch, 0, 0))
        for _ in range(int(rng.integers(1, 4))):
            p = int(rng.integers(15, max(16, len(s) - 8)))
            s[p] = int(rng.integers(0, 0x60))
        both(bytes(s), int(rng.integers(0, 5)))


def test_decode_invalid():
    assert sq.decode(b"", 0) == (None, None)
    assert sq.decode(b"\x00" * 25, 0) == (None, None)
    stream = native.encode(np.zeros(12, np.uint8), 2, 2, 3, 0, 0)
    assert sq.decode(stream, 5) == (None, None)


def test_encode_invalid():
    pix = np.zeros(12, np.uint8)
    assert sq.encode(pix, sq.SqoaDesc(0, 2, 3, 0, 0)) is None
    assert sq.encode(pix, sq.SqoaDesc(2, 2, 9, 0, 0)) is None
    assert sq.encode(pix, sq.SqoaDesc(2, 2, 1, 0, 1)) is None
    assert sq.encode(None, sq.SqoaDesc(2, 2, 3, 0, 0)) is None
