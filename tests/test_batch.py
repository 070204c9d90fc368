"""Batched + sharded pipeline tests (8 virtual CPU devices via conftest)."""

import numpy as np
import pytest

import jax

import seqoia_tpu as sq
from seqoia_tpu import native
from seqoia_tpu.parallel import (
    BatchDecoder,
    BatchEncoder,
    batch_sharding,
    corpus_decode,
    corpus_encode,
    default_mesh,
)

from conftest import KINDS, gen_pixels


def _mini_corpus(rng, n_images=12):
    """Mixed-size, mixed-mode corpus with known-good oracle streams."""
    corpus = []
    for t in range(n_images):
        ch, compat = [(3, 0), (4, 0), (3, 1), (4, 1), (1, 0)][t % 5]
        colch = 1 if ch < 3 else 3
        stride = colch + (1 - (ch & 1))
        w = int(rng.integers(1, 40))
        h = int(rng.integers(1, 40))
        pix = gen_pixels(rng, w * h, stride, KINDS[t % len(KINDS)])
        stream = native.encode(pix, w, h, ch, 0, compat)
        corpus.append((pix, sq.SqoaDesc(w, h, ch, 0, compat), stream))
    return corpus


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_batch_decode_matches_oracle():
    rng = np.random.default_rng(0)
    corpus = _mini_corpus(rng)
    streams = [s for _, _, s in corpus]
    results = corpus_decode(streams)
    for (pix, desc, stream), res in zip(corpus, results):
        oracle, od = native.decode(stream, 0)
        assert res.error is None
        assert np.array_equal(res.pixels, oracle)
        assert res.desc.width == desc.width


def test_batch_decode_channel_forcing():
    rng = np.random.default_rng(1)
    corpus = _mini_corpus(rng, 6)
    streams = [s for _, _, s in corpus]
    results = corpus_decode(streams, channels=4)
    for (pix, desc, stream), res in zip(corpus, results):
        oracle, _ = native.decode(stream, 4)
        assert np.array_equal(res.pixels, oracle)


def test_batch_decode_error_isolation():
    """One corrupt image must not poison the batch (SURVEY §5.3)."""
    rng = np.random.default_rng(2)
    corpus = _mini_corpus(rng, 5)
    streams = [s for _, _, s in corpus]
    streams[2] = b"garbage"
    results = corpus_decode(streams)
    assert results[2].error is not None
    for i in (0, 1, 3, 4):
        oracle, _ = native.decode(streams[i], 0)
        assert np.array_equal(results[i].pixels, oracle)


def test_batch_encode_matches_oracle():
    rng = np.random.default_rng(3)
    corpus = _mini_corpus(rng)
    outs = corpus_encode(
        [p for p, _, _ in corpus], [d for _, d, _ in corpus]
    )
    for (pix, desc, stream), out in zip(corpus, outs):
        assert out == stream


def test_batch_encode_invalid_slot():
    rng = np.random.default_rng(4)
    pix = gen_pixels(rng, 16, 3, "noise")
    outs = corpus_encode(
        [pix, pix], [sq.SqoaDesc(4, 4, 3, 0, 0), sq.SqoaDesc(0, 4, 3, 0, 0)]
    )
    assert outs[0] == native.encode(pix, 4, 4, 3, 0, 0)
    assert outs[1] is None


def test_batch_sharded_result_invariance():
    """Results must not depend on mesh size: 1-device vs 8-device mesh."""
    rng = np.random.default_rng(5)
    corpus = _mini_corpus(rng, 8)
    streams = [s for _, _, s in corpus]
    mesh8 = default_mesh()
    mesh1 = default_mesh(jax.devices()[:1])
    r8 = BatchDecoder(mesh8)(streams)
    r1 = BatchDecoder(mesh1)(streams)
    for a, b in zip(r8, r1):
        assert np.array_equal(a.pixels, b.pixels)
    e8 = BatchEncoder(mesh8)([p for p, _, _ in corpus], [d for _, d, _ in corpus])
    e1 = BatchEncoder(mesh1)([p for p, _, _ in corpus], [d for _, d, _ in corpus])
    assert e8 == e1


def test_batch_decode_ref_fallback():
    """A REF-bearing stream inside a batch falls back per-image."""
    hdr = sq.spec.pack_header(sq.SqoaDesc(4, 1, 3, 0, 0))
    ref_stream = hdr + bytes([0xFE, 1, 2, 3, 0xA3, 0x76, 0x01]) + sq.spec.PADDING
    rng = np.random.default_rng(6)
    normal = native.encode(gen_pixels(rng, 16, 3, "noise"), 4, 4, 3, 0, 0)
    results = corpus_decode([normal, ref_stream])
    oracle0, _ = native.decode(normal, 0)
    oracle1, _ = native.decode(ref_stream, 0)
    assert np.array_equal(results[0].pixels, oracle0)
    assert np.array_equal(results[1].pixels, oracle1)


def test_encoder_outstanding_bytes_drain():
    """Dispatched-but-unfetched device bytes are bounded: exceeding the
    cap drains the oldest bucket before more dispatch (VERDICT r4 #2 —
    BatchEncoder previously held every bucket until the fetch phase)."""
    rng = np.random.default_rng(7)
    corpus = _mini_corpus(rng, 15)
    enc = BatchEncoder(max_outstanding_bytes=1)  # every dispatch exceeds it
    outs = enc([p for p, _, _ in corpus], [d for _, d, _ in corpus])
    for (pix, desc, stream), out in zip(corpus, outs):
        assert out == stream
    assert enc.last_stats["early_drains"] >= 1


def test_decoder_outstanding_bytes_drain():
    rng = np.random.default_rng(8)
    corpus = _mini_corpus(rng, 15)
    streams = [s for _, _, s in corpus]
    dec = BatchDecoder(max_outstanding_bytes=1)
    results = dec(streams)
    for (pix, desc, stream), res in zip(corpus, results):
        oracle, _ = native.decode(stream, 0)
        assert np.array_equal(res.pixels, oracle)
    assert dec.last_stats["early_drains"] >= 1


class _FakeOOM(RuntimeError):
    def __str__(self):
        return "RESOURCE_EXHAUSTED: TPU backend error (ResourceExhausted)."


def test_encoder_oom_degradation(monkeypatch):
    """A RESOURCE_EXHAUSTED dispatch drains the queue and re-runs the
    failed bucket at degraded size instead of failing the call."""
    from seqoia_tpu.parallel import batch as batch_mod

    real = batch_mod._encode_batch_kernel
    fails = {"n": 2}

    def flaky(*a, **kw):
        if fails["n"]:
            fails["n"] -= 1
            raise _FakeOOM()
        return real(*a, **kw)

    monkeypatch.setattr(batch_mod, "_encode_batch_kernel", flaky)
    rng = np.random.default_rng(9)
    corpus = _mini_corpus(rng, 10)
    enc = BatchEncoder()
    outs = enc([p for p, _, _ in corpus], [d for _, d, _ in corpus])
    for (pix, desc, stream), out in zip(corpus, outs):
        assert out == stream
    assert enc.last_stats["oom_redispatch"] >= 1


def test_encoder_oom_single_image_host_fallback(monkeypatch):
    """An image that OOMs even alone encodes on the host (with its own
    compat flag, not the host pool's old hardcoded one)."""
    from seqoia_tpu.parallel import batch as batch_mod

    def always_oom(*a, **kw):
        raise _FakeOOM()

    monkeypatch.setattr(batch_mod, "_encode_batch_kernel", always_oom)
    rng = np.random.default_rng(10)
    corpus = _mini_corpus(rng, 4)  # includes compat and non-compat modes
    enc = BatchEncoder()
    outs = enc([p for p, _, _ in corpus], [d for _, d, _ in corpus])
    for (pix, desc, stream), out in zip(corpus, outs):
        assert out == stream


def test_decoder_oom_degradation(monkeypatch):
    from seqoia_tpu.parallel import batch as batch_mod

    real = batch_mod._decode_batch_kernel
    fails = {"n": 2}

    def flaky(*a, **kw):
        if fails["n"]:
            fails["n"] -= 1
            raise _FakeOOM()
        return real(*a, **kw)

    monkeypatch.setattr(batch_mod, "_decode_batch_kernel", flaky)
    rng = np.random.default_rng(11)
    corpus = _mini_corpus(rng, 10)
    streams = [s for _, _, s in corpus]
    dec = BatchDecoder()
    results = dec(streams)
    for (pix, desc, stream), res in zip(corpus, results):
        oracle, _ = native.decode(stream, 0)
        assert np.array_equal(res.pixels, oracle)
    assert dec.last_stats["oom_redispatch"] >= 1


def test_fetch_flat_chunked_tail():
    """Chunked device->host fetch: exact bytes incl. the clamped final
    chunk (utils/transfer.py relies on dynamic_slice start clamping)."""
    import jax.numpy as jnp

    from seqoia_tpu.utils import transfer

    x = np.arange(10_000_000, dtype=np.int32)
    dx = jnp.asarray(x) * 2
    for n in (10_000_000, 9_999_999, 5_000_001, 4_194_304, 100):
        got = transfer.fetch_flat(dx, n, chunk_elems=1 << 22, threads=4)
        assert np.array_equal(got, x[:n] * 2), n
