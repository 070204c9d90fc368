"""Sharded large-image codec: mesh invariance and oracle parity
(8 virtual CPU devices via conftest)."""

import numpy as np
import pytest

import jax

import seqoia_tpu as sq
from seqoia_tpu import native
from seqoia_tpu.parallel import tiled
from seqoia_tpu.parallel.mesh import default_mesh

from conftest import gen_pixels


@pytest.mark.parametrize("kind", ["luma", "long_runs", "noise"])
def test_encode_large_parity(kind):
    rng = np.random.default_rng(hash(kind) % 2**31)
    w, h = 512, 96
    pix = gen_pixels(rng, w * h, 3, kind)
    desc = sq.SqoaDesc(w, h, 3, 0, 0)
    mesh = default_mesh(jax.devices(), axis="s")
    ours = tiled.encode_large(pix, desc, mesh)
    oracle = native.encode(pix, w, h, 3, 0, 0)
    assert ours == oracle


def test_encode_large_mesh_invariance():
    rng = np.random.default_rng(1)
    w, h = 256, 64
    pix = gen_pixels(rng, w * h, 4, "sparse_delta")
    desc = sq.SqoaDesc(w, h, 4, 0, 0)
    m8 = default_mesh(jax.devices(), axis="s")
    m2 = default_mesh(jax.devices()[:2], axis="s")
    assert tiled.encode_large(pix, desc, m8) == tiled.encode_large(pix, desc, m2)


@pytest.mark.parametrize("kind", ["luma", "palette"])
def test_decode_large_parity(kind):
    rng = np.random.default_rng(hash(kind) % 2**31)
    w, h = 384, 128
    pix = gen_pixels(rng, w * h, 3, kind)
    stream = native.encode(pix, w, h, 3, 0, 0)
    mesh = default_mesh(jax.devices(), axis="s")
    for fch in (0, 4):
        ours, desc = tiled.decode_large(stream, fch, mesh)
        oracle, _ = native.decode(stream, fch)
        assert np.array_equal(ours, oracle)
        assert desc.width == w


def test_decode_large_qoi_falls_back():
    rng = np.random.default_rng(5)
    pix = gen_pixels(rng, 64 * 64, 3, "palette")
    stream = native.encode(pix, 64, 64, 3, 0, 1)
    ours, desc = tiled.decode_large(stream, 0)
    oracle, _ = native.decode(stream, 0)
    assert np.array_equal(ours, oracle)
    assert desc.qoi_compat == 1
