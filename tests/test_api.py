"""Public API surface: read/write file round-trips, backend equivalence."""

import os

import numpy as np
import pytest

import seqoia_tpu as sq
from seqoia_tpu import native


def test_write_read_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    w, h = 33, 17
    pix = rng.integers(0, 256, w * h * 4, dtype=np.uint8)
    d = sq.SqoaDesc(w, h, 4, sq.SRGB, 0)
    path = str(tmp_path / "img.sqoa")
    n = sq.write(path, pix, d)
    assert n > 0 and os.path.getsize(path) == n
    back, desc = sq.read(path)
    assert np.array_equal(back, pix)
    assert (desc.width, desc.height, desc.channels) == (w, h, 4)
    assert desc.qoi_compat == 0


def test_write_read_qoi(tmp_path):
    rng = np.random.default_rng(1)
    w, h = 9, 21
    pix = rng.integers(0, 256, w * h * 3, dtype=np.uint8)
    d = sq.SqoaDesc(w, h, 3, sq.SRGB, 1)
    path = str(tmp_path / "img.qoi")
    assert sq.write(path, pix, d) > 0
    back, desc = sq.read(path)
    assert np.array_equal(back, pix)
    assert desc.qoi_compat == 1


def test_read_missing_file():
    assert sq.read("/nonexistent/nope.sqoa") == (None, None)


def test_read_strict_distinguishes_errors(tmp_path):
    """strict mode splits missing-file from undecodable-data failures."""
    with pytest.raises(OSError):
        sq.read("/nonexistent/nope.sqoa", strict=True)
    bad = tmp_path / "garbage.sqoa"
    bad.write_bytes(b"not a sqoa file at all, padded out" + b"\0" * 32)
    with pytest.raises(ValueError, match="undecodable"):
        sq.read(str(bad), strict=True)
    assert sq.read(str(bad)) == (None, None)


def test_write_invalid_returns_zero(tmp_path):
    assert sq.write(str(tmp_path / "x.sqoa"), None, sq.SqoaDesc(2, 2, 3)) == 0


def test_backends_agree(tmp_path):
    rng = np.random.default_rng(2)
    w, h = 40, 25
    pix = rng.integers(0, 256, w * h * 3, dtype=np.uint8)
    d = sq.SqoaDesc(w, h, 3, 0, 0)
    a = sq.encode(pix, d, backend="tpu")
    b = sq.encode(pix, d, backend="native")
    assert a == b
    pa, da = sq.decode(a, 0, backend="tpu")
    pb, db = sq.decode(a, 0, backend="native")
    assert np.array_equal(pa, pb)
    assert (da.width, da.channels) == (db.width, db.channels)


def test_channel_forcing_mono_replication():
    """Mono source forced to RGB replicates gray (seqoia.h:795-800)."""
    g = np.arange(16, dtype=np.uint8)
    d = sq.SqoaDesc(4, 4, 1, 0, 0)
    stream = sq.encode(g, d)
    rgb, _ = sq.decode(stream, 3)
    rgb = rgb.reshape(-1, 3)
    assert np.array_equal(rgb[:, 0], g)
    assert np.array_equal(rgb[:, 1], g)
    assert np.array_equal(rgb[:, 2], g)
    rgba, _ = sq.decode(stream, 4)
    assert np.all(rgba.reshape(-1, 4)[:, 3] == 255)


def test_bgr_treated_as_rgb():
    """BGR inputs are not swizzled; header stores normalized count
    (seqoia.h:486,505 — SURVEY §2.1 item 2)."""
    rng = np.random.default_rng(3)
    pix = rng.integers(0, 256, 5 * 5 * 3, dtype=np.uint8)
    s_bgr = sq.encode(pix, sq.SqoaDesc(5, 5, 5, 0, 0))
    s_rgb = sq.encode(pix, sq.SqoaDesc(5, 5, 3, 0, 0))
    assert s_bgr == s_rgb
    assert s_bgr[12] == 3  # normalized channel byte
