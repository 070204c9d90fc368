"""Format-spec unit tests: header framing, validation, constants."""

import numpy as np
import pytest

from seqoia_tpu import spec


def test_header_roundtrip_sqoa():
    d = spec.SqoaDesc(1920, 1080, 4, spec.SRGB, 0)
    h = spec.pack_header(d)
    assert len(h) == 15
    assert h[:4] == b"Sqoa"
    assert h[14] == 0x31
    back = spec.unpack_header(h + b"\x00" * 8)
    assert (back.width, back.height, back.channels) == (1920, 1080, 4)
    assert back.qoi_compat == 0


def test_header_roundtrip_qoi():
    d = spec.SqoaDesc(16, 8, 3, spec.LINEAR, 1)
    h = spec.pack_header(d)
    assert len(h) == 14
    assert h[:4] == b"qoif"
    back = spec.unpack_header(h + b"\x00" * 9)
    assert back.qoi_compat == 1
    assert back.colorspace == spec.LINEAR


def test_header_rejects():
    good = spec.pack_header(spec.SqoaDesc(4, 4, 3, 0, 0)) + b"\x00" * 8
    assert spec.unpack_header(good) is not None
    assert spec.unpack_header(b"") is None
    assert spec.unpack_header(b"x" * 21) is None
    bad_magic = b"Xqoa" + good[4:]
    assert spec.unpack_header(bad_magic) is None
    # qoif magic claiming a start byte is rejected (seqoia.h:684)
    qoif_with_start = b"qoif" + good[4:14] + b"\x31" + b"\x00" * 8
    assert spec.unpack_header(qoif_with_start) is None


def test_pixels_max_cap():
    # 20000 x 20001 exceeds 400Mpx (seqoia.h:428-432)
    assert not spec.validate_encode_desc(spec.SqoaDesc(20000, 20001, 3, 0, 0))
    assert spec.validate_encode_desc(spec.SqoaDesc(20000, 19999, 3, 0, 0))


def test_validate_channels():
    assert not spec.validate_encode_desc(spec.SqoaDesc(4, 4, 7, 0, 0))
    assert not spec.validate_encode_desc(spec.SqoaDesc(4, 4, 0, 0, 0))
    # mono + qoi_compat rejected (seqoia.h:477-480)
    assert not spec.validate_encode_desc(spec.SqoaDesc(4, 4, 1, 0, 1))
    for ch in range(1, 7):
        assert spec.validate_encode_desc(spec.SqoaDesc(4, 4, ch, 0, 0))


def test_norm_channels():
    assert spec.SqoaDesc(1, 1, 5).norm_channels == 3  # BGR -> RGB count
    assert spec.SqoaDesc(1, 1, 6).norm_channels == 4
    assert spec.SqoaDesc(1, 1, 2).norm_channels == 2
    assert spec.SqoaDesc(1, 1, 1).norm_channels == 1


def test_color_hash():
    assert spec.color_hash(0, 0, 0, 255) == (255 * 11) % 64
    assert spec.color_hash(0, 0, 0, 0) == 0
