"""io.png tests: PIL path and the pure-numpy PNG fallback agree.

The fallback stands in for the reference tooling's stb_image when PIL is
absent (reference: sqoaconv.c:22-28); it must read what PIL writes (all
five PNG filter types) and write files PIL can read back.
"""

import numpy as np
import pytest

from seqoia_tpu.io import png as pngio


def _content(w, h, ch, seed):
    rng = np.random.default_rng(seed)
    # gradient + noise mix so PIL's encoder picks varied row filters
    base = np.linspace(0, 255, w, dtype=np.uint8)[None, :, None]
    pix = np.broadcast_to(base, (h, w, ch)).astype(np.int32)
    pix = (pix + rng.integers(-9, 10, (h, w, ch))) % 256
    return pix.astype(np.uint8).reshape(-1)


@pytest.mark.parametrize("ch", [1, 2, 3, 4])
def test_numpy_fallback_roundtrip(tmp_path, ch):
    w, h = 23, 17
    pix = _content(w, h, ch, seed=ch)
    path = str(tmp_path / f"np_{ch}.png")
    pngio._write_png_numpy(path, pix.reshape(h, w, ch))
    got, rw, rh, rch = pngio._read_png_numpy(path)
    assert (rw, rh, rch) == (w, h, ch)
    assert np.array_equal(got, pix)


@pytest.mark.parametrize("ch", [1, 3, 4])
def test_numpy_reader_reads_pil_files(tmp_path, ch):
    pytest.importorskip("PIL")
    w, h = 40, 25
    pix = _content(w, h, ch, seed=10 + ch)
    path = str(tmp_path / f"pil_{ch}.png")
    pngio.write_image(path, pix, w, h, ch)  # PIL path (filtered rows)
    got, rw, rh, rch = pngio._read_png_numpy(path)
    assert (rw, rh, rch) == (w, h, ch)
    assert np.array_equal(got, pix)


def test_numpy_reader_all_five_filters(tmp_path):
    """Hand-crafted PNG with one row per filter type 0-4: every branch of
    the fallback's defilter loop is exercised by construction (PIL's
    encoder picks filters adaptively and typically never emits Average)."""
    import struct
    import zlib

    w, h, ch = 9, 5, 3
    pix = _content(w, h, ch, seed=5).reshape(h, w, ch)
    stride = w * ch
    flat = pix.reshape(h, stride).astype(np.int32)

    rows = []
    for y in range(h):
        ft = y % 5
        cur = flat[y]
        prev = flat[y - 1] if y else np.zeros(stride, np.int32)
        a = np.concatenate([np.zeros(ch, np.int32), cur[:-ch]])
        b = prev
        c = np.concatenate([np.zeros(ch, np.int32), prev[:-ch]])
        if ft == 0:
            enc = cur
        elif ft == 1:
            enc = cur - a
        elif ft == 2:
            enc = cur - b
        elif ft == 3:
            enc = cur - (a + b) // 2
        else:
            p = a + b - c
            pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
            pred = np.where(
                (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)
            )
            enc = cur - pred
        rows.append(bytes([ft]) + (enc % 256).astype(np.uint8).tobytes())
    raw = b"".join(rows)

    def chunk(ctype, payload):
        body = ctype + payload
        return struct.pack(">I", len(payload)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF
        )

    path = str(tmp_path / "filters.png")
    with open(path, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n")
        f.write(chunk(b"IHDR", struct.pack(">IIBB", w, h, 8, 2) + b"\0\0\0"))
        f.write(chunk(b"IDAT", zlib.compress(raw, 6)))
        f.write(chunk(b"IEND", b""))

    got, rw, rh, rch = pngio._read_png_numpy(path)
    assert (rw, rh, rch) == (w, h, ch)
    assert np.array_equal(got, pix.reshape(-1))


def test_pil_reads_numpy_files(tmp_path):
    pytest.importorskip("PIL")
    w, h, ch = 19, 11, 3
    pix = _content(w, h, ch, seed=99)
    path = str(tmp_path / "np.png")
    pngio._write_png_numpy(path, pix.reshape(h, w, ch))
    got, rw, rh, rch = pngio.read_image(path)  # PIL path
    assert (rw, rh, rch) == (w, h, ch)
    assert np.array_equal(got, pix)
