"""PNG/JPEG load/save for the converter CLI and bench harness.

The reference tooling leans on stb_image/stb_image_write/tiny_jpeg
(reference: sqoaconv.c:22-34); here PIL plays that role, with a pure
numpy+zlib PNG fallback so the tools degrade gracefully when PIL is absent.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

try:
    from PIL import Image

    _HAVE_PIL = True
except ImportError:  # pragma: no cover
    _HAVE_PIL = False


def read_image(path: str):
    """Load an image file -> (flat uint8 pixels, width, height, channels)."""
    if _HAVE_PIL:
        img = Image.open(path)
        if img.mode == "P":
            img = img.convert("RGBA")
        elif img.mode not in ("L", "LA", "RGB", "RGBA"):
            img = img.convert("RGB")
        arr = np.asarray(img, dtype=np.uint8)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        h, w, c = arr.shape
        return arr.reshape(-1).copy(), w, h, c
    return _read_png_numpy(path)


def write_image(path: str, pixels, width: int, height: int, channels: int,
                quality: int = 90) -> None:
    arr = np.asarray(pixels, dtype=np.uint8).reshape(height, width, channels)
    if _HAVE_PIL:
        mode = {1: "L", 2: "LA", 3: "RGB", 4: "RGBA"}[channels]
        img = Image.fromarray(arr.squeeze() if channels == 1 else arr, mode)
        if path.lower().endswith((".jpg", ".jpeg")):
            if channels in (2, 4):
                img = img.convert("RGB")
            img.save(path, quality=quality)
        else:
            img.save(path)
        return
    if path.lower().endswith((".jpg", ".jpeg")):  # pragma: no cover
        raise RuntimeError("JPEG output requires PIL")
    _write_png_numpy(path, arr)  # pragma: no cover


# -- minimal pure-numpy PNG (fallback only) ---------------------------------

def _read_png_numpy(path: str):  # pragma: no cover
    with open(path, "rb") as f:
        data = f.read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n", "not a png"
    pos = 8
    idat = b""
    w = h = bitdepth = coltype = None
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            w, h, bitdepth, coltype = struct.unpack(">IIBB", chunk[:10])
        elif ctype == b"IDAT":
            idat += chunk
        elif ctype == b"IEND":
            break
        pos += 12 + length
    assert bitdepth == 8, "only 8-bit PNG supported in fallback"
    channels = {0: 1, 2: 3, 4: 2, 6: 4}[coltype]
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
    stride = w * channels
    raw = raw.reshape(h, stride + 1)
    filters = raw[:, 0]
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        line = raw[y, 1:].astype(np.int32)
        ft = filters[y]
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        cur = np.zeros(stride, np.int32)
        for x in range(stride):
            a = cur[x - channels] if x >= channels else 0
            b = prev[x]
            c = prev[x - channels] if x >= channels else 0
            if ft == 0:
                v = line[x]
            elif ft == 1:
                v = line[x] + a
            elif ft == 2:
                v = line[x] + b
            elif ft == 3:
                v = line[x] + (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                v = line[x] + pred
            cur[x] = v & 255
        out[y] = cur
    return out.reshape(-1), w, h, channels


def _write_png_numpy(path: str, arr: np.ndarray) -> None:  # pragma: no cover
    h, w, c = arr.shape
    coltype = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))

    def chunk(ctype, payload):
        body = ctype + payload
        return struct.pack(">I", len(payload)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF
        )

    with open(path, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n")
        f.write(chunk(b"IHDR", struct.pack(">IIBB", w, h, 8, coltype) + b"\0\0\0"))
        f.write(chunk(b"IDAT", zlib.compress(raw, 6)))
        f.write(chunk(b"IEND", b""))
